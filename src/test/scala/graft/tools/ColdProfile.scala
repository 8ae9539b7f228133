package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Dev-only cold-run profiler (test scope): reproduces the Bench session
  * (same master/shuffle-partitions/layout staging) and times the FIRST
  * in-session execution of each named query — the number Bench reports
  * for ChainCache-memoized owners — decomposed into Spark jobs with task
  * counts, so per-task fixed cost vs data cost separates.
  * Usage: Test/runMain graft.tools.ColdProfile <sfDir> <tok1,tok2,...>
  * Env: SPARK_GRAFT_CPUS (default 32), SPARK_GRAFT_CONF (extra confs).
  */
object ColdProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val tokens = args(1).split(',').map(_.trim).filter(_.nonEmpty)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(';').foreach { kv =>
      kv.split("=", 2) match {
        case Array(k, v) if k.nonEmpty => builder.config(k.trim, v.trim)
        case _ => ()
      }
    })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Bench warmup + layout staging (same as Bench.main)
    spark.range(100000).selectExpr("id % 10 AS k", "id AS v")
      .groupBy("k").count().count()
    val sfName = new java.io.File(sfDir).getName.replaceAll("[^A-Za-z0-9]", "_")
    val blockBytes = 1L << 20
    graft.Tables.stageLayout(spark, sfDir, s"/tmp/graft_stage/$sfName", blockBytes)
    spark.conf.set("spark.sql.files.maxPartitionBytes", blockBytes.toString)
    graft.Tables.names.foreach { t =>
      try graft.Tables.table(spark, sfDir, t).count()
      catch { case _: Throwable => () }
    }

    val jobs = scala.collection.mutable.ArrayBuffer[(Int, String, Long, Int)]()
    val starts = scala.collection.mutable.Map[Int, (String, Long)]()
    val taskCount = new java.util.concurrent.atomic.AtomicInteger()
    val jobTasks = scala.collection.mutable.Map[Int, Int]()
    val stageToJob = scala.collection.mutable.Map[Int, Int]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val site = j.stageInfos.lastOption.map(_.name).getOrElse("")
        starts(j.jobId) = (site, System.nanoTime())
        j.stageIds.foreach(sid => stageToJob(sid) = j.jobId)
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        taskCount.incrementAndGet()
        stageToJob.get(t.stageId).foreach { jid =>
          jobTasks(jid) = jobTasks.getOrElse(jid, 0) + 1
        }
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        starts.remove(j.jobId).foreach { case (d, t0) =>
          jobs += ((j.jobId, d, System.nanoTime() - t0,
            jobTasks.getOrElse(j.jobId, 0))) }
    })

    for (token <- tokens) {
      val q = graft.Registry.all.find(_.name.startsWith(token))
        .getOrElse(sys.error(s"no query matching $token"))
      jobs.clear(); jobTasks.clear(); taskCount.set(0)
      val t0 = System.nanoTime()
      q.run(spark, sfDir).queryExecution.toRdd.count()
      val total = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // let listener drain
      val nTasks = taskCount.get()
      val jobSum = jobs.map(_._3).sum / 1e9
      println(f"== ${q.name} COLD total $total%.3f s, ${jobs.size} jobs " +
        f"(job-time sum $jobSum%.3f s), $nTasks tasks ==")
      jobs.sortBy(-_._3).take(20).foreach { case (id, d, ns, nt) =>
        println(f"  job $id%4d ${ns / 1e9}%7.3f s  $nt%5d tasks  ${d.take(80)}")
      }
    }
    spark.stop()
  }
}
