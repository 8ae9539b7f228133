package graft

import graft.operators.Layout
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Small-files compaction mechanics (Layout.compact; q244 gates the data
  * round trip): file counts shrink to the byte-derived target, rows and
  * values survive exactly, and a single-file directory stays one file. */
class CompactionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("64 tiny files compact to the byte-sized count; data survives exactly") {
    val base = java.nio.file.Files.createTempDirectory("graft-compact").toString
    val src = (1L to 20000L).map(i => (i, i % 97, s"payload-$i"))
      .toDF("id", "k", "s")
    src.repartition(64).write.mode("overwrite").parquet(s"$base/small")
    val (before, after) = Layout.compact(spark, s"$base/small",
      s"$base/big", targetBytes = 256L * 1024)
    assert(before == 64, s"expected 64 input files, saw $before")
    assert(after < before, s"no compaction: $before -> $after")
    // the output count is the byte-derived plan, not a guess
    val p = new org.apache.hadoop.fs.Path(s"$base/small")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val bytes = fs.listStatus(p).filter(_.isFile)
      .filterNot(st => st.getPath.getName.startsWith("_"))
      .map(_.getLen).sum
    assert(after == math.max(1, math.ceil(bytes / (256.0 * 1024)).toInt))
    // lossless: same rows, same values
    val back = spark.read.parquet(s"$base/big")
    assert(back.count() == 20000)
    assert(back.agg(sum(col("id")), sum(col("k"))).head ==
      src.agg(sum(col("id")), sum(col("k"))).head)
  }

  test("already-compact input stays at one file") {
    val base = java.nio.file.Files.createTempDirectory("graft-compact1").toString
    (1L to 100L).toDF("id").coalesce(1)
      .write.mode("overwrite").parquet(s"$base/one")
    val (before, after) = Layout.compact(spark, s"$base/one",
      s"$base/out", targetBytes = 64L << 20)
    assert(before == 1 && after == 1)
  }
}
