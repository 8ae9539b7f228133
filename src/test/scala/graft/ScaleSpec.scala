package graft

import graft.operators.Scale
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Scale utilities: salted joins/aggs preserve results; bucketed joins
  * plan without a shuffle on the fact side. */
class ScaleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("approximate aggregates: HLL count-distinct within 5% of exact (100TB path)") {
    // at 100 TB exact count-distinct shuffles every key; approx_count_distinct
    // is one fixed-size sketch per partition (SURVEY §2.5 notes the
    // reference has no approximate aggregates — this is the scale extension)
    val li = Tables.lineitem(spark, TestSpark.sfDir)
    val exact = li.select(countDistinct(col("l_partkey"))).head().getLong(0)
    val approx = li.select(approx_count_distinct(col("l_partkey"))).head().getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.05,
      s"approx=$approx exact=$exact")
  }

  test("HLL sketch rollup: merged daily sketches == direct sketch, ~exact") {
    // the mergeable-sketch pattern: sketch each day once, answer weekly
    // distinct-user questions by merging stored sketches — no event
    // rescan. HLL union is register-wise max, so the rolled-up estimate
    // must be BIT-IDENTICAL to sketching the week directly (same lgK),
    // not merely close.
    val ev = Tables.events(spark, TestSpark.sfDir).filter(col("ts").isNotNull)
    val daily = Scale.sketchBuckets(ev, date_trunc("day", col("ts")), col("user_id"))
    val weeklyRolled = Scale
      .sketchRollup(daily, date_trunc("week", col("bucket")))
      .collect().map(r => r.get(0).toString -> r.getLong(1)).toMap
    val weeklyDirect = ev
      .groupBy(date_trunc("week", col("ts")).as("grain"))
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("est"))
      .collect().map(r => r.get(0).toString -> r.getLong(1)).toMap
    assert(weeklyRolled == weeklyDirect, "rollup must equal direct sketching")
    val exact = ev
      .groupBy(date_trunc("week", col("ts")).as("grain"))
      .agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.get(0).toString -> r.getLong(1)).toMap
    weeklyRolled.foreach { case (wk, est) =>
      val ex = exact(wk)
      assert(math.abs(est - ex).toDouble / ex < 0.05, s"week $wk est=$est exact=$ex")
    }
    assert(weeklyRolled.nonEmpty)
  }

  test("count-min rollup: merged daily sketches bound item frequencies") {
    val ev = Tables.events(spark, TestSpark.sfDir)
      .filter(col("ts").isNotNull && col("user_id").isNotNull)
    val daily = Scale.cmsBuckets(ev, date_trunc("day", col("ts")), col("user_id"))
    val hot = ev.groupBy(col("user_id")).count()
      .orderBy(col("count").desc, col("user_id")).head
    val (user, exact) = (hot.getLong(0), hot.getLong(1))
    val total = ev.count()
    val est = Scale.cmsMergedCount(daily, user)
    // CMS never under-counts; over-count bounded by eps × stream length
    assert(est >= exact, s"CMS under-counted: est=$est exact=$exact")
    assert(est <= exact + math.ceil(0.001 * total).toLong + 1,
      s"CMS over-count beyond eps bound: est=$est exact=$exact total=$total")
    // merging is counter-wise add ⇒ identical to sketching everything at once
    val direct = Scale.cmsMergedCount(
      Scale.cmsBuckets(ev, lit(1), col("user_id")), user)
    assert(est == direct, "merged-from-daily must equal direct sketching")
  }

  test("KLL quantile rollup: exact-regime merged sketches equal direct " +
      "order statistics; small-k sketches hold the published rank error") {
    // the quantile member of the mergeable-sketch triad (HLL distinct,
    // CMS frequency, KLL quantiles). Exact regime (k ≥ n): merged bucket
    // sketches return TRUE order statistics — the q268 oracle contract.
    val df = (1L to 20000L).map(i => (i % 8, (i * 131) % 19997))
      .toDF("b", "v")
    val fine = Scale.kllBuckets(df,
      struct((col("b") % 4).as("g"), col("b").as("fine")), col("v"))
    val rolled = Scale.kllRollup(fine, col("bucket.g"), Seq(0.5, 0.9))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    val exact = df.withColumn("g", col("b") % 4).groupBy("g")
      .agg(count(lit(1)).as("n"),
        expr("percentile(v, 0.5)").as("p50x"),
        expr("percentile(v, 0.9)").as("p90x"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2),
        r.getDouble(3)))).toMap
    exact.foreach { case (g, (n, p50x, p90x)) =>
      val (rn, p50, p90) = rolled(g)
      assert(rn == n, s"grain $g merged n")
      // percentile() interpolates; quantile_disc/KLL pick an element —
      // an exact-regime KLL value must sit within one step of the
      // interpolated percentile (values here step by ~8)
      assert(math.abs(p50 - p50x) <= 8, s"g=$g p50=$p50 exact=$p50x")
      assert(math.abs(p90 - p90x) <= 8, s"g=$g p90=$p90 exact=$p90x")
    }
    // approximate regime: k=200 over 50k values — the estimate's TRUE
    // normalized rank must stay within the published ~1.65% (99% conf)
    // bound; allow 3.5% slack for the merge
    val big = (1L to 50000L).map(i => (i % 10, (i * 2654435761L) % 1000003))
      .toDF("b", "v")
    val sk = Scale.kllBuckets(big, lit(1), col("v"), k = 200)
    val est = Scale.kllRollup(sk, lit(1), Seq(0.5)).collect().head.getLong(2)
    val trueRank = big.filter(col("v") <= est).count().toDouble / 50000.0
    assert(math.abs(trueRank - 0.5) < 0.035,
      s"p50 estimate $est has true rank $trueRank")
  }

  test("top-k rollup: combined bucket states equal the direct group-by " +
      "ranking while the tracked-item budget covers the domain") {
    // skewed fixture: item i appears 2000/i times — distinct counts, so
    // the ranking is unambiguous
    val rows = (1 to 50).flatMap(i => Seq.fill(2000 / i)((i % 5, s"item$i")))
    val df = rows.toDF("b", "v")
    val states = Scale.topKBuckets(df, col("b"), col("v"), maxItemsTracked = 100)
    val rolled = Scale.topKRollup(states, lit(1), k = 8)
      .orderBy(col("rank")).collect()
      .map(r => (r.getString(1), r.getLong(2), r.getInt(3)))
    val exact = df.groupBy(col("v")).count()
      .orderBy(col("count").desc, col("v")).limit(8).collect()
      .zipWithIndex.map { case (r, i) => (r.getString(0), r.getLong(1), i + 1) }
    assert(rolled.toSeq == exact.toSeq,
      "combined top-k diverged from the exact ranking")
  }

  test("footerStats answers min/max/count from parquet metadata only") {
    val path = s"${TestSpark.sfDir}/lineitem.parquet"
    val stats = Scale.footerStats(spark, path, Seq("l_quantity", "l_orderkey"))
    // the helper REQUIREs PushedAggregation in the plan; values must
    // equal the classic full-scan aggregation
    val r = stats.head()
    val li = Tables.lineitem(spark, TestSpark.sfDir)
    val exact = li.agg(
      min(col("l_quantity")), max(col("l_quantity")),
      min(col("l_orderkey")), max(col("l_orderkey")),
      count(lit(1))).head()
    assert(r.getDouble(0) == exact.getDouble(0)) // min qty
    assert(r.getDouble(1) == exact.getDouble(1)) // max qty
    assert(r.getLong(2) == exact.getLong(2))     // min orderkey
    assert(r.getLong(3) == exact.getLong(3))     // max orderkey
    assert(r.getLong(4) == exact.getLong(4))     // count
  }

  test("saltedJoin returns the same rows as a plain join") {
    val left = (1 to 1000).map(i => (i % 3, i)).toDF("k", "v") // 3 hot keys
    val right = Seq((0, "a"), (1, "b"), (2, "c")).toDF("k", "name")
    val plain = left.join(right, Seq("k")).agg(count(lit(1)), sum("v")).head()
    val salted = Scale.saltedJoin(left, right, "k", salts = 8)
      .agg(count(lit(1)), sum("v")).head()
    assert(plain == salted)
  }

  test("AQE skew-join splits the hot partition on the q213 shape — the " +
      "automatic alternative to manual salting (SMJ tagged skew=true)") {
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    // one hot key carries ~95% of the fact side — the shape q213 audits
    // and saltedJoin remediates by hand. With the skew thresholds scaled
    // to the fixture, AQE must split the hot partition at runtime.
    val fact = spark.range(200000)
      .select(when(col("id") % 20 =!= 0, lit(7L)).otherwise(col("id") % 97)
        .as("k"), col("id").as("v"))
    val dim = spark.range(100).select(col("id").as("k"),
      concat(lit("d"), col("id")).as("name"))
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes")
      .map(k => k -> spark.conf.getOption(k))
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
      val joined = fact.join(dim, Seq("k"))
      assert(joined.count() == 200000L)
      val fin = joined.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.finalPhysicalPlan
        case p => p
      }
      assert(fin.toString.contains("skew=true"),
        s"AQE did not split the skewed partition:\n$fin")
      // the limitation Scale.saltedJoin still owns, pinned: skew
      // detection keys on PARTITION BYTES, so when column pruning
      // strips the fact side to the bare join key (EXISTS/count-style
      // joins) the hot partition's 95% of ROWS compresses under the
      // threshold and NO split happens — one reducer keeps 95% of the
      // join CPU. If a Spark upgrade makes this split, the salting
      // guidance in PLANS.md can be narrowed.
      // joined key domain: the hot key 7 ∪ (id % 97) = 97 distinct keys
      val pruned = fact.join(dim, Seq("k")).groupBy(col("name")).count()
      assert(pruned.count() == 97L)
      val finP = pruned.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.finalPhysicalPlan
        case p => p
      }
      assert(!finP.toString.contains("skew=true"),
        "byte-keyed skew detection now fires on pruned key-only joins — " +
          "revisit the manual-salting guidance")
    } finally saved.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
  }

  test("runtime bloom-filter join pruning injects in the shuffle-join " +
      "regime and correctly stays out of the broadcast regime") {
    // Spark's InjectRuntimeFilter builds a bloom filter from a join
    // side carrying a selective predicate and pushes might_contain
    // onto the other side's scan — the runtime analog of partition
    // pruning, and at 100 TB the difference between scanning the full
    // fact table and scanning the matching slice. It only fires when
    // the join would SHUFFLE (a broadcast join self-prunes via its
    // hash table) and the probe-side scan is big enough to repay the
    // filter build (applicationSideScanSizeThreshold, default 10 GiB —
    // why gate-SF plans never show it). Pin both decisions.
    val sfDir = TestSpark.sfDir
    def q() = {
      val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      val ord = spark.read.parquet(s"$sfDir/orders.parquet")
        .filter(col("o_orderpriority") === "1-URGENT" &&
          col("o_totalprice") > 250000)
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("q"))
    }
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
      .map(k => k -> spark.conf.getOption(k))
    try {
      assert(spark.conf.get(
        "spark.sql.optimizer.runtime.bloomFilter.enabled") == "true")
      // broadcast-able creation side → no bloom, even with thresholds off
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter." +
        "applicationSideScanSizeThreshold", "0")
      val broadcastPlan = q().queryExecution.optimizedPlan.toString
      assert(!broadcastPlan.toLowerCase.contains("bloom"),
        "bloom injected under a broadcast-able join — thresholds drifted")
      // shuffle regime (the 100-TB shape): bloom built from the
      // selective orders side, might_contain pushed onto lineitem
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val shufflePlan = q().queryExecution.optimizedPlan.toString
      assert(shufflePlan.contains("bloom_filter_agg") &&
        shufflePlan.toLowerCase.contains("might_contain"),
        s"no runtime bloom filter in the shuffle regime:\n$shufflePlan")
      // and the filtered plan still returns the exact result
      val r = q().collect().head
      val saved2 = spark.conf.get(
        "spark.sql.optimizer.runtime.bloomFilter.enabled")
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
      val r2 = q().collect().head
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", saved2)
      assert(r == r2, "bloom-pruned result differs from unpruned")
    } finally saved.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
  }

  test("saltedAgg equals direct aggregation") {
    val df = (1 to 1000).map(i => (i % 3, i.toLong)).toDF("k", "v")
    val direct = df.groupBy("k").agg(sum("v").as("total"), count(lit(1)).as("cnt"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    val salted = Scale.saltedAgg(df, "k", salts = 8, Seq(
        (sum(col("v")), (c: org.apache.spark.sql.Column) => sum(c), "total"),
        (count(lit(1)), (c: org.apache.spark.sql.Column) => sum(c), "cnt")))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    assert(direct == salted)
  }

  test("bucketed join plans without exchange on either side") {
    spark.sql("DROP TABLE IF EXISTS graft_bl")
    spark.sql("DROP TABLE IF EXISTS graft_br")
    // a previously-failed run can leave the managed location behind
    val wh = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
    Seq("graft_bl", "graft_br").foreach { t =>
      val p = java.nio.file.Paths.get(wh, t)
      if (java.nio.file.Files.exists(p))
        org.apache.commons.io.FileUtils.deleteDirectory(p.toFile)
    }
    Scale.writeBucketed((1 to 5000).map(i => (i.toLong, i * 2.0)).toDF("k", "a"),
      "graft_bl", "k", buckets = 8)
    Scale.writeBucketed((1 to 5000).map(i => (i.toLong, s"n$i")).toDF("k", "b"),
      "graft_br", "k", buckets = 8)
    // force the sort-merge path (tiny test tables would broadcast, which
    // disables bucketing) and assert the bucketed SMJ needs NO shuffle
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Scale.bucketedJoin(spark, "graft_bl", "graft_br", "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("ShuffleExchange") &&
        !plan.contains("Exchange hashpartitioning"),
        s"expected shuffle-free bucketed join:\n$plan")
      assert(plan.contains("SortMergeJoin"))
      assert(plan.contains("Bucketed: true"), s"bucketing not used:\n$plan")
      assert(joined.count() == 5000)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }

  test("Ckpt reliable mode: blocks go to the checkpoint dir (executor-loss " +
      "safe), lineage truncated, results identical to local mode") {
    val df = Tables.customer(spark, TestSpark.sfDir)
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
    val localRows = Ckpt(df).orderBy(col("c_mktsegment")).collect().toSeq
    try {
      spark.conf.set("spark.graft.checkpoint.reliable", "true")
      val cp = Ckpt(df)
      assert(cp.orderBy(col("c_mktsegment")).collect().toSeq == localRows,
        "reliable mode changed results")
      // lineage is truncated to an RDD scan backed by checkpoint storage —
      // an executor loss recomputes from the checkpoint files, not parquet
      val p = cp.queryExecution.optimizedPlan.toString
      assert(p.contains("LogicalRDD"), p)
      val dirUri = spark.sparkContext.getCheckpointDir
      assert(dirUri.isDefined, "setCheckpointDir was not applied lazily")
      val dir = new java.io.File(new java.net.URI(dirUri.get).getPath)
      assert(dir.exists && dir.listFiles.nonEmpty,
        s"no checkpoint files under $dir")
    } finally spark.conf.set("spark.graft.checkpoint.reliable", "false")
  }
}
