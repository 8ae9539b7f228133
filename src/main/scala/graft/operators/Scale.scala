package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scale utilities: skew-salted joins and bucketed co-located joins — the
  * knobs a 1000-executor deployment reaches for when AQE's automatic
  * handling is not enough (SURVEY's scale mandate; the reference has no
  * analog because the database did its physical planning).
  */
object Scale {

  /** Mergeable HLL sketch rollup — the pre-aggregation pattern for
    * distinct counts at 100 TB: sketch each fine-grained bucket ONCE
    * (one pass over the events), then answer any coarser-grained
    * distinct-count question by merging the stored sketches
    * (register-wise max — |buckets| rows, no rescan). HLL union of
    * sub-sketches is EXACTLY the sketch of the union at equal lgK, so
    * rolled-up estimates are bit-identical to direct sketching, not
    * merely close (pinned in ScaleSpec). Uses Spark 4's built-in
    * Datasketches functions. */
  def sketchBuckets(df: DataFrame, bucket: Column, value: Column): DataFrame =
    df.groupBy(bucket.as("bucket"))
      .agg(hll_sketch_agg(value).as("sk"))

  /** Merge stored bucket sketches up to a coarser grain and estimate. */
  def sketchRollup(sketches: DataFrame, coarser: Column): DataFrame =
    sketches.groupBy(coarser.as("grain"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("approx_distinct"))

  /** Count-min frequency sketches per bucket — the heavy-hitter companion
    * to the HLL rollup: sketch each fine-grained bucket once, answer
    * coarser "how often did X appear" questions by merging the stored
    * sketches (counter-wise ADD, so the merge is exact — a merged
    * estimate equals sketching the union directly with the same
    * params/seed). Fixed seed keeps results reproducible. */
  def cmsBuckets(df: DataFrame, bucket: Column, value: Column,
      eps: Double = 0.001, confidence: Double = 0.99, seed: Int = 42): DataFrame =
    df.groupBy(bucket.as("bucket"))
      .agg(count_min_sketch(value, lit(eps), lit(confidence), lit(seed)).as("cms"))

  /** Mergeable KLL quantile sketches per bucket — the third sketch
    * family next to the HLL (distinct) and CMS (frequency) rollups:
    * sketch each fine-grained bucket ONCE, answer any coarser-grained
    * quantile question by merging the stored sketches (|buckets| rows,
    * no rescan). Uses Spark 4's built-in Datasketches KLL functions.
    *
    * Exactness regime: a KLL sketch stores values EXACTLY until its
    * capacity (~k) is exceeded, and merging exact sketches whose total
    * stays under capacity is still exact — so with k sized to the
    * rollup grain, quantiles are TRUE order statistics (matching
    * DuckDB's `quantile_disc`, which is how q268 oracle-gates the
    * algebra); past capacity the sketch degrades gracefully to the
    * published ~1.65%·(200/k) rank-error bound (spec-pinned). */
  def kllBuckets(df: DataFrame, bucket: Column, value: Column,
      k: Int = 65535): DataFrame =
    df.select(bucket.as("bucket"), value.cast("long").as("__v"))
      .groupBy(col("bucket"))
      .agg(expr(s"kll_sketch_agg_bigint(__v, $k)").as("sk"))

  /** Merge stored bucket sketches up to a coarser grain and extract
    * the requested quantiles (plus the exact merged row count). */
  def kllRollup(sketches: DataFrame, coarser: Column,
      quantiles: Seq[Double]): DataFrame = {
    val merged = sketches.groupBy(coarser.as("grain"))
      .agg(expr("kll_merge_agg_bigint(sk)").as("sk"))
    val qCols = quantiles.map(q =>
      expr(s"kll_sketch_get_quantile_bigint(sk, $q)")
        .as(s"p${(q * 100).round}"))
    merged.select(col("grain") +:
      expr("kll_sketch_get_n_bigint(sk)").as("n") +: qCols: _*)
  }

  /** Mergeable top-k (heavy hitter) state per bucket — the ranked
    * companion to the CMS frequency rollup: accumulate once per fine
    * bucket, answer any coarser "what are the hottest items" question by
    * COMBINING the stored states. While `maxItemsTracked` covers the
    * distinct items flowing into a state, counts are EXACT and the
    * rolled-up ranking equals a direct group-by (pinned in ScaleSpec);
    * beyond that it degrades to the sketch's frequency estimates. */
  def topKBuckets(df: DataFrame, bucket: Column, item: Column,
      maxItemsTracked: Int = 10000): DataFrame =
    df.select(bucket.as("bucket"), item.as("__i"))
      .groupBy(col("bucket"))
      .agg(expr(s"approx_top_k_accumulate(__i, $maxItemsTracked)").as("st"))

  /** Combine stored bucket states up to a coarser grain and emit the
    * top-k items as ROWS re-sorted deterministically (count desc, then
    * item — the estimate's own tie order is engine-internal). */
  def topKRollup(states: DataFrame, coarser: Column, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val merged = states.groupBy(coarser.as("grain"))
      .agg(expr("approx_top_k_combine(st)").as("st"))
    merged.select(col("grain"),
        explode(expr(s"approx_top_k_estimate(st, $k)")).as("e"))
      .select(col("grain"), col("e.item").as("item"),
        col("e.count").as("cnt"))
      .withColumn("rank", row_number().over(Window.partitionBy(col("grain"))
        .orderBy(col("cnt").desc, col("item"))))
  }

  /** Merge stored bucket sketches on the driver (|buckets| rows of ~KB
    * sketch bytes — statistics, not data) and estimate one item's count.
    * No sketches (empty frame, or every cms cell null — e.g. a bucket
    * aggregated over zero rows) means the item was never seen: 0. */
  def cmsMergedCount(sketches: DataFrame, item: Long): Long = {
    import org.apache.spark.util.sketch.CountMinSketch
    val parsed = sketches.select(col("cms")).collect()
      .flatMap(r => Option(r.getAs[Array[Byte]](0)))
      .map(b => CountMinSketch.readFrom(new java.io.ByteArrayInputStream(b)))
    if (parsed.isEmpty) 0L
    else parsed.reduceLeft { (a, b) => a.mergeInPlace(b); a }
      .estimateCount(java.lang.Long.valueOf(item))
  }

  /** Skew-salted equi-join: the left (skewed, large) side gets a random
    * salt in [0, salts); the right side is replicated across all salt
    * values; the join key becomes (key, salt), splitting each hot key's
    * rows across `salts` reducers.
    *
    * Use when a handful of keys dominate (AQE skew-join handles sort-merge
    * splits automatically, but salting also fixes skewed aggregations and
    * broadcast-ineligible cases). Salt comes from the per-row monotonic
    * id (identical duplicate rows — the common hot-key shape — must land
    * on DIFFERENT salts; a content hash sends them all to one). */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      salts: Int, seed: Int = 42): DataFrame = {
    // salt from a per-ROW id, NOT a content hash: hot keys routinely come
    // as fully identical rows, which hash to ONE salt and defeat the
    // split entirely. The id is layout-dependent, but salt placement
    // never affects results — only distribution.
    val salted = left.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(salts.toLong)).cast("int"))
    val replicated = right
      .withColumn("__salt", explode(array((0 until salts).map(lit): _*)))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Two-level skew-safe aggregation: partial aggregate on (key, salt),
    * then final aggregate on key. Spark's hash aggregate already does
    * map-side partials; explicit salting additionally splits a hot key
    * across reducers in the FIRST shuffle. `partials` are (aggExpr,
    * mergeExpr, name) triples, e.g. (sum(c), sum, "total"). */
  def saltedAgg(df: DataFrame, key: String, salts: Int,
      partials: Seq[(Column, Column => Column, String)], seed: Int = 42): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(salts.toLong)).cast("int"))
    val partial = salted.groupBy(col(key), col("__salt"))
      .agg(partials.head._1.as(partials.head._3),
        partials.tail.map(p => p._1.as(p._3)): _*)
    partial.groupBy(col(key))
      .agg(partials.head._2(col(partials.head._3)).as(partials.head._3),
        partials.tail.map(p => p._2(col(p._3)).as(p._3)): _*)
  }

  /** Write both sides bucketed by the join key so subsequent joins are
    * co-located (no shuffle): bucketBy requires saveAsTable (bucket
    * metadata lives in the catalog). Returns the table names. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int, path: Option[String] = None): String = {
    val w = df.write.mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
    // explicit path ⇒ EXTERNAL bucketed table: overwrite replaces stale
    // data from a previous session even when the fresh catalog has no
    // table entry (a managed table errors LOCATION_ALREADY_EXISTS there)
    path.fold(w)(p => w.option("path", p)).saveAsTable(table)
    table
  }

  /** Join two bucketed tables on their bucket key — with matching bucket
    * counts Spark plans a shuffle-free sort-merge join. */
  def bucketedJoin(spark: org.apache.spark.sql.SparkSession, leftTable: String,
      rightTable: String, key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), Seq(key))

  /** Footer-statistics aggregate: global MIN/MAX/COUNT answered from
    * parquet row-group METADATA — zero data pages read. At 100 TB this
    * is the difference between a seconds-long footer sweep and a full
    * corpus scan for "what's the key range / row count of this table"
    * (exactly the pre-import profile questions). Runs in a child session
    * with the V2 parquet reader + `parquet.aggregatePushdown` so the
    * engine-wide read path is untouched, and REQUIRES the pushdown to
    * have engaged — a silent fallback to scanning would defeat the
    * point (unsupported shapes: filters, nested fields, some timestamp
    * encodings). */
  def footerStats(spark: org.apache.spark.sql.SparkSession, path: String,
      cols: Seq[String]): DataFrame = {
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.sources.useV1SourceList", "")
    s2.conf.set("spark.sql.parquet.aggregatePushdown", "true")
    val aggs = cols.flatMap(c =>
      Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"))) :+
      count(lit(1)).as("cnt")
    val out = s2.read.parquet(path).agg(aggs.head, aggs.tail: _*)
    // The V2 ParquetScan prints "PushedAggregation: []" even when nothing
    // was pushed, so presence of the label proves nothing — require a
    // NON-EMPTY pushed list (an actual MIN/MAX/COUNT inside the brackets)
    // so this fails loudly when an unsupported shape silently degrades to
    // a data-page scan.
    val planStr = out.queryExecution.executedPlan.toString
    require(
      "PushedAggregation: \\[(MIN|MAX|COUNT)".r.findFirstIn(planStr).isDefined,
      s"aggregate pushdown did not engage for $path ($cols) — " +
        "the query would scan data pages instead of footers")
    out
  }
}
