package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Once-per-(session, source dir) memo for import-chain pass OUTPUTS
  * (d18, verdict r17 task 6). Five registered queries re-execute
  * overlapping pass work each gate/bench run — q283 builds the product
  * pass, q293 re-derives the related passes' resolutions, q294 runs the
  * ENTIRE chain to tally one row. The pass outputs are deterministic per
  * (session, source dir) — the same immutable-inputs argument as
  * [[SheetStage]], applied one level up — so the first call materializes
  * (via [[graft.Ckpt]]: localCheckpoint, or reliable checkpoint under
  * the reliable-mode gate) and later calls reuse the pinned result. The
  * oracles are NOT weakened: every query still hash-gates its own
  * output; the memo only stops the chain re-running upstream passes.
  *
  * Keying mirrors `Tables.relations`: session UUID (identity fallback),
  * stopped sessions pruned on access, hard cap resets under churn. The
  * dir key is canonical, so basename-colliding source dirs never share
  * an entry (the SheetStage.dirFor discipline). */
private[graft] object ChainCache {

  private val cache = new java.util.concurrent.ConcurrentHashMap[
    String,
    (SparkSession,
      java.util.concurrent.ConcurrentHashMap[(String, String), DataFrame])]()

  private def sessionKey(spark: SparkSession): String =
    org.apache.spark.sql.GraftBridge.sessionUUID(spark)
      .getOrElse("identity@" + System.identityHashCode(spark))

  private val MaxSessions = 32

  private def prune(): Unit = {
    val it = cache.entrySet().iterator()
    while (it.hasNext) {
      if (it.next().getValue._1.sparkContext.isStopped) it.remove()
    }
    if (cache.size > MaxSessions) cache.clear()
  }

  /** First call per (session, canonical dir, name) materializes `build`
    * with Ckpt; later calls return the pinned frame.
    *
    * NOT computeIfAbsent for the build: memoized passes nest (the slug
    * pass builds the capstone, which is itself memoized on the SAME
    * map), and CHM forbids a recursive update from inside a mapping
    * function (IllegalStateException when the two keys share a bin).
    * get → build outside the map → putIfAbsent instead; a concurrent
    * duplicate build is benign (same deterministic frame, first-put
    * wins) and the harness drives a session single-threaded anyway. */
  def memo(s: SparkSession, dir: String, name: String)
      (build: => DataFrame): DataFrame = {
    if (cache.size > 4) prune()
    val (_, perSession) = cache.computeIfAbsent(
      sessionKey(s),
      _ => (s, new java.util.concurrent.ConcurrentHashMap[
        (String, String), DataFrame]()))
    val key = (new java.io.File(dir).getCanonicalPath, name)
    val hit = perSession.get(key)
    if (hit != null) hit
    else {
      val built = graft.Ckpt(build)
      val prev = perSession.putIfAbsent(key, built)
      if (prev != null) prev else built
    }
  }
}
