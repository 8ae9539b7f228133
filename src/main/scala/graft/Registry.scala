package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable query: a Spark implementation plus (when SQL-expressible)
  * an equivalent ANSI SQL text the driver runs in DuckDB over the same
  * parquet tables. Column names/aliases must match between the two — the
  * driver sorts columns by name and hashes values.
  *
  * Determinism rules for oracle parity (applied throughout):
  *  - money/double aggregates are summed as `decimal(18,2)` per-element
  *    casts (exact, associative — immune to float summation-order drift
  *    between Spark's partial aggregation and DuckDB's);
  *  - NO output column is decimal- or derived-timestamp-typed: the final
  *    aggregate casts to DOUBLE (equal decimals → bit-identical doubles
  *    → identical stringifications), time buckets render as formatted
  *    strings;
  *  - arithmetic PRODUCTS round each 2dp input to decimal FIRST and
  *    multiply in decimal (a double product rounded afterwards lands on
  *    rounding midpoints differently per engine);
  *  - averages/ratios divide the exact decimal sums as doubles
  *    (identical operands ⇒ identical quotients), or `round(x, 4)` both
  *    sides where the input is inherently double;
  *  - every query with a LIMIT carries a total deterministic ORDER BY
  *    (unique-key tiebreaker);
  *  - hash-based operators use fixed seeds and no RNG state.
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None)

object Registry {
  /** All registered queries, in registration order. */
  def all: Seq[Q] =
    reports.Reports.qs ++
      reports.Tpch.qs ++
      reports.Graph.qs ++
      reports.Reshape.qs ++
      reports.Audits.qs ++
      operators.FilterQueries.qs ++
      etl.EtlQueries.qs ++
      etl.ImportCapstone.qs ++
      etl.RelatedImport.qs ++
      etl.ImportFinalize.qs ++
      etl.ExportCapstone.qs ++
      etl.Constraints.qs ++
      etl.RecordLinkage.qs ++
      etl.Pseudonymize.qs ++
      etl.FileGate.qs ++
      text.TextQueries.qs ++
      text.SkipGram.qs ++
      text.CorpusStats.qs ++
      text.Retrieval.qs ++
      text.Classifier.qs ++
      streaming.EventQueries.qs ++
      streaming.Lifecycle.qs ++
      similarity.SimilarityQueries.qs ++
      multimodal.MultimodalQueries.qs ++
      dsl.SearchQueries.qs ++
      dsl.CatalogQueries.qs

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.run).toMap

  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap

  /** Bench-only fast-path variants: the xxhash custom-expression forms of
    * the minhash/simhash/SRP operators whose hashes no SQL engine
    * reproduces. Their REGISTERED q36/q37/q41 twins run the same pipeline
    * with engine-neutral md5 hashing and carry the DuckDB oracle (so the
    * correctness gate shows zero unchecked rows); these entries keep the
    * production expressions' throughput measured every round. Excluded
    * from Verify — their logic is value-checked through the portable
    * twins and asserted equivalent in the expression specs. */
  def benchExtras: Seq[Q] = Seq(
    Q("q36f_minhash_fast", (s, d) => text.TextQueries.minhashCandidates(s, d)),
    Q("q37f_simhash_fast", (s, d) => text.TextQueries.simhashes(s, d)),
    Q("q41f_ann_lsh_fast", (s, d) => similarity.SimilarityQueries.annLsh(s, d)),
    // q144's A/B twin: k PINNED at 8 while the corpus grows — the shape
    // verdict r15 flagged at 4.04× per 10× data; the registered q144 now
    // derives k from the corpus (see semanticDedup/semanticDedupFixedK)
    Q("q144f_semantic_dedup_fixedk",
      (s, d) => similarity.SimilarityQueries.semanticDedupFixedK(s, d)),
    // frozen shuffle-heavy cross-round control (verdict r17 task 5):
    // never edited, times pure environment drift on the pair-mass shape
    Q("qc1_control_pairs", (s, d) => BenchControls.controlPairs(s, d)))

  /** Queries that OWN a ChainCache-memoized pass (chain outputs or
    * similarity trainings): their warm bench passes would time a
    * cached-block scan / a pre-trained serve path, not the query, so
    * Bench reports their COLD (first-execution-in-session) time instead
    * of the warm median — the honest number for a deterministic pass
    * that a real pipeline materializes once. DERIVED from the cache's
    * own registration map, which `ChainCache.memo` enforces at every
    * call site — the set and the call sites cannot drift apart
    * (ADVICE r18). */
  def memoizedNames: Set[String] = etl.ChainCache.ownerQueryNames

  /** Queries whose warm medians exclude memoized upstream work they
    * consume but don't own — reported in the bench artifact as
    * `memo_consumers` (ADVICE r18). */
  def memoConsumerNames: Set[String] = etl.ChainCache.consumerQueryNames

  /** SPARK_GRAFT_ONLY selector, shared by Bench and Verify: a token
    * matches on the query-id boundary (`q10` selects `q10_segment_facet`
    * but NOT `q100_asof_native_nearest`) or as an exact/underscore-safe
    * prefix (`q10_seg` still narrows). A bare numeric prefix matching
    * every qN* was an easy targeting footgun. */
  def selectedBy(only: Option[Seq[String]], name: String): Boolean =
    only.forall(_.exists(p =>
      name == p || name.startsWith(p + "_") ||
        (p.contains("_") && name.startsWith(p))))
}
