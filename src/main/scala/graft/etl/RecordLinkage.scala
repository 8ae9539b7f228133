package graft.etl
import graft.Ckpt.Ops

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Entity resolution over the customer master — the record-linkage step a
  * data-integration pipeline runs before K5's upsert can trust its keys:
  * find customers that are plausibly the SAME entity under small clerical
  * variations, and cluster them.
  *
  * Three-stage shape (the canonical ER architecture — blocking, pairwise
  * verification, clustering):
  *
  *  1. BLOCKING via positional wildcards — after an exact-duplicate
  *     collapse: identical (name, nation, segment) records are first
  *     grouped (connectivity within a group is a star of edges to its
  *     min-key member, never a clique), then ONE representative per
  *     distinct name emits L keys — its 9-digit name suffix with one
  *     position masked — plus the exact (nation, segment) attributes as
  *     a conjunction. Two names at substitution distance ≤ 1 are
  *     GUARANTEED to collide on the key that masks their differing
  *     position (the substitution analog of q130's symmetric-deletion
  *     neighborhood), and a block holds at most σ = |alphabet|
  *     representatives (8 digits fixed, the masked one must differ), so
  *     candidate volume is O(n · L · σ) — LINEAR in the corpus on ANY
  *     data distribution, including arbitrarily dense duplicate-name
  *     skew (the cap is structural, unlike value-based blocking where
  *     one hot key degenerates — and unlike a frequency cap, it loses
  *     zero recall).
  *  2. VERIFICATION: `levenshtein(name_a, name_b) <= 1` on the candidate
  *     pairs only — the expensive metric runs on the linear-sized
  *     candidate set, not the corpus square.
  *  3. CLUSTERING: the verified match edges feed the same min-label
  *     pointer-jumping connected components as the near-dup text pipeline
  *     (text.Dedup.connectedComponents) — log-diameter rounds, no driver
  *     state. Output is the per-customer cluster assignment for clusters
  *     of size ≥ 2 (the resolution worklist).
  */
object RecordLinkage {

  /** q177: blocking → verify → cluster over the customer table. */
  def resolveCustomers(s: SparkSession, dir: String): DataFrame =
    resolveCustomersOf(Tables.customer(s, dir))

  def resolveCustomersOf(customers: DataFrame): DataFrame = {
    val c = customers
      .select(col("c_custkey"), col("c_name"), col("c_nationkey"),
        col("c_mktsegment"), expr("substring(c_name, 10)").as("digits"))
      .ckpt
    // ---- exact-duplicate collapse BEFORE blocking (the d17 pair-mass
    // fix, lossless by construction). Records with IDENTICAL
    // (name, nation, segment) collide in ALL 9 masked blocks, so a
    // duplicate group of size g used to contribute 9·g²/2 candidate
    // pairs — the superlinear term the sf1 bench kept flagging, growing
    // with duplicate-name density. Connectivity needs none of that: one
    // STAR of g−1 edges to the group's min-key member links the group,
    // and blocking then runs over one REPRESENTATIVE per distinct name.
    // Within a block all representatives share 8 fixed digits and
    // differ at the masked one, so a block holds ≤ |alphabet| reps and
    // the rep-level pair mass is structurally bounded — no recall-losing
    // frequency cap needed. Components are unchanged: within a group
    // the star replaces the clique (same connectivity, and the rep IS
    // the group minimum so min-labels are preserved); across groups a
    // rep–rep edge stands in for every member–member edge the old
    // all-pairs form emitted (members reach each other through their
    // reps).
    val reps = c
      .groupBy(col("c_name"), col("c_nationkey"), col("c_mktsegment"))
      .agg(min(col("c_custkey")).as("rep"), first(col("digits")).as("digits"))
      .ckpt // consumers: star edges, blocking keys, the verify name join
    val star = c
      .join(reps.select(col("c_name"), col("c_nationkey"),
        col("c_mktsegment"), col("rep")),
        Seq("c_name", "c_nationkey", "c_mktsegment"))
      .filter(col("c_custkey") =!= col("rep"))
      .select(col("rep").as("src"), col("c_custkey").as("dst"))
    val keyed = reps
      .select(col("rep"), col("c_nationkey"), col("c_mktsegment"),
        explode(sequence(lit(1), lit(9))).as("wpos"), col("digits"))
      .select(col("rep"), col("c_nationkey"), col("c_mktsegment"),
        col("wpos"),
        expr("concat(substring(digits, 1, wpos-1), '_', substring(digits, wpos+1))")
          .as("bkey"))
    val a = keyed.select(col("bkey"), col("wpos"), col("c_nationkey"),
      col("c_mktsegment"), col("rep").as("s1"))
    val b = keyed.select(col("bkey"), col("wpos"), col("c_nationkey"),
      col("c_mktsegment"), col("rep").as("s2"))
    val cands = a.join(b, Seq("bkey", "wpos", "c_nationkey", "c_mktsegment"))
      .filter(col("s1") < col("s2"))
      .select(col("s1"), col("s2"))
      .distinct()
    val names = reps.select(col("rep"), col("c_name"))
    val verified = cands
      .join(names.select(col("rep").as("s1"), col("c_name").as("n1")), Seq("s1"))
      .join(names.select(col("rep").as("s2"), col("c_name").as("n2")), Seq("s2"))
      .filter(levenshtein(col("n1"), col("n2")) <= 1)
      .select(col("s1").as("src"), col("s2").as("dst"))
    val edges = star.unionByName(verified)
      .ckpt // consumers: the touched-vertex projection AND the CC edges
    // CC over the EDGE-TOUCHED vertices only: an isolated customer can
    // only form a singleton component, which the csize >= 2 filter drops
    // — feeding the full customer table would shuffle |customers| rows
    // through every pointer-jumping superstep (and its per-superstep
    // checkpoint) to compute labels the query then discards. The match
    // worklist is duplicate-name-sized, corpus-size-independent.
    val touched = edges.select(col("src").as("id"))
      .unionByName(edges.select(col("dst").as("id")))
      .distinct()
    val comp = graft.text.Dedup.connectedComponents(edges, touched)
      .select(col("id").as("c_custkey"), col("component"))
    val sizes = comp.groupBy(col("component")).agg(count(lit(1)).as("csize"))
    comp.join(sizes, Seq("component"))
      .filter(col("csize") >= 2)
      .select(col("c_custkey"), col("component"), col("csize"))
      .orderBy(col("component"), col("c_custkey"))
  }

  private val resolveOracle =
    """WITH RECURSIVE c AS (SELECT c_custkey, c_name, c_nationkey, c_mktsegment,
      |                  substring(c_name, 10) AS digits FROM customer),
      |k AS (SELECT c_custkey, c_nationkey, c_mktsegment, i AS wpos,
      |             substring(digits,1,i-1) || '_' || substring(digits,i+1) AS bkey
      |      FROM c, LATERAL unnest(generate_series(1,9)) AS u(i)),
      |e0 AS (SELECT DISTINCT a.c_custkey AS s1, b.c_custkey AS s2
      |       FROM k a JOIN k b ON a.bkey = b.bkey AND a.wpos = b.wpos
      |         AND a.c_nationkey = b.c_nationkey
      |         AND a.c_mktsegment = b.c_mktsegment
      |         AND a.c_custkey < b.c_custkey),
      |ev AS (SELECT e0.s1, e0.s2 FROM e0
      |       JOIN c a ON a.c_custkey = e0.s1 JOIN c b ON b.c_custkey = e0.s2
      |       WHERE levenshtein(a.c_name, b.c_name) <= 1),
      |e AS (SELECT s1 AS src, s2 AS dst FROM ev UNION SELECT s2, s1 FROM ev),
      |r AS (SELECT c_custkey AS id, c_custkey AS reach FROM customer
      |      UNION SELECT r.id, e.dst FROM r JOIN e ON r.reach = e.src),
      |comp AS (SELECT id, CAST(MIN(reach) AS BIGINT) AS component
      |         FROM r GROUP BY id),
      |cs AS (SELECT component, CAST(COUNT(*) AS BIGINT) AS csize
      |       FROM comp GROUP BY component)
      |SELECT comp.id AS c_custkey, comp.component, cs.csize
      |FROM comp JOIN cs USING (component)
      |WHERE cs.csize >= 2
      |ORDER BY component, c_custkey""".stripMargin

  val qs: Seq[Q] = Seq(
    Q("q177_entity_resolution", (s, d) => resolveCustomers(s, d),
      Some(resolveOracle)))
}
