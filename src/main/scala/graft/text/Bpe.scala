package graft.text
import graft.Ckpt.Ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed BPE merge training — the vocabulary-induction step behind
  * the "BPE-ish" tokenization surface (SURVEY text battery): classic
  * byte-pair encoding (Sennrich et al. 2016, public algorithm) over a
  * frequency-weighted word vocabulary.
  *
  * Representation: each word is a space-separated symbol sequence seeded
  * with its characters plus the `</w>` end-of-word sentinel. One merge
  * round = (1) count adjacent symbol pairs across the vocabulary,
  * frequency-weighted — a map-side explode of per-word pair lists into
  * one hash aggregate; (2) pick the argmax pair (weight, then
  * lexicographic — fully deterministic); (3) fuse that pair in every
  * word's representation with a literal left-to-right non-overlapping
  * replace (the exact semantics of both the JVM and SQL `replace`, and
  * of the reference algorithm's merge application).
  *
  * Scale shape: training runs on the DISTINCT word vocabulary with
  * frequencies — vocabulary-sized, orders of magnitude below the corpus
  * (the corpus pass is the one word-count aggregate that produced it).
  * The per-round argmax is ONE collected row (a statistics-sized driver
  * decision, like the sketch merges in operators/Scale.scala); pair
  * counting is a partial-aggregated shuffle over symbol pairs. Rounds
  * are inherently sequential — that is BPE, not a Spark limitation.
  */
object Bpe {

  /** Seed representation: characters + the end-of-word sentinel. */
  def seed(words: DataFrame): DataFrame =
    words.select(col("word"), col("freq"),
      concat(trim(regexp_replace(col("word"), "(.)", "$1 ")), lit(" </w>"))
        .as("rep"))

  /** One round's pair weights (adjacent-symbol counts × word freq). */
  private def pairWeights(reps: DataFrame): DataFrame =
    reps.select(col("freq"), split(col("rep"), " ").as("syms"))
      .filter(size(col("syms")) >= 2)
      .select(col("freq"), explode(expr(
        "transform(sequence(0, size(syms) - 2), " +
          "i -> struct(syms[i] AS l, syms[i + 1] AS r))")).as("p"))
      .groupBy(col("p.l").as("l"), col("p.r").as("r"))
      .agg(sum(col("freq")).as("w"))

  /** ENCODE: apply an already-trained merge list, in rank order, to any
    * word table — the tokenization half of BPE. Pure column arithmetic
    * (the merges are known strings, so no per-round driver decision):
    * one two-pass fuse per merge, chained in one projection over the
    * DISTINCT word table; corpus tokenization is then a broadcast join
    * of word → subword-sequence onto the token stream. */
  def encode(words: DataFrame, merges: Seq[(Int, String, String, Long)]): DataFrame =
    merges.sortBy(_._1).foldLeft(seed(words)) { case (df, (_, l, r, _)) =>
      require(!l.contains("'") && !r.contains("'"),
        s"symbol with quote cannot be fused: '$l' '$r'")
      def fuse(in: String): String =
        s"replace(concat(' ', $in, ' '), ' $l $r ', ' $l$r ')"
      df.withColumn("rep", trim(expr(fuse(fuse("rep")))))
    }

  /** Train `rounds` merges; returns (merge table, final representations).
    * Merge list rows: (round, left, right, weight). */
  def train(words: DataFrame, rounds: Int): (Seq[(Int, String, String, Long)], DataFrame) = {
    var reps = seed(words)
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var round = 1
    var exhausted = false
    while (round <= rounds && !exhausted) {
      val best = pairWeights(reps)
        .orderBy(col("w").desc, col("l"), col("r")).limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val (l, r, w) = (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += ((round, l, r, w))
        // Literal fuse; symbols are whitespace-free tokens, so the
        // space-wrapped search can never straddle a symbol boundary.
        // TWO passes: a left-to-right replace consumes the shared
        // separator space, skipping every second occurrence in a run
        // ("a b a b" → "ab a b"); the second pass catches the stragglers
        // (now flanked by their own spaces) and provably cannot
        // over-merge — fusing removes bare-symbol adjacency, it never
        // creates it. Net effect = the canonical BPE merge application.
        def fuse(in: String): String =
          s"replace(concat(' ', $in, ' '), ' $l $r ', ' $l$r ')"
        require(!l.contains("'") && !r.contains("'"),
          s"symbol with quote cannot be fused: '$l' '$r'")
        reps = reps.withColumn("rep", trim(expr(fuse(fuse("rep")))))
        // each round builds on the previous frame's plan; checkpoint so
        // round k doesn't re-run rounds 1..k-1's replaces per action
        reps = reps.ckpt
        round += 1
      }
    }
    (merges.result(), reps)
  }
}
