package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.GraftStrings
import graft.text.TextFunctions

/** A/B: regex normalize+tokenize (two regex passes) vs the fused
  * single-byte-scan `GraftStrings` expressions, over the real documents
  * table. Also value-parity-checks both forms row by row on the corpus
  * (the property spec covers adversarial strings; this covers the data).
  *
  * Usage: Test/runMain graft.tools.TokAb [sfDir]
  */
object TokAb {

  private def timeMedian(mk: () => DataFrame, passes: Int = 5): Double = {
    mk().queryExecution.toRdd.count() // warm
    (1 to passes).map { _ =>
      val t0 = System.nanoTime()
      mk().queryExecution.toRdd.count()
      (System.nanoTime() - t0) / 1e9
    }.sorted.apply(passes / 2)
  }

  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("tok-ab")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").cache()
    docs.count()

    // regex forms (the pre-swap implementation, kept as *Regex twins)
    def regexToks() = docs.select(
      sum(size(TextFunctions.tokensOfRegex(
        TextFunctions.normalizeRegex(col("text"))))).as("s"))
    def nativeToks() = docs.select(
      sum(size(GraftStrings.tokensCol(col("text")))).as("s"))
    def regexScore() = docs.select(sum(TextFunctions.stopwordRatioOf(
      TextFunctions.tokensOfRegex(TextFunctions.normalizeRegex(col("text"))))).as("s"))
    def nativeScore() = docs.select(sum(TextFunctions.stopwordRatioOf(
      GraftStrings.tokensCol(col("text")))).as("s"))

    val mismToks = docs.filter(
      not(TextFunctions.tokensOfRegex(TextFunctions.normalizeRegex(col("text"))) <=>
        GraftStrings.tokensCol(col("text")))).count()
    val mismNorm = docs.filter(
      not(TextFunctions.normalizeRegex(col("text")) <=>
        GraftStrings.normalizeCol(col("text")))).count()
    println(s"parity: tokens mismatches=$mismToks, normalize mismatches=$mismNorm")

    val rt = timeMedian(() => regexToks())
    val nt = timeMedian(() => nativeToks())
    val rs = timeMedian(() => regexScore())
    val ns = timeMedian(() => nativeScore())
    println(f"tokenize:        regex $rt%.3f s   native $nt%.3f s   speedup ${rt / nt}%.2fx")
    println(f"tokenize+score:  regex $rs%.3f s   native $ns%.3f s   speedup ${rs / ns}%.2fx")
    spark.stop()
  }
}
