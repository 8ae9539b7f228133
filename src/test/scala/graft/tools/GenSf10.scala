package graft.tools

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** One-off sf10 probe data (verdict r17 task 7): 100-replica key-offset
  * copies of sf0.1's `lineitem` and `documents` ONLY — the two tables
  * the pair/posting families read — for a third scaling point above
  * sf1. Never used by the correctness gate.
  *
  * Text perturbation generalizes GenSf1's: GenSf1's vowel/consonant
  * rotation yields only 10 distinct maps, so at 100 replicas every doc
  * would gain 9 EXACT twins and the shingle families would measure a
  * replication artifact (quadratic bucket growth), not engine scaling.
  * Here each replica composes a 10-letter rotation keyed by `i % 10`
  * with a second 10-letter rotation keyed by `i / 10` — 100 distinct
  * injective character maps, so cross-replica shingle overlap vanishes
  * exactly as in real 100× data. Replica 0 is the identity (the
  * original rows survive verbatim, as in GenSf1).
  *
  * Usage: Test/runMain graft.tools.GenSf10 <sf0.1 dir> <out dir> [reps]
  */
object GenSf10 {

  def main(args: Array[String]): Unit = {
    val in = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val out = if (args.length > 1) args(1) else "/tmp/graft_sf10"
    val replicas = if (args.length > 2) args(2).toInt else 100

    val spark = SparkSession.builder()
      .master("local[16]")
      .appName("gen-sf10")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def tbl(name: String): DataFrame = spark.read.parquet(s"$in/$name.parquet")
    def write(df: DataFrame, name: String): Unit = {
      df.write.mode(SaveMode.Overwrite).parquet(s"$out/$name.parquet")
      println(s"wrote $name: ${spark.read.parquet(s"$out/$name.parquet").count()} rows")
    }
    def stride(df: DataFrame, key: String): Long = {
      val mx = df.agg(max(col(key))).head().getLong(0)
      var s = 10L
      while (s <= mx) s *= 10
      s
    }
    def rep(df: DataFrame)(f: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until replicas).map(i => f(df, i)).reduce(_ unionByName _)

    val lineitem = tbl("lineitem")
    val documents = tbl("documents")
    val O = stride(lineitem, "l_orderkey")
    val P = stride(lineitem, "l_partkey")
    val S = stride(lineitem, "l_suppkey")
    val D = stride(documents, "doc_id")
    println(s"strides: O=$O P=$P S=$S D=$D replicas=$replicas")

    write(rep(lineitem)((df, i) =>
      df.withColumn("l_orderkey", col("l_orderkey") + lit(i * O))
        .withColumn("l_partkey", col("l_partkey") + lit(i * P))
        .withColumn("l_suppkey", col("l_suppkey") + lit(i * S))), "lineitem")

    // 100 distinct injective maps: rotate one letter set by i%10 and a
    // disjoint set by i/10 — composition is injective (translate with a
    // permutation of the same alphabet), identity at i=0
    def rot(s: String, k: Int): String = s.drop(k % s.length) + s.take(k % s.length)
    val setA = "aeioulnrst"
    val setB = "bcdfgmpvwy"
    write(rep(documents) { (df, i) =>
      val txt =
        if (i == 0) col("text")
        else translate(
          translate(col("text"), setA, rot(setA, i % 10)),
          setB, rot(setB, (i / 10) % 10))
      df.withColumn("doc_id", col("doc_id") + lit(i * D))
        .withColumn("text", txt)
        .withColumn("n_chars", length(txt).cast("long"))
    }, "documents")

    spark.stop()
  }
}
