package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated star schema (see /root/repo/TESTDATA.md).
  *
  * Mirrors the reference's entity scans (SURVEY §2.1 S4 — e.g.
  * `DataExporter.cs:735`, `LinqCatalogSearchService.cs:107`): each entity set
  * is exposed as a lazily-scanned relation. On a cluster these reads are
  * partition-parallel parquet scans; Catalyst pushes filters and prunes
  * columns into the scan, so callers should compose filters/projections
  * BEFORE any action (the reference achieves the same via IQueryable
  * composition before materialization).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders", "lineitem",
    "events", "documents", "embeddings")

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, dir: String): DataFrame = table(s, dir, "region")
  def nation(s: SparkSession, dir: String): DataFrame = table(s, dir, "nation")
  def customer(s: SparkSession, dir: String): DataFrame = table(s, dir, "customer")
  def supplier(s: SparkSession, dir: String): DataFrame = table(s, dir, "supplier")
  def part(s: SparkSession, dir: String): DataFrame = table(s, dir, "part")
  def orders(s: SparkSession, dir: String): DataFrame = table(s, dir, "orders")
  def lineitem(s: SparkSession, dir: String): DataFrame = table(s, dir, "lineitem")
  def events(s: SparkSession, dir: String): DataFrame = table(s, dir, "events")
  def documents(s: SparkSession, dir: String): DataFrame = table(s, dir, "documents")
  def embeddings(s: SparkSession, dir: String): DataFrame = table(s, dir, "embeddings")
}
