package graft

import org.scalatest.funsuite.AnyFunSuite

/** Relation-cache semantics: plans are reused within a session, keyed by
  * the session's globally-unique id (not identityHashCode, which can
  * collide across live/recycled sessions), and distinct per (dir, table). */
class TablesCacheSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("same session + dir + table returns the cached relation") {
    val a = Tables.table(spark, TestSpark.sfDir, "nation")
    val b = Tables.table(spark, TestSpark.sfDir, "nation")
    assert(a eq b) // same DataFrame instance — no re-listing, no re-read of footers
  }

  test("different tables and dirs cache separately") {
    val a = Tables.table(spark, TestSpark.sfDir, "nation")
    val b = Tables.table(spark, TestSpark.sfDir, "region")
    assert(!(a eq b))
    assert(a.columns.toSeq != b.columns.toSeq)
  }

  test("a sibling session gets its own relation bound to itself") {
    val sibling = spark.newSession()
    val a = Tables.table(spark, TestSpark.sfDir, "nation")
    val b = Tables.table(sibling, TestSpark.sfDir, "nation")
    assert(!(a eq b))
    assert(b.sparkSession eq sibling) // not a plan bound to another session
    assert(b.count() == a.count())
  }

  test("events refuses a non-UTC session instead of silently shifting ts") {
    // Only meaningful when the generator wrote MICROS/isAdjustedToUTC=false
    // (Spark infers TimestampNTZ); the nanos-long drop is zone-independent.
    val isNtz = Tables.table(spark, TestSpark.sfDir, "events")
      .schema("ts").dataType.typeName == "timestamp_ntz"
    assume(isNtz)
    val prev = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "America/New_York")
      val ex = intercept[IllegalArgumentException] {
        Tables.events(spark, TestSpark.sfDir)
      }
      assert(ex.getMessage.contains("UTC"))
    } finally spark.conf.set("spark.sql.session.timeZone", prev)
    // and the UTC path still works after restore
    assert(Tables.events(spark, TestSpark.sfDir)
      .schema("ts").dataType.typeName == "timestamp")
  }
}
