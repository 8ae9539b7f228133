package graft

import graft.operators.Hierarchy
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Hierarchy flatten/subtree semantics on a 3-level tree. */
class HierarchySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def edges = Seq(
    ("1", null.asInstanceOf[String], "root"),
    ("2", "1", "electronics"),
    ("3", "1", "books"),
    ("4", "2", "phones"),
    ("5", "4", "android"),
    ("6", null.asInstanceOf[String], "root2")
  ).toDF("id", "parent_id", "name")

  test("flatten produces depth and slash paths for every node") {
    val got = Hierarchy.flatten(edges).collect()
      .map(r => r.getString(0) -> (r.getInt(2), r.getString(3))).toMap
    assert(got("1") == (0, "root"))
    assert(got("4") == (2, "root/electronics/phones"))
    assert(got("5") == (3, "root/electronics/phones/android"))
    assert(got("6") == (0, "root2"))
    assert(got.size == 6)
  }

  test("subtree selects a node and its descendants only") {
    val flat = Hierarchy.flatten(edges)
    val sub = Hierarchy.subtree(flat, "root/electronics")
      .select(col("id")).as[String].collect().sorted.toSeq
    assert(sub == Seq("2", "4", "5"))
  }

  test("cycle-free termination on maxDepth") {
    // a cycle (2 ↔ 3) never reaches a root, so it simply doesn't appear
    val cyc = Seq(("1", null.asInstanceOf[String], "r"), ("2", "3", "a"),
      ("3", "2", "b")).toDF("id", "parent_id", "name")
    val flat = Hierarchy.flatten(cyc, maxDepth = 5)
    assert(flat.select("id").as[String].collect().toSeq == Seq("1"))
  }
}
