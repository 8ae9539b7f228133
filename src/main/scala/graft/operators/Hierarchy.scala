package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hierarchy flattening (SURVEY §1.1 — `TreeNode<T>`,
  * src/Smartstore/Collections/TreeNode.cs; the category tree is built
  * from an adjacency-list table and flattened for faceting,
  * `LinqCatalogSearchService.cs:385-386`; "no recursive SQL" in the
  * reference — it loads and walks in memory).
  *
  * Spark expression: iterative level-wise joins from the roots (the
  * standard bounded-depth recursion; each level is one equi-join on the
  * parent key). Hierarchy dimensions are small (categories), so levels
  * broadcast; for deep/large graphs an iterative Pregel-style loop with
  * checkpointing replaces this. Output: id, name, depth, path (the
  * reference's `Flatten()` contract, path built like its slug chains).
  */
object Hierarchy {

  /** @param edges frame with (idCol, parentCol nullable, nameCol) */
  def flatten(edges: DataFrame, idCol: String = "id",
      parentCol: String = "parent_id", nameCol: String = "name",
      maxDepth: Int = 20, sep: String = "/"): DataFrame = {
    var level = edges.filter(col(parentCol).isNull)
      .select(col(idCol), col(nameCol), lit(0).as("depth"),
        col(nameCol).as("path"))
    var acc = level
    var d = 0
    var continue = true
    while (continue && d < maxDepth) {
      val parents = level.select(col(idCol).as("__pid"),
        col("path").as("__ppath"), col("depth").as("__pdepth"))
      val next = edges
        .join(broadcast(parents), col(parentCol) === col("__pid"))
        .select(col(idCol), col(nameCol), (col("__pdepth") + 1).as("depth"),
          concat(col("__ppath"), lit(sep), col(nameCol)).as("path"))
      if (next.isEmpty) continue = false
      else { acc = acc.unionByName(next); level = next; d += 1 }
    }
    acc
  }

  /** Subtree selection: all rows whose path sits under the given node's
    * path — the flattened-tree filter used for category facets. */
  def subtree(flattened: DataFrame, rootPath: String, sep: String = "/"): DataFrame =
    flattened.filter(col("path") === rootPath ||
      col("path").startsWith(rootPath + sep))

  /** Integrity probe: nodes `flatten` can NEVER reach from the roots —
    * orphaned parent references (parent deleted upstream), self-parented
    * rows, and cycle members. `flatten` drops them silently (exactly like
    * the recursive-CTE oracle restating it), so pipelines ingesting dirty
    * adjacency lists should assert this frame is empty — or route it to
    * the error channel — before trusting the flattened tree. */
  def orphans(edges: DataFrame, idCol: String = "id",
      parentCol: String = "parent_id", nameCol: String = "name",
      maxDepth: Int = 20): DataFrame =
    edges.join(flatten(edges, idCol, parentCol, nameCol, maxDepth)
      .select(col(idCol)), Seq(idCol), "left_anti")
}
