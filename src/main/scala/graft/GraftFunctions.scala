package graft

import graft.functions.MinHashShingleSig
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SQL-surface registration for the engine's custom expressions, so
  * `spark.sql` users (the reference's raw-SQL escape hatch, SURVEY §2.1
  * S6) can call them without the Scala API:
  *
  *   SELECT graft_minhash(split(text, ' '), 16, 3) FROM docs
  *
  * Two entry points: `register(spark)` for an existing session, and
  * `GraftExtensions` for `spark.sql.extensions=graft.GraftExtensions`
  * (cluster-wide injection at session build, the SparkSessionExtensions
  * path). */
object GraftFunctions {

  private def intArg(e: Expression, name: String): Int = e match {
    case Literal(v: Int, _) => v
    case Literal(v: Long, _) => v.toInt
    case other => throw new IllegalArgumentException(
      s"graft_minhash: $name must be an integer literal, got $other")
  }

  private[graft] def minhashBuilder(exprs: Seq[Expression]): Expression = exprs match {
    case Seq(tokens) => MinHashShingleSig(tokens, 16, 3)
    case Seq(tokens, k) => MinHashShingleSig(tokens, intArg(k, "k"), 3)
    case Seq(tokens, k, n) =>
      MinHashShingleSig(tokens, intArg(k, "k"), intArg(n, "shingleN"))
    case _ => throw new IllegalArgumentException(
      "graft_minhash(tokens[, k[, shingleN]])")
  }

  val minhashInfo = new ExpressionInfo(
    classOf[MinHashShingleSig].getName, "graft_minhash")

  /** Register on a live session (temp functions). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_minhash", minhashBuilder, "built-in")
}

/** Session-extension injection point:
  * `--conf spark.sql.extensions=graft.GraftExtensions`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    e.injectFunction((
      FunctionIdentifier("graft_minhash"),
      GraftFunctions.minhashInfo,
      GraftFunctions.minhashBuilder _))
}
