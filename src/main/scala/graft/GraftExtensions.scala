package graft

import graft.functions.{DeflateLen, Gammaln, JaroSimilarity, JaroWinklerSimilarity, VecDot, VecNormSq, VecSqDist}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point — makes graft's native expressions
  * available to plain SQL (`SELECT vec_dot(a, b) ...`) in any session
  * built with `.config("spark.sql.extensions", "graft.GraftExtensions")`,
  * and [[GraftExtensions.register]] does the same on an already-running
  * session (SURVEY.md §4: custom Expression registration path). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    GraftExtensions.definitions.foreach { case (name, info, builder) =>
      e.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftExtensions {
  private def info(name: String, usage: String) =
    new ExpressionInfo("graft.functions", name)

  val definitions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("vec_dot", info("vec_dot", "dot product of two array<double>"),
      (c: Seq[Expression]) => VecDot(c(0), c(1))),
    ("vec_sqdist", info("vec_sqdist", "squared L2 distance of two array<double>"),
      (c: Seq[Expression]) => VecSqDist(c(0), c(1))),
    ("vec_normsq", info("vec_normsq", "squared L2 norm of an array<double>"),
      (c: Seq[Expression]) => VecNormSq(c(0))),
    ("gammaln", info("gammaln", "log-gamma of a double"),
      (c: Seq[Expression]) => Gammaln(c(0))),
    ("deflate_len", info("deflate_len", "zlib-deflated byte length of a string"),
      (c: Seq[Expression]) => DeflateLen(c(0))),
    ("jaro_sim", info("jaro_sim", "Jaro similarity of two strings"),
      (c: Seq[Expression]) => JaroSimilarity(c(0), c(1))),
    ("jaro_winkler", info("jaro_winkler", "Jaro-Winkler similarity of two strings"),
      (c: Seq[Expression]) => JaroWinklerSimilarity(c(0), c(1))))

  /** Register the functions on a live session (no restart needed). */
  def register(spark: SparkSession): Unit =
    definitions.foreach { case (name, inf, builder) =>
      spark.sessionState.functionRegistry
        .registerFunction(FunctionIdentifier(name), inf, builder)
    }
}
