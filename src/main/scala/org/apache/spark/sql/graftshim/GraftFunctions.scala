package org.apache.spark.sql.graftshim

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graftshim.VectorExpressions.{DotProduct, SquaredDistance}

/** SQL registration of the graft expressions so `spark.sql` users get the
  * codegen'd primitives too: `graft_dot(a, b)`, `graft_sqdist(a, b)`,
  * `graft_gate_stats(tokens)` (the one-pass quality-gate statistics array
  * — layout [[graft.text.TextAnalysis.GateSets]]: n, distinct, stopwords,
  * then one marker count per language code ascending).
  * Registered per-session ([[register]]) or cluster-wide via
  * [[GraftSparkExtensions]]. */
object GraftFunctions {

  val all: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_dot" -> { exprs => DotProduct(exprs(0), exprs(1)) },
    "graft_sqdist" -> { exprs => SquaredDistance(exprs(0), exprs(1)) },
    "graft_gate_stats" -> { exprs =>
      TextExpressions.TokenSetStats(exprs(0), graft.text.TextAnalysis.GateSets)
    },
  )

  def register(spark: SparkSession): Unit =
    all.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry.registerFunction(
        FunctionIdentifier(name),
        new ExpressionInfo(VectorExpressions.getClass.getCanonicalName, name),
        builder)
    }
}
