package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed `Aggregator` for element-wise vector sums — the UDAF extension
  * surface of the engine (complementing the custom codegen Expressions).
  *
  * Prefer the relational posexplode→sum path when the result feeds more
  * SQL (it is oracle-checkable and partial-aggregates per dimension); use
  * this Aggregator when a whole `array<double>` must stay one value per
  * group (e.g. handing centroids straight to a driver-side probe). Merge
  * is element-wise add — commutative and associative, so partial
  * aggregation applies as usual.
  */
object VectorAgg {

  private def addInto(acc: Array[Double], v: Seq[Double]): Array[Double] = {
    if (acc.isEmpty) return v.toArray
    var i = 0
    val n = math.min(acc.length, v.length)
    while (i < n) { acc(i) += v(i); i += 1 }
    acc
  }

  val vectorSum: Aggregator[Seq[Double], Array[Double], Seq[Double]] =
    new Aggregator[Seq[Double], Array[Double], Seq[Double]] {
      override def zero: Array[Double] = Array.emptyDoubleArray
      override def reduce(acc: Array[Double], v: Seq[Double]): Array[Double] = addInto(acc, v)
      override def merge(a: Array[Double], b: Array[Double]): Array[Double] =
        if (a.isEmpty) b else addInto(a, b.toSeq)
      override def finish(acc: Array[Double]): Seq[Double] = acc.toSeq
      override def bufferEncoder: Encoder[Array[Double]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
      override def outputEncoder: Encoder[Seq[Double]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
    }

  /** Column form: `df.groupBy(...).agg(VectorAgg.vectorSumCol(col("emb")))`. */
  def vectorSumCol(c: Column): Column = udaf(vectorSum).apply(c)
}
