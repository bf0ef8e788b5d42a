package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — the classic operator Spark lacks natively (brief §custom
  * operators): for each left row, attach the most recent right row with
  * `rightTime ≤ leftTime` for the same key.
  *
  * Built by composing built-ins (preference (a) of the custom-operator
  * ladder): tag both inputs, UNION them, and carry the latest right
  * payload forward with `last(_, ignoreNulls)` over a
  * (key, time, side, tie) window. ONE hash shuffle on the key and a
  * partition-local sort — never the range-join explosion of
  * `JOIN ON key AND rts <= lts` + row_number, which materializes every
  * (left × earlier-right) pair before pruning. This is the formulation
  * that survives 100 TB: shuffle volume = |left| + |right|.
  *
  * Determinism: right rows tie-broken by `rightTieCol` (greatest wins);
  * right rows at exactly leftTime ARE visible (≤ semantics, side ordering
  * right-before-left).
  */
object AsOfJoin {

  /** @param rightPayload right columns to carry (exposed as `asof_<name>`)
    * @return left rows + asof_<rightTime> + asof_<tie> + asof payload
    *         columns (null when no right row precedes). */
  def asOf(left: DataFrame, right: DataFrame, keyCol: String,
      leftTimeCol: String, rightTimeCol: String, rightTieCol: String,
      rightPayload: Seq[String]): DataFrame = {
    val carried = struct(
      (Seq(rightTimeCol, rightTieCol) ++ rightPayload).map(col).toIndexedSeq: _*)
    val l = left.select(
      col(keyCol).as("__key"), col(leftTimeCol).as("__t"),
      lit(1).as("__side"), lit(null).cast("long").as("__rtie"),
      struct(left.columns.map(col).toIndexedSeq: _*).as("__lrow"),
      lit(null).cast(right.select(carried).schema.head.dataType).as("__rrow"))
    val r = right.select(
      col(keyCol).as("__key"), col(rightTimeCol).as("__t"),
      lit(0).as("__side"), col(rightTieCol).cast("long").as("__rtie"),
      lit(null).cast(left.select(struct(left.columns.map(col).toIndexedSeq: _*)).schema.head.dataType).as("__lrow"),
      carried.as("__rrow"))
    val w = Window.partitionBy(col("__key"))
      .orderBy(col("__t").asc, col("__side").asc, col("__rtie").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val joined = l.unionByName(r)
      .withColumn("__asof", last(col("__rrow"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
    val leftCols = left.columns.map(c => col(s"__lrow.$c").as(c))
    val asofCols = (Seq(rightTimeCol, rightTieCol) ++ rightPayload)
      .map(c => col(s"__asof.$c").as(s"asof_$c"))
    joined.select((leftCols ++ asofCols).toIndexedSeq: _*)
  }
}
