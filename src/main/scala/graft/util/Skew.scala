package graft.util

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot grouping keys: salted two-phase aggregation.
  *
  * A `groupBy(key).agg(...)` with one dominant key funnels that key's
  * entire volume through a single reducer. Salting splits each key into
  * `salts` sub-groups for the partial aggregation (phase 1 — spreads the
  * hot key over `salts` reducers), then combines the partials in a second,
  * tiny aggregation keyed on the true key (phase 2 — `salts` rows per key).
  *
  * Only algebraic aggregates compose this way; sums and counts are
  * provided (avg = sum/count at the call site). AQE's skew handling covers
  * joins; this covers aggregations, where Spark has no automatic salt.
  *
  * The salt is deterministic (hash of supplementary columns or a
  * row-random-free modulus over a unique id) so results stay reproducible.
  */
object Skew {

  /** Salted count+sum per key. `saltBy` must be a column that varies
    * within a key (e.g. a unique row id); results are identical to the
    * unsalted aggregation, reproducibly. */
  def saltedSumCount(df: DataFrame, keyCol: String, valueCol: String,
      saltBy: Column, salts: Int = 16): DataFrame =
    df.withColumn("__salt", pmod(hash(saltBy), lit(salts)))
      .groupBy(col(keyCol), col("__salt"))
      .agg(sum(col(valueCol)).as("__psum"), count(lit(1)).as("__pcnt"))
      .groupBy(col(keyCol))
      .agg(sum(col("__psum")).as(s"sum_$valueCol"), sum(col("__pcnt")).as("n"))
}
