package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The unwind/flatten ETL (reference R1, `transform-seed.py:64-94`):
  * one catalog row with a nested `products` array → N product rows.
  *
  * Reference semantics preserved:
  *   - every parent field copied except the array itself (and any
  *     explicitly excluded columns — the reference drops
  *     `description_embeddings`/`image_embeddings`, `transform-seed.py:72-76`);
  *   - `catalogId` added = parent `_id` (`transform-seed.py:78-80`);
  *   - the output row's `_id` re-rooted to the element's own `_id`
  *     (`transform-seed.py:82-91`);
  *   - the element kept nested as a `product` struct (`transform-seed.py:93`).
  *
  * The reference runs this client-side in a Python loop with manual
  * 500-doc insert batches; in Spark it is a single narrow `explode` — no
  * shuffle, fully pipelined into the Parquet write, which batches natively
  * (SURVEY S2). At 100 TB this scales linearly with input splits.
  */
object Flatten {

  /** Generic unwind: parent columns (minus exclusions) + exploded element.
    * `explode` drops rows with null/empty arrays — matching the reference,
    * whose per-product loop emits nothing for an empty `products` array. */
  def unwind(df: DataFrame, arrayCol: String, elemAlias: String,
      exclude: Seq[String] = Nil): DataFrame = {
    val keep = df.columns.filterNot(c => c == arrayCol || exclude.contains(c))
    df.select(keep.map(col).toIndexedSeq :+ explode(col(arrayCol)).as(elemAlias): _*)
  }

  /** The exact catalog → product_detail transform of the reference. */
  def productDetail(catalog: DataFrame,
      exclude: Seq[String] = Seq("description_embeddings", "image_embeddings")): DataFrame =
    unwind(catalog.withColumnRenamed("_id", "catalogId"), "products", "product", exclude)
      .withColumn("_id", col("product._id"))
}
