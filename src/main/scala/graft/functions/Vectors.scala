package graft.functions

import org.apache.spark.sql.graftshim.VectorExpressions.{DotProduct, SquaredDistance}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.GraftShim

/** Vector similarity math as Column expressions over `array<double>`.
  *
  * The hot primitives (dot, squared distance) are codegen'd Catalyst
  * expressions ([[org.apache.spark.sql.graftshim.VectorExpressions]]);
  * everything stays inside Catalyst (no UDF, no serialization) and is
  * expressible 1:1 in the DuckDB oracle (`list_cosine_similarity` etc.)
  * because the accumulation order is the same sequential left-to-right.
  *
  * Semantics replicate the reference's `$vectorSearch` similarity choices —
  * cosine | dotProduct | euclidean (reference `indexes.py:28-31`) — and the
  * public Atlas score normalization (reference `backend/api.py:197` exposes
  * `vectorSearchScore`): cosine/dot → (1+s)/2, euclidean → 1/(1+d), so all
  * scores land in [0,1].
  */
object Vectors {

  /** Σ aᵢ·bᵢ — a codegen'd Catalyst expression ([[VectorExpressions]]);
    * left-to-right accumulation, the same evaluation order DuckDB uses,
    * which keeps floating-point results bit-comparable after rounding. */
  def dot(a: Column, b: Column): Column =
    GraftShim.column(DotProduct(GraftShim.expression(a), GraftShim.expression(b)))

  /** The interpreted higher-order-function rendition of [[dot]] — kept as
    * the cross-check for the codegen path (FunctionsSpec asserts equality). */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def l2norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (l2norm(a) * l2norm(b))

  def euclidean(a: Column, b: Column): Column =
    sqrt(GraftShim.column(SquaredDistance(GraftShim.expression(a), GraftShim.expression(b))))

  /** Atlas-normalized similarity score in [0,1] (reference R8 semantics). */
  def score(metric: String, a: Column, b: Column): Column = metric match {
    case "cosine"     => (lit(1.0) + cosine(a, b)) / lit(2.0)
    case "dotProduct" => (lit(1.0) + dot(a, b)) / lit(2.0)
    case "euclidean"  => lit(1.0) / (lit(1.0) + euclidean(a, b))
    case other        => throw new IllegalArgumentException(s"unknown metric: $other")
  }

  // ------------------------------------------------------- int8 quantization

  /** Symmetric per-vector int8 quantization — the standard 4–8× footprint
    * reduction for embedding stores at 100 TB scale (quantized candidate
    * scoring + exact re-rank of the shortlist). scale = max|vᵢ|/127;
    * qᵢ = floor(vᵢ/scale + 0.5) ∈ [−127, 127] (explicit half-up floor — the
    * one rounding rule Spark and DuckDB express identically; `round()`
    * half-even vs half-up differs between engines). An all-zero vector
    * quantizes to zeros with scale 0. */
  def quantizeScale(v: Column): Column =
    array_max(transform(v, x => abs(x))) / lit(127.0)

  /** array<int> of quantized components given the vector and its scale. */
  def quantizeInt8(v: Column, scale: Column): Column =
    transform(v, x =>
      when(scale === 0.0, lit(0))
        .otherwise(floor(x / scale + lit(0.5)).cast("int")))

  /** Reconstruction: qᵢ·scale. */
  def dequantize(q: Column, scale: Column): Column =
    transform(q, x => x.cast("double") * scale)

  /** Integer dot product of two quantized vectors (exact BIGINT math —
    * bit-reproducible everywhere); the approximate similarity is
    * qdot·scaleA·scaleB. */
  def dotInt(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("long") * y.cast("long")),
      lit(0L), (acc, x) => acc + x)

  /** A double[] as a Column literal (query vectors are driver-side values). */
  def vecLit(v: Array[Double]): Column = array(v.map(lit): _*)

  /** The same vector as a DuckDB SQL literal for oracle queries. */
  def vecSql(v: Array[Double]): String =
    v.map(d => f"$d%.17g").mkString("[", ", ", "]::DOUBLE[]")
}
