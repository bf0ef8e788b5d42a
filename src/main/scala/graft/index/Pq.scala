package graft.index

import graft.search.VectorSearch
import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization (PQ) — the vector-COMPRESSION half of the classic
  * IVF-PQ architecture (Jégou/Douze/Schmid, "Product Quantization for
  * Nearest Neighbor Search", TPAMI 2011). [[Ivf]] narrows WHICH vectors a
  * probe scans; PQ shrinks WHAT a scan reads per vector: the 100 TB corpus
  * of `dim × 4 B` float embeddings becomes `m` one-byte codes per vector
  * (64-dim float32 → 8 codes = 32× less scan IO), with full-precision
  * vectors touched only for the final re-rank of a small candidate set.
  * The reference's Atlas index solves this server-side (out of repo); this
  * is the Spark-native rendition of the same memory/recall trade.
  *
  * Model: the vector is split into `m` contiguous subvectors of
  * `dim/m` dims; each subspace gets its own KMeans codebook of `ksub`
  * centroids (pinned seed, trained per subspace — `m` independent fits over
  * `n × dim/m` slices); a vector's code is the per-subspace nearest
  * centroid, ties to the lowest code id. `ksub` defaults small (16) for
  * test-sized corpora; production PQ uses 256 (one byte exactly) — both are
  * parameters, nothing assumes a width.
  *
  * Query (ADC — asymmetric distance computation): the query stays
  * full-precision; per subspace a `ksub`-entry lookup table of
  * ⟨query-subvector, centroid⟩ dot products (plus one of centroid squared
  * norms, for cosine/euclidean) is computed DRIVER-side (m × ksub × dim/m
  * multiply-adds — microseconds), and scanning a vector is `m` array
  * lookups. The scan is pure built-ins (`transform` with index +
  * `aggregate` over the tiny LUT literals — whole-stage-codegen'd, no UDF
  * in the query path); candidates = ADC top-`overfetch`
  * (TakeOrderedAndProject), then an exact re-rank of only those ids.
  *
  * `overfetch ≥ n` makes the candidate set the whole corpus, so the
  * re-rank IS the exact search — the oracle-checkable mode (the
  * [[Ivf.ann]] exhaustive-degenerate pattern); sub-exhaustive recall is
  * PqSpec-tested, not hash-gated (codebook geometry is not
  * SQL-reproducible).
  */
object Pq {

  /** @param codes     (id, codes array<int> length m) — the compressed corpus
    * @param codebooks m × ksub × (dim/m) centroids, driver-side (a few KB)
    * @param metric    similarity fixed at DDL time, enforced at probe
    *                   ([[Ivf.IvfIndex]]'s contract)
    * @param dim       vector dimensionality fixed at DDL time
    * @param n         indexed-vector count (exhaustive-probe short-circuit) */
  final case class PqIndex(
      codes: DataFrame,
      codebooks: Array[Array[Array[Double]]],
      metric: String,
      dim: Int,
      n: Long) {
    def m: Int = codebooks.length
    def ksub: Int = codebooks.head.length
    def dsub: Int = codebooks.head.head.length
  }

  /** Train codebooks and encode the corpus (the offline index-build job,
    * like [[Ivf.build]]). At 100 TB, train on a driver-friendly SAMPLE and
    * encode the full corpus — codebook quality saturates at ~100k training
    * points per subspace (the standard Faiss practice); pass the sample as
    * `train` and the corpus through [[encode]] afterwards. */
  def build(embs: DataFrame, idCol: String, embCol: String,
      m: Int = 8, ksub: Int = 16, seed: Long = 42L,
      metric: String = "cosine"): PqIndex = {
    require(VectorSearch.Metrics.contains(metric),
      s"metric must be one of ${VectorSearch.Metrics}, got '$metric'")
    val first = embs.select(size(col(embCol))).limit(1).collect()
    require(first.nonEmpty, "cannot build a PQ index over zero vectors")
    val dim = first.head.getInt(0)
    require(dim % m == 0, s"dim $dim must be divisible by m=$m subspaces")
    val dsub = dim / m
    val codebooks = (0 until m).map { j =>
      val sub = embs.select(array_to_vector(
        slice(col(embCol).cast("array<double>"), j * dsub + 1, dsub)).as("features"))
      val model = new KMeans().setK(ksub).setSeed(seed + j).setMaxIter(10)
        .setFeaturesCol("features").setPredictionCol("code")
        .fit(sub)
      model.clusterCenters.map(_.toArray)
    }.toArray
    val codes = encode(embs, idCol, embCol, codebooks, dim)
    PqIndex(codes, codebooks, metric, dim, embs.count())
  }

  /** Encode vectors against trained codebooks: (id, codes). A Scala UDF by
    * the same justification as [[Ivf.assignToNearest]]: the per-subspace
    * argmin over ksub centroid arrays has no built-in rendition short of
    * exploding rows × m × ksub through joins, and encoding is the OFFLINE
    * half — the query path never runs it. Ties go to the lowest code id
    * (strict `<`), so codes are reproducible across partitionings. */
  def encode(embs: DataFrame, idCol: String, embCol: String,
      codebooks: Array[Array[Array[Double]]], dim: Int): DataFrame = {
    val spark = embs.sparkSession
    val bc = spark.sparkContext.broadcast(codebooks)
    val m = codebooks.length
    val dsub = dim / m
    val enc = udf { (v: Seq[Double]) =>
      require(v.length == dim, s"vector dimension ${v.length} != index numDimensions $dim")
      val arr = v.toArray
      Array.tabulate(m) { j =>
        val cb = bc.value(j)
        var best = 0; var bestD = Double.MaxValue
        var c = 0
        while (c < cb.length) {
          var s = 0.0; var i = 0
          while (i < dsub) {
            val d = cb(c)(i) - arr(j * dsub + i); s += d * d; i += 1
          }
          if (s < bestD) { bestD = s; best = c }
          c += 1
        }
        best
      }.toSeq
    }
    embs.select(col(idCol).as("id"), enc(col(embCol).cast("array<double>")).as("codes"))
  }

  /** Reconstruct the quantized approximation of a code sequence
    * (driver-side; spec/debug surface). */
  def reconstruct(index: PqIndex, codes: Seq[Int]): Array[Double] =
    codes.zipWithIndex.flatMap { case (c, j) => index.codebooks(j)(c) }.toArray

  /** Global reconstruction-error receipts: (count, Σ ‖x − x̂‖) where x̂
    * is each vector's nearest-codeword reconstruction — the PQ drift
    * monitor's per-wave measurement
    * ([[graft.index.IndexStore.planRetrain]]): a wave drawn from the
    * trained distribution averages ≈ the train-time residual, a drifted
    * wave measurably exceeds it (codebooks trained elsewhere quantize it
    * badly). One map-side-combinable aggregation; the per-subspace
    * argmin is the same loop [[encode]] runs. */
  def quantizationStats(embs: DataFrame, embCol: String,
      codebooks: Array[Array[Array[Double]]], dim: Int): (Long, Double) = {
    val spark = embs.sparkSession
    val bc = spark.sparkContext.broadcast(codebooks)
    val m = codebooks.length
    val dsub = dim / m
    val err = udf { (v: Seq[Double]) =>
      require(v.length == dim,
        s"vector dimension ${v.length} != index numDimensions $dim")
      val arr = v.toArray
      var total = 0.0
      var j = 0
      while (j < m) {
        val cb = bc.value(j)
        var bestD = Double.MaxValue; var c = 0
        while (c < cb.length) {
          var s = 0.0; var i = 0
          while (i < dsub) {
            val d = cb(c)(i) - arr(j * dsub + i); s += d * d; i += 1
          }
          if (s < bestD) bestD = s
          c += 1
        }
        total += bestD
        j += 1
      }
      math.sqrt(total)
    }
    val r = embs.select(err(col(embCol).cast("array<double>")).as("__e"))
      .agg(count(lit(1)), sum(col("__e"))).head()
    (r.getLong(0), if (r.isNullAt(1)) 0.0 else r.getDouble(1))
  }

  /** ADC approximate score column over a `codes` column, matching the
    * index metric's ranking direction (higher = closer for all three —
    * euclidean is negated squared distance):
    *
    *   dot(q, x̂)   = Σ_j lutDot[j·ksub + code_j]
    *   ‖x̂‖²        = Σ_j lutNorm[j·ksub + code_j]
    *   cosine      → dot / (‖q‖·√‖x̂‖²);  dotProduct → dot;
    *   euclidean   → −(‖q‖² − 2·dot + ‖x̂‖²)
    *
    * Pure built-ins over two m×ksub literal arrays — codegen'd, no UDF. */
  def adcScore(index: PqIndex, queryVec: Array[Double], codesCol: Column): Column = {
    require(queryVec.length == index.dim,
      s"query vector dimension ${queryVec.length} != index numDimensions ${index.dim}")
    val m = index.m; val ksub = index.ksub; val dsub = index.dsub
    val lutDot = Array.tabulate(m, ksub) { (j, c) =>
      var s = 0.0; var i = 0
      while (i < dsub) { s += queryVec(j * dsub + i) * index.codebooks(j)(c)(i); i += 1 }
      s
    }.flatten
    val lutNorm = Array.tabulate(m, ksub) { (j, c) =>
      var s = 0.0; var i = 0
      while (i < dsub) { val x = index.codebooks(j)(c)(i); s += x * x; i += 1 }
      s
    }.flatten
    // typedlit → one ArrayType Literal (not a CreateArray re-evaluated per
    // lookup inside the lambda) — the LUT is a true constant in the plan
    def lookupSum(lut: Array[Double]): Column = aggregate(
      zip_with(codesCol, sequence(lit(0), lit(m - 1)),
        (c, j) => element_at(typedlit(lut.toSeq), j * ksub + c + 1)),
      lit(0.0), (acc, x) => acc + x)
    val dot = lookupSum(lutDot)
    lazy val norm2 = lookupSum(lutNorm)
    val qn2 = queryVec.map(x => x * x).sum
    index.metric match {
      case "dotProduct" => dot
      case "cosine" =>
        // zero-norm guard: a (near-)zero embedding reconstructs to a
        // ~zero centroid, and 0/0 = NaN sorts ABOVE every finite score
        // in a descending order — junk rows would fill the overfetch
        // window and evict true neighbors, silently wrecking recall.
        // Score such codes 0: cosine to the zero vector is undefined,
        // and 0 keeps them out of the candidate window (the re-rank
        // scores its survivors with the exact kernel anyway).
        when(norm2 <= lit(0.0), lit(0.0))
          .otherwise(dot / (lit(math.sqrt(qn2)) * sqrt(norm2)))
      case "euclidean"  => -(lit(qn2) - lit(2.0) * dot + norm2)
    }
  }

  /** IVF-PQ composed ANN — the full two-level architecture every
    * billion-vector deployment runs (Faiss `IndexIVFPQ`): the IVF probe
    * picks WHICH clusters to visit (`numCandidates` mass, skipping
    * ~`1 − numCandidates/N` of the corpus), the ADC scan scores ONLY those
    * members from their m-byte codes (never touching the float vectors),
    * and the exact re-rank reads full vectors for just the top-`overfetch`
    * survivors. Total float-vector IO: `overfetch` rows — at 100 TB the
    * difference between a scan and a lookup.
    *
    * Both indexes must share the DDL contract (metric, dim) and must have
    * been built over the same table (corpus ids ⊆ both — [[Ivf.knnJoin]]'s
    * coverage contract). Exhaustive settings (`numCandidates ≥ N` and
    * `overfetch ≥ n`) short-circuit to the exact scan; `forceRerank = true`
    * runs the full composed plan anyway — the verification mode
    * (`q_ann_ivfpq` hash-checks it against the exact-kNN oracle at the one
    * depth where its output is provably exact). */
  def annIvf(ivf: Ivf.IvfIndex, index: PqIndex, table: DataFrame,
      idCol: String, embCol: String, queryVec: Array[Double], k: Int,
      numCandidates: Int, overfetch: Int,
      metric: String = "cosine", preFilter: Option[Column] = None,
      forceRerank: Boolean = false): DataFrame = {
    require(metric == index.metric && metric == ivf.metric,
      s"composed probe metric '$metric' must match both indexes " +
        s"(ivf '${ivf.metric}', pq '${index.metric}')")
    require(index.dim < 0 || ivf.dim < 0 || index.dim == ivf.dim,
      s"ivf numDimensions ${ivf.dim} != pq numDimensions ${index.dim}")
    require(queryVec.length == index.dim,
      s"query vector dimension ${queryVec.length} != index numDimensions ${index.dim}")
    val probe = Ivf.probeSet(ivf, queryVec, numCandidates)
    val exhaustiveIvf = probe.map(ivf.sizes.getOrElse(_, 0L)).sum == ivf.sizes.values.sum
    if (!forceRerank && exhaustiveIvf && overfetch >= index.n)
      return VectorSearch.knn(table, idCol, embCol, queryVec, k, metric, preFilter)
    val members = ivf.assignments
      .where(col("cluster").isin(probe: _*))
      .select(col("id"))
    val candidates = filterCodes(index, table, idCol, preFilter)
      .join(members, "id")
      .withColumn("__adc", adcScore(index, queryVec, col("codes")))
      .orderBy(col("__adc").desc, col("id").asc)
      .limit(overfetch)
      .select(col("id").as("__pq_id"))
    val narrowed = table.join(
      broadcast(candidates), table(idCol) === col("__pq_id")).drop("__pq_id")
    VectorSearch.knn(narrowed, idCol, embCol, queryVec, k, metric, preFilter)
  }

  /** Atlas filter placement for the ADC stage: the predicate prunes the
    * CODES scan before the overfetch truncation, so a selective filter can
    * never starve the candidate set below k the way a post-filter would
    * (the repo-wide filtered-ANN contract, cf. [[Ivf.ann]]). The filter
    * references table columns, so it rides in as a column-pruned semi-join
    * on id. */
  private def filterCodes(index: PqIndex, table: DataFrame, idCol: String,
      preFilter: Option[Column]): DataFrame = preFilter match {
    case Some(f) =>
      index.codes.join(table.where(f).select(col(idCol).as("id")), "id")
    case None => index.codes
  }

  /** ANN top-k: ADC candidate scan → exact re-rank (same contract as
    * [[Ivf.ann]], with `overfetch` as the recall knob in place of
    * `numCandidates`). `overfetch ≥ n` short-circuits to the exact scan —
    * unless `forceRerank = true`, the verification mode that runs the full
    * ADC→candidates→re-rank plan at the one depth where its output is
    * provably exact (the [[Ivf.knnJoin]] forceRoute pattern). */
  def ann(index: PqIndex, table: DataFrame, idCol: String, embCol: String,
      queryVec: Array[Double], k: Int, overfetch: Int,
      metric: String = "cosine", preFilter: Option[Column] = None,
      forceRerank: Boolean = false): DataFrame = {
    require(metric == index.metric,
      s"index was created with similarity '${index.metric}'; a '$metric' probe " +
        "must use a matching index (rebuild with Pq.build(..., metric = ...))")
    require(queryVec.length == index.dim,
      s"query vector dimension ${queryVec.length} != index numDimensions ${index.dim}")
    if (!forceRerank && overfetch >= index.n)
      return VectorSearch.knn(table, idCol, embCol, queryVec, k, metric, preFilter)
    val candidates = filterCodes(index, table, idCol, preFilter)
      .withColumn("__adc", adcScore(index, queryVec, col("codes")))
      .orderBy(col("__adc").desc, col("id").asc)
      .limit(overfetch)
      .select(col("id").as("__pq_id"))
    val narrowed = table.join(
      broadcast(candidates), table(idCol) === col("__pq_id")).drop("__pq_id")
    VectorSearch.knn(narrowed, idCol, embCol, queryVec, k, metric, preFilter)
  }
}
