package graft

import graft.embed.{Embedder, HashingEmbedder}
import graft.functions.{Text, Vectors}
import graft.search.TextSearch
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Similarity math, tokenizer, and embedder invariants (SURVEY §5 unit
  * plan: similarity vs hand-computed values; cosine symmetry/bounds).
  * Property-style cases use a seeded Random (scalatestplus bridge is not in
  * the offline cache, so no ScalaCheck forAll). */
class FunctionsSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  private def eval1(a: Seq[Double], b: Seq[Double],
      f: (org.apache.spark.sql.Column, org.apache.spark.sql.Column) => org.apache.spark.sql.Column): Double =
    Seq((a, b)).toDF("a", "b").select(f(col("a"), col("b")).as("r"))
      .head().getDouble(0)

  test("dot product matches hand-computed value") {
    assert(eval1(Seq(1.0, 2.0, 3.0), Seq(4.0, -5.0, 6.0), Vectors.dot) === 12.0)
  }

  test("cosine of identical vectors is 1, opposite is -1, orthogonal is 0") {
    assert(math.abs(eval1(Seq(1.0, 2.0), Seq(1.0, 2.0), Vectors.cosine) - 1.0) < 1e-12)
    assert(math.abs(eval1(Seq(1.0, 2.0), Seq(-1.0, -2.0), Vectors.cosine) + 1.0) < 1e-12)
    assert(math.abs(eval1(Seq(1.0, 0.0), Seq(0.0, 3.0), Vectors.cosine)) < 1e-12)
  }

  test("euclidean matches hand-computed value") {
    assert(eval1(Seq(0.0, 3.0), Seq(4.0, 0.0), Vectors.euclidean) === 5.0)
  }

  test("atlas score normalization lands in [0,1] per metric") {
    val v = Seq(0.3, -0.7, 0.5)
    val w = Seq(-0.2, 0.9, 0.1)
    for (m <- Seq("cosine", "dotProduct", "euclidean")) {
      val s = eval1(v, w, (a, b) => Vectors.score(m, a, b))
      assert(s >= 0.0 && s <= 1.0, s"$m score $s out of [0,1]")
    }
  }

  test("cosine symmetry and bounds (property, seeded)") {
    val rnd = new scala.util.Random(42)
    // evaluate all samples in one Spark job
    val samples = Seq.fill(25)(
      (Seq.fill(8)(rnd.nextDouble() * 2 - 1), Seq.fill(8)(rnd.nextDouble() * 2 - 1)))
    val rows = samples.toDF("a", "b")
      .select(Vectors.cosine(col("a"), col("b")).as("ab"),
        Vectors.cosine(col("b"), col("a")).as("ba"))
      .collect()
    rows.foreach { r =>
      assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-12)
      assert(r.getDouble(0) >= -1.0 - 1e-9 && r.getDouble(0) <= 1.0 + 1e-9)
    }
  }

  test("codegen dot/sqdist match the interpreted HOF rendition bit-for-bit") {
    val rnd = new scala.util.Random(7)
    val samples = Seq.fill(50)(
      (Seq.fill(64)(rnd.nextDouble() * 2 - 1), Seq.fill(64)(rnd.nextDouble() * 2 - 1)))
    val rows = samples.toDF("a", "b")
      .select(
        Vectors.dot(col("a"), col("b")).as("cg"),
        Vectors.dotHof(col("a"), col("b")).as("hof"))
      .collect()
    rows.foreach(r => assert(r.getDouble(0) === r.getDouble(1)))
  }

  test("vectorSum Aggregator equals the relational posexplode path") {
    import graft.functions.VectorAgg
    import graft.util.Tables
    val e = Tables.embeddings(spark, Sf0001)
    val viaUdaf = e.groupBy("label")
      .agg(VectorAgg.vectorSumCol(col("embedding")).as("vsum"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    val viaRelational = e
      .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "x")))
      .groupBy("label", "dim").agg(sum(col("x")).as("s"))
      .collect().groupBy(_.getInt(0))
      .map { case (l, rows) =>
        l -> rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq
      }
    viaUdaf.foreach { case (label, vs) =>
      vs.zip(viaRelational(label)).foreach { case (a, b) =>
        assert(math.abs(a - b) < 1e-9, s"label=$label")
      }
    }
  }

  test("int8 quantization: bounds, reconstruction error, exact-rerank recall") {
    val e = graft.util.Tables.embeddings(spark, Sf0001)
      .withColumn("scale", Vectors.quantizeScale(col("embedding")))
      .withColumn("q", Vectors.quantizeInt8(col("embedding"), col("scale")))
    // every component in [-127, 127]; reconstruction within scale/2
    val stats = e.select(
        array_max(transform(col("q"), abs(_))).as("qmax"),
        array_max(
          zip_with(Vectors.dequantize(col("q"), col("scale")), col("embedding"),
            (d, x) => abs(d - x))).as("maxerr"),
        col("scale"))
      .collect()
    assert(stats.forall(_.getInt(0) <= 127))
    stats.foreach { r =>
      assert(r.getDouble(1) <= r.getDouble(2) / 2 + 1e-12,
        s"reconstruction error ${r.getDouble(1)} above scale/2 ${r.getDouble(2) / 2}")
    }
    // quantized top-10 agrees with exact cosine top-10 on this corpus
    // (int8 on unit-ish 64-dim vectors: relative error ~0.4%, far below
    // the corpus's score gaps)
    val exact = graft.search.VectorSearch.knn(
        graft.util.Tables.embeddings(spark, Sf0001), "vec_id", "embedding",
        Array.tabulate(64)(i => math.sin(i + 1)), 10)
      .select("vec_id").as[Long].collect().toSeq
    val qv = Array.tabulate(64)(i => math.sin(i + 1))
    val qScale = qv.map(math.abs).max / 127.0
    val qInts = qv.map(x => math.floor(x / qScale + 0.5).toInt)
    val approx = e
      .withColumn("qdot", Vectors.dotInt(col("q"), array(qInts.map(lit).toIndexedSeq: _*)))
      // quantized score ∝ cosine numerator rescaled; same norm denominator
      .withColumn("qscore",
        col("qdot").cast("double") * col("scale") /
          Vectors.l2norm(col("embedding")))
      .orderBy(col("qscore").desc, col("vec_id").asc)
      .limit(10).select("vec_id").as[Long].collect().toSeq
    assert(approx.toSet.intersect(exact.toSet).size >= 8,
      s"quantized recall too low: $approx vs $exact")
  }

  test("tokenizer lowercases, splits on non-alphanumerics, drops empties") {
    val got = Seq("Fast, FAST sort!! 2x").toDF("t")
      .select(Text.tokens(col("t"))).head().getSeq[String](0)
    assert(got === Seq("fast", "fast", "sort", "2x"))
  }

  test("unicode tokenizer: hand-computed truth on multilingual text") {
    // hand-computed, NOT oracle-mirrored (the oracle only proves the two
    // engines AGREE): Cyrillic lowercases, a CJK ideograph run is ONE
    // token, Greek letters are letters, digits glue to letters, and the
    // frozen ASCII alphabet loses every non-Latin token
    def uni(s: String): Seq[String] = Seq(s).toDF("t")
      .select(Text.tokensUnicode(col("t"))).head().getSeq[String](0)
    assert(uni("Привет, МИР! 你好世界 — abc123 ΔΞ7 a-б") ===
      Seq("привет", "мир", "你好世界", "abc123", "δξ7", "a", "б"))
    assert(uni("Ёжик ёжик") === Seq("ёжик", "ёжик"))
    val ascii = Seq("Привет 你好 x9").toDF("t")
      .select(Text.tokens(col("t"))).head().getSeq[String](0)
    assert(ascii === Seq("x9"))
    // query-side tokenization agrees with the engine-side rule
    assert(TextSearch.queryTerms("Привет данные 你好世界",
      Text.UnicodeSplitRe) === Seq("привет", "данные", "你好世界"))
    // a BM25 index built under the Unicode alphabet answers a Cyrillic
    // query; the frozen alphabet finds nothing on the same corpus
    val docs = Seq((1L, "машинное обучение на данных"),
      (2L, "данные и модели"), (3L, "plain ascii text")).toDF("id", "text")
    val idxU = TextSearch.buildIndex(docs, "id", "text",
      Text.UnicodeSplitRe)
    val hitsU = TextSearch.search(idxU, "Данные данных", 10,
        Text.UnicodeSplitRe)
      .select("id").as[Long].collect().toSet
    assert(hitsU === Set(1L, 2L))
    val idxA = TextSearch.buildIndex(docs, "id", "text")
    assert(TextSearch.search(idxA, "Данные", 10).isEmpty)
    // wordCounts under the Unicode alphabet sees the non-Latin vocab
    val wc = graft.text.Vocab.wordCounts(docs, "text",
        Text.UnicodeSplitRe)
      .as[(String, Long)].collect().toMap
    assert(wc("данные") === 1L && wc("данных") === 1L && wc("text") === 1L)
  }

  test("tokenizer contract: CJK bigrams and NFC, hand-computed truth") {
    // hand-computed, NOT oracle-mirrored — the gate rows only prove the
    // two engines AGREE on whatever encoding both implement
    def toks(tok: Text.Tokenizer, s: String): Seq[String] =
      Seq(s).toDF("t").select(tok(col("t"))).head().getSeq[String](0)
    val cjk = Text.Tokenizer(Text.UnicodeSplitRe, cjkBigrams = true)
    // a 4-ideograph run → 3 overlapping bigrams (the Lucene CJKAnalyzer
    // rule); a single ideograph stays; Latin stays whole
    assert(toks(cjk, "你好世界 hello 猫") ===
      Seq("你好", "好世", "世界", "hello", "猫"))
    // hiragana expands; KOREAN does NOT (Hangul writes word spaces —
    // bigramming real words would destroy information)
    assert(toks(cjk, "ひらがな 한국어") === Seq("ひら", "らが", "がな", "한국어"))
    // a mixed-script token is attributed, never split (Scripts posture)
    assert(toks(cjk, "abc你好") === Seq("abc你好"))
    // without the option, an ideograph run is ONE token (r14 contract)
    assert(toks(Text.Tokenizer(Text.UnicodeSplitRe), "你好世界") ===
      Seq("你好世界"))
    // NFC: composed é (U+00E9) and decomposed e+U+0301 unify BEFORE
    // splitting; without nfc they are distinct tokens
    val nfcTok = Text.Tokenizer(Text.UnicodeSplitRe, nfcNormalize = true)
    val composed = "café"
    val decomposed = "café"
    assert(toks(nfcTok, s"$composed $decomposed") ===
      Seq(composed, composed))
    assert(toks(Text.Tokenizer(Text.UnicodeSplitRe),
      s"$composed $decomposed").distinct.size === 2)
    // ASCII is NFC-invariant: the default tokenizer path is unaffected
    assert(toks(Text.Tokenizer(nfcNormalize = true), "Fast, FAST 2x") ===
      Seq("fast", "fast", "2x"))
    // local ≡ engine on every case above plus a SUPPLEMENTARY-plane run
    // (U+20000..): both sides must count code points, not UTF-16 units —
    // a String.substring bigrammer would tear the surrogate pairs
    val supp = new String(Array(0x20000, 0x20001, 0x20002), 0, 3)
    for (s <- Seq("你好世界 hello 猫", "ひらがな 한국어", "abc你好",
        s"$composed $decomposed", s"$supp ok", "Привет МИР")) {
      assert(Text.MultilingualTokenizer.local(s) ===
        toks(Text.MultilingualTokenizer, s), s"local vs engine on '$s'")
    }
    assert(toks(cjk, supp).length === 2) // 3 code points → 2 bigrams
    // the verdict's done-criterion at spec level: a two-character Han
    // query matches INSIDE a longer planted run only under the bigram
    // tokenizer (one-token-per-run can never match a sub-run)
    val docs = Seq((1L, "数据模型训练 corpus"), (2L, "plain text"))
      .toDF("id", "text")
    val hitsBi = TextSearch.search(
        TextSearch.buildIndex(docs, "id", "text", cjk), "模型", 10, cjk)
      .select("id").as[Long].collect().toSet
    assert(hitsBi === Set(1L))
    val uni = Text.Tokenizer(Text.UnicodeSplitRe)
    assert(TextSearch.search(
      TextSearch.buildIndex(docs, "id", "text", uni), "模型", 10,
      uni).isEmpty)
  }

  test("script profile: first-code-point attribution, hand-computed") {
    import graft.text.TextAnalysis
    val toks = graft.functions.Text.tokensUnicode(col("t"))
    val got = Seq("Привет мир 你好 abc ref12 δξ7 9x 中文данные")
      .toDF("t")
      .select(
        TextAnalysis.scriptCount(toks, "^\\p{IsLatin}").as("lat"),
        TextAnalysis.scriptCount(toks, "^\\p{IsCyrillic}").as("cyr"),
        TextAnalysis.scriptCount(toks, "^\\p{IsHan}").as("han"),
        TextAnalysis.scriptCount(toks, "^\\p{IsGreek}").as("grk"))
      .head()
    // latin: abc, ref12; cyrillic: привет, мир; han: 你好 and the
    // MIXED token 中文данные (attributed by FIRST code point); greek:
    // δξ7; "9x" starts with a digit — attributed to no script class
    assert((got.getLong(0), got.getLong(1), got.getLong(2),
      got.getLong(3)) === ((2L, 2L, 2L, 1L)))
    // the wider script table: arabic/hangul/devanagari attribute too
    val toks2 = graft.functions.Text.tokensUnicode(col("t"))
    val re = TextAnalysis.Scripts.map { case (n, j, _) => n -> j }.toMap
    val got2 = Seq("مرحبا 안녕하세요 नमस्ते hello").toDF("t")
      .select(
        TextAnalysis.scriptCount(toks2, re("arabic")).as("ar"),
        TextAnalysis.scriptCount(toks2, re("hangul")).as("ko"),
        TextAnalysis.scriptCount(toks2, re("devanagari")).as("hi"),
        TextAnalysis.scriptCount(toks2, re("latin")).as("la"))
      .head()
    assert((got2.getLong(0), got2.getLong(1), got2.getLong(2),
      got2.getLong(3)) === ((1L, 1L, 1L, 1L)))
  }

  test("hash60 is non-negative and stable") {
    val got = Seq("fast key order", "fast key order").toDF("t")
      .select(Text.hash60(col("t"))).collect().map(_.getLong(0))
    assert(got(0) === got(1) && got(0) >= 0L)
  }

  test("hashing embedder: deterministic, unit-norm, fixed dim") {
    val e = new HashingEmbedder(Embedder.TestdataDim)
    val v1 = e.embed("nuggets para desayuno")
    val v2 = e.embed("nuggets para desayuno")
    assert(v1.toSeq === v2.toSeq)
    assert(v1.length === 64)
    assert(math.abs(math.sqrt(v1.map(x => x * x).sum) - 1.0) < 1e-12)
    assert(e.embed("").forall(_ === 0.0))
  }
}
