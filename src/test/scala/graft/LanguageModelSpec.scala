package graft

import graft.text.LanguageModel
import org.scalatest.funsuite.AnyFunSuite

/** Bigram-LM perplexity scoring: hand-computed probabilities on a toy
  * corpus, cross-corpus scoring with unseen events, and degenerate docs. */
class LanguageModelSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  // corpus: doc1 = "a b a b", doc2 = "a c"
  // pairs:  doc1 (a,b)(b,a)(a,b); doc2 (a,c)
  // counts: c(a,b)=2 c(b,a)=1 c(a,c)=1; prefixes a=3 b=1; V=3
  private def toy = Seq((1L, "a b a b"), (2L, "a c")).toDF("id", "text")

  test("self-score matches hand-computed add-one bigram probabilities") {
    val got = LanguageModel.selfScore(toy, "id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2), r.getLong(3)))).toMap
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    // doc1: p(b|a)=(2+1)/(3+3)=1/2, p(a|b)=(1+1)/(1+3)=1/2 → nlp = ln 2
    assert(got(1L) === ((r6(math.log(2)), r6(2.0), 3L)))
    // doc2: p(c|a)=(1+1)/(3+3)=1/3 → nlp = ln 3, ppl = 3
    assert(got(2L) === ((r6(math.log(3)), r6(3.0), 1L)))
  }

  test("cross-corpus scoring: unseen bigrams/prefixes smooth to 1/(cc+V), never NaN") {
    val lm = LanguageModel.train(toy, "id", "text")
    // "a z": prefix a seen (cc=3), bigram (a,z) unseen → p = 1/(3+3)
    // "z a": prefix z unseen → p = 1/(0+3)
    val other = Seq((10L, "a z"), (11L, "z a")).toDF("id", "text")
    val got = LanguageModel.score(lm, other, "id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    assert(got(10L) === r6(math.log(6)))
    assert(got(11L) === r6(math.log(3)))
  }

  test("docs with < 2 tokens produce no score row; empty corpus trains without error") {
    val docs = Seq((1L, "solo"), (2L, ""), (3L, "two tokens")).toDF("id", "text")
    val scored = LanguageModel.selfScore(docs, "id", "text")
    assert(scored.collect().map(_.getLong(0)).toSeq === Seq(3L))
    val empty = Seq.empty[(Long, String)].toDF("id", "text")
    assert(LanguageModel.selfScore(empty, "id", "text").count() === 0L)
  }
}
