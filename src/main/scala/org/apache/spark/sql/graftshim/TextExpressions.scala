package org.apache.spark.sql.graftshim

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the text-statistics hot path.
  *
  * The quality gate and language-ID need several set-membership counts per
  * token array (stopwords + one marker set per language). The
  * `filter(toks, t -> t IN set)` higher-order formulation is interpreted
  * (HOFs are CodegenFallback and are NOT common-subexpression-eliminated),
  * so each metric re-walks the array through a lambda interpreter.
  * [[TokenSetStats]] computes every count in ONE generated loop.
  */
object TextExpressions {

  /** One-pass statistics over an array&lt;string&gt; column:
    *
    *   result[0] = token count
    *   result[1] = distinct token count
    *   result[2 + i] = tokens contained in `sets(i)`
    *
    * Set membership matches `isInCollection` / SQL `IN` on exact string
    * equality. Null array → null (the same propagation the HOF
    * formulation produced). */
  case class TokenSetStats(child: Expression, sets: Seq[Seq[String]])
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "graft_token_set_stats"

    /** The membership sets as UTF8String hash sets (what the array holds). */
    @transient private lazy val compiled: Array[java.util.HashSet[UTF8String]] =
      sets.map { s =>
        val h = new java.util.HashSet[UTF8String](s.size * 2)
        s.foreach(t => h.add(UTF8String.fromString(t)))
        h
      }.toArray

    override def nullSafeEval(a: Any): Any = {
      val arr = a.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val k = compiled.length
      val counts = new Array[Long](2 + k)
      counts(0) = n.toLong
      val distinct = new java.util.HashSet[UTF8String](n * 2)
      var i = 0
      while (i < n) {
        val t = arr.getUTF8String(i)
        distinct.add(t)
        var j = 0
        while (j < k) { if (compiled(j).contains(t)) counts(2 + j) += 1; j += 1 }
        i += 1
      }
      counts(1) = distinct.size.toLong
      new GenericArrayData(counts)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val setsRef = ctx.addReferenceObj("tokenSets", compiled, "java.util.HashSet[]")
      nullSafeCodeGen(ctx, ev, a => {
        val n = ctx.freshName("n")
        val k = compiled.length
        val counts = ctx.freshName("counts")
        val distinct = ctx.freshName("distinct")
        val i = ctx.freshName("i")
        val j = ctx.freshName("j")
        val t = ctx.freshName("t")
        s"""
           |int $n = $a.numElements();
           |long[] $counts = new long[${2 + k}];
           |$counts[0] = (long) $n;
           |java.util.HashSet $distinct = new java.util.HashSet($n * 2);
           |for (int $i = 0; $i < $n; $i++) {
           |  UTF8String $t = $a.getUTF8String($i);
           |  $distinct.add($t);
           |  for (int $j = 0; $j < $k; $j++) {
           |    if ($setsRef[$j].contains($t)) $counts[2 + $j]++;
           |  }
           |}
           |$counts[1] = (long) $distinct.size();
           |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($counts);
         """.stripMargin
      })
    }

    override protected def withNewChildInternal(newChild: Expression): TokenSetStats =
      copy(child = newChild)
  }

  /** Unicode NFC normalization (java.text.Normalizer) as a codegen'd
    * scalar — the engine half of the tokenizer's normalization contract
    * ([[graft.functions.Text.Tokenizer]]): composed vs decomposed
    * spellings ("é" U+00E9 vs e + U+0301) are distinct strings, so
    * without a normalization pass they are distinct tokens and distinct
    * shingles — visually identical duplicates evade exact AND near
    * dedup, and BM25 misses matches. DuckDB's `nfc_normalize` is the
    * agreeing public oracle twin. The already-normalized fast path (the
    * overwhelming case — ASCII is NFC-invariant) allocates nothing
    * beyond the check. */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  case class NfcNormalize(child: Expression)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
    override def dataType: DataType = StringType
    override def prettyName: String = "graft_nfc"

    override def nullSafeEval(s: Any): Any =
      TextExpressions.nfc(s.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"org.apache.spark.sql.graftshim.TextExpressions.nfc($c)")

    override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
      copy(child = newChild)
  }
}
