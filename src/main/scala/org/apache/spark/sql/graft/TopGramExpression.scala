package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Most frequent word n-gram WITHIN one document — the Gopher-style
 * repetitive-content signal ("fraction of characters contained in the
 * most frequently-occurring n-gram"; Rae et al. 2021 §A1.1): returns
 * `struct(gram, n_occ)` for the token array's most frequent n-gram of
 * `n` consecutive tokens joined by single spaces, ties broken by gram
 * ASC in unsigned UTF-8 byte order (`UTF8String.compare` — exactly what
 * a DuckDB `ORDER BY n_occ DESC, gram` replays). Null when the document
 * has fewer than `n` tokens.
 *
 * Per-row work is one hash-map pass over the row's own grams — a
 * WITHIN-ROW fold, so the whole signal is a pure scan projection: no
 * explode, no (doc, gram) shuffle (the explode+groupBy formulation
 * ships every gram occurrence through an exchange — at 100 TB that is
 * gram volume, ~n× the corpus text). CodegenFallback costs one virtual
 * call per row against a full gram-count pass of real work — the same
 * trade [[SrpBucket]] documents.
 */
case class TopGram(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  require(n >= 1, "n-gram size must be >= 1")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = StructType(Seq(
    StructField("gram", StringType, nullable = false),
    StructField("n_occ", LongType, nullable = false)))
  override def prettyName: String = "top_gram"
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val ws = input.asInstanceOf[ArrayData]
    val nTok = ws.numElements()
    if (nTok < n) return null
    val counts = new java.util.HashMap[UTF8String, Long]()
    val space = UTF8String.fromString(" ")
    var i = 0
    while (i <= nTok - n) {
      // null tokens cannot occur from split(); treat one as empty-string
      // (matches string_split, which never yields SQL NULL elements)
      val parts = new Array[UTF8String](2 * n - 1)
      var j = 0
      while (j < n) {
        val t = ws.getUTF8String(i + j)
        if (j > 0) parts(2 * j - 1) = space
        parts(2 * j) = if (t == null) UTF8String.EMPTY_UTF8 else t
        j += 1
      }
      val gram = UTF8String.concat(parts: _*)
      counts.merge(gram, 1L, (a, b) => a + b)
      i += 1
    }
    var bestGram: UTF8String = null
    var bestCnt = 0L
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val better = e.getValue > bestCnt ||
        (e.getValue == bestCnt && bestGram != null &&
          e.getKey.compareTo(bestGram) < 0)
      if (better) { bestGram = e.getKey; bestCnt = e.getValue }
    }
    if (bestGram == null) null
    else new GenericInternalRow(Array[Any](bestGram, bestCnt))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object GraftTopGram {
  def topGram(words: Column, n: Int): Column =
    ExpressionUtils.column(TopGram(ExpressionUtils.expression(words), n))
}

/**
 * Unicode NFC normalization (UAX #15 canonical composition) — the
 * pre-dedup canonicalization step [[graft.operators.TextAnalysis]]'s
 * lowercase/whitespace `normalize` deliberately does not do: visually
 * identical strings with different codepoint sequences (composed é vs
 * e + COMBINING ACUTE) hash apart and defeat exact dedup until both
 * normalize to the canonical form. NFC is a published standard both
 * engines implement (JDK `java.text.Normalizer` here, utf8proc's
 * `nfc_normalize` in DuckDB), so outputs agree byte-for-byte. The
 * already-normalized fast path (one scan, no allocation — every ASCII
 * row) returns the input UTF8String untouched.
 *
 * 100 TB shape: pure scan projection. CodegenFallback: the per-row
 * normalization scan dwarfs one virtual call (the [[SrpBucket]] trade).
 */
case class NfcNormalize(child: Expression)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(input: Any): Any = {
    val u = input.asInstanceOf[UTF8String]
    val s = u.toString
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) u
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object GraftNfc {
  def nfcNormalize(s: Column): Column =
    ExpressionUtils.column(NfcNormalize(ExpressionUtils.expression(s)))
}
