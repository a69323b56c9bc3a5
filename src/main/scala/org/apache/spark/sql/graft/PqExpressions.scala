package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/**
 * Product-quantization kernels (Jégou et al. 2011, "Product Quantization
 * for Nearest Neighbor Search"). The codebook rides along as a literal
 * reference object (m·ksub·dsub doubles — broadcast-equivalent bytes),
 * and both loops run inside whole-stage codegen: encoding is per-ROW, ADC
 * scoring is per-PAIR (the hot path, so full `doGenCode` like CosineSim —
 * an interpreted HOF here would walk a lambda tree per element × pair,
 * the case CLAUDE.md bans).
 */

/** PQ codes of a float-array embedding: element j is the index of the
 *  nearest sub-centroid of subspace j (squared-L2 over the j-th dsub-wide
 *  slice, ties toward the lower index). Corrupt rows (dim ≠ m·dsub or a
 *  null element) yield null, mirroring NearestCentroid. */
case class PqEncode(child: Expression, codebooks: Array[Array[Array[Double]]])
    extends UnaryExpression with ExpectsInputTypes {

  require(codebooks.nonEmpty &&
    codebooks.forall(cb => cb.nonEmpty && cb.forall(_.length == codebooks(0)(0).length)) &&
    codebooks.forall(_.length == codebooks(0).length),
    "codebooks must be non-empty and rectangular (m x ksub x dsub)")

  private val m = codebooks.length
  private val dsub = codebooks(0)(0).length

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode"
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    if (v.numElements() != m * dsub) return null
    var j = 0
    while (j < m * dsub) { if (v.isNullAt(j)) return null; j += 1 }
    val codes = new Array[Int](m)
    var s = 0
    while (s < m) {
      val cb = codebooks(s)
      var best = 0; var bestDist = Double.MaxValue
      var c = 0
      while (c < cb.length) {
        val ctr = cb(c)
        var d = 0.0; var i = 0
        while (i < dsub) {
          val diff = v.getFloat(s * dsub + i).toDouble - ctr(i)
          d += diff * diff
          i += 1
        }
        if (d < bestDist) { bestDist = d; best = c }
        c += 1
      }
      codes(s) = best
      s += 1
    }
    new GenericArrayData(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbs = ctx.addReferenceObj("codebooks", codebooks, "double[][][]")
    val arrData = classOf[GenericArrayData].getName
    val dim = m * dsub // compile-time constants — no generated declarations
    nullSafeCodeGen(ctx, ev, v => {
      val j = ctx.freshName("j"); val hasNull = ctx.freshName("hasNull")
      val codes = ctx.freshName("codes"); val s = ctx.freshName("s")
      val cb = ctx.freshName("cb"); val best = ctx.freshName("best")
      val bestDist = ctx.freshName("bestDist"); val c = ctx.freshName("c")
      val ctr = ctx.freshName("ctr"); val d = ctx.freshName("d")
      val i = ctx.freshName("i"); val diff = ctx.freshName("diff")
      s"""
         |boolean $hasNull = false;
         |if ($v.numElements() == $dim) {
         |  for (int $j = 0; $j < $dim; $j++) {
         |    if ($v.isNullAt($j)) { $hasNull = true; break; }
         |  }
         |}
         |if ($v.numElements() != $dim || $hasNull) {
         |  ${ev.isNull} = true;
         |} else {
         |  final int[] $codes = new int[$m];
         |  for (int $s = 0; $s < $m; $s++) {
         |    final double[][] $cb = $cbs[$s];
         |    int $best = 0; double $bestDist = Double.MAX_VALUE;
         |    for (int $c = 0; $c < $cb.length; $c++) {
         |      final double[] $ctr = $cb[$c];
         |      double $d = 0.0;
         |      for (int $i = 0; $i < $dsub; $i++) {
         |        final double $diff = ((double) $v.getFloat($s * $dsub + $i)) - $ctr[$i];
         |        $d += $diff * $diff;
         |      }
         |      if ($d < $bestDist) { $bestDist = $d; $best = $c; }
         |    }
         |    $codes[$s] = $best;
         |  }
         |  ${ev.value} = new $arrData($codes);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Asymmetric-distance cosine: exact query vector vs the PQ
 *  RECONSTRUCTION of a corpus row (concatenated sub-centroids selected by
 *  its codes) — `cos(q, decode(codes))`. One fused dim-length loop per
 *  pair; null on corrupt inputs (wrong query dim, wrong code count, code
 *  out of range, null elements). */
case class PqAdcCosine(left: Expression, right: Expression,
    codebooks: Array[Array[Array[Double]]])
    extends BinaryExpression with ExpectsInputTypes {

  require(codebooks.nonEmpty &&
    codebooks.forall(cb => cb.nonEmpty && cb.forall(_.length == codebooks(0)(0).length)) &&
    codebooks.forall(_.length == codebooks(0).length),
    "codebooks must be non-empty and rectangular (m x ksub x dsub)")

  private val m = codebooks.length
  private val dsub = codebooks(0)(0).length

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(IntegerType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc_cosine"
  override def nullable: Boolean = true

  override def nullSafeEval(qIn: Any, codesIn: Any): Any = {
    val q = qIn.asInstanceOf[ArrayData]
    val codes = codesIn.asInstanceOf[ArrayData]
    if (q.numElements() != m * dsub || codes.numElements() != m) return null
    var j = 0
    while (j < m * dsub) { if (q.isNullAt(j)) return null; j += 1 }
    j = 0
    while (j < m) {
      if (codes.isNullAt(j)) return null
      val c = codes.getInt(j)
      if (c < 0 || c >= codebooks(j).length) return null
      j += 1
    }
    var dot = 0.0; var nq = 0.0; var nr = 0.0
    var s = 0
    while (s < m) {
      val ctr = codebooks(s)(codes.getInt(s))
      var i = 0
      while (i < dsub) {
        val qv = q.getFloat(s * dsub + i).toDouble
        val rv = ctr(i)
        dot += qv * rv; nq += qv * qv; nr += rv * rv
        i += 1
      }
      s += 1
    }
    if (nq == 0.0 || nr == 0.0) 0.0
    else dot / (math.sqrt(nq) * math.sqrt(nr))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbs = ctx.addReferenceObj("codebooks", codebooks, "double[][][]")
    val dim = m * dsub // compile-time constants — no generated declarations
    nullSafeCodeGen(ctx, ev, (q, codes) => {
      val j = ctx.freshName("j"); val bad = ctx.freshName("bad")
      val dot = ctx.freshName("dot"); val nq = ctx.freshName("nq")
      val nr = ctx.freshName("nr"); val s = ctx.freshName("s")
      val ctr = ctx.freshName("ctr"); val i = ctx.freshName("i")
      val qv = ctx.freshName("qv"); val rv = ctx.freshName("rv")
      val cc = ctx.freshName("cc")
      s"""
         |boolean $bad = $q.numElements() != $dim || $codes.numElements() != $m;
         |if (!$bad) {
         |  for (int $j = 0; $j < $dim; $j++) {
         |    if ($q.isNullAt($j)) { $bad = true; break; }
         |  }
         |}
         |if (!$bad) {
         |  for (int $j = 0; $j < $m; $j++) {
         |    if ($codes.isNullAt($j)) { $bad = true; break; }
         |    final int $cc = $codes.getInt($j);
         |    if ($cc < 0 || $cc >= $cbs[$j].length) { $bad = true; break; }
         |  }
         |}
         |if ($bad) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0; double $nq = 0.0; double $nr = 0.0;
         |  for (int $s = 0; $s < $m; $s++) {
         |    final double[] $ctr = $cbs[$s][$codes.getInt($s)];
         |    for (int $i = 0; $i < $dsub; $i++) {
         |      final double $qv = (double) $q.getFloat($s * $dsub + $i);
         |      final double $rv = $ctr[$i];
         |      $dot += $qv * $rv; $nq += $qv * $qv; $nr += $rv * $rv;
         |    }
         |  }
         |  if ($nq == 0.0 || $nr == 0.0) {
         |    ${ev.value} = 0.0;
         |  } else {
         |    ${ev.value} = $dot / (java.lang.Math.sqrt($nq) * java.lang.Math.sqrt($nr));
         |  }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Residual (IVF-centered) ADC cosine — the FAISS IVF+PQ composition:
 *  the corpus row's reconstruction is `centroid(cell) + decode(codes)`
 *  (codes encode the RESIDUAL v − centroid, so quantization error shrinks
 *  with the residual's norm — the standard recall lever at the same m).
 *  One fused dim-length loop per pair, reconstruction element
 *  `cent[cell][i] + cb[s][code][i]` added in double exactly as the SQL
 *  oracle replays it; null on corrupt inputs (wrong query dim, cell out
 *  of range, wrong code count, code out of range, null elements). */
case class PqResidualAdcCosine(first: Expression, second: Expression,
    third: Expression, centroids: Array[Array[Double]],
    codebooks: Array[Array[Array[Double]]])
    extends TernaryExpression with ExpectsInputTypes {

  require(codebooks.nonEmpty &&
    codebooks.forall(cb => cb.nonEmpty && cb.forall(_.length == codebooks(0)(0).length)) &&
    codebooks.forall(_.length == codebooks(0).length),
    "codebooks must be non-empty and rectangular (m x ksub x dsub)")
  require(centroids.nonEmpty &&
    centroids.forall(_.length == codebooks.length * codebooks(0)(0).length),
    "centroid dim must equal m * dsub")

  private val m = codebooks.length
  private val dsub = codebooks(0)(0).length

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), IntegerType, ArrayType(IntegerType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_residual_adc_cosine"
  override def nullable: Boolean = true

  override def nullSafeEval(qIn: Any, cellIn: Any, codesIn: Any): Any = {
    val q = qIn.asInstanceOf[ArrayData]
    val cell = cellIn.asInstanceOf[Int]
    val codes = codesIn.asInstanceOf[ArrayData]
    if (q.numElements() != m * dsub || codes.numElements() != m ||
      cell < 0 || cell >= centroids.length) return null
    var j = 0
    while (j < m * dsub) { if (q.isNullAt(j)) return null; j += 1 }
    j = 0
    while (j < m) {
      if (codes.isNullAt(j)) return null
      val c = codes.getInt(j)
      if (c < 0 || c >= codebooks(j).length) return null
      j += 1
    }
    val cent = centroids(cell)
    var dot = 0.0; var nq = 0.0; var nr = 0.0
    var s = 0
    while (s < m) {
      val ctr = codebooks(s)(codes.getInt(s))
      var i = 0
      while (i < dsub) {
        val qv = q.getFloat(s * dsub + i).toDouble
        val rv = cent(s * dsub + i) + ctr(i)
        dot += qv * rv; nq += qv * qv; nr += rv * rv
        i += 1
      }
      s += 1
    }
    if (nq == 0.0 || nr == 0.0) 0.0
    else dot / (math.sqrt(nq) * math.sqrt(nr))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbs = ctx.addReferenceObj("codebooks", codebooks, "double[][][]")
    val cents = ctx.addReferenceObj("centroids", centroids, "double[][]")
    val dim = m * dsub // compile-time constants — no generated declarations
    val nCells = centroids.length
    nullSafeCodeGen(ctx, ev, (q, cell, codes) => {
      val j = ctx.freshName("j"); val bad = ctx.freshName("bad")
      val dot = ctx.freshName("dot"); val nq = ctx.freshName("nq")
      val nr = ctx.freshName("nr"); val s = ctx.freshName("s")
      val ctr = ctx.freshName("ctr"); val i = ctx.freshName("i")
      val qv = ctx.freshName("qv"); val rv = ctx.freshName("rv")
      val cc = ctx.freshName("cc"); val cent = ctx.freshName("cent")
      // NOTE: no generated line may BEGIN with `||` — Spark embeds this
      // snippet into its own stripMargin templates (Expression
      // .reduceCodeSize's split function, BroadcastHashJoin's condition
      // function), and an outer stripMargin eats the first pipe of a
      // leading `||`, leaving invalid Java that silently falls back to
      // interpreted eval (the CLAUDE.md `||`-margin rule, in codegen
      // form). Keep boolean operators at line ENDS.
      s"""
         |boolean $bad = $q.numElements() != $dim || $codes.numElements() != $m ||
         |  $cell < 0 || $cell >= $nCells;
         |if (!$bad) {
         |  for (int $j = 0; $j < $dim; $j++) {
         |    if ($q.isNullAt($j)) { $bad = true; break; }
         |  }
         |}
         |if (!$bad) {
         |  for (int $j = 0; $j < $m; $j++) {
         |    if ($codes.isNullAt($j)) { $bad = true; break; }
         |    final int $cc = $codes.getInt($j);
         |    if ($cc < 0 || $cc >= $cbs[$j].length) { $bad = true; break; }
         |  }
         |}
         |if ($bad) {
         |  ${ev.isNull} = true;
         |} else {
         |  final double[] $cent = $cents[$cell];
         |  double $dot = 0.0; double $nq = 0.0; double $nr = 0.0;
         |  for (int $s = 0; $s < $m; $s++) {
         |    final double[] $ctr = $cbs[$s][$codes.getInt($s)];
         |    for (int $i = 0; $i < $dsub; $i++) {
         |      final double $qv = (double) $q.getFloat($s * $dsub + $i);
         |      final double $rv = $cent[$s * $dsub + $i] + $ctr[$i];
         |      $dot += $qv * $rv; $nq += $qv * $qv; $nr += $rv * $rv;
         |    }
         |  }
         |  if ($nq == 0.0 || $nr == 0.0) {
         |    ${ev.value} = 0.0;
         |  } else {
         |    ${ev.value} = $dot / (java.lang.Math.sqrt($nq) * java.lang.Math.sqrt($nr));
         |  }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object GraftPq {
  def pqEncode(vec: Column, codebooks: Array[Array[Array[Double]]]): Column =
    ExpressionUtils.column(PqEncode(ExpressionUtils.expression(vec), codebooks))

  def pqAdcCosine(qVec: Column, codes: Column,
      codebooks: Array[Array[Array[Double]]]): Column =
    ExpressionUtils.column(PqAdcCosine(
      ExpressionUtils.expression(qVec), ExpressionUtils.expression(codes), codebooks))

  def pqResidualAdcCosine(qVec: Column, cell: Column, codes: Column,
      centroids: Array[Array[Double]],
      codebooks: Array[Array[Array[Double]]]): Column =
    ExpressionUtils.column(PqResidualAdcCosine(
      ExpressionUtils.expression(qVec), ExpressionUtils.expression(cell),
      ExpressionUtils.expression(codes), centroids, codebooks))
}
