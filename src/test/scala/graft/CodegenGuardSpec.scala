package graft

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, GenerateMutableProjection}
import org.apache.spark.sql.catalyst.expressions.{BoundReference, Expression}
import org.apache.spark.sql.graft._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Codegen hygiene for every graft native expression, in the context that
 * actually bites: Spark embeds an expression's generated code into ITS
 * OWN `stripMargin` templates (`Expression.reduceCodeSize`'s split
 * function whenever the snippet exceeds 1024 chars in a row-based
 * context; `BroadcastHashJoin`'s condition function), and an outer
 * stripMargin eats the first pipe of any generated line BEGINNING with
 * `||` — leaving invalid Java that Janino rejects and Spark silently
 * falls back to interpreted eval for. (The bench never sees it: pure
 * whole-stage-codegen contexts don't re-strip. The fallback surfaces
 * only in split contexts, as a 10×+ hot-loop slowdown with green
 * results.)
 *
 * Two guards per expression: (a) no emitted line starts with `|`
 * post-trim — the textual rule; (b) GenerateMutableProjection.generate
 * compiles the row-based (split-function) form — the end-to-end proof,
 * since codegen compile errors THROW here rather than falling back.
 */
class CodegenGuardSpec extends AnyFunSuite {

  private val floats = BoundReference(0, ArrayType(FloatType), nullable = true)
  private val floats2 = BoundReference(1, ArrayType(FloatType), nullable = true)
  private val ints = BoundReference(2, ArrayType(IntegerType), nullable = true)
  private val cellRef = BoundReference(3, IntegerType, nullable = true)
  private val longs = BoundReference(4, ArrayType(LongType), nullable = true)
  private val longs2 = BoundReference(5, ArrayType(LongType), nullable = true)
  private val strs = BoundReference(6, ArrayType(StringType), nullable = true)
  private val str = BoundReference(7, StringType, nullable = true)
  private val dbl = BoundReference(8, DoubleType, nullable = true)

  // deliberately small models: small dims shrink nothing — the snippets
  // still exceed the 1024-char split threshold via loop scaffolding
  private val cents = Array(Array(1.0, 0.0, 0.0, 0.0), Array(0.0, 1.0, 0.0, 0.0))
  private val cbs: Array[Array[Array[Double]]] =
    Array.fill(2)(Array(Array(0.1, 0.0), Array(0.0, 0.1)))
  private val planes: Seq[Seq[Double]] =
    Seq(Seq(1.0, 0.0, 0.0, 0.0), Seq(0.0, 1.0, 0.0, 0.0))
  private val intRef = BoundReference(9, IntegerType, nullable = true)

  private val exprs: Seq[(String, Expression)] = Seq(
    "CosineSim" -> CosineSim(floats, floats2),
    "NearestCentroid" -> NearestCentroid(floats, cents),
    "NearestCentroidDist" -> NearestCentroidDist(floats, cents),
    "NearestCentroids" -> NearestCentroids(floats, cents, 2),
    "PqEncode" -> PqEncode(floats, cbs),
    "PqAdcCosine" -> PqAdcCosine(floats, ints, cbs),
    "PqResidualAdcCosine" -> PqResidualAdcCosine(floats, cellRef, ints, cents, cbs),
    "QuantizeInt8Codes" -> QuantizeInt8Codes(floats, dbl),
    "SignBits" -> SignBits(floats),
    "RandomProjectSigns" -> RandomProjectSigns(floats, 2, 1000000L),
    "SrpBucket" -> SrpBucket(floats, planes),
    "SrpProbes" -> SrpProbes(floats, planes, 2),
    "SimHash64" -> SimHash64(strs),
    "MinHashSig" -> MinHashSig(strs, 4),
    "HashedCharNgrams" -> HashedCharNgrams(str, 3),
    "HashedWordShingles" -> HashedWordShingles(str, 2),
    "PositionedWordShingles" -> PositionedWordShingles(str, 2),
    "SortedLongIntersectSize" -> SortedLongIntersectSize(longs, longs2),
    "SortedLongIntersectAtLeast" ->
      SortedLongIntersectAtLeast(longs, longs2, intRef),
    "JaccardThresholded" ->
      JaccardThresholded(longs, longs2, intRef, intRef, 0.5),
    "RollingTokenHash" -> RollingTokenHash(strs),
    "SubstringHits" -> SubstringHits(str, Seq("ab", "ba c")),
    "ContainsAnyPattern" -> ContainsAnyPattern(str, Seq("ab", "ba c")),
    "TopGram" -> TopGram(strs, 2),
    "ScaledRoundSum" -> ScaledRoundSum(floats, 255.0, halfUpMode = true),
    "ScaledRoundSum(floor)" -> ScaledRoundSum(floats, 65535.0, halfUpMode = false),
    "NfcNormalize" -> NfcNormalize(str),
    "MinShingleMd5" -> MinShingleMd5(strs),
    "AdjacentPairs" -> AdjacentPairs(strs),
    "AdjacentPairStructs" -> AdjacentPairStructs(strs))

  test("no native expression emits a generated line beginning with '|'") {
    for ((name, e) <- exprs) {
      val ctx = new CodegenContext
      val emitted = e.genCode(ctx).code.toString + "\n" + ctx.declareAddedFunctions()
      val offending = emitted.linesIterator.map(_.trim).filter(_.startsWith("|"))
      assert(offending.isEmpty,
        s"$name emits margin-hostile line(s): ${offending.mkString("; ")}")
    }
  }

  test("every native expression compiles in the row-based split-function context") {
    for ((name, e) <- exprs) {
      withClue(s"$name: ") {
        // throws CompileException (wrapped) if reduceCodeSize's
        // stripMargin mangled the snippet — no silent fallback here
        GenerateMutableProjection.generate(Seq(e))
      }
    }
  }
}
