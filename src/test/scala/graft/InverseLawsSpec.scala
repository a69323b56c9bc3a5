package graft

import graft.engine.Pipeline
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/**
 * Property tests for the bidirectionality contract the reference implies
 * but never property-checks (SURVEY.md §5): for every invertible pipeline,
 * inverse ∘ forward = identity on arbitrary inputs, and the inverse of a
 * pipeline is the reverse-ordered list of stage inverses
 * (reference: host-go/repository/repository.go:177-206).
 *
 * Uses raw ScalaCheck Gens with fixed seeds (the scalatest bridge isn't in
 * the offline dependency cache) — deterministic, reproducible samples.
 */
class InverseLawsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get

  private val nameGen = Gen.alphaStr.suchThat(_.nonEmpty).map(_.take(12))
  private val rowsGen = Gen.nonEmptyListOf(Gen.zip(nameGen, Gen.chooseNum(-1000L, 1000L)))

  /** Deterministic sample stream from a Gen. */
  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (1 to n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private def forAll[A](g: Gen[A], n: Int)(body: A => Unit): Unit = {
    val ss = samples(g, n)
    assert(ss.size >= n / 2, "generator produced too few samples")
    ss.foreach(body)
  }

  private def invertiblePipeline = Pipeline.fromJson(
    """{"lenses":[
      |  {"path":"builtin:rename","arguments":{"src":"name","dst":"full_name"}},
      |  {"path":"builtin:with_column",
      |   "arguments":{"col":"age","expr":"age + 7","inverse_expr":"age - 7"}},
      |  {"path":"builtin:with_column",
      |   "arguments":{"col":"age","expr":"age * 3","inverse_expr":"CAST(age / 3 AS BIGINT)"}}
      |]}""".stripMargin)

  test("inverse . forward == identity for invertible pipelines (property)") {
    import spark.implicits._
    forAll(rowsGen, 15) { rows =>
      val df = rows.toDF("name", "age")
      val back = invertiblePipeline.inverseTransform(invertiblePipeline.forward(df))
      assert(back.columns.toSeq == Seq("name", "age"))
      assert(back.as[(String, Long)].collect().sorted.toSeq == rows.sorted)
    }
  }

  test("forward . inverse == identity on forward's image") {
    import spark.implicits._
    // forward maps age ↦ (age+7)·3, so its image is the multiples of 3 —
    // forward∘inverse is the identity exactly there (inverse's CAST(x/3)
    // is lossy elsewhere, like the reference's unchecked inverses).
    val imageRows = rowsGen.map(_.map { case (n, a) => (n, a * 3) })
    forAll(imageRows, 8) { rows =>
      // Feed the forward-space schema (full_name, age) through inverse first.
      val df = rows.toDF("full_name", "age")
      val fwd = invertiblePipeline.forward(invertiblePipeline.inverseTransform(df))
      assert(fwd.columns.toSeq == Seq("full_name", "age"))
      assert(fwd.as[(String, Long)].collect().sorted.toSeq == rows.sorted)
    }
  }

  test("pipeline inverse = reversed stage inverses") {
    val p = invertiblePipeline
    val inv = p.inverse
    assert(inv.stages.map(_.name) == p.stages.reverse.map(_.inverseOp.get.name))
  }

  test("non-invertible stage fails inverse like a missing export") {
    val p = Pipeline.fromJson(
      """{"lenses":[{"path":"builtin:filter","arguments":{"expr":"age > 0"}}]}""")
    val e = intercept[UnsupportedOperationException](p.inverse)
    assert(e.getMessage.contains("does not export an inverse"))
  }
}
