package graft

import graft.operators.{Sampling, SkewJoin, Spans}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/**
 * Property tests for the round-5 operators: structural invariants over
 * generated corpora, not just hand-picked cases. Raw ScalaCheck Gens with
 * fixed seeds (the scalatest bridge isn't in the offline dependency
 * cache) — deterministic, reproducible samples.
 */
class OperatorPropertySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (1 to n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  // Small-alphabet token documents: high collision rate forces real
  // duplicated runs, merges, and islands.
  private val docGen: Gen[String] =
    Gen.nonEmptyListOf(Gen.oneOf("a", "b", "c", "d")).map(_.take(40).mkString(" "))
  private val corpusGen: Gen[Seq[String]] =
    Gen.listOfN(12, docGen)

  test("duplicateSpans invariants: in-bounds, >= n long, disjoint with a gap") {
    val n = 4
    samples(corpusGen, 8).zipWithIndex.foreach { case (texts, i) =>
      val df = texts.zipWithIndex.map { case (t, j) => (j.toLong, t) }
        .toDF("doc_id", "text")
      val lens = texts.zipWithIndex
        .map { case (t, j) => j.toLong -> t.split(" ").length }.toMap
      val spans = Spans.duplicateSpans(df, "text", "doc_id", n = n)
        .as[(Long, Long, Long)].collect().groupBy(_._1)
      spans.foreach { case (doc, ss) =>
        ss.foreach { case (_, s, e) =>
          assert(s >= 0 && e < lens(doc), s"sample $i: span [$s,$e] out of bounds")
          assert(e - s + 1 >= n, s"sample $i: span shorter than n")
        }
        // merged spans are disjoint with at least one uncovered token
        // between them (adjacent windows would have merged)
        val sorted = ss.map(x => (x._2, x._3)).sortBy(_._1)
        sorted.sliding(2).foreach {
          case Array((_, e1), (s2, _)) =>
            assert(s2 >= e1 + 2, s"sample $i: spans touch — merge failed")
          case _ => ()
        }
      }
    }
  }

  test("stripSpans conservation: kept tokens = total - covered, order preserved") {
    val n = 4
    samples(corpusGen, 8).foreach { texts =>
      val df = texts.zipWithIndex.map { case (t, j) => (j.toLong, t) }
        .toDF("doc_id", "text")
      val spans = Spans.duplicateSpans(df, "text", "doc_id", n = n)
        .as[(Long, Long, Long)].collect().groupBy(_._1)
      val stripped = Spans.stripSpans(df, "text", "doc_id", n = n)
        .as[(Long, String)].collect().toMap
      texts.zipWithIndex.foreach { case (t, j) =>
        val toks = t.split(" ", -1)
        val covered = spans.getOrElse(j.toLong, Array.empty)
          .flatMap { case (_, s, e) => s to e }.toSet
        val expect = toks.zipWithIndex
          .collect { case (tok, p) if !covered.contains(p.toLong) => tok }
          .mkString(" ")
        assert(stripped(j.toLong) == expect,
          s"doc $j: strip disagrees with span-complement")
      }
    }
  }

  test("upsample: engine copy counts equal the mixer formula for random rates") {
    val ratesGen = Gen.zip(
      Gen.chooseNum(0.0, 3.0), Gen.chooseNum(0.0, 3.0), Gen.chooseNum(0.0, 2.0))
    samples(ratesGen, 6).foreach { case (rBooks, rWeb, rDefault) =>
      val rates = Map("books" -> rBooks, "web" -> rWeb)
      val df = (1L to 150L)
        .map(i => (i, Seq("books", "web", "misc")((i % 3).toInt)))
        .toDF("doc_id", "source")
      val got = Sampling.upsample(df, "source", "doc_id", rates, rDefault)
        .groupBy("doc_id").count().as[(Long, Long)].collect().toMap
      def copiesOf(id: Long, rate: Double): Long = {
        val bucket = ((math.abs(id) % 999979L) * 3266489917L) % 4294967296L % 1000000L
        math.floor(rate).toLong +
          (if (bucket < math.round((rate - math.floor(rate)) * 1e6)) 1L else 0L)
      }
      (1L to 150L).foreach { id =>
        val src = Seq("books", "web", "misc")((id % 3).toInt)
        val r = src match {
          case "books" => rBooks; case "web" => rWeb; case _ => rDefault
        }
        val want = copiesOf(id, r)
        assert(got.getOrElse(id, 0L) == want, s"id $id src $src rate $r")
      }
    }
  }

  test("tokenBudgetPlan: targets split the budget by weight, epochs floor exactly") {
    val df = Seq(
      (1L, "a", 40L), (2L, "a", 60L),          // a: 100 tokens
      (3L, "b", 300L),                          // b: 300
      (4L, "c", 200L), (5L, "c", 400L))         // c: 600
      .toDF("doc_id", "grp", "tk")
    val plan = Sampling.tokenBudgetPlan(df, "grp", "tk",
        budgetTokens = 1000L, weights = Map("a" -> 2.0), defaultWeight = 1.0)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // sumw = 2 + 1 + 1 = 4 -> targets 500 / 250 / 250
    assert(plan("a") == ((2L, 100L, 500L, 5000000L)),
      "a repeats 5x to spend its half of the budget")
    assert(plan("b") == ((1L, 300L, 250L, 833333L)),
      "b subsamples to 250/300 epochs, floored at micro precision")
    assert(plan("c") == ((2L, 600L, 250L, 416666L)))
    assert(plan.values.map(_._3).sum <= 1000L,
      "floored targets never overspend the budget")
  }

  test("saltedInner == plain join on generated tables and salt counts") {
    val tableGen = Gen.zip(
      Gen.listOfN(60, Gen.chooseNum(0L, 8L)), // probe keys (collisions + misses)
      Gen.listOfN(12, Gen.chooseNum(0L, 12L)), // build keys (dups allowed)
      Gen.chooseNum(1, 9))
    samples(tableGen, 6).foreach { case (pks, bks, saltN) =>
      val probe = pks.zipWithIndex.map { case (k, i) => (k, s"p$i") }.toDF("k", "pv")
      val build = bks.zipWithIndex.map { case (k, i) => (k, s"b$i") }.toDF("k", "bv")
      val plain = probe.join(build, Seq("k"))
        .as[(Long, String, String)].collect().sorted.toSeq
      val salted = SkewJoin.saltedInner(probe, build, Seq("k"), saltN)
        .select(col("k"), col("pv"), col("bv"))
        .as[(Long, String, String)].collect().sorted.toSeq
      assert(salted == plain, s"saltBuckets=$saltN diverged from plain join")
    }
  }

  test("topNgram == in-memory brute count with the byte-order tie-break " +
      "on low-alphabet corpora") {
    samples(corpusGen, 10).zipWithIndex.foreach { case (texts, si) =>
      val df = texts.zipWithIndex.map { case (t, j) => (j.toLong, t) }
        .toDF("doc_id", "text")
      val got = graft.operators.TextAnalysis.topNgram(df, "text", "doc_id", 2)
        .select("doc_id", "top_gram", "n_occ")
        .as[(Long, String, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      texts.zipWithIndex.foreach { case (t, j) =>
        val ws = t.split(" ", -1)
        if (ws.length < 2) assert(!got.contains(j.toLong))
        else {
          val counts = ws.sliding(2).map(_.mkString(" ")).toSeq
            .groupBy(identity).view.mapValues(_.size.toLong).toMap
          // (count desc, gram asc in UTF-8 byte order — ASCII here, so
          // string order coincides)
          val want = counts.toSeq.minBy { case (g, c) => (-c, g) }
          assert(got(j.toLong) == ((want._1, want._2)),
            s"sample $si doc $j: ${got(j.toLong)} != $want")
        }
      }
    }
  }

  test("fuzzyKeyPairs == brute-force levenshtein<=1 on adversarial " +
      "random short keys (empty strings included)") {
    val keyGen: Gen[String] =
      Gen.listOf(Gen.oneOf('a', 'b')).map(_.take(4).mkString)
    val setGen: Gen[Seq[String]] = Gen.listOfN(14, keyGen)
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    samples(setGen, 8).zipWithIndex.foreach { case (keys, si) =>
      val df = keys.zipWithIndex.map { case (k, j) => (j.toLong, k) }
        .toDF("id", "k")
      val got = graft.operators.Dedup.fuzzyKeyPairs(df, "k", "id")
        .as[(Long, Long)].collect().toSet
      val want = (for {
        i <- keys.indices; j <- keys.indices if i < j
        if lev(keys(i), keys(j)) <= 1
      } yield (i.toLong, j.toLong)).toSet
      assert(got == want, s"sample $si: blocking lost or invented pairs")
    }
  }
}
