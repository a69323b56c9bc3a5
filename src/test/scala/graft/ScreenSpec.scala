package graft

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.graft.AcAutomaton
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/**
 * The Aho–Corasick substring screen (`TextAnalysis.substringScreen` /
 * `substringHits`, native `SubstringHits` / `ContainsAnyPattern`):
 * automaton ≡ a naive per-pattern byte-search reference on adversarial
 * low-alphabet inputs (dense overlaps exercise the fail links), UTF-8
 * multi-byte safety, DataFrame faces vs a `contains`-chain reference,
 * and the zero-exchange plan contract.
 */
class ScreenSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.get
  import spark.implicits._

  private def naiveHits(text: String, patterns: Seq[String]): Seq[Int] = {
    val t = text.getBytes(StandardCharsets.UTF_8)
    patterns.zipWithIndex.collect {
      case (p, i) if bytesContains(t, p.getBytes(StandardCharsets.UTF_8)) => i
    }
  }

  private def bytesContains(hay: Array[Byte], needle: Array[Byte]): Boolean =
    (0 to hay.length - needle.length).exists { off =>
      var j = 0
      while (j < needle.length && hay(off + j) == needle(j)) j += 1
      j == needle.length
    }

  private def ac(patterns: Seq[String]) =
    new AcAutomaton(patterns.map(_.getBytes(StandardCharsets.UTF_8)).toArray)

  test("automaton ≡ naive byte search on dense low-alphabet inputs") {
    val textGen = Gen.listOfN(40, Gen.oneOf('a', 'b')).map(_.mkString)
    val patsGen = Gen.nonEmptyListOf(
      Gen.choose(1, 5).flatMap(n => Gen.listOfN(n, Gen.oneOf('a', 'b')).map(_.mkString)))
      .map(_.distinct.take(6))
    var checked = 0
    for (seed <- 1 to 300) {
      val text = textGen(Gen.Parameters.default, Seed(seed.toLong)).get
      val pats = patsGen(Gen.Parameters.default, Seed((seed + 1000).toLong)).get
      val a = ac(pats)
      val got = a.hits(UTF8String.fromString(text)).toSeq
      assert(got == naiveHits(text, pats),
        s"text='$text' patterns=$pats")
      assert(a.containsAny(UTF8String.fromString(text)) == got.nonEmpty)
      checked += 1
    }
    assert(checked == 300)
  }

  test("overlapping patterns all fire; ids sorted distinct") {
    // 'a','aa','aab','ab','b' over 'aab' — classic fail-link exercise
    val pats = Seq("a", "aa", "aab", "ab", "b", "zz")
    val got = ac(pats).hits(UTF8String.fromString("aab")).toSeq
    assert(got == Seq(0, 1, 2, 3, 4))
  }

  test("multi-byte UTF-8: byte-level matching ≡ string containment") {
    val pats = Seq("é", "né c", "日本", "😀ok", "plain")
    val texts = Seq("un été né chez nous", "日本語のテキスト", "x😀oky",
      "nothing here", "plainé日本")
    for (t <- texts) {
      val got = ac(pats).hits(UTF8String.fromString(t)).toSeq
      val want = pats.zipWithIndex.collect { case (p, i) if t.contains(p) => i }
      assert(got == want, s"text='$t'")
    }
  }

  test("screen and hits faces agree with the filter reference on sf0.001") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val pats = Seq("ust", "batch batch", "merge slo", "zz never zz")
    val screen = graft.operators.TextAnalysis
      .substringScreen(docs, "text", "doc_id", pats)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    val hits = graft.operators.TextAnalysis
      .substringHits(docs, "text", "doc_id", pats)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val ref = docs.select("doc_id", "text").as[(Long, String)].collect()
    for ((id, text) <- ref) {
      val want = pats.zipWithIndex.collect { case (p, i) if text.contains(p) => i }
      val (n, kept) = screen(id)
      assert(n == want.size && kept == want.isEmpty, s"doc $id")
      val docHits = hits.filter(_._1 == id).sortBy(_._2)
      assert(docHits.map(_._2).toSeq == want.map(_.toLong), s"doc $id hit ids")
      assert(docHits.map(_._3).toSeq == want.map(pats), s"doc $id hit patterns")
    }
    // the pattern set must exercise both verdicts and the never-fires id
    assert(screen.values.exists(_._2) && screen.values.exists(!_._2))
    assert(!hits.exists(_._2 == 3L))
  }

  test("screen plan is a pure scan projection — zero exchanges") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val plan = graft.operators.TextAnalysis
      .substringScreen(docs, "text", "doc_id", Seq("ust", "batch batch"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("lens file drives builtin:substring_screen") {
    import graft.engine.Pipeline
    val d = Seq((1L, "good bad phrase here"), (2L, "all clean")).toDF("doc_id", "text")
    val out = Pipeline.fromJson(
      """{"lenses":[{"path":"builtin:substring_screen",
        |  "arguments":{"patterns":["bad phrase", "zz"]}}]}""".stripMargin)
      .forward(d).as[(Long, Long, Boolean)].collect()
      .map(r => r._1 -> r._3).toMap
    assert(out == Map(1L -> false, 2L -> true))
  }

  test("empty and degenerate patterns are rejected") {
    intercept[IllegalArgumentException](ac(Seq.empty[String]))
    intercept[IllegalArgumentException](ac(Seq("ok", "")))
  }
}
