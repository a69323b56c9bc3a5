package graft

import graft.operators.Layout
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Z-order layout semantics: the Morton code is the textbook interleave
 *  and the resulting order is the depth-first quadtree traversal that
 *  gives two-dimensional data skipping. */
class LayoutSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get
  import spark.implicits._

  test("morton code matches the bit-interleave definition") {
    val df = Seq((0L, 0L), (3L, 5L), (1L, 0L), (0L, 1L), (7L, 7L),
      (4294967295L, 0L), (0L, 4294967295L))
      .toDF("a", "b")
      .select(col("a"), col("b"), Layout.morton(col("a"), col("b")).as("z"))
    val got = df.as[(Long, Long, Long)].collect().map(t => (t._1, t._2) -> t._3).toMap
    def ref(a: Long, b: Long): Long =
      (0 until 32).map { i =>
        (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))
      }.reduce(_ | _)
    got.foreach { case ((a, b), z) => assert(z == ref(a, b), s"($a,$b)") }
    assert(got((3L, 5L)) == 39L) // hand-computed: x=011, y=101 -> 100111
  }

  test("z-order positions traverse quadrants contiguously (data skipping)") {
    // a 16x16 grid of points; ranks == coordinates by construction
    val grid = (for { x <- 0 until 16; y <- 0 until 16 }
      yield (x.toLong * 16 + y, x.toLong, y.toLong)).toDF("id", "xs", "ys")
    val laid = Layout.zorderLayout(grid, "id", "xs", "ys")
      .join(grid, Seq("id"))
      .select("pos", "xs", "ys")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    // the first quarter of positions is EXACTLY the (x<8, y<8) quadrant,
    // and each 4-block at every scale stays contiguous — spot-check the
    // top two levels
    val firstQuarter = laid.take(64)
    assert(firstQuarter.forall { case (_, x, y) => x < 8 && y < 8 })
    val secondQuarter = laid.slice(64, 128)
    assert(secondQuarter.forall { case (_, x, y) => x >= 8 && y < 8 })
    // within the first quadrant, the first 16 positions are the 4x4 cell
    assert(firstQuarter.take(16).forall { case (_, x, y) => x < 4 && y < 4 })
  }

  test("zorder binds as a lens-file stage (builtin:zorder)") {
    val df = Seq((1L, 2L, 3L), (2L, 1L, 1L), (3L, 3L, 2L)).toDF("id", "a", "b")
    val out = graft.engine.Pipeline.fromJson(
      """{"lenses":[{"path":"builtin:zorder",
        |"arguments":{"id":"id","dim_a":"a","dim_b":"b"}}]}""".stripMargin)
      .forward(df)
    assert(out.columns.toSeq == Seq("id", "zval", "pos"))
    assert(out.count() == 3)
  }

  test("layout is a permutation and rerun-deterministic") {
    val df = Seq.tabulate(200)(i => (i.toLong, (i * 37 % 50).toLong,
      ((i * 13) % 29).toDouble)).toDF("id", "k", "v")
    val a = Layout.zorderLayout(df, "id", "k", "v")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    val b = Layout.zorderLayout(df, "id", "k", "v")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(a.toSeq == b.toSeq)
    assert(a.map(_._3).sorted.toSeq == (1L to 200L).toSeq)
  }
}
