package graft

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Physical-layout behavior: bucketed joins plan without exchanges,
 *  hash-order sampling is deterministic. */
class StorageSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get

  test("matching bucketed tables join with no shuffle on either side") {
    import spark.implicits._
    Seq("t_fact", "t_dim").foreach { t =>
      if (spark.catalog.tableExists(t)) spark.sql(s"DROP TABLE $t")
    }
    (1 to 1000).map(i => (i.toLong % 97, s"v$i")).toDF("k", "v")
      .write.bucketBy(4, "k").sortBy("k")
      .option("path", "/tmp/graft_io/spec_fact").mode(SaveMode.Overwrite)
      .saveAsTable("t_fact")
    (0L until 97L).map(k => (k, s"dim$k")).toDF("k", "d")
      .write.bucketBy(4, "k").sortBy("k")
      .option("path", "/tmp/graft_io/spec_dim").mode(SaveMode.Overwrite)
      .saveAsTable("t_dim")
    val joined = spark.table("t_fact").join(
      spark.table("t_dim").hint("merge"), "k")
    val physical = joined.queryExecution.executedPlan.toString
    assert(!physical.contains("Exchange"),
      s"bucketed join must not shuffle, got:\n$physical")
    assert(joined.count() == 1000L)
  }

  test("hash-order sampling: deterministic across runs, k per group") {
    import spark.implicits._
    val df = (1 to 200).map(i => (i.toLong, s"g${i % 4}")).toDF("id", "g")
    def sample() = graft.operators.Sampling.perGroup(df, "g", "id", k = 7)
      .select("g", "id").as[(String, Long)].collect().toSet
    val s1 = sample(); val s2 = sample()
    assert(s1 == s2)
    assert(s1.groupBy(_._1).forall(_._2.size == 7))
  }

  test("keySkew: exact top-k, totals, and Herfindahl numerator") {
    import spark.implicits._
    // key 7 appears 5x, key 3 appears 3x, keys 1,2 once each -> 10 rows.
    val df = (Seq.fill(5)(7L) ++ Seq.fill(3)(3L) ++ Seq(1L, 2L)).toDF("k")
    val rows = graft.operators.Sampling.keySkew(df, "k", k = 2).collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((7L, 5L), (3L, 3L)))
    val r = rows.head
    assert(r.getAs[Long]("n_keys") == 4L)
    assert(r.getAs[Long]("n_rows") == 10L)
    assert(r.getAs[Long]("hhi") == 25L + 9L + 1L + 1L)
  }

  test("join-size prediction identity: sum of count products equals the " +
      "actual join cardinality on a skewed key") {
    import spark.implicits._
    val a = (Seq.fill(4)(1L) ++ Seq(2L, 3L)).toDF("k")          // 1x4, 2, 3
    val b = (Seq.fill(3)(1L) ++ Seq.fill(2)(2L) ++ Seq(9L)).toDF("k")
    val predicted = {
      val ca = a.groupBy("k").count().withColumnRenamed("count", "na")
      val cb = b.groupBy("k").count().withColumnRenamed("count", "nb")
      ca.join(cb, "k")
        .agg(sum(col("na").cast("decimal(38,0)") * col("nb")).cast("long"))
        .head().getLong(0)
    }
    val actual = a.join(b, "k").count()
    assert(predicted == actual && actual == 4L * 3 + 1L * 2)
  }

  test("partitioned layout: the lang slice reads via PartitionFilters, " +
      "not a data filter over every file") {
    val dir = "/root/testdata/sf0.001"
    val path = graft.queries.StorageQueries.ensurePartitionedTable(spark, dir)
    // partition directories exist per lang value
    val langDirs = new java.io.File(path).listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("lang="))
    assert(langDirs.length > 1, s"expected lang= partition dirs, got: ${langDirs.toSeq}")
    val q = spark.read.parquet(path).where(col("lang") === "de")
      .groupBy(col("source")).agg(count(lit(1)).as("n"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.replaceAll("\\s+", " ").matches(".*PartitionFilters: \\[[^\\]]*lang[^\\]]*\\].*"),
      "lang predicate must prune partitions at plan time")
    // pruned read agrees with the unpartitioned source
    val expect = graft.queries.T(spark, dir, "documents")
      .where(col("lang") === "de").groupBy(col("source"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = q.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == expect)
  }
}
