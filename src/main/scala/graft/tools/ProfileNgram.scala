package graft.tools

import graft.functions.TextHash
import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession

/** Scratch profiler for the ngram-Jaccard stages (not library API).
 *  Mirrors the CURRENT two-phase Dedup.ngramJaccard shape. */
object ProfileNgram {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    def time(label: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); val r = f
      println(f"STAGE $label: ${(System.nanoTime() - t0) / 1e9}%.2f s ($r)")
    }
    val saltBuckets = 8
    val grams = df.filter(length(col("text")) >= 3)
      .select(col("doc_id").as("doc"), col("lang").as("block"),
        org.apache.spark.sql.graft.GraftSetBuilders
          .hashedCharNgrams(col("text"), 3).as("g"))
      .withColumn("ng", size(col("g")))
      .withColumn("salt", pmod(xxhash64(col("doc")), lit(saltBuckets)).cast("int"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("grams compute+cache")(grams.agg(sum("ng")).head().getLong(0))
    time("grams reread")(grams.agg(sum("ng")).head().getLong(0))

    val slim = grams.select(col("doc"), col("block"), col("ng"), col("salt"))
    val left = slim
      .withColumn("sb", explode(expr(s"sequence(salt, ${saltBuckets - 1})")))
      .select(col("doc"), col("block"), col("ng"), col("salt").as("sa"), col("sb"))
    val right = slim
      .withColumn("sa", explode(expr("sequence(0, salt)")))
      .select(col("doc").as("doc_b"), col("block"), col("ng").as("ng_b"),
        col("sa"), col("salt").as("sb"))
    val candidates = left
      .join(right, Seq("block", "sa", "sb"))
      .where(col("sa") < col("sb") || col("doc") < col("doc_b"))
      .where(least(col("ng"), col("ng_b")) * lit(1.0) /
        greatest(col("ng"), col("ng_b")) >= 0.7)
      .select(col("doc"), col("doc_b"), col("ng"), col("ng_b"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("candidates count")(candidates.count())
    time("candidates recount")(candidates.count())

    val gA = broadcast(grams.select(col("doc"), col("g")))
    val gB = broadcast(grams.select(col("doc").as("doc_b"), col("g").as("g_b")))
    val out = candidates
      .join(gA, "doc").join(gB, "doc_b")
      .withColumn("jaccard",
        TextHash.jaccardSortedThresholded(col("g"), col("g_b"),
          col("ng"), col("ng_b"), 0.7))
      .where(col("jaccard") >= 0.7)
    time("verify count")(out.count())
    time("verify count again")(out.count())
    java.nio.file.Files.writeString(java.nio.file.Paths.get("/tmp/ngram_plan.txt"),
      out.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
