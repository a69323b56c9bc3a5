package graft.tools

import graft.functions.TextHash
import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession

/** Scratch profiler for the ngram-Jaccard stages (not library API). */
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
    val grams = df.filter(length(col("text")) >= 3)
      .select(col("doc_id").as("doc"), col("lang").as("block"),
        TextHash.hashedSet(TextHash.charNgrams("text", 3)).as("g"))
      .withColumn("ng", size(col("g")))
      .withColumn("salt", pmod(xxhash64(col("doc")), lit(8)).cast("int"))
    time("grams compute")(grams.agg(sum("ng")).head().getLong(0))
    val left = grams.withColumn("sb", explode(expr("sequence(salt, 7)")))
      .select(col("doc"), col("block"), col("g"), col("ng"), col("salt").as("sa"), col("sb"))
    val right = grams.withColumn("sa", explode(expr("sequence(0, salt)")))
      .select(col("doc").as("doc_b"), col("block"), col("g").as("g_b"),
        col("ng").as("ng_b"), col("sa"), col("salt").as("sb"))
    val joined = left.join(right, Seq("block", "sa", "sb"))
      .where(col("sa") < col("sb") || col("doc") < col("doc_b"))
    time("join count (no verify)")(joined.count())
    val sized = joined.where(least(col("ng"), col("ng_b")) * lit(1.0) /
      greatest(col("ng"), col("ng_b")) >= 0.7)
    time("size-filter count")(sized.count())
    time("verify (intersect)")(sized.withColumn("j",
      TextHash.jaccardSorted(col("g"), col("g_b"), col("ng"), col("ng_b")))
      .where(col("j") >= 0.7).count())
    spark.stop()
  }
}
