package graft.tools

import graft.functions.TextHash
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession

/** Scratch profiler for the AllPairs prefix join stages. */
object ProfileAllPairs {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val threshold = 0.7
    val df = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    def time(label: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); val r = f
      println(f"STAGE $label: ${(System.nanoTime() - t0) / 1e9}%.2f s ($r)")
    }
    val grams = df.filter(length(col("text")) >= 3)
      .select(col("doc_id").as("doc"),
        org.apache.spark.sql.graft.GraftSetBuilders
          .hashedCharNgrams(col("text"), 3).as("g"))
      .withColumn("ng", size(col("g")))
    val exploded = grams.select(col("doc"), col("ng"), explode(col("g")).as("gram"))
    time("exploded count")(exploded.count())
    val dfCounts = exploded.groupBy(col("gram")).agg(count(lit(1)).as("df_count"))
    time("df counts")(dfCounts.count())
    val prefixLen = (col("ng") - (-floor(-lit(threshold) * col("ng"))).cast("int") + 1)
    val prefixes = exploded.join(dfCounts, "gram")
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("doc")).orderBy(col("df_count"), col("gram"))))
      .where(col("rn") <= prefixLen)
      .select(col("doc"), col("gram"), col("rn"), col("ng"))
    time("prefixes count")(prefixes.count())
    val right = prefixes.select(col("doc").as("doc_b"), col("gram"),
      col("rn").as("rn_b"), col("ng").as("ng_b"))
    val alpha = lit(threshold) * (col("ng") + col("ng_b")) / lit(1.0 + threshold)
    val posBound = least(col("ng") - col("rn"), col("ng_b") - col("rn_b")) + lit(1)
    val joined = prefixes.join(right, "gram").where(col("doc") < col("doc_b"))
    time("index join hits")(joined.count())
    val pruned = joined
      .where(least(col("ng"), col("ng_b")) * lit(1.0) /
        greatest(col("ng"), col("ng_b")) >= threshold)
      .where(posBound.cast("double") >= alpha - lit(1e-9))
    time("after prunes")(pruned.count())
    val cands = pruned.select(col("doc").as("doc_a"), col("doc_b")).distinct()
    time("distinct candidates")(cands.count())
    spark.stop()
  }
}
