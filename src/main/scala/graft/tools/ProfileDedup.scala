package graft.tools

import graft.functions.TextHash
import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession

/** Scratch profiler for the dedup hot path (not part of the library API). */
object ProfileDedup {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val df = spark.read.parquet(s"$dir/documents.parquet")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"STAGE $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    val sigs = df
      .withColumn("tokens", split(col("text"), " "))
      .select(col("doc_id").as("doc"), TextHash.simHash64("tokens").as("simhash"))

    time("signatures")(sigs.count())
    val cached = time("cache sigs") { val c = sigs.cache(); c.count(); c }

    val chunked = cached.select(col("doc"), col("simhash"),
      explode(expr("transform(sequence(0, 3), " +
        "j -> named_struct('chunk', j, 'val', (simhash >> (16 * j)) & 65535))")).as("c"))
      .select(col("doc"), col("simhash"), col("c.chunk").as("chunk"), col("c.val").as("val"))

    time("distinct simhashes")(println("  distinct: " +
      cached.select("simhash").distinct().count() + " of " + cached.count()))

    val right = chunked.select(col("doc").as("doc_b"), col("simhash").as("simhash_b"),
      col("chunk"), col("val"))
    val joined = chunked.join(right, Seq("chunk", "val"))
      .where(col("doc") < col("doc_b"))
    time("candidate join count")(println("  candidates: " + joined.count()))
    time("hamming+distinct")(println("  result: " + joined
      .select(col("doc").as("doc_a"), col("doc_b"),
        bit_count(expr("simhash ^ simhash_b")).cast("long").as("hamming"))
      .where(col("hamming") <= 3).distinct().count()))
    spark.stop()
  }
}
