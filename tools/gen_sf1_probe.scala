// sf1 scale-probe data generator (BENCH_ISOLATED.md "sf1 scale probe"):
// 10 DISJOINT shards of sf0.1 under /tmp/sf1 - id spaces, event-time
// ranges, token vocabularies and embedding sign bases all disjoint per
// shard, so operators see 10x the volume with per-shard structure
// intact and no artificial cross-shard duplicate explosion. Run with:
//   /opt/spark/bin/spark-shell --master local[8] --driver-memory 16g \
//     --conf spark.ui.enabled=false -i tools/gen_sf1_probe.scala
// (keep this file ASCII - spark-shell -i reads the platform charset)
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SaveMode}
spark.conf.set("spark.sql.shuffle.partitions", 32)
spark.conf.set("spark.sql.session.timeZone", "UTC")
spark.sparkContext.setLogLevel("ERROR")
val src = "/root/testdata/sf0.1"
val dst = "/tmp/sf1"
val R = 10
val OFF = 10000000L
def t(name: String): DataFrame = spark.read.parquet(s"$src/$name.parquet")
def write(name: String, df: DataFrame): Unit = {
  df.write.mode(SaveMode.Overwrite).parquet(s"$dst/$name.parquet")
  println(s"WROTE $name: " + spark.read.parquet(s"$dst/$name.parquet").count())
}
def replicate(df: DataFrame)(shift: (DataFrame, Int) => DataFrame): DataFrame =
  (0 until R).map(i => shift(df, i)).reduce(_ union _)

// dimension tables: unchanged
write("region", t("region"))
write("nation", t("nation"))

write("customer", replicate(t("customer")) { (d, i) =>
  d.withColumn("c_custkey", col("c_custkey") + lit(i * OFF)) })
write("supplier", replicate(t("supplier")) { (d, i) =>
  d.withColumn("s_suppkey", col("s_suppkey") + lit(i * OFF)) })
write("part", replicate(t("part")) { (d, i) =>
  d.withColumn("p_partkey", col("p_partkey") + lit(i * OFF)) })
write("orders", replicate(t("orders")) { (d, i) =>
  d.withColumn("o_orderkey", col("o_orderkey") + lit(i * OFF))
   .withColumn("o_custkey", col("o_custkey") + lit(i * OFF)) })
write("lineitem", replicate(t("lineitem")) { (d, i) =>
  d.withColumn("l_orderkey", col("l_orderkey") + lit(i * OFF))
   .withColumn("l_partkey", col("l_partkey") + lit(i * OFF))
   .withColumn("l_suppkey", col("l_suppkey") + lit(i * OFF)) })

// events: disjoint users AND disjoint time ranges (hour cells replicate
// instead of stacking 10x entities into the same hour)
val ev = t("events")
val spanSec = ev.agg(expr("max(unix_micros(cast(ts as timestamp))) - min(unix_micros(cast(ts as timestamp)))"))
  .head().getLong(0) / 1000000L + 3600L
write("events", replicate(ev) { (d, i) =>
  d.withColumn("event_id", col("event_id") + lit(i * OFF))
   .withColumn("user_id", col("user_id") + lit(i * OFF))
   .withColumn("ts", col("ts") + expr("INTERVAL '" + (i * spanSec) + "' SECOND")) })

// documents: disjoint token spaces (suffix every token per replica > 0)
write("documents", replicate(t("documents")) { (d, i) =>
  val base = d.withColumn("doc_id", col("doc_id") + lit(i * OFF))
  if (i == 0) base
  else base.withColumn("text",
    array_join(transform(split(col("text"), " "), x => concat(x, lit("_r" + i))), " ")) })

// embeddings: per-replica uniform sign basis - preserves every
// within-replica cosine exactly (dot(s*a, s*b) = dot(a, b) for a
// +-1 sign vector s applied to both sides), decorrelates across replicas
write("embeddings", replicate(t("embeddings")) { (d, i) =>
  val base = d.withColumn("vec_id", col("vec_id") + lit(i * OFF))
  if (i == 0) base
  else base.withColumn("embedding",
    expr("transform(embedding, (x, j) -> cast(x * (1 - 2 * (abs(hash(" + i + ", j)) % 2)) as float))")) })

System.exit(0)
