package graft

import graft.operators.{Pq, Similarity}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PqSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.get
  import spark.implicits._

  private lazy val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("encode: m codes per row, each within [0, ksub); corrupt rows dropped") {
    val cb = Pq.train(emb, "embedding", "vec_id", m = 8, ksub = 16, iters = 2)
    assert(cb.length == 8 && cb.forall(_.length == 16) && cb.forall(_.forall(_.length == 8)))
    val codes = Pq.encode(emb, "embedding", "vec_id", cb)
      .select("codes").as[Seq[Int]].collect()
    assert(codes.length == emb.count())
    assert(codes.forall(c => c.length == 8 && c.forall(x => x >= 0 && x < 16)))
    // a wrong-dimension row must drop, not mis-encode
    val dirty = emb.select(col("vec_id"), slice(col("embedding"), 1, 63).as("embedding"))
    assert(Pq.encode(dirty, "embedding", "vec_id", cb).count() == 0L)
  }

  test("train ignores corrupt rows: dirty corpus yields clean-corpus codebooks") {
    // A short row (60 elements) and a null-element row must not shape any
    // sub-codebook — a short row's tail slice is a plausible-width array
    // that could otherwise seed a wrong-dim (or biased) sub-quantizer.
    val base = emb.select(col("vec_id"), col("embedding"))
    val dirty = base
      .union(emb.limit(2).select((col("vec_id") + 10000).as("vec_id"),
        slice(col("embedding"), 1, 60).as("embedding")))
      .union(emb.limit(1).select((col("vec_id") + 20000).as("vec_id"),
        concat(slice(col("embedding"), 1, 63),
          array(lit(null).cast("float"))).as("embedding")))
    val a = Pq.train(base, "embedding", "vec_id", m = 4, ksub = 8, iters = 2)
    val b = Pq.train(dirty, "embedding", "vec_id", m = 4, ksub = 8, iters = 2)
    for (j <- a.indices; c <- a(j).indices)
      assert(a(j)(c).toSeq == b(j)(c).toSeq,
        s"dirty rows leaked into codebook $j centroid $c")
  }

  test("train is deterministic across reruns (codebooks bit-equal)") {
    val a = Pq.train(emb, "embedding", "vec_id", m = 4, ksub = 8, iters = 2)
    val b = Pq.train(emb, "embedding", "vec_id", m = 4, ksub = 8, iters = 2)
    assert(a.length == b.length)
    for (j <- a.indices; c <- a(j).indices)
      assert(a(j)(c).toSeq == b(j)(c).toSeq, s"codebook $j centroid $c differs")
  }

  test("ADC self-similarity: cos(v, decode(encode(v))) stays high") {
    val cb = Pq.train(emb, "embedding", "vec_id", m = 8, ksub = 16, iters = 2)
    val enc = Pq.encode(emb, "embedding", "vec_id", cb)
    val self = emb.join(enc, "vec_id")
      .select(org.apache.spark.sql.graft.GraftPq
        .pqAdcCosine(col("embedding"), col("codes"), cb).as("c"))
      .agg(min(col("c")), avg(col("c"))).as[(Double, Double)].head()
    info(f"ADC self-cosine: min ${self._1}%.3f avg ${self._2}%.3f")
    // reconstruction must point the same way as the original — the whole
    // premise of asymmetric scoring
    assert(self._2 >= 0.5, s"avg self-cosine ${self._2} — quantizer useless")
    assert(self._1 >= 0.0, s"min self-cosine ${self._1} — reconstruction inverted")
  }

  test("IVF x PQ: cell pruning composes with ADC — candidates stay in probed cells") {
    import graft.operators.Kmeans
    val centroids = Kmeans.train(emb, "embedding", "vec_id", k = 4, iters = 2)
    val cb = Pq.train(emb, "embedding", "vec_id", m = 16, ksub = 8, iters = 2)
    val out = Pq.ivfTopK(emb, emb.where(col("vec_id") < 10),
      "embedding", "vec_id", centroids, cb, k = 3, nprobe = 2)
      .as[(Long, Long, Long)].collect()
    assert(out.nonEmpty)
    // neighbors must come from the query's 2 probed cells only
    val cells = Kmeans.assign(emb, "embedding", "vec_id", centroids)
      .as[(Long, Long)].collect().toMap
    val probed = emb.where(col("vec_id") < 10)
      .select(col("vec_id"), org.apache.spark.sql.graft.GraftKmeans
        .nearestCentroids(col("embedding"), centroids, 2).as("p"))
      .as[(Long, Seq[Int])].collect().toMap
    out.foreach { case (q, n, _) =>
      assert(probed(q).map(_.toLong).contains(cells(n)),
        s"neighbor $n of query $q came from an unprobed cell")
    }
    // full probe (nprobe = k cells) must equal plain PQ topK
    val full = Pq.ivfTopK(emb, emb.where(col("vec_id") < 10),
      "embedding", "vec_id", centroids, cb, k = 3, nprobe = 4)
      .as[(Long, Long, Long)].collect().toSet
    val plain = Pq.topK(emb, emb.where(col("vec_id") < 10),
      "embedding", "vec_id", cb, k = 3)
      .as[(Long, Long, Long)].collect().toSet
    assert(full == plain, "nprobe=all-cells must degenerate to exhaustive ADC")
  }

  test("ADC recall@5 vs exact brute force on sf0.01") {
    val emb01 = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val queries = emb01.where(col("vec_id") < 50)
    val cb = Pq.train(emb01, "embedding", "vec_id", m = 16, ksub = 16, iters = 2)
    val exact = Similarity.bruteForceTopK(emb01, queries, "embedding", "vec_id", 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val approx = Pq.topK(emb01, queries, "embedding", "vec_id", cb, k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact & approx).size.toDouble / exact.size
    info(f"PQ-ADC recall@5 (m=16, ksub=16): $recall%.3f")
    // Near-random 64-dim corpus is the adversarial case for a 16-code
    // index (top-cosine gaps ~1e-3 vs quantization noise; measured 0.344,
    // exactly reproducible — training and ranking are deterministic);
    // real clustered embeddings reconstruct far better. The floor guards
    // "the index ranks by actual similarity", not production recall.
    assert(recall >= 0.25, s"recall $recall — ADC ranking broken, not just lossy")
    assert(approx.forall { case (q, n) => q != n })
  }

  test("residual IVF x PQ: candidates stay in probed cells; full probe " +
      "degenerates to exhaustive residual ADC") {
    import graft.operators.Kmeans
    val centroids = Kmeans.train(emb, "embedding", "vec_id", k = 4, iters = 2)
    val cb = Pq.trainResidual(emb, "embedding", "vec_id", centroids,
      m = 16, ksub = 8, iters = 2)
    val out = Pq.residualIvfTopK(emb, emb.where(col("vec_id") < 10),
      "embedding", "vec_id", centroids, cb, k = 3, nprobe = 2)
      .as[(Long, Long, Long)].collect()
    assert(out.nonEmpty)
    val cells = Kmeans.assign(emb, "embedding", "vec_id", centroids)
      .as[(Long, Long)].collect().toMap
    val probed = emb.where(col("vec_id") < 10)
      .select(col("vec_id"), org.apache.spark.sql.graft.GraftKmeans
        .nearestCentroids(col("embedding"), centroids, 2).as("p"))
      .as[(Long, Seq[Int])].collect().toMap
    out.foreach { case (q, n, _) =>
      assert(probed(q).map(_.toLong).contains(cells(n)),
        s"neighbor $n of query $q came from an unprobed cell")
    }
    val full = Pq.residualIvfTopK(emb, emb.where(col("vec_id") < 10),
      "embedding", "vec_id", centroids, cb, k = 3, nprobe = 4)
      .as[(Long, Long, Long)].collect().toSet
    val plain = Pq.residualTopK(emb, emb.where(col("vec_id") < 10),
      "embedding", "vec_id", centroids, cb, k = 3)
      .as[(Long, Long, Long)].collect().toSet
    assert(full == plain,
      "nprobe=all-cells must degenerate to exhaustive residual ADC")
  }

  test("residual ADC recall@5 beats plain PQ and clears 0.5 on sf0.01") {
    import graft.operators.Kmeans
    val emb01 = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val queries = emb01.where(col("vec_id") < 50)
    // Same per-row compression as the plain-PQ recall test (m=16 codes);
    // the coarse quantizer (256 cells — one small-int cell id per row,
    // the same id IVF pruning already stores) re-centers each code budget
    // on its residual ball. Training and ranking are deterministic
    // (hash-order seeds, fixed-point sums), so the measured recall is
    // exactly reproducible — the 0.5 floor has real margin, it is not a
    // flaky statistical bound.
    val cents = Kmeans.train(emb01, "embedding", "vec_id", k = 256, iters = 3)
    val cb = Pq.trainResidual(emb01, "embedding", "vec_id", cents,
      m = 16, ksub = 16, iters = 3)
    val exact = Similarity.bruteForceTopK(emb01, queries, "embedding", "vec_id", 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val approx = Pq.residualTopK(emb01, queries, "embedding", "vec_id",
        cents, cb, k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact & approx).size.toDouble / exact.size
    info(f"residual PQ-ADC recall@5 (256 cells, m=16, ksub=16): $recall%.3f")
    assert(recall >= 0.5, s"recall $recall — residual PQ below the 0.5 floor")
    assert(approx.forall { case (q, n) => q != n })
    // the PROBED production shape (sim_rpq_topk: nprobe=32 of 256 cells
    // = 12.5% of the corpus scanned) must retain most of the exhaustive
    // tier's recall — the coarse quantizer ranks the right cells
    val probed = Pq.residualIvfTopK(emb01, queries, "embedding", "vec_id",
        cents, cb, k = 5, nprobe = 32)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val probedRecall = (exact & probed).size.toDouble / exact.size
    info(f"probed (nprobe=32/256) recall@5: $probedRecall%.3f")
    assert(probedRecall >= 0.4,
      s"probed recall $probedRecall — cell pruning lost the neighbors")
  }

  test("residual near-dup pairs: salted triangle ≡ plain join on sf0.01") {
    import graft.operators.Kmeans
    val emb01 = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    // Small model — the property under test is the salt decomposition,
    // not recall: every unordered in-cell pair must be enumerated exactly
    // once with the id-canonical ADC direction, for ANY saltBuckets.
    val cents = Kmeans.train(emb01, "embedding", "vec_id", k = 16, iters = 2)
    val cb = Pq.trainResidual(emb01, "embedding", "vec_id", cents,
      m = 8, ksub = 8, iters = 2)
    val idx = Pq.encodeResidual(emb01, "embedding", "vec_id", cents, cb)
    def pairs(s: Int) = Pq.residualNearDupPairs(idx, emb01,
        "embedding", "vec_id", cents, cb,
        adcTau = 0.2, exactTau = 0.3, saltBuckets = s)
      .as[(Long, Long)].collect().toSet
    val plain = pairs(1)
    assert(plain.nonEmpty, "degenerate corpus: no verified pairs at tau=0.3")
    assert(plain.forall { case (a, b) => a < b }, "pairs not canonicalized")
    assert(pairs(4) == plain, "saltBuckets=4 changed the verified pair set")
    assert(pairs(7) == plain, "saltBuckets=7 changed the verified pair set")
  }
}
