package graft.sim

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.sources.Tables

/** Sample-based quantizer training (r11): `trainSixteenths` fits the
  * IVF/PQ quantizers on a deterministic md5 hash-sample while
  * assignment/encode/search still cover the full corpus — the 100 TB
  * shape, where each Lloyd iteration over the full corpus was wasted
  * work. The q157/q158 oracles replay the sample cross-engine; this
  * spec pins the API-level contracts the oracles can't express. */
class SampledQuantizerSpec extends SparkSpec {
  private lazy val emb = Tables(spark, sf("sf0.01"), "embeddings")

  test("IVF sampled build still assigns EVERY corpus vector to a cell") {
    val m = IvfIndex.build(emb, "vec_id", "embedding", nlist = 8,
      trainSixteenths = 4)
    assert(m.cells.count() == emb.count())
    assert(m.centroids.count() == 8)
  }

  test("IVF full probe over sampled centroids equals brute force exactly") {
    // whatever centroids a sample produces, probing every cell is an
    // exhaustive scan — sampling can shift the recall/nprobe CURVE,
    // never the exact-probe answer
    val m = IvfIndex.build(emb, "vec_id", "embedding", nlist = 8,
      trainSixteenths = 4)
    val queries = emb.filter(col("vec_id") < 5)
    val brute = Similarity.bruteForceTopK(queries, emb, "vec_id", "embedding", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val ivf = IvfIndex.search(m, queries, "vec_id", "embedding", k = 3, nprobe = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(ivf == brute)
  }

  test("trainSixteenths=16 is byte-identical to the historical full train") {
    val full = IvfIndex.build(emb, "vec_id", "embedding", nlist = 8)
    val sixteen = IvfIndex.build(emb, "vec_id", "embedding", nlist = 8,
      trainSixteenths = 16)
    val a = full.centroids.orderBy("cell").collect().map(_.toString).toSeq
    val b = sixteen.centroids.orderBy("cell").collect().map(_.toString).toSeq
    assert(a == b)
  }

  test("sampled training really reads only the sample (count discipline)") {
    // the training relation is the hashSample slice; its size at sf0.01
    // is 118 of 500 — the build must succeed from it (nlist=8 << 118)
    // and a too-aggressive sample must fail LOUDLY, not degrade
    val sample = graft.ops.Extended.hashSample(
      emb.filter(col("embedding").isNotNull), "vec_id", 4)
    assert(sample.count() == 118)
    val e = intercept[IllegalArgumentException] {
      // 0/16 keeps nothing → the init sample can't fill nlist
      IvfIndex.build(emb, "vec_id", "embedding", nlist = 8,
        trainSixteenths = 0)
    }
    assert(e.getMessage.contains("trainSixteenths"))
  }

  test("PQ sampled codebook encodes the FULL corpus; ADC is total and deterministic") {
    val cb = PqIndex.train(emb, "vec_id", "embedding", m = 4, ksub = 8,
      trainSixteenths = 4)
    val codes = PqIndex.encode(emb, "vec_id", "embedding", cb)
    assert(codes.count() == emb.filter(col("embedding").isNotNull).count())
    val q = emb.filter(col("vec_id") < 4)
    def run() = PqIndex.searchADC(cb, codes, q, "vec_id", "embedding", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val r1 = run()
    assert(r1.size == 12) // 4 queries × k=3
    assert(r1 == run())
  }

  test("PQ trainSixteenths=16 reproduces the historical codebook") {
    val a = PqIndex.train(emb, "vec_id", "embedding", m = 4, ksub = 8)
    val b = PqIndex.train(emb, "vec_id", "embedding", m = 4, ksub = 8,
      trainSixteenths = 16)
    assert(a.centroids.flatten.flatten.toSeq == b.centroids.flatten.flatten.toSeq)
  }
}
