package graft.tools

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.sim.IvfIndex
import graft.sources.Tables

class GenVecsSpec extends SparkSpec {
  private lazy val emb = Tables(spark, sf("sf0.001"), "embeddings")

  test("transformed copy preserves the multiset of element magnitudes exactly") {
    val t = GenVecs.transformed(col("embedding"), 64, new java.util.Random(7L))
    val rows = emb.limit(50)
      .select(col("embedding"), t.as("t"))
      .collect()
    rows.foreach { r =>
      val a = r.getSeq[Float](0).map(math.abs).sorted
      val b = r.getSeq[Float](1).map(math.abs).sorted
      assert(a == b) // bit-exact: negation/permutation only
      assert(r.getSeq[Float](0) != r.getSeq[Float](1)) // but genuinely moved
    }
  }

  test("transform is deterministic (java.util.Random algorithm is JDK-specified)") {
    def run() = emb.limit(20)
      .select(GenVecs.transformed(col("embedding"), 64, new java.util.Random(11L)))
      .collect().map(_.getSeq[Float](0)).toSeq
    assert(run() == run())
  }

  test("different seeds yield different transforms") {
    def run(seed: Long) = emb.limit(20)
      .select(GenVecs.transformed(col("embedding"), 64, new java.util.Random(seed)))
      .collect().map(_.getSeq[Float](0)).toSeq
    assert(run(1L) != run(2L))
  }

  test("generate writes copies× rows, all vectors distinct, base ids stable") {
    val dir = java.nio.file.Files.createTempDirectory("genvecs").toString
    val (rows, distinct) = GenVecs.generate(spark, dir, sf("sf0.001"), copies = 3, seed = 5L)
    val nBase = emb.count()
    assert(rows == 3 * nBase && distinct == rows)
    val out = spark.read.parquet(s"$dir/embeddings.parquet")
    // copy-0 rides along unchanged: same (vec_id, vector) pairs
    val baseBack = out.filter(col("vec_id") < nBase)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    emb.collect().foreach { r =>
      assert(baseBack(r.getLong(0)) == r.getSeq[Float](1))
    }
    // decades compose: re-scaling the scaled corpus stays collision-free
    val dir2 = java.nio.file.Files.createTempDirectory("genvecs2").toString
    val (rows2, distinct2) = GenVecs.generate(spark, dir2, dir, copies = 2, seed = 6L)
    assert(rows2 == 2 * rows && distinct2 == rows2)
  }

  test("suggestedNlist is isqrt clamped to corpus and cap") {
    assert(IvfIndex.suggestedNlist(0) == 1)
    assert(IvfIndex.suggestedNlist(1) == 1)
    assert(IvfIndex.suggestedNlist(2) == 1)
    assert(IvfIndex.suggestedNlist(4) == 2)
    assert(IvfIndex.suggestedNlist(2000) == 44)
    assert(IvfIndex.suggestedNlist(20000) == 141)
    assert(IvfIndex.suggestedNlist(200000) == 447)
    assert(IvfIndex.suggestedNlist(2000000) == 1414)
    assert(IvfIndex.suggestedNlist(1000000) == 1000) // perfect square, no rounding edge
    assert(IvfIndex.suggestedNlist(999999) == 999)
    assert(IvfIndex.suggestedNlist(1L << 40) == 65536) // cap
    // near-overflow corpus sizes: the isqrt correction compares via
    // division, so no Long-squared overflow spin (returns immediately)
    assert(IvfIndex.suggestedNlist(Long.MaxValue) == 65536)
    assert(IvfIndex.suggestedNlist(100, maxNlist = 4) == 4)
    // never exceeds the corpus itself (build's training require)
    assert(IvfIndex.suggestedNlist(3) <= 3)
  }
}
