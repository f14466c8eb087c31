package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Embedding-corpus decade generator (dev tool, NOT library surface).
  *
  * GenSf1's dim-ROTATION trick caps embedding replication at one decade:
  * a 64-dim vector admits only 64 distinct rotations, so composing the
  * 10× step twice manufactures exact-duplicate vectors (rotation offsets
  * add, and offsets a+b collide across copy pairs) — which is why the
  * round-10/11 ANN measurements stopped at a 20k-vector ceiling while
  * the fact/text surfaces got three decades.
  *
  * This tool replaces rotation with a per-copy ORTHOGONAL transform:
  * a dimension permutation composed with a sign-flip pattern, both drawn
  * Fisher-Yates-style from `java.util.Random` (algorithm specified by
  * the JDK → byte-stable across runs and JVMs; no wall-clock, no RNG
  * nondeterminism). Properties that make it the right scaling tool:
  *
  *  - rigid-motion preservation: permuting float lanes and negating
  *    them are bit-exact IEEE ops, so the MULTISET of element
  *    magnitudes is preserved verbatim — each copy is the same point
  *    cloud rigidly moved, and norms/intra-copy distances agree with
  *    the source's up to float summation order (ulps);
  *  - the group of (permutation × sign) transforms has 64!·2^64
  *    elements, and transforms COMPOSE into transforms of the same
  *    family, so decades stack (2k → 20k → 200k → 2M) with collision
  *    probability ~0 — distinctness is still VERIFIED below, not
  *    assumed (a distinct-hash count over every written corpus);
  *  - ANN geometry stays honest: cell occupancy / bucket balance match
  *    a real corpus of that size rather than 100 shifted replicas.
  *
  * Labels are kept so label-filtered queries still mean something;
  * vec_id offsets use the same next-power-of-10 stride discipline as
  * GenSf1, so copy-0 ids (the base corpus) are STABLE across decades —
  * a fixed query set by lowest vec_id refers to the same vectors at
  * every scale.
  *
  * Args: `dstDir srcDir copies seed` (all required — the seed MUST
  * differ per decade so composed transforms stay collision-free).
  */
object GenVecs {

  /** Per-copy transform: output lane j = ±(input lane perm(j)).
    * Copy 0 is the identity (the base corpus rides along unchanged). */
  private[tools] def transformed(vec: Column, dim: Int, rnd: java.util.Random): Column = {
    val perm = Array.tabulate(dim)(identity)
    var i = dim - 1
    while (i > 0) { // Fisher-Yates, as specified by java.util.Random
      val j = rnd.nextInt(i + 1)
      val t = perm(i); perm(i) = perm(j); perm(j) = t
      i -= 1
    }
    val signs = Array.fill(dim)(rnd.nextBoolean())
    array((0 until dim).map { j =>
      val e = element_at(vec, perm(j) + 1)
      if (signs(j)) negate(e) else e
    }: _*)
  }

  /** Generate `copies`× the source corpus into `dst`; returns
    * (rows, distinct vectors) after the write-back verification. */
  private[tools] def generate(spark: SparkSession, dst: String, src: String,
      copies: Int, seed: Long): (Long, Long) = {
    require(copies >= 2 && copies <= 64, s"copies=$copies out of [2,64]")
    require(!dst.startsWith("/root/testdata"),
      s"refusing to write into the driver's testdata tree ('$dst')")
    require(new java.io.File(dst).getCanonicalPath !=
      new java.io.File(src).getCanonicalPath, "dst == src would overwrite the source")

    val base = Tables(spark, src, "embeddings")
    val dim = base.select(size(col("embedding"))).head().getInt(0)
    val maxId = base.agg(max(col("vec_id"))).head().getLong(0)
    var stride = 1L; while (stride <= maxId) stride *= 10

    val out: DataFrame = (0 until copies).map { i =>
      val emb = if (i == 0) col("embedding")
        else transformed(col("embedding"), dim, new java.util.Random(seed * 1000003L + i))
      base.select(
        (col("vec_id") + lit(i * stride)).as("vec_id"),
        emb.as("embedding"),
        col("label"))
    }.reduce(_ unionByName _)
    out.write.mode(SaveMode.Overwrite).parquet(s"$dst/embeddings.parquet")

    // verify, don't assume: distinct vectors == rows (collision ~0 by
    // group size, but a seed-reuse mistake across decades WOULD collide)
    val back = spark.read.parquet(s"$dst/embeddings.parquet")
    val (rows, distinct) = {
      val r = back.agg(
        count(lit(1)),
        countDistinct(xxhash64(col("embedding").cast("array<double>").cast("string")))).head()
      (r.getLong(0), r.getLong(1))
    }
    println(s"[gen-vecs] $dst: $rows vectors, $distinct distinct (dim=$dim, stride=$stride)")
    require(rows == distinct, s"vector collision: $rows rows but $distinct distinct — reused seed?")
    (rows, distinct)
  }

  /** CLUSTERED corpus (r13): `n` vectors drawn around `k` hash-seeded
    * centers via [[graft.sim.Synthetic.clusteredEmbedding]] — the SAME
    * expression the oracle-checked q174 pins cross-engine, so the
    * ladder corpora and the proven generator cannot drift. `label` is
    * the true cluster id, which makes filtered-search and
    * recall-by-cluster analyses meaningful. Distinctness is verified
    * exactly like the transform mode (two ids collide only if all
    * dim noise hashes collide). */
  private[tools] def generateClustered(spark: SparkSession, dst: String,
      n: Long, dim: Int, k: Int, seed: Long, noiseMilli: Int,
      anisotropic: Boolean = false): (Long, Long) = {
    require(!dst.startsWith("/root/testdata"),
      s"refusing to write into the driver's testdata tree ('$dst')")
    spark.range(n).select(
        col("id").as("vec_id"),
        graft.sim.Synthetic.clusteredEmbedding(col("id"), dim, k, seed,
          noiseMilli, anisotropic).as("embedding"),
        graft.sim.Synthetic.clusterCell(col("id"), k, seed)
          .cast("string").as("label"))
      .write.mode(SaveMode.Overwrite).parquet(s"$dst/embeddings.parquet")
    val back = spark.read.parquet(s"$dst/embeddings.parquet")
    val r = back.agg(
      count(lit(1)),
      countDistinct(xxhash64(col("embedding").cast("array<double>").cast("string")))).head()
    val (rows, distinct) = (r.getLong(0), r.getLong(1))
    println(s"[gen-vecs] $dst: $rows clustered vectors, $distinct distinct " +
      s"(dim=$dim, k=$k, noiseMilli=$noiseMilli, anisotropic=$anisotropic)")
    require(rows == distinct,
      s"vector collision: $rows rows but $distinct distinct")
    (rows, distinct)
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.headOption match {
      case Some("clustered") =>
        require(args.length >= 6,
          "usage: GenVecs clustered <dstDir> <n> <dim> <k> <seed> [noiseMilli] [aniso]")
        // noiseMilli and the aniso flag are independently optional and
        // order-free: `clustered dst n dim k seed aniso 500` must set
        // noiseMilli=500, not silently ignore it. Unrecognized trailing
        // args are rejected rather than dropped.
        val trailing = args.drop(6)
        val (anisoFlags, rest) = trailing.partition(_ == "aniso")
        val noise = rest.filter(_.forall(_.isDigit))
        val bad = rest.filterNot(_.forall(_.isDigit))
        require(bad.isEmpty && noise.length <= 1 && anisoFlags.length <= 1,
          s"unrecognized trailing args ${trailing.mkString(" ")} — expected " +
            "at most one numeric noiseMilli and at most one 'aniso' flag")
        generateClustered(spark, args(1), args(2).toLong, args(3).toInt,
          args(4).toInt, args(5).toLong,
          noise.headOption.map(_.toInt).getOrElse(300),
          anisoFlags.nonEmpty)
      case _ =>
        require(args.length == 4,
          "usage: GenVecs <dstDir> <srcDir> <copies> <seed> (seed must differ " +
            "per decade) | GenVecs clustered <dstDir> <n> <dim> <k> <seed> [noiseMilli]")
        val Array(dst, src, copiesS, seedS) = args
        generate(spark, dst, src, copiesS.toInt, seedS.toLong)
    }
    spark.stop()
  }
}
