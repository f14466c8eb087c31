package graft.tools

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** sf1 soak-data generator (dev tool, NOT part of the library surface).
  *
  * The driver ships sf0.001/0.01/0.1 only; the 100×-scale claims in
  * PLANS.md deserve at least one measured decade, so this tool builds a
  * ~10× corpus from sf0.1 deterministically (no RNG — re-runs are
  * byte-stable):
  *
  *  - dimensions (region/nation/customer/supplier/part) copy unchanged —
  *    like a real warehouse, dims grow far slower than facts;
  *  - fact tables replicate 10× with non-overlapping key offsets
  *    (orders⋈lineitem keys shift together so joins stay sound);
  *  - `documents.text` gets a per-copy token suffix (`tok` → `tok_i`),
  *    giving each copy a DISJOINT vocabulary: dedup/minhash/LSH see the
  *    same within-copy duplicate structure as sf0.1 — scaled 10× — and
  *    no artificial cross-copy duplicates (10 exact copies of every doc
  *    would turn the soak into a pathological 90%-dup-rate benchmark);
  *  - `embeddings.embedding` circularly shifts its dims by the copy
  *    index: norms and pairwise-distance distribution are preserved,
  *    vectors are genuinely distinct, ANN cell occupancy stays balanced.
  *
  * Output dir (default `/root/repo/.sf1`) is gitignored.
  */
object GenSf1 {

  private val Copies = 10

  /** Args: `[dstDir [srcDir [mode]]]` — DESTINATION FIRST (defaults
    * `/root/repo/.sf1` from `/root/testdata/sf0.1`). The guard below
    * exists because the natural-looking `GenSf1 <srcDir>` invocation
    * would otherwise OVERWRITE the source dataset.
    *
    * mode `facts` replicates everything EXCEPT embeddings (copied
    * unchanged) — for building a THIRD scale decade (sf10 from .sf1):
    * the text-suffix trick composes (`tok_i` → `tok_i_j`, vocabularies
    * stay disjoint across all 100 copies), but the embedding rotation
    * does not (64-dim rotations admit only 64 distinct variants, so
    * 100 copies would manufacture exact-duplicate vectors and poison
    * the near-dup benchmarks). For embedding decades use [[GenVecs]]
    * instead (r12): its permutation+sign orthogonal transforms compose
    * collision-free across decades, which is how the ANN surface got
    * its 200k/2M-vector corpora. Key offsets are derived from the
    * SOURCE's actual max keys, so replication composes safely from any
    * already-replicated source. */
  def main(args: Array[String]): Unit = {
    val src = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val dst = args.headOption.getOrElse("/root/repo/.sf1")
    val factsOnly = args.lift(2).contains("facts")
    require(!dst.startsWith("/root/testdata"),
      s"refusing to write generated data into the driver's testdata tree ('$dst'); " +
        "args are [dstDir [srcDir [mode]]] — destination first")
    require(new java.io.File(dst).getCanonicalPath !=
      new java.io.File(src).getCanonicalPath,
      s"dst and src are the same directory ('$dst') — would overwrite the source")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // mode `docs` replicates ONLY the documents table — the fourth
    // dedup decade (5M docs from .sf10) needs no 12 GB lineitem copy,
    // just the text corpus; the token-suffix transform composes to any
    // depth (vocabularies stay disjoint across all 1000 copies)
    val docsOnly = args.lift(2).contains("docs")

    def write(df: DataFrame, name: String): Unit = {
      df.write.mode(SaveMode.Overwrite).parquet(s"$dst/$name.parquet")
      println(s"[gen-sf1] $name: ${spark.read.parquet(s"$dst/$name.parquet").count()} rows")
    }

    // dimensions: unchanged
    if (!docsOnly)
      Seq("region", "nation", "customer", "supplier", "part")
        .foreach(t => write(Tables(spark, src, t), t))

    def replicated(name: String)(perCopy: (DataFrame, Int) => DataFrame): DataFrame = {
      val base = Tables(spark, src, name)
      (0 until Copies).map(i => perCopy(base, i)).reduce(_ unionByName _)
    }
    // next power of 10 above the source's max keys: offsets stay
    // non-overlapping no matter how many replication decades the source
    // has already been through. One aggregate pass per table, however
    // many key columns; a clear error (not a row-access NPE) on an
    // empty source table
    def strides(name: String, keyCols: String*): Seq[Long] = {
      val row = Tables(spark, src, name)
        .agg(max(col(keyCols.head)), keyCols.tail.map(k => max(col(k))): _*)
        .head()
      keyCols.indices.map { i =>
        require(!row.isNullAt(i),
          s"source table '$name' is empty — nothing to replicate")
        var s = 1L; while (s <= row.getLong(i)) s *= 10; s
      }
    }

    if (!docsOnly) {
      val Seq(orderStride) = strides("orders", "o_orderkey")
      write(replicated("orders") { (df, i) =>
        df.withColumn("o_orderkey", col("o_orderkey") + lit(i * orderStride))
      }, "orders")

      write(replicated("lineitem") { (df, i) =>
        df.withColumn("l_orderkey", col("l_orderkey") + lit(i * orderStride))
      }, "lineitem")

      val Seq(eventStride, userStride) = strides("events", "event_id", "user_id")
      write(replicated("events") { (df, i) =>
        df.withColumn("event_id", col("event_id") + lit(i * eventStride))
          .withColumn("user_id", col("user_id") + lit(i * userStride))
      }, "events")
    }

    val Seq(docStride) = strides("documents", "doc_id")
    write(replicated("documents") { (df, i) =>
      val text = if (i == 0) col("text")
        else array_join(transform(split(col("text"), " "),
          t => concat(t, lit(s"_$i"))), " ")
      df.withColumn("doc_id", col("doc_id") + lit(i * docStride))
        .withColumn("text", text)
        .withColumn("n_chars", length(col("text")).cast("long"))
    }, "documents")

    if (docsOnly) {
      // no embeddings in a docs-only decade
    } else if (factsOnly) {
      write(Tables(spark, src, "embeddings"), "embeddings")
    } else {
      val Seq(vecStride) = strides("embeddings", "vec_id")
      write(replicated("embeddings") { (df, i) =>
        val emb = if (i == 0) col("embedding")
          else concat(slice(col("embedding"), i + 1, 64 - i),
            slice(col("embedding"), 1, i))
        df.withColumn("vec_id", col("vec_id") + lit(i * vecStride))
          .withColumn("embedding", emb)
      }, "embeddings")
    }

    spark.stop()
  }
}
