package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Incremental-dedup phase benchmark (dev tool): splits the corpus
  * 90/10 into history and "today's batch" like q170, but times the two
  * phases a production deployment actually separates —
  *
  *  - STANDING: historical pairs → closure (paid once, then stored;
  *    q170's self-contained query re-pays it every run), and
  *  - APPEND: batch-vs-corpus pair join + star-edges closure + collect
  *    (the amortized per-batch cost [[graft.dedup.Dedup.appendComponents]]
  *    exists to isolate).
  *
  * The standing cluster table is localCheckpointed between the phases,
  * exactly like the stored table it stands in for — the append timing
  * must not re-run the history. One JSON line to stdout
  * (+ SPARK_GRAFT_BENCH_OUT file). */
object IncBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    // batch:corpus ratio — 1:mod docs arrive as "today's batch" (q170's
    // oracle split is mod=10; production crawls run 1:100-1:1000+)
    val mod = args.lift(1).map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = body
      (a, (System.nanoTime() - t0) / 1e9)
    }
    val docs = graft.sources.Tables(spark, dir, "documents")
    val oldDocs = docs.filter(col("doc_id") % mod =!= 0)
    val newDocs = docs.filter(col("doc_id") % mod === 0)
    val nAll = docs.count(); val nNew = newDocs.count()

    // standing state = cluster table + corpus fingerprint table, both
    // stored between batches (localCheckpoint stands in for parquet)
    val ((standing, oldFps), tStanding) = timed {
      val fps = graft.dedup.Dedup.simHashTable(oldDocs, "text", "doc_id")
        .localCheckpoint(true)
      val comp = graft.dedup.Dedup.connectedComponents(
        graft.dedup.Dedup.simHashNearDupsFromFps(fps, "doc_id",
          maxHamming = 2), "id_a", "id_b")
        .localCheckpoint(true)
      (comp, fps)
    }
    // the amortized per-batch cost: tokenize ONLY the batch, append its
    // fingerprints to the stored table, block-join against it, star CC
    val (nOut, tAppend) = timed {
      val newFps = graft.dedup.Dedup.simHashTable(newDocs, "text", "doc_id")
      graft.dedup.Dedup.appendComponents(standing,
        graft.dedup.Dedup.simHashNearDupsAgainstFps(newFps,
          oldFps.unionByName(newFps), "doc_id", maxHamming = 2),
        "id_a", "id_b")
        .collect().length
    }
    // the DELTA fold (closure over batch-touched components only) —
    // the same full phase, so the comparison includes its extra
    // standing-table semi/anti scans, not just the smaller closure
    val (nDelta, tDelta) = timed {
      val newFps = graft.dedup.Dedup.simHashTable(newDocs, "text", "doc_id")
      graft.dedup.Dedup.appendComponentsDelta(standing,
        graft.dedup.Dedup.simHashNearDupsAgainstFps(newFps,
          oldFps.unionByName(newFps), "doc_id", maxHamming = 2),
        "id_a", "id_b")
        .collect().length
    }
    // the batch recompute the append replaces, same session for fairness
    val (nBatch, tBatch) = timed {
      graft.dedup.Dedup.connectedComponents(
        graft.dedup.Dedup.simHashNearDups(docs, "text", "doc_id",
          maxHamming = 2), "id_a", "id_b")
        .collect().length
    }
    require(nOut == nBatch, s"incremental $nOut != batch $nBatch rows")
    require(nDelta == nBatch, s"delta $nDelta != batch $nBatch rows")
    val json =
      s"""{"metric":"incbench","unit":"sec","dir":"$dir","mod":$mod,"n_docs":$nAll,""" +
      s""""n_batch_docs":$nNew,"n_cluster_rows":$nOut,""" +
      f""""standing_build":$tStanding%.3f,"append":$tAppend%.3f,""" +
      f""""append_delta":$tDelta%.3f,"batch_recompute":$tBatch%.3f}"""
    println(json)
    sys.env.get("SPARK_GRAFT_BENCH_OUT").foreach { p =>
      java.nio.file.Files.write(java.nio.file.Paths.get(p),
        (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
      System.err.println(s"[incbench] wrote $p")
    }
    spark.stop()
  }
}
