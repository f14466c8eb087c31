package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Streaming long-run soak (dev tool): every streaming capability is
  * spec-pinned stream==batch on one or two micro-batches, but nothing
  * recorded showed STANDING-STATE behavior — per-batch latency and
  * state growth over many micro-batches. This drives the two stateful
  * capabilities through ~50 real micro-batches each (ONE streaming
  * query, file source with maxFilesPerTrigger=1, AvailableNow) and
  * records the per-batch duration curve plus state sizes:
  *
  *  - `clusters`: [[graft.streaming.EventsStream.incrementalClustersSink]]
  *    over the documents table split into `batches` arrival slices —
  *    the standing fps/clusters parquet state grows with the corpus
  *    while per-batch cost should track the BATCH (plus one stored-fps
  *    scan), not the history.
  *  - `lsh`: [[graft.streaming.EventsStream.lshProbeStream]] over
  *    query slices against the static embeddings corpus — RocksDB/HDFS
  *    state-store rows grow with queries seen; per-batch cost should
  *    stay flat (each batch probes its own buckets only).
  *
  * One JSON line per soak to stdout (+ SPARK_GRAFT_BENCH_OUT file):
  * `{"metric":"streamsoak_<mode>","batches":[{batch,rows,sec}…],…}`.
  * Temp state/checkpoint dirs are pid-scoped (the r12c lesson) and
  * removed on exit.
  */
object StreamSoak {
  import scala.jdk.CollectionConverters._

  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("clusters")
    val dir = args.lift(1).getOrElse("/root/repo/.sf1")
    val nBatches = args.lift(2).map(_.toInt).getOrElse(50)
    // clusters mode only: pin the near-dup family (narrow|wide|auto)
    val family = args.lift(3).getOrElse("auto") match {
      case "narrow" => graft.dedup.NearDupFamily.Narrow60
      case "wide"   => graft.dedup.NearDupFamily.Wide120
      case "auto"   => graft.dedup.NearDupFamily.Auto
      case other    => sys.error(s"unknown family '$other' (narrow|wide|auto)")
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.streaming.numRecentProgressUpdates", "200")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val work = ToolWork.pidScopedDir(".streamsoak")
    val incoming = s"$work/incoming"
    new java.io.File(incoming).mkdirs()

    // pre-write each arrival slice as ONE flat parquet file so
    // maxFilesPerTrigger=1 means one slice per micro-batch
    def writeSlices(slices: Seq[org.apache.spark.sql.DataFrame]): Unit =
      slices.zipWithIndex.foreach { case (df, i) =>
        val tmp = s"$work/tmp_$i"
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        val parts = new java.io.File(tmp).listFiles()
          .filter(f => f.getName.endsWith(".parquet"))
        require(parts.nonEmpty, s"[stream-soak] slice $i (mode=$mode) is " +
          "empty — the residue class has no rows for this corpus; lower " +
          "nBatches or use a larger corpus")
        val part = parts.head
        java.nio.file.Files.move(part.toPath,
          java.nio.file.Paths.get(f"$incoming/b$i%04d.parquet"))
      }

    def runAndReport(metric: String,
        q: org.apache.spark.sql.streaming.StreamingQuery,
        extra: => String): Unit = {
      q.awaitTermination()
      val prog = q.recentProgress.filter(_.numInputRows > 0)
      val pts = prog.map { p =>
        val sec = p.durationMs.values.asScala.map(_.longValue()).sum / 1e3
        f"""{"batch":${p.batchId},"rows":${p.numInputRows},"sec":$sec%.3f}"""
      }
      // flatness summary: mean of the first vs last 5 loaded batches
      val secs = prog.map(p =>
        p.durationMs.values.asScala.map(_.longValue()).sum / 1e3)
      def mean(xs: Seq[Double]) = if (xs.isEmpty) 0.0 else xs.sum / xs.size
      val line = s"""{"metric":"$metric","n_batches":${prog.length},""" +
        f""""first5_mean_sec":${mean(secs.take(5).toSeq)}%.3f,""" +
        f""""last5_mean_sec":${mean(secs.takeRight(5).toSeq)}%.3f,""" +
        s"""$extra"batches":[${pts.mkString(",")}]}"""
      println(line)
      sys.env.get("SPARK_GRAFT_BENCH_OUT").foreach { p =>
        java.nio.file.Files.write(java.nio.file.Paths.get(p),
          (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
      }
    }

    mode match {
      case "clusters" =>
        val docs = graft.sources.Tables(spark, dir, "documents")
        writeSlices((0 until nBatches).map(b =>
          docs.filter(pmod(col("doc_id"), lit(nBatches)) === b)))
        val statePath = s"$work/state"
        val stream = spark.readStream.schema(docs.schema)
          .option("maxFilesPerTrigger", "1").parquet(incoming)
        val q = graft.streaming.EventsStream.incrementalClustersSink(
          stream, "text", "doc_id", statePath, s"$work/ckpt",
          family = family)
        runAndReport(s"streamsoak_clusters_${args.lift(3).getOrElse("auto")}", q, {
          val fps = spark.read.parquet(s"$statePath/fps").count()
          val cl = spark.read.parquet(s"$statePath/clusters").count()
          s""""final_fps_rows":$fps,"final_cluster_rows":$cl,"""
        })
      case "lsh" =>
        // transformWithState requires the RocksDB provider (multiple
        // column families) — same conf the spec sets
        spark.conf.set("spark.sql.streaming.stateStore.providerClass",
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
        val emb = spark.read.parquet(s"$dir/embeddings.parquet")
        val n = emb.count()
        val bits = graft.sim.Similarity.suggestedLshBits(n)
        val perBatch = 32
        writeSlices((0 until nBatches).map(b =>
          emb.filter(col("vec_id") >= b * perBatch &&
            col("vec_id") < (b + 1) * perBatch)))
        val stream = spark.readStream.schema(emb.schema)
          .option("maxFilesPerTrigger", "1").parquet(incoming)
        val out = graft.streaming.EventsStream.lshProbeStream(
          stream.toDF(), emb, "vec_id", "embedding", k = 10, dim = 64,
          bits = bits, tables = 4)
        val q = out.writeStream.format("noop")
          .outputMode("update")
          .option("checkpointLocation", s"$work/ckpt")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        runAndReport("streamsoak_lsh", q, {
          val lastState = q.recentProgress.lastOption
            .flatMap(_.stateOperators.headOption)
            .map(_.numRowsTotal).getOrElse(-1L)
          s""""n":$n,"bits":$bits,"final_state_rows":$lastState,"""
        })
      case other => sys.error(s"unknown mode '$other' (clusters | lsh)")
    }
    spark.stop()
  }
}
