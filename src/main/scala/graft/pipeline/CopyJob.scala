package graft.pipeline

import java.nio.file.Paths
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.sources.Tables

/** The 4-phase copy pipeline (SURVEY.md §3.1) — the reference's whole-job
  * semantics, Spark-native.
  *
  * Phase ordering is the reference's downtime-minimizing fleet order
  * (`CopyTool.java:202-299`): ALL tables extract, then ALL load, then ALL
  * publish, then GC — so a multi-table publish is consistent and the
  * publish window is as small as possible. Unlike the single-threaded
  * reference, each phase step is a distributed Spark job.
  *
  * Results mirror the reference's exit codes
  * (`CopyTool.java:66-68,95-106`): Copied=0, NoNewData=2, Failed=1.
  */
object CopyJob {

  /** What to extract (A1-A3): a named table, optional projection, or an
    * arbitrary SQL query over the registered tables. */
  final case class FromSpec(
      name: String,
      columns: Option[Seq[String]] = None,
      query: Option[String] = None)

  sealed trait PublishMode
  /** E1+E3: versioned snapshot + atomic pointer switch (default ON in the
    * reference: `useFastViewSwitching`, `CopyTable.java:54-63`). */
  case object ViewSwitch extends PublishMode
  /** E2: temp-dir swap into a stable data dir. */
  case object TempSwap extends PublishMode
  /** C3/C7 live-database load: truncate-and-batch-INSERT the staged data
    * into a JDBC table via the `graft-jdbc` DataSource V2 writer (each
    * Spark partition streams its own `batchsize`-row INSERT batches).
    * The load is the publish — the target table must already exist
    * (D3 DDL generation is the caller's step, as in the reference). */
  final case class JdbcLoad(url: String, batchSize: Int = 10000) extends PublishMode
  /** C1/C2/C4 live-MonetDB load via the reference's runtime cascade
    * (`CopyTool.java:829-866`): COPY-from-file (needs `copyDir`, a
    * server-readable shared mount) → COPY-from-STDIN (distributed, one
    * MAPI socket per partition, exact-count RECORDS hints) → batched
    * INSERT over JDBC. `configured = Some(BatchedInsert)` skips the COPY
    * attempts, mirroring `copymethod=insert`. The load is the publish. */
  final case class MonetLoad(
      host: String, port: Int, user: String, password: String,
      database: String, schema: String,
      jdbcUrl: String, batchSize: Int = 10000,
      configured: Option[graft.sinks.MonetSink.LoadMethod] = None,
      copyDir: Option[String] = None,
      locked: Boolean = true) extends PublishMode

  final case class TableSpec(
      id: String,
      from: FromSpec,
      to: String,
      allowEmpty: Boolean = false,    // F1 default (CopyTable.java:69)
      autoTrim: Boolean = true,       // §1.3 default (CopyTable.java:72)
      publishMode: PublishMode = ViewSwitch,
      keepVersions: Int = 2)          // E5 default (CopyTool.java:578-580)

  final case class TriggerSpec(table: String, column: String)

  final case class JobConfig(
      tables: Seq[TableSpec],
      sourceDir: String,              // harness source (parquet star schema)
      stagingRoot: String,
      targetRoot: String,
      stateDir: String,
      trigger: Option[TriggerSpec] = None,
      switchOnly: Boolean = false,    // E6 --switch-only
      noSwitch: Boolean = false,      // E6 --no-switch
      /** resume from durable staging after a crash between phases 1 and 2
        * (the reference's staging-triplet recovery, SURVEY §3.1). */
      resumeFromStaging: Boolean = false,
      /** tables processed concurrently WITHIN each phase (the phase
        * barriers of H3 are preserved: all extracts complete before any
        * load starts). The reference is strictly sequential; on a
        * cluster, independent tables' Spark jobs pipeline through the
        * scheduler and hide each other's stragglers. 1 = sequential. */
      tableParallelism: Int = 1) {
    /** Config identity for watermark-state scoping (G3). */
    def hash: String = Watermark.configHash(this.toString)
  }

  sealed trait JobResult { def exitCode: Int }
  case object Copied extends JobResult { val exitCode = 0 }
  case object NoNewData extends JobResult { val exitCode = 2 }
  final case class Failed(reason: String, cause: Option[Throwable] = None)
    extends JobResult { val exitCode = 1 }

  /** Resolve a FromSpec to a DataFrame (the A1-A3 scan surface). */
  def resolveSource(spark: SparkSession, cfg: JobConfig, from: FromSpec): DataFrame =
    from.query match {
      case Some(q) =>
        Tables.registerAll(spark, cfg.sourceDir)
        spark.sql(q)
      case None =>
        val df = Tables(spark, cfg.sourceDir, from.name)
        from.columns.map(cs => df.select(cs.map(df.col): _*)).getOrElse(df)
    }

  /** Run `f` over tables with bounded concurrency; sequential when
    * par ≤ 1. Failures propagate unwrapped so JobResult.Failed carries
    * the real cause. Safe because per-table work touches disjoint
    * staging/target dirs and Spark schedules concurrent jobs. */
  private def parForeach[A](xs: Seq[A], par: Int)(f: A => Unit): Unit =
    if (par <= 1 || xs.size <= 1) xs.foreach(f)
    else {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(math.min(par, xs.size))
      try {
        val futures = xs.map { x =>
          pool.submit(new java.util.concurrent.Callable[Unit] {
            def call(): Unit = f(x)
          })
        }
        futures.foreach { fut =>
          try fut.get()
          catch { case e: java.util.concurrent.ExecutionException => throw e.getCause }
        }
      } finally pool.shutdown()
    }

  /** C7 truncate + C3 distributed batched INSERT, in one overwrite. */
  private def jdbcLoad(staged: DataFrame, j: JdbcLoad, table: String): Unit =
    staged.write.format("graft-jdbc")
      .option("url", j.url).option("dbtable", table)
      .option("batchsize", j.batchSize.toString)
      .mode(org.apache.spark.sql.SaveMode.Overwrite)
      .save()

  /** C4 cascade against a live MonetDB, every rung replace-semantics:
    * [truncate + COPY-file] → [truncate + COPY-stdin] → INSERT.
    *
    * EACH COPY rung begins with its own C7 truncate (the reference
    * truncates the target before whichever load method runs,
    * `CopyTool.java:806-812`), not one shared preamble: a rung that
    * commits partial state and THEN fails (a LOCKED COPY dying
    * mid-statement bypasses the WAL and cannot roll back; a post-commit
    * cleanup error) must not leave those rows for the next rung to
    * append onto. The INSERT rung's Overwrite carries its own truncate
    * inside the write. So whichever rung ultimately succeeds, the table
    * holds exactly one copy of the staged data — a `copymethod=copyinto`
    * table re-loaded on a schedule replaces its contents exactly like
    * the default INSERT mode does. A rung whose truncate fails fails
    * AS that rung (no silent method downgrade) and the cascade moves
    * on; appending via COPY onto a table we failed to truncate is never
    * an option, and a genuinely absent table fails every rung loudly
    * (the target must pre-exist on this path — D3 DDL is the caller's
    * step).
    *
    * The stdin rung runs with `failOnTaskRetry` so a Spark task retry
    * can never re-COPY a committed partition; the rung fails instead
    * and the INSERT rung replaces any partial state — exactly-once end
    * to end. A missing `copyDir` makes the file attempt fail fast
    * BEFORE its truncate (no shared mount ⇒ the server can't read our
    * part files; no point emptying the table for a rung that cannot
    * run), exactly like the reference when its temp CSV is unreachable
    * (`CopyTool.java:823-826`). `records` is the staged manifest
    * count — the exact-count RECORDS hint both COPY forms carry. */
  private def monetLoad(staged: DataFrame, m: MonetLoad, table: String,
      records: Long): Unit = {
    import graft.sinks.MonetSink
    def truncate(): Unit = MonetSink.truncateViaMapi(m.host, m.port, m.user,
      m.password, m.database, m.schema, table)
    MonetSink.loadWithCascade(m.configured,
      copyFile = () => {
        val dir = m.copyDir.getOrElse(throw new IllegalStateException(
          "COPY INTO FROM file needs graft.monet.copydir (a server-readable shared mount)"))
        truncate()
        MonetSink.copyViaFiles(staged, m.host, m.port, m.user,
          m.password, m.database, m.schema, table, dir,
          records = Some(records), locked = m.locked)
      },
      copyStdin = () => {
        truncate()
        MonetSink.copyViaStdinDistributed(staged, m.host,
          m.port, m.user, m.password, m.database, m.schema, table,
          locked = m.locked, recordsHint = true, failOnTaskRetry = true)
      },
      insert = () => jdbcLoad(staged, JdbcLoad(m.jdbcUrl, m.batchSize), table))
    ()
  }

  private def stagingDir(cfg: JobConfig, t: TableSpec): String =
    Paths.get(cfg.stagingRoot, s"table_${t.from.name}_${t.to}").toString

  private def statePath(cfg: JobConfig) =
    Paths.get(cfg.stateDir, s"job-${cfg.hash.take(12)}_lastrun.txt")

  def run(spark: SparkSession, cfg: JobConfig): JobResult = {
    try {
      // ---- trigger check (G1-G4): skip everything when certain no new data
      val polled: Option[Option[Watermark.Value]] = cfg.trigger.map { tr =>
        val v = Watermark.poll(Tables(spark, cfg.sourceDir, tr.table), tr.column)
        val stored = Watermark.readState(statePath(cfg))
        if (!Watermark.hasNewData(v, stored, cfg.hash)) return NoNewData
        v
      }

      val version = Publish.newVersion()

      // shared phase-2 body (normal and resume paths must never diverge):
      // F3 validate, B4 zero-row short-circuit, then load per publish mode
      def loadOne(t: TableSpec): Unit = {
        val m = Staging.validate(spark, stagingDir(cfg, t))   // F3
        if (m.count > 0 || t.allowEmpty) {                    // B4 short-circuit
          val staged = Staging.read(spark, stagingDir(cfg, t))
          t.publishMode match {
            case ViewSwitch => Publish.writeSnapshot(staged, cfg.targetRoot, t.to, version)
            case TempSwap   => Publish.tempSwapPublish(staged, cfg.targetRoot, t.to)
            case j: JdbcLoad => jdbcLoad(staged, j, t.to)
            case ml: MonetLoad => monetLoad(staged, ml, t.to, m.count)
          }
        }
      }

      if (cfg.resumeFromStaging) {
        // crash-between-phases resumption (§3.1): phase 1 already ran and
        // its durable staging survived — validate it (F3) and continue
        // from phase 2 without re-extracting. The F1 guard's resume
        // equivalent runs on the MANIFESTS (the sources may have changed
        // since the crash — staging is the truth being resumed): without
        // it, a zero-row staging for an allowEmpty=false table would
        // skip its snapshot while phase 3 still repoints CURRENT at the
        // never-written version dir, wedging every reader.
        val empties = cfg.tables.filterNot(_.allowEmpty).filter { t =>
          Staging.validate(spark, stagingDir(cfg, t)).count == 0
        }
        if (empties.nonEmpty)
          return Failed(s"empty staged tables: ${empties.map(_.id).mkString(", ")}")
        parForeach(cfg.tables, cfg.tableParallelism)(loadOne)
      } else if (!cfg.switchOnly) {
        // ---- F1 empty-source guard: ALL tables checked before ANY copy
        val empties = cfg.tables.filterNot(_.allowEmpty).filter { t =>
          resolveSource(spark, cfg, t.from).isEmpty   // limit-1 probe, not count
        }
        if (empties.nonEmpty)
          return Failed(s"empty source tables: ${empties.map(_.id).mkString(", ")}")

        // ---- PHASE 1: extract ALL tables to durable staging
        parForeach(cfg.tables, cfg.tableParallelism) { t =>
          Staging.stage(resolveSource(spark, cfg, t.from), stagingDir(cfg, t), t.autoTrim)
        }

        // ---- PHASE 2: load ALL tables (staging → snapshot)
        parForeach(cfg.tables, cfg.tableParallelism)(loadOne)
      }

      // ---- PHASE 3: publish ALL tables (pointer/view switch)
      if (!cfg.noSwitch) {
        cfg.tables.foreach { t =>
          t.publishMode match {
            case ViewSwitch =>
              if (cfg.switchOnly) Publish.publishNewest(cfg.targetRoot, t.to) // E6
              else Publish.publishVersion(cfg.targetRoot, t.to, version)
            case TempSwap => () // already swapped in phase 2
            case _: JdbcLoad => () // the load is the publish
            case _: MonetLoad => () // the load is the publish
          }
        }
      }

      // ---- PHASE 4: retention GC
      cfg.tables.filter(_.publishMode == ViewSwitch).foreach { t =>
        Publish.gcOldVersions(cfg.targetRoot, t.to, t.keepVersions)
      }

      // ---- E7 staging cleanup + G3 state persist (only after full success)
      if (!cfg.switchOnly) cfg.tables.foreach(t => Staging.cleanup(stagingDir(cfg, t)))
      polled.flatten.foreach { v =>
        Watermark.writeState(statePath(cfg), Watermark.State(v, cfg.hash))
      }
      Copied
    } catch {
      case e: Exception => Failed(e.getMessage, Some(e))
    }
  }

  /** H4 multi-config sequential runs (the reference's docker-entrypoint
    * loop over N config files): run each job in order, never letting one
    * failure stop the fleet; returns per-job results. */
  def runAll(spark: SparkSession, configs: Seq[JobConfig]): Seq[JobResult] =
    configs.map { cfg =>
      try run(spark, cfg) catch { case e: Exception => Failed(e.getMessage, Some(e)) }
    }

  /** H5 failure alerting: the engine-core hook — the reference's SMTP
    * mailer is one possible `alert` implementation (deliberately outside
    * the engine, SURVEY §2.H5). */
  def runWithAlert(spark: SparkSession, cfg: JobConfig)
      (alert: Failed => Unit): JobResult =
    run(spark, cfg) match {
      case f: Failed => alert(f); f
      case ok        => ok
    }

  /** H1 interval scheduler: run forever, stay alive on failure, sleep the
    * configured interval. Batch re-invocation — semantically identical to
    * the reference's loop (`CopyTool.java:122-160`). `maxRuns` bounds it
    * for tests. `firstRunCfg` lets the FIRST iteration differ — the
    * resume-then-continue restart: run 1 resumes from durable staging
    * (which it then cleans), every later run extracts normally; a
    * resume flag that persisted across iterations would fail forever
    * once run 1 consumed the staging. */
  def runScheduled(spark: SparkSession, cfg: JobConfig, intervalSeconds: Long,
      maxRuns: Int = Int.MaxValue, onResult: JobResult => Unit = _ => (),
      firstRunCfg: Option[JobConfig] = None): Unit = {
    var runs = 0
    while (runs < maxRuns) {
      val c = if (runs == 0) firstRunCfg.getOrElse(cfg) else cfg
      val result = try run(spark, c) catch {
        case e: Exception => Failed(e.getMessage, Some(e))
      }
      onResult(result)
      runs += 1
      if (runs < maxRuns) Thread.sleep(intervalSeconds * 1000)
    }
  }
}
