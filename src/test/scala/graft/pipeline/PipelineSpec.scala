package graft.pipeline

import java.nio.file.Files
import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec
import graft.sources.{SqlGen, Tables}

class IntervalsSpec extends AnyFunSuite {
  test("reference interval forms (CopyToolConfig.java:574-642)") {
    assert(Intervals.parseSeconds("every 5 minutes") == 300)
    assert(Intervals.parseSeconds("2 hours") == 7200)
    assert(Intervals.parseSeconds("1 day") == 86400)
    assert(Intervals.parseSeconds("30 seconds") == 30)
    assert(Intervals.parseSeconds("45") == 45)
    assert(Intervals.parseSeconds("every 1 minute") == 60)
    intercept[IllegalArgumentException](Intervals.parseSeconds("soon"))
  }
}

class EnvSubstSpec extends AnyFunSuite {
  private val env = Map("HOST" -> "db1.example", "PORT" -> "5432")
  test("whole-value ENV:VAR:default form (CopyToolConfig.java:281-357)") {
    assert(EnvSubst.substitute("ENV:HOST:fallback", env) == "db1.example")
    assert(EnvSubst.substitute("ENV:MISSING:fallback", env) == "fallback")
  }
  test("inline {env:VAR} form") {
    assert(EnvSubst.substitute("jdbc://{env:HOST}:{env:PORT}/db", env) ==
      "jdbc://db1.example:5432/db")
    assert(EnvSubst.substitute("plain", env) == "plain")
  }
}

class SqlGenSpec extends AnyFunSuite {
  // parity with the reference's own tests (CopyTableTest.java:10-43)
  test("count query generation") {
    assert(SqlGen.countSql("test") == "SELECT COUNT(*) FROM test")
    assert(SqlGen.countSql("test", fromCountQuery = Some("SELECT COUNT(*) FROM test WHERE x=1"))
      == "SELECT COUNT(*) FROM test WHERE x=1")
  }
  test("select query generation") {
    assert(SqlGen.selectSql("test") == "SELECT * FROM test")
    assert(SqlGen.selectSql("test", fromColumns = Some("col1, col2")) ==
      "SELECT col1, col2 FROM test")
    assert(SqlGen.selectSql("test", fromQuery = Some("SELECT a FROM b JOIN c")) ==
      "SELECT a FROM b JOIN c")
  }
  test("custom query requires paired count query (CopyToolConfig.java:955-960)") {
    intercept[IllegalArgumentException] {
      SqlGen.countSql("test", fromQuery = Some("SELECT a FROM b"))
    }
  }
  test("dialect URLs + top-1 watermark queries (SourceDatabaseType.java)") {
    assert(SqlGen.MsSql.url("srv", None, "db") == "jdbc:sqlserver://srv:1433;databaseName=db")
    assert(SqlGen.Postgres.url("srv", Some(5433), "db") == "jdbc:postgresql://srv:5433/db")
    // A7 named instance (SourceDatabase.java:49-52): reaches the URL;
    // without an explicit port the Browser service resolves the
    // instance's dynamic port, so no hardcoded :1433
    assert(SqlGen.MsSql.url("srv", None, "db", Some("SQLEXPRESS")) ==
      "jdbc:sqlserver://srv;instanceName=SQLEXPRESS;databaseName=db")
    assert(SqlGen.MsSql.url("srv", Some(1444), "db", Some("SQLEXPRESS")) ==
      "jdbc:sqlserver://srv:1444;instanceName=SQLEXPRESS;databaseName=db")
    // blank instance is treated as unset, not emitted
    assert(SqlGen.MsSql.url("srv", None, "db", Some("  ")) ==
      "jdbc:sqlserver://srv:1433;databaseName=db")
    // PostgreSQL has no named instances — loud failure beats silent drop
    intercept[IllegalArgumentException](
      SqlGen.Postgres.url("srv", None, "db", Some("nope")))
    assert(SqlGen.MsSql.top1("t", "c") == "SELECT TOP 1 [c] FROM [t] ORDER BY [c] DESC")
    assert(SqlGen.Postgres.top1("t", "c") == """SELECT "c" FROM "t" ORDER BY "c" DESC LIMIT 1""")
    assert(SqlGen.monetDbUrl("srv", "db") == "jdbc:monetdb://srv/db")
  }
}

class WatermarkSpec extends SparkSpec {
  import Watermark._

  private val hash = "cfg1"

  test("conservative decision table (CopyTool.java:383-477)") {
    val stored = Some(State(BigintV(100), hash))
    // no stored state → copy
    assert(hasNewData(Some(BigintV(5)), None, hash))
    // poll failed / empty → copy
    assert(hasNewData(None, stored, hash))
    // config changed → copy
    assert(hasNewData(Some(BigintV(100)), stored, "other"))
    // type changed → copy
    assert(hasNewData(Some(TimestampV(Timestamp.valueOf("2024-01-01 00:00:00"))), stored, hash))
    // newer value → copy
    assert(hasNewData(Some(BigintV(101)), stored, hash))
    // same value → no copy (the ONLY false case family)
    assert(!hasNewData(Some(BigintV(100)), stored, hash))
    // older value → no copy
    assert(!hasNewData(Some(BigintV(99)), stored, hash))
  }

  test("timestamp + date comparisons") {
    val t1 = Timestamp.valueOf("2024-01-01 00:00:00")
    val t2 = Timestamp.valueOf("2024-01-02 00:00:00")
    assert(hasNewData(Some(TimestampV(t2)), Some(State(TimestampV(t1), hash)), hash))
    assert(!hasNewData(Some(TimestampV(t1)), Some(State(TimestampV(t1), hash)), hash))
    val d1 = java.sql.Date.valueOf("2024-01-01")
    val d2 = java.sql.Date.valueOf("2024-02-01")
    assert(hasNewData(Some(DateV(d2)), Some(State(DateV(d1), hash)), hash))
  }

  test("state round-trip + corrupt state → None (→ copy)") {
    val dir = Files.createTempDirectory("wm")
    val p = dir.resolve("state.txt")
    val st = State(TimestampV(Timestamp.valueOf("2024-01-30 23:57:12.194062")), hash)
    writeState(p, st)
    assert(readState(p).contains(st))
    Files.writeString(p, "garbage")
    assert(readState(p).isEmpty)
    assert(readState(dir.resolve("missing.txt")).isEmpty)
  }

  test("poll: max over trigger column, INTEGER→BIGINT normalization") {
    val events = Tables(spark, sf(), "events")
    val Some(TimestampV(ts)) = poll(events, "ts")
    assert(ts.after(Timestamp.valueOf("2024-01-01 00:00:00")))
    val Some(BigintV(id)) = poll(events, "event_id")
    assert(id > 0)
    // int32 column normalizes to BigintV
    val nation = Tables(spark, sf(), "nation")
    val Some(BigintV(nk)) = poll(nation, "n_nationkey")
    assert(nk == 24)
  }

  test("poll on empty source → None") {
    val empty = Tables(spark, sf(), "events").filter("event_id < 0")
    assert(poll(empty, "event_id").isEmpty)
  }
}

class StagingSpec extends SparkSpec {
  test("stage → validate → read round-trip with manifest") {
    val dir = Files.createTempDirectory("stg").toString
    val df = Tables(spark, sf(), "nation")
    val n = Staging.stage(df, dir)
    assert(n == 25)
    val m = Staging.validate(spark, dir)
    assert(m.count == 25)
    assert(m.schema == df.schema)
    assert(Staging.read(spark, dir).count() == 25)
    Staging.cleanup(dir)
    assert(!Files.exists(java.nio.file.Paths.get(dir)))
  }

  test("autoTrim trims string columns only (§1.3)") {
    import spark.implicits._
    val df = Seq((1, "  padded  "), (2, "clean")).toDF("id", "s")
    val trimmed = Staging.applyAutoTrim(df).collect().map(r => r.getString(1))
    assert(trimmed.sameElements(Array("padded", "clean")))
  }

  test("null vs empty string survives staging (§1.3)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("stg2").toString
    val df = Seq((1, Some("")), (2, None: Option[String])).toDF("id", "s")
    Staging.stage(df, dir)
    val back = Staging.read(spark, dir).orderBy("id").collect()
    assert(back(0).getString(1) == "")
    assert(back(1).isNullAt(1))
    Staging.cleanup(dir)
  }

  test("zero-row staging keeps schema (B4)") {
    val dir = Files.createTempDirectory("stg3").toString
    val df = Tables(spark, sf(), "nation").filter("n_nationkey < 0")
    assert(Staging.stage(df, dir) == 0)
    assert(Staging.validate(spark, dir).count == 0)
    Staging.cleanup(dir)
  }

  test("validation fails on missing manifest (F3)") {
    val dir = Files.createTempDirectory("stg4").toString
    intercept[IllegalStateException](Staging.validate(spark, dir))
  }
}

class PublishSpec extends SparkSpec {
  test("snapshot → publish → read-current → GC keep-2 (E1/E3/E4/E5)") {
    val root = Files.createTempDirectory("pub").toString
    val df = Tables(spark, sf(), "region")
    val versions = Seq("2024_01_01_00_00_00", "2024_01_02_00_00_00", "2024_01_03_00_00_00")
    versions.foreach(v => Publish.writeSnapshot(df, root, "region", v))
    assert(Publish.findNewestVersion(root, "region").contains("2024_01_03_00_00_00"))
    Publish.publishVersion(root, "region", "2024_01_03_00_00_00")
    assert(Publish.currentVersion(root, "region").contains("2024_01_03_00_00_00"))
    assert(Publish.readCurrent(spark, root, "region").count() == 5)
    val dropped = Publish.gcOldVersions(root, "region", keep = 2)
    assert(dropped == Seq("2024_01_01_00_00_00"))
    assert(Publish.listVersions(root, "region").sorted ==
      Seq("2024_01_02_00_00_00", "2024_01_03_00_00_00"))
  }

  test("newVersion: two issues in the same second stay distinct and ordered") {
    // the reference-inherited gap (CopyTool.java:216-224): a second-
    // granular stamp collides when runs are < 1 s apart; the issuer
    // must bump, never re-mint
    val t = java.time.LocalDateTime.now()
    val v1 = Publish.newVersion(t)
    val v2 = Publish.newVersion(t)
    val v3 = Publish.newVersion(t)
    assert(v1 < v2 && v2 < v3, s"$v1 / $v2 / $v3")
    assert(Seq(v1, v2, v3).forall(v =>
      Publish.VersionPattern.pattern.matcher(v).matches))
    // a later wall clock resumes stamping normally
    val v4 = Publish.newVersion(t.plusMinutes(5))
    assert(v4 == Publish.versionStamp(t.plusMinutes(5)) && v3 < v4)
  }

  test("switch-only publishes newest without touching data (E6)") {
    val root = Files.createTempDirectory("pub2").toString
    val df = Tables(spark, sf(), "region")
    Publish.writeSnapshot(df, root, "t", "2024_05_01_00_00_00")
    Publish.writeSnapshot(df, root, "t", "2024_06_01_00_00_00")
    assert(Publish.publishNewest(root, "t").contains("2024_06_01_00_00_00"))
    assert(Publish.currentVersion(root, "t").contains("2024_06_01_00_00_00"))
  }

  test("GC never deletes the published version even when older") {
    val root = Files.createTempDirectory("pub3").toString
    val df = Tables(spark, sf(), "region")
    Seq("2024_01_01_00_00_00", "2024_01_02_00_00_00", "2024_01_03_00_00_00", "2024_01_04_00_00_00")
      .foreach(v => Publish.writeSnapshot(df, root, "t", v))
    Publish.publishVersion(root, "t", "2024_01_01_00_00_00") // pinned old
    val dropped = Publish.gcOldVersions(root, "t", keep = 2)
    assert(!dropped.contains("2024_01_01_00_00_00"))
    assert(Publish.listVersions(root, "t").contains("2024_01_01_00_00_00"))
  }

  test("version pattern matches reference regex (CopyTool.java:64)") {
    assert(Publish.VersionPattern.pattern.matcher("2024_01_02_03_04_05").matches)
    assert(!Publish.VersionPattern.pattern.matcher("2024-01-02").matches)
    assert(!Publish.VersionPattern.pattern.matcher("backup").matches)
  }

  test("temp-swap publish replaces data dir (E2)") {
    val root = Files.createTempDirectory("pub4").toString
    Publish.tempSwapPublish(Tables(spark, sf(), "region"), root, "t")
    assert(spark.read.parquet(s"$root/t/data").count() == 5)
    Publish.tempSwapPublish(Tables(spark, sf(), "nation"), root, "t")
    assert(spark.read.parquet(s"$root/t/data").count() == 25)
  }
}

class CopyJobSpec extends SparkSpec {
  import CopyJob._

  private def freshCfg(tables: Seq[TableSpec], trigger: Option[TriggerSpec] = None) = {
    val base = Files.createTempDirectory("job")
    JobConfig(tables, sf(), s"$base/staging", s"$base/target", s"$base/state",
      trigger = trigger)
  }

  test("full 4-phase run: extract → load → publish → GC, result Copied") {
    val cfg = freshCfg(Seq(
      TableSpec("nation", FromSpec("nation"), "nation_out"),
      TableSpec("region", FromSpec("region"), "region_out")))
    val r = CopyJob.run(spark, cfg)
    assert(r == Copied)
    assert(Publish.readCurrent(spark, cfg.targetRoot, "nation_out").count() == 25)
    assert(Publish.readCurrent(spark, cfg.targetRoot, "region_out").count() == 5)
    // staging cleaned up (E7)
    assert(!Files.exists(java.nio.file.Paths.get(cfg.stagingRoot, "table_nation_nation_out")))
  }

  test("phase-parallel run equals sequential: same outputs, phases still barriered") {
    val tables = Seq(
      TableSpec("nation", FromSpec("nation"), "nation_p"),
      TableSpec("region", FromSpec("region"), "region_p"),
      TableSpec("supplier", FromSpec("supplier"), "supplier_p"))
    val cfg = freshCfg(tables).copy(tableParallelism = 3)
    assert(CopyJob.run(spark, cfg) == Copied)
    assert(Publish.readCurrent(spark, cfg.targetRoot, "nation_p").count() == 25)
    assert(Publish.readCurrent(spark, cfg.targetRoot, "region_p").count() == 5)
    assert(Publish.readCurrent(spark, cfg.targetRoot, "supplier_p").count() > 0)
  }

  test("a failing table in a parallel phase fails the job with the real cause") {
    val cfg = freshCfg(Seq(
      TableSpec("nation", FromSpec("nation"), "n_ok"),
      TableSpec("bad", FromSpec("no_such_table"), "n_bad")))
      .copy(tableParallelism = 2)
    CopyJob.run(spark, cfg) match {
      case Failed(reason, _) => assert(reason != null)
      case other => fail(s"expected Failed, got $other")
    }
  }

  test("end-to-end copy into a live JDBC database (C3/C7 via graft-jdbc)") {
    // the reference's whole pipeline shape — extract → stage → load into
    // a real database — with embedded Derby standing in for MonetDB
    val url = "jdbc:derby:memory:copyjobdb;create=true"
    val c = java.sql.DriverManager.getConnection(url)
    try {
      val st = c.createStatement()
      try st.executeUpdate(
        """CREATE TABLE nation_live (n_nationkey BIGINT, n_name VARCHAR(64),
           n_regionkey BIGINT, n_comment VARCHAR(256))""")
      finally st.close()
    } finally c.close()
    val cfg = freshCfg(Seq(
      TableSpec("nation", FromSpec("nation"), "nation_live",
        publishMode = JdbcLoad(url, batchSize = 7))))  // batch < rows: crosses flushes
    assert(CopyJob.run(spark, cfg) == Copied)
    val back = spark.read.jdbc(url, "nation_live", new java.util.Properties())
    assert(back.count() == 25)
    // second run overwrites (truncate-before-load), not duplicates
    assert(CopyJob.run(spark, cfg) == Copied)
    assert(spark.read.jdbc(url, "nation_live", new java.util.Properties()).count() == 25)
  }

  test("projection + query sources (A2/A3)") {
    val cfg = freshCfg(Seq(
      TableSpec("proj", FromSpec("nation", columns = Some(Seq("n_nationkey", "n_name"))), "proj_out"),
      TableSpec("qry", FromSpec("q",
        query = Some("SELECT r_name, count(*) AS n FROM region GROUP BY r_name")), "qry_out")))
    assert(CopyJob.run(spark, cfg) == Copied)
    val proj = Publish.readCurrent(spark, cfg.targetRoot, "proj_out")
    assert(proj.columns.toSeq == Seq("n_nationkey", "n_name"))
    assert(Publish.readCurrent(spark, cfg.targetRoot, "qry_out").count() == 5)
  }

  test("empty-source guard fails the whole job before any copy (F1)") {
    val cfg = freshCfg(Seq(
      TableSpec("good", FromSpec("nation"), "good_out"),
      TableSpec("empty", FromSpec("e",
        query = Some("SELECT * FROM nation WHERE n_nationkey < 0")), "empty_out")))
    val r = CopyJob.run(spark, cfg)
    assert(r.isInstanceOf[Failed])
    assert(r.exitCode == 1)
    // nothing published — guard ran before phase 1
    assert(Publish.currentVersion(cfg.targetRoot, "good_out").isEmpty)
  }

  test("allowEmpty permits empty tables (F1 override)") {
    val cfg = freshCfg(Seq(
      TableSpec("empty", FromSpec("e",
        query = Some("SELECT * FROM nation WHERE n_nationkey < 0")), "empty_out",
        allowEmpty = true)))
    assert(CopyJob.run(spark, cfg) == Copied)
    assert(Publish.readCurrent(spark, cfg.targetRoot, "empty_out").count() == 0)
  }

  test("trigger: first run copies, unchanged watermark → NoNewData, exit codes") {
    val cfg = freshCfg(Seq(TableSpec("ev", FromSpec("events"), "ev_out")),
      trigger = Some(TriggerSpec("events", "ts")))
    val r1 = CopyJob.run(spark, cfg)
    assert(r1 == Copied && r1.exitCode == 0)
    val r2 = CopyJob.run(spark, cfg)
    assert(r2 == NoNewData && r2.exitCode == 2)
  }

  test("switch-only republishes newest loaded version (E6)") {
    val cfg = freshCfg(Seq(TableSpec("nation", FromSpec("nation"), "n_out")))
    assert(CopyJob.run(spark, cfg) == Copied)
    val v1 = Publish.currentVersion(cfg.targetRoot, "n_out").get
    val r = CopyJob.run(spark, cfg.copy(switchOnly = true))
    assert(r == Copied)
    assert(Publish.currentVersion(cfg.targetRoot, "n_out").contains(v1))
  }

  test("retention across repeated runs keeps 2 versions (E5)") {
    val cfg = freshCfg(Seq(TableSpec("r", FromSpec("region"), "r_out", keepVersions = 2)))
    // distinct versions need distinct seconds; run() stamps per-run
    (1 to 3).foreach { _ => assert(CopyJob.run(spark, cfg) == Copied); Thread.sleep(1100) }
    assert(Publish.listVersions(cfg.targetRoot, "r_out").size <= 2)
  }

  test("temp-swap publish mode (E2)") {
    val cfg = freshCfg(Seq(TableSpec("r", FromSpec("region"), "r_swap",
      publishMode = TempSwap)))
    assert(CopyJob.run(spark, cfg) == Copied)
    assert(spark.read.parquet(s"${cfg.targetRoot}/r_swap/data").count() == 5)
  }
}
