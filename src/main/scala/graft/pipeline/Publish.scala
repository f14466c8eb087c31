package graft.pipeline

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.time.LocalDateTime
import java.time.format.DateTimeFormatter
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Versioned publish / view switch / retention GC (SURVEY.md §2.E).
  *
  * The reference's signature capability: load into a versioned table
  * `name_<yyyy_MM_dd_HH_mm_ss>` (`MonetDBTable.java:31-43`), then repoint
  * a stable view at the newest version in one transaction
  * (`MonetDBUtil.java:442-529`), keeping the current + one backup version
  * (`CopyTool.java:554-602`).
  *
  * Spark-native layout: each target table is a directory of immutable
  * snapshot subdirs plus an atomically-replaced CURRENT pointer file —
  * readers resolve the pointer then read an immutable snapshot, which
  * gives the same near-zero-downtime switch without any table lock:
  * {{{
  *   <root>/<table>/v=<version>/   (immutable parquet snapshots)
  *   <root>/<table>/CURRENT        (pointer: the published version)
  * }}}
  */
object Publish {

  private val VersionFmt = DateTimeFormatter.ofPattern("yyyy_MM_dd_HH_mm_ss")
  /** Same shape the reference stamps (`CopyTool.java:216-224`) and
    * discovers by regex (`CopyTool.java:64,513-548`). */
  val VersionPattern = "[0-9]{4}(_[0-9]{2}){5}".r

  /** Pure stamp in the reference's version shape — format only, no
    * issue-order guarantee (that's [[newVersion]]'s job). */
  def versionStamp(now: LocalDateTime): String = now.format(VersionFmt)

  /** Strictly-increasing version issue. The second-granular stamp means
    * two runs inside one wall-clock second would mint the SAME version
    * (the reference has the identical gap, `CopyTool.java:216-224`) —
    * the second run would then overwrite the first's "immutable"
    * snapshot dir in place while readers may hold the pointer to it.
    * On collision the version bumps one second past the last issued
    * (lexicographic order == time order for this format, so
    * monotonicity is preserved); JVM-global, since the fleet runner
    * drives every config through one driver process. */
  private var lastIssued = ""
  def newVersion(now: LocalDateTime = LocalDateTime.now()): String = synchronized {
    val stamped = versionStamp(now)
    val v =
      if (stamped > lastIssued) stamped
      else LocalDateTime.parse(lastIssued, VersionFmt).plusSeconds(1).format(VersionFmt)
    lastIssued = v
    v
  }

  private def tableDir(root: String, table: String): Path = Paths.get(root, table)
  def snapshotDir(root: String, table: String, version: String): String =
    tableDir(root, table).resolve(s"v=$version").toString
  private def currentPtr(root: String, table: String): Path =
    tableDir(root, table).resolve("CURRENT")

  /** Load a snapshot version (phase 2). Immutable once written. */
  def writeSnapshot(df: DataFrame, root: String, table: String, version: String): Unit =
    df.write.mode("overwrite").parquet(snapshotDir(root, table, version))

  /** E4 newest-version discovery: list + lexicographic max (version string
    * ordering == timestamp ordering for this format). Lazy listing — only
    * directory names, never file contents. */
  def findNewestVersion(root: String, table: String): Option[String] =
    listVersions(root, table).sorted(Ordering[String].reverse).headOption

  def listVersions(root: String, table: String): Seq[String] = {
    val dir = tableDir(root, table)
    if (!Files.isDirectory(dir)) Seq.empty
    else Files.list(dir).iterator.asScala
      .map(_.getFileName.toString)
      .filter(_.startsWith("v="))
      .map(_.stripPrefix("v="))
      .filter(v => VersionPattern.pattern.matcher(v).matches)
      .toSeq
  }

  /** E3/D11 view switch: atomically repoint CURRENT (write-temp + ATOMIC_MOVE
    * — the analogue of the reference's single-transaction view swap). */
  def publishVersion(root: String, table: String, version: String): Unit = {
    val dir = tableDir(root, table)
    Files.createDirectories(dir)
    val tmp = dir.resolve(s".CURRENT.tmp")
    Files.writeString(tmp, version)
    Files.move(tmp, currentPtr(root, table), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** `--switch-only` (E6): discover newest loaded version and publish it
    * without touching data. */
  def publishNewest(root: String, table: String): Option[String] = {
    val newest = findNewestVersion(root, table)
    newest.foreach(publishVersion(root, table, _))
    newest
  }

  def currentVersion(root: String, table: String): Option[String] = {
    val p = currentPtr(root, table)
    if (Files.exists(p)) Some(Files.readString(p).trim) else None
  }

  /** Read the published snapshot (what a view resolves to). */
  def readCurrent(spark: SparkSession, root: String, table: String): DataFrame = {
    val v = currentVersion(root, table).getOrElse(
      throw new IllegalStateException(s"table '$table' has no published version"))
    spark.read.parquet(snapshotDir(root, table, v))
  }

  /** Register the published snapshot as a stable-name temp view (the
    * catalog face of E3). */
  def registerView(spark: SparkSession, root: String, table: String): Unit =
    readCurrent(spark, root, table).createOrReplaceTempView(table)

  /** E5 retention GC: keep the newest `keep` versions (reference default:
    * current + 1 backup, `CopyTool.java:578-580`), never delete the
    * published one. Returns dropped versions. */
  def gcOldVersions(root: String, table: String, keep: Int = 2): Seq[String] = {
    val keepSet = listVersions(root, table).sorted(Ordering[String].reverse)
      .take(keep).toSet ++ currentVersion(root, table).toSet
    val drop = listVersions(root, table).filterNot(keepSet.contains)
    drop.foreach { v =>
      def rm(p: Path): Unit = {
        if (Files.isDirectory(p)) Files.list(p).iterator.asScala.toSeq.foreach(rm)
        Files.deleteIfExists(p)
      }
      rm(Paths.get(snapshotDir(root, table, v)))
    }
    drop.sorted
  }

  /** E2 temp-swap publish (the non-versioned mode): stage under a `tmp_`
    * dir, then swap into the stable data dir. Same drop-then-swap window
    * as the reference (`CopyTool.java:1107-1124`) — documented, and the
    * versioned+pointer mode above is the preferred atomic path. */
  def tempSwapPublish(df: DataFrame, root: String, table: String): Unit = {
    val dir = tableDir(root, table)
    Files.createDirectories(dir)
    val tmp = dir.resolve("tmp_data")
    val fin = dir.resolve("data")
    df.write.mode("overwrite").parquet(tmp.toString)
    def rm(p: Path): Unit = {
      if (Files.isDirectory(p)) Files.list(p).iterator.asScala.toSeq.foreach(rm)
      Files.deleteIfExists(p)
    }
    rm(fin)
    Files.move(tmp, fin, StandardCopyOption.ATOMIC_MOVE)
  }
}
