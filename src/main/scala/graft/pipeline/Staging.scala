package graft.pipeline

import java.nio.file.{Files, Path, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, trim}
import org.apache.spark.sql.types.{DataType, StringType, StructType}

/** Durable staging between extract and load (SURVEY.md §2.B, §2.F3).
  *
  * The reference stages CSV + serialized schema + count file
  * (`CopyTool.java:659-747`); here the staged dataset is partitioned
  * parquet (schema travels in the footer) plus a tiny JSON manifest with
  * the row count and schema snapshot — the durable phase-1→phase-2
  * hand-off survives a crash between phases (§3.1).
  */
object Staging {

  final case class Manifest(count: Long, schemaJson: String) {
    def schema: StructType = DataType.fromJson(schemaJson).asInstanceOf[StructType]
  }

  /** autoTrim (§1.3, default ON in the reference `CopyTable.java:72`):
    * trim string-typed columns. The reference trims *all* types after
    * stringification; with typed columns only strings can carry padding,
    * so this is semantics-preserving. */
  def applyAutoTrim(df: DataFrame): DataFrame =
    df.schema.fields.foldLeft(df) { (d, f) =>
      if (f.dataType == StringType) d.withColumn(f.name, trim(col(f.name))) else d
    }

  private def manifestPath(dir: String): Path = Paths.get(dir, "_manifest.json")
  private def dataPath(dir: String): String = s"$dir/data"

  /** Stage an extract. Writes parquet (schema even for 0 rows — the B4
    * zero-row short-circuit is the loader skipping, not schema loss) and
    * the manifest. Returns the staged row count. */
  def stage(df: DataFrame, dir: String, autoTrim: Boolean = true): Long = {
    val out = if (autoTrim) applyAutoTrim(df) else df
    out.write.mode("overwrite").parquet(dataPath(dir))
    // parquet-footer count: metadata-only scan, no data read
    val count = out.sparkSession.read.parquet(dataPath(dir)).count()
    val json = s"""{"count":$count,"schema":${out.schema.json}}"""
    Files.createDirectories(Paths.get(dir))
    Files.writeString(manifestPath(dir), json)
    count
  }

  def readManifest(dir: String): Option[Manifest] = {
    val p = manifestPath(dir)
    if (!Files.exists(p)) None
    else {
      val s = Files.readString(p)
      // minimal parse: {"count":N,"schema":{...}}
      val countR = """\{"count":(\d+),"schema":""".r
      countR.findPrefixMatchOf(s).map { m =>
        Manifest(m.group(1).toLong, s.substring(m.end, s.length - 1))
      }
    }
  }

  /** F3 staged-files validation: manifest present, data readable, schema
    * matches the snapshot. Throws with a precise reason on failure. */
  def validate(spark: SparkSession, dir: String): Manifest = {
    val m = readManifest(dir).getOrElse(
      throw new IllegalStateException(s"staging dir '$dir' has no manifest"))
    if (m.count > 0) {
      val actual = spark.read.parquet(dataPath(dir))
      // compare name+type only: parquet read-back is always nullable, so
      // nullability is not schema drift
      def shape(s: StructType) = s.fields.map(f => (f.name, f.dataType)).toSeq
      require(shape(actual.schema) == shape(m.schema),
        s"staged schema drift in '$dir': ${actual.schema.simpleString} vs manifest ${m.schema.simpleString}")
    }
    m
  }

  /** Read the staged dataset back (load-phase input). */
  def read(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dataPath(dir))

  /** E7 staging cleanup. */
  def cleanup(dir: String): Unit = {
    def rm(p: Path): Unit = {
      if (Files.isDirectory(p))
        Files.list(p).forEach(rm)
      Files.deleteIfExists(p)
    }
    val p = Paths.get(dir)
    if (Files.exists(p)) rm(p)
  }
}
