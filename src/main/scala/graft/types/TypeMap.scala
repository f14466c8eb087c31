package graft.types

import java.sql.Types
import org.apache.spark.sql.types._

/** JDBC ↔ Spark ↔ MonetDB-DDL type mapping (SURVEY.md §1.3, §2.D).
  *
  * Reproduces the reference's complete type map
  * (`MonetDBUtil.java:205-226`) including the decimal scale-0 integer
  * downcast (`:244-263`), the precision-18 cap (`:275-277`), char/varchar
  * display-size carry (`:268-272`), `auto_increment` (`:284-287`) and
  * `NOT NULL` (`:289-292`) modifiers. The downcast/cap live ONLY in the
  * DDL layer — Spark-side data keeps full precision so aggregates don't
  * drift (SURVEY.md §7.5).
  */
object TypeMap {

  /** Column metadata as the reference snapshots it per extract
    * (`SerializableColumnMetaData.java:9-47`). */
  final case class ColumnMeta(
      name: String,
      jdbcType: Int,
      precision: Int = 0,
      scale: Int = 0,
      displaySize: Int = 0,
      nullable: Boolean = true,
      autoIncrement: Boolean = false)

  /** JDBC → Spark type (extract-side schema inference). TIME has no Spark
    * equivalent → StringType "HH:mm:ss" (matches the reference's
    * `value.toString()` CSV rendering, `CopyTool.java:710`). */
  def jdbcToSpark(c: ColumnMeta): DataType = c.jdbcType match {
    case Types.BIGINT                   => LongType
    case Types.BLOB | Types.VARBINARY | Types.LONGVARBINARY => BinaryType
    case Types.BOOLEAN | Types.BIT      => BooleanType
    case Types.CHAR | Types.NCHAR       => StringType
    case Types.CLOB | Types.NCLOB       => StringType
    case Types.DATE                     => DateType
    case Types.DECIMAL | Types.NUMERIC  => DecimalType(math.min(c.precision, 38), c.scale)
    case Types.DOUBLE | Types.FLOAT     => DoubleType // JDBC FLOAT is double-precision
    case Types.INTEGER                  => IntegerType
    case Types.NVARCHAR | Types.VARCHAR | Types.LONGVARCHAR | Types.LONGNVARCHAR => StringType
    case Types.REAL                     => FloatType
    case Types.SMALLINT                 => ShortType
    case Types.TIME                     => StringType // no Spark TIME type
    case Types.TIMESTAMP                => TimestampType
    case Types.TINYINT                  => ByteType
    case other =>
      // hard error, same semantics as the reference (`MonetDBUtil.java:235-239`)
      throw new IllegalArgumentException(s"Unknown SQL type $other for column '${c.name}'")
  }

  /** Decimal(p, 0) integer downcast by precision (`MonetDBUtil.java:244-263`). */
  private def decimalDdl(precision: Int, scale: Int): String =
    if (scale == 0) {
      if (precision <= 2) "tinyint"
      else if (precision <= 4) "smallint"
      else if (precision <= 9) "int"
      else "bigint"
    } else {
      // precision capped at 18 — MonetDB limit (`MonetDBUtil.java:275-277`)
      s"decimal(${math.min(precision, 18)},$scale)"
    }

  /** JDBC column → MonetDB column DDL type (`MonetDBUtil.java:196-295`). */
  def monetDdlType(c: ColumnMeta): String = c.jdbcType match {
    case Types.BIGINT                  => "bigint"
    case Types.BLOB                    => "blob"
    case Types.BOOLEAN | Types.BIT     => "boolean"
    case Types.CHAR | Types.NCHAR      => s"char(${c.displaySize})"
    case Types.CLOB | Types.NCLOB      => "clob"
    case Types.DATE                    => "date"
    case Types.DECIMAL                 => decimalDdl(c.precision, c.scale)
    case Types.NUMERIC                 => decimalDdl(c.precision, c.scale)
    case Types.DOUBLE                  => "double"
    case Types.FLOAT                   => "float"
    case Types.INTEGER                 => "int"
    case Types.NVARCHAR | Types.VARCHAR => s"varchar(${c.displaySize})"
    case Types.REAL                    => "real"
    case Types.SMALLINT                => "smallint"
    case Types.TIME                    => "time"
    case Types.TIMESTAMP               => "timestamp"
    case Types.TINYINT                 => "tinyint"
    case other =>
      throw new IllegalArgumentException(s"Unknown SQL type $other for column '${c.name}'")
  }

  /** Full column DDL incl. modifiers (`MonetDBUtil.java:284-292`). */
  def columnDdl(c: ColumnMeta): String = {
    val sb = new StringBuilder(Identifiers.quote(c.name)).append(' ').append(monetDdlType(c))
    if (c.autoIncrement) sb.append(" auto_increment")
    if (!c.nullable) sb.append(" NOT NULL")
    sb.toString
  }

  /** CREATE TABLE DDL from a column list (`MonetDBUtil.java:162-190`). */
  def createTableDdl(schema: String, table: String, cols: Seq[ColumnMeta]): String =
    s"CREATE TABLE ${Identifiers.quote(schema)}.${Identifiers.quote(table)} " +
      cols.map(columnDdl).mkString("(", ", ", ")")

  /** Spark → MonetDB DDL for the parquet-native path (when the source
    * schema is a Spark StructType, not JDBC metadata). */
  def sparkToMonetDdlType(dt: DataType): String = dt match {
    case LongType          => "bigint"
    case BinaryType        => "blob"
    case BooleanType       => "boolean"
    case StringType        => "clob"
    case DateType          => "date"
    case d: DecimalType    => decimalDdl(d.precision, d.scale)
    case DoubleType        => "double"
    case IntegerType       => "int"
    case FloatType         => "real"
    case ShortType         => "smallint"
    case TimestampType     => "timestamp"
    case TimestampNTZType  => "timestamp"
    case ByteType          => "tinyint"
    case other =>
      throw new IllegalArgumentException(s"No MonetDB DDL mapping for Spark type $other")
  }

  /** Schema diff for evolve (D7): columns present in `source` but missing
    * from `target` → ALTER TABLE ADD COLUMN statements. Type changes are
    * detected and reported (the reference leaves them a TODO,
    * `MonetDBUtil.java:366-369` — we surface them instead of ignoring). */
  def evolveDdl(schema: String, table: String,
      source: StructType, target: StructType): (Seq[String], Seq[String]) = {
    val targetNames = target.fieldNames.map(Identifiers.normalize).toSet
    val adds = source.fields.toSeq
      .filterNot(f => targetNames.contains(Identifiers.normalize(f.name)))
      .map(f => s"ALTER TABLE ${Identifiers.quote(schema)}.${Identifiers.quote(table)} " +
        s"ADD COLUMN ${Identifiers.quote(f.name)} ${sparkToMonetDdlType(f.dataType)}")
    val typeChanges = source.fields.toSeq.flatMap { f =>
      target.fields.find(t => Identifiers.normalize(t.name) == Identifiers.normalize(f.name))
        .filter(_.dataType != f.dataType)
        .map(t => s"${f.name}: ${t.dataType.simpleString} -> ${f.dataType.simpleString}")
    }
    (adds, typeChanges)
  }
}

/** Identifier/value quoting (SURVEY.md §1.3, D12/D13). */
object Identifiers {

  /** Lower-case + collapse every non-alphanumeric run to `_`
    * (`MonetDBUtil.java:301-333`). Note the reference's collision
    * (`a-b` and `a_b` both → `a_b`) is reproduced faithfully; callers
    * can detect via [[collisions]]. */
  def normalize(name: String): String =
    name.toLowerCase.replaceAll("[^a-z0-9]+", "_")

  /** Normalized + double-quoted, for DDL. */
  def quote(name: String): String = "\"" + normalize(name) + "\""

  /** SQL string literal with backslash/quote escaping
    * (`MonetDBUtil.java:315-318`). Prefer PreparedStatement params for
    * data paths; this exists for DDL strings only. */
  def quoteValue(v: String): String =
    "'" + v.replace("\\", "\\\\").replace("'", "\\'") + "'"

  /** Identifier-collision report for a column list. */
  def collisions(names: Seq[String]): Map[String, Seq[String]] =
    names.groupBy(normalize).filter(_._2.distinct.size > 1)
}
