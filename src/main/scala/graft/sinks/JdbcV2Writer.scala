package graft.sinks

import java.sql.{Connection, DriverManager, PreparedStatement, Timestamp, Types => SqlTypes}
import java.time.{Instant, LocalDate, LocalDateTime, ZoneOffset}
import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 batched-INSERT JDBC writer — the distributed version of
  * the reference's batched-INSERT load path (C3: `CopyTool.java:829-866`,
  * `batch.size` default 10000 at `CopyToolConfig.java:44`).
  *
  * The reference streams one INSERT batch from a single thread; here each
  * Spark partition opens its own connection and streams its own batches,
  * so load parallelism scales with the writing stage (1000 executors →
  * 1000 concurrent batch streams; cap with `df.coalesce(n)` to respect
  * the target's connection budget). Each task commits its own
  * transaction; the CopyJob publish phase (temp-table swap / view
  * repoint, E2/E3) provides table-level atomicity on top, exactly as the
  * reference's staging→publish split does.
  *
  * Usage:
  * {{{
  * df.write.format("graft-jdbc")
  *   .option("url", "jdbc:monetdb://host/db").option("dbtable", "t")
  *   .option("batchsize", "10000")
  *   .mode(SaveMode.Append)        // or Overwrite → truncate + append
  *   .save()
  * }}}
  */
class JdbcBatchDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-jdbc"

  // the writer takes the incoming DataFrame's schema as-is
  override def supportsExternalMetadata(): Boolean = true

  /** Schema of the existing target table (zero-row probe), so the source
    * also works as `spark.read.format("graft-jdbc")` metadata probe and
    * lets writes validate against the live table. */
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val opts = JdbcWriteOptions(options.asCaseSensitiveMap().asScala.toMap)
    JdbcV2Util.withConnection(opts) { conn =>
      val st = conn.prepareStatement(
        s"SELECT * FROM ${opts.table} WHERE 1=0")
      try {
        val md = st.executeQuery().getMetaData
        StructType((1 to md.getColumnCount).map { i =>
          StructField(md.getColumnName(i),
            JdbcV2Util.sqlTypeToSpark(md.getColumnType(i), md.getPrecision(i),
              md.getScale(i)),
            md.isNullable(i) != java.sql.ResultSetMetaData.columnNoNulls)
        })
      } finally st.close()
    }
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    JdbcBatchTable(schema, JdbcWriteOptions(properties.asScala.toMap))
}

final case class JdbcWriteOptions(raw: Map[String, String]) {
  private def req(k: String): String = raw.getOrElse(k,
    throw new IllegalArgumentException(s"graft-jdbc: missing required option '$k'"))
  def url: String = req("url")
  def table: String = req("dbtable")
  def batchSize: Int = raw.getOrElse("batchsize", "10000").toInt
  def isolationProps: java.util.Properties = {
    val p = new java.util.Properties()
    raw.filterNot { case (k, _) => Set("url", "dbtable", "batchsize").contains(k) }
      .foreach { case (k, v) => p.setProperty(k, v) }
    p
  }
}

case class JdbcBatchTable(tableSchema: StructType, opts: JdbcWriteOptions)
    extends Table with SupportsWrite {
  override def schema(): StructType = tableSchema
  override def name(): String = opts.table
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate {
      private var truncateFirst = false
      override def truncate(): WriteBuilder = { truncateFirst = true; this }
      override def build(): Write = new Write {
        override def toBatch: BatchWrite =
          JdbcBatchWrite(info.schema(), opts, truncateFirst)
      }
    }
}

case class JdbcBatchWrite(schema: StructType, opts: JdbcWriteOptions,
    truncateFirst: Boolean) extends BatchWrite {

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    // driver-side, once, before any task writes — the overwrite semantics
    // of the reference's truncate-before-load (C7: DELETE FROM, which
    // MonetDB prefers over TRUNCATE for WAL reasons)
    if (truncateFirst) JdbcV2Util.withConnection(opts) { conn =>
      val st = conn.createStatement()
      try st.executeUpdate(s"DELETE FROM ${opts.table}") finally st.close()
    }
    JdbcBatchWriterFactory(schema, opts)
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = ()
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

case class JdbcBatchWriterFactory(schema: StructType, opts: JdbcWriteOptions)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new JdbcBatchDataWriter(schema, opts)
}

final case class JdbcTaskCommit(rows: Long) extends WriterCommitMessage

/** Per-task writer: one connection, one transaction, `batchsize`-row
  * INSERT batches (the reference's extract loop flushes identically at
  * `CopyTool.java:737-741`). */
class JdbcBatchDataWriter(schema: StructType, opts: JdbcWriteOptions)
    extends DataWriter[InternalRow] {

  private val conn: Connection = JdbcV2Util.connect(opts)
  conn.setAutoCommit(false)
  private val stmt: PreparedStatement = {
    val cols = schema.fieldNames.mkString(", ")
    val qs = schema.fields.map(_ => "?").mkString(", ")
    conn.prepareStatement(s"INSERT INTO ${opts.table} ($cols) VALUES ($qs)")
  }
  private var pending = 0
  private var total = 0L

  override def write(row: InternalRow): Unit = {
    var i = 0
    while (i < schema.length) {
      JdbcV2Util.setParam(stmt, i + 1, row, i, schema(i).dataType)
      i += 1
    }
    stmt.addBatch()
    pending += 1
    total += 1
    if (pending >= opts.batchSize) { stmt.executeBatch(); pending = 0 }
  }

  override def commit(): WriterCommitMessage = {
    if (pending > 0) { stmt.executeBatch(); pending = 0 }
    conn.commit()
    JdbcTaskCommit(total)
  }

  override def abort(): Unit = try conn.rollback() finally close()

  override def close(): Unit = {
    try stmt.close() finally conn.close()
  }
}

object JdbcV2Util {
  def connect(opts: JdbcWriteOptions): Connection =
    DriverManager.getConnection(opts.url, opts.isolationProps)

  def withConnection[A](opts: JdbcWriteOptions)(f: Connection => A): A = {
    val c = connect(opts)
    try f(c) finally c.close()
  }

  /** Narrow JDBC→Spark mapping for the schema probe (mirror of
    * `TypeMap.jdbcToSpark`, minus the MonetDB-specific corners). */
  def sqlTypeToSpark(t: Int, precision: Int, scale: Int): DataType = t match {
    case SqlTypes.BIT | SqlTypes.BOOLEAN => BooleanType
    case SqlTypes.TINYINT => ByteType
    case SqlTypes.SMALLINT => ShortType
    case SqlTypes.INTEGER => IntegerType
    case SqlTypes.BIGINT => LongType
    case SqlTypes.REAL => FloatType
    case SqlTypes.FLOAT | SqlTypes.DOUBLE => DoubleType
    case SqlTypes.NUMERIC | SqlTypes.DECIMAL =>
      DecimalType(math.min(precision, 38), math.min(scale, 38))
    case SqlTypes.DATE => DateType
    case SqlTypes.TIMESTAMP => TimestampType
    case SqlTypes.BINARY | SqlTypes.VARBINARY | SqlTypes.LONGVARBINARY |
         SqlTypes.BLOB => BinaryType
    case _ => StringType
  }

  /** Bind one InternalRow field to a PreparedStatement parameter.
    * Timestamps are written as UTC instants (session timezone is pinned
    * UTC across the engine); TimestampNTZ as wall-clock datetimes. */
  def setParam(stmt: PreparedStatement, pos: Int, row: InternalRow,
      ordinal: Int, dt: DataType): Unit = {
    if (row.isNullAt(ordinal)) {
      stmt.setNull(pos, sparkToSqlType(dt))
      return
    }
    dt match {
      case BooleanType => stmt.setBoolean(pos, row.getBoolean(ordinal))
      case ByteType => stmt.setByte(pos, row.getByte(ordinal))
      case ShortType => stmt.setShort(pos, row.getShort(ordinal))
      case IntegerType => stmt.setInt(pos, row.getInt(ordinal))
      case LongType => stmt.setLong(pos, row.getLong(ordinal))
      case FloatType => stmt.setFloat(pos, row.getFloat(ordinal))
      case DoubleType => stmt.setDouble(pos, row.getDouble(ordinal))
      case d: DecimalType =>
        stmt.setBigDecimal(pos, row.getDecimal(ordinal, d.precision, d.scale).toJavaBigDecimal)
      case StringType => stmt.setString(pos, row.getUTF8String(ordinal).toString)
      case BinaryType => stmt.setBytes(pos, row.getBinary(ordinal))
      case DateType =>
        stmt.setDate(pos, java.sql.Date.valueOf(LocalDate.ofEpochDay(row.getInt(ordinal).toLong)))
      case TimestampType =>
        val micros = row.getLong(ordinal)
        stmt.setTimestamp(pos, Timestamp.from(Instant.EPOCH.plusNanos(micros * 1000L)))
      case TimestampNTZType =>
        val micros = row.getLong(ordinal)
        val ldt = LocalDateTime.ofEpochSecond(
          Math.floorDiv(micros, 1000000L),
          (Math.floorMod(micros, 1000000L) * 1000L).toInt, ZoneOffset.UTC)
        stmt.setTimestamp(pos, Timestamp.valueOf(ldt))
      case other =>
        throw new UnsupportedOperationException(
          s"graft-jdbc writer: unsupported column type ${other.simpleString}")
    }
  }

  def sparkToSqlType(dt: DataType): Int = dt match {
    case BooleanType => SqlTypes.BOOLEAN
    case ByteType => SqlTypes.TINYINT
    case ShortType => SqlTypes.SMALLINT
    case IntegerType => SqlTypes.INTEGER
    case LongType => SqlTypes.BIGINT
    case FloatType => SqlTypes.REAL
    case DoubleType => SqlTypes.DOUBLE
    case _: DecimalType => SqlTypes.DECIMAL
    case StringType => SqlTypes.VARCHAR
    case BinaryType => SqlTypes.BINARY
    case DateType => SqlTypes.DATE
    case TimestampType | TimestampNTZType => SqlTypes.TIMESTAMP
    case _ => SqlTypes.OTHER
  }
}
