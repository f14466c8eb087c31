package graft.sources

/** Source-side SQL generation (SURVEY.md §2.A1-A6).
  *
  * Mirrors the reference's select/count generation
  * (`CopyTable.java:300-328`) and the per-dialect top-1 watermark query
  * (`SourceDatabaseType.java:21-25,45-49`). These strings feed the JDBC
  * reader's `query` option; for parquet-harness runs the same table spec
  * resolves through [[Tables]] instead.
  */
object SqlGen {

  sealed trait Dialect {
    def name: String
    def defaultPort: Int
    def url(server: String, port: Option[Int], database: String): String
    /** max-by-1 watermark query (A6). */
    def top1(table: String, column: String): String
  }

  /** MS SQL Server (`SourceDatabaseType.java:16-30`). */
  case object MsSql extends Dialect {
    val name = "mssql"
    val defaultPort = 1433
    def url(server: String, port: Option[Int], database: String): String =
      s"jdbc:sqlserver://$server:${port.getOrElse(defaultPort)};databaseName=$database"
    def top1(table: String, column: String): String =
      s"SELECT TOP 1 [$column] FROM [$table] ORDER BY [$column] DESC"
  }

  /** PostgreSQL (`SourceDatabaseType.java:39-54`). */
  case object Postgres extends Dialect {
    val name = "postgresql"
    val defaultPort = 5432
    def url(server: String, port: Option[Int], database: String): String =
      s"jdbc:postgresql://$server:${port.getOrElse(defaultPort)}/$database"
    def top1(table: String, column: String): String =
      s"""SELECT "$column" FROM "$table" ORDER BY "$column" DESC LIMIT 1"""
  }

  /** MonetDB target URL (A10). */
  def monetDbUrl(server: String, database: String): String =
    s"jdbc:monetdb://$server/$database"

  /** SELECT generation (A1-A3, `CopyTable.java:310-328`): an explicit
    * query wins; else a projection list; else `SELECT *`. */
  def selectSql(fromName: String, fromColumns: Option[String] = None,
      fromQuery: Option[String] = None): String =
    fromQuery.getOrElse {
      val cols = fromColumns.map(_.trim).filter(_.nonEmpty).getOrElse("*")
      s"SELECT $cols FROM $fromName"
    }

  /** COUNT generation (A5, `CopyTable.java:300-308`): custom count query
    * wins; else `COUNT(*)`. A custom `fromQuery` REQUIRES a paired count
    * query (`CopyToolConfig.java:955-960`). */
  def countSql(fromName: String, fromCountQuery: Option[String] = None,
      fromQuery: Option[String] = None): String =
    fromCountQuery.getOrElse {
      require(fromQuery.isEmpty,
        "a custom from-query requires an explicit count query")
      s"SELECT COUNT(*) FROM $fromName"
    }
}
