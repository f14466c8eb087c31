package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** JDBC source configuration (SURVEY.md §2.A7-A9).
  *
  * The reference opens one forward-only cursor per table on a single
  * thread (`CopyTool.java:640-654`); the Spark equivalent is the JDBC
  * data source with **partitioned reads** — `partitionColumn/lowerBound/
  * upperBound/numPartitions` turn one table scan into N parallel range
  * scans, which is the difference between a single-socket extract and a
  * cluster-wide one at 100 TB (SURVEY.md §4).
  *
  * No live DBMS exists in the test container, so `load()` is exercised in
  * integration environments; the option-map construction (what Spark
  * actually consumes) is pure and unit-tested.
  */
object JdbcSource {

  final case class Partitioning(column: String, lowerBound: Long,
      upperBound: Long, numPartitions: Int)

  final case class JdbcSourceConfig(
      dialect: SqlGen.Dialect,
      server: String,
      database: String,
      user: String,
      password: String,
      port: Option[Int] = None,
      /** MS SQL named instance (A7) — reaches the URL as
        * `;instanceName=…`; see [[SqlGen.MsSql.url]]. */
      instance: Option[String] = None,
      /** A1-A3: named table (+ optional projection) or arbitrary query. */
      fromName: String = "",
      fromColumns: Option[String] = None,
      fromQuery: Option[String] = None,
      partitioning: Option[Partitioning] = None,
      /** streaming-cursor equivalent of the reference's row-at-a-time
        * extract: bounded per-fetch memory. */
      fetchSize: Int = 10000)

  /** The option map handed to `spark.read.format("jdbc")`. */
  def options(cfg: JdbcSourceConfig): Map[String, String] = {
    val base = Map(
      "url" -> cfg.dialect.url(cfg.server, cfg.port, cfg.database, cfg.instance),
      "user" -> cfg.user,
      "password" -> cfg.password,
      "fetchsize" -> cfg.fetchSize.toString)
    // query text wins over dbtable (A3 > A1/A2), mirroring SqlGen.selectSql
    val source = (cfg.fromQuery, cfg.fromColumns) match {
      case (Some(q), _) => Map("query" -> q)
      case (None, Some(cols)) =>
        Map("query" -> SqlGen.selectSql(cfg.fromName, fromColumns = Some(cols)))
      case _ => Map("dbtable" -> cfg.fromName)
    }
    val parts = cfg.partitioning.map { p =>
      Map(
        "partitionColumn" -> p.column,
        "lowerBound" -> p.lowerBound.toString,
        "upperBound" -> p.upperBound.toString,
        "numPartitions" -> p.numPartitions.toString)
    }.getOrElse(Map.empty)
    base ++ source ++ parts
  }

  /** Build the partitioned distributed read. */
  def load(spark: SparkSession, cfg: JdbcSourceConfig): DataFrame =
    spark.read.format("jdbc").options(options(cfg)).load()
}
