package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every implemented operator's named query (with its DuckDB
  * oracle SQL where the semantics are ANSI-SQL-expressible).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    ops.Relational.queries("q04_agg_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ops.Relational.queries ++ ops.Extended.queries ++ text.TextAnalysis.queries ++
      dedup.Dedup.queries ++ sim.Similarity.queries ++ mm.Multimodal.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (driver records a weaker rows-only check for those). */
  def oracleSql: Map[String, String] =
    ops.Relational.oracles ++ ops.Extended.oracles ++ text.TextAnalysis.oracles ++
      dedup.Dedup.oracles ++ sim.Similarity.oracles ++ mm.Multimodal.oracles
}
