package graft.sinks

import java.sql.DriverManager

import org.apache.spark.sql.{Row, SaveMode}
import org.apache.spark.sql.types._
import graft.SparkSpec

/** Live JDBC round-trip for the DataSource V2 batched-INSERT writer,
  * against embedded Derby (ships with the Spark distribution) — the
  * closest in-container stand-in for the MonetDB target. */
class JdbcV2WriterSpec extends SparkSpec {
  import spark.implicits._

  private val url = "jdbc:derby:memory:graftdb;create=true"

  private def exec(sql: String): Unit = {
    val c = DriverManager.getConnection(url)
    try { val st = c.createStatement(); try st.executeUpdate(sql) finally st.close() }
    finally c.close()
  }

  test("append writes arrive and read back identically") {
    exec("CREATE TABLE t_rt (id BIGINT, name VARCHAR(64), score DOUBLE)")
    val df = Seq((1L, "a", 1.5), (2L, "b", 2.5), (3L, "c", null.asInstanceOf[Double]))
      .toDF("id", "name", "score")
    df.write.format("graft-jdbc")
      .option("url", url).option("dbtable", "t_rt")
      .mode(SaveMode.Append).save()
    val back = spark.read.jdbc(url, "t_rt", new java.util.Properties())
      .orderBy("id").collect()
    assert(back.map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "a"), (2L, "b"), (3L, "c")))
    assert(back(0).getDouble(2) == 1.5)
  }

  test("overwrite truncates before load (DELETE FROM semantics)") {
    exec("CREATE TABLE t_ow (id INT)")
    def write(ids: Seq[Int], mode: SaveMode): Unit =
      ids.toDF("id").write.format("graft-jdbc")
        .option("url", url).option("dbtable", "t_ow").mode(mode).save()
    write(Seq(1, 2, 3), SaveMode.Append)
    write(Seq(7, 8), SaveMode.Overwrite)
    val back = spark.read.jdbc(url, "t_ow", new java.util.Properties())
      .as[Int].collect().sorted
    assert(back.toSeq == Seq(7, 8))
  }

  test("batched inserts cross the batch boundary correctly") {
    exec("CREATE TABLE t_batch (id INT)")
    (1 to 2500).toDF("id").coalesce(2).write.format("graft-jdbc")
      .option("url", url).option("dbtable", "t_batch")
      .option("batchsize", "1000")   // forces executeBatch mid-stream
      .mode(SaveMode.Append).save()
    val n = spark.read.jdbc(url, "t_batch", new java.util.Properties()).count()
    assert(n == 2500)
  }

  test("type zoo round-trips: date, timestamp, decimal, boolean, null") {
    exec("""CREATE TABLE t_types (i INT, l BIGINT, d DOUBLE, s VARCHAR(32),
            dt DATE, ts TIMESTAMP, dcm DECIMAL(10,2), b BOOLEAN)""")
    val schema = StructType(Seq(
      StructField("i", IntegerType), StructField("l", LongType),
      StructField("d", DoubleType), StructField("s", StringType),
      StructField("dt", DateType), StructField("ts", TimestampType),
      StructField("dcm", DecimalType(10, 2)), StructField("b", BooleanType)))
    val rows = Seq(
      Row(1, 10L, 1.25, "x", java.sql.Date.valueOf("2024-06-15"),
        java.sql.Timestamp.valueOf("2024-06-15 12:34:56.789"),
        new java.math.BigDecimal("1234.56"), true),
      Row(2, null, null, null, null, null, null, null))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
      .write.format("graft-jdbc")
      .option("url", url).option("dbtable", "t_types")
      .mode(SaveMode.Append).save()
    val back = spark.read.jdbc(url, "t_types", new java.util.Properties())
      .orderBy("i").collect()
    assert(back.length == 2)
    // positional getters: Derby folds unquoted identifiers to uppercase
    assert(back(0).getAs[java.sql.Date](4).toString == "2024-06-15")
    assert(back(0).getAs[java.sql.Timestamp](5).toString == "2024-06-15 12:34:56.789")
    assert(back(0).getAs[java.math.BigDecimal](6).doubleValue() == 1234.56)
    assert(back(0).getAs[Boolean](7))
    assert((1 to 7).forall(back(1).isNullAt))
  }

  test("schema probe (inferSchema) reflects the live table") {
    exec("CREATE TABLE t_probe (id BIGINT NOT NULL, label VARCHAR(16))")
    val ds = new JdbcBatchDataSource()
    val schema = ds.inferSchema(new org.apache.spark.sql.util.CaseInsensitiveStringMap(
      java.util.Map.of("url", url, "dbtable", "t_probe")))
    assert(schema.fieldNames.map(_.toLowerCase).toSeq == Seq("id", "label"))
    assert(schema.fields(0).dataType == LongType)
    assert(!schema.fields(0).nullable && schema.fields(1).nullable)
  }

  test("failed task rolls back its transaction - no partial rows visible") {
    exec("CREATE TABLE t_abort (id INT)")
    val boom = org.apache.spark.sql.functions.udf((i: Int) =>
      if (i == 150) throw new RuntimeException("boom") else i)
    intercept[Exception] {
      (1 to 200).toDF("id")
        .coalesce(1)
        .select(boom(org.apache.spark.sql.functions.col("id")).as("id"))
        .write.format("graft-jdbc")
        .option("url", url).option("dbtable", "t_abort")
        .option("batchsize", "50")   // several batches execute before the failure
        .mode(SaveMode.Append).save()
    }
    // rows 1-149 were executeBatch'd but never committed - rollback must
    // leave the table empty (per-task transaction semantics)
    val n = spark.read.jdbc(url, "t_abort", new java.util.Properties()).count()
    assert(n == 0, s"expected rollback to leave 0 rows, found $n")
  }

  test("missing required option fails with a clear message") {
    val e = intercept[Exception] {
      Seq(1).toDF("id").write.format("graft-jdbc")
        .option("url", url).mode(SaveMode.Append).save()
    }
    assert(e.getMessage.contains("dbtable") || e.getCause.getMessage.contains("dbtable"))
  }
}
