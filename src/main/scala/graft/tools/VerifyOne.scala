package graft.tools

import org.apache.spark.sql.SparkSession

/** Selective correctness dump: like [[graft.Verify]] but only for the
  * named queries — the fast inner loop when adding one operator
  * (`runMain graft.tools.VerifyOne <sfDir> <outDir> q113,q114`).
  * Matches on name prefix so `q113` finds `q113_interval_bin_join`. */
object VerifyOne {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, names) = args
    val wanted = names.split(",").toSeq
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    val qs = graft.SparkEntry.queries.filter { case (n, _) =>
      wanted.exists(n.startsWith)
    }
    qs.foreach { case (name, fn) =>
      fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      println(s"[verify-one] dumped $name")
    }
    val oracle = graft.SparkEntry.oracleSql.filter { case (n, _) =>
      wanted.exists(n.startsWith)
    }
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$outDir/oracle_sql.json"),
      oracle.map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}"))
    spark.stop()
  }
}
