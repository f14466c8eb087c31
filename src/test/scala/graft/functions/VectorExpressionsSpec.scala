package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.sources.Tables
import VectorFunctions._

class VectorExpressionsSpec extends SparkSpec {
  import spark.implicits._

  test("vec_dot matches the interpreted zip_with+aggregate fold bit-for-bit") {
    val emb = Tables(spark, sf(), "embeddings").limit(50)
    val pairs = emb.select(col("vec_id").as("a_id"), col("embedding").as("a"))
      .crossJoin(emb.select(col("vec_id").as("b_id"), col("embedding").as("b")))
      .limit(500)
    val diff = pairs.select(
      vec_dot(col("a"), col("b")).as("native"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, v) => acc + v).as("folded"))
      .filter(col("native") =!= col("folded"))
    assert(diff.isEmpty)
  }

  test("null inputs give null, not a crash") {
    val df = Seq((Some(Seq(1.0f, 2.0f)), None: Option[Seq[Float]]))
      .toDF("a", "b")
    val r = df.select(vec_dot(col("a"), col("b"))).head()
    assert(r.isNullAt(0))
  }

  test("mismatched lengths use the shorter vector (defensive)") {
    val df = Seq((Seq(1.0f, 2.0f, 3.0f), Seq(10.0f, 10.0f))).toDF("a", "b")
    assert(df.select(vec_dot(col("a"), col("b"))).head().getDouble(0) == 30.0)
  }

  test("wrong input type fails analysis with a clear message") {
    val df = Seq((Seq(1, 2), Seq(1, 2))).toDF("a", "b")
    val e = intercept[Exception] {
      df.select(vec_dot(col("a"), col("b"))).head()
    }
    assert(e.getMessage.contains("array<float>"))
  }

  test("vec_cosine self-similarity is 1") {
    val r = Tables(spark, sf(), "embeddings").limit(3)
      .select(vec_cosine(col("embedding"), col("embedding")).as("c"))
      .collect().map(_.getDouble(0))
    r.foreach(c => assert(math.abs(c - 1.0) < 1e-12))
  }

  test("vec_dot is callable from SQL after extension registration") {
    GraftExtensions.register(spark)
    Tables(spark, sf(), "embeddings").createOrReplaceTempView("emb_sql")
    val r = spark.sql(
      "SELECT vec_id, vec_dot(embedding, embedding) AS d FROM emb_sql ORDER BY vec_id LIMIT 3")
      .collect()
    assert(r.length == 3 && r.forall(_.getDouble(1) > 0))
  }

  test("expression participates in whole-stage codegen") {
    val emb = Tables(spark, sf(), "embeddings").limit(5)
    val plan = emb.select(vec_dot(col("embedding"), col("embedding")))
      .queryExecution.executedPlan.toString
    // '*(n)' marks operators inside a WholeStageCodegen stage
    assert(plan.contains("*(1) Project [vec_dot"), plan)
  }
}
