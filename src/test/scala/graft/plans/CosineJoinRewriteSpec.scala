package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.sim.Similarity
import graft.sources.Tables

/** The opt-in cosine-threshold → LSH-bucket join rewrite: plan surgery
  * asserted on the optimized plan, results compared to the hand-written
  * bucketed pipeline, and the don't-touch cases (confs off, join already
  * blocked). */
class CosineJoinRewriteSpec extends SparkSpec {

  private val Bits = 2
  private val Dim = 64

  private def withRewrite[A](f: => A): A = {
    CosineJoinRewrite.ensureRegistered(spark)
    spark.conf.set(CosineJoinRewrite.BitsConf, Bits.toString)
    spark.conf.set(CosineJoinRewrite.DimConf, Dim.toString)
    try f finally {
      spark.conf.unset(CosineJoinRewrite.BitsConf)
      spark.conf.unset(CosineJoinRewrite.DimConf)
    }
  }

  /** The naive user-written form: cross join + cosine threshold. */
  private def brutePairs(): DataFrame = {
    val emb = Tables(spark, sf(), "embeddings")
    val a = emb.select(col("vec_id").as("id_a"), col("embedding").as("vec_a"))
    val b = emb.select(col("vec_id").as("id_b"), col("embedding").as("vec_b"))
    a.join(b, col("id_a") < col("id_b") &&
        Similarity.cosine(col("vec_a"), col("vec_b")) >= lit(0.2))
      .select("id_a", "id_b")
  }

  private def optimizedPlan(df: DataFrame): String =
    df.queryExecution.optimizedPlan.toString

  test("rewrites the theta join to an LSH equi join; no nested loop remains") {
    withRewrite {
      val df = brutePairs()
      assert(optimizedPlan(df).contains("vec_lsh_key"))
      val phys = df.queryExecution.executedPlan.toString
      assert(!phys.contains("BroadcastNestedLoopJoin") &&
        !phys.contains("CartesianProduct"), phys)
    }
  }

  test("rewritten results equal the hand-written LSH-bucketed pipeline") {
    val manual = Similarity.cosineNearDupPairs(
      Tables(spark, sf(), "embeddings"), "vec_id", "embedding",
      dim = Dim, threshold = 0.2, bits = Bits)
      .select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val rewritten = withRewrite {
      brutePairs().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    assert(rewritten == manual)
    assert(rewritten.nonEmpty)
    // and it is a strict subset of the exact answer (the recall trade)
    val exact = brutePairs().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rewritten.subsetOf(exact))
  }

  test("no rewrite when the confs are unset (approximation is opt-in)") {
    CosineJoinRewrite.ensureRegistered(spark)
    assert(!optimizedPlan(brutePairs()).contains("vec_lsh_key"))
  }

  test("no rewrite when the join already has an equi pair (user blocking)") {
    withRewrite {
      val emb = Tables(spark, sf(), "embeddings")
      val a = emb.select(col("label").as("lbl"), col("vec_id").as("id_a"),
        col("embedding").as("vec_a"))
      val b = emb.select(col("label").as("lbl"), col("vec_id").as("id_b"),
        col("embedding").as("vec_b"))
      val blocked = a.join(b, a("lbl") === b("lbl") &&
        col("id_a") < col("id_b") &&
        Similarity.cosine(col("vec_a"), col("vec_b")) >= lit(0.2))
      assert(!optimizedPlan(blocked).contains("vec_lsh_key"))
    }
  }

  test("no rewrite for negative thresholds (sign-bit LSH can't serve them)") {
    withRewrite {
      val emb = Tables(spark, sf(), "embeddings")
      val a = emb.select(col("vec_id").as("id_a"), col("embedding").as("vec_a"))
      val b = emb.select(col("vec_id").as("id_b"), col("embedding").as("vec_b"))
      val neg = a.join(b, col("id_a") < col("id_b") &&
        Similarity.cosine(col("vec_a"), col("vec_b")) >= lit(-0.5))
      assert(!optimizedPlan(neg).contains("vec_lsh_key"))
    }
  }
}
