package graft.ops

import graft.SparkSpec

/** Every query in the public surface must leave nothing cached behind:
  * a long-lived session (notebook, scheduled pipeline, Thrift server)
  * that runs these operators repeatedly would otherwise accumulate
  * storage-memory blocks until executors start evicting or OOMing.
  * Operators that need a subtree twice must either share exchanges or
  * materialize driver-side bounded sets — never persist-and-forget. */
class CacheHygieneSpec extends SparkSpec {

  private val checked = Seq(
    "q53_minhash_lsh_pairs",   // formerly persisted the signature table
    "q55_simhash_near_dups",   // formerly persisted the fingerprint table
    "q65_ann_ivf_topk",        // formerly persisted the IVF probe set
    "q52_ngram_jaccard",
    "q61_cosine_topk_brute"
  )

  test("queries leave no persisted RDDs or cached plans behind") {
    spark.catalog.clearCache()
    checked.foreach { name =>
      graft.SparkEntry.queries(name)(spark, sf()).count()
      val leaked = spark.sparkContext.getPersistentRDDs
      assert(leaked.isEmpty,
        s"$name left ${leaked.size} persisted RDD(s): " +
          leaked.values.map(_.name).mkString(", "))
    }
  }
}
