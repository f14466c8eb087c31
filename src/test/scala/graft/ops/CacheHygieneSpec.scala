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
      // the session is shared across concurrently-running suites, so
      // attribute leaks by BEFORE/AFTER diff (another suite's in-flight
      // checkpoint leaf is not this query's leak) and give the
      // ContextCleaner a bounded GC window — leaf RDDs whose driver
      // references died are unpersisted asynchronously after GC, which
      // is exactly the "nothing ACCUMULATES" contract this spec guards
      val before = spark.sparkContext.getPersistentRDDs.keySet
      graft.SparkEntry.queries(name)(spark, sf()).count()
      def leaked = spark.sparkContext.getPersistentRDDs
        .filter { case (id, _) => !before.contains(id) }
      val deadline = System.nanoTime + 10L * 1000 * 1000 * 1000
      while (leaked.nonEmpty && System.nanoTime < deadline) {
        System.gc(); Thread.sleep(200)
      }
      val left = leaked
      assert(left.isEmpty,
        s"$name left ${left.size} persisted RDD(s): " +
          left.values.map(_.toString).mkString(", "))
    }
  }
}
