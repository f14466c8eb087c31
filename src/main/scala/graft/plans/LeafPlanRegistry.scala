package graft.plans

import org.apache.spark.sql.DataFrame

/** Registry of checkpoint-leaf BUILD plans.
  *
  * Several operators materialize a shared subtree as a checkpoint leaf
  * (tf-idf weight tables, wide-simhash fingerprints, distinct key sets)
  * because Catalyst's ReuseExchange cannot see sharing across self-join
  * exprIds. The price was OBSERVABILITY: the parquet scan — and with it
  * the pushed-filters / pruned-schema evidence the plan audit asserts —
  * moves into the leaf's build job and vanishes from the final plan's
  * text, so PLANS.md showed "—" for exactly the queries whose scans are
  * heaviest. Every leaf site now records its pre-materialization
  * executed plan here; [[graft.tools.PlanReport]] (and PlanDriftSpec)
  * drain the registry per query and assert pushdown over the MAIN plan
  * plus its leaves, instead of asserting it away.
  *
  * The buffer is bounded (drop-oldest): recording is always on, and a
  * long bench/verify run that never drains must not accumulate plan
  * strings without limit. Plan-string construction is per-leaf-build —
  * the build itself runs a Spark job, so the registry cost is noise.
  *
  * The buffer is PER-THREAD (not one global queue): the test suites run
  * concurrently against a shared SparkSession (CacheHygieneSpec
  * documents this), and with a global queue a leaf recorded by another
  * suite between a consumer's two drain() calls would be attributed to
  * the wrong query — a pinned pushedFilters=false row could flake true
  * on foreign evidence, exactly the regression the audit exists to
  * catch. Both record and drain happen on the thread that CONSTRUCTS
  * the query (leaf builds run their Spark job inline from the calling
  * thread; the drain-discard → build → drain-use protocol in
  * PlanReport/PlanDriftSpec is single-threaded by design), so
  * thread-locality IS query-locality. The bound is per thread; threads
  * that never drain cap at MaxEntries strings and the ThreadLocal dies
  * with the thread. */
object LeafPlanRegistry {
  private val MaxEntries = 64
  private val buf: ThreadLocal[java.util.ArrayDeque[String]] =
    ThreadLocal.withInitial(() => new java.util.ArrayDeque[String]())

  /** Record `df`'s executed plan as a leaf build; returns `df` so call
    * sites can wrap in place. */
  def record(df: DataFrame): DataFrame = {
    val q = buf.get()
    while (q.size >= MaxEntries) { q.pollFirst(); () }
    q.addLast(df.queryExecution.executedPlan.toString)
    df
  }

  /** Remove and return everything THIS THREAD recorded since its last
    * drain (other threads' records are invisible — see class doc). */
  def drain(): Seq[String] = {
    val q = buf.get()
    val out = scala.collection.mutable.ListBuffer.empty[String]
    var s = q.pollFirst()
    while (s != null) { out += s; s = q.pollFirst() }
    out.toSeq
  }
}
