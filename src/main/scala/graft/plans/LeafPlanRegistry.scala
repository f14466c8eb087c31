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
  * the build itself runs a Spark job, so the registry cost is noise. */
object LeafPlanRegistry {
  private val MaxEntries = 64
  private val buf = new java.util.concurrent.ConcurrentLinkedQueue[String]()

  /** Record `df`'s executed plan as a leaf build; returns `df` so call
    * sites can wrap in place. */
  def record(df: DataFrame): DataFrame = {
    while (buf.size() >= MaxEntries) { buf.poll(); () }
    buf.add(df.queryExecution.executedPlan.toString)
    df
  }

  /** Remove and return everything recorded since the last drain. */
  def drain(): Seq[String] = {
    val out = scala.collection.mutable.ListBuffer.empty[String]
    var s = buf.poll()
    while (s != null) { out += s; s = buf.poll() }
    out.toSeq
  }
}
