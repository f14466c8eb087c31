package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType
import graft.sources.Tables

/** The relational query surface (SURVEY.md §2.K).
  *
  * The reference delegates every relational operator beyond COUNT(*) and
  * TOP-1 to the source DBMS via pass-through SQL
  * (`CopyTable.java:325-327`); a Spark-native engine executes them itself.
  * Each query here is a named, oracle-checkable operator over the harness
  * star schema.
  *
  * Determinism rules (so results hash-match the DuckDB oracle):
  *  - money/double aggregates are summed exactly then cast back to
  *    double — order-independent: money measures (≤2 true decimals)
  *    quantize to fixed-point longs in codegen (`dsumFx`); unbounded
  *    doubles take the `DecimalType(18,6)` cast per row (`dsum`);
  *  - every result has a total-order `ORDER BY`;
  *  - integer-ish function outputs are cast to the same width both sides.
  */
object Relational {
  type Q = (SparkSession, String) => DataFrame

  // Scale 6 captures every harness measure exactly (prices/discount/tax
  // carry ≤2 decimals each; their triple product ≤6), so the cast never
  // lands on a rounding tie and Spark/DuckDB agree bit-for-bit.
  private def dec(c: Column): Column = c.cast(DecimalType(18, 6))
  /** Exact, order-independent sum of a double expression, as double.
    * The double→decimal cast builds a BigDecimal from Double.toString per
    * row — correct for ARBITRARY doubles (the `value` measure), but ~4×
    * slower than the fixed-point path below. Use this only where the
    * input's decimal count is unbounded. */
  private[ops] def dsum(c: Column): Column = sum(dec(c)).cast("double")

  /** Sign-safe fixed-point quantization: the value scaled by `pow10` and
    * half-up-rounded to an unscaled long, entirely in primitive codegen
    * (no BigDecimal, no allocation). Exactly equals the unscaled value of
    * `c.cast(DecimalType(18, s))` whenever the TRUE value carries ≤ s
    * decimals and |c| < ~2^51/pow10 (the double-multiply error then stays
    * < 0.5 ulp of the integer grid, and the harness contract — money
    * columns carry ≤2 decimals, measured across every SF including sf1 —
    * rules out half-way ties). Negative inputs round away from zero like
    * HALF_UP: the magnitude is quantized, then the sign reapplied. */
  private[ops] def unscaledFx(c: Column, pow10: Long): Column = {
    val mag = (abs(c) * lit(pow10.toDouble) + lit(0.5)).cast("long")
    val signed = when(c < 0, -mag).otherwise(mag)
    // domain guard: outside ±2^51/pow10 the double-multiply error can
    // reach the rounding boundary, and NaN/Infinity would cast to
    // 0/Long.MaxValue and be silently COUNTED where the decimal path
    // yields NULL (row skipped). `between` is false for NaN/±Inf and
    // out-of-range, so all off-contract values become NULL — the same
    // observable behavior as a decimal-cast overflow, never a silently
    // wrong sum. One primitive comparison per row.
    val bound = 2.0e15 / pow10
    when(c.between(-bound, bound), signed)
  }

  /** Exact order-independent sum of a ≤6-decimal money measure, as
    * double — same value as `dsum` ON THE MONEY DOMAIN |v| ≤ 2·10⁹
    * (oracle-verified; contract maxima are ~5·10⁵). Outside it the two
    * diverge deliberately: `dsum`'s decimal cast still includes values
    * up to 10¹², while this path NULLs them (quantization exactness
    * can't be guaranteed there, and a skipped row beats a possibly
    * off-by-1e-6 sum). ~2× faster: the
    * per-row path is one fixed-point quantization + a compact-long
    * decimal add (the sum buffer stays in Spark Decimal's long fast
    * path); the single division back to value units happens once per
    * GROUP, not per row. At 100 TB the per-row cost is what a corpus
    * aggregation actually pays — this keeps it in whole-stage codegen
    * primitives. */
  private[ops] def dsumFx(c: Column): Column =
    (sum(unscaledFx(c, 1000000L).cast(DecimalType(18, 0))) / lit(1000000L))
      .cast("double")

  /** Deterministic HLL-shaped distinct estimator, grouped. Stochastic
    * averaging over the shared h60 space: the top 8 bits pick one of
    * m=256 buckets, each bucket keeps the MIN of its 52-bit remainder
    * (an order statistic, like the KMV sketch), and the estimate is the
    * harmonic combination c²·W / Σ_buckets(min) − c over the c OCCUPIED
    * buckets — the same light-tailed form HLL uses (2^-register ≈
    * min/W), which keeps one lucky bucket from dominating. Using c
    * rather than the register count m is the small-cardinality
    * correction: at full occupancy (c = m) the two are identical, while
    * for n ≪ m each occupied bucket holds ~1 value with E[min] ≈ W/2,
    * so the estimate degrades gracefully to ≈ c — linear counting —
    * instead of blowing up on the empty registers a true HLL would
    * correct for. The only non-integer step is a single final double
    * expression over exact BIGINT sums, so unlike HLL's engine-internal
    * registers the oracle replays it bit-for-bit. Scale: min() combines
    * map-side; the only shuffled state is ≤256 (group, bucket) rows per
    * group — same O(m) footprint as HLL. */
  def approxDistinct(df: DataFrame, groupCol: String, keyCol: String,
      outCol: String): DataFrame = {
    val W = 4503599627370496L // 2^52 remainder space under the 60-bit hash
    // cast-to-string inside the operator: h60 is md5-based (string or
    // binary input only), and a numeric key is the common call
    df.select(col(groupCol),
        graft.text.TextAnalysis.h60(col(keyCol).cast("string")).as("h"))
      .select(col(groupCol), expr(s"h div $W").as("bucket"),
        (col("h") % W + 1).as("w"))
      .groupBy(col(groupCol), col("bucket"))
      .agg(min("w").as("mn"))
      .groupBy(groupCol)
      .agg(sum("mn").as("s"), count(lit(1)).as("c"))
      .select(col(groupCol),
        ((col("c") * col("c")).cast("double") * lit(W.toDouble) /
          col("s").cast("double") - col("c").cast("double")).as(outCol))
  }

  /** Time-grid gap fill + forward fill (resample): per key, an hourly
    * grid spanning that key's [first, last] observed bucket; each grid
    * row carries the last observed value at or before it
    * (`value_filled`), with `is_gap` marking synthesized rows. The
    * per-bucket observation is picked under a TOTAL order
    * (ts desc, tie desc), so the fill is deterministic even with
    * multiple events in one bucket.
    *
    * Scale shape: the grid explodes per key (bounded by span/bucket,
    * never a global calendar), the observation pick and the running
    * fill are per-key windows — nothing leaves its key's partition,
    * and no state is global. */
  def gapFillForward(df: DataFrame, keyCol: String, tsCol: String,
      tieCol: String, valueCol: String): DataFrame = {
    val ev = df.select(col(keyCol), col(tsCol).cast("timestamp").as("_ts"),
        col(tieCol).as("_tie"), col(valueCol).as("_v"))
      .withColumn("_bucket", date_trunc("hour", col("_ts")))
    val wObs = Window.partitionBy(keyCol, "_bucket")
      .orderBy(desc("_ts"), desc("_tie"))
    val observed = ev.withColumn("_rn", row_number().over(wObs))
      .filter(col("_rn") === 1)
      .select(col(keyCol), col("_bucket"), col("_v").as("_obs"))
    val grid = ev.groupBy(keyCol)
      .agg(min(col("_bucket")).as("_mn"), max(col("_bucket")).as("_mx"))
      .select(col(keyCol),
        explode(sequence(col("_mn"), col("_mx"), expr("INTERVAL 1 HOUR")))
          .as("_bucket"))
    val wFill = Window.partitionBy(keyCol).orderBy("_bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(observed, Seq(keyCol, "_bucket"), "left")
      .withColumn("value_filled", last(col("_obs"), ignoreNulls = true).over(wFill))
      .withColumn("is_gap", col("_obs").isNull.cast("int"))
      .select(col(keyCol), col("_bucket").as("bucket"),
        col("value_filled"), col("is_gap"))
  }

  val queries: Map[String, Q] = Map(
    // A5: count aggregate (pre-flight cardinality / COPY n RECORDS hint)
    "q01_count_star" -> { (s, d) =>
      Tables(s, d, "lineitem").agg(count(lit(1)).as("n_rows"))
    },

    // A2: projection scan — column pruning must reach the parquet reader
    "q02_projection" -> { (s, d) =>
      Tables(s, d, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
        .orderBy("l_orderkey", "l_linenumber")
    },

    // filter + projection — predicate pushdown to parquet
    "q03_filter_pushdown" -> { (s, d) =>
      Tables(s, d, "lineitem")
        .filter(col("l_shipdate") >= lit("1998-01-01").cast("timestamp_ntz") &&
          col("l_shipdate") < lit("1999-01-01").cast("timestamp_ntz") &&
          col("l_quantity") > 45)
        .select("l_orderkey", "l_linenumber", "l_shipdate", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber")
    },

    // hash aggregate w/ multiple measures (TPC-H Q1 shape) — flagship
    "q04_agg_pricing_summary" -> { (s, d) =>
      val li = Tables(s, d, "lineitem")
      li.groupBy("l_returnflag", "l_linestatus").agg(
        dsumFx(col("l_quantity")).as("sum_qty"),
        dsumFx(col("l_extendedprice")).as("sum_base_price"),
        dsumFx(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
        dsumFx(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))).as("sum_charge"),
        count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    // filter + global aggregate (TPC-H Q6 shape)
    "q05_filter_agg_revenue" -> { (s, d) =>
      Tables(s, d, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp_ntz") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp_ntz") &&
          col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
        .agg(dsumFx(col("l_extendedprice") * col("l_discount")).as("revenue"),
          count(lit(1)).as("n_items"))
    },

    // 3-way join + agg + top-k by computed measure (TPC-H Q3 shape)
    // Eager aggregation (r11): revenue is additive per l_orderkey and
    // o_orderdate is functionally dependent on it, so the lineitem
    // reduction runs BELOW the join — the map-side combine collapses
    // ~4 line items per order before the shuffle moves anything, and the
    // shuffled rows are 2 columns instead of 4. The subsequent SMJ with
    // orders reuses the aggregate's hash partitioning on the join key
    // (no re-shuffle of the reduced side), the BUILDING-customer filter
    // rides a broadcast at dim scale and degrades to SMJ gracefully
    // beyond the threshold, and the top-10 is a TakeOrdered, never a
    // global sort. Catalyst has no agg-below-join pushdown, so this
    // plan must be declared — measured at sf10: the joined-then-grouped
    // form shuffled all 60M full-width line items first.
    "q06_join_topk_revenue" -> { (s, d) =>
      val c = Tables(s, d, "customer").filter(col("c_mktsegment") === "BUILDING")
      val o = Tables(s, d, "orders")
      val l = Tables(s, d, "lineitem")
      val rev = l.groupBy(col("l_orderkey"))
        .agg(dsumFx(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
      // semi-filter orders BEFORE their shuffle: the customer predicate
      // drops ~4/5 of orders, and a semi join never duplicates rows, so
      // it is exactly the inner c⋈o of the original shape (c_custkey is
      // unique) at a fifth of the shuffle volume
      val oBld = o.join(c, c("c_custkey") === o("o_custkey"), "left_semi")
      rev.join(oBld, rev("l_orderkey") === oBld("o_orderkey"))
        .select(col("l_orderkey"), col("o_orderdate"), col("revenue"))
        .orderBy(desc("revenue"), asc("l_orderkey"))
        .limit(10)
    },

    // broadcast join small dim + agg
    "q07_broadcast_join_agg" -> { (s, d) =>
      val l = Tables(s, d, "lineitem")
      val p = Tables(s, d, "part")
      l.join(broadcast(p), l("l_partkey") === p("p_partkey"))
        .groupBy("p_brand")
        .agg(dsumFx(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n_items"))
        .orderBy("p_brand")
    },

    // 6-way star join (TPC-H Q5 shape) — dims broadcast, facts shuffled once
    "q08_star_join_revenue" -> { (s, d) =>
      val r = Tables(s, d, "region").filter(col("r_name") === "ASIA")
      val n = Tables(s, d, "nation")
      val c = Tables(s, d, "customer")
      val o = Tables(s, d, "orders")
      val l = Tables(s, d, "lineitem")
      val su = Tables(s, d, "supplier")
      c.join(o, c("c_custkey") === o("o_custkey"))
        .join(l, o("o_orderkey") === l("l_orderkey"))
        .join(su, l("l_suppkey") === su("s_suppkey") && c("c_nationkey") === su("s_nationkey"))
        .join(broadcast(n), su("s_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy("n_name")
        .agg(dsumFx(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
        .orderBy(desc("revenue"), asc("n_name"))
    },

    // left-semi join (EXISTS). The probe side is pre-distinct'd (r11):
    // a semi join's SMJ shuffles every qualifying line item, but the
    // merge only ever needs each orderkey once — the explicit distinct
    // adds a map-side partial dedup before the shuffle AND gives AQE an
    // accurately-sized single-column build side it can convert to a
    // runtime broadcast when it fits the threshold. Same semantics by
    // definition of semi join.
    "q09_semi_join" -> { (s, d) =>
      val o = Tables(s, d, "orders")
      val keys = Tables(s, d, "lineitem").filter(col("l_quantity") >= 48)
        .select(col("l_orderkey")).distinct()
      o.join(keys, o("o_orderkey") === keys("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority").agg(count(lit(1)).as("n_orders"))
        .orderBy("o_orderpriority")
    },

    // left-anti join (NOT EXISTS)
    "q10_anti_join" -> { (s, d) =>
      val c = Tables(s, d, "customer")
      val o = Tables(s, d, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select("c_custkey", "c_name").orderBy("c_custkey")
    },

    // left-outer join + two-level aggregate (orders-per-size histogram)
    "q11_outer_join_histogram" -> { (s, d) =>
      val o = Tables(s, d, "orders")
      val l = Tables(s, d, "lineitem")
      o.join(l, o("o_orderkey") === l("l_orderkey"), "left_outer")
        .groupBy(o("o_orderkey")).agg(count(l("l_linenumber")).as("n_items"))
        .groupBy("n_items").agg(count(lit(1)).as("n_orders"))
        .orderBy("n_items")
    },

    // window: rank + row_number per partition, top-3
    "q12_window_rank" -> { (s, d) =>
      val w = Window.partitionBy("c_nationkey").orderBy(desc("c_acctbal"), asc("c_custkey"))
      Tables(s, d, "customer")
        .withColumn("rnk", rank().over(w).cast("long"))
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 3)
        .select("c_nationkey", "rn", "rnk", "c_custkey", "c_acctbal")
        .orderBy("c_nationkey", "rn")
    },

    // window: running sum frame (rows unbounded preceding)
    "q13_window_running_sum" -> { (s, d) =>
      val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables(s, d, "orders").filter(col("o_custkey") < 100)
        .withColumn("running_spend", sum(dec(col("o_totalprice"))).over(w).cast("double"))
        .select("o_custkey", "o_orderkey", "o_orderdate", "running_spend")
        .orderBy("o_custkey", "o_orderdate", "o_orderkey")
    },

    // window: time-RANGE frame (value-based, not row-count-based — the
    // sliding "last hour per user" aggregate; tie-safe by construction
    // since the frame is keyed on the order VALUE)
    "q115_range_frame_window" -> { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy("t")
        .rangeBetween(-3600000000L, 0L)
      Tables(s, d, "events").filter(col("user_id") < 50)
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts").cast("timestamp")).as("t"), col("value"))
        .withColumn("n_1h", count(lit(1)).over(w))
        .withColumn("sum_1h", sum(dec(col("value"))).over(w).cast("double"))
        .select("event_id", "user_id", "t", "n_1h", "sum_1h")
        .orderBy("user_id", "t", "event_id")
    },

    // window: lag/lead
    "q14_window_lag_lead" -> { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      Tables(s, d, "events").filter(col("user_id") < 20)
        .withColumn("prev_value", lag("value", 1).over(w))
        .withColumn("next_type", lead("event_type", 1).over(w))
        .select("user_id", "event_id", "ts", "value", "prev_value", "next_type")
        .orderBy("user_id", "event_id")
    },

    // rollup w/ grouping markers
    "q15_rollup" -> { (s, d) =>
      Tables(s, d, "orders")
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n_orders"), dsumFx(col("o_totalprice")).as("sum_price"),
          grouping("o_orderstatus").cast("int").as("g_status"),
          grouping("o_orderpriority").cast("int").as("g_priority"))
        .orderBy(asc_nulls_first("o_orderstatus"), asc_nulls_first("o_orderpriority"))
    },

    // cube
    "q16_cube" -> { (s, d) =>
      Tables(s, d, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"), dsumFx(col("l_quantity")).as("sum_qty"))
        .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))
    },

    // distinct
    "q17_distinct" -> { (s, d) =>
      Tables(s, d, "customer").select("c_mktsegment", "c_nationkey")
        .distinct().orderBy("c_mktsegment", "c_nationkey")
    },

    // global sort + limit (TakeOrderedAndProject)
    "q18_topk_orders" -> { (s, d) =>
      Tables(s, d, "orders")
        .orderBy(desc("o_totalprice"), asc("o_orderkey")).limit(100)
    },

    // set op: INTERSECT
    "q19_intersect" -> { (s, d) =>
      val a = Tables(s, d, "customer").filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey").as("custkey"))
      val b = Tables(s, d, "orders").filter(col("o_orderstatus") === "O")
        .select(col("o_custkey").as("custkey"))
      a.intersect(b).orderBy("custkey")
    },

    // set op: EXCEPT
    "q20_except" -> { (s, d) =>
      val a = Tables(s, d, "customer").select(col("c_custkey").as("custkey"))
      val b = Tables(s, d, "orders").select(col("o_custkey").as("custkey"))
      a.except(b).orderBy("custkey")
    },

    // set op: UNION ALL with provenance tag
    "q21_union_all" -> { (s, d) =>
      val o = Tables(s, d, "orders")
      val hi = o.filter(col("o_orderpriority") === "1-URGENT" && col("o_totalprice") > 300000)
        .select(lit("hi").as("bucket"), col("o_orderkey"), col("o_totalprice"))
      val lo = o.filter(col("o_orderpriority") === "5-LOW" && col("o_totalprice") < 50000)
        .select(lit("lo").as("bucket"), col("o_orderkey"), col("o_totalprice"))
      hi.unionAll(lo).orderBy("bucket", "o_orderkey")
    },

    // scalar string function pipeline
    "q22_string_funcs" -> { (s, d) =>
      Tables(s, d, "part").select(
        col("p_partkey"),
        upper(col("p_name")).as("name_upper"),
        length(col("p_name")).as("name_len"),
        substring(col("p_name"), 1, 5).as("name_pfx"),
        concat_ws("/", col("p_brand"), col("p_type")).as("brand_type"),
        regexp_replace(col("p_name"), "[aeiou]", "").as("name_novowel"),
        size(split(col("p_name"), " ")).cast("int").as("n_words"))
        .orderBy("p_partkey")
    },

    // scalar date/time function pipeline + agg
    "q23_date_funcs" -> { (s, d) =>
      Tables(s, d, "orders")
        .groupBy(year(col("o_orderdate")).cast("int").as("y"),
          quarter(col("o_orderdate")).cast("int").as("q"),
          month(col("o_orderdate")).cast("int").as("m"))
        .agg(count(lit(1)).as("n_orders"), min("o_orderdate").as("first_date"))
        .orderBy("y", "m")
    },

    // scalar math function pipeline
    "q24_math_funcs" -> { (s, d) =>
      Tables(s, d, "lineitem").filter(col("l_orderkey") < 100).select(
        col("l_orderkey"), col("l_linenumber"),
        abs(col("l_quantity") - 25).as("qty_dev"),
        floor(col("l_extendedprice") / 1000).cast("long").as("price_k_floor"),
        ceil(col("l_extendedprice") / 1000).cast("long").as("price_k_ceil"),
        sqrt(col("l_quantity")).as("qty_sqrt"),
        pmod(col("l_linenumber"), lit(3)).cast("int").as("ln_mod3"))
        .orderBy("l_orderkey", "l_linenumber")
    },

    // conditional aggregation (CASE WHEN)
    "q25_conditional_agg" -> { (s, d) =>
      Tables(s, d, "orders").groupBy("o_orderpriority").agg(
        sum(when(col("o_orderstatus") === "F", 1).otherwise(0)).as("n_finished"),
        sum(when(col("o_orderstatus") === "O", 1).otherwise(0)).as("n_open"),
        sum(when(col("o_orderstatus") === "P", 1).otherwise(0)).as("n_pending"))
        .orderBy("o_orderpriority")
    },

    // group-by + HAVING
    "q26_having" -> { (s, d) =>
      Tables(s, d, "customer").groupBy("c_nationkey")
        .agg(count(lit(1)).as("n_customers"), dsumFx(col("c_acctbal")).as("sum_bal"))
        .filter(col("n_customers") >= 40)
        .orderBy("c_nationkey")
    },

    // SQL surface: correlated EXISTS subquery (A3 pass-through parity)
    "q27_sql_exists" -> { (s, d) =>
      Tables.registerAll(s, d)
      s.sql("""SELECT o_orderpriority, count(*) AS n
              |FROM orders
              |WHERE EXISTS (SELECT 1 FROM lineitem
              |              WHERE l_orderkey = o_orderkey AND l_quantity > 49)
              |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
    },

    // SQL surface: scalar subquery
    "q28_sql_scalar_subquery" -> { (s, d) =>
      Tables.registerAll(s, d)
      s.sql("""SELECT c_custkey, c_acctbal FROM customer
              |WHERE c_acctbal > 0.99 * (SELECT max(c_acctbal) FROM customer)
              |ORDER BY c_custkey""".stripMargin)
    },

    // equi+range (non-equi band) join
    "q29_range_join" -> { (s, d) =>
      val l = Tables(s, d, "lineitem")
      val p = Tables(s, d, "part")
      l.join(broadcast(p), l("l_partkey") === p("p_partkey") &&
          l("l_quantity").between(p("p_size") - 2, p("p_size") + 2))
        .groupBy("p_brand")
        .agg(count(lit(1)).as("n_items"), dsumFx(col("l_quantity")).as("sum_qty"))
        .orderBy("p_brand")
    },

    // the TPC-H Q5 shape: 6-table star join (region→nation→customer/
    // supplier→orders→lineitem) with the local-supplier equi condition,
    // a year window, and order-independent decimal revenue — Catalyst
    // picks the join order, broadcasts every dimension
    "q127_tpch_q5" -> { (s, d) =>
      Tables.registerAll(s, d)
      s.sql("""SELECT n_name,
              |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
              |    AS DECIMAL(18,6))) AS DOUBLE) AS revenue
              |FROM customer, orders, lineitem, supplier, nation, region
              |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
              |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
              |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
              |  AND r_name = 'ASIA'
              |  AND o_orderdate >= DATE '1996-01-01'
              |  AND o_orderdate < DATE '1997-01-01'
              |GROUP BY n_name
              |ORDER BY revenue DESC, n_name""".stripMargin)
    },

    // SCD2-style run collapse (gaps-and-islands): consecutive same-state
    // rows per user merge into validity intervals — the change-history
    // compaction an incremental warehouse load performs. lag-flag →
    // running sum → per-run aggregate, one window shuffle
    "q124_scd2_runs" -> { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables(s, d, "events").filter(col("user_id") < 20)
        .withColumn("chg",
          when(lag(col("event_type"), 1).over(w).isNull ||
            lag(col("event_type"), 1).over(w) =!= col("event_type"), lit(1))
            .otherwise(lit(0)))
        .withColumn("run_id", sum(col("chg")).over(cum))
        .groupBy(col("user_id"), col("run_id"))
        .agg(min(col("event_type")).as("state"),
          min(col("ts")).cast("timestamp_ntz").as("valid_from"),
          max(col("ts")).cast("timestamp_ntz").as("valid_to"),
          count(lit(1)).as("n_rows"))
        .orderBy("user_id", "run_id")
    },

    // hopping (sliding) windows: 1h windows every 30min — each event
    // lands in exactly 2 windows; the oracle replays the grid with
    // unnest([k, k-1])
    "q120_hopping_window" -> { (s, d) =>
      Tables(s, d, "events")
        .groupBy(window(col("ts").cast("timestamp"), "1 hour", "30 minutes"),
          col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
        .select(col("window.start").cast("timestamp_ntz").as("w_start"),
          col("event_type"), col("n"), col("sum_value"))
        .orderBy("w_start", "event_type")
    },

    // time-grid gap fill + forward fill (resample): per user, an hourly
    // grid spanning [first, last] observed bucket; each grid row carries
    // the last observed value at or before it — the sensor/metrics
    // resample every analytics stack needs
    "q141_gap_fill_forward" -> { (s, d) =>
      gapFillForward(Tables(s, d, "events").filter(col("user_id") < 10),
        "user_id", "ts", "event_id", "value")
        .select(col("user_id"), col("bucket").cast("timestamp_ntz").as("bucket"),
          col("value_filled"), col("is_gap"))
        .orderBy("user_id", "bucket")
    },

    // KMV (k-minimum-values) distinct sketch — the DETERMINISTIC cousin
    // of q36's HLL: estimate = (k−1)·H / h_(k) over the shared h60
    // space, every value replayable by the oracle (HLL buckets are
    // engine-internal; order statistics of a shared hash family are
    // not). At scale the distinct-hash set is the only shuffle, and a
    // real deployment keeps just the k smallest per group (a bounded
    // heap; here the exact windowed form doubles as its own spec).
    "q121_kmv_distinct" -> { (s, d) =>
      val k = 32
      val ev = Tables(s, d, "events")
      val hashes = ev.select(col("event_type"),
        graft.text.TextAnalysis.h60(col("user_id").cast("string")).as("h"))
        .distinct()
      val w = Window.partitionBy("event_type").orderBy("h")
      val kth = hashes.withColumn("rk", row_number().over(w))
        .filter(col("rk") === k)
        .select(col("event_type"),
          (lit((k - 1).toDouble) * lit(1152921504606846976.0) /
            col("h").cast("double")).as("est_distinct"))
      ev.groupBy("event_type")
        .agg(countDistinct(col("user_id")).as("n_exact"))
        .join(kth, Seq("event_type"))
        .orderBy("event_type")
    },

    // time bucketing (tumbling hour) + agg over events
    "q30_time_bucket_agg" -> { (s, d) =>
      Tables(s, d, "events")
        .groupBy(date_trunc("hour", col("ts")).cast("timestamp_ntz").as("hour_ts"),
          col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
        .orderBy("hour_ts", "event_type")
    },

    // pivot (event_type → columns)
    "q31_pivot" -> { (s, d) =>
      Tables(s, d, "events").filter(col("user_id") < 50)
        .groupBy("user_id")
        .pivot("event_type", Seq("click", "view", "signup", "error", "purchase"))
        .agg(count(lit(1)))
        .na.fill(0)
        .select(col("user_id"), col("click").as("n_click"), col("view").as("n_view"),
          col("signup").as("n_signup"), col("error").as("n_error"),
          col("purchase").as("n_purchase"))
        .orderBy("user_id")
    },

    // A6: watermark scan (max of trigger column) — timestamp flavor
    "q32_watermark_max_ts" -> { (s, d) =>
      Tables(s, d, "events").agg(max("ts").as("max_ts"))
    },

    // A6: watermark scan — numeric flavor
    "q33_watermark_max_id" -> { (s, d) =>
      Tables(s, d, "events").agg(max("event_id").as("max_id"))
    },

    // F1: empty-source guard — per-table cardinality report
    "q34_table_counts" -> { (s, d) =>
      Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem")
        .map { t => Tables(s, d, t).agg(lit(t).as("tbl"), count(lit(1)).as("n_rows")) }
        .reduce(_ unionAll _).orderBy("tbl")
    },

    // exact count distinct (grouped)
    "q35_count_distinct" -> { (s, d) =>
      Tables(s, d, "lineitem").groupBy("l_returnflag")
        .agg(countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"))
        .orderBy("l_returnflag")
    },

    // approximate count distinct — deterministic HLL-shaped estimator;
    // see [[approxDistinct]]. Exact countDistinct alongside.
    "q36_approx_count_distinct" -> { (s, d) =>
      val li = Tables(s, d, "lineitem")
      val est = approxDistinct(
        li.select(col("l_returnflag"), col("l_partkey").cast("string").as("k")),
        "l_returnflag", "k", "approx_parts")
      val exact = li.groupBy("l_returnflag")
        .agg(countDistinct(col("l_partkey")).as("n_parts"))
      est.join(exact, Seq("l_returnflag")).orderBy("l_returnflag")
    },

    // unpivot / melt: wide measure columns → long (id, measure, value)
    "q37_unpivot" -> { (s, d) =>
      Tables(s, d, "lineitem")
        .filter(col("l_orderkey") < 100)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity"), col("l_extendedprice"), col("l_discount"), col("l_tax"))
        .unpivot(
          ids = Array(col("l_orderkey"), col("l_linenumber")),
          values = Array(col("l_quantity"), col("l_extendedprice"),
            col("l_discount"), col("l_tax")),
          variableColumnName = "measure", valueColumnName = "value")
        .orderBy("l_orderkey", "l_linenumber", "measure")
    },

    // Pearson correlation via decimal-exact moment sums: built-in corr()
    // accumulates doubles in partition order (nondeterministic at scale);
    // exact decimal sums make the result reproducible bit-for-bit and
    // oracle-checkable. Same one-pass, map-side-combinable shape.
    //
    // The moments run on the fixed-point fast path: x (quantity) is
    // quantized at scale 6 (ux ≤ 5·10⁷), y (price) at scale 2 (uy ≤
    // ~1.1·10⁷ — prices carry exactly 2 decimals, so scale-2 and scale-6
    // quantization coincide and the old decimal(18,6) moments are
    // reproduced EXACTLY). Per-row products stay in primitive longs with
    // huge headroom (x·y ≤ 5.5·10¹⁴, y² ≤ 1.2·10¹⁴ vs 2⁶³≈9.2·10¹⁸),
    // the sums accumulate in compact-long decimal, and one division per
    // GROUP restores value units before the double conversion — so the
    // per-row path has zero BigDecimal work where the previous version
    // paid two string-mediated double→decimal casts and three BigDecimal
    // multiplies per row (~6× the runtime at sf1). The per-group
    // divisions resolve at decimal scale 10 — exact because quantity is
    // integer-valued and price 2-decimal (the same measured contract the
    // quantization relies on), so every moment carries ≤4 decimals.
    "q58_exact_corr" -> { (s, d) =>
      // the moments multiply unscaled longs, so each factor must stay
      // below sqrt(2^63) ≈ 3.04e9 or a product silently WRAPS — a
      // tighter bound than unscaledFx's own quantization guard. Cap both
      // factors at 3e9: off-contract rows (quantity beyond ~3e3,
      // price beyond ~3e7 — the contract maxima are 50 and ~1.1e5) go
      // NULL and are skipped, never wrapped into a garbage sum.
      def capped(c: Column, pow10: Long) = {
        val u = unscaledFx(c, pow10)
        when(abs(u) <= lit(3000000000L), u)
      }
      val ux = capped(col("l_quantity"), 1000000L)           // scale 6
      val uy = capped(col("l_extendedprice"), 100L)          // scale 2
      // decimal(20,0), not (18,0): a factor in (1e9, 3e9] passes the
      // wrap cap but its product reaches 9e18 — 19 digits, which a
      // decimal(18,0) cast nulls out, dropping the row from ONE moment
      // while n/sx/sy still count it (an inconsistent correlation for
      // off-contract data). 20 digits hold the full capped range, so
      // off-contract rows are either included in every moment or
      // excluded (NULL factor) from every moment — never half-counted.
      def fsum(u: Column, div: Long) =
        sum(u.cast(DecimalType(20, 0))) / lit(div)
      def dbl(c: Column) = c.cast("double")
      Tables(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          fsum(ux, 1000000L).as("sx"), fsum(uy, 100L).as("sy"),
          fsum(ux * uy, 100000000L).as("sxy"),               // scale 8
          fsum(ux * ux, 1000000000000L).as("sxx"),           // scale 12
          fsum(uy * uy, 10000L).as("syy"))                   // scale 4
        .select(col("l_returnflag"), col("n"),
          // floor-quantized to 1e-9: the moment sums are exact decimals,
          // but decimal→double conversion can differ in the last ulp
          // across engines (double-rounding of int128-scaled values);
          // quantizing makes the compare robust to that drift EXCEPT in
          // the measure-zero case where corr·1e9 itself lands within an
          // ulp of an integer (the floor then flips between engines) —
          // accepted: the alternative is a full-decimal correlation,
          // and sqrt forces double anyway
          floor(((dbl(col("n")) * dbl(col("sxy")) - dbl(col("sx")) * dbl(col("sy"))) /
            (sqrt(dbl(col("n")) * dbl(col("sxx")) - dbl(col("sx")) * dbl(col("sx"))) *
             sqrt(dbl(col("n")) * dbl(col("syy")) - dbl(col("sy")) * dbl(col("sy")))) * 1e9))
            .cast("long").as("corr_fp9"))
        .orderBy("l_returnflag")
    },

    // null-safe equi-join (<=> / IS NOT DISTINCT FROM): null keys match
    // each other — the semantics dedup/merge keys need when absent values
    // are legitimate join partners
    "q59_null_safe_join" -> { (s, d) =>
      val base = Tables(s, d, "events").filter(col("event_id") < 200)
        .select(col("event_id"),
          nullif(floor(col("value") * 10) % 10, lit(0)).cast("long").as("k"))
      val a = base.select(col("event_id").as("id_a"), col("k"))
      val b = base.select(col("event_id").as("id_b"), col("k").as("k_b"))
      a.join(b, a("k") <=> b("k_b") && a("id_a") < b("id_b"))
        .groupBy("k").agg(count(lit(1)).as("n_pairs"))
        .orderBy(col("k").asc_nulls_first)
    },

    // ordered string aggregation (listagg / string_agg)
    "q39_string_agg" -> { (s, d) =>
      Tables(s, d, "nation")
        .groupBy("n_regionkey")
        .agg(array_join(array_sort(collect_list(col("n_name"))), ",").as("nations"))
        .orderBy("n_regionkey")
    },

    // distribution windows: ntile buckets + percent_rank + cume_dist
    "q38_ntile_percentrank" -> { (s, d) =>
      val w = Window.partitionBy("c_nationkey").orderBy(asc("c_acctbal"), asc("c_custkey"))
      Tables(s, d, "customer")
        .withColumn("quartile", ntile(4).over(w).cast("long"))
        .withColumn("pct_rank", percent_rank().over(w))
        .withColumn("cume", cume_dist().over(w))
        .filter(col("c_custkey") % 10 === 0)
        .select("c_nationkey", "c_custkey", "c_acctbal", "quartile", "pct_rank", "cume")
        .orderBy("c_nationkey", "c_custkey")
    }
  )

  val oracles: Map[String, String] = Map(
    "q01_count_star" ->
      "SELECT count(*) AS n_rows FROM lineitem",
    "q02_projection" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q03_filter_pushdown" ->
      """SELECT l_orderkey, l_linenumber, l_shipdate, l_quantity FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1998-01-01' AND l_shipdate < TIMESTAMP '1999-01-01'
        |  AND l_quantity > 45
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q04_agg_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
        |  count(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q05_filter_agg_revenue" ->
      """SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin,
    "q06_join_topk_revenue" ->
      """SELECT l_orderkey, o_orderdate,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY revenue DESC, l_orderkey ASC LIMIT 10""".stripMargin,
    "q07_broadcast_join_agg" ->
      """SELECT p_brand,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
        |  count(*) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    "q08_star_join_revenue" ->
      """SELECT n_name,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name ORDER BY revenue DESC, n_name ASC""".stripMargin,
    "q09_semi_join" ->
      """SELECT o_orderpriority, count(*) AS n_orders FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_quantity >= 48)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q10_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "q11_outer_join_histogram" ->
      """SELECT n_items, count(*) AS n_orders FROM (
        |  SELECT o.o_orderkey, count(l.l_linenumber) AS n_items
        |  FROM orders o LEFT JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        |  GROUP BY o.o_orderkey) t
        |GROUP BY n_items ORDER BY n_items""".stripMargin,
    "q12_window_rank" ->
      """SELECT c_nationkey, rn, rnk, c_custkey, c_acctbal FROM (
        |  SELECT c_nationkey, c_custkey, c_acctbal,
        |    CAST(rank() OVER w AS BIGINT) AS rnk,
        |    CAST(row_number() OVER w AS BIGINT) AS rn
        |  FROM customer
        |  WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey ASC)) t
        |WHERE rn <= 3 ORDER BY c_nationkey, rn""".stripMargin,
    "q13_window_running_sum" ->
      """SELECT o_custkey, o_orderkey, o_orderdate,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6)))
        |    OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
        |FROM orders WHERE o_custkey < 100
        |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin,
    "q115_range_frame_window" ->
      """SELECT event_id, user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS t,
        |  CAST(count(*) OVER w AS BIGINT) AS n_1h,
        |  CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) AS sum_1h
        |FROM events WHERE user_id < 50
        |WINDOW w AS (PARTITION BY user_id
        |             ORDER BY epoch_us(CAST(ts AS TIMESTAMP))
        |             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, t, event_id""".stripMargin,
    "q14_window_lag_lead" ->
      """SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value,
        |  lag(value, 1) OVER w AS prev_value,
        |  lead(event_type, 1) OVER w AS next_type
        |FROM events WHERE user_id < 20
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY user_id, event_id""".stripMargin,
    "q15_rollup" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_price,
        |  CAST(GROUPING(o_orderstatus) AS INTEGER) AS g_status,
        |  CAST(GROUPING(o_orderpriority) AS INTEGER) AS g_priority
        |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin,
    "q16_cube" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,
    "q17_distinct" ->
      """SELECT DISTINCT c_mktsegment, c_nationkey FROM customer
        |ORDER BY c_mktsegment, c_nationkey""".stripMargin,
    "q18_topk_orders" ->
      """SELECT * FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100""",
    "q19_intersect" ->
      """SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |INTERSECT
        |SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
        |ORDER BY custkey""".stripMargin,
    "q20_except" ->
      """SELECT c_custkey AS custkey FROM customer
        |EXCEPT
        |SELECT o_custkey AS custkey FROM orders
        |ORDER BY custkey""".stripMargin,
    "q21_union_all" ->
      """SELECT * FROM (
        |  SELECT 'hi' AS bucket, o_orderkey, o_totalprice FROM orders
        |  WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 300000
        |  UNION ALL
        |  SELECT 'lo' AS bucket, o_orderkey, o_totalprice FROM orders
        |  WHERE o_orderpriority = '5-LOW' AND o_totalprice < 50000) t
        |ORDER BY bucket, o_orderkey""".stripMargin,
    "q22_string_funcs" ->
      """SELECT p_partkey, upper(p_name) AS name_upper,
        |  CAST(length(p_name) AS INTEGER) AS name_len,
        |  substring(p_name, 1, 5) AS name_pfx,
        |  concat_ws('/', p_brand, p_type) AS brand_type,
        |  regexp_replace(p_name, '[aeiou]', '', 'g') AS name_novowel,
        |  CAST(len(string_split(p_name, ' ')) AS INTEGER) AS n_words
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q23_date_funcs" ->
      """SELECT CAST(year(o_orderdate) AS INTEGER) AS y,
        |  CAST(quarter(o_orderdate) AS INTEGER) AS q,
        |  CAST(month(o_orderdate) AS INTEGER) AS m,
        |  count(*) AS n_orders, min(o_orderdate) AS first_date
        |FROM orders GROUP BY 1, 2, 3 ORDER BY y, m""".stripMargin,
    "q24_math_funcs" ->
      """SELECT l_orderkey, l_linenumber,
        |  abs(l_quantity - 25) AS qty_dev,
        |  CAST(floor(l_extendedprice / 1000) AS BIGINT) AS price_k_floor,
        |  CAST(ceil(l_extendedprice / 1000) AS BIGINT) AS price_k_ceil,
        |  sqrt(l_quantity) AS qty_sqrt,
        |  CAST(l_linenumber % 3 AS INTEGER) AS ln_mod3
        |FROM lineitem WHERE l_orderkey < 100
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q25_conditional_agg" ->
      """SELECT o_orderpriority,
        |  CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_finished,
        |  CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_open,
        |  CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_pending
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q26_having" ->
      """SELECT c_nationkey, count(*) AS n_customers,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS sum_bal
        |FROM customer GROUP BY c_nationkey
        |HAVING count(*) >= 40 ORDER BY c_nationkey""".stripMargin,
    "q27_sql_exists" ->
      """SELECT o_orderpriority, count(*) AS n FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_quantity > 49)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q28_sql_scalar_subquery" ->
      """SELECT c_custkey, c_acctbal FROM customer
        |WHERE c_acctbal > 0.99 * (SELECT max(c_acctbal) FROM customer)
        |ORDER BY c_custkey""".stripMargin,
    "q29_range_join" ->
      """SELECT p_brand, count(*) AS n_items,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |  AND l_quantity BETWEEN p_size - 2 AND p_size + 2
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    "q127_tpch_q5" ->
      """SELECT n_name,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
        |    AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        |FROM customer, orders, lineitem, supplier, nation, region
        |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        |  AND r_name = 'ASIA'
        |  AND o_orderdate >= DATE '1996-01-01'
        |  AND o_orderdate < DATE '1997-01-01'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin,
    "q124_scd2_runs" ->
      """WITH t AS (
        |  SELECT user_id, event_id, event_type, CAST(ts AS TIMESTAMP) AS ts
        |  FROM events WHERE user_id < 20),
        |f AS (SELECT user_id, event_id, event_type, ts,
        |    CASE WHEN lag(event_type, 1) OVER w IS NULL
        |           OR lag(event_type, 1) OVER w <> event_type
        |         THEN 1 ELSE 0 END AS chg
        |  FROM t WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |r AS (SELECT user_id, event_type, ts,
        |    CAST(sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS run_id
        |  FROM f)
        |SELECT user_id, run_id, min(event_type) AS state,
        |  min(ts) AS valid_from, max(ts) AS valid_to,
        |  CAST(count(*) AS BIGINT) AS n_rows
        |FROM r GROUP BY user_id, run_id
        |ORDER BY user_id, run_id""".stripMargin,
    "q120_hopping_window" ->
      """WITH e AS (
        |  SELECT event_type, value,
        |    CAST(floor(epoch_us(CAST(ts AS TIMESTAMP)) / 1800000000)
        |      AS BIGINT) AS k
        |  FROM events),
        |x AS (SELECT event_type, value, unnest([k, k - 1]) AS ks FROM e)
        |SELECT make_timestamp(ks * 1800000000) AS w_start, event_type,
        |  count(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |FROM x GROUP BY 1, 2 ORDER BY w_start, event_type""".stripMargin,
    // q141: same grid (generate_series per user span), same total-order
    // observation pick, same IGNORE NULLS running fill
    "q141_gap_fill_forward" ->
      """WITH ev AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, value,
        |    date_trunc('hour', CAST(ts AS TIMESTAMP)) AS b
        |  FROM events WHERE user_id < 10),
        |obs AS (
        |  SELECT user_id, b, value FROM (
        |    SELECT user_id, b, value,
        |      row_number() OVER (PARTITION BY user_id, b
        |        ORDER BY ts DESC, event_id DESC) AS rn
        |    FROM ev) WHERE rn = 1),
        |span AS (SELECT user_id, min(b) AS mn, max(b) AS mx FROM ev GROUP BY user_id),
        |grid AS (
        |  SELECT user_id, unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS b
        |  FROM span),
        |j AS (
        |  SELECT g.user_id, g.b, o.value
        |  FROM grid g LEFT JOIN obs o ON o.user_id = g.user_id AND o.b = g.b)
        |SELECT user_id, b AS bucket,
        |  last_value(value IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY b
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_filled,
        |  CASE WHEN value IS NULL THEN 1 ELSE 0 END AS is_gap
        |FROM j ORDER BY user_id, bucket""".stripMargin,
    "q121_kmv_distinct" ->
      """WITH h AS (
        |  SELECT DISTINCT event_type,
        |    CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)
        |      AS BIGINT) AS h
        |  FROM events),
        |r AS (SELECT event_type, h,
        |    row_number() OVER (PARTITION BY event_type ORDER BY h) AS rk
        |  FROM h),
        |x AS (SELECT event_type,
        |    31.0 * 1152921504606846976.0 / CAST(h AS DOUBLE) AS est_distinct
        |  FROM r WHERE rk = 32),
        |e AS (SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT)
        |    AS n_exact
        |  FROM events GROUP BY event_type)
        |SELECT e.event_type, e.n_exact, x.est_distinct
        |FROM e JOIN x USING (event_type) ORDER BY event_type""".stripMargin,
    "q30_time_bucket_agg" ->
      """SELECT CAST(date_trunc('hour', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS hour_ts,
        |  event_type, count(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY hour_ts, event_type""".stripMargin,
    "q31_pivot" ->
      """SELECT user_id,
        |  count(CASE WHEN event_type = 'click' THEN 1 END) AS n_click,
        |  count(CASE WHEN event_type = 'view' THEN 1 END) AS n_view,
        |  count(CASE WHEN event_type = 'signup' THEN 1 END) AS n_signup,
        |  count(CASE WHEN event_type = 'error' THEN 1 END) AS n_error,
        |  count(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purchase
        |FROM events WHERE user_id < 50
        |GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q32_watermark_max_ts" ->
      "SELECT CAST(max(ts) AS TIMESTAMP) AS max_ts FROM events",
    "q33_watermark_max_id" ->
      "SELECT max(event_id) AS max_id FROM events",
    "q34_table_counts" ->
      """SELECT * FROM (
        |  SELECT 'region' AS tbl, count(*) AS n_rows FROM region UNION ALL
        |  SELECT 'nation', count(*) FROM nation UNION ALL
        |  SELECT 'customer', count(*) FROM customer UNION ALL
        |  SELECT 'supplier', count(*) FROM supplier UNION ALL
        |  SELECT 'part', count(*) FROM part UNION ALL
        |  SELECT 'orders', count(*) FROM orders UNION ALL
        |  SELECT 'lineitem', count(*) FROM lineitem) t
        |ORDER BY tbl""".stripMargin,
    "q35_count_distinct" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
        |  count(DISTINCT l_suppkey) AS n_supps
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q36_approx_count_distinct" ->
      """WITH h AS (
        |  SELECT l_returnflag,
        |    CAST('0x' || substr(md5(CAST(l_partkey AS VARCHAR)), 1, 15)
        |      AS BIGINT) AS h
        |  FROM lineitem),
        |b AS (
        |  SELECT l_returnflag, h // 4503599627370496 AS bucket,
        |    min(h % 4503599627370496 + 1) AS mn
        |  FROM h GROUP BY 1, 2),
        |est AS (
        |  SELECT l_returnflag,
        |    CAST(COUNT(*) * COUNT(*) AS DOUBLE) * CAST(4503599627370496 AS DOUBLE)
        |      / CAST(SUM(mn) AS DOUBLE) - CAST(COUNT(*) AS DOUBLE) AS approx_parts
        |  FROM b GROUP BY 1),
        |ex AS (
        |  SELECT l_returnflag, CAST(count(DISTINCT l_partkey) AS BIGINT)
        |    AS n_parts
        |  FROM lineitem GROUP BY 1)
        |SELECT est.l_returnflag, approx_parts, n_parts
        |FROM est JOIN ex USING (l_returnflag)
        |ORDER BY l_returnflag""".stripMargin,
    "q37_unpivot" ->
      """WITH src AS (SELECT l_orderkey, l_linenumber, l_quantity,
        |    l_extendedprice, l_discount, l_tax
        |  FROM lineitem WHERE l_orderkey < 100)
        |SELECT l_orderkey, l_linenumber, measure, value FROM (
        |  SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure,
        |    l_quantity AS value FROM src
        |  UNION ALL SELECT l_orderkey, l_linenumber, 'l_extendedprice',
        |    l_extendedprice FROM src
        |  UNION ALL SELECT l_orderkey, l_linenumber, 'l_discount',
        |    l_discount FROM src
        |  UNION ALL SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM src)
        |ORDER BY l_orderkey, l_linenumber, measure""".stripMargin,
    "q39_string_agg" ->
      """SELECT n_regionkey, string_agg(n_name, ',' ORDER BY n_name) AS nations
        |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin,
    "q59_null_safe_join" ->
      """WITH base AS (SELECT event_id,
        |    CAST(nullif(floor(value * 10) % 10, 0) AS BIGINT) AS k
        |  FROM events WHERE event_id < 200)
        |SELECT a.k, count(*) AS n_pairs
        |FROM base a JOIN base b
        |  ON a.k IS NOT DISTINCT FROM b.k AND a.event_id < b.event_id
        |GROUP BY a.k ORDER BY a.k NULLS FIRST""".stripMargin,
    "q58_exact_corr" ->
      """WITH m AS (SELECT l_returnflag, count(*) AS n,
        |    sum(CAST(l_quantity AS DECIMAL(18,6))) AS sx,
        |    sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS sy,
        |    sum(CAST(l_quantity AS DECIMAL(19,6)) * CAST(l_extendedprice AS DECIMAL(19,6))) AS sxy,
        |    sum(CAST(l_quantity AS DECIMAL(19,6)) * CAST(l_quantity AS DECIMAL(19,6))) AS sxx,
        |    sum(CAST(l_extendedprice AS DECIMAL(19,6)) * CAST(l_extendedprice AS DECIMAL(19,6))) AS syy
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, n,
        |  CAST(floor(
        |    (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
        |    (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
        |     sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
        |    * 1e9) AS BIGINT) AS corr_fp9
        |FROM m ORDER BY l_returnflag""".stripMargin,
    "q38_ntile_percentrank" ->
      """SELECT c_nationkey, c_custkey, c_acctbal, quartile, pct_rank, cume
        |FROM (
        |  SELECT c_nationkey, c_custkey, c_acctbal,
        |    CAST(ntile(4) OVER w AS BIGINT) AS quartile,
        |    percent_rank() OVER w AS pct_rank,
        |    cume_dist() OVER w AS cume
        |  FROM customer
        |  WINDOW w AS (PARTITION BY c_nationkey
        |               ORDER BY c_acctbal ASC, c_custkey ASC))
        |WHERE c_custkey % 10 = 0
        |ORDER BY c_nationkey, c_custkey""".stripMargin
  )
}
