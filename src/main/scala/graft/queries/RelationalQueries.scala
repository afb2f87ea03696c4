package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** Relational analytics over the TPC-H-ish tables — the aggregate / join /
  * window / top-K surface the engine inherits from Spark (SURVEY.md §2.2).
  *
  * Float discipline for oracle parity: every SUM over a double column is
  * computed in DECIMAL (exact, order-independent) and cast back to DOUBLE —
  * double-sum results depend on reduction order and would hash-mismatch
  * DuckDB.
  */
object RelationalQueries {

  private def decSum(c: String): org.apache.spark.sql.Column =
    sum(col(c).cast("decimal(18,2)"))

  /** The MV's PARTIAL-aggregate rows over a fact slice: per (nation,
    * priority) key — count, DECIMAL revenue sum (exact ⇒ the merge is
    * associative and order-free), max price. What the staged "yesterday"
    * MV stores and what a delta batch computes; [[mvMergeFinalize]] adds
    * them. Used by `rel_mv_incremental` and its streaming twin.
    */
  private[graft] def mvPartials(s: SparkSession, dir: String,
      orders: DataFrame): DataFrame =
    mvPartialsFrom(orders, custNation(s, dir), broadcastFact = false)

  /** The trimmed custkey→n_name dimension the MV's enrichment needs —
    * 2 columns, computed once. The streaming twin stages it (a
    * localCheckpoint) so micro-batches never re-shuffle or re-scan the
    * full customer table.
    */
  private[graft] def custNation(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .join(broadcast(Tables.nation(s, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name"))

  /** Partials over an arbitrary fact slice against a pre-built
    * custkey→n_name map. `broadcastFact = true` is the micro-batch lane:
    * the (small) delta becomes the broadcast build side, so the
    * dimension is streamed without an exchange — per-batch cost tracks
    * the batch, not the customer table.
    */
  private[graft] def mvPartialsFrom(orders: DataFrame, custNation: DataFrame,
      broadcastFact: Boolean): DataFrame =
    (if (broadcastFact) broadcast(orders) else orders)
      .join(custNation, col("o_custkey") === col("c_custkey"))
      .groupBy("n_name", "o_orderpriority")
      .agg(count(lit(1)).as("n_orders"),
        decSum("o_totalprice").as("rev_dec"),
        max("o_totalprice").as("max_price"))

  /** Merge two partial-MV tables INTO partial form (algebraic: counts
    * and decimal sums add, max takes greatest — Spark's `greatest` skips
    * NULLs, so a key present on one side only keeps its value). The
    * merge is |keys|-sized — independent of fact volume — and
    * associative/commutative (exact decimal arithmetic), which is what
    * lets the streaming twin fold batch after batch into the same state.
    */
  private[graft] def mvMergePartials(a: DataFrame, b: DataFrame): DataFrame = {
    val h = a.select(col("n_name"), col("o_orderpriority"),
      col("n_orders").as("h_n"), col("rev_dec").as("h_rev"),
      col("max_price").as("h_max"))
    val d = b.select(col("n_name"), col("o_orderpriority"),
      col("n_orders").as("d_n"), col("rev_dec").as("d_rev"),
      col("max_price").as("d_max"))
    h.join(d, Seq("n_name", "o_orderpriority"), "full_outer")
      .select(col("n_name"), col("o_orderpriority"),
        (coalesce(col("h_n"), lit(0L)) + coalesce(col("d_n"), lit(0L)))
          .as("n_orders"),
        (coalesce(col("h_rev"), lit(0).cast("decimal(18,2)")) +
          coalesce(col("d_rev"), lit(0).cast("decimal(18,2)")))
          .cast("decimal(28,2)").as("rev_dec"),
        greatest(col("h_max"), col("d_max")).as("max_price"))
  }

  /** Derive the MV's serving columns from merged partials (avg is
    * DERIVED from the partials, never stored — the algebraic-aggregate
    * rule that makes the view mergeable).
    */
  private[graft] def mvFinalize(partials: DataFrame): DataFrame =
    partials.select(col("n_name"), col("o_orderpriority"), col("n_orders"),
      col("rev_dec").cast("double").as("revenue"),
      (col("rev_dec").cast("double") / col("n_orders")).as("avg_price"),
      col("max_price"))

  private[graft] def mvMergeFinalize(hist: DataFrame,
      delta: DataFrame): DataFrame =
    mvFinalize(mvMergePartials(hist, delta))

  /** Shared by `rel_mv_incremental` and its streaming twin: the oracle
    * recomputes the view from the FULL fact table — hash equality proves
    * the partial-aggregate merge ≡ recompute.
    */
  private[queries] lazy val MvRecomputeOracle: String = """
    SELECT n_name, o_orderpriority, count(*) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / count(*)
             AS avg_price,
           max(o_totalprice) AS max_price
    FROM orders JOIN customer ON o_custkey = c_custkey
                JOIN nation ON c_nationkey = n_nationkey
    GROUP BY 1, 2 ORDER BY 1, 2"""

  val all: Seq[QueryDef] = Seq(

    // TPC-H Q1-shaped pricing summary: the canonical partial-agg +
    // final-agg (map-side combine) plan; filter pushed to parquet.
    QueryDef("rel_pricing_summary",
      (s, dir) => Tables.lineitem(s, dir)
        .where(col("l_shipdate") <= expr("TIMESTAMP_NTZ '2000-06-30 00:00:00'"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          decSum("l_quantity").cast("double").as("sum_qty"),
          decSum("l_extendedprice").cast("double").as("sum_base_price"),
          sum(col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
            .cast("double").as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus"),
      Some("""
        SELECT l_returnflag, l_linestatus,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
                        (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
                 AS sum_disc_price,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2000-06-30 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus""")),

    // Star join: orders ⋈ customer ⋈ nation. nation (25 rows) broadcasts;
    // customer is small enough to broadcast at any SF of this dataset —
    // at true scale AQE decides; the explicit hint keeps the small side
    // off the shuffle path.
    QueryDef("rel_nation_revenue",
      (s, dir) => Tables.orders(s, dir)
        .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(count(lit(1)).as("n_orders"),
          decSum("o_totalprice").cast("double").as("revenue"))
        .orderBy("n_name"),
      Some("""
        SELECT n_name, count(*) AS n_orders,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        FROM orders JOIN customer ON o_custkey = c_custkey
                    JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name ORDER BY n_name""")),

    // Global top-K (TakeOrderedAndProject — no full sort at scale).
    QueryDef("rel_topk_orders",
      (s, dir) => Tables.orders(s, dir)
        .select("o_orderkey", "o_totalprice", "o_orderpriority")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10),
      Some("""
        SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""")),

    // Ranking window: per-segment top-3 customers by balance.
    QueryDef("rel_window_rank",
      (s, dir) => {
        val w = Window.partitionBy(col("c_mktsegment"))
          .orderBy(col("c_acctbal").desc, col("c_custkey"))
        Tables.customer(s, dir)
          .withColumn("rn", row_number().over(w))
          .where(col("rn") <= 3)
          .select("c_mktsegment", "rn", "c_custkey", "c_acctbal")
          .orderBy("c_mktsegment", "rn")
      },
      Some("""
        SELECT c_mktsegment, rn, c_custkey, c_acctbal
        FROM (SELECT c_mktsegment, c_custkey, c_acctbal,
                     row_number() OVER (PARTITION BY c_mktsegment
                                        ORDER BY c_acctbal DESC, c_custkey) AS rn
              FROM customer)
        WHERE rn <= 3 ORDER BY c_mktsegment, rn""")),

    // Rollup (hierarchical grouping sets) with subtotal + grand-total rows.
    QueryDef("rel_rollup",
      (s, dir) => Tables.lineitem(s, dir)
        .rollup("l_returnflag", "l_linestatus")
        .agg(decSum("l_quantity").cast("double").as("sum_qty"),
          count(lit(1)).as("n"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
          col("sum_qty"), col("n"))
        .orderBy("rf", "ls"),
      Some("""
        SELECT coalesce(l_returnflag, 'ALL') AS rf,
               coalesce(l_linestatus, 'ALL') AS ls,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
               count(*) AS n
        FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        ORDER BY rf, ls""")),

    // Full CUBE over the two status dimensions (grouping-sets family;
    // rollup's bigger sibling — all 4 grouping combinations).
    QueryDef("rel_cube",
      (s, dir) => Tables.lineitem(s, dir)
        .cube("l_returnflag", "l_linestatus")
        .agg(decSum("l_quantity").cast("double").as("sum_qty"),
          count(lit(1)).as("n"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
          col("sum_qty"), col("n"))
        .orderBy("rf", "ls"),
      Some("""
        SELECT coalesce(l_returnflag, 'ALL') AS rf,
               coalesce(l_linestatus, 'ALL') AS ls,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
               count(*) AS n
        FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
        ORDER BY rf, ls""")),

    // Set intersection: nations having both customers and suppliers.
    QueryDef("rel_intersect",
      (s, dir) => Tables.customer(s, dir).select(col("c_nationkey").as("nationkey"))
        .intersect(Tables.supplier(s, dir).select(col("s_nationkey").as("nationkey")))
        .orderBy("nationkey"),
      Some("""
        SELECT c_nationkey AS nationkey FROM customer
        INTERSECT SELECT s_nationkey AS nationkey FROM supplier
        ORDER BY nationkey""")),

    // Pivot: order counts by priority x status (Spark's pivot relational
    // operator; the oracle is the conditional-aggregation expansion).
    QueryDef("rel_pivot",
      (s, dir) => Tables.orders(s, dir)
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy("o_orderpriority"),
      Some("""
        SELECT o_orderpriority,
               CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS "F",
               CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS "O",
               CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS "P"
        FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // Set difference: customers that never placed an URGENT order.
    QueryDef("rel_except",
      (s, dir) => Tables.customer(s, dir).select(col("c_custkey"))
        .except(Tables.orders(s, dir)
          .where(col("o_orderpriority") === "1-URGENT")
          .select(col("o_custkey").as("c_custkey")))
        .orderBy("c_custkey"),
      Some("""
        SELECT c_custkey FROM customer
        EXCEPT SELECT o_custkey AS c_custkey FROM orders
                WHERE o_orderpriority = '1-URGENT'
        ORDER BY c_custkey""")),

    // Semi-join (EXISTS): customers that placed at least one urgent order.
    QueryDef("rel_semi_join",
      (s, dir) => Tables.customer(s, dir)
        .join(Tables.orders(s, dir)
          .where(col("o_orderpriority") === "1-URGENT")
          .select(col("o_custkey")),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_customers"))
        .orderBy("c_mktsegment"),
      Some("""
        SELECT c_mktsegment, count(*) AS n_customers
        FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
        GROUP BY c_mktsegment ORDER BY c_mktsegment""")),

    // Runtime Bloom-filter semi-join reduction — the shuffle-join
    // counterpart of broadcast pruning for the 100 TB case where the
    // filtered dim side is still too big to broadcast: Spark's
    // InjectRuntimeFilter builds a bloom filter from the selective side
    // and applies `might_contain` on the fact side's join key BEFORE the
    // fact shuffle, so non-matching lineitem rows never cross the
    // network. Broadcast is disabled inside the query (that's the
    // scenario) and restored after; PlanShapeSpec pins the injected
    // filter. The filter is semantics-free (false positives only shuffle
    // a few extra rows), so the oracle is the plain join.
    QueryDef("rel_bloom_pruned_join",
      (s, dir) => {
        // Spark injects the bloom filter only when the creation side can
        // NOT broadcast (otherwise a broadcast join wins anyway) and the
        // application side is big enough — i.e. exactly the 100 TB
        // regime. Locally we simulate that regime at PLAN time: set the
        // two confs, force the (memoized) physical plan, restore. The
        // returned DataFrame executes the already-optimized plan; later
        // queries see untouched conf.
        val kBroadcast = "spark.sql.autoBroadcastJoinThreshold"
        val kAppSide =
          "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
        val prevBroadcast = s.conf.get(kBroadcast)
        val prevAppSide = s.conf.get(kAppSide)
        s.conf.set(kBroadcast, "-1")
        s.conf.set(kAppSide, "0")
        try {
          val df = Tables.lineitem(s, dir)
            .join(Tables.orders(s, dir)
              .where(col("o_orderpriority") === "1-URGENT"),
              col("l_orderkey") === col("o_orderkey"))
            .groupBy(col("o_orderstatus").as("status"))
            .agg(count(lit(1)).as("n"),
              sum(col("l_quantity").cast("decimal(18,2)")).cast("double")
                .as("sum_qty"))
            .orderBy("status")
          df.queryExecution.executedPlan // force optimization under the confs
          df
        } finally {
          s.conf.set(kBroadcast, prevBroadcast)
          s.conf.set(kAppSide, prevAppSide)
        }
      },
      Some("""
        SELECT o_orderstatus AS status, count(*) AS n,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE o_orderpriority = '1-URGENT'
        GROUP BY 1 ORDER BY status""")),

    // Arbitrary GROUPING SETS (the general form rollup/cube specialize) +
    // GROUPING() disambiguation of "grouped-out" vs literal values — one
    // pass over orders expands to the three aggregation grains.
    QueryDef("rel_grouping_sets",
      (s, dir) => {
        Tables.orders(s, dir).createOrReplaceTempView("orders_gs")
        s.sql("""
          SELECT coalesce(o_orderpriority, 'ALL') AS pri,
                 coalesce(o_orderstatus, 'ALL') AS st,
                 CAST(grouping(o_orderpriority) AS BIGINT) AS g_pri,
                 CAST(grouping(o_orderstatus) AS BIGINT) AS g_st,
                 count(*) AS n,
                 CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
          FROM orders_gs
          GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
          ORDER BY pri, st""")
      },
      Some("""
        SELECT coalesce(o_orderpriority, 'ALL') AS pri,
               coalesce(o_orderstatus, 'ALL') AS st,
               CAST(grouping(o_orderpriority) AS BIGINT) AS g_pri,
               CAST(grouping(o_orderstatus) AS BIGINT) AS g_st,
               count(*) AS n,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        FROM orders
        GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
        ORDER BY pri, st""")),

    // TPC-H Q3-shaped shipping priority: revenue of unshipped orders for
    // one market segment. Customer filter broadcasts onto orders; the only
    // wide exchange is the orders⋈lineitem join + the per-order aggregate.
    // Revenue in exact DECIMAL (price·(1−disc) has ≤4 decimal places);
    // ONE double cast at the end. Top-10 ties break on the order key.
    QueryDef("rel_shipping_priority",
      (s, dir) => {
        val cutoff = to_timestamp(lit("1998-01-01"))
        val cust = Tables.customer(s, dir)
          .where(col("c_mktsegment") === "BUILDING")
          .select(col("c_custkey"))
        val ord = Tables.orders(s, dir)
          .where(col("o_orderdate") < cutoff)
          .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
          .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        val li = Tables.lineitem(s, dir)
          .where(col("l_shipdate") > cutoff)
          .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
        li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("l_orderkey").as("okey"),
            unix_millis(col("o_orderdate").cast("timestamp")).as("order_ts_ms"),
            col("o_orderpriority").as("priority"))
          .agg(sum(col("l_extendedprice").cast("decimal(18,2)") *
              (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
            .cast("double").as("revenue"))
          .orderBy(col("revenue").desc, col("okey"))
          .limit(10)
      },
      Some("""
        SELECT l_orderkey AS okey, epoch_ms(o_orderdate) AS order_ts_ms,
               o_orderpriority AS priority,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
                        (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
                    AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-01-01'
          AND l_shipdate > TIMESTAMP '1998-01-01'
        GROUP BY 1, 2, 3
        ORDER BY revenue DESC, okey LIMIT 10""")),

    // Distribution window functions in one pass: quartile bucket,
    // cumulative distribution, percent rank per priority class. The order
    // key includes the unique o_orderkey, so every row is its own peer
    // group and all three are exact integer-position ratios.
    QueryDef("rel_window_stats",
      (s, dir) => {
        val w = Window.partitionBy(col("priority"))
          .orderBy(col("o_totalprice"), col("okey"))
        Tables.orders(s, dir)
          .select(col("o_orderkey").as("okey"),
            col("o_orderpriority").as("priority"), col("o_totalprice"))
          .withColumn("quartile", ntile(4).over(w))
          .withColumn("cume", cume_dist().over(w))
          .withColumn("pct_rank", percent_rank().over(w))
          .orderBy("priority", "okey")
      },
      Some("""
        SELECT o_orderkey AS okey, o_orderpriority AS priority, o_totalprice,
               ntile(4) OVER w AS quartile,
               cume_dist() OVER w AS cume,
               percent_rank() OVER w AS pct_rank
        FROM orders
        WINDOW w AS (PARTITION BY o_orderpriority
                     ORDER BY o_totalprice, o_orderkey)
        ORDER BY priority, okey""")),

    // Full-outer join coverage: per-user click vs purchase counts with
    // both one-sided populations preserved — the join type the salted
    // SkewJoin utility correctly REFUSES (its build-side replication is
    // unsound for right-preserving types), shown here on the plain path.
    QueryDef("rel_full_outer",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val clicks = ev.where(col("event_type") === "click")
          .groupBy("user_id").agg(count(lit(1)).as("n_clicks"))
        val purchases = ev.where(col("event_type") === "purchase")
          .groupBy("user_id").agg(count(lit(1)).as("n_purchases"))
        clicks.join(purchases, Seq("user_id"), "full_outer")
          .select(col("user_id"),
            coalesce(col("n_clicks"), lit(0L)).as("n_clicks"),
            coalesce(col("n_purchases"), lit(0L)).as("n_purchases"))
          .withColumn("segment",
            when(col("n_clicks") > 0 && col("n_purchases") > 0, "both")
              .when(col("n_clicks") > 0, "click_only").otherwise("purchase_only"))
          .orderBy("user_id")
      },
      Some("""
        WITH c AS (SELECT user_id, count(*) AS n_clicks FROM events
                   WHERE event_type = 'click' GROUP BY 1),
        p AS (SELECT user_id, count(*) AS n_purchases FROM events
              WHERE event_type = 'purchase' GROUP BY 1)
        SELECT user_id,
               coalesce(n_clicks, 0) AS n_clicks,
               coalesce(n_purchases, 0) AS n_purchases,
               CASE WHEN coalesce(n_clicks, 0) > 0
                     AND coalesce(n_purchases, 0) > 0 THEN 'both'
                    WHEN coalesce(n_clicks, 0) > 0 THEN 'click_only'
                    ELSE 'purchase_only' END AS segment
        FROM c FULL JOIN p USING (user_id) ORDER BY user_id""")),

    // TPC-H Q17-shaped small-quantity revenue: correlated "below 20% of
    // the part's average quantity" rewritten join-first — the selective
    // part-dim filter broadcasts and restricts lineitem BEFORE the
    // per-part average is computed, so the aggregate runs over the
    // selected slice only (at 100 TB the unrestricted per-part agg would
    // be a full-table shuffle for a 0.1% answer). The threshold compare
    // is division-free: qty < sum/(5*cnt) ⟺ qty*5*cnt < sum, all in
    // exact DECIMAL/BIGINT.
    QueryDef("rel_small_qty_loss",
      (s, dir) => {
        val keys = Tables.part(s, dir)
          .where(col("p_brand") === "Brand#4" && col("p_size") <= 10)
          .select(col("p_partkey"))
        val sel = Tables.lineitem(s, dir)
          .join(broadcast(keys), col("l_partkey") === col("p_partkey"))
          .select(col("l_partkey"),
            col("l_quantity").cast("decimal(18,2)").as("q"),
            col("l_extendedprice").cast("decimal(18,2)").as("ep"))
        val stats = sel.groupBy("l_partkey")
          .agg(sum(col("q")).as("sq"), count(lit(1)).as("cq"))
        sel.join(stats, "l_partkey")
          .where(col("q") * lit(5) * col("cq") < col("sq"))
          .agg(count(lit(1)).as("n_small"),
            coalesce(sum(col("ep")).cast("double"), lit(0.0)).as("revenue_loss"))
      },
      Some("""
        WITH sel AS (
          SELECT l_partkey, CAST(l_quantity AS DECIMAL(18,2)) AS q,
                 CAST(l_extendedprice AS DECIMAL(18,2)) AS ep
          FROM lineitem
          WHERE l_partkey IN (SELECT p_partkey FROM part
                              WHERE p_brand = 'Brand#4' AND p_size <= 10)),
        stats AS (SELECT l_partkey, sum(q) AS sq, count(*) AS cq
                  FROM sel GROUP BY 1)
        SELECT count(*) AS n_small,
               coalesce(CAST(sum(ep) AS DOUBLE), 0.0) AS revenue_loss
        FROM sel JOIN stats USING (l_partkey)
        WHERE q * 5 * cq < sq""")),

    // TPC-H Q8-shaped market share: one supplier nation's revenue share
    // of a region's market per order year. Dim chain region→nation→
    // customer broadcasts down to a custkey set; supplier→nation
    // broadcasts a (suppkey, is_target) flag; the only wide operations
    // are the two fact joins on their natural keys. Volumes are exact
    // DECIMAL sums; the share divides the two already-identical doubles.
    QueryDef("rel_market_share",
      (s, dir) => {
        val mktNations = Tables.nation(s, dir)
          .join(broadcast(Tables.region(s, dir).where(col("r_name") === "ASIA")),
            col("n_regionkey") === col("r_regionkey"))
          .select(col("n_nationkey"))
        val cust = Tables.customer(s, dir)
          .join(broadcast(mktNations), col("c_nationkey") === col("n_nationkey"))
          .select(col("c_custkey"))
        val ord = Tables.orders(s, dir)
          .join(cust, col("o_custkey") === col("c_custkey"))
          .select(col("o_orderkey"), year(col("o_orderdate")).as("yr"))
        val supFlag = Tables.supplier(s, dir)
          .join(broadcast(Tables.nation(s, dir)
            .select(col("n_nationkey"), col("n_name"))),
            col("s_nationkey") === col("n_nationkey"))
          .select(col("s_suppkey"), (col("n_name") === "NATION_2").as("is_t"))
        val v = col("l_extendedprice").cast("decimal(18,2)") *
          (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)"))
        Tables.lineitem(s, dir)
          .select(col("l_orderkey"), col("l_suppkey"), v.as("v"))
          .join(ord, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(supFlag), col("l_suppkey") === col("s_suppkey"))
          .groupBy("yr")
          .agg(sum(col("v")).cast("double").as("mkt_volume"),
            coalesce(sum(when(col("is_t"), col("v"))).cast("double"), lit(0.0))
              .as("target_volume"))
          .withColumn("share", col("target_volume") / col("mkt_volume"))
          .orderBy("yr")
      },
      Some("""
        WITH mkt AS (
          SELECT o_orderkey, year(o_orderdate) AS yr
          FROM orders
          JOIN customer ON o_custkey = c_custkey
          JOIN nation ON c_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey
          WHERE r_name = 'ASIA'),
        vol AS (
          SELECT mkt.yr,
                 CAST(l_extendedprice AS DECIMAL(18,2)) *
                   (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS v,
                 (n.n_name = 'NATION_2') AS is_t
          FROM lineitem
          JOIN mkt ON l_orderkey = mkt.o_orderkey
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation n ON s_nationkey = n.n_nationkey)
        SELECT yr, CAST(sum(v) AS DOUBLE) AS mkt_volume,
               coalesce(CAST(sum(CASE WHEN is_t THEN v END) AS DOUBLE), 0.0)
                 AS target_volume,
               coalesce(CAST(sum(CASE WHEN is_t THEN v END) AS DOUBLE), 0.0)
                 / CAST(sum(v) AS DOUBLE) AS share
        FROM vol GROUP BY 1 ORDER BY yr""")),

    // ---- SCD2 dimension build (slowly-changing-dimension merge) ----
    // The warehouse-standard versioned-dimension construction: per
    // customer, each CHANGE of order priority (in (o_orderdate,
    // o_orderkey) order) opens a version row [valid_from, valid_to), the
    // open version has valid_to NULL. Two windows over one
    // customer-partitioned sort — the per-key state is a lag cell, so the
    // build is one shuffle on the dimension key at any history size;
    // consecutive same-value runs collapse (the MERGE-on-change
    // semantics), never one row per source event.
    QueryDef("rel_scd2_merge",
      (s, dir) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("ms"), col("o_orderkey"))
        val o = Tables.orders(s, dir).select(
          col("o_custkey"), col("o_orderkey"), col("o_orderpriority"),
          unix_millis(col("o_orderdate").cast("timestamp")).as("ms"))
        val changes = o.withColumn("prev", lag(col("o_orderpriority"), 1).over(w))
          .where(col("prev").isNull || col("prev") =!= col("o_orderpriority"))
        changes
          .withColumn("version", row_number().over(w))
          .withColumn("valid_to", lead(col("ms"), 1).over(w))
          .select(col("o_custkey").as("custkey"), col("version"),
            col("o_orderpriority").as("priority"),
            col("ms").as("valid_from"), col("valid_to"),
            col("valid_to").isNull.cast("int").as("is_current"))
          .orderBy("custkey", "version")
      },
      Some("""
        WITH o AS (SELECT o_custkey, o_orderkey, o_orderpriority,
                     epoch_ms(o_orderdate) AS ms FROM orders),
        m AS (SELECT *, lag(o_orderpriority) OVER w AS prev FROM o
              WINDOW w AS (PARTITION BY o_custkey ORDER BY ms, o_orderkey)),
        c AS (SELECT * FROM m
              WHERE prev IS NULL OR prev <> o_orderpriority),
        v AS (SELECT o_custkey AS custkey, o_orderpriority AS priority,
                ms AS valid_from,
                row_number() OVER w2 AS version,
                lead(ms) OVER w2 AS valid_to
              FROM c WINDOW w2 AS (PARTITION BY o_custkey
                                   ORDER BY ms, o_orderkey))
        SELECT custkey, version, priority, valid_from, valid_to,
               CAST(valid_to IS NULL AS INT) AS is_current
        FROM v ORDER BY custkey, version""")),

    // ---- incremental materialized-view maintenance (merge ≡ recompute) ----
    // The lakehouse MV pattern: the (nation, priority) revenue rollup is
    // maintained from PARTIAL aggregates — history's partials are STAGED
    // (yesterday's MV, the production input), today's delta batch
    // aggregates alone, and the refresh is one |keys|-sized full-outer
    // merge of algebraic partials (count/decimal-sum add, max greatest;
    // avg derives from the merged partials — never stored). History
    // facts are NEVER rescanned: refresh cost = delta scan + |keys|
    // merge at any history size. The oracle recomputes the view from
    // the FULL fact table — hash equality proves merge ≡ recompute, the
    // same discipline as gr_components_incremental.
    QueryDef("rel_mv_incremental",
      (s, dir) => {
        val hist = Staging.parquetMemo(s, s"$dir#rel_mv_hist")(
          mvPartials(s, dir,
            Tables.orders(s, dir).where(pmod(col("o_orderkey"), lit(10L)) =!= 0)))
        val delta = mvPartials(s, dir,
          Tables.orders(s, dir).where(pmod(col("o_orderkey"), lit(10L)) === 0))
        mvMergeFinalize(hist, delta).orderBy("n_name", "o_orderpriority")
      },
      Some(MvRecomputeOracle)),

    // ---- TPC-H Q21 shape: sole-late-supplier blame report ----
    // Suppliers who were the ONLY late shipper (ship lag > 60 days) on a
    // multi-supplier order. The textbook form is a correlated EXISTS +
    // NOT EXISTS pair — quadratic probing at scale. The engine runs the
    // AGGREGATE REWRITE instead: one per-order rollup (distinct suppliers,
    // distinct late suppliers — map-side combined) joined back to the
    // late lines, so the whole query is two hash shuffles on l_orderkey
    // plus a broadcast of the supplier dim. The ORACLE keeps the
    // correlated EXISTS form — hash equality PROVES the rewrite.
    QueryDef("rel_supplier_wait",
      (s, dir) => {
        val late = col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS")
        val l = Tables.lineitem(s, dir)
          .join(Tables.orders(s, dir),
            col("l_orderkey") === col("o_orderkey"))
          .select(col("l_orderkey"), col("l_suppkey"), late.as("late"))
        val perOrder = l.groupBy("l_orderkey")
          .agg(countDistinct(col("l_suppkey")).as("n_supp"),
            countDistinct(when(col("late"), col("l_suppkey"))).as("n_late_supp"))
        val blamed = l.where(col("late"))
          .join(perOrder.where(col("n_supp") >= 2 && col("n_late_supp") === 1),
            "l_orderkey")
          .groupBy("l_suppkey")
          .agg(count(lit(1)).as("numwait"))
        blamed
          .join(broadcast(Tables.supplier(s, dir)),
            col("l_suppkey") === col("s_suppkey"))
          .select(col("s_name"), col("numwait"))
          .orderBy(col("numwait").desc, col("s_name"))
          .limit(20)
      },
      Some("""
        WITH li AS (SELECT l_orderkey, l_suppkey, l_shipdate FROM lineitem),
        l1 AS (SELECT li.l_orderkey, li.l_suppkey FROM li
               JOIN orders ON l_orderkey = o_orderkey
               WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY)
        SELECT s_name, count(*) AS numwait
        FROM l1 JOIN supplier ON s_suppkey = l1.l_suppkey
        WHERE EXISTS (SELECT 1 FROM li l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM l1 l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey)
        GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 20""")),

    // ---- TPC-H Q13 shape: order-count distribution over ALL customers ----
    // How many customers placed 0, 1, 2, … qualifying orders — the
    // group-by-of-a-group-by shape, with the zero bucket forced by an
    // outer join. Scale order matters: the fact PRE-AGGREGATES to one
    // row per customer key (map-side combined) BEFORE touching the dim,
    // so the custkey join moves |customers| rows, not |orders|; the
    // second aggregate's key space is the max order count — tiny.
    QueryDef("rel_order_dist",
      (s, dir) => {
        val perCust = Tables.orders(s, dir)
          .where(not(col("o_orderpriority").startsWith("1")))
          .groupBy(col("o_custkey"))
          .agg(count(lit(1)).as("n"))
        Tables.customer(s, dir)
          .join(perCust, col("c_custkey") === col("o_custkey"), "left_outer")
          .select(coalesce(col("n"), lit(0L)).as("c_count"))
          .groupBy("c_count")
          .agg(count(lit(1)).as("custdist"))
          .orderBy(col("custdist").desc, col("c_count").desc)
      },
      Some("""
        WITH pc AS (SELECT o_custkey, count(*) AS n FROM orders
                    WHERE o_orderpriority NOT LIKE '1%' GROUP BY 1)
        SELECT coalesce(n, 0) AS c_count, count(*) AS custdist
        FROM customer LEFT JOIN pc ON c_custkey = o_custkey
        GROUP BY 1 ORDER BY custdist DESC, c_count DESC""")),

    // ---- TPC-H Q2 shape: groupwise-min with join-back ----
    // For each part, the supplier(s) selling it at the part's minimum
    // price. The groupwise-min pattern — aggregate to one min row per
    // key, equality-join the fact back against its own aggregate — NOT
    // a per-key window sort: both the min aggregate and the join are
    // map-side-combinable / co-partitioned on l_partkey (AQE broadcasts
    // the |parts|-row min table when small), where a row_number window
    // would sort the whole fact. Equality on the raw stored double is
    // exact — no arithmetic touches the compared value.
    QueryDef("rel_cheapest_supplier",
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
          .select(col("l_partkey"), col("l_suppkey"), col("l_extendedprice"))
        val minP = li.groupBy("l_partkey")
          .agg(min(col("l_extendedprice")).as("min_price"))
        li.join(minP, "l_partkey")
          .where(col("l_extendedprice") === col("min_price"))
          .join(broadcast(Tables.supplier(s, dir)),
            col("l_suppkey") === col("s_suppkey"))
          .select(col("l_partkey").as("partkey"),
            col("l_suppkey").as("suppkey"), col("s_name"), col("min_price"))
          .distinct()
          .orderBy("partkey", "suppkey")
      },
      Some("""
        WITH mp AS (SELECT l_partkey, min(l_extendedprice) AS min_price
                    FROM lineitem GROUP BY 1)
        SELECT DISTINCT l_partkey AS partkey, l_suppkey AS suppkey,
               s_name, min_price
        FROM lineitem JOIN mp USING (l_partkey)
        JOIN supplier ON l_suppkey = s_suppkey
        WHERE l_extendedprice = min_price
        ORDER BY partkey, suppkey""")),

    // ---- TPC-H Q11 shape: global-threshold HAVING ----
    // Suppliers whose revenue exceeds a fraction of TOTAL revenue. The
    // global scalar is a 1-row aggregate over the per-supplier table,
    // broadcast back with a crossJoin — NO empty-frame window, so no
    // single-partition funnel even when suppliers scale with the corpus
    // (the Curation.scala corpus-total pattern). The per-supplier
    // aggregate is computed once and feeds both the total and the
    // threshold compare; the fact is scanned ONCE.
    // The threshold compare runs in exact integer cents
    // (rev_c*10000 > total_c*5 ⇔ share > 0.05%), so no float boundary
    // ambiguity; only the reported share divides.
    QueryDef("rel_supplier_share",
      (s, dir) => {
        val perSupp = Tables.lineitem(s, dir)
          .groupBy(col("l_suppkey"))
          .agg((decSum("l_extendedprice") * 100).cast("long").as("rev_c"))
        val total = perSupp.agg(sum(col("rev_c")).as("total_c"))
        perSupp
          .crossJoin(broadcast(total))
          .where(col("rev_c") * 10000 > col("total_c") * 5)
          .select(col("l_suppkey").as("suppkey"),
            (col("rev_c").cast("double") / 100).as("revenue"),
            (col("rev_c").cast("double") / col("total_c")).as("share"))
          .orderBy(col("share").desc, col("suppkey"))
      },
      Some("""
        WITH ps AS (SELECT l_suppkey,
                      CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) * 100
                           AS BIGINT) AS rev_c
                    FROM lineitem GROUP BY 1),
        g AS (SELECT sum(rev_c) AS total_c FROM ps)
        SELECT l_suppkey AS suppkey,
               CAST(rev_c AS DOUBLE) / 100 AS revenue,
               CAST(rev_c AS DOUBLE) / total_c AS share
        FROM ps CROSS JOIN g
        WHERE rev_c * 10000 > total_c * 5
        ORDER BY share DESC, suppkey""")),

    // ---- TPC-H Q14 shape: conditional-aggregate ratio ----
    // Promo revenue share per month: ONE pass over the fact (broadcast
    // part dim), both the numerator and denominator as conditional sums
    // in the SAME aggregate — no second scan, no join of two aggregates.
    // Sums in DECIMAL (order-independent); one double division at the end.
    QueryDef("rel_promo_share",
      (s, dir) => {
        val disc = col("l_extendedprice").cast("decimal(18,2)") *
          (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)"))
        Tables.lineitem(s, dir)
          .join(broadcast(Tables.part(s, dir)),
            col("l_partkey") === col("p_partkey"))
          .groupBy((year(col("l_shipdate")) * 100 + month(col("l_shipdate")))
            .as("ym"))
          .agg(
            sum(when(col("p_type") === "PROMO", disc)
              .otherwise(lit(0).cast("decimal(18,2)"))).cast("double")
              .as("promo_rev"),
            sum(disc).cast("double").as("total_rev"))
          .withColumn("promo_share",
            col("promo_rev") / col("total_rev"))
          .orderBy("ym")
      },
      Some("""
        SELECT year(l_shipdate) * 100 + month(l_shipdate) AS ym,
               CAST(sum(CASE WHEN p_type = 'PROMO'
                 THEN CAST(l_extendedprice AS DECIMAL(18,2)) *
                      (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
                 ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS promo_rev,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
                      (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
                 AS DOUBLE) AS total_rev,
               CAST(sum(CASE WHEN p_type = 'PROMO'
                 THEN CAST(l_extendedprice AS DECIMAL(18,2)) *
                      (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
                 ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) /
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
                      (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
                 AS DOUBLE) AS promo_share
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY 1 ORDER BY ym""")),

    // ---- TPC-H Q22 shape: scalar-broadcast filter + anti join ----
    // Rich-but-unengaged customers per nation (above-average balance,
    // never placed an URGENT '1-…' order): the positive-balance average
    // is ONE broadcast row (computed exactly: decimal sum cast to
    // double, one division), the never-ordered test is an ANTI join on
    // custkey — the orders side is filter-pushed to the urgent rows and
    // pre-projected to the key column only, so the anti join shuffles
    // 8 bytes/row, and the final aggregate is nation-keyed (25 groups,
    // map-side combined).
    QueryDef("rel_idle_rich",
      (s, dir) => {
        val cust = Tables.customer(s, dir)
        val avgBal = cust.where(col("c_acctbal") > 0)
          .agg((decSum("c_acctbal").cast("double") / count(lit(1)))
            .as("avg_bal"))
        val urgent = Tables.orders(s, dir)
          .where(col("o_orderpriority").startsWith("1"))
          .select(col("o_custkey"))
        cust.crossJoin(broadcast(avgBal))
          .where(col("c_acctbal") > col("avg_bal"))
          .join(urgent, col("c_custkey") === col("o_custkey"), "left_anti")
          .groupBy(col("c_nationkey").as("nationkey"))
          .agg(count(lit(1)).as("numcust"),
            decSum("c_acctbal").cast("double").as("totacctbal"))
          .orderBy("nationkey")
      },
      Some("""
        WITH a AS (SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                     / count(*) AS avg_bal
                   FROM customer WHERE c_acctbal > 0)
        SELECT c_nationkey AS nationkey, count(*) AS numcust,
               CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
        FROM customer CROSS JOIN a
        WHERE c_acctbal > avg_bal
          AND NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey
                            AND o_orderpriority LIKE '1%')
        GROUP BY 1 ORDER BY nationkey""")),

    // TPC-H Q6 shape — the forecasting-revenue-change aggregate: all
    // three filters (date range, discount band, quantity cap) push to
    // the parquet scan, then ONE map-side-combined global sum. The
    // simplest possible 100 TB plan: scan-local work, a single 1-row
    // exchange. Discounts live on an exact 2-dp grid, so the DECIMAL
    // product is engine-exact.
    QueryDef("rel_revenue_uplift",
      (s, dir) => Tables.lineitem(s, dir)
        .where(col("l_shipdate") >= expr("TIMESTAMP_NTZ '1996-01-01 00:00:00'") &&
          col("l_shipdate") < expr("TIMESTAMP_NTZ '1997-01-01 00:00:00'") &&
          col("l_discount").cast("decimal(18,2)").between(
            lit(0.05).cast("decimal(18,2)"), lit(0.07).cast("decimal(18,2)")) &&
          col("l_quantity") < 24)
        .agg(sum(col("l_extendedprice").cast("decimal(18,2)") *
            col("l_discount").cast("decimal(18,2)")).cast("double")
          .as("revenue_uplift"),
          count(lit(1)).as("n_rows")),
      Some("""
        SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
                        CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE)
                 AS revenue_uplift,
               count(*) AS n_rows
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
          AND CAST(l_discount AS DECIMAL(18,2))
                BETWEEN CAST(0.05 AS DECIMAL(18,2)) AND CAST(0.07 AS DECIMAL(18,2))
          AND l_quantity < 24""")),

    // TPC-H Q7 shape — volume shipping between two nations: revenue by
    // (supplier nation, customer nation, ship year) for the ordered
    // nation pair. Both nation dims and supplier broadcast; the one
    // real shuffle is lineitem⋈orders on the order key, then the
    // (2×2×years)-row aggregate is map-side combined.
    QueryDef("rel_volume_shipping",
      (s, dir) => {
        val n1 = Tables.nation(s, dir)
          .where(col("n_name").isin("NATION_1", "NATION_2"))
        val supp = Tables.supplier(s, dir)
          .join(broadcast(n1.select(col("n_nationkey").as("snk"),
            col("n_name").as("supp_nation"))), col("s_nationkey") === col("snk"))
          .select(col("s_suppkey"), col("supp_nation"))
        val cust = Tables.customer(s, dir)
          .join(broadcast(n1.select(col("n_nationkey").as("cnk"),
            col("n_name").as("cust_nation"))), col("c_nationkey") === col("cnk"))
          .select(col("c_custkey"), col("cust_nation"))
        val ords = Tables.orders(s, dir)
          .join(cust, col("o_custkey") === col("c_custkey"))
          .select(col("o_orderkey"), col("cust_nation"))
        val rev = col("l_extendedprice").cast("decimal(18,2)") *
          (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)"))
        Tables.lineitem(s, dir)
          .where(col("l_shipdate") >= expr("TIMESTAMP_NTZ '1996-01-01 00:00:00'") &&
            col("l_shipdate") < expr("TIMESTAMP_NTZ '1998-01-01 00:00:00'"))
          .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
          .join(ords, col("l_orderkey") === col("o_orderkey"))
          .where(col("supp_nation") =!= col("cust_nation"))
          .groupBy(col("supp_nation"), col("cust_nation"),
            year(col("l_shipdate")).as("l_year"))
          .agg(sum(rev).cast("double").as("revenue"))
          .orderBy("supp_nation", "cust_nation", "l_year")
      },
      Some("""
        SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
               year(l_shipdate) AS l_year,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
                 (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
                 AS DOUBLE) AS revenue
        FROM lineitem
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation sn ON s_nationkey = sn.n_nationkey
          JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN nation cn ON c_nationkey = cn.n_nationkey
        WHERE sn.n_name IN ('NATION_1', 'NATION_2')
          AND cn.n_name IN ('NATION_1', 'NATION_2')
          AND sn.n_name <> cn.n_name
          AND l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
        GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""")),

    // TPC-H Q10 shape — returned-item reporting: per-customer revenue
    // lost to returns in one quarter, top 20. The orders quarter filter
    // pushes to its scan BEFORE the fact join; customer attaches by
    // broadcast AFTER the per-custkey aggregate (aggregate first, then
    // decorate — the corpus-sized join never carries customer columns).
    QueryDef("rel_returned_items",
      (s, dir) => {
        val rev = col("l_extendedprice").cast("decimal(18,2)") *
          (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)"))
        val q = Tables.orders(s, dir)
          .where(col("o_orderdate") >= expr("TIMESTAMP_NTZ '1996-01-01 00:00:00'") &&
            col("o_orderdate") < expr("TIMESTAMP_NTZ '1996-04-01 00:00:00'"))
          .select(col("o_orderkey"), col("o_custkey"))
        val perCust = Tables.lineitem(s, dir)
          .where(col("l_returnflag") === "R")
          .join(q, col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_custkey"))
          .agg(sum(rev).cast("double").as("revenue"))
        perCust
          .join(broadcast(Tables.customer(s, dir)
            .select(col("c_custkey"), col("c_name"), col("c_acctbal"))),
            col("o_custkey") === col("c_custkey"))
          .select(col("c_custkey"), col("c_name"), col("c_acctbal"),
            col("revenue"))
          .orderBy(col("revenue").desc, col("c_custkey")).limit(20)
      },
      Some("""
        WITH pc AS (SELECT o_custkey,
                      CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
                        (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
                        AS DOUBLE) AS revenue
                    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                    WHERE l_returnflag = 'R'
                      AND o_orderdate >= TIMESTAMP '1996-01-01'
                      AND o_orderdate < TIMESTAMP '1996-04-01'
                    GROUP BY 1)
        SELECT c_custkey, c_name, c_acctbal, revenue
        FROM pc JOIN customer ON o_custkey = c_custkey
        ORDER BY revenue DESC, c_custkey LIMIT 20""")),

    // TPC-H Q15 shape — top supplier(s) by quarter revenue: the revenue
    // view aggregates per supplier (one map-side-combined shuffle), the
    // 1-row max broadcasts back, and ties all surface (the Q15 spec's
    // correctness subtlety a LIMIT 1 would get wrong).
    QueryDef("rel_top_supplier",
      (s, dir) => {
        val rev = col("l_extendedprice").cast("decimal(18,2)") *
          (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)"))
        val perSupp = Tables.lineitem(s, dir)
          .where(col("l_shipdate") >= expr("TIMESTAMP_NTZ '1996-01-01 00:00:00'") &&
            col("l_shipdate") < expr("TIMESTAMP_NTZ '1996-04-01 00:00:00'"))
          .groupBy(col("l_suppkey"))
          .agg(sum(rev).cast("double").as("total_revenue"))
        val best = perSupp.agg(max(col("total_revenue")).as("best"))
        perSupp.crossJoin(broadcast(best))
          .where(col("total_revenue") === col("best"))
          .join(broadcast(Tables.supplier(s, dir)
            .select(col("s_suppkey"), col("s_name"))),
            col("l_suppkey") === col("s_suppkey"))
          .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
          .orderBy("s_suppkey")
      },
      Some("""
        WITH r AS (SELECT l_suppkey,
                     CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
                       (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
                       AS DOUBLE) AS total_revenue
                   FROM lineitem
                   WHERE l_shipdate >= TIMESTAMP '1996-01-01'
                     AND l_shipdate < TIMESTAMP '1996-04-01'
                   GROUP BY 1)
        SELECT s_suppkey, s_name, total_revenue
        FROM r JOIN supplier ON l_suppkey = s_suppkey
        WHERE total_revenue = (SELECT max(total_revenue) FROM r)
        ORDER BY s_suppkey"""))
  )
}
