package graft.entries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{GraftSession, Tables}
import graft.expr.Functions.{stableAvg, stableRoundedSum, stableSum}
import graft.oracle.TaxiSql.Dialect.{decSum, rnd, rndSum, stableAvg => oStableAvg}

/** General relational-operator entries over the TPC-H-ish corpus: hash
  * aggregation, shuffled and broadcast joins, semi/anti joins, window
  * top-k, sort/limit, distinct aggregates — the operator families a user
  * of the engine composes beyond the reference's declared models.
  *
  * Scale notes: the `nation`/`region` sides are broadcast explicitly
  * (dimension tables, O(10²) rows — a shuffle there would be pure
  * overhead at 100 TB); fact-fact joins shuffle on their keys and rely on
  * AQE for skew; aggregates keep map-side partial aggregation by grouping
  * on low-cardinality keys.
  */
object TpchEntries {

  private def q(f: (SparkSession, String) => DataFrame): (SparkSession, String) => DataFrame =
    (s, d) => { GraftSession.tune(s); f(s, d) }

  /** The deterministic merge fixture shared by `tpch_merge_upsert` and
    * `tpch_table_diff`: every 7th key updated (status 'U', price +10%),
    * every 21st deleted, every 11th re-inserted under a shifted key. */
  private def mergedOrders(s: SparkSession, d: String): DataFrame = {
    val orders = Tables.orders(s, d)
    val target = orders.select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    val updates = orders.filter(col("o_orderkey") % 7 === 0)
      .select(col("o_orderkey"), lit("U").as("o_orderstatus"),
        round(col("o_totalprice") * 1.1, 2).as("o_totalprice"),
        (col("o_orderkey") % 21 === 0).as("_del"))
    val inserts = orders.filter(col("o_orderkey") % 11 === 0)
      .select((col("o_orderkey") + 1000000000L).as("o_orderkey"),
        lit("N").as("o_orderstatus"), lit(1.0).as("o_totalprice"),
        lit(false).as("_del"))
    graft.operators.Merge.upsert(target, updates.unionAll(inserts),
      "o_orderkey", deleteCol = Some("_del"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = EntryMap(
    // TPC-H Q1-shaped pricing summary: the canonical partial-agg pipeline.
    "tpch_q1_pricing" -> q { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum("l_quantity"), 2).as("sum_qty"),
          stableRoundedSum(col("l_extendedprice"), 2).as("sum_base_price"),
          stableRoundedSum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 2).as("sum_disc_price"),
          round(avg("l_quantity"), 2).as("avg_qty"),
          round(stableAvg(col("l_discount")), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
    },
    // Fact ⋈ dim ⋈ dim with the dims broadcast.
    "tpch_join_nation_revenue" -> q { (s, d) =>
      Tables.orders(s, d)
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name").as("nation"))
        .agg(count(lit(1)).as("order_cnt"),
          stableRoundedSum(col("o_totalprice"), 2).as("revenue"))
    },
    // Clustered-layout roundtrip: orders rewritten range-clustered on
    // o_totalprice (disjoint per-file ranges — the min/max pruning
    // precondition), then scanned back through a range predicate that
    // can skip non-covering files at footer time.
    "tpch_clustered_scan" -> q { (s, d) =>
      val dir = Scratch.tmpPath("clustered_orders", d, s)
      graft.write.IncrementalWriter.overwriteClustered(
        Tables.orders(s, d).select("o_orderkey", "o_totalprice", "o_orderdate"),
        dir, "o_totalprice", nFiles = 8)
      s.read.parquet(dir).filter(col("o_totalprice") > 300000)
    },
    // TPC-H Q3 shape (shipping priority): selective dim filter, two
    // fact joins with date predicates pushed to both scans, top-10 by
    // revenue — the classic join+agg+TakeOrdered composite.
    "tpch_q3_shipping" -> q { (s, d) =>
      val cut = lit("1998-06-01").cast("timestamp")
      val cust = Tables.customer(s, d)
        .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
      val ord = Tables.orders(s, d).filter(col("o_orderdate") < cut)
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
      Tables.lineitem(s, d).filter(col("l_shipdate") > cut)
        .select("l_orderkey", "l_extendedprice", "l_discount")
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(stableRoundedSum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 2)
          .as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey")).limit(10)
    },
    // TPC-H Q5 shape (local supplier volume): five-way join where the
    // supplier must share the customer's nation — the extra equality
    // rides the supplier join as a residual, nation broadcasts.
    "tpch_q5_local_supplier" -> q { (s, d) =>
      Tables.lineitem(s, d)
        .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
        .join(Tables.orders(s, d).filter(year(col("o_orderdate")) === 1997)
          .select("o_orderkey", "o_custkey"),
          col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, d).select("c_custkey", "c_nationkey"),
          col("o_custkey") === col("c_custkey"))
        .join(Tables.supplier(s, d).select("s_suppkey", "s_nationkey"),
          col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(Tables.nation(s, d)),
          col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name").as("nation"))
        .agg(count(lit(1)).as("n_lines"),
          stableRoundedSum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 2)
            .as("revenue"))
    },
    // Sort/limit → TakeOrderedAndProject (no global sort materialized).
    "tpch_topk_orders" -> q { (s, d) =>
      Tables.orders(s, d)
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
        .orderBy(col("o_totalprice").desc, col("o_orderkey")).limit(10)
    },
    // Group-wise top-k via ranking window.
    "tpch_window_topk" -> q { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select("o_orderpriority", "rn", "o_orderkey", "o_totalprice")
    },
    // Left-semi: orders having at least one high-quantity line.
    "tpch_semi_join" -> q { (s, d) =>
      Tables.orders(s, d)
        .join(Tables.lineitem(s, d).filter(col("l_quantity") >= 48).select("l_orderkey"),
          col("o_orderkey") === col("l_orderkey"), "left_semi")
        .select("o_orderkey", "o_custkey", "o_totalprice")
    },
    // Left-anti: customers with no orders at all.
    "tpch_anti_join" -> q { (s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d).select("o_custkey"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name", "c_nationkey")
    },
    // Set operations (INTERSECT/EXCEPT are DISTINCT-semantics in both
    // engines, like SQL).
    "tpch_set_intersect" -> q { (s, d) =>
      Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey"))
        .intersect(Tables.orders(s, d).filter(col("o_totalprice") > 200000)
          .select(col("o_custkey").as("c_custkey")))
    },
    "tpch_set_except" -> q { (s, d) =>
      Tables.customer(s, d).select(col("c_custkey"))
        .except(Tables.orders(s, d).filter(col("o_orderstatus") === "F")
          .select(col("o_custkey").as("c_custkey")))
    },
    // Rollup with subtotal rows (grouping-null keys labeled 'ALL').
    "tpch_rollup" -> q { (s, d) =>
      Tables.orders(s, d)
        .rollup(col("o_orderpriority"), col("o_orderstatus"))
        .agg(count(lit(1)).as("n_orders"),
          stableRoundedSum(col("o_totalprice"), 2).as("revenue"))
        .select(coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          col("n_orders"), col("revenue"))
    },
    // Analytic windows: running total (deterministic decimal accumulation),
    // rank, and lag within a customer's order history.
    "tpch_window_running" -> q { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val hist = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      val running = hist.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.orders(s, d).select(
        col("o_custkey"), col("o_orderkey"),
        round(sum(col("o_totalprice").cast("decimal(38,10)")).over(running), 2)
          .cast("double").as("running_total"),
        rank().over(hist).as("order_seq"),
        datediff(col("o_orderdate"),
          lag(col("o_orderdate"), 1).over(hist)).as("days_since_prev"))
    },
    // Global sort (RangePartitioning), no limit.
    "tpch_global_sort" -> q { (s, d) =>
      Tables.orders(s, d)
        .select("o_orderkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    },
    // Exact interpolated percentiles per group.
    "tpch_percentiles" -> q { (s, d) =>
      Tables.orders(s, d)
        .groupBy(col("o_orderpriority"))
        .agg(
          round(expr("percentile(o_totalprice, 0.5)"), 4).as("p50"),
          round(expr("percentile(o_totalprice, 0.9)"), 4).as("p90"),
          round(expr("percentile(o_totalprice, 0.99)"), 4).as("p99"))
    },
    // CUBE: all grouping-set combinations with subtotal rows.
    "tpch_cube" -> q { (s, d) =>
      Tables.orders(s, d)
        .cube(col("o_orderpriority"), col("o_orderstatus"))
        .agg(count(lit(1)).as("n_orders"))
        .select(coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          col("n_orders"))
    },
    // S7/S9: namespace DDL + managed-table CTAS round-trip through the
    // session catalog.
    "cat_table_roundtrip" -> q { (s, d) =>
      graft.catalog.Catalog.materializeTable(
        Tables.customer(s, d).filter(col("c_acctbal") > 0), "graft_db", "customers_pos")
      graft.catalog.Catalog.readTable(s, "graft_db", "customers_pos")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"),
          round(stableAvg(col("c_acctbal")), 2).as("avg_bal"))
    },
    // Exact distinct aggregate per segment.
    "tpch_distinct_agg" -> q { (s, d) =>
      Tables.customer(s, d)
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_cust"),
          countDistinct(col("c_nationkey")).as("n_nations"),
          round(stableAvg(col("c_acctbal")), 2).as("avg_bal"))
    },
    // Bucketed tables end-to-end: both sides materialized bucketed on
    // the join key, read back through the catalog, joined and
    // aggregated — VALUES graded against a plain join oracle. (The
    // harness consumes the returned frame through its own
    // QueryExecution, so a conf toggled here cannot pin the graded
    // plan; the zero-shuffle bucketed-join PLAN property is pinned in
    // ScaleToolsSpec, which inspects the plan it builds.)
    "tpch_bucketed_join" -> q { (s, d) =>
      import graft.catalog.Catalog
      Catalog.materializeBucketed(
        Tables.customer(s, d).select(col("c_custkey"), col("c_mktsegment")),
        "graft_db", "bkt_customer", "c_custkey", 8)
      Catalog.materializeBucketed(
        Tables.orders(s, d).select(col("o_custkey").as("c_custkey"), col("o_totalprice")),
        "graft_db", "bkt_orders", "c_custkey", 8)
      Catalog.readTable(s, "graft_db", "bkt_customer")
        .join(Catalog.readTable(s, "graft_db", "bkt_orders"), "c_custkey")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"),
          graft.expr.Functions.stableRoundedSum(col("o_totalprice"), 2).as("revenue"))
    },
    // Correlated scalar subquery, de-correlated the scalable way: the
    // per-nation average becomes a broadcast aggregate joined back —
    // the big side is scanned twice but never shuffled. stableAvg keeps
    // the comparison boundary bit-identical across engines.
    "tpch_scalar_subquery" -> q { (s, d) =>
      val c = Tables.customer(s, d)
      val natAvg = c.groupBy(col("c_nationkey"))
        .agg(stableAvg(col("c_acctbal")).as("nat_avg"))
      c.join(broadcast(natAvg), Seq("c_nationkey"))
        .filter(col("c_acctbal") > col("nat_avg"))
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n_above"))
    },
    // Salted skew join: the fact side's hot keys are scattered across 8
    // deterministic salts, the dim side replicated once per salt — the
    // operator's contract is result equality with the plain join, which
    // is exactly what the oracle grades.
    "tpch_skew_join" -> q { (s, d) =>
      val li = Tables.lineitem(s, d)
        .select(col("l_suppkey"), col("l_extendedprice"), col("l_discount"))
      val supp = Tables.supplier(s, d)
        .select(col("s_suppkey").as("l_suppkey"), col("s_nationkey"))
      graft.operators.SkewJoin.saltedJoin(li, supp, "l_suppkey", salts = 8)
        .groupBy(col("s_nationkey"))
        .agg(count(lit(1)).as("n_lines"),
          stableRoundedSum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 2)
            .as("revenue"))
    },
    // Row-level MERGE: deterministic source derived from orders —
    // every 7th key updated (status 'U', price +10%), every 21st
    // deleted, every 11th re-inserted under a shifted key — applied via
    // one full-outer join; output is the post-merge table.
    "tpch_merge_upsert" -> q((s, d) => mergedOrders(s, d)),
    // Keyed table diff (reconciliation): the pre-merge orders table
    // diffed against the post-merge one — updates surface as
    // `changed`, deletes as `only_left`, shifted-key inserts as
    // `only_right`; the untouched mass is never emitted.
    "tpch_table_diff" -> q { (s, d) =>
      val target = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      graft.operators.Merge.tableDiff(target, mergedOrders(s, d), "o_orderkey")
    },
    // ROLLUP with grouping() flags — unlike tpch_rollup's 'ALL'
    // labeling, the flags disambiguate REAL null keys from subtotal
    // rows (the label trick is lossy when a key can itself be null).
    // Same one-Expand-one-aggregation pass.
    "tpch_grouping_flags" -> q { (s, d) =>
      Tables.customer(s, d)
        .rollup(col("c_mktsegment"), col("c_nationkey"))
        .agg(count(lit(1)).as("n_cust"),
          stableRoundedSum(col("c_acctbal"), 2).as("sum_bal"),
          grouping(col("c_mktsegment")).cast("int").as("g_seg"),
          grouping(col("c_nationkey")).cast("int").as("g_nat"))
    },
    // Bloom-pruned semi-join: high-balance customers' keys build a
    // distributed Bloom filter that prunes the orders probe map-side
    // BEFORE its shuffle; the residual exact semi-join removes false
    // positives, so the output is exactly orders ⋉ customers.
    "tpch_bloom_semi" -> q { (s, d) =>
      val probe = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      val build = Tables.customer(s, d).filter(col("c_acctbal") > 9000)
        .select(col("c_custkey").as("o_custkey"))
      graft.operators.BloomJoin.bloomSemiJoin(probe, build, "o_custkey",
        expectedItems = 10000L, fpp = 0.01)
    },
    // TPC-H Q4 shape (order priority checking): orders with at least
    // one line shipped >90 days after the order date — an EXISTS whose
    // predicate spans both tables, so the semi-join carries the
    // inequality as a residual condition on the equi-join. One shuffle
    // pair on the order key; the count group-by is low-cardinality.
    "tpch_q4_late_orders" -> q { (s, d) =>
      val late = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_shipdate"))
      Tables.orders(s, d)
        .join(late, col("o_orderkey") === col("l_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
    },
    // TPC-H Q17 shape (small-quantity revenue): a correlated scalar avg
    // subquery, de-correlated into a per-part aggregate joined back —
    // the brand slice of lineitem is scanned twice but never shuffled
    // wide (the per-part cut is small after the brand filter, and the
    // final agg is a single global row). stableAvg keeps the
    // l_quantity < 0.2·avg comparison boundary bit-identical.
    "tpch_q17_small_qty" -> q { (s, d) =>
      val brandParts = Tables.part(s, d)
        .filter(col("p_brand") === "Brand#1").select("p_partkey")
      val li = Tables.lineitem(s, d)
        .select("l_partkey", "l_quantity", "l_extendedprice")
        .join(brandParts, col("l_partkey") === col("p_partkey"))
      val cuts = li.groupBy(col("l_partkey").as("cut_partkey"))
        .agg((lit(0.2) * stableAvg(col("l_quantity"))).as("qty_cut"))
      li.join(cuts, col("l_partkey") === col("cut_partkey"))
        .filter(col("l_quantity") < col("qty_cut"))
        .agg(round(stableSum(col("l_extendedprice")).cast("double") / 7.0, 2)
          .as("avg_yearly"))
    },
    // TPC-H Q18 shape (large-volume orders): HAVING on a grouped sum
    // feeding an IN-subquery join — expressed as the aggregate joined
    // back to orders/customer, top-100 by order value. The quantity
    // HAVING boundary rides the order-independent decimal sum.
    "tpch_q18_large_orders" -> q { (s, d) =>
      val big = Tables.lineitem(s, d)
        .groupBy(col("l_orderkey"))
        .agg(stableSum(col("l_quantity")).cast("double").as("total_qty"))
        .filter(col("total_qty") > 250)
      Tables.orders(s, d)
        .join(big, col("o_orderkey") === col("l_orderkey"))
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
          col("o_orderdate"), col("o_totalprice"), col("total_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey")).limit(100)
    },
    // TPC-H Q22 shape (dormant high-value customers): a GLOBAL scalar
    // subquery (avg positive balance — one broadcast row) gating the
    // filter, composed with a NOT EXISTS anti-join — customers above
    // the global average with no 1998 order, per nation. The year
    // filter pushes below the anti-join's shuffle; stableAvg keeps the
    // comparison boundary bit-identical across engines.
    "tpch_q22_dormant" -> q { (s, d) =>
      val cust = Tables.customer(s, d)
      val posAvg = cust.filter(col("c_acctbal") > 0)
        .agg(stableAvg(col("c_acctbal")).as("pos_avg"))
      cust.crossJoin(broadcast(posAvg))
        .filter(col("c_acctbal") > col("pos_avg"))
        .join(Tables.orders(s, d).filter(year(col("o_orderdate")) === 1998)
          .select("o_custkey"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n_cust"),
          stableRoundedSum(col("c_acctbal"), 2).as("total_bal"))
    },
    // TPC-H Q6 shape (forecast revenue change): the canonical
    // pure-filter scan aggregate — every predicate pushes to the
    // parquet reader, no join, no group-by key.
    "tpch_q6_forecast" -> q { (s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-01-01").cast("timestamp") &&
          col("l_discount").between(0.05, 0.07) &&
          col("l_quantity") < 24)
        .agg(count(lit(1)).as("n_lines"),
          stableRoundedSum(col("l_extendedprice") * col("l_discount"), 2)
            .as("revenue"))
    },
    // TPC-H Q19 shape (disjunctive discounted revenue): OR-of-ANDs
    // predicate spanning both join sides — the planner must push the
    // part-only disjuncts below the join while keeping the residual
    // mixed condition on it.
    "tpch_q19_disjunctive" -> q { (s, d) =>
      val li = Tables.lineitem(s, d)
        .select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
      val p = Tables.part(s, d).select("p_partkey", "p_brand", "p_size")
      li.join(p, col("l_partkey") === col("p_partkey"))
        .filter(
          (col("p_brand") === "Brand#1" && col("p_size").between(1, 10) &&
            col("l_quantity").between(1, 20)) ||
          (col("p_brand") === "Brand#2" && col("p_size").between(11, 20) &&
            col("l_quantity").between(10, 30)) ||
          (col("p_brand") === "Brand#3" && col("p_size").between(21, 30) &&
            col("l_quantity").between(20, 40)))
        .agg(count(lit(1)).as("n_lines"),
          stableRoundedSum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 2)
            .as("revenue"))
    },
    // Join-key skew profiler — the ops step BEFORE choosing a salted
    // join: per-key row counts with each hot key's multiple of the mean
    // (the frame under the global window is the key-count profile,
    // bounded by the dimension's cardinality, never the fact table).
    "tpch_skew_profile" -> q { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      Tables.lineitem(s, d)
        .groupBy(col("l_suppkey")).agg(count(lit(1)).as("n_rows"))
        .withColumn("x_mean", round(col("n_rows").cast("double") /
          avg(col("n_rows")).over(Window.partitionBy()), 4))
        .orderBy(col("n_rows").desc, col("l_suppkey")).limit(10)
    },
    // Range join (bucketed, not nested-loop): orders counted into 90-day
    // windows sliding every 30 days — overlapping on purpose, so each
    // order matches up to 3 windows and the operator is a real interval
    // join, not a disguised group-by.
    "tpch_range_join" -> q { (s, d) =>
      val windows = s.range(85).select(
        date_add(to_date(lit("1992-01-01")), (col("id") * 30).cast("int")).as("ws"),
        date_add(to_date(lit("1992-01-01")), (col("id") * 30 + 89).cast("int")).as("we"))
      val pts = Tables.orders(s, d).select(col("o_orderdate"))
        .withColumn("day", unix_date(to_date(col("o_orderdate"))))
      val ivs = windows
        .withColumn("ds", unix_date(col("ws")))
        .withColumn("de", unix_date(col("we")))
      graft.operators.RangeJoin.pointInInterval(pts, "day", ivs, "ds", "de",
          bucketWidth = 64)
        .groupBy(col("ws"), col("we"))
        .agg(count(lit(1)).as("n_orders"))
    })

  val oracleSql: Map[String, String] = EntryMap(
    "tpch_bucketed_join" ->
      s"""SELECT c_mktsegment, count(*) AS n_orders,
         |  ${rndSum("o_totalprice", 2)} AS revenue
         |FROM customer JOIN orders ON c_custkey = o_custkey
         |GROUP BY 1""".stripMargin,
    "tpch_scalar_subquery" ->
      s"""SELECT c_nationkey, count(*) AS n_above
         |FROM customer c
         |WHERE c_acctbal > (SELECT ${oStableAvg("c_acctbal")}
         |                   FROM customer c2 WHERE c2.c_nationkey = c.c_nationkey)
         |GROUP BY 1""".stripMargin,
    "tpch_range_join" ->
      """WITH w AS (SELECT (DATE '1992-01-01' + CAST(i * 30 AS INTEGER)) AS ws,
        |                  (DATE '1992-01-01' + CAST(i * 30 + 89 AS INTEGER)) AS we
        |           FROM range(85) t(i))
        |SELECT ws, we, count(*) AS n_orders
        |FROM w JOIN orders ON o_orderdate BETWEEN ws AND we
        |GROUP BY 1, 2""".stripMargin,
    "tpch_set_intersect" ->
      """SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |INTERSECT
        |SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 200000""".stripMargin,
    "tpch_set_except" ->
      """SELECT c_custkey FROM customer
        |EXCEPT
        |SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'F'""".stripMargin,
    "tpch_rollup" ->
      s"""SELECT coalesce(o_orderpriority, 'ALL') AS priority,
         |  coalesce(o_orderstatus, 'ALL') AS status,
         |  count(*) AS n_orders, ${rndSum("o_totalprice", 2)} AS revenue
         |FROM orders GROUP BY ROLLUP (o_orderpriority, o_orderstatus)""".stripMargin,
    "tpch_window_running" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(round(sum(CAST(CAST(o_totalprice AS VARCHAR) AS DECIMAL(38,10)))
        |    OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS DOUBLE) AS running_total,
        |  CAST(rank() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS INTEGER) AS order_seq,
        |  CAST(date_diff('day',
        |    lag(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
        |    o_orderdate) AS INTEGER) AS days_since_prev
        |FROM orders""".stripMargin,
    "tpch_global_sort" ->
      "SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_totalprice DESC, o_orderkey",
    "tpch_percentiles" ->
      s"""SELECT o_orderpriority,
         |  ${rnd("quantile_cont(o_totalprice, 0.5)", 4)} AS p50,
         |  ${rnd("quantile_cont(o_totalprice, 0.9)", 4)} AS p90,
         |  ${rnd("quantile_cont(o_totalprice, 0.99)", 4)} AS p99
         |FROM orders GROUP BY 1""".stripMargin,
    "tpch_cube" ->
      """SELECT coalesce(o_orderpriority, 'ALL') AS priority,
        |  coalesce(o_orderstatus, 'ALL') AS status,
        |  count(*) AS n_orders
        |FROM orders GROUP BY CUBE (o_orderpriority, o_orderstatus)""".stripMargin,
        "cat_table_roundtrip" ->
      s"""SELECT c_mktsegment, count(*) AS n,
         |  ${rnd(oStableAvg("c_acctbal"), 2)} AS avg_bal
         |FROM customer WHERE c_acctbal > 0 GROUP BY 1""".stripMargin,
    "tpch_q1_pricing" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  ${rnd("sum(l_quantity)", 2)} AS sum_qty,
         |  ${rndSum("l_extendedprice", 2)} AS sum_base_price,
         |  ${rndSum("l_extendedprice * (1.0 - l_discount)", 2)} AS sum_disc_price,
         |  ${rnd("avg(l_quantity)", 2)} AS avg_qty,
         |  ${rnd(oStableAvg("l_discount"), 4)} AS avg_disc,
         |  count(*) AS count_order
         |FROM lineitem GROUP BY 1, 2""".stripMargin,
    "tpch_join_nation_revenue" ->
      s"""SELECT n.n_name AS nation, count(*) AS order_cnt,
         |  ${rndSum("o.o_totalprice", 2)} AS revenue
         |FROM orders o
         |JOIN customer c ON o.o_custkey = c.c_custkey
         |JOIN nation n ON c.c_nationkey = n.n_nationkey
         |GROUP BY 1""".stripMargin,
    "tpch_topk_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
        |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,
    "tpch_window_topk" ->
      """SELECT o_orderpriority, rn, o_orderkey, o_totalprice FROM (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |    CAST(row_number() OVER (PARTITION BY o_orderpriority
        |         ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rn
        |  FROM orders) WHERE rn <= 3""".stripMargin,
    "tpch_skew_join" ->
      s"""SELECT s_nationkey, count(*) AS n_lines,
         |  ${rndSum("l_extendedprice * (1.0 - l_discount)", 2)} AS revenue
         |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
         |GROUP BY 1""".stripMargin,
    "tpch_clustered_scan" ->
      """SELECT o_orderkey, o_totalprice, o_orderdate FROM orders
        |WHERE o_totalprice > 300000""".stripMargin,
    "tpch_q3_shipping" ->
      s"""SELECT l_orderkey, o_orderdate, o_orderpriority,
         |  ${rndSum("l_extendedprice * (1.0 - l_discount)", 2)} AS revenue
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |WHERE c_mktsegment = 'BUILDING'
         |  AND o_orderdate < TIMESTAMP '1998-06-01'
         |  AND l_shipdate > TIMESTAMP '1998-06-01'
         |GROUP BY 1, 2, 3
         |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "tpch_q5_local_supplier" ->
      s"""SELECT n_name AS nation, count(*) AS n_lines,
         |  ${rndSum("l_extendedprice * (1.0 - l_discount)", 2)} AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         |JOIN nation ON s_nationkey = n_nationkey
         |WHERE year(o_orderdate) = 1997
         |GROUP BY 1""".stripMargin,
    "tpch_merge_upsert" -> mergeResultSql,
    "tpch_table_diff" ->
      s"""WITH merged AS ($mergeResultSql),
         |t AS (SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders),
         |j AS (SELECT t.o_orderkey AS lk, m.o_orderkey AS rk,
         |        CASE WHEN m.o_orderkey IS NULL THEN 'only_left'
         |             WHEN t.o_orderkey IS NULL THEN 'only_right'
         |             WHEN NOT (t.o_orderstatus IS NOT DISTINCT FROM m.o_orderstatus
         |                       AND t.o_totalprice IS NOT DISTINCT FROM m.o_totalprice)
         |             THEN 'changed' END AS diff_status
         |      FROM t FULL OUTER JOIN merged m ON t.o_orderkey = m.o_orderkey)
         |SELECT coalesce(lk, rk) AS o_orderkey, diff_status
         |FROM j WHERE diff_status IS NOT NULL""".stripMargin,
    "tpch_grouping_flags" ->
      s"""SELECT c_mktsegment, c_nationkey, count(*) AS n_cust,
         |  ${rndSum("c_acctbal", 2)} AS sum_bal,
         |  CAST(GROUPING(c_mktsegment) AS INTEGER) AS g_seg,
         |  CAST(GROUPING(c_nationkey) AS INTEGER) AS g_nat
         |FROM customer GROUP BY ROLLUP (c_mktsegment, c_nationkey)""".stripMargin,
    // the bloom is pruning-only: the graded result is the exact semi-join
    "tpch_bloom_semi" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |WHERE o_custkey IN (SELECT c_custkey FROM customer
        |                    WHERE c_acctbal > 9000)""".stripMargin,
    "tpch_semi_join" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_quantity >= 48)""".stripMargin,
    "tpch_anti_join" ->
      """SELECT c_custkey, c_name, c_nationkey FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin,
    "tpch_distinct_agg" ->
      s"""SELECT c_mktsegment, count(*) AS n_cust,
         |  count(DISTINCT c_nationkey) AS n_nations,
         |  ${rnd(oStableAvg("c_acctbal"), 2)} AS avg_bal
         |FROM customer GROUP BY 1""".stripMargin,
    "tpch_q6_forecast" ->
      s"""SELECT count(*) AS n_lines,
         |  ${rndSum("l_extendedprice * l_discount", 2)} AS revenue
         |FROM lineitem
         |WHERE l_shipdate >= TIMESTAMP '1995-01-01'
         |  AND l_shipdate < TIMESTAMP '1996-01-01'
         |  AND l_discount BETWEEN 0.05 AND 0.07
         |  AND l_quantity < 24""".stripMargin,
    "tpch_q19_disjunctive" ->
      s"""SELECT count(*) AS n_lines,
         |  ${rndSum("l_extendedprice * (1.0 - l_discount)", 2)} AS revenue
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10
         |         AND l_quantity BETWEEN 1 AND 20)
         |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 11 AND 20
         |         AND l_quantity BETWEEN 10 AND 30)
         |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 21 AND 30
         |         AND l_quantity BETWEEN 20 AND 40)""".stripMargin,
    "tpch_skew_profile" ->
      s"""WITH c AS (SELECT l_suppkey, count(*) AS n_rows FROM lineitem GROUP BY 1)
         |SELECT l_suppkey, n_rows,
         |  ${rnd("CAST(n_rows AS DOUBLE) / avg(n_rows) OVER ()", 4)} AS x_mean
         |FROM c ORDER BY n_rows DESC, l_suppkey LIMIT 10""".stripMargin,
    "tpch_q22_dormant" ->
      s"""SELECT c_nationkey, count(*) AS n_cust,
         |  ${rndSum("c_acctbal", 2)} AS total_bal
         |FROM customer
         |WHERE c_acctbal > (SELECT ${oStableAvg("c_acctbal")}
         |                   FROM customer WHERE c_acctbal > 0)
         |  AND NOT EXISTS (SELECT 1 FROM orders
         |                  WHERE o_custkey = c_custkey
         |                    AND year(o_orderdate) = 1998)
         |GROUP BY 1""".stripMargin,
    "tpch_q4_late_orders" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey
        |                AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
        |GROUP BY 1""".stripMargin,
    "tpch_q17_small_qty" ->
      s"""WITH li AS (
         |  SELECT l_partkey, l_quantity, l_extendedprice
         |  FROM lineitem JOIN part ON l_partkey = p_partkey
         |  WHERE p_brand = 'Brand#1'),
         |cuts AS (
         |  SELECT l_partkey AS cut_partkey,
         |    0.2 * (${oStableAvg("l_quantity")}) AS qty_cut
         |  FROM li GROUP BY 1)
         |SELECT ${rnd(s"CAST(${decSum("l_extendedprice")} AS DOUBLE) / 7.0", 2)} AS avg_yearly
         |FROM li JOIN cuts ON l_partkey = cut_partkey
         |WHERE l_quantity < qty_cut""".stripMargin,
    "tpch_q18_large_orders" ->
      s"""WITH big AS (
         |  SELECT l_orderkey, CAST(${decSum("l_quantity")} AS DOUBLE) AS total_qty
         |  FROM lineitem GROUP BY 1
         |  HAVING CAST(${decSum("l_quantity")} AS DOUBLE) > 250)
         |SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, total_qty
         |FROM orders
         |JOIN big ON o_orderkey = l_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin)

  /** Post-merge orders — the `tpch_merge_upsert` oracle, reused as a
    * CTE by the `tpch_table_diff` oracle. */
  private lazy val mergeResultSql =
    s"""WITH src AS (
       |  SELECT o_orderkey, 'U' AS o_orderstatus,
       |    ${rnd("o_totalprice * 1.1", 2)} AS o_totalprice,
       |    o_orderkey % 21 = 0 AS del
       |  FROM orders WHERE o_orderkey % 7 = 0
       |  UNION ALL
       |  SELECT o_orderkey + 1000000000, 'N', 1.0, false
       |  FROM orders WHERE o_orderkey % 11 = 0),
       |m AS (
       |  SELECT coalesce(s.o_orderkey, t.o_orderkey) AS o_orderkey,
       |    CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_orderstatus
       |         ELSE t.o_orderstatus END AS o_orderstatus,
       |    CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_totalprice
       |         ELSE t.o_totalprice END AS o_totalprice,
       |    s.del
       |  FROM (SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders) t
       |  FULL OUTER JOIN src s ON t.o_orderkey = s.o_orderkey)
       |SELECT o_orderkey, o_orderstatus, o_totalprice FROM m
       |WHERE del IS DISTINCT FROM true""".stripMargin
}
