package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{QueryDef, QueryModule, Tables}

/** The relational query surface (SURVEY.md §2.1): aggregations, joins
  * (broadcast/semi/anti), windows, sorts/top-k, set ops, rollup/cube,
  * subqueries — all Catalyst built-ins, all oracle-checked.
  *
  * Numeric-stability conventions (Spark vs DuckDB hash parity):
  *  - money/quantity aggregates go through DECIMAL(12,2) (exact,
  *    order-independent) and are cast back to DOUBLE for output;
  *  - averages are expressed as exact-decimal-sum / count;
  *  - per-row double math keeps the identical expression tree on both
  *    sides (same IEEE-754 ops => bit-identical);
  *  - every result is totally ordered by a unique key;
  *  - integer outputs are BIGINT on both sides, datetimes are strings.
  */
object RelationalQueries extends QueryModule {

  private def dec(c: Column): Column = c.cast("decimal(12,2)")
  private def t(name: String)(implicit sd: (SparkSession, String)): DataFrame =
    Tables(sd._1, sd._2, name)

  private def q(name: String, oracle: String, bench: Boolean = false)(
      fn: ((SparkSession, String)) => DataFrame): (String, QueryDef) =
    name -> QueryDef((s, d) => fn((s, d)), Some(oracle), bench)

  override def defs: Seq[(String, QueryDef)] = Seq(

    // ---- Aggregation: TPC-H Q1-style pricing summary (full scan, hash
    // agg with map-side partial aggregation; 6 groups only => tiny shuffle).
    q("q_pricing_summary", bench = true, oracle = """
      |SELECT l_returnflag, l_linestatus,
      |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS sum_qty,
      |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS sum_base_price,
      |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS sum_disc_price,
      |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(12,2)) * CAST(1 + l_tax AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS sum_charge,
      |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) / COUNT(*) AS avg_qty,
      |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) / COUNT(*) AS avg_price,
      |  CAST(CAST(SUM(CAST(l_discount AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) / COUNT(*) AS avg_disc,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin) { implicit sd =>
      val disc = dec(col("l_extendedprice")) * dec(lit(1) - col("l_discount"))
      val charge = disc * dec(lit(1) + col("l_tax"))
      t("lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02 00:00:00"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
          sum(dec(col("l_extendedprice"))).cast("double").as("sum_base_price"),
          sum(disc).cast("double").as("sum_disc_price"),
          sum(charge).cast("double").as("sum_charge"),
          (sum(dec(col("l_quantity"))).cast("double") / count(lit(1))).as("avg_qty"),
          (sum(dec(col("l_extendedprice"))).cast("double") / count(lit(1))).as("avg_price"),
          (sum(dec(col("l_discount"))).cast("double") / count(lit(1))).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    // ---- Join + agg + top-k: TPC-H Q3-style shipping priority.
    // customer is the small side => broadcast; order-level agg shuffles
    // on l_orderkey only.
    q("q_top_unshipped_orders", bench = true, oracle = """
      |SELECT l_orderkey,
      |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS revenue,
      |  strftime(o_orderdate, '%Y-%m-%d') AS orderdate, o_orderpriority
      |FROM customer JOIN orders ON c_custkey = o_custkey
      |  JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      |  AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
      |GROUP BY l_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin) { implicit sd =>
      t("customer").filter(col("c_mktsegment") === "BUILDING")
        .join(t("orders").filter(col("o_orderdate") < lit("1998-03-15 00:00:00")),
          col("c_custkey") === col("o_custkey"))
        .join(t("lineitem").filter(col("l_shipdate") > lit("1995-03-15 00:00:00")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(sum(dec(col("l_extendedprice")) * dec(lit(1) - col("l_discount")))
          .cast("double").as("revenue"))
        .select(col("l_orderkey"), col("revenue"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"),
          col("o_orderpriority"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    },

    // ---- Outer joins: customers (key < 100) FULL OUTER per-customer
    // order aggregates (key < 150) — unmatched rows survive on BOTH
    // sides (customers without orders; aggregates outside the customer
    // filter). COALESCE everything nullable so output is deterministic.
    q("q_outer_joins", oracle = """
      |WITH agg AS (
      |  SELECT o_custkey, COUNT(*) AS n_orders,
      |    CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS total_price
      |  FROM orders WHERE o_custkey < 150 GROUP BY o_custkey)
      |SELECT COALESCE(c.c_custkey, a.o_custkey) AS cust_key,
      |  CAST(CASE WHEN c.c_custkey IS NULL THEN 0 ELSE 1 END
      |    AS BIGINT) AS has_customer,
      |  COALESCE(a.n_orders, 0) AS n_orders,
      |  COALESCE(a.total_price, 0.0) AS total_price
      |FROM (SELECT * FROM customer WHERE c_custkey < 100) c
      |FULL OUTER JOIN agg a ON c.c_custkey = a.o_custkey
      |ORDER BY cust_key""".stripMargin) { implicit sd =>
      val agg = t("orders").filter(col("o_custkey") < 150)
        .groupBy("o_custkey")
        .agg(count(lit(1)).as("n_orders"),
          sum(dec(col("o_totalprice"))).cast("double").as("total_price"))
      t("customer").filter(col("c_custkey") < 100)
        .join(agg, col("c_custkey") === col("o_custkey"), "full_outer")
        .select(
          coalesce(col("c_custkey"), col("o_custkey")).as("cust_key"),
          when(col("c_custkey").isNull, 0L).otherwise(1L).as("has_customer"),
          coalesce(col("n_orders"), lit(0L)).as("n_orders"),
          coalesce(col("total_price"), lit(0.0)).as("total_price"))
        .orderBy("cust_key")
    },

    // ---- Combined semi + anti join on the same fact (TPC-H Q21's
    // EXISTS/NOT EXISTS shape): orders with at least one returned
    // ('R') line and no accepted ('A') line. Both subqueries plan as
    // one pass each over lineitem — no correlated re-execution.
    q("q_exists_notexists", oracle = """
      |SELECT o_orderkey, o_orderpriority FROM orders o
      |WHERE EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o.o_orderkey AND l_returnflag = 'R')
      |  AND NOT EXISTS (SELECT 1 FROM lineitem
      |                  WHERE l_orderkey = o.o_orderkey AND l_returnflag = 'A')
      |ORDER BY o_orderkey""".stripMargin) { implicit sd =>
      val li = t("lineitem")
      t("orders")
        .join(li.filter(col("l_returnflag") === "R"),
          col("o_orderkey") === col("l_orderkey"), "left_semi")
        .join(li.filter(col("l_returnflag") === "A"),
          col("o_orderkey") === col("l_orderkey"), "left_anti")
        .select("o_orderkey", "o_orderpriority")
        .orderBy("o_orderkey")
    },

    // ---- Multi-way star join: TPC-H Q5-style revenue by nation.
    // nation/region are broadcast (bounded at 25/5 rows at every SF);
    // supplier GROWS with SF (10k rows/SF), so it gets no hint — AQE
    // broadcasts it at small SF and shuffle-joins it at scale. The
    // customer-supplier nation-colocation predicate is the classic Q5
    // shape.
    q("q_nation_revenue", bench = true, oracle = """
      |SELECT n_name,
      |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS revenue
      |FROM customer JOIN orders ON c_custkey = o_custkey
      |  JOIN lineitem ON l_orderkey = o_orderkey
      |  JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |  JOIN nation ON s_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      |GROUP BY n_name ORDER BY n_name""".stripMargin) { implicit sd =>
      t("customer")
        .join(t("orders")
          .filter(col("o_orderdate") >= lit("1995-01-01 00:00:00") &&
            col("o_orderdate") < lit("1997-01-01 00:00:00")),
          col("c_custkey") === col("o_custkey"))
        .join(t("lineitem"), col("l_orderkey") === col("o_orderkey"))
        .join(t("supplier"),
          col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(t("nation")), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(t("region")).filter(col("r_name") === "ASIA"),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy("n_name")
        .agg(sum(dec(col("l_extendedprice")) * dec(lit(1) - col("l_discount")))
          .cast("double").as("revenue"))
        .orderBy("n_name")
    },

    // ---- Dimension join: lineitem x part, grouped by brand. part grows
    // with SF (200k rows/SF) — no broadcast hint; AQE picks broadcast at
    // small SF, a shuffle join once part outgrows the threshold.
    q("q_part_brand_volume", oracle = """
      |SELECT p_brand,
      |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS sum_qty,
      |  COUNT(*) AS n_lines
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |GROUP BY p_brand ORDER BY p_brand""".stripMargin) { implicit sd =>
      t("lineitem")
        .join(t("part"), col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand")
        .agg(sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
          count(lit(1)).as("n_lines"))
        .orderBy("p_brand")
    },

    // ---- Left-semi join (EXISTS): customers that placed an urgent order.
    q("q_semi_join", oracle = """
      |SELECT c_custkey, c_name FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders
      |              WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
      |ORDER BY c_custkey""".stripMargin) { implicit sd =>
      t("customer")
        .join(t("orders").filter(col("o_orderpriority") === "1-URGENT"),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    },

    // ---- Left-anti join (NOT EXISTS): customers with no orders at all.
    q("q_anti_join", oracle = """
      |SELECT c_custkey, c_name FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |ORDER BY c_custkey""".stripMargin) { implicit sd =>
      t("customer")
        .join(t("orders"), col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    },

    // ---- Window: per-customer running order total (exact decimal
    // running sum; partition-local sort only, no global shuffle beyond
    // the hash partition on o_custkey).
    q("q_running_order_total", bench = true, oracle = """
      |SELECT o_custkey, o_orderkey,
      |  strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
      |    OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |          ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_total,
      |  ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS order_seq
      |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin) { implicit sd =>
      val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      t("orders").select(
        col("o_custkey"), col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"),
        sum(dec(col("o_totalprice")))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("double").as("running_total"),
        row_number().over(w).cast("long").as("order_seq"))
        .orderBy("o_custkey", "o_orderkey")
    },

    // ---- Window top-k per group: 3 priciest orders per customer.
    q("q_topk_orders_per_customer", oracle = """
      |SELECT o_custkey, o_orderkey, o_totalprice, rk FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    ROW_NUMBER() OVER (PARTITION BY o_custkey
      |                       ORDER BY o_totalprice DESC, o_orderkey) AS rk
      |  FROM orders) WHERE rk <= 3
      |ORDER BY o_custkey, rk""".stripMargin) { implicit sd =>
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t("orders")
        .withColumn("rk", row_number().over(w).cast("long"))
        .filter(col("rk") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rk")
        .orderBy("o_custkey", "rk")
    },

    // ---- Window lag: per-user event value delta (raw doubles — same
    // subtraction both sides => bit-identical).
    q("q_event_value_delta", oracle = """
      |SELECT event_id, user_id, value,
      |  lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value,
      |  value - lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS delta
      |FROM events ORDER BY event_id""".stripMargin) { implicit sd =>
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      t("events").select(
        col("event_id"), col("user_id"), col("value"),
        lag(col("value"), 1).over(w).as("prev_value"),
        (col("value") - lag(col("value"), 1).over(w)).as("delta"))
        .orderBy("event_id")
    },

    // ---- ROLLUP: hierarchical totals over returnflag/linestatus.
    q("q_rollup_flag_status", oracle = """
      |SELECT l_returnflag, l_linestatus,
      |  COUNT(*) AS n,
      |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS sum_price
      |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
      |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin) { implicit sd =>
      t("lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"),
          sum(dec(col("l_extendedprice"))).cast("double").as("sum_price"))
        .orderBy(col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first)
    },

    // ---- CUBE: all grouping combinations of orderstatus x priority.
    q("q_cube_status_priority", oracle = """
      |SELECT o_orderstatus, o_orderpriority,
      |  COUNT(*) AS n,
      |  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS sum_price
      |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
      |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin) { implicit sd =>
      t("orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"),
          sum(dec(col("o_totalprice"))).cast("double").as("sum_price"))
        .orderBy(col("o_orderstatus").asc_nulls_first,
          col("o_orderpriority").asc_nulls_first)
    },

    // ---- DISTINCT projection.
    q("q_distinct_flags", oracle = """
      |SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
      |ORDER BY l_returnflag, l_linestatus""".stripMargin) { implicit sd =>
      t("lineitem").select("l_returnflag", "l_linestatus").distinct()
        .orderBy("l_returnflag", "l_linestatus")
    },

    // ---- Set operations: customers active in 1995 INTERSECT 1996,
    // and 1995 EXCEPT 1996 (union of the two tagged sets).
    q("q_set_ops", oracle = """
      |SELECT 'both' AS tag, o_custkey FROM (
      |  SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
      |  INTERSECT
      |  SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996)
      |UNION ALL
      |SELECT 'only_1995' AS tag, o_custkey FROM (
      |  SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
      |  EXCEPT
      |  SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996)
      |ORDER BY tag, o_custkey""".stripMargin) { implicit sd =>
      def active(y: Int) = t("orders")
        .filter(year(col("o_orderdate")) === y).select("o_custkey")
      val both = active(1995).intersect(active(1996))
        .select(lit("both").as("tag"), col("o_custkey"))
      val only95 = active(1995).except(active(1996))
        .select(lit("only_1995").as("tag"), col("o_custkey"))
      both.unionByName(only95).orderBy("tag", "o_custkey")
    },

    // ---- Conditional aggregation (manual pivot on linestatus).
    q("q_conditional_agg", oracle = """
      |SELECT l_returnflag,
      |  CAST(CAST(SUM(CASE WHEN l_linestatus = 'O' THEN CAST(l_extendedprice AS DECIMAL(12,2)) ELSE CAST(0 AS DECIMAL(12,2)) END) AS VARCHAR) AS DOUBLE) AS open_price,
      |  CAST(CAST(SUM(CASE WHEN l_linestatus = 'F' THEN CAST(l_extendedprice AS DECIMAL(12,2)) ELSE CAST(0 AS DECIMAL(12,2)) END) AS VARCHAR) AS DOUBLE) AS fulfilled_price,
      |  COUNT(CASE WHEN l_discount > 0.05 THEN 1 END) AS n_high_discount
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { implicit sd =>
      t("lineitem").groupBy("l_returnflag").agg(
        sum(when(col("l_linestatus") === "O", dec(col("l_extendedprice")))
          .otherwise(dec(lit(0)))).cast("double").as("open_price"),
        sum(when(col("l_linestatus") === "F", dec(col("l_extendedprice")))
          .otherwise(dec(lit(0)))).cast("double").as("fulfilled_price"),
        count(when(col("l_discount") > 0.05, lit(1))).as("n_high_discount"))
        .orderBy("l_returnflag")
    },

    // ---- Scalar subquery / self-aggregation join (TPC-H Q17 shape):
    // lineitems under 20% of their part's average quantity.
    q("q_small_quantity_revenue", oracle = """
      |SELECT COUNT(*) AS n_lines,
      |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS total_price
      |FROM lineitem JOIN (
      |  SELECT l_partkey AS pk,
      |    0.2 * (CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) / COUNT(*)) AS threshold
      |  FROM lineitem GROUP BY l_partkey) ON l_partkey = pk
      |WHERE l_quantity < threshold""".stripMargin) { implicit sd =>
      val li = t("lineitem")
      val avgQty = li.groupBy(col("l_partkey").as("pk"))
        .agg((lit(0.2) * (sum(dec(col("l_quantity"))).cast("double") / count(lit(1))))
          .as("threshold"))
      // per-partkey aggregate has #distinct-parts rows — it grows with the
      // fact table, so never broadcast it; the shuffle join co-partitions
      // both sides on l_partkey (and AQE still broadcasts at tiny SF)
      li.join(avgQty, col("l_partkey") === col("pk"))
        .filter(col("l_quantity") < col("threshold"))
        .agg(count(lit(1)).as("n_lines"),
          sum(dec(col("l_extendedprice"))).cast("double").as("total_price"))
    },

    // ---- IN-subquery as semi join: orders from high-balance customers.
    q("q_in_subquery", oracle = """
      |SELECT o_orderpriority, COUNT(*) AS n FROM orders
      |WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { implicit sd =>
      t("orders")
        .join(t("customer").filter(col("c_acctbal") > 5000)
          .select(col("c_custkey")), col("o_custkey") === col("c_custkey"), "left_semi")
        .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
        .orderBy("o_orderpriority")
    },

    // ---- Global sort + limit (top-n pushdown: TakeOrderedAndProject).
    q("q_top_orders_by_price", oracle = """
      |SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 15""".stripMargin) { implicit sd =>
      t("orders").select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(15)
    },

    // ---- String function surface.
    q("q_string_functions", oracle = """
      |SELECT p_partkey,
      |  upper(p_name) AS name_upper,
      |  lower(p_brand) AS brand_lower,
      |  substring(p_type, 1, 5) AS type_prefix,
      |  CAST(length(p_name) AS BIGINT) AS name_len,
      |  replace(p_type, ' ', '_') AS type_snake,
      |  p_brand || '#' || CAST(p_size AS VARCHAR) AS brand_size,
      |  trim(p_name) AS name_trim
      |FROM part ORDER BY p_partkey""".stripMargin) { implicit sd =>
      t("part").select(
        col("p_partkey"),
        upper(col("p_name")).as("name_upper"),
        lower(col("p_brand")).as("brand_lower"),
        substring(col("p_type"), 1, 5).as("type_prefix"),
        length(col("p_name")).cast("long").as("name_len"),
        regexp_replace(col("p_type"), " ", "_").as("type_snake"),
        concat(col("p_brand"), lit("#"), col("p_size").cast("string")).as("brand_size"),
        trim(col("p_name")).as("name_trim"))
        .orderBy("p_partkey")
    },

    // ---- Datetime function surface (all emitted as strings/bigints).
    q("q_date_functions", oracle = """
      |SELECT o_orderkey,
      |  CAST(year(o_orderdate) AS BIGINT) AS y,
      |  CAST(month(o_orderdate) AS BIGINT) AS m,
      |  CAST(day(o_orderdate) AS BIGINT) AS d,
      |  CAST(dayofweek(o_orderdate) + 1 AS BIGINT) AS dow,
      |  CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
      |  strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS plus30,
      |  strftime(last_day(o_orderdate), '%Y-%m-%d') AS month_end
      |FROM orders ORDER BY o_orderkey""".stripMargin) { implicit sd =>
      t("orders").select(
        col("o_orderkey"),
        year(col("o_orderdate")).cast("long").as("y"),
        month(col("o_orderdate")).cast("long").as("m"),
        dayofmonth(col("o_orderdate")).cast("long").as("d"),
        dayofweek(col("o_orderdate")).cast("long").as("dow"),
        quarter(col("o_orderdate")).cast("long").as("qtr"),
        date_format(date_add(col("o_orderdate"), 30), "yyyy-MM-dd").as("plus30"),
        date_format(last_day(col("o_orderdate")), "yyyy-MM-dd").as("month_end"))
        .orderBy("o_orderkey")
    },

    // ---- JSON extraction (SURVEY.md §2 O-5) from the events props blob.
    q("q_json_extract", oracle = """
      |SELECT event_id,
      |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
      |FROM events ORDER BY event_id""".stripMargin) { implicit sd =>
      t("events").select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
        .orderBy("event_id")
    },

    // ---- Multi-distinct + min/max aggregate surface.
    q("q_agg_stats", oracle = """
      |SELECT
      |  COUNT(*) AS n,
      |  COUNT(DISTINCT l_orderkey) AS n_orders,
      |  COUNT(DISTINCT l_partkey) AS n_parts,
      |  MIN(l_extendedprice) AS min_price,
      |  MAX(l_extendedprice) AS max_price,
      |  MIN(strftime(l_shipdate, '%Y-%m-%d')) AS min_shipdate,
      |  MAX(strftime(l_shipdate, '%Y-%m-%d')) AS max_shipdate
      |FROM lineitem""".stripMargin) { implicit sd =>
      t("lineitem").agg(
        count(lit(1)).as("n"),
        countDistinct(col("l_orderkey")).as("n_orders"),
        countDistinct(col("l_partkey")).as("n_parts"),
        min(col("l_extendedprice")).as("min_price"),
        max(col("l_extendedprice")).as("max_price"),
        min(date_format(col("l_shipdate"), "yyyy-MM-dd")).as("min_shipdate"),
        max(date_format(col("l_shipdate"), "yyyy-MM-dd")).as("max_shipdate"))
    }
  )
}
