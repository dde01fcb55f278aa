package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Relational analytics suite over the TPC-H-ish testdata.
  *
  * The reference engine (see SURVEY.md §2.10) has no relational algebra;
  * on Spark the whole surface comes native. These queries pin down that
  * surface with DuckDB oracles and double as the bench headline set.
  *
  * Conventions for oracle parity:
  *  - every aggregate / computed column aliased identically on both sides;
  *  - money/quantity sums ride DECIMAL(18,6) ([[dsum]]/[[davg]]): decimal
  *    addition is exact and associative, so the result is independent of
  *    partition count and summation order on BOTH engines — a 2dp round
  *    over a double sum is NOT (the q21 cent at sf1, SCALE.md round-15:
  *    one ulp-crossing on a ~1e9 total flipped the rounded cent). The
  *    same property is what a 100 TB aggregation needs;
  *  - deterministic ORDER BY on both sides;
  *  - timestamps cast to DATE on output (duckdb naive vs spark UTC parity).
  */
object Relational {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  import org.apache.spark.sql.Column

  /** Order-independent money sum: exact DECIMAL(18,6) accumulation,
    * rounded to `scale`, surfaced as DOUBLE (both engines convert the
    * same exact decimal to the same nearest double). SQL twin:
    * `CAST(round(sum(CAST(x AS DECIMAL(18,6))), s) AS DOUBLE)`.
    *
    * Residual tie surface (r15 ADVICE, documented deliberately): the
    * per-row DOUBLE→DECIMAL(18,6) cast itself has engine-specific tie
    * rounding — Spark quantizes the double's shortest decimal string
    * HALF_UP (`BigDecimal.valueOf`), DuckDB rounds the scaled binary
    * value — so a source double landing within ~half an ulp of an
    * exact x.xxxxxx5 boundary could quantize to adjacent micros per
    * engine. The testdata's money columns are generated FROM 2dp
    * values (no 7th decimal digit exists to tie on), so the surface is
    * unreachable here; a future generator emitting full-precision
    * doubles should generate money as decimals at the source instead.
    */
  private def dsum(c: Column, scale: Int = 2): Column =
    round(sum(c.cast("decimal(18,6)")), scale).cast("double")

  /** Order-independent mean: exact decimal sum, ONE double divide by the
    * group count — the divide operands are bit-identical cross-engine,
    * so the quotient and its round are too. SQL twin:
    * `round(CAST(sum(CAST(x AS DECIMAL(18,6))) AS DOUBLE) / count(*), s)`.
    */
  private def davg(c: Column, scale: Int): Column =
    round(sum(c.cast("decimal(18,6)")).cast("double") / count(lit(1)), scale)

  val queries: Seq[Q] = Seq(

    // ------------------------------------------------------------------
    Q("q01_agg",
      """SELECT l_returnflag, l_linestatus,
        |       CAST(round(sum(CAST(l_quantity AS DECIMAL(18,6))), 2) AS DOUBLE)      AS sum_qty,
        |       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_base_price,
        |       CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_disc_price,
        |       CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_charge,
        |       round(CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) / count(*), 4)      AS avg_qty,
        |       round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / count(*), 4) AS avg_price,
        |       round(CAST(sum(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) / count(*), 4)      AS avg_disc,
        |       count(*)                       AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
          dsum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))).as("sum_charge"),
          davg(col("l_quantity"), 4).as("avg_qty"),
          davg(col("l_extendedprice"), 4).as("avg_price"),
          davg(col("l_discount"), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },

    // ------------------------------------------------------------------
    // Star join: small dims broadcast; the only shuffle joins are the
    // lineitem↔orders fact joins (on their keys) — survives scale-up.
    Q("q02_join_revenue",
      """SELECT n_name,
        |       CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue,
        |       count(*) AS n_items
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation   ON c_nationkey = n_nationkey
        |JOIN region   ON n_regionkey = r_regionkey
        |WHERE r_name IN ('ASIA', 'EUROPE')
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin) { (s, dir) =>
      val li = t(s, dir, "lineitem")
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      val n = t(s, dir, "nation")
      val r = t(s, dir, "region").filter(col("r_name").isin("ASIA", "EUROPE"))
      // customer scales with SF — let AQE pick its join strategy; only the
      // fixed-size dims (nation 25 rows, region 5 rows) are force-broadcast.
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(
          dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("revenue").desc, col("n_name"))
    },

    // ------------------------------------------------------------------
    Q("q03_topk",
      """SELECT o_orderkey, o_custkey, o_totalprice, CAST(o_orderdate AS DATE) AS o_date
        |FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 10""".stripMargin) { (s, dir) =>
      t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
          col("o_orderdate").cast("date").as("o_date"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10)
    },

    // ------------------------------------------------------------------
    // Narrow projection + selective predicate: both reach the parquet
    // scan (PushedFilters / ReadSchema — asserted in graft.PlanSpec).
    Q("q04_filter_scan",
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem
        |WHERE l_quantity >= 49 AND l_discount > 0.07
        |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_quantity") >= 49 && col("l_discount") > 0.07)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"), col("l_extendedprice"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    },

    // ------------------------------------------------------------------
    Q("q05_window_rank",
      """SELECT o_custkey, o_orderkey, o_totalprice, rnk
        |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
        |             row_number() OVER (PARTITION BY o_custkey
        |                                ORDER BY o_totalprice DESC, o_orderkey) AS rnk
        |      FROM orders)
        |WHERE rnk <= 3
        |ORDER BY o_custkey, rnk""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          row_number().over(w).as("rnk"))
        .filter(col("rnk") <= 3)
        .orderBy(col("o_custkey"), col("rnk"))
    },

    // ------------------------------------------------------------------
    Q("q06_distinct_agg",
      """SELECT c_mktsegment,
        |       count(DISTINCT c_nationkey) AS n_nations,
        |       count(*) AS n_customers,
        |       CAST(round(sum(CAST(c_acctbal AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_bal
        |FROM customer
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin) { (s, dir) =>
      t(s, dir, "customer")
        .groupBy(col("c_mktsegment"))
        .agg(
          countDistinct(col("c_nationkey")).as("n_nations"),
          count(lit(1)).as("n_customers"),
          dsum(col("c_acctbal")).as("sum_bal"))
        .orderBy(col("c_mktsegment"))
    },

    // ------------------------------------------------------------------
    Q("q07_anti_join",
      """SELECT c_custkey, c_name
        |FROM customer
        |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
        |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
      t(s, dir, "customer")
        .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    },

    // ------------------------------------------------------------------
    Q("q08_semi_join",
      """SELECT p_partkey, p_name, p_retailprice
        |FROM part
        |WHERE p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_quantity >= 48)
        |ORDER BY p_partkey""".stripMargin) { (s, dir) =>
      t(s, dir, "part")
        .join(t(s, dir, "lineitem").filter(col("l_quantity") >= 48),
          col("p_partkey") === col("l_partkey"), "left_semi")
        .select(col("p_partkey"), col("p_name"), col("p_retailprice"))
        .orderBy(col("p_partkey"))
    },

    // ------------------------------------------------------------------
    Q("q09_rollup",
      """SELECT coalesce(l_returnflag, 'ALL') AS l_returnflag,
        |       coalesce(l_linestatus, 'ALL') AS l_linestatus,
        |       CAST(round(sum(CAST(l_quantity AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_qty,
        |       count(*) AS n
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(dsum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("l_returnflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("l_linestatus"),
          col("sum_qty"), col("n"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },

    // ------------------------------------------------------------------
    Q("q10_events_daily",
      """SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
        |       count(*) AS n, CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_value
        |FROM events
        |GROUP BY event_type, day
        |ORDER BY event_type, day""".stripMargin) { (s, dir) =>
      t(s, dir, "events")
        .groupBy(col("event_type"), date_trunc("day", col("ts")).cast("date").as("day"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
        .orderBy(col("event_type"), col("day"))
    },

    // ------------------------------------------------------------------
    // Sessionization: 30-min inactivity gap, per user. The analytic
    // (lag + cumulative conditional sum) shape of stream session windows.
    Q("q11_sessions",
      """WITH gaps AS (
        |  SELECT user_id, ts, event_id,
        |         CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |                   > 1800000000 THEN 1 ELSE 0 END AS new_session
        |  FROM events),
        |sess AS (
        |  SELECT user_id,
        |         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                                ROWS UNBOUNDED PRECEDING) AS session_id
        |  FROM gaps)
        |SELECT user_id, count(DISTINCT session_id) AS n_sessions, count(*) AS n_events
        |FROM sess GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, dir) =>
      val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val cum = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "events")
        .withColumn("new_session",
          when(unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(byUser)) > 1800000000L, 1)
            .otherwise(0))
        .withColumn("session_id", sum(col("new_session")).over(cum))
        .groupBy(col("user_id"))
        .agg(countDistinct(col("session_id")).as("n_sessions"),
          count(lit(1)).as("n_events"))
        .orderBy(col("user_id"))
    },

    // ------------------------------------------------------------------
    Q("q12_pivot",
      """SELECT user_id,
        |       CAST(round(sum(CAST(CASE WHEN event_type = 'click'    THEN value ELSE 0 END AS DECIMAL(18,6))), 2) AS DOUBLE) AS click,
        |       CAST(round(sum(CAST(CASE WHEN event_type = 'purchase' THEN value ELSE 0 END AS DECIMAL(18,6))), 2) AS DOUBLE) AS purchase,
        |       CAST(round(sum(CAST(CASE WHEN event_type = 'error'    THEN value ELSE 0 END AS DECIMAL(18,6))), 2) AS DOUBLE) AS error
        |FROM events
        |GROUP BY user_id
        |ORDER BY user_id""".stripMargin) { (s, dir) =>
      val e = t(s, dir, "events")
      e.groupBy(col("user_id"))
        .agg(
          dsum(when(col("event_type") === "click", col("value")).otherwise(0)).as("click"),
          dsum(when(col("event_type") === "purchase", col("value")).otherwise(0)).as("purchase"),
          dsum(when(col("event_type") === "error", col("value")).otherwise(0)).as("error"))
        .orderBy(col("user_id"))
    },

    // ------------------------------------------------------------------
    Q("q13_setops",
      """SELECT c_custkey FROM (
        |  SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'F'
        |  INTERSECT
        |  SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 100000
        |) ORDER BY c_custkey""".stripMargin) { (s, dir) =>
      val o = t(s, dir, "orders")
      o.filter(col("o_orderstatus") === "F").select(col("o_custkey").as("c_custkey"))
        .intersect(o.filter(col("o_totalprice") > 100000).select(col("o_custkey").as("c_custkey")))
        .orderBy(col("c_custkey"))
    },

    // ------------------------------------------------------------------
    // Correlated-style: orders above their customer's average price.
    Q("q14_above_avg",
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders JOIN (
        |  SELECT o_custkey AS k,
        |         CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) / count(*) AS avg_price
        |  FROM orders GROUP BY o_custkey
        |) ON o_custkey = k
        |WHERE o_totalprice > 1.5 * avg_price
        |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      val o = t(s, dir, "orders")
      val avgs = o.groupBy(col("o_custkey").as("k"))
        // exact decimal sum + one double divide: the threshold compare
        // below must see the bit-identical avg on both engines (a
        // borderline order flips membership otherwise — dsum/davg note)
        .agg((sum(col("o_totalprice").cast("decimal(18,6)")).cast("double")
          / count(lit(1))).as("avg_price"))
      o.join(avgs, col("o_custkey") === col("k"))
        .filter(col("o_totalprice") > lit(1.5) * col("avg_price"))
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .orderBy(col("o_orderkey"))
    },

    // ------------------------------------------------------------------
    // Scalar-function battery over IEEE-exact ops (abs/ceil/floor/sqrt,
    // string funcs) — no rounding needed, values are bit-exact.
    Q("q15_scalar_funcs",
      """SELECT p_partkey,
        |       upper(p_brand) AS brand_u,
        |       length(p_name) AS name_len,
        |       substr(p_type, 1, 5) AS type5,
        |       abs(p_retailprice - 1000.0) AS dist1k,
        |       CAST(floor(p_retailprice / 100) AS BIGINT) AS price_bucket,
        |       sqrt(CAST(p_size AS DOUBLE)) AS size_sqrt,
        |       CASE WHEN p_size >= 25 THEN 'large' WHEN p_size >= 10 THEN 'mid'
        |            ELSE 'small' END AS size_class
        |FROM part
        |WHERE p_name LIKE '%steel%' OR p_size % 7 = 0
        |ORDER BY p_partkey""".stripMargin) { (s, dir) =>
      t(s, dir, "part")
        .filter(col("p_name").like("%steel%") || col("p_size") % 7 === 0)
        .select(
          col("p_partkey"),
          upper(col("p_brand")).as("brand_u"),
          length(col("p_name")).as("name_len"),
          substring(col("p_type"), 1, 5).as("type5"),
          abs(col("p_retailprice") - 1000.0).as("dist1k"),
          floor(col("p_retailprice") / 100).as("price_bucket"),
          sqrt(col("p_size").cast("double")).as("size_sqrt"),
          when(col("p_size") >= 25, "large").when(col("p_size") >= 10, "mid")
            .otherwise("small").as("size_class"))
        .orderBy(col("p_partkey"))
    },

    // ------------------------------------------------------------------
    // As-of join: each purchase picks up the user's LATEST click within
    // one day. Spark lacks this natively; graft.ops.AsofOps implements it
    // as union + tagged window (one shuffle, linear — never a range-join
    // pair explosion). The oracle states the identical union+window form.
    Q("q16_asof",
      """WITH ev AS (SELECT user_id, event_id, event_type, value, epoch_us(ts) AS tsu FROM events),
        |u AS (
        |  SELECT user_id, tsu, 1 AS tag, event_id,
        |         CAST(NULL AS STRUCT(ats BIGINT, id BIGINT, val DOUBLE)) AS r_struct
        |  FROM ev WHERE event_type = 'purchase'
        |  UNION ALL
        |  SELECT user_id, tsu, 0 AS tag, NULL,
        |         {'ats': tsu, 'id': event_id, 'val': value}
        |  FROM ev WHERE event_type = 'click'),
        |f AS (
        |  SELECT user_id, tsu, tag, event_id,
        |         last_value(r_struct IGNORE NULLS) OVER w AS m
        |  FROM u WINDOW w AS (PARTITION BY user_id ORDER BY tsu, tag, (r_struct).id
        |                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT user_id, event_id, tsu AS ts_us,
        |       CASE WHEN m IS NOT NULL AND tsu - (m).ats <= 86400000000
        |            THEN (m).id END AS click_id,
        |       CASE WHEN m IS NOT NULL AND tsu - (m).ats <= 86400000000
        |            THEN round((m).val, 2) END AS click_value
        |FROM f WHERE tag = 1 ORDER BY user_id, event_id""".stripMargin) { (s, dir) =>
      val ev = t(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("event_type"), col("value"),
          unix_micros(col("ts")).as("tsu"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"), col("tsu"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id"), col("value"), col("tsu"))
      graft.ops.AsofOps.asofJoin(purchases, clicks,
          by = "user_id", ts = "tsu", valueCols = Seq("event_id", "value"),
          tolerance = 86400000000L, tieBreakers = Seq("event_id"))
        .select(col("user_id"), col("event_id"), col("tsu").as("ts_us"),
          col("asof_event_id").as("click_id"),
          round(col("asof_value"), 2).as("click_value"))
        .orderBy(col("user_id"), col("event_id"))
    },

    // ------------------------------------------------------------------
    Q("q17_cube",
      """SELECT coalesce(l_returnflag, 'ALL') AS l_returnflag,
        |       coalesce(l_linestatus, 'ALL') AS l_linestatus,
        |       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_price, count(*) AS n
        |FROM lineitem
        |GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(dsum(col("l_extendedprice")).as("sum_price"), count(lit(1)).as("n"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("l_returnflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("l_linestatus"),
          col("sum_price"), col("n"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },

    // ------------------------------------------------------------------
    // Exact grouped quantiles: Spark's sort-based `percentile` vs
    // DuckDB's quantile_cont — both linear-interpolate on the sorted
    // values; outputs ship ×10⁴-quantized to absorb the engines'
    // different (mathematically equal) interpolation arrangements.
    Q("q18_percentiles",
      """SELECT l_returnflag,
        |       CAST(floor(quantile_cont(l_extendedprice, 0.25) * 10000 + 0.5) AS BIGINT) AS p25_q,
        |       CAST(floor(quantile_cont(l_extendedprice, 0.5) * 10000 + 0.5) AS BIGINT) AS p50_q,
        |       CAST(floor(quantile_cont(l_extendedprice, 0.75) * 10000 + 0.5) AS BIGINT) AS p75_q,
        |       count(*) AS n
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
      def pq(p: Double, name: String) =
        floor(expr(s"percentile(l_extendedprice, $p)") * lit(10000.0) + lit(0.5))
          .cast("long").as(name)
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(pq(0.25, "p25_q"), pq(0.5, "p50_q"), pq(0.75, "p75_q"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"))
    },

    // ------------------------------------------------------------------
    // Band (value-range) join via binned equi-join (ops.RangeOps): the
    // |c_acctbal - s_acctbal| <= 10 predicate has no equi-key, so a
    // naive plan is a per-nation nested-loop cartesian; bucketing by
    // the band width + a 3-candidate expansion restores one hash join
    // (PlanSpec pins no nested-loop). The oracle runs the plain theta
    // join - DuckDB's optimizer can afford it at oracle scale.
    Q("q19_band_join",
      """SELECT c.c_custkey, s.s_suppkey,
        |       CAST(floor((c.c_acctbal - s.s_acctbal) * 100 + 0.5) AS BIGINT) AS diff_q
        |FROM customer c JOIN supplier s
        |  ON c.c_nationkey = s.s_nationkey
        | AND abs(c.c_acctbal - s.s_acctbal) <= 10.0
        |ORDER BY c_custkey, s_suppkey""".stripMargin) { (s, dir) =>
      val cust = t(s, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey").as("nationkey"), col("c_acctbal"))
      val supp = t(s, dir, "supplier")
        .select(col("s_suppkey"), col("s_nationkey").as("nationkey"), col("s_acctbal"))
      graft.ops.RangeOps.bandJoin(cust, supp, Seq("nationkey"),
          "c_acctbal", "s_acctbal", width = 10.0)
        .select(col("c_custkey"), col("s_suppkey"),
          floor((col("c_acctbal") - col("s_acctbal")) * 100 + 0.5)
            .cast("long").as("diff_q"))
        .orderBy(col("c_custkey"), col("s_suppkey"))
    },

    // ------------------------------------------------------------------
    // Sliding event-time windows (3-day window, 1-day slide): each event
    // lands in three epoch-aligned windows — Spark expands the slide
    // internally and aggregates in ONE shuffle; the oracle unnests the
    // three window starts per event explicitly. Completes the window
    // family next to tumbling (q10) and sessions (q11).
    Q("q20_sliding_window",
      """WITH w AS (SELECT CAST(date_trunc('day', ts) AS DATE)
        |                    - CAST(unnest(range(0, 3)) AS INTEGER) AS ws,
        |                  event_type
        |           FROM events)
        |SELECT ws, event_type, CAST(count(*) AS BIGINT) AS n
        |FROM w GROUP BY ws, event_type
        |ORDER BY ws, event_type""".stripMargin) { (s, dir) =>
      t(s, dir, "events")
        .groupBy(window(col("ts"), "3 days", "1 day").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(col("w.start").cast("date").as("ws"), col("event_type"), col("n"))
        .orderBy(col("ws"), col("event_type"))
    },

    // ------------------------------------------------------------------
    // TPC-H Q5 proper (local-supplier volume): SIX tables with the
    // co-nationality predicate l_suppkey→supplier AND s_nationkey =
    // c_nationkey — the classic join-REORDER stress (q02 is a plain
    // star; this one's supplier leg creates the cycle the optimizer
    // must break well). Fixed dims broadcast; customer/orders/supplier
    // scale with SF, so AQE picks their strategies.
    Q("q21_local_supplier",
      """SELECT n_name,
        |       CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue,
        |       count(*) AS n_items
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
        |JOIN nation   ON s_nationkey = n_nationkey
        |JOIN region   ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin) { (s, dir) =>
      val li = t(s, dir, "lineitem")
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      val su = t(s, dir, "supplier")
      val n = t(s, dir, "nation")
      val r = t(s, dir, "region").filter(col("r_name") === "ASIA")
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(su, col("l_suppkey") === col("s_suppkey")
          && col("s_nationkey") === col("c_nationkey"))
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(
          dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("revenue").desc, col("n_name"))
    },

    // ------------------------------------------------------------------
    // UNPIVOT (melt) — the inverse of q12's pivot: one row per (region,
    // metric) from a wide per-region aggregate. Spark's native unpivot
    // operator vs DuckDB's UNPIVOT clause.
    Q("q22_unpivot",
      """WITH w AS (SELECT r_name,
        |                  CAST(count(DISTINCT n_nationkey) AS BIGINT) AS n_nations,
        |                  CAST(count(DISTINCT c_custkey) AS BIGINT) AS n_customers,
        |                  CAST(count(DISTINCT s_suppkey) AS BIGINT) AS n_suppliers
        |           FROM region
        |           JOIN nation ON n_regionkey = r_regionkey
        |           LEFT JOIN customer ON c_nationkey = n_nationkey
        |           LEFT JOIN supplier ON s_nationkey = n_nationkey
        |           GROUP BY r_name)
        |SELECT r_name, metric, value
        |FROM w UNPIVOT (value FOR metric IN (n_nations, n_customers, n_suppliers))
        |ORDER BY r_name, metric""".stripMargin) { (s, dir) =>
      val wide = t(s, dir, "region")
        .join(t(s, dir, "nation"), col("n_regionkey") === col("r_regionkey"))
        .join(t(s, dir, "customer"), col("c_nationkey") === col("n_nationkey"), "left")
        .join(t(s, dir, "supplier"), col("s_nationkey") === col("n_nationkey"), "left")
        .groupBy(col("r_name"))
        .agg(countDistinct(col("n_nationkey")).as("n_nations"),
          countDistinct(col("c_custkey")).as("n_customers"),
          countDistinct(col("s_suppkey")).as("n_suppliers"))
      wide.unpivot(Array(col("r_name")),
          Array(col("n_nations"), col("n_customers"), col("n_suppliers")),
          "metric", "value")
        .orderBy(col("r_name"), col("metric"))
    },

    // ------------------------------------------------------------------
    // GROUPING SETS with grouping_id — the sparse cousin of q09's
    // rollup / q17's cube: exactly the (status, priority), (status),
    // (priority) combinations, none of cube's full lattice. Expressed
    // through the SQL surface (the DataFrame API exposes only
    // rollup/cube); grouping_id disambiguates the NULL-key rows.
    Q("q23_grouping_sets",
      """SELECT o_orderstatus, o_orderpriority,
        |       CAST(grouping(o_orderstatus) * 2 + grouping(o_orderpriority)
        |            AS BIGINT) AS gid,
        |       CAST(count(*) AS BIGINT) AS n,
        |       CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS total
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
        |                        (o_orderstatus), (o_orderpriority))
        |ORDER BY gid, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin) { (s, dir) =>
      t(s, dir, "orders").createOrReplaceTempView("orders_gs")
      s.sql(
        """SELECT o_orderstatus, o_orderpriority,
          |       CAST(grouping(o_orderstatus) * 2 + grouping(o_orderpriority)
          |            AS BIGINT) AS gid,
          |       CAST(count(*) AS BIGINT) AS n,
          |       CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS total
          |FROM orders_gs
          |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
          |                        (o_orderstatus), (o_orderpriority))
          |ORDER BY gid, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin)
    },

    // ------------------------------------------------------------------
    // Correlated scalar subquery, TPC-H Q17 shape (small-quantity-order
    // revenue): the per-part average quantity sits INSIDE the filter,
    // correlated on p_partkey. Expressed through the SQL surface so
    // Catalyst's RewriteCorrelatedScalarSubquery decorrelates it — the
    // physical plan is ONE extra aggregate over lineitem joined back on
    // l_partkey, never a per-row re-execution (pinned in PlanSpec: two
    // lineitem scans, one join cascade, no nested-loop). avg(l_quantity)
    // is exact cross-engine: quantities are integral doubles, so the sum
    // is order-independent and the single divide + 0.2 multiply are
    // IEEE-identical in both engines. Scale shape: the per-part agg
    // shuffles on l_partkey (same key as the join), part is dim-sized →
    // broadcast; survives a 100× fact table unchanged.
    Q("q24_corr_subquery",
      """SELECT p_brand, round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / 7.0, 2) AS avg_yearly
        |FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        |WHERE p.p_brand IN ('Brand#21','Brand#22','Brand#23','Brand#24','Brand#25')
        |  AND l.l_quantity < (SELECT 0.2 * avg(l2.l_quantity)
        |                      FROM lineitem l2 WHERE l2.l_partkey = p.p_partkey)
        |GROUP BY p_brand
        |ORDER BY p_brand""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem").createOrReplaceTempView("lineitem_q24")
      t(s, dir, "part").createOrReplaceTempView("part_q24")
      s.sql(
        """SELECT p_brand, round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / 7.0, 2) AS avg_yearly
          |FROM lineitem_q24 l JOIN part_q24 p ON p.p_partkey = l.l_partkey
          |WHERE p.p_brand IN ('Brand#21','Brand#22','Brand#23','Brand#24','Brand#25')
          |  AND l.l_quantity < (SELECT 0.2 * avg(l2.l_quantity)
          |                      FROM lineitem_q24 l2 WHERE l2.l_partkey = p.p_partkey)
          |GROUP BY p_brand
          |ORDER BY p_brand""".stripMargin)
    }
  )
}
