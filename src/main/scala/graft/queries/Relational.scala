package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.catalog.Tables
import QueryDef._

/** The reference delegates all relational work to backend DBMSes via opaque
  * step SQL (SURVEY §2.5); in this engine the "backend" for managed tables is
  * Spark itself, so these queries ARE the engine's relational surface:
  * the step-SQL shapes (aggregation, joins, windows, unions) the reference's
  * own reports and monitoring app issue, re-expressed as Catalyst plans.
  *
  * Scale notes apply to each query in its scaladoc — all of these run on
  * the TPC-H-ish testdata but are written for a 1000-executor cluster:
  * dimension joins broadcast, aggregations are partial (map-side combine),
  * filters and projections reach the parquet scan.
  */
object Relational {

  private def li(s: SparkSession, dir: String) = Tables.load(s, dir, "lineitem")
  private def ev(s: SparkSession, dir: String) = Tables.load(s, dir, "events")

  /** Flagship pricing-summary aggregation (the shape of a typical step
    * `Befehl` SELECT, cf. `CommandExecuter.cs:322-544` where such SQL runs
    * in the source DBMS). One wide scan → partial agg → 4-group final agg;
    * no join, no skew risk; scales linearly with input.
    */
  val q01 = QueryDef(
    "q01_pricing_summary",
    (s, dir) => {
      import s.implicits._
      val price = $"l_extendedprice".cast("decimal(12,2)")
      val disc = $"l_discount".cast("decimal(4,2)")
      val tax = $"l_tax".cast("decimal(4,2)")
      li(s, dir)
        .filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp"))
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          sum($"l_quantity".cast("decimal(12,2)")).cast("double").as("sum_qty"),
          sum(price).cast("double").as("sum_base_price"),
          sum(price * (lit(1).cast("decimal(3,2)") - disc)).cast("double").as("sum_disc_price"),
          sum(price * (lit(1).cast("decimal(3,2)") - disc) * (lit(1).cast("decimal(3,2)") + tax))
            .cast("double").as("sum_charge"),
          (sum($"l_quantity".cast("decimal(12,2)")).cast("double") / count(lit(1))).as("avg_qty"),
          (sum(disc).cast("double") / count(lit(1))).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy($"l_returnflag", $"l_linestatus")
    },
    Some("""
      SELECT l_returnflag, l_linestatus,
        CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2))) * (CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
        CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
        CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
        COUNT(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus"""))

  /** COPY step payload plan (S1, `CommandExecuter.cs:322-544`): source
    * query → projection/rename to destination names
    * (`CommandExecuter.cs:656-661`) → audit-column injection + schema
    * alignment (`CommandExecuter.cs:603-678`: `Nutzer`, `Abfragezeitpunkt`,
    * `Datenproduzent`, NULL defaults). One narrow stage — at scale this is
    * scan→project→write with no shuffle at all.
    */
  val q02 = QueryDef(
    "q02_copy_align",
    (s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "orders")
        .filter($"o_orderstatus" =!= "F")
        .select(
          $"o_orderkey".as("orderkey"),
          $"o_custkey".as("custkey"),
          $"o_totalprice".as("totalprice"),
          ntz($"o_orderdate").as("orderdate"))
        .withColumn("nutzer", lit("etl_user"))
        .withColumn("abfragezeitpunkt", ntz(lit("2026-01-01 00:00:00").cast("timestamp")))
        .withColumn("datenproduzent", lit("graft"))
        .withColumn("loeschdatum", lit(null).cast("timestamp_ntz"))
    },
    Some("""
      SELECT o_orderkey AS orderkey, o_custkey AS custkey,
             o_totalprice AS totalprice, o_orderdate AS orderdate,
             'etl_user' AS nutzer,
             TIMESTAMP '2026-01-01 00:00:00' AS abfragezeitpunkt,
             'graft' AS datenproduzent,
             CAST(NULL AS TIMESTAMP) AS loeschdatum
      FROM orders WHERE o_orderstatus <> 'F'"""))

  /** Timesliced COPY (S2, `CommandExecuter.cs:50-304`): the reference loops
    * month windows serially; here the whole takeover window is ONE scan and
    * the slices are groups — per-slice row counts/revenue are what the
    * reference writes to its ledger (`ErwarteteDaten`). On a cluster the
    * month key also prunes partitions when the table is date-partitioned.
    */
  val q03 = QueryDef(
    "q03_copy_timeslice",
    (s, dir) => {
      import s.implicits._
      li(s, dir)
        .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
          $"l_shipdate" <= lit("1997-12-31 23:59:59").cast("timestamp"))
        .groupBy(ntz(date_trunc("month", $"l_shipdate")).as("slice_from"))
        .agg(
          count(lit(1)).as("rows_copied"),
          sum($"l_extendedprice".cast("decimal(12,2)")).cast("double").as("slice_revenue"))
        .orderBy($"slice_from")
    },
    Some("""
      SELECT CAST(date_trunc('month', l_shipdate) AS TIMESTAMP) AS slice_from,
             COUNT(*) AS rows_copied,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS slice_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <= TIMESTAMP '1997-12-31 23:59:59'
      GROUP BY 1 ORDER BY 1"""))

  /** Month-window slice generator — the `Zeitscheibe` calculus itself
    * (`CommandExecuter.cs:143-261`): windows are `[from, from+1M-1d]`
    * stepping one month. Pure plan (sequence+explode), no input table; this
    * is the oracle for the boundary math SURVEY §7.5 flags as off-by-one
    * sensitive.
    */
  val q04 = QueryDef(
    "q04_month_windows",
    (s, _) => {
      import s.implicits._
      s.range(1)
        .select(explode(expr(
          "sequence(to_timestamp('2024-01-15'), to_timestamp('2025-06-15'), interval 1 month)"))
          .as("slice_from"))
        .select(
          ntz($"slice_from").as("slice_from"),
          ntz(expr("slice_from + interval 1 month - interval 1 day")).as("slice_to"))
        .orderBy($"slice_from")
    },
    Some("""
      SELECT slice_from, slice_from + INTERVAL 1 MONTH - INTERVAL 1 DAY AS slice_to
      FROM (SELECT unnest(generate_series(TIMESTAMP '2024-01-15',
                    TIMESTAMP '2025-06-15', INTERVAL 1 MONTH)) AS slice_from)
      ORDER BY slice_from"""))

  /** Revenue per region: the star-join shape of the reference's report SQL
    * (e.g. `Helper.cs:922-1025` joins runs × config names × errors).
    * lineitem⋈orders shuffles on orderkey; customer/nation/region are
    * broadcast (they stay small even at 100 TB fact scale).
    */
  val q05 = QueryDef(
    "q05_revenue_by_region",
    (s, dir) => {
      import s.implicits._
      val orders = Tables.load(s, dir, "orders")
      val cust = Tables.load(s, dir, "customer")
      val nat = Tables.load(s, dir, "nation")
      val reg = Tables.load(s, dir, "region")
      // Aggregate lineitem to one row per order BEFORE the join (r15,
      // guide §2.3 "aggregate before you shuffle"): the fact side
      // reaches the orderkey exchange already combined map-side, the
      // join probes order-sized rows, and countDistinct(o_orderkey)
      // degenerates to count(*) — no Expand doubling the aggregation
      // input. Equivalent because o_orderkey is unique in orders (one
      // joined row per surviving order) and the decimal sum-of-sums is
      // exact, so the final double is bit-identical; the DuckDB oracle
      // is unchanged and pins it.
      val perOrder = li(s, dir)
        .groupBy($"l_orderkey")
        .agg(sum($"l_extendedprice".cast("decimal(12,2)") *
          (lit(1).cast("decimal(3,2)") - $"l_discount".cast("decimal(4,2)")))
          .as("order_rev"))
      perOrder
        .join(orders, $"l_orderkey" === $"o_orderkey")
        .join(broadcast(cust), $"o_custkey" === $"c_custkey")
        .join(broadcast(nat), $"c_nationkey" === $"n_nationkey")
        .join(broadcast(reg), $"n_regionkey" === $"r_regionkey")
        .groupBy($"r_name".as("region"))
        .agg(
          sum($"order_rev").cast("double").as("revenue"),
          count(lit(1)).as("n_orders"))
        .orderBy($"region")
    },
    Some("""
      SELECT r_name AS region,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
        COUNT(DISTINCT o_orderkey) AS n_orders
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY 1 ORDER BY 1"""))

  /** Selective filter + 3-column projection: proves pushdown/pruning reach
    * the scan (`.explain` shows PushedFilters + a 4-field ReadSchema). The
    * reference gets this "for free" by running SQL in the source DBMS
    * (SURVEY §4.1 "Predicate pushdown: total").
    */
  val q06 = QueryDef(
    "q06_filter_pushdown",
    (s, dir) => {
      import s.implicits._
      li(s, dir)
        .filter($"l_returnflag" === "R" &&
          $"l_shipdate" >= lit("2000-01-01").cast("timestamp"))
        .select($"l_orderkey", $"l_linenumber", $"l_quantity")
    },
    Some("""
      SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
      WHERE l_returnflag = 'R' AND l_shipdate >= TIMESTAMP '2000-01-01 00:00:00'"""))

  /** Last event per user — the monitoring app's "last run per workflow"
    * (`app/app.R:327-368`, `MAX(Endzeitpunkt)` CTE) as a ranked window.
    * Shuffles once on user_id; skew-safe because user cardinality ≫
    * partition count in production.
    */
  val q07 = QueryDef(
    "q07_last_event_per_user",
    (s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts".desc, $"event_id".desc)
      ev(s, dir)
        .withColumn("rn", row_number().over(w))
        .filter($"rn" === 1)
        .select($"user_id", ntz($"ts").as("last_ts"), $"event_type".as("last_type"))
        .orderBy($"user_id")
    },
    Some("""
      SELECT user_id, CAST(ts AS TIMESTAMP) AS last_ts, event_type AS last_type
      FROM (SELECT user_id, ts, event_type,
              row_number() OVER (PARTITION BY user_id
                ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rn
            FROM events) WHERE rn = 1
      ORDER BY user_id"""))

  /** 4-level run-timeline UNION (`Helper.cs:915-1112`, `app/app.R:824-898`):
    * per-level aggregates with a level tag, unioned. Each branch is an
    * independent partial-agg; union is append-only (no shuffle beyond the
    * aggs themselves).
    */
  val q08 = QueryDef(
    "q08_timeline_union",
    (s, dir) => {
      import s.implicits._
      val e = ev(s, dir).withColumn("day", ntz(date_trunc("day", $"ts")))
      val lvl1 = e.groupBy($"day").agg(count(lit(1)).as("n"))
        .select(lit("workflow").as("level"), $"day", lit("ALL").as("module"), $"n")
      val lvl2 = e.groupBy($"day", $"event_type").agg(count(lit(1)).as("n"))
        .select(lit("package").as("level"), $"day", $"event_type".as("module"), $"n")
      lvl1.unionByName(lvl2).orderBy($"level", $"day", $"module")
    },
    Some("""
      SELECT * FROM (
        SELECT 'workflow' AS level, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
               'ALL' AS module, COUNT(*) AS n FROM events GROUP BY 2
        UNION ALL
        SELECT 'package', CAST(date_trunc('day', ts) AS TIMESTAMP), event_type, COUNT(*)
        FROM events GROUP BY 2, 3
      ) ORDER BY level, day, module"""))

  /** Error drill-down (`app/app.R:447-486`, `AnalyzeWorkflowError`
    * `Helper.cs:915-1112`): error events joined to the "owner" dimension.
    * The dim side broadcasts.
    */
  val q09 = QueryDef(
    "q09_error_drilldown",
    (s, dir) => {
      import s.implicits._
      val cust = Tables.load(s, dir, "customer")
      ev(s, dir)
        .filter($"event_type" === "error")
        .join(broadcast(cust), $"user_id" === $"c_custkey")
        .groupBy($"user_id", $"c_name".as("name"))
        .agg(
          count(lit(1)).as("n_errors"),
          sum($"value".cast("decimal(12,2)")).cast("double").as("total_value"),
          ntz(max($"ts")).as("last_error_ts"))
        .orderBy($"user_id")
    },
    Some("""
      SELECT user_id, c_name AS name, COUNT(*) AS n_errors,
             CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value,
             CAST(MAX(ts) AS TIMESTAMP) AS last_error_ts
      FROM events JOIN customer ON user_id = c_custkey
      WHERE event_type = 'error'
      GROUP BY 1, 2 ORDER BY 1"""))

  /** CSV serializer semantics (S4, `CommandExecuter.cs:2140-2365`): the
    * formatted line the reference writes — configurable date format, null
    * marker, quote-wrapping of strings (`2291-2317`) — materialized as a
    * column so it hash-checks. Export itself is `df.write.csv` (see
    * steps.CsvExportStep); this verifies the formatting contract.
    */
  val q10 = QueryDef(
    "q10_csv_format",
    (s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "orders")
        .filter($"o_orderkey" <= 1000)
        .select(
          $"o_orderkey",
          concat(lit("\""), $"o_orderstatus", lit("\"")).as("status_quoted"),
          date_format($"o_orderdate", "yyyy-MM-dd'T'HH:mm:ss").as("orderdate_fmt"),
          coalesce($"o_totalprice".cast("decimal(12,2)").cast("string"), lit("NULL")).as("price_fmt"))
        .orderBy($"o_orderkey")
    },
    Some("""
      SELECT o_orderkey,
             '"' || o_orderstatus || '"' AS status_quoted,
             strftime(o_orderdate, '%Y-%m-%dT%H:%M:%S') AS orderdate_fmt,
             COALESCE(CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS VARCHAR), 'NULL') AS price_fmt
      FROM orders WHERE o_orderkey <= 1000 ORDER BY o_orderkey"""))

  /** Idempotent ingest (dedup-before-append, `CommandExecuter.cs:1736-1786`
    * + delete-before-retry `1130-1157`): new rows = source anti-joined
    * against the already-loaded ledger. Left-anti on the key; ledger side
    * broadcasts when small.
    */
  val q11 = QueryDef(
    "q11_idempotent_ingest",
    (s, dir) => {
      import s.implicits._
      val orders = Tables.load(s, dir, "orders")
      val loaded = orders.filter($"o_orderkey" % 7 === 0).select($"o_orderkey")
      orders.join(loaded, Seq("o_orderkey"), "left_anti")
        .groupBy($"o_orderstatus")
        .agg(count(lit(1)).as("n_new"),
          sum($"o_totalprice".cast("decimal(12,2)")).cast("double").as("value_new"))
        .orderBy($"o_orderstatus")
    },
    Some("""
      SELECT o_orderstatus, COUNT(*) AS n_new,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS value_new
      FROM orders WHERE o_orderkey NOT IN
        (SELECT o_orderkey FROM orders WHERE o_orderkey % 7 = 0)
      GROUP BY 1 ORDER BY 1"""))

  /** Sessionization over the event stream: gap > 30 min starts a new
    * session (the batch shape of streaming/Sessionize). lag + running sum —
    * one shuffle on user_id.
    */
  val q12 = QueryDef(
    "q12_sessionize",
    (s, dir) => {
      import s.implicits._
      val byUser = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      ev(s, dir)
        .withColumn("prev_ts", lag($"ts", 1).over(byUser))
        .withColumn("new_session",
          when($"prev_ts".isNull ||
            unix_timestamp($"ts") - unix_timestamp($"prev_ts") > 1800, 1).otherwise(0))
        .withColumn("session_id", sum($"new_session").over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy($"user_id", $"session_id")
        .agg(count(lit(1)).as("n_events"),
          ntz(min($"ts")).as("session_start"))
        .groupBy($"user_id")
        .agg(count(lit(1)).as("n_sessions"),
          max($"n_events").as("max_session_events"))
        .orderBy($"user_id")
    },
    Some("""
      WITH flagged AS (
        SELECT user_id, ts, event_id,
               CASE WHEN lag(ts) OVER w IS NULL
                    OR date_diff('second', lag(ts) OVER w, ts) > 1800
                    THEN 1 ELSE 0 END AS new_session
        FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      ), sess AS (
        SELECT user_id,
               SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        FROM flagged
      ), per_sess AS (
        SELECT user_id, session_id, COUNT(*) AS n_events
        FROM sess GROUP BY 1, 2
      )
      SELECT user_id, COUNT(*) AS n_sessions, MAX(n_events) AS max_session_events
      FROM per_sess GROUP BY 1 ORDER BY 1"""))

  /** ROLLUP aggregation with grouping flags — subtotal report shapes
    * (the reference's summary mails aggregate per level; rollup is the
    * single-pass way to get all levels at once). One expand + one agg
    * shuffle; scales like any grouped aggregation.
    */
  val q25 = QueryDef(
    "q25_rollup",
    (s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "orders")
        .rollup($"o_orderstatus", $"o_orderpriority")
        .agg(
          grouping($"o_orderstatus").cast("long").as("g_status"),
          grouping($"o_orderpriority").cast("long").as("g_priority"),
          count(lit(1)).as("n"),
          sum($"o_totalprice".cast("decimal(12,2)")).cast("double").as("total"))
    },
    Some("""
      SELECT o_orderstatus, o_orderpriority,
             CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
             CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_priority,
             COUNT(*) AS n,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
      FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)"""))

  /** Set operations (INTERSECT / EXCEPT) — returning-vs-churned key
    * analysis. Both are aggregate-style shuffles on the key, no
    * cartesian.
    */
  val q26 = QueryDef(
    "q26_set_ops",
    (s, dir) => {
      import s.implicits._
      val orders = Tables.load(s, dir, "orders")
      val y95 = orders.filter(year($"o_orderdate") === 1995).select($"o_custkey")
      val y96 = orders.filter(year($"o_orderdate") === 1996).select($"o_custkey")
      val retained = y95.intersect(y96).withColumn("cohort", lit("retained"))
      val churned = y95.except(y96).withColumn("cohort", lit("churned"))
      val newcust = y96.except(y95).withColumn("cohort", lit("new"))
      retained.unionByName(churned).unionByName(newcust)
        .groupBy($"cohort").agg(count(lit(1)).as("n_customers"))
    },
    Some("""
      WITH y95 AS (SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995),
           y96 AS (SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996),
           tagged AS (
             SELECT 'retained' AS cohort, * FROM (SELECT * FROM y95 INTERSECT SELECT * FROM y96)
             UNION ALL
             SELECT 'churned', * FROM (SELECT * FROM y95 EXCEPT SELECT * FROM y96)
             UNION ALL
             SELECT 'new', * FROM (SELECT * FROM y96 EXCEPT SELECT * FROM y95)
           )
      SELECT cohort, COUNT(*) AS n_customers FROM tagged GROUP BY 1"""))

  /** Salted aggregation over a deliberately skewed key (3 order
    * statuses ≫ partition count): the two-phase salted plan must equal
    * the plain aggregation bit-for-bit — the oracle computes the plain
    * version, so the gate proves salting is result-transparent. At
    * 100 TB this is the pattern for hot-key aggregations AQE cannot
    * split.
    */
  val q27 = QueryDef(
    "q27_salted_agg",
    (s, dir) => {
      import s.implicits._
      import graft.functions.Skew
      val prepared = Tables.load(s, dir, "orders")
        .select($"o_orderstatus",
          $"o_totalprice".cast("decimal(12,2)").as("price"),
          lit(1L).as("n"))
      Skew.saltedAgg(
        prepared,
        keys = Seq("o_orderstatus"),
        buckets = 16,
        partial = Seq("price" -> (c => sum(c)), "n" -> (c => sum(c))),
        merge = Seq("price" -> (c => sum(c)), "n" -> (c => sum(c))),
        saltSource = $"price")
        .select($"o_orderstatus",
          $"price".cast("double").as("total"),
          $"n".as("n_orders"))
    },
    Some("""
      SELECT o_orderstatus,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total,
             COUNT(*) AS n_orders
      FROM orders GROUP BY 1"""))

  /** Correlated-EXISTS shape as a left-semi join: orders having at
    * least one high-quantity line. Semi joins shuffle once on the key
    * and never multiply rows — the safe form of the EXISTS subqueries
    * the reference's report SQL leans on.
    */
  val q28 = QueryDef(
    "q28_semi_join",
    (s, dir) => {
      import s.implicits._
      val orders = Tables.load(s, dir, "orders")
      val bigLines = li(s, dir).filter($"l_quantity" >= 45).select($"l_orderkey")
      orders.join(bigLines, $"o_orderkey" === $"l_orderkey", "left_semi")
        .groupBy($"o_orderstatus")
        .agg(count(lit(1)).as("n_orders"),
          sum($"o_totalprice".cast("decimal(12,2)")).cast("double").as("total"))
    },
    Some("""
      SELECT o_orderstatus, COUNT(*) AS n_orders,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
      FROM orders WHERE EXISTS (
        SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity >= 45)
      GROUP BY 1"""))

  /** Moving aggregate over a RANGE frame — the sliding-window report
    * shape. Sum and count computed separately in exact decimal/long so
    * both engines divide identical values (an AVG-over-decimal would
    * leave each engine its own internal rounding). Runs through
    * [[graft.operators.BucketedWindow]] so the frame is partitioned by a
    * coarse key bucket with boundary overlap instead of the naive
    * no-partition window that serializes the table through one task
    * (the "WindowExec: No Partition Defined" hazard at scale).
    */
  val q30 = QueryDef(
    "q30_moving_avg",
    (s, dir) => {
      import s.implicits._
      val base = Tables.load(s, dir, "orders")
        .filter($"o_orderkey" <= 2000)
        .select($"o_orderkey", $"o_totalprice")
      graft.operators.BucketedWindow.rangePreceding(
        base, "o_orderkey", preceding = 10, bucketWidth = 256)(Seq(
        "__sum" -> (w => sum(col("o_totalprice").cast("decimal(12,2)")).over(w).cast("double")),
        "__cnt" -> (w => count(lit(1)).over(w))))
        .select($"o_orderkey", ($"__sum" / $"__cnt").as("moving_avg"))
    },
    Some("""
      SELECT o_orderkey,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER w AS DOUBLE) /
          COUNT(*) OVER w AS moving_avg
      FROM orders WHERE o_orderkey <= 2000
      WINDOW w AS (ORDER BY o_orderkey RANGE BETWEEN 10 PRECEDING AND CURRENT ROW)"""))

  /** CUBE aggregation — all grouping combinations in one pass. */
  /** Explicit GROUPING SETS — the general form rollup/cube (q25/q31)
    * special-case: an arbitrary list of grouping combinations in one
    * pass (here: by status, by priority, and the grand total — NOT the
    * full cube). One shuffle; Catalyst expands the sets into a single
    * Expand + aggregate like the cube path.
    */
  val q56 = QueryDef(
    "q56_grouping_sets",
    (s, dir) => {
      Tables.load(s, dir, "orders").createOrReplaceTempView("q56_orders")
      s.sql("""
        SELECT o_orderstatus, o_orderpriority,
               CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
               CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_prio,
               COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
        FROM q56_orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""")
    },
    Some("""
      SELECT o_orderstatus, o_orderpriority,
             CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
             CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_prio,
             COUNT(*) AS n,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
      FROM orders
      GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())"""))

  val q31 = QueryDef(
    "q31_cube",
    (s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "orders")
        .withColumn("y", year($"o_orderdate").cast("long"))
        .cube($"o_orderstatus", $"y")
        .agg(
          grouping($"o_orderstatus").cast("long").as("g_status"),
          grouping($"y").cast("long").as("g_year"),
          count(lit(1)).as("n"))
    },
    Some("""
      SELECT o_orderstatus, CAST(year(o_orderdate) AS BIGINT) AS y,
             CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
             CAST(GROUPING(y) AS BIGINT) AS g_year,
             COUNT(*) AS n
      FROM orders GROUP BY CUBE(o_orderstatus, y)"""))

  /** Exact interpolated percentiles per group. Restricted to the
    * integer-valued quantity column on purpose: interpolation between
    * integers at quarter fractions is exactly representable, so the
    * engines' algebraically-equivalent-but-differently-associated
    * interpolation formulas agree bit-for-bit (over arbitrary doubles
    * the last ulp can differ — DuckDB additionally keeps DECIMAL scale
    * through percentile_cont, rounding interpolated values).
    */
  val q32 = QueryDef(
    "q32_percentiles",
    (s, dir) => {
      import s.implicits._
      li(s, dir)
        .groupBy($"l_returnflag")
        .agg(
          percentile($"l_quantity", lit(0.25)).as("p25_qty"),
          percentile($"l_quantity", lit(0.5)).as("median_qty"),
          percentile($"l_quantity", lit(0.95)).as("p95_qty"))
    },
    Some("""
      SELECT l_returnflag,
        percentile_cont(0.25) WITHIN GROUP (ORDER BY l_quantity) AS p25_qty,
        percentile_cont(0.5) WITHIN GROUP (ORDER BY l_quantity) AS median_qty,
        percentile_cont(0.95) WITHIN GROUP (ORDER BY l_quantity) AS p95_qty
      FROM lineitem GROUP BY 1"""))

  /** Pivot — priority classes to columns. The Spark side uses the real
    * pivot operator (explicit value list so no extra distinct pass);
    * the oracle expresses the same with FILTER aggregates.
    */
  val q33 = QueryDef(
    "q33_pivot",
    (s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "orders")
        .groupBy($"o_orderstatus")
        .pivot("o_orderpriority", Seq("1-URGENT", "3-MEDIUM", "5-LOW"))
        .agg(count(lit(1)))
        .withColumnRenamed("1-URGENT", "urgent")
        .withColumnRenamed("3-MEDIUM", "medium")
        .withColumnRenamed("5-LOW", "low")
    },
    Some("""
      SELECT o_orderstatus,
        COUNT(*) FILTER (o_orderpriority = '1-URGENT') AS urgent,
        COUNT(*) FILTER (o_orderpriority = '3-MEDIUM') AS medium,
        COUNT(*) FILTER (o_orderpriority = '5-LOW') AS low
      FROM orders GROUP BY 1"""))

  /** Date/time scalar-function parity sweep — the calendar arithmetic
    * step SQL leans on everywhere (extract family, end-of-month, date
    * offsets, day diffs, epoch). Day-of-week is normalized to DuckDB's
    * 0=Sunday convention (Spark's is 1=Sunday).
    */
  val q34 = QueryDef(
    "q34_datetime_functions",
    (s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "orders")
        .filter($"o_orderkey" <= 500)
        .select(
          $"o_orderkey",
          year($"o_orderdate").cast("long").as("y"),
          month($"o_orderdate").cast("long").as("m"),
          dayofmonth($"o_orderdate").cast("long").as("d"),
          (dayofweek($"o_orderdate") - 1).cast("long").as("dow"),
          dayofyear($"o_orderdate").cast("long").as("doy"),
          last_day($"o_orderdate").as("eom"),
          ntz($"o_orderdate" + expr("INTERVAL 90 DAYS")).as("due"),
          datediff(to_date($"o_orderdate"), to_date(lit("1995-01-01"))).cast("long").as("days_since"),
          unix_timestamp($"o_orderdate").as("epoch_s"))
    },
    Some("""
      SELECT o_orderkey,
        CAST(year(o_orderdate) AS BIGINT) AS y,
        CAST(month(o_orderdate) AS BIGINT) AS m,
        CAST(day(o_orderdate) AS BIGINT) AS d,
        CAST(dayofweek(o_orderdate) AS BIGINT) AS dow,
        CAST(dayofyear(o_orderdate) AS BIGINT) AS doy,
        CAST(last_day(o_orderdate) AS DATE) AS eom,
        CAST(o_orderdate + INTERVAL 90 DAY AS TIMESTAMP) AS due,
        CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS days_since,
        CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s
      FROM orders WHERE o_orderkey <= 500"""))

  /** String scalar-function parity sweep over the part table. */
  val q35 = QueryDef(
    "q35_string_functions",
    (s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "part")
        .filter($"p_partkey" <= 500)
        .select(
          $"p_partkey",
          upper($"p_type").as("up"),
          lower($"p_brand").as("lo"),
          lpad($"p_partkey".cast("string"), 10, "0").as("padded"),
          regexp_replace($"p_type", " ", "_").as("repl"),
          instr($"p_name", " ").cast("long").as("pos"),
          substring($"p_name", 1, 1).as("first_ch"),
          substring($"p_type", 3, 8).as("mid"),
          reverse($"p_brand").as("rev"),
          concat_ws("|", $"p_brand", $"p_type").as("joined"),
          length($"p_name").cast("long").as("len"),
          trim(lit("  x  ")).as("trimmed"))
    },
    Some("""
      SELECT p_partkey,
        upper(p_type) AS up,
        lower(p_brand) AS lo,
        lpad(CAST(p_partkey AS VARCHAR), 10, '0') AS padded,
        replace(p_type, ' ', '_') AS repl,
        CAST(strpos(p_name, ' ') AS BIGINT) AS pos,
        substr(p_name, 1, 1) AS first_ch,
        substr(p_type, 3, 8) AS mid,
        reverse(p_brand) AS rev,
        concat_ws('|', p_brand, p_type) AS joined,
        CAST(length(p_name) AS BIGINT) AS len,
        trim('  x  ') AS trimmed
      FROM part WHERE p_partkey <= 500"""))

  /** Full outer join with coalesced keys — reconciliation shape (active
    * buyers vs high-balance customers; rows surviving on either side).
    */
  val q37 = QueryDef(
    "q37_full_outer",
    (s, dir) => {
      import s.implicits._
      val buyers = Tables.load(s, dir, "orders")
        .filter(year($"o_orderdate") === 1995)
        .groupBy($"o_custkey".as("k")).agg(count(lit(1)).as("n_orders"))
      val rich = Tables.load(s, dir, "customer")
        .filter($"c_acctbal" > 9000)
        .select($"c_custkey".as("k"), $"c_acctbal")
      buyers.join(rich, Seq("k"), "full_outer")
        .select(
          $"k".as("custkey"),
          coalesce($"n_orders", lit(0L)).as("n_orders"),
          $"c_acctbal")
    },
    Some("""
      SELECT COALESCE(a.k, b.k) AS custkey,
             COALESCE(a.n_orders, 0) AS n_orders, b.c_acctbal
      FROM (SELECT o_custkey AS k, COUNT(*) AS n_orders FROM orders
            WHERE year(o_orderdate) = 1995 GROUP BY 1) a
      FULL OUTER JOIN
           (SELECT c_custkey AS k, c_acctbal FROM customer
            WHERE c_acctbal > 9000) b
      ON a.k = b.k"""))

  /** Conditional + math scalar sweep: CASE, coalesce/nullif,
    * least/greatest, and the IEEE-exact math family (floor/ceil/abs/
    * sqrt/2^n — bit-identical in both engines). Transcendentals
    * (exp/ln) and round-on-double are deliberately excluded: libm vs
    * JVM differ in the last ulp, and the engines' decimal-vs-binary
    * rounding internals differ.
    */
  val q38 = QueryDef(
    "q38_conditional_math",
    (s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "orders")
        .filter($"o_orderkey" <= 500)
        .select(
          $"o_orderkey",
          when($"o_totalprice" > 200000, "large")
            .when($"o_totalprice" > 50000, "medium")
            .otherwise("small").as("bucket"),
          coalesce(nullif($"o_orderstatus", lit("O")), lit("open")).as("status_or_open"),
          least($"o_totalprice", lit(100000.0)).as("capped"),
          greatest($"o_custkey", lit(100L)).as("floored_key"),
          floor($"o_totalprice").cast("long").as("fl"),
          ceil($"o_totalprice").cast("long").as("ce"),
          abs($"o_custkey" - 1000).as("dist"),
          sqrt($"o_totalprice").as("sq"),
          pow(lit(2.0), ($"o_orderkey" % 10).cast("double")).as("p2"))
    },
    Some("""
      SELECT o_orderkey,
        CASE WHEN o_totalprice > 200000 THEN 'large'
             WHEN o_totalprice > 50000 THEN 'medium'
             ELSE 'small' END AS bucket,
        COALESCE(NULLIF(o_orderstatus, 'O'), 'open') AS status_or_open,
        LEAST(o_totalprice, 100000.0) AS capped,
        GREATEST(o_custkey, 100) AS floored_key,
        CAST(FLOOR(o_totalprice) AS BIGINT) AS fl,
        CAST(CEIL(o_totalprice) AS BIGINT) AS ce,
        ABS(o_custkey - 1000) AS dist,
        SQRT(o_totalprice) AS sq,
        POWER(2.0, CAST(o_orderkey % 10 AS DOUBLE)) AS p2
      FROM orders WHERE o_orderkey <= 500"""))

  val all: Seq[QueryDef] = Seq(q01, q02, q03, q04, q05, q06,
    q07, q08, q09, q10, q11, q12, q25, q26, q27, q28, q30, q31, q32, q33,
    q34, q35, q37, q38, q56)
}
