package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.queries.Tables.t

/** Core relational query registry: one entry per operator family of
  * SURVEY.md §2, mapped onto the TPC-H-ish testdata per FIXTURES.md §B.
  *
  * Determinism rules (the driver hash-compares against DuckDB):
  *  - money sums go through DECIMAL (exact, order-independent), then a
  *    final `CAST(... AS DOUBLE)` on both sides;
  *  - sums of integer-valued doubles (l_quantity) stay double — exact
  *    below 2^53 regardless of reduction order;
  *  - any `limit` sits under a total order (unique tiebreak column);
  *  - counts stay BIGINT on both sides (no DuckDB HUGEINT leaking out).
  */
object CoreQueries {

  private val dec12 = DecimalType(12, 2)
  private val dec4 = DecimalType(4, 2)
  // q-argmax composite tie-break key: cents * PACK + orderkey, unique
  // and order-preserving in 64 bits. One definition, both engines.
  private val ARGMAX_PACK = 1000000000L
  private def one = lit(1).cast(DecimalType(3, 2))

  val all: Seq[Q] = Seq(
    // ----------------------------------------------------------------
    Q(
      "q01_pricing_summary",
      "Flagship TPC-H Q1-shaped aggregation (reference A-family: grouped " +
        "sums/avgs; src/transform.py has no measure aggs, this is the " +
        "harness headline). Decimal-exact money arithmetic.",
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        li.filter(col("l_shipdate") <= to_timestamp(lit("2001-09-01")))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            sum(col("l_quantity")).as("sum_qty"),
            sum(col("l_extendedprice").cast(dec12)).cast(DoubleType).as("sum_base_price"),
            sum(col("l_extendedprice").cast(dec12) * (one - col("l_discount").cast(dec4)))
              .cast(DoubleType).as("sum_disc_price"),
            sum(col("l_extendedprice").cast(dec12) * (one - col("l_discount").cast(dec4))
              * (one + col("l_tax").cast(dec4))).cast(DoubleType).as("sum_charge"),
            (sum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
            (sum(col("l_extendedprice").cast(dec12)).cast(DoubleType) / count(lit(1))).as("avg_price"),
            (sum(col("l_discount").cast(dec4)).cast(DoubleType) / count(lit(1))).as("avg_disc"),
            count(lit(1)).as("count_order"))
          .orderBy(col("l_returnflag"), col("l_linestatus"))
      },
      Some("""
        SELECT l_returnflag, l_linestatus,
               sum(l_quantity) AS sum_qty,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2))) * (CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
               sum(l_quantity) / count(*) AS avg_qty,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_price,
               CAST(sum(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / count(*) AS avg_disc,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2001-09-01'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus""")),
    // ----------------------------------------------------------------
    Q(
      "q02_company_filter",
      "P1-P4/P6: projection + equality filters + null-drop " +
        "(ref src/extract.py:37-61 company-master chain) on customer.",
      (s, dir) =>
        t(s, dir, "customer")
          .select("c_custkey", "c_name", "c_acctbal", "c_mktsegment")
          .filter(col("c_mktsegment") === lit("BUILDING"))
          .filter(col("c_acctbal") > lit(1000.0))
          .na.drop(Seq("c_name")),
      Some("""
        SELECT c_custkey, c_name, c_acctbal, c_mktsegment
        FROM customer
        WHERE c_mktsegment = 'BUILDING' AND c_acctbal > 1000.0
          AND c_name IS NOT NULL""")),
    // ----------------------------------------------------------------
    Q(
      "q03_notin_filter",
      "P5: NOT-IN exclusion filter (ref src/extract.py:53-60 industry " +
        "exclusion) on part brands.",
      (s, dir) =>
        t(s, dir, "part")
          .select("p_partkey", "p_brand", "p_type", "p_size")
          .filter(!col("p_brand").isin("Brand#1", "Brand#2", "Brand#3"))
          .filter(col("p_size") >= lit(10)),
      Some("""
        SELECT p_partkey, p_brand, p_type, p_size
        FROM part
        WHERE p_brand NOT IN ('Brand#1', 'Brand#2', 'Brand#3')
          AND p_size >= 10""")),
    // ----------------------------------------------------------------
    Q(
      "q04_doc_semi_join",
      "J2/P7: broadcast left-semi membership join + isin (ref " +
        "src/extract.py:149-162 doc filter): orders whose customer is in " +
        "the filtered dimension, restricted to target priorities.",
      (s, dir) => {
        val orders = t(s, dir, "orders")
        val cust = t(s, dir, "customer")
          .filter(col("c_mktsegment") === lit("AUTOMOBILE"))
          .select(col("c_custkey").as("o_custkey"))
        orders
          .join(broadcast(cust), Seq("o_custkey"), "left_semi")
          .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
          .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
      },
      Some("""
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE')
          AND o_orderpriority IN ('1-URGENT', '2-HIGH')""")),
    // ----------------------------------------------------------------
    Q(
      "q05_anti_join",
      "Anti-join complement of J2 (customers with no orders) — broadcast " +
        "left-anti.",
      (s, dir) => {
        val cust = t(s, dir, "customer")
        val urgent = t(s, dir, "orders")
          .filter(col("o_orderpriority") === "1-URGENT")
          .select(col("o_custkey").as("c_custkey"))
        cust.join(urgent, Seq("c_custkey"), "left_anti")
          .select("c_custkey", "c_name", "c_mktsegment")
      },
      Some("""
        SELECT c_custkey, c_name, c_mktsegment
        FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderpriority = '1-URGENT')""")),
    // ----------------------------------------------------------------
    Q(
      "q06_best_per_group",
      "A1: top-1-per-group window (ref src/transform.py:109-145 " +
        "best-file-per-company): latest order per customer, deterministic " +
        "tiebreak on orderkey.",
      (s, dir) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
        t(s, dir, "orders")
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
      },
      Some("""
        SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice
        FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
                ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
              FROM orders)
        WHERE rn = 1""")),
    // ----------------------------------------------------------------
    Q(
      "q07_argmax",
      "A2: argmax (ref src/utils/helper.py:77 largest-member select) — " +
        "per return flag, the lineitem orderkey carrying the max " +
        "extendedprice; tie-broken via a composite integer key so both " +
        "engines agree bit-for-bit.",
      (s, dir) => {
        // price has 2dp: cents*PACK + orderkey is a unique, order-preserving
        // 64-bit key (max ~5e16 + 6e5 << 2^63).
        val key = (round(col("l_extendedprice") * 100).cast(LongType)
          * lit(ARGMAX_PACK) + col("l_orderkey"))
        t(s, dir, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(
            max_by(col("l_orderkey"), key).as("best_orderkey"),
            max(col("l_extendedprice")).as("best_price"),
            count(lit(1)).as("n"))
          .orderBy("l_returnflag")
      },
      Some(s"""
        SELECT l_returnflag,
               arg_max(l_orderkey, CAST(round(l_extendedprice * 100) AS BIGINT) * $ARGMAX_PACK + l_orderkey) AS best_orderkey,
               max(l_extendedprice) AS best_price,
               count(*) AS n
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),
    // ----------------------------------------------------------------
    Q(
      "q08_enrich_join",
      "J1: dimension-enrichment joins (ref src/transform.py:204-211 " +
        "company attrs onto revenue rows): orders -> customer -> nation -> " +
        "region, rolled up by region/nation. Dims broadcast.",
      (s, dir) => {
        val o = t(s, dir, "orders")
        val c = t(s, dir, "customer").select("c_custkey", "c_nationkey")
        val n = t(s, dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
        val r = t(s, dir, "region")
        o.join(c, o("o_custkey") === c("c_custkey"))
          .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
          .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
          .groupBy(col("r_name"), col("n_name"))
          .agg(
            count(lit(1)).as("n_orders"),
            sum(col("o_totalprice").cast(dec12)).cast(DoubleType).as("revenue"))
          .orderBy(col("r_name"), col("n_name"))
      },
      Some("""
        SELECT r_name, n_name, count(*) AS n_orders,
               CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name, n_name ORDER BY r_name, n_name""")),
    // ----------------------------------------------------------------
    Q(
      "q09_limit_ordered",
      "L1/L2: limit under a total order (ref src/extract.py:204-205, " +
        "src/transform.py:96-98 head-N slices): top-10 orders by price.",
      (s, dir) =>
        t(s, dir, "orders")
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
          .limit(10)
          .select("o_orderkey", "o_custkey", "o_totalprice"),
      Some("""
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""")),
    // ----------------------------------------------------------------
    Q(
      "q10_union_all",
      "L3/L4: union-all of homogeneous branches then aggregate (ref " +
        "src/extract.py:113-127, src/transform.py:241-250 concat).",
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        val a = li.filter(col("l_returnflag") === "A")
        val n = li.filter(col("l_returnflag") === "N")
        a.unionByName(n)
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("sum_qty"))
          .orderBy(col("l_returnflag"), col("l_linestatus"))
      },
      Some("""
        SELECT l_returnflag, l_linestatus, count(*) AS n, sum(l_quantity) AS sum_qty
        FROM (SELECT * FROM lineitem WHERE l_returnflag = 'A'
              UNION ALL
              SELECT * FROM lineitem WHERE l_returnflag = 'N')
        GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""")),
    // ----------------------------------------------------------------
    Q(
      "q11_first_per_key",
      "A4: scalar first-value per key (ref src/transform.py:99-102 " +
        "fiscal-year-end lookup): earliest order's priority per customer.",
      (s, dir) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
        t(s, dir, "orders")
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("o_custkey"), col("o_orderpriority").as("first_priority"),
            col("o_orderdate").as("first_date"))
      },
      Some("""
        SELECT o_custkey, o_orderpriority AS first_priority, o_orderdate AS first_date
        FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
                ORDER BY o_orderdate ASC, o_orderkey ASC) AS rn FROM orders)
        WHERE rn = 1""")),
    // ----------------------------------------------------------------
    Q(
      "q12_year_decode",
      "F6: relative-year decode map + year arithmetic (ref " +
        "src/transform.py:171-177,189-194): priority -> offset, " +
        "actual_year = year(o_orderdate) + offset.",
      (s, dir) => {
        val offset = when(col("o_orderpriority") === "1-URGENT", 0)
          .when(col("o_orderpriority") === "2-HIGH", -1)
          .when(col("o_orderpriority") === "3-MEDIUM", -2)
          .when(col("o_orderpriority") === "4-NOT SPECIFIED", -3)
          .otherwise(-4)
        t(s, dir, "orders")
          .withColumn("actual_year",
            (year(col("o_orderdate")) + offset).cast("long"))
          .groupBy(col("actual_year"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("actual_year"))
      },
      Some("""
        SELECT year(o_orderdate) + CASE o_orderpriority
                 WHEN '1-URGENT' THEN 0 WHEN '2-HIGH' THEN -1
                 WHEN '3-MEDIUM' THEN -2 WHEN '4-NOT SPECIFIED' THEN -3
                 ELSE -4 END AS actual_year,
               count(*) AS n
        FROM orders GROUP BY 1 ORDER BY 1""")),
    // ----------------------------------------------------------------
    Q(
      "q13_try_cast_skip",
      "P11/F7: try-cast with skip-not-null semantics (ref " +
        "src/transform.py:196-202 int() ValueError -> drop row): extract " +
        "numeric k from events.props JSON-ish string, drop failures.",
      (s, dir) =>
        t(s, dir, "events")
          .withColumn("k_str", regexp_extract(col("props"), "\"k\":\\s*(-?\\d+)", 1))
          .withColumn("k", expr("try_cast(k_str AS BIGINT)"))
          .filter(col("k").isNotNull)
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"))
          .orderBy(col("event_type")),
      Some("""
        SELECT event_type, count(*) AS n, CAST(sum(k) AS BIGINT) AS sum_k
        FROM (SELECT event_type,
                     TRY_CAST(regexp_extract(props, '"k":\s*(-?\d+)', 1) AS BIGINT) AS k
              FROM events)
        WHERE k IS NOT NULL
        GROUP BY event_type ORDER BY event_type""")),
    // ----------------------------------------------------------------
    Q(
      "q14_regex_extract",
      "F9: regex group extraction (ref src/transform.py:120 filename " +
        "regex): digits out of c_name, cast, verify against key.",
      (s, dir) =>
        t(s, dir, "customer")
          .select(
            col("c_custkey"),
            regexp_extract(col("c_name"), "Customer#(\\d+)", 1).cast(LongType).as("name_id"))
          .withColumn("id_matches", (col("name_id") === col("c_custkey")).cast(IntegerType)),
      Some("""
        SELECT c_custkey,
               CAST(regexp_extract(c_name, 'Customer#(\d+)', 1) AS BIGINT) AS name_id,
               CAST(CAST(regexp_extract(c_name, 'Customer#(\d+)', 1) AS BIGINT) = c_custkey AS INTEGER) AS id_matches
        FROM customer""")),
    // ----------------------------------------------------------------
    Q(
      "q15_split_part",
      "F8: string split + positional index (ref src/transform.py:160-162 " +
        "filename.split('_')[0]).",
      (s, dir) =>
        t(s, dir, "supplier")
          .select(
            col("s_suppkey"),
            split(col("s_name"), "#").getItem(0).as("name_prefix"),
            split(col("s_name"), "#").getItem(1).as("name_suffix")),
      Some("""
        SELECT s_suppkey,
               split_part(s_name, '#', 1) AS name_prefix,
               split_part(s_name, '#', 2) AS name_suffix
        FROM supplier""")),
    // ----------------------------------------------------------------
    Q(
      "q16_date_bucket",
      "F3/F11: date formatting/bucketing (ref strftime uses): orders per " +
        "yyyy-MM month string.",
      (s, dir) =>
        t(s, dir, "orders")
          .withColumn("ym", date_format(col("o_orderdate"), "yyyy-MM"))
          .groupBy(col("ym"))
          .agg(count(lit(1)).as("n"),
            sum(col("o_totalprice").cast(dec12)).cast(DoubleType).as("revenue"))
          .orderBy(col("ym")),
      Some("""
        SELECT strftime(o_orderdate, '%Y-%m') AS ym, count(*) AS n,
               CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue
        FROM orders GROUP BY ym ORDER BY ym""")),
    // ----------------------------------------------------------------
    Q(
      "q17_date_sequence",
      "F2: inclusive daily date-range generation (ref " +
        "src/extract.py:107-111 while-loop -> sequence+explode), rolled " +
        "up to month lengths.",
      (s, dir) => {
        val days = s.range(1).select(
          explode(sequence(
            to_date(lit("1995-01-01")), to_date(lit("1995-12-31")),
            expr("interval 1 day"))).as("d"))
        days.groupBy(month(col("d")).cast("long").as("m"))
          .agg(count(lit(1)).as("n_days"), min(col("d")).as("first_day"),
            max(col("d")).as("last_day"))
          .orderBy(col("m"))
      },
      Some("""
        SELECT month(d) AS m, count(*) AS n_days, min(d) AS first_day, max(d) AS last_day
        FROM (SELECT CAST(unnest(generate_series(DATE '1995-01-01', DATE '1995-12-31', INTERVAL 1 day)) AS DATE) AS d)
        GROUP BY m ORDER BY m""")),
    // ----------------------------------------------------------------
    Q(
      "q18_distinct",
      "Set-op distinct (generalization of the reference's set-based " +
        "membership, src/extract.py:151).",
      (s, dir) =>
        t(s, dir, "customer")
          .select("c_nationkey", "c_mktsegment")
          .distinct(),
      Some("SELECT DISTINCT c_nationkey, c_mktsegment FROM customer")),
    // ----------------------------------------------------------------
    Q(
      "q19_window_hourly",
      "Streaming-shaped batch query: tumbling 1h event windows (batch " +
        "equivalent of the streaming module; events table).",
      (s, dir) =>
        t(s, dir, "events")
          .withColumn("bucket", date_trunc("hour", col("ts")))
          .groupBy(col("bucket"), col("event_type"))
          .agg(count(lit(1)).as("n"),
            sum(col("value").cast(dec12)).cast(DoubleType).as("sum_value"))
          .orderBy(col("bucket"), col("event_type")),
      Some("""
        SELECT date_trunc('hour', ts) AS bucket, event_type, count(*) AS n,
               CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
        FROM events GROUP BY bucket, event_type ORDER BY bucket, event_type""")),
    // ----------------------------------------------------------------
    Q(
      "q36_rollup",
      "Hierarchical rollup (beyond the reference: grouping-set " +
        "aggregation): order counts/revenue by (year, priority) with " +
        "subtotal and grand-total rows; nulls sentineled for the " +
        "cross-engine compare.",
      (s, dir) =>
        t(s, dir, "orders")
          .withColumn("y", year(col("o_orderdate")))
          .rollup(col("y"), col("o_orderpriority"))
          .agg(count(lit(1)).as("n"),
            sum(col("o_totalprice").cast(DecimalType(12, 2))).cast(DoubleType).as("revenue"))
          .select(
            coalesce(col("y").cast(StringType), lit("ALL")).as("y"),
            coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
            col("n"), col("revenue")),
      Some("""
        SELECT coalesce(CAST(y AS VARCHAR), 'ALL') AS y,
               coalesce(o_orderpriority, 'ALL') AS priority,
               count(*) AS n,
               CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue
        FROM (SELECT year(o_orderdate) AS y, o_orderpriority, o_totalprice FROM orders)
        GROUP BY ROLLUP (y, o_orderpriority)""")),
    // ----------------------------------------------------------------
    Q(
      "q111_cube",
      "Full grouping-set CUBE (the lattice q36's rollup only walks one " +
        "path of): event counts and exact decimal value sums for every " +
        "combination of (event_type, hour-of-day) including both " +
        "marginals and the grand total — one shuffle with a " +
        "grouping-id expand, not four scans; nulls sentineled for the " +
        "cross-engine compare like q36.",
      (s, dir) =>
        t(s, dir, "events")
          .withColumn("hod", hour(col("ts")))
          .cube(col("event_type"), col("hod"))
          .agg(count(lit(1)).as("n"),
            sum(col("value").cast(dec12)).cast(DoubleType).as("sum_value"))
          .select(
            coalesce(col("event_type"), lit("ALL")).as("event_type"),
            coalesce(col("hod").cast(StringType), lit("ALL")).as("hod"),
            col("n"), col("sum_value")),
      Some("""
        SELECT coalesce(event_type, 'ALL') AS event_type,
               coalesce(CAST(hod AS VARCHAR), 'ALL') AS hod,
               count(*) AS n,
               CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
        FROM (SELECT event_type, hour(ts) AS hod, value FROM events)
        GROUP BY CUBE (event_type, hod)""")),
    // ----------------------------------------------------------------
    Q(
      "q37_except",
      "Set difference: nations present among customers but absent among " +
        "suppliers (EXCEPT distinct semantics).",
      (s, dir) =>
        t(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
          .except(t(s, dir, "supplier").select(col("s_nationkey").as("nationkey"))),
      Some("""
        SELECT c_nationkey AS nationkey FROM customer
        EXCEPT
        SELECT s_nationkey AS nationkey FROM supplier""")),
    // ----------------------------------------------------------------
    Q(
      "q38_intersect",
      "Set intersection: nations with both customers and suppliers.",
      (s, dir) =>
        t(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
          .intersect(t(s, dir, "supplier").select(col("s_nationkey").as("nationkey"))),
      Some("""
        SELECT c_nationkey AS nationkey FROM customer
        INTERSECT
        SELECT s_nationkey AS nationkey FROM supplier""")),
    // ----------------------------------------------------------------
    Q(
      "q20_coalesce_const",
      "F12/F13: constant columns + coalesce defaulting (ref " +
        "src/transform.py:64,208 'Japan' / unitRef default).",
      (s, dir) =>
        t(s, dir, "supplier")
          .select(
            col("s_suppkey"),
            coalesce(nullif(col("s_name"), lit("")), lit("UNKNOWN")).as("s_nm"),
            lit("Japan").as("geonameen"),
            lit("JPY").as("unit")),
      Some("""
        SELECT s_suppkey,
               coalesce(nullif(s_name, ''), 'UNKNOWN') AS s_nm,
               'Japan' AS geonameen, 'JPY' AS unit
        FROM supplier"""))
  )
}
