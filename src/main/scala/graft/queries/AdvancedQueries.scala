package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.Portable
import graft.queries.Tables.t

/** Advanced / pipeline-shaped queries: multimodal byte-column metadata
  * and event sessionization (the stateful-streaming semantics expressed
  * as a deterministic batch window query; the incremental form lives in
  * graft.streaming).
  */
object AdvancedQueries {

  // q113 drift histogram: fixed-width value bins, last bin open-ended;
  // BOTH constants shared with the streaming twin (driftStream) and
  // the DuckDB oracle so the three sites cannot drift apart
  private[graft] val DRIFT_BINS = 8
  private[graft] val DRIFT_BIN_WIDTH = 20.0

  // q135: Merkle-summary bucket count — 256 summary rows per side at
  // any table size (a production run sizes this so rows/bucket fits a
  // drill; the reconciliation cost model is unchanged)
  private val DIFF_BUCKETS = 256

  // q143: KMV sketch size per side (rel error ~ 1/sqrt(k))
  private val KMV_JOIN_K = 64
  // q-CDC synthetic insert keys: offset past every real orderkey so
  // inserts never collide with the snapshot. One definition, both
  // engines (the q270-modulus rule).
  private val CDC_INS_OFFSET = 1000000000L

  val all: Seq[Q] = Seq(
    // ----------------------------------------------------------------
    Q(
      "q39_salted_agg",
      "Skew-safe two-stage salted aggregation over the hot event_type " +
        "key (5 values): deterministic salt from event_id, exact " +
        "decimal partials — identical result to the direct groupBy, " +
        "but the wide stage fans out over salt buckets.",
      (s, dir) =>
        graft.operators.Skew.saltedCountSum(
          Tables.t(s, dir, "events"),
          keys = Seq("event_type"),
          saltFrom = col("event_id"),
          saltBuckets = 16,
          sums = Seq(
            (col("value").cast(DecimalType(12, 2)), "sum_value")))
          .withColumn("sum_value", col("sum_value").cast(DoubleType))
          .orderBy("event_type"),
      Some("""
        SELECT event_type, count(*) AS n,
               CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
        FROM events GROUP BY event_type ORDER BY event_type""")),
    // ----------------------------------------------------------------
    Q(
      "q40_weighted_avg",
      "Typed Aggregator (custom UDAF surface): quantity-weighted mean " +
        "price per return flag, exact integer-cents buffer.",
      (s, dir) => {
        import s.implicits._
        import graft.functions.Aggregators
        Tables.t(s, dir, "lineitem")
          .select("l_returnflag", "l_quantity", "l_extendedprice")
          .as[Aggregators.PriceRow]
          .groupByKey(_.l_returnflag)
          .agg(Aggregators.WeightedAvgPrice.toColumn.name("w_avg_price"))
          .toDF("l_returnflag", "w_avg_price")
          .orderBy("l_returnflag")
      },
      Some("""
        SELECT l_returnflag,
               (CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                         * CAST(l_quantity AS BIGINT)) AS BIGINT) / 100.0)
                 / CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS w_avg_price
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),
    // ----------------------------------------------------------------
    Q(
      "q41_pivot",
      "Pivot / crosstab: order counts by year x priority, fixed pivot " +
        "values (missing combinations zeroed to match the oracle's " +
        "FILTER counts).",
      (s, dir) => {
        val prios = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
        val p = Tables.t(s, dir, "orders")
          .withColumn("y", year(col("o_orderdate")).cast("long"))
          .groupBy("y")
          .pivot("o_orderpriority", prios)
          .agg(count(lit(1)))
          .toDF("y", "urgent", "high", "medium", "notspec", "low")
        prios.zip(Seq("urgent", "high", "medium", "notspec", "low")).foldLeft(p) {
          case (df, (_, c)) => df.withColumn(c, coalesce(col(c), lit(0L)))
        }.orderBy("y")
      },
      Some("""
        SELECT year(o_orderdate) AS y,
               count(*) FILTER (o_orderpriority = '1-URGENT') AS urgent,
               count(*) FILTER (o_orderpriority = '2-HIGH') AS high,
               count(*) FILTER (o_orderpriority = '3-MEDIUM') AS medium,
               count(*) FILTER (o_orderpriority = '4-NOT SPECIFIED') AS notspec,
               count(*) FILTER (o_orderpriority = '5-LOW') AS low
        FROM orders GROUP BY y ORDER BY y""")),
    // ----------------------------------------------------------------
    Q(
      "q42_asof_join",
      "Backward as-of join (operator Spark lacks; composed union+window, " +
        "one shuffle, no per-key quadratic work): each event picks up " +
        "the user's most recent order at or before the event time.",
      (s, dir) => {
        val events = Tables.t(s, dir, "events")
          .select("event_id", "user_id", "ts", "event_type")
        val orders = Tables.t(s, dir, "orders")
        graft.operators.AsOfJoin.backward(
          events, "user_id", "ts",
          orders, "o_custkey", "o_orderdate", "o_orderkey")
      },
      Some("""
        WITH u AS (
          SELECT o_custkey AS k, o_orderdate AS t, 0 AS side, o_orderkey AS p,
                 CAST(NULL AS BIGINT) AS event_id, CAST(NULL AS VARCHAR) AS event_type
          FROM orders
          UNION ALL
          SELECT user_id, ts, 1, CAST(NULL AS BIGINT), event_id, event_type
          FROM events),
        c AS (
          SELECT *, last_value(p IGNORE NULLS) OVER (PARTITION BY k
                   ORDER BY t ASC, side ASC, p ASC
                   ROWS UNBOUNDED PRECEDING) AS asof_o_orderkey
          FROM u)
        SELECT event_id, k AS user_id, t AS ts, event_type, asof_o_orderkey
        FROM c WHERE side = 1""")),
    // ----------------------------------------------------------------
    Q(
      "q43_interval_join",
      "Interval (range) join: same-user event pairs where b falls within " +
        "5 minutes after a — equi key + time-range condition, the batch " +
        "twin of the stream-stream join in graft.streaming.",
      (s, dir) => {
        // time-bucketed range join: joining on user alone makes every
        // per-user history a quadratic block (666 events/user at sf0.1
        // -> 440k pair evals per user; unbounded at corpus scale).
        // Bucket ts into window-width cells: a match within [t, t+5min]
        // lives in the probe's cell or the next one, so the probe side
        // explodes into two equi keys and pair work is bounded by
        // in-window density, not history length.
        val W = 300L * 1000000L // 5 min in micros
        val ev = Tables.t(s, dir, "events")
          .select(col("event_id"), col("user_id"), col("ts"),
            expr(s"unix_micros(ts) div $W").as("cell"))
        val probe = ev.select(col("event_id").as("id_a"),
            col("user_id"), col("ts").as("ts_a"),
            explode(array(col("cell"), col("cell") + 1)).as("cell"))
        val build = ev.select(col("event_id").as("id_b"),
          col("user_id"), col("ts").as("ts_b"), col("cell"))
        probe.join(build, Seq("user_id", "cell"))
          .filter(col("ts_b") >= col("ts_a") &&
            col("ts_b") <= col("ts_a") + expr("INTERVAL 5 MINUTES") &&
            col("id_a") =!= col("id_b"))
          .select(col("id_a"), col("id_b"),
            (unix_micros(col("ts_b")) - unix_micros(col("ts_a"))).as("gap_us"))
      },
      Some("""
        SELECT a.event_id AS id_a, b.event_id AS id_b,
               epoch_us(b.ts) - epoch_us(a.ts) AS gap_us
        FROM events a JOIN events b
          ON a.user_id = b.user_id
         AND b.ts >= a.ts
         AND b.ts <= a.ts + INTERVAL 5 MINUTE
         AND a.event_id <> b.event_id""")),
    // ----------------------------------------------------------------
    Q(
      "q34_multimodal_meta",
      "Multimodal column plumbing, metadata side: treat payloads as " +
        "opaque bytes — byte length, content digest, modality tag. (The " +
        "binary decode path is exercised in graft.multimodal with a " +
        "stubbed decoder; parquet testdata has no real media bytes.)",
      (s, dir) =>
        t(s, dir, "documents").select(
          col("doc_id"),
          octet_length(col("text")).cast("long").as("n_bytes"),
          sha2(col("text"), 256).as("digest"),
          when(pmod(col("doc_id"), lit(3)) === 0, "image")
            .when(pmod(col("doc_id"), lit(3)) === 1, "audio")
            .otherwise("video").as("modality")),
      Some("""
        SELECT doc_id,
               octet_length(encode(text)) AS n_bytes,
               sha256(text) AS digest,
               CASE WHEN doc_id % 3 = 0 THEN 'image'
                    WHEN doc_id % 3 = 1 THEN 'audio'
                    ELSE 'video' END AS modality
        FROM documents""")),
    // ----------------------------------------------------------------
    Q(
      "q35_sessionize",
      "Sessionization: per-user sessions split at >30-min gaps " +
        "(lag + cumulative-sum window), rolled up to one row per " +
        "session. The batch-declarative equivalent of " +
        "flatMapGroupsWithState.",
      (s, dir) => {
        val ev = t(s, dir, "events")
        val byUser = Window.partitionBy(col("user_id"))
          .orderBy(col("ts").asc, col("event_id").asc)
        val gapped = ev
          .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
          .withColumn("new_session",
            when(col("prev_ts").isNull, 1)
              // micros, not seconds: DuckDB's epoch() keeps fractions, so a
              // whole-second comparison would disagree on the boundary
              .when(unix_micros(col("ts")) - unix_micros(col("prev_ts")) > 1800L * 1000000L, 1)
              .otherwise(0))
          .withColumn("session_seq",
            sum(col("new_session")).over(
              byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        gapped.groupBy(col("user_id"), col("session_seq"))
          .agg(
            count(lit(1)).as("n_events"),
            min(col("ts")).as("session_start"),
            max(col("ts")).as("session_end"),
            sum(col("value").cast(DecimalType(12, 2))).cast(DoubleType).as("session_value"))
      },
      Some("""
        WITH gapped AS (
          SELECT user_id, ts, value, event_id,
                 CASE WHEN lag(ts) OVER w IS NULL THEN 1
                      WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800 * 1000000 THEN 1
                      ELSE 0 END AS new_session
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)),
        sessions AS (
          SELECT user_id, ts, value,
                 CAST(sum(new_session) OVER (PARTITION BY user_id
                   ORDER BY ts ASC, event_id ASC ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
          FROM gapped)
        SELECT user_id, session_seq, count(*) AS n_events,
               min(ts) AS session_start, max(ts) AS session_end,
               CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS session_value
        FROM sessions GROUP BY user_id, session_seq""")),
    // ----------------------------------------------------------------
    Q(
      "q53_window_analytics",
      "Analytic-window family over per-user event streams (user_id < " +
        "20): sequence number, inter-event gap in exact micros (lag), " +
        "and a running value total in DECIMAL partials (prefix sums " +
        "are order-fixed, so decimal keeps them engine-exact; raw " +
        "double running sums would drift). One shuffle on user_id " +
        "serves all three window functions.",
      (s, dir) => {
        val ev = t(s, dir, "events").filter(col("user_id") < 20)
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts").asc, col("event_id").asc)
        ev.select(
          col("user_id"), col("event_id"),
          row_number().over(w).as("seq"),
          (unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w))
            .as("gap_us"),
          sum(col("value").cast(DecimalType(12, 2)))
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast(DoubleType).as("running_value"))
      },
      Some("""
        SELECT user_id, event_id,
               CAST(row_number() OVER w AS INTEGER) AS seq,
               epoch_us(ts) - lag(epoch_us(ts), 1) OVER w AS gap_us,
               CAST(sum(CAST(value AS DECIMAL(12,2))) OVER
                 (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                  ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_value
        FROM events WHERE user_id < 20
        WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)""")),
    // ----------------------------------------------------------------
    Q(
      "q54_sliding_window",
      "Sliding-window counts (2-hour windows advancing hourly — each " +
        "event lands in exactly 2 buckets) per event type: the batch " +
        "twin of Structured Streaming's overlapping `window()`. The " +
        "oracle reproduces Spark's epoch-aligned window starts with " +
        "an unnest over the slide offsets; map-side combine collapses " +
        "rows before the (window_start, event_type) exchange.",
      (s, dir) =>
        t(s, dir, "events")
          .groupBy(window(col("ts"), "2 hours", "1 hour"), col("event_type"))
          .agg(
            count(lit(1)).as("n"),
            sum(col("value").cast(DecimalType(12, 2))).cast(DoubleType).as("sum_value"))
          .select(col("window.start").as("win_start"), col("event_type"),
            col("n"), col("sum_value")),
      // the interpolated HourUs mirrors the Spark side's "2 hours" /
      // "1 hour" duration strings (epoch-aligned hourly hop)
      Some(s"""
        SELECT make_timestamp(${Units.HourUs} * (epoch_us(ts) // ${Units.HourUs})
                 - i * ${Units.HourUs}) AS win_start,
               event_type, count(*) AS n,
               CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
        FROM events, unnest([CAST(0 AS BIGINT), CAST(1 AS BIGINT)]) AS t(i)
        GROUP BY 1, 2""")),
    // ----------------------------------------------------------------
    Q(
      "q62_json_extract",
      "Typed JSON extraction from the events props column (from_json " +
        "with an explicit schema — malformed rows become nulls, not " +
        "failures; the oracle mirrors that with a json_valid guard, " +
        "DuckDB's json_extract otherwise raises on invalid JSON) and " +
        "grouped stats over the extracted field. The " +
        "semi-structured column pattern every event pipeline needs; " +
        "parsing is a scan-stage projection, the aggregate shuffles " +
        "5 group keys.",
      (s, dir) =>
        t(s, dir, "events")
          .select(col("event_type"),
            from_json(col("props"), StructType.fromDDL("k BIGINT")).getField("k").as("k"))
          .groupBy("event_type")
          .agg(
            count(lit(1)).as("n"),
            count(col("k")).as("n_parsed"),
            sum(col("k")).as("sum_k"),
            min(col("k")).as("min_k"),
            max(col("k")).as("max_k"),
            (sum(col("k")).cast(DoubleType) / count(col("k"))).as("avg_k")),
      Some("""
        SELECT event_type, count(*) AS n,
               CAST(count(k) AS BIGINT) AS n_parsed,
               CAST(sum(k) AS BIGINT) AS sum_k,
               min(k) AS min_k, max(k) AS max_k,
               CAST(sum(k) AS DOUBLE) / count(k) AS avg_k
        FROM (SELECT event_type,
                     CASE WHEN json_valid(props)
                          THEN CAST(json_extract(props, '$.k') AS BIGINT) END AS k
              FROM events)
        GROUP BY event_type""")),
    // ----------------------------------------------------------------
    Q(
      "q98_full_outer",
      "Full-outer reconciliation (the one join shape q01-q97 never " +
        "exercised): each customer's 1995 vs 1996 order counts with " +
        "explicit only-left / only-right / both classification — the " +
        "year-over-year churn table. Null-key handling is the point: " +
        "keys and counts coalesce on BOTH engines identically. One " +
        "shuffle per side on the join key, like any key join; skewed " +
        "keys salt the same way.",
      (s, dir) => {
        val o = t(s, dir, "orders")
        def side(y: Int, k: String, n: String) =
          o.filter(year(col("o_orderdate")) === y)
            .groupBy(col("o_custkey").as(k)).agg(count(lit(1)).as(n))
        side(1995, "ka", "n_1995")
          .join(side(1996, "kb", "n_1996"), col("ka") === col("kb"), "full_outer")
          .select(
            coalesce(col("ka"), col("kb")).as("o_custkey"),
            coalesce(col("n_1995"), lit(0L)).as("n_1995"),
            coalesce(col("n_1996"), lit(0L)).as("n_1996"),
            when(col("ka").isNull, "only_1996")
              .when(col("kb").isNull, "only_1995")
              .otherwise("both").as("presence"))
      },
      Some("""
        WITH a AS (
          SELECT o_custkey AS ka, CAST(count(*) AS BIGINT) AS n_1995
          FROM orders WHERE year(o_orderdate) = 1995 GROUP BY 1),
        b AS (
          SELECT o_custkey AS kb, CAST(count(*) AS BIGINT) AS n_1996
          FROM orders WHERE year(o_orderdate) = 1996 GROUP BY 1)
        SELECT coalesce(ka, kb) AS o_custkey,
               coalesce(n_1995, 0) AS n_1995,
               coalesce(n_1996, 0) AS n_1996,
               CASE WHEN ka IS NULL THEN 'only_1996'
                    WHEN kb IS NULL THEN 'only_1995'
                    ELSE 'both' END AS presence
        FROM a FULL JOIN b ON ka = kb""")),
    // ----------------------------------------------------------------
    Q(
      "q99_grouped_corr",
      "Grouped Pearson correlation (quantity vs price per return flag) " +
        "in EXACT arithmetic: cents and counts accumulate as " +
        "DECIMAL(38,0) sums (HUGEINT on the oracle side), the " +
        "cross-multiplied moments reduce to exact integers, and only " +
        "the final sqrt/divide runs in doubles — so the statistic is " +
        "bit-deterministic under any partitioning, unlike a float " +
        "corr() whose accumulation order drifts. One map-side-combined " +
        "agg; six numbers per group cross the shuffle.",
      (s, dir) => {
        val d18 = DecimalType(38, 0)
        val li = t(s, dir, "lineitem").select(col("l_returnflag"),
          col("l_quantity").cast(LongType).as("x"),
          round(col("l_extendedprice") * 100).cast(LongType).as("y"))
        li.groupBy(col("l_returnflag"))
          .agg(count(lit(1)).cast(d18).as("n"),
            // cast INSIDE the sum: a LongType accumulator would wrap
            // silently at the trillions-of-rows design point
            sum(col("x").cast(d18)).as("sx"),
            sum(col("y").cast(d18)).as("sy"),
            sum((col("x") * col("x")).cast(d18)).as("sxx"),
            sum((col("y").cast(d18) * col("y").cast(d18))).as("syy"),
            sum((col("x") * col("y")).cast(d18)).as("sxy"))
          .select(col("l_returnflag"),
            col("n").cast(LongType).as("n_rows"),
            // exact-zero moment (n=1 or constant column) -> NULL on
            // both engines (Spark 0/0 is NULL, DuckDB's is NaN)
            when(col("n") * col("sxx") === col("sx") * col("sx"), lit(null))
              .when(col("n") * col("syy") === col("sy") * col("sy"), lit(null))
              .otherwise(
                (col("n") * col("sxy") - col("sx") * col("sy")).cast(DoubleType)
                  / (sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast(DoubleType))
                    * sqrt((col("n") * col("syy") - col("sy") * col("sy")).cast(DoubleType))))
              .as("corr_qty_price"))
      },
      Some("""
        WITH m AS (
          SELECT l_returnflag,
                 CAST(count(*) AS HUGEINT) AS n,
                 CAST(sum(CAST(l_quantity AS BIGINT)) AS HUGEINT) AS sx,
                 CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS HUGEINT) AS sy,
                 sum(CAST(l_quantity AS HUGEINT) * CAST(l_quantity AS BIGINT)) AS sxx,
                 sum(CAST(round(l_extendedprice * 100) AS HUGEINT)
                     * CAST(round(l_extendedprice * 100) AS BIGINT)) AS syy,
                 sum(CAST(l_quantity AS HUGEINT)
                     * CAST(round(l_extendedprice * 100) AS BIGINT)) AS sxy
          FROM lineitem GROUP BY l_returnflag)
        SELECT l_returnflag, CAST(n AS BIGINT) AS n_rows,
               CASE WHEN n * sxx = sx * sx OR n * syy = sy * sy THEN NULL
                    ELSE CAST(n * sxy - sx * sy AS DOUBLE)
                         / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                            * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))
               END AS corr_qty_price
        FROM m""")),
    // ----------------------------------------------------------------
    Q(
      "q100_event_funnel",
      "Event funnel (view -> click -> purchase): per user, the first " +
        "view, the first click AFTER that view, and the first purchase " +
        "AFTER that click — the product-analytics operator every event " +
        "warehouse runs. Step times are conditional minima, so each " +
        "stage is a grouped agg keyed on user_id; every join and agg " +
        "shares the one user_id partitioning (the exchange is planned " +
        "once and reused), and dropping out is a LEFT join null, " +
        "classified into reached_step. Timestamps compare exactly " +
        "(micros on both engines).",
      (s, dir) => {
        val e = t(s, dir, "events").select(col("user_id"),
          col("event_type"), col("ts"))
        val v = e.filter(col("event_type") === "view")
          .groupBy(col("user_id")).agg(min(col("ts")).as("t_view"))
        val c = e.join(v, "user_id")
          .filter(col("event_type") === "click" && col("ts") > col("t_view"))
          .groupBy(col("user_id")).agg(min(col("ts")).as("t_click"))
        val p = e.join(c, "user_id")
          .filter(col("event_type") === "purchase" && col("ts") > col("t_click"))
          .groupBy(col("user_id")).agg(min(col("ts")).as("t_purchase"))
        v.join(c, Seq("user_id"), "left").join(p, Seq("user_id"), "left")
          .select(col("user_id"), col("t_view"), col("t_click"),
            col("t_purchase"),
            (lit(1L) + when(col("t_click").isNotNull, 1L).otherwise(0L)
              + when(col("t_purchase").isNotNull, 1L).otherwise(0L))
              .as("reached_step"))
      },
      Some("""
        WITH v AS (
          SELECT user_id, min(ts) AS t_view
          FROM events WHERE event_type = 'view' GROUP BY user_id),
        c AS (
          SELECT e.user_id, min(e.ts) AS t_click
          FROM events e JOIN v USING (user_id)
          WHERE e.event_type = 'click' AND e.ts > v.t_view
          GROUP BY e.user_id),
        p AS (
          SELECT e.user_id, min(e.ts) AS t_purchase
          FROM events e JOIN c USING (user_id)
          WHERE e.event_type = 'purchase' AND e.ts > c.t_click
          GROUP BY e.user_id)
        SELECT v.user_id, t_view, t_click, t_purchase,
               CAST(1 + (t_click IS NOT NULL)::INT
                      + (t_purchase IS NOT NULL)::INT AS BIGINT) AS reached_step
        FROM v LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)""")),
    // ----------------------------------------------------------------
    Q(
      "q128_cohort_retention",
      "Cohort retention matrix — the third leg of the product-" +
        "analytics triad beside the funnel (q100) and sessionization " +
        "(q35): users cohort by their FIRST active day, and each " +
        "(cohort_day, day_offset) cell counts how many of that cohort " +
        "were active again offset days later (offset 0 = cohort " +
        "size). (user, day) pairs dedupe FIRST so the heavy event " +
        "stream collapses to at most users x days rows before " +
        "anything else; the cohort assignment is one user-keyed min " +
        "and an equi-join that reuses the user partitioning; the " +
        "matrix agg outputs cohorts x offsets rows — tiny at any " +
        "scale. All integer/date arithmetic, exact on both engines.",
      (s, dir) => {
        val ud = t(s, dir, "events")
          .select(col("user_id"), to_date(col("ts")).as("d"))
          .distinct()
        val f = ud.groupBy(col("user_id")).agg(min(col("d")).as("cohort_day"))
        ud.join(f, "user_id")
          .groupBy(col("cohort_day"),
            datediff(col("d"), col("cohort_day")).cast(LongType).as("day_offset"))
          .agg(count(lit(1)).as("n_users"))
      },
      Some("""
        WITH ud AS (
          SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
        f AS (
          SELECT user_id, min(d) AS cohort_day FROM ud GROUP BY user_id)
        SELECT cohort_day,
               CAST(datediff('day', cohort_day, d) AS BIGINT) AS day_offset,
               CAST(count(*) AS BIGINT) AS n_users
        FROM ud JOIN f USING (user_id)
        GROUP BY 1, 2""")),
    // ----------------------------------------------------------------
    Q(
      "q104_key_skew",
      "Join-key skew profile — the diagnostic that SIZES a salted " +
        "repartition (q39/operators.Skew) before anyone pays for a " +
        "skewed shuffle: per-key counts for events.user_id, the 10 " +
        "heaviest keys with their corpus share (basis points) and " +
        "skew multiple (cnt / mean-count, i.e. cnt div (total div " +
        "n_keys) — exactly the salt factor a salted agg needs; this " +
        "form never multiplies two corpus-scale counts, so it cannot " +
        "overflow Long where cnt * n_keys would at ~1e10 rows x 1e9 " +
        "keys). All integer arithmetic; the " +
        "1-row totals summary broadcasts by construction; the top-10 " +
        "order is total (cnt desc, key asc). One shuffle on the key, " +
        "key-cardinality rows after it — scale-free.",
      (s, dir) => {
        val c = t(s, dir, "events")
          .groupBy(col("user_id")).agg(count(lit(1)).as("cnt"))
        val tot = c.agg(sum(col("cnt")).as("total"),
          count(lit(1)).as("n_keys"))
        c.crossJoin(broadcast(tot))
          .select(col("user_id"), col("cnt"),
            expr("cnt * 10000 div total").as("share_bp"),
            // every key has cnt >= 1, so total >= n_keys and the mean
            // (total div n_keys) is >= 1 — never a divide-by-zero
            expr("cnt div (total div n_keys)").as("skew_x"))
          .orderBy(col("cnt").desc, col("user_id").asc)
          .limit(10)
      },
      Some("""
        WITH c AS (
          SELECT user_id, CAST(count(*) AS BIGINT) AS cnt
          FROM events GROUP BY user_id),
        s AS (
          SELECT CAST(sum(cnt) AS BIGINT) AS total,
                 CAST(count(*) AS BIGINT) AS n_keys
          FROM c)
        SELECT user_id, cnt,
               cnt * 10000 // total AS share_bp,
               cnt // (total // n_keys) AS skew_x
        FROM c, s
        ORDER BY cnt DESC, user_id ASC
        LIMIT 10""")),
    // ----------------------------------------------------------------
    Q(
      "q105_distribution_drift",
      "Corpus drift monitor: length-histogram comparison between two " +
        "deterministic hash-halves of the corpus (stand-ins for " +
        "yesterday's and today's ingest snapshots) — per length bin " +
        "(n_chars div 100), both counts, both shares, and the " +
        "absolute share gap, all in integer basis points so the " +
        "total-variation distance (sum(abs_diff_bp)/2) carries no " +
        "float drift. The shape of every batch-over-batch data-quality " +
        "gate: one scan, one bin-keyed agg, bin-cardinality rows out.",
      (s, dir) => {
        val d = t(s, dir, "documents").select(
          expr("n_chars div 100").as("bin"),
          (Portable.pmd5(concat(lit("d:"), col("doc_id").cast(StringType))) % 2)
            .as("half"))
        val c = d.groupBy(col("bin")).agg(
          sum(when(col("half") === 0, 1L).otherwise(0L)).as("cnt_a"),
          sum(when(col("half") === 1, 1L).otherwise(0L)).as("cnt_b"))
        val tot = c.agg(sum(col("cnt_a")).as("tot_a"),
          sum(col("cnt_b")).as("tot_b"))
        c.crossJoin(broadcast(tot))
          .select(col("bin"), col("cnt_a"), col("cnt_b"),
            expr("cnt_a * 10000 div tot_a").as("share_a_bp"),
            expr("cnt_b * 10000 div tot_b").as("share_b_bp"),
            abs(expr("cnt_a * 10000 div tot_a") -
              expr("cnt_b * 10000 div tot_b")).as("abs_diff_bp"))
      },
      Some(s"""
        WITH d AS (
          SELECT n_chars // 100 AS bin,
                 ${Portable.pmd5Sql("concat('d:', CAST(doc_id AS VARCHAR))")} % 2 AS half
          FROM documents),
        c AS (
          SELECT bin,
                 CAST(sum(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS BIGINT) AS cnt_a,
                 CAST(sum(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS BIGINT) AS cnt_b
          FROM d GROUP BY bin),
        s AS (
          SELECT CAST(sum(cnt_a) AS BIGINT) AS tot_a,
                 CAST(sum(cnt_b) AS BIGINT) AS tot_b
          FROM c)
        SELECT bin, cnt_a, cnt_b,
               cnt_a * 10000 // tot_a AS share_a_bp,
               cnt_b * 10000 // tot_b AS share_b_bp,
               abs(cnt_a * 10000 // tot_a - cnt_b * 10000 // tot_b) AS abs_diff_bp
        FROM c, s""")),
    // ----------------------------------------------------------------
    Q(
      "q108_attribution",
      "First-click attribution: for every view, the FIRST click by the " +
        "same user within 30 minutes after it — or nulls when none " +
        "came (the left-outer completion of q43's inner interval " +
        "join; graft.streaming.EventsStream.attributionJoin is the " +
        "incremental pair surface). Candidate pairs come from the same " +
        "time-cell equi-join as q43, so per-user pair work is bounded " +
        "by in-horizon density, never history length; 'first' is one " +
        "min(struct) agg (a total order — ties by click_id), and the " +
        "final left join keys on view_id alone.",
      (s, dir) => {
        val W = 1800L * 1000000L // 30 min in micros
        val ev = t(s, dir, "events")
        val views = ev.filter(col("event_type") === "view")
          .select(col("event_id").as("view_id"), col("user_id"),
            col("ts").as("ts_view"),
            expr(s"unix_micros(ts) div $W").as("cell"))
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("event_id").as("click_id"),
            col("user_id").as("user_c"), col("ts").as("ts_click"),
            expr(s"unix_micros(ts) div $W").as("cell"))
        val probe = views.withColumn("cell",
          explode(array(col("cell"), col("cell") + 1)))
        val firsts = probe
          .join(clicks, probe("user_id") === clicks("user_c") &&
            probe("cell") === clicks("cell"))
          .filter(col("ts_click") > col("ts_view") &&
            col("ts_click") <= col("ts_view") + expr("INTERVAL 30 MINUTES"))
          .groupBy(col("view_id"))
          .agg(min(struct(col("ts_click"), col("click_id"))).as("f"))
          .select(col("view_id"), col("f.click_id").as("click_id"),
            col("f.ts_click").as("ts_click"))
        views.select(col("view_id"), col("user_id"), col("ts_view"))
          .join(firsts, Seq("view_id"), "left")
      },
      Some("""
        WITH v AS (
          SELECT event_id AS view_id, user_id, ts AS ts_view
          FROM events WHERE event_type = 'view'),
        c AS (
          SELECT event_id AS click_id, user_id, ts AS ts_click
          FROM events WHERE event_type = 'click'),
        pairs AS (
          SELECT v.view_id, c.click_id, c.ts_click
          FROM v JOIN c ON v.user_id = c.user_id
           AND c.ts_click > v.ts_view
           AND c.ts_click <= v.ts_view + INTERVAL 30 MINUTE),
        firsts AS (
          SELECT view_id, click_id, ts_click
          FROM (SELECT *, row_number() OVER (PARTITION BY view_id
                  ORDER BY ts_click, click_id) AS rn
                FROM pairs)
          WHERE rn = 1)
        SELECT v.view_id, v.user_id, v.ts_view, f.click_id, f.ts_click
        FROM v LEFT JOIN firsts f USING (view_id)""")),
    // ----------------------------------------------------------------
    Q(
      "q113_hourly_drift",
      "Hour-over-hour distribution drift per event type — q105's " +
        "monitor turned longitudinal: an 8-bin value histogram per " +
        "(type, hour), compared with the PREVIOUS hour's via the L1 " +
        "share gap in integer basis points (consecutive hours only — " +
        "a gap in the series restarts the comparison). Binning is a " +
        "fixed-width pivot to 8 columns, so missing bins are honest " +
        "zeros and one lag(struct) window per type serves all nine " +
        "fields; the per-type window partitions by hour count, never " +
        "event count. The streaming twin (EventsStream.driftStream) " +
        "keeps only the last closed histogram per type as state.",
      (s, dir) => {
        // clamp BOTH ends: a negative value would otherwise match no
        // when-branch (silently deflating every share while still
        // counting in n), and the streaming twin would index out of
        // bounds; NaN lands in the top bin in both engines (NaN sorts
        // largest through least/greatest in Spark and DuckDB alike)
        val ev = t(s, dir, "events").select(col("event_type"),
          date_trunc("hour", col("ts")).as("hr"),
          least(lit(DRIFT_BINS - 1),
            greatest(lit(0), floor(col("value") / DRIFT_BIN_WIDTH)))
            .cast("int").as("bin"))
        val hist = ev.groupBy(col("event_type"), col("hr"))
          .agg(count(lit(1)).as("n"),
            (0 until DRIFT_BINS).map(i =>
              sum(when(col("bin") === i, 1L).otherwise(0L)).as(s"b$i")): _*)
        val w = Window.partitionBy(col("event_type")).orderBy(col("hr"))
        val prevFields = struct(col("hr") +: col("n") +:
          (0 until DRIFT_BINS).map(i => col(s"b$i")): _*)
        val l1 = (0 until DRIFT_BINS).map(i =>
          abs(expr(s"b$i * 10000 div n") - expr(s"p.b$i * 10000 div p.n")))
          .reduce(_ + _)
        hist.withColumn("p", lag(prevFields, 1).over(w))
          .filter(col("p").isNotNull &&
            col("p.hr") === col("hr") - expr("INTERVAL 1 HOUR"))
          .select(col("event_type"), col("hr"), col("n"),
            col("p.n").as("prev_n"), l1.as("drift_bp"))
      },
      Some(s"""
        WITH e AS (
          SELECT event_type, date_trunc('hour', ts) AS hr,
                 CAST(least(${DRIFT_BINS - 1},
                      greatest(0, floor(value / $DRIFT_BIN_WIDTH))) AS INT) AS bin
          FROM events),
        h AS (
          SELECT event_type, hr, CAST(count(*) AS BIGINT) AS n,
                 ${(0 until DRIFT_BINS).map(i =>
                   s"CAST(sum(CASE WHEN bin = $i THEN 1 ELSE 0 END) AS BIGINT) AS b$i")
                   .mkString(",\n                 ")}
          FROM e GROUP BY event_type, hr),
        p AS (
          SELECT *, lag(hr) OVER w AS phr, lag(n) OVER w AS pn,
                 ${(0 until DRIFT_BINS).map(i => s"lag(b$i) OVER w AS pb$i")
                   .mkString(", ")}
          FROM h WINDOW w AS (PARTITION BY event_type ORDER BY hr))
        SELECT event_type, hr, n, pn AS prev_n,
               ${(0 until DRIFT_BINS).map(i =>
                 s"abs(b$i * 10000 // n - pb$i * 10000 // pn)").mkString(" + ")}
                 AS drift_bp
        FROM p WHERE phr = hr - INTERVAL 1 HOUR""")),
    // ----------------------------------------------------------------
    Q(
      "q134_table_profile",
      "Relational-table datasheet — the per-COLUMN profile (q68 " +
        "profiles the text corpus; this is its twin for any warehouse " +
        "table): for every column of orders, row count, null count, " +
        "exact distinct count, and min/max rendered to a per-type " +
        "canonical string (integers verbatim, doubles fixed to " +
        "DECIMAL(18,2) — engine-native double formatting diverges in " +
        "scientific-notation thresholds — timestamps to " +
        "'yyyy-MM-dd HH:mm:ss'). One scan, one aggregate row, " +
        "exploded to column-cardinality output; the multi-column " +
        "distinct runs as one expand (6 keys x rows), the accepted " +
        "profiler cost at warehouse scale — and when even that is too " +
        "hot, the swap is q132's HLL registers per column: same " +
        "output shape, constant state.",
      (s, dir) => {
        val o = t(s, dir, "orders")
        def reprOf(c: String, f: Column => Column) =
          Seq(f(min(col(c))).cast(StringType).as(s"min_$c"),
            f(max(col(c))).cast(StringType).as(s"max_$c"))
        val ident = (c: Column) => c
        val money = (c: Column) => c.cast(DecimalType(18, 2))
        val tstamp = (c: Column) => date_format(c, "yyyy-MM-dd HH:mm:ss")
        val cols: Seq[(String, Column => Column)] = Seq(
          "o_orderkey" -> ident, "o_custkey" -> ident,
          "o_orderstatus" -> ident, "o_totalprice" -> money,
          "o_orderdate" -> tstamp, "o_orderpriority" -> ident)
        val aggs = count(lit(1)).as("n_rows") +:
          cols.flatMap { case (c, f) =>
            Seq(sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nn_$c"),
              countDistinct(col(c)).as(s"nd_$c")) ++ reprOf(c, f)
          }
        o.agg(aggs.head, aggs.tail: _*)
          .select(col("n_rows"), explode(array(cols.map { case (c, _) =>
            struct(lit(c).as("column_name"), col(s"nn_$c").as("n_null"),
              col(s"nd_$c").as("n_distinct"), col(s"min_$c").as("min_repr"),
              col(s"max_$c").as("max_repr"))
          }: _*)).as("p"))
          .select(col("p.column_name"), col("n_rows"), col("p.n_null"),
            col("p.n_distinct"), col("p.min_repr"), col("p.max_repr"))
      },
      Some {
        val branches = Seq(
          ("o_orderkey", "CAST(%s AS VARCHAR)"),
          ("o_custkey", "CAST(%s AS VARCHAR)"),
          ("o_orderstatus", "CAST(%s AS VARCHAR)"),
          ("o_totalprice", "CAST(CAST(%s AS DECIMAL(18,2)) AS VARCHAR)"),
          ("o_orderdate", "strftime(%s, '%%Y-%%m-%%d %%H:%%M:%%S')"),
          ("o_orderpriority", "CAST(%s AS VARCHAR)"))
        branches.map { case (c, fmt) =>
          s"""SELECT '$c' AS column_name, CAST(count(*) AS BIGINT) AS n_rows,
             CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
             CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
             ${fmt.format(s"min($c)")} AS min_repr,
             ${fmt.format(s"max($c)")} AS max_repr
        FROM orders"""
        }.mkString("\n        UNION ALL\n        ")
      }),
    // ----------------------------------------------------------------
    Q(
      "q135_snapshot_diff",
      "Merkle-bucket snapshot reconciliation — finding the changed " +
        "rows between two table snapshots WITHOUT a full-table " +
        s"compare: each side folds to $DIFF_BUCKETS (bucket, count, " +
        "xor-of-row-digests) summary rows first (bit_xor commutes and " +
        "self-inverts, so the fold is one map-side-combined agg and " +
        "equal buckets cancel to equal digests); only buckets whose " +
        "summaries DISAGREE are drilled, via a digest full-outer " +
        "restricted to those buckets — at 100 TB a one-row change " +
        "costs one summary pass per side plus one bucket's rows, not " +
        "a table-pair join (the replica-repair / CDC-audit shape). " +
        "Snapshot B is a deterministic in-query mutation of orders " +
        "(drops keys with pmd5 % 97 == 0, rewrites priority where " +
        "pmd5 % 101 == 1), so both engines derive identical sides; " +
        "output is the drilled diff: affected key, bucket, and " +
        "removed/changed classification.",
      (s, dir) => {
        val o = t(s, dir, "orders")
        def digested(df: DataFrame) = df.select(col("o_orderkey"),
          (Portable.pmd5(col("o_orderkey").cast(StringType)) % DIFF_BUCKETS)
            .as("bucket"),
          Portable.pmd5(concat_ws("|", col("o_orderkey"),
            col("o_orderstatus"), col("o_orderpriority"))).as("digest"))
        val keyHash = Portable.pmd5(col("o_orderkey").cast(StringType))
        val a = digested(o)
        val b = digested(o.filter(keyHash % 97 =!= 0)
          .withColumn("o_orderpriority",
            when(keyHash % 101 === 1, lit("0-RECLASSIFIED"))
              .otherwise(col("o_orderpriority"))))
        // each side feeds BOTH the summary agg and the drill join —
        // cache the digested projection so the md5 work runs once
        a.persist(); b.persist()
        def summary(side: DataFrame) = side.groupBy(col("bucket"))
          .agg(count(lit(1)).as("cnt"), expr("bit_xor(digest)").as("dg"))
        val bad = summary(a).as("sa")
          .join(summary(b).as("sb"), Seq("bucket"), "full_outer")
          .filter(coalesce(col("sa.cnt"), lit(-1L)) =!= coalesce(col("sb.cnt"), lit(-2L))
            || coalesce(col("sa.dg"), lit(-1L)) =!= coalesce(col("sb.dg"), lit(-2L)))
          .select(col("bucket"))
        // both drill sides broadcast this (<= DIFF_BUCKETS rows); cache
        // it so the two summary aggs + compare run once, not per side
        bad.persist()
        val da = a.join(broadcast(bad), "bucket")
        val db = b.join(broadcast(bad), "bucket")
        val gone = da.as("x").join(db.as("y"),
            col("x.o_orderkey") === col("y.o_orderkey")
              && col("x.digest") === col("y.digest"), "left_anti")
          .select(col("o_orderkey"), col("bucket"))
        val bKeys = db.select(col("o_orderkey"), lit(1).as("in_b"))
        gone.join(bKeys, Seq("o_orderkey"), "left")
          .select(col("o_orderkey"), col("bucket"),
            when(col("in_b").isNull, lit("removed"))
              .otherwise(lit("changed")).as("change"))
      },
      Some(s"""
        WITH a AS (
          SELECT o_orderkey,
                 ${Portable.pmd5Sql("CAST(o_orderkey AS VARCHAR)")} % $DIFF_BUCKETS AS bucket,
                 ${Portable.pmd5Sql("concat_ws('|', o_orderkey, o_orderstatus, o_orderpriority)")} AS digest
          FROM orders),
        bmut AS (
          SELECT o_orderkey, o_orderstatus,
                 CASE WHEN ${Portable.pmd5Sql("CAST(o_orderkey AS VARCHAR)")} % 101 = 1
                      THEN '0-RECLASSIFIED' ELSE o_orderpriority END AS o_orderpriority
          FROM orders
          WHERE ${Portable.pmd5Sql("CAST(o_orderkey AS VARCHAR)")} % 97 <> 0),
        b AS (
          SELECT o_orderkey,
                 ${Portable.pmd5Sql("CAST(o_orderkey AS VARCHAR)")} % $DIFF_BUCKETS AS bucket,
                 ${Portable.pmd5Sql("concat_ws('|', o_orderkey, o_orderstatus, o_orderpriority)")} AS digest
          FROM bmut),
        sa AS (SELECT bucket, CAST(count(*) AS BIGINT) AS cnt, bit_xor(digest) AS dg
               FROM a GROUP BY bucket),
        sb AS (SELECT bucket, CAST(count(*) AS BIGINT) AS cnt, bit_xor(digest) AS dg
               FROM b GROUP BY bucket),
        bad AS (
          SELECT coalesce(sa.bucket, sb.bucket) AS bucket
          FROM sa FULL OUTER JOIN sb ON sa.bucket = sb.bucket
          WHERE coalesce(sa.cnt, -1) <> coalesce(sb.cnt, -2)
             OR coalesce(sa.dg, -1) <> coalesce(sb.dg, -2)),
        da AS (SELECT a.* FROM a JOIN bad USING (bucket)),
        db AS (SELECT b.* FROM b JOIN bad USING (bucket))
        SELECT da.o_orderkey, da.bucket,
               CASE WHEN db2.o_orderkey IS NULL THEN 'removed'
                    ELSE 'changed' END AS change
        FROM da
        LEFT JOIN db ON da.o_orderkey = db.o_orderkey AND da.digest = db.digest
        LEFT JOIN (SELECT DISTINCT o_orderkey FROM db) db2
               ON da.o_orderkey = db2.o_orderkey
        WHERE db.o_orderkey IS NULL""")),
    // ----------------------------------------------------------------
    Q(
      "q137_ohlc_bars",
      "OHLC bar aggregation — the timeseries summary every metrics/" +
        "market store emits: per (event_type, hour), the opening and " +
        "closing values under the total order (ts, event_id) plus " +
        "low/high/count. Open and close are SELECTIONS via min/max " +
        "over a (ts, event_id, value) struct (lexicographic, " +
        "tie-broken by event_id — both engines pick the same row; no " +
        "float arithmetic ever runs, so the doubles are the stored " +
        "bytes). One map-side-combined agg on the (type, hour) key — " +
        "six numbers per bucket cross the shuffle regardless of " +
        "events per hour. Null values are excluded up front (none in " +
        "this corpus; the guard pins struct-comparison semantics " +
        "cross-engine).",
      (s, dir) => {
        val e = t(s, dir, "events").filter(col("value").isNotNull)
          .withColumn("bucket", date_trunc("hour", col("ts")))
        e.groupBy(col("event_type"), col("bucket"))
          .agg(count(lit(1)).as("n"),
            min(col("value")).as("low"), max(col("value")).as("high"),
            min(struct(col("ts"), col("event_id"), col("value")))
              .getField("value").as("open"),
            max(struct(col("ts"), col("event_id"), col("value")))
              .getField("value").as("close"))
      },
      Some("""
        WITH e AS (
          SELECT event_type, date_trunc('hour', ts) AS bucket, ts, event_id, value
          FROM events WHERE value IS NOT NULL)
        SELECT event_type, bucket, CAST(count(*) AS BIGINT) AS n,
               min(value) AS low, max(value) AS high,
               (min({'t': ts, 'i': event_id, 'v': value})).v AS open,
               (max({'t': ts, 'i': event_id, 'v': value})).v AS close
        FROM e GROUP BY event_type, bucket""")),
    // ----------------------------------------------------------------
    Q(
      "q138_gap_fill",
      "Hourly gap-filling with forward fill — the timeseries " +
        "completion operator dashboards and training-feature " +
        "pipelines need before any rolling computation: each event " +
        "type's hour grid spans its own [min, max] bucket range " +
        "(sequence + explode), missing hours join as n=0 gap rows, " +
        "and the last observed CLOSE (q137's selection, no float " +
        "math) carries forward via last_value IGNORE NULLS over a " +
        "window PARTITIONED BY event_type — bounded by the hour-range " +
        "length per type, never by event count, so the window is " +
        "scale-free (the grid is |types| x hours while the event scan " +
        "collapses to the same hourly keys first). The corpus has " +
        "real gaps at every SF, so the fill path is exercised, not " +
        "vacuous.",
      (s, dir) => {
        val e = t(s, dir, "events").filter(col("value").isNotNull)
          .withColumn("bucket", date_trunc("hour", col("ts")))
        val hourly = e.groupBy(col("event_type"), col("bucket"))
          .agg(count(lit(1)).as("n"),
            max(struct(col("ts"), col("event_id"), col("value")))
              .getField("value").as("close"))
        val grid = hourly.groupBy(col("event_type"))
          .agg(min(col("bucket")).as("lo"), max(col("bucket")).as("hi"))
          .select(col("event_type"),
            explode(expr("sequence(lo, hi, interval 1 hour)")).as("bucket"))
        val w = Window.partitionBy(col("event_type")).orderBy(col("bucket"))
        grid.join(hourly, Seq("event_type", "bucket"), "left")
          .select(col("event_type"), col("bucket"),
            coalesce(col("n"), lit(0L)).as("n"),
            last(col("close"), ignoreNulls = true).over(w).as("close_filled"),
            col("n").isNull.as("is_gap"))
      },
      Some("""
        WITH e AS (
          SELECT event_type, date_trunc('hour', ts) AS bucket, ts, event_id, value
          FROM events WHERE value IS NOT NULL),
        hourly AS (
          SELECT event_type, bucket, CAST(count(*) AS BIGINT) AS n,
                 (max({'t': ts, 'i': event_id, 'v': value})).v AS close
          FROM e GROUP BY event_type, bucket),
        span AS (SELECT event_type, min(bucket) AS lo, max(bucket) AS hi
                 FROM hourly GROUP BY event_type),
        grid AS (SELECT event_type,
                        unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket
                 FROM span)
        SELECT g.event_type, g.bucket, coalesce(h.n, 0) AS n,
               last_value(h.close IGNORE NULLS)
                 OVER (PARTITION BY g.event_type ORDER BY g.bucket) AS close_filled,
               h.n IS NULL AS is_gap
        FROM grid g
        LEFT JOIN hourly h ON g.event_type = h.event_type AND g.bucket = h.bucket""")),
    // ----------------------------------------------------------------
    Q(
      "q139_rank_windows",
      "Distribution-rank window family — the three ANSI analytics " +
        "q53's sequence/lag/running-sum set does not touch: " +
        "percent_rank, cume_dist and ntile(4) over each order " +
        "priority, ranked by (o_totalprice, o_orderkey) — a TOTAL " +
        "order, so every rank, quantile boundary and tile assignment " +
        "is engine-deterministic. The distribution ranks are emitted " +
        "EXACTLY: rank and partition size as BIGINT plus the two " +
        "ratios as integer basis points ((rnk-1)*10000 div " +
        "(n_part-1), rnk*10000 div n_part) — mathematically the " +
        "floor of percent_rank/cume_dist scaled by 10^4, computed in " +
        "pure integer arithmetic in BOTH engines, so no " +
        "division-produced double ever reaches the output (the " +
        "registry's float-free gate convention; round 7's only hash " +
        "mismatch was this query's raw-DOUBLE form). The price " +
        "itself is emitted as BIGINT cents via the house " +
        "DECIMAL(18,2)*100 convention — never as a DECIMAL column; " +
        "the round-8 driver gate proved DECIMAL output types render " +
        "divergently across its read paths even when values are " +
        "bit-identical, so DECIMAL stays strictly internal. " +
        "The slice filter (o_orderkey % 20 = 0) is pushed to the " +
        "scan; one shuffle on the partition key serves all " +
        "functions. A full-partition rank sort is dashboard-scale by " +
        "nature — the corpus-scale rank path is q95's two-pass " +
        "histogram refine; this is the per-partition analytic form.",
      (s, dir) => {
        val o = t(s, dir, "orders").filter(col("o_orderkey") % 20 === 0)
        val w = Window.partitionBy(col("o_orderpriority"))
          .orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
        val wAll = Window.partitionBy(col("o_orderpriority"))
        o.select(col("o_orderkey"), col("o_orderpriority"),
          (col("o_totalprice").cast(DecimalType(18, 2)) * 100)
            .cast(LongType).as("price_cents"),
          rank().over(w).cast(LongType).as("rnk"),
          count(lit(1)).over(wAll).as("n_part"),
          ntile(4).over(w).cast(LongType).as("quartile"))
          .select(col("o_orderkey"), col("o_orderpriority"),
            col("price_cents"), col("rnk"), col("n_part"),
            when(col("n_part") > 1,
              expr("(rnk - 1) * 10000 div (n_part - 1)")).as("pct_rank_bp"),
            expr("rnk * 10000 div n_part").as("cume_bp"),
            col("quartile"))
      },
      Some("""
        SELECT o_orderkey, o_orderpriority, price_cents, rnk, n_part,
               CASE WHEN n_part > 1
                    THEN (rnk - 1) * 10000 // (n_part - 1) END AS pct_rank_bp,
               rnk * 10000 // n_part AS cume_bp,
               quartile
        FROM (
          SELECT o_orderkey, o_orderpriority,
                 CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                   AS price_cents,
                 CAST(rank() OVER w AS BIGINT) AS rnk,
                 CAST(count(*) OVER wp AS BIGINT) AS n_part,
                 CAST(ntile(4) OVER w AS BIGINT) AS quartile
          FROM orders
          WHERE o_orderkey % 20 = 0
          WINDOW w AS (PARTITION BY o_orderpriority
                       ORDER BY o_totalprice ASC, o_orderkey ASC),
                 wp AS (PARTITION BY o_orderpriority))""")),
    // ----------------------------------------------------------------
    Q(
      "q142_scd2_intervals",
      "SCD2 dimension build — turning a per-key change stream into " +
        "validity intervals, the warehouse operator behind every " +
        "as-of enrichment (q42 CONSUMES a table shaped like this " +
        "output): per user, consecutive duplicate values collapse " +
        "first (change detection via lag — real update streams " +
        "re-emit unchanged state), then each surviving change opens " +
        "an interval [ts, next change's ts) via lead, the open " +
        "current row ending null. Both window passes share one " +
        "user_id partitioning under the total order (ts, event_id); " +
        "per-partition width is a user's history, never the corpus. " +
        "The value compare is stored-byte equality, no arithmetic — " +
        "engine-exact.",
      (s, dir) => {
        val ev = t(s, dir, "events")
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts").asc, col("event_id").asc)
        // null-safe change detection: a change TO null is a change, and
        // consecutive nulls collapse like any repeated value — plain
        // <> would 3-valued-logic both cases away. The first row is
        // detected by lagging a constant (null only at the frame
        // start), not by prev.isNull, which a genuine null value of
        // the previous change would also satisfy.
        val changes = ev
          .select(col("user_id"), col("ts"), col("event_id"), col("value"))
          .withColumn("prev", lag(col("value"), 1).over(w))
          .withColumn("first", lag(lit(0), 1).over(w).isNull)
          .filter(col("first") || !(col("value") <=> col("prev")))
        changes
          .select(col("user_id"), col("value"),
            col("ts").as("valid_from"),
            lead(col("ts"), 1).over(w).as("valid_to"))
          .withColumn("is_current", col("valid_to").isNull)
      },
      Some("""
        WITH c AS (
          SELECT user_id, ts, event_id, value,
                 lag(value, 1) OVER w AS prev,
                 lag(0, 1) OVER w IS NULL AS first
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC))
        SELECT user_id, value, ts AS valid_from,
               lead(ts, 1) OVER w2 AS valid_to,
               lead(ts, 1) OVER w2 IS NULL AS is_current
        FROM c
        WHERE first OR value IS DISTINCT FROM prev
        WINDOW w2 AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)""")),
    // ----------------------------------------------------------------
    Q(
      "q143_join_estimate",
      "Pre-join cardinality estimation from KMV sketches — sizing a " +
        "join BEFORE paying for it (the planner-side use of q69's " +
        s"distinct sketch): each side folds its key domain to the $KMV_JOIN_K " +
        "smallest hashes (a TakeOrdered top-k, constant state at any " +
        "cardinality), the union sketch's k-th value estimates " +
        "|A u B| as (k-1)*2^60 div h_k, the fraction of union-sketch " +
        "members seen by BOTH sides estimates Jaccard, and their " +
        "product estimates the join-key intersection — all exact " +
        "integer arithmetic ((k-1)*2^60 rides DECIMAL(38,0)/HUGEINT " +
        "past 2^63). Sketches that are not full degrade to the exact " +
        "count (the CASE both engines share). The audit columns join " +
        "the estimates to the true distinct counts, the q84/q124 " +
        "sketch-vs-truth pattern; at 100 TB only the two k-row " +
        "sketches ever meet the driver.",
      (s, dir) => {
        // null keys never join; exclude them from both domains up front
        // (Spark's full_outer treats NULL keys as distinct per side
        // while the SQL mirror's UNION would collapse them — aligning
        // the definition beats relying on null-free data)
        def kmv(df: DataFrame, c: Column) = df.filter(c.isNotNull)
          .select(Portable.pmd5(c.cast(StringType)).as("h")).distinct()
          .orderBy(col("h").asc).limit(KMV_JOIN_K)
        val ha = kmv(t(s, dir, "events"), col("user_id"))
        val hb = kmv(t(s, dir, "orders"), col("o_custkey"))
        ha.persist(); hb.persist()
        val u = ha.unionAll(hb).distinct().orderBy(col("h").asc).limit(KMV_JOIN_K)
        val uStats = u.agg(count(lit(1)).as("u_n"), max(col("h")).as("h_k"))
        val common = u.join(ha, Seq("h"), "left_semi")
          .join(hb, Seq("h"), "left_semi")
          .agg(count(lit(1)).as("common"))
        val exacts = t(s, dir, "events")
          .filter(col("user_id").isNotNull)
          .select(col("user_id").as("k")).distinct()
          .join(t(s, dir, "orders").filter(col("o_custkey").isNotNull)
            .select(col("o_custkey").as("k")).distinct(),
            Seq("k"), "full_outer")
          .agg(count(lit(1)).as("union_exact"))
        val na = t(s, dir, "events").agg(countDistinct(col("user_id")).as("n_a"))
        val nb = t(s, dir, "orders").agg(countDistinct(col("o_custkey")).as("n_b"))
        uStats.crossJoin(broadcast(common))
          .crossJoin(broadcast(na)).crossJoin(broadcast(nb))
          .crossJoin(broadcast(exacts))
          .withColumn("est_union", expr(
            s"CASE WHEN u_n < $KMV_JOIN_K THEN u_n " +
              s"ELSE CAST(CAST(${KMV_JOIN_K - 1} AS DECIMAL(38,0)) * ${1L << 60} " +
              "div h_k AS BIGINT) END"))
          // Jaccard denominator is the union SKETCH size u_n (== K when
          // full, == |A u B| when not): dividing by K unconditionally
          // would shrink the not-full estimate by u_n/K and break the
          // promised exact degradation
          .withColumn("est_inter", expr(
            "CASE WHEN u_n = 0 THEN 0 ELSE common * est_union div u_n END"))
          .select(lit(KMV_JOIN_K.toLong).as("k"), col("n_a"), col("n_b"),
            col("union_exact"), col("common"),
            col("est_union"), col("est_inter"))
      },
      Some(s"""
        WITH ha AS (
          SELECT DISTINCT ${Portable.pmd5Sql("CAST(user_id AS VARCHAR)")} AS h
          FROM events WHERE user_id IS NOT NULL
          ORDER BY h ASC LIMIT $KMV_JOIN_K),
        hb AS (
          SELECT DISTINCT ${Portable.pmd5Sql("CAST(o_custkey AS VARCHAR)")} AS h
          FROM orders WHERE o_custkey IS NOT NULL
          ORDER BY h ASC LIMIT $KMV_JOIN_K),
        u AS (
          SELECT DISTINCT h FROM (SELECT h FROM ha UNION ALL SELECT h FROM hb)
          ORDER BY h ASC LIMIT $KMV_JOIN_K),
        us AS (SELECT CAST(count(*) AS BIGINT) AS u_n, max(h) AS h_k FROM u),
        cm AS (SELECT CAST(count(*) AS BIGINT) AS common FROM u
               WHERE h IN (SELECT h FROM ha) AND h IN (SELECT h FROM hb)),
        ex AS (
          SELECT CAST(count(*) AS BIGINT) AS union_exact FROM (
            SELECT DISTINCT user_id AS k FROM events WHERE user_id IS NOT NULL
            UNION
            SELECT DISTINCT o_custkey FROM orders WHERE o_custkey IS NOT NULL)),
        na AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_a FROM events),
        nb AS (SELECT CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_b FROM orders),
        est AS (
          SELECT u_n, h_k,
                 CASE WHEN u_n < $KMV_JOIN_K THEN u_n
                      ELSE CAST(CAST(${KMV_JOIN_K - 1} AS HUGEINT) * ${1L << 60}
                           // h_k AS BIGINT) END AS est_union
          FROM us)
        SELECT CAST($KMV_JOIN_K AS BIGINT) AS k, n_a, n_b, union_exact, common,
               est_union,
               CASE WHEN u_n = 0 THEN 0
                    ELSE common * est_union // u_n END AS est_inter
        FROM est, cm, ex, na, nb""")),
    // ----------------------------------------------------------------
    Q(
      "q145_quality_report",
      "Declarative data-quality audit (the Deequ shape, " +
        "graft.operators.Quality): eleven constraints over the star " +
        "schema — completeness, accepted values, ranges, key " +
        "uniqueness, referential integrity — each reported as " +
        "(check_name, checked, violations, pass). ROW checks compile " +
        "to ONE conditional-agg scan per table no matter how many are " +
        "registered; UNIQUE checks shuffle only key columns; REF " +
        "checks are a key-projected left-outer against the distinct " +
        "dimension keys (broadcast for customer, shuffled for the " +
        "fact-sized orders side) counting matches and misses in one " +
        "agg — no second row-count scan. The report is honest on this " +
        "data: lineitem's (l_orderkey, l_linenumber) pair is NOT " +
        "unique and the 30-unit quantity SLA fails, so both classes " +
        "of outcome appear. All counts are exact integers.",
      (s, dir) => {
        import graft.operators.Quality
        import graft.operators.Quality.{RefCheck, RowCheck, UniqueCheck}
        val o = t(s, dir, "orders")
        val l = t(s, dir, "lineitem")
        val cust = t(s, dir, "customer")
        val rOrders = Quality.report(
          o,
          rowChecks = Seq(
            RowCheck("orders.o_orderkey NOT NULL", col("o_orderkey").isNotNull),
            RowCheck("orders.o_orderstatus IN (F,O,P)",
              col("o_orderstatus").isin("F", "O", "P")),
            RowCheck("orders.o_totalprice IN [0,600000]",
              col("o_totalprice") >= 0.0 && col("o_totalprice") <= 600000.0)),
          uniqueChecks =
            Seq(UniqueCheck("orders.o_orderkey UNIQUE", Seq("o_orderkey"))),
          refChecks = Seq(RefCheck(
            "orders.o_custkey REFERENCES customer.c_custkey",
            "o_custkey", cust, "c_custkey")))
        val rLine = Quality.report(
          l,
          rowChecks = Seq(
            RowCheck("lineitem.l_quantity IN [1,50]",
              col("l_quantity") >= 1.0 && col("l_quantity") <= 50.0),
            RowCheck("lineitem.l_quantity <= 30 (SLA)", col("l_quantity") <= 30.0),
            RowCheck("lineitem.l_discount IN [0,0.1]",
              col("l_discount") >= 0.0 && col("l_discount") <= 0.1)),
          uniqueChecks = Seq(UniqueCheck(
            "lineitem(l_orderkey,l_linenumber) UNIQUE",
            Seq("l_orderkey", "l_linenumber"))),
          // orders is fact-sized: shuffled key join, never broadcast
          refChecks = Seq(RefCheck(
            "lineitem.l_orderkey REFERENCES orders.o_orderkey",
            "l_orderkey", o, "o_orderkey", broadcastDim = false)))
        val rCust = Quality.report(
          cust,
          rowChecks = Seq(
            RowCheck("customer.c_acctbal NOT NULL", col("c_acctbal").isNotNull)))
        rOrders.unionAll(rLine).unionAll(rCust).orderBy("check_name")
      },
      Some {
        def rowSql(table: String, name: String, pred: String) =
          s"""SELECT '$name' AS check_name, CAST(count(*) AS BIGINT) AS checked,
             CAST(sum(CASE WHEN COALESCE($pred, false) THEN 0 ELSE 1 END) AS BIGINT)
               AS violations
          FROM $table"""
        def uniqueSql(table: String, name: String, keys: String) =
          s"""SELECT '$name', CAST(COALESCE(sum(cnt), 0) AS BIGINT),
             CAST(COALESCE(sum(CASE WHEN cnt > 1 THEN cnt ELSE 0 END), 0) AS BIGINT)
          FROM (SELECT count(*) AS cnt FROM $table GROUP BY $keys)"""
        def refSql(name: String, fact: String, fk: String, dim: String, pk: String) =
          s"""SELECT '$name', CAST(count(*) AS BIGINT),
             CAST(COALESCE(sum(CASE WHEN d.__pk IS NULL THEN 1 ELSE 0 END), 0)
               AS BIGINT)
          FROM (SELECT $fk FROM $fact WHERE $fk IS NOT NULL) f
          LEFT JOIN (SELECT DISTINCT $pk AS __pk FROM $dim) d ON f.$fk = d.__pk"""
        val rows = Seq(
          rowSql("orders", "orders.o_orderkey NOT NULL",
            "o_orderkey IS NOT NULL"),
          rowSql("orders", "orders.o_orderstatus IN (F,O,P)",
            "o_orderstatus IN ('F','O','P')"),
          rowSql("orders", "orders.o_totalprice IN [0,600000]",
            "o_totalprice >= 0.0 AND o_totalprice <= 600000.0"),
          uniqueSql("orders", "orders.o_orderkey UNIQUE", "o_orderkey"),
          refSql("orders.o_custkey REFERENCES customer.c_custkey",
            "orders", "o_custkey", "customer", "c_custkey"),
          rowSql("lineitem", "lineitem.l_quantity IN [1,50]",
            "l_quantity >= 1.0 AND l_quantity <= 50.0"),
          rowSql("lineitem", "lineitem.l_quantity <= 30 (SLA)",
            "l_quantity <= 30.0"),
          rowSql("lineitem", "lineitem.l_discount IN [0,0.1]",
            "l_discount >= 0.0 AND l_discount <= 0.1"),
          uniqueSql("lineitem", "lineitem(l_orderkey,l_linenumber) UNIQUE",
            "l_orderkey, l_linenumber"),
          refSql("lineitem.l_orderkey REFERENCES orders.o_orderkey",
            "lineitem", "l_orderkey", "orders", "o_orderkey"),
          rowSql("customer", "customer.c_acctbal NOT NULL",
            "c_acctbal IS NOT NULL"))
        s"""
        WITH rpt AS (
          ${rows.mkString("\n          UNION ALL\n          ")})
        SELECT check_name, checked, violations, violations = 0 AS pass
        FROM rpt ORDER BY check_name"""
      }),
    // ----------------------------------------------------------------
    Q(
      "q149_integer_ewma",
      "Integer exponential smoothing over the hourly event series — " +
        "the trend line q88's burst detector compares against, kept " +
        "EXACT: per event type, s_t = (s_{t-1} + x_t) div 2 " +
        "(alpha = 1/2 as a pure integer halving, seeded s_1 = x_1), " +
        "so both engines produce identical longs with no float decay " +
        "chain. The recurrence is inherently sequential PER KEY, so " +
        "it runs as an ordered in-array fold: the hourly counts " +
        "aggregate keyed on (type, hour) first — the only data-sized " +
        "shuffle — then each type's series collects to one array " +
        "whose length is bounded by the TIME RANGE (hours), not the " +
        "event volume, and one aggregate() lambda emits the running " +
        "EWMA array that zips back to rows. The DuckDB mirror walks " +
        "the same recurrence as a recursive CTE. At 100 TB the " +
        "per-key state is still only #hours longs; a longer horizon " +
        "chunks by (key, month) and chains the carry, and the " +
        "streaming twin keeps s_t as mapGroupsWithState state.",
      (s, dir) => {
        val h = t(s, dir, "events")
          .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hr"))
          .agg(count(lit(1)).as("n"))
        h.groupBy(col("event_type"))
          .agg(sort_array(collect_list(struct(col("hr"), col("n")))).as("xs"))
          .withColumn("es", expr("""
            aggregate(xs, cast(array() as array<bigint>),
              (acc, x) -> array_append(acc,
                CASE WHEN size(acc) = 0 THEN x.n
                     ELSE (element_at(acc, -1) + x.n) div 2 END))"""))
          .select(col("event_type"), explode(arrays_zip(col("xs"), col("es"))).as("z"))
          .select(col("event_type"), col("z.xs.hr").as("hr"),
            col("z.xs.n").as("n"), col("z.es").as("ewma"))
      },
      Some("""
        WITH RECURSIVE h AS (
          SELECT event_type, date_trunc('hour', ts) AS hr,
                 CAST(count(*) AS BIGINT) AS n
          FROM events GROUP BY 1, 2),
        hs AS (
          SELECT event_type, hr, n,
                 row_number() OVER (PARTITION BY event_type ORDER BY hr) AS i
          FROM h),
        rec AS (
          SELECT event_type, hr, n, i, n AS ewma FROM hs WHERE i = 1
          UNION ALL
          SELECT hs.event_type, hs.hr, hs.n, hs.i, (rec.ewma + hs.n) // 2
          FROM rec JOIN hs ON hs.event_type = rec.event_type
                          AND hs.i = rec.i + 1)
        SELECT event_type, hr, n, ewma FROM rec""")),
    // ----------------------------------------------------------------
    Q(
      "q153_cdc_merge",
      "CDC MERGE apply — the lakehouse upsert/delete primitive (MERGE " +
        "INTO / Delta-style apply) q135's diff and q142's SCD2 both " +
        "presuppose: a change table (op, key, new values) applies to " +
        "the snapshot in ONE full-outer key join — D drops the row, " +
        "U/I take the change side, untouched keys pass through. The " +
        "change set derives deterministically in-query (pmd5 " +
        "residues: %7=0 deletes, %11=1 priority updates, %13=2 " +
        "inserts under shifted keys) so both engines build identical " +
        "sides; the output is the merge AUDIT row — per-op counts, " +
        "before/after cardinality, and the xor-of-digests of the " +
        "ENTIRE merged table (q135's Merkle summary), so the hash " +
        "match proves the full post-merge state, not a sample. At " +
        "100 TB the join shuffles only keys + changed columns, and a " +
        "real change batch is small: broadcast it, or bucket the " +
        "snapshot on key so the merge never exchanges the big side.",
      (s, dir) => {
        val o = t(s, dir, "orders")
        val kh = Portable.pmd5(col("o_orderkey").cast(StringType))
        val del = o.filter(kh % 7 === 0)
          .select(col("o_orderkey").as("k"), lit("D").as("op"),
            lit(null).cast(StringType).as("c_status"),
            lit(null).cast(StringType).as("c_prio"))
        val upd = o.filter(kh % 7 =!= 0 && kh % 11 === 1)
          .select(col("o_orderkey").as("k"), lit("U").as("op"),
            col("o_orderstatus").as("c_status"),
            lit("0-CDC-URGENT").as("c_prio"))
        val ins = o.filter(kh % 13 === 2)
          .select((col("o_orderkey") + CDC_INS_OFFSET).as("k"), lit("I").as("op"),
            lit("N").as("c_status"), col("o_orderpriority").as("c_prio"))
        val changes = del.unionAll(upd).unionAll(ins)
        val snap = o.select(col("o_orderkey").as("k"),
          col("o_orderstatus").as("s_status"), col("o_orderpriority").as("s_prio"))
        val merged = snap.join(changes, Seq("k"), "full_outer")
          .filter(!(col("op") <=> "D"))
          .select(col("k"),
            when(col("op").isNotNull, col("c_status")).otherwise(col("s_status"))
              .as("status"),
            when(col("op").isNotNull, col("c_prio")).otherwise(col("s_prio"))
              .as("prio"))
        val after = merged
          .withColumn("digest",
            Portable.pmd5(concat_ws("|", col("k"), col("status"), col("prio"))))
          .agg(count(lit(1)).as("n_after"),
            expr("bit_xor(digest)").as("after_digest"))
        val ops = changes.agg(
          sum(when(col("op") === "D", 1L).otherwise(0L)).as("n_delete"),
          sum(when(col("op") === "U", 1L).otherwise(0L)).as("n_update"),
          sum(when(col("op") === "I", 1L).otherwise(0L)).as("n_insert"))
        val before = o.agg(count(lit(1)).as("n_before"))
        before.crossJoin(broadcast(ops)).crossJoin(broadcast(after))
          .select(col("n_before"), col("n_delete"), col("n_update"),
            col("n_insert"), col("n_after"), col("after_digest"))
      },
      Some {
        val kh = Portable.pmd5Sql("CAST(o_orderkey AS VARCHAR)")
        val digest = Portable.pmd5Sql("concat_ws('|', k, status, prio)")
        s"""
        WITH del AS (
          SELECT o_orderkey AS k, 'D' AS op,
                 CAST(NULL AS VARCHAR) AS c_status, CAST(NULL AS VARCHAR) AS c_prio
          FROM orders WHERE $kh % 7 = 0),
        upd AS (
          SELECT o_orderkey, 'U', o_orderstatus, '0-CDC-URGENT'
          FROM orders WHERE $kh % 7 <> 0 AND $kh % 11 = 1),
        ins AS (
          SELECT o_orderkey + $CDC_INS_OFFSET, 'I', 'N', o_orderpriority
          FROM orders WHERE $kh % 13 = 2),
        changes AS (
          SELECT * FROM del UNION ALL SELECT * FROM upd
          UNION ALL SELECT * FROM ins),
        snap AS (
          SELECT o_orderkey AS k, o_orderstatus AS s_status,
                 o_orderpriority AS s_prio
          FROM orders),
        m AS (
          SELECT k,
                 CASE WHEN c.op IS NOT NULL THEN c.c_status ELSE s.s_status END AS status,
                 CASE WHEN c.op IS NOT NULL THEN c.c_prio ELSE s.s_prio END AS prio
          FROM snap s FULL OUTER JOIN changes c USING (k)
          WHERE c.op IS DISTINCT FROM 'D'),
        aft AS (
          SELECT CAST(count(*) AS BIGINT) AS n_after,
                 bit_xor($digest) AS after_digest
          FROM m),
        ops AS (
          SELECT CAST(sum(CASE WHEN op = 'D' THEN 1 ELSE 0 END) AS BIGINT) AS n_delete,
                 CAST(sum(CASE WHEN op = 'U' THEN 1 ELSE 0 END) AS BIGINT) AS n_update,
                 CAST(sum(CASE WHEN op = 'I' THEN 1 ELSE 0 END) AS BIGINT) AS n_insert
          FROM changes),
        bef AS (SELECT CAST(count(*) AS BIGINT) AS n_before FROM orders)
        SELECT n_before, n_delete, n_update, n_insert, n_after, after_digest
        FROM bef, ops, aft"""
      }),
    // ----------------------------------------------------------------
    Q(
      "q155_volume_trend",
      "Per-type event-volume trend by EXACT least squares — the slope " +
        "q149's EWMA smooths toward, computed closed-form: hourly " +
        "counts regress on the hour index with all five moments " +
        "(n, St, Sn, Stt, Stn) as BIGINT sums — hours re-base against " +
        "the global minimum (one broadcast 1-row agg) so every moment " +
        "stays far from 2^63 — and the slope reported in integer " +
        "micro-events/hour (the 1e6*num product rides DECIMAL(38,0)/" +
        "HUGEINT past 2^63). Division is the one cross-engine trap: " +
        "Spark's div truncates toward zero, DuckDB's // floors, so " +
        "negative numerators ROUTE THROUGH abs and re-sign — both " +
        "engines then truncate identically. den > 0 whenever a type " +
        "spans two distinct hours. One narrow keyed agg over the " +
        "hourly pre-agg; nothing data-sized crosses the driver.",
      (s, dir) => {
        val h = t(s, dir, "events")
          .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hr"))
          .agg(count(lit(1)).as("n"))
        val t0 = h.agg(min(col("hr").cast(LongType)).as("hr0"))
        h.crossJoin(broadcast(t0))
          .withColumn("t", expr("(cast(hr as long) - hr0) div 3600"))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_hours"),
            sum(col("t")).as("st"), sum(col("n")).as("sn"),
            sum(col("t") * col("t")).as("stt"),
            sum(col("t") * col("n")).as("stn"))
          .select(col("event_type"), col("n_hours"),
            (col("n_hours") * col("stn") - col("st") * col("sn")).as("num"),
            (col("n_hours") * col("stt") - col("st") * col("st")).as("den"))
          // micro-resolution: 1e6 * num can pass 2^63 at larger SFs, so
          // the product rides DECIMAL(38,0) (exact; div on decimals is
          // exact integral division) and lands back in BIGINT
          .withColumn("slope_micro", expr(
            "CASE WHEN num >= 0 " +
              "THEN CAST(CAST(num AS DECIMAL(38,0)) * 1000000 div den AS BIGINT) " +
              "ELSE -CAST(CAST(-num AS DECIMAL(38,0)) * 1000000 div den AS BIGINT) END"))
          .orderBy("event_type")
      },
      Some("""
        WITH h AS (
          SELECT event_type, date_trunc('hour', ts) AS hr,
                 CAST(count(*) AS BIGINT) AS n
          FROM events GROUP BY 1, 2),
        t0 AS (SELECT CAST(min(epoch(hr)) AS BIGINT) AS hr0 FROM h),
        b AS (
          SELECT event_type, n,
                 (CAST(epoch(hr) AS BIGINT) - hr0) // 3600 AS t
          FROM h, t0),
        m AS (
          SELECT event_type, CAST(count(*) AS BIGINT) AS n_hours,
                 CAST(sum(t) AS BIGINT) AS st, CAST(sum(n) AS BIGINT) AS sn,
                 CAST(sum(t * t) AS BIGINT) AS stt,
                 CAST(sum(t * n) AS BIGINT) AS stn
          FROM b GROUP BY event_type)
        SELECT event_type, n_hours,
               n_hours * stn - st * sn AS num,
               n_hours * stt - st * st AS den,
               CASE WHEN n_hours * stn - st * sn >= 0
                    THEN CAST(CAST(n_hours * stn - st * sn AS HUGEINT) * 1000000
                           // (n_hours * stt - st * st) AS BIGINT)
                    ELSE -CAST(CAST(-(n_hours * stn - st * sn) AS HUGEINT) * 1000000
                           // (n_hours * stt - st * st) AS BIGINT) END AS slope_micro
        FROM m ORDER BY event_type""")),
    // ----------------------------------------------------------------
    Q(
      "q156_benford_audit",
      "Benford first-digit audit over order totals — the classic " +
        "fabricated-data screen (organic multiplicative amounts lean " +
        "log-uniform; synthetic-uniform data shows up FLAT, which is " +
        "exactly what this corpus's generator produces and the report " +
        "makes visible): totals become exact integer cents, the " +
        "leading digit comes off the BIGINT's decimal string (integer " +
        "-> string is locale-free and identical on both engines — no " +
        "float formatting, no log10), and each digit's observed share " +
        "in basis points stands against Benford's log10(1+1/d) " +
        "expectation, precomputed as the nine constant bp literals " +
        "both engines share. One conditional-agg scan; 9 output rows.",
      (s, dir) => {
        val expected = Seq(3010L, 1761L, 1249L, 969L, 792L, 669L, 580L, 512L, 458L)
        val d = t(s, dir, "orders")
          .select(substring(
            expr("CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS STRING)"),
            1, 1).cast(LongType).as("digit"))
          .groupBy(col("digit")).agg(count(lit(1)).as("n"))
        val tot = d.agg(sum(col("n")).as("total"))
        val exp = expected.zipWithIndex.map { case (bp, i) =>
          s"WHEN ${i + 1} THEN CAST($bp AS BIGINT)"
        }.mkString("CASE digit ", " ", " END")
        d.crossJoin(broadcast(tot))
          .withColumn("obs_bp", expr("n * 10000 div total"))
          .withColumn("exp_bp", expr(exp))
          .withColumn("dev_bp", abs(col("obs_bp") - col("exp_bp")))
          .select(col("digit"), col("n"), col("obs_bp"), col("exp_bp"), col("dev_bp"))
          .orderBy("digit")
      },
      Some {
        val expected = Seq(3010L, 1761L, 1249L, 969L, 792L, 669L, 580L, 512L, 458L)
        val exp = expected.zipWithIndex.map { case (bp, i) =>
          s"WHEN ${i + 1} THEN $bp"
        }.mkString("CASE digit ", " ", " END")
        s"""
        WITH d AS (
          SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT)
                   AS VARCHAR), 1, 1) AS BIGINT) AS digit,
                 CAST(count(*) AS BIGINT) AS n
          FROM orders GROUP BY 1),
        tot AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM d)
        SELECT digit, n,
               n * 10000 // total AS obs_bp,
               CAST($exp AS BIGINT) AS exp_bp,
               abs(n * 10000 // total - ($exp)) AS dev_bp
        FROM d, tot ORDER BY digit"""
      }),
    // ----------------------------------------------------------------
    Q(
      "q157_gap_histogram",
      "Inter-arrival structure per event type: consecutive event gaps " +
        "(micros, via one lag window keyed on type — the q113/q142 " +
        "window shape) fold into log2 buckets computed as " +
        "length(bin(gap)) — the exact integer floor(log2) both " +
        "engines share, q112's trick on durations — so the histogram " +
        "row count is ~60 per type at ANY volume. Zero-gap ties " +
        "(same-micro events) take bucket -1 explicitly. The burst/idle " +
        "signature q88's detector thresholds, as a full distribution.",
      (s, dir) => {
        val w = Window.partitionBy(col("event_type"))
          .orderBy(col("ts").asc, col("event_id").asc)
        t(s, dir, "events")
          .select(col("event_type"),
            (unix_micros(col("ts")) -
              lag(unix_micros(col("ts")), 1).over(w)).as("gap"))
          .filter(col("gap").isNotNull)
          .withColumn("bucket",
            when(col("gap") === 0, lit(-1L))
              .otherwise((length(bin(col("gap"))) - 1).cast(LongType)))
          .groupBy(col("event_type"), col("bucket"))
          .agg(count(lit(1)).as("n"),
            min(col("gap")).as("min_gap"), max(col("gap")).as("max_gap"))
      },
      Some("""
        WITH g AS (
          SELECT event_type,
                 CAST(epoch_us(ts) - lag(epoch_us(ts), 1) OVER (
                   PARTITION BY event_type
                   ORDER BY ts ASC, event_id ASC) AS BIGINT) AS gap
          FROM events),
        b AS (
          SELECT event_type, gap,
                 CASE WHEN gap = 0 THEN -1
                      ELSE CAST(length(bin(gap)) - 1 AS BIGINT) END AS bucket
          FROM g WHERE gap IS NOT NULL)
        SELECT event_type, bucket, CAST(count(*) AS BIGINT) AS n,
               min(gap) AS min_gap, max(gap) AS max_gap
        FROM b GROUP BY 1, 2""")),
    // ----------------------------------------------------------------
    Q(
      "q158_transition_matrix",
      "Event-type Markov transition matrix — the common-paths mining " +
        "behind funnel design (q100 checks ONE hypothesized path; " +
        "this surfaces which paths exist): per user, consecutive " +
        "event pairs from one partitioned lag window (the q157 " +
        "shape), counted into the (from, to) matrix with " +
        "row-conditional shares in basis points — p(to | from) as " +
        "exact integers. The matrix is |types|^2 rows at any volume; " +
        "row totals join back as a broadcast |types|-row frame, not " +
        "a second window.",
      (s, dir) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts").asc, col("event_id").asc)
        val pairs = t(s, dir, "events")
          .select(col("user_id"), col("event_type"),
            lag(col("event_type"), 1).over(w).as("from_type"))
          .filter(col("from_type").isNotNull)
          .groupBy(col("from_type"), col("event_type").as("to_type"))
          .agg(count(lit(1)).as("n"))
        val totals = pairs.groupBy(col("from_type"))
          .agg(sum(col("n")).as("row_total"))
        pairs.join(broadcast(totals), Seq("from_type"))
          .select(col("from_type"), col("to_type"), col("n"),
            expr("n * 10000 div row_total").as("row_bp"))
      },
      Some("""
        WITH p AS (
          SELECT lag(event_type, 1) OVER (PARTITION BY user_id
                   ORDER BY ts ASC, event_id ASC) AS from_type,
                 event_type AS to_type
          FROM events),
        m AS (
          SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
          FROM p WHERE from_type IS NOT NULL
          GROUP BY 1, 2),
        tot AS (
          SELECT from_type, CAST(sum(n) AS BIGINT) AS row_total
          FROM m GROUP BY 1)
        SELECT from_type, to_type, n, n * 10000 // row_total AS row_bp
        FROM m JOIN tot USING (from_type)""")),
    // ----------------------------------------------------------------
    Q(
      "q159_time_to_convert",
      "Time-to-convert distribution per first-view cohort day — the " +
        "latency half of the funnel (q100 counts WHO converts; this " +
        "measures HOW FAST): per user, first 'view' and first " +
        "'purchase' from one conditional-min agg (a single user-keyed " +
        "shuffle, the q128 collapse); converts = purchase at-or-after " +
        "view; per cohort day, the conversion share in bp plus EXACT " +
        "p50/p90 of the convert delta by q46's deterministic rank " +
        "selection (lower median, rank ceil(0.9n) — discrete data " +
        "values, no interpolation drift) over a cohort-PARTITIONED " +
        "window. Cohorts with zero converts report honest NULL " +
        "quantiles through the left join.",
      (s, dir) => {
        val firsts = t(s, dir, "events")
          .groupBy(col("user_id"))
          .agg(
            min(when(col("event_type") === "view", col("ts"))).as("fv"),
            min(when(col("event_type") === "purchase", col("ts"))).as("fp"))
          .filter(col("fv").isNotNull)
          .withColumn("cohort", to_date(col("fv")))
        val counts = firsts.groupBy(col("cohort"))
          .agg(count(lit(1)).as("n_viewers"),
            sum(when(col("fp").isNotNull && col("fp") >= col("fv"), 1L)
              .otherwise(0L)).as("n_converts"))
        val deltas = firsts
          .filter(col("fp").isNotNull && col("fp") >= col("fv"))
          .select(col("cohort"), col("user_id"),
            (unix_micros(col("fp")) - unix_micros(col("fv"))).as("d"))
        val w = Window.partitionBy(col("cohort"))
          .orderBy(col("d").asc, col("user_id").asc)
        val ranked = deltas.withColumn("rn", row_number().over(w))
          .withColumn("n", count(lit(1)).over(Window.partitionBy(col("cohort"))))
        val p50 = ranked.filter(col("rn") === expr("(n + 1) div 2"))
          .select(col("cohort"), col("d").as("p50_us"))
        val p90 = ranked.filter(col("rn") === expr("(9 * n + 9) div 10"))
          .select(col("cohort"), col("d").as("p90_us"))
        counts.join(p50, Seq("cohort"), "left").join(p90, Seq("cohort"), "left")
          .select(col("cohort"), col("n_viewers"), col("n_converts"),
            expr("n_converts * 10000 div n_viewers").as("conv_bp"),
            col("p50_us"), col("p90_us"))
      },
      Some("""
        WITH f AS (
          SELECT user_id,
                 min(CASE WHEN event_type = 'view' THEN ts END) AS fv,
                 min(CASE WHEN event_type = 'purchase' THEN ts END) AS fp
          FROM events GROUP BY user_id),
        fc AS (
          SELECT user_id, fv, fp, CAST(fv AS DATE) AS cohort
          FROM f WHERE fv IS NOT NULL),
        c AS (
          SELECT cohort, CAST(count(*) AS BIGINT) AS n_viewers,
                 CAST(sum(CASE WHEN fp IS NOT NULL AND fp >= fv
                          THEN 1 ELSE 0 END) AS BIGINT) AS n_converts
          FROM fc GROUP BY cohort),
        dl AS (
          SELECT cohort, user_id,
                 CAST(epoch_us(fp) - epoch_us(fv) AS BIGINT) AS d,
                 row_number() OVER w AS rn,
                 count(*) OVER (PARTITION BY cohort) AS n
          FROM fc WHERE fp IS NOT NULL AND fp >= fv
          WINDOW w AS (PARTITION BY cohort
                       ORDER BY epoch_us(fp) - epoch_us(fv) ASC, user_id ASC)),
        p50 AS (SELECT cohort, d AS p50_us FROM dl WHERE rn = (n + 1) // 2),
        p90 AS (SELECT cohort, d AS p90_us FROM dl WHERE rn = (9 * n + 9) // 10)
        SELECT cohort, n_viewers, n_converts,
               n_converts * 10000 // n_viewers AS conv_bp,
               p50_us, p90_us
        FROM c LEFT JOIN p50 USING (cohort) LEFT JOIN p90 USING (cohort)""")),
    // ----------------------------------------------------------------
    Q(
      "q161_interval_union",
      "Interval coalescing (the sweep-line union) — per user, every " +
        "event opens a 5-minute activity window and overlapping or " +
        "touching windows MERGE; the report is each user's total " +
        "covered time, merged-interval count, and coverage share of " +
        "their active span, all in exact micros. The sweep is two " +
        "user-partitioned windows: a running max of interval ends " +
        "over PRECEDING rows marks where a gap opens (start beyond " +
        "everything seen = new group; the first row coalesces its " +
        "NULL running max to Long.MinValue so it always opens one), " +
        "and a running sum of those flags numbers the groups — the " +
        "standard O(n log n)-per-key coalesce with no self-join. " +
        "Distinct from q35's gap sessions: THIS merges fixed-width " +
        "windows (uptime/coverage semantics), not inter-event gaps.",
      (s, dir) => {
        val W = Units.Min5Us
        val base = t(s, dir, "events")
          .select(col("user_id"), col("event_id"),
            unix_micros(col("ts")).as("s"),
            (unix_micros(col("ts")) + W).as("e"))
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("s").asc, col("event_id").asc)
        val flagged = base
          .withColumn("pm",
            max(col("e")).over(w.rowsBetween(Window.unboundedPreceding, -1)))
          .withColumn("newgrp",
            when(col("s") > coalesce(col("pm"), lit(Long.MinValue)), 1L)
              .otherwise(0L))
          .withColumn("grp", sum(col("newgrp")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        val ivals = flagged.groupBy(col("user_id"), col("grp"))
          .agg(count(lit(1)).as("n_ev"), min(col("s")).as("gs"),
            max(col("e")).as("ge"))
        ivals.groupBy(col("user_id"))
          .agg(sum(col("n_ev")).as("n_events"),
            count(lit(1)).as("n_intervals"),
            sum(col("ge") - col("gs")).as("covered_us"),
            (max(col("ge")) - min(col("gs"))).as("span_us"))
          .withColumn("coverage_bp", expr("covered_us * 10000 div span_us"))
      },
      Some(s"""
        WITH base AS (
          SELECT user_id, event_id,
                 CAST(epoch_us(ts) AS BIGINT) AS s,
                 CAST(epoch_us(ts) AS BIGINT) + ${Units.Min5Us} AS e
          FROM events),
        f AS (
          SELECT user_id, s, e,
                 CASE WHEN s > coalesce(max(e) OVER (
                        PARTITION BY user_id ORDER BY s ASC, event_id ASC
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                        -9223372036854775808) THEN 1 ELSE 0 END AS newgrp,
                 event_id
          FROM base),
        g AS (
          SELECT user_id, s, e,
                 sum(newgrp) OVER (PARTITION BY user_id
                   ORDER BY s ASC, event_id ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
          FROM f),
        iv AS (
          SELECT user_id, grp, CAST(count(*) AS BIGINT) AS n_ev,
                 min(s) AS gs, max(e) AS ge
          FROM g GROUP BY 1, 2)
        SELECT user_id, CAST(sum(n_ev) AS BIGINT) AS n_events,
               CAST(count(*) AS BIGINT) AS n_intervals,
               CAST(sum(ge - gs) AS BIGINT) AS covered_us,
               max(ge) - min(gs) AS span_us,
               CAST(sum(ge - gs) AS BIGINT) * 10000 // (max(ge) - min(gs))
                 AS coverage_bp
        FROM iv GROUP BY user_id""")),
    // ----------------------------------------------------------------
    Q(
      "q228_twap",
      "Time-WEIGHTED average value per event type over an IRREGULAR " +
        "sample stream — the quant/telemetry aggregate a plain avg() " +
        "gets wrong whenever sampling density correlates with value " +
        "(bursts of cheap events would swamp a sparse expensive " +
        "regime): each event's value holds until the next event of " +
        "the SAME type (step interpolation), so the mean is " +
        "sum(value x holding-micros) / sum(holding-micros). One lead " +
        "window per type under the total order (ts, event_id) " +
        "computes the holding interval — per-partition state is one " +
        "row — and the aggregation is map-side combinable. " +
        "Arithmetic is EXACT end to end: value enters as the q39 " +
        "house DECIMAL(12,2), converts to integer cents, and the " +
        "cents x micros products accumulate in DECIMAL(38,0) (a " +
        "BIGINT accumulator would sit within ~30x of overflow at " +
        "corpus scale); the reported TWAP is the integral-div floor " +
        "in milli-value-units, plus the exact numerator (as a hi/lo " +
        "BIGINT split of the internal DECIMAL — the output surface " +
        "is decimal-free by gate convention) and denominator so any " +
        "consumer can re-derive at full precision. The last " +
        "event of each type has no successor and contributes no " +
        "interval — open-interval semantics stated identically in " +
        "the oracle. SCALE SHAPE: a single per-type lead window would " +
        "funnel the whole corpus through |types| tasks (the " +
        "low-cardinality-partition trap the q149/q164 family dodges " +
        "by pre-aggregating — not available here, TWAP needs every " +
        "event), so the engine runs the TWO-PHASE decomposition: " +
        "lead inside (type, day-bucket) partitions — full parallelism " +
        "— then each bucket's LAST event takes its interval from the " +
        "next non-empty bucket's first timestamp via a window over " +
        "the types x buckets SUMMARY (tiny at any corpus size) joined " +
        "back on the bucket key. The oracle deliberately states the " +
        "naive single-window spelling, so the hash match PROVES the " +
        "decomposition exact, boundary rows included.",
      (s, dir) => {
        val BUCKET_US = Units.DayUs // day buckets
        val e = t(s, dir, "events").select(col("event_type"),
          unix_micros(col("ts")).as("us"), col("event_id"),
          (col("value").cast(DecimalType(12, 2)) * 100)
            .cast(LongType).as("cents"))
          .withColumn("bkt", expr(s"us div $BUCKET_US"))
        // phase 1: lead inside (type, bucket) — parallelism = buckets
        val wb = Window.partitionBy(col("event_type"), col("bkt"))
          .orderBy(col("us").asc, col("event_id").asc)
        val local = e.withColumn("next_us", lead(col("us"), 1).over(wb))
        // phase 2: types x non-empty-buckets summary; lead over it gives
        // each bucket the FIRST timestamp of the type's next non-empty
        // bucket (summary is tiny — the narrow-key window is fine HERE)
        val ws = Window.partitionBy(col("event_type")).orderBy(col("bkt"))
        val handoff = e.groupBy(col("event_type"), col("bkt"))
          .agg(min(col("us")).as("first_us"))
          .withColumn("next_bucket_first", lead(col("first_us"), 1).over(ws))
          .select(col("event_type"), col("bkt"), col("next_bucket_first"))
        local.join(handoff, Seq("event_type", "bkt"))
          .withColumn("dt_us",
            coalesce(col("next_us"), col("next_bucket_first")) - col("us"))
          .where(col("dt_us").isNotNull)
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_intervals"),
            sum(col("dt_us")).as("total_us"),
            sum(col("cents").cast(DecimalType(38, 0)) * col("dt_us"))
              .as("weighted_cents_us"))
          .select(col("event_type"), col("n_intervals"), col("total_us"),
            // DECIMAL(38,0) is INTERNAL only: the gate renders DECIMAL
            // divergently across its read paths (round-8 verdict), so
            // the exact numerator leaves as a hi/lo BIGINT split —
            // value = wcu_hi * 10^15 + wcu_lo, both engines the same
            // truncate-toward-zero div/mod (verified: DuckDB HUGEINT
            // -7//2 = -3, %2 = -1, matching Spark div/%); cents >= 1
            // here anyway so both legs are nonnegative.
            expr("CAST(weighted_cents_us div 1000000000000000 AS BIGINT)")
              .as("wcu_hi"),
            expr("CAST(weighted_cents_us % 1000000000000000 AS BIGINT)")
              .as("wcu_lo"),
            expr("CAST(weighted_cents_us * 10 div total_us AS BIGINT)")
              .as("twap_milli"))
      },
      Some("""
        WITH e AS (
          SELECT event_type, epoch_us(ts) AS us, event_id,
                 CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
          FROM events),
        iv AS (
          SELECT event_type, cents,
                 lead(us) OVER (PARTITION BY event_type
                                ORDER BY us, event_id) - us AS dt_us
          FROM e),
        a AS (
          SELECT event_type, CAST(count(*) AS BIGINT) AS n_intervals,
                 CAST(sum(dt_us) AS BIGINT) AS total_us,
                 CAST(sum(CAST(cents AS DECIMAL(38,0)) * dt_us)
                      AS DECIMAL(38,0)) AS weighted_cents_us
          FROM iv WHERE dt_us IS NOT NULL
          GROUP BY event_type)
        SELECT event_type, n_intervals, total_us,
               CAST(CAST(weighted_cents_us AS HUGEINT) // 1000000000000000
                    AS BIGINT) AS wcu_hi,
               CAST(CAST(weighted_cents_us AS HUGEINT) % 1000000000000000
                    AS BIGINT) AS wcu_lo,
               -- HUGEINT (int128) keeps the // integral-exact; DECIMAL //
               -- routes through DOUBLE in DuckDB and can round the floor
               CAST(CAST(weighted_cents_us AS HUGEINT) * 10 // total_us
                    AS BIGINT) AS twap_milli
        FROM a""")),
    // ----------------------------------------------------------------
    Q(
      "q231_touch_attribution",
      "U-shaped (position-based) multi-touch attribution: every " +
        "conversion (purchase) distributes exactly 10000 bp of credit " +
        "across the touches since the user's previous purchase — 40% " +
        "to the first touch, 40% to the last, 20% split over the " +
        "middles (1 touch takes all, 2 split evenly); integer division " +
        "hands the middle remainder to the earliest middles so every " +
        "conversion's credits sum to EXACTLY 10000 (the invariant " +
        "visible in the output: credit_bp_total == 10000 x the " +
        "distinct conversions each type touches summed over types). " +
        "Touch-to-conversion assignment is segmentation, not pairing: " +
        "a reverse-prefix count of purchases per user keys each event " +
        "to the next purchase at-or-after it, so the mapping costs ONE " +
        "user-partitioned window pass — never the touches x " +
        "conversions interval self-join that quadratically explodes " +
        "on heavy users — and the position/credit pass is a second " +
        "window over (user, conversion) segments. Both windows " +
        "partition on high-cardinality keys; only 8-byte ids, the " +
        "type tag and two small integers shuffle. Events after a " +
        "user's last purchase have no conversion and are excluded, " +
        "stated identically in both engines.",
      (s, dir) => {
        val e = t(s, dir, "events")
          .select(col("user_id"), col("event_id"), col("event_type"), col("ts"))
        // k = purchases at-or-after this event (reverse prefix sum);
        // (user_id, k>=1) identifies the event's conversion segment
        val wrev = Window.partitionBy(col("user_id"))
          .orderBy(col("ts").desc, col("event_id").desc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val seg = e.withColumn("k",
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .over(wrev))
          .where(col("event_type") =!= "purchase" && col("k") >= 1)
        val wseg = Window.partitionBy(col("user_id"), col("k"))
        val pos = seg
          .withColumn("pos", row_number().over(
            wseg.orderBy(col("ts").asc, col("event_id").asc)))
          .withColumn("n", count(lit(1)).over(wseg))
          .withColumn("credit_bp", expr("""
            CASE WHEN n = 1 THEN 10000L
                 WHEN n = 2 THEN 5000L
                 WHEN pos = 1 OR pos = n THEN 4000L
                 ELSE 2000 div (n - 2)
                      + CASE WHEN pos - 1 <= 2000 % (n - 2) THEN 1L ELSE 0L END
            END"""))
        pos.groupBy(col("event_type")).agg(
          count(lit(1)).as("n_touches"),
          sum(when(col("pos") === 1, 1L).otherwise(0L)).as("n_first"),
          sum(when(col("pos") === col("n"), 1L).otherwise(0L)).as("n_last"),
          countDistinct(concat(col("user_id").cast(StringType), lit("#"),
            col("k").cast(StringType))).as("n_convs_touched"),
          sum(col("credit_bp")).as("credit_bp_total"))
      },
      Some("""
        WITH seg AS (
          SELECT user_id, event_id, event_type, ts,
                 sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   OVER (PARTITION BY user_id
                         ORDER BY ts DESC, event_id DESC
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS k
          FROM events),
        touches AS (
          SELECT * FROM seg WHERE event_type <> 'purchase' AND k >= 1),
        pos AS (
          SELECT event_type, user_id, k,
                 row_number() OVER (PARTITION BY user_id, k
                                    ORDER BY ts ASC, event_id ASC) AS pos,
                 count(*) OVER (PARTITION BY user_id, k) AS n
          FROM touches)
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n_touches,
               CAST(sum(CASE WHEN pos = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_first,
               CAST(sum(CASE WHEN pos = n THEN 1 ELSE 0 END) AS BIGINT) AS n_last,
               CAST(count(DISTINCT concat(user_id, '#', k)) AS BIGINT) AS n_convs_touched,
               CAST(sum(CASE WHEN n = 1 THEN 10000
                             WHEN n = 2 THEN 5000
                             WHEN pos = 1 OR pos = n THEN 4000
                             ELSE 2000 // (n - 2)
                                  + CASE WHEN pos - 1 <= 2000 % (n - 2)
                                         THEN 1 ELSE 0 END
                        END) AS BIGINT) AS credit_bp_total
        FROM pos GROUP BY event_type""")),
    // ----------------------------------------------------------------
    Q(
      "q237_ols_trend",
      "Per-type least-squares value trend over time — the exact OLS " +
        "slope/intercept from the five classic sufficient statistics " +
        "(n, Sx, Sy, Sxx, Sxy), which are ALL plain sums: one " +
        "map-side-combined aggregation per event type and the closed " +
        "form runs on the types-row frame. x is the DAY INDEX " +
        "RELATIVE to the corpus start (one 1-row min broadcast) — " +
        "keeping x small is both numerical conditioning and what " +
        "lets the cross-multiplied integers fit: slope = (n*Sxy - " +
        "Sx*Sy) / (n*Sxx - Sx^2) stays exact with the products in " +
        "DECIMAL(38,0) — internal only, per the gate's no-DECIMAL-" +
        "output convention — reported as hi/lo BIGINT splits of the " +
        "numerator/denominator (value = hi * 10^15 + lo, identical " +
        "truncate-toward-zero div/mod in both engines) plus the " +
        "e6-scaled quotient (milli-cents per day x 1000), and the " +
        "intercept closes as (Sy*den - num*Sx) div (n*den) in milli-" +
        "cents — every reported column an exact integer, no " +
        "per-row regression library anywhere.",
      (s, dir) => {
        val e = t(s, dir, "events").select(col("event_type"),
          expr(s"unix_micros(ts) div ${Units.DayUs}").as("day"),
          (col("value").cast(DecimalType(12, 2)) * 100)
            .cast(LongType).as("cents"))
        val d0 = e.agg(min(col("day")).as("day0"))
        val st = e.crossJoin(broadcast(d0))
          .withColumn("x", col("day") - col("day0"))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
            sum(col("cents")).as("sy"),
            sum(col("x") * col("x")).as("sxx"),
            sum(col("x") * col("cents")).as("sxy"))
        st.withColumn("num", expr(
            "CAST(n AS DECIMAL(38,0)) * sxy - CAST(sx AS DECIMAL(38,0)) * sy"))
          .withColumn("den", expr(
            "CAST(n AS DECIMAL(38,0)) * sxx - CAST(sx AS DECIMAL(38,0)) * sx"))
          .select(col("event_type"), col("n"), col("sx"), col("sy"),
            expr("CAST(num div 1000000000000000 AS BIGINT)").as("num_hi"),
            expr("CAST(num % 1000000000000000 AS BIGINT)").as("num_lo"),
            expr("CAST(den div 1000000000000000 AS BIGINT)").as("den_hi"),
            expr("CAST(den % 1000000000000000 AS BIGINT)").as("den_lo"),
            expr("CAST(num * 1000000 div den AS BIGINT)").as("slope_e6"),
            expr("CAST((CAST(sy AS DECIMAL(38,0)) * den - num * sx) * 1000" +
              " div (CAST(n AS DECIMAL(38,0)) * den) AS BIGINT)")
              .as("intercept_milli"))
      },
      Some(s"""
        WITH e AS (
          SELECT event_type, epoch_us(ts) // ${Units.DayUs} AS day,
                 CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
          FROM events),
        d0 AS (SELECT min(day) AS day0 FROM e),
        st AS (
          SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(day - day0) AS BIGINT) AS sx,
                 CAST(sum(cents) AS BIGINT) AS sy,
                 CAST(sum((day - day0) * (day - day0)) AS BIGINT) AS sxx,
                 CAST(sum((day - day0) * cents) AS BIGINT) AS sxy
          FROM e CROSS JOIN d0 GROUP BY event_type),
        f AS (
          SELECT event_type, n, sx, sy,
                 CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS num,
                 CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS den
          FROM st)
        SELECT event_type, n, sx, sy,
               CAST(num // 1000000000000000 AS BIGINT) AS num_hi,
               CAST(num % 1000000000000000 AS BIGINT) AS num_lo,
               CAST(den // 1000000000000000 AS BIGINT) AS den_hi,
               CAST(den % 1000000000000000 AS BIGINT) AS den_lo,
               CAST(num * 1000000 // den AS BIGINT) AS slope_e6,
               CAST((CAST(sy AS HUGEINT) * den - num * sx) * 1000
                    // (CAST(n AS HUGEINT) * den) AS BIGINT) AS intercept_milli
        FROM f""")),
    // ----------------------------------------------------------------
    Q(
      "q239_seasonal_profile",
      "Hour-of-day seasonal decomposition per event type: the " +
        "seasonal component is each (type, hour-of-day) cell's mean " +
        "value (exact milli-cents, the q228 money convention), and " +
        "the residual roll-up — mean absolute deviation of each " +
        "event from ITS cell's seasonal mean — quantifies how much " +
        "signal the 24-slot profile explains, per cell. Two passes " +
        "by necessity (the residual needs the mean), but pass 2 " +
        "joins the events to a <=types x 24-row broadcast profile — " +
        "never a window over the raw stream — and both passes are " +
        "map-side-combined aggregations; everything shuffled is " +
        "(type, hod, 3 longs). All arithmetic exact: floor-division " +
        "means in milli-cents, absolute deviations of integer " +
        "milli-values.",
      (s, dir) => {
        val e = t(s, dir, "events").select(col("event_type"),
          hour(col("ts")).cast(LongType).as("hod"),
          (col("value").cast(DecimalType(12, 2)) * 100)
            .cast(LongType).as("cents"))
        val prof = e.groupBy(col("event_type"), col("hod"))
          .agg(count(lit(1)).as("n"), sum(col("cents")).as("sc"))
          .withColumn("seasonal_milli", expr("sc * 1000 div n"))
        e.join(broadcast(prof), Seq("event_type", "hod"))
          .withColumn("ad", abs(col("cents") * 1000 - col("seasonal_milli")))
          .groupBy(col("event_type"), col("hod"), col("n"),
            col("seasonal_milli"))
          .agg(sum(col("ad")).as("sad"))
          .select(col("event_type"), col("hod"), col("n"),
            col("seasonal_milli"),
            expr("sad div n").as("mad_resid_milli"))
      },
      Some("""
        WITH e AS (
          SELECT event_type, CAST(hour(ts) AS BIGINT) AS hod,
                 CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
          FROM events),
        prof AS (
          SELECT event_type, hod, CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(cents) AS BIGINT) AS sc,
                 CAST(sum(cents) AS BIGINT) * 1000
                   // CAST(count(*) AS BIGINT) AS seasonal_milli
          FROM e GROUP BY 1, 2)
        SELECT e.event_type, e.hod, n, seasonal_milli,
               CAST(sum(abs(cents * 1000 - seasonal_milli)) AS BIGINT)
                 // n AS mad_resid_milli
        FROM e JOIN prof ON e.event_type = prof.event_type AND e.hod = prof.hod
        GROUP BY 1, 2, 3, 4""")),
    // ----------------------------------------------------------------
    Q(
      "q240_wilson_bound",
      "Wilson-score lower confidence bound (z = 2) on each event " +
        "type's high-value rate — the ranking statistic that, unlike " +
        "the raw share, cannot put a 2-of-2 stratum above a " +
        "950-of-1000 one: small n drags the bound down. Stated " +
        "float-free as the floor-composed form both engines evaluate " +
        "identically: inner = (s*(n-s)*1e6) div n + 1e6 (the " +
        "variance term e6-scaled, product in DECIMAL(38,0)), r3 = " +
        "floor(sqrt(inner)) — sqrt of an exact integer-valued double " +
        "is IEEE correctly rounded, the q177 convention — and " +
        "lb_bp = ((s+2)*10000 - 20*r3) div (n+4), clamped at 0. One " +
        "map-side-combined count pass; the formula runs on the " +
        "types-row frame.",
      (s, dir) => {
        val e = t(s, dir, "events").select(col("event_type"),
          when(col("value").cast(DecimalType(12, 2)) >= 100, 1L)
            .otherwise(0L).as("hit"))
        e.groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"), sum(col("hit")).as("s"))
          .withColumn("share_bp", expr("s * 10000 div n"))
          .withColumn("inner6", expr(
            "CAST(CAST(s AS DECIMAL(38,0)) * (n - s) * 1000000 div n" +
              " AS BIGINT) + 1000000"))
          .withColumn("r3",
            floor(sqrt(col("inner6").cast(DoubleType))).cast(LongType))
          .select(col("event_type"), col("n"), col("s"), col("share_bp"),
            expr("greatest(0L, ((s + 2) * 10000 - 20 * r3) div (n + 4))")
              .as("wilson_lb_bp"))
      },
      Some("""
        WITH e AS (
          SELECT event_type,
                 CASE WHEN CAST(value AS DECIMAL(12,2)) >= 100
                      THEN 1 ELSE 0 END AS hit
          FROM events),
        g AS (
          SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(hit) AS BIGINT) AS s
          FROM e GROUP BY 1),
        f AS (
          SELECT event_type, n, s, s * 10000 // n AS share_bp,
                 CAST(CAST(s AS HUGEINT) * (n - s) * 1000000 // n AS BIGINT)
                   + 1000000 AS inner6
          FROM g)
        SELECT event_type, n, s, share_bp,
               greatest(0, ((s + 2) * 10000
                 - 20 * CAST(floor(sqrt(CAST(inner6 AS DOUBLE))) AS BIGINT))
                 // (n + 4)) AS wilson_lb_bp
        FROM f""")),
    // ----------------------------------------------------------------
    Q(
      "q241_gains_table",
      "Cumulative gains / lift table — the targeting datasheet: rank " +
        "users by total spend, cut into ten deciles, and report how " +
        "fast the purchasers concentrate (decile 1's lift_bp >> " +
        "10000 means the top spenders capture purchasers far above " +
        "their population share). The SCALE-SHAPED decile rule: " +
        "never a global ntile sort — user scores discretize into " +
        "dollar buckets (cardinality bounded by the spend RANGE, not " +
        "the user count), the bucket HISTOGRAM gets a cumulative " +
        "count (a window over the bounded bucket frame, single-" +
        "valued-partitioned by the boundedRank rationale), and a " +
        "whole bucket joins its decile = (users-above * 10) div " +
        "n + 1 — rows never leave their bucket, so the boundary rule " +
        "is deterministic and both engines state it identically " +
        "(ntile would split a tied bucket arbitrarily). All shares " +
        "integer bp; the lift cross-multiplies in DECIMAL(38,0).",
      (s, dir) => {
        val users = t(s, dir, "events")
          .select(col("user_id"),
            (col("value").cast(DecimalType(12, 2)) * 100)
              .cast(LongType).as("cents"),
            when(col("event_type") === "purchase", 1L).otherwise(0L).as("p"))
          .groupBy(col("user_id"))
          .agg(sum(col("cents")).as("spend"), max(col("p")).as("resp"))
          .withColumn("bucket", expr("spend div 10000"))
        val hist = users.groupBy(col("bucket"))
          .agg(count(lit(1)).as("n_u"), sum(col("resp")).as("n_r"))
        val tot = hist.agg(sum(col("n_u")).as("nt_u"), sum(col("n_r")).as("nt_r"))
        val ht = hist.crossJoin(broadcast(tot))
        val wAbove = Window.partitionBy(col("nt_u") % 1)
          .orderBy(col("bucket").desc)
          .rowsBetween(Window.unboundedPreceding, -1)
        val dec = ht
          .withColumn("above", coalesce(sum(col("n_u")).over(wAbove), lit(0L)))
          .withColumn("decile", expr("above * 10 div nt_u + 1"))
          .groupBy(col("decile"), col("nt_u"), col("nt_r"))
          .agg(sum(col("n_u")).as("n_users"), sum(col("n_r")).as("n_resp"))
        val wCum = Window.partitionBy(col("nt_u") % 1)
          .orderBy(col("decile"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        dec
          .withColumn("cum_u", sum(col("n_users")).over(wCum))
          .withColumn("cum_r", sum(col("n_resp")).over(wCum))
          .select(col("decile"), col("n_users"), col("n_resp"),
            expr("n_resp * 10000 div n_users").as("resp_bp"),
            expr("cum_u * 10000 div nt_u").as("cum_users_bp"),
            expr("cum_r * 10000 div nt_r").as("cum_resp_bp"),
            expr("CAST(CAST(cum_r AS DECIMAL(38,0)) * nt_u * 10000" +
              " div (CAST(nt_r AS DECIMAL(38,0)) * cum_u) AS BIGINT)")
              .as("lift_bp"))
      },
      Some("""
        WITH users AS (
          SELECT user_id,
                 CAST(sum(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT))
                      AS BIGINT) AS spend,
                 CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                      AS BIGINT) AS resp
          FROM events GROUP BY user_id),
        hist AS (
          SELECT spend // 10000 AS bucket, CAST(count(*) AS BIGINT) AS n_u,
                 CAST(sum(resp) AS BIGINT) AS n_r
          FROM users GROUP BY 1),
        tot AS (
          SELECT CAST(sum(n_u) AS BIGINT) AS nt_u,
                 CAST(sum(n_r) AS BIGINT) AS nt_r
          FROM hist),
        dec AS (
          -- DuckDB sum(BIGINT) returns HUGEINT; every column that can
          -- reach the output is cast back to BIGINT here and below —
          -- the gate renders HUGEINT divergently (round-8 verdict)
          SELECT CAST(coalesce(sum(n_u) OVER (ORDER BY bucket DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   * 10 // nt_u + 1 AS BIGINT) AS decile,
                 n_u, n_r, nt_u, nt_r
          FROM hist CROSS JOIN tot),
        g AS (
          SELECT decile, nt_u, nt_r, CAST(sum(n_u) AS BIGINT) AS n_users,
                 CAST(sum(n_r) AS BIGINT) AS n_resp
          FROM dec GROUP BY 1, 2, 3)
        SELECT decile, n_users, n_resp,
               n_resp * 10000 // n_users AS resp_bp,
               CAST(sum(n_users) OVER (ORDER BY decile
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 * 10000 // nt_u AS BIGINT) AS cum_users_bp,
               CAST(sum(n_resp) OVER (ORDER BY decile
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 * 10000 // nt_r AS BIGINT) AS cum_resp_bp,
               CAST(CAST(sum(n_resp) OVER (ORDER BY decile
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                      AS HUGEINT) * nt_u * 10000
                    // (CAST(nt_r AS HUGEINT) * sum(n_users) OVER (
                        ORDER BY decile
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
                    AS BIGINT) AS lift_bp
        FROM g"""))
  )
}
