package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.queries.Tables.{spread, t}

/** Pattern-mining / graph-traversal / statistical-profiling queries
  * (q162+): multi-source BFS over a co-occurrence graph, association
  * rules, autocorrelation, functional-dependency profiling — the
  * mining layer a training-data curation team runs ON TOP of the
  * dedup/quality operators to understand corpus structure.
  *
  * Shared design rules (same as the rest of the registry): exact
  * integer/decimal accumulation wherever a sum crosses a shuffle
  * (doubles only in final scalar formulas, where IEEE evaluation is
  * order-free and bit-identical across engines), no unpartitioned
  * windows over unbounded input, joins keyed on narrow columns only.
  */
object MiningQueries {

  /** q236: bootstrap replicate count (columns, not rows — see doc). */
  private val BOOT_B = 32

  /** q236: cumulative Poisson(1) CDF in exact integer parts-per-1e6
    * (floor of e^-1 * (1 + 1 + 1/2! + ...) * 1e6): a keyed-hash
    * uniform u in [0, 1e6) maps to weight k = first index with
    * u < cum[k], else 8. Literals, so both engines share the exact
    * same inverse-CDF table — no transcendental evaluation per row. */
  private val BOOT_CUM = Seq(367879L, 735758L, 919698L, 981011L,
    996340L, 999405L, 999916L, 999989L)

  /** q162: BFS depth bound. Fixed at plan time — the loop unrolls into
    * a 3-deep dag, so no checkpoint machinery is needed (contrast the
    * data-dependent iteration in Dedup.connectedComponents, which
    * checkpoints per round because its round count is unbounded). */
  private val BFS_DEPTH = 3

  /** q162: seed rule — parts whose key is divisible by this. A pure
    * arithmetic predicate so both engines pick the identical seed set
    * with no RNG. */
  private val BFS_SEED_MOD = 97

  /** q163: minimum support in basis points of baskets. */
  private val MIN_SUPPORT_BP = 100

  /** q164: autocorrelation lags evaluated (hours 1..N). */
  private val ACF_MAX_LAG = 6

  /** q173's per-view classification frame (one row per view event with
    * its hit verdict and exact-micros latency) — shared between the
    * batch aggregation and the streaming twin's equivalence spec
    * (EventsStream.patternStream emits exactly these rows in batch
    * mode). */
  private[graft] def patternViews(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    val ev = t(s, dir, "events").select(col("user_id"),
      col("event_type"), unix_micros(col("ts")).as("us"),
      col("event_id"),
      expr("unix_timestamp(date_trunc('day', ts)) div 86400").as("day"))
    val tail = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("event_id"))
      .rowsBetween(1, Window.unboundedFollowing)
    ev
      .withColumn("next_purchase",
        min(when(col("event_type") === "purchase", col("us"))).over(tail))
      .withColumn("next_error",
        min(when(col("event_type") === "error", col("us"))).over(tail))
      .where(col("event_type") === "view")
      .withColumn("hit",
        col("next_purchase").isNotNull
          && col("next_purchase") - col("us") <= 3600L * 1000000L
          && (col("next_error").isNull
            || col("next_error") > col("next_purchase")))
  }

  /** q168: sorted-neighborhood window — each row compares to the next
    * SNM_WINDOW-1 rows in block-sorted order. */
  private val SNM_WINDOW = 3

  /** q168: exact token-Jaccard verification threshold. */
  private val SNM_JACCARD = 0.5

  /** q176: events kept per (user, day) basket — bounds the ordered
    * collect's per-group state. */
  private val PATH_LEN = 5

  val all: Seq[Q] = Seq(
    // ----------------------------------------------------------------
    Q(
      "q162_copurchase_bfs",
      "Multi-source BFS over the part co-purchase graph: parts are " +
        "vertices, an edge links two parts that share an order " +
        "(distinct (order, part) pairs self-joined on the order key — " +
        "fan-out is quadratic only in BASKET size, which is bounded " +
        "by schema at 7 and by practice at tens, never in corpus " +
        "size), seeds are the arithmetic set p_partkey % " +
        s"$BFS_SEED_MOD = 0, and three expansion rounds label every " +
        "part with its minimum hop distance. Each round is ONE " +
        "equi-join of the current frontier against the cached edge " +
        "list (pre-partitioned on src so all rounds reuse the " +
        "exchange) plus an anti-join against the visited set — " +
        "8-byte keys only, never part payloads. The depth is a " +
        "plan-time constant, so the loop unrolls into a fixed dag " +
        "and needs no per-round checkpoint (the unbounded-iteration " +
        "variant of this pattern, connected components, has one). " +
        "Output: per hop, the reachable-part count and key range — " +
        "the 'blast radius' report for seed-set contamination " +
        "analysis (how much of the catalog is within k association " +
        "steps of a flagged item).",
      (s, dir) => {
        val items = t(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_partkey")).distinct()
        val a = items.as("a")
        val b = items.as("b")
        // NO distinct on edges: a pair that co-occurs in k orders
        // appears k times, but co-purchase multiplicity is ~1 (0.3%
        // dups measured at sf0.1) and the per-round frontier distinct
        // absorbs it — deduping here would cost a full extra shuffle
        // of the edge list for nothing. repartition(src) is the one
        // edge shuffle; every round's join then exchanges only its
        // (small) frontier side against the cached partitioning.
        val edges = a.join(b, col("a.l_orderkey") === col("b.l_orderkey"))
          .where(col("a.l_partkey") =!= col("b.l_partkey"))
          .select(col("a.l_partkey").as("src"), col("b.l_partkey").as("dst"))
          .repartition(col("src"))
          .persist()
        val seeds = t(s, dir, "part")
          .where(col("p_partkey") % BFS_SEED_MOD === 0)
          .select(col("p_partkey").as("id"))
        // each frontier is persisted: round h+1's anti-join references
        // every earlier frontier, and without the cache the lazy
        // lineage RECOMPUTES round 1..h-1 inside round h (measured 2x+
        // on this query; the id frontiers are 8 bytes/row, so the
        // cache ceiling is #vertices * 8B however deep the walk)
        var visited = seeds.withColumn("hop", lit(0))
        var frontier = seeds
        for (h <- 1 to BFS_DEPTH) {
          val next = frontier.join(edges, frontier("id") === edges("src"))
            .select(col("dst").as("id")).distinct()
            .join(visited.select("id"), Seq("id"), "left_anti")
            .persist()
          visited = visited.union(next.withColumn("hop", lit(h)))
          frontier = next
        }
        visited.groupBy(col("hop"))
          .agg(count(lit(1)).as("n_parts"),
            min(col("id")).as("min_id"), max(col("id")).as("max_id"))
          .orderBy(col("hop"))
      },
      Some(s"""
        WITH RECURSIVE
        items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        edges AS (
          SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
          FROM items a JOIN items b ON a.l_orderkey = b.l_orderkey
          WHERE a.l_partkey <> b.l_partkey),
        bfs AS (
          SELECT p_partkey AS id, 0 AS hop FROM part
          WHERE p_partkey % $BFS_SEED_MOD = 0
          UNION
          SELECT e.dst, b.hop + 1 FROM bfs b JOIN edges e ON e.src = b.id
          WHERE b.hop < $BFS_DEPTH),
        best AS (SELECT id, min(hop) AS hop FROM bfs GROUP BY id)
        SELECT CAST(hop AS INT) AS hop, CAST(count(*) AS BIGINT) AS n_parts,
               min(id) AS min_id, max(id) AS max_id
        FROM best GROUP BY hop ORDER BY hop""")),
    // ----------------------------------------------------------------
    Q(
      "q163_assoc_rules",
      "Association rules over order baskets at the brand level: " +
        "baskets are orders, items are the distinct part brands in " +
        "each basket (lineitem joined to the part dimension on the " +
        "8-byte part key, projecting ONLY the brand), and every " +
        "ordered brand pair (a < b lexically) gets support, " +
        "directed confidence a->b, and lift — all in integer basis " +
        "points, with the lift cross-product computed in " +
        "DECIMAL(38,0)/HUGEINT because n_ab * N overflows a 64-bit " +
        "long at around 1e11 baskets (the silent-wrap trap q104's " +
        "review found, designed out here from the start). Item " +
        "cardinality bounds the pair space (25 brands -> <= 300 " +
        "rows), so the report aggregates down, never up: the only " +
        "corpus-scale shuffles are the distinct (order, brand) " +
        "projection and one pair count keyed on two short strings. " +
        "Rules below ${MIN_SUPPORT_BP} bp support are dropped.",
      (s, dir) => {
        val brands = t(s, dir, "part").select(col("p_partkey"), col("p_brand"))
        // repartition on the basket key AFTER the distinct: the pair
        // self-join then reads BOTH sides from the cached
        // orderkey-partitioning and plans no further exchange (the
        // distinct's own (orderkey, brand) hash satisfies neither side)
        val ob = t(s, dir, "lineitem")
          .join(brands, col("l_partkey") === col("p_partkey"))
          .select(col("l_orderkey"), col("p_brand").as("brand"))
          .distinct()
          .repartition(col("l_orderkey"))
          .persist()
        val nBaskets = ob.agg(countDistinct(col("l_orderkey")).as("n_baskets"))
        val perBrand = ob.groupBy(col("brand")).agg(count(lit(1)).as("n_brand"))
        val x = ob.as("x")
        val y = ob.as("y")
        val pairs = x.join(y, col("x.l_orderkey") === col("y.l_orderkey"))
          .where(col("x.brand") < col("y.brand"))
          .groupBy(col("x.brand").as("brand_a"), col("y.brand").as("brand_b"))
          .agg(count(lit(1)).as("n_ab"))
        pairs
          .join(perBrand.withColumnRenamed("brand", "brand_a")
            .withColumnRenamed("n_brand", "n_a"), Seq("brand_a"))
          .join(perBrand.withColumnRenamed("brand", "brand_b")
            .withColumnRenamed("n_brand", "n_b"), Seq("brand_b"))
          .crossJoin(broadcast(nBaskets))
          .where(col("n_ab") * 10000 >= col("n_baskets") * MIN_SUPPORT_BP)
          .select(col("brand_a"), col("brand_b"), col("n_ab"),
            expr("n_ab * 10000 div n_baskets").as("support_bp"),
            expr("n_ab * 10000 div n_a").as("conf_ab_bp"),
            expr("n_ab * 10000 div n_b").as("conf_ba_bp"),
            // `div` (IntegralDivide) truncates like DuckDB's `//`; a
            // fractional divide + decimal cast would HALF_UP-round and
            // disagree near integer boundaries
            expr("CAST(CAST(n_ab AS DECIMAL(38,0)) * CAST(n_baskets AS DECIMAL(38,0)) * 10000" +
              " div (CAST(n_a AS DECIMAL(38,0)) * CAST(n_b AS DECIMAL(38,0))) AS BIGINT)")
              .as("lift_bp"))
          .orderBy(col("brand_a"), col("brand_b"))
      },
      Some(s"""
        WITH ob AS (
          SELECT DISTINCT l_orderkey, p_brand AS brand
          FROM lineitem JOIN part ON l_partkey = p_partkey),
        nb AS (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_baskets FROM ob),
        pb AS (SELECT brand, CAST(count(*) AS BIGINT) AS n_brand FROM ob GROUP BY 1),
        pr AS (
          SELECT x.brand AS brand_a, y.brand AS brand_b,
                 CAST(count(*) AS BIGINT) AS n_ab
          FROM ob x JOIN ob y ON x.l_orderkey = y.l_orderkey
          WHERE x.brand < y.brand GROUP BY 1, 2)
        SELECT brand_a, brand_b, n_ab,
               n_ab * 10000 // n_baskets AS support_bp,
               n_ab * 10000 // a.n_brand AS conf_ab_bp,
               n_ab * 10000 // b.n_brand AS conf_ba_bp,
               CAST(CAST(n_ab AS HUGEINT) * n_baskets * 10000
                    // (CAST(a.n_brand AS HUGEINT) * b.n_brand) AS BIGINT) AS lift_bp
        FROM pr
        JOIN pb a ON pr.brand_a = a.brand
        JOIN pb b ON pr.brand_b = b.brand
        CROSS JOIN nb
        WHERE n_ab * 10000 >= n_baskets * $MIN_SUPPORT_BP
        ORDER BY brand_a, brand_b""")),
    // ----------------------------------------------------------------
    Q(
      "q164_acf",
      "Autocorrelation function of the hourly event-volume series at " +
        s"lags 1..$ACF_MAX_LAG hours — the seasonality probe behind " +
        "ingest-anomaly baselining (a strong lag-24 ACF says " +
        "'compare to yesterday', a strong lag-1 says 'smooth'). " +
        "Hourly counts reduce the corpus to one row per hour; each " +
        "lag pairs hour t with hour t+k via an 8-byte epoch equi-join " +
        "(present-hour pairs only — no unpartitioned lag window, and " +
        "the join replaces the global sort a window would need); " +
        "Pearson r per lag uses the exact-moment pattern (q99): " +
        "counts accumulate as DECIMAL(38,0)/HUGEINT, and only the " +
        "final scalar formula touches doubles, so the statistic is " +
        "bit-identical under any partitioning. Lags with zero " +
        "variance on either side report NULL on both engines.",
      (s, dir) => {
        val d38 = DecimalType(38, 0)
        val hourly = t(s, dir, "events")
          .groupBy((unix_timestamp(date_trunc("hour", col("ts")))).as("hr"))
          .agg(count(lit(1)).as("cnt"))
          .persist()
        val lags = s.range(1, ACF_MAX_LAG + 1).select(col("id").as("lag"))
        val left = hourly.crossJoin(broadcast(lags))
          .select(col("lag"), (col("hr") + col("lag") * 3600L).as("hr_next"),
            col("cnt").as("x"))
        val paired = left.join(hourly.select(col("hr").as("hr_next"),
          col("cnt").as("y")), Seq("hr_next"))
        paired.groupBy(col("lag"))
          .agg(count(lit(1)).cast(d38).as("n"),
            sum(col("x").cast(d38)).as("sx"),
            sum(col("y").cast(d38)).as("sy"),
            sum((col("x") * col("x")).cast(d38)).as("sxx"),
            sum((col("y") * col("y")).cast(d38)).as("syy"),
            sum((col("x") * col("y")).cast(d38)).as("sxy"))
          .select(col("lag"), col("n").cast(LongType).as("n_pairs"),
            when(col("n") * col("sxx") === col("sx") * col("sx"), lit(null))
              .when(col("n") * col("syy") === col("sy") * col("sy"), lit(null))
              .otherwise(
                (col("n") * col("sxy") - col("sx") * col("sy")).cast(DoubleType)
                  / (sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast(DoubleType))
                    * sqrt((col("n") * col("syy") - col("sy") * col("sy")).cast(DoubleType))))
              .as("acf"))
          .orderBy(col("lag"))
      },
      Some(s"""
        WITH hourly AS (
          SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hr,
                 CAST(count(*) AS BIGINT) AS cnt
          FROM events GROUP BY 1),
        lags AS (SELECT CAST(range AS BIGINT) AS lag FROM range(1, ${ACF_MAX_LAG + 1})),
        paired AS (
          SELECT l.lag, a.cnt AS x, b.cnt AS y
          FROM hourly a CROSS JOIN lags l
          JOIN hourly b ON b.hr = a.hr + l.lag * 3600),
        m AS (
          SELECT lag, CAST(count(*) AS HUGEINT) AS n,
                 CAST(sum(CAST(x AS HUGEINT)) AS HUGEINT) AS sx,
                 CAST(sum(CAST(y AS HUGEINT)) AS HUGEINT) AS sy,
                 CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
                 CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy,
                 CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy
          FROM paired GROUP BY lag)
        SELECT lag, CAST(n AS BIGINT) AS n_pairs,
               CASE WHEN n * sxx = sx * sx THEN NULL
                    WHEN n * syy = sy * sy THEN NULL
                    ELSE CAST(n * sxy - sx * sy AS DOUBLE)
                         / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                            * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))
               END AS acf
        FROM m ORDER BY lag""")),
    // ----------------------------------------------------------------
    Q(
      "q165_fd_profile",
      "Approximate functional-dependency profiling — the schema-" +
        "discovery pass a data catalog runs to find which columns " +
        "determine which (candidate keys, denormalization errors, " +
        "safe partition hierarchies). For each candidate determinant " +
        "-> dependent pair, the g3 error metric: the minimum number " +
        "of rows to delete for the FD to hold exactly = n_rows - " +
        "sum over determinant groups of the majority dependent's " +
        "count. Two keyed aggregations per candidate (pair counts, " +
        "then per-determinant argmax), each shuffling only the two " +
        "candidate columns; candidates evaluate independently and " +
        "union at the report level (5 rows). nation->region holds " +
        "exactly by construction; the part/orders candidates measure " +
        "real violation mass.",
      (s, dir) => {
        def fd(df: org.apache.spark.sql.DataFrame, det: String, dep: String,
            label: String) = {
          val pairs = df.groupBy(col(det).as("det"), col(dep).as("dep"))
            .agg(count(lit(1)).as("cnt"))
          pairs.groupBy(col("det"))
            .agg(sum(col("cnt")).as("rows_det"), max(col("cnt")).as("keep_det"))
            .agg(lit(label).as("fd"), sum(col("rows_det")).as("n_rows"),
              count(lit(1)).as("n_groups"),
              (sum(col("rows_det")) - sum(col("keep_det"))).as("n_violations"),
              expr("(sum(rows_det) - sum(keep_det)) * 10000 div sum(rows_det)")
                .as("err_bp"))
        }
        val part = t(s, dir, "part")
        val orders = t(s, dir, "orders")
        val nation = t(s, dir, "nation")
        fd(part, "p_brand", "p_type", "brand->type")
          .unionByName(fd(part, "p_type", "p_brand", "type->brand"))
          .unionByName(fd(part, "p_brand", "p_size", "brand->size"))
          .unionByName(fd(orders, "o_orderpriority", "o_orderstatus",
            "priority->status"))
          .unionByName(fd(nation, "n_nationkey", "n_regionkey",
            "nation->region"))
          .orderBy(col("fd"))
      },
      Some("""
        WITH cand AS (
          SELECT 'brand->type' AS fd, p_brand AS det, p_type AS dep FROM part
          UNION ALL
          SELECT 'type->brand', p_type, p_brand FROM part
          UNION ALL
          SELECT 'brand->size', p_brand, CAST(p_size AS VARCHAR) FROM part
          UNION ALL
          SELECT 'priority->status', o_orderpriority, o_orderstatus FROM orders
          UNION ALL
          SELECT 'nation->region', CAST(n_nationkey AS VARCHAR),
                 CAST(n_regionkey AS VARCHAR) FROM nation),
        pairs AS (
          SELECT fd, det, dep, CAST(count(*) AS BIGINT) AS cnt
          FROM cand GROUP BY 1, 2, 3),
        per_det AS (
          SELECT fd, det, CAST(sum(cnt) AS BIGINT) AS rows_det,
                 max(cnt) AS keep_det
          FROM pairs GROUP BY 1, 2)
        SELECT fd, CAST(sum(rows_det) AS BIGINT) AS n_rows,
               CAST(count(*) AS BIGINT) AS n_groups,
               CAST(sum(rows_det) - sum(keep_det) AS BIGINT) AS n_violations,
               CAST((sum(rows_det) - sum(keep_det)) * 10000 // sum(rows_det)
                    AS BIGINT) AS err_bp
        FROM per_det GROUP BY fd ORDER BY fd""")),
    // ----------------------------------------------------------------
    Q(
      "q166_weighted_median",
      "Exact distributed weighted median: per return flag, the " +
        "lower weighted median of extended price with quantity as " +
        "weight — the robust 'typical spend' statistic unit tests " +
        "can't fake with an unweighted median when row weights vary. " +
        "One partitioned window per group computes cumulative weight " +
        "in VALUE order with the default RANGE frame, which both " +
        "engines define to include ALL peers of the current value — " +
        "so the cumulative weight at any row is tie-insensitive and " +
        "the selected value (the least value whose doubled cumulative " +
        "weight reaches the group total) is deterministic without a " +
        "tiebreak column. Weights accumulate as longs (quantity is " +
        "bounded); the window partitions by the group key, so no " +
        "single-task global sort exists at any size.",
      (s, dir) => {
        val li = t(s, dir, "lineitem").select(col("l_returnflag"),
          col("l_extendedprice").as("v"),
          col("l_quantity").cast(LongType).as("w"))
        val byFlag = Window.partitionBy(col("l_returnflag"))
        val cum = li
          .withColumn("cum_w", sum(col("w")).over(byFlag.orderBy(col("v"))))
          .withColumn("tot_w", sum(col("w")).over(byFlag))
        cum.groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n_rows"), max(col("tot_w")).as("total_weight"),
            min(when(col("cum_w") * 2 >= col("tot_w"), col("v")))
              .as("w_median"))
          .orderBy(col("l_returnflag"))
      },
      Some("""
        WITH cum AS (
          SELECT l_returnflag, l_extendedprice AS v,
                 sum(CAST(l_quantity AS BIGINT))
                   OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice)
                   AS cum_w,
                 sum(CAST(l_quantity AS BIGINT))
                   OVER (PARTITION BY l_returnflag) AS tot_w
          FROM lineitem)
        SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_rows,
               CAST(max(tot_w) AS BIGINT) AS total_weight,
               min(CASE WHEN cum_w * 2 >= tot_w THEN v END) AS w_median
        FROM cum GROUP BY 1 ORDER BY 1""")),
    // ----------------------------------------------------------------
    Q(
      "q167_skyline",
      "Per-brand 2-D skyline (Pareto frontier minimizing retail " +
        "price and size): the multi-objective shortlist query — " +
        "'show every part no same-brand part beats on both price and " +
        "size'. NOT the quadratic NOT-EXISTS the semantics read as: " +
        "a sort-based plan — per (brand, price) the minimum size, a " +
        "per-brand window in price order (ROWS frame, one row per " +
        "distinct price) gives the best size at any STRICTLY lower " +
        "price, and a part survives iff no cheaper part has size <= " +
        "its own and no equal-priced part has size strictly below. " +
        "All windows partition by brand; the oracle states the same " +
        "semantics as the correlated NOT EXISTS, proving the " +
        "sort-based rewrite exact including tie handling (equal " +
        "price+size pairs dominate neither side and both survive).",
      (s, dir) => {
        val p = t(s, dir, "part").select(col("p_brand"), col("p_partkey"),
          col("p_retailprice").as("price"), col("p_size").as("size"))
        val atPrice = p.groupBy(col("p_brand"), col("price"))
          .agg(min(col("size")).as("min_size_here"))
        val strictW = Window.partitionBy(col("p_brand")).orderBy(col("price"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val withStrict = atPrice.withColumn("min_size_below",
          min(col("min_size_here")).over(strictW))
        p.join(withStrict, Seq("p_brand", "price"))
          .where((col("min_size_below").isNull
              || col("min_size_below") > col("size"))
            && col("min_size_here") >= col("size"))
          .select(col("p_brand"), col("p_partkey"), col("price"), col("size"))
          .orderBy(col("p_brand"), col("price"), col("size"), col("p_partkey"))
      },
      Some("""
        SELECT p_brand, p_partkey, p_retailprice AS price, p_size AS size
        FROM part p
        WHERE NOT EXISTS (
          SELECT 1 FROM part q
          WHERE q.p_brand = p.p_brand
            AND q.p_retailprice <= p.p_retailprice
            AND q.p_size <= p.p_size
            AND (q.p_retailprice < p.p_retailprice OR q.p_size < p.p_size))
        ORDER BY 1, 3, 4, 2""")),
    // ----------------------------------------------------------------
    Q(
      "q168_sorted_neighborhood",
      "Sorted-neighborhood dedup (window size " +
        s"$SNM_WINDOW): docs sort by a normalized text prefix inside " +
        "(lang, prefix-4) blocks, each doc is compared ONLY to its " +
        s"next ${SNM_WINDOW - 1} sort neighbors (lead windows " +
        "partitioned by block — never a global sort), and candidates " +
        "verify with exact token-set Jaccard at " +
        s"$SNM_JACCARD. The classic complement to LSH blocking " +
        "(q30): cost is exactly (window-1) comparisons per row " +
        "regardless of key skew, and the known single-pass blind " +
        "spot — true pairs straddling a block boundary — is the " +
        "documented trade (production runs multi-pass with rotated " +
        "keys; the pass structure is identical). The sort key is " +
        "computed from the text ONCE in the scan stage; only (block, " +
        "sortkey, id) cross the sort shuffle, text joins back by id " +
        "for the <= 2N verify pairs.",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val keyed = docs.select(col("doc_id"), col("lang"),
          substring(regexp_replace(lower(col("text")), "[^a-z0-9]", ""), 1, 12)
            .as("sortkey"))
          .withColumn("blk", substring(col("sortkey"), 1, 4))
        val w = Window.partitionBy(col("lang"), col("blk"))
          .orderBy(col("sortkey"), col("doc_id"))
        val withLeads = keyed.select(col("doc_id") +:
          (1 until SNM_WINDOW).map(k =>
            lead(col("doc_id"), k).over(w).as(s"n$k")): _*)
        val cands = (1 until SNM_WINDOW).map(k =>
            withLeads.select(col("doc_id").as("id_a"), col(s"n$k").as("id_b"))
              .where(col("id_b").isNotNull))
          .reduce(_ unionByName _)
        val sets = docs.select(col("doc_id"),
          array_distinct(split(col("text"), " ")).as("ts"))
        cands
          .join(sets.select(col("doc_id").as("id_a"), col("ts").as("ts_a")), "id_a")
          .join(sets.select(col("doc_id").as("id_b"), col("ts").as("ts_b")), "id_b")
          .select(col("id_a"), col("id_b"),
            graft.operators.Dedup.jaccard(col("ts_a"), col("ts_b")).as("jaccard"))
          .filter(col("jaccard") >= SNM_JACCARD)
      },
      Some(s"""
        WITH keyed AS (
          SELECT doc_id, lang,
                 substring(regexp_replace(lower(text), '[^a-z0-9]', '', 'g'), 1, 12) AS sortkey
          FROM documents),
        blk AS (
          SELECT doc_id, lang, sortkey, substring(sortkey, 1, 4) AS blk FROM keyed),
        leads AS (
          SELECT doc_id,
                 ${(1 until SNM_WINDOW).map(k =>
                   s"lead(doc_id, $k) OVER (PARTITION BY lang, blk ORDER BY sortkey, doc_id) AS n$k")
                   .mkString(", ")}
          FROM blk),
        cand AS (
          ${(1 until SNM_WINDOW).map(k =>
            s"SELECT doc_id AS id_a, n$k AS id_b FROM leads WHERE n$k IS NOT NULL")
            .mkString("\n          UNION ALL ")}),
        sets AS (SELECT doc_id, list_distinct(string_split(text, ' ')) AS ts FROM documents)
        SELECT id_a, id_b, jaccard FROM (
          SELECT id_a, id_b,
                 CAST(len(list_intersect(a.ts, b.ts)) AS DOUBLE)
                   / (len(a.ts) + len(b.ts) - len(list_intersect(a.ts, b.ts))) AS jaccard
          FROM cand JOIN sets a ON cand.id_a = a.doc_id
                    JOIN sets b ON cand.id_b = b.doc_id)
        WHERE jaccard >= $SNM_JACCARD""")),
    // ----------------------------------------------------------------
    Q(
      "q224_snm_multipass",
      "MULTI-PASS sorted-neighborhood dedup — the textbook completion " +
        "of q168's single pass, whose documented blind spot is a true " +
        "pair whose sort keys straddle a block boundary (e.g. texts " +
        "differing in their FIRST character land in different " +
        "prefix-4 blocks and are never compared). Pass 1 sorts by the " +
        "normalized-text PREFIX inside (lang, prefix-4) blocks " +
        "exactly as q168; pass 2 ROTATES the key — the REVERSED " +
        "normalized text, i.e. suffix blocks — so a pair split by " +
        "pass 1 meets inside a pass-2 block (operators.Dedup." +
        "snmMultiPassPairs; the boundary-recovery property is " +
        "spec-planted in SnmMultiPassSpec). Candidate pairs normalize " +
        "to id_a < id_b so the cross-pass union de-duplicates with " +
        "one distinct over 16-byte pairs; verification is exact " +
        "token-set Jaccard emitted FLOAT-FREE as integer basis " +
        s"points, thresholded at $SNM_JACCARD via the cross-" +
        "multiplied integer comparison 2*|intersect| >= |union| (no " +
        "division reaches the filter or the output). Cost: each pass " +
        "is (window-1) comparisons per row — skew-immune — and only " +
        "(block, sortkey, id) cross the sort shuffles; text joins " +
        "back by id for the <= 2 x 2N verify pairs.",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val norm = regexp_replace(lower(col("text")), "[^a-z0-9]", "")
        def keyed(key: org.apache.spark.sql.Column) = docs.select(col("doc_id"), col("lang"),
          substring(key, 1, 12).as("sortkey"))
          .withColumn("blk", substring(col("sortkey"), 1, 4))
        val cands = graft.operators.Dedup.snmMultiPassPairs(
          Seq(keyed(norm), keyed(reverse(norm))),
          "doc_id", Seq("lang", "blk"), "sortkey", SNM_WINDOW)
        val sets = docs.select(col("doc_id"),
          array_distinct(split(col("text"), " ")).as("ts"))
        cands
          .join(sets.select(col("doc_id").as("id_a"), col("ts").as("ts_a")), "id_a")
          .join(sets.select(col("doc_id").as("id_b"), col("ts").as("ts_b")), "id_b")
          .select(col("id_a"), col("id_b"),
            size(array_intersect(col("ts_a"), col("ts_b"))).cast(LongType)
              .as("inter"),
            (size(col("ts_a")) + size(col("ts_b"))).cast(LongType).as("sz"))
          .withColumn("uni", col("sz") - col("inter"))
          .filter(col("uni") > 0 && col("inter") * 2 >= col("uni"))
          .select(col("id_a"), col("id_b"),
            expr("inter * 10000 div uni").as("jaccard_bp"))
      },
      Some(s"""
        WITH keyed AS (
          SELECT doc_id, lang,
                 regexp_replace(lower(text), '[^a-z0-9]', '', 'g') AS norm
          FROM documents),
        p1 AS (
          SELECT doc_id, lang, substring(norm, 1, 12) AS sortkey,
                 substring(norm, 1, 4) AS blk
          FROM keyed),
        p2 AS (
          SELECT doc_id, lang, substring(reverse(norm), 1, 12) AS sortkey,
                 substring(reverse(norm), 1, 4) AS blk
          FROM keyed),
        l1 AS (
          SELECT doc_id,
                 ${(1 until SNM_WINDOW).map(k =>
                   s"lead(doc_id, $k) OVER (PARTITION BY lang, blk ORDER BY sortkey, doc_id) AS n$k")
                   .mkString(", ")}
          FROM p1),
        l2 AS (
          SELECT doc_id,
                 ${(1 until SNM_WINDOW).map(k =>
                   s"lead(doc_id, $k) OVER (PARTITION BY lang, blk ORDER BY sortkey, doc_id) AS n$k")
                   .mkString(", ")}
          FROM p2),
        cand AS (
          SELECT DISTINCT least(id_a, id_b) AS id_a,
                          greatest(id_a, id_b) AS id_b
          FROM (
            ${(1 until SNM_WINDOW).map(k =>
              s"SELECT doc_id AS id_a, n$k AS id_b FROM l1 WHERE n$k IS NOT NULL")
              .mkString("\n            UNION ALL ")}
            UNION ALL ${(1 until SNM_WINDOW).map(k =>
              s"SELECT doc_id AS id_a, n$k AS id_b FROM l2 WHERE n$k IS NOT NULL")
              .mkString("\n            UNION ALL ")})),
        sets AS (
          SELECT doc_id, list_distinct(string_split(text, ' ')) AS ts
          FROM documents),
        verified AS (
          SELECT id_a, id_b,
                 CAST(len(list_intersect(a.ts, b.ts)) AS BIGINT) AS inter,
                 CAST(len(a.ts) + len(b.ts) - len(list_intersect(a.ts, b.ts))
                      AS BIGINT) AS uni
          FROM cand JOIN sets a ON cand.id_a = a.doc_id
                    JOIN sets b ON cand.id_b = b.doc_id)
        SELECT id_a, id_b, inter * 10000 // uni AS jaccard_bp
        FROM verified
        WHERE uni > 0 AND 2 * inter >= uni""")),
    // ----------------------------------------------------------------
    Q(
      "q169_record_linkage",
      "Fellegi-Sunter-style probabilistic record linkage: candidate " +
        "pairs block on (lang, length bucket of 100 chars) — an " +
        "equi-join on a narrow compound key, never all-pairs — and " +
        "each pair accumulates integer agreement weights per " +
        "evidence field (same source +16/-4, length within " +
        "20 chars +8/-2, token Jaccard >= 0.3 gives +24/-6), the " +
        "log-odds-shaped additive scoring the ER literature " +
        "standardized; the sum classifies match (>= 30) / possible " +
        "(>= 10) / non-match, reported as per-(lang, verdict) pair " +
        "counts with the score range. All weights are plan-time " +
        "integers, so the verdict is bit-deterministic; the Jaccard " +
        "evidence bit compares one exact rational-valued double the " +
        "same way on both engines. The block join ships each record's " +
        "token set once (the Jaccard evidence needs it); a " +
        "100 TB deployment would pre-hash tokens to 8-byte ints at " +
        "the scan exactly as q30 does — kept as strings here so the " +
        "oracle states the evidence rule verbatim.",
      (s, dir) => {
        // spread: the corpus ships as one parquet split — without it
        // the whole blocked-pair expansion would run in ONE task
        // (measured 7 s -> sub-second at sf0.1 on local[32])
        val docs = spread(t(s, dir, "documents"), col("doc_id"))
          .select(col("doc_id"), col("lang"),
            col("source"), col("n_chars"),
            array_distinct(split(col("text"), " ")).as("ts"))
          .withColumn("lb", expr("n_chars div 100"))
        val l = docs.as("l")
        val r = docs.as("r")
        val scored = l.join(r,
            col("l.lang") === col("r.lang") && col("l.lb") === col("r.lb")
              && col("l.doc_id") < col("r.doc_id"))
          .select(col("l.lang").as("lang"),
            (when(col("l.source") === col("r.source"), 16).otherwise(-4)
              + when(abs(col("l.n_chars") - col("r.n_chars")) <= 20, 8).otherwise(-2)
              + when(graft.operators.Dedup.jaccard(col("l.ts"), col("r.ts")) >= 0.3,
                  24).otherwise(-6)).as("score"))
        scored
          .select(col("lang"), col("score"),
            when(col("score") >= 30, "match")
              .when(col("score") >= 10, "possible")
              .otherwise("non-match").as("verdict"))
          .groupBy(col("lang"), col("verdict"))
          .agg(count(lit(1)).as("n_pairs"), min(col("score")).as("min_score"),
            max(col("score")).as("max_score"))
          .orderBy(col("lang"), col("verdict"))
      },
      Some("""
        WITH d AS (
          SELECT doc_id, lang, source, n_chars,
                 list_distinct(string_split(text, ' ')) AS ts,
                 n_chars // 100 AS lb
          FROM documents),
        scored AS (
          SELECT l.lang,
                 (CASE WHEN l.source = r.source THEN 16 ELSE -4 END
                  + CASE WHEN abs(l.n_chars - r.n_chars) <= 20 THEN 8 ELSE -2 END
                  + CASE WHEN CAST(len(list_intersect(l.ts, r.ts)) AS DOUBLE)
                           / (len(l.ts) + len(r.ts) - len(list_intersect(l.ts, r.ts)))
                           >= 0.3 THEN 24 ELSE -6 END) AS score
          FROM d l JOIN d r
            ON l.lang = r.lang AND l.lb = r.lb AND l.doc_id < r.doc_id)
        SELECT lang,
               CASE WHEN score >= 30 THEN 'match'
                    WHEN score >= 10 THEN 'possible'
                    ELSE 'non-match' END AS verdict,
               CAST(count(*) AS BIGINT) AS n_pairs,
               min(score) AS min_score, max(score) AS max_score
        FROM scored GROUP BY 1, 2 ORDER BY 1, 2""")),
    // ----------------------------------------------------------------
    Q(
      "q170_changepoint",
      "Offline change-point detection per event type: the single " +
        "split day maximizing |mean daily volume before - after| — " +
        "the first tool an ingest-drift incident review reaches for " +
        "('when did this source change?'). Daily counts reduce the " +
        "corpus to one row per (type, day); cumulative sums in day " +
        "order run in a window PARTITIONED by type (day cardinality " +
        "per type is calendar-bounded, so no single giant partition " +
        "exists even at 100 TB — contrast a global-sort CUSUM); " +
        "every candidate split's two segment means derive from the " +
        "exact integer (cum, total) pair, the score is one " +
        "double expression over exact ints (identical on both " +
        "engines), and the per-type argmax takes the earliest day " +
        "on ties. Segment means are also reported exactly in " +
        "milli-units via integer division.",
      (s, dir) => {
        val daily = t(s, dir, "events")
          .groupBy(col("event_type"),
            expr("unix_timestamp(date_trunc('day', ts)) div 86400").as("day"))
          .agg(count(lit(1)).as("cnt"))
        val byType = Window.partitionBy(col("event_type"))
        val ordered = daily
          .withColumn("rn", row_number().over(byType.orderBy(col("day"))))
          .withColumn("cum", sum(col("cnt")).over(byType.orderBy(col("day"))))
          .withColumn("n_days", count(lit(1)).over(byType))
          .withColumn("tot", sum(col("cnt")).over(byType))
        val scoredSplits = ordered.where(col("rn") < col("n_days"))
          .select(col("event_type"), col("day"), col("n_days"),
            col("rn").cast(LongType).as("left_days"),
            (col("n_days") - col("rn")).as("right_days"),
            expr("cum * 1000 div rn").as("left_mean_milli"),
            expr("(tot - cum) * 1000 div (n_days - rn)").as("right_mean_milli"),
            abs(col("cum").cast(DoubleType) / col("rn")
              - (col("tot") - col("cum")).cast(DoubleType)
                / (col("n_days") - col("rn"))).as("score"))
        scoredSplits
          .withColumn("rank", row_number().over(Window.partitionBy(col("event_type"))
            .orderBy(col("score").desc, col("day"))))
          .where(col("rank") === 1)
          .select(col("event_type"), col("day").as("split_day"), col("n_days"),
            col("left_days"), col("right_days"),
            col("left_mean_milli"), col("right_mean_milli"), col("score"))
          .orderBy(col("event_type"))
      },
      Some("""
        WITH daily AS (
          SELECT event_type,
                 CAST(epoch(date_trunc('day', ts)) AS BIGINT) // 86400 AS day,
                 CAST(count(*) AS BIGINT) AS cnt
          FROM events GROUP BY 1, 2),
        ordered AS (
          SELECT event_type, day, cnt,
                 CAST(row_number() OVER (PARTITION BY event_type ORDER BY day) AS BIGINT) AS rn,
                 CAST(sum(cnt) OVER (PARTITION BY event_type ORDER BY day) AS BIGINT) AS cum,
                 CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n_days,
                 CAST(sum(cnt) OVER (PARTITION BY event_type) AS BIGINT) AS tot
          FROM daily),
        scored AS (
          SELECT event_type, day, n_days, rn AS left_days,
                 n_days - rn AS right_days,
                 cum * 1000 // rn AS left_mean_milli,
                 (tot - cum) * 1000 // (n_days - rn) AS right_mean_milli,
                 abs(CAST(cum AS DOUBLE) / rn
                     - CAST(tot - cum AS DOUBLE) / (n_days - rn)) AS score
          FROM ordered WHERE rn < n_days),
        ranked AS (
          SELECT *, row_number() OVER (PARTITION BY event_type
                      ORDER BY score DESC, day) AS rank
          FROM scored)
        SELECT event_type, day AS split_day, n_days, left_days, right_days,
               left_mean_milli, right_mean_milli, score
        FROM ranked WHERE rank = 1 ORDER BY event_type""")),
    // ----------------------------------------------------------------
    Q(
      "q171_smb_join",
      "Co-located sort-merge-bucket join: lineitem and orders are " +
        "written ONCE bucketed (+in-bucket sorted) on the order key, " +
        "then the fact-to-fact join runs with NO exchange on either " +
        "side — bucket i joins bucket i in place. This is the " +
        "100 TB answer to the one join a star schema cannot " +
        "broadcast (fact x fact): the shuffle cost moves to the " +
        "write path and amortizes over every subsequent join on the " +
        "key; MiningQueriesSpec asserts the joined plan contains " +
        "zero shuffles upstream of the merge join. The layout write " +
        "is charged inside the query (q114's convention for " +
        "maintenance-backed reads); the oracle is the plain join, " +
        "proving co-location changes nothing about the answer. " +
        "Money sums accumulate in DECIMAL(38,0) cents.",
      (s, dir) => {
        val li = t(s, dir, "lineitem")
          .select(col("l_orderkey"),
            expr("CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)")
              .as("rev_cents"))
        val ord = t(s, dir, "orders").select(col("o_orderkey"), col("o_orderpriority"))
        // external tables at a fresh scratch path per call: a MANAGED
        // table would collide with a previous session's leftover
        // warehouse directory (the catalog is per-session, the
        // filesystem is not) — q114's deleteOnExit convention
        val root = java.nio.file.Files.createTempDirectory("graft-q171").toString
        val rootPath = new org.apache.hadoop.fs.Path(root)
        rootPath.getFileSystem(s.sparkContext.hadoopConfiguration)
          .deleteOnExit(rootPath)
        s.sql("DROP TABLE IF EXISTS graft_q171_li")
        s.sql("DROP TABLE IF EXISTS graft_q171_ord")
        li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
          .option("path", s"$root/li")
          .mode("overwrite").saveAsTable("graft_q171_li")
        ord.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
          .option("path", s"$root/ord")
          .mode("overwrite").saveAsTable("graft_q171_ord")
        s.table("graft_q171_li").hint("merge")
          .join(s.table("graft_q171_ord"),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n_items"),
            countDistinct(col("o_orderkey")).as("n_orders"),
            sum(col("rev_cents").cast(DecimalType(38, 0)))
              .cast(LongType).as("revenue_cents"))
          .orderBy(col("o_orderpriority"))
      },
      Some("""
        SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_items,
               CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_orders,
               CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                             AS HUGEINT)) AS BIGINT) AS revenue_cents
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY 1 ORDER BY 1""")),
    // ----------------------------------------------------------------
    Q(
      "q172_mad_outliers",
      "Robust outlier detection per event type: median / MAD (median " +
        "absolute deviation) with the modified z-score cut |x - med| " +
        "> 3 * MAD — the outlier screen that, unlike mean/stddev " +
        "(q76's family), cannot be dragged by the outliers it hunts. " +
        "Both medians are the LOWER weighted median via the " +
        "tie-insensitive RANGE-frame cumulative count (q166's " +
        "machinery, unit weights), each computed in a window " +
        "partitioned by type; the per-type (med, mad) pair joins " +
        "back as a broadcast-size frame. Every comparison is one " +
        "exact double both engines evaluate identically; no global " +
        "sort, no unpartitioned window, two passes over values only.",
      (s, dir) => {
        def lowerMedian(df: org.apache.spark.sql.DataFrame, vCol: String) = {
          val byT = Window.partitionBy(col("event_type"))
          df.withColumn("cum", count(lit(1)).over(byT.orderBy(col(vCol))))
            .withColumn("tot", count(lit(1)).over(byT))
            .groupBy(col("event_type"))
            .agg(min(when(col("cum") * 2 >= col("tot"), col(vCol))).as("m"))
        }
        val ev = t(s, dir, "events").select(col("event_type"), col("value"))
        val med = lowerMedian(ev, "value")
          .withColumnRenamed("m", "med")
        val dev = ev.join(med, "event_type")
          .withColumn("dev", abs(col("value") - col("med")))
        val mad = lowerMedian(dev.select(col("event_type"), col("dev")), "dev")
          .withColumnRenamed("m", "mad")
        dev.join(mad, "event_type")
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"), min(col("med")).as("med"),
            min(col("mad")).as("mad"),
            sum(when(col("dev") > col("mad") * 3, 1L).otherwise(0L))
              .as("n_outliers"))
          .withColumn("outlier_bp", expr("n_outliers * 10000 div n"))
          .orderBy(col("event_type"))
      },
      Some("""
        WITH ev AS (SELECT event_type, value FROM events),
        c1 AS (
          SELECT event_type, value,
                 CAST(count(*) OVER (PARTITION BY event_type ORDER BY value) AS BIGINT) AS cum,
                 CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS tot
          FROM ev),
        med AS (
          SELECT event_type, min(CASE WHEN cum * 2 >= tot THEN value END) AS med
          FROM c1 GROUP BY 1),
        dev AS (
          SELECT ev.event_type, ev.value, med.med,
                 abs(ev.value - med.med) AS dev
          FROM ev JOIN med ON ev.event_type = med.event_type),
        c2 AS (
          SELECT event_type, dev,
                 CAST(count(*) OVER (PARTITION BY event_type ORDER BY dev) AS BIGINT) AS cum,
                 CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS tot
          FROM dev),
        mad AS (
          SELECT event_type, min(CASE WHEN cum * 2 >= tot THEN dev END) AS mad
          FROM c2 GROUP BY 1)
        SELECT dev.event_type, CAST(count(*) AS BIGINT) AS n,
               min(dev.med) AS med, min(mad.mad) AS mad,
               CAST(sum(CASE WHEN dev.dev > mad.mad * 3 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_outliers,
               CAST(sum(CASE WHEN dev.dev > mad.mad * 3 THEN 1 ELSE 0 END) * 10000
                    // count(*) AS BIGINT) AS outlier_bp
        FROM dev JOIN mad ON dev.event_type = mad.event_type
        GROUP BY 1 ORDER BY 1""")),
    // ----------------------------------------------------------------
    Q(
      "q173_event_pattern",
      "CEP-style sequence pattern over the event log — MATCH_" +
        "RECOGNIZE semantics ('view followed by purchase within 1 " +
        "hour with no error in between') expressed as forward-" +
        "looking conditional window frames: per user in (ts, " +
        "event_id) order, each view reads the timestamp of its NEXT " +
        "purchase and NEXT error via min(CASE...) over ROWS 1 " +
        "FOLLOWING..UNBOUNDED — one partitioned sort serves both " +
        "probes, where the join formulation would scan the tail " +
        "per view. A view matches iff the purchase lands within the " +
        "window and no error precedes it. Daily rollup: views, " +
        "matches, match rate in bp, and mean conversion latency in " +
        "EXACT micros (integer sum div count — no float time math).",
      (s, dir) => {
        val views = patternViews(s, dir)
        views.groupBy(col("day"))
          .agg(count(lit(1)).as("n_views"),
            sum(when(col("hit"), 1L).otherwise(0L)).as("n_matches"),
            sum(when(col("hit"), col("next_purchase") - col("us"))
              .otherwise(0L)).as("latency_us_sum"))
          .select(col("day"), col("n_views"), col("n_matches"),
            expr("n_matches * 10000 div n_views").as("match_bp"),
            when(col("n_matches") > 0,
              expr("latency_us_sum div n_matches")).as("mean_latency_us"))
          .orderBy(col("day"))
      },
      Some("""
        WITH ev AS (
          SELECT user_id, event_type, epoch_us(ts) AS us, event_id,
                 CAST(epoch(date_trunc('day', ts)) AS BIGINT) // 86400 AS day
          FROM events),
        probed AS (
          SELECT *,
                 min(CASE WHEN event_type = 'purchase' THEN us END)
                   OVER (PARTITION BY user_id ORDER BY us, event_id
                         ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
                   AS next_purchase,
                 min(CASE WHEN event_type = 'error' THEN us END)
                   OVER (PARTITION BY user_id ORDER BY us, event_id
                         ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
                   AS next_error
          FROM ev),
        views AS (
          SELECT day,
                 (next_purchase IS NOT NULL
                  AND next_purchase - us <= CAST(3600 AS BIGINT) * 1000000
                  AND (next_error IS NULL OR next_error > next_purchase))
                   AS hit,
                 next_purchase - us AS lat
          FROM probed WHERE event_type = 'view')
        SELECT day, CAST(count(*) AS BIGINT) AS n_views,
               CAST(sum(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT) AS n_matches,
               CAST(sum(CASE WHEN hit THEN 1 ELSE 0 END) * 10000 // count(*)
                    AS BIGINT) AS match_bp,
               CASE WHEN sum(CASE WHEN hit THEN 1 ELSE 0 END) > 0
                    THEN CAST(sum(CASE WHEN hit THEN lat ELSE 0 END)
                              // sum(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT)
               END AS mean_latency_us
        FROM views GROUP BY day ORDER BY day""")),
    // ----------------------------------------------------------------
    Q(
      "q174_multimodal_decode",
      "Multimodal decode end-to-end UNDER THE ORACLE: payloads " +
        "attach to every doc (utf-8 bytes standing in for media, " +
        "modality from id — the q34 convention), then " +
        "Multimodal.extractFeatures runs the batched per-partition " +
        "decode through the stub codec and emits the typed feature " +
        "row (dims, channels, frames, mean byte intensity). Because " +
        "the stub is deterministic arithmetic on the bytes, DuckDB " +
        "can state the SAME decode in SQL — so the whole mapPartitions " +
        "pipeline (schema, pruning-before-decode, batch iteration, " +
        "per-row error isolation for empty payloads) is hash-checked " +
        "against an independent engine, not just spec'd. Swapping in " +
        "a real codec changes only the arithmetic, not the plumbing " +
        "this verifies. Per-row intensity is one exact-integer " +
        "divide; no cross-row float accumulation exists. (The oracle " +
        "counts characters where the stub counts utf-8 bytes — " +
        "byte-identical on this verified-ASCII corpus.)",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val payload = graft.multimodal.Multimodal.attachPayload(
          docs, "doc_id", "text")
        graft.multimodal.Multimodal.extractFeatures(
          payload, "doc_id", graft.multimodal.Multimodal.StubCodec)
      },
      Some("""
        WITH base AS (
          SELECT doc_id AS id, length(text) AS n,
                 CASE WHEN doc_id % 3 = 0 THEN 'image'
                      WHEN doc_id % 3 = 1 THEN 'audio'
                      ELSE 'video' END AS kind,
                 CAST(list_sum(list_transform(split(text, ''), c -> ord(c)))
                      AS BIGINT) AS bsum
          FROM documents WHERE length(text) > 0)
        SELECT id, kind,
               CAST(CASE WHEN kind = 'audio' THEN 0 ELSE n % 640 + 1 END AS INT) AS width,
               CAST(CASE WHEN kind = 'audio' THEN 0 ELSE n % 480 + 1 END AS INT) AS height,
               CAST(CASE WHEN kind = 'audio' THEN 2 ELSE 3 END AS INT) AS channels,
               CAST(CASE WHEN kind = 'image' THEN 1
                         WHEN kind = 'audio' THEN n // 4 + 1
                         ELSE n // 1024 + 1 END AS INT) AS frames,
               CAST(bsum AS DOUBLE) / n AS mean_intensity
        FROM base""")),
    // ----------------------------------------------------------------
    Q(
      "q175_seasonal_backtest",
      "Forecast-baseline backtest per event type: the two classical " +
        "naive predictors — persistence (this hour = last hour) and " +
        "seasonal naive (this hour = same hour yesterday) — scored " +
        "against realized hourly volume, the calibration step every " +
        "anomaly threshold (q80/q88) sits on. Hourly counts reduce " +
        "the corpus first; each hour joins its two reference hours " +
        "by 8-byte epoch arithmetic (no lag window); MAE is reported " +
        "exactly in milli-events via integer division and the winner " +
        "column compares the two absolute-error SUMS (same hour set, " +
        "so no division enters the comparison). Only hours where " +
        "both references exist score — the honest backtest frame.",
      (s, dir) => {
        val hourly = t(s, dir, "events")
          .groupBy(col("event_type"),
            (unix_timestamp(date_trunc("hour", col("ts")))).as("hr"))
          .agg(count(lit(1)).as("cnt"))
          .persist()
        val h1 = hourly.select(col("event_type"), (col("hr") + 3600L).as("hr"),
          col("cnt").as("pred1"))
        val h24 = hourly.select(col("event_type"), (col("hr") + 86400L).as("hr"),
          col("cnt").as("pred24"))
        hourly.join(h1, Seq("event_type", "hr"))
          .join(h24, Seq("event_type", "hr"))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_hours"),
            sum(abs(col("cnt") - col("pred1"))).as("ae1"),
            sum(abs(col("cnt") - col("pred24"))).as("ae24"))
          .select(col("event_type"), col("n_hours"),
            expr("ae1 * 1000 div n_hours").as("mae_persist_milli"),
            expr("ae24 * 1000 div n_hours").as("mae_seasonal_milli"),
            when(col("ae24") < col("ae1"), "seasonal")
              .when(col("ae1") < col("ae24"), "persistence")
              .otherwise("tie").as("winner"))
          .orderBy(col("event_type"))
      },
      Some("""
        WITH hourly AS (
          SELECT event_type,
                 CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hr,
                 CAST(count(*) AS BIGINT) AS cnt
          FROM events GROUP BY 1, 2),
        scored AS (
          SELECT h.event_type, h.cnt, p1.cnt AS pred1, p24.cnt AS pred24
          FROM hourly h
          JOIN hourly p1 ON p1.event_type = h.event_type AND p1.hr = h.hr - 3600
          JOIN hourly p24 ON p24.event_type = h.event_type AND p24.hr = h.hr - 86400)
        SELECT event_type, CAST(count(*) AS BIGINT) AS n_hours,
               CAST(sum(abs(cnt - pred1)) * 1000 // count(*) AS BIGINT) AS mae_persist_milli,
               CAST(sum(abs(cnt - pred24)) * 1000 // count(*) AS BIGINT) AS mae_seasonal_milli,
               CASE WHEN sum(abs(cnt - pred24)) < sum(abs(cnt - pred1)) THEN 'seasonal'
                    WHEN sum(abs(cnt - pred1)) < sum(abs(cnt - pred24)) THEN 'persistence'
                    ELSE 'tie' END AS winner
        FROM scored GROUP BY event_type ORDER BY event_type""")),
    // ----------------------------------------------------------------
    Q(
      "q176_session_paths",
      "Top navigation paths: each (user, day) basket's first " +
        s"$PATH_LEN event types in exact (ts, event_id) order joined " +
        "into a path string, ranked by frequency — the clickstream " +
        "mining report behind funnel design (q100 checks ONE " +
        "hypothesized path; this surfaces which paths exist). The " +
        "ordered collect is BOUNDED before it aggregates: the custom " +
        "grouped-top-k physical operator (plans.TopKPerKey — " +
        "Partial/Final heap execs, plan-pinned in ExplainAuditSpec) " +
        s"keeps each basket's first $PATH_LEN events by (ts, " +
        "event_id) WITHOUT the window form's full partition sort: " +
        s"per-group state is a $PATH_LEN-row heap however hot the " +
        "user, the map-side partial cuts the shuffle to splits x " +
        s"baskets x $PATH_LEN rows, and the oracle still states the " +
        "row_number spelling (the two forms are row-identical, " +
        "TopKPerKeySpec; migration measured 1.2x vs the window form " +
        "at sf0.1 warm). Top 20 by (count desc, path) via global " +
        "top-k (TakeOrderedAndProject), rank derived after the limit " +
        "bounds the frame.",
      (s, dir) => {
        val ev = t(s, dir, "events").select(col("user_id"),
          expr("unix_timestamp(date_trunc('day', ts)) div 86400").as("day"),
          unix_micros(col("ts")).as("us"), col("event_id"), col("event_type"))
        val firstN = graft.plans.TopKPerKey.topK(ev,
          Seq("user_id", "day"), Seq("us" -> true, "event_id" -> true),
          PATH_LEN)
        val paths = firstN
          .groupBy(col("user_id"), col("day"))
          .agg(array_join(
            transform(array_sort(collect_list(struct(col("us"), col("event_id"),
              col("event_type")))), x => x.getField("event_type")), ">")
            .as("path"))
        val top = paths.groupBy(col("path")).agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("path")).limit(20)
        top.withColumn("rank",
          Tables.boundedRank(col("n"))(col("n").desc, col("path")))
      },
      Some(s"""
        WITH ev AS (
          SELECT user_id,
                 CAST(epoch(date_trunc('day', ts)) AS BIGINT) // 86400 AS day,
                 epoch_us(ts) AS us, event_id, event_type
          FROM events),
        firstn AS (
          SELECT * FROM (
            SELECT *, row_number() OVER (PARTITION BY user_id, day
                        ORDER BY us, event_id) AS rn
            FROM ev) WHERE rn <= $PATH_LEN),
        paths AS (
          SELECT user_id, day,
                 array_to_string(list(event_type ORDER BY us, event_id), '>') AS path
          FROM firstn GROUP BY 1, 2),
        top AS (
          SELECT path, CAST(count(*) AS BIGINT) AS n
          FROM paths GROUP BY path
          ORDER BY n DESC, path LIMIT 20)
        SELECT path, n,
               CAST(row_number() OVER (ORDER BY n DESC, path) AS INT) AS rank
        FROM top""")),
    // ----------------------------------------------------------------
    Q(
      "q235_chi2_independence",
      "Chi-square test of independence over the (lang, source) " +
        "contingency table — the stratification audit that answers " +
        "'is language balance the same across sources?' before a " +
        "mixture recipe trusts per-source sampling: every cell " +
        "(INCLUDING zero-observed combinations — omitting them " +
        "understates the statistic, so the cell frame is the cross of " +
        "the two margins) reports observed count, both margins and " +
        "its scaled contribution ((O*N - R*C)^2 * 10000) div " +
        "(N*R*C) — the classic (O-E)^2/E term cross-multiplied into " +
        "exact integer arithmetic, products in DECIMAL(38,0), whose " +
        "38 digits absorb the (O*N - R*C)^2 term to corpora of ~1e8 " +
        "rows (it needs ~4*log10(N) digits; past that, compute on " +
        "proportionally down-scaled margin counts) — plus the " +
        "statistic as the " +
        "sum of the floored terms (the deterministic integer " +
        "rendition both engines state identically; floor-then-sum, " +
        "NOT sum-then-floor). SCALE SHAPE: one count per margin and " +
        "one per cell — three map-side-combined aggregations over the " +
        "corpus — then all arithmetic runs on the margins-sized cell " +
        "frame; the cell cross joins two bounded margin frames on a " +
        "constant key (a broadcast HASH join, never a cartesian).",
      (s, dir) => {
        val d = t(s, dir, "documents")
        val obs = d.groupBy(col("lang"), col("source"))
          .agg(count(lit(1)).as("o_cnt"))
        // margin cross on a derived single-valued key: `cnt % 1` is
        // always 0 but NOT foldable (the boundedRank rationale), so
        // the planner keeps a broadcast HASH join over the bounded
        // margin frames instead of folding the condition away into a
        // nested-loop cross
        val rm = d.groupBy(col("lang")).agg(count(lit(1)).as("r_cnt"))
          .withColumn("k", col("r_cnt") % 1)
        val cm = d.groupBy(col("source")).agg(count(lit(1)).as("c_cnt"))
          .withColumn("k", col("c_cnt") % 1)
        val n = d.agg(count(lit(1)).as("n_tot"))
        val cells = rm.join(cm, "k").drop("k")
          .join(obs, Seq("lang", "source"), "left")
          .na.fill(0L, Seq("o_cnt"))
          .crossJoin(broadcast(n))
          .withColumn("dv", expr(
            "CAST(o_cnt AS DECIMAL(38,0)) * n_tot" +
              " - CAST(r_cnt AS DECIMAL(38,0)) * c_cnt"))
          .withColumn("term_e4", expr(
            "CAST(dv * dv * 10000" +
              " div (CAST(n_tot AS DECIMAL(38,0)) * r_cnt * c_cnt)" +
              " AS BIGINT)"))
          .drop("dv")
        val tot = cells.agg(sum(col("term_e4")).as("chi2_e4"))
        cells.crossJoin(broadcast(tot))
          .select(col("lang"), col("source"), col("o_cnt"), col("r_cnt"),
            col("c_cnt"), col("n_tot"), col("term_e4"), col("chi2_e4"))
      },
      Some("""
        WITH rm AS (
          SELECT lang, CAST(count(*) AS BIGINT) AS r_cnt FROM documents GROUP BY 1),
        cm AS (
          SELECT source, CAST(count(*) AS BIGINT) AS c_cnt FROM documents GROUP BY 1),
        obs AS (
          SELECT lang, source, CAST(count(*) AS BIGINT) AS o_cnt
          FROM documents GROUP BY 1, 2),
        n AS (SELECT CAST(count(*) AS BIGINT) AS n_tot FROM documents),
        cells AS (
          SELECT rm.lang, cm.source, coalesce(o_cnt, 0) AS o_cnt,
                 r_cnt, c_cnt, n_tot,
                 CAST((CAST(coalesce(o_cnt, 0) AS HUGEINT) * n_tot
                        - CAST(r_cnt AS HUGEINT) * c_cnt)
                      * (CAST(coalesce(o_cnt, 0) AS HUGEINT) * n_tot
                        - CAST(r_cnt AS HUGEINT) * c_cnt)
                      * 10000 // (CAST(n_tot AS HUGEINT) * r_cnt * c_cnt)
                      AS BIGINT) AS term_e4
          FROM rm CROSS JOIN cm CROSS JOIN n
          LEFT JOIN obs ON obs.lang = rm.lang AND obs.source = cm.source),
        tot AS (SELECT CAST(sum(term_e4) AS BIGINT) AS chi2_e4 FROM cells)
        SELECT lang, source, o_cnt, r_cnt, c_cnt, n_tot, term_e4, chi2_e4
        FROM cells CROSS JOIN tot""")),
    // ----------------------------------------------------------------
    Q(
      "q236_poisson_bootstrap",
      s"Poisson bootstrap of the per-priority mean order value — the " +
        s"resampling scheme that works at 100 TB because classic " +
        s"bootstrap (sample n WITH replacement) needs a global draw, " +
        s"while Poisson(1) weights are PER-ROW independent: each of " +
        s"$BOOT_B replicates weighs every order by an iid Poisson(1) " +
        s"count, here drawn DETERMINISTICALLY by inverse-CDF lookup " +
        s"of a keyed hash uniform (cumulative thresholds as exact " +
        s"integer parts-per-1e6 literals, identical in both engines). " +
        s"Replicates are COLUMNS, not rows: the scan computes all " +
        s"$BOOT_B weights per row and one aggregation map-side-" +
        s"combines 2x$BOOT_B running sums — the corpus is read once " +
        s"and never multiplied, where the explode spelling pays " +
        s"${BOOT_B}x shuffle. Output per priority: exact n and mean " +
        s"(milli-cents, money as DECIMAL(12,2)->cents like q228), " +
        s"and the replicate means' envelope (min/max/spread) — the " +
        s"uncertainty band a mixture recipe reads before trusting a " +
        s"stratum mean. A replicate's weight sum is floored at 1 " +
        s"(P(sum=0) < e^-n — at any real stratum size it never " +
        s"fires, but both engines must state the same total " +
        s"function).",
      (s, dir) => {
        val o = t(s, dir, "orders").select(col("o_orderpriority"),
          (col("o_totalprice").cast(DecimalType(12, 2)) * 100)
            .cast(LongType).as("cents"), col("o_orderkey"))
        def w(b: Int): org.apache.spark.sql.Column = {
          val u = graft.functions.Portable.pmd5(
            concat(col("o_orderkey").cast(StringType), lit(s"#$b"))) % 1000000L
          // reversed fold: the SMALLEST threshold must end up outermost
          // so the first matching WHEN wins, as in the SQL CASE chain
          BOOT_CUM.zipWithIndex.reverse.foldLeft(lit(BOOT_CUM.size.toLong)) {
            case (acc, (thr, k)) => when(u < thr, k.toLong).otherwise(acc)
          }
        }
        val aggs = (0 until BOOT_B).flatMap { b =>
          Seq(sum(w(b) * col("cents")).as(s"swc_$b"),
            sum(w(b)).as(s"sw_$b"))
        } ++ Seq(count(lit(1)).as("n_orders"), sum(col("cents")).as("sc"))
        val g = o.groupBy(col("o_orderpriority")).agg(aggs.head, aggs.tail: _*)
        val means = (0 until BOOT_B).map(b =>
          expr(s"swc_$b * 1000 div greatest(1L, sw_$b)"))
        g.select(col("o_orderpriority"), col("n_orders"),
          expr("sc * 1000 div n_orders").as("mean_milli"),
          least(means: _*).as("boot_min_milli"),
          greatest(means: _*).as("boot_max_milli"),
          (greatest(means: _*) - least(means: _*)).as("boot_spread_milli"))
      },
      Some {
        def wSql(b: Int) = {
          val u = s"(${graft.functions.Portable.pmd5Sql(
            s"concat(CAST(o_orderkey AS VARCHAR), '#$b')")} % 1000000)"
          "CASE " + BOOT_CUM.zipWithIndex
            .map { case (thr, k) => s"WHEN $u < $thr THEN $k" }
            .mkString(" ") + s" ELSE ${BOOT_CUM.size} END"
        }
        val aggSql = (0 until BOOT_B).map { b =>
          s"CAST(sum((${wSql(b)}) * cents) AS BIGINT) AS swc_$b," +
            s" CAST(sum(${wSql(b)}) AS BIGINT) AS sw_$b"
        }.mkString(",\n                 ")
        val meanSql = (0 until BOOT_B)
          .map(b => s"swc_$b * 1000 // greatest(1, sw_$b)")
        s"""
        WITH o AS (
          SELECT o_orderpriority,
                 CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents,
                 o_orderkey
          FROM orders),
        g AS (
          SELECT o_orderpriority,
                 $aggSql,
                 CAST(count(*) AS BIGINT) AS n_orders,
                 CAST(sum(cents) AS BIGINT) AS sc
          FROM o GROUP BY o_orderpriority)
        SELECT o_orderpriority, n_orders,
               sc * 1000 // n_orders AS mean_milli,
               least(${meanSql.mkString(", ")}) AS boot_min_milli,
               greatest(${meanSql.mkString(", ")}) AS boot_max_milli,
               greatest(${meanSql.mkString(", ")})
                 - least(${meanSql.mkString(", ")}) AS boot_spread_milli
        FROM g"""
      }),
    // ----------------------------------------------------------------
    Q(
      "q242_symspell_join",
      "SymSpell deletion-neighborhood similarity join: every supplier-" +
        "name pair within edit distance 1, found by EQUI-join instead " +
        "of comparison. Each name generates itself plus its len " +
        "single-deletion variants; two strings within one edit share " +
        "a variant (substitution at i: both drop position i to the " +
        "same string; insertion/deletion: the longer one's deletion " +
        "IS the shorter), so sharing-a-variant is a COMPLETE candidate " +
        "generator for d <= 1 and the exact levenshtein verify runs " +
        "only on candidates — the hash match against the oracle's " +
        "naive all-pairs spelling proves zero recall loss. False " +
        "candidates exist (two different deletions can collide at " +
        "distance 2) and the verify removes them. SCALE SHAPE: the " +
        "blocking is a plain equi-join on a bounded-length variant " +
        "string — len+1 index rows per name, never the O(n^2) cross " +
        "the oracle states (n=100 here, but the oracle form is " +
        "quadratic at ANY n while the engine's candidate count tracks " +
        "true near-duplicates); candidates dedupe on the 16-byte pair " +
        "before the verify. The q59/q168 family's blocking schemes " +
        "(prefix filter, sorted neighborhood) trade recall windows " +
        "for cost — deletion neighborhoods are exact for small d, " +
        "the spell-correction regime.",
      (s, dir) => {
        val names = t(s, dir, "supplier").select(col("s_name")).distinct()
        val variants = names.select(col("s_name"),
          explode(array_union(array(col("s_name")), expr(
            "transform(sequence(1, length(s_name))," +
              " i -> concat(substring(s_name, 1, i - 1)," +
              " substring(s_name, i + 1)))"))).as("v"))
        val cand = variants.as("a")
          .join(variants.as("b"), col("a.v") === col("b.v")
            && col("a.s_name") < col("b.s_name"))
          .select(col("a.s_name").as("name_a"), col("b.s_name").as("name_b"))
          .distinct()
        cand.where(levenshtein(col("name_a"), col("name_b")) <= 1)
          .select(col("name_a"), col("name_b"),
            levenshtein(col("name_a"), col("name_b"))
              .cast(LongType).as("dist"))
      },
      Some("""
        SELECT a.s_name AS name_a, b.s_name AS name_b,
               CAST(levenshtein(a.s_name, b.s_name) AS BIGINT) AS dist
        FROM (SELECT DISTINCT s_name FROM supplier) a
        JOIN (SELECT DISTINCT s_name FROM supplier) b
          ON a.s_name < b.s_name
        WHERE levenshtein(a.s_name, b.s_name) <= 1"""))
  )
}
