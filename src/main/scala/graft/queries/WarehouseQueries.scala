package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.Portable
import graft.operators.Similarity
import graft.queries.Tables.{spread, t}

/** Warehouse-classic decision-support shapes (q189+) the registry did
  * not yet exercise: outer-join count-of-counts (TPC-H Q13), conditional
  * share-of-total (Q14), correlated-min decorrelation (Q2), IN-over-
  * grouped-HAVING (Q18), EXISTS as semi-join (Q4), scalar-subquery
  * threshold + anti-join (Q22), and ratio-to-report hierarchy shares.
  * The reference (a pandas ETL, see SURVEY.md) has none of these; they
  * are the decision-support complement of the star family (q186-q188).
  *
  * Scale rules shared by the family: every correlated subquery is
  * decorrelated into a keyed aggregate + join (never a per-row probe),
  * scalar aggregates travel as 1-row broadcast frames, selective
  * filters run before the shuffle they feed, and money arithmetic is
  * decimal-exact until the final cast (q01's idiom).
  */
object WarehouseQueries {

  private val dec12 = DecimalType(12, 2)
  private val dec4 = DecimalType(4, 2)
  private val dec14 = DecimalType(14, 2)
  private def one = lit(1).cast(DecimalType(3, 2))

  /** q190 promo-share month; q193 EXISTS quarter; q195 share year. */
  private val MONTH_LO = "1996-03-01"
  private val MONTH_HI = "1996-04-01"
  private val HALF_LO = "1996-01-01"
  private val HALF_HI = "1996-07-01"
  private val YEAR_LO = "1997-01-01"
  private val YEAR_HI = "1998-01-01"

  /** q192: order-level quantity threshold (~p99 at every SF — the
    * testdata's per-order quantity sum is SF-invariant in shape). */
  private val BIG_QTY = 250

  /** q194 dormancy horizon: "no order since" — every testdata customer
    * has SOME order, so Q22's literal no-orders-ever predicate would be
    * vacuously empty; recency-dormancy is also the realistic churn
    * definition. */
  private val DORMANT_SINCE = "1999-01-01"

  /** q191 part slice: size >= 40 STANDARD parts (~4% of part). */
  private val SLICE_SIZE = 40

  /** q199/q200 trading pair and q200's share window. Both nations
    * carry suppliers at every SF (testdata suppliers spread over all
    * 25 nations). */
  private val TRADE_A = "NATION_9"
  private val TRADE_B = "NATION_11"
  private val SHARE_LO = "1996-01-01"
  private val SHARE_HI = "1998-01-01"

  /** q202 salt buckets; q203 mirrors q196's knn parameters. */
  private val SALTS = 8
  private val NQ_E = 8
  private val KNN_K_E = 10

  /** q204: per-source winner count. */
  private val TOPK_DOCS = 3

  /** q205: KMV sketch size — well below the ~1600 user-day
    * cardinalities so the estimator genuinely estimates. */
  private val KMV_I = 256

  /** q206: recency reference date (just past the last testdata order). */
  private val RFM_REF = "2001-09-01"

  /** q213 division target: every customer ordering ALL of these. */
  private val DIV_BRANDS = Seq("Brand#11", "Brand#12", "Brand#13")

  /** q219: map_filter keep-threshold. */
  private val MAP_MIN = 2

  /** q222: importance threshold in parts-per-million of total supplied
    * value (~2000 parts at sf0.01 -> uniform share is 500 ppm; 750
    * selects the ~p99 upper tail). */
  private val SHARE_PPM = 750

  val all: Seq[Q] = Seq(
    // ----------------------------------------------------------------
    Q(
      "q189_order_count_histogram",
      "Customer order-count distribution (TPC-H Q13 shape): LEFT OUTER " +
        "join customers to their non-'4-NOT SPECIFIED' orders, count " +
        "per customer (zero-order customers kept by the outer join), " +
        "then the count-of-counts histogram. The two-level aggregation " +
        "is the canonical distribution query: the outer join and the " +
        "per-customer count share ONE custkey exchange (the aggregate " +
        "reuses the join's partitioning), and the histogram's key space " +
        "is bounded by max-orders-per-customer — a few hundred keys at " +
        "ANY corpus scale, so the second agg is map-side combined to " +
        "almost nothing. The priority filter prunes orders BEFORE the " +
        "shuffle (it belongs to the join, not the WHERE — zero-order " +
        "customers must survive).",
      (s, dir) => {
        val c = t(s, dir, "customer").select("c_custkey")
        val o = t(s, dir, "orders")
          .filter(col("o_orderpriority") =!= "4-NOT SPECIFIED")
          .select("o_orderkey", "o_custkey")
        c.join(o, col("c_custkey") === col("o_custkey"), "left_outer")
          .groupBy(col("c_custkey"))
          .agg(count(col("o_orderkey")).as("c_count"))
          .groupBy(col("c_count"))
          .agg(count(lit(1)).as("custdist"))
      },
      Some("""
        SELECT c_count, count(*) AS custdist
        FROM (SELECT c_custkey, count(o_orderkey) AS c_count
              FROM customer LEFT OUTER JOIN orders
                ON c_custkey = o_custkey
               AND o_orderpriority <> '4-NOT SPECIFIED'
              GROUP BY c_custkey)
        GROUP BY c_count""")),
    // ----------------------------------------------------------------
    Q(
      "q190_promo_share",
      s"Promotion revenue share (TPC-H Q14 shape) for ${MONTH_LO.take(7)}: " +
        "of one ship-month's discounted revenue, the fraction earned by " +
        "PROMO-type parts — conditional aggregation as share-of-total, " +
        "1 row out. The month filter prunes lineitem AT THE SCAN before " +
        "the partkey join (only ~1/80th of the fact shuffles); part " +
        "arrives keyed on partkey (broadcast under the threshold here, " +
        "key-partitioned co-location at warehouse scale — either way no " +
        "second fact shuffle). Both sums are decimal-exact and the " +
        "share divides the two exact doubles, so every engine computes " +
        "bit-identical output.",
      (s, dir) => {
        val l = t(s, dir, "lineitem")
          .filter(col("l_shipdate") >= to_timestamp(lit(MONTH_LO)) &&
            col("l_shipdate") < to_timestamp(lit(MONTH_HI)))
          .select(col("l_partkey"),
            (col("l_extendedprice").cast(dec12)
              * (one - col("l_discount").cast(dec4))).as("rev"))
        val p = t(s, dir, "part").select("p_partkey", "p_type")
        l.join(p, col("l_partkey") === col("p_partkey"))
          .agg(
            sum(when(col("p_type") === "PROMO", col("rev"))).as("promo"),
            sum(col("rev")).as("total"))
          .select(
            col("promo").cast(DoubleType).as("promo_revenue"),
            col("total").cast(DoubleType).as("total_revenue"),
            (col("promo").cast(DoubleType) * lit(100.0)
              / col("total").cast(DoubleType)).as("promo_share_pct"))
      },
      Some(s"""
        SELECT CAST(promo AS DOUBLE) AS promo_revenue,
               CAST(total AS DOUBLE) AS total_revenue,
               CAST(promo AS DOUBLE) * 100.0 / CAST(total AS DOUBLE)
                 AS promo_share_pct
        FROM (
          SELECT sum(CASE WHEN p_type = 'PROMO' THEN
                   CAST(l_extendedprice AS DECIMAL(12,2))
                   * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))
                 END) AS promo,
                 sum(CAST(l_extendedprice AS DECIMAL(12,2))
                   * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2))))
                   AS total
          FROM lineitem JOIN part ON l_partkey = p_partkey
          WHERE l_shipdate >= TIMESTAMP '$MONTH_LO 00:00:00'
            AND l_shipdate < TIMESTAMP '$MONTH_HI 00:00:00')""")),
    // ----------------------------------------------------------------
    Q(
      "q191_min_cost_supplier",
      "Minimum-cost supplier per part (TPC-H Q2 shape, supply catalog " +
        "derived from lineitem since the testdata has no partsupp): for " +
        s"each STANDARD part of size >= $SLICE_SIZE, the supplier " +
        "offering its lowest observed price. The classic correlated " +
        "subquery (cost = MIN cost over same part) DECORRELATED: the " +
        "part slice broadcasts into the lineitem scan (semi-join prune " +
        "— only sliced parts' rows leave the scan), per-(part, supplier) " +
        "min prices aggregate on the compound key, and the per-part " +
        "winner collapses to ONE grouped min(struct(cost, suppkey)) — " +
        "lexicographic struct order IS the 'min cost, then min suppkey' " +
        "tie rule, so no second join back against the min (the naive " +
        "decorrelation) is needed. Supplier/nation enrich via broadcast; " +
        "top-20 rides per-partition heaps.",
      (s, dir) => {
        val slice = t(s, dir, "part")
          .filter(col("p_size") >= SLICE_SIZE && col("p_type") === "STANDARD")
          .select("p_partkey", "p_name")
        val cost = t(s, dir, "lineitem")
          .select(col("l_partkey"), col("l_suppkey"),
            col("l_extendedprice").cast(dec12).as("price"))
          .join(broadcast(slice), col("l_partkey") === col("p_partkey"))
          .groupBy(col("p_partkey"), col("p_name"), col("l_suppkey"))
          .agg(min(col("price")).as("cost"))
        val win = cost
          .groupBy(col("p_partkey"), col("p_name"))
          .agg(min(struct(col("cost"), col("l_suppkey"))).as("w"))
          .select(col("p_partkey"), col("p_name"),
            col("w.l_suppkey").as("sk"), col("w.cost").as("cost"))
        win
          .join(broadcast(t(s, dir, "supplier")
            .select("s_suppkey", "s_name", "s_nationkey")),
            col("sk") === col("s_suppkey"))
          .join(broadcast(t(s, dir, "nation")
            .select("n_nationkey", "n_name")),
            col("s_nationkey") === col("n_nationkey"))
          .select(col("p_partkey"), col("p_name"), col("s_name"),
            col("n_name"), col("cost").cast(DoubleType).as("cost"))
          .orderBy(col("cost").desc, col("p_partkey"))
          .limit(20)
      },
      Some(s"""
        WITH cost AS (
          SELECT p_partkey, p_name, l_suppkey,
                 min(CAST(l_extendedprice AS DECIMAL(12,2))) AS cost
          FROM lineitem JOIN part ON l_partkey = p_partkey
          WHERE p_size >= $SLICE_SIZE AND p_type = 'STANDARD'
          GROUP BY p_partkey, p_name, l_suppkey),
        best AS (
          SELECT p_partkey, min(cost) AS mc FROM cost GROUP BY p_partkey),
        win AS (
          SELECT c.p_partkey, c.p_name, min(c.l_suppkey) AS sk, b.mc
          FROM cost c JOIN best b
            ON c.p_partkey = b.p_partkey AND c.cost = b.mc
          GROUP BY c.p_partkey, c.p_name, b.mc)
        SELECT w.p_partkey, w.p_name, s.s_name, n.n_name,
               CAST(w.mc AS DOUBLE) AS cost
        FROM win w
        JOIN supplier s ON w.sk = s.s_suppkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        ORDER BY cost DESC, w.p_partkey LIMIT 20""")),
    // ----------------------------------------------------------------
    Q(
      "q192_big_orders",
      "Large-volume orders and their customers (TPC-H Q18 shape): " +
        s"orders whose total lineitem quantity exceeds $BIG_QTY " +
        "(~the 99th percentile), with customer identity — the " +
        "IN-over-grouped-HAVING pattern decorrelated into aggregate-" +
        "then-join: the quantity HAVING reduces the fact to its tail " +
        "FIRST (the per-order agg shuffles (orderkey, 8-byte sum) " +
        "only), and only surviving orderkeys join orders and then " +
        "customer — at warehouse scale the expensive joins see ~1% of " +
        "the fact. Quantity sums are decimal-exact; top-20 by total " +
        "price rides per-partition heaps under a total order.",
      (s, dir) => {
        val bigQty = t(s, dir, "lineitem")
          .groupBy(col("l_orderkey"))
          .agg(sum(col("l_quantity").cast(dec12)).as("total_qty"))
          .filter(col("total_qty") > BIG_QTY)
        val o = t(s, dir, "orders")
          .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
        val c = t(s, dir, "customer").select("c_custkey", "c_name")
        bigQty
          .join(o, col("l_orderkey") === col("o_orderkey"))
          .join(c, col("o_custkey") === col("c_custkey"))
          .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
            to_date(col("o_orderdate")).as("o_date"), col("o_totalprice"),
            col("total_qty").cast(DoubleType).as("total_qty"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
          .limit(20)
      },
      Some(s"""
        SELECT c_name, c_custkey, o_orderkey,
               CAST(o_orderdate AS DATE) AS o_date, o_totalprice,
               CAST(total_qty AS DOUBLE) AS total_qty
        FROM (SELECT l_orderkey,
                     sum(CAST(l_quantity AS DECIMAL(12,2))) AS total_qty
              FROM lineitem GROUP BY l_orderkey
              HAVING sum(CAST(l_quantity AS DECIMAL(12,2))) > $BIG_QTY) q
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""")),
    // ----------------------------------------------------------------
    Q(
      "q193_late_exists",
      "Orders with a late shipment, counted per priority (TPC-H Q4 " +
        s"shape) over ${HALF_LO.take(7)}..${HALF_HI.take(7)}: an order " +
        "counts when ANY of its items shipped more than 90 days after " +
        "the order date — EXISTS planned as a LEFT SEMI join (each " +
        "order emitted at most once however many items are late, no " +
        "distinct needed). The semi join is an equi-join on orderkey " +
        "with the lateness comparison as a join residual, so it " +
        "shuffles both sides on the key once; the date window prunes " +
        "orders at the scan, and the per-priority count is a 5-key " +
        "map-side-combined agg.",
      (s, dir) => {
        val o = t(s, dir, "orders")
          .filter(col("o_orderdate") >= to_timestamp(lit(HALF_LO)) &&
            col("o_orderdate") < to_timestamp(lit(HALF_HI)))
          .select("o_orderkey", "o_orderdate", "o_orderpriority")
        val l = t(s, dir, "lineitem").select("l_orderkey", "l_shipdate")
        o.join(l,
          col("o_orderkey") === col("l_orderkey") &&
            col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAY"),
          "left_semi")
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("late_orders"))
      },
      Some(s"""
        SELECT o_orderpriority, count(*) AS late_orders
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '$HALF_LO 00:00:00'
          AND o_orderdate < TIMESTAMP '$HALF_HI 00:00:00'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey
                        AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
        GROUP BY o_orderpriority""")),
    // ----------------------------------------------------------------
    Q(
      "q194_dormant_rich",
      "Rich-but-dormant customers by nation (TPC-H Q22 shape): " +
        "customers with above-average positive account balance and no " +
        s"order since $DORMANT_SINCE — the scalar-subquery threshold + " +
        "NOT EXISTS pattern. The average arrives as a 1-row (sum, " +
        "count) broadcast and the threshold compares by CROSS-MULTIPLY " +
        "(balance * count > sum), decimal-exact with no division — an " +
        "avg() would round differently per engine (Spark decimal avg " +
        "vs DuckDB double avg). NOT EXISTS is a LEFT ANTI join on " +
        "custkey: the recency filter prunes orders AT THE SCAN, only " +
        "already-thresholded customers shuffle, and the orders side " +
        "ships its key column alone. Nation enrich broadcasts; output " +
        "is nation-cardinality.",
      (s, dir) => {
        val c = t(s, dir, "customer")
          .select(col("c_custkey"), col("c_nationkey"),
            col("c_acctbal").cast(dec14).as("bal"))
        val thr = c.filter(col("bal") > 0)
          .agg(sum(col("bal")).as("tot"), count(lit(1)).as("cnt"))
        val rich = c.join(broadcast(thr))
          .filter(col("bal") * col("cnt") > col("tot"))
        val dormant = rich.join(
          t(s, dir, "orders")
            .filter(col("o_orderdate") >= to_timestamp(lit(DORMANT_SINCE)))
            .select("o_custkey"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        dormant
          .join(broadcast(t(s, dir, "nation")
            .select("n_nationkey", "n_name")),
            col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name"))
          .agg(count(lit(1)).as("numcust"),
            sum(col("bal")).cast(DoubleType).as("totacctbal"))
      },
      Some(s"""
        WITH thr AS (
          SELECT sum(CAST(c_acctbal AS DECIMAL(14,2))) AS tot,
                 count(*) AS cnt
          FROM customer WHERE CAST(c_acctbal AS DECIMAL(14,2)) > 0)
        SELECT n_name, count(*) AS numcust,
               CAST(sum(CAST(c_acctbal AS DECIMAL(14,2))) AS DOUBLE)
                 AS totacctbal
        FROM customer, nation, thr
        WHERE c_nationkey = n_nationkey
          AND CAST(c_acctbal AS DECIMAL(14,2)) * cnt > tot
          AND NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey
                            AND o_orderdate >= TIMESTAMP '$DORMANT_SINCE 00:00:00')
        GROUP BY n_name""")),
    // ----------------------------------------------------------------
    Q(
      "q195_revenue_share",
      s"Ratio-to-report over the region->nation hierarchy for " +
        s"${YEAR_LO.take(4)}: each nation's customer revenue, its share " +
        "of its region, and its share of the world — the percent-of-" +
        "parent rollup every BI layer computes. Revenue aggregates " +
        "decimal-exact to a NATION-cardinality frame first; the region " +
        "share is a window sum PARTITIONED by region over that tiny " +
        "frame (never over fact rows), and the global total arrives as " +
        "a 1-row broadcast — no unpartitioned window anywhere. Shares " +
        "divide exact doubles, so both engines agree bitwise. Fact " +
        "joins shuffle on custkey then orderkey; the nation/region " +
        "chain broadcasts.",
      (s, dir) => {
        val geo = t(s, dir, "nation")
          .join(t(s, dir, "region"),
            col("n_regionkey") === col("r_regionkey"))
          .select("n_nationkey", "n_name", "r_name")
        val o = t(s, dir, "orders")
          .filter(col("o_orderdate") >= to_timestamp(lit(YEAR_LO)) &&
            col("o_orderdate") < to_timestamp(lit(YEAR_HI)))
          .select("o_orderkey", "o_custkey")
        val li = t(s, dir, "lineitem").select(col("l_orderkey"),
          (col("l_extendedprice").cast(dec12)
            * (one - col("l_discount").cast(dec4))).as("rev"))
        val cust = t(s, dir, "customer").select("c_custkey", "c_nationkey")
        val byNation = li
          .join(o, col("l_orderkey") === col("o_orderkey"))
          .join(cust, col("o_custkey") === col("c_custkey"))
          .join(broadcast(geo), col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("r_name"), col("n_name"))
          .agg(sum(col("rev")).as("rev"))
        val byRegion = byNation
          .withColumn("region_rev",
            sum(col("rev")).over(
              org.apache.spark.sql.expressions.Window.partitionBy(col("r_name"))))
        val world = byNation.agg(sum(col("rev")).as("world_rev"))
        byRegion.join(broadcast(world))
          .select(col("r_name"), col("n_name"),
            col("rev").cast(DoubleType).as("revenue"),
            (col("rev").cast(DoubleType)
              / col("region_rev").cast(DoubleType)).as("region_share"),
            (col("rev").cast(DoubleType)
              / col("world_rev").cast(DoubleType)).as("world_share"))
      },
      Some(s"""
        WITH bn AS (
          SELECT r_name, n_name,
                 sum(CAST(l_extendedprice AS DECIMAL(12,2))
                   * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2))))
                   AS rev
          FROM lineitem, orders, customer, nation, region
          WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
            AND c_nationkey = n_nationkey AND n_regionkey = r_regionkey
            AND o_orderdate >= TIMESTAMP '$YEAR_LO 00:00:00'
            AND o_orderdate < TIMESTAMP '$YEAR_HI 00:00:00'
          GROUP BY r_name, n_name)
        SELECT r_name, n_name, CAST(rev AS DOUBLE) AS revenue,
               CAST(rev AS DOUBLE)
                 / CAST(sum(rev) OVER (PARTITION BY r_name) AS DOUBLE)
                 AS region_share,
               CAST(rev AS DOUBLE)
                 / CAST((SELECT sum(rev) FROM bn) AS DOUBLE) AS world_share
        FROM bn""")),
    // ----------------------------------------------------------------
    Q(
      "q198_disjunctive_revenue",
      "Disjunctive-predicate join revenue (TPC-H Q19 shape): total " +
        "discounted revenue over an OR of three (brand, size-range, " +
        "quantity-range) bundles — the predicate shape that separates " +
        "planners: the partkey equality must still extract into a HASH " +
        "join (the disjunction is a residual filter, never a reason to " +
        "fall back to nested loops), and the per-side implications of " +
        "the OR (brand IN the 3 brands, size <= 50, quantity <= 40) " +
        "are CNF-derivable scan filters — each disjunct constrains " +
        "both sides, so most of both tables dies before the join at " +
        "any scale. Decimal-exact revenue, 1 row out.",
      (s, dir) => {
        val l = t(s, dir, "lineitem")
          .select(col("l_partkey"), col("l_quantity"),
            (col("l_extendedprice").cast(dec12)
              * (one - col("l_discount").cast(dec4))).as("rev"))
        val p = t(s, dir, "part").select("p_partkey", "p_brand", "p_size")
        val bundle =
          (col("p_brand") === "Brand#12" && col("p_size").between(1, 15)
            && col("l_quantity").between(1, 20)) ||
          (col("p_brand") === "Brand#23" && col("p_size").between(10, 30)
            && col("l_quantity").between(10, 30)) ||
          (col("p_brand") === "Brand#34" && col("p_size").between(20, 50)
            && col("l_quantity").between(20, 40))
        l.join(p, col("l_partkey") === col("p_partkey") && bundle)
          .agg(count(lit(1)).as("n_items"),
            sum(col("rev")).cast(DoubleType).as("revenue"))
      },
      Some("""
        SELECT CAST(count(*) AS BIGINT) AS n_items,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                 * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2))))
                 AS DOUBLE) AS revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 1 AND 20)
           OR (p_brand = 'Brand#23' AND p_size BETWEEN 10 AND 30
               AND l_quantity BETWEEN 10 AND 30)
           OR (p_brand = 'Brand#34' AND p_size BETWEEN 20 AND 50
               AND l_quantity BETWEEN 20 AND 40)""")),
    // ----------------------------------------------------------------
    Q(
      "q199_bilateral_trade",
      s"Bilateral trade volume (TPC-H Q7 shape) between $TRADE_A and " +
        s"$TRADE_B: shipped revenue by (supplier nation, customer " +
        "nation, ship year) where the two ends are the two nations in " +
        "either direction. BOTH dimension sides filter to the 2-nation " +
        "set BEFORE their joins (the supplier and customer scans each " +
        "keep ~2/25ths of their table — at warehouse scale the fact " +
        "rows for other suppliers die at the first join), and the " +
        "either-direction disjunction is a residual on the joined pair " +
        "— 2 of the 4 surviving combinations. Nation names broadcast; " +
        "year extraction is a scan projection; decimal-exact revenue " +
        "on a 2x2xyears key space.",
      (s, dir) => {
        val nations = t(s, dir, "nation")
          .filter(col("n_name").isin(TRADE_A, TRADE_B))
          .select("n_nationkey", "n_name")
        val sup = t(s, dir, "supplier")
          .join(broadcast(nations), col("s_nationkey") === col("n_nationkey"))
          .select(col("s_suppkey"), col("n_name").as("supp_nation"))
        val cust = t(s, dir, "customer")
          .join(broadcast(nations), col("c_nationkey") === col("n_nationkey"))
          .select(col("c_custkey"), col("n_name").as("cust_nation"))
        val li = t(s, dir, "lineitem").select(col("l_orderkey"),
          col("l_suppkey"), year(col("l_shipdate")).as("ship_year"),
          (col("l_extendedprice").cast(dec12)
            * (one - col("l_discount").cast(dec4))).as("rev"))
        val o = t(s, dir, "orders").select("o_orderkey", "o_custkey")
        li.join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
          .join(o, col("l_orderkey") === col("o_orderkey"))
          .join(cust, col("o_custkey") === col("c_custkey"))
          .filter(
            (col("supp_nation") === TRADE_A && col("cust_nation") === TRADE_B) ||
            (col("supp_nation") === TRADE_B && col("cust_nation") === TRADE_A))
          .groupBy(col("supp_nation"), col("cust_nation"), col("ship_year"))
          .agg(sum(col("rev")).cast(DoubleType).as("revenue"))
      },
      Some(s"""
        SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
               CAST(year(l_shipdate) AS INTEGER) AS ship_year,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                 * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2))))
                 AS DOUBLE) AS revenue
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation sn ON s_nationkey = sn.n_nationkey
        JOIN nation cn ON c_nationkey = cn.n_nationkey
        WHERE (sn.n_name = '$TRADE_A' AND cn.n_name = '$TRADE_B')
           OR (sn.n_name = '$TRADE_B' AND cn.n_name = '$TRADE_A')
        GROUP BY 1, 2, 3""")),
    // ----------------------------------------------------------------
    Q(
      "q200_market_share",
      s"National market share (TPC-H Q8 shape): of the revenue MIDDLE " +
        s"EAST customers generated in ${SHARE_LO.take(4)}-" +
        s"${SHARE_HI.take(4)}, the share supplied by $TRADE_A, per " +
        "order year — conditional-aggregation share-of-total inside a " +
        "6-table chain. The region filter prunes customers before " +
        "their shuffle; the supplier side carries only an is-target " +
        "flag (nation broadcast); numerator and denominator are ONE " +
        "pass over the joined facts (a conditional and an " +
        "unconditional decimal sum), and the share divides the two " +
        "exact doubles per year — never a join between separately " +
        "aggregated halves.",
      (s, dir) => {
        val meNations = t(s, dir, "nation")
          .join(t(s, dir, "region").filter(col("r_name") === "MIDDLE EAST"),
            col("n_regionkey") === col("r_regionkey"))
          .select("n_nationkey")
        val cust = t(s, dir, "customer")
          .join(broadcast(meNations), col("c_nationkey") === col("n_nationkey"))
          .select("c_custkey")
        val supFlag = t(s, dir, "supplier")
          .join(broadcast(t(s, dir, "nation").select("n_nationkey", "n_name")),
            col("s_nationkey") === col("n_nationkey"))
          .select(col("s_suppkey"), (col("n_name") === TRADE_A).as("is_target"))
        val o = t(s, dir, "orders")
          .filter(col("o_orderdate") >= to_timestamp(lit(SHARE_LO)) &&
            col("o_orderdate") < to_timestamp(lit(SHARE_HI)))
          .select(col("o_orderkey"), col("o_custkey"),
            year(col("o_orderdate")).as("o_year"))
        val li = t(s, dir, "lineitem").select(col("l_orderkey"),
          col("l_suppkey"),
          (col("l_extendedprice").cast(dec12)
            * (one - col("l_discount").cast(dec4))).as("rev"))
        li.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(cust, col("o_custkey") === col("c_custkey"))
          .join(broadcast(supFlag), col("l_suppkey") === col("s_suppkey"))
          .groupBy(col("o_year"))
          .agg(sum(when(col("is_target"), col("rev"))).as("target"),
            sum(col("rev")).as("total"))
          .select(col("o_year"),
            coalesce(col("target").cast(DoubleType), lit(0.0))
              .as("target_revenue"),
            col("total").cast(DoubleType).as("total_revenue"),
            (coalesce(col("target").cast(DoubleType), lit(0.0)) * 100.0
              / col("total").cast(DoubleType)).as("mkt_share_pct"))
      },
      Some(s"""
        SELECT CAST(o_year AS INTEGER) AS o_year,
               CAST(coalesce(target, 0) AS DOUBLE) AS target_revenue,
               CAST(total AS DOUBLE) AS total_revenue,
               CAST(coalesce(target, 0) AS DOUBLE) * 100.0
                 / CAST(total AS DOUBLE) AS mkt_share_pct
        FROM (
          SELECT year(o_orderdate) AS o_year,
                 sum(CASE WHEN sn.n_name = '$TRADE_A' THEN
                   CAST(l_extendedprice AS DECIMAL(12,2))
                   * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))
                 END) AS target,
                 sum(CAST(l_extendedprice AS DECIMAL(12,2))
                   * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2))))
                   AS total
          FROM lineitem
          JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN nation cn ON c_nationkey = cn.n_nationkey
          JOIN region ON cn.n_regionkey = r_regionkey
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation sn ON s_nationkey = sn.n_nationkey
          WHERE r_name = 'MIDDLE EAST'
            AND o_orderdate >= TIMESTAMP '$SHARE_LO 00:00:00'
            AND o_orderdate < TIMESTAMP '$SHARE_HI 00:00:00'
          GROUP BY 1)""")),
    // ----------------------------------------------------------------
    Q(
      "q201_ab_test",
      "Deterministic A/B experiment readout: users split 50/50 by " +
        "portable hash of their id (assignment is a pure function — " +
        "reproducible across runs, engines, and partitionings, the " +
        "same property q123's leakage-safe split relies on), then per " +
        "variant: assigned users, exposed (saw a view), converted " +
        "(made a purchase), and conversion basis points among the " +
        "exposed. Per-user flags are ONE user-keyed aggregation of " +
        "conditional maxima — the corpus collapses to user " +
        "cardinality before the 2-key variant rollup, and every share " +
        "is integer basis points (no float drift). The readout table " +
        "is the experiment-analysis primitive every event warehouse " +
        "serves.",
      (s, dir) => {
        val ev = t(s, dir, "events")
        val perUser = ev.groupBy(col("user_id"))
          .agg(
            max(when(col("event_type") === "view", 1).otherwise(0))
              .as("exposed"),
            max(when(col("event_type") === "purchase", 1).otherwise(0))
              .as("converted"))
          .withColumn("variant",
            Portable.pmd5(concat(lit("u:"), col("user_id").cast("string")))
              % 2)
        perUser.groupBy(col("variant"))
          .agg(count(lit(1)).as("assigned"),
            sum(col("exposed")).as("exposed"),
            sum(when(col("exposed") === 1, col("converted"))).as("converted"))
          .select(col("variant"), col("assigned"), col("exposed"),
            col("converted"),
            // zero-exposure guard: Spark's div would null silently
            // where DuckDB's // raises — state the NULL explicitly in
            // both engines so a dead variant reads as unknown, not as
            // an engine-dependent outcome
            when(col("exposed") > 0,
              expr("converted * 10000 div exposed")).as("cvr_bp"))
      },
      Some(s"""
        WITH pu AS (
          SELECT user_id,
                 max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                   AS exposed,
                 max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   AS converted,
                 ${Portable.pmd5Sql("concat('u:', CAST(user_id AS VARCHAR))")} % 2
                   AS variant
          FROM events GROUP BY user_id)
        SELECT variant, CAST(count(*) AS BIGINT) AS assigned,
               CAST(sum(exposed) AS BIGINT) AS exposed,
               CAST(sum(CASE WHEN exposed = 1 THEN converted END) AS BIGINT)
                 AS converted,
               CAST(CASE WHEN sum(exposed) > 0 THEN
                 sum(CASE WHEN exposed = 1 THEN converted END) * 10000
                   // sum(exposed) END AS BIGINT) AS cvr_bp
        FROM pu GROUP BY variant""")),
    // ----------------------------------------------------------------
    Q(
      "q202_salted_join",
      s"Skew-safe salted equi-join (Skew.saltedJoin): events join their " +
        s"user dimension on a KNOWN-skewed key through $SALTS salt " +
        "buckets — each probe row carries a deterministic hash salt, " +
        "the dimension replicates per salt, and the join runs on " +
        "(key, salt) so a hot user's rows spread over " +
        s"$SALTS reducers instead of funneling through one (the static " +
        "complement of AQE's skew split, which only engages on " +
        "sort-merge partition thresholds). The oracle is the PLAIN " +
        "join — the hash match proves salting is a pure partitioning " +
        "refinement, dropping and duplicating nothing. Value sums in " +
        "decimal partials; segment-cardinality output.",
      (s, dir) => {
        val ev = t(s, dir, "events")
          .select(col("user_id"), col("event_id"),
            col("value").cast(dec12).as("v"))
        val cust = t(s, dir, "customer")
          .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
        graft.operators.Skew.saltedJoin(ev, cust, "user_id",
          Portable.pmd5(concat(lit("e:"), col("event_id").cast("string"))),
          SALTS)
          .groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).as("n_events"),
            sum(col("v")).cast(DoubleType).as("total_value"))
      },
      Some("""
        SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_events,
               CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE)
                 AS total_value
        FROM events JOIN customer ON user_id = c_custkey
        GROUP BY c_mktsegment""")),
    // ----------------------------------------------------------------
    Q(
      "q203_knn_eval",
      "Classifier evaluation over q196's k-NN predictions: the " +
        "confusion matrix (true label x predicted label counts) plus " +
        "per-true-label accuracy in integer basis points — the " +
        "label-noise/health readout a labeled-corpus owner runs after " +
        "any automatic labeling pass. Everything downstream of the " +
        "neighbor search operates on the queries x k frame, so the " +
        "eval costs nothing beyond q196 at any corpus scale; counts " +
        "and shares are exact integers.",
      (s, dir) => {
        val e = t(s, dir, "embeddings")
        val pred = Similarity.knnClassify(
          spread(e.filter(col("vec_id") >= NQ_E), col("vec_id")),
          e.filter(col("vec_id") < NQ_E),
          "vec_id", "embedding", "label", KNN_K_E)
        pred.groupBy(col("true_label"), col("predicted_label"))
          .agg(count(lit(1)).as("n"),
            sum(when(col("true_label") === col("predicted_label"), 1L)
              .otherwise(0L)).as("n_correct"))
          .withColumn("acc_bp", expr("n_correct * 10000 div n"))
      },
      Some(s"""
        WITH prep AS (
          SELECT vec_id, label,
                 list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
          FROM embeddings),
        nrm AS (
          SELECT vec_id, label, v,
                 sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
                   list_transform(generate_series(1, len(v)), i -> v[i] * v[i])),
                   (acc, x) -> acc + x)) AS nv
          FROM prep),
        topk AS (
          SELECT query_id, nlabel FROM (
            SELECT q.vec_id AS query_id, c.label AS nlabel,
                   row_number() OVER (PARTITION BY q.vec_id
                     ORDER BY list_reduce(list_prepend(CAST(0 AS DOUBLE),
                       list_transform(generate_series(1, len(q.v)),
                         i -> q.v[i] * c.v[i])), (acc, x) -> acc + x)
                       / (q.nv * c.nv) DESC, c.vec_id ASC) AS rank
            FROM nrm q JOIN nrm c
              ON q.vec_id < $NQ_E AND c.vec_id >= $NQ_E)
          WHERE rank <= $KNN_K_E),
        votes AS (
          SELECT query_id, nlabel, CAST(count(*) AS BIGINT) AS votes
          FROM topk GROUP BY 1, 2),
        pred AS (
          SELECT query_id, nlabel AS predicted_label FROM (
            SELECT *, row_number() OVER (PARTITION BY query_id
                        ORDER BY votes DESC, nlabel ASC) AS rk
            FROM votes)
          WHERE rk = 1)
        SELECT q.label AS true_label, p.predicted_label,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CASE WHEN q.label = p.predicted_label
                 THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
               CAST(sum(CASE WHEN q.label = p.predicted_label
                 THEN 1 ELSE 0 END) * 10000 // count(*) AS BIGINT) AS acc_bp
        FROM pred p JOIN nrm q ON q.vec_id = p.query_id
        GROUP BY 1, 2""")),
    // ----------------------------------------------------------------
    Q(
      "q204_topk_operator",
      "Grouped top-k through the custom physical operator " +
        "(plans.TopKPerKey): the 3 longest documents per source under " +
        "the total order (n_chars desc, doc_id asc) — planned as " +
        "PartialTopKPerKey -> hash exchange -> FinalTopKPerKey, " +
        "bounded heaps instead of WindowExec's per-partition SORT. The " +
        "map-side stage caps the shuffle at splits x keys x k rows " +
        "(the aggregation-style partial pushdown row_number cannot " +
        "have), and no SortExec appears anywhere in the plan " +
        "(TopKPerKeySpec pins that). The oracle is the row_number " +
        "window form — the hash match proves the operator selects " +
        "exactly the window's winner set. The whole custom-Catalyst " +
        "ladder is now exercised: expressions (SimHash60, SrpBuckets), " +
        "an optimizer rule (RewriteSortedIntersect), and a logical " +
        "node + strategy + two execs (this).",
      (s, dir) => {
        val docs = t(s, dir, "documents")
          .select("source", "doc_id", "n_chars")
        graft.plans.TopKPerKey.topK(docs, Seq("source"),
          Seq("n_chars" -> false, "doc_id" -> true), TOPK_DOCS)
      },
      Some(s"""
        SELECT source, doc_id, n_chars
        FROM (SELECT source, doc_id, n_chars,
                     row_number() OVER (PARTITION BY source
                       ORDER BY n_chars DESC, doc_id ASC) AS rn
              FROM documents)
        WHERE rn <= $TOPK_DOCS""")),
    // ----------------------------------------------------------------
    Q(
      "q205_kmv_intersection",
      s"KMV sketch SET ALGEBRA — the distinct-count sketch family's " +
        "union/intersection laws (q69 built the single-set estimator): " +
        "active view user-days vs purchase user-days, their union " +
        s"estimated from the $KMV_I smallest hashes of the merged " +
        "sketches (valid because each sketch already holds its own k " +
        "smallest), the intersection by the Jaccard-style matched " +
        "fraction inside the union sketch, both audited against the " +
        "exact answers (the q84 sketch-vs-truth pattern). The point at " +
        "100 TB: two O(k) sketches answer the overlap question WITHOUT " +
        "the distinct-pair join the exact path needs — sketches " +
        "merge/ship in one broadcastable row each, and here " +
        "cardinalities (~1600 each, 557 shared) genuinely exceed k, " +
        "so the estimate is a real estimate, deterministically " +
        "reproduced by both engines (pure hash order, no RNG).",
      (s, dir) => {
        val K = KMV_I
        val ev = t(s, dir, "events")
          .filter(col("event_type").isin("view", "purchase"))
          .select(col("event_type"),
            Portable.pmd5(concat(lit("kmv:"), col("user_id").cast("string"),
              lit(":"), to_date(col("ts")).cast("string"))).as("h"))
          .distinct()
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("event_type")).orderBy(col("h"))
        val sk = ev.withColumn("rn", row_number().over(w))
          .filter(col("rn") <= K).select("event_type", "h").persist()
        val sa = sk.filter(col("event_type") === "view").select("h")
        val sb = sk.filter(col("event_type") === "purchase").select("h")
        val pool = sa.union(sb).distinct().orderBy(col("h")).limit(K)
        val theta = pool.agg(max(col("h")).as("theta"))
        val matched = pool
          .join(sa, Seq("h"), "left_semi")
          .join(sb, Seq("h"), "left_semi")
          .agg(count(lit(1)).as("matched"))
        val exactU = ev.select("h").distinct()
          .agg(count(lit(1)).as("exact_union"))
        val exactI = ev.filter(col("event_type") === "view").select("h")
          .join(ev.filter(col("event_type") === "purchase").select("h"),
            Seq("h"), "left_semi")
          .agg(count(lit(1)).as("exact_intersection"))
        theta.join(broadcast(matched)).join(broadcast(exactU))
          .join(broadcast(exactI))
          .select(
            expr(s"CAST((${K - 1}) * 1152921504606846976.0 / theta AS DOUBLE)")
              .as("est_union"),
            col("matched"),
            expr(s"CAST(CAST(matched AS DOUBLE) * ((${K - 1}) * " +
              s"1152921504606846976.0 / theta) / $K AS DOUBLE)")
              .as("est_intersection"),
            col("exact_union"), col("exact_intersection"))
      },
      Some(s"""
        WITH ud AS (
          SELECT DISTINCT event_type,
                 ${Portable.pmd5Sql(
                   "concat('kmv:', CAST(user_id AS VARCHAR), ':', CAST(CAST(ts AS DATE) AS VARCHAR))")}
                   AS h
          FROM events WHERE event_type IN ('view', 'purchase')),
        sk AS (
          SELECT event_type, h FROM (
            SELECT event_type, h,
                   row_number() OVER (PARTITION BY event_type ORDER BY h)
                     AS rn
            FROM ud)
          WHERE rn <= $KMV_I),
        pool AS (
          SELECT DISTINCT h FROM sk ORDER BY h LIMIT $KMV_I),
        agg AS (
          SELECT (SELECT max(h) FROM pool) AS theta,
                 (SELECT count(*) FROM pool
                  WHERE h IN (SELECT h FROM sk WHERE event_type = 'view')
                    AND h IN (SELECT h FROM sk WHERE event_type = 'purchase'))
                   AS matched,
                 (SELECT count(DISTINCT h) FROM ud) AS exact_union,
                 (SELECT count(*) FROM
                   (SELECT h FROM ud WHERE event_type = 'view') v
                  WHERE h IN (SELECT h FROM ud WHERE event_type = 'purchase'))
                   AS exact_intersection)
        SELECT CAST((${KMV_I - 1}) * 1152921504606846976.0 / theta AS DOUBLE)
                 AS est_union,
               CAST(matched AS BIGINT) AS matched,
               CAST(CAST(matched AS DOUBLE) * ((${KMV_I - 1})
                 * 1152921504606846976.0 / theta) / $KMV_I AS DOUBLE)
                 AS est_intersection,
               CAST(exact_union AS BIGINT) AS exact_union,
               CAST(exact_intersection AS BIGINT) AS exact_intersection
        FROM agg""")),
    // ----------------------------------------------------------------
    Q(
      "q206_rfm_segments",
      "RFM customer segmentation — the classic warehouse scoring " +
        s"workload: per customer, Recency (days from last order to " +
        s"$RFM_REF), Frequency (order count) and Monetary (exact " +
        "cents), each banded 1-4 by its GLOBAL quartiles, segments " +
        "rolled up with population and total monetary. The quartile " +
        "edges come from the one-pass mergeable KLL sketch (exact at " +
        "this capacity — the q101 gate — with the same ~1% rank-error " +
        "contract at 100 TB), NOT from a global ntile window: ntile " +
        "over all customers is an unpartitioned sort of the whole " +
        "frame, the q67 scale-killer class this registry bans. The 9 " +
        "edge numbers return to the driver as planner metadata (the " +
        "BPE/manifest precedent) and band as literal comparisons — a " +
        "pure projection, no join; the rollup key space is at most " +
        "4^3 segments.",
      (s, dir) => {
        import s.implicits._
        import graft.functions.Kll
        val base = t(s, dir, "orders")
          .groupBy(col("o_custkey"))
          .agg(max(to_date(col("o_orderdate"))).as("last_d"),
            count(lit(1)).as("freq"),
            sum(col("o_totalprice").cast(dec12)).as("mon"))
          .select(col("o_custkey"),
            datediff(lit(RFM_REF).cast("date"), col("last_d"))
              .cast("long").as("recency"),
            col("freq"),
            (col("mon") * 100).cast("long").as("cents"))
          .persist()
        // quartile edges: one sketch pass per metric, 3 numbers each —
        // collected as PLANNER METADATA (the BPE/manifest precedent: a
        // bounded driver-side read that parameterizes the next plan),
        // so banding compiles to literal comparisons, no join at all
        def edges(c: String): Seq[Long] =
          base.select(col(c)).as[Long]
            .groupByKey(_ => 0)
            .mapValues(identity)
            .agg(new Kll.QuantileSketchLong(1 << 17, Seq(25, 50, 75)).toColumn)
            .map(_._2).collect().head
        def band(c: String, e: Seq[Long]): org.apache.spark.sql.Column =
          lit(1) + (col(c) > e(0)).cast("int") +
            (col(c) > e(1)).cast("int") + (col(c) > e(2)).cast("int")
        val (er, ef, em) = (edges("recency"), edges("freq"), edges("cents"))
        base
          .select(band("recency", er).as("r_band"), band("freq", ef).as("f_band"),
            band("cents", em).as("m_band"), col("cents"))
          .groupBy(col("r_band"), col("f_band"), col("m_band"))
          .agg(count(lit(1)).as("n_customers"),
            sum(col("cents")).as("total_cents"))
      },
      Some(s"""
        WITH base AS (
          SELECT o_custkey,
                 date_diff('day', CAST(max(o_orderdate) AS DATE),
                   DATE '$RFM_REF') AS recency,
                 count(*) AS freq,
                 CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) * 100
                   AS BIGINT) AS cents
          FROM orders GROUP BY 1),
        er AS (
          SELECT max(CASE WHEN rn = greatest(1,(n*25+99)//100) THEN recency END) AS p25,
                 max(CASE WHEN rn = greatest(1,(n*50+99)//100) THEN recency END) AS p50,
                 max(CASE WHEN rn = greatest(1,(n*75+99)//100) THEN recency END) AS p75
          FROM (SELECT recency, row_number() OVER (ORDER BY recency) AS rn,
                       count(*) OVER () AS n FROM base)),
        ef AS (
          SELECT max(CASE WHEN rn = greatest(1,(n*25+99)//100) THEN freq END) AS p25,
                 max(CASE WHEN rn = greatest(1,(n*50+99)//100) THEN freq END) AS p50,
                 max(CASE WHEN rn = greatest(1,(n*75+99)//100) THEN freq END) AS p75
          FROM (SELECT freq, row_number() OVER (ORDER BY freq) AS rn,
                       count(*) OVER () AS n FROM base)),
        em AS (
          SELECT max(CASE WHEN rn = greatest(1,(n*25+99)//100) THEN cents END) AS p25,
                 max(CASE WHEN rn = greatest(1,(n*50+99)//100) THEN cents END) AS p50,
                 max(CASE WHEN rn = greatest(1,(n*75+99)//100) THEN cents END) AS p75
          FROM (SELECT cents, row_number() OVER (ORDER BY cents) AS rn,
                       count(*) OVER () AS n FROM base))
        SELECT CAST(1 + (recency > er.p25)::INT + (recency > er.p50)::INT
                 + (recency > er.p75)::INT AS INTEGER) AS r_band,
               CAST(1 + (freq > ef.p25)::INT + (freq > ef.p50)::INT
                 + (freq > ef.p75)::INT AS INTEGER) AS f_band,
               CAST(1 + (cents > em.p25)::INT + (cents > em.p50)::INT
                 + (cents > em.p75)::INT AS INTEGER) AS m_band,
               CAST(count(*) AS BIGINT) AS n_customers,
               CAST(sum(cents) AS BIGINT) AS total_cents
        FROM base, er, ef, em
        GROUP BY 1, 2, 3""")),
    // ----------------------------------------------------------------
    Q(
      "q207_sliding_distinct",
      "Exact distinct users per 3-hour SLIDING window (1-hour step): " +
        "each event self-assigns to the 3 overlapping windows that " +
        "contain its hour (the time-window explode Spark's `window()` " +
        "slide does internally, spelled out so the oracle can state " +
        "it), then one aggregation computes events and EXACT distinct " +
        "users per window. Window starts ride integer epoch-micros " +
        "arithmetic — no interval types to disagree across engines. " +
        "Scale: the explode is a bounded 3x of (16-byte) pairs and " +
        "count(distinct) plans as the standard two-phase expand — the " +
        "exact form; q132's HLL registers are the sketch path when " +
        "3x distinct pairs is too much.",
      (s, dir) => {
        val HOUR_US = Units.HourUs
        val ev = t(s, dir, "events")
          .select(unix_micros(date_trunc("hour", col("ts"))).as("h_us"),
            col("user_id"))
        ev.select(explode(array(lit(0L), lit(1L), lit(2L))).as("off"),
            col("h_us"), col("user_id"))
          .select(timestamp_micros(col("h_us") - col("off") * HOUR_US)
            .as("win_start"), col("user_id"))
          .groupBy(col("win_start"))
          .agg(count(lit(1)).as("n_events"),
            countDistinct(col("user_id")).as("n_users"))
      },
      Some(s"""
        WITH ex AS (
          SELECT make_timestamp(epoch_us(date_trunc('hour', ts))
                   - off * ${Units.HourUs}) AS win_start,
                 user_id
          FROM events, (SELECT unnest([0, 1, 2]) AS off))
        SELECT win_start, CAST(count(*) AS BIGINT) AS n_events,
               CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        FROM ex GROUP BY win_start""")),
    // ----------------------------------------------------------------
    Q(
      "q208_top_supplier",
      s"Top supplier by quarterly revenue (TPC-H Q15 shape): per-" +
        s"supplier revenue over ${MONTH_LO.take(7)}'s quarter, keeping " +
        "EVERY supplier tied at the maximum — the correlated " +
        "max-subquery decorrelated into a 1-row broadcast max plus an " +
        "EQUALITY join back (decimal equality is exact, so ties " +
        "survive honestly where a float max would drop them; a " +
        "limit(1) would also break ties arbitrarily — the tie-keeping " +
        "is the point of Q15). The per-supplier aggregate shuffles " +
        "(suppkey, partial sum) only; supplier names broadcast.",
      (s, dir) => {
        val rev = t(s, dir, "lineitem")
          .filter(col("l_shipdate") >= to_timestamp(lit("1996-01-01")) &&
            col("l_shipdate") < to_timestamp(lit("1996-04-01")))
          .select(col("l_suppkey"),
            (col("l_extendedprice").cast(dec12)
              * (one - col("l_discount").cast(dec4))).as("rev"))
          .groupBy(col("l_suppkey"))
          .agg(sum(col("rev")).as("total"))
        val mx = rev.agg(max(col("total")).as("mx"))
        rev.join(broadcast(mx), col("total") === col("mx"))
          .join(broadcast(t(s, dir, "supplier").select("s_suppkey", "s_name")),
            col("l_suppkey") === col("s_suppkey"))
          .select(col("s_suppkey"), col("s_name"),
            col("total").cast(DoubleType).as("total_revenue"))
      },
      Some("""
        WITH rev AS (
          SELECT l_suppkey,
                 sum(CAST(l_extendedprice AS DECIMAL(12,2))
                   * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2))))
                   AS total
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
            AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
          GROUP BY l_suppkey)
        SELECT s_suppkey, s_name, CAST(total AS DOUBLE) AS total_revenue
        FROM rev JOIN supplier ON l_suppkey = s_suppkey
        WHERE total = (SELECT max(total) FROM rev)""")),
    // ----------------------------------------------------------------
    Q(
      "q209_supplier_variety",
      "Supplier variety per (brand, size) (TPC-H Q16 shape): how many " +
        "DISTINCT suppliers stock non-PROMO parts of the large sizes, " +
        "excluding blacklisted suppliers (negative account balance — " +
        "the NOT IN subquery planned as a broadcast LEFT ANTI join, " +
        "never a per-row probe). The part slice broadcasts into the " +
        "lineitem scan; count(distinct suppkey) per group is the " +
        "standard two-phase expand over (brand, size, suppkey) " +
        "triples — at warehouse scale the distinct pairs are the " +
        "shuffle, everything else is dimension-bounded.",
      (s, dir) => {
        val slice = t(s, dir, "part")
          .filter(col("p_type") =!= "PROMO" && col("p_size") >= SLICE_SIZE)
          .select("p_partkey", "p_brand", "p_size")
        val blacklist = t(s, dir, "supplier")
          .filter(col("s_acctbal") < 0).select("s_suppkey")
        t(s, dir, "lineitem").select("l_partkey", "l_suppkey")
          .join(broadcast(slice), col("l_partkey") === col("p_partkey"))
          .join(broadcast(blacklist), col("l_suppkey") === col("s_suppkey"),
            "left_anti")
          .groupBy(col("p_brand"), col("p_size"))
          .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      },
      Some(s"""
        SELECT p_brand, p_size,
               CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_type <> 'PROMO' AND p_size >= $SLICE_SIZE
          AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                                WHERE s_acctbal < 0)
        GROUP BY p_brand, p_size""")),
    // ----------------------------------------------------------------
    Q(
      "q210_small_qty_revenue",
      "Small-quantity order revenue (TPC-H Q17 shape): revenue from " +
        "Brand#23 lineitems whose quantity is below 20% of their " +
        "part's average quantity — the correlated AVG subquery, " +
        "decorrelated into a per-part (sum, count) aggregate joined " +
        "back, with the threshold as an exact CROSS-MULTIPLY " +
        "(5 * qty * cnt < sum — no division, no float average, so " +
        "both engines agree bit-for-bit; the q194 avg-avoidance rule " +
        "applied to a correlated predicate). The brand slice " +
        "broadcasts into BOTH the stats pass and the probe pass, so " +
        "only that brand's rows ever aggregate or shuffle.",
      (s, dir) => {
        val slice = t(s, dir, "part")
          .filter(col("p_brand") === "Brand#23").select("p_partkey")
        val li = t(s, dir, "lineitem")
          .join(broadcast(slice), col("l_partkey") === col("p_partkey"))
          .select(col("p_partkey").as("pk"),
            col("l_quantity").cast(dec12).as("qty"),
            col("l_extendedprice").cast(dec12).as("price"))
        val stats = li.groupBy(col("pk"))
          .agg(sum(col("qty")).as("sum_qty"), count(lit(1)).as("cnt"))
        li.join(stats, Seq("pk"))
          .filter(col("qty") * col("cnt") * 5 < col("sum_qty"))
          .agg(count(lit(1)).as("n_items"),
            sum(col("price")).cast(DoubleType).as("total_revenue"))
      },
      Some("""
        WITH li AS (
          SELECT p_partkey AS pk,
                 CAST(l_quantity AS DECIMAL(12,2)) AS qty,
                 CAST(l_extendedprice AS DECIMAL(12,2)) AS price
          FROM lineitem JOIN part ON l_partkey = p_partkey
          WHERE p_brand = 'Brand#23'),
        stats AS (
          SELECT pk, sum(qty) AS sum_qty, count(*) AS cnt
          FROM li GROUP BY pk)
        SELECT CAST(count(*) AS BIGINT) AS n_items,
               CAST(sum(price) AS DOUBLE) AS total_revenue
        FROM li JOIN stats USING (pk)
        WHERE qty * cnt * 5 < sum_qty""")),
    // ----------------------------------------------------------------
    Q(
      "q211_interpolated_quantiles",
      "Type-7 INTERPOLATED quantiles (p50/p95) of event value per " +
        "type — the linear-interpolation definition (numpy/R default) " +
        "beside the registry's type-1 rank selection (q46/q85/q101): " +
        "h = (n-1)p/100, answer = v_floor + frac * (v_ceil - v_floor). " +
        "Neither engine's built-in quantile_cont is trusted — both " +
        "state the formula explicitly over integer micro-values, with " +
        "frac an exact integer-remainder/100 double, so the " +
        "interpolation arithmetic is bit-identical. Ranks come from " +
        "one per-type window (partitioned; type cardinality bounds " +
        "nothing — the partition is the stratum, same class as q85); " +
        "at corpus scale the KLL sketch takes over with its rank-error " +
        "contract (interpolation then happens on the sketch's levels).",
      (s, dir) => {
        val d = t(s, dir, "events")
          .select(col("event_type"),
            floor(col("value") * 1000000).cast("long").as("v"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("event_type")).orderBy(col("v"))
        val r = d.withColumn("rn", row_number().over(w))
          .withColumn("nt", count(lit(1)).over(
            org.apache.spark.sql.expressions.Window.partitionBy(col("event_type"))))
        def interp(p: Int, name: String) = {
          // h = (n-1)*p/100; lo rank = floor(h)+1; frac = remainder/100
          // (integer `div`, never Column./ which is double division);
          // nt is group-constant and grouped, so it is legal here
          val loRank = expr(s"(nt - 1) * $p div 100 + 1")
          val frac = expr(s"CAST(((nt - 1) * $p) % 100 AS DOUBLE) / 100.0")
          val vLo = max(when(col("rn") === loRank, col("v")))
          val vHi = max(when(col("rn") === loRank + 1, col("v")))
          (vLo.cast(DoubleType)
            + frac * (coalesce(vHi, vLo).cast(DoubleType)
              - vLo.cast(DoubleType))).as(name)
        }
        r.groupBy(col("event_type"), col("nt"))
          .agg(interp(50, "p50_micro"), interp(95, "p95_micro"))
          .select(col("event_type"), col("nt").as("n"),
            col("p50_micro"), col("p95_micro"))
      },
      Some("""
        WITH d AS (
          SELECT event_type, CAST(floor(value * 1000000) AS BIGINT) AS v
          FROM events),
        r AS (
          SELECT event_type, v,
                 row_number() OVER (PARTITION BY event_type ORDER BY v) AS rn,
                 count(*) OVER (PARTITION BY event_type) AS nt
          FROM d)
        SELECT event_type, CAST(nt AS BIGINT) AS n,
               CAST(max(CASE WHEN rn = (nt-1)*50//100 + 1 THEN v END) AS DOUBLE)
                 + (CAST(((nt-1)*50) % 100 AS DOUBLE) / 100.0)
                 * (CAST(coalesce(max(CASE WHEN rn = (nt-1)*50//100 + 2 THEN v END),
                          max(CASE WHEN rn = (nt-1)*50//100 + 1 THEN v END)) AS DOUBLE)
                    - CAST(max(CASE WHEN rn = (nt-1)*50//100 + 1 THEN v END) AS DOUBLE))
                 AS p50_micro,
               CAST(max(CASE WHEN rn = (nt-1)*95//100 + 1 THEN v END) AS DOUBLE)
                 + (CAST(((nt-1)*95) % 100 AS DOUBLE) / 100.0)
                 * (CAST(coalesce(max(CASE WHEN rn = (nt-1)*95//100 + 2 THEN v END),
                          max(CASE WHEN rn = (nt-1)*95//100 + 1 THEN v END)) AS DOUBLE)
                    - CAST(max(CASE WHEN rn = (nt-1)*95//100 + 1 THEN v END) AS DOUBLE))
                 AS p95_micro
        FROM r GROUP BY event_type, nt""")),
    // ----------------------------------------------------------------
    Q(
      "q212_session_window",
      "Native session_window() sessionization (5-minute gap): per-user " +
        "sessions as ONE grouped aggregation — Spark's built-in " +
        "merging-session operator, the declarative complement of " +
        "q35's lag+running-sum spelling and of the " +
        "flatMapGroupsWithState streaming form (all three state the " +
        "same semantics: an event joins its predecessor's session iff " +
        "it arrives strictly within gap; the oracle's islands " +
        "formulation breaks on diff >= gap accordingly). The operator " +
        "shuffles once on user_id and merges windows inside the " +
        "aggregation — no window-function sort pass over the events; " +
        "output is session-cardinality with exact micros bounds.",
      (s, dir) => {
        t(s, dir, "events")
          .groupBy(col("user_id"), session_window(col("ts"), "5 minutes"))
          .agg(max(col("ts")).as("session_end"),
            count(lit(1)).as("n_events"))
          .select(col("user_id"),
            col("session_window.start").as("session_start"),
            col("session_end"), col("n_events"))
      },
      Some("""
        WITH o AS (
          SELECT user_id, ts, event_id,
                 CASE WHEN lag(ts) OVER w IS NULL
                       OR ts - lag(ts) OVER w >= INTERVAL 5 MINUTE
                      THEN 1 ELSE 0 END AS brk
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        sden AS (
          -- event_id in the running-sum ORDER BY keeps this window on
          -- the SAME total order as brk's lag window above: with two
          -- events at one ts, a ts-only ROWS frame has unspecified peer
          -- order and the session assignment would be nondeterministic
          SELECT user_id, ts,
                 sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS sid
          FROM o)
        SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
               CAST(count(*) AS BIGINT) AS n_events
        FROM sden GROUP BY user_id, sid""")),
    // ----------------------------------------------------------------
    Q(
      "q213_relational_division",
      "Relational DIVISION (the 'bought ALL of them' query): customers " +
        s"who ordered every one of the ${DIV_BRANDS.size} target " +
        "brands — division spelled as the scalable " +
        "count-distinct-equals-divisor aggregation, never the doubly " +
        "nested NOT EXISTS (which plans a per-row correlated probe). " +
        "The brand filter broadcasts into the fact scan so only target-" +
        "brand rows survive; the (customer, brand) distinct pairs are " +
        "the one shuffle; the HAVING compares against a plan-time " +
        "constant divisor. Output carries the customer's total " +
        "target-brand item count for context.",
      (s, dir) => {
        val target = t(s, dir, "part")
          .filter(col("p_brand").isin(DIV_BRANDS: _*))
          .select("p_partkey", "p_brand")
        val li = t(s, dir, "lineitem").select("l_orderkey", "l_partkey")
          .join(broadcast(target), col("l_partkey") === col("p_partkey"))
        val o = t(s, dir, "orders").select("o_orderkey", "o_custkey")
        li.join(o, col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_custkey"))
          .agg(countDistinct(col("p_brand")).as("n_brands"),
            count(lit(1)).as("n_items"))
          .filter(col("n_brands") === DIV_BRANDS.size)
          .select(col("o_custkey"), col("n_items"))
      },
      Some(s"""
        SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_items
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN orders ON l_orderkey = o_orderkey
        WHERE p_brand IN (${DIV_BRANDS.map("'" + _ + "'").mkString(", ")})
        GROUP BY o_custkey
        HAVING count(DISTINCT p_brand) = ${DIV_BRANDS.size}""")),
    // ----------------------------------------------------------------
    Q(
      "q214_bag_setops",
      "Multiset EXCEPT ALL / INTERSECT ALL — bag semantics the " +
        "distinct set ops (q37/q38) cannot express: per (priority, " +
        "status) multiplicities of two order snapshots (hash-halves " +
        "of orders), where EXCEPT ALL keeps max(0, a - b) copies and " +
        "INTERSECT ALL min(a, b). Spark plans both as counted " +
        "aggregates (generate replicated rows), so the comparison " +
        "rolls the outputs back to (row, multiplicity) — proving the " +
        "multiplicity arithmetic itself, which is where bag and set " +
        "semantics diverge. One shuffle per side on the tiny value " +
        "domain; at any scale the op is count-algebra, never row " +
        "materialization.",
      (s, dir) => {
        val o = t(s, dir, "orders")
          .withColumn("half",
            Portable.pmd5(concat(lit("o:"), col("o_orderkey").cast("string"))) % 2)
          .select(col("half"), col("o_orderpriority"), col("o_orderstatus"))
        val a = o.filter(col("half") === 0).drop("half")
        val b = o.filter(col("half") === 1).drop("half")
        val ex = a.exceptAll(b).groupBy(col("o_orderpriority"),
          col("o_orderstatus")).agg(count(lit(1)).as("mult"))
          .withColumn("op", lit("except_all"))
        val in = a.intersectAll(b).groupBy(col("o_orderpriority"),
          col("o_orderstatus")).agg(count(lit(1)).as("mult"))
          .withColumn("op", lit("intersect_all"))
        ex.unionByName(in)
      },
      Some(s"""
        WITH o AS (
          SELECT ${Portable.pmd5Sql("concat('o:', CAST(o_orderkey AS VARCHAR))")} % 2
                   AS half,
                 o_orderpriority, o_orderstatus
          FROM orders),
        a AS (SELECT o_orderpriority, o_orderstatus FROM o WHERE half = 0),
        b AS (SELECT o_orderpriority, o_orderstatus FROM o WHERE half = 1),
        ex AS (
          SELECT o_orderpriority, o_orderstatus,
                 CAST(count(*) AS BIGINT) AS mult, 'except_all' AS op
          FROM (SELECT * FROM a EXCEPT ALL SELECT * FROM b)
          GROUP BY 1, 2),
        inx AS (
          SELECT o_orderpriority, o_orderstatus,
                 CAST(count(*) AS BIGINT) AS mult, 'intersect_all' AS op
          FROM (SELECT * FROM a INTERSECT ALL SELECT * FROM b)
          GROUP BY 1, 2)
        SELECT * FROM ex UNION ALL SELECT * FROM inx""")),
    // ----------------------------------------------------------------
    Q(
      "q216_grouping_sets",
      "Explicit GROUPING SETS — the arbitrary-subset lattice walk " +
        "between q36's single rollup path and q111's full cube: order " +
        "counts and decimal revenue for exactly ((priority, status), " +
        "(priority), (status)) in ONE grouping-id expand pass (three " +
        "separate aggregations would scan three times). The grouping " +
        "id is computed as grouping(a)*2 + grouping(b) in both engines " +
        "(no reliance on either engine's grouping_id numbering), and " +
        "grouped-out columns sentinel to '(all)' so the cross-engine " +
        "compare never meets an ambiguous NULL (the q36/q111 rule).",
      (s, dir) => {
        t(s, dir, "orders")
          .groupingSets(
            Seq(Seq(col("o_orderpriority"), col("o_orderstatus")),
              Seq(col("o_orderpriority")), Seq(col("o_orderstatus"))),
            col("o_orderpriority"), col("o_orderstatus"))
          .agg(
            (grouping(col("o_orderpriority")) * 2
              + grouping(col("o_orderstatus"))).as("gid"),
            count(lit(1)).as("n_orders"),
            sum(col("o_totalprice").cast(dec12)).cast(DoubleType)
              .as("revenue"))
          .select(
            coalesce(col("o_orderpriority"), lit("(all)")).as("priority"),
            coalesce(col("o_orderstatus"), lit("(all)")).as("status"),
            col("gid"), col("n_orders"), col("revenue"))
      },
      Some("""
        SELECT coalesce(o_orderpriority, '(all)') AS priority,
               coalesce(o_orderstatus, '(all)') AS status,
               CAST(grouping(o_orderpriority) * 2
                 + grouping(o_orderstatus) AS INTEGER) AS gid,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
                 AS revenue
        FROM orders
        GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
                                (o_orderpriority), (o_orderstatus))""")),
    // ----------------------------------------------------------------
    Q(
      "q217_window_frames",
      "Window FRAME semantics made visible (users < 10, per-user event " +
        "order): first_value under the default frame, last_value under " +
        "the DEFAULT frame — which is RANGE UNBOUNDED PRECEDING .. " +
        "CURRENT ROW, so it returns the CURRENT row's value, the " +
        "classic silent bug — last_value under an explicit full frame " +
        "(the true last), and nth_value(3) over the full frame (null " +
        "for users with fewer events — honest, not an error). Both " +
        "engines share these frame defaults; stating all four side by " +
        "side pins that the engine reproduces the standard's " +
        "sometimes-surprising semantics exactly. One user_id shuffle " +
        "serves every window.",
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        val wFull = w.rowsBetween(
          org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.unboundedFollowing)
        t(s, dir, "events")
          .filter(col("user_id") < 10)
          .select(col("user_id"), col("event_id"),
            first(col("event_type")).over(w).as("et_first"),
            last(col("event_type")).over(w).as("et_last_default"),
            last(col("event_type")).over(wFull).as("et_last_full"),
            nth_value(col("event_type"), 3).over(wFull).as("et_third"))
      },
      Some("""
        SELECT user_id, event_id,
               first_value(event_type) OVER w AS et_first,
               last_value(event_type) OVER w AS et_last_default,
               last_value(event_type) OVER
                 (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
                 AS et_last_full,
               nth_value(event_type, 3) OVER
                 (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
                 AS et_third
        FROM events WHERE user_id < 10
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""")),
    // ----------------------------------------------------------------
    Q(
      "q218_schema_drift_union",
      "Schema-evolution union: an old-snapshot half of orders that " +
        "never had o_orderpriority combined with the current half via " +
        "unionByName(allowMissingColumns) — the missing column reads " +
        "as NULL for old rows (never a positional mis-bind, which a " +
        "plain UNION would silently commit on reordered columns), " +
        "then one aggregation over the coalesced value. The " +
        "ingestion-era split is the portable hash (q214's halves); " +
        "'(unknown)' sentinels the evolved column so the compare " +
        "never meets NULL. This is the append-only table-evolution " +
        "story every long-lived warehouse needs: new columns arrive, " +
        "old files stay valid, one name-keyed union serves both.",
      (s, dir) => {
        val o = t(s, dir, "orders")
          .withColumn("half",
            Portable.pmd5(concat(lit("o:"), col("o_orderkey").cast("string"))) % 2)
        val legacy = o.filter(col("half") === 0)
          .select("o_orderkey", "o_orderstatus", "o_totalprice")
        val current = o.filter(col("half") === 1)
          .select("o_orderkey", "o_orderstatus", "o_totalprice",
            "o_orderpriority")
        legacy.unionByName(current, allowMissingColumns = true)
          .groupBy(col("o_orderstatus"),
            coalesce(col("o_orderpriority"), lit("(unknown)")).as("priority"))
          .agg(count(lit(1)).as("n_orders"),
            sum(col("o_totalprice").cast(dec12)).cast(DoubleType)
              .as("revenue"))
      },
      Some(s"""
        WITH o AS (
          SELECT ${Portable.pmd5Sql("concat('o:', CAST(o_orderkey AS VARCHAR))")} % 2
                   AS half, o_orderkey, o_orderstatus, o_totalprice,
                 o_orderpriority
          FROM orders),
        u AS (
          SELECT o_orderstatus, o_totalprice,
                 CAST(NULL AS VARCHAR) AS o_orderpriority
          FROM o WHERE half = 0
          UNION ALL
          SELECT o_orderstatus, o_totalprice, o_orderpriority
          FROM o WHERE half = 1)
        SELECT o_orderstatus,
               coalesce(o_orderpriority, '(unknown)') AS priority,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
                 AS revenue
        FROM u GROUP BY 1, 2""")),
    // ----------------------------------------------------------------
    Q(
      "q219_map_functions",
      "MAP-typed column pipeline: per source, the 5 most frequent " +
        "tokens fold into a map<token, count> (map_from_entries over " +
        "the collected top-k — the k-bounded collect is legal because " +
        "a grouped top-k ran first), the map filters to counts >= " +
        "MAP_MIN via map_filter, and explode(map) unrolls the " +
        "survivors back to rows — exercising the map construct / " +
        "transform / explode family the registry's array-heavy " +
        "pipelines never touch. The heavy lifting is the (source, " +
        "token) count agg; everything map-typed operates on <= 5 " +
        "entries per source. The oracle states the equivalent " +
        "row-level semantics (DuckDB's MAP ordering differs — the " +
        "exploded rows are the engine-neutral form).",
      (s, dir) => {
        val counts = t(s, dir, "documents")
          .select(col("source"),
            explode(split(col("text"), " ")).as("token"))
          .groupBy(col("source"), col("token"))
          .agg(count(lit(1)).as("cnt"))
        val topk = counts
          .withColumn("rk", row_number().over(
            org.apache.spark.sql.expressions.Window.partitionBy(col("source"))
              .orderBy(col("cnt").desc, col("token"))))
          .filter(col("rk") <= 5)
        topk.groupBy(col("source"))
          .agg(map_from_entries(
            collect_list(struct(col("token"), col("cnt")))).as("m"))
          .select(col("source"),
            explode(map_filter(col("m"), (_, v) => v >= MAP_MIN)))
          .select(col("source"), col("key").as("token"),
            col("value").as("cnt"))
      },
      Some(s"""
        SELECT source, token, cnt FROM (
          SELECT source, token, CAST(count(*) AS BIGINT) AS cnt,
                 row_number() OVER (PARTITION BY source
                   ORDER BY count(*) DESC, token) AS rk
          FROM (SELECT source, unnest(string_split(text, ' ')) AS token
                FROM documents)
          GROUP BY source, token)
        WHERE rk <= 5 AND cnt >= $MAP_MIN""")),
    // ----------------------------------------------------------------
    Q(
      "q220_forecast_revenue",
      s"Forecast revenue change (TPC-H Q6 shape) for ${YEAR_LO.take(4)}: " +
        "revenue that would have been earned without discounts in the " +
        "5-7% band on small quantities — the canonical PUSHDOWN " +
        "microbenchmark: three conjunctive predicates and a 1-row " +
        "aggregate, no join at all, so the entire query is a scan " +
        "whose filters must reach the parquet reader (ExplainAudit's " +
        "pushed-filter discipline) and whose aggregation is map-side " +
        "combined to one partial per split. extendedprice * discount " +
        "in exact decimals; discount-band bounds compared in decimal " +
        "so 0.05/0.07 are exact, not float-approximate.",
      (s, dir) => {
        t(s, dir, "lineitem")
          .filter(col("l_shipdate") >= to_timestamp(lit(YEAR_LO)) &&
            col("l_shipdate") < to_timestamp(lit(YEAR_HI)) &&
            col("l_discount").cast(dec4).between(
              lit("0.05").cast(dec4), lit("0.07").cast(dec4)) &&
            col("l_quantity") < 24)
          .agg(count(lit(1)).as("n_items"),
            sum(col("l_extendedprice").cast(dec12)
              * col("l_discount").cast(dec4)).cast(DoubleType)
              .as("revenue_delta"))
      },
      Some(s"""
        SELECT CAST(count(*) AS BIGINT) AS n_items,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                 * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE)
                 AS revenue_delta
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '$YEAR_LO 00:00:00'
          AND l_shipdate < TIMESTAMP '$YEAR_HI 00:00:00'
          AND CAST(l_discount AS DECIMAL(4,2))
                BETWEEN CAST('0.05' AS DECIMAL(4,2))
                    AND CAST('0.07' AS DECIMAL(4,2))
          AND l_quantity < 24""")),
    // ----------------------------------------------------------------
    Q(
      "q221_blocking_supplier",
      "Suppliers who single-handedly held up multi-supplier orders " +
        "(TPC-H Q21 shape, lateness = shipped more than 90 days after " +
        "order date): supplier S is blamed for order O when S shipped " +
        "late into O, O has at least one OTHER supplier, and NO other " +
        "supplier shipped late into O — the double EXISTS / NOT " +
        "EXISTS, DECORRELATED: one (order, supplier) aggregate " +
        "derives each supplier's late flag, one order-level rollup " +
        "counts suppliers and late suppliers, and the blame condition " +
        "becomes a pure filter (late AND n_supp >= 2 AND n_late = 1) " +
        "— no per-row correlated probe anywhere; the oracle states " +
        "the literal EXISTS spelling, so the hash match PROVES the " +
        "decorrelation. Top-10 blamed suppliers by count, " +
        "per-partition heaps.",
      (s, dir) => {
        val li = t(s, dir, "lineitem")
          .join(t(s, dir, "orders")
            .select("o_orderkey", "o_orderdate"),
            col("l_orderkey") === col("o_orderkey"))
          .select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"),
            (col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAY"))
              .as("late"))
        val perSupp = li.groupBy(col("ok"), col("sk"))
          .agg(max(when(col("late"), 1).otherwise(0)).as("supp_late"))
        val perOrder = perSupp.groupBy(col("ok"))
          .agg(count(lit(1)).as("n_supp"),
            sum(col("supp_late")).as("n_late"))
        perSupp
          .join(perOrder, Seq("ok"))
          .filter(col("supp_late") === 1 && col("n_supp") >= 2 &&
            col("n_late") === 1)
          .groupBy(col("sk"))
          .agg(count(lit(1)).as("blocked_orders"))
          .join(broadcast(t(s, dir, "supplier")
            .select(col("s_suppkey"), col("s_name"))),
            col("sk") === col("s_suppkey"))
          .select(col("s_suppkey"), col("s_name"), col("blocked_orders"))
          .orderBy(col("blocked_orders").desc, col("s_suppkey"))
          .limit(10)
      },
      Some("""
        SELECT s_suppkey, s_name,
               CAST(count(DISTINCT l1.l_orderkey) AS BIGINT)
                 AS blocked_orders
        FROM lineitem l1
        JOIN orders o ON l1.l_orderkey = o.o_orderkey
        JOIN supplier ON l1.l_suppkey = s_suppkey
        WHERE l1.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
          AND EXISTS (SELECT 1 FROM lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM lineitem l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
        GROUP BY s_suppkey, s_name
        ORDER BY blocked_orders DESC, s_suppkey LIMIT 10""")),
    // ----------------------------------------------------------------
    Q(
      "q222_important_parts",
      "Parts carrying an outsized share of supplied value (TPC-H Q11 " +
        "shape, supply ledger derived from lineitem): parts whose " +
        "total extended value exceeds SHARE_PPM parts-per-million of " +
        "the corpus total — the HAVING-against-a-global-scalar " +
        "pattern. The global total arrives as a 1-row broadcast and " +
        "the threshold compares by CROSS-MULTIPLY in decimals " +
        "(part_value * 1e6 > total * ppm — exact, no division, the " +
        "q194/q210 rule), so the filter is a projection over the " +
        "per-part aggregate; one partkey shuffle total. Top-20 by " +
        "value under a total order.",
      (s, dir) => {
        val perPart = t(s, dir, "lineitem")
          .select(col("l_partkey"),
            col("l_extendedprice").cast(dec12).as("v"))
          .groupBy(col("l_partkey"))
          .agg(sum(col("v")).as("part_value"))
        val total = perPart.agg(sum(col("part_value")).as("total_value"))
        perPart.join(broadcast(total))
          .filter(col("part_value") * 1000000 >
            col("total_value") * SHARE_PPM)
          .select(col("l_partkey"),
            col("part_value").cast(DoubleType).as("part_value"))
          .orderBy(col("part_value").desc, col("l_partkey"))
          .limit(20)
      },
      Some(s"""
        WITH pp AS (
          SELECT l_partkey,
                 sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS part_value
          FROM lineitem GROUP BY l_partkey),
        t AS (SELECT sum(part_value) AS total_value FROM pp)
        SELECT l_partkey, CAST(part_value AS DOUBLE) AS part_value
        FROM pp, t
        WHERE part_value * 1000000 > total_value * $SHARE_PPM
        ORDER BY part_value DESC, l_partkey LIMIT 20""")),
    // ----------------------------------------------------------------
    Q(
      "q223_excess_suppliers",
      "Suppliers dominating a brand's supply (TPC-H Q20 shape): " +
        "suppliers who shipped over 12% of some Brand#21 part's " +
        "total shipped quantity (5x+ the uniform supplier share — the "
        + "data spreads supply thin, so literal majority never occurs) "
        + "— Q20's nested IN chains decorrelated " +
        "into aggregates: per (part, supplier) quantities, per-part " +
        "totals joined back on the part key, the majority test as an " +
        "exact decimal cross-multiply (2 * supp_qty > part_total), " +
        "and the final supplier list via ONE more aggregation (count " +
        "of dominated parts) instead of DISTINCT-IN. The brand slice " +
        "broadcasts into the fact scan; everything after is keyed on " +
        "partkey then suppkey. Nation enrich broadcasts.",
      (s, dir) => {
        val slice = t(s, dir, "part")
          .filter(col("p_brand") === "Brand#21").select("p_partkey")
        val ps = t(s, dir, "lineitem")
          .select(col("l_partkey"), col("l_suppkey"),
            col("l_quantity").cast(dec12).as("q"))
          .join(broadcast(slice), col("l_partkey") === col("p_partkey"))
          .groupBy(col("p_partkey"), col("l_suppkey"))
          .agg(sum(col("q")).as("supp_qty"))
        val totals = ps.groupBy(col("p_partkey"))
          .agg(sum(col("supp_qty")).as("part_total"))
        ps.join(totals, Seq("p_partkey"))
          .filter(col("supp_qty") * 100 > col("part_total") * 12)
          .groupBy(col("l_suppkey"))
          .agg(count(lit(1)).as("dominated_parts"))
          .join(broadcast(t(s, dir, "supplier")
            .select("s_suppkey", "s_name", "s_nationkey")),
            col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(t(s, dir, "nation")
            .select("n_nationkey", "n_name")),
            col("s_nationkey") === col("n_nationkey"))
          .select(col("s_suppkey"), col("s_name"), col("n_name"),
            col("dominated_parts"))
      },
      Some("""
        WITH ps AS (
          SELECT p_partkey, l_suppkey,
                 sum(CAST(l_quantity AS DECIMAL(12,2))) AS supp_qty
          FROM lineitem JOIN part ON l_partkey = p_partkey
          WHERE p_brand = 'Brand#21'
          GROUP BY p_partkey, l_suppkey),
        t AS (
          SELECT p_partkey, sum(supp_qty) AS part_total
          FROM ps GROUP BY p_partkey)
        SELECT s_suppkey, s_name, n_name,
               CAST(count(*) AS BIGINT) AS dominated_parts
        FROM ps
        JOIN t USING (p_partkey)
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE supp_qty * 100 > part_total * 12
        GROUP BY s_suppkey, s_name, n_name""")),
    // ----------------------------------------------------------------
    Q(
      "q225_dq_audit",
      "Data-quality constraint audit (the Deequ shape): five table " +
        "constraints verified in ONE report — primary-key uniqueness " +
        "(count vs count-distinct), completeness of o_custkey (null " +
        "count), domain membership of o_orderstatus in {O,F,P}, range " +
        "o_totalprice > 0, and referential integrity of o_custkey " +
        "against customer (LEFT ANTI orphan count). The four scan " +
        "constraints fold into a SINGLE map-side-combined aggregate " +
        "pass over orders — adding a constraint adds a conditional " +
        "sum, never a pass — and the FK check is the only join " +
        "(key-only projections on both sides). The two 1-row results " +
        "meet via broadcast and unpivot through stack() into the " +
        "per-constraint report, so nothing is recomputed per row of " +
        "the report. All counts BIGINT; passed is an integer 0/1. " +
        "At 100 TB this is the nightly gate a warehouse runs before " +
        "publishing a partition: one full scan, one key join, " +
        "constant-size output.",
      (s, dir) => {
        val o = t(s, dir, "orders")
        val c = t(s, dir, "customer").select(col("c_custkey"))
        val agg = o.agg(
          count(lit(1)).as("n"),
          countDistinct(col("o_orderkey")).as("nd"),
          sum(when(col("o_custkey").isNull, 1L).otherwise(0L)).as("nullcust"),
          sum(when(!col("o_orderstatus").isin("O", "F", "P"), 1L)
            .otherwise(0L)).as("badstatus"),
          sum(when(col("o_totalprice") <= 0, 1L).otherwise(0L)).as("badprice"))
        val orphans = o.select(col("o_custkey"))
          .join(c, col("o_custkey") === col("c_custkey"), "left_anti")
          .agg(count(lit(1)).as("orphans"))
        agg.crossJoin(broadcast(orphans))
          .selectExpr(
            """stack(5,
              'pk_unique_orderkey', n, n - nd,
              'completeness_custkey', n, nullcust,
              'domain_orderstatus', n, badstatus,
              'range_totalprice_pos', n, badprice,
              'fk_custkey_customer', n, orphans)
              AS (check_name, n_checked, n_violations)""")
          .withColumn("passed",
            when(col("n_violations") === 0, 1L).otherwise(0L))
      },
      Some("""
        WITH a AS (
          SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(count(DISTINCT o_orderkey) AS BIGINT) AS nd,
                 CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)
                      AS BIGINT) AS nullcust,
                 CAST(sum(CASE WHEN o_orderstatus NOT IN ('O','F','P')
                               THEN 1 ELSE 0 END) AS BIGINT) AS badstatus,
                 CAST(sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END)
                      AS BIGINT) AS badprice
          FROM orders),
        f AS (
          SELECT CAST(count(*) AS BIGINT) AS orphans
          FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
          WHERE c.c_custkey IS NULL),
        r AS (
          SELECT 'pk_unique_orderkey' AS check_name, n AS n_checked,
                 n - nd AS n_violations FROM a, f
          UNION ALL SELECT 'completeness_custkey', n, nullcust FROM a, f
          UNION ALL SELECT 'domain_orderstatus', n, badstatus FROM a, f
          UNION ALL SELECT 'range_totalprice_pos', n, badprice FROM a, f
          UNION ALL SELECT 'fk_custkey_customer', n, orphans FROM a, f)
        SELECT check_name, n_checked, n_violations,
               CASE WHEN n_violations = 0 THEN CAST(1 AS BIGINT)
                    ELSE CAST(0 AS BIGINT) END AS passed
        FROM r""")),
    // ----------------------------------------------------------------
    Q(
      "q232_correlated_sample",
      "Correlated (universe) sampling for join-cardinality estimation " +
        "— the AQP/join-synopsis primitive: sample customer AND orders " +
        "with the SAME hash predicate on the JOIN KEY (keep custkey " +
        "iff pmd5(key) mod 20 = 0), so a sampled order's customer is " +
        "in the sample BY CONSTRUCTION and the joined sample is a " +
        "full-fidelity 1/20 universe of the true join — scaling its " +
        "per-segment counts by 20 estimates the full join, where " +
        "INDEPENDENT Bernoulli samples of each side would survive " +
        "jointly at p^2 = 1/400 and estimate from ~25x fewer pairs " +
        "(the variance difference that makes correlated sampling the " +
        "textbook choice for foreign-key joins). The query reports, " +
        "per market segment, the sampled join count, the x20 " +
        "estimate, the exact count, and the signed error in basis " +
        "points — an accuracy DATASHEET the optimizer's cost model " +
        "can read. SCALE SHAPE: the sampling predicate is a codegen'd " +
        "hash filter evaluated scan-side on EACH table independently " +
        "(no coordination, no pre-join, pushes below the exchange), " +
        "so the synopsis build reads 100 TB but shuffles 5% of it; " +
        "the exact branch exists only because the oracle must " +
        "adjudicate the estimate at test scale.",
      (s, dir) => {
        val keep = (c: org.apache.spark.sql.Column) =>
          Portable.pmd5(c.cast(StringType)) % 20 === 0
        val cS = t(s, dir, "customer").where(keep(col("c_custkey")))
          .select(col("c_custkey"), col("c_mktsegment"))
        val oS = t(s, dir, "orders").where(keep(col("o_custkey")))
          .select(col("o_custkey"))
        val est = cS.join(oS, col("c_custkey") === col("o_custkey"))
          .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("sample_cnt"))
          .withColumn("est_cnt", col("sample_cnt") * 20)
        val exact = t(s, dir, "customer")
          .select(col("c_custkey"), col("c_mktsegment"))
          .join(t(s, dir, "orders").select(col("o_custkey")),
            col("c_custkey") === col("o_custkey"))
          .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("exact_cnt"))
        est.join(exact, Seq("c_mktsegment"))
          .select(col("c_mktsegment"), col("sample_cnt"), col("est_cnt"),
            col("exact_cnt"),
            expr("(est_cnt - exact_cnt) * 10000 div exact_cnt").as("err_bp"))
      },
      Some(s"""
        WITH cs AS (
          SELECT c_custkey, c_mktsegment FROM customer
          WHERE ${Portable.pmd5Sql("CAST(c_custkey AS VARCHAR)")} % 20 = 0),
        os AS (
          SELECT o_custkey FROM orders
          WHERE ${Portable.pmd5Sql("CAST(o_custkey AS VARCHAR)")} % 20 = 0),
        est AS (
          SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS sample_cnt,
                 CAST(count(*) * 20 AS BIGINT) AS est_cnt
          FROM cs JOIN os ON c_custkey = o_custkey
          GROUP BY c_mktsegment),
        exact AS (
          SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS exact_cnt
          FROM customer JOIN orders ON c_custkey = o_custkey
          GROUP BY c_mktsegment)
        SELECT est.c_mktsegment, sample_cnt, est_cnt, exact_cnt,
               (est_cnt - exact_cnt) * 10000 // exact_cnt AS err_bp
        FROM est JOIN exact ON est.c_mktsegment = exact.c_mktsegment"""))
  )
}
