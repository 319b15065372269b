package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.queries.Tables.t

/** Multiway star-schema analytics (q186+), TPC-H Q3/Q5/Q10-shaped:
  * the fact-to-fact + dimension-chain join plans a warehouse workload
  * is built from. The Spark designs follow the 100 TB join hierarchy:
  * fact-fact joins shuffle on their key (custkey / orderkey /
  * suppkey), dimension chains (nation, region) broadcast, selective
  * filters run before any exchange so only surviving keys shuffle.
  * Money arithmetic is decimal-exact end to end (q01's idiom), cast
  * to double only at output.
  */
object StarQueries {

  private val dec12 = DecimalType(12, 2)
  private val dec4 = DecimalType(4, 2)
  private def one = lit(1).cast(DecimalType(3, 2))

  /** q186: the "today" pivot — orders strictly before, shipments
    * strictly after (TPC-H Q3's urgent-backlog shape). */
  private val PIVOT = "1998-01-01"

  /** q187: revenue year window. */
  private val YEAR_LO = "1996-01-01"
  private val YEAR_HI = "1997-01-01"

  val all: Seq[Q] = Seq(
    // ----------------------------------------------------------------
    Q(
      "q186_shipping_priority",
      "Unshipped-order revenue ranking (TPC-H Q3 shape): BUILDING-" +
        s"segment orders placed before $PIVOT whose items ship after " +
        "it, ranked by outstanding discounted revenue, top 10. Plan " +
        "hierarchy: the segment filter prunes customer BEFORE its " +
        "shuffle (only matching custkeys move), lineitem's ship-date " +
        "filter runs at the scan, and the two fact joins shuffle on " +
        "custkey then orderkey — at warehouse scale both sides of " +
        "each join are key-partitioned facts, so no broadcast is " +
        "assumed. Decimal-exact revenue; the global top-10 is " +
        "TakeOrderedAndProject (per-partition heaps), never a full " +
        "sort.",
      (s, dir) => {
        val c = t(s, dir, "customer")
          .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
        val o = t(s, dir, "orders")
          .filter(col("o_orderdate") < to_timestamp(lit(PIVOT)))
          .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
        val l = t(s, dir, "lineitem")
          .filter(col("l_shipdate") > to_timestamp(lit(PIVOT)))
          .select(col("l_orderkey"),
            (col("l_extendedprice").cast(dec12)
              * (one - col("l_discount").cast(dec4))).as("rev"))
        c.join(o, col("c_custkey") === col("o_custkey"))
          .join(l, col("o_orderkey") === col("l_orderkey"))
          .groupBy(col("l_orderkey"), to_date(col("o_orderdate")).as("o_date"),
            col("o_orderpriority"))
          .agg(sum(col("rev")).cast(DoubleType).as("revenue"))
          .orderBy(col("revenue").desc, col("l_orderkey"))
          .limit(10)
      },
      Some(s"""
        SELECT l_orderkey, CAST(o_orderdate AS DATE) AS o_date,
               o_orderpriority,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                 * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2))))
                 AS DOUBLE) AS revenue
        FROM customer, orders, lineitem
        WHERE c_mktsegment = 'BUILDING'
          AND c_custkey = o_custkey AND l_orderkey = o_orderkey
          AND o_orderdate < TIMESTAMP '$PIVOT 00:00:00'
          AND l_shipdate > TIMESTAMP '$PIVOT 00:00:00'
        GROUP BY l_orderkey, CAST(o_orderdate AS DATE), o_orderpriority
        ORDER BY revenue DESC, l_orderkey LIMIT 10""")),
    // ----------------------------------------------------------------
    Q(
      "q187_regional_volume",
      "Local-supplier volume per nation (TPC-H Q5 shape): revenue " +
        s"from ${YEAR_LO.take(4)} orders where customer and supplier " +
        "share a nation, for ASIA nations — the 6-table chain " +
        "(region-nation-customer-orders-lineitem-supplier) with a " +
        "cross-fact equality (c_nationkey = s_nationkey). Plan: " +
        "lineitem joins supplier on suppkey and orders on orderkey " +
        "(fact shuffles), customer arrives keyed on custkey, and the " +
        "nation/region chain — a few dozen rows at ANY scale — " +
        "broadcasts to both fact sides; the region filter prunes " +
        "nations before the broadcast. One decimal agg on a " +
        "nations-row key space.",
      (s, dir) => {
        val asia = t(s, dir, "nation")
          .join(t(s, dir, "region").filter(col("r_name") === "ASIA"),
            col("n_regionkey") === col("r_regionkey"))
          .select("n_nationkey", "n_name")
        val o = t(s, dir, "orders")
          .filter(col("o_orderdate") >= to_timestamp(lit(YEAR_LO)) &&
            col("o_orderdate") < to_timestamp(lit(YEAR_HI)))
          .select("o_orderkey", "o_custkey")
        val li = t(s, dir, "lineitem").select(col("l_orderkey"),
          col("l_suppkey"),
          (col("l_extendedprice").cast(dec12)
            * (one - col("l_discount").cast(dec4))).as("rev"))
        val sup = t(s, dir, "supplier").select("s_suppkey", "s_nationkey")
        val cust = t(s, dir, "customer").select("c_custkey", "c_nationkey")
        li.join(sup, col("l_suppkey") === col("s_suppkey"))
          .join(o, col("l_orderkey") === col("o_orderkey"))
          .join(cust, col("o_custkey") === col("c_custkey"))
          .filter(col("c_nationkey") === col("s_nationkey"))
          .join(broadcast(asia), col("s_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name"))
          .agg(sum(col("rev")).cast(DoubleType).as("revenue"))
      },
      Some(s"""
        SELECT n_name,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                 * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2))))
                 AS DOUBLE) AS revenue
        FROM customer, orders, lineitem, supplier, nation, region
        WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
          AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
          AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
          AND r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '$YEAR_LO 00:00:00'
          AND o_orderdate < TIMESTAMP '$YEAR_HI 00:00:00'
        GROUP BY n_name""")),
    // ----------------------------------------------------------------
    Q(
      "q188_returned_revenue",
      "Top customers by returned-item revenue (TPC-H Q10 shape): one " +
        s"quarter of ${YEAR_LO.take(4)} orders, items flagged 'R', " +
        "revenue per customer with their nation name, top 20. The " +
        "return-flag and date filters run at the scans; facts join on " +
        "orderkey then custkey; nation broadcasts. The top-20 rides " +
        "per-partition heaps under the (revenue desc, custkey) total " +
        "order.",
      (s, dir) => {
        val o = t(s, dir, "orders")
          .filter(col("o_orderdate") >= to_timestamp(lit(YEAR_LO)) &&
            col("o_orderdate") < to_timestamp(lit("1996-04-01")))
          .select("o_orderkey", "o_custkey")
        val li = t(s, dir, "lineitem")
          .filter(col("l_returnflag") === "R")
          .select(col("l_orderkey"),
            (col("l_extendedprice").cast(dec12)
              * (one - col("l_discount").cast(dec4))).as("rev"))
        val cust = t(s, dir, "customer")
          .select("c_custkey", "c_name", "c_nationkey")
        val nat = t(s, dir, "nation").select("n_nationkey", "n_name")
        li.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(cust, col("o_custkey") === col("c_custkey"))
          .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
          .agg(count(lit(1)).as("n_items"),
            sum(col("rev")).cast(DoubleType).as("revenue"))
          .orderBy(col("revenue").desc, col("c_custkey"))
          .limit(20)
      },
      Some(s"""
        SELECT c_custkey, c_name, n_name,
               CAST(count(*) AS BIGINT) AS n_items,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                 * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2))))
                 AS DOUBLE) AS revenue
        FROM customer, orders, lineitem, nation
        WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
          AND l_returnflag = 'R' AND c_nationkey = n_nationkey
          AND o_orderdate >= TIMESTAMP '$YEAR_LO 00:00:00'
          AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
        GROUP BY c_custkey, c_name, n_name
        ORDER BY revenue DESC, c_custkey LIMIT 20""")),
    // ----------------------------------------------------------------
    Q(
      "q243_product_profit",
      "Product-line profit by supplier nation and order year (TPC-H " +
        "Q9 shape — the last classic multi-join aggregation the " +
        "registry lacked; its sibling shapes Q2/Q7/Q8/Q15/Q16/Q17/" +
        "Q19/Q20/Q21/Q22 are q191/q199/q200/q208/q209/q210/q198/q223/" +
        "q221/q194): profit from 'gear' parts = discounted revenue " +
        "minus supply cost, where cost substitutes 10% of " +
        "p_retailprice per unit since the testdata carries no " +
        "partsupp ledger (same substitution q191 documents). Plan " +
        "hierarchy: the name-sliced part table broadcasts into the " +
        "lineitem scan FIRST (only gear rows survive to any " +
        "exchange), the orders join shuffles on orderkey (fact-fact), " +
        "supplier arrives keyed on suppkey and the nation name " +
        "broadcasts last onto the already-aggregated frame's keys. " +
        "Money stays decimal-exact through the revenue-minus-cost " +
        "subtraction (scales 4 and 6 align exactly — no float enters " +
        "the sum) and leaves through the house single EXACT_CAST to " +
        "double, spelled identically in the oracle.",
      (s, dir) => {
        val gear = t(s, dir, "part")
          .filter(col("p_name").like("%gear%"))
          .select(col("p_partkey"),
            col("p_retailprice").cast(dec12).as("retail"))
        val li = t(s, dir, "lineitem").select(col("l_orderkey"),
          col("l_partkey"), col("l_suppkey"),
          col("l_quantity").cast(dec12).as("qty"),
          (col("l_extendedprice").cast(dec12)
            * (one - col("l_discount").cast(dec4))).as("rev"))
        val o = t(s, dir, "orders")
          .select(col("o_orderkey"), year(col("o_orderdate"))
            .cast(LongType).as("o_year"))
        val sup = t(s, dir, "supplier").select("s_suppkey", "s_nationkey")
        val nat = t(s, dir, "nation").select("n_nationkey", "n_name")
        li.join(broadcast(gear), col("l_partkey") === col("p_partkey"))
          .join(o, col("l_orderkey") === col("o_orderkey"))
          .join(sup, col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name"), col("o_year"))
          .agg(sum(col("rev")
            - col("qty") * col("retail") * lit("0.10").cast(DecimalType(3, 2)))
            .cast(DoubleType).as("profit"))
      },
      Some("""
        SELECT n_name, CAST(year(o_orderdate) AS BIGINT) AS o_year,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                     * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))
                   - CAST(l_quantity AS DECIMAL(12,2))
                     * CAST(p_retailprice AS DECIMAL(12,2))
                     * CAST('0.10' AS DECIMAL(3,2))) AS DOUBLE) AS profit
        FROM lineitem, part, orders, supplier, nation
        WHERE l_partkey = p_partkey AND l_orderkey = o_orderkey
          AND l_suppkey = s_suppkey AND s_nationkey = n_nationkey
          AND p_name LIKE '%gear%'
        GROUP BY n_name, year(o_orderdate)""")),
    // ----------------------------------------------------------------
    Q(
      "q244_delay_classes",
      "Priority mix by shipping-delay class (TPC-H Q12 shape — with " +
        "the mode column DERIVED: the testdata carries no l_shipmode/" +
        "l_commitdate/l_receiptdate, so the class comes from the " +
        "order-to-ship delay, preserving Q12's essence — an order-" +
        "lineitem join, a ship-date year window, and CASE-conditional " +
        "counts splitting critical priorities (1-URGENT/2-HIGH) from " +
        "the rest per class): items shipped in 1996 bucket as " +
        "PREBOOKED (<0 days — the synthetic generator draws dates " +
        "independently), FAST (<30), NORMAL (<180) or SLOW (180+). " +
        "Plan: the ship-year filter runs at the lineitem scan, the " +
        "orderkey join is the only fact shuffle (each side projected " +
        "to key + one column first), the CASE counts are map-side-" +
        "combined conditional sums onto a 4-row frame — adding a " +
        "priority split adds a sum, never a pass. All counts BIGINT.",
      (s, dir) => {
        val li = t(s, dir, "lineitem")
          .filter(col("l_shipdate") >= to_timestamp(lit(YEAR_LO)) &&
            col("l_shipdate") < to_timestamp(lit(YEAR_HI)))
          .select(col("l_orderkey"), col("l_shipdate"))
        val o = t(s, dir, "orders")
          .select("o_orderkey", "o_orderdate", "o_orderpriority")
        val d = datediff(col("l_shipdate"), col("o_orderdate"))
        li.join(o, col("l_orderkey") === col("o_orderkey"))
          .select(
            when(d < 0, "PREBOOKED").when(d < 30, "FAST")
              .when(d < 180, "NORMAL").otherwise("SLOW").as("delay_class"),
            col("o_orderpriority"))
          .groupBy(col("delay_class"))
          .agg(
            sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
              .otherwise(0L)).as("high_line_count"),
            sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L)
              .otherwise(1L)).as("low_line_count"))
      },
      Some(s"""
        SELECT CASE WHEN datediff('day', CAST(o_orderdate AS DATE),
                                  CAST(l_shipdate AS DATE)) < 0 THEN 'PREBOOKED'
                    WHEN datediff('day', CAST(o_orderdate AS DATE),
                                  CAST(l_shipdate AS DATE)) < 30 THEN 'FAST'
                    WHEN datediff('day', CAST(o_orderdate AS DATE),
                                  CAST(l_shipdate AS DATE)) < 180 THEN 'NORMAL'
                    ELSE 'SLOW' END AS delay_class,
               CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate >= TIMESTAMP '$YEAR_LO 00:00:00'
          AND l_shipdate < TIMESTAMP '$YEAR_HI 00:00:00'
        GROUP BY 1"""))
  )
}
