package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("backward as-of: latest at-or-before match, inclusive, per key") {
    val events = Seq(
      (1L, 10L, ts("2024-01-01 09:00:00")), // before any order -> null
      (2L, 10L, ts("2024-01-01 10:00:00")), // == order time -> inclusive match
      (3L, 10L, ts("2024-01-01 12:00:00")), // after both -> latest
      (4L, 20L, ts("2024-01-01 12:00:00"))  // other key, no orders -> null
    ).toDF("event_id", "user_id", "ts")
    val orders = Seq(
      (100L, 10L, ts("2024-01-01 10:00:00")),
      (101L, 10L, ts("2024-01-01 11:00:00")),
      (999L, 30L, ts("2024-01-01 00:00:00")) // unrelated key
    ).toDF("o_orderkey", "o_custkey", "o_orderdate")

    val out = AsOfJoin.backward(events, "user_id", "ts",
      orders, "o_custkey", "o_orderdate", "o_orderkey")
      .select("event_id", "asof_o_orderkey")
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap
    assert(out == Map(1L -> -1L, 2L -> 100L, 3L -> 101L, 4L -> -1L))
  }

  test("null payload on the newest right row is carried, not skipped") {
    val events = Seq((1L, 10L, ts("2024-01-01 12:00:00"))).toDF("event_id", "user_id", "ts")
    val orders = Seq(
      (Some(100L), 10L, ts("2024-01-01 10:00:00")),
      (None: Option[Long], 10L, ts("2024-01-01 11:00:00")) // newest, null payload
    ).toDF("o_orderkey", "o_custkey", "o_orderdate")
    val out = AsOfJoin.backward(events, "user_id", "ts",
      orders, "o_custkey", "o_orderdate", "o_orderkey").collect()
    // the match is the 11:00 row — its null payload must surface, not 100
    assert(out.head.isNullAt(out.head.fieldIndex("asof_o_orderkey")))
  }

  test("randomized cross-check against a brute-force reference (seed 42)") {
    val rnd = new scala.util.Random(42)
    val base = ts("2024-01-01 00:00:00").getTime
    val events = (0 until 200).map { i =>
      (i.toLong, rnd.nextInt(5).toLong, new Timestamp(base + rnd.nextInt(1000000) * 1000L))
    }
    val orders = (0 until 100).map { i =>
      (1000L + i, rnd.nextInt(6).toLong, new Timestamp(base + rnd.nextInt(1000000) * 1000L))
    }
    // brute force: per event, max (time, payload) among at-or-before rows
    val expected = events.map { case (eid, k, t) =>
      val matches = orders.filter(o => o._2 == k && !o._3.after(t))
      eid -> (if (matches.isEmpty) None
              else Some(matches.maxBy(o => (o._3.getTime, o._1))._1))
    }.toMap

    val out = AsOfJoin.backward(
      events.toDF("event_id", "user_id", "ts"), "user_id", "ts",
      orders.toDF("o_orderkey", "o_custkey", "o_orderdate"),
      "o_custkey", "o_orderdate", "o_orderkey")
      .collect().map { r =>
        r.getAs[Long]("event_id") ->
          (if (r.isNullAt(r.fieldIndex("asof_o_orderkey"))) None
           else Some(r.getAs[Long]("asof_o_orderkey")))
      }.toMap
    assert(out.size == 200)
    expected.foreach { case (eid, exp) =>
      assert(out(eid) == exp, s"event $eid: got ${out(eid)}, expected $exp")
    }
  }

  test("tie at equal right times: max payload wins (deterministic)") {
    val events = Seq((1L, 10L, ts("2024-01-02 00:00:00"))).toDF("event_id", "user_id", "ts")
    val orders = Seq(
      (7L, 10L, ts("2024-01-01 10:00:00")),
      (9L, 10L, ts("2024-01-01 10:00:00")),
      (8L, 10L, ts("2024-01-01 10:00:00"))
    ).toDF("o_orderkey", "o_custkey", "o_orderdate")
    val out = AsOfJoin.backward(events, "user_id", "ts",
      orders, "o_custkey", "o_orderdate", "o_orderkey").collect()
    assert(out.head.getAs[Long]("asof_o_orderkey") == 9L)
  }
}
