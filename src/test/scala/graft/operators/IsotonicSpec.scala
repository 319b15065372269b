package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Minimax isotonic fit vs the classical sequential pool-adjacent-
  * violators stack, on exact rationals: the two are provably the same
  * function — this spec pins the operator's relational spelling to a
  * from-first-principles BigInt PAVA, including tie pools, negative
  * y-sums, and weighted levels. */
class IsotonicSpec extends SparkSpec {
  import spark.implicits._

  /** Sequential PAVA: scan levels in order, push (w, y) pools, merge
    * backwards while the new pool's mean is <= its predecessor's
    * (exact cross-multiplied compare). Returns per level the pool
    * mean as an unreduced rational plus the pool index. */
  private def pavaRef(levels: Seq[(Long, Long)]): Seq[((BigInt, BigInt), Int)] = {
    case class Pool(w: BigInt, y: BigInt, span: Int)
    val stack = scala.collection.mutable.ArrayBuffer.empty[Pool]
    for ((w, y) <- levels) {
      var cur = Pool(BigInt(w), BigInt(y), 1)
      // violation: cur.mean <= prev.mean  <=>  cur.y*prev.w <= prev.y*cur.w
      while (stack.nonEmpty &&
          cur.y * stack.last.w <= stack.last.y * cur.w) {
        val p = stack.remove(stack.size - 1)
        cur = Pool(p.w + cur.w, p.y + cur.y, p.span + cur.span)
      }
      stack += cur
    }
    stack.toSeq.zipWithIndex.flatMap { case (p, pi) =>
      Seq.fill(p.span)(((p.y, p.w), pi + 1))
    }
  }

  private def run(rows: Seq[(String, Long, Long, Long)])
      : Map[(String, Long), ((BigInt, BigInt), Long)] =
    Isotonic.fitLevels(rows.toDF("g", "lvl", "w", "y"), "g", "lvl", "w", "y")
      .select(col("g"), col("lvl"), col("fn"), col("fd"), col("pool"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((BigInt(r.getLong(2)), BigInt(r.getLong(3))), r.getLong(4)))
      .toMap

  private def check(rows: Seq[(String, Long, Long, Long)]): Unit = {
    val got = run(rows)
    for ((g, rs) <- rows.groupBy(_._1)) {
      val sorted = rs.sortBy(_._2)
      val ref = pavaRef(sorted.map(r => (r._3, r._4)))
      for (((lvlRow, ((ry, rw), rpool)), idx) <- sorted.zip(ref).zipWithIndex) {
        val ((gn, gd), gpool) = got((g, lvlRow._2))
        // compare VALUES (gn/gd == ry/rw), not representatives
        assert(gn * rw == ry * gd,
          s"$g lvl ${lvlRow._2} (#$idx): got $gn/$gd, PAVA says $ry/$rw")
        assert(gpool == rpool,
          s"$g lvl ${lvlRow._2}: pool $gpool, PAVA says $rpool")
      }
    }
  }

  test("already-monotone data is untouched; each level its own pool") {
    check((1L to 8L).map(i => ("m", i, 2L, i * 10)))
  }

  test("strictly decreasing data collapses to one global-average pool") {
    val rows = (1L to 7L).map(i => ("dec", i, 1L, 100 - i * 10))
    check(rows)
    val pools = run(rows).values.map(_._2).toSet
    assert(pools == Set(1L), s"expected a single pool: $pools")
  }

  test("== sequential PAVA on random weighted multi-group data with ties and negatives") {
    val rnd = new scala.util.Random(7)
    val rows = for {
      g <- Seq("a", "b", "c")
      lvl <- 1L to 20L
    } yield (g, lvl, (1 + rnd.nextInt(5)).toLong,
      (rnd.nextInt(40) - 10).toLong * (1 + rnd.nextInt(3)))
    check(rows)
  }

  test("single level and two-level violation edge cases") {
    check(Seq(("one", 5L, 3L, 42L)))
    check(Seq(("two", 1L, 1L, 10L), ("two", 2L, 3L, 3L)))
  }
}
