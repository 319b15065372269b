package graft.operators

import graft.SparkSpec

/** [[Buckets.equiDepth]]'s contract, from first principles on random
  * weighted data: ids monotone in the value (so strict bucket order
  * implies strict value order — what every pair decomposition relies
  * on), light buckets mass-bounded below 2*occ, heavy values alone in
  * their bucket, and the light flag exactly the tie-mass predicate.
  * These are the properties that make the q253/q254 intra-bucket
  * self-joins skew-proof; a regression here is a silent O(m^2). */
class BucketsSpec extends SparkSpec {
  import spark.implicits._

  private val OCC = 10L

  // two groups; values with a planted mega-tie (mass 100 >= occ), a
  // boundary-mass tie (exactly occ), and a spread of light values
  private def corpus: Seq[(String, Long)] = {
    val rnd = new scala.util.Random(7)
    val light = (1 to 120).map(_ => ("a", rnd.nextInt(40).toLong))
    val heavy = Seq.fill(100)(("a", 17L))
    val boundary = Seq.fill(10)(("a", 23L))
    val other = (1 to 60).map(i => ("b", (i % 12).toLong * 3))
    light ++ heavy ++ boundary ++ other
  }

  test("monotone ids, bounded light buckets, heavy singletons, exact light flag") {
    val rows = corpus
    val got = Buckets.equiDepth(rows.toDF("g", "v"), Seq("g"), "v", OCC)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    val mass = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap

    // one output row per distinct (g, v)
    assert(got.map(t => (t._1, t._2)).distinct.length == got.length)
    assert(got.map(t => (t._1, t._2)).toSet == rows.distinct.toSet)

    for ((g, members) <- got.groupBy(_._1)) {
      val byV = members.sortBy(_._2)
      // monotone non-decreasing in v; distinct buckets => strict order
      assert(byV.map(_._3).sliding(2).forall(p => p.length < 2 || p(0) <= p(1)),
        s"bucket ids not monotone in $g")
      for ((bkt, bm) <- members.groupBy(_._3)) {
        val totalMass = bm.map(t => mass((t._1, t._2))).sum
        val anyHeavy = bm.exists(t => mass((t._1, t._2)) >= OCC)
        if (anyHeavy)
          assert(bm.length == 1,
            s"heavy value in $g shares bucket $bkt with ${bm.length - 1} others")
        else
          assert(totalMass < 2 * OCC,
            s"light bucket $bkt in $g carries mass $totalMass >= ${2 * OCC}")
      }
      // light flag == (tie mass < occ), including the boundary mass
      assert(members.forall(t => t._4 == (mass((t._1, t._2)) < OCC)),
        s"light flag diverged from the tie-mass predicate in $g")
    }
    // the planted ties actually exercise both branches
    assert(got.exists(t => t._1 == "a" && t._2 == 17L && !t._4),
      "mega-tie must be heavy")
    assert(got.exists(t => t._1 == "a" && t._2 == 23L && !t._4),
      "boundary mass == occ must count as heavy")
  }

  test("weighted form: a pre-aggregated count column gives the same ids as raw rows") {
    val rows = corpus
    val raw = Buckets.equiDepth(rows.toDF("g", "v"), Seq("g"), "v", OCC)
      .collect().map(r => (r.getString(0), r.getLong(1))
        -> (r.getLong(2), r.getBoolean(3))).toMap
    val pre = rows.groupBy(identity).map { case ((g, v), rs) => (g, v, rs.size.toLong) }
      .toSeq
    val weighted = Buckets.equiDepth(pre.toDF("g", "v", "cnt"), Seq("g"), "v",
        OCC, weightCol = Some("cnt"))
      .collect().map(r => (r.getString(0), r.getLong(1))
        -> (r.getLong(2), r.getBoolean(3))).toMap
    assert(weighted == raw, "weighted and row-multiplicity forms diverged")
  }
}
