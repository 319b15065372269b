package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.Portable

/** Exact-completeness of the prefix-filtering set-similarity join on
  * an adversarial TEMPLATE-HEAVY corpus — the density regime q59's
  * doc-string claims (many docs sharing most vocabulary with shuffled
  * word order, the case shingle-LSH passes over), checked at a SECOND
  * rational threshold (3/4) against a brute-force ground truth, with
  * pairs engineered on both sides of — and exactly AT — the
  * threshold. */
class PrefixSsjoinSpec extends SparkSpec {

  // deterministic hash-driven "randomness"
  private def h(s: String): Long = Portable.pmd5Local(s)

  /** 45 docs from 3 templates of 40 distinct words each: doc i uses
    * template i%3, hash-permutes word order, and replaces k in {0..3}
    * template words with doc-unique noise — same-template Jaccards
    * land in [0.70, 1.0], straddling the 3/4 threshold (k1+k2 >= 5
    * falls below it; <= 4 stays at or above). ~1/3 of ALL pairs are
    * same-template: the adversarial density q59 documents. */
  private def corpus: Seq[(Long, String)] = {
    val templates = (0 until 3).map(t => (0 until 40).map(i => s"w${t}_$i"))
    val docs = (0 until 45).map { i =>
      val tpl = templates(i % 3)
      val k = (h(s"k$i") % 4).toInt
      // replace the k hash-chosen distinct positions, then permute
      val dropped = (0 until 40).sortBy(p => h(s"d$i,$p")).take(k).toSet
      val words = tpl.zipWithIndex.map { case (w, p) =>
        if (dropped(p)) s"n${i}_$p" else w
      }
      (i.toLong, words.sortBy(w => h(s"o$i:$w")).mkString(" "))
    }
    // two extra docs with Jaccard EXACTLY 3/4: 36 shared + 6 unique
    // each -> I=36, U=48; completeness at >= must include them
    val shared = (0 until 36).map(i => s"s$i")
    val ea = (100L, (shared ++ (0 until 6).map(i => s"ea$i")).sortBy(w => h(s"oa$w")).mkString(" "))
    val eb = (101L, (shared ++ (0 until 6).map(i => s"eb$i")).sortBy(w => h(s"ob$w")).mkString(" "))
    docs :+ ea :+ eb
  }

  test("prefix ssjoin == brute force on a template-heavy corpus at threshold 3/4") {
    import spark.implicits._
    val rows = corpus
    val df = rows.toDF("doc_id", "text")
    val got = Dedup.prefixFilterPairs(df, "text", "doc_id", tNum = 3, tDen = 4)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    spark.catalog.clearCache()

    // ground truth: all-pairs exact rational Jaccard (I * 4 >= U * 3)
    val sets = rows.map { case (id, text) => id -> text.split(" ").toSet }
    val want = (for {
      (ia, sa) <- sets; (ib, sb) <- sets if ia < ib
      i = (sa & sb).size; u = sa.size + sb.size - i
      if i * 4 >= u * 3
    } yield (ia, ib)).toSet

    assert(want.exists { case (a, b) => a < 45 && b < 45 },
      "generator sanity: some same-template pairs must clear 3/4")
    val belowThreshold = (for {
      (ia, sa) <- sets; (ib, sb) <- sets
      if ia < ib && ib < 45 && ia % 3 == ib % 3 && !want((ia, ib))
    } yield (ia, ib))
    assert(belowThreshold.nonEmpty,
      "generator sanity: some same-template pairs must fall below 3/4")
    assert(rows.exists(_._2.split(" ").exists(_.startsWith("n"))),
      "generator sanity: noise replacement must occur")
    assert(want.contains((100L, 101L)), "generator sanity: the exact-3/4 pair")
    assert(got == want,
      s"prefix ssjoin must be exact-complete: missed ${want -- got}, spurious ${got -- want}")
  }
}
