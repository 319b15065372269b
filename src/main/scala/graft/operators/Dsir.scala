package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StringType}

import graft.functions.Portable

/** DSIR-style importance weighting over hashed n-gram features
  * (Xie et al., "Data Selection for Language Models via Importance
  * Resampling", NeurIPS 2023 — public paper): score every raw-corpus
  * document by how much more likely its hashed unigram+bigram feature
  * stream is under the TARGET distribution (the high-quality reference
  * corpus) than under the RAW distribution — the standard data-selection
  * signal for pretraining mixtures (sample keep-probability rides the
  * weight; the resampling mechanics themselves are q83/q136's operators).
  *
  * Exactness contract: per-feature log-importance is the SIGNED
  * floor(log2) of an integer ratio —
  *
  *   p_t(b) / p_r(b) = ((ct+1) * (Tr+B)) / ((cr+1) * (Tt+B))
  *
  * with Laplace-smoothed bucket counts ct/cr, totals Tt/Tr and B hash
  * buckets, so both engines state it with NO floats anywhere (the q262
  * rule): for a ratio num/den of positive BIGINTs,
  *
  *   floor(log2(num/den)) = bitlength(num div den) - 1        if num >= den
  *                        = -m        if den = num * 2^m exactly
  *                        = -(m+1)    otherwise, m = bitlength(den div num) - 1
  *
  * (2^k <= num/den iff the integer 2^k <= floor(num/den), so the
  * positive branch is the bitlength of the integer quotient; the
  * negative branch is -ceil(log2(den/num)), which the exact-power test
  * `den % num = 0 AND quotient & (quotient-1) = 0` splits.) DsirSpec
  * property-checks the identity against BigInt arithmetic.
  *
  * Derived validity bound: the products stay inside BIGINT while
  * (max(Tt,Tr)+1) * (max(Tt,Tr)+B) < 2^63, i.e. total feature
  * instances per side <= ~3.0e9 (a ~15 GB text corpus per side at
  * ~5 bytes/feature). Past that, the identical statement runs in
  * DECIMAL(38,0) — products reach 1e38 headroom (totals ~1e18), and
  * both quotients still fit BIGINT for the bitlength step because
  * target features are a subset of raw features here (cr >= ct bounds
  * num div den by (Tr+B)/B, and den div num by Tr+1) — documented
  * rather than defaulted because every harness corpus is ~12 orders of
  * magnitude below the BIGINT bound.
  *
  * SCALE SHAPE: text is exploded ONCE into hashed feature instances —
  * an 8-byte bucket id travels, never the token; bucket counts are
  * B-bounded keyed aggregations (map-side partial combine does almost
  * all the work — B=1024 distinct keys); totals are one-row frames; the
  * per-bucket weight table is <= B rows and BROADCASTS to the scoring
  * join; the per-document weight is one keyed aggregation. Nothing
  * shuffles at corpus width except (id, bucket) pairs.
  */
object Dsir {

  /** Default hash-bucket count (the paper's feature hashing; power of
    * two so the `% B` spelling is uniform across engines). */
  val DefaultBuckets = 1024

  /** Spark SQL fragment: signed floor(log2(num/den)) for positive
    * BIGINT fragments `num`, `den` — pure integer arithmetic (bin()
    * bitlength, div, %, &). */
  def flog2Sql(num: String, den: String): String =
    s"""CAST(CASE
        WHEN ($num) >= ($den) THEN length(bin(($num) div ($den))) - 1
        WHEN ($den) % ($num) = 0
             AND ((($den) div ($num)) & ((($den) div ($num)) - 1)) = 0
          THEN 1 - length(bin(($den) div ($num)))
        ELSE -length(bin(($den) div ($num)))
        END AS BIGINT)"""

  /** DuckDB twin of [[flog2Sql]] — printf('%b') bitlength, `//` div. */
  def flog2DuckSql(num: String, den: String): String =
    s"""CAST(CASE
        WHEN ($num) >= ($den) THEN length(printf('%b', ($num) // ($den))) - 1
        WHEN ($den) % ($num) = 0
             AND ((($den) // ($num)) & ((($den) // ($num)) - 1)) = 0
          THEN 1 - length(printf('%b', ($den) // ($num)))
        ELSE -length(printf('%b', ($den) // ($num)))
        END AS BIGINT)"""

  /** One row per hashed feature instance: every unigram token and every
    * adjacent bigram ("w1 w2"), hashed portably into `buckets` buckets.
    * Keeps `keep` columns alongside the `bucket` column; the token
    * string never leaves the projection. */
  def featureBuckets(docs: DataFrame, textCol: String, buckets: Int,
      keep: Seq[String]): DataFrame = {
    val ts = split(col(textCol), " ")
    val bigrams = when(size(ts) >= 2,
      transform(sequence(lit(1), size(ts) - 1),
        i => concat_ws(" ", element_at(ts, i), element_at(ts, i + 1))))
      .otherwise(array().cast(ArrayType(StringType)))
    docs.select(keep.map(col) :+ explode(concat(ts, bigrams)).as("__feat"): _*)
      .select(keep.map(col) :+
        pmod(Portable.pmd5(col("__feat")), lit(buckets.toLong)).as("bucket"): _*)
  }

  /** Score per-id feature instances against a model given as per-bucket
    * counts: `rawCounts` (bucket, cr) over the raw corpus,
    * `targetCounts` (bucket, ct) over the target corpus. The two key
    * sets need not be related: the weight table is their FULL OUTER
    * join (cheap — both sides are <= `buckets` rows), so a bucket seen
    * only in the target corpus (the general DSIR setting where the
    * target is a separate reference corpus, not a subset of raw)
    * takes the correct ct > 0 / cr = 0 weight rather than silently
    * losing its row. Instances whose bucket the model has never seen
    * on EITHER side (scoring
    * NEW documents against a standing stream model) take the fully
    * smoothed default ct = cr = 0. Output: (idCol, n_feats,
    * weight_bits) — weight_bits is the signed sum of per-instance
    * floor-log2 importance bits. */
  def scoreInstances(feats: DataFrame, idCol: String,
      rawCounts: DataFrame, targetCounts: DataFrame,
      buckets: Int = DefaultBuckets): DataFrame = {
    val tot = rawCounts.agg(coalesce(sum("cr"), lit(0L)).as("tr"))
      .crossJoin(targetCounts.agg(coalesce(sum("ct"), lit(0L)).as("tt")))
    val w = rawCounts.join(targetCounts, Seq("bucket"), "full")
      .crossJoin(broadcast(tot)) // one-row frame
      .select(col("bucket"), expr(flog2Sql(
        s"(coalesce(ct, 0L) + 1L) * (tr + $buckets)",
        s"(coalesce(cr, 0L) + 1L) * (tt + $buckets)")).as("bits"))
    feats.join(broadcast(w), Seq("bucket"), "left")
      .crossJoin(broadcast(tot)) // one-row frame
      .select(col(idCol), coalesce(col("bits"),
        expr(flog2Sql(s"tr + $buckets", s"tt + $buckets"))).as("bits"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_feats"), sum(col("bits")).as("weight_bits"))
  }

  /** Portable floor division for a possibly-negative numerator and a
    * positive denominator, spelled with TRUNCATING division over
    * non-negative operands only — where Spark's `div` and DuckDB's
    * `//` agree (they disagree on negative operands: `div` truncates
    * toward zero, `//` floors), so both engines state the identical
    * fragment.
    *
    * Validity bound: `-(a) + b - 1` must not overflow BIGINT, i.e.
    * a > Long.MinValue + b (Spark non-ANSI would wrap SILENTLY to a
    * sign-flipped quotient; DuckDB raises). Every caller here is ~12
    * orders of magnitude inside it — [[resampleKeep]]'s numerator is
    * weight_bits, |weight_bits| <= 62 * n_feats — but a reuse on
    * near-Long.MinValue inputs must restate the division. */
  def floorDivSql(a: String, b: String): String =
    s"""CASE WHEN ($a) >= 0 THEN ($a) div ($b)
        ELSE -((-($a) + ($b) - 1) div ($b)) END"""

  /** DuckDB twin of [[floorDivSql]] (`//` on non-negative operands ==
    * `div`). */
  def floorDivDuckSql(a: String, b: String): String =
    s"""CASE WHEN ($a) >= 0 THEN ($a) // ($b)
        ELSE -((-($a) + ($b) - 1) // ($b)) END"""

  /** Bits of the keyed uniform the keep decision draws against (the
    * q247 convention: a 30-bit hash uniform, exactly representable). */
  val ResampleUniformBits = 30

  /** DuckDB spelling of the [[resampleKeep]] decision for a wb_norm
    * fragment and a 30-bit uniform fragment `u` — kept here (not
    * inline in the oracle) so tools/check_dsir_sql.py can extract and
    * property-sweep it against an exact reference, the flog2DuckSql
    * convention. Every constant DERIVES from [[ResampleUniformBits]]
    * (the sweep reads that constant from this file too), so the two
    * engine spellings cannot drift if the uniform width ever moves. */
  def resampleKeepDuckSql(wbNorm: String, u: String,
      pivotBits: Int = 0): String =
    s"""($u) < CASE WHEN ($wbNorm) >= $pivotBits
        THEN CAST(${1L << ResampleUniformBits} AS BIGINT)
        WHEN $ResampleUniformBits + ($wbNorm) - $pivotBits <= 0
        THEN CAST(1 AS BIGINT)
        ELSE (CAST(1 AS BIGINT)
          << ($ResampleUniformBits + ($wbNorm) - $pivotBits))
        END"""

  /** Deterministic importance RESAMPLING from [[scoreInstances]]
    * output — the step that closes the DSIR loop (the paper's point is
    * the resampled mixture, not the weights): each document's
    * per-feature mean log2 importance wb_norm =
    * floor(weight_bits / n_feats) sets a keep probability
    * min(1, 2^(wb_norm - pivotBits)), realized with NO floats against
    * the standing pmd5 sampling hash:
    *
    *   keep  iff  u < threshold,
    *   u = pmd5('dsirk:' || id) % 2^30            (a keyed 30-bit uniform)
    *   threshold = 2^clamp(30 + wb_norm - pivotBits, 0, 30)
    *
    * so wb_norm >= pivotBits keeps always, each bit below pivot halves
    * the keep probability, and probabilities under 2^-30 clamp to
    * 2^-30 (documented floor — by then the document is gone for every
    * practical mixture). The decision is a PURE PER-ROW PROJECTION of
    * integer arithmetic: no shuffle, no state, reproducible across
    * engines and runs (same id -> same draw), and downstream mixture
    * stats stay oracle-checkable. `pivotBits` positions the
    * acceptance pivot: 0 keeps every at-least-averagely-target-like
    * document, positive values sharpen toward the target.
    *
    * Output: the input columns plus (wb_norm, keep). */
  def resampleKeep(scored: DataFrame, idCol: String,
      pivotBits: Int = 0): DataFrame = {
    require(pivotBits > -ResampleUniformBits && pivotBits < 62)
    val wbNorm = expr(floorDivSql("weight_bits", "n_feats"))
    val u = pmod(Portable.pmd5(concat(lit("dsirk:"), col(idCol).cast("string"))),
      lit(1L << ResampleUniformBits))
    scored.withColumn("wb_norm", wbNorm)
      .withColumn("keep", u < expr(
        s"""CASE WHEN wb_norm >= $pivotBits
            THEN CAST(${1L << ResampleUniformBits} AS BIGINT)
            WHEN $ResampleUniformBits + wb_norm - $pivotBits <= 0
            THEN CAST(1 AS BIGINT)
            ELSE shiftleft(CAST(1 AS BIGINT),
              CAST($ResampleUniformBits + wb_norm - $pivotBits AS INT))
            END"""))
  }

  /** The self-contained batch form: hash `docs` once (persisted — the
    * instance frame feeds the raw counts, the target counts AND the
    * scoring aggregation; the caller's harness frees it via
    * clearCache), count both sides, score every document.
    * `targetCol` is a boolean column marking target-corpus membership. */
  def scoreSelf(docs: DataFrame, idCol: String, textCol: String,
      targetCol: Column, buckets: Int = DefaultBuckets): DataFrame = {
    val feats = featureBuckets(
      docs.select(col(idCol), targetCol.as("__tgt"), col(textCol)),
      textCol, buckets, Seq(idCol, "__tgt")).persist()
    val cr = feats.groupBy("bucket").agg(count(lit(1)).as("cr"))
    val ct = feats.filter(col("__tgt")).groupBy("bucket")
      .agg(count(lit(1)).as("ct"))
    scoreInstances(feats.select(col(idCol), col("bucket")), idCol,
      cr, ct, buckets)
  }

  /** q276/q280's per-source mixture arithmetic — ONE statement shared
    * by the batch queries and [[graft.streaming.MixtureStream]]'s
    * read, so the monitor sits under the batch oracles transitively.
    * Input: one (source, n_kept BIGINT, kept_chars BIGINT) row per
    * source with kept mass (kept_chars > 0); output adds share_bp =
    * kept_chars * 10000 div total and epoch_weight_bp = (total div
    * n_sources) * 10000 div kept_chars — the repeat factor toward a
    * uniform per-source character budget. The quotient order keeps
    * every intermediate below total * 10000. One source-bounded
    * aggregate broadcast back — nothing grows with the corpus. */
  def mixtureWeights(perSource: DataFrame): DataFrame = {
    val tot = perSource.agg(sum(col("kept_chars")).as("total_chars"),
      count(lit(1)).as("n_sources"))
    perSource.crossJoin(broadcast(tot))
      .select(col("source"), col("n_kept"), col("kept_chars"),
        expr("kept_chars * 10000 div total_chars").as("share_bp"),
        expr("(total_chars div n_sources) * 10000 div kept_chars")
          .as("epoch_weight_bp"))
  }
}
