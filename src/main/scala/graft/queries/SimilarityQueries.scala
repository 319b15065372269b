package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Portable
import graft.operators.Similarity
import graft.queries.Tables.{spread, t}

/** Similarity-search queries over `embeddings` (array<float>, 64-dim):
  * brute-force cosine top-k (exact baseline), SRP-LSH bucketed ANN
  * (the scale path), and blocked embedding near-dup pairs.
  *
  * Oracle SQL mirrors the Spark plans structurally: vectors cast to
  * double lists once, norms precomputed per vector in a CTE, and the
  * same left-fold dot product — so every double matches bit-for-bit.
  */
object SimilarityQueries {

  private val TOPK = 5
  private val NQ = 8        // query vectors: vec_id < NQ
  private val BITS = 5      // SRP signature width (32 buckets/table)
  private[queries] val COS_T = 0.3   // near-dup threshold (corpus max ~0.45)
  private val KNN_K = 10    // q196 classification neighborhood size

  /** DuckDB: per-vector CTE with double list `v` and precomputed norm
    * `nv` (same projection [[Similarity]] does before any pair work). */
  private[queries] def prepCte(src: String = "embeddings", extra: String = ""): String =
    s"""prep AS (
       |  SELECT vec_id$extra, v,
       |         sqrt(${foldSql("v", "v")}) AS nv
       |  FROM (SELECT vec_id$extra,
       |               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |        FROM $src))""".stripMargin

  /** DuckDB: deterministic left-fold dot product of two double lists. */
  private def foldSql(a: String, b: String): String =
    s"list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(generate_series(1, len($a)), i -> $a[i] * $b[i])), (acc, x) -> acc + x)"

  private[queries] def scoreSql(qa: String, qb: String): String =
    s"${foldSql(s"$qa.v", s"$qb.v")} / ($qa.nv * $qb.nv)"

  // 8 tables x 5-bit buckets: each table scans ~1/32 of the corpus per
  // query; the candidate union over 8 tables measures recall@5 = 0.73
  // at sf0.01 vs 0.25 for the old 4x8-bit config, while candidate
  // generation stays an equi-join on (table, bucket). At corpus scale,
  // `bits` is the lever that holds per-bucket population constant;
  // `tables` buys recall at linear candidate cost.
  private val TABLES = 8

  // q64 probe count: single-bit flips per table. Measured recall@5 at
  // sf0.001 (AnnRecallSpec): probes 0 -> 0.63, 3 -> 0.93; corpus-side
  // work identical, probe rows = (1+PROBES) * TABLES per query.
  private val PROBES = 3

  /** DuckDB: the table-`t` bit-`j` hyperplane projection of `v` — must
    * mirror Similarity's fold exactly (same plane literals, same fold
    * order), so every double matches bit-for-bit. */
  private def projSql(v: String, t: Int, j: Int): String = {
    val plane = (1 to 64).map(i => Similarity.planeComponent(t, j, i)).mkString("[", ", ", "]")
    s"list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(generate_series(1, 64), i -> $v[i] * ($plane)[i])), (acc, x) -> acc + x)"
  }

  /** DuckDB: SRP bucket id for table `t` — must mirror
    * Similarity.srpSignature exactly (same plane values, same fold
    * order). Planes are emitted as literal lists, exactly like the
    * Spark plan. */
  private[queries] def srpSql(v: String, t: Int, bits: Int = BITS): String =
    (0 until bits).map { j =>
      s"CASE WHEN ${projSql(v, t, j)} > 0 THEN CAST(${1L << j} AS BIGINT) ELSE CAST(0 AS BIGINT) END"
    }.mkString("(", " + ", ")")

  // q32 SRP-LSH near-dup parameters: 6-bit buckets (64 per table; the
  // bits ~ log2(n/B) scale lever), 8 tables for recall at the weak 0.3
  // threshold
  private[queries] val ND_BITS = 6
  private[queries] val ND_TABLES = 8

  // q103 semantic-dedup threshold: within-cluster cosine at which two
  // vectors count as semantic duplicates (~300 in-label pairs at sf0.01)
  private val SEM_T = 0.25

  // q106 diversity re-rank: candidate pool depth and per-cluster cap
  private val DIV_POOL = 20
  private val DIV_CAP = 2

  private val NCELLS = 16
  private val NPROBE = 3      // recall@5 = 0.95 at sf0.01 with trained cells
  private val TRAIN_ITERS = 2 // deterministic Lloyd rounds for IVF cells

  private val zeroVecSql = "list_transform(generate_series(1, 64), i -> CAST(0 AS DOUBLE))"

  // q125 product quantization: M subspaces x KSUB codewords, 1 Lloyd
  // round (the oracle unrolls training, so rounds are priced in SQL
  // size), ADC shortlist of PQ_POOL re-ranked exactly to TOPK.
  // Measured at sf0.001 (PqSpec): raw ADC@5 recall 0.40; the re-ranked
  // pipeline below 0.90 uniform / 1.00 clustered.
  private val PQ_M = 16
  private val PQ_KSUB = 16
  private val PQ_ITERS = 1
  private val PQ_POOL = 50
  private val PCA_ITERS = 12 // q127 power-iteration rounds (fixed, no tolerance)
  private val RRF_K = 60     // q151 reciprocal-rank-fusion damping (the standard 60)

  // q130 JL audit: 64 -> JL_DIM projection, pairs among the first
  // JL_NP vectors; JL_T keys a plane family clear of the SRP (t 0..7)
  // and near-dup ranges
  private val JL_DIM = 16
  private val JL_NP = 16
  private val JL_T = 90

  /** DuckDB mirror of one power-iteration chain over CTE `cov` with
    * name prefix `p`: w{p}1/v{p}1 .. w{p}N/v{p}N, the final matvec
    * wf{p}, and the Rayleigh quotient lam{p}. Must track
    * [[Similarity.principalComponents]]'s fold orders exactly. */
  private def pcaChainSql(cov: String, p: String): String = {
    def matvec(prev: String): String =
      s"""SELECT i, list_reduce(list_prepend(CAST(0 AS DOUBLE),
            list_transform(generate_series(1, 64), jj -> arow[jj] * pv[jj])),
            (acc, x) -> acc + x) AS wi
          FROM $cov, $prev"""
    val iters = (1 to PCA_ITERS).map { k =>
      val prev = if (k == 1) "v0" else s"v$p${k - 1}"
      s"""w$p$k AS MATERIALIZED (
          ${matvec(prev)}),
        v$p$k AS MATERIALIZED (
          SELECT list_transform(wl, x -> x / nrm) AS pv FROM (
            SELECT wl, sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
              list_transform(wl, x -> x * x)), (acc, x) -> acc + x)) AS nrm
            FROM (SELECT list(wi ORDER BY i) AS wl FROM w$p$k)))"""
    }.mkString(",\n        ")
    s"""$iters,
        wf$p AS MATERIALIZED (
          ${matvec(s"v$p$PCA_ITERS")}),
        lam$p AS MATERIALIZED (
          SELECT list_reduce(list_prepend(CAST(0 AS DOUBLE), list(pp ORDER BY i)),
                   (acc, x) -> acc + x) AS eigval
          FROM (SELECT wf$p.i AS i, wf$p.wi * pv[CAST(wf$p.i + 1 AS INT)] AS pp
                FROM wf$p, v$p$PCA_ITERS))"""
  }

  /** Shared q127/q129 base: quantized codes, the integer second-moment
    * matrix, B = A/n row lists, and the deterministic v0. */
  private val pcaBaseSql: String = s"""pv AS (
          SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
          FROM embeddings),
        sc AS (
          SELECT v,
                 list_reduce(list_prepend(CAST(0 AS DOUBLE),
                   list_transform(v, x -> abs(x))),
                   (a, x) -> greatest(a, x)) / 127 AS scale
          FROM pv),
        codes AS MATERIALIZED (
          SELECT CASE WHEN scale = 0 THEN list_transform(v, x -> CAST(0 AS BIGINT))
                 ELSE list_transform(v, x -> CAST(floor(x / scale) AS BIGINT)) END AS c
          FROM sc),
        ent AS MATERIALIZED (
          SELECT i - 1 AS i, j - 1 AS j, CAST(sum(c[i] * c[j]) AS BIGINT) AS a
          FROM codes,
               unnest(generate_series(1, 64)) AS ui(i),
               unnest(generate_series(1, 64)) AS uj(j)
          GROUP BY 1, 2),
        nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM codes),
        cov AS MATERIALIZED (
          SELECT i,
                 list(CAST(a AS DOUBLE) / (SELECT CAST(n AS DOUBLE) FROM nn)
                   ORDER BY j) AS arow
          FROM ent GROUP BY i),
        v0 AS (
          SELECT list_transform(generate_series(1, 64),
                   x -> 1 / sqrt(CAST(64 AS DOUBLE))) AS pv),
        tr AS (
          SELECT list_reduce(list_prepend(CAST(0 AS DOUBLE), list(d ORDER BY i)),
                   (acc, x) -> acc + x) AS trace
          FROM (SELECT i, arow[CAST(i + 1 AS INT)] AS d FROM cov))"""
  private val PQ_SUBD = 64 / PQ_M

  private val zeroSubSql =
    s"list_transform(generate_series(1, $PQ_SUBD), i -> CAST(0 AS DOUBLE))"

  /** DuckDB: deterministic left-fold squared-L2 of two double lists —
    * must mirror [[Similarity.l2D]] exactly. */
  private def l2Sql(a: String, b: String): String =
    s"list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(generate_series(1, $PQ_SUBD), i -> ($a[i] - $b[i]) * ($a[i] - $b[i]))), (acc, x) -> acc + x)"

  /** DuckDB: the PQ CTE tree shared by q125 and q150, over `nprep`
    * (the unit-sphere projection of `prep`): subspace rows, hash-race
    * seed codebook, ONE Lloyd round (PQ_ITERS = 1 is priced into the
    * SQL shape), wide m-byte codes, and the per-query exact-distance
    * LUT. subs/cb1/lut are each referenced from many downstream CTEs
    * (lut alone $PQ_M times, once per LUT join); without MATERIALIZED
    * DuckDB inlines the whole training tree at every reference —
    * measured >17 CPU-min at sf0.01 vs 2.7 s materialized. The Lloyd
    * assignment is named `passign1` so the tree stacks collision-free
    * with [[kmeansCtes]]' `assign1` in q150's single WITH. */
  private def pqTreeCtes: String = {
    val seedKey = Portable.pmd5Sql("concat('pq:', CAST(vec_id AS VARCHAR))")
    val subsCte = (0 until PQ_M).map { i =>
      val off = i * PQ_SUBD
      s"SELECT vec_id, $i AS sub, list_transform(generate_series(1, $PQ_SUBD), j -> v[$off + j]) AS sv FROM nprep"
    }.mkString("\n          UNION ALL ")
    val codeCols = (0 until PQ_M)
      .map(i => s"max(CASE WHEN sub = $i THEN cell END) AS c$i")
      .mkString(", ")
    s"""subs AS MATERIALIZED (
          $subsCte),
        seedids AS (
          SELECT vec_id,
                 CAST(row_number() OVER (ORDER BY $seedKey ASC, vec_id ASC) - 1 AS BIGINT) AS cell
          FROM (SELECT vec_id FROM prep ORDER BY $seedKey ASC, vec_id ASC LIMIT $PQ_KSUB)),
        cb0 AS (
          SELECT si.cell, s.sub, s.sv AS cw
          FROM subs s JOIN seedids si USING (vec_id)),
        passign1 AS (
          SELECT vec_id, sub, sv, cell FROM (
            SELECT s.vec_id, s.sub, s.sv, c.cell,
                   row_number() OVER (PARTITION BY s.vec_id, s.sub
                     ORDER BY ${l2Sql("s.sv", "c.cw")} ASC, c.cell ASC) AS r
            FROM subs s JOIN cb0 c ON s.sub = c.sub)
          WHERE r = 1),
        cbsum AS (
          SELECT sub, cell, CAST(count(*) AS BIGINT) AS n,
                 list_reduce(list_prepend($zeroSubSql, list(sv ORDER BY vec_id)),
                   (acc, x) -> list_transform(generate_series(1, $PQ_SUBD), i -> acc[i] + x[i])) AS svsum
          FROM passign1 GROUP BY sub, cell),
        cb1 AS MATERIALIZED (SELECT sub, cell, list_transform(svsum, x -> x / n) AS cw FROM cbsum),
        cod AS (
          SELECT vec_id, sub, cell FROM (
            SELECT s.vec_id, s.sub, c.cell,
                   row_number() OVER (PARTITION BY s.vec_id, s.sub
                     ORDER BY ${l2Sql("s.sv", "c.cw")} ASC, c.cell ASC) AS r
            FROM subs s JOIN cb1 c ON s.sub = c.sub)
          WHERE r = 1),
        codesw AS (
          SELECT vec_id, $codeCols FROM cod GROUP BY vec_id),
        lut AS MATERIALIZED (
          SELECT s.vec_id AS query_id, s.sub, c.cell, ${l2Sql("s.sv", "c.cw")} AS d
          FROM subs s JOIN cb1 c ON s.sub = c.sub
          WHERE s.vec_id < $NQ)"""
  }

  /** DuckDB: the m-term ADC sum over the [[pqLutJoins]] aliases. */
  private def pqAdistSql: String = (0 until PQ_M).map(i => s"l$i.d").mkString(" + ")

  /** DuckDB: one LUT join per subspace beyond l0 — the m-way join whose
    * sum mirrors the Spark side's left-associated map-lookup chain. */
  private def pqLutJoins: String = (1 until PQ_M).map(i =>
    s"JOIN lut l$i ON l$i.query_id = l0.query_id AND l$i.sub = $i AND l$i.cell = w.c$i")
    .mkString("\n          ")

  /** DuckDB: shared q125/q150 tail — ADC shortlist of PQ_POOL, exact
    * cosine re-rank of the shortlist, final top-TOPK. Reads `scored`
    * (query_id, neighbor_id, adist) and `prep`. */
  private def pqTailSql: String = s"""pool AS (
          SELECT query_id, neighbor_id
          FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                  ORDER BY adist ASC, neighbor_id ASC) AS arank
                FROM scored)
          WHERE arank <= $PQ_POOL),
        rer AS (
          SELECT p.query_id, p.neighbor_id,
                 ${foldSql("q.v", "c.v")} / (q.nv * c.nv) AS score
          FROM pool p JOIN prep q ON q.vec_id = p.query_id
                      JOIN prep c ON c.vec_id = p.neighbor_id)
        SELECT query_id, rank, neighbor_id, score
        FROM (SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                ORDER BY score DESC, neighbor_id ASC) AS INTEGER) AS rank
              FROM rer)
        WHERE rank <= $TOPK"""

  /** DuckDB twin of [[Similarity.farthestSeeds]] (race variant, the
    * production default): cell 0 is the vector with the largest
    * hash-race key, and each later cell the not-yet-picked vector
    * maximizing `(1 - nearestCosine) * hash` against the seeds so
    * far. The selection is one unrolled (near, pick, union) block per
    * cell; `max` over doubles and the race-key arithmetic are exact,
    * so both engines pick identical ids, and the picked vectors'
    * doubles match bit-for-bit. */
  private def fpSeedCtes(k: Int): String = {
    val tb = Portable.pmd5Sql("concat('fp:', CAST(vec_id AS VARCHAR))")
    val ps = Portable.pmd5Sql("concat('fps:', CAST(vec_id AS VARCHAR))")
    // the Similarity.SeedSampleCap-smallest sampling-hash keys — the
    // bounded seed-selection sample (covers the whole corpus at
    // harness SFs, so the cap never binds here; mirrored for contract
    // fidelity)
    val base = s"""fp AS MATERIALIZED (
       |          SELECT vec_id, v, nv, $tb AS tb FROM prep
       |          ORDER BY $ps ASC, vec_id ASC
       |          LIMIT ${Similarity.SeedSampleCap})""".stripMargin
    val s0 = s"""seeds0 AS MATERIALIZED (
       |          SELECT CAST(0 AS BIGINT) AS cell, vec_id, v AS cv, nv AS cn
       |          FROM fp
       |          ORDER BY (1.0 - (-1.0)) * CAST(tb AS DOUBLE) DESC, vec_id ASC
       |          LIMIT 1)""".stripMargin
    val steps = (1 until k).map { t =>
      s"""near$t AS MATERIALIZED (
         |          SELECT p.vec_id, p.v, p.nv, p.tb,
         |                 max(${foldSql("p.v", "s.cv")} / (p.nv * s.cn)) AS near
         |          FROM fp p, seeds${t - 1} s
         |          WHERE p.vec_id NOT IN (SELECT vec_id FROM seeds${t - 1})
         |          GROUP BY p.vec_id, p.v, p.nv, p.tb),
         |        seeds$t AS MATERIALIZED (
         |          SELECT * FROM seeds${t - 1} UNION ALL
         |          SELECT * FROM (
         |            SELECT CAST($t AS BIGINT) AS cell, vec_id, v AS cv, nv AS cn
         |            FROM near$t
         |            ORDER BY (1.0 - near) * CAST(tb AS DOUBLE) DESC, vec_id ASC
         |            LIMIT 1))""".stripMargin
    }
    (base +: s0 +: steps).mkString(",\n        ")
  }

  /** DuckDB twin of [[Similarity.trainIvfCentroids]]: the hash-race
    * farthest-point seed cells ([[fpSeedCtes]]) plus `iters` unrolled
    * Lloyd rounds. Centroids are ordered SUMS (cosine is
    * scale-invariant; the fold runs in ascending vec_id order) so
    * every double matches the Spark side bit-for-bit. */
  private def kmeansCtes(iters: Int): String = {
    val init = s"${fpSeedCtes(NCELLS)},\n        cents0 AS (\n          " +
      s"SELECT cell, cv, cn FROM seeds${NCELLS - 1})"
    val rounds = (1 to iters).map { t =>
      s"""assign$t AS (
         |          SELECT vec_id, v, cell FROM (
         |            SELECT p.vec_id, p.v, c.cell,
         |                   row_number() OVER (PARTITION BY p.vec_id
         |                     ORDER BY ${foldSql("p.v", "c.cv")} / (p.nv * c.cn) DESC,
         |                              c.cell ASC) AS crank
         |            FROM prep p, cents${t - 1} c)
         |          WHERE crank = 1),
         |        sums$t AS (
         |          SELECT cell,
         |                 list_reduce(list_prepend($zeroVecSql, list(v ORDER BY vec_id)),
         |                   (acc, x) -> list_transform(generate_series(1, 64), i -> acc[i] + x[i])) AS cv
         |          FROM assign$t GROUP BY cell),
         |        cents$t AS (
         |          SELECT cell, cv, sqrt(${foldSql("cv", "cv")}) AS cn FROM sums$t)""".stripMargin
    }
    (init +: rounds).mkString(",\n        ")
  }

  /** q185: coreset size. */
  private val KC_K = 6

  /** DuckDB twin of the PURE farthest-point traversal
    * ([[Similarity.kcenterCoreset]], race = false): same bounded fp
    * sample, but each pick minimizes (nearest cosine, tb, id) instead
    * of maximizing the hash-race key. Seeds carry their source vec_id
    * so the coreset members are reportable. */
  private def kcenterSeedCtes(k: Int): String = {
    val tb = Portable.pmd5Sql("concat('fp:', CAST(vec_id AS VARCHAR))")
    val ps = Portable.pmd5Sql("concat('fps:', CAST(vec_id AS VARCHAR))")
    val base = s"""kfp AS MATERIALIZED (
       |          SELECT vec_id, v, nv, $tb AS tb FROM prep
       |          ORDER BY $ps ASC, vec_id ASC
       |          LIMIT ${Similarity.SeedSampleCap})""".stripMargin
    val s0 = s"""kseeds0 AS MATERIALIZED (
       |          SELECT CAST(0 AS BIGINT) AS cell, vec_id, v AS cv, nv AS cn
       |          FROM kfp
       |          ORDER BY tb ASC, vec_id ASC
       |          LIMIT 1)""".stripMargin
    val steps = (1 until k).map { t =>
      s"""knear$t AS MATERIALIZED (
         |          SELECT p.vec_id, p.v, p.nv, p.tb,
         |                 max(${foldSql("p.v", "s.cv")} / (p.nv * s.cn)) AS near
         |          FROM kfp p, kseeds${t - 1} s
         |          WHERE p.vec_id NOT IN (SELECT vec_id FROM kseeds${t - 1})
         |          GROUP BY p.vec_id, p.v, p.nv, p.tb),
         |        kseeds$t AS MATERIALIZED (
         |          SELECT * FROM kseeds${t - 1} UNION ALL
         |          SELECT * FROM (
         |            SELECT CAST($t AS BIGINT) AS cell, vec_id, v AS cv, nv AS cn
         |            FROM knear$t
         |            ORDER BY near ASC, tb ASC, vec_id ASC
         |            LIMIT 1))""".stripMargin
    }
    (base +: s0 +: steps).mkString(",\n        ")
  }

  val all: Seq[Q] = Seq(
    // ----------------------------------------------------------------
    Q(
      "q44_ann_ivf",
      s"IVF ANN with trained cells: $NCELLS hash-race farthest-point " +
        s"seeds refined by $TRAIN_ITERS deterministic Lloyd rounds " +
        "(ordered-sum centroids — cosine is scale-invariant), corpus " +
        s"assigned once, queries probe their $NPROBE nearest cells; " +
        "candidates come from the cell equi-join — the data-adaptive " +
        "scale path next to SRP-LSH.",
      (s, dir) => {
        val e = t(s, dir, "embeddings")
        Similarity.ivfTopK(
          spread(e, col("vec_id")), e.filter(col("vec_id") < NQ),
          "vec_id", "embedding", TOPK, NCELLS, NPROBE,
          trainIters = TRAIN_ITERS, dim = 64)
      },
      Some(s"""
        WITH ${prepCte()},
        ${kmeansCtes(TRAIN_ITERS)},
        cscored AS (
          SELECT p.vec_id, p.v, p.nv, c.cell,
                 ${foldSql("p.v", "c.cv")} / (p.nv * c.cn) AS cscore
          FROM prep p, cents$TRAIN_ITERS c),
        cranked AS (
          SELECT *, row_number() OVER (PARTITION BY vec_id
                   ORDER BY cscore DESC, cell ASC) AS crank
          FROM cscored),
        assigned AS (
          SELECT vec_id AS neighbor_id, v, nv, cell FROM cranked WHERE crank = 1),
        probes AS (
          SELECT vec_id AS query_id, v AS qv, nv AS qn, cell
          FROM cranked WHERE vec_id < $NQ AND crank <= $NPROBE),
        scored AS (
          SELECT DISTINCT q.query_id, a.neighbor_id,
                 ${foldSql("q.qv", "a.v")} / (q.qn * a.nv) AS score
          FROM probes q JOIN assigned a ON q.cell = a.cell)
        SELECT query_id, rank, neighbor_id, score
        FROM (SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                ORDER BY score DESC, neighbor_id ASC) AS INTEGER) AS rank
              FROM scored)
        WHERE rank <= $TOPK""")),
    // ----------------------------------------------------------------
    Q(
      "q125_ann_pq",
      s"Product-quantization ANN with asymmetric distance and exact " +
        s"re-rank — the compressed-domain path beside IVF (q44): " +
        s"unit-normalized vectors (L2 order == cosine order on the " +
        s"sphere) split into $PQ_M subspaces, each trained to " +
        s"$PQ_KSUB codewords (hash-race seeds + $PQ_ITERS Lloyd round " +
        "under L2, ordered-sum mean centroids), so a 256-byte corpus " +
        s"vector becomes a $PQ_M-byte code. Queries never decode: " +
        "each builds an (m x ksub) exact-distance lookup table once, " +
        "every corpus vector scores as m table lookups summed in " +
        s"fixed subspace order, and only the $PQ_POOL ADC survivors " +
        s"per query are re-read for the exact cosine top-$TOPK " +
        "(FAISS's refine recipe — quantization caps shortlist " +
        "quality, never final ranking quality). At 100 TB the scan " +
        "side reads ONLY the code table, 16x smaller than the raw " +
        "corpus; the LUT and shortlist broadcast. PqSpec pins the " +
        "measured recall vs q31's exact baseline; every double is " +
        "bit-mirrored in the oracle, so the pipeline itself is exact.",
      (s, dir) => {
        val e = t(s, dir, "embeddings")
        Similarity.pqTopK(
          spread(e, col("vec_id")), e.filter(col("vec_id") < NQ),
          "vec_id", "embedding", TOPK, PQ_M, PQ_KSUB, dim = 64,
          lloydIters = PQ_ITERS, rerankPool = PQ_POOL)
      },
      Some(s"""
        WITH ${prepCte()},
        nprep AS (SELECT vec_id, list_transform(v, x -> x / nv) AS v FROM prep),
        $pqTreeCtes,
        scored AS MATERIALIZED (
          SELECT l0.query_id, w.vec_id AS neighbor_id, $pqAdistSql AS adist
          FROM codesw w
          JOIN lut l0 ON l0.sub = 0 AND l0.cell = w.c0
          $pqLutJoins),
        $pqTailSql""")),
    // ----------------------------------------------------------------
    Q(
      "q150_ann_ivfpq",
      "IVF-PQ composed ANN — q44's coarse quantizer pruning the " +
        s"candidate set (each query scores only the $NPROBE of " +
        s"$NCELLS probed cells' vectors, a cell equi-join) with " +
        "q125's product quantization compressing the scoring " +
        "(candidates rank by m-byte codes against the query's LUT, " +
        s"then the $PQ_POOL-deep shortlist re-reads raw vectors for " +
        s"the exact cosine top-$TOPK) — the FAISS IVFADC architecture " +
        "that actually ships at billion-vector scale: the ADC scan " +
        "reads nProbe/nCells of a 16x-compressed code table, and raw " +
        "vectors are touched only per-shortlist. Both quantizers " +
        "train exactly as their standalone operators (cosine cells " +
        "on raw vectors, L2 codebooks on the unit sphere; codes are " +
        "full-vector, not cell-residual — see Similarity.ivfPqTopK " +
        "for the residual trade), so the oracle stacks the two " +
        "proven CTE trees and every double still matches bit-for-bit.",
      (s, dir) => {
        val e = t(s, dir, "embeddings")
        Similarity.ivfPqTopK(
          spread(e, col("vec_id")), e.filter(col("vec_id") < NQ),
          "vec_id", "embedding", TOPK, NCELLS, NPROBE, PQ_M, PQ_KSUB,
          dim = 64, trainIters = TRAIN_ITERS, lloydIters = PQ_ITERS,
          rerankPool = PQ_POOL)
      },
      Some(s"""
        WITH ${prepCte()},
        nprep AS (SELECT vec_id, list_transform(v, x -> x / nv) AS v FROM prep),
        ${kmeansCtes(TRAIN_ITERS)},
        cscored AS (
          SELECT p.vec_id, c.cell,
                 ${foldSql("p.v", "c.cv")} / (p.nv * c.cn) AS cscore
          FROM prep p, cents$TRAIN_ITERS c),
        cranked AS (
          SELECT *, row_number() OVER (PARTITION BY vec_id
                   ORDER BY cscore DESC, cell ASC) AS crank
          FROM cscored),
        cassign AS (SELECT vec_id AS neighbor_id, cell FROM cranked WHERE crank = 1),
        cprobes AS (
          SELECT vec_id AS query_id, cell
          FROM cranked WHERE vec_id < $NQ AND crank <= $NPROBE),
        cand AS MATERIALIZED (
          SELECT DISTINCT query_id, neighbor_id
          FROM cprobes q JOIN cassign a ON q.cell = a.cell),
        $pqTreeCtes,
        scored AS MATERIALIZED (
          SELECT l0.query_id, w.vec_id AS neighbor_id, $pqAdistSql AS adist
          FROM codesw w
          JOIN cand cd ON cd.neighbor_id = w.vec_id
          JOIN lut l0 ON l0.query_id = cd.query_id
                     AND l0.sub = 0 AND l0.cell = w.c0
          $pqLutJoins),
        $pqTailSql""")),
    // ----------------------------------------------------------------
    Q(
      "q151_hybrid_rrf",
      "Hybrid retrieval by reciprocal-rank fusion — the standard " +
        "recipe for merging rankings whose SCORES are incomparable " +
        s"(RRF, Cormack et al.): q33's SRP-LSH top-$TOPK and q44's " +
        s"IVF top-$TOPK (two ANN families with different blind spots) " +
        s"full-outer-join on (query, neighbor), each list contributes " +
        s"1e6 div ($RRF_K + rank) in exact integer micro-units " +
        "(missing from a list = 0), and the fused score re-ranks to " +
        s"the final top-$TOPK. Both input pipelines run exactly as " +
        "their standalone queries (the oracle stacks both CTE trees); " +
        "the fusion itself touches only 2 x queries x k rank rows — " +
        "free at any corpus scale, which is why hybrid serving stacks " +
        "fuse at the rank level instead of calibrating scores.",
      (s, dir) => {
        val e = t(s, dir, "embeddings")
        val qs = e.filter(col("vec_id") < NQ)
        val a = Similarity.lshTopK(spread(e, col("vec_id")), qs,
          "vec_id", "embedding", TOPK, BITS, dim = 64, tables = TABLES)
          .select(col("query_id"), col("neighbor_id"), col("rank").as("rnk_a"))
        val b = Similarity.ivfTopK(spread(e, col("vec_id")), qs,
          "vec_id", "embedding", TOPK, NCELLS, NPROBE,
          trainIters = TRAIN_ITERS, dim = 64)
          .select(col("query_id"), col("neighbor_id"), col("rank").as("rnk_b"))
        val fused = a.join(b, Seq("query_id", "neighbor_id"), "full_outer")
          .select(col("query_id"), col("neighbor_id"),
            (coalesce(expr(s"1000000 div ($RRF_K + rnk_a)"), lit(0L)) +
              coalesce(expr(s"1000000 div ($RRF_K + rnk_b)"), lit(0L)))
              .as("rrf_micro"))
        fused
          .withColumn("rank", row_number().over(
            Window.partitionBy(col("query_id"))
              .orderBy(col("rrf_micro").desc, col("neighbor_id").asc)))
          .filter(col("rank") <= TOPK)
          .select(col("query_id"), col("rank"), col("neighbor_id"),
            col("rrf_micro"))
      },
      Some(s"""
        WITH ${prepCte()},
        sbk AS (
          ${(0 until TABLES).map(tb =>
            s"SELECT vec_id, v, nv, $tb AS t, ${srpSql("v", tb)} AS bucket FROM prep")
            .mkString("\n          UNION ALL ")}),
        sscored AS (
          SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                 ${scoreSql("q", "c")} AS score
          FROM sbk q JOIN sbk c ON q.t = c.t AND q.bucket = c.bucket
          WHERE q.vec_id < $NQ),
        sr AS (
          SELECT query_id, neighbor_id, rnk FROM (
            SELECT query_id, neighbor_id, row_number() OVER (
              PARTITION BY query_id ORDER BY score DESC, neighbor_id ASC) AS rnk
            FROM sscored)
          WHERE rnk <= $TOPK),
        ${kmeansCtes(TRAIN_ITERS)},
        icscored AS (
          SELECT p.vec_id, p.v, p.nv, c.cell,
                 ${foldSql("p.v", "c.cv")} / (p.nv * c.cn) AS cscore
          FROM prep p, cents$TRAIN_ITERS c),
        icranked AS (
          SELECT *, row_number() OVER (PARTITION BY vec_id
                   ORDER BY cscore DESC, cell ASC) AS crank
          FROM icscored),
        iassigned AS (
          SELECT vec_id AS neighbor_id, v, nv, cell FROM icranked WHERE crank = 1),
        iprobes AS (
          SELECT vec_id AS query_id, v AS qv, nv AS qn, cell
          FROM icranked WHERE vec_id < $NQ AND crank <= $NPROBE),
        iscored AS (
          SELECT DISTINCT q.query_id, a.neighbor_id,
                 ${foldSql("q.qv", "a.v")} / (q.qn * a.nv) AS score
          FROM iprobes q JOIN iassigned a ON q.cell = a.cell),
        ir AS (
          SELECT query_id, neighbor_id, rnk FROM (
            SELECT query_id, neighbor_id, row_number() OVER (
              PARTITION BY query_id ORDER BY score DESC, neighbor_id ASC) AS rnk
            FROM iscored)
          WHERE rnk <= $TOPK),
        fused AS (
          SELECT coalesce(a.query_id, b.query_id) AS query_id,
                 coalesce(a.neighbor_id, b.neighbor_id) AS neighbor_id,
                 coalesce(CAST(1000000 // ($RRF_K + a.rnk) AS BIGINT), 0)
                   + coalesce(CAST(1000000 // ($RRF_K + b.rnk) AS BIGINT), 0)
                   AS rrf_micro
          FROM sr a FULL OUTER JOIN ir b
            ON a.query_id = b.query_id AND a.neighbor_id = b.neighbor_id)
        SELECT query_id, rank, neighbor_id, rrf_micro
        FROM (SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                ORDER BY rrf_micro DESC, neighbor_id ASC) AS INTEGER) AS rank
              FROM fused)
        WHERE rank <= $TOPK""")),
    // ----------------------------------------------------------------
    Q(
      "q127_pca_power",
      s"Top principal direction of the embedding corpus by $PCA_ITERS " +
        "deterministic power-iteration rounds — the spectral datasheet " +
        "stat (one row per dimension: loading, Rayleigh eigenvalue, " +
        "variance share) that tells a curation pipeline whether one " +
        "direction is eating the variance the encoder should spread, " +
        "and the precursor to whitening / SemDeDup-style PCA preprocs. " +
        "Split for exactness at scale: the corpus-sized half is " +
        "INTEGER-only (int8 codes, q57's scale; the dim x dim second-" +
        "moment matrix accumulates as BIGINT sums that commute under " +
        "any partitioning — one map-side-combined agg on a dim^2 key " +
        "space), while the float iteration runs on the fixed dim x dim " +
        "matrix with ascending-index folds, so /, sqrt and the fold " +
        "order are IEEE-identical on both engines — the whole " +
        "trajectory is bit-reproducible, no convergence tolerance. " +
        "PcaSpec checks the result against the dominant eigenvector " +
        "computed independently (residual ||Bv - lambda v||).",
      (s, dir) =>
        Similarity.principalComponent(
          spread(t(s, dir, "embeddings"), col("vec_id")), "embedding",
          dim = 64, iters = PCA_ITERS),
      Some {
        val matvecSql = (prev: String) =>
          s"""SELECT i, list_reduce(list_prepend(CAST(0 AS DOUBLE),
            list_transform(generate_series(1, 64), jj -> arow[jj] * pv[jj])),
            (acc, x) -> acc + x) AS wi
          FROM cov, $prev"""
        val iterCtes = (1 to PCA_ITERS).map { k =>
          s"""w$k AS MATERIALIZED (
          ${matvecSql(s"v${k - 1}")}),
        v$k AS MATERIALIZED (
          SELECT list_transform(wl, x -> x / nrm) AS pv FROM (
            SELECT wl, sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
              list_transform(wl, x -> x * x)), (acc, x) -> acc + x)) AS nrm
            FROM (SELECT list(wi ORDER BY i) AS wl FROM w$k)))"""
        }.mkString(",\n        ")
        s"""
        WITH pv AS (
          SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
          FROM embeddings),
        sc AS (
          SELECT v,
                 list_reduce(list_prepend(CAST(0 AS DOUBLE),
                   list_transform(v, x -> abs(x))),
                   (a, x) -> greatest(a, x)) / 127 AS scale
          FROM pv),
        codes AS MATERIALIZED (
          SELECT CASE WHEN scale = 0 THEN list_transform(v, x -> CAST(0 AS BIGINT))
                 ELSE list_transform(v, x -> CAST(floor(x / scale) AS BIGINT)) END AS c
          FROM sc),
        ent AS MATERIALIZED (
          SELECT i - 1 AS i, j - 1 AS j, CAST(sum(c[i] * c[j]) AS BIGINT) AS a
          FROM codes,
               unnest(generate_series(1, 64)) AS ui(i),
               unnest(generate_series(1, 64)) AS uj(j)
          GROUP BY 1, 2),
        nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM codes),
        cov AS MATERIALIZED (
          SELECT i,
                 list(CAST(a AS DOUBLE) / (SELECT CAST(n AS DOUBLE) FROM nn)
                   ORDER BY j) AS arow
          FROM ent GROUP BY i),
        v0 AS (
          SELECT list_transform(generate_series(1, 64),
                   x -> 1 / sqrt(CAST(64 AS DOUBLE))) AS pv),
        $iterCtes,
        wf AS MATERIALIZED (
          ${matvecSql(s"v$PCA_ITERS")}),
        lam AS (
          SELECT list_reduce(list_prepend(CAST(0 AS DOUBLE), list(p ORDER BY i)),
                   (acc, x) -> acc + x) AS eigval
          FROM (SELECT wf.i AS i, wf.wi * pv[CAST(wf.i + 1 AS INT)] AS p
                FROM wf, v$PCA_ITERS)),
        tr AS (
          SELECT list_reduce(list_prepend(CAST(0 AS DOUBLE), list(d ORDER BY i)),
                   (acc, x) -> acc + x) AS trace
          FROM (SELECT i, arow[CAST(i + 1 AS INT)] AS d FROM cov))
        SELECT CAST(u.i - 1 AS BIGINT) AS dim_i, pv[u.i] AS loading,
               eigval, eigval / trace AS var_share
        FROM v$PCA_ITERS, lam, tr, unnest(generate_series(1, 64)) AS u(i)"""
      }),
    // ----------------------------------------------------------------
    Q(
      "q129_pca_deflate",
      "Top-2 PCA by Hotelling deflation — q127's dominant direction " +
        "plus the runner-up from B' = B - lambda v v^T (entrywise, the " +
        "same left-associated product chain on both engines), each " +
        s"recovered by its own $PCA_ITERS fixed power-iteration " +
        "rounds. Deflation never touches the corpus again: every " +
        "deflated matrix is still dim x dim, so extra components cost " +
        "one more tiny broadcast frame each, and var_share stays " +
        "relative to the ORIGINAL trace so component shares sum toward " +
        "the explained fraction of total (quantized) variance — the " +
        "two-number answer to: is this embedding corpus effectively " +
        "low-rank? PcaSpec pins two-direction recovery and " +
        "near-orthogonality on a planted-spectrum corpus.",
      (s, dir) =>
        Similarity.principalComponents(
          spread(t(s, dir, "embeddings"), col("vec_id")), "embedding",
          dim = 64, iters = PCA_ITERS, nComponents = 2),
      Some {
        s"""
        WITH $pcaBaseSql,
        ${pcaChainSql("cov", "a")},
        cov2 AS MATERIALIZED (
          SELECT i, list_transform(generate_series(1, 64),
                   jj -> arow[jj] - eigval * pv[CAST(i + 1 AS INT)] * pv[jj])
                   AS arow
          FROM cov, va$PCA_ITERS, lama),
        ${pcaChainSql("cov2", "b")}
        SELECT CAST(0 AS BIGINT) AS component, CAST(u.i - 1 AS BIGINT) AS dim_i,
               pv[u.i] AS loading, eigval, eigval / trace AS var_share
        FROM va$PCA_ITERS, lama, tr, unnest(generate_series(1, 64)) AS u(i)
        UNION ALL
        SELECT CAST(1 AS BIGINT), CAST(u.i - 1 AS BIGINT),
               pv[u.i], eigval, eigval / trace
        FROM vb$PCA_ITERS, lamb, tr, unnest(generate_series(1, 64)) AS u(i)"""
      }),
    // ----------------------------------------------------------------
    Q(
      "q130_jl_distortion",
      s"Johnson-Lindenstrauss projection audit: 64-dim embeddings " +
        s"project to $JL_DIM dims through the SAME deterministic " +
        "plan-time plane literals SRP hashing uses (an independent " +
        s"table id), and every probe pair among the first $JL_NP " +
        "vectors reports its full-space cosine, reduced-space cosine " +
        "and absolute gap — the measurement that decides whether the " +
        "ANN index / pair scans can run on vectors a quarter the size. " +
        "The projection itself is a scan-stage arithmetic projection " +
        "(zero shuffle, codegen-friendly, exact ascending folds — " +
        "bit-mirrored in the oracle); only the bounded audit slice " +
        "ever self-joins. JlSpec pins the measured distortion band.",
      (s, dir) => {
        val p = t(s, dir, "embeddings").filter(col("vec_id") < JL_NP)
          .select(col("vec_id"), Similarity.toDouble(col("embedding")).as("v"))
          .select(col("vec_id"), col("v"),
            Similarity.jlProject(col("v"), JL_DIM, 64, JL_T).as("r"))
          .select(col("vec_id"), col("v"), col("r"),
            sqrt(Similarity.dotD(col("v"), col("v"))).as("nv"),
            sqrt(Similarity.dotD(col("r"), col("r"))).as("nr"))
        val a = p.select(col("vec_id").as("id_a"), col("v").as("va"),
          col("r").as("ra"), col("nv").as("na"), col("nr").as("nra"))
        val b = p.select(col("vec_id").as("id_b"), col("v").as("vb"),
          col("r").as("rb"), col("nv").as("nb"), col("nr").as("nrb"))
        a.join(broadcast(b), col("id_a") < col("id_b"))
          .select(col("id_a"), col("id_b"),
            (Similarity.dotD(col("va"), col("vb")) / (col("na") * col("nb")))
              .as("cos_full"),
            (Similarity.dotD(col("ra"), col("rb")) / (col("nra") * col("nrb")))
              .as("cos_jl"))
          .withColumn("gap", abs(col("cos_jl") - col("cos_full")))
      },
      Some {
        val rList = (0 until JL_DIM).map(k => projSql("v", JL_T, k))
          .mkString("[", ",\n                 ", "]")
        s"""
        WITH p0 AS (
          SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
          FROM embeddings WHERE vec_id < $JL_NP),
        pr AS MATERIALIZED (
          SELECT vec_id, v,
                 $rList AS r
          FROM p0),
        pp AS MATERIALIZED (
          SELECT vec_id, v, r,
                 sqrt(${foldSql("v", "v")}) AS nv,
                 sqrt(${foldSql("r", "r")}) AS nr
          FROM pr)
        SELECT id_a, id_b, cos_full, cos_jl, abs(cos_jl - cos_full) AS gap
        FROM (
          SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                 ${foldSql("a.v", "b.v")} / (a.nv * b.nv) AS cos_full,
                 ${foldSql("a.r", "b.r")} / (a.nr * b.nr) AS cos_jl
          FROM pp a JOIN pp b ON a.vec_id < b.vec_id)"""
      }),
    // ----------------------------------------------------------------
    Q(
      "q31_ann_bruteforce",
      s"Exact ANN baseline: top-$TOPK cosine neighbors for $NQ query " +
        "vectors — broadcast queries x one corpus scan, norms " +
        "precomputed per vector, window top-k.",
      (s, dir) => {
        val e = t(s, dir, "embeddings")
        Similarity.bruteForceTopK(
          spread(e, col("vec_id")), e.filter(col("vec_id") < NQ),
          "vec_id", "embedding", TOPK)
      },
      Some(s"""
        WITH ${prepCte()},
        scored AS (
          SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                 ${scoreSql("q", "c")} AS score
          FROM prep q JOIN prep c ON q.vec_id < $NQ)
        SELECT query_id, rank, neighbor_id, score
        FROM (SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                ORDER BY score DESC, neighbor_id ASC) AS INTEGER) AS rank
              FROM scored)
        WHERE rank <= $TOPK""")),
    // ----------------------------------------------------------------
    Q(
      "q32_embedding_neardup",
      s"Embedding near-dup pairs: cosine >= $COS_T, candidates from " +
        s"$ND_TABLES independent $ND_BITS-bit SRP-LSH bucket tables " +
        "(equi-join on (table, bucket)) and exact cosine verification " +
        "on survivors — per-bucket pair work stays bounded as the " +
        "corpus grows, unlike low-cardinality label blocking.",
      (s, dir) =>
        Similarity.srpCosinePairs(
          // single-file table: spread before the norm projection
          spread(t(s, dir, "embeddings"), col("vec_id")),
          "vec_id", "embedding", COS_T,
          bits = ND_BITS, dim = 64, tables = ND_TABLES),
      Some(s"""
        WITH ${prepCte()},
        bk AS (
          ${(0 until ND_TABLES).map(tb =>
            s"SELECT vec_id, $tb AS t, ${srpSql("v", tb, ND_BITS)} AS bucket FROM prep")
            .mkString("\n          UNION ALL ")}),
        cand AS (
          SELECT DISTINCT l.vec_id AS id_a, r.vec_id AS id_b
          FROM bk l JOIN bk r
            ON l.t = r.t AND l.bucket = r.bucket AND l.vec_id < r.vec_id)
        SELECT id_a, id_b, cos FROM (
          SELECT id_a, id_b, ${foldSql("a.v", "b.v")} / (a.nv * b.nv) AS cos
          FROM cand JOIN prep a ON cand.id_a = a.vec_id
                    JOIN prep b ON cand.id_b = b.vec_id)
        WHERE cos >= $COS_T""")),
    // ----------------------------------------------------------------
    Q(
      "q33_ann_lsh",
      s"Multi-table SRP-LSH ANN ($TABLES tables x $BITS-bit signatures " +
        "from precomputed literal plane matrices): candidates are the " +
        "union over tables of same-bucket vectors (equi-join on " +
        "(table, bucket)) — the recall lever that survives a 100x corpus.",
      (s, dir) => {
        val e = t(s, dir, "embeddings")
        Similarity.lshTopK(
          spread(e, col("vec_id")), e.filter(col("vec_id") < NQ),
          "vec_id", "embedding", TOPK, BITS, dim = 64, tables = TABLES)
      },
      Some(s"""
        WITH ${prepCte()},
        bk AS (
          ${(0 until TABLES).map(tb =>
            s"SELECT vec_id, v, nv, $tb AS t, ${srpSql("v", tb)} AS bucket FROM prep")
            .mkString("\n          UNION ALL ")}),
        scored AS (
          SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                 ${scoreSql("q", "c")} AS score
          FROM bk q JOIN bk c ON q.t = c.t AND q.bucket = c.bucket
          WHERE q.vec_id < $NQ)
        SELECT query_id, rank, neighbor_id, score
        FROM (SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                ORDER BY score DESC, neighbor_id ASC) AS INTEGER) AS rank
              FROM scored)
        WHERE rank <= $TOPK""")),
    // ----------------------------------------------------------------
    Q(
      "q57_int8_quantize",
      "Int8 scalar quantization of the embedding corpus (symmetric " +
        "scale = max|x|/127, codes floor(x/scale)) with per-vector " +
        "scale, code checksum and reconstruction MSE — the 4x storage " +
        "path for billion-vector corpora, as a pure per-row " +
        "projection. floor instead of round keeps the codes " +
        "bit-identical across engines (round-half modes differ).",
      (s, dir) =>
        Similarity.int8Quantize(
          spread(t(s, dir, "embeddings"), col("vec_id")),
          "vec_id", "embedding", dim = 64),
      Some(s"""
        WITH pv AS (
          SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
          FROM embeddings),
        scaled AS (
          SELECT vec_id, v,
                 list_reduce(list_prepend(CAST(0 AS DOUBLE),
                   list_transform(v, x -> abs(x))), (a, x) -> greatest(a, x)) / 127 AS scale
          FROM pv)
        SELECT vec_id, scale,
               CAST(list_sum(list_transform(generate_series(1, 64), i ->
                 CAST(CASE WHEN scale = 0 THEN 0 ELSE floor(v[i] / scale) END AS BIGINT) * i))
                 AS BIGINT) AS code_checksum,
               list_reduce(list_prepend(CAST(0 AS DOUBLE),
                 list_transform(generate_series(1, 64), i ->
                   (v[i] - (CASE WHEN scale = 0 THEN 0 ELSE floor(v[i] / scale) END) * scale)
                   * (v[i] - (CASE WHEN scale = 0 THEN 0 ELSE floor(v[i] / scale) END) * scale))),
                 (a, x) -> a + x) / 64 AS mse
        FROM scaled""")),
    // ----------------------------------------------------------------
    Q(
      "q64_ann_multiprobe",
      s"Multiprobe SRP-LSH ANN: q33's $TABLES x $BITS-bit tables, but " +
        s"each query also probes the $PROBES buckets at its smallest-" +
        "|projection-margin| single-bit flips (a near-zero margin means " +
        "the neighbor plausibly fell just across that hyperplane). " +
        "Corpus-side cost is byte-identical to single-probe — the " +
        "recall lift (0.63 -> 0.93 at sf0.001) is paid entirely on the " +
        "tiny query side, the lever that matters when re-hashing the " +
        "corpus for more tables is the expensive alternative.",
      (s, dir) => {
        val e = t(s, dir, "embeddings")
        Similarity.lshTopKMultiprobe(
          spread(e, col("vec_id")), e.filter(col("vec_id") < NQ),
          "vec_id", "embedding", TOPK, BITS, dim = 64,
          tables = TABLES, probes = PROBES)
      },
      Some(s"""
        WITH ${prepCte()},
        cbk AS (
          ${(0 until TABLES).map(tb =>
            s"SELECT vec_id, v, nv, $tb AS t, ${srpSql("v", tb)} AS bucket FROM prep")
            .mkString("\n          UNION ALL ")}),
        qpr AS (
          ${(0 until TABLES).map(tb =>
            s"SELECT vec_id, v, nv, $tb AS t, ${(0 until BITS).map(j => projSql("v", tb, j))
              .mkString("[", ",\n             ", "]")} AS pr FROM prep WHERE vec_id < $NQ")
            .mkString("\n          UNION ALL ")}),
        qbk AS (
          SELECT vec_id, v, nv, t,
                 CAST(list_sum(list_transform(range(0, $BITS), j ->
                   CASE WHEN pr[j+1] > 0 THEN CAST(1 AS BIGINT) << j
                        ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS bucket,
                 list_slice(list_sort(list_transform(range(0, $BITS), j ->
                   struct_pack(m := abs(pr[j+1]), j := j))), 1, $PROBES) AS mg
          FROM qpr),
        qprobe AS (
          SELECT vec_id, v, nv, t,
                 unnest(list_concat([bucket],
                   list_transform(mg, s -> xor(bucket, CAST(1 AS BIGINT) << s.j)))) AS pbucket
          FROM qbk),
        scored AS (
          SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                 ${scoreSql("q", "c")} AS score
          FROM qprobe q JOIN cbk c ON q.t = c.t AND q.pbucket = c.bucket)
        SELECT query_id, rank, neighbor_id, score
        FROM (SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                ORDER BY score DESC, neighbor_id ASC) AS INTEGER) AS rank
              FROM scored)
        WHERE rank <= $TOPK""")),
    // ----------------------------------------------------------------
    Q(
      "q103_semantic_dedup",
      s"Semantic dedup (the SemDeDup shape): within each embedding " +
        "CLUSTER — the label column, standing in for the upstream " +
        "k-means cell id the method trains (Similarity.buildIvfIndex " +
        "produces exactly such cells) — exact cosine over all " +
        s"in-cluster pairs, and a vector is DROPPED when a smaller-id " +
        s"cluster-mate sits at cos >= $SEM_T. Output is the drop list " +
        "with its keeper (smallest qualifying neighbor) and dup count. " +
        "Within-cluster pair work is the method's defining cost: the " +
        "clusterer sizes cells (n/k) to keep it tractable at corpus " +
        "scale, and an oversized cell sub-blocks by SRP bucket (q32's " +
        "machinery) without changing the keep rule.",
      (s, dir) => {
        val pairs = Similarity.blockedCosinePairs(
          spread(t(s, dir, "embeddings"), col("vec_id")),
          "vec_id", "embedding", "label", SEM_T)
        pairs.groupBy(col("block").as("label"), col("id_b").as("dropped_id"))
          .agg(min(col("id_a")).as("keeper_id"), count(lit(1)).as("n_dups"))
      },
      Some(s"""
        WITH ${prepCte(extra = ", label")},
        p AS (
          SELECT l.label, l.vec_id AS id_a, r.vec_id AS id_b,
                 ${scoreSql("l", "r")} AS cos
          FROM prep l JOIN prep r
            ON l.label = r.label AND l.vec_id < r.vec_id)
        SELECT label, id_b AS dropped_id, min(id_a) AS keeper_id,
               CAST(count(*) AS BIGINT) AS n_dups
        FROM p WHERE cos >= $SEM_T
        GROUP BY label, id_b""")),
    // ----------------------------------------------------------------
    Q(
      "q106_diverse_ann",
      s"Diversity-constrained retrieval: from each query's top-$DIV_POOL " +
        s"cosine pool, keep at most $DIV_CAP neighbors per cluster " +
        s"(label) and re-rank the survivors to a final top-$TOPK — the " +
        "RAG/retrieval dedup step that stops one dominant cluster from " +
        "filling every slot (the constraint-based stand-in for MMR, with " +
        "a deterministic total order instead of MMR's sequential greedy). " +
        "Pool generation is q31's broadcast-queries x one-corpus-scan; " +
        "both caps are windows over the already-tiny pool, so the " +
        "diversity pass adds zero corpus-side work at any scale.",
      (s, dir) => {
        val e = t(s, dir, "embeddings")
        val pool = Similarity.bruteForceTopK(
          spread(e, col("vec_id")), e.filter(col("vec_id") < NQ),
          "vec_id", "embedding", DIV_POOL)
        val labeled = pool.join(
          broadcast(e.select(col("vec_id").as("neighbor_id"), col("label"))),
          "neighbor_id")
        val perLabel = Window.partitionBy(col("query_id"), col("label"))
          .orderBy(col("rank"))
        val overall = Window.partitionBy(col("query_id")).orderBy(col("rank"))
        labeled
          .withColumn("lrank", row_number().over(perLabel))
          .filter(col("lrank") <= DIV_CAP)
          .withColumn("drank", row_number().over(overall))
          .filter(col("drank") <= TOPK)
          .select(col("query_id"), col("drank"), col("neighbor_id"),
            col("label"), col("score"))
      },
      Some(s"""
        WITH ${prepCte(extra = ", label")},
        scored AS (
          SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, c.label,
                 ${scoreSql("q", "c")} AS score
          FROM prep q JOIN prep c ON q.vec_id < $NQ),
        pool AS (
          SELECT * FROM (
            SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                     ORDER BY score DESC, neighbor_id ASC) AS INTEGER) AS rank
            FROM scored)
          WHERE rank <= $DIV_POOL),
        capped AS (
          SELECT * FROM (
            SELECT *, row_number() OVER (PARTITION BY query_id, label
                     ORDER BY rank) AS lrank
            FROM pool)
          WHERE lrank <= $DIV_CAP)
        SELECT query_id, drank, neighbor_id, label, score
        FROM (
          SELECT query_id,
                 CAST(row_number() OVER (PARTITION BY query_id ORDER BY rank)
                   AS INTEGER) AS drank,
                 neighbor_id, label, score
          FROM capped)
        WHERE drank <= $TOPK""")),
    // ----------------------------------------------------------------
    Q(
      "q119_hard_negatives",
      s"Contrastive hard-negative mining: each of the $NQ query " +
        s"vectors' top-$TOPK most-similar CROSS-label vectors — the " +
        "gradient-rich negatives an embedding trainer needs (high " +
        "cosine, different class). q31's broadcast-queries shape with " +
        "the label inequality filtered before ranking; at corpus " +
        "scale the scan side becomes an ANN candidate set (k' > k) " +
        "under the same filter.",
      (s, dir) => {
        val e = t(s, dir, "embeddings")
        Similarity.hardNegativeTopK(
          spread(e, col("vec_id")), e.filter(col("vec_id") < NQ),
          "vec_id", "embedding", "label", TOPK)
      },
      Some(s"""
        WITH ${prepCte(extra = ", label")},
        scored AS (
          SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                 ${scoreSql("q", "c")} AS score
          FROM prep q JOIN prep c
            ON q.vec_id < $NQ AND q.label <> c.label)
        SELECT query_id, rank, neighbor_id, score
        FROM (SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                ORDER BY score DESC, neighbor_id ASC) AS INTEGER) AS rank
              FROM scored)
        WHERE rank <= $TOPK""")),
    // ----------------------------------------------------------------
    Q(
      "q185_kcenter_coreset",
      s"Greedy k-center coreset (facility-location data selection): " +
        s"$KC_K representatives picked by pure farthest-point " +
        "traversal — each pick is the vector whose best cosine to the " +
        "picks so far is SMALLEST (hash/id tie-broken) — then one " +
        "corpus x k broadcast pass assigns every vector to its " +
        "nearest representative. Output per cell: representative, " +
        "population, and the worst member cosine (the coverage radius " +
        "a diversity-sampling budget reads). The sequential k-round " +
        "greedy runs driver-side over the bounded deterministic " +
        "sample (the sample-based k-center recipe — q44's seeding " +
        "machinery with the race factor off); the distributed cost " +
        "is one scan plus an (id, cell, score)-wide shuffle.",
      (s, dir) => {
        val e = t(s, dir, "embeddings")
        Similarity.kcenterCoreset(spread(e, col("vec_id")),
            "vec_id", "embedding", KC_K)
          .groupBy(col("cell"), col("center_id"))
          .agg(count(lit(1)).as("n_members"), min(col("cscore")).as("worst_cos"))
      },
      Some(s"""
        WITH ${prepCte()},
        ${kcenterSeedCtes(KC_K)},
        kassign AS (
          SELECT cell, center_id, vec_id AS member_id, cscore FROM (
            SELECT p.vec_id, s.cell, s.vec_id AS center_id,
                   ${foldSql("p.v", "s.cv")} / (p.nv * s.cn) AS cscore,
                   row_number() OVER (PARTITION BY p.vec_id
                     ORDER BY ${foldSql("p.v", "s.cv")} / (p.nv * s.cn) DESC,
                              s.cell ASC) AS crank
            FROM prep p, kseeds${KC_K - 1} s)
          WHERE crank = 1)
        SELECT cell, center_id, CAST(count(*) AS BIGINT) AS n_members,
               min(cscore) AS worst_cos
        FROM kassign GROUP BY 1, 2""")),
    // ----------------------------------------------------------------
    Q(
      "q196_knn_classify",
      s"k-NN majority-vote classification: each of the $NQ held-out " +
        s"query vectors is labeled by its $KNN_K nearest corpus " +
        "neighbors (cosine), ties broken (votes desc, label asc) — " +
        "the free non-parametric classifier of any embedding space, " +
        "and the label-noise audit when queries keep their true " +
        "label (output carries both). Neighbor search is q31's " +
        "broadcast-queries x one-corpus-scan (ANN candidates slot in " +
        "at corpus scale — the vote never cares where the top-k came " +
        "from); everything after the search runs on the queries x k " +
        "frame: the label join broadcasts it, and the argmax label " +
        "is a window over <= k rows per query.",
      (s, dir) => {
        val e = t(s, dir, "embeddings")
        Similarity.knnClassify(
          spread(e.filter(col("vec_id") >= NQ), col("vec_id")),
          e.filter(col("vec_id") < NQ),
          "vec_id", "embedding", "label", KNN_K)
      },
      Some(s"""
        WITH ${prepCte(extra = ", label")},
        topk AS (
          SELECT query_id, nlabel FROM (
            SELECT q.vec_id AS query_id, c.label AS nlabel,
                   row_number() OVER (PARTITION BY q.vec_id
                     ORDER BY ${scoreSql("q", "c")} DESC, c.vec_id ASC)
                     AS rank
            FROM prep q JOIN prep c
              ON q.vec_id < $NQ AND c.vec_id >= $NQ)
          WHERE rank <= $KNN_K),
        votes AS (
          SELECT query_id, nlabel, CAST(count(*) AS BIGINT) AS votes
          FROM topk GROUP BY 1, 2),
        pred AS (
          SELECT query_id, nlabel, votes FROM (
            SELECT *, row_number() OVER (PARTITION BY query_id
                        ORDER BY votes DESC, nlabel ASC) AS rk
            FROM votes)
          WHERE rk = 1)
        SELECT p.query_id, q.label AS true_label,
               p.nlabel AS predicted_label, p.votes
        FROM pred p JOIN prep q ON q.vec_id = p.query_id""")),
    // ----------------------------------------------------------------
    Q(
      "q267_semantic_decontam",
      s"SEMANTIC decontamination — the embedding-space complement " +
        "that completes the decon matrix (exact spans q260/q264/" +
        "q266, token hashes q58/q71, bloom q126): a PARAPHRASED " +
        "leak never matches a substring probe but still lands next " +
        "to its source in embedding space, so every eval vector " +
        s"(vec_id < 32) is scored against the training slice " +
        s"(vec_id >= 32) by the count of training vectors with " +
        s"cosine >= $COS_T plus the maximum matching cosine — " +
        "zero-match evals kept with (0, null), the per-eval-item " +
        "release-audit row. Candidates from the q32 SRP-LSH family, " +
        s"CROSS-table ($ND_TABLES tables x $ND_BITS-bit buckets): " +
        "the training side buckets once (per-bucket population " +
        "bounded by the bits lever), the eval side BROADCASTS into " +
        "the bucket equi-join and the verify join — training " +
        "vectors never shuffle. The oracle states the SAME bucket " +
        "generation and the same left-fold dot products, so the " +
        "hash match checks the cross-table decomposition exactly " +
        "(recall is the stated multi-table LSH recall, as in every " +
        "SRP consumer). SCALE SHAPE: one corpus bucketing pass, " +
        "broadcast probes, exact verification only on bucket " +
        "collisions, one bounded row per eval vector out.",
      (s, dir) => {
        val e = spread(t(s, dir, "embeddings"), col("vec_id"))
        Similarity.srpCosineMatchesAcross(
          e.filter(col("vec_id") >= 32), e.filter(col("vec_id") < 32),
          "vec_id", "embedding", COS_T,
          bits = ND_BITS, dim = 64, tables = ND_TABLES)
      },
      Some(s"""
        WITH ${prepCte()},
        cp AS (SELECT * FROM prep WHERE vec_id >= 32),
        qp AS (SELECT * FROM prep WHERE vec_id < 32),
        cbk AS (
          ${(0 until ND_TABLES).map(tb =>
            s"SELECT vec_id, $tb AS t, ${srpSql("v", tb, ND_BITS)} AS bucket FROM cp")
            .mkString("\n          UNION ALL ")}),
        qbk AS (
          ${(0 until ND_TABLES).map(tb =>
            s"SELECT vec_id, $tb AS t, ${srpSql("v", tb, ND_BITS)} AS bucket FROM qp")
            .mkString("\n          UNION ALL ")}),
        cand AS (
          SELECT DISTINCT q.vec_id AS qid, c.vec_id AS cid
          FROM qbk q JOIN cbk c ON q.t = c.t AND q.bucket = c.bucket),
        m AS (
          SELECT qid, CAST(count(*) AS BIGINT) AS n_matches,
                 max(score) AS max_cos
          FROM (SELECT cand.qid, ${scoreSql("q", "c")} AS score
                FROM cand
                JOIN qp q ON q.vec_id = cand.qid
                JOIN cp c ON c.vec_id = cand.cid)
          WHERE score >= $COS_T GROUP BY qid)
        SELECT qp.vec_id AS eval_id,
               coalesce(m.n_matches, 0) AS n_matches, m.max_cos
        FROM qp LEFT JOIN m ON qp.vec_id = m.qid""")),
    // ----------------------------------------------------------------
    Q(
      "q278_semdedup",
      "SemDeDup (Abbas et al. 2023, the public embedding-CLUSTER " +
        "semantic dedup recipe): k-means cells over the embeddings " +
        s"(q44's deterministic $NCELLS-cell/$TRAIN_ITERS-round " +
        "training, bit-reproducible in both engines), every vector " +
        "assigned to its nearest cell once, pairwise cosine WITHIN " +
        s"each cell only, and a vector drops iff a same-cell vector " +
        s"at cosine >= $COS_T has strictly better keep priority — " +
        "the paper's keeper choice: LOWEST cosine to the centroid " +
        "first (keep the least prototypical member of a duplicate " +
        "neighborhood), id ascending on ties; a single semi-join " +
        "dominance decision per vector, no iterative components. " +
        "This is the curation step pairwise token dedup cannot " +
        "reach: paraphrases and template instances share no shingles " +
        "but collapse to one representative per semantic " +
        "neighborhood. Output per source: vector count, dropped and " +
        "kept counts, kept bp. SCALE SHAPE: training is the q44 " +
        "sampled-seed recipe (train on a sample at corpus scale, " +
        "assign once with frozen centroids); assignment is one " +
        "corpus x k broadcast pass; the quadratic stage is CONFINED " +
        "to cells — the paper's own recipe scales k with the corpus " +
        "so cell population stays bounded, and the bound is ALSO " +
        s"ENFORCED: cells above ${Similarity.SemDedupMaxCell} members " +
        "are excluded from the pair stage (members kept unexamined, " +
        "exclusion observed-warned — the LSH hot-bucket shape), so a " +
        "template flood collapsing the corpus into one cell can never " +
        "run a silent O(n^2) join; the oracle states the same " +
        "occupancy predicate. The all-pairs corpus join never " +
        "exists; the final aggregation is source-bounded.",
      (s, dir) => {
        val e = spread(t(s, dir, "embeddings"), col("vec_id"))
        val sd = Similarity.semDedup(e, "vec_id", "embedding",
          NCELLS, TRAIN_ITERS, 64, COS_T)
        sd.join(t(s, dir, "documents")
            .select(col("doc_id").as("vec_id"), col("source")),
            Seq("vec_id"))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_vecs"),
            sum(when(col("drop"), 1L).otherwise(0L)).as("n_dropped"),
            sum(when(!col("drop"), 1L).otherwise(0L)).as("n_kept"))
          .select(col("source"), col("n_vecs"), col("n_dropped"),
            col("n_kept"),
            expr("n_kept * 10000 div n_vecs").as("kept_bp"))
      },
      Some(s"""
        WITH ${prepCte()},
        ${kmeansCtes(TRAIN_ITERS)},
        casg AS (
          SELECT vec_id, v, nv, cell, cscore FROM (
            SELECT p.vec_id, p.v, p.nv, c.cell,
                   ${foldSql("p.v", "c.cv")} / (p.nv * c.cn) AS cscore,
                   row_number() OVER (PARTITION BY p.vec_id
                     ORDER BY ${foldSql("p.v", "c.cv")} / (p.nv * c.cn)
                       DESC, c.cell ASC) AS crank
            FROM prep p, cents$TRAIN_ITERS c)
          WHERE crank = 1),
        cpop AS (
          SELECT cell, CAST(count(*) AS BIGINT) AS pop
          FROM casg GROUP BY 1),
        dropd AS (
          SELECT DISTINCT a.vec_id
          FROM casg a JOIN casg b
            ON a.cell = b.cell AND a.vec_id <> b.vec_id
          JOIN cpop ON cpop.cell = a.cell
          WHERE cpop.pop <= ${Similarity.SemDedupMaxCell}
            AND ${foldSql("a.v", "b.v")} / (a.nv * b.nv) >= $COS_T
            AND (b.cscore < a.cscore
                 OR (b.cscore = a.cscore AND b.vec_id < a.vec_id)))
        SELECT d.source, CAST(count(*) AS BIGINT) AS n_vecs,
               CAST(count(*) FILTER (WHERE a.vec_id IN
                 (SELECT vec_id FROM dropd)) AS BIGINT) AS n_dropped,
               CAST(count(*) FILTER (WHERE a.vec_id NOT IN
                 (SELECT vec_id FROM dropd)) AS BIGINT) AS n_kept,
               CAST(count(*) FILTER (WHERE a.vec_id NOT IN
                 (SELECT vec_id FROM dropd)) AS BIGINT) * 10000
                 // CAST(count(*) AS BIGINT) AS kept_bp
        FROM casg a JOIN documents d ON d.doc_id = a.vec_id
        GROUP BY 1"""))
  )
}
