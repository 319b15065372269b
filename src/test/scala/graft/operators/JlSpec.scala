package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q130's distortion claim, measured: projecting 64 -> 16 dims through
  * the deterministic plane family keeps pairwise cosines within a band
  * tight enough to pre-filter with (JL theory: distortion concentrates
  * around ~1/sqrt(outDim)), and doubling outDim tightens it. */
class JlSpec extends SparkSpec {

  private def gaps(outDim: Int): Seq[Double] = {
    val e = graft.queries.Tables.t(spark, "/root/testdata/sf0.001", "embeddings")
      .filter(col("vec_id") < 16)
      .select(col("vec_id"), Similarity.toDouble(col("embedding")).as("v"))
      .select(col("vec_id"), col("v"),
        Similarity.jlProject(col("v"), outDim, 64, t = 90).as("r"))
      .select(col("vec_id"), col("v"), col("r"),
        sqrt(Similarity.dotD(col("v"), col("v"))).as("nv"),
        sqrt(Similarity.dotD(col("r"), col("r"))).as("nr"))
    val a = e.select(col("vec_id").as("id_a"), col("v").as("va"),
      col("r").as("ra"), col("nv").as("na"), col("nr").as("nra"))
    val b = e.select(col("vec_id").as("id_b"), col("v").as("vb"),
      col("r").as("rb"), col("nv").as("nb"), col("nr").as("nrb"))
    a.join(broadcast(b), col("id_a") < col("id_b"))
      .select(abs(Similarity.dotD(col("ra"), col("rb")) / (col("nra") * col("nrb"))
        - Similarity.dotD(col("va"), col("vb")) / (col("na") * col("nb"))).as("gap"))
      .collect().map(_.getAs[Double]("gap")).toSeq
  }

  test("cosine distortion stays in the JL band and tightens with outDim") {
    val g16 = gaps(16)
    val g32 = gaps(32)
    val (mean16, mean32) = (g16.sum / g16.size, g32.sum / g32.size)
    info(f"outDim=16: mean gap $mean16%.3f max ${g16.max}%.3f over ${g16.size} pairs")
    info(f"outDim=32: mean gap $mean32%.3f max ${g32.max}%.3f")
    // measured on the uniform harness corpus (near-orthogonal pairs —
    // JL's WORST case, the estimate's std is ~1/sqrt(outDim)):
    // outDim=16 mean 0.240 max 0.708; outDim=32 mean 0.147 max 0.590.
    // That is the audit's honest answer: 16 dims is a shortlist tool
    // here, not a drop-in replacement — exactly what q130 reports.
    assert(g16.size == 120, "16 probes -> 120 pairs")
    assert(mean16 < 0.3, f"mean distortion out of band: $mean16%.3f")
    assert(g16.max < 0.85, f"max distortion out of band: ${g16.max}%.3f")
    assert(mean32 < mean16, "doubling outDim should tighten mean distortion")
  }
}
