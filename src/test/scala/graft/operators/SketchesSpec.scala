package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SketchesSpec extends SparkSpec {

  import spark.implicits._

  /** Exact frequencies of a toy stream: value i appears freq(i) times. */
  private def stream(freqs: Map[String, Int]): Seq[String] =
    freqs.toSeq.flatMap { case (v, f) => Seq.fill(f)(v) }

  test("MG candidates contain every N/k-heavy hitter, any partitioning") {
    // 2 heavy values above N/k, a long tail below it
    val freqs = Map("hot1" -> 400, "hot2" -> 300) ++
      (1 to 50).map(i => s"cold$i" -> 6).toMap
    val n = freqs.values.sum // 1000
    val k = 8                // bar = 125: hot1/hot2 in, every cold out
    val heavy = freqs.filter { case (_, f) => f.toLong * k > n }.keySet
    for (parts <- Seq(1, 3, 8)) {
      // adversarial order: sort so heavy runs cluster in one partition,
      // then a shuffled copy via hash order
      val sorted = stream(freqs).sorted
      val byHash = stream(freqs).sortBy(_.hashCode)
      for (data <- Seq(sorted, byHash)) {
        val ds = spark.createDataset(data).repartition(parts).as[String]
        val cands = Sketches.misraGriesCandidates(ds, k).collect().toSet
        assert(heavy.subsetOf(cands),
          s"parts=$parts lost ${heavy -- cands}")
        // candidate set is bounded by (k-1) x partitions
        assert(cands.size <= (k - 1) * parts + heavy.size)
      }
    }
  }

  test("two-pass MG + exact verify equals the one-pass exact answer") {
    val freqs = Map("a" -> 90, "b" -> 50, "c" -> 40) ++
      (1 to 20).map(i => s"t$i" -> 1).toMap
    val n = freqs.values.sum
    val k = 4
    val ds = spark.createDataset(stream(freqs)).repartition(5).as[String]
    val cands = Sketches.misraGriesCandidates(ds, k).toDF("v")
    val twoPass = ds.toDF("v").join(broadcast(cands), "v")
      .groupBy("v").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * k > n)
      .as[(String, Long)].collect().toMap
    val exact = freqs.collect {
      case (v, f) if f.toLong * k > n => v -> f.toLong
    }
    assert(twoPass == exact)
  }

  test("k below 2 is rejected") {
    val ds = spark.createDataset(Seq("x")).as[String]
    intercept[IllegalArgumentException] {
      Sketches.misraGriesCandidates(ds, 1)
    }
  }
}
