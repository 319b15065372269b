package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

import graft.functions.Portable
import graft.operators.Similarity

/** Pure-JVM property checks (scalacheck native runner; SURVEY §5.3). */
object PortableProps extends Properties("Portable") {

  property("pmd5Local in [0, 2^60)") = forAll { (s: String) =>
    val h = Portable.pmd5Local(s)
    h >= 0L && h < (1L << 60)
  }

  property("pmd5Local deterministic") = forAll { (s: String) =>
    Portable.pmd5Local(s) == Portable.pmd5Local(s)
  }

  property("native Pmd5Hash60.hash60 == pmd5Local for arbitrary strings") =
    forAll { (s: String) =>
      // the identity that keeps every oracle valid when the codegen
      // expression replaces the composed hex form on the Spark side
      graft.expressions.Pmd5Hash60.hash60(
        s.getBytes(java.nio.charset.StandardCharsets.UTF_8)) ==
        Portable.pmd5Local(s)
    }

  property("minhash params in range, multiplier nonzero") =
    forAll(Gen.choose(0, 1000)) { i =>
      val (a, b) = Portable.minhashParams(i)
      a >= 1 && a < Portable.MinhashP && b >= 0 && b < Portable.MinhashP
    }

  property("minhash affine map stays in field, no overflow") =
    forAll(Gen.choose(0, 63), Gen.choose(0L, Portable.MinhashP - 1)) { (i, h) =>
      val (a, b) = Portable.minhashParams(i)
      val v = (a * h + b) % Portable.MinhashP
      v >= 0 && v < Portable.MinhashP && a * h >= 0 // no silent wrap
    }

  property("SRP plane components in [-1, 1)") =
    forAll(Gen.choose(0, 7), Gen.choose(0, 15), Gen.choose(1, 64)) { (t, j, i) =>
      val c = Similarity.planeComponent(t, j, i)
      c >= -1.0 && c < 1.0
    }
}

object KllProps extends Properties("Kll") {
  import graft.functions.Kll

  private val dataGen = for {
    n <- Gen.choose(1, 800)
    xs <- Gen.listOfN(n, Gen.choose(-1000000L, 1000000L))
  } yield xs

  /** Arbitrary partitioning + fold tree over the data. */
  private def sketchOf(xs: List[Long], k: Int, chunk: Int): Kll.KllBuf =
    xs.grouped(math.max(1, chunk)).toSeq
      .map(_.foldLeft(Kll.empty)((b, v) => Kll.insert(b, v, k)))
      .reduce((a, b) => Kll.merge(a, b, k))

  private def exactQ(xs: List[Long], p: Int): Long = {
    val s = xs.sorted
    s((math.max(1L, (s.length.toLong * p + 99) / 100) - 1).toInt)
  }

  property("capacity >= n: exact under any partitioning, percent, data") =
    forAll(dataGen, Gen.choose(1, 200), Gen.oneOf(1, 10, 50, 90, 100)) {
      (xs, chunk, p) =>
        val b = sketchOf(xs, k = 1024, chunk)
        Kll.weight(b) == xs.length.toLong &&
          Kll.quantiles(b, Seq(p)).head == exactQ(xs, p)
    }

  property("compaction regime: state bounded, weight conserved exactly, result in data range") =
    forAll(dataGen, Gen.choose(2, 32), Gen.choose(1, 200)) { (xs, k, chunk) =>
      val b = sketchOf(xs, k, chunk)
      val levels = b.levels.size
      val sizeOk = b.levels.forall(_.size <= k)
      // compaction promotes only even counts (pairs conserve weight)
      // and parks the odd one out — weight == n is an exact invariant,
      // not a drift bound, under ANY k/partitioning/fold tree
      val weightOk = Kll.weight(b) == xs.length.toLong
      val q = Kll.quantiles(b, Seq(50)).head
      sizeOk && weightOk && q >= xs.min && q <= xs.max && levels <= 32
    }
}

object EdinetProps extends Properties("Edinet") {
  import graft.edinet.Model

  property("context decode total: year = fiscal + offset for all known contexts") =
    forAll(Gen.oneOf(Model.contextYearOffsets.keys.toSeq), Gen.choose(1990, 2030)) {
      (ctx, fy) =>
        val off = Model.contextYearOffsets(ctx)
        val year = fy + off
        year <= fy && year >= fy - 4
    }

  property("retry never exceeds maxRetries+1 attempts and never throws") = {
    import graft.ingest.EdinetClient._
    forAll(Gen.choose(0, 5), Gen.choose(0, 8)) { (maxRetries, failures) =>
      var calls = 0
      val cfg = Config(requestsPerSecond = 1e9, maxRetries = maxRetries,
        retryDelayMs = 0, sleeper = _ => ())
      val limiter = new RateLimiter(1e9, _ => ())
      val out = withRetries(cfg, limiter) {
        calls += 1
        if (calls <= failures) scala.util.Failure(new RuntimeException)
        else scala.util.Success(calls)
      }
      val expectedCalls = math.min(failures + 1, maxRetries + 1)
      calls == expectedCalls &&
        (out.isDefined == (failures <= maxRetries))
    }
  }
}
