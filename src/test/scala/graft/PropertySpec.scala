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
