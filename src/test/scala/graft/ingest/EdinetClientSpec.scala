package graft.ingest

import java.time.LocalDate

import scala.collection.mutable.ArrayBuffer
import scala.util.{Failure, Success, Try}

import org.scalatest.funsuite.AnyFunSuite

import EdinetClient._

class EdinetClientSpec extends AnyFunSuite {

  private def meta(id: String) = DocMeta(id, "E00001", "120", "1", "0", "2024-04-01 09:00")

  private class FakeTransport(
      lists: Map[LocalDate, Try[Seq[DocMeta]]],
      fetches: Map[String, Seq[Try[Array[Byte]]]]) extends Transport {
    val fetchCalls = ArrayBuffer.empty[(String, Int)]
    private val remaining = collection.mutable.Map(
      fetches.view.mapValues(_.toBuffer).toSeq: _*)
    def listDocuments(date: LocalDate): Try[Seq[DocMeta]] =
      lists.getOrElse(date, Success(Nil))
    def fetchDocument(docId: String, fetchType: Int): Try[Array[Byte]] = {
      fetchCalls += ((docId, fetchType))
      remaining.get(docId).filter(_.nonEmpty)
        .map(_.remove(0)).getOrElse(Failure(new RuntimeException("no response")))
    }
  }

  private def cfg(sleeps: ArrayBuffer[Long]) =
    Config(requestsPerSecond = 1e9, retryDelayMs = 100, sleeper = sleeps += _)

  test("date range is inclusive and concatenates per-date results (F2/L3)") {
    val d1 = LocalDate.of(2024, 1, 1)
    val d3 = LocalDate.of(2024, 1, 3)
    val t = new FakeTransport(
      Map(
        d1 -> Success(Seq(meta("a"))),
        LocalDate.of(2024, 1, 2) -> Failure(new RuntimeException("boom")),
        d3 -> Success(Seq(meta("b"), meta("c")))),
      Map.empty)
    val out = documentsByDateRange(t, cfg(ArrayBuffer.empty), d1, d3)
    // the failing date is retried then skipped — partial results kept (N2)
    assert(out.map(_.docID) == Seq("a", "b", "c"))
  }

  test("retry with exponential backoff, then give up without throwing (N2)") {
    val sleeps = ArrayBuffer.empty[Long]
    val c = cfg(sleeps)
    val t = new FakeTransport(Map.empty, Map(
      "ok2" -> Seq(Failure(new RuntimeException), Success("z".getBytes)),
      "dead" -> Seq()))
    val out = downloadDocuments(t, c, Seq(meta("ok2"), meta("dead")), None)
    assert(out.map(_._1.docID) == Seq("ok2"))
    // ok2: one backoff at base delay; dead: 3 backoffs 100,200,400
    assert(sleeps.count(_ == 100) >= 2 && sleeps.contains(200) && sleeps.contains(400))
  }

  test("limit + format preference: csv (type 5) before xbrl (type 1) (L1/S7)") {
    val docs = Seq(
      meta("a"),
      meta("b").copy(csvFlag = "0", xbrlFlag = "1"),
      meta("skip").copy(csvFlag = "0", xbrlFlag = "0"),
      meta("beyond-limit"))
    val t = new FakeTransport(Map.empty, Map(
      "a" -> Seq(Success("x".getBytes)),
      "b" -> Seq(Success("y".getBytes))))
    val out = downloadDocuments(t, cfg(ArrayBuffer.empty), docs, Some(3))
    assert(out.map(d => (d._1.docID, d._2)) == Seq(("a", "csv"), ("b", "xbrl")))
    assert(t.fetchCalls.toSeq == Seq(("a", 5), ("b", 1)))
  }

  test("rate limiter spaces requests to the configured budget (N1)") {
    val sleeps = ArrayBuffer.empty[Long]
    var clock = 0L
    val rl = new RateLimiter(10.0, sleeps += _, () => clock)
    rl.acquire() // t=0, no sleep
    rl.acquire() // needs 100ms spacing
    rl.acquire()
    assert(sleeps.toSeq == Seq(100, 200))
  }
}
