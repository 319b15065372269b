package graft.ingest

import java.net.InetSocketAddress
import java.time.LocalDate
import java.util.concurrent.atomic.AtomicInteger

import scala.collection.mutable.ArrayBuffer

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** [[HttpTransport]] against a loopback stub server (JDK HttpServer —
  * zero egress): wire format of both endpoints, non-2xx -> Failure,
  * and the full client flow (429 storm -> backoff -> success; a
  * permanently-broken doc skipped while the rest download). */
class HttpTransportSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val listBody =
    """{"metadata":{"status":"200"},"results":[
      |  {"docID":"D1","edinetCode":"E00001","docTypeCode":"120",
      |   "csvFlag":"1","xbrlFlag":"1","submitDateTime":"2024-04-01 09:00"},
      |  {"docID":"D2","edinetCode":"E00002","docTypeCode":"140",
      |   "csvFlag":"0","xbrlFlag":"1","submitDateTime":null}
      |]}""".stripMargin

  private var server: HttpServer = _
  private var base: String = _
  private val d1Hits = new AtomicInteger(0)
  private val seenUris = ArrayBuffer.empty[String]

  override def beforeAll(): Unit = {
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    def reply(x: HttpExchange, code: Int, body: Array[Byte]): Unit = {
      x.sendResponseHeaders(code, if (body.isEmpty) -1 else body.length)
      if (body.nonEmpty) x.getResponseBody.write(body)
      x.close()
    }
    server.createContext("/api", { x: HttpExchange =>
      val uri = x.getRequestURI.toString
      seenUris.synchronized { seenUris += uri }
      val path = x.getRequestURI.getPath
      val q = Option(x.getRequestURI.getQuery).getOrElse("")
      if (!q.contains("Subscription-Key=k-123")) reply(x, 401, Array.empty)
      else if (path == "/api/documents.json") {
        if (q.contains("date=2024-01-02")) reply(x, 500, Array.empty)
        else if (q.contains("date=2024-01-03")) reply(x, 200, """{"metadata":{}}""".getBytes)
        else reply(x, 200, listBody.getBytes)
      } else if (path == "/api/documents/D1") {
        // two 429s, then the bytes: exercises retry + backoff
        if (d1Hits.incrementAndGet() <= 2) reply(x, 429, Array.empty)
        else reply(x, 200, "ZIPBYTES-D1".getBytes)
      } else if (path == "/api/documents/D2") reply(x, 503, Array.empty)
      else reply(x, 404, Array.empty)
    })
    server.start()
    base = s"http://127.0.0.1:${server.getAddress.getPort}/api"
  }

  override def afterAll(): Unit = server.stop(0)

  private def transport = new HttpTransport(base, "k-123")

  test("listDocuments parses the results array; null fields become empty strings (S4)") {
    val docs = transport.listDocuments(LocalDate.of(2024, 1, 1)).get
    assert(docs.map(_.docID) == Seq("D1", "D2"))
    assert(docs.head.csvFlag == "1" && docs.head.edinetCode == "E00001")
    assert(docs(1).submitDateTime == "", "null JSON field maps to empty string")
    val uri = seenUris.synchronized(seenUris.last)
    assert(uri.contains("date=2024-01-01") && uri.contains("type=2"),
      s"list request must carry date + type=2 params, got $uri")
  }

  test("a body without results is an empty day, not an error") {
    assert(transport.listDocuments(LocalDate.of(2024, 1, 3)).get.isEmpty)
  }

  test("non-2xx statuses surface as Failure (list 500, fetch 404, bad key 401)") {
    assert(transport.listDocuments(LocalDate.of(2024, 1, 2)).isFailure)
    assert(transport.fetchDocument("NOPE", 5).isFailure)
    assert(new HttpTransport(base, "wrong-key")
      .listDocuments(LocalDate.of(2024, 1, 1)).isFailure)
  }

  test("full client flow: 429s retried with backoff, dead doc skipped, " +
      "csv type=5 requested (N2/S5/S7)") {
    d1Hits.set(0)
    val sleeps = ArrayBuffer.empty[Long]
    val cfg = EdinetClient.Config(
      requestsPerSecond = 1e9, retryDelayMs = 100, sleeper = sleeps += _)
    val docs = EdinetClient.documentsByDateRange(
      transport, cfg, LocalDate.of(2024, 1, 1), LocalDate.of(2024, 1, 1))
    val out = EdinetClient.downloadDocuments(transport, cfg, docs, None)
    // D1 survives its two 429s (backoff 100 then 200 ms); D2's permanent
    // 503 exhausts retries and is skipped — partial results, no throw
    assert(out.map(d => (d._1.docID, d._2)) == Seq(("D1", "csv")))
    assert(new String(out.head._3) == "ZIPBYTES-D1")
    assert(sleeps.take(2).toSeq == Seq(100, 200))
    val d1Uri = seenUris.synchronized(
      seenUris.filter(_.contains("/documents/D1")).last)
    assert(d1Uri.contains("type=5"), "csvFlag=1 must fetch type=5 (CSV)")
  }
}
