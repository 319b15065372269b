package graft.ingest

import java.net.{URI, URLEncoder}
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.time.{Duration, LocalDate}

import scala.util.Try

import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.ingest.EdinetClient.{DocMeta, Transport}

/** Concrete [[EdinetClient.Transport]] over `java.net.http.HttpClient`
  * — the wire protocol of the reference's EDINET calls:
  *
  *  - list: `GET {base}/documents.json?date=YYYY-MM-DD&type=2&
  *    Subscription-Key={key}`, JSON body with a `results` array
  *    (reference src/extract.py:82-87); metadata fields may be absent
  *    or null per document — they map to empty strings, matching the
  *    downstream flag dispatch (absent csvFlag ≠ "1" ⇒ not CSV).
  *  - fetch: `GET {base}/documents/{docId}?type={1|5}&
  *    Subscription-Key={key}`, raw archive bytes
  *    (reference src/extract.py:165-190).
  *
  * Any non-2xx status (the reference's `raise_for_status`) or
  * transport exception surfaces as a `Failure`, which the client's
  * retry/backoff/skip machinery ([[EdinetClient.withRetries]])
  * consumes — pacing and retries stay the CLIENT's job; this class
  * only moves bytes. One instance is thread-safe (HttpClient is), but
  * ingest is driver-side single-threaded by design (see
  * [[EdinetClient.RateLimiter]]).
  */
final class HttpTransport(
    baseUrl: String,
    apiKey: String,
    client: HttpClient = HttpTransport.defaultClient,
    requestTimeout: Duration = Duration.ofSeconds(30)) extends Transport {

  private def get[T](url: String, handler: HttpResponse.BodyHandler[T]): T = {
    val req = HttpRequest.newBuilder(URI.create(url))
      .timeout(requestTimeout)
      .GET()
      .build()
    val resp = client.send(req, handler)
    if (resp.statusCode() / 100 != 2) {
      // the query string carries Subscription-Key — report only
      // scheme/host/path so a logged Failure can never leak the key
      val u = URI.create(url)
      throw new java.io.IOException(
        s"HTTP ${resp.statusCode()} for ${u.getScheme}://${u.getAuthority}${u.getPath}")
    }
    resp.body()
  }

  /** Percent-encoding valid in BOTH query values and path segments:
    * URLEncoder emits form encoding, whose '+' means a literal plus in
    * a path (a docId with a space would silently 404) — map it to %20. */
  private def enc(s: String): String =
    URLEncoder.encode(s, StandardCharsets.UTF_8).replace("+", "%20")

  override def listDocuments(date: LocalDate): Try[Seq[DocMeta]] = Try {
    val url = s"$baseUrl/documents.json?date=${enc(date.toString)}" +
      s"&type=2&Subscription-Key=${enc(apiKey)}"
    HttpTransport.parseDocumentList(
      get(url, HttpResponse.BodyHandlers.ofString()))
  }

  override def fetchDocument(docId: String, fetchType: Int): Try[Array[Byte]] = Try {
    val url = s"$baseUrl/documents/${enc(docId)}" +
      s"?type=$fetchType&Subscription-Key=${enc(apiKey)}"
    get(url, HttpResponse.BodyHandlers.ofByteArray())
  }
}

object HttpTransport {

  /** No redirect-following: the EDINET endpoints answer directly, and a
    * silent redirect to an error page would corrupt archives. */
  private lazy val defaultClient: HttpClient =
    HttpClient.newBuilder()
      .connectTimeout(Duration.ofSeconds(10))
      .followRedirects(HttpClient.Redirect.NEVER)
      .build()

  /** Parse a document-list response body: the `results` array of the
    * reference's `documents.json` (FIXTURES.md §A2). Missing/null
    * string fields become "" — never null into the engine. A body
    * without a `results` array is an empty day, not an error
    * (mirrors the reference's `if response_data and 'results' in
    * response_data`, src/extract.py:124-126). */
  def parseDocumentList(body: String): Seq[DocMeta] = {
    def str(v: JValue): String = v match {
      case JString(s) => s
      case JInt(i) => i.toString
      case _ => ""
    }
    JsonMethods.parse(body) \ "results" match {
      case JArray(docs) => docs.map { d =>
        DocMeta(
          docID = str(d \ "docID"),
          edinetCode = str(d \ "edinetCode"),
          docTypeCode = str(d \ "docTypeCode"),
          csvFlag = str(d \ "csvFlag"),
          xbrlFlag = str(d \ "xbrlFlag"),
          submitDateTime = str(d \ "submitDateTime"))
      }
      case _ => Nil
    }
  }
}
