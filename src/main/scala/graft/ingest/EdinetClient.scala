package graft.ingest

import java.time.LocalDate

import scala.util.{Failure, Success, Try}

/** S4/S5 + N1/N2: the effectful EDINET ingestion client (reference
  * src/extract.py:72-146,165-235). Deliberately NOT a Spark query
  * (SURVEY §7.4.5): it is rate-limited, retrying, partially-failing
  * HTTP whose ordering the optimizer must not rearrange. The relational
  * engine starts at the manifest this client lands.
  *
  * The transport is injectable so tests (and this zero-egress
  * environment) run against canned responses; there is no live HTTP
  * here.
  */
object EdinetClient {

  /** One document-list entry (FIXTURES.md §A2). */
  final case class DocMeta(
      docID: String, edinetCode: String, docTypeCode: String,
      csvFlag: String, xbrlFlag: String, submitDateTime: String)

  /** Minimal transport: a list call per date and a byte fetch per doc.
    * Implementations decide how bytes move; the client owns pacing. */
  trait Transport {
    def listDocuments(date: LocalDate): Try[Seq[DocMeta]]
    def fetchDocument(docId: String, fetchType: Int): Try[Array[Byte]]
  }

  final case class Config(
      requestsPerSecond: Double = 10.0,
      maxRetries: Int = 3,
      retryDelayMs: Long = 1000,
      sleeper: Long => Unit = Thread.sleep)

  object Config {
    /** N6: build from the reference's settings.env keys
      * (config/settings.env: REQUEST_PER_SECOND, MAX_RETRIES,
      * RETRY_DELAY in seconds). Unknown/absent keys keep defaults;
      * unparsable values keep defaults rather than failing startup. */
    def fromEnv(env: Map[String, String]): Config = {
      def num[T](key: String, parse: String => T, dflt: T): T =
        env.get(key).flatMap(v => scala.util.Try(parse(v.trim)).toOption).getOrElse(dflt)
      val d = Config()
      Config(
        requestsPerSecond = num("REQUEST_PER_SECOND", _.toDouble, d.requestsPerSecond),
        maxRetries = num("MAX_RETRIES", _.toInt, d.maxRetries),
        retryDelayMs = num("RETRY_DELAY", s => (s.toDouble * 1000).toLong, d.retryDelayMs))
    }
  }

  /** N1: token-bucket pacing — at most requestsPerSecond, enforced by
    * inter-request spacing (the reference's LimiterAdapter,
    * src/extract.py:16-19). Single-threaded by design: ingest runs on
    * the driver; a distributed fetch would divide the budget per
    * executor. */
  final class RateLimiter(rps: Double, sleeper: Long => Unit, now: () => Long = System.nanoTime) {
    private val intervalNanos = (1e9 / rps).toLong
    private var nextAllowed = 0L
    def acquire(): Unit = synchronized {
      val t = now()
      if (t < nextAllowed) sleeper((nextAllowed - t) / 1000000L)
      nextAllowed = math.max(t, nextAllowed) + intervalNanos
    }
  }

  /** N2: bounded retries with exponential backoff; failure after the
    * last retry is a None, not an exception — one bad item never fails
    * the run (reference src/extract.py:122-141). */
  def withRetries[T](cfg: Config, limiter: RateLimiter)(op: => Try[T]): Option[T] = {
    var attempt = 0
    while (attempt <= cfg.maxRetries) {
      limiter.acquire()
      op match {
        case Success(v) => return Some(v)
        case Failure(_) =>
          attempt += 1
          if (attempt <= cfg.maxRetries)
            cfg.sleeper(cfg.retryDelayMs * (1L << (attempt - 1)))
      }
    }
    None
  }

  /** F2 + S4 + L3: inclusive daily range -> one list call per date,
    * failures skipped, results concatenated in date order.
    *
    * `limiter` defaults to a fresh bucket; callers running several
    * phases against the SAME API must pass one shared limiter, or the
    * configured budget applies per phase, not per client (the
    * reference's LimiterAdapter is session-wide, src/extract.py:16-19).
    */
  def documentsByDateRange(
      transport: Transport, cfg: Config,
      start: LocalDate, end: LocalDate,
      limiter: RateLimiter = null): Seq[DocMeta] = {
    val lim = Option(limiter).getOrElse(new RateLimiter(cfg.requestsPerSecond, cfg.sleeper))
    Iterator.iterate(start)(_.plusDays(1))
      .takeWhile(!_.isAfter(end))
      .flatMap(d => withRetries(cfg, lim)(transport.listDocuments(d)).getOrElse(Nil))
      .toSeq
  }

  /** P7/J2 happens in the engine; L1 + S5 here: fetch the first
    * `limit` docs' bytes (CSV type=5 preferred over XBRL type=1 per
    * S7), skipping failures. Returns (meta, ext, bytes). Share
    * `limiter` with the list phase (see [[documentsByDateRange]]). */
  def downloadDocuments(
      transport: Transport, cfg: Config,
      docs: Seq[DocMeta], limit: Option[Int],
      limiter: RateLimiter = null): Seq[(DocMeta, String, Array[Byte])] = {
    val lim = Option(limiter).getOrElse(new RateLimiter(cfg.requestsPerSecond, cfg.sleeper))
    val take = limit.fold(docs)(docs.take)
    take.flatMap { d =>
      graft.edinet.ArchiveExtract.targetExtension(d.csvFlag, d.xbrlFlag).flatMap { ext =>
        val fetchType = if (ext == "csv") 5 else 1
        withRetries(cfg, lim)(transport.fetchDocument(d.docID, fetchType))
          .map(bytes => (d, ext, bytes))
      }
    }
  }
}
