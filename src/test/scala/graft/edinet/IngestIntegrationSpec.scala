package graft.edinet

import java.time.LocalDate

import scala.util.{Success, Try}

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ingest.EdinetClient
import graft.ingest.EdinetClient._

/** End-to-end E->T->L against canned transport responses: list call ->
  * semi-join filter -> download (format preference) -> in-task ZIP
  * extraction -> best-file selection -> parse -> revenue output. The
  * whole reference main() path (SURVEY §3.1), zero network. */
class IngestIntegrationSpec extends SparkSpec {
  import EdinetFixtures._

  private def doc(id: String, code: String, docType: String = "120",
      csvFlag: String = "1", xbrlFlag: String = "0") =
    DocMeta(id, code, docType, csvFlag, xbrlFlag, "2024-04-01 09:00")

  test("list -> filter -> download -> unzip -> pipeline -> revenue rows") {
    val dir = tempDir()
    val master = writeMasterCsv(dir).toString

    val alphaZip = zipBytes(Seq(
      "XBRL/PublicDoc/stmt.csv" -> statementCsvContent().getBytes(Utf16)))
    val zetaZip = zipBytes(Seq(
      "XBRL/PublicDoc/inst.xbrl" -> xbrlContent().getBytes("UTF-8")))

    val transport = new Transport {
      override def listDocuments(date: LocalDate): Try[Seq[DocMeta]] = Success(Seq(
        doc("d1", "E00001"),
        doc("d2", "E00006", csvFlag = "0", xbrlFlag = "1"),
        doc("d3", "E00003"),        // unlisted -> filtered by master semi-join
        doc("d4", "E00002", csvFlag = "0", xbrlFlag = "0"))) // no format -> skipped
      override def fetchDocument(docId: String, fetchType: Int): Try[Array[Byte]] =
        docId match {
          case "d1" => assert(fetchType == 5); Success(alphaZip)
          case "d2" => assert(fetchType == 1); Success(zetaZip)
          case other => Success(zipBytes(Seq("x.csv" -> "bad".getBytes("UTF-8"))))
        }
    }
    val cfg = Config(requestsPerSecond = 1e9, sleeper = _ => ())

    // E: list + company-filter (broadcast semi-join against the master)
    val docs = documentsByDateRange(transport, cfg,
      LocalDate.of(2024, 4, 1), LocalDate.of(2024, 4, 1))
    val companies = CompanyMaster.load(spark, master)
    val codes = companies.select(col(Model.MasterCols.EdinetCode))
      .collect().map(_.getString(0)).toSet
    // d3 drops (not in master); d4 SURVIVES here — the format skip is a
    // download-stage concern (S7), matching the reference's ordering
    val wanted = docs.filter(d => codes.contains(d.edinetCode))
      .filter(d => Model.targetDocTypes.contains(d.docTypeCode))
    assert(wanted.map(_.docID) == Seq("d1", "d2", "d4"))

    // download with format preference + in-task ZIP extraction
    val fetched = downloadDocuments(transport, cfg, wanted, None)
    assert(fetched.map(_._2) == Seq("csv", "xbrl"))
    import spark.implicits._
    val archives = fetched.map { case (m, ext, bytes) =>
      (m.docID, bytes, m.edinetCode, "20240401", m.docTypeCode, ext)
    }.toDF("docID", "zip", "edinetCode", "submitYmd", "docTypeCode", "ext")
    val extracted = ArchiveExtract.extractBest(spark, archives).collect()
    assert(extracted.map(_.getAs[String]("path")).sorted.toSeq ==
      Seq("E00001_20240401_120.csv", "E00006_20240401_120.xbrl"))

    // land the extracted members, run the relational pipeline
    val files = dir.resolve("landed")
    java.nio.file.Files.createDirectories(files)
    extracted.foreach { r =>
      java.nio.file.Files.write(
        files.resolve(r.getAs[String]("path")), r.getAs[Array[Byte]]("content"))
    }
    val out = Pipeline.transform(spark, master, files.toString)
    val byCompany = out.collect().groupBy(_.getAs[String]("companyname"))
    assert(byCompany.keySet == Set("Alpha Corp", "Zeta Holdings"))
    assert(byCompany("Alpha Corp").length == 5)
    assert(byCompany("Zeta Holdings").length == 5)
  }
}
