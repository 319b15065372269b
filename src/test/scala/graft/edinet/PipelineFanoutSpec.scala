package graft.edinet

import graft.SparkSpec

/** The parity pipeline at file fan-out: 200 companies' filings in one
  * run — proves the one-plan design scales with file count (each file is
  * an independent task; no per-file driver loop). */
class PipelineFanoutSpec extends SparkSpec {
  import EdinetFixtures._

  test("200 filings -> 1000 revenue rows in one declarative plan") {
    val dir = tempDir()
    // a master that covers E10000..E10199, all listed+consolidated
    val header = java.nio.file.Files.readAllBytes(writeMasterCsv(dir))
    val rows = (0 until 200).map { i =>
      f"E${10000 + i}%05d,法人,Listed company,Consolidated,100,3.31,会社$i%d,Company $i%03d,カナ,Tokyo,Industry${i % 7}%d,$i%04d,$i%013d"
    }
    val masterPath = dir.resolve("master200.csv")
    java.nio.file.Files.write(masterPath,
      (new String(header, Cp932).linesIterator.toSeq.head + "\n" + rows.mkString("\n"))
        .getBytes(Cp932))

    val files = dir.resolve("files")
    java.nio.file.Files.createDirectories(files)
    (0 until 200).foreach { i =>
      val code = f"E${10000 + i}%05d"
      if (i % 2 == 0)
        writeStatementCsv(files, s"${code}_20240401_120.csv",
          statementCsvContent(revenueElement = s"jpcrp_cor:Rev$i"))
      else
        writeXbrl(files, s"${code}_20240401_120.xbrl", xbrlContent())
    }

    val out = Pipeline.transform(spark, masterPath.toString, files.toString)
    assert(out.count() == 200L * 5)
    val perCompany = out.groupBy("companyname").count()
    assert(perCompany.count() == 200)
    assert(perCompany.filter(org.apache.spark.sql.functions.col("count") =!= 5).isEmpty)
  }
}
