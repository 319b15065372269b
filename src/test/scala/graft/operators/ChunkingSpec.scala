package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ChunkingSpec extends SparkSpec {
  import spark.implicits._

  private def randText(seed: Int, n: Int): String = {
    val rnd = new scala.util.Random(seed)
    (1 to n).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
  }

  private def chunksOf(rows: Seq[(Long, String)]) =
    Chunking.cdcChunks(rows.toDF("doc_id", "text"), "text", "doc_id")

  test("chunks partition each document: contiguous indices, lengths sum to the text") {
    val txt = randText(7, 500)
    val out = chunksOf(Seq((1L, txt))).orderBy("chunk_idx").collect()
    assert(out.map(_.getAs[Int]("chunk_idx")).toSeq == (1 to out.length))
    assert(out.map(_.getAs[Long]("chunk_len")).sum == txt.length)
    assert(out.length > 3, s"expected several ~64-char chunks for 500 chars, got ${out.length}")
  }

  test("an insertion disturbs only local chunks (the content-defined property)") {
    val base = randText(11, 800)
    val edited = base.substring(0, 400) + "INSERTED-PAYLOAD" + base.substring(400)
    val out = chunksOf(Seq((1L, base), (2L, edited)))
      .collect().groupBy(_.getAs[Long]("doc_id"))
      .view.mapValues(_.map(_.getAs[Long]("chunk_hash")).toSeq).toMap
    val shared = out(1L).intersect(out(2L))
    // every chunk strictly before/after the edit window keeps its hash;
    // only the chunk(s) spanning the insertion point may change
    assert(shared.size >= out(1L).size - 3,
      s"edit should be local: ${out(1L).size} base chunks, only ${shared.size} survive")
    assert(out(2L).size >= out(1L).size - 3 && out(2L).size <= out(1L).size + 3)
  }

  test("degenerate inputs: empty text is one empty chunk, short text one chunk") {
    val out = chunksOf(Seq((1L, ""), (2L, "abc")))
      .collect().groupBy(_.getAs[Long]("doc_id"))
      .view.mapValues(_.map(r => (r.getAs[Int]("chunk_idx"), r.getAs[Long]("chunk_len"))).toSeq)
      .toMap
    assert(out(1L) == Seq((1, 0L)))
    assert(out(2L) == Seq((1, 3L)))
  }

  test("duplicateChunks surfaces cross-document boilerplate") {
    val boiler = randText(23, 300)
    val rows = Seq(
      (1L, boiler + randText(31, 200)),
      (2L, randText(37, 150) + boiler),
      (3L, randText(41, 250)))
    val dups = Chunking.duplicateChunks(chunksOf(rows), "doc_id").collect()
    assert(dups.nonEmpty, "shared 300-char boilerplate must yield shared chunk hashes")
    assert(dups.forall(_.getAs[Long]("n_docs") >= 2))
    val docsInvolved = chunksOf(rows).join(
      Chunking.duplicateChunks(chunksOf(rows), "doc_id").select("chunk_hash"), "chunk_hash")
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    assert(docsInvolved == Set(1L, 2L), s"only docs sharing boilerplate: $docsInvolved")
  }
}
