package graft.multimodal

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

  private def docs = graft.queries.Tables.t(spark, "/root/testdata/sf0.001", "documents")

  test("attachPayload: binary payload + typed meta struct, schema exact") {
    val df = Multimodal.attachPayload(docs, "doc_id", "text")
    val schema = df.schema
    assert(schema("payload").dataType.typeName == "binary")
    def shape(t: org.apache.spark.sql.types.StructType) =
      t.fields.map(f => (f.name, f.dataType)).toSeq
    assert(shape(schema("meta").dataType.asInstanceOf[org.apache.spark.sql.types.StructType])
      == shape(Multimodal.mediaMetaType))
    val r = df.select("meta.kind", "meta.n_bytes", "payload").limit(1).collect().head
    assert(Set("image", "audio", "video").contains(r.getString(0)))
    assert(r.getLong(1) == r.getAs[Array[Byte]](2).length.toLong)
  }

  test("extractFeatures: batched stub decode, deterministic, bad rows dropped") {
    val withPayload = Multimodal.attachPayload(docs, "doc_id", "text")
    val feats = Multimodal.extractFeatures(withPayload, "doc_id", Multimodal.StubCodec,
      batchSize = 7)
    assert(feats.schema == Multimodal.featureSchema)
    assert(feats.count() == docs.count()) // stub decodes every non-empty payload
    // deterministic across runs
    val a = feats.orderBy("id").collect()
    val b = Multimodal.extractFeatures(withPayload, "doc_id", Multimodal.StubCodec)
      .orderBy("id").collect()
    assert(a.sameElements(b))
    // mean intensity is a real function of the bytes (ASCII range)
    assert(a.forall(r => r.getAs[Double]("mean_intensity") > 32
      && r.getAs[Double]("mean_intensity") < 127))
  }

  test("rejecting codec drops rows instead of failing the job (N3 analog)") {
    val withPayload = Multimodal.attachPayload(docs, "doc_id", "text")
    val audioOnly = new Multimodal.Codec {
      override def decode(kind: String, payload: Array[Byte]) =
        if (kind == "audio") Multimodal.StubCodec.decode(kind, payload) else None
    }
    val feats = Multimodal.extractFeatures(withPayload, "doc_id", audioOnly)
    assert(feats.select("kind").distinct().collect().map(_.getString(0)).toSeq == Seq("audio"))
  }

  test("resizePayload subsamples bytes deterministically, binary in/out") {
    val withPayload = Multimodal.attachPayload(docs.limit(10), "doc_id", "text")
    val before = withPayload.select(col("doc_id"), octet_length(col("payload")).as("n"))
    val after = Multimodal.resizePayload(withPayload, "doc_id", 4)
    assert(after.schema("payload").dataType.typeName == "binary")
    val joined = before.join(after.withColumnRenamed("id", "doc_id"), "doc_id")
      .select(col("n"), octet_length(col("payload")).as("m")).collect()
    joined.foreach(r => assert(r.getInt(1) == (r.getInt(0) + 3) / 4))
  }

  test("sampleFrames explodes video rows at the step") {
    val withPayload = Multimodal.attachPayload(docs, "doc_id", "text")
    val feats = Multimodal.extractFeatures(withPayload, "doc_id", Multimodal.StubCodec)
    val frames = Multimodal.sampleFrames(feats, step = 2)
    val one = feats.filter(col("kind") === "video").orderBy("id").limit(1).collect().head
    val expect = (one.getAs[Int]("frames") + 1) / 2
    val got = frames.filter(col("id") === one.getAs[Long]("id")).count()
    assert(got == expect.toLong)
  }
}
