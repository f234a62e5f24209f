package graft.multimodal

import graft.SparkSpec

/** The multimodal plumbing: decode runs per-partition, outputs are
  * deterministic, and the feature column has the embedding shape the
  * similarity operators consume. */
class MediaSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("feature extraction is deterministic and complete") {
    val a = Media.extractFeatures(Media.mediaRecords(spark, sfDir)).collect()
      .sortBy(_.doc_id)
    val b = Media.extractFeatures(Media.mediaRecords(spark, sfDir)).collect()
      .sortBy(_.doc_id)
    assert(a.length > 0)
    assert(a.length === b.length)
    a.zip(b).foreach { case (x, y) =>
      assert(x.doc_id === y.doc_id)
      assert(x.features.toSeq === y.features.toSeq)
    }
  }

  test("features have the embedding shape and sane ranges") {
    val rows = Media.extractFeatures(Media.mediaRecords(spark, sfDir))
      .collect()
    rows.foreach { r =>
      assert(r.features.length === 8)
      assert(r.features.forall(f => f >= 0.0f && f <= 1.0f))
      assert(r.width >= 64 && r.width < 64 + 1024)
      assert(r.height >= 64 && r.height < 64 + 1024)
      assert(r.n_bytes > 0)
    }
  }

  test("decode stub matches its spec (md5-derived dims)") {
    val codec = MediaCodec.open()
    val payload = "hello world".getBytes("UTF-8")
    val (w1, h1, f1) = codec.decodeStub(payload)
    val (w2, h2, f2) = MediaCodec.open().decodeStub(payload)
    assert((w1, h1) === ((w2, h2)))
    assert(f1.toSeq === f2.toSeq)
  }
}
