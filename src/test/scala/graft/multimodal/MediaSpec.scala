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

  test("resize fits the bounding box and preserves aspect") {
    val out = Media.resize(Media.mediaRecords(spark, sfDir), 128).collect()
    out.foreach { r =>
      assert(math.max(r.thumb_w, r.thumb_h) <= 128)
      assert(r.thumb_w >= 1 && r.thumb_h >= 1)
      // aspect preserved within integer rounding of the SMALL dimension
      val orig = r.width.toDouble / r.height
      val thumb = r.thumb_w.toDouble / r.thumb_h
      val tol = 1.0 / math.min(r.thumb_w, r.thumb_h) + 1e-9
      assert(math.abs(orig - thumb) / orig <= tol, s"aspect drift: $r")
      assert(r.thumb.nonEmpty)
    }
  }

  test("frame sampling strides through stub-decoded frames") {
    val records = Media.mediaRecords(spark, sfDir)
    val all = Media.sampleFrames(records, 1)
    val sampled = Media.sampleFrames(records, 4)
    val allCount = all.count()
    assert(allCount > records.count(), "expected multi-frame payloads")
    assert(sampled.count() < allCount)
    val idxs = sampled.collect().map(_.frame_idx)
    assert(idxs.forall(_ % 4 == 0), "stride not respected")
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
