package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.Multimodal

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("media table: payload is the utf-8 text, metadata typed by modality") {
    val docs = Tables.documents(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    val rows = Multimodal.mediaTable(spark, sf).collect()
    assert(rows.length == docs.size)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(new String(r.getAs[Array[Byte]]("payload"), "UTF-8") == docs(id))
      val meta = r.getStruct(3)
      val mod = r.getAs[String]("modality")
      assert(mod == Seq("image", "audio", "video")((id % 3).toInt))
      mod match {
        case "image" =>
          assert(meta.getAs[Int]("width") > 0 && meta.getAs[Int]("n_frames") == 0)
        case "audio" =>
          assert(meta.getAs[Int]("sample_rate") == 16000 && meta.getAs[Int]("width") == 0)
        case "video" =>
          assert(meta.getAs[Int]("width") > 0 && meta.getAs[Int]("n_frames") >= 8)
      }
    }
  }

  test("extractFeatures matches a scalar run of the codec exactly") {
    val got = Multimodal.extractFeatures(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Int]("n_bytes"), r.getAs[scala.collection.Seq[Double]]("features").toSeq))
      .toMap
    val want = Multimodal.mediaTable(spark, sf).collect().map { r =>
      val p = r.getAs[Array[Byte]]("payload")
      r.getAs[Long]("doc_id") ->
        (p.length, Multimodal.FakeCodec.features(p).map(v => math.rint(v * 1e6) / 1e6).toSeq)
    }.toMap
    assert(got == want)
    // histogram is a distribution
    got.values.foreach { case (_, f) =>
      assert(f.length == Multimodal.FakeCodec.Bins)
      assert(math.abs(f.sum - 1.0) < 1e-3)
    }
  }

  test("frameSample: every stride-th frame, frames tile the payload prefix") {
    val media = Multimodal.mediaTable(spark, sf).collect()
      .filter(_.getAs[String]("modality") == "video")
      .map { r =>
        val meta = r.getStruct(3)
        r.getAs[Long]("doc_id") -> (r.getAs[Array[Byte]]("payload"), meta.getAs[Int]("n_frames"))
      }.toMap
    val rows = Multimodal.frameSample(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (payload, nFrames) = media(r.getAs[Long]("doc_id"))
      val fsize = payload.length / nFrames
      val frameNo = r.getAs[Int]("frame_no")
      assert(frameNo % 4 == 0 && frameNo < nFrames)
      assert(r.getAs[Int]("frame_bytes") == fsize)
      val expected = payload.slice(frameNo * fsize, frameNo * fsize + fsize)
      val expMd5 = java.security.MessageDigest.getInstance("MD5").digest(expected)
        .map("%02x".format(_)).mkString
      assert(r.getAs[String]("frame_md5") == expMd5)
    }
  }

  test("resize halves dimensions and hashes the prefix") {
    Multimodal.resize(spark, sf).collect().foreach { r =>
      assert(r.getAs[Int]("width") >= 8 && r.getAs[Int]("width") <= 39)
      assert(r.getAs[Int]("height") >= 8 && r.getAs[Int]("height") <= 31)
    }
  }
}
