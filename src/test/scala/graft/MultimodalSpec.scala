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
        (p.length, Multimodal.ByteHistogramCodec.features(p).map(v => math.rint(v * 1e6) / 1e6).toSeq)
    }.toMap
    assert(got == want)
    // histogram is a distribution
    got.values.foreach { case (_, f) =>
      assert(f.length == Multimodal.ByteHistogramCodec.Bins)
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

  test("ImageIOCodec round-trips a known-answer PNG exactly") {
    // 3x2 image, channels from the (docId=5, x, y) formula — hand-checkable.
    val png = Multimodal.pngBytes(5L, 3, 2)
    val f = Multimodal.ImageIOCodec.features(png)
    def s(cd: Long, cx: Long, cy: Long) =
      (for (y <- 0 until 2; x <- 0 until 3) yield (5 * cd + x * cx + y * cy) % 256).sum
    assert(f.toSeq == Seq(3.0, 2.0, s(31, 7, 13).toDouble, s(17, 3, 5).toDouble,
      s(29, 11, 19).toDouble))
  }

  test("pngDecode recovers the exact pixel formula for every image") {
    val rows = Multimodal.pngDecode(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val (w, h) = (r.getAs[Int]("width"), r.getAs[Int]("height"))
      assert(w == 16 + (id % 64) && h == 16 + (id % 48))
      var (sr, sg, sb) = (0L, 0L, 0L)
      for (y <- 0 until h; x <- 0 until w) {
        sr += (id * 31 + x * 7 + y * 13) % 256
        sg += (id * 17 + x * 3 + y * 5) % 256
        sb += (id * 29 + x * 11 + y * 19) % 256
      }
      assert((r.getAs[Long]("sum_r"), r.getAs[Long]("sum_g"), r.getAs[Long]("sum_b"))
        == ((sr, sg, sb)))
    }
  }

  test("WavCodec round-trips a known-answer waveform exactly") {
    val wav = Multimodal.wavBytes(7L, 16, 16000)
    val f = Multimodal.WavCodec.features(wav)
    val samples = (0 until 16).map(i => (7 * 31 + i.toLong * 7) % 65536 - 32768)
    assert(f.toSeq == Seq(16.0, 16000.0, samples.sum.toDouble,
      samples.min.toDouble, samples.max.toDouble))
  }

  test("wavDecode recovers the exact waveform formula for every clip") {
    val rows = Multimodal.wavDecode(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val n = r.getAs[Int]("n_samples")
      assert(n == 256 + (id % 1024))
      val samples = (0 until n).map(i => (id * 31 + i.toLong * 7) % 65536 - 32768)
      assert(r.getAs[Int]("sample_rate") == 16000)
      assert(r.getAs[Long]("sum_s") == samples.sum)
      assert(r.getAs[Int]("min_s") == samples.min.toInt)
      assert(r.getAs[Int]("max_s") == samples.max.toInt)
    }
  }

  test("PngVideoDemux splits a concatenated container into the exact frames") {
    val frames = (0 until 5).map(f => Multimodal.pngBytes(9L, 6, 4, f))
    val container = frames.reduce(_ ++ _)
    val got = Multimodal.PngVideoDemux.frames(container)
    assert(got.length == 5)
    got.zip(frames).foreach { case (g, w) => assert(g.sameElements(w)) }
    // corrupt container (stray bytes between frames) is rejected, not
    // silently mis-split
    intercept[IllegalArgumentException] {
      Multimodal.PngVideoDemux.frames(container.take(10) ++ container)
    }
  }

  test("videoDecode recovers the per-frame pixel formula for every video") {
    val rows = Multimodal.videoDecode(spark, sf).collect()
    assert(rows.nonEmpty)
    val byDoc = rows.groupBy(_.getAs[Long]("doc_id"))
    byDoc.foreach { case (id, rs) =>
      assert(rs.length == 8 + (id % 24), s"doc $id frame count")
      val (w, h) = (8 + (id % 16).toInt, 8 + (id % 12).toInt)
      rs.foreach { r =>
        val fno = r.getAs[Int]("frame_no")
        assert(r.getAs[Int]("width") == w && r.getAs[Int]("height") == h)
        var (sr, sg, sb) = (0L, 0L, 0L)
        for (y <- 0 until h; x <- 0 until w) {
          sr += (id * 31 + fno * 37L + x * 7 + y * 13) % 256
          sg += (id * 17 + fno * 41L + x * 3 + y * 5) % 256
          sb += (id * 29 + fno * 43L + x * 11 + y * 19) % 256
        }
        assert((r.getAs[Long]("sum_r"), r.getAs[Long]("sum_g"), r.getAs[Long]("sum_b"))
          == ((sr, sg, sb)), s"doc $id frame $fno")
      }
    }
  }

  test("dHash matches a scalar formula replay, pairs are pigeonhole-exact") {
    import graft.multimodal.Multimodal
    // scalar replay straight from the generating pixel formula (never
    // touches the codec or the bytes)
    def refHash(d: Long): Long = {
      val w = (16 + d % 64).toInt; val h = (16 + d % 48).toInt
      val s = Array.ofDim[Long](6, 11); val n = Array.ofDim[Long](6, 11)
      for (y <- 0 until h; x <- 0 until w) {
        val luma = (d * 31 + x * 7 + y * 13) % 256 +
          (d * 17 + x * 3 + y * 5) % 256 + (d * 29 + x * 11 + y * 19) % 256
        s((y * 6 / h).toInt)((x * 11 / w).toInt) += luma
        n((y * 6 / h).toInt)((x * 11 / w).toInt) += 1
      }
      (for (r <- 0 until 6; c <- 0 until 10
            if s(r)(c + 1) * n(r)(c) > s(r)(c) * n(r)(c + 1))
        yield 1L << (r * 10 + c)).sum
    }
    val hs = Multimodal.imageDHash(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hs.nonEmpty)
    hs.foreach { case (d, got) => assert(got == refHash(d), s"doc $d dhash") }
    // the banded equi-join returns EXACTLY the brute-force hamming<=9 set
    val want = (for {
      (d1, h1) <- hs.toSeq; (d2, h2) <- hs.toSeq if d1 < d2
      ham = java.lang.Long.bitCount(h1 ^ h2) if ham <= 9
    } yield (d1, d2, ham)).toSet
    val got = Multimodal.phashPairs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == want, s"pigeonhole drifted: ${got.size} vs ${want.size}")
    assert(want.nonEmpty, "fixture yields no near-dup image pairs at hamming 9")
  }

  test("resize halves dimensions and hashes the prefix") {
    Multimodal.resize(spark, sf).collect().foreach { r =>
      assert(r.getAs[Int]("width") >= 8 && r.getAs[Int]("width") <= 39)
      assert(r.getAs[Int]("height") >= 8 && r.getAs[Int]("height") <= 31)
    }
  }
}
