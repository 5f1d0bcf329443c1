package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal columns (driver-extension mandate — no reference counterpart):
  * image/audio/video as opaque `binary` columns with typed metadata, plus
  * decode / feature-extract / resize / frame-sample operators.
  *
  * The media table is derived deterministically from the `documents`
  * fixture (payload = UTF-8 bytes of the text; modality cycles by doc_id),
  * because the fixtures carry no real media — the POINT here is the
  * Spark-side plumbing: an explicit schema with a `binary` payload + a
  * typed `meta` struct, partition-parallel batch decode via
  * `mapPartitions` over a typed `Dataset` (the Scala analog of
  * `mapInPandas`: one iterator per partition, rows processed in a batch
  * loop, no per-row driver involvement), and frame sampling as pure
  * column/array expressions.
  *
  * Decoders: all three modalities are REAL — [[ImageIOCodec]] decodes
  * PNG with pure-JVM `javax.imageio`, [[WavCodec]] decodes RIFF/WAV PCM
  * with pure-JVM `javax.sound.sampled`, and [[PngVideoDemux]] demuxes an
  * MJPEG-style video container (concatenated per-frame PNG streams,
  * split by walking the PNG chunk grammar — signature, then chunks to
  * IEND) and decodes each frame through [[ImageIOCodec]]. The
  * `mm_png_decode` / `mm_wav_decode` / `mm_video_decode` oracles prove
  * each encode→decode round trip sample-exactly by replaying the
  * generating formula without ever seeing the bytes. An H.264 decoder is
  * not in this container; swapping one into the [[MediaCodec]] seam
  * changes no schema, partitioning, or batch shape.
  *
  * Scale notes (100 TB posture): payloads never leave executors (no
  * collect); decode is narrow (mapPartitions, zero shuffle); frame
  * sampling is an in-row array expression followed by posexplode —
  * shuffle-free until the caller aggregates. Binary columns in Parquet
  * are page-compressed and column-pruned like any other, so a
  * metadata-only query never reads payload bytes.
  */
object Multimodal {

  /** ImageIO's default stream cache is a TEMP FILE per read/write — at
    * tens of thousands of frame codec calls per task that serializes the
    * whole stage on file creation. Payloads here are KB-sized, so
    * memory-cached streams are strictly better; flipped once per JVM,
    * lazily, before the first codec call.
    */
  private[multimodal] lazy val imageIoMemoryStreams: Unit =
    javax.imageio.ImageIO.setUseCache(false)

  /** Partition width for the CPU-bound codec stages: the session shuffle
    * width (the cluster's parallelism knob), pinned EXPLICITLY so AQE's
    * small-partition coalescing can't fold the tiny metadata rows — and
    * with them the expensive per-row encode/decode work — onto one task.
    */
  private def codecWidth(spark: SparkSession): Int =
    spark.conf.get("spark.sql.shuffle.partitions").toInt

  /** Typed row for the codec path (binary payload + typed metadata). */
  final case class MediaRow(doc_id: Long, modality: String, payload: Array[Byte],
                            width: Int, height: Int, n_frames: Int, sample_rate: Int)

  final case class MediaFeatures(doc_id: Long, modality: String,
                                 n_bytes: Int, features: Array[Double])

  /** Pluggable decode step. Implementations decode the payload (image
    * pixels / audio samples / video frames) and emit a feature vector.
    */
  trait MediaCodec extends Serializable {
    def features(payload: Array[Byte]): Array[Double]
  }

  /** Content-agnostic payload featurizer: a 16-bin normalized byte
    * histogram. Not a decoder stand-in — the modality-aware decoders are
    * [[ImageIOCodec]]/[[WavCodec]]/[[PngVideoDemux]]; this is the
    * cheap first-pass signal a data pipeline computes on EVERY payload
    * (corrupt-blob triage, format drift detection) before paying for a
    * real decode, and it is exactly SQL-replayable (mm_features).
    */
  object ByteHistogramCodec extends MediaCodec {
    val Bins = 16
    def features(payload: Array[Byte]): Array[Double] = {
      val h = new Array[Double](Bins)
      payload.foreach(b => h((b & 0xff) % Bins) += 1.0)
      val n = math.max(1, payload.length).toDouble
      h.map(_ / n)
    }
  }

  /** Real image codec: decodes a PNG/JPEG payload with pure-JVM
    * `javax.imageio` and emits `[width, height, sumR, sumG, sumB]`.
    * Channel sums over a ≤127×127 image fit a Double exactly
    * (max 255·16129 ≪ 2^53), so the feature signature stays lossless.
    */
  object ImageIOCodec extends MediaCodec {
    def features(payload: Array[Byte]): Array[Double] = {
      Multimodal.imageIoMemoryStreams
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      require(img != null, "payload is not a decodable image")
      var (sr, sg, sb) = (0L, 0L, 0L)
      var y = 0
      while (y < img.getHeight) {
        var x = 0
        while (x < img.getWidth) {
          val rgb = img.getRGB(x, y)
          sr += (rgb >> 16) & 0xff; sg += (rgb >> 8) & 0xff; sb += rgb & 0xff
          x += 1
        }
        y += 1
      }
      Array(img.getWidth.toDouble, img.getHeight.toDouble,
        sr.toDouble, sg.toDouble, sb.toDouble)
    }
  }

  /** Real audio codec: decodes a RIFF/WAV payload with pure-JVM
    * `javax.sound.sampled` and emits
    * `[n_samples, sample_rate, sum, min, max]` over the 16-bit PCM
    * samples. Sums fit a Double exactly (|sample| < 2^15, n ≪ 2^38).
    */
  object WavCodec extends MediaCodec {
    def features(payload: Array[Byte]): Array[Double] = {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      val fmt = in.getFormat
      require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1,
        "codec expects 16-bit mono PCM")
      val bytes = in.readAllBytes()
      val bb = java.nio.ByteBuffer.wrap(bytes).order(
        if (fmt.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN
        else java.nio.ByteOrder.LITTLE_ENDIAN)
      var n = 0L; var sum = 0L
      var mn = Int.MaxValue; var mx = Int.MinValue
      while (bb.remaining() >= 2) {
        val s = bb.getShort.toInt
        n += 1; sum += s
        if (s < mn) mn = s
        if (s > mx) mx = s
      }
      Array(n.toDouble, fmt.getSampleRate.toDouble, sum.toDouble,
        mn.toDouble, mx.toDouble)
    }
  }

  /** Deterministic 16-bit mono PCM WAV: sample i is a pure function of
    * (docId, i), so an oracle can replay the waveform in SQL without
    * ever seeing the bytes. PCM is lossless — decode must recover these
    * exact samples.
    */
  private[graft] def wavBytes(docId: Long, nSamples: Int, sampleRate: Int): Array[Byte] = {
    val data = new Array[Byte](nSamples * 2)
    val bb = java.nio.ByteBuffer.wrap(data).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var i = 0
    while (i < nSamples) {
      bb.putShort((((docId * 31 + i.toLong * 7) % 65536) - 32768).toShort)
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, nSamples.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Audio table with REAL WAV payloads (executor-generated, like
    * [[imageTable]]); sample rate matches [[mediaTable]]'s audio meta.
    */
  def audioTable(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .where(pmod(col("doc_id"), lit(3)) === 1)
      .select(col("doc_id"),
        (lit(256) + pmod(col("doc_id"), lit(1024))).cast("int").as("n_samples"))
      .repartition(codecWidth(spark), col("doc_id")) // see codecWidth
      .as[(Long, Int)]
      .mapPartitions(_.map { case (id, n) => (id, n, wavBytes(id, n, 16000)) })
      .toDF("doc_id", "n_samples", "payload")
  }

  /** Decode the WAV payloads back through [[WavCodec]]; counts and sample
    * stats come from the DECODED stream, so the oracle's waveform-formula
    * replay certifies the encode→decode round trip (same contract as
    * [[pngDecode]]).
    */
  def wavDecode(spark: SparkSession, dir: String,
                codec: MediaCodec = WavCodec): DataFrame = {
    import spark.implicits._
    audioTable(spark, dir)
      .select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, wav) =>
        val f = codec.features(wav)
        (id, f(0).toInt, f(1).toInt, f(2).toLong, f(3).toInt, f(4).toInt)
      })
      .toDF("doc_id", "n_samples", "sample_rate", "sum_s", "min_s", "max_s")
  }

  /** Deterministic tiny PNG: each channel is a pure function of
    * (docId, frame, x, y), so an oracle can replay the pixel values in
    * SQL without ever seeing the bytes. PNG is lossless — decode must
    * recover these exact channels. The frame term vanishes at frame = 0,
    * so still images and video frames share one formula family.
    */
  private[graft] def pngBytes(docId: Long, w: Int, h: Int, frame: Int = 0): Array[Byte] = {
    imageIoMemoryStreams
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = ((docId * 31 + frame * 37L + x * 7 + y * 13) % 256).toInt
        val g = ((docId * 17 + frame * 41L + x * 3 + y * 5) % 256).toInt
        val b = ((docId * 29 + frame * 43L + x * 11 + y * 19) % 256).toInt
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Image table with REAL PNG payloads, generated on executors inside
    * `mapPartitions` (the same batch shape a production ingest uses —
    * payload bytes are born and stay executor-side, never on the driver).
    * Dimensions match [[mediaTable]]'s image metadata.
    */
  def imageTable(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .where(pmod(col("doc_id"), lit(3)) === 0)
      .select(col("doc_id"),
        (lit(16) + pmod(col("doc_id"), lit(64))).cast("int").as("width"),
        (lit(16) + pmod(col("doc_id"), lit(48))).cast("int").as("height"))
      .repartition(codecWidth(spark), col("doc_id")) // see codecWidth
      .as[(Long, Int, Int)]
      .mapPartitions(_.map { case (id, w, h) => (id, w, h, pngBytes(id, w, h)) })
      .toDF("doc_id", "width", "height", "payload")
  }

  /** Decode the PNG payloads back through [[ImageIOCodec]] and emit the
    * per-image channel sums. Width/height come from the DECODED image
    * (not the metadata) and the sums from the DECODED pixels, so the
    * oracle's formula replay certifies the full encode→decode round trip.
    */
  def pngDecode(spark: SparkSession, dir: String,
                codec: MediaCodec = ImageIOCodec): DataFrame = {
    import spark.implicits._
    imageTable(spark, dir)
      .select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, png) =>
        val f = codec.features(png)
        (id, f(0).toInt, f(1).toInt, f(2).toLong, f(3).toLong, f(4).toLong)
      })
      .toDF("doc_id", "width", "height", "sum_r", "sum_g", "sum_b")
  }

  /** 60-bit perceptual dHash over the DECODED image (r7 verdict ask 6 —
    * multimodal near-dup): luma (= r+g+b, integer, no fp weights) is
    * block-averaged onto a 6-row × 11-col grid (cell of pixel (x,y) is
    * (y·6/h, x·11/w), integer division — every image ≥16×16 fills every
    * cell) and bit (r,c) = 1 iff the mean of cell (r,c+1) exceeds the
    * mean of cell (r,c), compared CROSS-MULTIPLIED (s₂·n₁ > s₁·n₂, exact
    * integers — block sizes differ when w∤11, so dividing would put fp
    * between the engines). 6 rows × 10 comparisons = 60 bits, the repo's
    * SimHash width, so the pigeonhole band machinery carries over
    * unchanged. Hash of the DECODED pixels: the oracle replays the
    * generating pixel formula, so a hash match certifies decode +
    * downsample + packing end to end (the mm_png_decode contract).
    */
  object DHashCodec extends Serializable {
    val Rows = 6
    val Cols = 11
    def dhash60(payload: Array[Byte]): Long = {
      Multimodal.imageIoMemoryStreams
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      require(img != null, "payload is not a decodable image")
      val w = img.getWidth; val h = img.getHeight
      val s = Array.ofDim[Long](Rows, Cols)
      val n = Array.ofDim[Long](Rows, Cols)
      var y = 0
      while (y < h) {
        val r = y * Rows / h
        var x = 0
        while (x < w) {
          val c = x * Cols / w
          val rgb = img.getRGB(x, y)
          s(r)(c) += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
          n(r)(c) += 1
          x += 1
        }
        y += 1
      }
      var bits = 0L
      var r = 0
      while (r < Rows) {
        var c = 0
        while (c < Cols - 1) {
          if (s(r)(c + 1) * n(r)(c) > s(r)(c) * n(r)(c + 1))
            bits |= 1L << (r * (Cols - 1) + c)
          c += 1
        }
        r += 1
      }
      bits
    }
  }

  /** Per-image dHash table (doc_id, dhash). Memoized: the decode+hash
    * pass feeds both sides of the pair self-join.
    */
  def imageDHash(spark: SparkSession, dir: String): DataFrame =
    graft.Caches.memoized(spark, dir, "mm:phash") {
      import spark.implicits._
      imageTable(spark, dir)
        .select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
        .mapPartitions(_.map { case (id, png) => (id, DHashCodec.dhash60(png)) })
        .toDF("doc_id", "dhash")
    }

  /** Perceptual near-dup image pairs: hamming(dhash) ≤ maxHamming,
    * EXACT via the pigeonhole band join (maxHamming+1 disjoint 6-bit
    * blocks — a pair within the bound agrees on ≥1 whole block, so
    * candidates are an equi-join on (block, value), verified by
    * bit_count; the Dedup.simhashPairs shape on the image modality).
    * Never the n² loop — the join survives a 1000× corpus.
    */
  def phashPairs(spark: SparkSession, dir: String, maxHamming: Int = 9): DataFrame = {
    require(maxHamming == 9, "banding fixed at 10x6 bits")
    val blocks = dhashBlocks(imageDHash(spark, dir))
    blocks.toDF("d1", "h1", "blk", "bval")
      .join(blocks.toDF("d2", "h2", "blk2", "bval2"),
        col("blk") === col("blk2") && col("bval") === col("bval2") && col("d1") < col("d2"))
      .select(col("d1"), col("d2"),
        bit_count(col("h1").bitwiseXOR(col("h2"))).as("hamming"))
      .where(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Banded block explosion of the dHash table (10 bands × 6 bits) —
    * shared by the pair join and the query-by-image search.
    */
  private def dhashBlocks(hs: DataFrame): DataFrame =
    hs.select(col("doc_id"), col("dhash"),
      explode(expr("transform(sequence(0, 9), " +
        "b -> struct(b AS blk, shiftright(dhash, b*6) & 63 AS bval))")).as("bk"))
      .select(col("doc_id"), col("dhash"), col("bk.blk").as("blk"),
        col("bk.bval").as("bval"))

  /** Query-by-image: top-k perceptual neighbors of each query image by
    * dHash Hamming distance, candidates restricted to images sharing ≥1
    * of the 10 bands (the mm_phash_pairs machinery pointed at a bounded
    * query set instead of all-pairs — the ANN probe next to sim_topk's
    * embedding probes). Deterministic end to end: a true neighbor
    * differing in every band is invisible to BOTH engines identically,
    * the documented banding contract.
    */
  def phashSearch(spark: SparkSession, dir: String,
                  queryDocs: Seq[Long] = Seq(0L, 57L), k: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val blocks = dhashBlocks(imageDHash(spark, dir))
    val qb = blocks.where(col("doc_id").isin(queryDocs: _*))
      .toDF("qdoc", "qh", "blk", "bval")
    qb.join(blocks.toDF("doc_id", "h", "blk2", "bval2"),
        col("blk") === col("blk2") && col("bval") === col("bval2") &&
          col("qdoc") =!= col("doc_id"))
      .select(col("qdoc"), col("qh"), col("doc_id"), col("h")).distinct()
      .select(col("qdoc"), col("doc_id"),
        bit_count(col("qh").bitwiseXOR(col("h"))).as("hamming"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("qdoc")).orderBy(col("hamming"), col("doc_id"))))
      .where(col("rank") <= k)
  }

  /** MJPEG-style video demuxer: the container is a bare concatenation of
    * per-frame PNG streams, and frames are split by walking the PNG
    * grammar — 8-byte signature, then length-prefixed chunks up to and
    * including IEND — NOT by scanning for magic bytes (compressed IDAT
    * data could contain the signature; the chunk walk cannot false-split).
    * This is the real demux-then-decode shape of a production video
    * reader; only the codec inside each frame differs from H.264.
    */
  object PngVideoDemux extends Serializable {
    private val Signature = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

    /** Split a concatenated-PNG payload into its frame byte ranges. */
    def frames(payload: Array[Byte]): Seq[Array[Byte]] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
      var pos = 0
      while (pos < payload.length) {
        val start = pos
        require(pos + 8 <= payload.length &&
          java.util.Arrays.equals(payload, pos, pos + 8, Signature, 0, 8),
          s"not a PNG frame boundary at offset $pos")
        pos += 8
        var done = false
        while (!done) {
          require(pos + 8 <= payload.length, "truncated PNG chunk header")
          val len = java.nio.ByteBuffer.wrap(payload, pos, 4).getInt
          val ctype = new String(payload, pos + 4, 4, "US-ASCII")
          pos += 8 + len + 4 // header + data + crc
          require(pos <= payload.length, "truncated PNG chunk body")
          if (ctype == "IEND") done = true
        }
        out += java.util.Arrays.copyOfRange(payload, start, pos)
      }
      out.toSeq
    }
  }

  /** Video table with REAL concatenated-PNG payloads (executor-generated
    * inside `mapPartitions`, like [[imageTable]]); n_frames matches
    * [[mediaTable]]'s video meta, frame dims are deterministic per doc.
    */
  def videoTable(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .where(pmod(col("doc_id"), lit(3)) === 2)
      .select(col("doc_id"),
        (lit(8) + pmod(col("doc_id"), lit(24))).cast("int").as("n_frames"),
        (lit(8) + pmod(col("doc_id"), lit(16))).cast("int").as("width"),
        (lit(8) + pmod(col("doc_id"), lit(12))).cast("int").as("height"))
      // the parquet scan yields few partitions at fixture scale and AQE
      // coalesces a width-free repartition of tiny metadata rows back to
      // ~1 partition — which would serialize the CPU-bound codec stage on
      // one thread. An EXPLICIT width is exempt from AQE coalescing.
      .repartition(codecWidth(spark), col("doc_id"))
      .as[(Long, Int, Int, Int)]
      .mapPartitions(_.map { case (id, nf, w, h) =>
        val bos = new java.io.ByteArrayOutputStream()
        var f = 0
        while (f < nf) { bos.write(pngBytes(id, w, h, f)); f += 1 }
        (id, nf, w, h, bos.toByteArray)
      })
      .toDF("doc_id", "n_frames", "width", "height", "payload")
  }

  /** Demux + decode the video payloads: [[PngVideoDemux]] splits the
    * container into frames, [[ImageIOCodec]] decodes each one; dims and
    * channel sums come from the DECODED pixels, so the oracle's
    * per-(doc, frame) formula replay certifies container splitting AND
    * frame decoding end-to-end. Narrow (mapPartitions, zero shuffle);
    * frame bytes never leave the executor.
    */
  def videoDecode(spark: SparkSession, dir: String,
                  frameCodec: MediaCodec = ImageIOCodec): DataFrame = {
    import spark.implicits._
    videoTable(spark, dir)
      .select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, video) =>
        PngVideoDemux.frames(video).iterator.zipWithIndex.map { case (png, i) =>
          val f = frameCodec.features(png)
          (id, i, f(0).toInt, f(1).toInt, f(2).toLong, f(3).toLong, f(4).toLong)
        }
      })
      .toDF("doc_id", "frame_no", "width", "height", "sum_r", "sum_g", "sum_b")
  }

  /** The media table: (doc_id, modality, payload binary, meta struct).
    * Deterministic derivation from `documents`; metadata is
    * modality-typed (images get width/height, video adds n_frames, audio
    * gets sample_rate; unused slots are 0).
    */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("modality"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        when(pmod(col("doc_id"), lit(3)) =!= 1, (lit(16) + pmod(col("doc_id"), lit(64))).cast("int"))
          .otherwise(lit(0)).as("width"),
        when(pmod(col("doc_id"), lit(3)) =!= 1, (lit(16) + pmod(col("doc_id"), lit(48))).cast("int"))
          .otherwise(lit(0)).as("height"),
        when(pmod(col("doc_id"), lit(3)) === 2, (lit(8) + pmod(col("doc_id"), lit(24))).cast("int"))
          .otherwise(lit(0)).as("n_frames"),
        when(pmod(col("doc_id"), lit(3)) === 1, lit(16000)).otherwise(lit(0))
          .cast("int").as("sample_rate")).as("meta"))

  /** Payload-level decode stats — pure column expressions (length +
    * content hash), fully SQL-expressible for the oracle. A real pipeline
    * runs this first to drop corrupt/empty payloads before decode.
    */
  def decodeStats(spark: SparkSession, dir: String): DataFrame =
    mediaTable(spark, dir).select(
      col("doc_id"), col("modality"),
      octet_length(col("payload")).as("n_bytes"),
      md5(col("payload")).as("payload_md5"),
      col("meta.width").as("width"), col("meta.height").as("height"),
      col("meta.n_frames").as("n_frames"), col("meta.sample_rate").as("sample_rate"))

  /** Batch feature extraction through the codec: typed Dataset →
    * mapPartitions (one codec instance per partition, rows streamed
    * through it — the mapInPandas batch shape). Deterministic via
    * [[ByteHistogramCodec]]; SQL oracle (mm_features) + exact
    * scalar-reference spec.
    */
  def extractFeatures(spark: SparkSession, dir: String,
                      codec: MediaCodec = ByteHistogramCodec): DataFrame = {
    import spark.implicits._
    mediaTable(spark, dir)
      .select(col("doc_id"), col("modality"), col("payload"),
        col("meta.width").as("width"), col("meta.height").as("height"),
        col("meta.n_frames").as("n_frames"), col("meta.sample_rate").as("sample_rate"))
      .as[MediaRow]
      .mapPartitions { rows =>
        rows.map(r => MediaFeatures(r.doc_id, r.modality, r.payload.length,
          codec.features(r.payload).map(v => math.rint(v * 1e6) / 1e6)))
      }
      .toDF()
  }

  /** "Resize": deterministic metadata + payload transform standing in for
    * a pixel resample — new dims scaled by num/den, payload truncated to
    * the proportional byte budget. Column-expression only (no UDF), so
    * it stays inside whole-stage codegen and has a SQL oracle.
    */
  def resize(spark: SparkSession, dir: String, num: Int = 1, den: Int = 2): DataFrame =
    mediaTable(spark, dir)
      .where(col("modality") === "image")
      .select(
        col("doc_id"),
        (col("meta.width") * num / den).cast("int").as("width"),
        (col("meta.height") * num / den).cast("int").as("height"),
        octet_length(col("payload")).as("orig_bytes"),
        md5(substring(col("payload"), lit(1),
          greatest(lit(1), (octet_length(col("payload")) * num / den).cast("int"))))
          .as("resized_md5"))

  /** Frame sampling for video rows: split the payload into n_frames
    * equal-size frames (in-row array expression), keep every `stride`-th
    * frame via posexplode. Shuffle-free; the frame bytes stay on
    * executors.
    */
  def frameSample(spark: SparkSession, dir: String, stride: Int = 4): DataFrame = {
    val v = mediaTable(spark, dir).where(col("modality") === "video")
      .select(col("doc_id"), col("payload"), col("meta.n_frames").as("n_frames"),
        (octet_length(col("payload")) / col("meta.n_frames")).cast("int").as("fsize"))
      .where(col("fsize") > 0)
    v.select(col("doc_id"), col("n_frames"),
        posexplode(transform(sequence(lit(0), col("n_frames") - 1),
          i => substring(col("payload"), (i * col("fsize") + 1).cast("int"), col("fsize"))))
          .as(Seq("frame_no", "frame")))
      .where(pmod(col("frame_no"), lit(stride)) === 0)
      .select(col("doc_id"), col("frame_no"),
        octet_length(col("frame")).as("frame_bytes"), md5(col("frame")).as("frame_md5"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_decode_stats" -> ((s, d) => decodeStats(s, d)),
    // Feature values are reported in integer ppm (micro-units): the codec
    // already rounds to 6 dp, so ×1e6 sits within float-eps of an integer
    // and BOTH engines recover it exactly — no double-tie-rounding hazard
    // in the hash compare.
    "mm_features"     -> ((s, d) => extractFeatures(s, d)
      .select(col("doc_id"), col("modality"), col("n_bytes"),
        round(element_at(col("features"), 1) * 1e6, 0).cast("long").as("f0_ppm"),
        round(element_at(col("features"), 16) * 1e6, 0).cast("long").as("f15_ppm"))),
    "mm_resize"       -> ((s, d) => resize(s, d)),
    "mm_frame_sample" -> ((s, d) => frameSample(s, d)),
    "mm_png_decode"   -> ((s, d) => pngDecode(s, d)),
    "mm_wav_decode"   -> ((s, d) => wavDecode(s, d)),
    "mm_video_decode" -> ((s, d) => videoDecode(s, d)),
    "mm_phash_pairs"  -> ((s, d) => phashPairs(s, d)),
    "mm_phash_search" -> ((s, d) => phashSearch(s, d)),
  )

  /** Oracle replay of the image dHash table (pixel formula → luma block
    * sums → cross-multiplied dHash bits) — shared by mm_phash_pairs and
    * mm_phash_search.
    */
  private val dhashCtes =
    """px AS (
           SELECT doc_id, w, h, p % w AS x, p // w AS y
           FROM (SELECT doc_id, (16 + doc_id % 64)::BIGINT AS w,
                        (16 + doc_id % 48)::BIGINT AS h,
                        unnest(generate_series(0, (16 + doc_id % 64)*(16 + doc_id % 48) - 1)) AS p
                 FROM documents WHERE doc_id % 3 = 0)),
         blk AS (
           SELECT doc_id, (y*6)//h AS r, (x*11)//w AS c,
                  sum((doc_id*31 + x*7 + y*13) % 256 + (doc_id*17 + x*3 + y*5) % 256
                      + (doc_id*29 + x*11 + y*19) % 256) AS s,
                  count(*) AS n
           FROM px GROUP BY doc_id, (y*6)//h, (x*11)//w),
         hs AS (
           SELECT l.doc_id,
                  CAST(sum(CASE WHEN rb.s * l.n > l.s * rb.n
                           THEN (1::BIGINT << (l.r*10 + l.c)) ELSE 0 END) AS BIGINT) AS dhash
           FROM blk l JOIN blk rb
             ON rb.doc_id = l.doc_id AND rb.r = l.r AND rb.c = l.c + 1
           GROUP BY l.doc_id)"""

  val oracles: Map[String, String] = Map(
    // DuckDB has no md5(BLOB)/BLOB slicing; payload = UTF-8 bytes of text
    // and the fixture text is pure ASCII (verified: octet_length == length
    // at every sf), so varchar md5/substr are byte-equivalent.
    "mm_decode_stats" ->
      """SELECT doc_id,
                ['image','audio','video'][(doc_id % 3)::INT + 1] AS modality,
                octet_length(encode(text)) AS n_bytes,
                md5(text) AS payload_md5,
                CASE WHEN doc_id % 3 <> 1 THEN 16 + doc_id % 64 ELSE 0 END::INT AS width,
                CASE WHEN doc_id % 3 <> 1 THEN 16 + doc_id % 48 ELSE 0 END::INT AS height,
                CASE WHEN doc_id % 3 = 2 THEN 8 + doc_id % 24 ELSE 0 END::INT AS n_frames,
                CASE WHEN doc_id % 3 = 1 THEN 16000 ELSE 0 END::INT AS sample_rate
         FROM documents""",
    "mm_resize" ->
      """SELECT doc_id,
                ((16 + doc_id % 64) // 2)::INT AS width,
                ((16 + doc_id % 48) // 2)::INT AS height,
                octet_length(encode(text)) AS orig_bytes,
                md5(substr(text, 1, greatest(1, (octet_length(encode(text)) // 2)::INT)))
                  AS resized_md5
         FROM documents WHERE doc_id % 3 = 0""",
    // Same ASCII-payload equivalence as mm_resize: frames of the encoded
    // payload == substr runs of the text, replayed per frame_no via
    // generate_series. fsize uses integer division on both sides (Spark's
    // double-divide + cast-to-int truncates identically for positives).
    "mm_frame_sample" ->
      """SELECT doc_id, frame_no, fsize AS frame_bytes,
                md5(substr(text, (frame_no * fsize + 1)::INT, fsize)) AS frame_md5
         FROM (
           SELECT doc_id, text,
                  CAST(unnest(generate_series(0, n_frames - 1)) AS INT) AS frame_no,
                  (octet_length(encode(text)) // n_frames)::INT AS fsize
           FROM (SELECT doc_id, text, 8 + doc_id % 24 AS n_frames
                 FROM documents WHERE doc_id % 3 = 2)
           WHERE (octet_length(encode(text)) // n_frames) > 0
         ) WHERE frame_no % 4 = 0""",
    // mm_features replays FakeCodec's 16-bin byte histogram in SQL: the
    // payload is ASCII text, so bin membership (byte % 16) is a character
    // class — bin 0 = bytes {0,16,32,48,64,80,96,112}, bin 15 =
    // {15,31,47,63,79,95,111,127} — and a count is length minus the
    // class-stripped length. The codec's math.rint (half-even) tie
    // behavior is emulated exactly in the CASE (DuckDB round() is
    // half-away, which differs on exact .5 ties).
    "mm_features" ->
      """SELECT doc_id, modality, n_bytes,
                CASE WHEN v0 - floor(v0) = 0.5
                     THEN CAST(floor(v0) AS BIGINT) + CAST(floor(v0) AS BIGINT) % 2
                     ELSE CAST(round(v0) AS BIGINT) END AS f0_ppm,
                CASE WHEN v15 - floor(v15) = 0.5
                     THEN CAST(floor(v15) AS BIGINT) + CAST(floor(v15) AS BIGINT) % 2
                     ELSE CAST(round(v15) AS BIGINT) END AS f15_ppm
         FROM (
           SELECT doc_id,
                  ['image','audio','video'][(doc_id % 3)::INT + 1] AS modality,
                  octet_length(encode(text)) AS n_bytes,
                  ((length(text) - length(regexp_replace(text, '[\x00\x10 0@P`p]', '', 'g')))::DOUBLE
                    / greatest(1, length(text))) * 1e6 AS v0,
                  ((length(text) - length(regexp_replace(text, '[\x0f\x1f/?O_o\x7f]', '', 'g')))::DOUBLE
                    / greatest(1, length(text))) * 1e6 AS v15
           FROM documents)""",
    // mm_png_decode: Spark decodes REAL PNG bytes (javax.imageio); the
    // oracle never sees them — it replays the (doc_id, x, y) pixel
    // formula, so a hash match proves the codec recovered exact pixels.
    // Spark decodes REAL RIFF/WAV bytes (javax.sound.sampled); the oracle
    // replays the (doc_id, i) waveform formula — a hash match proves the
    // codec recovered the exact 16-bit samples.
    "mm_wav_decode" ->
      """SELECT doc_id, count(*) AS n_samples, 16000 AS sample_rate,
                CAST(sum(s) AS BIGINT) AS sum_s,
                CAST(min(s) AS INT) AS min_s, CAST(max(s) AS INT) AS max_s
         FROM (SELECT doc_id, (doc_id*31 + i*7) % 65536 - 32768 AS s
               FROM (SELECT doc_id,
                            unnest(generate_series(0, 255 + doc_id % 1024)) AS i
                     FROM documents WHERE doc_id % 3 = 1))
         GROUP BY doc_id""",
    // mm_video_decode: Spark demuxes a REAL concatenated-PNG container
    // and decodes every frame; the oracle replays the (doc_id, frame_no,
    // x, y) pixel formula — a hash match proves both the container split
    // and each frame's decode recovered exact pixels.
    "mm_video_decode" ->
      """SELECT doc_id, frame_no, width, height,
                CAST(sum((doc_id*31 + frame_no*37 + (p % width)*7 + (p // width)*13) % 256) AS BIGINT) AS sum_r,
                CAST(sum((doc_id*17 + frame_no*41 + (p % width)*3 + (p // width)*5) % 256) AS BIGINT) AS sum_g,
                CAST(sum((doc_id*29 + frame_no*43 + (p % width)*11 + (p // width)*19) % 256) AS BIGINT) AS sum_b
         FROM (
           SELECT doc_id, width, height, frame_no,
                  unnest(generate_series(0, width*height - 1)) AS p
           FROM (
             SELECT doc_id, (8 + doc_id % 16)::INT AS width,
                    (8 + doc_id % 12)::INT AS height,
                    CAST(unnest(generate_series(0, 7 + doc_id % 24)) AS INT) AS frame_no
             FROM documents WHERE doc_id % 3 = 2))
         GROUP BY doc_id, frame_no, width, height""",
    "mm_png_decode" ->
      """SELECT doc_id, width, height,
                CAST(sum((doc_id*31 + (p % width)*7 + (p // width)*13) % 256) AS BIGINT) AS sum_r,
                CAST(sum((doc_id*17 + (p % width)*3 + (p // width)*5) % 256) AS BIGINT) AS sum_g,
                CAST(sum((doc_id*29 + (p % width)*11 + (p // width)*19) % 256) AS BIGINT) AS sum_b
         FROM (
           SELECT doc_id, (16 + doc_id % 64)::INT AS width, (16 + doc_id % 48)::INT AS height,
                  unnest(generate_series(0, (16 + doc_id % 64)*(16 + doc_id % 48) - 1)) AS p
           FROM documents WHERE doc_id % 3 = 0)
         GROUP BY doc_id, width, height""",
    // mm_phash_pairs: Spark hashes the DECODED pixels; the oracle replays
    // the pixel formula → luma block sums → cross-multiplied dHash bits →
    // brute-force hamming (the oracle may be n² — the REGISTERED plan is
    // the banded equi-join, asserted pigeonhole-exact in spec). A hash
    // match certifies decode, downsample, packing, and the pair set.
    // (dhashCtes — the px→blk→hs replay — is shared with mm_phash_search.)
    "mm_phash_pairs" ->
      s"""WITH $dhashCtes
         SELECT a.doc_id AS d1, b.doc_id AS d2,
                bit_count(xor(a.dhash, b.dhash)) AS hamming
         FROM hs a JOIN hs b ON a.doc_id < b.doc_id
         WHERE bit_count(xor(a.dhash, b.dhash)) <= 9""",
    // mm_phash_search: same dhash replay; banded candidate generation
    // (share ≥1 of the 10 6-bit blocks) then exact Hamming top-k per
    // query — the deterministic ANN contract (a neighbor differing in
    // every block is invisible to BOTH engines identically)
    "mm_phash_search" ->
      s"""WITH $dhashCtes,
         qb AS (SELECT doc_id AS qdoc, dhash AS qh, b AS blk,
                       (dhash >> (b*6)) & 63 AS bval
                FROM hs, generate_series(0, 9) AS t(b)
                WHERE doc_id IN (0, 57)),
         cb AS (SELECT doc_id, dhash, b AS blk, (dhash >> (b*6)) & 63 AS bval
                FROM hs, generate_series(0, 9) AS t(b)),
         cand AS (SELECT DISTINCT qb.qdoc, qb.qh, cb.doc_id, cb.dhash
                  FROM qb JOIN cb ON qb.blk = cb.blk AND qb.bval = cb.bval
                  WHERE qb.qdoc <> cb.doc_id),
         sc AS (SELECT qdoc, doc_id,
                       CAST(bit_count(xor(qh, dhash)) AS BIGINT) AS hamming
                FROM cand)
         SELECT qdoc, doc_id, hamming, rank
         FROM (SELECT *, row_number() OVER
                 (PARTITION BY qdoc ORDER BY hamming, doc_id) AS rank FROM sc)
         WHERE rank <= 5""",
  )
}
