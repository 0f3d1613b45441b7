package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed in partition-sized batches.
  *
  * SEVEN REAL self-contained codecs run behind the partition-batch seam —
  * RIFF/WAVE PCM-16 and FLAC ([[graft.ops.Flac]]) for audio, 24-bpp
  * BMP, PNG (DEFLATE + all five scanline filters + Adam7, below),
  * baseline JPEG incl. 4:2:0 and restart markers ([[graft.ops.Jpeg]]),
  * GIF89a LZW ([[graft.ops.Gif]]), and the MP4/ISO BMFF container
  * ([[graft.ops.Mp4]]) — each encode AND decode, oracle-checked end to
  * end. Only the LOSSY payload decoders (MP3 audio, H.264-class video
  * frames) remain genuine stub seams; their deterministic stub kernels
  * below mark the seam — same binary → features shape, swap the kernel
  * and nothing else changes.
  *
  * Scale notes: media blobs dominate row size; keep
  * `spark.sql.files.maxPartitionBytes` small enough that a partition of
  * blobs fits in memory, and project metadata columns *before* any join
  * so the binary column never shuffles unless its bytes are needed.
  */
object Multimodal {

  /** Canonical media-table schema. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("media", BinaryType),
    StructField("mime", StringType),
    StructField("meta", MapType(StringType, StringType))))

  /** STUB feature extractor (expression-level): n deterministic pseudo
    * features derived from the bytes. A real image/audio embedding
    * replaces this column — same shape: binary → array<double>. */
  def featuresStub(media: Column, nFeatures: Int = 8): Column =
    transform(sequence(lit(0), lit(nFeatures - 1)), i =>
      (pmod(xxhash64(media, i), lit(1000L)).cast("double")) / 1000.0)

  /** STUB frame sampler: n evenly-spaced byte-range "frames" (a real
    * video codec replaces the slicing with keyframe extraction — the
    * plumbing, schema array<binary>, and downstream explode stay). */
  def sampleFramesStub(media: Column, n: Int): Column = {
    val total = length(media)
    val chunk = greatest(floor(total / n).cast("int"), lit(1))
    transform(sequence(lit(0), lit(n - 1)), i =>
      media.substr(i * chunk + 1, chunk))
  }

  /** The partition-batch decode seam: a real codec (JNI, native lib)
    * initializes once per partition and maps blobs to feature vectors.
    * This is the Scala analog of mapInPandas-with-batches. */
  def decodePartitions(df: DataFrame, idCol: String, mediaCol: String)
                      (decode: Array[Byte] => Array[Double]): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType),
      StructField("features", ArrayType(DoubleType))))
    val idIdx = df.schema.fieldIndex(idCol)
    val mIdx = df.schema.fieldIndex(mediaCol)
    val rdd = df.rdd.mapPartitions { rows =>
      // per-partition codec init happens here (once, not per row)
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](mIdx)
        Row(r.getLong(idIdx), if (bytes == null) null else decode(bytes).toSeq)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Deterministic stand-in decode kernel for tests: bytes → 4 moments.
    * ??? in spirit — replace with a real codec.
    *
    * Why MP3 / video-frame decode stay stubs while JPEG/PNG/GIF/FLAC/
    * the MP4 container fell: those are fully reconstructible from
    * published FORMULAS (DCT basis, zigzag, Annex-K-style Huffman
    * built from code-length counts, DEFLATE via java.util.zip, LZW's
    * algorithm, Rice coding + binomial fixed predictors + CRC
    * polynomials, length-prefixed box trees) — no opaque tabulated
    * data. MPEG audio is not: Layer III needs the ~34 big-value Huffman code
    * tables and the 512-coefficient synthesis window, both arbitrary
    * TABLES in the spec with no generating formula. Re-keying them
    * from memory risks a codec that LOOKS real but emits/consumes
    * non-conformant streams — strictly worse than this honest seam.
    * With the spec's tables available, the decode chain (header/side
    * info → Huffman → 4/3-power requant → alias → IMDCT → polyphase)
    * drops into [[decodeFeatures]] exactly like the JPEG kernel did. */
  def stubDecodeKernel(bytes: Array[Byte]): Array[Double] = {
    if (bytes.isEmpty) Array(0.0, 0.0, 0.0, 0.0)
    else {
      val n = bytes.length.toDouble
      val s = bytes.map(_ & 0xff).map(_.toDouble)
      Array(n, s.sum / n, s.min, s.max)
    }
  }

  // ---- Real codec: RIFF/WAVE PCM-16 ----------------------------------
  //
  // A complete, self-contained WAV codec — the first REAL decode kernel
  // behind the partition-batch seam (the image/audio libraries aren't in
  // this container, but RIFF PCM needs none). The decoder is a general
  // chunk walker (not a fixed-offset read of the canonical 44-byte
  // header): it validates RIFF/WAVE magic, iterates chunks with the
  // spec's odd-size pad byte, skips unknown chunks (the encoder plants a
  // LIST chunk precisely so a fixed-offset "decoder" would fail), and
  // decodes little-endian 16-bit PCM samples from the data chunk.

  /** Decoded summary of one PCM-16 WAV blob: exact integer stats so a
    * decode-derived aggregate can hash-match a SQL oracle replay. */
  final case class WavStats(sampleRate: Int, channels: Int, bits: Int,
                            nSamples: Long, sumAbs: Long, peak: Long)

  private def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
    ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
  private def tag(b: Array[Byte], o: Int): String =
    new String(b, o, 4, "US-ASCII")

  /** Encode mono PCM-16 samples as a RIFF/WAVE byte stream. Writes
    * fmt(16) + a LIST(INFO) metadata chunk + data — the LIST chunk is
    * deliberate: it forces decoders to walk chunks instead of assuming
    * the 44-byte canonical layout. */
  def encodeWavPcm16(samples: Array[Short], sampleRate: Int): Array[Byte] = {
    // LIST body: "INFO" + one ISFT subchunk (6-byte payload, even)
    val soft = "graft.".getBytes("US-ASCII")
    val listBody = "INFO".getBytes("US-ASCII") ++
      "ISFT".getBytes("US-ASCII") ++
      Array[Byte](soft.length.toByte, 0, 0, 0) ++ soft
    val dataLen = samples.length * 2
    val riffLen = 4 + (8 + 16) + (8 + listBody.length) + (8 + dataLen)
    val bb = java.nio.ByteBuffer
      .allocate(8 + riffLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(riffLen)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1)                       // PCM
      .putShort(1)                       // mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2)            // byte rate
      .putShort(2)                       // block align
      .putShort(16)                      // bits per sample
    bb.put("LIST".getBytes("US-ASCII")).putInt(listBody.length)
      .put(listBody)
    bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(bb.putShort)
    bb.array()
  }

  /** Decode a RIFF/WAVE PCM-16 blob: general chunk walk + exact integer
    * sample stats. Throws on malformed input — a corrupt blob must
    * surface, not read as silence. */
  def decodeWavPcm16(bytes: Array[Byte]): WavStats = {
    require(bytes.length >= 12 && tag(bytes, 0) == "RIFF" &&
            tag(bytes, 8) == "WAVE", "not a RIFF/WAVE stream")
    var off = 12
    var sampleRate = -1; var channels = -1; var bits = -1
    var nSamples = 0L; var sumAbs = 0L; var peak = 0L
    var sawData = false
    while (off + 8 <= bytes.length) {
      val id = tag(bytes, off)
      val len = le32(bytes, off + 4)
      require(len >= 0 && off + 8 + len <= bytes.length,
        s"chunk $id overruns the stream")
      id match {
        case "fmt " =>
          require(len >= 16, "fmt chunk too short")
          val codec = le16(bytes, off + 8)
          require(codec == 1, s"not PCM (codec $codec)")
          channels = le16(bytes, off + 10)
          sampleRate = le32(bytes, off + 12)
          bits = le16(bytes, off + 22)
          require(bits == 16, s"only PCM-16 supported, got $bits")
        case "data" =>
          require(bits == 16, "data chunk before fmt")
          sawData = true
          var i = off + 8
          val end = off + 8 + len
          while (i + 1 < end) {
            val s = le16(bytes, i).toShort.toLong
            val a = math.abs(s)
            sumAbs += a; if (a > peak) peak = a; nSamples += 1
            i += 2
          }
        case _ => () // LIST, fact, bext, ... — skip
      }
      off += 8 + len + (len & 1) // odd chunk sizes carry a pad byte
    }
    require(sawData, "no data chunk")
    WavStats(sampleRate, channels, bits, nSamples, sumAbs, peak)
  }

  /** Integer-stride WAV decimation: keep every `factor`-th sample of
    * a PCM-16 mono stream and re-encode at rate/factor — the audio
    * twin of [[resizeBmp24]] (no anti-alias filter; the point is the
    * exact, oracle-replayable index mapping i → i·factor, the
    * downsample shape a feature pipeline uses before framing).
    * Chunk-walks like [[decodeWavPcm16]], so LIST/fact chunks in the
    * source are dropped, not copied. */
  def resampleWavPcm16(bytes: Array[Byte], factor: Int): Array[Byte] = {
    require(factor >= 1, s"factor must be >= 1, got $factor")
    require(bytes.length >= 12 && tag(bytes, 0) == "RIFF" &&
            tag(bytes, 8) == "WAVE", "not a RIFF/WAVE stream")
    var off = 12
    var sampleRate = -1; var bits = -1
    val out = scala.collection.mutable.ArrayBuffer.empty[Short]
    var sawData = false
    while (off + 8 <= bytes.length) {
      val id = tag(bytes, off)
      val len = le32(bytes, off + 4)
      require(len >= 0 && off + 8 + len <= bytes.length,
        s"chunk $id overruns the stream")
      id match {
        case "fmt " =>
          require(len >= 16, "fmt chunk too short")
          require(le16(bytes, off + 8) == 1, "not PCM")
          require(le16(bytes, off + 10) == 1,
            "resample supports mono only")
          sampleRate = le32(bytes, off + 12)
          bits = le16(bytes, off + 22)
          require(bits == 16, s"only PCM-16 supported, got $bits")
        case "data" =>
          require(bits == 16, "data chunk before fmt")
          sawData = true
          var k = 0L
          var i = off + 8
          val end = off + 8 + len
          while (i + 1 < end) {
            if (k % factor == 0) out += le16(bytes, i).toShort
            k += 1; i += 2
          }
        case _ => ()
      }
      off += 8 + len + (len & 1)
    }
    require(sawData, "no data chunk")
    encodeWavPcm16(out.toArray, math.max(sampleRate / factor, 1))
  }

  /** Partition-batch decimate-then-stats over a binary column — one
    * partition-local map, no shuffle ([[resizeBmpStatsDf]]'s audio
    * sibling). */
  def resampleWavStatsDf(df: DataFrame, idCol: String, mediaCol: String,
                         factor: Int): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType),
      StructField("sample_rate", IntegerType),
      StructField("channels", IntegerType),
      StructField("bits", IntegerType),
      StructField("n_samples", LongType),
      StructField("sum_abs", LongType),
      StructField("peak", LongType)))
    val idIdx = df.schema.fieldIndex(idCol)
    val mIdx = df.schema.fieldIndex(mediaCol)
    val rdd = df.rdd.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](mIdx)
        if (bytes == null)
          Row(r.getLong(idIdx), null, null, null, null, null, null)
        else {
          val st = decodeWavPcm16(resampleWavPcm16(bytes, factor))
          Row(r.getLong(idIdx), st.sampleRate, st.channels, st.bits,
              st.nSamples, st.sumAbs, st.peak)
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Partition-batch WAV decode over a binary column: the real-codec
    * instantiation of [[decodePartitions]]'s seam. Returns exact
    * integer stats per asset (hash-matchable downstream). */
  def decodeWavStatsDf(df: DataFrame, idCol: String, mediaCol: String)
      : DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType),
      StructField("sample_rate", IntegerType),
      StructField("channels", IntegerType),
      StructField("bits", IntegerType),
      StructField("n_samples", LongType),
      StructField("sum_abs", LongType),
      StructField("peak", LongType)))
    val idIdx = df.schema.fieldIndex(idCol)
    val mIdx = df.schema.fieldIndex(mediaCol)
    val rdd = df.rdd.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](mIdx)
        if (bytes == null) // missing media: null stats, not a crash —
          // MALFORMED media still throws (decodeWavPcm16's contract)
          Row(r.getLong(idIdx), null, null, null, null, null, null)
        else {
          val st = decodeWavPcm16(bytes)
          Row(r.getLong(idIdx), st.sampleRate, st.channels, st.bits,
              st.nSamples, st.sumAbs, st.peak)
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  // ---- Real codec: BMP (Windows DIB, 24 bpp) -------------------------
  //
  // The image-side sibling of the WAV codec: BITMAPFILEHEADER +
  // BITMAPINFOHEADER parsing with the details a fixed-offset reader
  // gets wrong — the pixel-data offset is read from the file header
  // (not assumed 54), rows are 4-byte padded, stored BOTTOM-UP when
  // biHeight > 0 and top-down when negative.

  /** Decoded summary of one 24-bpp BMP: dimensions, exact per-channel
    * sums, and the packed top-left pixel (r·65536 + g·256 + b) — the
    * positional probe that catches row-order bugs a global sum hides. */
  final case class BmpStats(width: Int, height: Int,
                            sumR: Long, sumG: Long, sumB: Long,
                            firstPx: Long)

  /** Encode a 24-bpp bottom-up BMP from a pixel function
    * ((x, y) → (r, g, b), origin top-left). */
  def encodeBmp24(width: Int, height: Int,
                  px: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    require(width > 0 && height > 0, "empty image")
    val rowBytes = width * 3
    val pad = (4 - rowBytes % 4) % 4
    val imageSize = (rowBytes + pad) * height
    val bb = java.nio.ByteBuffer.allocate(54 + imageSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte)
      .putInt(54 + imageSize).putShort(0).putShort(0).putInt(54)
    bb.putInt(40).putInt(width).putInt(height)
      .putShort(1).putShort(24).putInt(0).putInt(imageSize)
      .putInt(2835).putInt(2835).putInt(0).putInt(0)
    // bottom-up: last image row stored first; channel order B, G, R
    for (y <- height - 1 to 0 by -1) {
      for (x <- 0 until width) {
        val (r, g, b) = px(x, y)
        bb.put(b.toByte).put(g.toByte).put(r.toByte)
      }
      for (_ <- 0 until pad) bb.put(0.toByte)
    }
    bb.array()
  }

  /** Decode a 24-bpp uncompressed BMP (bottom-up or top-down):
    * header-driven data offset, padded rows, exact integer stats. */
  def decodeBmp24(bytes: Array[Byte]): BmpStats = {
    require(bytes.length >= 54 && bytes(0) == 'B'.toByte &&
            bytes(1) == 'M'.toByte, "not a BMP stream")
    val dataOff = le32(bytes, 10)
    val hdrSize = le32(bytes, 14)
    require(hdrSize >= 40, s"unsupported DIB header size $hdrSize")
    val width = le32(bytes, 18)
    val rawH = le32(bytes, 22)
    val topDown = rawH < 0
    val height = math.abs(rawH)
    val bpp = le16(bytes, 28)
    val compression = le32(bytes, 30)
    require(bpp == 24 && compression == 0,
      s"only uncompressed 24 bpp supported (bpp=$bpp comp=$compression)")
    require(width > 0 && height > 0, "degenerate dimensions")
    val rowBytes = width * 3
    val stride = rowBytes + (4 - rowBytes % 4) % 4
    require(dataOff.toLong + stride.toLong * height <= bytes.length,
      "pixel data overruns the stream")
    var sumR = 0L; var sumG = 0L; var sumB = 0L; var firstPx = -1L
    var y = 0
    while (y < height) {
      // image row y sits at stored row (height-1-y) when bottom-up
      val stored = if (topDown) y else height - 1 - y
      var o = dataOff + stored * stride
      var x = 0
      while (x < width) {
        val b = bytes(o) & 0xff
        val g = bytes(o + 1) & 0xff
        val r = bytes(o + 2) & 0xff
        sumR += r; sumG += g; sumB += b
        if (x == 0 && y == 0) firstPx = r * 65536L + g * 256L + b
        o += 3; x += 1
      }
      y += 1
    }
    BmpStats(width, height, sumR, sumG, sumB, firstPx)
  }

  /** Nearest-neighbor resize of a 24-bpp uncompressed BMP (bottom-up
    * or top-down input) to `newW`×`newH`, emitting a fresh bottom-up
    * 24-bpp BMP — the resize leg of the decode/feature/resize/sample
    * quartet. The source pixel for output (x, y) is
    * (x·w div newW, y·h div newH): exact integer arithmetic, no
    * filtering kernel, so an oracle can replay the mapping
    * arithmetically. Identity dimensions reproduce the image
    * byte-for-byte (modulo header normalization to bottom-up). */
  def resizeBmp24(bytes: Array[Byte], newW: Int, newH: Int)
      : Array[Byte] = {
    require(newW > 0 && newH > 0, "degenerate target dimensions")
    require(bytes.length >= 54 && bytes(0) == 'B'.toByte &&
            bytes(1) == 'M'.toByte, "not a BMP stream")
    val dataOff = le32(bytes, 10)
    val width = le32(bytes, 18)
    val rawH = le32(bytes, 22)
    val topDown = rawH < 0
    val height = math.abs(rawH)
    val bpp = le16(bytes, 28)
    val compression = le32(bytes, 30)
    require(bpp == 24 && compression == 0,
      s"only uncompressed 24 bpp supported (bpp=$bpp comp=$compression)")
    require(width > 0 && height > 0, "degenerate dimensions")
    val rowBytes = width * 3
    val stride = rowBytes + (4 - rowBytes % 4) % 4
    require(dataOff.toLong + stride.toLong * height <= bytes.length,
      "pixel data overruns the stream")
    encodeBmp24(newW, newH, (x, y) => {
      val sx = (x.toLong * width / newW).toInt
      val sy = (y.toLong * height / newH).toInt
      val stored = if (topDown) sy else height - 1 - sy
      val o = dataOff + stored * stride + sx * 3
      ((bytes(o + 2) & 0xff, bytes(o + 1) & 0xff, bytes(o) & 0xff))
    })
  }

  /** Shared partition-batch image-stats scaffold: binary → the
    * canonical (asset_id, width, height, sum_r, sum_g, sum_b,
    * first_px) row; null media → null stats. Defines the schema and
    * the null-row convention ONCE for every image codec
    * (BMP/PNG/GIF/color-JPEG and the resize variants) — each decoder
    * contributes only its bytes → stats kernel. */
  private[ops] def imageStatsDf(df: DataFrame, idCol: String,
      mediaCol: String)(
      decode: Array[Byte] => (Int, Int, Long, Long, Long, Long))
      : DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("sum_r", LongType),
      StructField("sum_g", LongType),
      StructField("sum_b", LongType),
      StructField("first_px", LongType)))
    val idIdx = df.schema.fieldIndex(idCol)
    val mIdx = df.schema.fieldIndex(mediaCol)
    val rdd = df.rdd.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](mIdx)
        if (bytes == null) // missing media: null stats (see WAV twin)
          Row(r.getLong(idIdx), null, null, null, null, null, null)
        else {
          val (w, h, sr, sg, sb, fp) = decode(bytes)
          Row(r.getLong(idIdx), w, h, sr, sg, sb, fp)
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Partition-batch resize-then-stats over a binary column: each
    * asset is resized to `newW`×`newH` and the RESIZED image's stats
    * are emitted — the thumbnail-feature pass of an image pipeline,
    * one partition-local map, no shuffle. */
  def resizeBmpStatsDf(df: DataFrame, idCol: String, mediaCol: String,
                       newW: Int, newH: Int): DataFrame =
    imageStatsDf(df, idCol, mediaCol) { bytes =>
      val st = decodeBmp24(resizeBmp24(bytes, newW, newH))
      (st.width, st.height, st.sumR, st.sumG, st.sumB, st.firstPx)
    }

  /** Partition-batch BMP decode over a binary column. */
  def decodeBmpStatsDf(df: DataFrame, idCol: String, mediaCol: String)
      : DataFrame =
    imageStatsDf(df, idCol, mediaCol) { bytes =>
      val st = decodeBmp24(bytes)
      (st.width, st.height, st.sumR, st.sumG, st.sumB, st.firstPx)
    }

  // ---- Real codec: PNG (8-bit truecolor ± alpha, Adam7, JDK-only) ----
  //
  // PNG is DEFLATE (java.util.zip.Deflater/Inflater) plus five per-
  // scanline byte filters. (Baseline JPEG, GIF89a, FLAC and the MP4
  // container are ALSO implemented JDK-only — see [[graft.ops.Jpeg]] /
  // [[graft.ops.Gif]] / [[graft.ops.Flac]] / [[graft.ops.Mp4]]; only
  // lossy payload decode — MP3, video frames — remains a stub seam.)
  // The encoder writes 8-bit
  // truecolor (color type 2)
  // or truecolor+alpha (type 6), plain or Adam7-INTERLACED, with a
  // SELECTABLE filter applied to every row; the decoder is
  // chunk-walking (CRC-verified, multiple IDAT chunks concatenated)
  // and reconstructs ALL FIVE filter types (None/Sub/Up/Average/
  // Paeth) across ALL SEVEN Adam7 passes — each pass is its own
  // filtered sub-image with its own row history, the detail naive
  // decoders get wrong. [[synthPng]] cycles the encode filter by id
  // (and [[MultimodalSpec]] crosses filters x interlace x alpha) so
  // every reconstruction path is exercised, not just the
  // filter-0/sequential fast case.

  private val pngSig = Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A)
    .map(_.toByte)

  /** One PNG chunk: big-endian length, 4-char type, data, CRC32 over
    * type+data (the spec's chunk framing). */
  private def pngChunk(typ: String, data: Array[Byte]): Array[Byte] = {
    val t = typ.getBytes("US-ASCII")
    require(t.length == 4, s"bad chunk type '$typ'")
    val bb = java.nio.ByteBuffer.allocate(12 + data.length) // big-endian
    bb.putInt(data.length).put(t).put(data)
    val crc = new java.util.zip.CRC32
    crc.update(t); crc.update(data)
    bb.putInt(crc.getValue.toInt)
    bb.array()
  }

  /** Paeth predictor (PNG spec §9.4): the neighbor (left, up, upper-
    * left) closest to left + up − upperleft, ties broken left, up,
    * upper-left. */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b)
    val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** Adam7 pass geometry (xStart, yStart, xStep, yStep); a
    * non-interlaced image is the single full pass. */
  private val adam7 = Array(
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))
  private def pngPasses(interlaced: Boolean) =
    if (interlaced) adam7 else Array((0, 0, 1, 1))

  /** Encode an 8-bit PNG from a pixel function ((x, y) → (r, g, b),
    * origin top-left): truecolor, or truecolor+alpha when `alpha` is
    * given, plain or Adam7-interlaced, filtering every scanline with
    * `filterType` (0=None 1=Sub 2=Up 3=Average 4=Paeth — any choice
    * decodes to the same pixels; non-zero types exist to exercise
    * decoder reconstruction). */
  def encodePng(width: Int, height: Int,
                px: (Int, Int) => (Int, Int, Int),
                filterType: Int = 0,
                alpha: Option[(Int, Int) => Int] = None,
                interlaced: Boolean = false): Array[Byte] = {
    require(width > 0 && height > 0, "empty image")
    require(filterType >= 0 && filterType <= 4,
      s"filter type must be 0..4, got $filterType")
    val bpp = if (alpha.isDefined) 4 else 3
    val img = new Array[Int](width * height * bpp)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val (r, g, b) = px(x, y)
        val o = (y * width + x) * bpp
        img(o) = r & 0xff; img(o + 1) = g & 0xff; img(o + 2) = b & 0xff
        alpha.foreach(a => img(o + 3) = a(x, y) & 0xff)
        x += 1
      }
      y += 1
    }
    val raw = new java.io.ByteArrayOutputStream(img.length + height + 64)
    pngPasses(interlaced).foreach { case (xs, ys, xStep, yStep) =>
      val pw = if (width > xs) (width - xs + xStep - 1) / xStep else 0
      val ph = if (height > ys) (height - ys + yStep - 1) / yStep else 0
      if (pw > 0 && ph > 0) {
        val stride = pw * bpp
        val prev = new Array[Int](stride) // zeros at each pass start
        val cur = new Array[Int](stride)
        var ry = 0
        while (ry < ph) {
          var rx = 0
          while (rx < pw) {
            val src = ((ys + ry * yStep) * width + (xs + rx * xStep)) * bpp
            var c = 0
            while (c < bpp) { cur(rx * bpp + c) = img(src + c); c += 1 }
            rx += 1
          }
          raw.write(filterType)
          var i = 0
          while (i < stride) {
            val left = if (i >= bpp) cur(i - bpp) else 0
            val up = prev(i)
            val ul = if (i >= bpp) prev(i - bpp) else 0
            val f = filterType match {
              case 0 => cur(i)
              case 1 => cur(i) - left
              case 2 => cur(i) - up
              case 3 => cur(i) - (left + up) / 2
              case 4 => cur(i) - paeth(left, up, ul)
            }
            raw.write(f & 0xff)
            i += 1
          }
          System.arraycopy(cur, 0, prev, 0, stride)
          ry += 1
        }
      }
    }
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(raw.toByteArray); deflater.finish()
    val zOut = new java.io.ByteArrayOutputStream(raw.size() / 2 + 64)
    val buf = new Array[Byte](8192)
    while (!deflater.finished())
      zOut.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(width).putInt(height)
      .put(8.toByte)                            // bit depth
      .put((if (bpp == 4) 6 else 2).toByte)     // color type
      .put(0.toByte).put(0.toByte)              // deflate / adaptive
      .put((if (interlaced) 1 else 0).toByte)   // interlace method
      .array()
    pngSig ++ pngChunk("IHDR", ihdr) ++
      pngChunk("IDAT", zOut.toByteArray) ++
      pngChunk("IEND", Array.emptyByteArray)
  }

  /** Decoded summary of one 8-bit PNG — the [[BmpStats]] shape (exact
    * channel sums + the top-left-pixel probe that catches row/filter/
    * pass reconstruction bugs a global sum hides), so PNG- and
    * BMP-backed pipelines share downstream schema. Alpha, when
    * present, is validated by the reconstruction but excluded from the
    * sums (color-channel parity with the alpha-less formats). */
  final case class PngStats(width: Int, height: Int,
                            sumR: Long, sumG: Long, sumB: Long,
                            firstPx: Long)

  /** Full decode to a row-major RGB buffer: signature + CRC-verified
    * chunk walk, IDAT concatenation, exact-size inflate, per-PASS
    * scanline reconstruction (all five filters; Adam7 passes each
    * carry their own row history and interleave back by the pass
    * geometry). Supports color types 2 (RGB) and 6 (RGBA, alpha
    * dropped after reconstruction), bit depth 8. */
  private def decodePngRgb(bytes: Array[Byte])
      : (Int, Int, Array[Byte]) = {
    require(bytes.length > 8 + 12 * 2 &&
      pngSig.indices.forall(i => bytes(i) == pngSig(i)),
      "not a PNG stream")
    var off = 8
    var width = -1; var height = -1
    var bppIn = -1; var interlaced = false
    var seenIhdr = false; var seenIend = false
    val idat = new java.io.ByteArrayOutputStream()
    def be32(o: Int): Int =
      ((bytes(o) & 0xff) << 24) | ((bytes(o + 1) & 0xff) << 16) |
      ((bytes(o + 2) & 0xff) << 8) | (bytes(o + 3) & 0xff)
    while (off + 12 <= bytes.length && !seenIend) {
      val len = be32(off)
      require(len >= 0 && off + 12L + len <= bytes.length,
        s"chunk overruns the stream at offset $off")
      val typ = new String(bytes, off + 4, 4, "US-ASCII")
      val crc = new java.util.zip.CRC32
      crc.update(bytes, off + 4, 4 + len)
      require(crc.getValue.toInt == be32(off + 8 + len),
        s"bad CRC on $typ chunk")
      typ match {
        case "IHDR" =>
          require(len == 13, s"IHDR length $len")
          width = be32(off + 8); height = be32(off + 12)
          val bitDepth = bytes(off + 16) & 0xff
          val colorType = bytes(off + 17) & 0xff
          val interlace = bytes(off + 20) & 0xff
          require(bitDepth == 8 && (colorType == 2 || colorType == 6) &&
                  interlace <= 1,
            s"only 8-bit truecolor(+alpha) supported " +
            s"(depth=$bitDepth color=$colorType interlace=$interlace)")
          require(width > 0 && height > 0, "degenerate dimensions")
          bppIn = if (colorType == 6) 4 else 3
          interlaced = interlace == 1
          seenIhdr = true
        case "IDAT" => idat.write(bytes, off + 8, len)
        case "IEND" => seenIend = true
        case _ => () // ancillary chunks skipped
      }
      off += 12 + len
    }
    require(seenIhdr, "no IHDR chunk")
    require(seenIend, "no IEND chunk")
    require(idat.size() > 0, "no IDAT data")
    val passes = pngPasses(interlaced).map { case (xs, ys, xStep, yStep) =>
      val pw = if (width > xs) (width - xs + xStep - 1) / xStep else 0
      val ph = if (height > ys) (height - ys + yStep - 1) / yStep else 0
      (xs, ys, xStep, yStep, pw, ph)
    }.filter(p => p._5 > 0 && p._6 > 0)
    val rawLen = passes.map { case (_, _, _, _, pw, ph) =>
      ph.toLong * (1L + pw.toLong * bppIn) }.sum
    require(rawLen <= Int.MaxValue, "image too large")
    val raw = new Array[Byte](rawLen.toInt)
    val inflater = new java.util.zip.Inflater()
    inflater.setInput(idat.toByteArray)
    var filled = 0
    while (filled < raw.length && !inflater.finished()) {
      val n = inflater.inflate(raw, filled, raw.length - filled)
      require(n > 0 || inflater.finished(),
        "truncated or corrupt IDAT stream")
      filled += n
    }
    inflater.end()
    require(filled == raw.length,
      s"inflated $filled bytes, expected ${raw.length}")
    val out = new Array[Byte](width * height * 3)
    var ro = 0
    passes.foreach { case (xs, ys, xStep, yStep, pw, ph) =>
      val stride = pw * bppIn
      val cur = new Array[Int](stride)
      val prev = new Array[Int](stride)
      java.util.Arrays.fill(prev, 0)
      var ry = 0
      while (ry < ph) {
        val ft = raw(ro) & 0xff; ro += 1
        require(ft <= 4, s"bad filter type $ft")
        var i = 0
        while (i < stride) {
          val f = raw(ro + i) & 0xff
          val left = if (i >= bppIn) cur(i - bppIn) else 0
          val up = prev(i)
          val ul = if (i >= bppIn) prev(i - bppIn) else 0
          cur(i) = (ft match {
            case 0 => f
            case 1 => f + left
            case 2 => f + up
            case 3 => f + (left + up) / 2
            case 4 => f + paeth(left, up, ul)
          }) & 0xff
          i += 1
        }
        ro += stride
        var rx = 0
        while (rx < pw) {
          val dst = ((ys + ry * yStep) * width + (xs + rx * xStep)) * 3
          out(dst) = cur(rx * bppIn).toByte
          out(dst + 1) = cur(rx * bppIn + 1).toByte
          out(dst + 2) = cur(rx * bppIn + 2).toByte
          rx += 1
        }
        System.arraycopy(cur, 0, prev, 0, stride)
        ry += 1
      }
    }
    (width, height, out)
  }

  /** Decode an 8-bit PNG to exact integer stats (see [[decodePngRgb]]
    * for the supported surface). */
  def decodePng(bytes: Array[Byte]): PngStats = {
    val (w, h, px) = decodePngRgb(bytes)
    var sumR = 0L; var sumG = 0L; var sumB = 0L
    var i = 0
    val n = w * h
    while (i < n) {
      sumR += px(i * 3) & 0xff
      sumG += px(i * 3 + 1) & 0xff
      sumB += px(i * 3 + 2) & 0xff
      i += 1
    }
    val firstPx = (px(0) & 0xff) * 65536L + (px(1) & 0xff) * 256L +
      (px(2) & 0xff)
    PngStats(w, h, sumR, sumG, sumB, firstPx)
  }

  /** Nearest-neighbor resize of an 8-bit PNG (same integer mapping as
    * [[resizeBmp24]]: source pixel for output (x, y) is
    * (x·w div newW, y·h div newH)), re-encoded as plain truecolor
    * with filter 0 — interlaced/alpha inputs normalize on the way
    * through. */
  def resizePng(bytes: Array[Byte], newW: Int, newH: Int): Array[Byte] = {
    require(newW > 0 && newH > 0, "degenerate target dimensions")
    val (w, h, pixels) = decodePngRgb(bytes)
    encodePng(newW, newH, (x, y) => {
      val sx = (x.toLong * w / newW).toInt
      val sy = (y.toLong * h / newH).toInt
      val o = (sy * w + sx) * 3
      ((pixels(o) & 0xff, pixels(o + 1) & 0xff, pixels(o + 2) & 0xff))
    })
  }

  /** Partition-batch PNG decode over a binary column (the BMP twin's
    * schema, so downstream feature passes are format-agnostic). */
  def decodePngStatsDf(df: DataFrame, idCol: String, mediaCol: String)
      : DataFrame =
    imageStatsDf(df, idCol, mediaCol) { bytes =>
      val st = decodePng(bytes)
      (st.width, st.height, st.sumR, st.sumG, st.sumB, st.firstPx)
    }

  /** Deterministic per-id PNG synthesis — the SAME pixel arithmetic as
    * [[synthBmp24]] (so the SQL oracle replay is shared), with the
    * scanline filter CYCLING over all five types by id AND every third
    * image Adam7-interlaced: a corpus where every reconstruction path
    * (filters x pass geometry) must be exact for the aggregate to
    * hash-match. */
  def synthPng(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType),
      StructField("media", BinaryType)))
    val idIdx = df.schema.fieldIndex(idCol)
    val rdd = df.rdd.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(idIdx)
        val w = (8 + id % 9).toInt
        val h = (5 + id % 7).toInt
        val bytes = encodePng(w, h, (x, y) => (
          ((id * 3 + x * 7 + y * 11) % 256).toInt,
          ((id * 5 + x * 13 + y * 3) % 256).toInt,
          ((id * 7 + x + y * 17) % 256).toInt),
          filterType = (id % 5).toInt,
          interlaced = id % 3 == 0)
        Row(id, bytes)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** 64-bit average hash (aHash) of a 24-bpp BMP: nearest-neighbor
    * resize to 8×8 (the same `x·w div 8` mapping as [[resizeBmp24]]),
    * integer luma (r+g+b) div 3 per cell, threshold each cell at the
    * integer mean (strictly greater) — the classic perceptual
    * fingerprint: resize/re-encode/brightness-shift survivors hash
    * near-identically, so near-dup IMAGE detection becomes hamming
    * distance on 64 bits. Returned as two non-negative 32-bit halves
    * (hi = bits 32..63, lo = bits 0..31): a single signed long would
    * trap bit 63 in the sign, and split halves let both engines (and
    * the hamming joiner) use plain bit_count/xor arithmetic. */
  /** Content-type sniffing by MAGIC BYTES — the ingest-tier
    * DISPATCHER in front of the codec suite: a 100 TB media crawl
    * arrives as undifferentiated blobs (extensions lie, HTTP
    * Content-Type lies more), and the first routing decision — which
    * decoder, which quarantine — must come from the bytes themselves.
    * Recognizes every container this engine decodes (BMP, PNG, JPEG,
    * GIF, RIFF/WAVE, FLAC, MP4/ISO-BMFF, GFV1, gzip members, WARC)
    * plus the octet-stream fallback; pure per-row prefix inspection,
    * never a full parse — sniff cost is O(16 bytes) per asset
    * regardless of asset size, and misidentified bytes fail later in
    * the real bounds-checked decoder, never silently here. */
  def sniffType(bytes: Array[Byte]): String = {
    def at(i: Int): Int = if (i < bytes.length) bytes(i) & 0xff else -1
    def ascii(from: Int, s: String): Boolean =
      s.indices.forall(i => at(from + i) == s.charAt(i))
    if (bytes == null || bytes.length < 4) "application/octet-stream"
    else if (at(0) == 0x89 && ascii(1, "PNG")) "image/png"
    else if (at(0) == 0xff && at(1) == 0xd8 && at(2) == 0xff) "image/jpeg"
    else if (ascii(0, "GIF8")) "image/gif"
    else if (ascii(0, "BM")) "image/bmp"
    else if (ascii(0, "RIFF") && ascii(8, "WAVE")) "audio/wav"
    else if (ascii(0, "fLaC")) "audio/flac"
    else if (ascii(4, "ftyp")) "video/mp4"
    else if (ascii(0, "GFV1")) "video/x-gfv1"
    else if (at(0) == 0x1f && at(1) == 0x8b) "application/gzip"
    else if (ascii(0, "WARC/")) "application/warc"
    // MP3: an ID3v2 prefix, or a bare MPEG audio sync (11 set bits) —
    // AFTER jpeg (FF D8 FF would also match the sync mask)
    else if (ascii(0, "ID3")) "audio/mpeg"
    else if (at(0) == 0xff && (at(1) & 0xe0) == 0xe0) "audio/mpeg"
    else "application/octet-stream"
  }

  /** Partition-batch sniff over a binary column: (id, mime,
    * n_bytes) — the route-then-decode head of a mixed-media ingest
    * (metadata-only, media bytes never leave the partition). */
  def sniffTypeDf(df: DataFrame, idCol: String, mediaCol: String)
      : DataFrame = {
    val spark = df.sparkSession
    val idIdx = df.schema.fieldIndex(idCol)
    val mIdx = df.schema.fieldIndex(mediaCol)
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("mime", StringType, nullable = false),
      StructField("n_bytes", LongType, nullable = false)))
    val rdd = df.rdd.mapPartitions { rows =>
      rows.map { r =>
        val b = r.getAs[Array[Byte]](mIdx)
        Row(r.getLong(idIdx),
          if (b == null) "application/octet-stream" else sniffType(b),
          if (b == null) 0L else b.length.toLong)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** [[aHash64]] over a raw GRAYSCALE plane (row-major w×h ints in
    * 0..255) — the form a decoded video frame arrives in
    * ([[Mp4.mjpegFrameHashesDf]]). Identical contract: nearest-
    * neighbor 8×8 downsample with the `x·w div 8` source mapping,
    * strict-mean threshold, non-negative 32-bit halves. */
  def grayAHash64(plane: Array[Int], w: Int, h: Int): (Long, Long) = {
    require(w > 0 && h > 0 && plane.length >= w * h,
      s"grayAHash64: bad plane ${plane.length} for ${w}x$h")
    val lumas = new Array[Long](64)
    var sum = 0L
    var i = 0
    while (i < 64) {
      val sx = ((i % 8).toLong * w / 8).toInt
      val sy = ((i / 8).toLong * h / 8).toInt
      val l = plane(sy * w + sx).toLong
      lumas(i) = l; sum += l; i += 1
    }
    val mean = sum / 64
    var hi = 0L; var lo = 0L
    i = 0
    while (i < 64) {
      if (lumas(i) > mean) {
        if (i < 32) lo |= 1L << i else hi |= 1L << (i - 32)
      }
      i += 1
    }
    (hi, lo)
  }

  def aHash64(bytes: Array[Byte]): (Long, Long) = {
    val small = resizeBmp24(bytes, 8, 8)
    val dataOff = le32(small, 10)
    // encodeBmp24 output: bottom-up, stride 8*3 = 24 (already 4-aligned)
    val lumas = new Array[Long](64)
    var sum = 0L
    var y = 0
    while (y < 8) {
      var o = dataOff + (7 - y) * 24
      var x = 0
      while (x < 8) {
        val b = small(o) & 0xff
        val g = small(o + 1) & 0xff
        val r = small(o + 2) & 0xff
        val l = (r + g + b) / 3
        lumas(y * 8 + x) = l
        sum += l
        o += 3; x += 1
      }
      y += 1
    }
    val mean = sum / 64
    var hi = 0L; var lo = 0L
    var i = 0
    while (i < 64) {
      if (lumas(i) > mean) {
        if (i < 32) lo |= 1L << i else hi |= 1L << (i - 32)
      }
      i += 1
    }
    (hi, lo)
  }

  /** 32-bit energy-contour fingerprint of a PCM-16 WAV — the audio
    * sibling of [[aHash64]]: the sample stream splits into 32 equal
    * windows (window j covers samples [j·n div 32, (j+1)·n div 32);
    * empty windows, possible when n < 32, contribute energy 0), each
    * window's energy is the integer mean of |sample|, and bit j sets
    * when window j's energy strictly exceeds the integer mean of the
    * 32 energies. Loudness-profile near-dups (re-encodes, small
    * trims) land within small hamming distance; silence hashes to 0.
    * All arithmetic integer — a SQL oracle replays it exactly. */
  def audioEnergyHash32(bytes: Array[Byte]): Long = {
    val samples = scala.collection.mutable.ArrayBuffer.empty[Int]
    require(bytes.length >= 12 && tag(bytes, 0) == "RIFF" &&
            tag(bytes, 8) == "WAVE", "not a RIFF/WAVE stream")
    var off = 12
    var bits = -1
    while (off + 8 <= bytes.length) {
      val id = tag(bytes, off)
      val len = le32(bytes, off + 4)
      require(len >= 0 && off + 8 + len <= bytes.length,
        s"chunk $id overruns the stream")
      id match {
        case "fmt " =>
          require(len >= 16, "fmt chunk too short")
          require(le16(bytes, off + 8) == 1, "not PCM")
          require(le16(bytes, off + 10) == 1, "mono only")
          bits = le16(bytes, off + 22)
          require(bits == 16, s"only PCM-16 supported, got $bits")
        case "data" =>
          require(bits == 16, "data chunk before fmt")
          var i = off + 8
          val end = off + 8 + len
          while (i + 1 < end) {
            samples += le16(bytes, i).toShort.toInt
            i += 2
          }
        case _ => ()
      }
      off += 8 + len + (len & 1)
    }
    val n = samples.length
    if (n == 0) return 0L
    val energies = new Array[Long](32)
    var j = 0
    var esum = 0L
    while (j < 32) {
      val from = j * n / 32
      val to = (j + 1) * n / 32
      var s = 0L; var i = from
      while (i < to) { s += math.abs(samples(i)); i += 1 }
      energies(j) = if (to > from) s / (to - from) else 0L
      esum += energies(j)
      j += 1
    }
    val mean = esum / 32
    var h = 0L; var k = 0
    while (k < 32) {
      if (energies(k) > mean) h |= 1L << k
      k += 1
    }
    h
  }

  /** Per-asset energy-hash frame: (asset_id, ehash) — typed
    * partition-local seam, no shuffle, null media → null hash. */
  def audioEnergyHashDf(df: DataFrame, idCol: String, mediaCol: String)
      : DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType),
      StructField("ehash", LongType)))
    val idIdx = df.schema.fieldIndex(idCol)
    val mIdx = df.schema.fieldIndex(mediaCol)
    val rdd = df.rdd.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](mIdx)
        if (bytes == null) Row(r.getLong(idIdx), null)
        else Row(r.getLong(idIdx), audioEnergyHash32(bytes))
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Per-asset aHash frame: (asset_id, hash_hi, hash_lo) — the same
    * typed partition-local seam as the stats decoders (no shuffle;
    * missing media yields null halves). */
  def aHashDf(df: DataFrame, idCol: String, mediaCol: String): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType),
      StructField("hash_hi", LongType),
      StructField("hash_lo", LongType)))
    val idIdx = df.schema.fieldIndex(idCol)
    val mIdx = df.schema.fieldIndex(mediaCol)
    val rdd = df.rdd.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](mIdx)
        if (bytes == null) Row(r.getLong(idIdx), null, null)
        else {
          val (hi, lo) = aHash64(bytes)
          Row(r.getLong(idIdx), hi, lo)
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Deterministic per-id image synthesis + BMP encode:
    * w = 8 + id mod 9, h = 5 + id mod 7,
    * r = (id·3 + x·7 + y·11) mod 256, g = (id·5 + x·13 + y·3) mod 256,
    * b = (id·7 + x + y·17) mod 256 — arithmetic a SQL oracle replays. */
  def synthBmp24(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType),
      StructField("media", BinaryType)))
    val idIdx = df.schema.fieldIndex(idCol)
    val rdd = df.rdd.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(idIdx)
        val w = (8 + id % 9).toInt
        val h = (5 + id % 7).toInt
        val bytes = encodeBmp24(w, h, (x, y) => (
          ((id * 3 + x * 7 + y * 11) % 256).toInt,
          ((id * 5 + x * 13 + y * 3) % 256).toInt,
          ((id * 7 + x + y * 17) % 256).toInt))
        Row(id, bytes)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Deterministic per-id PCM synthesis + WAV encode (the testdata has
    * no real audio files, so the corpus is synthesized from doc ids with
    * arithmetic a SQL oracle replays exactly): nSamples = 20 + id % 50,
    * sample(i) = ((id+1)·7919 + i·104729) mod 65521 − 32760. */
  def synthWavPcm16(df: DataFrame, idCol: String,
                    sampleRate: Int = 8000): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType),
      StructField("media", BinaryType)))
    val idIdx = df.schema.fieldIndex(idCol)
    val rdd = df.rdd.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(idIdx)
        val n = (20 + (id % 50)).toInt
        val samples = Array.tabulate(n) { i =>
          (((id + 1) * 7919L + i * 104729L) % 65521L - 32760L).toShort
        }
        Row(id, encodeWavPcm16(samples, sampleRate))
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  // ----- video: frame-indexed container + SAMPLED decode -------------

  /** GFV1 frame container: `GFV1` magic, int32 frame count, int64
    * absolute offsets (one per frame), then the frames — each a
    * standalone BMP. The offset INDEX is the point: frame sampling
    * reads the header and slices only the sampled frames, never
    * decoding (or at real scale, never even fetching — pair with a
    * ranged read) the frames between. That index-then-partial-decode
    * walk is the shape every real video pipeline (mp4 stbl/stco,
    * mkv cues) has; the container is minimal so the whole path stays
    * dependency-free and oracle-replayable. */
  def encodeFrameSeq(frames: Seq[Array[Byte]]): Array[Byte] = {
    require(frames.nonEmpty, "empty frame sequence")
    val headerLen = 8 + 8 * frames.size
    val offsets = frames.scanLeft(headerLen.toLong)(_ + _.length)
    val bb = java.nio.ByteBuffer
      .allocate(offsets.last.toInt)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put('G'.toByte).put('F'.toByte).put('V'.toByte).put('1'.toByte)
    bb.putInt(frames.size)
    offsets.init.foreach(bb.putLong)
    frames.foreach(bb.put)
    bb.array()
  }

  /** Walk a [[encodeFrameSeq]] container's index and decode ONLY every
    * `stride`-th frame (0, stride, 2·stride, …). Returns
    * (nFrames, sampled (frameIdx, stats)). */
  def sampleFrameStats(bytes: Array[Byte], stride: Int)
      : (Int, Seq[(Int, BmpStats)]) = {
    require(stride >= 1, s"stride must be >= 1, got $stride")
    require(bytes.length >= 8 && bytes(0) == 'G'.toByte &&
      bytes(1) == 'F'.toByte && bytes(2) == 'V'.toByte &&
      bytes(3) == '1'.toByte, "not a GFV1 stream")
    val n = le32(bytes, 4)
    require(n >= 1 && bytes.length >= 8 + 8 * n, "corrupt frame index")
    def off(i: Int): Long =
      java.nio.ByteBuffer.wrap(bytes, 8 + 8 * i, 8)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).getLong
    val sampled = (0 until n by stride).map { i =>
      val from = off(i)
      val until = if (i == n - 1) bytes.length.toLong else off(i + 1)
      i -> decodeBmp24(
        java.util.Arrays.copyOfRange(bytes, from.toInt, until.toInt))
    }
    (n, sampled)
  }

  /** Partition-batch frame sampling over a binary video column: one
    * output row per SAMPLED frame —
    * (asset_id, n_frames, frame_idx, width, height, sum_r, sum_g,
    * sum_b). Missing media yields no rows (nothing to sample). */
  def sampleFrameStatsDf(df: DataFrame, idCol: String, mediaCol: String,
                         stride: Int): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType),
      StructField("n_frames", IntegerType),
      StructField("frame_idx", IntegerType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("sum_r", LongType),
      StructField("sum_g", LongType),
      StructField("sum_b", LongType)))
    val idIdx = df.schema.fieldIndex(idCol)
    val mIdx = df.schema.fieldIndex(mediaCol)
    val rdd = df.rdd.mapPartitions { rows =>
      rows.flatMap { r =>
        val bytes = r.getAs[Array[Byte]](mIdx)
        if (bytes == null) Iterator.empty
        else {
          val (n, sampled) = sampleFrameStats(bytes, stride)
          sampled.iterator.map { case (i, st) =>
            Row(r.getLong(idIdx), n, i, st.width, st.height,
              st.sumR, st.sumG, st.sumB)
          }
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Typed row for the streaming-capable frame-sampling seam. */
  final case class FrameRow(asset_id: Long, n_frames: Int, frame_idx: Int,
                            width: Int, height: Int,
                            sum_r: Long, sum_g: Long, sum_b: Long)

  /** Streaming-capable frame sampling: the SAME index-walk kernel as
    * [[sampleFrameStatsDf]], but through `Dataset.mapPartitions` with
    * encoders instead of `df.rdd` — an RDD hop is illegal on a
    * streaming frame, while typed mapPartitions runs identically in
    * batch and under Structured Streaming (stateless, append mode).
    * Input: (asset_id, media) tuples; null media yields no rows.
    * This is the decode seam a stream of arriving assets actually
    * uses; StreamingSpec pins stream == batch == arithmetic oracle. */
  def sampleFrameStatsTyped(
      ds: org.apache.spark.sql.Dataset[(Long, Array[Byte])],
      stride: Int): org.apache.spark.sql.Dataset[FrameRow] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.flatMap { case (id, bytes) =>
        if (bytes == null) Iterator.empty
        else {
          val (n, sampled) = sampleFrameStats(bytes, stride)
          sampled.iterator.map { case (i, st) =>
            FrameRow(id, n, i, st.width, st.height,
              st.sumR, st.sumG, st.sumB)
          }
        }
      }
    }
  }

  /** Deterministic per-id video synthesis: n = 2 + id mod 4 frames,
    * each frame a BMP of fixed size w = 6 + id mod 5, h = 4 + id mod 5
    * whose pixels run the [[synthBmp24]] channel formulas with
    * fid = id·31 + frame·7 — pure arithmetic a SQL oracle replays. */
  /** Per-sampled-frame perceptual hashes of a GFV1 video column:
    * (asset_id, n_frames, frame_idx, hash_hi, hash_lo) — the video
    * fingerprint is its frame-hash sequence, the unit every
    * near-dup-video screen keys on (shared-frame matching via
    * [[graft.ops.Dedup.hammingPairs64Between]], clip containment via
    * subsequence overlap). Index-walking partial decode: only sampled
    * frames are sliced and hashed, same contract as
    * [[sampleFrameStats]]. */
  def videoFrameHashesDf(df: DataFrame, idCol: String, mediaCol: String,
                         stride: Int): DataFrame = {
    require(stride >= 1, s"stride must be >= 1, got $stride")
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType),
      StructField("n_frames", IntegerType),
      StructField("frame_idx", IntegerType),
      StructField("hash_hi", LongType),
      StructField("hash_lo", LongType)))
    val idIdx = df.schema.fieldIndex(idCol)
    val mIdx = df.schema.fieldIndex(mediaCol)
    val rdd = df.rdd.mapPartitions { rows =>
      rows.flatMap { r =>
        val bytes = r.getAs[Array[Byte]](mIdx)
        if (bytes == null) Iterator.empty
        else {
          require(bytes.length >= 8 && bytes(0) == 'G'.toByte &&
            bytes(1) == 'F'.toByte && bytes(2) == 'V'.toByte &&
            bytes(3) == '1'.toByte, "not a GFV1 stream")
          val n = le32(bytes, 4)
          require(n >= 1 && bytes.length >= 8 + 8 * n,
            "corrupt frame index")
          def off(i: Int): Long =
            java.nio.ByteBuffer.wrap(bytes, 8 + 8 * i, 8)
              .order(java.nio.ByteOrder.LITTLE_ENDIAN).getLong
          val id = r.getLong(idIdx)
          (0 until n by stride).iterator.map { i =>
            val from = off(i)
            val until = if (i == n - 1) bytes.length.toLong
                        else off(i + 1)
            val (hi, lo) = aHash64(java.util.Arrays.copyOfRange(
              bytes, from.toInt, until.toInt))
            Row(id, n, i, hi, lo)
          }
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  def synthVideo(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType),
      StructField("media", BinaryType)))
    val idIdx = df.schema.fieldIndex(idCol)
    val rdd = df.rdd.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(idIdx)
        val n = (2 + id % 4).toInt
        val w = (6 + id % 5).toInt
        val h = (4 + id % 5).toInt
        val frames = (0 until n).map { f =>
          val fid = id * 31 + f * 7
          encodeBmp24(w, h, (x, y) => (
            ((fid * 3 + x * 7 + y * 11) % 256).toInt,
            ((fid * 5 + x * 13 + y * 3) % 256).toInt,
            ((fid * 7 + x + y * 17) % 256).toInt))
        }
        Row(id, encodeFrameSeq(frames))
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }
}
