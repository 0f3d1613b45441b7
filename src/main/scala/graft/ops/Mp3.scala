package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** MPEG audio (MP3) FRAME-HEADER demux — JDK-only, metadata only.
  *
  * The crawl-ingest triage need on audio is the same as on video
  * ([[Mp4]]): duration / bitrate / sample-rate / corruption stats for
  * every asset WITHOUT decoding samples, so the metadata gates run on
  * 100 TB and the (stubbed — see [[Multimodal.stubDecodeKernel]]'s
  * rationale) sample decode runs only on the survivor set. Unlike the
  * Layer III sample pipeline, the FRAME LAYER is pure published
  * structure (ISO/IEC 11172-3 / 13818-3): an 11-bit sync pattern, a
  * 4-byte header whose fields index two small published tables
  * (bitrate kbps and sample rate per MPEG version), and a closed-form
  * frame length `samples/8 × bitrate ÷ rate + padding` — no opaque
  * entropy tables anywhere, the same derivable-from-spec class as the
  * RIFF and ISO-BMFF walks.
  *
  * The walker is GENERAL and hostile-input-hardened: it skips an
  * ID3v2 prefix (syncsafe size), RESYNCS over junk between frames
  * (counting the skipped bytes — the triage signal for mid-stream
  * corruption), stops at a trailing ID3v1 "TAG" block without
  * miscounting it as junk, rejects reserved version/layer/bitrate/
  * rate codes at the header stage, and treats a final frame whose
  * declared length overruns the buffer as a TEAR (dropped and
  * flagged, costing that frame and nothing else — the per-fragment
  * truncation-tolerance contract fMP4 set).
  *
  * Scale shape: identical to every codec here — one compiled pass per
  * asset behind the partition-batch seam, stats columns project
  * before any join, media bytes never shuffle.
  */
object Mp3 {

  // published bitrate tables (kbps), Layer III; index 0 = "free"
  // (unsupported here), 15 = invalid
  private val brMpeg1 = Array(0, 32, 40, 48, 56, 64, 80, 96, 112,
    128, 160, 192, 224, 256, 320)
  private val brMpeg2 = Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80,
    96, 112, 128, 144, 160)
  // sample rates by version (index 3 = reserved)
  private val srMpeg1 = Array(44100, 48000, 32000)
  private val srMpeg2 = Array(22050, 24000, 16000)
  private val srMpeg25 = Array(11025, 12000, 8000)

  /** One parsed frame header: (bitrateKbps, sampleRate,
    * samplesPerFrame, frameLenBytes). None = not a valid Layer III
    * header at this offset. */
  private def header(b: Array[Byte], i: Int)
      : Option[(Int, Int, Int, Int)] = {
    if (i + 4 > b.length) return None
    val b0 = b(i) & 0xff; val b1 = b(i + 1) & 0xff
    val b2 = b(i + 2) & 0xff
    if (b0 != 0xff || (b1 & 0xe0) != 0xe0) return None
    val verBits = (b1 >> 3) & 0x3   // 0=MPEG2.5 1=reserved 2=MPEG2 3=MPEG1
    val layerBits = (b1 >> 1) & 0x3 // 1 = Layer III
    if (verBits == 1 || layerBits != 1) return None
    val brIdx = (b2 >> 4) & 0xf
    val srIdx = (b2 >> 2) & 0x3
    val pad = (b2 >> 1) & 0x1
    if (brIdx == 0 || brIdx == 15 || srIdx == 3) return None
    val mpeg1 = verBits == 3
    val kbps = (if (mpeg1) brMpeg1 else brMpeg2)(brIdx)
    val rate = (verBits match {
      case 3 => srMpeg1
      case 2 => srMpeg2
      case _ => srMpeg25
    })(srIdx)
    val spf = if (mpeg1) 1152 else 576
    // spf/8 × bitrate ÷ rate + padding — the spec's Layer III length
    val len = (spf / 8) * (kbps * 1000) / rate + pad
    Some((kbps, rate, spf, len))
  }

  /** Demuxed stats of one MP3 blob. All-failure inputs come back as
    * zero frames rather than an exception (quarantine-by-stats). */
  final case class Mp3Stats(nFrames: Int, sampleRate: Int,
                            durationMs: Long, brMin: Int, brMax: Int,
                            vbr: Boolean, bytesSkipped: Long,
                            truncated: Boolean)

  def demux(bytes: Array[Byte]): Mp3Stats = {
    if (bytes == null || bytes.length < 4)
      return Mp3Stats(0, 0, 0L, 0, 0, vbr = false, 0L,
        truncated = false)
    var i = 0
    // ID3v2 prefix: "ID3" ver(2) flags(1) syncsafe-size(4)
    if (bytes.length >= 10 && bytes(0) == 'I' && bytes(1) == 'D' &&
        bytes(2) == '3') {
      val sz = ((bytes(6) & 0x7f) << 21) | ((bytes(7) & 0x7f) << 14) |
        ((bytes(8) & 0x7f) << 7) | (bytes(9) & 0x7f)
      i = math.min(bytes.length, 10 + sz)
    }
    // trailing ID3v1 block is metadata, not junk
    val end =
      if (bytes.length >= 128 && bytes(bytes.length - 128) == 'T' &&
          bytes(bytes.length - 127) == 'A' &&
          bytes(bytes.length - 126) == 'G')
        bytes.length - 128
      else bytes.length
    var frames = 0; var rate = 0; var samples = 0L
    var brMin = Int.MaxValue; var brMax = 0
    var skipped = 0L; var truncated = false
    var done = false
    while (!done && i < end) {
      header(bytes, i) match {
        case Some((kbps, sr, spf, len)) =>
          if (i + len > end) {
            // torn final frame: drop it, flag the asset, stop — the
            // frames before the tear all survive
            truncated = true
            done = true
          } else {
            frames += 1
            rate = sr
            samples += spf
            brMin = math.min(brMin, kbps)
            brMax = math.max(brMax, kbps)
            i += len
          }
        case None =>
          // resync: junk byte between frames (or a tail too short to
          // even hold a header)
          if (i + 4 > end) done = true
          else { skipped += 1; i += 1 }
      }
    }
    val durMs = if (rate == 0) 0L else samples * 1000L / rate
    Mp3Stats(frames, rate, durMs,
      if (frames == 0) 0 else brMin, brMax,
      vbr = frames > 0 && brMin != brMax, skipped, truncated)
  }

  /** Partition-batch demux over a binary column: one stats row per
    * asset, metadata-only (the usual codec seam). */
  def mp3StatsDf(df: DataFrame, idCol: String, mediaCol: String)
      : DataFrame = {
    val spark = df.sparkSession
    val idIdx = df.schema.fieldIndex(idCol)
    val mIdx = df.schema.fieldIndex(mediaCol)
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("n_frames", IntegerType, nullable = false),
      StructField("sample_rate", IntegerType, nullable = false),
      StructField("duration_ms", LongType, nullable = false),
      StructField("br_min", IntegerType, nullable = false),
      StructField("br_max", IntegerType, nullable = false),
      StructField("vbr", IntegerType, nullable = false),
      StructField("bytes_skipped", LongType, nullable = false),
      StructField("truncated", IntegerType, nullable = false)))
    val rdd = df.rdd.mapPartitions { rows =>
      rows.map { r =>
        val st = demux(r.getAs[Array[Byte]](mIdx))
        Row(r.getLong(idIdx), st.nFrames, st.sampleRate,
          st.durationMs, st.brMin, st.brMax, if (st.vbr) 1 else 0,
          st.bytesSkipped, if (st.truncated) 1 else 0)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  // ---- synthesis (test corpus) --------------------------------------

  /** Deterministic per-id MP3 stream covering the demuxer's surface:
    * MPEG-1 rates by id%3, an MPEG-2 (22050 Hz) cohort at id%11==5,
    * VBR (cycling bitrate index) at id%4==1, an ID3v2 prefix always,
    * an ID3v1 trailer at id%6==0, 5 junk resync bytes before frame 1
    * at id%7==3, and a HALF-TORN final frame at id%5==2. Payload
    * bytes are a deterministic fill, never parsed (frame layer
    * only). */
  def synthBytes(id: Long): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    // ID3v2.3 prefix with (16 + id%16) payload bytes
    val tagLen = (16 + id % 16).toInt
    out.write(Array[Byte]('I', 'D', '3', 3, 0, 0))
    out.write(Array[Byte](0, 0, ((tagLen >> 7) & 0x7f).toByte,
      (tagLen & 0x7f).toByte))
    (0 until tagLen).foreach(j => out.write(((id * 13 + j) % 256).toInt))
    val mpeg2 = id % 11 == 5
    val srIdx = if (mpeg2) 0 else (id % 3).toInt
    val vbr = id % 4 == 1
    val nf = (4 + id % 5).toInt
    val spf = if (mpeg2) 576 else 1152
    val rate = (if (mpeg2) srMpeg2 else srMpeg1)(srIdx)
    (0 until nf).foreach { f =>
      if (id % 7 == 3 && f == 1)
        (0 until 5).foreach(_ => out.write(0)) // junk: forces resync
      val brIdx =
        if (vbr) 1 + ((id + f) % 14).toInt else 1 + (id % 14).toInt
      val kbps = (if (mpeg2) brMpeg2 else brMpeg1)(brIdx)
      val pad = ((id + f) % 2).toInt
      val len = (spf / 8) * (kbps * 1000) / rate + pad
      val verBits = if (mpeg2) 2 else 3
      val h = Array[Byte](0xff.toByte,
        (0xe0 | (verBits << 3) | (1 << 1) | 1).toByte, // layer III, no CRC
        ((brIdx << 4) | (srIdx << 2) | (pad << 1)).toByte,
        0xc0.toByte) // mono, no flags
      val frame = new Array[Byte](len)
      System.arraycopy(h, 0, frame, 0, 4)
      (4 until len).foreach(j =>
        frame(j) = ((id * 31 + f * 7 + j) % 256).toByte)
      val emit =
        if (id % 5 == 2 && f == nf - 1) frame.take(len / 2) // torn tail
        else frame
      out.write(emit)
    }
    if (id % 6 == 0) {
      out.write(Array[Byte]('T', 'A', 'G'))
      (0 until 125).foreach(j => out.write(((id * 17 + j) % 256).toInt))
    }
    out.toByteArray
  }

  /** Synth corpus as (asset_id, media) — mirrors
    * [[Mp4.synthFmp4Mjpeg]]'s shape. */
  def synthMp3(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    val idIdx = df.schema.fieldIndex(idCol)
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("media", BinaryType, nullable = false)))
    val rdd = df.rdd.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(idIdx)
        Row(id, synthBytes(id))
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }
}
