package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Real ISO BMFF (MP4) CONTAINER codec — encoder and demuxer, JDK-only.
  *
  * The container layer of MPEG-4 is pure STRUCTURE (ISO/IEC 14496-12):
  * length-prefixed typed boxes in a tree — `ftyp`, `moov` holding
  * `mvhd`/`trak`/`mdia`/`stbl` sample tables, `mdat` payload — the
  * same derivable-from-spec class as RIFF/WAVE and the PNG chunk walk,
  * with no opaque tabulated data anywhere. So the practical
  * training-pipeline op on video — "extract duration / resolution /
  * track layout / sample geometry WITHOUT decoding frames" — is fully
  * implementable offline, and that is exactly what a 100 TB video
  * curation pass does first (metadata gates run on every asset; frame
  * decode runs on the small survivor set). The CODEC payload (H.264
  * etc.) stays behind the documented stub seam — its entropy tables
  * are the non-derivable part (see [[Multimodal.stubDecodeKernel]]).
  *
  * [[synthMp4]] writes a minimal but SPEC-SHAPED file per row — ftyp +
  * moov(mvhd + one video trak with tkhd/mdia/hdlr/minf/stbl
  * stsd(avc1)/stts/stsz/stsc/stco) + mdat — and [[demuxMp4]] walks the
  * real box tree (bounds-checked, size-validated, 64-bit `largesize`
  * accepted) to recover the metadata. The demuxer is general: it reads
  * any v0/v1 mvhd/tkhd/mdhd layout, multiple traks, and sums sample
  * tables — not just what the encoder emits ([[graft.MultimodalSpec]]
  * exercises both the round trip and truncation failures).
  *
  * Scale shape: identical to the image codecs — the partition-batch
  * seam ([[Multimodal.decodeFeatures]]'s contract), metadata columns
  * project before any join so mdat bytes never shuffle.
  */
object Mp4 {

  // ---- encode ----

  private def be16(v: Int): Array[Byte] =
    Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def be32(v: Long): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def fourcc(s: String): Array[Byte] = {
    require(s.length == 4, s"fourcc '$s'")
    s.getBytes("US-ASCII")
  }
  private def box(typ: String, body: Array[Byte]*): Array[Byte] = {
    val payload = body.flatten.toArray
    be32(payload.length + 8L) ++ fourcc(typ) ++ payload
  }
  private def fullBox(typ: String, version: Int, flags: Int,
                      body: Array[Byte]*): Array[Byte] =
    box(typ, Array(((version & 0xff).toByte)),
      Array(((flags >> 16) & 0xff).toByte, ((flags >> 8) & 0xff).toByte,
        (flags & 0xff).toByte),
      body.flatten.toArray)

  /** Encode a one-video-track MP4: `nSamples` samples of the given
    * byte sizes, constant `sampleDelta` ticks at `timescale`, mdat
    * holds the concatenated (stub) sample payloads. Returns the full
    * file bytes. */
  def encodeMp4(width: Int, height: Int, timescale: Long,
                sampleDelta: Long, sampleSizes: Array[Int],
                payload: Array[Byte]): Array[Byte] = {
    require(width > 0 && height > 0, "empty frame size")
    require(width <= 0xffff && height <= 0xffff,
      s"avc1 sample-entry dimensions are 16-bit: ${width}x$height")
    require(timescale > 0 && sampleDelta > 0, "zero timescale/delta")
    require(sampleSizes.forall(_ >= 0), "negative sample size")
    require(payload.length == sampleSizes.map(_.toLong).sum,
      "payload length != sum of sample sizes")
    val n = sampleSizes.length
    val duration = sampleDelta * n
    val ftyp = box("ftyp", fourcc("isom"), be32(0x200L), fourcc("isom"),
      fourcc("avc1"))
    val mvhd = fullBox("mvhd", 0, 0,
      be32(0), be32(0),                 // ctime, mtime
      be32(timescale), be32(duration),
      be32(0x00010000L), be16(0x0100), be16(0), // rate, volume, reserved
      be32(0), be32(0),                 // reserved
      // unity matrix
      be32(0x00010000L), be32(0), be32(0),
      be32(0), be32(0x00010000L), be32(0),
      be32(0), be32(0), be32(0x40000000L),
      be32(0), be32(0), be32(0), be32(0), be32(0), be32(0), // predefined
      be32(2))                          // next track id
    val tkhd = fullBox("tkhd", 0, 7,
      be32(0), be32(0), be32(1), be32(0), be32(duration),
      be32(0), be32(0),                 // reserved
      be16(0), be16(0), be16(0), be16(0), // layer, altgroup, vol, rsvd
      be32(0x00010000L), be32(0), be32(0),
      be32(0), be32(0x00010000L), be32(0),
      be32(0), be32(0), be32(0x40000000L),
      be32(width.toLong << 16), be32(height.toLong << 16)) // 16.16
    val mdhd = fullBox("mdhd", 0, 0,
      be32(0), be32(0), be32(timescale), be32(duration),
      be16(0x55c4), be16(0))            // language "und", predefined
    val hdlr = fullBox("hdlr", 0, 0,
      be32(0), fourcc("vide"), be32(0), be32(0), be32(0),
      "graft video".getBytes("US-ASCII") :+ 0.toByte)
    val avc1 = box("avc1",
      Array.fill[Byte](6)(0), be16(1),  // reserved, data_ref_index
      be16(0), be16(0), Array.fill[Byte](12)(0), // predefined/reserved
      be16(width), be16(height),
      be32(0x00480000L), be32(0x00480000L), // 72 dpi
      be32(0), be16(1),                 // reserved, frame_count
      Array.fill[Byte](32)(0),          // compressorname
      be16(24), be16(0xffff))           // depth, predefined(-1)
    val stsd = fullBox("stsd", 0, 0, be32(1), avc1)
    val stts = fullBox("stts", 0, 0, be32(1), be32(n.toLong),
      be32(sampleDelta))
    val stsc = fullBox("stsc", 0, 0, be32(1), be32(1),
      be32(math.max(n, 1).toLong), be32(1))
    val stsz = fullBox("stsz", 0, 0, be32(0), be32(n.toLong),
      sampleSizes.flatMap(sz => be32(sz.toLong)))
    // one chunk; its offset = after everything before mdat's payload.
    // Compute by assembling with a placeholder then patching.
    def assemble(chunkOff: Long): Array[Byte] = {
      val stco = fullBox("stco", 0, 0, be32(1), be32(chunkOff))
      val stbl = box("stbl", stsd, stts, stsc, stsz, stco)
      val dref = fullBox("dref", 0, 0, be32(1),
        fullBox("url ", 0, 1))
      val dinf = box("dinf", dref)
      val vmhd = fullBox("vmhd", 0, 1, be16(0), be16(0), be16(0), be16(0))
      val minf = box("minf", vmhd, dinf, stbl)
      val mdia = box("mdia", mdhd, hdlr, minf)
      val trak = box("trak", tkhd, mdia)
      val moov = box("moov", mvhd, trak)
      val mdat = box("mdat", payload)
      ftyp ++ moov ++ mdat
    }
    val probe = assemble(0L)
    val mdatPayloadOff = probe.length - payload.length
    assemble(mdatPayloadOff.toLong)
  }

  // ---- demux ----

  /** Demuxed container metadata (no codec decode). */
  final case class Mp4Meta(brand: String, timescale: Long,
                           durationTicks: Long, nTracks: Int,
                           handler: String, width: Int, height: Int,
                           nSamples: Long, sumSampleBytes: Long,
                           sampleDelta: Long)

  private def u16(b: Array[Byte], o: Int): Int = {
    require(o + 2 <= b.length, "mp4: truncated u16")
    ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
  }
  private def u32(b: Array[Byte], o: Int): Long = {
    require(o + 4 <= b.length, "mp4: truncated u32")
    ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
      ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
  }
  private def u64(b: Array[Byte], o: Int): Long =
    (u32(b, o) << 32) | u32(b, o + 4)
  private def typ(b: Array[Byte], o: Int): String = {
    require(o + 4 <= b.length, "mp4: truncated box type")
    new String(b, o, 4, "US-ASCII")
  }

  /** Walk the children of [from, to): invoke f(type, bodyFrom, bodyTo).
    * Bounds-checked: a corrupt size surfaces as IllegalArgumentException,
    * never an out-of-bounds read. */
  private def walk(b: Array[Byte], from: Int, to: Int)
                  (f: (String, Int, Int) => Unit): Unit = {
    var off = from
    while (off < to) {
      require(off + 8 <= to, "mp4: truncated box header")
      var size = u32(b, off)
      val t = typ(b, off + 4)
      var hdr = 8
      if (size == 1L) { size = u64(b, off + 8); hdr = 16 }
      else if (size == 0L) size = (to - off).toLong // box runs to end
      require(size >= hdr && off + size <= to,
        s"mp4: box '$t' size $size out of bounds")
      f(t, off + hdr, off + size.toInt)
      off += size.toInt
    }
  }

  /** Parse container metadata from a full MP4 byte stream. Reads
    * v0 AND v1 full-box layouts, multiple traks (the FIRST trak's
    * geometry is reported; nTracks counts all), and the stts/stsz
    * tables. Throws on malformed input. */
  def demuxMp4(bytes: Array[Byte]): Mp4Meta = {
    var brand = ""
    var timescale = 0L; var duration = 0L
    var nTracks = 0
    var handler = ""; var width = 0; var height = 0
    var nSamples = 0L; var sumBytes = 0L; var delta = 0L
    var sawMoov = false
    walk(bytes, 0, bytes.length) {
      case ("ftyp", f, _) => brand = typ(bytes, f)
      case ("moov", f0, t0) =>
        sawMoov = true
        walk(bytes, f0, t0) {
          case ("mvhd", f, _) =>
            val v = bytes(f) & 0xff
            if (v == 1) { timescale = u32(bytes, f + 20)
                          duration = u64(bytes, f + 24) }
            else { timescale = u32(bytes, f + 12)
                   duration = u32(bytes, f + 16) }
          case ("trak", f1, t1) =>
            nTracks += 1
            val first = nTracks == 1
            walk(bytes, f1, t1) {
              case ("tkhd", _, t) if first =>
                // width/height are the LAST 8 bytes of both the v0 and
                // v1 layouts (16.16 fixed point)
                width = (u32(bytes, t - 8) >> 16).toInt
                height = (u32(bytes, t - 4) >> 16).toInt
              case ("mdia", f2, t2) if first =>
                walk(bytes, f2, t2) {
                  case ("hdlr", f, _) => handler = typ(bytes, f + 8)
                  case ("minf", f3, t3) =>
                    walk(bytes, f3, t3) {
                      case ("stbl", f4, t4) =>
                        walk(bytes, f4, t4) {
                          case ("stts", f, _) =>
                            val n = u32(bytes, f + 4).toInt
                            if (n > 0) delta = u32(bytes, f + 12)
                          case ("stsz", f, _) =>
                            val fixed = u32(bytes, f + 4)
                            val n = u32(bytes, f + 8)
                            nSamples = n
                            if (fixed != 0L) sumBytes = fixed * n
                            else {
                              var i = 0
                              while (i < n) {
                                sumBytes += u32(bytes, f + 12 + 4 * i)
                                i += 1
                              }
                            }
                          case _ => ()
                        }
                      case _ => ()
                    }
                  case _ => ()
                }
              case _ => ()
            }
          case _ => ()
        }
      case _ => ()
    }
    require(sawMoov, "mp4: no moov box")
    Mp4Meta(brand, timescale, duration, nTracks, handler,
      width, height, nSamples, sumBytes, delta)
  }

  // ---- Spark surface ----

  /** Synthetic per-row MP4 corpus: geometry/timing derived from the id
    * by fixed formulas (the oracle's closed form), stub payload bytes.
    * Returns (asset_id, media). */
  def synthMp4(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    val idIdx = df.schema.fieldIndex(idCol)
    val rdd = df.rdd.map { r =>
      val id = r.getLong(idIdx)
      val w = (64 + 16 * (id % 8)).toInt
      val h = (48 + 16 * (id % 5)).toInt
      val n = (3 + id % 6).toInt
      val sizes = Array.tabulate(n)(i => (40 + ((id + i) % 25)).toInt)
      val payload = Array.tabulate(sizes.sum)(i =>
        ((id * 31 + i) % 251).toByte)
      Row(id, encodeMp4(w, h, timescale = 1000L + (id % 3) * 500L,
        sampleDelta = 40L, sampleSizes = sizes, payload = payload))
    }
    spark.createDataFrame(rdd, StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("media", BinaryType))))
  }

  /** Partition-batch demux → metadata stats frame (the video analog
    * of [[Jpeg.decodeJpegStatsDf]]): container metadata only, no
    * frame decode. */
  def demuxMp4StatsDf(df: DataFrame, idCol: String, mediaCol: String)
      : DataFrame = {
    val spark = df.sparkSession
    val idIdx = df.schema.fieldIndex(idCol)
    val mIdx = df.schema.fieldIndex(mediaCol)
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("brand", StringType),
      StructField("timescale", LongType),
      StructField("duration_ms", LongType),
      StructField("n_tracks", IntegerType),
      StructField("handler", StringType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("n_samples", LongType),
      StructField("sum_sample_bytes", LongType)))
    val rdd = df.rdd.mapPartitions { rows =>
      rows.map { r =>
        val m = demuxMp4(r.getAs[Array[Byte]](mIdx))
        Row(r.getLong(idIdx), m.brand, m.timescale,
          // integer milliseconds: duration is ticks over timescale
          m.durationTicks * 1000L / math.max(m.timescale, 1L),
          m.nTracks, m.handler, m.width, m.height,
          m.nSamples, m.sumSampleBytes)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }
}
