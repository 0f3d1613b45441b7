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
                payload: Array[Byte], codec: String = "avc1",
                samplesPerChunk: Int = Int.MaxValue): Array[Byte] = {
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
    require(codec.length == 4, s"codec fourcc '$codec'")
    // the VisualSampleEntry layout (14496-12 §12.1.3) is codec-
    // independent: only the box TYPE names the codec ("avc1", "jpeg"
    // for motion-JPEG tracks, ...)
    val entry = box(codec,
      Array.fill[Byte](6)(0), be16(1),  // reserved, data_ref_index
      be16(0), be16(0), Array.fill[Byte](12)(0), // predefined/reserved
      be16(width), be16(height),
      be32(0x00480000L), be32(0x00480000L), // 72 dpi
      be32(0), be16(1),                 // reserved, frame_count
      Array.fill[Byte](32)(0),          // compressorname
      be16(24), be16(0xffff))           // depth, predefined(-1)
    val stsd = fullBox("stsd", 0, 0, be32(1), entry)
    val stts = fullBox("stts", 0, 0, be32(1), be32(n.toLong),
      be32(sampleDelta))
    // sample→chunk layout: chunks of `samplesPerChunk` samples (one
    // chunk when it exceeds n — the legacy shape). stsc is run-length
    // (first_chunk, samples_per_chunk, desc): one entry for the full
    // chunks plus one for a short tail chunk.
    val spc = if (n == 0) 1 else math.min(math.max(samplesPerChunk, 1), n)
    val nChunks = if (n == 0) 1 else (n + spc - 1) / spc
    val tail = if (n == 0) 1 else n - spc * (nChunks - 1)
    val stscEntries =
      if (n == 0 || tail == spc) Seq((1, spc))
      else Seq((1, spc), (nChunks, tail))
    val stsc = fullBox("stsc", 0, 0, be32(stscEntries.length.toLong),
      stscEntries.toArray.flatMap { case (fc, cnt) =>
        be32(fc.toLong) ++ be32(cnt.toLong) ++ be32(1L) })
    val stsz = fullBox("stsz", 0, 0, be32(0), be32(n.toLong),
      sampleSizes.flatMap(sz => be32(sz.toLong)))
    // chunk offsets = after everything before mdat's payload, plus the
    // bytes of all samples in earlier chunks. Box sizes don't depend on
    // the offset VALUES, so assemble once with a placeholder and patch.
    def assemble(payloadOff: Long): Array[Byte] = {
      val offs = new Array[Long](nChunks)
      var off = payloadOff; var si = 0
      var c = 0
      while (c < nChunks) {
        offs(c) = off
        val k = if (c == nChunks - 1) tail else spc
        var j = 0
        while (j < k && si < n) { off += sampleSizes(si); si += 1; j += 1 }
        c += 1
      }
      val stco = fullBox("stco", 0, 0, be32(nChunks.toLong),
        offs.flatMap(be32))
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

  /** Encode a one-video-track FRAGMENTED MP4 (fMP4 — the CMAF/DASH
    * layout real crawl video overwhelmingly uses): `ftyp` + a `moov`
    * whose sample tables are EMPTY (plus `mvex/trex` defaults), then
    * one `moof`+`mdat` pair per fragment — each `moof` carrying the
    * fragment's own run table (`traf/tfhd` with default-base-is-moof,
    * one `trun` with data-offset + per-sample sizes, 14496-12 §8.8).
    * `fragSizes(i)` are fragment i's sample byte sizes and
    * `payloads(i)` its concatenated sample bytes. */
  def encodeFragmentedMp4(width: Int, height: Int, timescale: Long,
                          sampleDelta: Long,
                          fragSizes: Array[Array[Int]],
                          payloads: Array[Array[Byte]],
                          codec: String = "avc1"): Array[Byte] = {
    require(width > 0 && height > 0, "empty frame size")
    require(width <= 0xffff && height <= 0xffff,
      s"sample-entry dimensions are 16-bit: ${width}x$height")
    require(timescale > 0 && sampleDelta > 0, "zero timescale/delta")
    require(fragSizes.length == payloads.length,
      "fragment count mismatch")
    fragSizes.zip(payloads).foreach { case (sz, p) =>
      require(sz.forall(_ >= 0), "negative sample size")
      require(p.length == sz.map(_.toLong).sum,
        "fragment payload length != sum of its sample sizes")
    }
    require(codec.length == 4, s"codec fourcc '$codec'")
    val ftyp = box("ftyp", fourcc("iso5"), be32(0x200L), fourcc("iso5"),
      fourcc("isom"))
    val mvhd = fullBox("mvhd", 0, 0,
      be32(0), be32(0), be32(timescale), be32(0), // duration unknown
      be32(0x00010000L), be16(0x0100), be16(0),
      be32(0), be32(0),
      be32(0x00010000L), be32(0), be32(0),
      be32(0), be32(0x00010000L), be32(0),
      be32(0), be32(0), be32(0x40000000L),
      be32(0), be32(0), be32(0), be32(0), be32(0), be32(0),
      be32(2))
    val tkhd = fullBox("tkhd", 0, 7,
      be32(0), be32(0), be32(1), be32(0), be32(0),
      be32(0), be32(0),
      be16(0), be16(0), be16(0), be16(0),
      be32(0x00010000L), be32(0), be32(0),
      be32(0), be32(0x00010000L), be32(0),
      be32(0), be32(0), be32(0x40000000L),
      be32(width.toLong << 16), be32(height.toLong << 16))
    val mdhd = fullBox("mdhd", 0, 0,
      be32(0), be32(0), be32(timescale), be32(0),
      be16(0x55c4), be16(0))
    val hdlr = fullBox("hdlr", 0, 0,
      be32(0), fourcc("vide"), be32(0), be32(0), be32(0),
      "graft video".getBytes("US-ASCII") :+ 0.toByte)
    val entry = box(codec,
      Array.fill[Byte](6)(0), be16(1),
      be16(0), be16(0), Array.fill[Byte](12)(0),
      be16(width), be16(height),
      be32(0x00480000L), be32(0x00480000L),
      be32(0), be16(1),
      Array.fill[Byte](32)(0),
      be16(24), be16(0xffff))
    // empty sample tables: every sample lives in a fragment
    val stbl = box("stbl",
      fullBox("stsd", 0, 0, be32(1), entry),
      fullBox("stts", 0, 0, be32(0)),
      fullBox("stsc", 0, 0, be32(0)),
      fullBox("stsz", 0, 0, be32(0), be32(0)),
      fullBox("stco", 0, 0, be32(0)))
    val dref = fullBox("dref", 0, 0, be32(1), fullBox("url ", 0, 1))
    val vmhd = fullBox("vmhd", 0, 1, be16(0), be16(0), be16(0), be16(0))
    val minf = box("minf", vmhd, box("dinf", dref), stbl)
    val trak = box("trak", tkhd, box("mdia", mdhd, hdlr, minf))
    val trex = fullBox("trex", 0, 0, be32(1), be32(1),
      be32(sampleDelta), be32(0), be32(0))
    val moov = box("moov", mvhd, trak, box("mvex", trex))
    val frags = fragSizes.zip(payloads).zipWithIndex.flatMap {
      case ((sizes, payload), i) =>
        // trun flags: data-offset-present | sample-size-present
        def moofOf(dataOff: Long): Array[Byte] = {
          val trun = fullBox("trun", 0, 0x000201,
            be32(sizes.length.toLong), be32(dataOff),
            sizes.flatMap(sz => be32(sz.toLong)))
          val tfhd = fullBox("tfhd", 0, 0x020000, be32(1)) // base-is-moof
          val traf = box("traf", tfhd, trun)
          box("moof", fullBox("mfhd", 0, 0, be32(i + 1L)), traf)
        }
        // data_offset is moof-relative (default-base-is-moof): the
        // mdat payload starts 8 bytes after the moof ends. The moof's
        // size does not depend on the offset value — assemble once
        // with a placeholder, rebuild with the real offset.
        val moofLen = moofOf(0L).length
        moofOf(moofLen + 8L) ++ box("mdat", payload)
    }
    ftyp ++ moov ++ frags
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

  /** Iterate TOP-LEVEL boxes tolerantly: a truncated tail (the way
    * crawl segments actually tear — mid-box, mid-download) ENDS the
    * iteration instead of throwing; boxes fully inside the file are
    * handed to `f` and their inner parses stay strict. */
  private def walkTopTolerant(b: Array[Byte])
                             (f: (String, Int, Int, Int) => Unit): Unit = {
    var off = 0
    var done = false
    while (!done && off + 8 <= b.length) {
      var size = u32(b, off)
      val t = typ(b, off + 4)
      var hdr = 8
      if (size == 1L) {
        if (off + 16 > b.length) done = true
        else { size = u64(b, off + 8); hdr = 16 }
      } else if (size == 0L) size = (b.length - off).toLong
      if (!done) {
        if (size < hdr || off + size > b.length) done = true
        else { f(t, off, off + hdr, off + size.toInt); off += size.toInt }
      }
    }
  }

  /** The first video trak's codec fourcc (from stsd) and its SAMPLE
    * PAYLOADS, split out of mdat by the real chunk machinery: stsz
    * sizes, stsc run-length sample→chunk map, stco (or co64) chunk
    * offsets, samples laid consecutively inside each chunk
    * (14496-12 §8.7). This is the demux step that feeds a per-frame
    * codec decoder — [[decodeMjpegFramesDf]] uses it to hand each
    * sample to the baseline JPEG decoder. Bounds-checked end to end:
    * an offset or size escaping the file fails loudly. */
  final case class Mp4Samples(codec: String, samples: Array[Array[Byte]])

  def demuxSamples(bytes: Array[Byte]): Mp4Samples = {
    // Parse EVERY trak's handler + sample tables, then pick the first
    // VIDEO ('vide' hdlr) trak — real crawled files commonly mux audio
    // first, and demuxing the audio sample table would hand non-frames
    // to the frame decoder. Falls back to the first trak with an stbl
    // when no trak declares a video handler.
    final case class Trak(var handler: String = "",
                          var codec: String = "",
                          var trackId: Long = 0L,
                          var defaultSize: Long = 0L,
                          var sizes: Array[Int] = null,
                          var stsc: Array[(Long, Long)] = null,
                          var chunkOffs: Array[Long] = null)
    val traks = scala.collection.mutable.ArrayBuffer.empty[Trak]
    // trex default sample sizes, applied after the walk (mvex may
    // precede or follow the traks in the moov)
    val trexDefaults = scala.collection.mutable.Map.empty[Long, Long]
    walkTopTolerant(bytes) {
      case ("moov", _, f0, t0) => walk(bytes, f0, t0) {
        case ("mvex", f1, t1) => walk(bytes, f1, t1) {
          case ("trex", f, _) =>
            trexDefaults(u32(bytes, f + 4)) = u32(bytes, f + 16)
          case _ => ()
        }
        case ("trak", f1, t1) =>
          val tk = Trak()
          traks += tk
          walk(bytes, f1, t1) {
          case ("tkhd", f, _) =>
            val v = bytes(f) & 0xff
            tk.trackId =
              if (v == 1) u32(bytes, f + 4 + 16) else u32(bytes, f + 4 + 8)
          case ("mdia", f2, t2) => walk(bytes, f2, t2) {
            case ("hdlr", f, _) => tk.handler = typ(bytes, f + 8)
            case ("minf", f3, t3) => walk(bytes, f3, t3) {
              case ("stbl", f4, t4) =>
                walk(bytes, f4, t4) {
                  case ("stsd", f, _) =>
                    // entry_count (4) then the first sample entry's
                    // box header: size(4) + type(4)
                    if (u32(bytes, f + 4) > 0)
                      tk.codec = typ(bytes, f + 12)
                  case ("stsz", f, t) =>
                    val fixed = u32(bytes, f + 4)
                    val n = u32(bytes, f + 8)
                    require(n <= Int.MaxValue, "mp4: stsz count")
                    tk.sizes =
                      if (fixed != 0L) Array.fill(n.toInt)(fixed.toInt)
                      else {
                        require(f + 12 + 4L * n <= t, "mp4: stsz overrun")
                        Array.tabulate(n.toInt)(i =>
                          u32(bytes, f + 12 + 4 * i).toInt)
                      }
                  case ("stsc", f, t) =>
                    val n = u32(bytes, f + 4).toInt
                    require(f + 8 + 12L * n <= t, "mp4: stsc overrun")
                    tk.stsc = Array.tabulate(n)(i =>
                      (u32(bytes, f + 8 + 12 * i),
                       u32(bytes, f + 12 + 12 * i)))
                  case ("stco", f, t) =>
                    val n = u32(bytes, f + 4).toInt
                    require(f + 8 + 4L * n <= t, "mp4: stco overrun")
                    tk.chunkOffs = Array.tabulate(n)(i =>
                      u32(bytes, f + 8 + 4 * i))
                  case ("co64", f, t) =>
                    val n = u32(bytes, f + 4).toInt
                    require(f + 8 + 8L * n <= t, "mp4: co64 overrun")
                    tk.chunkOffs = Array.tabulate(n)(i =>
                      u64(bytes, f + 8 + 8 * i))
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
    def complete(t: Trak) =
      t.sizes != null && t.stsc != null && t.chunkOffs != null
    val pick = traks.find(t => complete(t) && t.handler == "vide")
      .orElse(traks.find(complete))
      .getOrElse(throw new IllegalArgumentException(
        "mp4: no trak with complete stsz/stsc/stco sample tables"))
    pick.defaultSize = trexDefaults.getOrElse(pick.trackId, 0L)
    val codec = pick.codec
    val sizes = pick.sizes
    val stsc = pick.stsc
    val chunkOffs = pick.chunkOffs
    // classic (moov-resident) samples, when the stbl declares any
    val legacy: Array[Array[Byte]] =
      if (sizes.isEmpty) Array.empty
      else {
        require(stsc.nonEmpty && stsc.head._1 == 1L, "mp4: bad stsc")
        val out = new Array[Array[Byte]](sizes.length)
        var si = 0
        var e = 0
        var c = 0
        while (c < chunkOffs.length && si < sizes.length) {
          while (e + 1 < stsc.length && stsc(e + 1)._1 <= c + 1) e += 1
          val spc = stsc(e)._2
          var off = chunkOffs(c)
          var j = 0L
          while (j < spc && si < sizes.length) {
            val sz = sizes(si)
            require(off >= 0 && off + sz <= bytes.length,
              s"mp4: sample $si [$off, ${off + sz}) escapes the file")
            out(si) = java.util.Arrays.copyOfRange(
              bytes, off.toInt, off.toInt + sz)
            off += sz; si += 1; j += 1
          }
          c += 1
        }
        require(si == sizes.length,
          s"mp4: chunk tables cover $si of ${sizes.length} samples")
        out
      }
    val frag = fragmentSamples(bytes, pick.trackId, pick.defaultSize)
    Mp4Samples(codec, legacy ++ frag)
  }

  /** Movie-fragment samples of `trackId`, in file order: a TOLERANT
    * top-level scan (a truncated tail — the way crawl segments
    * actually break — ends the scan instead of killing the asset)
    * with per-`moof` isolation: a fragment whose run tables are
    * malformed or whose sample ranges escape the file contributes
    * ZERO samples and the scan continues — one bad fragment costs its
    * frames, never the asset. Inside a good moof the parse is strict
    * (14496-12 §8.8): `tfhd` optional fields honored
    * (base-data-offset / sample-description-index / default duration,
    * size, flags), multiple `trun`s per `traf` with data-offset,
    * first-sample-flags, and any per-sample field mix — absent sizes
    * fall back to the tfhd default, then the trex default. */
  private def fragmentSamples(bytes: Array[Byte], trackId: Long,
                              trexDefaultSize: Long)
      : Array[Array[Byte]] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    walkTopTolerant(bytes) { (t, start, f, to) =>
      if (t == "moof") {
        try out ++= moofSamples(bytes, start, f, to, trackId,
          trexDefaultSize)
        catch { case scala.util.control.NonFatal(_) => () }
      }
    }
    out.toArray
  }

  /** Strict parse of one moof's samples for `trackId` (throws on any
    * malformation — the caller isolates the throw to this fragment). */
  private def moofSamples(bytes: Array[Byte], moofStart: Int, from: Int,
                          to: Int, trackId: Long, trexDefaultSize: Long)
      : Seq[Array[Byte]] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    walk(bytes, from, to) {
      case ("traf", f1, t1) =>
        var tid = -1L
        var base = moofStart.toLong // default-base-is-moof AND the
                                    // spec's first-traf default
        var defaultSize = trexDefaultSize
        var cur = -1L // running sample cursor across truns
        walk(bytes, f1, t1) {
          case ("tfhd", f, _) =>
            val flags = u32(bytes, f) & 0xffffff
            tid = u32(bytes, f + 4)
            var p = f + 8
            if ((flags & 0x1) != 0) { base = u64(bytes, p); p += 8 }
            if ((flags & 0x2) != 0) p += 4  // sample_description_index
            if ((flags & 0x8) != 0) p += 4  // default_sample_duration
            if ((flags & 0x10) != 0) { defaultSize = u32(bytes, p); p += 4 }
          case ("trun", f, t) if tid == trackId =>
            val flags = u32(bytes, f) & 0xffffff
            val n = u32(bytes, f + 4)
            require(n <= Int.MaxValue, "mp4: trun count")
            var p = f + 8
            if ((flags & 0x1) != 0) {
              cur = base + u32(bytes, p).toInt // SIGNED 32-bit offset
              p += 4
            } else if (cur < 0) cur = base
            if ((flags & 0x4) != 0) p += 4 // first_sample_flags
            val hasDur = (flags & 0x100) != 0
            val hasSize = (flags & 0x200) != 0
            val hasFlags = (flags & 0x400) != 0
            val hasCto = (flags & 0x800) != 0
            require(hasSize || defaultSize > 0,
              "mp4: trun without sizes and no default sample size")
            var i = 0
            while (i < n) {
              if (hasDur) p += 4
              val sz = if (hasSize) { val s = u32(bytes, p); p += 4; s }
                       else defaultSize
              if (hasFlags) p += 4
              if (hasCto) p += 4
              require(p <= t, "mp4: trun overrun")
              require(cur >= 0 && cur + sz <= bytes.length,
                s"mp4: fragment sample [$cur, ${cur + sz}) escapes")
              out += java.util.Arrays.copyOfRange(
                bytes, cur.toInt, (cur + sz).toInt)
              cur += sz; i += 1
            }
          case _ => ()
        }
      case _ => ()
    }
    out.toSeq
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

  // ---- motion-JPEG track (intra-frame video decode) ----

  /** Synthetic MOTION-JPEG corpus: each row is a real MP4 whose video
    * track samples are REAL baseline JPEG frames ([[Jpeg.encodeJpeg]]
    * — the r6/r7 codec machinery), closing the lossy-video seam the
    * way JPEG itself closed the image one (r7 verdict task #6):
    * motion-JPEG is the one mainstream video coding whose frames are
    * all intra, so a real in-spec decoder needs NO new entropy tables.
    * Frame f of asset id is the q416 DC-mosaic with a per-frame phase
    * (luma depends only on the 8x8 cell and f), so the whole
    * container→sample→entropy-decode→IDCT pipeline is EXACT and the
    * oracle replays it per (id, frame) in closed form.
    *
    * Every id where `id % 7 == 3` carries one CORRUPTED frame (frame
    * 1 truncated to its first 20 bytes — mid-header, so the decoder
    * fails loudly and deterministically): the corpus property a crawl
    * actually has, pinning that one bad frame degrades to a null row
    * for THAT frame while the rest of the asset still decodes
    * ([[decodeMjpegFramesDf]]). Samples pack 2 per chunk to exercise
    * the real multi-chunk stsc/stco path, not just the one-chunk
    * layout. Returns (asset_id, media). */
  def synthMjpegMp4(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    val idIdx = df.schema.fieldIndex(idCol)
    val rdd = df.rdd.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(idIdx)
        val w = (9 + id % 17).toInt
        val h = (6 + id % 11).toInt
        val nf = (3 + id % 4).toInt
        val frames = Array.tabulate(nf) { f =>
          val enc = Jpeg.encodeJpeg(w, h, (x, y) =>
            ((id * 31 + f * 19 + (x / 8) * 7 + (y / 8) * 13) % 256).toInt)
          if (id % 7 == 3 && f == 1)
            java.util.Arrays.copyOfRange(enc, 0, 20)
          else enc
        }
        Row(id, encodeMp4(w, h, timescale = 1000L, sampleDelta = 40L,
          sampleSizes = frames.map(_.length),
          payload = frames.flatten,
          codec = "jpeg", samplesPerChunk = 2))
      }
    }
    spark.createDataFrame(rdd, StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("media", BinaryType))))
  }

  /** Synthetic FRAGMENTED motion-JPEG corpus ([[encodeFragmentedMp4]]
    * around the same per-frame JPEG content as [[synthMjpegMp4]] —
    * the CMAF/DASH segment layout real crawl video ships in): frames
    * pack 2 per fragment (multi-moof), frame f of asset id is the
    * same closed-form DC mosaic, and the corpus carries BOTH failure
    * properties a crawl has:
    *  - `id % 7 == 3`: frame 1's JPEG truncated mid-header — costs
    *    one row (frame isolation, as in the classic corpus);
    *  - `id % 5 == 2`: the FILE truncated inside its LAST fragment's
    *    moof — that fragment's frames vanish, every earlier fragment
    *    still decodes (fragment isolation: the tolerant top-level
    *    scan stops at the torn tail instead of killing the asset).
    * Returns (asset_id, media). */
  def synthFmp4Mjpeg(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    val idIdx = df.schema.fieldIndex(idCol)
    val rdd = df.rdd.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(idIdx)
        val w = (9 + id % 17).toInt
        val h = (6 + id % 11).toInt
        val nf = (3 + id % 4).toInt
        val frames = Array.tabulate(nf) { f =>
          val enc = Jpeg.encodeJpeg(w, h, (x, y) =>
            ((id * 31 + f * 19 + (x / 8) * 7 + (y / 8) * 13) % 256).toInt)
          if (id % 7 == 3 && f == 1)
            java.util.Arrays.copyOfRange(enc, 0, 20)
          else enc
        }
        val fragFrames = frames.grouped(2).toArray
        val full = encodeFragmentedMp4(w, h, timescale = 1000L,
          sampleDelta = 40L,
          fragSizes = fragFrames.map(_.map(_.length)),
          payloads = fragFrames.map(_.flatten),
          codec = "jpeg")
        val media =
          if (id % 5 == 2) {
            // tear the file 11 bytes into the LAST moof (3 bytes past
            // its header): that fragment and its mdat are gone,
            // every earlier fragment intact. The encoder is
            // deterministic and fragment-local, so the file with the
            // last fragment dropped is a byte-exact PREFIX of the
            // full one — its length locates the tear.
            val prefixLen = encodeFragmentedMp4(w, h, timescale = 1000L,
              sampleDelta = 40L,
              fragSizes = fragFrames.dropRight(1).map(_.map(_.length)),
              payloads = fragFrames.dropRight(1).map(_.flatten),
              codec = "jpeg").length
            java.util.Arrays.copyOfRange(full, 0, prefixLen + 11)
          } else full
        Row(id, media)
      }
    }
    spark.createDataFrame(rdd, StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("media", BinaryType))))
  }

  /** Per-FRAME decode of a motion-JPEG MP4 column: [[demuxSamples]]
    * splits the track into samples, each sample goes through the
    * baseline JPEG decoder, and every frame yields a row — `ok =
    * false` with null stats when THAT frame's entropy data is corrupt,
    * real (width, height, sum_y, first_px) otherwise. Frame isolation
    * is the point: one truncated frame must cost one row, never the
    * asset (the partial-decode property, spec- and oracle-pinned).
    *
    * Scale shape: identical to the image decoders — embarrassingly
    * parallel per-asset map work, media bytes never shuffle; only the
    * fixed-width stats rows leave the partition. */
  def decodeMjpegFramesDf(df: DataFrame, idCol: String, mediaCol: String)
      : DataFrame = {
    val spark = df.sparkSession
    val idIdx = df.schema.fieldIndex(idCol)
    val mIdx = df.schema.fieldIndex(mediaCol)
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("n_frames", IntegerType, nullable = false),
      StructField("ok", BooleanType, nullable = false),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("sum_y", LongType),
      StructField("first_px", LongType)))
    val rdd = df.rdd.mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(idIdx)
        val demuxed = demuxSamples(r.getAs[Array[Byte]](mIdx))
        val n = demuxed.samples.length
        demuxed.samples.iterator.zipWithIndex.map { case (frame, f) =>
          try {
            val st = Jpeg.decodeJpeg(frame)
            Row(id, f, n, true, st.width, st.height, st.sumY, st.firstPx)
          } catch { case scala.util.control.NonFatal(_) =>
            Row(id, f, n, false, null, null, null, null)
          }
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Per-frame PERCEPTUAL hashes from the REAL decoded pixels — the
    * q406 video-phash surface upgraded from the stub-video byte
    * windows to genuine frame content: demux the motion-JPEG samples,
    * decode each to its grayscale plane, and take the 8×8 strict-mean
    * average hash ([[Multimodal.grayAHash64]]). Corrupt frames are
    * SKIPPED (no hash row) rather than poisoning the asset, so the
    * output feeds [[Dedup.hammingPairs64]] / the q405 keep-one funnel
    * directly. Returns (asset_id, frame_idx, n_frames, hash_hi,
    * hash_lo) with the non-negative 32-bit halves the hamming joiner
    * expects. Scale shape: per-asset map work, media never shuffles. */
  def mjpegFrameHashesDf(df: DataFrame, idCol: String, mediaCol: String)
      : DataFrame = {
    val spark = df.sparkSession
    val idIdx = df.schema.fieldIndex(idCol)
    val mIdx = df.schema.fieldIndex(mediaCol)
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("n_frames", IntegerType, nullable = false),
      StructField("hash_hi", LongType, nullable = false),
      StructField("hash_lo", LongType, nullable = false)))
    val rdd = df.rdd.mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(idIdx)
        val demuxed = demuxSamples(r.getAs[Array[Byte]](mIdx))
        val n = demuxed.samples.length
        demuxed.samples.iterator.zipWithIndex.flatMap { case (frame, f) =>
          try {
            val (w, h, plane) = Jpeg.decodeJpegPlane(frame)
            val (hi, lo) = Multimodal.grayAHash64(plane, w, h)
            Iterator.single(Row(id, f, n, hi, lo))
          } catch { case scala.util.control.NonFatal(_) =>
            Iterator.empty
          }
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }
}
