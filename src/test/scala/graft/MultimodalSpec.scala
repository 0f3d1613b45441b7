package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Multimodal
import graft.ops.Multimodal.{encodePng, decodePng, resizePng, synthPng,
  decodePngStatsDf, encodeBmp24, decodeBmp24, resizeBmp24}

/** The multimodal plumbing is real (schema, batching, partition seam);
  * only the codec kernel is a deterministic stub. */
class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import TestSpark.sf0001

  private def media = spark.read.parquet(s"$sf0001/documents.parquet")
    .select(col("doc_id").as("asset_id"),
            col("text").cast("binary").as("media"),
            lit("text/plain").as("mime"))

  test("expression-level feature stub is deterministic and bounded") {
    val f1 = media.select(col("asset_id"),
      Multimodal.featuresStub(col("media"), 8).as("f")).collect()
    val f2 = media.select(col("asset_id"),
      Multimodal.featuresStub(col("media"), 8).as("f")).collect()
    assert(f1.map(_.getSeq[Double](1)).toSeq == f2.map(_.getSeq[Double](1)).toSeq)
    assert(f1.forall(_.getSeq[Double](1).forall(x => x >= 0.0 && x < 1.0)))
    assert(f1.forall(_.getSeq[Double](1).size == 8))
  }

  test("frame sampler emits n frames covering the blob") {
    val r = media.select(col("asset_id"), length(col("media")).as("len"),
      Multimodal.sampleFramesStub(col("media"), 4).as("frames")).collect()
    assert(r.forall(_.getSeq[Array[Byte]](2).size == 4))
    r.foreach { row =>
      val total = row.getInt(1)
      val frames = row.getSeq[Array[Byte]](2)
      assert(frames.map(_.length).sum <= total + 4)
    }
  }

  test("partition-batch decode seam produces per-asset features") {
    val out = Multimodal.decodePartitions(media, "asset_id", "media")(
      Multimodal.stubDecodeKernel)
    val got = out.collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val lens = media.select(col("asset_id"), length(col("media")))
      .collect().map(r => r.getLong(0) -> r.getInt(1).toDouble).toMap
    assert(got.size == lens.size)
    // feature 0 of the stub kernel is the byte length
    assert(got.forall { case (id, f) => f.head == lens(id) })
  }

  test("WAV PCM-16 encode → decode round-trips exact sample stats") {
    val samples = Array.tabulate(257)(i =>
      ((i * 9973) % 65521 - 32760).toShort)
    val bytes = Multimodal.encodeWavPcm16(samples, sampleRate = 44100)
    val st = Multimodal.decodeWavPcm16(bytes)
    assert(st.sampleRate == 44100 && st.channels == 1 && st.bits == 16)
    assert(st.nSamples == samples.length)
    assert(st.sumAbs == samples.map(s => math.abs(s.toLong)).sum)
    assert(st.peak == samples.map(s => math.abs(s.toLong)).max)
  }

  test("WAV decoder walks chunks (LIST skipped) and rejects garbage") {
    // the encoder plants a LIST chunk before data — a fixed-44-byte
    // "parser" would misread; the walker must reach the data chunk
    val bytes = Multimodal.encodeWavPcm16(Array[Short](1, -2, 3), 8000)
    assert(new String(bytes.slice(36, 40), "US-ASCII") == "LIST")
    assert(Multimodal.decodeWavPcm16(bytes).nSamples == 3L)
    intercept[IllegalArgumentException] {
      Multimodal.decodeWavPcm16("not a wav at all".getBytes)
    }
    intercept[IllegalArgumentException] { // truncated data chunk
      Multimodal.decodeWavPcm16(bytes.dropRight(2))
    }
  }

  test("BMP 24bpp encode → decode round-trips dims, sums, and origin") {
    // 5x3 so rows carry 15 bytes + 1 pad byte — exercises the padding
    val bytes = Multimodal.encodeBmp24(5, 3, (x, y) =>
      ((x * 40 + y) % 256, (y * 80 + x) % 256, (x ^ y) % 256))
    val st = Multimodal.decodeBmp24(bytes)
    assert(st.width == 5 && st.height == 3)
    val px = for { y <- 0 until 3; x <- 0 until 5 }
      yield ((x * 40 + y) % 256, (y * 80 + x) % 256, (x ^ y) % 256)
    assert(st.sumR == px.map(_._1.toLong).sum)
    assert(st.sumG == px.map(_._2.toLong).sum)
    assert(st.sumB == px.map(_._3.toLong).sum)
    assert(st.firstPx == 0L * 65536 + 0L * 256 + 0L) // (0,0) probe
    intercept[IllegalArgumentException] {
      Multimodal.decodeBmp24("GIF89a nope".getBytes)
    }
  }

  test("BMP decoder honors top-down (negative height) row order") {
    // hand-flip the encoded bottom-up image into a top-down one: negate
    // height and reverse the stored row order; decode must agree
    val up = Multimodal.encodeBmp24(3, 2, (x, y) => (x + y * 3, 0, 0))
    val stride = 3 * 3 + 3 // 9 pixel bytes + 3 pad
    val rows = up.drop(54).grouped(stride).toArray
    val down = up.take(54) ++ rows.reverse.flatten
    val bb = java.nio.ByteBuffer.wrap(down)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(22, -2) // biHeight := -2 (top-down)
    val a = Multimodal.decodeBmp24(up)
    val b = Multimodal.decodeBmp24(bb.array())
    assert(a == b) // same image, both encodings
    assert(a.firstPx == 0L)
  }

  test("WAV integer decimation keeps exactly the stride samples") {
    val samples = Array.tabulate(11)(i => (i * 100 - 500).toShort)
    val wav = Multimodal.encodeWavPcm16(samples, 8000)
    // factor 1 = identity
    assert(Multimodal.decodeWavPcm16(
      Multimodal.resampleWavPcm16(wav, 1)) == Multimodal.decodeWavPcm16(wav))
    // factor 3 keeps indices 0,3,6,9 at rate 2666
    val st = Multimodal.decodeWavPcm16(Multimodal.resampleWavPcm16(wav, 3))
    val kept = Seq(0, 3, 6, 9).map(samples(_).toLong)
    assert(st.sampleRate == 2666 && st.nSamples == 4 &&
      st.sumAbs == kept.map(math.abs).sum &&
      st.peak == kept.map(math.abs).max)
    intercept[IllegalArgumentException] {
      Multimodal.resampleWavPcm16("RIFFxxxxnope".getBytes, 2)
    }
  }

  test("BMP nearest-neighbor resize: identity, downscale, top-down") {
    val src = Multimodal.encodeBmp24(5, 3, (x, y) =>
      ((x * 40 + y) % 256, (y * 80 + x) % 256, (x ^ y) % 256))
    // identity resize reproduces every stat (nearest-neighbor with
    // equal dims maps x→x, y→y)
    assert(Multimodal.decodeBmp24(
      Multimodal.resizeBmp24(src, 5, 3)) == Multimodal.decodeBmp24(src))
    // 1×1 thumbnail = the origin pixel alone
    val one = Multimodal.decodeBmp24(Multimodal.resizeBmp24(src, 1, 1))
    assert(one.width == 1 && one.height == 1 &&
      one.firstPx == Multimodal.decodeBmp24(src).firstPx &&
      one.sumR == 0L && one.sumG == 0L && one.sumB == 0L)
    // downscale 5x3 → 2x2: source pixels (x·5 div 2, y·3 div 2) =
    // x∈{0,2}, y∈{0,1}
    val small = Multimodal.decodeBmp24(Multimodal.resizeBmp24(src, 2, 2))
    val picked = for { y <- Seq(0, 1); x <- Seq(0, 2) }
      yield ((x * 40 + y) % 256, (y * 80 + x) % 256, (x ^ y) % 256)
    assert(small.sumR == picked.map(_._1.toLong).sum &&
           small.sumG == picked.map(_._2.toLong).sum &&
           small.sumB == picked.map(_._3.toLong).sum)
    // a top-down source resizes identically to its bottom-up twin
    val stride = 5 * 3 + 1
    val rows = src.drop(54).grouped(stride).toArray
    val down = src.take(54) ++ rows.reverse.flatten
    val bb = java.nio.ByteBuffer.wrap(down)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(22, -3)
    assert(Multimodal.decodeBmp24(Multimodal.resizeBmp24(bb.array(), 2, 2))
      == small)
  }

  test("distributed BMP synth+decode matches the driver-side codec") {
    import spark.implicits._
    val ids = (0L until 40L).toDF("doc_id")
    val stats = Multimodal.decodeBmpStatsDf(
      Multimodal.synthBmp24(ids, "doc_id"), "asset_id", "media")
    val got = stats.collect().map(r => r.getLong(0) ->
      (r.getInt(1), r.getInt(2), r.getLong(3), r.getLong(4),
       r.getLong(5), r.getLong(6))).toMap
    for (id <- 0L until 40L) {
      val w = (8 + id % 9).toInt; val h = (5 + id % 7).toInt
      val px = for { y <- 0 until h; x <- 0 until w } yield
        ((id * 3 + x * 7 + y * 11) % 256, (id * 5 + x * 13 + y * 3) % 256,
         (id * 7 + x + y * 17) % 256)
      val first = (id * 3 % 256) * 65536 + (id * 5 % 256) * 256 +
        id * 7 % 256
      assert(got(id) == ((w, h, px.map(_._1).sum, px.map(_._2).sum,
                          px.map(_._3).sum, first)), s"id $id")
    }
  }

  test("null media decodes to null stats; malformed media still throws") {
    import spark.implicits._
    val good = Multimodal.encodeWavPcm16(Array[Short](1, 2, 3), 8000)
    val rows = Seq((1L, Some(good)), (2L, Option.empty[Array[Byte]]))
      .toDF("asset_id", "media")
    val got = Multimodal.decodeWavStatsDf(rows, "asset_id", "media")
      .collect().map(r => r.getLong(0) -> r.isNullAt(4)).toMap
    assert(got == Map(1L -> false, 2L -> true))
    val bad = Seq((3L, "garbage".getBytes)).toDF("asset_id", "media")
    intercept[org.apache.spark.SparkException] {
      Multimodal.decodeWavStatsDf(bad, "asset_id", "media").collect()
    }
  }

  test("distributed WAV synth+decode matches the driver-side codec") {
    import spark.implicits._
    val ids = (0L until 60L).toDF("doc_id")
    val stats = Multimodal.decodeWavStatsDf(
      Multimodal.synthWavPcm16(ids, "doc_id"), "asset_id", "media")
    val got = stats.collect()
      .map(r => r.getLong(0) -> (r.getLong(4), r.getLong(5), r.getLong(6)))
      .toMap
    for (id <- 0L until 60L) {
      val n = (20 + (id % 50)).toInt
      val abs = Array.tabulate(n)(i =>
        math.abs(((id + 1) * 7919L + i * 104729L) % 65521L - 32760L))
      assert(got(id) == ((n.toLong, abs.sum, abs.max)), s"id $id")
    }
  }

  test("GFV1 container: index walk decodes ONLY the sampled frames") {
    import graft.ops.Multimodal._
    val f0 = encodeBmp24(3, 2, (x, y) => (x, y, x + y))
    val f1 = encodeBmp24(3, 2, (x, y) => (10 + x, y, 0))
    val f2 = encodeBmp24(3, 2, (x, y) => (0, 20 + y, x))
    val vid = encodeFrameSeq(Seq(f0, f1, f2))
    // stride 2 samples frames 0 and 2
    val (n, sampled) = sampleFrameStats(vid, 2)
    assert(n == 3 && sampled.map(_._1) == Seq(0, 2))
    assert(sampled.head._2 == decodeBmp24(f0))
    assert(sampled(1)._2 == decodeBmp24(f2))
    // stride 1 = full decode; stride > n samples only frame 0
    assert(sampleFrameStats(vid, 1)._2.map(_._1) == Seq(0, 1, 2))
    assert(sampleFrameStats(vid, 5)._2.map(_._1) == Seq(0))
    // the partial-decode PROOF: corrupt the un-sampled middle frame in
    // place — stride-2 sampling must not notice (it never touches those
    // bytes), while full decode must throw on the mangled frame
    val corrupted = vid.clone()
    val middleOff = java.nio.ByteBuffer.wrap(vid, 8 + 8, 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getLong.toInt
    corrupted(middleOff) = 'X'.toByte // breaks frame 1's BMP magic
    assert(sampleFrameStats(corrupted, 2)._2.map(_._2) ==
           sampled.map(_._2))
    intercept[IllegalArgumentException] {
      sampleFrameStats(corrupted, 1)
    }
    // garbage container rejected
    intercept[IllegalArgumentException] {
      sampleFrameStats("not a video".getBytes, 1)
    }
  }

  test("video frame hashes: stride-2 partial decode skips bad frames") {
    import graft.ops.Multimodal._
    val frames = (0 until 3).map(f =>
      encodeBmp24(8, 8, (x, y) => (x * 30 + f, y * 30, (x + y) * 15)))
    val vid = encodeFrameSeq(frames)
    val expect = frames.map(aHash64)
    import spark.implicits._
    val df = Seq((1L, vid)).toDF("asset_id", "media")
    val all = videoFrameHashesDf(df, "asset_id", "media", stride = 1)
      .orderBy("frame_idx").collect()
      .map(r => (r.getLong(3), r.getLong(4))).toSeq
    assert(all == expect)
    // corrupt the unsampled middle frame: stride 2 must not notice
    val corrupted = vid.clone()
    val middleOff = java.nio.ByteBuffer.wrap(vid, 8 + 8, 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getLong.toInt
    corrupted(middleOff) = 'X'.toByte
    val sampled = videoFrameHashesDf(
        Seq((1L, corrupted)).toDF("asset_id", "media"),
        "asset_id", "media", stride = 2)
      .orderBy("frame_idx").collect()
      .map(r => (r.getInt(2), (r.getLong(3), r.getLong(4)))).toSeq
    assert(sampled == Seq(0 -> expect(0), 2 -> expect(2)))
  }

  test("audio energy hash: silence zero, loud windows set their bits") {
    import graft.ops.Multimodal._
    // silence: every energy 0, nothing strictly above the mean
    val silent = encodeWavPcm16(Array.fill[Short](640)(0), 8000)
    assert(audioEnergyHash32(silent) == 0L)
    // loud back half: windows 16..31 carry all the energy
    val halfLoud = encodeWavPcm16(
      (Array.fill[Short](320)(0) ++
       Array.fill[Short](320)(10000)).toArray, 8000)
    assert(audioEnergyHash32(halfLoud) == 0xffff0000L)
    // small trim wiggles the hash only slightly (windows realign)
    val trimmed = encodeWavPcm16(
      (Array.fill[Short](315)(0) ++
       Array.fill[Short](320)(10000)).toArray, 8000)
    val d = java.lang.Long.bitCount(
      audioEnergyHash32(halfLoud) ^ audioEnergyHash32(trimmed))
    assert(d <= 2, s"trim moved the hash too far: $d")
  }

  test("aHash: brightness-invariant, resize-stable, flat image zero") {
    import graft.ops.Multimodal._
    // a flat image has no pixel strictly above the mean: hash (0, 0)
    val flat = encodeBmp24(16, 12, (_, _) => (80, 80, 80))
    assert(aHash64(flat) == ((0L, 0L)))
    // gradient image with a distinct bright half
    def grad(shift: Int) = encodeBmp24(32, 24,
      (x, y) => (math.min(255, x * 6 + shift),
                 math.min(255, x * 6 + shift),
                 math.min(255, x * 6 + shift)))
    val base = aHash64(grad(0))
    assert(base != ((0L, 0L)))
    // +1 on every channel shifts every luma and the mean by one:
    // the hash is brightness-shift invariant (saturation avoided by
    // the min-255 clamp never firing below shift 63: 31*6+1 < 255)
    assert(aHash64(grad(1)) == base)
    // upscaling the same scene leaves the 8x8 downsample's structure:
    // hashes stay within a small hamming distance
    val up = encodeBmp24(64, 48,
      (x, y) => (math.min(255, x * 3), math.min(255, x * 3),
                 math.min(255, x * 3)))
    val (h1, l1) = base; val (h2, l2) = aHash64(up)
    val dist = java.lang.Long.bitCount(h1 ^ h2) +
               java.lang.Long.bitCount(l1 ^ l2)
    assert(dist <= 6, s"resize moved the hash too far: $dist")
  }

  test("PNG encode → decode round-trips under ALL five filters") {
    val px = (x: Int, y: Int) => ((x * 31 + y * 7) % 256,
                                  (x * 3 + y * 53) % 256,
                                  (x + y * 19) % 256)
    val want = decodePng(encodePng(13, 9, px, filterType = 0))
    // every filter type stores DIFFERENT bytes but must reconstruct
    // the identical image — the adaptive-filter property real PNGs use
    (1 to 4).foreach { ft =>
      val enc = encodePng(13, 9, px, filterType = ft)
      assert(decodePng(enc) == want, s"filter $ft diverged")
      assert(!java.util.Arrays.equals(enc, encodePng(13, 9, px, 0)),
        s"filter $ft stored identical bytes to filter 0")
    }
    assert(want.width == 13 && want.height == 9)
    // positional probe: top-left pixel
    assert(want.firstPx == 0L * 65536 + 0L * 256 + 0L)
    val shifted = decodePng(encodePng(4, 4, (_, _) => (1, 2, 3), 4))
    assert(shifted.firstPx == 1L * 65536 + 2 * 256 + 3 &&
           shifted.sumR == 16 && shifted.sumG == 32 && shifted.sumB == 48)
  }

  test("PNG decoder verifies CRC, walks chunks, rejects garbage") {
    val good = encodePng(6, 5, (x, y) => (x, y, x + y), filterType = 3)
    // flip one IDAT byte: CRC must catch it
    val bad = good.clone()
    val idatOff = {
      var o = 8; var found = -1
      while (found < 0) {
        val len = ((bad(o) & 0xff) << 24) | ((bad(o + 1) & 0xff) << 16) |
                  ((bad(o + 2) & 0xff) << 8) | (bad(o + 3) & 0xff)
        if (new String(bad, o + 4, 4, "US-ASCII") == "IDAT") found = o + 8
        else o += 12 + len
      }
      found
    }
    bad(idatOff) = (bad(idatOff) ^ 0x40).toByte
    val e = intercept[IllegalArgumentException](decodePng(bad))
    assert(e.getMessage.contains("CRC"))
    // not-a-PNG and truncated streams are refused, not misparsed
    intercept[IllegalArgumentException](
      decodePng("NOTAPNGNOTAPNG".getBytes("US-ASCII")))
    intercept[IllegalArgumentException](
      decodePng(good.take(good.length - 8)))
  }

  test("PNG nearest-neighbor resize matches the BMP resize mapping") {
    val px = (x: Int, y: Int) => ((x * 5 + y) % 256, (y * 9) % 256,
                                  (x + 3 * y) % 256)
    // identity resize reproduces the pixels (stats identical)
    val base = encodePng(10, 8, px, filterType = 2)
    assert(decodePng(resizePng(base, 10, 8)) == decodePng(base))
    // downscale agrees with the BMP codec's identical integer mapping
    val viaPng = decodePng(resizePng(base, 4, 3))
    val viaBmp = decodeBmp24(resizeBmp24(encodeBmp24(10, 8, px), 4, 3))
    assert((viaPng.width, viaPng.height, viaPng.sumR, viaPng.sumG,
            viaPng.sumB, viaPng.firstPx) ==
           (viaBmp.width, viaBmp.height, viaBmp.sumR, viaBmp.sumG,
            viaBmp.sumB, viaBmp.firstPx))
  }

  test("Adam7 interlaced PNG round-trips under every filter type") {
    val px = (x: Int, y: Int) => ((x * 29 + y * 13) % 256,
                                  (x * 7 + y * 31) % 256,
                                  (x * 3 + y) % 256)
    // 13x9 exercises every pass with partial coverage; the interlaced
    // stream stores DIFFERENT bytes (pass-sliced scanlines) but must
    // reconstruct the identical image for all five filters
    val want = decodePng(encodePng(13, 9, px))
    (0 to 4).foreach { ft =>
      val il = encodePng(13, 9, px, filterType = ft, interlaced = true)
      assert(decodePng(il) == want, s"interlaced filter $ft diverged")
      assert(!java.util.Arrays.equals(il,
        encodePng(13, 9, px, filterType = ft)),
        s"interlaced stream identical to sequential (filter $ft)")
    }
    // degenerate sizes: some Adam7 passes are EMPTY (w or h too small
    // for the pass origin) — the pass loop must skip them exactly
    for ((w, h) <- Seq((1, 1), (2, 2), (3, 5), (8, 1), (1, 8)))
      assert(decodePng(encodePng(w, h, px, 4, None, true)) ==
             decodePng(encodePng(w, h, px)), s"${w}x$h")
    // resize normalizes an interlaced input through the same mapping
    val il = encodePng(10, 8, px, 2, None, true)
    assert(decodePng(resizePng(il, 4, 3)) ==
           decodePng(resizePng(encodePng(10, 8, px), 4, 3)))
  }

  test("RGBA PNG: alpha reconstructs but stays out of the stats") {
    val px = (x: Int, y: Int) => ((x * 11) % 256, (y * 17) % 256,
                                  (x + y) % 256)
    val a = (x: Int, y: Int) => (x * y * 37 + 5) % 256
    val want = decodePng(encodePng(12, 7, px))
    (0 to 4).foreach { ft =>
      // color sums/probe equal the RGB encode's — alpha carried, but
      // excluded from the stats surface by contract
      assert(decodePng(encodePng(12, 7, px, ft, Some(a))) == want,
        s"alpha filter $ft diverged")
      assert(decodePng(encodePng(12, 7, px, ft, Some(a),
        interlaced = true)) == want, s"alpha+interlace filter $ft")
    }
    // the alpha bytes DO participate in filtering: corrupting one must
    // break the CRC/stream, proving they are reconstructed, not skipped
    val rgba = encodePng(12, 7, px, 1, Some(a))
    val rgb = encodePng(12, 7, px, 1)
    assert(rgba.length != rgb.length)
  }

  test("JPEG mosaic round-trips BIT-exactly; gradients within DCT " +
       "tolerance") {
    import graft.ops.Jpeg
    // aligned-8x8-constant mosaic + flat quant = DC-only spectrum =
    // exact through the full lossy pipeline (the q416 oracle's lever)
    val mosaic = (x: Int, y: Int) => (7 + (x / 8) * 31 + (y / 8) * 53) % 256
    val enc = Jpeg.encodeJpeg(21, 14, mosaic) // partial border blocks
    val st = Jpeg.decodeJpeg(enc)
    val want = (for (y <- 0 until 14; x <- 0 until 21)
      yield mosaic(x, y).toLong).sum
    assert(st == Jpeg.JpegStats(21, 14, want, 7L))
    // non-constant blocks ride the AC path: flat quant keeps error to
    // FDCT/IDCT double rounding — at most 1 grey level per pixel
    val grad = (x: Int, y: Int) => (x * 9 + y * 5) % 256
    val g = Jpeg.decodeJpeg(Jpeg.encodeJpeg(16, 16, grad))
    val exact = (for (y <- 0 until 16; x <- 0 until 16)
      yield grad(x, y).toLong).sum
    assert(g.width == 16 && g.height == 16)
    assert(math.abs(g.sumY - exact) <= 256, s"got ${g.sumY} want ~$exact")
    // the Annex-K table is genuinely lossy but bounded on smooth data
    val lossy = Jpeg.decodeJpeg(
      Jpeg.encodeJpeg(16, 16, (x, y) => 100 + x + y, Jpeg.stdQuant))
    val smoothExact = (for (y <- 0 until 16; x <- 0 until 16)
      yield (100 + x + y).toLong).sum
    assert(math.abs(lossy.sumY - smoothExact) <= 16 * 16 * 8)
  }

  test("JPEG decoder walks markers and refuses what it cannot decode") {
    import graft.ops.Jpeg
    val good = Jpeg.encodeJpeg(10, 9, (x, y) => (x * y) % 256)
    // not-a-JPEG and truncated-entropy streams are refused
    intercept[IllegalArgumentException](
      Jpeg.decodeJpeg("JFIFJFIFJFIF".getBytes("US-ASCII")))
    intercept[IllegalArgumentException](
      Jpeg.decodeJpeg(java.util.Arrays.copyOf(good, good.length / 2)))
    // flipping the SOF0 marker to progressive (SOF2) must be refused,
    // not silently mis-decoded
    val prog = good.clone()
    val sofAt = {
      var i = 2
      while (!((prog(i) & 0xff) == 0xff && (prog(i + 1) & 0xff) == 0xc0))
        i += 1
      i
    }
    prog(sofAt + 1) = 0xc2.toByte
    val e = intercept[IllegalArgumentException](Jpeg.decodeJpeg(prog))
    assert(e.getMessage.contains("baseline"))
  }

  test("color JPEG: fixed-point YCbCr round trip is exact on mosaics; " +
       "restart markers resync and reset the DC predictors") {
    import graft.ops.Jpeg
    val mosaic = (x: Int, y: Int) =>
      (((x / 8) * 41 + 13) % 256, ((y / 8) * 29 + 7) % 256,
       ((x / 8) + (y / 8) * 59) % 256)
    // expected: per cell, rgb -> fixed-point ycc -> fixed-point back
    def expect(w: Int, h: Int) = {
      var sr = 0L; var sg = 0L; var sb = 0L; var fp = -1L
      for (y <- 0 until h; x <- 0 until w) {
        val (r0, g0, b0) = mosaic(x, y)
        val (yy, cb, cr) = Jpeg.rgbToYcc(r0, g0, b0)
        val (r1, g1, b1) = Jpeg.yccToRgb(yy, cb, cr)
        sr += r1; sg += g1; sb += b1
        if (x == 0 && y == 0) fp = r1 * 65536L + g1 * 256L + b1
      }
      Jpeg.JpegColorStats(w, h, sr, sg, sb, fp)
    }
    val want = expect(21, 14)
    assert(Jpeg.decodeJpegColor(Jpeg.encodeJpegColor(21, 14, mosaic))
      == want)
    // restart interval: same image, RSTn every 2 MCUs — identical
    // decode (resync consumed, DC predictors reset on both sides),
    // different bytes
    val rst = Jpeg.encodeJpegColor(21, 14, mosaic, restartInterval = 2)
    assert(Jpeg.decodeJpegColor(rst) == want)
    assert(!java.util.Arrays.equals(rst,
      Jpeg.encodeJpegColor(21, 14, mosaic)))
    // grayscale restart too
    val g = Jpeg.encodeJpeg(21, 14, (x, y) => ((x / 8) * 3 + (y / 8)) % 256,
      restartInterval = 1)
    assert(Jpeg.decodeJpeg(g) ==
      Jpeg.decodeJpeg(Jpeg.encodeJpeg(21, 14,
        (x, y) => ((x / 8) * 3 + (y / 8)) % 256)))
    // a color stream refuses the grayscale stats surface and vice versa
    intercept[IllegalArgumentException](Jpeg.decodeJpeg(rst))
    intercept[IllegalArgumentException](Jpeg.decodeJpegColor(g))
  }

  test("4:2:0 JPEG: exact on 16-aligned mosaics, tolerant on 8-grain; " +
       "restarts compose; odd dims crop") {
    import graft.ops.Jpeg
    // 16x16 cells: Y blocks AND subsampled chroma blocks constant —
    // the full 4:2:0 pipeline (4 Y + Cb + Cr per MCU, upsample) exact
    val m16 = (x: Int, y: Int) =>
      (((x / 16) * 41 + 13) % 256, ((y / 16) * 29 + 7) % 256,
       ((x / 16) + (y / 16) * 59) % 256)
    def expect(w: Int, h: Int, px: (Int, Int) => (Int, Int, Int)) = {
      var sr = 0L; var sg = 0L; var sb = 0L; var fp = -1L
      for (y <- 0 until h; x <- 0 until w) {
        val (r0, g0, b0) = px(x, y)
        val (yy, cb, cr) = Jpeg.rgbToYcc(r0, g0, b0)
        val (r1, g1, b1) = Jpeg.yccToRgb(yy, cb, cr)
        sr += r1; sg += g1; sb += b1
        if (x == 0 && y == 0) fp = r1 * 65536L + g1 * 256L + b1
      }
      Jpeg.JpegColorStats(w, h, sr, sg, sb, fp)
    }
    // odd dims: partial MCUs both directions, chroma plane 17x12 -> 9x6
    val enc = Jpeg.encodeJpegColor(33, 23, m16, subsample420 = true)
    assert(Jpeg.decodeJpegColor(enc) == expect(33, 23, m16))
    // with restart markers: identical decode, different bytes
    val rst = Jpeg.encodeJpegColor(33, 23, m16, restartInterval = 1,
      subsample420 = true)
    assert(Jpeg.decodeJpegColor(rst) == expect(33, 23, m16))
    assert(!java.util.Arrays.equals(rst, enc))
    // the 4:2:0 stream is SMALLER than 4:4:4 of the same image (the
    // point of subsampling: half the chroma blocks)
    assert(enc.length < Jpeg.encodeJpegColor(33, 23, m16).length)
    // 8-grain mosaic under 4:2:0: chroma blocks span 4 cells (real AC
    // energy) — no longer exact, but flat-quant error stays tiny
    val m8 = (x: Int, y: Int) =>
      (((x / 8) * 41) % 256, ((y / 8) * 29) % 256,
       ((x / 8) + (y / 8) * 3) % 256)
    val approx = Jpeg.decodeJpegColor(
      Jpeg.encodeJpegColor(32, 24, m8, subsample420 = true))
    val ex = expect(32, 24, m8)
    assert(approx.width == 32 && approx.height == 24)
    assert(math.abs(approx.sumR - ex.sumR) <= 32 * 24 * 4 &&
           math.abs(approx.sumG - ex.sumG) <= 32 * 24 * 4 &&
           math.abs(approx.sumB - ex.sumB) <= 32 * 24 * 4,
      s"got $approx want ~$ex")
  }

  test("distributed 4:2:0 synth+decode matches the 16-cell replay") {
    import spark.implicits._
    import graft.ops.Jpeg
    val ids = (0L until 20L).toDF("doc_id")
    val got = Jpeg.decodeJpegColorStatsDf(
        Jpeg.synthJpeg420(ids, "doc_id"), "asset_id", "media")
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6)))).toMap
    (0L until 20L).foreach { id =>
      val w = (17 + id % 18).toInt; val h = (10 + id % 14).toInt
      var sr = 0L; var sg = 0L; var sb = 0L; var fp = -1L
      for (y <- 0 until h; x <- 0 until w) {
        val (yy, cb, cr) = Jpeg.rgbToYcc(
          ((id * 3 + (x / 16) * 7 + (y / 16) * 11) % 256).toInt,
          ((id * 5 + (x / 16) * 13 + (y / 16) * 3) % 256).toInt,
          ((id * 7 + (x / 16) + (y / 16) * 17) % 256).toInt)
        val (r1, g1, b1) = Jpeg.yccToRgb(yy, cb, cr)
        sr += r1; sg += g1; sb += b1
        if (x == 0 && y == 0) fp = r1 * 65536L + g1 * 256L + b1
      }
      assert(got(id) == ((w, h, sr, sg, sb, fp)),
        s"id $id (rst=${id % 2 == 0})")
    }
  }

  test("distributed color JPEG synth+decode matches the cell replay") {
    import spark.implicits._
    import graft.ops.Jpeg
    val ids = (0L until 20L).toDF("doc_id")
    val got = Jpeg.decodeJpegColorStatsDf(
        Jpeg.synthJpegColor(ids, "doc_id"), "asset_id", "media")
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6)))).toMap
    (0L until 20L).foreach { id =>
      val w = (9 + id % 17).toInt; val h = (6 + id % 11).toInt
      var sr = 0L; var sg = 0L; var sb = 0L; var fp = -1L
      for (y <- 0 until h; x <- 0 until w) {
        val (yy, cb, cr) = Jpeg.rgbToYcc(
          ((id * 3 + (x / 8) * 7 + (y / 8) * 11) % 256).toInt,
          ((id * 5 + (x / 8) * 13 + (y / 8) * 3) % 256).toInt,
          ((id * 7 + (x / 8) + (y / 8) * 17) % 256).toInt)
        val (r1, g1, b1) = Jpeg.yccToRgb(yy, cb, cr)
        sr += r1; sg += g1; sb += b1
        if (x == 0 && y == 0) fp = r1 * 65536L + g1 * 256L + b1
      }
      assert(got(id) == ((w, h, sr, sg, sb, fp)),
        s"id $id (rst=${id % 2 == 0})")
    }
  }

  test("distributed JPEG synth+decode matches the mosaic arithmetic") {
    import spark.implicits._
    import graft.ops.Jpeg
    val ids = (0L until 30L).toDF("doc_id")
    val got = Jpeg.decodeJpegStatsDf(Jpeg.synthJpeg(ids, "doc_id"),
        "asset_id", "media")
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getLong(3), r.getLong(4)))).toMap
    (0L until 30L).foreach { id =>
      val w = (9 + id % 17).toInt; val h = (6 + id % 11).toInt
      val sum = (for (y <- 0 until h; x <- 0 until w)
        yield ((id * 31 + (x / 8) * 7 + (y / 8) * 13) % 256)).sum
      assert(got(id) == ((w, h, sum, (id * 31 % 256))), s"id $id")
    }
  }

  test("distributed PNG synth+decode matches the driver-side codec") {
    import spark.implicits._
    val ids = (0L until 24L).toDF("doc_id")
    val stats = decodePngStatsDf(synthPng(ids, "doc_id"),
        "asset_id", "media")
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6)))).toMap
    // 24 ids cycle the filter type (id % 5) through every value; the
    // decoded stats must equal the BMP synth's (same pixel arithmetic)
    (0L until 24L).foreach { id =>
      val w = (8 + id % 9).toInt; val h = (5 + id % 7).toInt
      val st = decodeBmp24(encodeBmp24(w, h, (x, y) => (
        ((id * 3 + x * 7 + y * 11) % 256).toInt,
        ((id * 5 + x * 13 + y * 3) % 256).toInt,
        ((id * 7 + x + y * 17) % 256).toInt)))
      assert(stats(id) ==
        ((st.width, st.height, st.sumR, st.sumG, st.sumB, st.firstPx)),
        s"id $id (filter ${id % 5})")
    }
  }

  // ---- GIF ------------------------------------------------------------

  test("GIF LZW round-trips exactly across code-width boundaries") {
    import graft.ops.Gif
    // pseudo-random 120x80 = 9600 px: the dictionary crosses the
    // 512/1024/2048 width bumps AND the 4096 clear-reset — any
    // handshake off-by-one corrupts pixels long before the end
    def idx(x: Int, y: Int): Int = ((x * 7919 + y * 104729) ^ (x * y)) & 0xff
    for ((w, h) <- Seq((1, 1), (1, 7), (9, 1), (13, 11), (120, 80))) {
      val (dw, dh, px) = Gif.decodeGifRgb(Gif.encodeGif(w, h, idx))
      assert(dw == w && dh == h)
      for (y <- 0 until h; x <- 0 until w) {
        val i = idx(x, y)
        assert(px(y * w + x) ==
          ((Gif.paletteR(i), Gif.paletteG(i), Gif.paletteB(i))),
          s"($w x $h) pixel ($x,$y)")
      }
    }
    // constant image: the KwKwK code==nextCode branch fires immediately
    val (_, _, const) = Gif.decodeGifRgb(Gif.encodeGif(50, 3, (_, _) => 77))
    assert(const.forall(_ == ((Gif.paletteR(77), Gif.paletteG(77),
      Gif.paletteB(77)))))
  }

  test("GIF interlaced decode equals sequential; bytes differ") {
    import graft.ops.Gif
    def idx(x: Int, y: Int): Int = (x * 31 + y * 17) & 0xff
    val plain = Gif.encodeGif(19, 13, idx)
    val inter = Gif.encodeGif(19, 13, idx, interlaced = true)
    assert(!java.util.Arrays.equals(plain, inter))
    assert(Gif.decodeGifRgb(plain)._3.toSeq ==
           Gif.decodeGifRgb(inter)._3.toSeq)
    // heights smaller than the later passes' offsets (empty passes)
    for (h <- Seq(1, 2, 3, 4, 5, 8, 9))
      assert(Gif.decodeGifRgb(Gif.encodeGif(6, h, idx,
        interlaced = true))._3.toSeq ==
        Gif.decodeGifRgb(Gif.encodeGif(6, h, idx))._3.toSeq, s"h=$h")
  }

  test("GIF differential vs the JDK's own ImageIO reader") {
    import graft.ops.Gif
    def idx(x: Int, y: Int): Int = ((x * 37 + y * 101 + x * y) % 256)
    for (interlaced <- Seq(false, true)) {
      val bytes = Gif.encodeGif(33, 21, idx, interlaced = interlaced)
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      assert(img != null, "ImageIO could not parse the GIF")
      assert(img.getWidth == 33 && img.getHeight == 21)
      for (y <- 0 until 21; x <- 0 until 33) {
        val i = idx(x, y)
        val expect = 0xff000000 | (Gif.paletteR(i) << 16) |
          (Gif.paletteG(i) << 8) | Gif.paletteB(i)
        assert(img.getRGB(x, y) == expect,
          s"interlaced=$interlaced pixel ($x,$y)")
      }
    }
  }

  test("GIF decoder walks blocks and refuses garbage") {
    import graft.ops.Gif
    val good = Gif.encodeGif(9, 7, (x, y) => (x + y) & 0xff)
    // the planted comment extension is really in the stream
    assert(good.indexOfSlice("graft".getBytes("US-ASCII")) > 0)
    intercept[IllegalArgumentException] {
      Gif.decodeGifRgb("NOTAGIF".getBytes("US-ASCII") ++ good)
    }
    intercept[Exception] { // truncated LZW data must surface
      Gif.decodeGifRgb(good.dropRight(12))
    }
  }

  test("distributed GIF synth+decode matches the palette arithmetic") {
    import spark.implicits._
    import graft.ops.Gif
    val ids = (0L until 24L).toDF("doc_id")
    val stats = Gif.decodeGifStatsDf(Gif.synthGif(ids, "doc_id"),
        "asset_id", "media")
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6)))).toMap
    (0L until 24L).foreach { id =>
      val w = (7 + id % 12).toInt; val h = (5 + id % 9).toInt
      var sr = 0L; var sg = 0L; var sb = 0L
      for (y <- 0 until h; x <- 0 until w) {
        val i = ((id * 3 + x * 7 + y * 11) % 256).toInt
        sr += Gif.paletteR(i); sg += Gif.paletteG(i); sb += Gif.paletteB(i)
      }
      val i0 = (id * 3 % 256).toInt
      val fp = Gif.paletteR(i0).toLong * 65536 +
        Gif.paletteG(i0) * 256 + Gif.paletteB(i0)
      assert(stats(id) == ((w, h, sr, sg, sb, fp)), s"id $id")
    }
  }

  test("MP4 container: encode -> demux round-trips every field") {
    import graft.ops.Mp4
    val sizes = Array(40, 55, 41)
    val payload = Array.tabulate(sizes.sum)(i => (i % 113).toByte)
    val bytes = Mp4.encodeMp4(width = 320, height = 240,
      timescale = 1500L, sampleDelta = 40L, sampleSizes = sizes,
      payload = payload)
    val m = Mp4.demuxMp4(bytes)
    assert(m.brand == "isom")
    assert(m.timescale == 1500L)
    assert(m.durationTicks == 120L)
    assert(m.nTracks == 1)
    assert(m.handler == "vide")
    assert(m.width == 320 && m.height == 240)
    assert(m.nSamples == 3L)
    assert(m.sumSampleBytes == sizes.map(_.toLong).sum)
    assert(m.sampleDelta == 40L)
  }

  test("MP4 demux: truncated and corrupt-size blobs fail loudly") {
    import graft.ops.Mp4
    val bytes = Mp4.encodeMp4(64, 48, 1000L, 40L, Array(10),
      Array.fill[Byte](10)(7))
    intercept[IllegalArgumentException] {
      Mp4.demuxMp4(bytes.take(bytes.length / 2))
    }
    // corrupt a box size to exceed the file
    val bad = bytes.clone()
    bad(0) = 0x7f.toByte
    intercept[IllegalArgumentException] { Mp4.demuxMp4(bad) }
    // no moov at all
    intercept[IllegalArgumentException] {
      Mp4.demuxMp4(bytes.take(24)) // just ftyp
    }
  }

  test("MP4 demux reads v1 (64-bit) mvhd layouts, not just the " +
       "encoder's v0") {
    import graft.ops.Mp4
    // hand-build a minimal moov with a v1 mvhd: version 1, 8-byte
    // times/duration, timescale at offset +20, duration(+24, 64-bit)
    def be32(v: Long) = Array(((v >> 24) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      (v & 0xff).toByte)
    def be64(v: Long) = be32(v >> 32) ++ be32(v & 0xffffffffL)
    def box(t: String, b: Array[Byte]) =
      be32(b.length + 8L) ++ t.getBytes("US-ASCII") ++ b
    val mvhd1 = box("mvhd",
      Array(1.toByte, 0.toByte, 0.toByte, 0.toByte) ++
      be64(0) ++ be64(0) ++ be32(90000L) ++ be64(123456789L) ++
      be32(0x00010000L) ++ Array.fill[Byte](2 + 2 + 8 + 36 + 24 + 4)(0))
    val file = box("ftyp", "isom".getBytes("US-ASCII") ++ be32(0)) ++
      box("moov", mvhd1)
    val m = graft.ops.Mp4.demuxMp4(file)
    assert(m.timescale == 90000L)
    assert(m.durationTicks == 123456789L)
    assert(m.nTracks == 0)
  }

  test("MP4 demuxSamples splits samples across real multi-chunk " +
       "stsc/stco layouts, byte-exactly") {
    import graft.ops.Mp4
    val samples = Array.tabulate(5)(i =>
      Array.tabulate(30 + 7 * i)(j => ((i * 101 + j * 13) % 251).toByte))
    for (spc <- Seq(1, 2, 3, Int.MaxValue)) {
      val bytes = Mp4.encodeMp4(64, 48, 1000L, 40L,
        samples.map(_.length), samples.flatten,
        codec = "jpeg", samplesPerChunk = spc)
      val d = Mp4.demuxSamples(bytes)
      assert(d.codec == "jpeg", s"spc=$spc")
      assert(d.samples.length == 5, s"spc=$spc")
      samples.zip(d.samples).zipWithIndex.foreach { case ((a, b), i) =>
        assert(java.util.Arrays.equals(a, b), s"spc=$spc sample $i")
      }
    }
    // default codec stays avc1 (the q474 corpus shape)
    val legacy = Mp4.encodeMp4(64, 48, 1000L, 40L, Array(10),
      Array.fill[Byte](10)(7))
    assert(Mp4.demuxSamples(legacy).codec == "avc1")
  }

  test("fMP4 demuxSamples: moof/trun run tables round-trip byte-" +
       "exactly across fragment layouts") {
    import graft.ops.Mp4
    val samples = Array.tabulate(7)(i =>
      Array.tabulate(25 + 9 * i)(j => ((i * 37 + j * 11) % 251).toByte))
    for (perFrag <- Seq(1, 2, 3, 7)) {
      val frags = samples.grouped(perFrag).toArray
      val bytes = Mp4.encodeFragmentedMp4(64, 48, 1000L, 40L,
        frags.map(_.map(_.length)), frags.map(_.flatten), codec = "jpeg")
      val d = Mp4.demuxSamples(bytes)
      assert(d.codec == "jpeg", s"perFrag=$perFrag")
      assert(d.samples.length == 7, s"perFrag=$perFrag")
      samples.zip(d.samples).zipWithIndex.foreach { case ((a, b), i) =>
        assert(java.util.Arrays.equals(a, b), s"perFrag=$perFrag #$i")
      }
    }
  }

  test("fMP4 fragment isolation: a corrupt moof loses its frames " +
       "only; a torn tail ends the scan without killing the asset") {
    import graft.ops.Mp4
    val samples = Array.tabulate(6)(i =>
      Array.tabulate(40)(j => ((i * 7 + j) % 251).toByte))
    val frags = samples.grouped(2).toArray // 3 fragments of 2
    val bytes = Mp4.encodeFragmentedMp4(64, 48, 1000L, 40L,
      frags.map(_.map(_.length)), frags.map(_.flatten))
    // locate fragment 2's moof: the encoder is fragment-local, so the
    // 1-fragment and 2-fragment encodings are byte-exact prefixes
    def prefixLen(k: Int): Int = Mp4.encodeFragmentedMp4(64, 48, 1000L,
      40L, frags.take(k).map(_.map(_.length)),
      frags.take(k).map(_.flatten)).length
    // corrupt the MIDDLE fragment's trun sample count (inside its
    // moof): fragments 1 and 3 must survive, fragment 2 vanish
    val corrupt = bytes.clone()
    val moof2 = prefixLen(1)
    // trun sample_count lives at moof + 8(hdr)+16(mfhd)+8(traf hdr)
    // +16(tfhd)+8(trun hdr)+4(ver/flags): bump it to an absurd value
    val cntOff = moof2 + 8 + 16 + 8 + 16 + 8 + 4
    corrupt(cntOff) = 0x7f.toByte
    val d1 = Mp4.demuxSamples(corrupt)
    assert(d1.samples.length == 4)
    assert(java.util.Arrays.equals(d1.samples(0), samples(0)))
    assert(java.util.Arrays.equals(d1.samples(1), samples(1)))
    assert(java.util.Arrays.equals(d1.samples(2), samples(4)))
    assert(java.util.Arrays.equals(d1.samples(3), samples(5)))
    // tear the file mid-moof of fragment 3: first two fragments intact
    val torn = java.util.Arrays.copyOfRange(bytes, 0, prefixLen(2) + 11)
    val d2 = Mp4.demuxSamples(torn)
    assert(d2.samples.length == 4)
    (0 until 4).foreach(i =>
      assert(java.util.Arrays.equals(d2.samples(i), samples(i))))
  }

  test("fMP4 trun generality: per-sample duration/flags fields are " +
       "strided over; absent sizes fall back to the tfhd default") {
    import graft.ops.Mp4
    // hand-build one moof+mdat after a standard init segment: trun
    // carries duration+size+flags per sample (flags 0x701), so the
    // parser must stride 12 bytes per sample, and a second trun with
    // NO per-sample sizes (flags 0x101) uses the tfhd default size
    def be32(v: Long): Array[Byte] = Array(
      ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def box(t: String, body: Array[Byte]*): Array[Byte] = {
      val p = body.flatten.toArray
      be32(p.length + 8L) ++ t.getBytes("US-ASCII") ++ p
    }
    def full(t: String, flags: Int, body: Array[Byte]*): Array[Byte] =
      box(t, be32((flags & 0xffffff).toLong), body.flatten.toArray)
    // init segment: reuse the encoder with zero fragments
    val init = Mp4.encodeFragmentedMp4(64, 48, 1000L, 40L,
      Array.empty[Array[Int]], Array.empty[Array[Byte]], codec = "jpeg")
    val s1 = Array.tabulate(20)(i => (i * 3).toByte)
    val s2 = Array.tabulate(30)(i => (i * 5).toByte)
    val s3 = Array.tabulate(16)(i => (i * 7).toByte)  // default size
    val s4 = Array.tabulate(16)(i => (i * 11).toByte) // default size
    def moofOf(off: Long): Array[Byte] = box("moof",
      full("mfhd", 0, be32(1)),
      box("traf",
        // tfhd: default-base-is-moof | default-sample-size present
        full("tfhd", 0x020010, be32(1), be32(16)),
        // trun 1: data-offset + duration+size+flags per sample
        full("trun", 0x000701, be32(2), be32(off),
          be32(40), be32(s1.length.toLong), be32(0),
          be32(40), be32(s2.length.toLong), be32(0)),
        // trun 2: NO data offset (continues), NO sizes (default 16)
        full("trun", 0x000100, be32(2), be32(40), be32(40))))
    val probe = moofOf(0L)
    val moof = moofOf(probe.length + 8L)
    val file = init ++ moof ++ box("mdat", s1, s2, s3, s4)
    val d = Mp4.demuxSamples(file)
    assert(d.samples.length == 4)
    assert(java.util.Arrays.equals(d.samples(0), s1))
    assert(java.util.Arrays.equals(d.samples(1), s2))
    assert(java.util.Arrays.equals(d.samples(2), s3))
    assert(java.util.Arrays.equals(d.samples(3), s4))
  }

  test("sniffType: magic bytes identify every engine container; " +
       "short/unknown blobs fall back") {
    import graft.ops.Multimodal.sniffType
    // containers q525 does not cover (it sniffs the image/audio/video
    // synths end-to-end): WARC and gzip prefixes, plus the fallbacks
    assert(sniffType("WARC/1.0\r\nWARC-Type: x".getBytes("US-ASCII"))
      == "application/warc")
    assert(sniffType(Array(0x1f.toByte, 0x8b.toByte, 8.toByte, 0.toByte))
      == "application/gzip")
    // synthWarc writes per-record GZIP members — sniff must say gzip
    val w = graft.ops.Warc.synthWarc(
      TestSpark.spark.range(1).selectExpr("id AS doc_id", "'t' AS text"),
      org.apache.spark.sql.functions.col("doc_id"),
      org.apache.spark.sql.functions.col("text"))
      .head.getAs[Array[Byte]](1)
    assert(sniffType(w) == "application/gzip")
    assert(sniffType(Array[Byte](1, 2, 3)) == "application/octet-stream")
    assert(sniffType("junkjunk".getBytes("US-ASCII"))
      == "application/octet-stream")
    assert(sniffType(Array.empty[Byte]) == "application/octet-stream")
  }

  test("MJPEG frame hashes: real decoded pixels, corrupt frames " +
       "skipped, constant frames hash to zero") {
    import graft.ops.{Mp4, Multimodal}
    val spark = TestSpark.spark
    import org.apache.spark.sql.functions.col
    // constant plane: nothing is strictly above the mean -> (0, 0)
    assert(Multimodal.grayAHash64(Array.fill(64)(17), 8, 8) == ((0L, 0L)))
    // half-bright plane: exactly the bright half's bits set
    val half = Array.tabulate(64)(i => if (i < 32) 0 else 200)
    assert(Multimodal.grayAHash64(half, 8, 8) == ((0xffffffffL, 0L)))
    val ids = spark.range(12).select(col("id").as("doc_id"))
    val vids = Mp4.synthMjpegMp4(ids, "doc_id")
    val got = Mp4.mjpegFrameHashesDf(vids, "asset_id", "media")
      .collect().groupBy(_.getLong(0))
    for (id <- 0L until 12L) {
      val nf = (3 + id % 4).toInt
      val expect = if (id % 7 == 3) nf - 1 else nf
      assert(got(id).length == expect, s"id=$id frame-hash rows")
      // hashes are the gray aHash of the decoded plane, not a stub
      val f0 = got(id).find(_.getInt(1) == 0).get
      val frame = Mp4.demuxSamples(
        vids.filter(col("asset_id") === id).head.getAs[Array[Byte]](1))
        .samples(0)
      val (w, h, plane) = graft.ops.Jpeg.decodeJpegPlane(frame)
      val (hi, lo) = Multimodal.grayAHash64(plane, w, h)
      assert((f0.getLong(3), f0.getLong(4)) == ((hi, lo)), s"id=$id")
    }
  }

  test("MJPEG-in-MP4: every frame decodes to the mosaic closed form; " +
       "a corrupted frame costs one null row, never the asset") {
    import graft.ops.Mp4
    val spark = TestSpark.spark
    import org.apache.spark.sql.functions.col
    val ids = spark.range(12).select(col("id").as("doc_id"))
    val vids = Mp4.synthMjpegMp4(ids, "doc_id")
    val rows = Mp4.decodeMjpegFramesDf(vids, "asset_id", "media")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r).toMap
    for (id <- 0L until 12L) {
      val w = (9 + id % 17).toInt
      val h = (6 + id % 11).toInt
      val nf = (3 + id % 4).toInt
      for (f <- 0 until nf) {
        val r = rows((id, f))
        assert(r.getInt(2) == nf, s"id=$id f=$f n_frames")
        if (id % 7 == 3 && f == 1) {
          assert(!r.getBoolean(3), s"id=$id f=$f must be corrupt")
          assert(r.isNullAt(4) && r.isNullAt(6), s"id=$id f=$f nulls")
        } else {
          assert(r.getBoolean(3), s"id=$id f=$f must decode")
          assert(r.getInt(4) == w && r.getInt(5) == h, s"id=$id f=$f dims")
          var sum = 0L
          for (y <- 0 until h; x <- 0 until w)
            sum += (id * 31 + f * 19 + (x / 8) * 7 + (y / 8) * 13) % 256
          assert(r.getLong(6) == sum, s"id=$id f=$f sum_y")
          assert(r.getLong(7) == (id * 31 + f * 19) % 256,
            s"id=$id f=$f first_px")
        }
      }
    }
  }

  test("FLAC: encode -> decode round-trips PCM bit-exactly, multi-frame") {
    import graft.ops.Flac
    // a mix of tonal ramp + pseudo-noise so several fixed orders win
    val samples = Array.tabulate(1000) { i =>
      (((i * 37) % 600 - 300) + ((i * i * 2654435761L) % 97 - 48)).toShort
    }
    val bytes = Flac.encodeFlac(samples, 8000, blockSize = 256)
    val (out, st) = Flac.decodeFlac(bytes)
    assert(out.toSeq == samples.map(_.toInt).toSeq)
    assert(st.sampleRate == 8000 && st.channels == 1 && st.bits == 16)
    assert(st.nSamples == 1000L && st.nFrames == 4)
    assert(st.sumAbs == samples.map(s => math.abs(s.toLong)).sum)
    assert(st.peak == samples.map(s => math.abs(s.toLong)).max)
  }

  test("FLAC: fixed predictors genuinely compress; constant blocks " +
       "collapse to constant subframes") {
    import graft.ops.Flac
    // a half-step ramp: order-2 residuals alternate +-1 (zigzag 1..2),
    // ~2.5 bits/sample at rice param 0 vs the 16-bit verbatim floor
    val ramp = Array.tabulate(4096)(i => (i / 2 - 1024).toShort)
    val enc = Flac.encodeFlac(ramp, 8000, blockSize = 1024)
    assert(enc.length < 4096 * 2 / 6,
      s"ramp should rice-compress >6x, got ${enc.length} bytes")
    val (out, _) = Flac.decodeFlac(enc)
    assert(out.toSeq == ramp.map(_.toInt).toSeq)
    val const = Array.fill[Short](2048)(-12345)
    val encC = Flac.encodeFlac(const, 8000, blockSize = 1024)
    // constant subframe: whole stream = header + 2 frames of ~15 bytes
    assert(encC.length < 120, s"constant stream is ${encC.length} bytes")
    assert(Flac.decodeFlac(encC)._1.forall(_ == -12345))
  }

  test("FLAC: corrupt and truncated streams fail loudly, never as " +
       "silence") {
    import graft.ops.Flac
    val samples = Array.tabulate(300)(i => ((i * 31) % 401 - 200).toShort)
    val bytes = Flac.encodeFlac(samples, 8000, blockSize = 128)
    intercept[IllegalArgumentException] {
      Flac.decodeFlac(bytes.take(bytes.length - 3)) // truncated
    }
    // flip one bit in the last frame's residual payload -> CRC-16 (or
    // MD5, if the flip happens to decode) must catch it
    val bad = bytes.clone()
    bad(bytes.length - 5) = (bad(bytes.length - 5) ^ 0x10).toByte
    intercept[IllegalArgumentException] { Flac.decodeFlac(bad) }
    // flip a frame-header byte (block-size field of frame 0) -> CRC-8
    val hdr = bytes.clone()
    val frame0 = 4 + 4 + 34 // marker + metadata header + STREAMINFO
    hdr(frame0 + 5) = (hdr(frame0 + 5) ^ 0x01).toByte
    intercept[IllegalArgumentException] { Flac.decodeFlac(hdr) }
    intercept[IllegalArgumentException] {
      Flac.decodeFlac("flaX".getBytes("US-ASCII") ++ bytes.drop(4))
    }
  }

  test("FLAC decoder reads LPC subframes, wasted bits, and escaped " +
       "partitions the encoder never emits") {
    import graft.ops.Flac
    // three frames, hand-assembled: (1) LPC order 1 with coeff=1
    // shift=0 (arithmetically identical to FIXED order 1 — a real
    // differential for the LPC bit layout), (2) CONSTANT with one
    // wasted bit, (3) FIXED order 0 with an escaped raw partition at
    // partition order 1.
    val bs = 32
    val f1 = Array.tabulate(bs)(i => 100 + 7 * i) // diff1 = const 7
    val f2 = Array.fill(bs)(2468)                 // even: 1 wasted bit
    val f3 = Array.tabulate(bs)(i => (i * 1103) % 257 - 128)
    val all = (f1 ++ f2 ++ f3).map(_.toShort)
    val md5 = java.security.MessageDigest.getInstance("MD5")
    all.foreach { s =>
      md5.update((s & 0xff).toByte); md5.update(((s >> 8) & 0xff).toByte)
    }
    val w = new Flac.BitWriter
    w.writeBits(0x664c6143L, 32)
    w.writeBits(1, 1); w.writeBits(0, 7); w.writeBits(34, 24)
    w.writeBits(bs, 16); w.writeBits(bs, 16)
    w.writeBits(0, 24); w.writeBits(0, 24)
    w.writeBits(8000, 20); w.writeBits(0, 3); w.writeBits(15, 5)
    w.writeBits(all.length.toLong, 36)
    md5.digest().foreach(b => w.writeBits(b & 0xff, 8))

    def frameHeader(fw: Flac.BitWriter, idx: Int): Unit = {
      fw.writeBits(0x3ffe, 14); fw.writeBits(0, 2)
      fw.writeBits(0x7, 4); fw.writeBits(0x0, 4)
      fw.writeBits(0x0, 4); fw.writeBits(0x4, 3); fw.writeBits(0, 1)
      fw.writeBits(idx.toLong, 8) // coded number, single byte
      fw.writeBits(bs - 1L, 16)
      val hb = fw.toBytes
      fw.writeBits(Flac.crc8(hb, 0, hb.length), 8)
    }
    def sealFrame(fw: Flac.BitWriter): Array[Byte] = {
      fw.alignByte()
      val fb = fw.toBytes
      val out = new Flac.BitWriter
      fb.foreach(b => out.writeBits(b & 0xff, 8))
      out.writeBits(Flac.crc16(fb, 0, fb.length), 16)
      out.toBytes
    }
    // frame 1: LPC order 1, precision 2, shift 0, coeff +1
    val w1 = new Flac.BitWriter
    frameHeader(w1, 0)
    w1.writeBits(0, 1); w1.writeBits(32, 6); w1.writeBits(0, 1)
    w1.writeBits(f1(0).toLong & 0xffff, 16)     // warmup
    w1.writeBits(1, 4)                          // precision - 1 = 1
    w1.writeBits(0, 5)                          // shift 0
    w1.writeBits(1, 2)                          // coeff +1, 2-bit signed
    w1.writeBits(0, 2); w1.writeBits(0, 4)      // rice, partition order 0
    w1.writeBits(3, 4)                          // param 3
    (1 until bs).foreach { _ =>                 // residual 7 -> zz 14
      w1.writeBits(0, 1); w1.writeBits(1, 1)    // unary q=1
      w1.writeBits(14 & 7, 3)
    }
    // frame 2: CONSTANT, wasted bits = 1, value stored pre-shifted
    val w2 = new Flac.BitWriter
    frameHeader(w2, 1)
    w2.writeBits(0, 1); w2.writeBits(0, 6); w2.writeBits(1, 1)
    w2.writeBits(1, 1)                          // unary 0 -> wasted = 1
    w2.writeBits((2468 >> 1).toLong & 0x7fff, 15)
    // frame 3: FIXED order 0, partition order 1, both partitions
    // escaped raw 12-bit
    val w3 = new Flac.BitWriter
    frameHeader(w3, 2)
    w3.writeBits(0, 1); w3.writeBits(8, 6); w3.writeBits(0, 1)
    w3.writeBits(0, 2); w3.writeBits(1, 4)      // rice, partition order 1
    (0 until 2).foreach { part =>
      w3.writeBits(15, 4)                       // escape
      w3.writeBits(12, 5)                       // 12-bit raw residuals
      (0 until bs / 2).foreach { i =>
        val v = f3(part * bs / 2 + i)
        w3.writeBits(v.toLong & 0xfff, 12)
      }
    }
    val file = w.toBytes ++ sealFrame(w1) ++ sealFrame(w2) ++ sealFrame(w3)
    val (out, st) = Flac.decodeFlac(file)
    assert(out.toSeq == all.map(_.toInt).toSeq)
    assert(st.nFrames == 3 && st.nSamples == all.length.toLong)
  }

  test("FLAC stats over a DataFrame match per-id synthesis; null media " +
       "yields null stats") {
    import graft.ops.Flac
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val ids = spark.range(0, 40).toDF("doc_id")
    val flacs = Flac.synthFlac(ids, "doc_id")
    val got = Flac.decodeFlacStatsDf(flacs, "asset_id", "media")
      .orderBy("asset_id").collect()
    got.foreach { r =>
      val id = r.getLong(0)
      val n = (30 + id % 70).toInt
      val xs = Array.tabulate(n)(i =>
        ((id + 7) * 6007L + i * 31627L) % 65521L - 32760L)
      assert(r.getInt(1) == 8000 && r.getInt(2) == 1 && r.getInt(3) == 16)
      assert(r.getLong(4) == n.toLong)
      assert(r.getInt(5) == (n + 63) / 64)
      assert(r.getLong(6) == xs.map(math.abs).sum)
      assert(r.getLong(7) == xs.map(math.abs).max)
    }
    val withNull = spark.createDataFrame(
      new java.util.ArrayList[Row](java.util.List.of(
        Row(99L, null.asInstanceOf[Array[Byte]]))),
      StructType(Seq(StructField("asset_id", LongType),
        StructField("media", BinaryType))))
    val nr = Flac.decodeFlacStatsDf(withNull, "asset_id", "media").head()
    assert(nr.getLong(0) == 99L && nr.isNullAt(1) && nr.isNullAt(4))
  }
  test("MP3 demux: synth stats exact; truncation at ANY byte never " +
       "throws and only sheds tail frames; resync skips junk") {
    import graft.ops.Mp3
    // exact stats for a spread of cohort ids (MPEG1/2, VBR, junk,
    // torn tail, ID3v1 trailer)
    for (id <- 0L until 60L) {
      val st = Mp3.demux(Mp3.synthBytes(id))
      val torn = id % 5 == 2
      val nf0 = (4 + id % 5).toInt
      assert(st.nFrames == (if (torn) nf0 - 1 else nf0), s"id=$id")
      assert(st.truncated == torn, s"id=$id")
      val rate =
        if (id % 11 == 5) 22050
        else Seq(44100, 48000, 32000)((id % 3).toInt)
      assert(st.sampleRate == rate, s"id=$id")
      assert(st.bytesSkipped == (if (id % 7 == 3) 5L else 0L),
        s"id=$id")
      assert(st.vbr == (id % 4 == 1), s"id=$id")
      val spf = if (id % 11 == 5) 576 else 1152
      assert(st.durationMs == st.nFrames.toLong * spf * 1000 / rate,
        s"id=$id")
    }
    // hostile-input property: cut the stream at EVERY prefix length —
    // the walker must never throw, never count MORE frames than the
    // full stream, and frame counts must be monotone in prefix length
    for (id <- Seq(0L, 1L, 3L, 5L, 7L, 12L)) {
      val full = Mp3.synthBytes(id)
      val whole = Mp3.demux(full).nFrames
      var prev = 0
      (0 to full.length).foreach { cut =>
        val st = Mp3.demux(full.take(cut)) // must not throw
        assert(st.nFrames <= whole, s"id=$id cut=$cut")
        assert(st.nFrames >= prev - 1, s"id=$id cut=$cut") // ~monotone
        prev = st.nFrames
      }
    }
    // pure garbage: zero frames, no exception
    val g = Array.tabulate[Byte](500)(i => ((i * 37) % 251).toByte)
    assert(Mp3.demux(g).nFrames == 0)
    assert(Mp3.demux(Array.emptyByteArray).nFrames == 0)
    // sniff router dispatches both ID3-prefixed and bare-sync streams
    assert(Multimodal.sniffType(Mp3.synthBytes(0)) == "audio/mpeg")
    assert(Multimodal.sniffType(
      Mp3.synthBytes(0).drop(10 + 16)) == "audio/mpeg")
  }
}
