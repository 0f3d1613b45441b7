package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Real FLAC codec (RFC 9639 / the xiph format spec), JDK-only.
  *
  * FLAC closes the AUDIO side of the real-codec ledger the way PNG/JPEG
  * closed images: unlike MP3 — whose Huffman/window tables are opaque
  * tabulated data and therefore stay behind the documented stub seam
  * ([[Multimodal]] explains why re-keying them offline would risk a
  * codec that merely LOOKS conformant) — every constant in FLAC is a
  * derivable formula: Rice/unary coding, fixed predictors = binomial-
  * coefficient difference filters, CRC-8 poly x^8+x^2+x+1 (0x07) and
  * CRC-16 poly x^16+x^15+x^2+1 (0x8005), UTF-8-style coded numbers,
  * and an MD5 of the raw PCM (JDK `MessageDigest`). So a bit-exact
  * LOSSLESS round trip is provable in-spec, which is exactly what a
  * training-data audio pipeline needs from its at-rest format.
  *
  * Encoder profile: mono, 16-bit, fixed-blocksize streams; per block it
  * picks the cheapest of CONSTANT / VERBATIM / FIXED(0..4) by exact bit
  * cost with the optimal Rice parameter (Rice2 when the parameter
  * exceeds the 4-bit code space). Decoder is wider than the encoder —
  * all block-size codes, parametric sample-rate codes, any partition
  * order, escaped (raw) partitions, LPC subframes (coefficients come
  * from the stream; reconstruction is the same dot-and-shift as fixed),
  * wasted bits — and REJECTS what it cannot have tested against a real
  * stream (stereo decorrelation, the named sample-rate code table) with
  * a loud error instead of a guess: the same tested-paths-only policy
  * as the baseline-profile JPEG decoder.
  *
  * Scale shape: identical to the other codecs — one partition-batch
  * pass, stats project before any join, media bytes never shuffle.
  */
object Flac {

  // ---- bit IO --------------------------------------------------------

  private[graft] final class BitWriter {
    private val buf = scala.collection.mutable.ArrayBuffer[Byte]()
    private var cur = 0
    private var nbits = 0
    def writeBits(v: Long, n: Int): Unit = {
      require(n >= 0 && n <= 64, s"writeBits n=$n")
      var i = n - 1
      while (i >= 0) {
        cur = (cur << 1) | ((v >>> i) & 1L).toInt
        nbits += 1
        if (nbits == 8) { buf += cur.toByte; cur = 0; nbits = 0 }
        i -= 1
      }
    }
    def writeUnary(q: Long): Unit = {
      var i = 0L
      while (i < q) { writeBits(0, 1); i += 1 }
      writeBits(1, 1)
    }
    def alignByte(): Unit = if (nbits != 0) writeBits(0, 8 - nbits)
    def size: Int = { require(nbits == 0, "unaligned"); buf.length }
    def toBytes: Array[Byte] = { alignByte(); buf.toArray }
    def bitLength: Long = buf.length.toLong * 8 + nbits
  }

  private final class BitReader(bytes: Array[Byte], start: Int) {
    private var pos = start
    private var bit = 0
    def bytePos: Int = pos
    def aligned: Boolean = bit == 0
    def readBit(): Int = {
      require(pos < bytes.length, "flac: truncated stream")
      val b = (bytes(pos) >> (7 - bit)) & 1
      bit += 1
      if (bit == 8) { bit = 0; pos += 1 }
      b
    }
    def readBits(n: Int): Long = {
      var v = 0L; var i = 0
      while (i < n) { v = (v << 1) | readBit(); i += 1 }
      v
    }
    def readSigned(n: Int): Long = {
      val v = readBits(n)
      if (n > 0 && (v & (1L << (n - 1))) != 0) v - (1L << n) else v
    }
    def readUnary(): Long = {
      var q = 0L
      while (readBit() == 0) q += 1
      q
    }
    def alignByte(): Unit = if (bit != 0) { bit = 0; pos += 1 }
  }

  // ---- CRCs (generator polynomials are spec formulas, not tables;
  //      the byte-at-a-time loop derives each step) --------------------

  private[graft] def crc8(bytes: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= bytes(i) & 0xff
      var k = 0
      while (k < 8) {
        crc = if ((crc & 0x80) != 0) ((crc << 1) ^ 0x07) & 0xff
              else (crc << 1) & 0xff
        k += 1
      }
      i += 1
    }
    crc
  }

  private[graft] def crc16(bytes: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= (bytes(i) & 0xff) << 8
      var k = 0
      while (k < 8) {
        crc = if ((crc & 0x8000) != 0) ((crc << 1) ^ 0x8005) & 0xffff
              else (crc << 1) & 0xffff
        k += 1
      }
      i += 1
    }
    crc
  }

  // ---- UTF-8-style coded numbers (frame index; the format extends
  //      UTF-8's length-prefix scheme to 36-bit values) -----------------

  private def writeCodedNumber(w: BitWriter, v: Long): Unit = {
    require(v >= 0 && v < (1L << 36), s"coded number out of range: $v")
    if (v < 0x80) w.writeBits(v, 8)
    else {
      // count payload bits -> number of continuation bytes
      var nBytes = 2
      while (nBytes < 7 && v >= (1L << (nBytes * 5 + 1))) nBytes += 1
      // leading byte: nBytes ones, a zero, then the high payload bits
      val highBits = if (nBytes == 7) 0 else 7 - nBytes
      w.writeBits((1L << nBytes) - 1, nBytes)
      if (nBytes < 7) w.writeBits(0, 1)
      w.writeBits(v >>> (6 * (nBytes - 1)), highBits)
      var i = nBytes - 2
      while (i >= 0) {
        w.writeBits(0x2, 2) // 10 continuation marker
        w.writeBits((v >>> (6 * i)) & 0x3f, 6)
        i -= 1
      }
    }
  }

  private def readCodedNumber(r: BitReader): Long = {
    val b0 = r.readBits(8)
    if ((b0 & 0x80) == 0) b0
    else {
      var nBytes = 0
      var m = 0x80
      while (nBytes < 8 && (b0 & m) != 0) { nBytes += 1; m >>= 1 }
      require(nBytes >= 2 && nBytes <= 7, s"flac: bad coded-number lead")
      var v = b0 & (0xff >> (nBytes + 1))
      var i = 1
      var out = v.toLong
      while (i < nBytes) {
        val c = r.readBits(8)
        require((c & 0xc0) == 0x80, "flac: bad coded-number continuation")
        out = (out << 6) | (c & 0x3f)
        i += 1
      }
      out
    }
  }

  // ---- fixed predictors (binomial-coefficient difference filters) ----

  /** k-th forward difference of the block: the FIXED-subframe residual. */
  private def diffK(s: Array[Int], order: Int): Array[Long] = {
    var cur = s.map(_.toLong)
    var k = 0
    while (k < order) {
      val next = new Array[Long](cur.length - 1)
      var i = 0
      while (i < next.length) { next(i) = cur(i + 1) - cur(i); i += 1 }
      cur = next
      k += 1
    }
    cur
  }

  private def zigzag(v: Long): Long = (v << 1) ^ (v >> 63)

  /** Exact Rice bit cost of the residual vector at parameter p. */
  private def riceCost(res: Array[Long], p: Int): Long = {
    var bits = 0L
    var i = 0
    while (i < res.length) {
      bits += (zigzag(res(i)) >>> p) + 1 + p
      i += 1
    }
    bits
  }

  private def bestRiceParam(res: Array[Long]): (Int, Long) = {
    var bestP = 0
    var bestC = Long.MaxValue
    var p = 0
    while (p <= 30) {
      val c = riceCost(res, p)
      if (c < bestC) { bestC = c; bestP = p }
      p += 1
    }
    (bestP, bestC)
  }

  // ---- encode ---------------------------------------------------------

  /** Encode mono 16-bit PCM as a FLAC stream: fLaC marker + STREAMINFO
    * (incl. the PCM MD5) + fixed-blocksize frames, each subframe the
    * exact-bit-cost winner of constant/verbatim/fixed(0..4). Lossless:
    * [[decodeFlac]] reproduces `samples` bit-exactly and verifies both
    * CRCs and the MD5. */
  def encodeFlac(samples: Array[Short], sampleRate: Int,
                 blockSize: Int = 4096): Array[Byte] = {
    require(sampleRate > 0 && sampleRate < (1 << 20),
      s"flac: sample rate $sampleRate outside the 20-bit field")
    require(blockSize >= 16 && blockSize <= 65535,
      s"flac: block size $blockSize outside 16..65535")
    val md5 = java.security.MessageDigest.getInstance("MD5")
    samples.foreach { s =>
      md5.update((s & 0xff).toByte); md5.update(((s >> 8) & 0xff).toByte)
    }
    val frames = scala.collection.mutable.ArrayBuffer[Array[Byte]]()
    var off = 0
    var frameIdx = 0L
    while (off < samples.length) {
      val n = math.min(blockSize, samples.length - off)
      val block = Array.tabulate(n)(i => samples(off + i).toInt)
      frames += encodeFrame(block, frameIdx)
      off += n
      frameIdx += 1
    }
    val minF = if (frames.isEmpty) 0 else frames.map(_.length).min
    val maxF = if (frames.isEmpty) 0 else frames.map(_.length).max
    val w = new BitWriter
    w.writeBits(0x664c6143L, 32)          // "fLaC"
    w.writeBits(1, 1)                     // last metadata block
    w.writeBits(0, 7)                     // STREAMINFO
    w.writeBits(34, 24)
    w.writeBits(blockSize, 16)            // min block (excl. last frame)
    w.writeBits(blockSize, 16)            // max block
    w.writeBits(minF, 24)
    w.writeBits(maxF, 24)
    w.writeBits(sampleRate, 20)
    w.writeBits(0, 3)                     // channels - 1 (mono)
    w.writeBits(15, 5)                    // bits per sample - 1 (16)
    w.writeBits(samples.length.toLong, 36)
    md5.digest().foreach(b => w.writeBits(b & 0xff, 8))
    val head = w.toBytes
    val out = new Array[Byte](head.length + frames.map(_.length).sum)
    System.arraycopy(head, 0, out, 0, head.length)
    var p = head.length
    frames.foreach { f =>
      System.arraycopy(f, 0, out, p, f.length); p += f.length
    }
    out
  }

  private def encodeFrame(block: Array[Int], frameIdx: Long): Array[Byte] = {
    val n = block.length
    val w = new BitWriter
    w.writeBits(0x3ffe, 14)               // sync
    w.writeBits(0, 1)                     // reserved
    w.writeBits(0, 1)                     // fixed-blocksize stream
    w.writeBits(0x7, 4)                   // block size: 16-bit at end
    w.writeBits(0x0, 4)                   // sample rate: from STREAMINFO
    w.writeBits(0x0, 4)                   // mono
    w.writeBits(0x4, 3)                   // 16 bits per sample
    w.writeBits(0, 1)                     // reserved
    writeCodedNumber(w, frameIdx)
    w.writeBits(n - 1L, 16)
    val headerBytes = w.toBytes           // aligned: all fields above are
    val w2 = new BitWriter                // whole bytes for this profile
    headerBytes.foreach(b => w2.writeBits(b & 0xff, 8))
    w2.writeBits(crc8(headerBytes, 0, headerBytes.length), 8)

    // choose the subframe by exact bit cost
    val allEqual = block.forall(_ == block(0))
    if (allEqual) {
      w2.writeBits(0, 1); w2.writeBits(0, 6); w2.writeBits(0, 1) // CONSTANT
      w2.writeBits(block(0).toLong & 0xffff, 16)
    } else {
      val maxOrder = math.min(4, n - 1)
      val cand = (0 to maxOrder).map { k =>
        val res = diffK(block, k)
        val (p, c) = bestRiceParam(res)
        // subframe hdr 8 + warmups + residual hdr 2+4 + param code
        val paramBits = if (p > 14) 5 else 4
        val methodRice2 = p > 14
        val cost = 8L + k * 16L + 2 + 4 + paramBits + c
        (cost, k, p, methodRice2, res)
      }
      val best = cand.minBy(_._1)
      val verbatimCost = 8L + n * 16L
      if (verbatimCost <= best._1) {
        w2.writeBits(0, 1); w2.writeBits(1, 6); w2.writeBits(0, 1)
        block.foreach(s => w2.writeBits(s.toLong & 0xffff, 16))
      } else {
        val (_, k, p, rice2, res) = best
        w2.writeBits(0, 1)
        w2.writeBits(8L | k, 6)           // FIXED, order k (001xxx)
        w2.writeBits(0, 1)                // no wasted bits
        var i = 0
        while (i < k) { w2.writeBits(block(i).toLong & 0xffff, 16); i += 1 }
        w2.writeBits(if (rice2) 1 else 0, 2)
        w2.writeBits(0, 4)                // partition order 0
        w2.writeBits(p.toLong, if (rice2) 5 else 4)
        res.foreach { r =>
          val u = zigzag(r)
          w2.writeUnary(u >>> p)
          w2.writeBits(u & ((1L << p) - 1), p)
        }
      }
    }
    w2.alignByte()
    val body = w2.toBytes
    val w3 = new BitWriter
    body.foreach(b => w3.writeBits(b & 0xff, 8))
    w3.writeBits(crc16(body, 0, body.length), 16)
    w3.toBytes
  }

  // ---- decode ---------------------------------------------------------

  final case class FlacStats(sampleRate: Int, channels: Int, bits: Int,
                             nSamples: Long, nFrames: Int,
                             sumAbs: Long, peak: Long)

  /** Decode a FLAC stream produced by any encoder within the supported
    * profile (see object doc). Verifies every frame-header CRC-8, every
    * frame CRC-16, and the STREAMINFO MD5 against the decoded PCM —
    * corrupt media throws, it never reads as silence. Returns the
    * samples and the verified stream facts. */
  def decodeFlac(bytes: Array[Byte]): (Array[Int], FlacStats) = {
    require(bytes.length >= 42, "flac: truncated stream")
    require(bytes(0) == 'f' && bytes(1) == 'L' && bytes(2) == 'a' &&
            bytes(3) == 'C', "flac: missing fLaC marker")
    val r = new BitReader(bytes, 4)
    // metadata blocks; STREAMINFO must come first
    var last = false
    var sampleRate = -1; var channels = -1; var bits = -1
    var totalSamples = -1L
    val md5Expect = new Array[Byte](16)
    var first = true
    while (!last) {
      last = r.readBits(1) == 1
      val typ = r.readBits(7).toInt
      val len = r.readBits(24).toInt
      require(typ != 127, "flac: invalid metadata block type")
      if (first) {
        require(typ == 0, "flac: first metadata block is not STREAMINFO")
        require(len == 34, s"flac: STREAMINFO length $len")
        r.readBits(16); r.readBits(16)    // min/max block size
        r.readBits(24); r.readBits(24)    // min/max frame size
        sampleRate = r.readBits(20).toInt
        channels = r.readBits(3).toInt + 1
        bits = r.readBits(5).toInt + 1
        totalSamples = r.readBits(36)
        var i = 0
        while (i < 16) { md5Expect(i) = r.readBits(8).toByte; i += 1 }
        first = false
      } else {
        require(r.bytePos + len <= bytes.length, "flac: truncated metadata")
        var i = 0
        while (i < len) { r.readBits(8); i += 1 }
      }
    }
    require(channels == 1,
      "flac: only mono / independent channels are in the tested profile")
    require(sampleRate > 0 && totalSamples >= 0, "flac: bad STREAMINFO")
    require(totalSamples <= Int.MaxValue,
      s"flac: $totalSamples samples exceed one in-memory block")

    val out = new Array[Int](totalSamples.toInt)
    var got = 0
    var nFrames = 0
    while (got < out.length) {
      val frameStart = r.bytePos
      require(r.aligned, "flac: frame not byte-aligned")
      val sync = r.readBits(14)
      require(sync == 0x3ffe, f"flac: lost sync at byte $frameStart")
      require(r.readBits(1) == 0, "flac: reserved bit set")
      r.readBits(1)                       // blocking strategy
      val bsCode = r.readBits(4).toInt
      val srCode = r.readBits(4).toInt
      val chCode = r.readBits(4).toInt
      val ssCode = r.readBits(3).toInt
      require(r.readBits(1) == 0, "flac: reserved bit set")
      require(chCode == 0,
        "flac: stereo decorrelation outside the tested profile")
      val frameBits = ssCode match {
        case 0 => bits
        case 1 => 8
        case 2 => 12
        case 4 => 16
        case 5 => 20
        case 6 => 24
        case 7 => 32
        case _ => throw new IllegalArgumentException(
          s"flac: reserved sample-size code $ssCode")
      }
      readCodedNumber(r)                  // frame/sample number
      val blockSize = bsCode match {
        case 0 => throw new IllegalArgumentException(
          "flac: reserved block-size code 0")
        case 1 => 192
        case c if c >= 2 && c <= 5 => 576 << (c - 2)
        case 6 => r.readBits(8).toInt + 1
        case 7 => r.readBits(16).toInt + 1
        case c => 256 << (c - 8)
      }
      srCode match {
        case 0  => ()                     // from STREAMINFO
        case 12 => r.readBits(8)          // kHz
        case 13 => r.readBits(16)         // Hz
        case 14 => r.readBits(16)         // daHz
        case 15 => throw new IllegalArgumentException(
          "flac: invalid sample-rate code 15")
        case c => throw new IllegalArgumentException(
          s"flac: named sample-rate code $c outside the tested profile")
      }
      val headerEnd = r.bytePos
      val crc8Got = r.readBits(8).toInt
      require(crc8Got == crc8(bytes, frameStart, headerEnd),
        "flac: frame header CRC-8 mismatch")

      val n = math.min(blockSize, out.length - got)
      require(blockSize <= out.length - got,
        "flac: frame overruns STREAMINFO total samples")
      decodeSubframe(r, out, got, blockSize, frameBits)
      r.alignByte()
      val frameEnd = r.bytePos
      val crc16Got = r.readBits(16).toInt
      require(crc16Got == crc16(bytes, frameStart, frameEnd),
        "flac: frame CRC-16 mismatch")
      got += n
      nFrames += 1
    }
    val md5 = java.security.MessageDigest.getInstance("MD5")
    val bytesPer = (bits + 7) / 8
    out.foreach { s =>
      var i = 0
      while (i < bytesPer) { md5.update(((s >> (8 * i)) & 0xff).toByte); i += 1 }
    }
    require(java.util.Arrays.equals(md5.digest(), md5Expect),
      "flac: MD5 mismatch — decoded PCM differs from the encoded signal")
    var sumAbs = 0L; var peak = 0L
    out.foreach { s =>
      val a = math.abs(s.toLong); sumAbs += a; if (a > peak) peak = a
    }
    (out, FlacStats(sampleRate, channels, bits, totalSamples, nFrames,
      sumAbs, peak))
  }

  private def decodeSubframe(r: BitReader, out: Array[Int], at: Int,
                             n: Int, bits: Int): Unit = {
    require(r.readBits(1) == 0, "flac: subframe padding bit set")
    val typ = r.readBits(6).toInt
    val wasted =
      if (r.readBits(1) == 1) r.readUnary().toInt + 1 else 0
    val eff = bits - wasted
    typ match {
      case 0 =>                           // CONSTANT
        val v = r.readSigned(eff).toInt
        var i = 0
        while (i < n) { out(at + i) = v; i += 1 }
      case 1 =>                           // VERBATIM
        var i = 0
        while (i < n) { out(at + i) = r.readSigned(eff).toInt; i += 1 }
      case t if t >= 8 && t <= 12 =>      // FIXED order t-8
        val order = t - 8
        var i = 0
        while (i < order) {
          out(at + i) = r.readSigned(eff).toInt; i += 1
        }
        val res = readResidual(r, n, order)
        // reconstruct: s(i) = sum of binomial taps + residual
        i = order
        while (i < n) {
          val p = order match {
            case 0 => 0L
            case 1 => out(at + i - 1).toLong
            case 2 => 2L * out(at + i - 1) - out(at + i - 2)
            case 3 => 3L * out(at + i - 1) - 3L * out(at + i - 2) +
                      out(at + i - 3)
            case 4 => 4L * out(at + i - 1) - 6L * out(at + i - 2) +
                      4L * out(at + i - 3) - out(at + i - 4)
          }
          out(at + i) = (p + res(i - order)).toInt
          i += 1
        }
      case t if t >= 32 =>                // LPC, order t-31
        val order = t - 31
        var i = 0
        while (i < order) {
          out(at + i) = r.readSigned(eff).toInt; i += 1
        }
        val precision = r.readBits(4).toInt + 1
        require(precision <= 15, "flac: invalid LPC precision code")
        val shift = r.readSigned(5).toInt
        require(shift >= 0, "flac: negative LPC shift")
        val coefs = Array.fill(order)(r.readSigned(precision))
        val res = readResidual(r, n, order)
        i = order
        while (i < n) {
          var acc = 0L
          var j = 0
          while (j < order) {
            acc += coefs(j) * out(at + i - 1 - j); j += 1
          }
          out(at + i) = ((acc >> shift) + res(i - order)).toInt
          i += 1
        }
      case t => throw new IllegalArgumentException(
        s"flac: reserved subframe type $t")
    }
    if (wasted > 0) {
      var i = 0
      while (i < n) { out(at + i) <<= wasted; i += 1 }
    }
  }

  private def readResidual(r: BitReader, blockSize: Int,
                           order: Int): Array[Long] = {
    val method = r.readBits(2).toInt
    require(method <= 1, s"flac: reserved residual method $method")
    val paramBits = if (method == 0) 4 else 5
    val escape = (1 << paramBits) - 1
    val partOrder = r.readBits(4).toInt
    val parts = 1 << partOrder
    require(blockSize % parts == 0 && blockSize / parts > order,
      "flac: invalid partition order for block size")
    val res = new Array[Long](blockSize - order)
    var w = 0
    var part = 0
    while (part < parts) {
      val cnt = (blockSize >> partOrder) - (if (part == 0) order else 0)
      val param = r.readBits(paramBits).toInt
      if (param == escape) {
        val raw = r.readBits(5).toInt
        var i = 0
        while (i < cnt) { res(w) = r.readSigned(raw); w += 1; i += 1 }
      } else {
        var i = 0
        while (i < cnt) {
          val u = (r.readUnary() << param) | r.readBits(param)
          res(w) = (u >>> 1) ^ -(u & 1L)  // un-zigzag
          w += 1; i += 1
        }
      }
      part += 1
    }
    res
  }

  // ---- Spark seams (same partition-batch shape as the other codecs) --

  /** Deterministic per-id PCM synthesis + FLAC encode (the testdata has
    * no real audio; the corpus is synthesized from doc ids with
    * arithmetic the SQL oracle replays exactly): n = 30 + id % 70,
    * sample(i) = ((id+7)*6007 + i*31627) mod 65521 - 32760. A small
    * block size (64) makes multi-frame streams the common case. */
  def synthFlac(df: DataFrame, idCol: String, sampleRate: Int = 8000,
                blockSize: Int = 64): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType),
      StructField("media", BinaryType)))
    val idIdx = df.schema.fieldIndex(idCol)
    val rdd = df.rdd.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(idIdx)
        val n = (30 + (id % 70)).toInt
        val samples = Array.tabulate(n) { i =>
          (((id + 7) * 6007L + i * 31627L) % 65521L - 32760L).toShort
        }
        Row(id, encodeFlac(samples, sampleRate, blockSize))
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Full decode + exact integer sample stats per asset; null media →
    * null stats, malformed media throws ([[decodeFlac]]'s contract). */
  def decodeFlacStatsDf(df: DataFrame, idCol: String, mediaCol: String)
      : DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType),
      StructField("sample_rate", IntegerType),
      StructField("channels", IntegerType),
      StructField("bits", IntegerType),
      StructField("n_samples", LongType),
      StructField("n_frames", IntegerType),
      StructField("sum_abs", LongType),
      StructField("peak", LongType)))
    val idIdx = df.schema.fieldIndex(idCol)
    val mIdx = df.schema.fieldIndex(mediaCol)
    val rdd = df.rdd.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](mIdx)
        if (bytes == null)
          Row(r.getLong(idIdx), null, null, null, null, null, null, null)
        else {
          val (_, st) = decodeFlac(bytes)
          Row(r.getLong(idIdx), st.sampleRate, st.channels, st.bits,
            st.nSamples, st.nFrames, st.sumAbs, st.peak)
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }
}
