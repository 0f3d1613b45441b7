package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Real baseline JPEG codec (ITU-T T.81 sequential DCT, 8-bit,
  * grayscale and YCbCr color at 4:4:4 OR 4:2:0 chroma subsampling —
  * the camera/phone layout — plus restart markers), JDK-only: marker
  * segments, quantization, zigzag, DC prediction, canonical Huffman
  * entropy coding with byte stuffing, and the 2-D DCT — no external
  * library. This closes the "JPEG is a stub seam" gap for the
  * baseline process; progressive scans stay out of scope (the
  * multi-scan IDCT state machine buys no new Spark-side structure).
  *
  * Oracle strategy for a LOSSY codec: an image whose every aligned
  * 8x8 block is CONSTANT has a DC-only spectrum (F00 = 8*(v-128),
  * all AC zero); with a flat quantization table the quantized DC is
  * exact, the IDCT of a DC-only block is F00/8 (scaling by powers of
  * two — exact in IEEE doubles), and edge-replication padding keeps
  * partial border blocks constant. So block-mosaic inputs round-trip
  * BIT-EXACTLY through the full real pipeline (FDCT, quantize,
  * zigzag, DC diff, Huffman, stuffing, restarts, parse, Huffman
  * decode, dequantize, IDCT, clamp) and a SQL oracle can replay the
  * decoded stats arithmetically — the same q248/q415 pattern, on a
  * codec where a naive "replay the pixels" oracle is impossible. The
  * COLOR pipeline keeps the property by doing RGB↔YCbCr in integer
  * FIXED-POINT (floor(x·10^6 + half) arithmetic) so the oracle can
  * replay the conversion too. Non-mosaic images exercise the AC
  * paths under a tolerance spec ([[graft.MultimodalSpec]]).
  */
object Jpeg {

  // zigzag scan order: index -> (row, col) flattened as r*8+c
  private val zigzag: Array[Int] = {
    val order = new Array[Int](64)
    var r = 0; var c = 0
    var i = 0
    var up = true
    while (i < 64) {
      order(i) = r * 8 + c
      if (up) {
        if (c == 7) { r += 1; up = false }
        else if (r == 0) { c += 1; up = false }
        else { r -= 1; c += 1 }
      } else {
        if (r == 7) { c += 1; up = true }
        else if (c == 0) { r += 1; up = true }
        else { r += 1; c -= 1 }
      }
      i += 1
    }
    order
  }

  // Standard luminance Huffman tables (ITU-T T.81 Annex K.3): BITS
  // (number of codes per length 1..16) and HUFFVAL (symbols in code
  // order). Canonical codes derive from these. One table pair serves
  // every component (spec-legal; chroma-specific tables only change
  // compression ratio, not correctness).
  private val dcBits =
    Array(0, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val dcVals = Array(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11)
  private val acBits =
    Array(0, 0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  private val acVals = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xa1, 0x08, 0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4a, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5a, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8a, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5,
    0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6, 0xb7,
    0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
    0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2,
    0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa)

  /** Canonical Huffman codes from (BITS, HUFFVAL): symbol ->
    * (code, length). */
  private def buildEncodeTable(bits: Array[Int], vals: Array[Int])
      : Map[Int, (Int, Int)] = {
    var code = 0
    var k = 0
    val out = Map.newBuilder[Int, (Int, Int)]
    for (len <- 1 to 16) {
      var i = 0
      while (i < bits(len)) {
        out += vals(k) -> ((code, len))
        code += 1; k += 1; i += 1
      }
      code <<= 1
    }
    out.result()
  }

  private lazy val dcEnc = buildEncodeTable(dcBits, dcVals)
  private lazy val acEnc = buildEncodeTable(acBits, acVals)

  /** MSB-first bit writer with JPEG 0xFF byte stuffing. */
  private final class BitWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var acc = 0
    private var nBits = 0
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((code >>> i) & 1)
        nBits += 1
        if (nBits == 8) {
          out.write(acc & 0xff)
          if ((acc & 0xff) == 0xff) out.write(0x00) // byte stuffing
          acc = 0; nBits = 0
        }
        i -= 1
      }
    }
    /** Pad to a byte boundary with 1-bits and emit a raw (unstuffed)
      * restart marker — the between-MCU resync point. */
    def restartMarker(n: Int): Unit = {
      if (nBits > 0) put(0xff, 8 - nBits)
      out.write(0xff); out.write(0xd0 + (n & 7))
    }
    /** Pad the final partial byte with 1-bits (spec convention). */
    def finish(): Array[Byte] = {
      if (nBits > 0) put(0xff, 8 - nBits)
      out.toByteArray
    }
  }

  /** Magnitude category + offset coding of a coefficient value
    * (T.81 F.1.2.1): returns (category, category-bit pattern). */
  private def magnitude(v: Int): (Int, Int) = {
    if (v == 0) return (0, 0)
    val a = math.abs(v)
    var cat = 0
    while ((a >> cat) != 0) cat += 1
    val bitsVal = if (v > 0) v else v + (1 << cat) - 1
    (cat, bitsVal)
  }

  // cosTab(x)(u) = cos((2x+1)·u·π/16); cosTab(_)(0) = 1.0 exactly, so
  // the DC-only exactness argument (object doc) is unchanged by the
  // separable formulation below
  private val cosTab: Array[Array[Double]] =
    Array.tabulate(8, 8)((x, u) => math.cos((2 * x + 1) * u * math.Pi / 16))
  private val invSqrt2 = 1.0 / math.sqrt(2)

  /** Separable 2-D forward DCT: a row pass then a column pass over
    * precomputed cosines — 16·8 multiplies per output vs the direct
    * form's 64 `math.cos` calls per term (the difference between a
    * codec and a benchmark hazard). */
  private def fdct(block: Array[Double]): Array[Double] = {
    val tmp = new Array[Double](64) // tmp(x*8+v) = Σ_y f(x,y)·cos(y,v)
    var x = 0
    while (x < 8) {
      var v = 0
      while (v < 8) {
        var s = 0.0
        var y = 0
        while (y < 8) { s += block(x * 8 + y) * cosTab(y)(v); y += 1 }
        tmp(x * 8 + v) = s
        v += 1
      }
      x += 1
    }
    val out = new Array[Double](64)
    var u = 0
    while (u < 8) {
      val cu = if (u == 0) invSqrt2 else 1.0
      var v = 0
      while (v < 8) {
        var s = 0.0
        var x2 = 0
        while (x2 < 8) { s += tmp(x2 * 8 + v) * cosTab(x2)(u); x2 += 1 }
        val cv = if (v == 0) invSqrt2 else 1.0
        out(u * 8 + v) = 0.25 * cu * cv * s
        v += 1
      }
      u += 1
    }
    out
  }

  /** Separable 2-D inverse DCT (same table, same constants). */
  private def idct(coef: Array[Double]): Array[Double] = {
    val tmp = new Array[Double](64) // tmp(u*8+y) = Σ_v C(v)·F(u,v)·cos(y,v)
    var u = 0
    while (u < 8) {
      var y = 0
      while (y < 8) {
        var s = 0.0
        var v = 0
        while (v < 8) {
          val cv = if (v == 0) invSqrt2 else 1.0
          s += cv * coef(u * 8 + v) * cosTab(y)(v)
          v += 1
        }
        tmp(u * 8 + y) = s
        y += 1
      }
      u += 1
    }
    val out = new Array[Double](64)
    var x = 0
    while (x < 8) {
      var y = 0
      while (y < 8) {
        var s = 0.0
        var u2 = 0
        while (u2 < 8) {
          val cu = if (u2 == 0) invSqrt2 else 1.0
          s += cu * tmp(u2 * 8 + y) * cosTab(x)(u2)
          u2 += 1
        }
        out(x * 8 + y) = 0.25 * s
        y += 1
      }
      x += 1
    }
    out
  }

  /** A flat (all-ones) quantization table — legal per the spec, and
    * the choice that makes DC-only blocks round-trip exactly. */
  val flatQuant: Array[Int] = Array.fill(64)(1)

  /** The Annex K.1 luminance table, for realistic lossy encodes in
    * tolerance tests. */
  val stdQuant: Array[Int] = Array(
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99)

  /** Fixed-point RGB → YCbCr (JFIF/BT.601 coefficients ×10^6,
    * round-half-up via floorDiv) — integer in, integer out, so a SQL
    * oracle replays it exactly. */
  def rgbToYcc(r: Int, g: Int, b: Int): (Int, Int, Int) = {
    def fx(v: Long): Int = {
      val x = Math.floorDiv(v + 500000L, 1000000L).toInt
      math.max(0, math.min(255, x))
    }
    (fx(299000L * r + 587000L * g + 114000L * b),
     fx(-168736L * r - 331264L * g + 500000L * b + 128000000L),
     fx(500000L * r - 418688L * g - 81312L * b + 128000000L))
  }

  /** Fixed-point YCbCr → RGB inverse (coefficients ×10^6,
    * round-half-up, clamped). */
  def yccToRgb(y: Int, cb: Int, cr: Int): (Int, Int, Int) = {
    def fx(v: Long): Int = {
      val x = Math.floorDiv(v + 500000L, 1000000L).toInt
      math.max(0, math.min(255, x))
    }
    (fx(1000000L * y + 1402000L * (cr - 128)),
     fx(1000000L * y - 344136L * (cb - 128) - 714136L * (cr - 128)),
     fx(1000000L * y + 1772000L * (cb - 128)))
  }

  /** Shared entropy-encode of one or three component planes, each
    * given in ITS OWN resolution (accessor in component coordinates +
    * sampling factors (hi, vi)), MCU-interleaved, with optional
    * restart markers every `restartInterval` MCUs. 4:4:4 is all-1x1;
    * 4:2:0 is Y at 2x2 with chroma at 1x1 (four Y blocks then one Cb
    * and one Cr per MCU). */
  private def encodePlanes(width: Int, height: Int,
                           planes: Array[(Int, Int) => Int],
                           sampling: Array[(Int, Int)],
                           quant: Array[Int],
                           restartInterval: Int): Array[Byte] = {
    require(width > 0 && height > 0, "empty image")
    // SOF0 stores dimensions in 16-bit big-endian fields; anything
    // larger would silently truncate the header into a corrupt stream.
    require(width <= 65535 && height <= 65535,
      s"JPEG dimensions exceed 16-bit SOF fields: ${width}x$height")
    require(quant.length == 64 && quant.forall(q => q >= 1 && q <= 255),
      "quant table must be 64 entries in 1..255")
    require(restartInterval >= 0, "negative restart interval")
    val nComp = planes.length
    require(sampling.length == nComp, "one (hi, vi) per component")
    val maxH = sampling.map(_._1).max
    val maxV = sampling.map(_._2).max
    val out = new java.io.ByteArrayOutputStream()
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
    def seg(m: Int, body: Array[Int]): Unit = {
      marker(m)
      val len = body.length + 2
      out.write(len >> 8); out.write(len & 0xff)
      body.foreach(b => out.write(b & 0xff))
    }
    marker(0xd8) // SOI
    seg(0xe0, Array('J', 'F', 'I', 'F', 0, 1, 1, 0, 0, 1, 0, 1, 0, 0))
    seg(0xdb, 0 +: zigzag.map(quant)) // DQT table 0, zigzag order
    val sofComps = (0 until nComp).flatMap(c =>
      Seq(c + 1, (sampling(c)._1 << 4) | sampling(c)._2, 0)).toArray
    seg(0xc0, Array(8, height >> 8, height & 0xff, width >> 8,
      width & 0xff, nComp) ++ sofComps)
    seg(0xc4, (0 +: dcBits.drop(1)) ++ dcVals)          // DHT DC 0
    seg(0xc4, (0x10 +: acBits.drop(1)) ++ acVals)       // DHT AC 0
    if (restartInterval > 0)
      seg(0xdd, Array(restartInterval >> 8, restartInterval & 0xff))
    val sosComps = (1 to nComp).flatMap(c => Seq(c, 0x00)).toArray
    seg(0xda, Array(nComp) ++ sosComps ++ Array(0, 63, 0))
    val bw = new BitWriter
    // per-component plane dims (T.81 A.1.1)
    val compW = sampling.map { case (hi, _) =>
      (width * hi + maxH - 1) / maxH }
    val compH = sampling.map { case (_, vi) =>
      (height * vi + maxV - 1) / maxV }
    val mcusX = (width + 8 * maxH - 1) / (8 * maxH)
    val mcusY = (height + 8 * maxV - 1) / (8 * maxV)
    val prevDc = new Array[Int](nComp)
    var mcu = 0
    var rstN = 0
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          bw.restartMarker(rstN)
          rstN = (rstN + 1) & 7
          java.util.Arrays.fill(prevDc, 0)
        }
        var comp = 0
        while (comp < nComp) {
          val (hi, vi) = sampling(comp)
          val px = planes(comp)
          var v = 0
          while (v < vi) {
            var h = 0
            while (h < hi) {
              val block = new Array[Double](64)
              var r = 0
              while (r < 8) {
                var c = 0
                while (c < 8) {
                  // edge replication (component space) for partial
                  // border blocks
                  val sx = math.min((mx * hi + h) * 8 + c, compW(comp) - 1)
                  val sy = math.min((my * vi + v) * 8 + r, compH(comp) - 1)
                  block(r * 8 + c) = (px(sx, sy) & 0xff) - 128.0
                  c += 1
                }
                r += 1
              }
              val coef = fdct(block)
              val q = new Array[Int](64)
              var i = 0
              while (i < 64) {
                q(i) = math.round(coef(zigzag(i)) / quant(zigzag(i))).toInt
                i += 1
              }
              val (dcCat, dcBitsVal) = magnitude(q(0) - prevDc(comp))
              prevDc(comp) = q(0)
              val (dcCode, dcLen) = dcEnc(dcCat)
              bw.put(dcCode, dcLen)
              if (dcCat > 0) bw.put(dcBitsVal, dcCat)
              var k = 1
              var run = 0
              while (k < 64) {
                if (q(k) == 0) run += 1
                else {
                  while (run > 15) {
                    val (zc, zl) = acEnc(0xf0); bw.put(zc, zl); run -= 16
                  }
                  val (cat, bitsVal) = magnitude(q(k))
                  val (c2, l2) = acEnc((run << 4) | cat)
                  bw.put(c2, l2); bw.put(bitsVal, cat)
                  run = 0
                }
                k += 1
              }
              if (run > 0) { val (ec, el) = acEnc(0x00); bw.put(ec, el) }
              h += 1
            }
            v += 1
          }
          comp += 1
        }
        mcu += 1
        mx += 1
      }
      my += 1
    }
    out.write(bw.finish())
    marker(0xd9) // EOI
    out.toByteArray
  }

  /** Encode an 8-bit grayscale image ((x, y) → luma 0..255, origin
    * top-left) as a baseline sequential JPEG. Border blocks pad by
    * edge replication (keeps mosaic blocks constant — the exactness
    * lever). */
  def encodeJpeg(width: Int, height: Int, px: (Int, Int) => Int,
                 quant: Array[Int] = flatQuant,
                 restartInterval: Int = 0): Array[Byte] =
    encodePlanes(width, height, Array(px), Array((1, 1)), quant,
      restartInterval)

  /** Encode an RGB image as a baseline sequential YCbCr color JPEG
    * (fixed-point color conversion — see [[rgbToYcc]]): 4:4:4 by
    * default, or 4:2:0 (Y full-resolution, chroma nearest-neighbor
    * subsampled 2x2 — the camera/phone layout) with
    * `subsample420 = true`. */
  def encodeJpegColor(width: Int, height: Int,
                      px: (Int, Int) => (Int, Int, Int),
                      quant: Array[Int] = flatQuant,
                      restartInterval: Int = 0,
                      subsample420: Boolean = false): Array[Byte] = {
    // materialize the conversion once per pixel (a closure per
    // component would run rgbToYcc three times per access)
    val yP = new Array[Int](width * height)
    val cbP = new Array[Int](width * height)
    val crP = new Array[Int](width * height)
    var yy = 0
    while (yy < height) {
      var x = 0
      while (x < width) {
        val (r, g, b) = px(x, yy)
        val (py, pcb, pcr) = rgbToYcc(r, g, b)
        yP(yy * width + x) = py
        cbP(yy * width + x) = pcb
        crP(yy * width + x) = pcr
        x += 1
      }
      yy += 1
    }
    if (!subsample420) {
      val planes: Array[(Int, Int) => Int] = Array(
        (x, y) => yP(y * width + x),
        (x, y) => cbP(y * width + x),
        (x, y) => crP(y * width + x))
      encodePlanes(width, height, planes,
        Array((1, 1), (1, 1), (1, 1)), quant, restartInterval)
    } else {
      // chroma planes at half resolution, nearest-neighbor (top-left
      // of each 2x2) — the decoder replicates back, so chroma constant
      // over each 2x2 round-trips exactly
      val planes: Array[(Int, Int) => Int] = Array(
        (x, y) => yP(y * width + x),
        (x, y) => cbP(math.min(2 * y, height - 1) * width +
                      math.min(2 * x, width - 1)),
        (x, y) => crP(math.min(2 * y, height - 1) * width +
                      math.min(2 * x, width - 1)))
      encodePlanes(width, height, planes,
        Array((2, 2), (1, 1), (1, 1)), quant, restartInterval)
    }
  }

  /** Decoded summary of one grayscale JPEG: dims, exact luma sum, and
    * the top-left pixel probe. */
  final case class JpegStats(width: Int, height: Int, sumY: Long,
                             firstPx: Long)

  /** Decoded summary of one color JPEG after the fixed-point
    * YCbCr → RGB inverse (the PNG/BMP stats discipline). */
  final case class JpegColorStats(width: Int, height: Int,
                                  sumR: Long, sumG: Long, sumB: Long,
                                  firstPx: Long)

  /** Canonical Huffman decode table. */
  private final class HuffTable(bits: Array[Int], vals: Array[Int]) {
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17) // -1 = no codes at this length
    val valPtr = new Array[Int](17)
    locally {
      var code = 0
      var k = 0
      for (len <- 1 to 16) {
        if (bits(len) == 0) { minCode(len) = 0; maxCode(len) = -1 }
        else {
          valPtr(len) = k
          minCode(len) = code
          code += bits(len); k += bits(len)
          maxCode(len) = code - 1
        }
        code <<= 1
      }
    }
    def symbol(len: Int, code: Int): Int =
      vals(valPtr(len) + code - minCode(len))
  }

  /** MSB-first bit reader over the entropy segment with 0xFF00
    * unstuffing; restart markers are consumed ONLY via [[syncRestart]]
    * — one appearing mid-block is corruption and throws. */
  private final class BitReader(bytes: Array[Byte], var pos: Int) {
    private var acc = 0
    private var nBits = 0
    private var hitEoi = false
    def bit(): Int = {
      if (nBits == 0) {
        // The EOI pad byte is served exactly once; a stream still
        // hungry after its 8 bits is corrupt — refusing here keeps the
        // decoder from consuming the 0xD9 marker as entropy data.
        require(!hitEoi, "entropy stream exhausted past EOI pad")
        require(pos < bytes.length, "entropy stream truncated")
        var b = bytes(pos) & 0xff; pos += 1
        if (b == 0xff) {
          require(pos < bytes.length, "entropy stream truncated at FF")
          val nxt = bytes(pos) & 0xff
          if (nxt == 0x00) pos += 1 // stuffed byte
          else if (nxt == 0xd9) {
            // EOI while bits requested: the spec pads the last byte
            // with 1s, so surplus reads of the pad are legal — serve
            // the 0xff byte itself (its bits are pad)
            b = 0xff
            hitEoi = true
          } else throw new IllegalArgumentException(
            f"unexpected marker 0xff$nxt%02x inside entropy data")
        }
        acc = b; nBits = 8
      }
      nBits -= 1
      (acc >> nBits) & 1
    }
    def bits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
    def decode(t: HuffTable): Int = {
      var code = bit()
      var len = 1
      while (len <= 16) {
        if (t.maxCode(len) >= 0 && code <= t.maxCode(len))
          return t.symbol(len, code)
        code = (code << 1) | bit()
        len += 1
      }
      throw new IllegalArgumentException("invalid Huffman code")
    }
    /** Between-MCU restart resync: drop pad bits, consume the expected
      * RSTn marker. */
    def syncRestart(expectedN: Int): Unit = {
      nBits = 0 // discard pad bits of the current byte
      require(pos + 1 < bytes.length, "truncated at restart boundary")
      val m0 = bytes(pos) & 0xff
      val m1 = bytes(pos + 1) & 0xff
      require(m0 == 0xff && m1 == 0xd0 + (expectedN & 7),
        f"expected RST${expectedN & 7} at $pos, found 0x$m0%02x$m1%02x")
      pos += 2
    }
  }

  /** EXTEND (T.81 F.2.2.1): category/offset back to a signed value. */
  private def extend(v: Int, cat: Int): Int =
    if (cat == 0) 0
    else if (v < (1 << (cat - 1))) v - (1 << cat) + 1
    else v

  /** Shared decode core: marker walk (APPn/COM skipped), DQT/DHT/DRI,
    * SOF0 with 1 or 3 components (all 1x1 sampling), SOS, full
    * entropy decode with restart handling, dequantize, dezigzag,
    * IDCT, level shift + clamp. Returns (w, h, per-component planes,
    * row-major w*h). Throws on progressive frames, chroma
    * subsampling, 16-bit quant tables, or corrupt entropy data. */
  private def decodeCore(bytes: Array[Byte])
      : (Int, Int, Array[Array[Int]]) = {
    require(bytes.length > 4 && (bytes(0) & 0xff) == 0xff &&
      (bytes(1) & 0xff) == 0xd8, "not a JPEG stream (no SOI)")
    var pos = 2
    val quantTables = new Array[Array[Int]](4)
    val dcTables = new Array[HuffTable](4)
    val acTables = new Array[HuffTable](4)
    var width = -1; var height = -1
    var nComp = 0
    var compQuant: Array[Int] = null
    var compHi: Array[Int] = null
    var compVi: Array[Int] = null
    var compDc: Array[Int] = null
    var compAc: Array[Int] = null
    var restartInterval = 0
    def u16(o: Int): Int = ((bytes(o) & 0xff) << 8) | (bytes(o + 1) & 0xff)
    var inScan = false
    while (!inScan) {
      require(pos + 4 <= bytes.length, "truncated before SOS")
      require((bytes(pos) & 0xff) == 0xff, f"expected marker at $pos")
      val m = bytes(pos + 1) & 0xff
      val len = u16(pos + 2)
      require(pos + 2 + len <= bytes.length, f"segment 0x$m%02x overruns")
      val body = pos + 4
      m match {
        case 0xdb => // DQT (possibly several tables per segment)
          var o = body
          while (o < pos + 2 + len) {
            val pq = (bytes(o) & 0xff) >> 4
            val tq = bytes(o) & 0x0f
            require(pq == 0, "16-bit quant tables unsupported")
            val t = new Array[Int](64)
            var i = 0
            while (i < 64) { t(zigzag(i)) = bytes(o + 1 + i) & 0xff; i += 1 }
            quantTables(tq) = t
            o += 65
          }
        case 0xc0 => // SOF0 baseline
          require((bytes(body) & 0xff) == 8, "only 8-bit precision")
          height = u16(body + 1); width = u16(body + 3)
          nComp = bytes(body + 5) & 0xff
          require(nComp == 1 || nComp == 3,
            s"only 1- or 3-component frames, got $nComp")
          compQuant = new Array[Int](nComp)
          compHi = new Array[Int](nComp)
          compVi = new Array[Int](nComp)
          var c = 0
          while (c < nComp) {
            val hv = bytes(body + 7 + 3 * c) & 0xff
            compHi(c) = hv >> 4
            compVi(c) = hv & 0x0f
            require(compHi(c) >= 1 && compHi(c) <= 2 &&
                    compVi(c) >= 1 && compVi(c) <= 2,
              s"sampling factors must be 1 or 2, got ${hv.toHexString}")
            compQuant(c) = bytes(body + 8 + 3 * c) & 0xff
            c += 1
          }
          require(width > 0 && height > 0, "degenerate dimensions")
        case 0xc1 | 0xc2 | 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca |
             0xcb | 0xcd | 0xce | 0xcf =>
          throw new IllegalArgumentException(
            f"unsupported SOF marker 0xff$m%02x (not baseline sequential)")
        case 0xc4 => // DHT (possibly several tables)
          var o = body
          while (o < pos + 2 + len) {
            val tc = (bytes(o) & 0xff) >> 4
            val th = bytes(o) & 0x0f
            val tBits = new Array[Int](17)
            var total = 0
            var i = 1
            while (i <= 16) {
              tBits(i) = bytes(o + i) & 0xff; total += tBits(i); i += 1
            }
            val tVals = new Array[Int](total)
            i = 0
            while (i < total) { tVals(i) = bytes(o + 17 + i) & 0xff; i += 1 }
            val t = new HuffTable(tBits, tVals)
            if (tc == 0) dcTables(th) = t else acTables(th) = t
            o += 17 + total
          }
        case 0xdd => // DRI
          restartInterval = u16(body)
        case 0xda => // SOS
          val ns = bytes(body) & 0xff
          require(ns == nComp, s"scan components $ns != frame $nComp")
          compDc = new Array[Int](nComp)
          compAc = new Array[Int](nComp)
          var c = 0
          while (c < nComp) {
            val tbl = bytes(body + 2 + 2 * c) & 0xff
            compDc(c) = tbl >> 4
            compAc(c) = tbl & 0x0f
            c += 1
          }
          require(width > 0, "SOS before SOF")
          c = 0
          while (c < nComp) {
            require(dcTables(compDc(c)) != null && acTables(compAc(c)) != null
              && quantTables(compQuant(c)) != null,
              "SOS references an undefined table")
            c += 1
          }
          inScan = true
        case _ => () // APPn, COM: skip
      }
      pos += 2 + len
    }
    val br = new BitReader(bytes, pos)
    val maxH = compHi.max
    val maxV = compVi.max
    // per-component plane dims (T.81 A.1.1)
    val compW = Array.tabulate(nComp)(c =>
      (width * compHi(c) + maxH - 1) / maxH)
    val compH = Array.tabulate(nComp)(c =>
      (height * compVi(c) + maxV - 1) / maxV)
    val mcusX = (width + 8 * maxH - 1) / (8 * maxH)
    val mcusY = (height + 8 * maxV - 1) / (8 * maxV)
    val compPlanes = Array.tabulate(nComp)(c =>
      new Array[Int](compW(c) * compH(c)))
    val prevDc = new Array[Int](nComp)
    var mcu = 0
    var rstN = 0
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          br.syncRestart(rstN)
          rstN = (rstN + 1) & 7
          java.util.Arrays.fill(prevDc, 0)
        }
        var comp = 0
        while (comp < nComp) {
          val quant = quantTables(compQuant(comp))
          var v = 0
          while (v < compVi(comp)) {
            var h = 0
            while (h < compHi(comp)) {
              val coef = new Array[Double](64)
              val dcCat = br.decode(dcTables(compDc(comp)))
              prevDc(comp) += extend(br.bits(dcCat), dcCat)
              coef(0) = prevDc(comp).toDouble * quant(0)
              var k = 1
              var done = false
              while (k < 64 && !done) {
                val rs = br.decode(acTables(compAc(comp)))
                val run = rs >> 4
                val cat = rs & 0x0f
                if (cat == 0) {
                  if (run == 15) k += 16 // ZRL
                  else done = true       // EOB
                } else {
                  k += run
                  require(k < 64, "AC run overflows the block")
                  coef(zigzag(k)) = extend(br.bits(cat), cat).toDouble *
                    quant(zigzag(k))
                  k += 1
                }
              }
              val pix = idct(coef)
              var r = 0
              while (r < 8) {
                val y = (my * compVi(comp) + v) * 8 + r
                if (y < compH(comp)) {
                  var c = 0
                  while (c < 8) {
                    val x = (mx * compHi(comp) + h) * 8 + c
                    if (x < compW(comp)) {
                      compPlanes(comp)(y * compW(comp) + x) =
                        math.max(0, math.min(255,
                          math.round(pix(r * 8 + c) + 128.0).toInt))
                    }
                    c += 1
                  }
                }
                r += 1
              }
              h += 1
            }
            v += 1
          }
          comp += 1
        }
        mcu += 1
        mx += 1
      }
      my += 1
    }
    // upsample every component to full resolution (nearest neighbor —
    // the standard replication for subsampled chroma; 1x1 components
    // copy through)
    val planes = Array.tabulate(nComp) { c =>
      if (compHi(c) == maxH && compVi(c) == maxV) compPlanes(c)
      else {
        val full = new Array[Int](width * height)
        var y = 0
        while (y < height) {
          val sy = math.min(y * compVi(c) / maxV, compH(c) - 1)
          var x = 0
          while (x < width) {
            val sx = math.min(x * compHi(c) / maxH, compW(c) - 1)
            full(y * width + x) = compPlanes(c)(sy * compW(c) + sx)
            x += 1
          }
          y += 1
        }
        full
      }
    }
    (width, height, planes)
  }

  /** Decode a baseline sequential GRAYSCALE JPEG to its raw plane —
    * (width, height, row-major pixels in 0..255). The full-pixel form
    * [[graft.ops.Mp4.mjpegFrameHashesDf]] feeds to the perceptual
    * hashers; [[decodeJpeg]] is its stats reduction. */
  def decodeJpegPlane(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
    val (w, h, planes) = decodeCore(bytes)
    require(planes.length == 1,
      s"expected grayscale, got ${planes.length} components")
    (w, h, planes(0))
  }

  /** Decode a baseline sequential GRAYSCALE JPEG to exact stats. */
  def decodeJpeg(bytes: Array[Byte]): JpegStats = {
    val (w, h, planes) = decodeCore(bytes)
    require(planes.length == 1,
      s"expected grayscale, got ${planes.length} components")
    val p = planes(0)
    var sumY = 0L
    var i = 0
    while (i < p.length) { sumY += p(i); i += 1 }
    JpegStats(w, h, sumY, p(0).toLong)
  }

  /** Decode a baseline sequential COLOR (YCbCr 4:4:4) JPEG to exact
    * RGB stats via the fixed-point inverse [[yccToRgb]]. */
  def decodeJpegColor(bytes: Array[Byte]): JpegColorStats = {
    val (w, h, planes) = decodeCore(bytes)
    require(planes.length == 3,
      s"expected color, got ${planes.length} component(s)")
    var sumR = 0L; var sumG = 0L; var sumB = 0L
    var firstPx = -1L
    var i = 0
    val n = w * h
    while (i < n) {
      val (r, g, b) = yccToRgb(planes(0)(i), planes(1)(i), planes(2)(i))
      sumR += r; sumG += g; sumB += b
      if (i == 0) firstPx = r * 65536L + g * 256L + b
      i += 1
    }
    JpegColorStats(w, h, sumR, sumG, sumB, firstPx)
  }

  /** Partition-batch grayscale JPEG decode over a binary column. */
  def decodeJpegStatsDf(df: DataFrame, idCol: String, mediaCol: String)
      : DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("sum_y", LongType),
      StructField("first_px", LongType)))
    val idIdx = df.schema.fieldIndex(idCol)
    val mIdx = df.schema.fieldIndex(mediaCol)
    val rdd = df.rdd.mapPartitions { rows =>
      rows.map { r =>
        val b = r.getAs[Array[Byte]](mIdx)
        if (b == null) Row(r.getLong(idIdx), null, null, null, null)
        else {
          val st = decodeJpeg(b)
          Row(r.getLong(idIdx), st.width, st.height, st.sumY, st.firstPx)
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Partition-batch COLOR JPEG decode over a binary column (the
    * PNG/BMP twin's schema). */
  def decodeJpegColorStatsDf(df: DataFrame, idCol: String,
                             mediaCol: String): DataFrame =
    Multimodal.imageStatsDf(df, idCol, mediaCol) { b =>
      val st = decodeJpegColor(b)
      (st.width, st.height, st.sumR, st.sumG, st.sumB, st.firstPx)
    }

  /** Deterministic per-id grayscale MOSAIC synthesis + JPEG encode:
    * luma depends only on the aligned 8x8 CELL (bx, by) — every JPEG
    * block is constant, so the lossy pipeline is exact (see object
    * doc) and the SQL oracle replays the cell arithmetic. */
  def synthJpeg(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType),
      StructField("media", BinaryType)))
    val idIdx = df.schema.fieldIndex(idCol)
    val rdd = df.rdd.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(idIdx)
        val w = (9 + id % 17).toInt
        val h = (6 + id % 11).toInt
        val bytes = encodeJpeg(w, h, (x, y) =>
          ((id * 31 + (x / 8) * 7 + (y / 8) * 13) % 256).toInt)
        Row(id, bytes)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** 4:2:0 COLOR mosaic synthesis: 16x16-aligned cells (so both the
    * full-res Y blocks AND the 2x2-subsampled chroma blocks are
    * constant — the subsampled-exactness condition), encoded with
    * chroma subsampling and a restart interval on every other image.
    * The common camera layout, oracle-exact end to end. */
  def synthJpeg420(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType),
      StructField("media", BinaryType)))
    val idIdx = df.schema.fieldIndex(idCol)
    val rdd = df.rdd.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(idIdx)
        val w = (17 + id % 18).toInt
        val h = (10 + id % 14).toInt
        val bytes = encodeJpegColor(w, h, (x, y) => (
            ((id * 3 + (x / 16) * 7 + (y / 16) * 11) % 256).toInt,
            ((id * 5 + (x / 16) * 13 + (y / 16) * 3) % 256).toInt,
            ((id * 7 + (x / 16) + (y / 16) * 17) % 256).toInt),
          restartInterval = if (id % 2 == 0) 2 else 0,
          subsample420 = true)
        Row(id, bytes)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** COLOR mosaic synthesis: per-cell RGB from id arithmetic, encoded
    * as real YCbCr 4:4:4 JPEGs with a RESTART INTERVAL on every other
    * image — the full color pipeline (fixed-point conversion both
    * ways, three interleaved components, RSTn resync + DC reset) must
    * be exact for the oracle to hash-match. */
  def synthJpegColor(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType),
      StructField("media", BinaryType)))
    val idIdx = df.schema.fieldIndex(idCol)
    val rdd = df.rdd.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(idIdx)
        val w = (9 + id % 17).toInt
        val h = (6 + id % 11).toInt
        val bytes = encodeJpegColor(w, h, (x, y) => (
            ((id * 3 + (x / 8) * 7 + (y / 8) * 11) % 256).toInt,
            ((id * 5 + (x / 8) * 13 + (y / 8) * 3) % 256).toInt,
            ((id * 7 + (x / 8) + (y / 8) * 17) % 256).toInt),
          restartInterval = if (id % 2 == 0) 3 else 0)
        Row(id, bytes)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }
}
