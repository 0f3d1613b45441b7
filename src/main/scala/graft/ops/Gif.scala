package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Real GIF89a codec, JDK-only: 256-entry global color table, LZW with
  * variable-width codes (9→12 bits, clear-code dictionary reset at
  * 4096), LSB-first bit packing in ≤255-byte sub-blocks, optional
  * 4-pass row interlacing, and a planted comment extension so a
  * "decoder" that assumes header+image back-to-back fails (the WAV
  * LIST-chunk discipline). Complements BMP (raw), PNG (DEFLATE +
  * filters) and JPEG (lossy DCT) with the remaining mainstream image
  * family: palette-indexed LZW.
  *
  * GIF is LOSSLESS over palette indices, so unlike JPEG no spectral
  * argument is needed: decode(encode(px)) is bit-exact and the oracle
  * replays the palette arithmetic directly.
  *
  * The encoder/decoder width handshake (the classic LZW off-by-one):
  * the encoder bumps its code width after an add when
  * nextCode == 2^w + 1, the decoder when nextCode == 2^w — the
  * decoder's dictionary trails the encoder's by exactly one entry at
  * equal stream position, so both switch widths between the same two
  * codes. `MultimodalSpec` pins the handshake with round-trips that
  * cross the 512/1024/2048/4096 boundaries AND a differential against
  * the JDK's own ImageIO GIF reader.
  */
object Gif {

  /** Palette entry i → (r, g, b): linear-congruential channel spreads,
    * shared with the SQL oracle (see q422). */
  def paletteR(i: Int): Int = i
  def paletteG(i: Int): Int = (i * 7 + 3) % 256
  def paletteB(i: Int): Int = (i * 13 + 5) % 256

  // ---- LZW ------------------------------------------------------------

  private final class BitWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var acc = 0L
    private var nBits = 0
    def put(code: Int, width: Int): Unit = {
      acc |= code.toLong << nBits
      nBits += width
      while (nBits >= 8) {
        out.write((acc & 0xff).toInt)
        acc >>>= 8
        nBits -= 8
      }
    }
    def finish(): Array[Byte] = {
      if (nBits > 0) { out.write((acc & 0xff).toInt); acc = 0; nBits = 0 }
      out.toByteArray
    }
  }

  /** LZW-compress a 256-color index stream (minCodeSize 8). */
  private def lzwEncode(indices: Array[Int]): Array[Byte] = {
    val clear = 256
    val eoi = 257
    val bw = new BitWriter
    var dict = new java.util.HashMap[Long, Integer]()
    var nextCode = 258
    var cw = 9
    def reset(): Unit = { dict = new java.util.HashMap(); nextCode = 258; cw = 9 }
    bw.put(clear, cw)
    if (indices.nonEmpty) {
      var cur = indices(0)
      var i = 1
      while (i < indices.length) {
        val k = indices(i)
        val key = cur.toLong << 9 | k
        val hit = dict.get(key)
        if (hit != null) cur = hit.intValue
        else {
          bw.put(cur, cw)
          dict.put(key, nextCode)
          nextCode += 1
          if (nextCode == (1 << cw) + 1 && cw < 12) cw += 1
          if (nextCode == 4096) { bw.put(clear, cw); reset() }
          cur = k
        }
        i += 1
      }
      bw.put(cur, cw)
    }
    bw.put(eoi, cw)
    bw.finish()
  }

  private final class BitReader(data: Array[Byte]) {
    private var acc = 0L
    private var nBits = 0
    private var pos = 0
    def get(width: Int): Int = {
      while (nBits < width) {
        require(pos < data.length, "GIF: LZW stream truncated")
        acc |= (data(pos) & 0xffL) << nBits
        pos += 1
        nBits += 8
      }
      val v = (acc & ((1L << width) - 1)).toInt
      acc >>>= width
      nBits -= width
      v
    }
  }

  /** LZW-decompress to exactly `n` indices. */
  private def lzwDecode(data: Array[Byte], n: Int): Array[Int] = {
    val clear = 256
    val eoi = 257
    val br = new BitReader(data)
    val out = new Array[Int](n)
    var outPos = 0
    // dictionary as (prefix code, appended index): entry c < 256 is the
    // literal c; walking prefixes reconstructs strings without storing
    // them (bounded memory, the giflib representation)
    val prefix = new Array[Int](4096)
    val append = new Array[Int](4096)
    var nextCode = 258
    var cw = 9
    def emit(code: Int): Int = { // writes the string of `code`, returns its head
      var stack = List.empty[Int]
      var c = code
      while (c >= 258) { stack = append(c) :: stack; c = prefix(c) }
      stack = c :: stack
      val head = c
      stack.foreach { v =>
        require(outPos < n, "GIF: more pixels than the image declares")
        out(outPos) = v; outPos += 1
      }
      head
    }
    var prev = -1
    var done = false
    while (!done) {
      val code = br.get(cw)
      if (code == clear) { nextCode = 258; cw = 9; prev = -1 }
      else if (code == eoi) done = true
      else if (prev == -1) { // first code after a clear: a literal
        require(code < 256, s"GIF: first code after clear is $code")
        emit(code)
        prev = code
      } else {
        require(code <= nextCode && code != 257,
          s"GIF: code $code out of range (next $nextCode)")
        val head =
          if (code < nextCode) emit(code)
          else { // KwKwK: prev's string followed by its own head
            val h = emit(prev)
            require(outPos < n, "GIF: more pixels than the image declares")
            out(outPos) = h; outPos += 1
            h
          }
        if (nextCode < 4096) {
          prefix(nextCode) = prev
          append(nextCode) = head
          nextCode += 1
          if (nextCode == (1 << cw) && cw < 12) cw += 1
        }
        prev = code
      }
      if (outPos == n && !done) {
        // spec requires EOI next; tolerate its absence but never
        // over-read past the declared pixel count
        done = true
      }
    }
    require(outPos == n, s"GIF: decoded $outPos of $n pixels")
    out
  }

  // ---- Container ------------------------------------------------------

  /** Interlace pass geometry: (first row, step) in pass order. */
  private val interlacePasses = Seq((0, 8), (4, 8), (2, 4), (1, 2))

  /** Row order in which an interlaced image's rows appear in the
    * stream. */
  private def interlacedRows(h: Int): Seq[Int] =
    interlacePasses.flatMap { case (start, step) => start until h by step }

  /** Encode a 256-color indexed image as GIF89a with the global
    * palette ([[paletteR]]/G/B), a comment extension, and optional
    * interlacing. `index(x, y)` must return 0..255. */
  def encodeGif(width: Int, height: Int, index: (Int, Int) => Int,
                interlaced: Boolean = false): Array[Byte] = {
    require(width > 0 && height > 0, "empty image")
    // Logical-screen / image-descriptor dimensions are 16-bit
    // little-endian fields; larger values would truncate silently.
    require(width <= 65535 && height <= 65535,
      s"GIF dimensions exceed 16-bit descriptor fields: ${width}x$height")
    val out = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    out.write("GIF89a".getBytes("US-ASCII"))
    w16(width); w16(height)
    out.write(0xf7) // global color table, 8 bpp, 256 entries
    out.write(0)    // background index
    out.write(0)    // no aspect ratio
    (0 until 256).foreach { i =>
      out.write(paletteR(i)); out.write(paletteG(i)); out.write(paletteB(i))
    }
    // comment extension — forces decoders to walk blocks, not assume
    // header+image adjacency
    out.write(0x21); out.write(0xfe)
    val note = "graft".getBytes("US-ASCII")
    out.write(note.length); out.write(note); out.write(0)
    // image descriptor
    out.write(0x2c)
    w16(0); w16(0); w16(width); w16(height)
    out.write(if (interlaced) 0x40 else 0x00) // no local table
    // pixel stream in (possibly interlaced) row order
    val rows = if (interlaced) interlacedRows(height) else 0 until height
    val indices = new Array[Int](width * height)
    var p = 0
    rows.foreach { y =>
      var x = 0
      while (x < width) {
        val v = index(x, y)
        require(v >= 0 && v <= 255, s"palette index $v out of range")
        indices(p) = v; p += 1; x += 1
      }
    }
    out.write(8) // LZW min code size
    val lzw = lzwEncode(indices)
    var off = 0
    while (off < lzw.length) {
      val n = math.min(255, lzw.length - off)
      out.write(n); out.write(lzw, off, n); off += n
    }
    out.write(0)    // block terminator
    out.write(0x3b) // trailer
    out.toByteArray
  }

  /** Decoded summary of one GIF (the PNG/BMP stats schema). */
  final case class GifStats(width: Int, height: Int, sumR: Long,
                            sumG: Long, sumB: Long, firstPx: Long)

  /** Decode a GIF87a/89a blob: header + screen descriptor + global
    * palette, block walk (extensions skipped by their sub-block
    * structure), first image descriptor (local palette + interlace
    * honored), full LZW decode, de-interlace. Returns (width, height,
    * palette-resolved pixels row-major). Throws on malformed input. */
  def decodeGifRgb(bytes: Array[Byte]): (Int, Int, Array[(Int, Int, Int)]) = {
    require(bytes.length >= 13, "GIF: truncated header")
    val sig = new String(bytes, 0, 6, "US-ASCII")
    require(sig == "GIF87a" || sig == "GIF89a", s"GIF: bad signature $sig")
    def u16(o: Int) = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)
    var pos = 6
    pos += 4 // logical screen w/h (frames carry their own)
    val flags = bytes(pos) & 0xff; pos += 3
    val globalPal: Array[(Int, Int, Int)] =
      if ((flags & 0x80) != 0) {
        val n = 2 << (flags & 7)
        val p = Array.tabulate(n)(i => (
          bytes(pos + 3 * i) & 0xff, bytes(pos + 3 * i + 1) & 0xff,
          bytes(pos + 3 * i + 2) & 0xff))
        pos += 3 * n
        p
      } else Array.empty
    while (true) {
      require(pos < bytes.length, "GIF: missing trailer")
      (bytes(pos) & 0xff) match {
        case 0x21 => // extension: label + sub-blocks
          pos += 2
          require(pos < bytes.length, "GIF: truncated extension block")
          var n = bytes(pos) & 0xff
          while (n != 0) {
            pos += 1 + n
            require(pos < bytes.length, "GIF: truncated extension sub-block")
            n = bytes(pos) & 0xff
          }
          pos += 1
        case 0x2c =>
          val w = u16(pos + 5); val h = u16(pos + 7)
          val iflags = bytes(pos + 9) & 0xff
          pos += 10
          val pal =
            if ((iflags & 0x80) != 0) {
              val n = 2 << (iflags & 7)
              val p = Array.tabulate(n)(i => (
                bytes(pos + 3 * i) & 0xff, bytes(pos + 3 * i + 1) & 0xff,
                bytes(pos + 3 * i + 2) & 0xff))
              pos += 3 * n
              p
            } else globalPal
          require(pal.nonEmpty, "GIF: no color table")
          require(pos < bytes.length, "GIF: truncated before LZW data")
          val minCode = bytes(pos) & 0xff; pos += 1
          require(minCode == 8, s"GIF: unsupported min code size $minCode")
          val lzw = new java.io.ByteArrayOutputStream()
          require(pos < bytes.length, "GIF: truncated image data")
          var n = bytes(pos) & 0xff
          while (n != 0) {
            require(pos + 1 + n <= bytes.length, "GIF: truncated image sub-block")
            lzw.write(bytes, pos + 1, n); pos += 1 + n
            require(pos < bytes.length, "GIF: truncated image sub-block chain")
            n = bytes(pos) & 0xff
          }
          val idx = lzwDecode(lzw.toByteArray, w * h)
          val rows = if ((iflags & 0x40) != 0) interlacedRows(h)
                     else 0 until h
          val px = new Array[(Int, Int, Int)](w * h)
          var p = 0
          rows.foreach { y =>
            var x = 0
            while (x < w) {
              val i = idx(p)
              require(i < pal.length, s"GIF: index $i beyond palette")
              px(y * w + x) = pal(i)
              p += 1; x += 1
            }
          }
          return (w, h, px)
        case 0x3b =>
          throw new IllegalArgumentException("GIF: trailer before image")
        case b =>
          throw new IllegalArgumentException(f"GIF: unknown block 0x$b%02x")
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Decode to exact integer stats (the PNG/BMP surface). */
  def decodeGif(bytes: Array[Byte]): GifStats = {
    val (w, h, px) = decodeGifRgb(bytes)
    var sr = 0L; var sg = 0L; var sb = 0L
    px.foreach { case (r, g, b) => sr += r; sg += g; sb += b }
    val (r0, g0, b0) = px(0)
    GifStats(w, h, sr, sg, sb, r0.toLong * 65536 + g0 * 256 + b0)
  }

  /** Partition-batch GIF decode over a binary column (the BMP/PNG
    * stats schema, so downstream feature passes stay format-agnostic). */
  def decodeGifStatsDf(df: DataFrame, idCol: String, mediaCol: String)
      : DataFrame =
    Multimodal.imageStatsDf(df, idCol, mediaCol) { bytes =>
      val st = decodeGif(bytes)
      (st.width, st.height, st.sumR, st.sumG, st.sumB, st.firstPx)
    }

  /** Deterministic per-id GIF synthesis: palette INDEX arithmetic the
    * SQL oracle replays through the palette formulas; every third
    * image interlaced so both row orders are exercised (decode output
    * is identical — that is the pin). */
  def synthGif(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType),
      StructField("media", BinaryType)))
    val idIdx = df.schema.fieldIndex(idCol)
    val rdd = df.rdd.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(idIdx)
        val w = (7 + id % 12).toInt
        val h = (5 + id % 9).toInt
        val bytes = encodeGif(w, h,
          (x, y) => ((id * 3 + x * 7 + y * 11) % 256).toInt,
          interlaced = id % 3 == 0)
        Row(id, bytes)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }
}
