package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed in partition-sized batches.
  *
  * The actual codecs (JPEG decode, audio resample, video frame extract)
  * are NOT available in this container — the decode kernels below are
  * clearly-marked deterministic STUBS. Everything around them — schema,
  * batch shape, partitioning, the expression-level fast paths, and the
  * mapPartitions seam a real codec plugs into — is real and tested.
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
    * ??? in spirit — replace with a real codec. */
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
        val st = decodeWavPcm16(r.getAs[Array[Byte]](mIdx))
        Row(r.getLong(idIdx), st.sampleRate, st.channels, st.bits,
            st.nSamples, st.sumAbs, st.peak)
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
}
