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
}
