package org.apache.spark.sql.graftbridge

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetWriter
import org.apache.parquet.hadoop.api.WriteSupport
import org.apache.parquet.hadoop.metadata.CompressionCodecName
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{CatalystTypeConverters, InternalRow}
import org.apache.spark.sql.execution.datasources.parquet.ParquetWriteSupport
import org.apache.spark.sql.types.StructType

/** Driver-side single-file parquet writer for METADATA-scale frames.
  *
  * The sharded-table commit used to write its ~O(leaves)-row manifest
  * with `df.coalesce(1).write.parquet(...)` — a full Spark job (task
  * scheduling + the Hadoop commit protocol's temporary-dir renames)
  * per table commit, purely to serialize a few KB the driver already
  * holds collected. Iceberg writes its manifests driver-side for the
  * same reason. This writes the rows through Spark's OWN
  * [[ParquetWriteSupport]] (so types, logical annotations and footer
  * schema metadata are byte-compatible with what an executor task
  * writes — `spark.read.parquet` round-trips identically), just
  * without a job. Lives in the sql package hierarchy because the
  * write support and `sessionState` are `private[sql]`.
  */
object LocalParquetBridge {

  private final class Builder(path: Path)
    extends ParquetWriter.Builder[InternalRow, Builder](path) {
    override def getWriteSupport(c: Configuration)
        : WriteSupport[InternalRow] = new ParquetWriteSupport
    override def self(): Builder = this
  }

  /** Write `rows` as one parquet file inside `dir` (created if
    * absent), returning nothing. No Spark job. The session's SQL conf
    * rides in via `newHadoopConf()`, so parquet write settings
    * (legacy format, timestamp type, field ids) resolve exactly as a
    * distributed write would. */
  def writeSingleFile(spark: SparkSession, dir: String,
                      schema: StructType, rows: Seq[Row]): Unit = {
    val sessionState = spark
      .asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState
    // run Spark's OWN write-side parquet configuration (sets the row
    // schema, legacy-format/timestamp-type/field-id/rebase keys the
    // write support asserts on — exactly what a distributed write's
    // prepareWrite does), then borrow the configured conf
    val job = org.apache.hadoop.mapreduce.Job
      .getInstance(sessionState.newHadoopConf())
    org.apache.spark.sql.execution.datasources.parquet.ParquetUtils
      .prepareWrite(sessionState.conf, job, schema,
        new org.apache.spark.sql.execution.datasources.parquet
          .ParquetOptions(Map.empty[String, String], sessionState.conf))
    val hconf = job.getConfiguration
    val dirPath = new Path(dir)
    val fs = dirPath.getFileSystem(hconf)
    if (!fs.exists(dirPath)) fs.mkdirs(dirPath)
    val file = new Path(dirPath,
      s"part-00000-${java.util.UUID.randomUUID()}.snappy.parquet")
    val w = new Builder(file)
      .withConf(hconf)
      .withCompressionCodec(CompressionCodecName.SNAPPY)
      .build()
    val conv = CatalystTypeConverters.createToCatalystConverter(schema)
    try rows.foreach(r => w.write(conv(r).asInstanceOf[InternalRow]))
    finally w.close()
  }
}
