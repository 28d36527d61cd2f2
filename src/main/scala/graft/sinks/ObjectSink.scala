package graft.sinks

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.util.LongAccumulator

/** Cloud-object sink — the engine's equivalent of the reference's per-tile
  * upload loop (GCS: /root/reference/src/Program.cs:109-118; S3:
  * /root/reference/reference/EtlToS3.cs:87-94).
  *
  * Spark has no built-in writer with per-object key + content-type + ACL
  * semantics (key ≠ file path), so this is a `foreachPartition` consumer:
  * one client per partition, one PUT per row, per-record fault tolerance
  * (swallow-and-count, mirroring Program.cs:120-123) via accumulators
  * instead of stdout. Parallelism = partitions × executor cores — the
  * distributed generalization of the S3 example's 40-thread semaphore
  * (EtlToS3.cs:36-43). Uploads stay at-least-once and idempotent by key.
  *
  * At 100 TB scale: the DataFrame reaching this sink should carry only
  * (key, content) for rows that are actually being written — binary
  * payloads must never pass through a shuffle (project keys first, join
  * content back at the end, or write straight from the scan partitions).
  */
trait ObjectStore extends Serializable {
  def put(key: String, bytes: Array[Byte], contentType: String): Unit
}

/** Local-filesystem store: key → file under a root dir. Stands in for a
  * GCS/S3 client in tests; a cloud deployment swaps in a client-backed
  * implementation with identical semantics.
  */
final class LocalFsStore(root: String) extends ObjectStore {
  override def put(key: String, bytes: Array[Byte], contentType: String): Unit = {
    val f = new java.io.File(root, key)
    f.getParentFile.mkdirs()
    java.nio.file.Files.write(f.toPath, bytes)
  }
}

object ObjectSink {

  /** Writes rows (keyCol STRING, contentCol BINARY) to the store.
    * Returns (#uploaded, #failed); individual failures are swallowed and
    * counted, never fail the job (reference per-record policy).
    */
  def write(
      df: DataFrame,
      store: ObjectStore,
      keyCol: String,
      contentCol: String,
      contentType: String): (Long, Long) = {
    val spark = df.sparkSession
    val ok: LongAccumulator = spark.sparkContext.longAccumulator("objects_uploaded")
    val failed: LongAccumulator = spark.sparkContext.longAccumulator("objects_failed")
    val ki = df.schema.fieldIndex(keyCol)
    val ci = df.schema.fieldIndex(contentCol)
    df.foreachPartition { rows: Iterator[Row] =>
      rows.foreach { r =>
        try {
          store.put(r.getString(ki), r.getAs[Array[Byte]](ci), contentType)
          ok.add(1)
        } catch { case scala.util.control.NonFatal(_) => failed.add(1) }
      }
    }
    (ok.value, failed.value)
  }
}
