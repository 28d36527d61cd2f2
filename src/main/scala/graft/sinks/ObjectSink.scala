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

  /** PUT one object. `acl` is the per-object canned ACL the reference sets
    * on every upload — `allUsers:OWNER` on GCS (Program.cs:82-91),
    * `PublicRead` on S3 (EtlToS3.cs:92).
    */
  def put(key: String, bytes: Array[Byte], contentType: String, acl: String): Unit
}

object ObjectStore {
  /** The reference's public-read canned ACL (EtlToS3.cs:92). */
  val PublicRead = "public-read"
}

/** Local-filesystem store: key → file under a root dir. Stands in for a
  * GCS/S3 client in tests; a cloud deployment swaps in a client-backed
  * implementation with identical semantics. Content-type and ACL — which a
  * filesystem cannot carry natively — are recorded per object under
  * `_meta/<key>` ("_"-prefixed so Spark's file listing never mistakes the
  * sidecars for objects), letting tests assert the full PUT contract.
  */
final class LocalFsStore(root: String) extends ObjectStore {
  override def put(key: String, bytes: Array[Byte], contentType: String, acl: String): Unit = {
    val f = new java.io.File(root, key)
    f.getParentFile.mkdirs()
    java.nio.file.Files.write(f.toPath, bytes)
    val m = new java.io.File(new java.io.File(root, "_meta"), key)
    m.getParentFile.mkdirs()
    java.nio.file.Files.write(m.toPath, s"content-type=$contentType\nacl=$acl\n".getBytes("UTF-8"))
  }
}

/** Hadoop-FileSystem-backed store: the cloud swap-in. The same code path
  * writes `file://` in tests and `gs://` / `s3a://` in a deployment purely
  * by root-URI (plus the usual fs.* credentials config) — demonstrating
  * that nothing in the sink is local-fs-specific. Object bytes go to
  * `<root>/<key>`; content-type and ACL travel as the same `_meta/<key>`
  * sidecar convention as [[LocalFsStore]] (connector-level canned ACLs —
  * `fs.gs.bucket.*`, `fs.s3a.acl.default` — are cluster config, applied at
  * the connector below this API).
  *
  * One `FileSystem` per partition-task (the handle is created lazily on
  * the executor, never serialized from the driver), matching the
  * one-client-per-partition design above.
  */
final class HadoopFsStore(rootUri: String) extends ObjectStore {
  @transient private lazy val fs = {
    val conf = new org.apache.hadoop.conf.Configuration()
    org.apache.hadoop.fs.FileSystem.get(java.net.URI.create(rootUri), conf)
  }
  private def write(path: String, bytes: Array[Byte]): Unit = {
    val p = new org.apache.hadoop.fs.Path(rootUri, path)
    val out = fs.create(p, true)
    try out.write(bytes)
    finally out.close()
  }
  override def put(key: String, bytes: Array[Byte], contentType: String, acl: String): Unit = {
    write(key, bytes)
    write(s"_meta/$key", s"content-type=$contentType\nacl=$acl\n".getBytes("UTF-8"))
  }
}

object ObjectSink {

  /** Writes rows (keyCol STRING, contentCol BINARY) to the store.
    * Returns (#uploaded, #failed); individual failures are swallowed and
    * counted, never fail the job (reference per-record policy).
    *
    * R13 progress reporting: pass `progress` (a label column, e.g. the
    * zoom level, plus the label universe — known upfront from the job
    * config, exactly like the reference's per-level loop) and per-label
    * upload counts are tracked in accumulators and logged on completion,
    * the distributed analog of Program.cs's per-level console progress.
    */
  def write(
      df: DataFrame,
      store: ObjectStore,
      keyCol: String,
      contentCol: String,
      contentType: String,
      acl: String = ObjectStore.PublicRead,
      progress: Option[(String, Seq[String])] = None,
      retries: Int = 0,
      retryBackoffMs: Long = 0L): (Long, Long, Map[String, Long]) = {
    val spark = df.sparkSession
    val ok: LongAccumulator = spark.sparkContext.longAccumulator("objects_uploaded")
    val failed: LongAccumulator = spark.sparkContext.longAccumulator("objects_failed")
    val perLabel: Map[String, LongAccumulator] = progress match {
      case Some((_, labels)) =>
        labels.map(l => l -> spark.sparkContext.longAccumulator(s"objects_uploaded_$l")).toMap
      case None => Map.empty
    }
    val ki = df.schema.fieldIndex(keyCol)
    val ci = df.schema.fieldIndex(contentCol)
    val li = progress.map { case (c, _) => df.schema.fieldIndex(c) }
    df.foreachPartition { rows: Iterator[Row] =>
      rows.foreach { r =>
        // per-record policy (Program.cs:120-123): up to `retries` retried
        // attempts (PUTs are idempotent by key), then swallow-and-count —
        // one bad object must never fail the job
        var attempt = 0
        var done = false
        while (!done && attempt <= retries) {
          try {
            store.put(r.getString(ki), r.getAs[Array[Byte]](ci), contentType, acl)
            ok.add(1)
            li.foreach(i => perLabel.get(String.valueOf(r.get(i))).foreach(_.add(1)))
            done = true
          } catch {
            case scala.util.control.NonFatal(_) =>
              attempt += 1
              if (attempt > retries) failed.add(1)
              // bounded exponential backoff between attempts (r8): a
              // transient 429/503 from the object store usually clears in
              // one doubling; capped at 30 s so a dead store drains the
              // attempt budget instead of stalling its partition task.
              // Both operands clamped BEFORE the shift: an unclamped
              // `base << (attempt-1)` wraps negative past ~60 attempts
              // and Thread.sleep(negative) would throw out of the retry
              // loop and fail the whole task (r8 review finding).
              else if (retryBackoffMs > 0L)
                Thread.sleep(
                  math.min(
                    math.min(retryBackoffMs, 30000L) << math.min(attempt - 1, 20),
                    30000L))
          }
        }
      }
    }
    val counts: Map[String, Long] = perLabel.map { case (l, a) => l -> a.value.longValue() }
    counts.toSeq.sortBy(_._1).foreach { case (l, n) =>
      System.err.println(s"[sink] $l: $n uploaded")
    }
    (ok.value, failed.value, counts)
  }
}
