package graft.queries

import graft.SparkSuite
import graft.sinks.{HadoopFsStore, ObjectSink}
import org.apache.spark.sql.functions._

/** Integration skeleton for a REAL cloud bucket — the config-only swap-in
  * documented in README "Pointing the object sink at a real bucket".
  * Ignored by default: this sandbox has zero egress, so the connector
  * battery runs only against `file://` (TileCacheSpec). On a machine with
  * cloud credentials:
  *
  *   1. add the connector jars (gcs-connector or hadoop-aws) to the
  *      classpath and the auth configs from the README to the session,
  *   2. `export GRAFT_CLOUD_URI=gs://bucket/prefix` (or `s3a://...`),
  *   3. change `ignore` to `test`.
  *
  * The assertions are the same byte-identity + per-record fault-tolerance
  * contract the local battery pins — nothing engine-side differs between
  * `file://` and `gs://`/`s3a://` by construction (HadoopFsStore is the
  * same code path; only the FileSystem implementation under it changes).
  */
class ObjectSinkCloudSpec extends SparkSuite {

  ignore("cloud PUT round-trip: byte identity + meta sidecar on a real bucket") {
    val rootUri = sys.env.getOrElse(
      "GRAFT_CLOUD_URI",
      fail("set GRAFT_CLOUD_URI=gs://bucket/prefix (or s3a://...) to run"))
    import spark.implicits._
    val df = Seq(
      ("it/1/2/3", "payload-123".getBytes("UTF-8")),
      ("it/1/2/4", Array.tabulate(256)(_.toByte)))
      .toDF("object_key", "content")
    val (ok, failed, _) =
      ObjectSink.write(df, new HadoopFsStore(rootUri), "object_key", "content", "image/jpg")
    assert(ok == 2 && failed == 0)
    // read back through the same connector: bytes must be identical
    val fs = org.apache.hadoop.fs.FileSystem
      .get(java.net.URI.create(rootUri), spark.sparkContext.hadoopConfiguration)
    val back = fs.open(new org.apache.hadoop.fs.Path(rootUri, "it/1/2/4"))
    val buf = new Array[Byte](256)
    try back.readFully(buf)
    finally back.close()
    assert(buf.toSeq == Array.tabulate(256)(_.toByte).toSeq)
  }
}
