package graft.queries

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** E2E tile fixture tests (SURVEY.md §5.5): grid → binaryFile scan →
  * object sink into a local "bucket", asserting keys and byte identity.
  */
class TileCacheSpec extends SparkSuite {

  test("cache scan joins existing files to the candidate grid") {
    val m = TileCacheQueries.cacheScan(spark, sf001)
    val rows = m.collect()
    assert(rows.nonEmpty)
    // every manifest row's payload length matches the deterministic fixture
    rows.foreach { r =>
      val (lvl, row, col) = (r.getInt(0), r.getInt(1), r.getInt(2))
      assert((row + col + lvl) % 3 != 0, s"gap tile ($lvl,$row,$col) must not appear")
      assert(r.getAs[Long]("length") == s"tile-$lvl-$row-$col".getBytes("UTF-8").length.toLong)
      assert(r.getAs[String]("object_key") == s"Lite/$lvl/$row/$col")
    }
  }

  test("upload sink round-trips bytes into the bucket") {
    val manifest = TileCacheQueries.uploadSink(spark, sf001).collect()
    assert(manifest.nonEmpty)
    val bucket = new java.io.File(sys.props("java.io.tmpdir"), "graft_tile_bucket")
    manifest.foreach { r =>
      val key = r.getString(0)
      val f = new java.io.File(bucket, key)
      assert(f.exists(), key)
      val parts = key.split("/") // Lite/z/r/c
      val exp = s"tile-${parts(1)}-${parts(2)}-${parts(3)}"
      assert(new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8") == exp)
    }
    // sink manifest == scan manifest (same keys)
    val scanKeys =
      TileCacheQueries.cacheScan(spark, sf001).select("object_key").collect().map(_.getString(0)).toSet
    assert(manifest.map(_.getString(0)).toSet == scanKeys)
  }
}
