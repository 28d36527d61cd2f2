package graft.queries

import graft.sinks.{LocalFsStore, ObjectSink}
import graft.tile.{Tile, TileConfig}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Tile cache scan (R7-R8) and upload sink (R10-R12) over a deterministic
  * generated fixture cache (FIXTURES.md §B) — existence filtering becomes
  * "scan what exists, inner-join to the candidate grid"
  * (/root/reference/src/Program.cs:102-107 re-expressed).
  */
object TileCacheQueries {

  /** Small config so the fixture grid stays tiny: world-extent slice at
    * levels 2-4 with no padding gives a few hundred candidate cells.
    */
  val fixtureCfg: TileConfig = TileConfig(
    startLevel = 2,
    endLevel = 4,
    extentMinX = -14078565,
    extentMinY = 3604577,
    extentMaxX = -11137983,
    extentMaxY = 6384021,
    padX = 1,
    padY = 1,
    mapName = "Lite")

  private def fixtureRoot: java.io.File =
    new java.io.File(sys.props("java.io.tmpdir"), "graft_tile_cache")

  /** Deterministic fixture: every 3rd candidate cell is a gap (exercises
    * the existence filter); out-of-range padded cells (negative indices)
    * have no file by construction. Payload = "tile-L-R-C" bytes.
    */
  def ensureFixture(): String = {
    val root = fixtureRoot
    val done = new java.io.File(root, ".complete")
    if (!done.exists()) {
      for (level <- fixtureCfg.startLevel to fixtureCfg.endLevel) {
        val ts = fixtureCfg.webMercatorDelta * math.pow(2.0, 1 - level)
        val sr = ((fixtureCfg.webMercatorDelta - fixtureCfg.extentMaxY) / ts).toInt - fixtureCfg.padY
        val er = ((fixtureCfg.webMercatorDelta - fixtureCfg.extentMinY) / ts).toInt + 1 + fixtureCfg.padY
        val sc = ((fixtureCfg.extentMinX + fixtureCfg.webMercatorDelta) / ts).toInt - fixtureCfg.padX
        val ec = ((fixtureCfg.extentMaxX + fixtureCfg.webMercatorDelta) / ts).toInt + 1 + fixtureCfg.padX
        for (r <- sr to er; c <- sc to ec if (r + c + level) % 3 != 0 && r >= 0 && c >= 0) {
          val f = new java.io.File(root, f"L$level%02d/R$r%08x/C$c%08x.jpg")
          f.getParentFile.mkdirs()
          java.nio.file.Files.write(f.toPath, s"tile-$level-$r-$c".getBytes("UTF-8"))
        }
      }
      done.getParentFile.mkdirs()
      java.nio.file.Files.write(done.toPath, Array.emptyByteArray)
    }
    root.getAbsolutePath
  }

  /** Parse `R{hex}` / `C{hex}` path components back to signed 32-bit ints
    * (two's complement, matching the C# `{0:x8}` format at Program.cs:99).
    * `conv` yields an unsigned decimal string; re-wrap values > Int.Max.
    */
  private def hexComponent(path: org.apache.spark.sql.Column, re: String) = {
    val v = conv(regexp_extract(path, re, 1), 16, 10).cast("long")
    when(v > 2147483647L, v - 4294967296L).otherwise(v).cast("int")
  }

  /** R7+R8: binaryFile scan of the cache, keys parsed from paths, inner
    * join to the candidate grid (the join IS the existence filter — padded
    * off-world probes simply don't match). Output manifest only; binary
    * content is pruned before any shuffle.
    */
  def cacheScan(spark: SparkSession, sfDir: String): DataFrame = {
    val root = ensureFixture()
    val files = spark.read
      .format("binaryFile")
      .option("pathGlobFilter", "*.jpg")
      .option("recursiveFileLookup", "true")
      .load(root)
      .select(
        regexp_extract(col("path"), "L(\\d{2})", 1).cast("int").as("level"),
        hexComponent(col("path"), "R([0-9a-f]{8})").as("tile_row"),
        hexComponent(col("path"), "C([0-9a-f]{8})").as("tile_col"),
        col("length"))
    val grid = Tile
      .tileGrid(spark, fixtureCfg)
      .withColumnRenamed("row", "tile_row")
      .withColumnRenamed("col", "tile_col")
    files
      .join(grid, Seq("level", "tile_row", "tile_col"))
      .select(
        col("level"),
        col("tile_row"),
        col("tile_col"),
        Tile
          .objectKey(fixtureCfg, col("level"), col("tile_row"), col("tile_col"))
          .as("object_key"),
        col("length"))
      .orderBy("level", "tile_row", "tile_col")
  }

  /** Source tiles with content + object key (scan ⋈ grid), the input
    * relation of both the full upload and the delta sync.
    */
  private def sourceTiles(spark: SparkSession, root: String): DataFrame = {
    val grid = Tile
      .tileGrid(spark, fixtureCfg)
      .withColumnRenamed("row", "tile_row")
      .withColumnRenamed("col", "tile_col")
    spark.read
      .format("binaryFile")
      .option("pathGlobFilter", "*.jpg")
      .option("recursiveFileLookup", "true")
      .load(root)
      .select(
        regexp_extract(col("path"), "L(\\d{2})", 1).cast("int").as("level"),
        hexComponent(col("path"), "R([0-9a-f]{8})").as("tile_row"),
        hexComponent(col("path"), "C([0-9a-f]{8})").as("tile_col"),
        col("length"),
        col("content"))
      .join(grid, Seq("level", "tile_row", "tile_col"))
      .select(
        Tile
          .objectKey(fixtureCfg, col("level"), col("tile_row"), col("tile_col"))
          .as("object_key"),
        col("length"),
        col("content"))
  }

  /** Destination manifest (object_key, dest_length) re-listed from a
    * local bucket; empty relation when the bucket does not exist yet.
    */
  private def destManifest(spark: SparkSession, bucket: java.io.File): DataFrame = {
    import spark.implicits._
    if (!bucket.exists()) Seq.empty[(String, Long)].toDF("object_key", "dest_length")
    else
      spark.read
        .format("binaryFile")
        .option("recursiveFileLookup", "true")
        .load(bucket.getAbsolutePath)
        .where(!col("path").contains("/_meta/"))
        .select(
          regexp_replace(col("path"), "^file:" + bucket.getAbsolutePath + "/", "")
            .as("object_key"),
          col("length").as("dest_length"))
  }

  /** Incremental sync — the capability the reference lacks (Program.cs
    * re-reads and re-uploads the FULL cache every run; nothing checks
    * what the bucket already holds). Upload set = source tiles with no
    * destination object of the same (key, length) — one left-anti
    * key-equality join of two manifest projections (rsync's quick
    * check; binary content is pruned from both sides and loaded only
    * for the rows actually uploaded). Returns (#uploaded, #skipped).
    *
    * At 100 TB: both manifests are (key, length) columns — the source
    * side never shuffles tile bytes, the destination side is a bucket
    * LIST (or inventory table), and the anti-join shuffles keys only.
    */
  def deltaUpload(spark: SparkSession, root: String, bucket: java.io.File): (Long, Long) = {
    val src = sourceTiles(spark, root)
    val dest = destManifest(spark, bucket)
    val todo = src.join(
      dest,
      src("object_key") === dest("object_key") && src("length") === dest("dest_length"),
      "left_anti")
    val (ok, failed, _) = ObjectSink.write(
      todo,
      new LocalFsStore(bucket.getAbsolutePath),
      "object_key",
      "content",
      "image/jpg")
    val total = src.count()
    (ok + failed, total - ok - failed)
  }

  /** Registry entry: clean-bucket delta sync run twice — first pass
    * uploads the full cache, second pass is a no-op because every
    * (key, length) already matches. Deterministic 2-row summary; the
    * modify/add incremental cases are exercised in TileCacheSpec (they
    * need filesystem mutation, which a registry query must not leave
    * behind).
    */
  def deltaSync(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val root = ensureFixture()
    val bucket = new java.io.File(sys.props("java.io.tmpdir"), "graft_tile_delta_bucket")
    if (bucket.exists()) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files
        .walk(bucket.toPath)
        .sorted(java.util.Comparator.reverseOrder())
        .iterator()
        .asScala
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
    val (u1, s1) = deltaUpload(spark, root, bucket)
    val (u2, s2) = deltaUpload(spark, root, bucket)
    Seq(("initial", u1, s1), ("resync", u2, s2)).toDF("phase", "uploaded", "skipped")
  }

  /** R10-R12 end-to-end: scan → key projection → ObjectSink into a local
    * "bucket"; returns the uploaded manifest (re-listed from the bucket so
    * the result witnesses real writes).
    */
  def uploadSink(spark: SparkSession, sfDir: String): DataFrame = {
    val root = ensureFixture()
    val bucket = new java.io.File(sys.props("java.io.tmpdir"), "graft_tile_bucket")
    // The manifest below is built by re-listing the bucket, so stale objects
    // from an earlier run (different config/fixture) must not leak in.
    if (bucket.exists()) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files
        .walk(bucket.toPath)
        .sorted(java.util.Comparator.reverseOrder())
        .iterator()
        .asScala
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
    val grid = Tile
      .tileGrid(spark, fixtureCfg)
      .withColumnRenamed("row", "tile_row")
      .withColumnRenamed("col", "tile_col")
    val tiles = spark.read
      .format("binaryFile")
      .option("pathGlobFilter", "*.jpg")
      .option("recursiveFileLookup", "true")
      .load(root)
      .select(
        regexp_extract(col("path"), "L(\\d{2})", 1).cast("int").as("level"),
        hexComponent(col("path"), "R([0-9a-f]{8})").as("tile_row"),
        hexComponent(col("path"), "C([0-9a-f]{8})").as("tile_col"),
        col("content"))
      .join(grid, Seq("level", "tile_row", "tile_col"))
      .select(
        Tile
          .objectKey(fixtureCfg, col("level"), col("tile_row"), col("tile_col"))
          .as("object_key"),
        col("content"),
        format_string("L%02d", col("level")).as("level_label"))
    ObjectSink.write(
      tiles,
      new LocalFsStore(bucket.getAbsolutePath),
      "object_key",
      "content",
      "image/jpg",
      progress = Some((
        "level_label",
        (fixtureCfg.startLevel to fixtureCfg.endLevel).map(l => f"L$l%02d"))))
    spark.read
      .format("binaryFile")
      .option("recursiveFileLookup", "true")
      .load(bucket.getAbsolutePath)
      .select(
        regexp_replace(col("path"), "^file:" + bucket.getAbsolutePath + "/", "").as("object_key"),
        col("length"))
      .orderBy("object_key")
  }
}
