package graft.tile

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Web-Mercator tile-cache ETL domain, re-expressed as Spark column algebra.
  *
  * Behavioral spec: `agrc/tile-etl` (`/root/reference/src/Program.cs`).
  * The reference enumerates the tile coordinate space of an Esri exploded
  * cache for a bounding box across zoom levels, filters to tiles that exist
  * on disk, and uploads each under a slippy-map object key. Here the whole
  * coordinate space is a distributed DataFrame born from `spark.range` +
  * `sequence`/`explode` — at deep zoom the grid is billions of cells, so it
  * must be generated on executors, never in a driver loop.
  *
  * Correctness traps preserved from the reference (SURVEY.md §2.1):
  *   - `Math.Truncate` (toward zero) semantics → `CAST(double AS INT)`,
  *     not `floor` (Program.cs:76-81); differs for negative operands.
  *   - End bounds get `+1` then padding; all ranges inclusive
  *     (Program.cs:76-81,93-95).
  *   - Padding may push indices negative / off-world; nothing clamps —
  *     the join against real files is the filter (Program.cs:102).
  *   - Source path is 2-digit level + 8-digit lowercase-hex row/col
  *     (Program.cs:99-100); negative ints format as 32-bit two's
  *     complement. Destination key is decimal (Program.cs:113).
  */
final case class TileConfig(
    startLevel: Int = 5,
    endLevel: Int = 11,
    extentMinX: Double = -14078565, // Program.cs:26-29 (Utah, WebMercator m)
    extentMinY: Double = 3604577,
    extentMaxX: Double = -11137983,
    extentMaxY: Double = 6384021,
    padX: Int = 6, // Program.cs:30-31
    padY: Int = 6,
    webMercatorDelta: Double = 20037508.34278, // Program.cs:32
    mapName: String = "Lite", // Program.cs:16
    cacheDir: String = "", // Program.cs:33 equivalent; set per-job
    imageExt: String = "jpg")

object Tile {

  /** `tileSize = Δ * 2^(1-level)` (Program.cs:74). */
  def tileSize(cfg: TileConfig, level: Column): Column =
    lit(cfg.webMercatorDelta) * pow(lit(2.0), lit(1) - level)

  /** Row range, counted from the north/top edge (Program.cs:76-77). */
  def startRow(cfg: TileConfig, ts: Column): Column =
    ((lit(cfg.webMercatorDelta) - lit(cfg.extentMaxY)) / ts).cast("int") - lit(cfg.padY)
  def endRow(cfg: TileConfig, ts: Column): Column =
    ((lit(cfg.webMercatorDelta) - lit(cfg.extentMinY)) / ts).cast("int") + lit(1 + cfg.padY)

  /** Column range, from the west/left edge (Program.cs:78-81). */
  def startCol(cfg: TileConfig, ts: Column): Column =
    ((lit(cfg.extentMinX) + lit(cfg.webMercatorDelta)) / ts).cast("int") - lit(cfg.padX)
  def endCol(cfg: TileConfig, ts: Column): Column =
    ((lit(cfg.extentMaxX) + lit(cfg.webMercatorDelta)) / ts).cast("int") + lit(1 + cfg.padX)

  /** Per-level tile ranges: one row per level with inclusive bounds. */
  def levelRanges(spark: SparkSession, cfg: TileConfig): DataFrame = {
    val levels = spark
      .range(cfg.startLevel.toLong, cfg.endLevel.toLong + 1L)
      .select(col("id").cast("int").as("level"))
    val ts = tileSize(cfg, col("level"))
    levels.select(
      col("level"),
      startRow(cfg, ts).as("start_row"),
      endRow(cfg, ts).as("end_row"),
      startCol(cfg, ts).as("start_col"),
      endCol(cfg, ts).as("end_col"))
  }

  /** The full (level, row, col) candidate grid — R1-R5 of the reference
    * (nested loops, Program.cs:71,93-95) as a distributed cross product.
    *
    * Scale: rows explode first (one output row per grid *row*), then a
    * round-robin repartition spreads the per-row column explosion across
    * all tasks. The shuffled intermediate is 5 ints per grid row — tiny —
    * while the final explode (the big fan-out) runs fully parallel. A
    * driver-side loop or a single-level explode would serialize deep zooms
    * where one level alone is millions of rows × thousands of cols.
    */
  def tileGrid(spark: SparkSession, cfg: TileConfig): DataFrame = {
    val rows = levelRanges(spark, cfg)
      .select(
        col("level"),
        explode(sequence(col("start_row"), col("end_row"))).as("row"),
        col("start_col"),
        col("end_col"))
    rows
      .repartition(spark.sessionState.conf.numShufflePartitions)
      .select(
        col("level"),
        col("row"),
        explode(sequence(col("start_col"), col("end_col"))).as("col"))
  }

  /** Esri exploded-cache source path (Program.cs:99-100): lowercase
    * zero-padded hex; `%08x` on a negative IntegerType matches C#'s 32-bit
    * two's-complement output (e.g. -2 → fffffffe). Uses '/' separators
    * (the reference's '\\' is Windows-specific).
    */
  def sourcePath(cfg: TileConfig, level: Column, row: Column, c: Column): Column =
    format_string(
      s"${if (cfg.cacheDir.isEmpty) "" else cfg.cacheDir + "/"}L%02d/R%08x/C%08x.${cfg.imageExt}",
      level, row, c)

  /** Slippy-map destination key `{Map}/{z}/{r}/{c}`, decimal
    * (Program.cs:113).
    */
  def objectKey(cfg: TileConfig, level: Column, row: Column, c: Column): Column =
    concat_ws("/", lit(cfg.mapName), level, row, c)

  /** Inverse of the range math: tile → Web-Mercator bbox (R2-R4 inverted).
    * row 0 starts at the north edge (+Δ), col 0 at the west edge (−Δ).
    */
  def tileBBox(cfg: TileConfig, level: Column, row: Column, c: Column): Seq[Column] = {
    val ts = tileSize(cfg, level)
    Seq(
      (c * ts - lit(cfg.webMercatorDelta)).as("minx"),
      (lit(cfg.webMercatorDelta) - (row + lit(1)) * ts).as("miny"),
      ((c + lit(1)) * ts - lit(cfg.webMercatorDelta)).as("maxx"),
      (lit(cfg.webMercatorDelta) - row * ts).as("maxy"))
  }
}
