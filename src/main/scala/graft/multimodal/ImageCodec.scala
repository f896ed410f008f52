package graft.multimodal

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.geom.Geometry

/** REAL image codec boundary for the S7 figure sink (reference:
  * image_manager.py:200-219 renders page pixmaps to PNG): rasterize a
  * figure rect to an actual PNG via the JDK's javax.imageio — a true
  * encoder, not a stub — then decode the bytes back and measure pixels.
  *
  * The render→encode→decode roundtrip is hash-gated END TO END against
  * a blind SQL oracle: the renderer paints the clipped, 1/`Scale`-scaled
  * rect black on a white canvas, so the decoded dark-pixel count equals
  * the clipped scaled rect area — closed-form integer arithmetic DuckDB
  * computes from the part table. A wrong clip, a lossy encode, or a
  * broken decode all change the count and fail the gate. (PNG byte
  * LENGTH is encoder-dependent, so bytes themselves are asserted
  * non-empty via a contract boolean, never hashed.)
  *
  * Scale shape: render+decode run batched per partition over the rect
  * frame (each task owns its rows; the codec is stateless JDK code), so
  * the operator parallelizes like any map stage. `every` thins the rect
  * stream (fig_key % every == 0) — per-image raster cost is the real
  * cost model of an image pipeline, and the sampled gate proves the
  * path without turning the benchmark into a rasterization benchmark.
  */
object ImageCodec {

  val Scale = 4
  val CanvasW: Int = (Geometry.PageW / Scale).toInt // 153
  val CanvasH: Int = (Geometry.PageH / Scale).toInt // 198

  /** Rasterize [x0,x1)×[y0,y1) (canvas coords) black on white and
    * PNG-encode. Pure JDK; headless-safe. */
  def renderRectPng(sx0: Int, sy0: Int, sx1: Int, sy1: Int): Array[Byte] = {
    val img = new BufferedImage(CanvasW, CanvasH, BufferedImage.TYPE_BYTE_GRAY)
    val g = img.createGraphics()
    try {
      g.setColor(java.awt.Color.WHITE)
      g.fillRect(0, 0, CanvasW, CanvasH)
      g.setColor(java.awt.Color.BLACK)
      g.fillRect(sx0, sy0, sx1 - sx0, sy1 - sy0)
    } finally g.dispose()
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Decode PNG bytes and count pixels darker than mid-gray.
    * Returns (width, height, darkCount). */
  def decodeDarkPixels(png: Array[Byte]): (Int, Int, Long) = {
    val img = ImageIO.read(new ByteArrayInputStream(png))
    val (w, h) = (img.getWidth, img.getHeight)
    var dark = 0L
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        if (raster.getSample(x, y, 0) < 128) dark += 1
        x += 1
      }
      y += 1
    }
    (w, h, dark)
  }

  /** The driver-gated query: every `every`-th synthetic figure rect is
    * clipped to the page, scaled to canvas ints, rendered, encoded,
    * decoded, measured. Output (fig_key, img_w, img_h, dark_px, png_ok). */
  def renderRoundtrip(spark: SparkSession, dir: String, every: Int = 50): DataFrame = {
    import spark.implicits._
    Geometry.syntheticRects(spark, dir)
      .filter(col("fig_key") % every === 0)
      .select(col("fig_key"), col("x0"), col("y0"), col("x1"), col("y1"))
      .as[(Long, Double, Double, Double, Double)]
      .mapPartitions { it =>
        it.map { case (key, x0, y0, x1, y1) =>
          // clamp BOTH edges to the canvas: fillRect silently clips
          // negative coords, so an unclamped sx0/sy0 would diverge from
          // the oracle's closed-form (sx1-sx0)*(sy1-sy0) on any rect
          // that starts off-page (x0 < 0)
          val sx0 = math.max(0, math.floor(x0 / Scale).toInt)
          val sy0 = math.max(0, math.floor(y0 / Scale).toInt)
          val sx1 = math.floor(math.min(x1, Geometry.PageW) / Scale).toInt
          val sy1 = math.floor(math.min(y1, Geometry.PageH) / Scale).toInt
          val png = renderRectPng(sx0, sy0, sx1, sy1)
          val (w, h, dark) = decodeDarkPixels(png)
          (key, w.toLong, h.toLong, dark, png.length > 0)
        }
      }
      .toDF("fig_key", "img_w", "img_h", "dark_px", "png_ok")
      .orderBy(col("fig_key"))
  }

  /** Blind oracle: decoded dims are the canvas, dark pixels are the
    * clipped scaled rect area, png_ok is contractual. */
  def renderRoundtripSql(every: Int = 50): String = s"""
    WITH rects AS (${Geometry.rectsSql}),
    scaled AS (
      -- explicit FLOOR: DuckDB's // is NOT floor division on DOUBLE,
      -- and CAST(double AS BIGINT) rounds (hash-stability rule #7)
      SELECT fig_key,
             GREATEST(CAST(FLOOR(x0 / $Scale) AS BIGINT), 0) AS sx0,
             GREATEST(CAST(FLOOR(y0 / $Scale) AS BIGINT), 0) AS sy0,
             CAST(FLOOR(LEAST(x1, ${Geometry.PageW.toInt}) / $Scale) AS BIGINT) AS sx1,
             CAST(FLOOR(LEAST(y1, ${Geometry.PageH.toInt}) / $Scale) AS BIGINT) AS sy1
      FROM rects WHERE fig_key % $every = 0)
    SELECT fig_key,
           CAST($CanvasW AS BIGINT) AS img_w, CAST($CanvasH AS BIGINT) AS img_h,
           GREATEST(sx1 - sx0, 0) * GREATEST(sy1 - sy0, 0) AS dark_px,
           TRUE AS png_ok
    FROM scaled ORDER BY fig_key"""
}
