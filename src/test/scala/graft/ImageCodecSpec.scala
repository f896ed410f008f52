package graft

import graft.multimodal.ImageCodec

/** The S7 codec boundary on real bytes: an actual PNG is produced by
  * javax.imageio and decoded back; pixel counts must equal painted
  * area exactly (PNG is lossless). */
class ImageCodecSpec extends SparkSpec {

  test("render→encode→decode roundtrip counts the painted area exactly") {
    val png = ImageCodec.renderRectPng(10, 20, 50, 60)
    // real PNG magic
    assert((png(0) & 0xff) == 0x89 && png(1) == 'P' && png(2) == 'N' && png(3) == 'G')
    val (w, h, dark) = ImageCodec.decodeDarkPixels(png)
    assert(w == ImageCodec.CanvasW && h == ImageCodec.CanvasH)
    assert(dark == 40L * 40L)
  }

  test("degenerate and full-canvas rects") {
    val (_, _, none) = ImageCodec.decodeDarkPixels(ImageCodec.renderRectPng(5, 5, 5, 40))
    assert(none == 0L)
    val (_, _, all) = ImageCodec.decodeDarkPixels(
      ImageCodec.renderRectPng(0, 0, ImageCodec.CanvasW, ImageCodec.CanvasH))
    assert(all == ImageCodec.CanvasW.toLong * ImageCodec.CanvasH)
  }

  test("off-page rects (negative origin) clamp identically to the oracle formula") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // rect starting off-page left/top: x ∈ [-100, 50), y ∈ [-8, 40).
    // fillRect clips negative coords silently; the closed-form oracle
    // area must see the SAME clamp or the gate diverges.
    val rects = Seq(
      (1L, -100.0, -8.0, 50.0, 40.0),   // partially visible
      (2L, -80.0, -60.0, -4.0, -2.0),   // fully off-page → zero pixels
      (3L, -1.0, 0.0, 613.0, 793.0))    // overhangs every edge → full canvas
      .toDF("fig_key", "x0", "y0", "x1", "y1")
    def scaled(v: Double) = math.floor(v / ImageCodec.Scale).toInt
    rects.collect().foreach { r =>
      val (key, x0, y0, x1, y1) =
        (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))
      val png = ImageCodec.renderRectPng(
        math.max(0, scaled(x0)), math.max(0, scaled(y0)),
        scaled(math.min(x1, 612.0)), scaled(math.min(y1, 792.0)))
      val (_, _, dark) = ImageCodec.decodeDarkPixels(png)
      val expW = math.max(scaled(math.min(x1, 612.0)) - math.max(0, scaled(x0)), 0)
      val expH = math.max(scaled(math.min(y1, 792.0)) - math.max(0, scaled(y0)), 0)
      assert(dark == expW.toLong * expH,
        s"fig $key: dark=$dark expected ${expW.toLong * expH}")
    }
  }

  test("distributed roundtrip matches the closed-form area per rect") {
    val rows = ImageCodec.renderRoundtrip(spark, sf, every = 10).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val key = r.getLong(0)
      assert(r.getLong(1) == ImageCodec.CanvasW && r.getLong(2) == ImageCodec.CanvasH)
      assert(r.getBoolean(4), s"png bytes empty for fig $key")
      // closed form from the synthetic-rect formula
      val x0 = (key % 500).toDouble
      val y0 = (key * 7 % 700).toDouble
      val expW = math.floor(math.min(x0 + rectSize(key), 612) / 4) - math.floor(x0 / 4)
      val expH = math.floor(math.min(y0 + 40, 792) / 4) - math.floor(y0 / 4)
      assert(r.getLong(3) == (math.max(expW, 0) * math.max(expH, 0)).toLong,
        s"dark pixels wrong for fig $key")
    }
  }

  private def rectSize(key: Long): Double = {
    import org.apache.spark.sql.functions.col
    Tables.part(spark, sf).filter(col("p_partkey") === key)
      .select(col("p_size")).head().getInt(0) * 3.0
  }
}
