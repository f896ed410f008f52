package graft

import org.apache.spark.sql.functions._
import graft.vector.VectorOps

/** Bit-identity pin for the native PQ expressions
  * ([[graft.functions.PqOps]]) against the higher-order forms they
  * replaced in `VectorOps.pqParts`: same codes, same ADC sums, on the
  * REAL embeddings corpus (not synthetic happy-path vectors). The HOF
  * reference below is copied verbatim from the r18 pqParts body — if
  * the native path ever drifts in fold order, rounding, or tie-break,
  * this fails row-by-row with the offending vec_id. */
class PqEncodeSpec extends SparkSpec {
  import org.apache.spark.sql.Column

  private val m = 8; private val dsub = 8; private val ks = 16

  private def sub(v: Column, s: Column): Column = slice(v, s * dsub + 1, lit(dsub))
  private def l2n(a: Column, b: Column): Column =
    round(aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0),
      (acc, x) => acc + x) * 1e9).cast("long")

  private def cbNested(emb: org.apache.spark.sql.DataFrame) =
    emb.filter(col("vec_id") < ks)
      .select(explode(sequence(lit(0), lit(m - 1))).as("s"), col("vec_id").as("i"), col("v"))
      .select(col("s"), col("i"), sub(col("v"), col("s")).as("cv"))
      .groupBy(col("s"))
      .agg(transform(array_sort(collect_list(struct(col("i"), col("cv")))),
        e => e.getField("cv")).as("cvs"))
      .agg(transform(array_sort(collect_list(struct(col("s"), col("cvs")))),
        e => e.getField("cvs")).as("cb"))

  // the r18 HOF encode, verbatim
  private def hofCodes(v: Column): Column = {
    def codeAt(v: Column, s: Column): Column =
      aggregate(
        zip_with(element_at(col("cb"), s + 1), sequence(lit(0), lit(ks - 1)),
          (cv, i) => struct(l2n(sub(v, s), cv).as("d"), i.as("i"))),
        struct(lit(Long.MaxValue).as("d"), lit(0).as("i")),
        (acc, e) => when(e.getField("d") < acc.getField("d"), e).otherwise(acc))
        .getField("i")
    transform(sequence(lit(0), lit(m - 1)), s => codeAt(v, s))
  }

  test("native pq_encode equals the HOF fold row-for-row on the corpus") {
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val emb = Tables.embeddings(spark, dir)
        .select(col("vec_id"), VectorOps.asDouble(col("embedding")).as("v"))
      val both = emb.crossJoin(broadcast(cbNested(emb)))
        .select(col("vec_id"),
          hofCodes(col("v")).as("hof"),
          graft.functions.PqOps.encode(col("v"), col("cb")).as("native"))
      val bad = both.filter(not(col("hof") <=> col("native")))
      assert(bad.count() == 0,
        s"codes drifted at $dir: ${bad.limit(3).collect().mkString(" | ")}")
    }
  }

  test("native pq_adc equals the HOF lookup sum on every corpus row") {
    val dir = "/root/testdata/sf0.01"
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), VectorOps.asDouble(col("embedding")).as("v"))
    val qTab = emb.filter(col("vec_id") === 0L)
      .crossJoin(broadcast(cbNested(emb)))
      .select(zip_with(col("cb"), sequence(lit(0), lit(m - 1)),
        (cvs, s) => transform(cvs, cv => l2n(sub(col("v"), s), cv))).as("tab"))
    val coded = emb.crossJoin(broadcast(cbNested(emb)))
      .select(col("vec_id"), graft.functions.PqOps.encode(col("v"), col("cb")).as("codes"))
      .crossJoin(broadcast(qTab))
    val hofDist = aggregate(
      zip_with(col("codes"), sequence(lit(0), lit(m - 1)), (c, s) => struct(s.as("s"), c.as("i"))),
      lit(0L),
      (acc, sc) => acc + element_at(
        element_at(col("tab"), sc.getField("s") + 1), sc.getField("i") + 1))
    val bad = coded
      .select(col("vec_id"), hofDist.as("hof"),
        graft.functions.PqOps.adc(col("codes"), col("tab")).as("native"))
      .filter(not(col("hof") <=> col("native")))
    assert(bad.count() == 0,
      s"ADC sums drifted: ${bad.limit(3).collect().mkString(" | ")}")
  }

  test("pq_encode survives the interpreted (non-codegen) eval path too") {
    // force interpreted eval by evaluating the expression directly
    val emb = Tables.embeddings(spark, sf)
      .select(col("vec_id"), VectorOps.asDouble(col("embedding")).as("v"))
    val withCb = emb.crossJoin(broadcast(cbNested(emb)))
    val viaCodegen = withCb
      .select(col("vec_id"), graft.functions.PqOps.encode(col("v"), col("cb")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    // interpreted: eval on collected rows through the expression's eval()
    val rows = withCb.select(col("vec_id"), col("v"), col("cb")).collect()
    rows.foreach { r =>
      import org.apache.spark.sql.catalyst.util.ArrayData
      val vArr = ArrayData.toArrayData(r.getSeq[Double](1).toArray)
      val cbRaw = r.getAs[scala.collection.Seq[
        scala.collection.Seq[scala.collection.Seq[Double]]]](2)
      val cbArr = ArrayData.toArrayData(cbRaw.map(cvs =>
        ArrayData.toArrayData(cvs.map(cv =>
          ArrayData.toArrayData(cv.toArray)).toArray)).toArray)
      val got = graft.functions.PqEncode(null, null).nullSafeEval(vArr, cbArr)
        .asInstanceOf[ArrayData].toIntArray().toSeq
      assert(got == viaCodegen(r.getLong(0)),
        s"interpreted/codegen drift at vec_id=${r.getLong(0)}")
    }
  }
}
