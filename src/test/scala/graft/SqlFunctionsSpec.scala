package graft

/** SQL-registered custom functions (§2.13 FunctionRegistry surface). */
class SqlFunctionsSpec extends SparkSpec {

  test("nfkc and chunk_split callable from SQL after register()") {
    functions.GraftFunctions.register(spark)
    val n = spark.sql("SELECT nfkc('ﬁle') AS x").collect().head.getString(0)
    assert(n == "file")
    val rows = spark.sql(
      "SELECT chunk_split('alpha beta gamma delta epsilon zeta', 12, 3)")
      .collect()
    assert(rows.length > 1)
  }

  test("dot_product/l2_squared coerce float arrays in SQL instead of misreading bytes") {
    functions.GraftFunctions.register(spark)
    // array<float> through the registry: the builders cast to
    // array<double>, so the result is the true dot product — the
    // unguarded path read raw UnsafeArrayData bytes as doubles
    val d = spark.sql(
      "SELECT dot_product(array(CAST(1.5 AS FLOAT), CAST(2.0 AS FLOAT)), " +
        "array(CAST(2.0 AS FLOAT), CAST(3.0 AS FLOAT)))")
      .collect().head.getDouble(0)
    assert(math.abs(d - 9.0) < 1e-9)
    val l2 = spark.sql(
      "SELECT l2_squared(array(CAST(0 AS FLOAT), CAST(0 AS FLOAT)), " +
        "array(CAST(3 AS FLOAT), CAST(4 AS FLOAT)))")
      .collect().head.getDouble(0)
    assert(math.abs(l2 - 25.0) < 1e-9)
  }

  test("bare DotProduct on a non-double array fails analysis, not silently") {
    import org.apache.spark.sql.graftbridge.Bridge
    import org.apache.spark.sql.functions.{array, lit}
    val bad = Bridge.column(functions.DotProduct(
      Bridge.expression(array(lit(1), lit(2))),
      Bridge.expression(array(lit(3), lit(4)))))
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.range(1).select(bad).collect()
    }
    assert(e.getMessage.toLowerCase.contains("array<double>")
      || e.getMessage.contains("DATATYPE_MISMATCH"))
  }
}
