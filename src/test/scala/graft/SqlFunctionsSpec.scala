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
}
