package graft

/** The dtype-identity sweep (r17 verdict #5): the SUM-cast lint in
  * RelationalSpec catches one textual instance of the dtype-drift
  * class; this spec closes the CLASS by running the ENTIRE board —
  * every `SparkEntry.queries` result and every `SparkEntry.oracleSql`
  * statement — through the dtype-strict comparator the driver's
  * harness mimics (`tools/check.py`: dtypes compared before values,
  * `check_dtype=True, check_exact=True`). Any oracle whose DuckDB
  * result types differ from the Spark parquet output (HUGEINT sums,
  * DOUBLE avg/median vs int, int32 literals, integer division) fails
  * HERE, inside `sbt test`, instead of as an opaque driver-board
  * hash mismatch three days later.
  *
  * sf0.001 keeps the sweep ~a minute; dtype identity is data-size
  * independent (types come from the expressions, not the rows), so
  * the small SF proves the same contract the sf0.01 driver gate
  * checks. The spec cancels (never silently passes) if the box lacks
  * the driver-side python/duckdb toolchain.
  */
class DtypeSweepSpec extends SparkSpec {

  private def haveDuckdb: Boolean =
    try {
      import scala.sys.process._
      Seq("python3", "-c", "import duckdb, pandas").! == 0
    } catch { case _: Throwable => false }

  test("every oracle is dtype-identical to its Spark output (check.py, sf0.001)") {
    assume(haveDuckdb, "driver-side python3+duckdb toolchain not present")
    val out = java.nio.file.Files.createTempDirectory("graft-dtype-sweep").toString
    try {
      val failedDump = Verify.dump(spark, sf, out)
      assert(failedDump.isEmpty, s"queries failed to produce output: $failedDump")
      import scala.sys.process._
      val repo = new java.io.File(sys.props("user.dir"))
      val buf = new StringBuilder
      val rc = Process(
        Seq("python3", "tools/check.py", sf, out), repo)
        .!(ProcessLogger(l => { buf.append(l).append('\n'); () },
          l => { buf.append(l).append('\n'); () }))
      val failLines = buf.toString.linesIterator.filter(_.startsWith("FAIL")).toSeq
      assert(rc == 0 && failLines.isEmpty,
        s"dtype-strict oracle compare failed (rc=$rc):\n${failLines.mkString("\n")}")
    } finally Scratch.deleteRecursively(out)
  }
}
