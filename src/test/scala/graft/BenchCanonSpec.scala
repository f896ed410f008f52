package graft

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** The fingerprint orientation rule: Spark's canonicalizer orders
  * commutative operands by hashCodes that embed raw global ExprIds, so
  * the SAME predicate can render as `a < b` in one JVM and `b > a` in
  * the next (observed flipping three queries' fingerprints on the
  * seventh invocation of one commit). [[Bench.orientRule]] must make
  * every mirrored orientation converge to one rendering. */
class BenchCanonSpec extends AnyFunSuite {

  private val x = AttributeReference("x", LongType)(exprId = ExprId(0))
  private val y = AttributeReference("y", LongType)(exprId = ExprId(1))
  private val big: Expression = Multiply(Add(x, Literal(7L)), Literal(3L))

  private def fix(e: Expression): String = e.transformUp(Bench.orientRule).toString

  test("mirrored strict comparisons converge") {
    assert(fix(GreaterThan(x, big)) == fix(LessThan(big, x)))
    assert(fix(GreaterThan(big, x)) == fix(LessThan(x, big)))
  }

  test("mirrored non-strict comparisons converge") {
    assert(fix(GreaterThanOrEqual(x, big)) == fix(LessThanOrEqual(big, x)))
    assert(fix(LessThanOrEqual(x, big)) == fix(GreaterThanOrEqual(big, x)))
  }

  test("commuted equality and conjunction operand orders converge") {
    assert(fix(EqualTo(x, big)) == fix(EqualTo(big, x)))
    assert(fix(EqualNullSafe(x, big)) == fix(EqualNullSafe(big, x)))
    val p = GreaterThan(x, Literal(1L))
    val q = LessThan(y, Literal(9L))
    assert(fix(And(p, q)) == fix(And(q, p)))
    assert(fix(Or(p, q)) == fix(Or(q, p)))
  }

  test("orientation is idempotent and preserves semantics-relevant structure") {
    val e: Expression = GreaterThan(x, big)
    val once = e.transformUp(Bench.orientRule)
    val twice = once.transformUp(Bench.orientRule)
    assert(once.toString == twice.toString, "re-orienting must be a fixpoint")
    // the oriented form is still a comparison over the same operand set
    val ops = once match {
      case b: BinaryComparison => Set(b.left.toString, b.right.toString)
      case other => fail(s"unexpected shape $other")
    }
    assert(ops == Set(x.toString, big.toString))
  }

  test("lambda-variable ordinals collapse (process-global counter, run-order-coupled)") {
    // the SAME higher-order expression renders with different x_N
    // ordinals depending on how many lambdas earlier queries minted in
    // the JVM — the canon must not let that shift a later query's
    // fingerprint (observed r10→r11 on six dedup queries)
    val a = Bench.canonText("transform(hs#42, lambdafunction(substring(lambda x_1#43, 1, 4), lambda x_1#43, false))")
    val b = Bench.canonText("transform(hs#99, lambdafunction(substring(lambda x_731#7, 1, 4), lambda x_731#7, false))")
    assert(a == b)
    // the positional name letter survives (x vs y = different arg slots)
    assert(Bench.canonText("lambda y_12#3") != Bench.canonText("lambda x_12#3"))
  }

  test("truncation cut points collapse (width of upstream tokens is run-order-coupled)") {
    // truncatedString cuts expression lists at a CHAR budget; a
    // lambda ordinal's digit count upstream of the cut shifts where
    // the tail is severed — the same plan rendered `THEN...` in a
    // fresh JVM and `T...` mid-suite (round-13 probe diff on
    // dedup_decontaminate). The canon collapses the severed token.
    val a = Bench.canonText("DataFilters: [(size(split(text#12, x)) < 8) THEN..., Format: Parquet")
    val b = Bench.canonText("DataFilters: [(size(split(text#9876, x)) < 8) T..., Format: Parquet")
    assert(a == b, s"$a\nvs\n$b")
    // a standalone ellipsis (e.g. '... 4 more fields') is untouched
    assert(Bench.canonText("a ... b") == "a ... b")
  }

  test("@hex collapse keys on the token shape: qualified-name@hex, wherever it renders") {
    // the whitelist this replaced missed identity-rendering operators
    // it had never seen (aggregator/encoder objects on HashAggregate
    // lines with no Lambda$ marker) — the token shape catches them all
    assert(Bench.canonText(
      "HashAggregate(keys=[], functions=[rectunionagg(graft.geom.RectUnionAgg$@3f2a91bc, ...)])")
      .contains("graft.geom.RectUnionAgg$@ID"))
    assert(Bench.canonText(
      "MapGroups graft.streaming.StreamingRunner$$Lambda$1234/0x00007f8a@deadbeef")
      .contains("@ID"), "lambda identities still collapse")
    assert(Bench.canonText(
      "org.apache.spark.sql.catalyst.encoders.ExpressionEncoder@1a2b3c4d end")
      .contains("ExpressionEncoder@ID"))
    // a BARE hex-looking literal has no qualified-name prefix and must
    // survive untouched — collapsing it would hide a real plan change
    val lit = "Filter (tag#N = cafe@4d5e6f78)"
    assert(Bench.canonText(lit) == lit,
      "an unqualified token followed by @hex is data, not identity")
    // non-hex suffix after a qualified name is also data
    val notHex = "Project graft.text.Thing@xyz"
    assert(Bench.canonText(notHex) == notHex)
  }

  test("a subset-truncated prior is refused, a round-sized or absent one is not") {
    // the symmetric half of the BENCH_ONLY fixture guard (r17 advice):
    // subset runs don't write BENCH_FULL.json, and a full run must not
    // silently consume a subset-sized one from out-of-band edits
    val board = SparkEntry.queries.size
    assert(Bench.priorIsTruncated(3, board), "3-query prior must refuse")
    assert(Bench.priorIsTruncated(board / 2 - 1, board))
    assert(!Bench.priorIsTruncated(board, board), "full prior is a baseline")
    assert(!Bench.priorIsTruncated(board - 5, board),
      "a few gates added since last round must not refuse the prior")
    assert(!Bench.priorIsTruncated(0, board), "no prior = guard-less, not refusal")
  }
}
