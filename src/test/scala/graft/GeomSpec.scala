package graft

import org.scalacheck.{Gen, Prop}
import org.scalatest.funsuite.AnyFunSuite

import graft.geom.RectMerge
import graft.geom.RectMerge.Rect

/** A7 fixpoint properties (SURVEY.md §5.3): idempotence, permutation
  * invariance, pairwise non-mergeability, input coverage. */
class GeomSpec extends AnyFunSuite {
  private val tol = 40.0

  private def check(p: Prop): Unit = {
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  private val genRect: Gen[Rect] = for {
    x0 <- Gen.chooseNum(0, 500); y0 <- Gen.chooseNum(0, 700)
    w <- Gen.chooseNum(1, 150); h <- Gen.chooseNum(1, 120)
  } yield Rect(x0.toDouble, y0.toDouble, (x0 + w).toDouble, (y0 + h).toDouble)

  private val genRects: Gen[List[Rect]] = Gen.chooseNum(0, 12).flatMap(Gen.listOfN(_, genRect))

  test("merge output is pairwise non-mergeable") {
    check(Prop.forAll(genRects) { rs =>
      val m = RectMerge.mergeAll(rs, tol)
      m.indices.forall(i => (i + 1 until m.length).forall(j => !m(i).overlapsOrTouches(m(j), tol)))
    })
  }

  test("merge is idempotent") {
    check(Prop.forAll(genRects) { rs =>
      val m = RectMerge.mergeAll(rs, tol)
      RectMerge.mergeAll(m, tol) == m
    })
  }

  test("merge is permutation-invariant (confluence)") {
    check(Prop.forAll(genRects) { rs =>
      RectMerge.mergeAll(rs, tol) == RectMerge.mergeAll(rs.reverse, tol)
    })
  }

  test("every input rect is covered by some output rect") {
    check(Prop.forAll(genRects) { rs =>
      val m = RectMerge.mergeAll(rs, tol)
      rs.forall(r => m.exists(o =>
        o.x0 <= r.x0 && o.y0 <= r.y0 && o.x1 >= r.x1 && o.y1 >= r.y1))
    })
  }

  test("disjoint rects pass through unmerged") {
    val rs = Seq(Rect(0, 0, 10, 10), Rect(100, 100, 110, 110), Rect(300, 300, 310, 310))
    assert(RectMerge.mergeAll(rs, tol).size == 3)
  }

  test("touching-within-tolerance rects merge to the union") {
    val rs = Seq(Rect(0, 0, 10, 10), Rect(40, 0, 50, 10)) // 30pt gap < tol
    assert(RectMerge.mergeAll(rs, tol) == Vector(Rect(0, 0, 50, 10)))
  }

  test("transitive chain merges through an intermediate rect") {
    // a-b overlap, b-c overlap, a-c don't: closure must still be one rect
    val rs = Seq(Rect(0, 0, 10, 10), Rect(45, 0, 55, 10), Rect(90, 0, 100, 10))
    assert(RectMerge.mergeAll(rs, tol) == Vector(Rect(0, 0, 100, 10)))
  }
}
