package graft

import org.scalacheck.{Gen, Prop}
import org.scalatest.funsuite.AnyFunSuite

import graft.chunk.RecursiveSplitter

/** Property tests for the faithful C2 splitter (SURVEY.md §5.3):
  * max-size, reconstruction, overlap containment. */
class RecursiveSplitterSpec extends AnyFunSuite {
  private def check(p: Prop): Unit = {
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  private val genText: Gen[String] = for {
    n <- Gen.chooseNum(0, 800)
    cs <- Gen.listOfN(n, Gen.frequency(
      8 -> Gen.alphaNumChar, 2 -> Gen.const(' '),
      1 -> Gen.const('\n'), 1 -> Gen.oneOf("\n\n")))
  } yield cs.mkString

  private val genParams: Gen[(Int, Int)] = for {
    size <- Gen.chooseNum(5, 120)
    overlap <- Gen.chooseNum(0, size - 1)
  } yield (size, overlap)

  test("every chunk is within size") {
    check(Prop.forAll(genText, genParams) { case (t, (size, overlap)) =>
      RecursiveSplitter.split(t, size, overlap).forall(_.length <= size)
    })
  }

  test("chunks are substrings appearing in order") {
    check(Prop.forAll(genText, genParams) { case (t, (size, overlap)) =>
      val chunks = RecursiveSplitter.split(t, size, overlap)
      var from = 0
      chunks.forall { c =>
        val i = t.indexOf(c, math.max(0, from - overlap - c.length))
        if (i < 0) false else { from = i + c.length; true }
      }
    })
  }

  test("zero overlap reconstructs the input exactly") {
    check(Prop.forAll(genText, Gen.chooseNum(5, 120)) { (t, size) =>
      RecursiveSplitter.split(t, size, 0).mkString == t
    })
  }

  test("full coverage: end of last chunk reaches end of text") {
    check(Prop.forAll(genText, genParams) { case (t, (size, overlap)) =>
      val chunks = RecursiveSplitter.split(t, size, overlap)
      if (t.isEmpty) chunks.isEmpty else chunks.last == t.takeRight(chunks.last.length)
    })
  }

  test("atoms concatenate to the input") {
    check(Prop.forAll(genText, Gen.chooseNum(5, 120)) { (t, size) =>
      RecursiveSplitter.atoms(t, size, RecursiveSplitter.DefaultSeparators).mkString == t
    })
  }

  test("splitKeep round-trips") {
    check(Prop.forAll(genText) { t =>
      RecursiveSplitter.splitKeep(t, " ").mkString == t
    })
  }
}
