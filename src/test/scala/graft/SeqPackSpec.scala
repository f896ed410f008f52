package graft

import org.scalacheck.{Gen, Prop}
import org.scalatest.funsuite.AnyFunSuite

import graft.chunk.SeqPack

/** Property tests for the greedy sequence-packing fold. */
class SeqPackSpec extends AnyFunSuite {
  private def check(p: Prop): Unit = {
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  private val genDocs: Gen[List[(Long, Long)]] = for {
    n <- Gen.chooseNum(0, 60)
    ids <- Gen.listOfN(n, Gen.chooseNum(0L, 10000L))
    toks <- Gen.listOfN(n, Gen.chooseNum(0L, 400L))
  } yield ids.distinct.zip(toks)

  private val genCap: Gen[Long] = Gen.chooseNum(1L, 300L)

  test("every doc appears exactly once, in doc_id order") {
    check(Prop.forAll(genDocs, genCap) { (docs, cap) =>
      val packed = SeqPack.packShard(docs, cap)
      packed.map(_._1) == docs.map(_._1).sorted &&
      packed.map(p => p._1 -> p._2).toMap == docs.toMap
    })
  }

  test("no sequence exceeds capacity unless it holds a single oversized doc") {
    check(Prop.forAll(genDocs, genCap) { (docs, cap) =>
      val bySeq = SeqPack.packShard(docs, cap).groupBy(_._3)
      bySeq.values.forall { rows =>
        rows.map(_._2).sum <= cap || rows.size == 1
      }
    })
  }

  test("seq indices and slots are contiguous from zero") {
    check(Prop.forAll(genDocs, genCap) { (docs, cap) =>
      val packed = SeqPack.packShard(docs, cap)
      val seqs = packed.map(_._3).distinct
      val seqOk = seqs == (0L until seqs.size).toList ||
        (packed.isEmpty && seqs.isEmpty)
      val slotOk = packed.groupBy(_._3).values.forall { rows =>
        rows.map(_._4).sorted == (0L until rows.size).toList
      }
      seqOk && slotOk
    })
  }

  test("packing is maximal: a closed sequence could not absorb the next doc") {
    check(Prop.forAll(genDocs, genCap) { (docs, cap) =>
      val packed = SeqPack.packShard(docs, cap).toIndexedSeq
      (1 until packed.size).forall { i =>
        val (_, n, seq, _) = packed(i)
        val prevSeqSum = packed.filter(_._3 == seq - 1).map(_._2).sum
        seq == packed(i - 1)._3 || prevSeqSum + n > cap
      }
    })
  }
}
