package graft

import graft.text.BpeTokenizer

class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("training learns the most frequent pair first (deterministic)") {
    val docs = Seq((1L, "aaab aaab aaab xy")).toDF("doc_id", "text")
    val merges = BpeTokenizer.train(spark, docs, 2)
    // "aa" is the most frequent adjacent pair (freq 6 across aaab x3)
    assert(merges.head == ("a", "a"))
    assert(BpeTokenizer.train(spark, docs, 2) == merges)
  }

  test("encoding merges down to whole words for frequent vocabulary") {
    val docs = Seq((1L, ("spark " * 50).trim)).toDF("doc_id", "text")
    val merges = BpeTokenizer.train(spark, docs, 10)
    val enc = BpeTokenizer.encodeWord("spark", merges)
    assert(enc == Vector("spark</w>"), s"got $enc")
  }

  test("subword counts: frequent words compress, rare words split") {
    val docs = Tables.documents(spark, sf).limit(100)
    val merges = BpeTokenizer.train(spark, docs, 50)
    val counts = BpeTokenizer.subwordCounts(spark, docs, merges)
      .as[(Long, Long, Long)].collect()
    assert(counts.nonEmpty)
    // with 50 merges over this small vocab, subwords per word must be
    // well under the char count but at least the word count
    counts.foreach { case (_, nWords, nSub) => assert(nSub >= nWords) }
    val totalWords = counts.map(_._2).sum
    val totalSub = counts.map(_._3).sum
    assert(totalSub < totalWords * 6, "BPE should compress below ~6 subwords/word here")
  }
}
