package graft

import org.apache.spark.sql.functions._
import graft.vector.{Bm25, Dedup, VectorOps}

class VectorSpec extends SparkSpec {
  import spark.implicits._

  private def score(a: Seq[Double], b: Seq[Double]): Double =
    Seq((a, b)).toDF("a", "b")
      .select(VectorOps.cosine(col("a"), col("b"))).as[Double].head()

  test("cosine: identical=1, orthogonal=0, opposite=-1") {
    assert(math.abs(score(Seq(1, 2, 3), Seq(1, 2, 3)) - 1.0) < 1e-12)
    assert(math.abs(score(Seq(1, 0), Seq(0, 1))) < 1e-12)
    assert(math.abs(score(Seq(1, 0), Seq(-1, 0)) + 1.0) < 1e-12)
  }

  test("l2Squared matches manual computation") {
    val d = Seq((Seq(1.0, 2.0), Seq(4.0, 6.0))).toDF("a", "b")
      .select(VectorOps.l2Squared(col("a"), col("b"))).as[Double].head()
    assert(d == 9.0 + 16.0)
  }

  test("sign-LSH bucket: bit i set iff component i+1 positive") {
    val b = Seq(Seq(1.0f, -1.0f, 2.0f, -0.5f)).toDF("v")
      .select(VectorOps.signLshBucket(col("v"), 4)).as[Long].head()
    assert(b == (1L | 4L)) // components 1 and 3 positive
  }

  test("identical docs share every minhash band (guaranteed candidates)") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "completely different words entirely unrelated content here now"),
    ).toDF("doc_id", "text")
    docs.createOrReplaceTempView("x")
    val sigs = (0 until 8).map(i => Dedup.minhashSig(col("hs"), i).as(s"h$i"))
    val s = docs.select(col("doc_id"),
      Dedup.shingles(graft.text.TextFunctions.tokens(lower(col("text")))).as("sh"))
      .select(col("doc_id"), transform(col("sh"), x => md5(x)).as("hs"))
      .select(col("doc_id") +: sigs: _*)
      .collect().map(r => r.getLong(0) -> (1 to 8).map(r.getString)).toMap
    assert(s(1L) == s(2L))
    assert(s(1L) != s(3L))
  }

  test("bm25: term in fewer docs scores higher (idf ordering)") {
    // doc 1 has rare term; common term appears everywhere
    val docs = Seq(
      (1L, "rare common alpha beta"),
      (2L, "common gamma delta epsilon"),
      (3L, "common zeta eta theta"),
    ).toDF("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("bm25t").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val top = Bm25.bm25TopK(spark, tmp, Seq("rare", "common"), 3)
      .select("doc_id", "score").as[(Long, Double)].collect().toSeq
    assert(top.head._1 == 1L) // rare+common beats common-only
    assert(top.head._2 > top(1)._2)
  }

  test("jaccard of identical token sets is 1.0 on candidate pairs") {
    val tmp = java.nio.file.Files.createTempDirectory("jac").toString
    Seq(
      (1L, "one two three four five six seven"),
      (2L, "one two three four five six seven"),
      (3L, "unrelated tokens that differ wholly everywhere always"),
    ).toDF("doc_id", "text").write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val pairs = Dedup.jaccardOnCandidates(spark, tmp)
      .as[(Long, Long, Double)].collect().toSeq
    assert(pairs == Seq((1L, 2L, 1.0)))
  }

  test("minhash bucket cap drops degenerate bands instead of exploding pairs") {
    // 200 identical docs: every band collapses to one bucket of 200 —
    // an uncapped pair expansion would emit ~19.9k pairs per band;
    // with the cap the degenerate buckets are dropped entirely
    val tmp = java.nio.file.Files.createTempDirectory("mhcap").toString
    (1L to 200L).map(i => (i, "same tokens in every single document here"))
      .toDF("doc_id", "text").write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    assert(Dedup.minhashCandidatePairs(spark, tmp, maxBucket = 64).count() == 0)
    // monitoring surface reports exactly the dropped buckets
    val dropped = Dedup.droppedBuckets(spark, tmp, maxBucket = 64)
      .as[(Long, String, Long)].collect()
    assert(dropped.nonEmpty && dropped.forall(_._3 == 200L))
    // a corpus under the cap still produces its pairs
    assert(Dedup.minhashCandidatePairs(spark, tmp, maxBucket = 200).count() > 0)
  }

  test("bounded BPE train learns the same merges when the bound is slack") {
    val docs = Tables.documents(spark, sf).limit(100)
    val unbounded = graft.text.BpeTokenizer.train(spark, docs, 30)
    val bounded = graft.text.BpeTokenizer.train(spark, docs, 30, minFreq = 1L, maxVocab = 100000)
    assert(bounded == unbounded)
    // a tight vocab cap still yields merges drawn from frequent words
    val tight = graft.text.BpeTokenizer.train(spark, docs, 10, minFreq = 2L, maxVocab = 50)
    assert(tight.nonEmpty && tight.size <= 10)
  }

  test("upsert is idempotent and last-writer-wins (J2 semantics)") {
    val existing = Seq((1L, "a", 1L), (2L, "b", 1L)).toDF("k", "v", "ver")
    val updates = Seq((2L, "b2", 2L), (3L, "c", 2L)).toDF("k", "v", "ver")
    val once = graft.meta.Upsert.upsert(existing, updates, "k")
    val twice = graft.meta.Upsert.upsert(once, updates, "k")
    val got = twice.orderBy("k").as[(Long, String, Long)].collect().toSeq
    assert(got == Seq((1L, "a", 1L), (2L, "b2", 2L), (3L, "c", 2L)))
  }
}
