package graft

import org.apache.spark.sql.functions.col

import graft.vector.HashingEmbedder

/** The embedding model's ML contracts, testable because everything is
  * deterministic: hashing, IDF arithmetic, seeded JL projection. */
class HashingEmbedderSpec extends SparkSpec {

  private lazy val model =
    HashingEmbedder.train(spark, Tables.documents(spark, sf))

  private def cosine(a: Array[Float], b: Array[Float]): Double =
    a.zip(b).map { case (x, y) => x.toDouble * y }.sum

  test("inference is deterministic and batched apply matches local apply") {
    val docs = Tables.documents(spark, sf)
    val fromSpark = HashingEmbedder.embed(spark, docs, model)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val local = docs.select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) ->
        HashingEmbedder.embedTokens(
          r.getString(1).trim.toLowerCase.split("\\s+").toSeq, model))
      .toMap
    assert(fromSpark.keySet == local.keySet)
    fromSpark.foreach { case (id, e) =>
      assert(e.sameElements(local(id)), s"doc $id differs between cluster and local")
    }
  }

  test("identical texts embed identically; unrelated texts are not collinear") {
    val a = HashingEmbedder.embedTokens(Seq("spark", "query", "engine"), model)
    val b = HashingEmbedder.embedTokens(Seq("spark", "query", "engine"), model)
    val c = HashingEmbedder.embedTokens(Seq("violet", "marmalade", "tuba"), model)
    assert(a.sameElements(b))
    assert(math.abs(cosine(a, c)) < 0.9)
  }

  test("JL projection approximately preserves relative similarity") {
    // shared-token overlap should rank higher than disjoint vocab
    val base = HashingEmbedder.embedTokens(
      Seq("the", "quick", "brown", "fox", "jumps", "over", "lazy", "dog"), model)
    val near = HashingEmbedder.embedTokens(
      Seq("the", "quick", "brown", "fox", "sleeps", "over", "lazy", "dog"), model)
    val far = HashingEmbedder.embedTokens(
      Seq("quantum", "flux", "barometer", "xylophone", "crimson", "ledger"), model)
    assert(cosine(base, near) > cosine(base, far),
      s"near ${cosine(base, near)} should beat far ${cosine(base, far)}")
  }

  test("IDF downweights ubiquitous buckets relative to rare ones") {
    val n = Tables.documents(spark, sf).count().toDouble
    // every idf is within the smoothed formula's range
    assert(model.idf.forall(v => v >= math.log((1.0 + n) / (1.0 + n)) + 1.0 - 1e-12))
    assert(model.idf.forall(v => v <= math.log(1.0 + n) + 1.0 + 1e-12))
    // a token present in every document gets the minimum idf
    assert(model.idf.min < model.idf.max, "corpus must differentiate buckets")
  }

  test("embeddings are unit-norm (or zero) and fixed-dimension") {
    val rows = HashingEmbedder.embedInvariants(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(2) && r.getBoolean(3), s"doc ${r.getLong(0)} violated contract")
    }
  }

  test("zero-norm embeddings rank last in knn scoring, never crash or NaN-first") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // cosine(zero, q) is 0/0: DIVIDE_BY_ZERO under ANSI (Spark 4
    // default), NaN-sorted-first otherwise — the guarded form must
    // rank the degenerate doc last instead
    val df = Seq((0L, Array(1.0, 0.0)), (1L, Array(0.0, 0.0)), (2L, Array(0.9, 0.1)))
      .toDF("doc_id", "v")
    val q = df.filter(col("doc_id") === 0L).select(col("v").as("qvec"))
    val scored = df.crossJoin(broadcast(q))
      .select(col("doc_id"),
        round(graft.vector.VectorOps.cosineOrElse(col("v"), col("qvec"), -2.0), 6)
          .as("score"))
      .orderBy(col("score").desc, col("doc_id")).collect()
    assert(scored.head.getLong(0) == 0L && scored.head.getDouble(1) == 1.0)
    assert(scored.last.getLong(0) == 1L && scored.last.getDouble(1) == -2.0)
  }

  test("embed-knn search satisfies its gated invariants and pins recall vs brute force") {
    import org.apache.spark.sql.functions._
    // gated contract: exactly k ranks, self at rank 1, monotone scores
    val gated = HashingEmbedder.embedKnnChecked(spark, sf).collect()
    assert(gated.map(_.getLong(0)).toSeq == (1L to 10L))
    assert(gated.forall(r => r.getBoolean(1) && r.getBoolean(2)))
    graft.CacheScope.drain()
    // recall@10 against brute force over the same inferred embeddings —
    // deterministic for the fixed seed/corpus, so a pinned bound, not a
    // hope: sign-bit LSH on 6 bits of a 64-dim JL projection
    val docs = Tables.documents(spark, sf)
    val m = HashingEmbedder.train(spark, docs)
    val emb = HashingEmbedder.embed(spark, docs, m)
      .select(col("doc_id"), col("embedding").cast("array<double>").as("v"))
      .cache()
    val q = emb.filter(col("doc_id") === 0L).select(col("v").as("qvec"))
    val brute = emb.crossJoin(broadcast(q))
      .select(col("doc_id"),
        graft.vector.VectorOps.cosine(col("v"), col("qvec")).as("score"))
      .orderBy(col("score").desc, col("doc_id")).limit(10)
      .collect().map(_.getLong(0)).toSet
    // re-run the ANN path and extract its doc ids via the same pool logic
    val sig = (1 to 6)
      .map(i => when(element_at(col("v"), i) >= 0, lit("1")).otherwise(lit("0")))
      .reduce((a, b) => concat(a, b))
    val bucketed = emb.withColumn("sig", sig)
    val qb = bucketed.filter(col("doc_id") === 0L)
      .select(col("v").as("qvec"), col("sig").as("qsig"))
    val cand = bucketed.join(broadcast(qb), col("sig") === col("qsig"))
    val pool = if (cand.count() >= 10) cand
      else bucketed.crossJoin(broadcast(qb.select(col("qvec"))))
    val ann = pool
      .select(col("doc_id"),
        graft.vector.VectorOps.cosine(col("v"), col("qvec")).as("score"))
      .orderBy(col("score").desc, col("doc_id")).limit(10)
      .collect().map(_.getLong(0)).toSet
    emb.unpersist()
    val recall = ann.intersect(brute).size / 10.0
    assert(recall >= 0.5, s"recall@10 collapsed to $recall (ann=$ann brute=$brute)")
  }
}
