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
}
