package graft.vector

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.text.TextFunctions

/** A REAL embedding model executed at the batched-inference boundary —
  * the reference injects a neural embedder at config/manager.py:179-182;
  * this is the classical counterpart built only from published
  * techniques, trained distributedly and applied per partition:
  *
  *   1. Feature hashing ("the hashing trick", Weinberger et al. 2009):
  *      tokens hash into `numFeatures` signed buckets — vocabulary-free,
  *      so the model size is FIXED no matter the corpus.
  *   2. IDF weighting (smoothed, the standard ln((1+N)/(1+df))+1 form)
  *      learned per BUCKET with one distributed aggregation; the
  *      collected model is `numFeatures` doubles — a bounded parameter
  *      fetch like k-means centroids, never corpus-sized.
  *   3. Random sign projection to `dims` dense dimensions (Achlioptas
  *      2001 / Johnson–Lindenstrauss): R(b,d) = ±1/√dims minted
  *      deterministically from (seed, b, d) — the matrix is never
  *      materialized, executors recompute entries on the fly.
  *   4. L2 normalization, so downstream cosine ops are dot products.
  *
  * APPLY is the real inference shape: model broadcast once, executors
  * embed per partition with no shuffle — at 100 TB this is a map-only
  * pass whose cost is O(distinct tokens × dims) per document.
  *
  * Everything is deterministic (hashCode, seeded projection, exact IDF
  * arithmetic), so the operator is testable end to end; the driver gate
  * uses the invariant-oracle pattern (model values are not blind-SQL
  * computable, the contract booleans are).
  */
object HashingEmbedder {

  final case class Model(numFeatures: Int, dims: Int, idf: Array[Double], seed: Long)

  /** Token → bucket: JVM String.hashCode is specified (31-polynomial)
    * and stable across JVMs, so training and inference agree. */
  def bucket(tok: String, numFeatures: Int): Int =
    math.floorMod(tok.hashCode, numFeatures)

  /** Token → ±1 sign (independent bits of the same hash). */
  def sign(tok: String): Double =
    if (((tok.hashCode >>> 16) & 1) == 0) 1.0 else -1.0

  /** Deterministic projection entry R(b,d) = ±1/√dims via splitmix64
    * mixing of (seed, b, d). */
  def projection(seed: Long, b: Int, d: Int, dims: Int): Double = {
    var z = seed + 0x9e3779b97f4a7c15L * (b.toLong * 65537L + d + 1L)
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z = z ^ (z >>> 31)
    (if ((z & 1L) == 0L) 1.0 else -1.0) / math.sqrt(dims.toDouble)
  }

  /** Distributed IDF training: ONE corpus pass — each doc emits a −1
    * sentinel (its existence) plus its distinct buckets, so the doc
    * count rides the same aggregate as the document frequencies
    * instead of a second full scan (at 100 TB, a count() job that
    * re-reads the corpus just to size the smoothing constant is a
    * whole wasted pass). The collect stays bounded by numFeatures+1. */
  def train(spark: SparkSession, docs: DataFrame,
      numFeatures: Int = 1024, dims: Int = 64, seed: Long = 42L): Model = {
    import spark.implicits._
    val counts = docs
      .select(TextFunctions.tokens(lower(col("text"))).as("toks"))
      .as[Seq[String]]
      .flatMap(toks => Iterator.single(-1) ++ toks.iterator.map(bucket(_, numFeatures)).toSet)
      .toDF("b")
      .groupBy(col("b")).agg(count(lit(1)).as("df"))
      .as[(Int, Long)].collect()
    val nDocs = counts.collectFirst { case (-1, n) => n.toDouble }.getOrElse(0.0)
    val idf = Array.fill(numFeatures)(math.log((1.0 + nDocs) / 1.0) + 1.0)
    counts.foreach { case (b, df) => if (b >= 0) idf(b) = math.log((1.0 + nDocs) / (1.0 + df)) + 1.0 }
    Model(numFeatures, dims, idf, seed)
  }

  /** Embed one token sequence with the model — pure function, shared by
    * the Spark stage and the tests. Returns an L2-normalized vector
    * (or the zero vector when every hashed weight cancels). */
  def embedTokens(toks: Seq[String], m: Model): Array[Float] = {
    val tf = scala.collection.mutable.HashMap.empty[Int, Double]
    toks.foreach { t =>
      val b = bucket(t, m.numFeatures)
      tf.update(b, tf.getOrElse(b, 0.0) + sign(t))
    }
    val e = new Array[Double](m.dims)
    tf.foreach { case (b, v) =>
      val w = v * m.idf(b)
      if (w != 0.0) {
        var d = 0
        while (d < m.dims) { e(d) += w * projection(m.seed, b, d, m.dims); d += 1 }
      }
    }
    val norm = math.sqrt(e.map(x => x * x).sum)
    if (norm > 0) e.map(x => (x / norm).toFloat) else e.map(_.toFloat)
  }

  /** Batched inference: model broadcast, map-only, no shuffle.
    * Output (doc_id, embedding: Array[Float]). */
  def embed(spark: SparkSession, docs: DataFrame, m: Model): DataFrame = {
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(m)
    docs.select(col("doc_id"), TextFunctions.tokens(lower(col("text"))).as("toks"))
      .as[(Long, Seq[String])]
      .mapPartitions { it =>
        val model = bc.value // one fetch per task, like any model server
        it.map { case (id, toks) => (id, embedTokens(toks, model)) }
      }
      .toDF("doc_id", "embedding")
  }

  /** The driver-gated query (invariant-oracle pattern): exact columns
    * (doc_id, n_tokens) plus contract booleans —
    *  - dim_ok: the embedding has exactly `dims` components;
    *  - unit_ok: its L2 norm is 1 within 1e-6, or exactly 0 (the
    *    all-weights-cancelled corner the normalizer passes through).
    * Model values themselves are not emitted: a blind SQL oracle
    * cannot recompute them, and the properties are what the inference
    * contract guarantees. */
  def embedInvariants(spark: SparkSession, dir: String,
      numFeatures: Int = 1024, dims: Int = 64): DataFrame = {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, dir)
    val m = train(spark, docs, numFeatures, dims)
    val bc = spark.sparkContext.broadcast(m)
    docs.select(col("doc_id"), TextFunctions.tokens(lower(col("text"))).as("toks"))
      .as[(Long, Seq[String])]
      .mapPartitions { it =>
        val model = bc.value
        it.map { case (id, toks) =>
          val e = embedTokens(toks, model)
          val norm = math.sqrt(e.map(x => x.toDouble * x).sum)
          (id, toks.size.toLong, e.length == model.dims,
            norm == 0.0 || math.abs(norm - 1.0) < 1e-6)
        }
      }
      .toDF("doc_id", "n_tokens", "dim_ok", "unit_ok")
      .orderBy(col("doc_id"))
  }

  /** Blind oracle: exact whitespace token count (empty text → one empty
    * token, Spark split semantics), booleans contractual. */
  def embedInvariantsSql: String = """
    SELECT doc_id,
           CAST(CASE WHEN length(trim(text)) = 0 THEN 1
                ELSE len(string_split_regex(trim(text), '\s+')) END AS BIGINT) AS n_tokens,
           TRUE AS dim_ok, TRUE AS unit_ok
    FROM documents ORDER BY doc_id"""

  /** ANN over INFERRED embeddings — the composition a real pipeline
    * runs and the one piece the vec_* family didn't cover: train the
    * model on the corpus, embed every document, index the embeddings,
    * search. The index is sign-bit LSH for free: each embedding is
    * already a seeded JL projection, so its coordinate SIGNS are
    * random-hyperplane bits — bucket on the first `bits` signs, probe
    * the query's bucket, exact-cosine rerank. If the bucket holds
    * fewer than k candidates the search widens to a full scan
    * (adaptive multi-probe degenerate case) so the result is always
    * exactly k rows.
    *
    * Invariant-gated (blind oracle — a SQL engine cannot recompute
    * hashed embeddings): rk is the exact 1..k rank sequence (row-count
    * gate), self_ok proves rank 1 is the query itself at cosine 1
    * (the query shares its own bucket, cosine(q,q)=1 is maximal, and
    * queryId 0 wins the doc_id tie-break even against an exact-dup
    * text), sorted_ok proves the ranking is monotone. Probabilistic
    * recall is NOT claimed here — HashingEmbedderSpec pins recall@k
    * against brute force for the fixed seed. */
  def embedKnnChecked(spark: SparkSession, dir: String, queryId: Long = 0,
      k: Int = 10, bits: Int = 6): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = graft.Tables.documents(spark, dir)
    val m = train(spark, docs)
    val emb = graft.CacheScope.register(
      embed(spark, docs, m)
        .select(col("doc_id"), VectorOps.asDouble(col("embedding")).as("v"))
        .persist())
    val sig = (1 to bits)
      .map(i => when(element_at(col("v"), i) >= 0, lit("1")).otherwise(lit("0")))
      .reduce((a, b) => concat(a, b))
    val bucketed = emb.withColumn("sig", sig)
    val q = bucketed.filter(col("doc_id") === queryId)
      .select(col("v").as("qvec"), VectorOps.l2Norm(col("v")).as("qn"),
        col("sig").as("qsig"))
    val cand = bucketed.join(broadcast(q), col("sig") === col("qsig"))
    // bucket too small for k results → widen to a full scan (the
    // count is an action, but emb is persisted and bucket membership
    // is a map-side predicate — one cached-block pass)
    val pool =
      if (cand.count() >= k) cand
      else bucketed.crossJoin(broadcast(q.select(col("qvec"), col("qn"))))
    // zero-norm guard: an all-weights-cancelled embedding (the corner
    // embedTokens documents) would make cosine raise DIVIDE_BY_ZERO
    // under ANSI mode (Spark 4 default) — or, ANSI off, score NaN and
    // sort ABOVE the query itself. Degenerate vectors rank last.
    val ann = pool
      .select(col("doc_id"),
        round(VectorOps.cosineOrElseQn(col("v"), col("qvec"), col("qn"), -2.0), 6).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
    val w = Window.orderBy(col("score").desc, col("doc_id"))
    ann
      .withColumn("rk", row_number().over(w).cast("long"))
      .withColumn("prev", lag(col("score"), 1).over(w))
      .select(col("rk"),
        when(col("rk") === 1, col("doc_id") === queryId && col("score") === 1.0)
          .otherwise(lit(true)).as("self_ok"),
        (col("prev").isNull || col("prev") >= col("score")).as("sorted_ok"))
      .orderBy(col("rk"))
  }

  def embedKnnCheckedSql(k: Int = 10): String = s"""
    SELECT CAST(u.i AS BIGINT) AS rk, TRUE AS self_ok, TRUE AS sorted_ok
    FROM (SELECT unnest(generate_series(1, $k)) AS i) u ORDER BY rk"""
}
