package graft.vector

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.text.TextFunctions

/** BM25 sparse lexical scoring (SURVEY.md §2.11 R3; reference uses
  * Qdrant/bm25 FastEmbed — index_manager.py:115,120-122) and hybrid
  * dense+sparse fusion (R4).
  *
  * Classic two-stage aggregation, fully relational:
  *   1. tokenize + explode → per-(doc, term) TF;
  *   2. per-term DF + corpus stats (N, avgdl) — tiny aggregates,
  *      broadcast back;
  *   3. score = IDF · TF·(k1+1) / (TF + k1·(1−b+b·dl/avgdl)) summed over
  *      query terms.
  * At scale the only shuffle is the (doc,term) group-by; DF/avgdl are
  * scalar/broadcast joins. Lucene-style IDF: ln(1+(N−df+0.5)/(df+0.5)).
  * Scores rounded to 6 decimals for cross-engine hash stability.
  */
object Bm25 {
  val K1 = 1.2
  val B = 0.75

  /** Per-(doc_id, term) term frequencies + document length. */
  def termFreqs(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(spark, dir)
      .transform(graft.Parallelism.ensure(spark))
      .select(col("doc_id"), TextFunctions.tokens(lower(col("text"))).as("toks"))
      .select(col("doc_id"), size(col("toks")).cast("long").as("dl"), explode(col("toks")).as("term"))
    toks.groupBy(col("doc_id"), col("term"), col("dl"))
      .agg(count(lit(1)).as("tf"))
  }

  /** BM25 top-k for a fixed multi-term query.
    *
    * TF comes from a MAP-ONLY pass: the token array is materialized
    * once per document (Generate barrier), each query term's frequency
    * is an array count, and only (doc, term) hits survive — the corpus
    * is never exploded to a token stream and never shuffled on
    * (doc, term). (That inverted-index build, [[termFreqs]], is the
    * right plan when MANY queries amortize it; for one query it
    * shuffled ~500 tokens per document to use 3 of them.) */
  def bm25TopK(spark: SparkSession, dir: String, queryTerms: Seq[String], k: Int = 15): DataFrame =
    bm25Over(Tables.documents(spark, dir), queryTerms, k)

  /** Same operator over an ARBITRARY (doc_id, text, ...) corpus frame —
    * how retrieval is served from a [[graft.sources.SnapshotTable]]
    * version instead of the raw parquet table.
    *
    * `knownStats` = (n_docs, total_dl) when the caller already holds
    * the corpus stats (an immutable snapshot version's stats are a
    * constant — retrieval memoizes them next to its table fixture):
    * the scalars ride the score expression as LITERALS and the
    * per-query stats aggregate + broadcast disappear from the plan.
    * Values are identical by construction — the literals are the same
    * exact integer aggregates the inline path computes. */
  def bm25Over(docs: DataFrame, queryTerms: Seq[String], k: Int = 15,
      knownStats: Option[(Long, Long)] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = docs.sparkSession
    // one tf struct PER DISTINCT term: a duplicated query term would
    // emit two identical (doc, term) rows, doubling its df and summing
    // its score contribution twice
    val tfStructs = queryTerms.distinct.map { t =>
      struct(lit(t).as("term"),
        size(filter(col("toks"), x => x === t)).cast("long").as("tf"))
    }
    val tf = docs
      .transform(graft.Parallelism.ensure(spark))
      .select(col("doc_id"),
        explode(array(TextFunctions.tokens(lower(col("text"))))).as("toks"))
      .select(col("doc_id"), size(col("toks")).cast("long").as("dl"),
        explode(array(tfStructs: _*)).as("tc"))
      .select(col("doc_id"), col("dl"), col("tc.term").as("term"), col("tc.tf").as("tf"))
      .filter(col("tf") > 0)
    // df = rows per term in tf (tf is one row per (doc, term)), computed
    // as a window count over the SAME frame — the groupBy+self-join form
    // evaluated the whole tokenize→explode→aggregate subtree twice. The
    // window's term partition holds only query-term postings (bounded by
    // the query), so the extra exchange is tiny.
    val withDf = tf
      .withColumn("df", count(lit(1)).over(Window.partitionBy(col("term"))))
    val scored = knownStats.fold {
      val corpus = docs
        .select(col("doc_id"), TextFunctions.tokenCount(lower(col("text"))).as("dl"))
      val stats = corpus.agg(
        count(lit(1)).as("n_docs"),
        sum(col("dl")).as("total_dl"))
      withDf.crossJoin(broadcast(stats))
    } { case (nDocs, totalDl) =>
      withDf.withColumn("n_docs", lit(nDocs)).withColumn("total_dl", lit(totalDl))
    }
      .withColumn("idf",
        log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))))
      .withColumn("avgdl", col("total_dl").cast("double") / col("n_docs"))
      .withColumn("score_term",
        col("idf") * (col("tf") * (lit(K1) + 1)) /
          (col("tf") + lit(K1) * (lit(1) - lit(B) + lit(B) * col("dl") / col("avgdl"))))
    scored.groupBy(col("doc_id"))
      .agg(round(sum(col("score_term")), 6).as("score"), count(lit(1)).as("n_terms_hit"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }

  /** R3 at decontamination-sweep scale: a BATCH of queries scored in
    * ONE corpus pass — the shape a training-data pipeline actually
    * runs (screen the corpus against every benchmark prompt at once),
    * where the per-query form would re-tokenize the corpus |queries|
    * times.
    *
    * Plan: the UNION vocabulary of the batch is still model-sized, so
    * the corpus pays ONE tokenize TF pass for the whole batch (the
    * same map-only Generate-barrier TF as [[bm25Over]], over the union
    * terms) plus the corpus-stats aggregate every BM25 form pays; DF
    * per term is computed ONCE and shared by every query containing
    * the term (a window count over the posting frame); the
    * (query_id, term) map is a literal broadcast frame that fans
    * postings out to their queries; and the per-query top-k is the
    * custom [[graft.plans.TopKPerGroup]] operator — map-side bounded
    * heaps per query_id, so the final exchange carries ≤ k rows per
    * (query, partition) instead of every scored (query, doc) pair.
    * At 100 TB: two corpus scans + one vocabulary-bounded posting
    * shuffle + one queries×k exchange, for ANY batch size — vs
    * 2·|queries| corpus scans for the per-query loop. Batch equals
    * per-query results exactly (Bm25MultiSpec pins it). */
  def bm25MultiTopK(spark: SparkSession, dir: String,
      queries: Seq[(Long, Seq[String])], k: Int = 5): DataFrame =
    bm25MultiOver(Tables.documents(spark, dir), queries, k)

  def bm25MultiOver(docs: DataFrame, queries: Seq[(Long, Seq[String])],
      k: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = docs.sparkSession
    import spark.implicits._
    require(queries.nonEmpty, "bm25MultiOver: empty query batch")
    val unionTerms = queries.flatMap(_._2).distinct
    // per-(query, term) map — distinct per query (a duplicated term
    // would double its score contribution, same as bm25Over's guard)
    val qt = queries.flatMap { case (qid, ts) => ts.distinct.map(qid -> _) }
      .toDF("query_id", "term")
    val tfStructs = unionTerms.map { t =>
      struct(lit(t).as("term"),
        size(filter(col("toks"), x => x === t)).cast("long").as("tf"))
    }
    val tf = docs
      .transform(graft.Parallelism.ensure(spark))
      .select(col("doc_id"),
        explode(array(TextFunctions.tokens(lower(col("text"))))).as("toks"))
      .select(col("doc_id"), size(col("toks")).cast("long").as("dl"),
        explode(array(tfStructs: _*)).as("tc"))
      .select(col("doc_id"), col("dl"), col("tc.term").as("term"), col("tc.tf").as("tf"))
      .filter(col("tf") > 0)
    // DF once per UNION term — the amortization the batch buys: a
    // term shared by m queries is counted once, not m times
    val withDf = tf
      .withColumn("df", count(lit(1)).over(Window.partitionBy(col("term"))))
    val corpus = docs
      .select(col("doc_id"), TextFunctions.tokenCount(lower(col("text"))).as("dl"))
    val stats = corpus.agg(
      count(lit(1)).as("n_docs"),
      sum(col("dl")).as("total_dl"))
    val scored = withDf.crossJoin(broadcast(stats))
      .join(broadcast(qt), Seq("term"))
      .withColumn("idf",
        log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))))
      .withColumn("avgdl", col("total_dl").cast("double") / col("n_docs"))
      .withColumn("score_term",
        col("idf") * (col("tf") * (lit(K1) + 1)) /
          (col("tf") + lit(K1) * (lit(1) - lit(B) + lit(B) * col("dl") / col("avgdl"))))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(round(sum(col("score_term")), 6).as("score"), count(lit(1)).as("n_terms_hit"))
    graft.plans.TopKPerGroup
      .topK(scored, Seq(col("query_id")),
        Seq(col("score").desc, col("doc_id")), k)
      .orderBy(col("query_id"), col("score").desc, col("doc_id"))
  }

  def bm25MultiTopKSql(queries: Seq[(Long, Seq[String])], k: Int = 5): String = {
    val unionTerms = queries.flatMap(_._2).distinct
    val termList = unionTerms.map(t => s"'$t'").mkString(", ")
    val qtValues = queries
      .flatMap { case (qid, ts) => ts.distinct.map(t => s"(CAST($qid AS BIGINT), '$t')") }
      .mkString(", ")
    s"""
    WITH qt(query_id, term) AS (VALUES $qtValues),
    toks AS (
      SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS t FROM documents),
    tf AS (
      SELECT doc_id, len(t) AS dl, unnest(t) AS term FROM toks),
    grouped AS (
      SELECT doc_id, term, dl, COUNT(*) AS tf FROM tf
      WHERE term IN ($termList) GROUP BY 1, 2, 3),
    stats AS (
      SELECT COUNT(*) AS n_docs,
             CAST(SUM(CASE WHEN len(t) = 1 AND t[1] = '' THEN 0 ELSE len(t) END) AS BIGINT) AS total_dl
      FROM toks),
    df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM grouped GROUP BY term),
    scored AS (
      SELECT q.query_id, g.doc_id,
             ln(1.0e0 + (s.n_docs - d.df + 0.5e0) / (d.df + 0.5e0)) *
             (g.tf * (${K1}e0 + 1)) /
             (g.tf + ${K1}e0 * (1e0 - ${B}e0 + ${B}e0 * g.dl / (CAST(s.total_dl AS DOUBLE) / s.n_docs))) AS score_term
      FROM grouped g JOIN df d ON g.term = d.term CROSS JOIN stats s
      JOIN qt q ON g.term = q.term),
    agg AS (
      SELECT query_id, doc_id, ROUND(SUM(score_term), 6) AS score,
             COUNT(*) AS n_terms_hit
      FROM scored GROUP BY 1, 2),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY score DESC, doc_id) AS rn FROM agg)
    SELECT query_id, doc_id, score, n_terms_hit
    FROM ranked WHERE rn <= $k
    ORDER BY query_id, score DESC, doc_id"""
  }

  def bm25TopKSql(queryTerms: Seq[String], k: Int = 15): String = {
    val termList = queryTerms.map(t => s"'$t'").mkString(", ")
    s"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS t FROM documents),
    tf AS (
      SELECT doc_id, len(t) AS dl, unnest(t) AS term FROM toks),
    grouped AS (
      SELECT doc_id, term, dl, COUNT(*) AS tf FROM tf
      WHERE term IN ($termList) GROUP BY 1, 2, 3),
    stats AS (
      SELECT COUNT(*) AS n_docs,
             CAST(SUM(CASE WHEN len(t) = 1 AND t[1] = '' THEN 0 ELSE len(t) END) AS BIGINT) AS total_dl
      FROM toks),
    df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM grouped GROUP BY term),
    scored AS (
      SELECT g.doc_id,
             ln(1.0e0 + (s.n_docs - d.df + 0.5e0) / (d.df + 0.5e0)) *
             (g.tf * (${K1}e0 + 1)) /
             (g.tf + ${K1}e0 * (1e0 - ${B}e0 + ${B}e0 * g.dl / (CAST(s.total_dl AS DOUBLE) / s.n_docs))) AS score_term
      FROM grouped g JOIN df d ON g.term = d.term CROSS JOIN stats s)
    SELECT doc_id, ROUND(SUM(score_term), 6) AS score, COUNT(*) AS n_terms_hit
    FROM scored GROUP BY doc_id ORDER BY score DESC, doc_id LIMIT $k"""
  }

  /** R4: hybrid retrieval via reciprocal-rank fusion of BM25 (sparse)
    * and cosine (dense) rankings, joined on doc_id = vec_id.
    * RRF(d) = Σ 1/(60 + rank_i(d)) — rank-based, so float noise in the
    * underlying scores never reaches the fused result. */
  def hybridRrf(spark: SparkSession, dir: String, queryTerms: Seq[String],
      queryVecId: Long = 0, k: Int = 10, poolSize: Int = 100): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sparse = bm25TopK(spark, dir, queryTerms, poolSize)
      .withColumn("rank_sparse", row_number().over(
        Window.orderBy(col("score").desc, col("doc_id"))))
      .select(col("doc_id"), col("rank_sparse"))
    val dense = VectorOps.cosineTopK(spark, dir, queryVecId, poolSize)
      .withColumn("rank_dense", row_number().over(
        Window.orderBy(col("score").desc, col("vec_id"))))
      .select(col("vec_id").as("doc_id"), col("rank_dense"))
    sparse.join(dense, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        (coalesce(lit(1.0) / (lit(60) + col("rank_sparse")), lit(0.0)) +
         coalesce(lit(1.0) / (lit(60) + col("rank_dense")), lit(0.0))).as("rrf"))
      .select(col("doc_id"), round(col("rrf"), 6).as("rrf"))
      .orderBy(col("rrf").desc, col("doc_id"))
      .limit(k)
  }

  def hybridRrfSql(queryTerms: Seq[String], queryVecId: Long = 0, k: Int = 10, poolSize: Int = 100): String = s"""
    WITH sparse AS (
      SELECT doc_id, ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rank_sparse
      FROM (${Bm25.bm25TopKSql(queryTerms, poolSize)}) s),
    dense AS (
      SELECT vec_id AS doc_id, ROW_NUMBER() OVER (ORDER BY score DESC, vec_id) AS rank_dense
      FROM (${VectorOps.cosineTopKSql(queryVecId, poolSize)}) d)
    SELECT COALESCE(sparse.doc_id, dense.doc_id) AS doc_id,
           ROUND(COALESCE(1.0e0 / (60 + rank_sparse), 0.0e0) +
                 COALESCE(1.0e0 / (60 + rank_dense), 0.0e0), 6) AS rrf
    FROM sparse FULL OUTER JOIN dense ON sparse.doc_id = dense.doc_id
    ORDER BY rrf DESC, doc_id LIMIT $k"""
}
