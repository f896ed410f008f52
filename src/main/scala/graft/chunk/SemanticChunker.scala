package graft.chunk

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.text.TextFunctions

/** C3: semantic splitter (reference: chunking_manager.py:71-72 —
  * `SemanticChunker(embeddings, min_chunk_size=int(chunk_size/3))`):
  * split into sentences, embed each, break where the embedding distance
  * between consecutive sentences exceeds the corpus-relative threshold
  * (95th percentile of the document's distances), never emitting a
  * chunk below `min_chunk_size` characters.
  *
  * The reference embeds with a served model; in a no-egress build the
  * embedding is a deterministic hash projection (SURVEY.md §7.5): each
  * token lands on `dims` buckets via the portable md5-derived hash with
  * a ±1 sign bit, so a sentence's vector is an integer bag-of-words
  * sketch. Cosine-adjacent distance becomes integer squared-L2 between
  * consecutive sketches — integer-exact on every engine, which is what
  * makes this chunker fully oracle-checkable (chunk boundaries, counts
  * and md5s all hash-match DuckDB).
  *
  * Scale shape: every stage — sentences, sketches, adjacent distances,
  * the percentile threshold, the greedy walk — is document-local, so
  * the operator is ONE map-side pass over the documents table (zero
  * shuffles before the presentation sort; embarrassingly parallel at
  * any scale). The equivalent relational program is what the DuckDB
  * oracle runs ([[semanticChunksSql]]), and the driver gate holds the
  * two to hash equality.
  */
object SemanticChunker {

  /** (doc_id, chunk_idx, n_sentences, chunk) rows with the chunk TEXT —
    * the composable form ([[graft.Pipeline]] plugs this in as the
    * `semantic` splitter). */
  def semanticChunkTable(spark: SparkSession, dir: String, dims: Int = 16,
      minChunk: Int = 66, p: Double = 0.95): DataFrame =
    semanticChunkTableOf(Tables.documents(spark, dir), dims, minChunk, p)

  /** Same over an arbitrary documents frame (needs doc_id + text) —
    * the form micro-batches feed in streaming chunking
    * (StreamingRunner.runStreamingChunks): the operator is
    * document-local, so it is trivially streaming-safe. */
  def semanticChunkTableOf(docs0: DataFrame, dims: Int = 16,
      minChunk: Int = 66, p: Double = 0.95): DataFrame = {
    val spark = docs0.sparkSession
    import spark.implicits._
    val docs = docs0
      .filter(length(col("text")) > 0)
      .select(col("doc_id"), TextFunctions.normalize(col("text")).as("t"))
      .filter(length(col("t")) > 0)
      .as[(Long, String)]
    // Everything below is DOCUMENT-LOCAL (sentences, sketches, adjacent
    // distances, the percentile threshold and the greedy walk all live
    // inside one document), so the whole operator is a single map-side
    // pass: one MessageDigest per partition, one md5 per token, zero
    // shuffles before the presentation sort. The relational formulation
    // lives in [[semanticChunksSql]], which the driver gate holds this
    // implementation to, hash-for-hash.
    docs.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.flatMap { case (id, t) => chunkDoc(md, id, t, dims, minChunk, p) }
    }.toDF("doc_id", "chunk_idx", "n_sentences", "chunk")
  }

  /** (doc_id, chunk_idx, n_sentences, chunk_len, chunk_md5) per
    * semantic chunk — the driver-gated query form. */
  def semanticChunks(spark: SparkSession, dir: String, dims: Int = 16,
      minChunk: Int = 66, p: Double = 0.95): DataFrame =
    semanticChunkTable(spark, dir, dims, minChunk, p)
      .select(col("doc_id"), col("chunk_idx"), col("n_sentences"),
        length(col("chunk")).cast("long").as("chunk_len"),
        md5(col("chunk").cast("binary")).as("chunk_md5"))
      .orderBy(col("doc_id"), col("chunk_idx"))

  /** Per-document chunking: sentence segmentation (punctuation + the
    * shared 8-word line synthesis — same regexes as the Column
    * pipeline, same Java engine), ±1 hash sketches, integer squared-L2
    * adjacent distances, exact-percentile threshold, greedy min-size
    * walk. Pure function over one document. */
  /** Sentence segmentation: break after [.!?]-space; the single-line
    * testdata docs carry no punctuation, so the 8-word line synthesis
    * (MarkdownOps.synthesizeLines convention) provides the base
    * segmentation. Every boundary consumes exactly one space, so chunk
    * lengths stay reconstruction-exact. */
  private[chunk] def sentences(t: String): Array[String] = t
    .replaceAll("((?:\\S+ ){7}\\S+) ", "$1\n")
    .replaceAll("([.!?]) ", "$1\n")
    .split("\n", -1)

  /** Exact p-quantile with linear interpolation (the same formula as
    * Spark `percentile` and DuckDB `quantile_cont`), then break where
    * strictly above. */
  private[chunk] def quantileBreaks(dists: Array[Double], p: Double): Array[Boolean] =
    if (dists.isEmpty) Array.empty
    else {
      val sorted = dists.sorted
      val rank = p * (sorted.length - 1)
      val lo = math.floor(rank).toInt
      val hi = math.ceil(rank).toInt
      val q = if (lo == hi) sorted(lo) else sorted(lo) + (sorted(hi) - sorted(lo)) * (rank - lo)
      dists.map(_ > q)
    }

  /** Greedy min-size walk over sentence boundaries: keep a breakpoint
    * only once the current chunk has at least `minChunk` joined chars.
    * Returns inclusive (start, end) sentence ranges. */
  private[chunk] def greedyWalk(ss: Array[String], breaks: Array[Boolean],
      minChunk: Int): Vector[(Int, Int)] = {
    val out = Vector.newBuilder[(Int, Int)]
    val n = ss.length
    var cs = 0
    var curLen = ss(0).length
    var i = 1
    while (i < n) {
      if (breaks(i - 1) && curLen >= minChunk) {
        out += ((cs, i - 1)); cs = i; curLen = ss(i).length
      } else curLen += 1 + ss(i).length
      i += 1
    }
    out += ((cs, n - 1))
    out.result()
  }

  private def chunkDoc(md: java.security.MessageDigest, id: Long, t: String,
      dims: Int, minChunk: Int, p: Double): Iterator[(Long, Long, Long, String)] = {
    val ss: Array[String] = sentences(t)
    val n = ss.length
    // integer bag-of-words sketch per sentence: token -> (h % dims, ±1)
    // with h = the portable md5-derived 60-bit hash (TextFunctions.md5Long)
    val vecs = Array.ofDim[Long](n, dims)
    var si = 0
    while (si < n) {
      for (tok <- ss(si).toLowerCase(java.util.Locale.ROOT).split("\\s+", -1)) {
        md.reset()
        val digest = md.digest(tok.getBytes("UTF-8"))
        // the first 15 hex digits of the md5 as a 60-bit value, straight
        // from the bytes (identical to parseLong(hex.take(15), 16) —
        // bytes 0..6 are digit pairs, byte 7's high nibble is digit 15;
        // the hex round-trip dominated this loop's profile)
        val h = ((digest(0) & 0xffL) << 52) | ((digest(1) & 0xffL) << 44) |
          ((digest(2) & 0xffL) << 36) | ((digest(3) & 0xffL) << 28) |
          ((digest(4) & 0xffL) << 20) | ((digest(5) & 0xffL) << 12) |
          ((digest(6) & 0xffL) << 4) | ((digest(7) & 0xffL) >>> 4)
        val sg = if ((h / dims) % 2 == 0) 1L else -1L
        vecs(si)((h % dims).toInt) += sg
      }
      si += 1
    }
    // ||a-b||^2 between consecutive sketches — integer-exact
    val dists = Array.tabulate(math.max(n - 1, 0)) { i =>
      var d = 0L
      var j = 0
      while (j < dims) {
        val diff = vecs(i)(j) - vecs(i + 1)(j); d += diff * diff; j += 1
      }
      d
    }
    val breaks = quantileBreaks(dists.map(_.toDouble), p)
    greedyWalk(ss, breaks, minChunk).zipWithIndex.map { case ((a, b), idx) =>
      (id, idx.toLong, (b - a + 1).toLong, ss.slice(a, b + 1).mkString("\n"))
    }.iterator
  }

  /** C3 with a REAL embedding model (the reference's actual contract —
    * `SemanticChunker(embeddings, …)` takes the injected embedder):
    * sentence vectors come from [[graft.vector.HashingEmbedder]]
    * (feature hashing + corpus IDF + JL projection, trained
    * distributedly, broadcast to the chunk pass), adjacent distance is
    * cosine distance between unit vectors, then the same exact-quantile
    * threshold and greedy min-size walk as [[chunkDoc]].
    *
    * Model-driven boundaries are not blind-SQL computable, so the gate
    * is the invariant-oracle pattern — exact column n_sentences
    * (segmentation is model-independent) plus per-document contract
    * booleans: reconstruct_ok (chunk lengths + one joiner per boundary
    * re-assemble the normalized text exactly), minchunk_ok (every
    * non-final chunk ≥ minChunk), bounds_ok (1 ≤ chunks ≤ sentences). */
  def semanticChunkEmbedInvariants(spark: SparkSession, dir: String,
      minChunk: Int = 66, p: Double = 0.95): DataFrame = {
    import spark.implicits._
    val all = Tables.documents(spark, dir)
    val model = graft.vector.HashingEmbedder.train(spark, all)
    val bc = spark.sparkContext.broadcast(model)
    all
      .filter(length(col("text")) > 0)
      .select(col("doc_id"), TextFunctions.normalize(col("text")).as("t"))
      .filter(length(col("t")) > 0)
      .as[(Long, String)]
      .mapPartitions { it =>
        val m = bc.value
        it.map { case (id, t) =>
          val ss = sentences(t)
          val vecs = ss.map(s => graft.vector.HashingEmbedder.embedTokens(
            s.toLowerCase(java.util.Locale.ROOT).split("\\s+", -1).toSeq, m))
          val dists = Array.tabulate(math.max(ss.length - 1, 0)) { i =>
            // unit (or zero) vectors: cosine distance = 1 − dot. Tight
            // primitive loop — the zip/map/sum form boxed every element
            // and allocated a tuple array per sentence pair; same
            // left-to-right IEEE summation order, bit-identical value.
            val a = vecs(i); val b = vecs(i + 1)
            var s = 0.0
            var j = 0
            while (j < a.length) { s += a(j).toDouble * b(j); j += 1 }
            1.0 - s
          }
          val ranges = greedyWalk(ss, quantileBreaks(dists, p), minChunk)
          val lens = ranges.map { case (a, b) =>
            ss.slice(a, b + 1).mkString("\n").length.toLong }
          (id, ss.length.toLong,
            lens.sum + (ranges.length - 1) == t.length.toLong,
            lens.dropRight(1).forall(_ >= minChunk),
            ranges.nonEmpty && ranges.length <= ss.length)
        }
      }
      .toDF("doc_id", "n_sentences", "reconstruct_ok", "minchunk_ok", "bounds_ok")
      .orderBy(col("doc_id"))
  }

  /** Blind oracle for [[semanticChunkEmbedInvariants]]: exact sentence
    * count via the same segmentation regexes, booleans contractual. */
  def semanticChunkEmbedInvariantsSql(normExpr: String): String = s"""
    WITH docs AS (
      SELECT doc_id, t FROM (
        SELECT doc_id, $normExpr AS t FROM documents WHERE length(text) > 0)
      WHERE length(t) > 0),
    marked AS (
      SELECT doc_id,
             regexp_replace(regexp_replace(t, '((?:\\S+ ){7}\\S+) ', '\\1' || chr(10), 'g'),
                            '([.!?]) ', '\\1' || chr(10), 'g') AS m
      FROM docs)
    SELECT doc_id, CAST(len(string_split(m, chr(10))) AS BIGINT) AS n_sentences,
           TRUE AS reconstruct_ok, TRUE AS minchunk_ok, TRUE AS bounds_ok
    FROM marked ORDER BY doc_id"""

  /** Same program in DuckDB SQL: the walk's sequential state becomes a
    * recursive CTE over sentence index, everything else is the same
    * relational plan. `normExpr` is the normalization chain over
    * `text`. */
  def semanticChunksSql(normExpr: String, dims: Int = 16, minChunk: Int = 66,
      p: Double = 0.95): String = s"""
    WITH RECURSIVE
    docs AS (
      SELECT doc_id, t FROM (
        SELECT doc_id, $normExpr AS t FROM documents WHERE length(text) > 0)
      WHERE length(t) > 0),
    marked AS (
      SELECT doc_id,
             regexp_replace(regexp_replace(t, '((?:\\S+ ){7}\\S+) ', '\\1' || chr(10), 'g'),
                            '([.!?]) ', '\\1' || chr(10), 'g') AS m
      FROM docs),
    sents AS (
      SELECT doc_id, u.i - 1 AS sent_idx, u.s AS sentence
      FROM marked, LATERAL (
        SELECT unnest(string_split(m, chr(10))) AS s,
               generate_subscripts(string_split(m, chr(10)), 1) AS i) u),
    nsent AS (SELECT doc_id, COUNT(*) AS n FROM sents GROUP BY doc_id),
    toks AS (
      SELECT doc_id, sent_idx, u.tok
      FROM sents, LATERAL (SELECT unnest(string_split_regex(lower(sentence), '\\s+')) AS tok) u),
    dimvals AS (
      SELECT doc_id, sent_idx, h % $dims AS dim,
             SUM(CASE WHEN (h // $dims) % 2 = 0 THEN 1 ELSE -1 END) AS s
      FROM (SELECT doc_id, sent_idx,
                   CAST('0x' || substr(md5(tok), 1, 15) AS BIGINT) AS h FROM toks)
      GROUP BY doc_id, sent_idx, h % $dims),
    n2 AS (SELECT doc_id, sent_idx, SUM(s * s) AS n2 FROM dimvals GROUP BY doc_id, sent_idx),
    dots AS (
      SELECT a.doc_id, b.sent_idx AS i, SUM(a.s * b.s) AS dp
      FROM dimvals a JOIN dimvals b
        ON a.doc_id = b.doc_id AND a.dim = b.dim AND b.sent_idx = a.sent_idx + 1
      GROUP BY a.doc_id, b.sent_idx),
    bounds AS (
      SELECT cur.doc_id, cur.sent_idx AS i,
             prev.n2 + cur.n2 - 2 * COALESCE(d.dp, 0) AS dist2
      FROM n2 cur
      JOIN n2 prev ON prev.doc_id = cur.doc_id AND prev.sent_idx = cur.sent_idx - 1
      LEFT JOIN dots d ON d.doc_id = cur.doc_id AND d.i = cur.sent_idx),
    thr AS (SELECT doc_id, quantile_cont(CAST(dist2 AS DOUBLE), $p) AS q FROM bounds GROUP BY doc_id),
    brk AS (
      SELECT b.doc_id, b.i, CAST(b.dist2 AS DOUBLE) > t.q AS raw_break
      FROM bounds b JOIN thr t ON t.doc_id = b.doc_id),
    pre AS (
      SELECT doc_id, sent_idx, length(sentence) AS ln,
             SUM(length(sentence)) OVER (PARTITION BY doc_id ORDER BY sent_idx
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - length(sentence) AS prefix
      FROM sents),
    walk AS (
      SELECT doc_id, 0 AS i, 0 AS cs FROM docs
      UNION ALL
      SELECT w.doc_id, w.i + 1,
             CASE WHEN b.raw_break AND
                       (p1.prefix - p0.prefix + (w.i - w.cs)) >= $minChunk
                  THEN w.i + 1 ELSE w.cs END
      FROM walk w
      JOIN nsent n ON n.doc_id = w.doc_id AND w.i + 1 < n.n
      JOIN brk b ON b.doc_id = w.doc_id AND b.i = w.i + 1
      JOIN pre p1 ON p1.doc_id = w.doc_id AND p1.sent_idx = w.i + 1
      JOIN pre p0 ON p0.doc_id = w.doc_id AND p0.sent_idx = w.cs),
    chunks AS (
      SELECT s.doc_id, w.cs,
             COUNT(*) AS n_sentences,
             SUM(length(s.sentence)) + COUNT(*) - 1 AS chunk_len,
             md5(string_agg(s.sentence, chr(10) ORDER BY s.sent_idx)) AS chunk_md5
      FROM sents s JOIN walk w ON w.doc_id = s.doc_id AND w.i = s.sent_idx
      GROUP BY s.doc_id, w.cs)
    SELECT doc_id,
           CAST(ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY cs) - 1 AS BIGINT) AS chunk_idx,
           CAST(n_sentences AS BIGINT) AS n_sentences,
           CAST(chunk_len AS BIGINT) AS chunk_len, chunk_md5
    FROM chunks ORDER BY doc_id, chunk_idx"""
}
