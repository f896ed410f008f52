package graft.vector

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Vector similarity operators (SURVEY.md §2.11 R1/R2 +
  * the north-star ANN/dedup surface) over `embeddings(vec_id,
  * embedding ARRAY<FLOAT>, label)`.
  *
  * Scoring runs through NATIVE codegen expressions
  * ([[graft.functions.DotProduct]]/L2Squared — tight primitive loops in
  * the scan stage; the earlier higher-order `zip_with`+`aggregate`
  * forms were CodegenFallback). Arrays are cast to double BEFORE any
  * arithmetic and summation is sequential left-to-right, so scores are
  * bit-identical to the DuckDB oracle's
  * `list_dot_product(CAST(… AS DOUBLE[]), …)`.
  *
  * Scale stance: brute-force top-k is the *baseline* (a single scan +
  * TakeOrderedAndProject — embarrassingly parallel, no shuffle); the
  * 100 TB path is [[signLshBucket]] bucketing, which turns the all-pairs
  * problem into per-bucket joins (shuffle keyed on a 1-byte bucket id).
  */
object VectorOps {

  /** Cast an ARRAY<FLOAT> column to ARRAY<DOUBLE> — a native Cast
    * (codegen), exact widening; the former `transform` lambda was a
    * CodegenFallback boundary in every scoring scan. */
  def asDouble(v: Column): Column = v.cast("array<double>")

  /** Dot product — native codegen expression
    * ([[graft.functions.DotProduct]]): a primitive loop in the scan
    * stage instead of an interpreted zip+fold. Sequential
    * left-to-right summation, so doubles agree exactly with DuckDB's
    * list_dot_product (reference semantics: index_manager.py:187-190,
    * IndexFlatIP). */
  def dot(a: Column, b: Column): Column = graft.functions.DotProduct.dot(a, b)

  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity (R1; index_manager.py:111 Distance.COSINE). */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** [[cosine]] with the QUERY side's norm precomputed (`qn` =
    * `l2Norm(q)`, carried in the broadcast query row or as a literal):
    * the plain form evaluates THREE dot products per corpus row, and
    * one of them — `dot(q, q)` — is a constant the optimizer cannot
    * fold (custom expressions are non-foldable), so every brute scan
    * recomputed the query's norm per row. Bit-identical scores: `qn`
    * is the same double `l2Norm(q)` produced inline, and the
    * divide/multiply tree is unchanged. */
  def cosineQn(v: Column, q: Column, qn: Column): Column =
    dot(v, q) / (l2Norm(v) * qn)

  /** Driver-side twin of [[l2Norm]] for literal query vectors — the
    * same sequential left-to-right summation as [[dot]], so the
    * resulting double is bit-identical to evaluating `l2Norm(lit(q))`
    * per row. */
  def l2NormOf(q: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i < q.length) { s += q(i) * q(i); i += 1 }
    math.sqrt(s)
  }

  /** Cosine with a zero-norm guard: a degenerate (all-zero) vector
    * scores `fallback` instead of raising DIVIDE_BY_ZERO under ANSI
    * mode (Spark 4 default) — the If short-circuits, so the division
    * never executes for the zero branch. Identical to [[cosine]] for
    * every non-degenerate row; use where vectors come from INFERENCE,
    * which can legitimately emit the zero vector (all hashed weights
    * cancelled — see HashingEmbedder.embedTokens). */
  def cosineOrElse(a: Column, b: Column, fallback: Double): Column = {
    val denom = l2Norm(a) * l2Norm(b)
    when(denom === 0.0, lit(fallback)).otherwise(dot(a, b) / denom)
  }

  /** [[cosineOrElse]] with the query norm precomputed ([[cosineQn]]'s
    * rationale); `qn = 0` (zero query vector) zeroes the denominator
    * exactly as the inline form did, so the fallback branch is
    * unchanged. */
  def cosineOrElseQn(a: Column, q: Column, qn: Column, fallback: Double): Column = {
    val denom = l2Norm(a) * qn
    when(denom === 0.0, lit(fallback)).otherwise(dot(a, q) / denom)
  }

  /** Squared euclidean distance (R2; Distance.EUCLID / IndexFlatL2 —
    * FAISS also returns *squared* L2 for flat indexes). Native codegen,
    * same element order as the zip_with fold it replaces. */
  def l2Squared(a: Column, b: Column): Column = graft.functions.DotProduct.l2sq(a, b)

  /** Axis-aligned sign-LSH bucket id from the first `bits` vector
    * components: bit i = sign(v[i]). The weakest hyperplane family
    * (ignores all but the first `bits` dimensions) — kept as the
    * baseline that [[rhpLshBucket]] is measured against. */
  def signLshBucket(v: Column, bits: Int = 8): Column =
    (0 until bits)
      .map(i => when(element_at(v, i + 1) > 0, lit(1L << i)).otherwise(lit(0L)))
      .reduce(_ + _)

  /** splitmix64 finalizer — the deterministic expansion behind the
    * hyperplane matrix (public-domain mixing constants). */
  private def mix64(x: Long): Long = {
    var z = x + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Deterministic ±1 (Rademacher) hyperplane matrix, `bits` x `dim`.
    * Seeded, so Spark and the oracle bake the SAME literal matrix into
    * their plans — the projection is data-independent model input, not
    * state. */
  def hyperplaneSigns(bits: Int, dim: Int, seed: Long = 42L): Array[Array[Double]] =
    Array.tabulate(bits, dim)((i, j) =>
      if ((mix64(seed + i.toLong * dim + j) & 1L) == 0L) 1.0 else -1.0)

  /** Random-hyperplane sign-LSH (Charikar's SimHash for real vectors):
    * bit i = sign(<v, r_i>) with r_i a seeded ±1 hyperplane. Uses every
    * dimension, so collision probability tracks cosine similarity —
    * measurably better recall than the axis-aligned baseline at the
    * same bucket-join plan shape (AnnQualitySpec). `v` must already be
    * a double array. */
  def rhpLshBucket(v: Column, bits: Int = 8, dim: Int = 64, seed: Long = 42L): Column = {
    val planes = hyperplaneSigns(bits, dim, seed)
    (0 until bits)
      .map { i =>
        val r = array(planes(i).map(lit): _*)
        when(dot(v, r) > 0, lit(1L << i)).otherwise(lit(0L))
      }
      .reduce(_ + _)
  }

  /** The same projection as a SQL expression over a DOUBLE[] column. */
  def rhpLshBucketSql(vExpr: String, bits: Int = 8, dim: Int = 64, seed: Long = 42L): String = {
    val planes = hyperplaneSigns(bits, dim, seed)
    (0 until bits)
      .map { i =>
        val arr = planes(i).map(x => if (x > 0) "1.0" else "-1.0").mkString("[", ", ", "]")
        s"CASE WHEN list_dot_product($vExpr, $arr) > 0 THEN ${1L << i} ELSE 0 END"
      }
      .mkString("(", " + ", ")::BIGINT")
  }

  /** Corpus-side nearest-centroid id over a broadcast
    * `centroid_arr` column (array of struct(list_id, cv), sorted by
    * list_id): a min-by FOLD — O(nlist) per row, no materialized
    * sorted array. Selection is value-identical to the array_sort
    * form it replaces everywhere the caller only needs the ARGMIN:
    * distances compare ROUNDED (9 dp) exactly as before, and strict
    * `<` keeps the FIRST minimum, so ties resolve to the smaller
    * list_id — array_sort's (dist2, list_id) ascending tie-break.
    * (Same rewrite as KMeans.nearestCentroid, r19.) */
  private[vector] def nearestListId(vcol: Column, centroidArr: Column): Column =
    aggregate(
      centroidArr,
      struct(lit(Double.PositiveInfinity).as("dist2"),
        lit(Long.MaxValue).as("list_id")),
      (acc, c) => {
        val d = round(l2Squared(vcol, c.getField("cv")), 9)
        when(d < acc.getField("dist2"),
          struct(d.as("dist2"), c.getField("list_id").as("list_id")))
          .otherwise(acc)
      }).getField("list_id")

  /** Query row: the embedding of a fixed vec_id, crossed (broadcast,
    * 1 row) against the whole table. */
  private def queryVec(spark: SparkSession, dir: String, id: Long): DataFrame =
    Tables.embeddings(spark, dir).filter(col("vec_id") === id)
      .select(asDouble(col("embedding")).as("qvec"))

  /** [[queryVec]] plus the query's precomputed norm — the broadcast
    * row carries `qn` once instead of every corpus row recomputing
    * `sqrt(dot(q, q))` (see [[cosineQn]]). */
  private def queryVecN(spark: SparkSession, dir: String, id: Long): DataFrame =
    Tables.embeddings(spark, dir).filter(col("vec_id") === id)
      .select(asDouble(col("embedding")).as("qvec"),
        l2Norm(asDouble(col("embedding"))).as("qn"))

  /** R1: brute-force cosine top-k against a fixed query vector.
    * Single scan; TakeOrderedAndProject does distributed top-k.
    * Scores are rounded to 6 decimals for hash stability and ties
    * broken on vec_id. */
  def cosineTopK(spark: SparkSession, dir: String, queryId: Long = 0, k: Int = 20): DataFrame =
    Tables.embeddings(spark, dir)
      .crossJoin(broadcast(queryVecN(spark, dir, queryId)))
      .select(col("vec_id"), col("label").cast("long").as("label"),
        round(cosineQn(asDouble(col("embedding")), col("qvec"), col("qn")), 6).as("score"))
      .orderBy(col("score").desc, col("vec_id"))
      .limit(k)

  def cosineTopKSql(queryId: Long = 0, k: Int = 20): String = s"""
    WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qvec FROM embeddings WHERE vec_id = $queryId)
    SELECT vec_id, CAST(label AS BIGINT) AS label,
           ROUND(list_dot_product(CAST(embedding AS DOUBLE[]), qvec) /
                 (sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) *
                  sqrt(list_dot_product(qvec, qvec))), 6) AS score
    FROM embeddings, q
    ORDER BY score DESC, vec_id LIMIT $k"""

  /** RADIUS (range) search: every vector within a cosine-similarity
    * threshold of the query — the "all near-duplicates of X" / recall
    * primitive top-k cannot express (k is unknown; the answer is a
    * neighborhood, not a ranking). Plan: broadcast the query vector,
    * one map-side filter over the corpus — NO sort, NO limit, NO
    * shuffle of the embedding column at any scale; the output is the
    * matching rows only. The threshold compares the ROUNDED score
    * (6 dp), the same canonicalization the top-k family hashes, so
    * both engines agree at the boundary. */
  def rangeSearch(spark: SparkSession, dir: String, queryId: Long = 0,
      minScore: Double = 0.2): DataFrame =
    Tables.embeddings(spark, dir)
      .crossJoin(broadcast(queryVecN(spark, dir, queryId)))
      .select(col("vec_id"), col("label").cast("long").as("label"),
        round(cosineQn(asDouble(col("embedding")), col("qvec"), col("qn")), 6).as("score"))
      .filter(col("score") >= minScore)
      .orderBy(col("vec_id"))

  def rangeSearchSql(queryId: Long = 0, minScore: Double = 0.2): String = s"""
    WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qvec FROM embeddings WHERE vec_id = $queryId)
    SELECT vec_id, CAST(label AS BIGINT) AS label, score FROM (
      SELECT vec_id, label,
             ROUND(list_dot_product(CAST(embedding AS DOUBLE[]), qvec) /
                   (sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) *
                    sqrt(list_dot_product(qvec, qvec))), 6) AS score
      FROM embeddings, q)
    WHERE score >= $minScore ORDER BY vec_id"""

  /** R2: brute-force squared-L2 top-k (ascending). */
  def l2TopK(spark: SparkSession, dir: String, queryId: Long = 0, k: Int = 20): DataFrame =
    Tables.embeddings(spark, dir)
      .crossJoin(broadcast(queryVec(spark, dir, queryId)))
      .select(col("vec_id"), round(l2Squared(asDouble(col("embedding")), col("qvec")), 6).as("dist2"))
      .orderBy(col("dist2"), col("vec_id"))
      .limit(k)

  def l2TopKSql(queryId: Long = 0, k: Int = 20): String = s"""
    WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qvec FROM embeddings WHERE vec_id = $queryId)
    SELECT vec_id,
           ROUND(list_sum(list_transform(generate_series(1, len(qvec)),
                 i -> (CAST(embedding[i] AS DOUBLE) - qvec[i]) * (CAST(embedding[i] AS DOUBLE) - qvec[i]))), 6) AS dist2
    FROM embeddings, q
    ORDER BY dist2, vec_id LIMIT $k"""

  /** ANN via random-hyperplane LSH: candidates = same bucket as the
    * query, then exact cosine re-rank within the bucket. At 100 TB this
    * is a bucket-pruned scan (partition by bucket) instead of a full
    * sweep. */
  def annLshTopK(spark: SparkSession, dir: String, queryId: Long = 0, k: Int = 10,
      bits: Int = 8, dim: Int = 64): DataFrame = {
    val q = Tables.embeddings(spark, dir).filter(col("vec_id") === queryId)
      .select(asDouble(col("embedding")).as("qvec"),
        l2Norm(asDouble(col("embedding"))).as("qn"),
        rhpLshBucket(asDouble(col("embedding")), bits, dim).as("qbucket"))
    Tables.embeddings(spark, dir)
      .withColumn("bucket", rhpLshBucket(asDouble(col("embedding")), bits, dim))
      .join(broadcast(q), col("bucket") === col("qbucket"))
      .select(col("vec_id"), col("bucket"),
        round(cosineQn(asDouble(col("embedding")), col("qvec"), col("qn")), 6).as("score"))
      .orderBy(col("score").desc, col("vec_id"))
      .limit(k)
  }

  def annLshTopKSql(queryId: Long = 0, k: Int = 10, bits: Int = 8, dim: Int = 64): String = s"""
    WITH b AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
             ${rhpLshBucketSql(s"CAST(embedding AS DOUBLE[])", bits, dim)} AS bucket
      FROM embeddings),
    q AS (SELECT v AS qvec, bucket AS qbucket FROM b WHERE vec_id = $queryId)
    SELECT vec_id, bucket,
           ROUND(list_dot_product(v, qvec) /
                 (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qvec, qvec))), 6) AS score
    FROM b, q WHERE bucket = qbucket
    ORDER BY score DESC, vec_id LIMIT $k"""

  /** IVF-style ANN (the other scale path besides LSH): a deterministic
    * one-step inverted-file index. Centroids = the first `nlist`
    * vectors by vec_id (a deterministic seeding; a production build
    * would k-means these — the query/partition shape is identical);
    * every vector is assigned to its nearest centroid (its "list");
    * a query probes the `nprobe` centroids nearest to it and scans only
    * those lists, then exact-cosine re-ranks. At 100 TB the table is
    * partitioned by list id, so a query touches nprobe/nlist of the
    * data. Assignment = argmin L2 over a broadcast centroid set. */
  def ivfTopK(spark: SparkSession, dir: String, queryId: Long = 0,
      k: Int = 10, nlist: Int = 16, nprobe: Int = 4): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
    val centroids = emb.filter(col("vec_id") < nlist)
      .select(col("vec_id").as("list_id"), col("v").as("cv"))
    // nearest-centroid PROBE list (query row only): sort of the scored
    // centroid structs, top-n list ids
    def nearestLists(vcol: Column, n: Int): Column = {
      val scored = array_sort(aggListExpr(vcol))
      slice(transform(scored, s => s.getField("list_id")), 1, n)
    }
    // helper: array of (dist2 rounded for determinism, list_id)
    def aggListExpr(vcol: Column): Column =
      transform(
        col("centroid_arr"),
        c => struct(
          round(l2Squared(vcol, c.getField("cv")), 9).as("dist2"),
          c.getField("list_id").as("list_id")))
    val centroidArr = centroids
      .agg(sort_array(collect_list(struct(col("list_id"), col("cv")))).as("centroid_arr"))
    // corpus-side assignment is argmin only — the min-by fold (O(nlist),
    // no per-row sorted array) with the identical selection rule; the
    // full sort stays on the 1-row query probe above
    val assigned = emb.crossJoin(broadcast(centroidArr))
      .withColumn("list_id", nearestListId(col("v"), col("centroid_arr")))
      .select(col("vec_id"), col("v"), col("list_id"))
    val q = emb.filter(col("vec_id") === queryId)
      .crossJoin(broadcast(centroidArr))
      .select(col("v").as("qvec"), l2Norm(col("v")).as("qn"),
        explode(nearestLists(col("v"), nprobe)).as("list_id"))
    assigned.join(broadcast(q), Seq("list_id"))
      .select(col("vec_id"), col("list_id"),
        round(cosineQn(col("v"), col("qvec"), col("qn")), 6).as("score"))
      .orderBy(col("score").desc, col("vec_id"))
      .limit(k)
  }

  def ivfTopKSql(queryId: Long = 0, k: Int = 10, nlist: Int = 16, nprobe: Int = 4): String = s"""
    WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    cent AS (SELECT vec_id AS list_id, v AS cv FROM emb WHERE vec_id < $nlist),
    dists AS (
      SELECT e.vec_id, e.v, c.list_id,
             ROUND(list_sum(list_transform(generate_series(1, len(e.v)),
                   i -> (e.v[i] - c.cv[i]) * (e.v[i] - c.cv[i]))), 9) AS dist2
      FROM emb e CROSS JOIN cent c),
    assigned AS (
      SELECT vec_id, v, list_id FROM (
        SELECT vec_id, v, list_id,
               ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist2, list_id) AS rn
        FROM dists) t WHERE rn = 1),
    qprobe AS (
      SELECT d.list_id, d.v AS qvec FROM dists d
      WHERE d.vec_id = $queryId
      ORDER BY d.dist2, d.list_id LIMIT $nprobe)
    SELECT a.vec_id, a.list_id,
           ROUND(list_dot_product(a.v, q.qvec) /
                 (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(q.qvec, q.qvec))), 6) AS score
    FROM assigned a JOIN qprobe q ON a.list_id = q.list_id
    ORDER BY score DESC, a.vec_id LIMIT $k"""

  /** Shared PQ machinery: nested position-indexed codebook
    * (cb[s][i] = codeword i of subspace s; seed ids 0..ks-1 are the
    * list positions, so lookups are element_at instead of struct
    * scans), the per-vector code array, the query's nested ADC table,
    * and the code-only distance expression. */
  private def pqParts(emb: DataFrame, queryId: Long, m: Int, dsub: Int,
      ks: Int): (DataFrame, DataFrame, Column) = {
    def sub(v: Column, s: Column): Column = slice(v, s * dsub + 1, lit(dsub))
    def l2n(a: Column, b: Column): Column = // integer nano-units
      round(aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0),
        (acc, x) => acc + x) * 1e9).cast("long")
    val cbNested = emb.filter(col("vec_id") < ks)
      .select(explode(sequence(lit(0), lit(m - 1))).as("s"), col("vec_id").as("i"), col("v"))
      .select(col("s"), col("i"), sub(col("v"), col("s")).as("cv"))
      .groupBy(col("s"))
      .agg(transform(array_sort(collect_list(struct(col("i"), col("cv")))),
        e => e.getField("cv")).as("cvs"))
      .agg(transform(array_sort(collect_list(struct(col("s"), col("cvs")))),
        e => e.getField("cvs")).as("cb"))
    // per-row encode + ADC decode are the corpus-side hot path: native
    // codegen expressions ([[graft.functions.PqOps]]) replace the
    // interpreted HOF fold (min-by over ks (distance, id) pairs per
    // subspace — ~2k lambda evaluations and ~130 array allocations per
    // row at m=8/ks=16/dsub=8). Selection and arithmetic are
    // bit-identical (same sequential double fold, same round-to-nano
    // quantization, same first-strict-minimum tie-break); PqEncodeSpec
    // pins HOF-vs-native equality row-for-row on the real corpus. The
    // query's OWN table (qTab, one row) stays in HOF form.
    val encoded = emb.crossJoin(broadcast(cbNested))
      .select(col("vec_id"),
        graft.functions.PqOps.encode(col("v"), col("cb")).as("codes"))
    val qTab = emb.filter(col("vec_id") === queryId)
      .crossJoin(broadcast(cbNested))
      .select(zip_with(col("cb"), sequence(lit(0), lit(m - 1)),
        (cvs, s) => transform(cvs, cv => l2n(sub(col("v"), s), cv))).as("tab"))
    val dist = graft.functions.PqOps.adc(col("codes"), col("tab"))
    (encoded, qTab, dist)
  }

  /** Product-quantization ANN (the memory-compression scale path: a
    * 64-dim float vector becomes m=8 one-byte codes, 32× smaller —
    * IVF-PQ is how billion-vector indexes fit in RAM). The vector is
    * split into `m` subspaces of `dsub` dims; each subspace has a
    * `ks`-entry codebook (deterministically seeded from the first `ks`
    * vectors, same convention as [[ivfTopK]]); every vector is encoded
    * as its per-subspace nearest-codeword ids; a query scans CODES,
    * not vectors, via an ADC table (per-subspace distances to each
    * codeword, computed once and broadcast).
    *
    * Distances are kept as INTEGER nano-units (round(d·1e9)) so the
    * per-subspace sums are order-free exact — that is what lets the
    * whole PQ pipeline hash-match the relational DuckDB oracle with no
    * invariant weakening. The query's own ADC distance is the minimum
    * by construction (its code minimizes every subspace table), so
    * rank 1 is always the query itself. */
  def pqTopK(spark: SparkSession, dir: String, queryId: Long = 0, k: Int = 10,
      m: Int = 8, dsub: Int = 8, ks: Int = 16): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
    val (encoded, qTab, dist) = pqParts(emb, queryId, m, dsub, ks)
    encoded.crossJoin(broadcast(qTab))
      .select(col("vec_id"), dist.as("dist_nano"))
      .orderBy(col("dist_nano"), col("vec_id"))
      .limit(k)
  }

  def pqTopKSql(queryId: Long = 0, k: Int = 10, m: Int = 8, dsub: Int = 8,
      ks: Int = 16): String = s"""
    WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    cb AS (
      SELECT u.s, e.vec_id AS i, list_slice(e.v, u.s * $dsub + 1, u.s * $dsub + $dsub) AS cv
      FROM emb e, LATERAL (SELECT unnest(generate_series(0, ${m - 1})) AS s) u
      WHERE e.vec_id < $ks),
    subs AS (
      SELECT e.vec_id, u.s, list_slice(e.v, u.s * $dsub + 1, u.s * $dsub + $dsub) AS sv
      FROM emb e, LATERAL (SELECT unnest(generate_series(0, ${m - 1})) AS s) u),
    dists AS (
      SELECT sub.vec_id, sub.s, cb.i,
             CAST(ROUND(list_sum(list_transform(generate_series(1, $dsub),
                  j -> (sub.sv[j] - cb.cv[j]) * (sub.sv[j] - cb.cv[j]))) * 1e9) AS BIGINT) AS d
      FROM subs sub JOIN cb ON cb.s = sub.s),
    codes AS (
      SELECT vec_id, s, i AS code FROM (
        SELECT vec_id, s, i, ROW_NUMBER() OVER (PARTITION BY vec_id, s ORDER BY d, i) AS rn
        FROM dists) t WHERE rn = 1),
    qtab AS (SELECT s, i, d FROM dists WHERE vec_id = $queryId),
    adc AS (
      SELECT c.vec_id, SUM(q.d) AS dist_nano
      FROM codes c JOIN qtab q ON q.s = c.s AND q.i = c.code
      GROUP BY c.vec_id)
    SELECT vec_id, CAST(dist_nano AS BIGINT) AS dist_nano
    FROM adc ORDER BY dist_nano, vec_id LIMIT $k"""

  /** IVF-PQ: the two scale mechanisms composed — the coarse inverted
    * file prunes the scan to `nprobe`/`nlist` of the data
    * ([[ivfTopK]]'s deterministic seeding; see IvfPartitionSpec for
    * the partition-pruning proof) and the pruned scan runs in the
    * COMPRESSED domain over 8-byte PQ codes ([[pqTopK]]'s codebooks
    * and ADC table). This is the standard billion-vector index layout:
    * partition by list, store codes, re-rank a candidate pool with
    * full vectors only at the end (here the pool IS the result, exact
    * oracle — a production build would chain a [[cosineTopK]]-style
    * re-rank over the k winners). */
  def ivfPqTopK(spark: SparkSession, dir: String, queryId: Long = 0, k: Int = 10,
      nlist: Int = 16, nprobe: Int = 4, m: Int = 8, dsub: Int = 8, ks: Int = 16): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
    // --- coarse stage (ivfTopK's deterministic seeding) ---
    val centroids = emb.filter(col("vec_id") < nlist)
      .select(col("vec_id").as("list_id"), col("v").as("cv"))
    val centroidArr = centroids
      .agg(sort_array(collect_list(struct(col("list_id"), col("cv")))).as("centroid_arr"))
    def listsFor(vcol: Column, n: Int): Column = {
      val scored = array_sort(transform(col("centroid_arr"),
        c => struct(round(l2Squared(vcol, c.getField("cv")), 9).as("dist2"),
          c.getField("list_id").as("list_id"))))
      slice(transform(scored, s => s.getField("list_id")), 1, n)
    }
    val assigned = emb.crossJoin(broadcast(centroidArr))
      .select(col("vec_id"), nearestListId(col("v"), col("centroid_arr")).as("list_id"))
    val probed = emb.filter(col("vec_id") === queryId)
      .crossJoin(broadcast(centroidArr))
      .select(explode(listsFor(col("v"), nprobe)).as("list_id"))
    // --- compressed stage (shared PQ machinery) ---
    val (encoded, qTab, dist) = pqParts(emb, queryId, m, dsub, ks)
    encoded
      .join(assigned, Seq("vec_id"))
      .join(broadcast(probed), Seq("list_id"))
      .crossJoin(broadcast(qTab))
      .select(col("vec_id"), col("list_id"), dist.as("dist_nano"))
      .orderBy(col("dist_nano"), col("vec_id"))
      .limit(k)
  }

  def ivfPqTopKSql(queryId: Long = 0, k: Int = 10, nlist: Int = 16, nprobe: Int = 4,
      m: Int = 8, dsub: Int = 8, ks: Int = 16): String = s"""
    WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    cent AS (SELECT vec_id AS list_id, v AS cv FROM emb WHERE vec_id < $nlist),
    cdists AS (
      SELECT e.vec_id, c.list_id,
             ROUND(list_sum(list_transform(generate_series(1, len(e.v)),
                   i -> (e.v[i] - c.cv[i]) * (e.v[i] - c.cv[i]))), 9) AS dist2
      FROM emb e CROSS JOIN cent c),
    assigned AS (
      SELECT vec_id, list_id FROM (
        SELECT vec_id, list_id,
               ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist2, list_id) AS rn
        FROM cdists) t WHERE rn = 1),
    probed AS (
      SELECT list_id FROM cdists WHERE vec_id = $queryId
      ORDER BY dist2, list_id LIMIT $nprobe),
    cb AS (
      SELECT u.s, e.vec_id AS i, list_slice(e.v, u.s * $dsub + 1, u.s * $dsub + $dsub) AS cv
      FROM emb e, LATERAL (SELECT unnest(generate_series(0, ${m - 1})) AS s) u
      WHERE e.vec_id < $ks),
    subs AS (
      SELECT e.vec_id, u.s, list_slice(e.v, u.s * $dsub + 1, u.s * $dsub + $dsub) AS sv
      FROM emb e, LATERAL (SELECT unnest(generate_series(0, ${m - 1})) AS s) u),
    pdists AS (
      SELECT sub.vec_id, sub.s, cb.i,
             CAST(ROUND(list_sum(list_transform(generate_series(1, $dsub),
                  j -> (sub.sv[j] - cb.cv[j]) * (sub.sv[j] - cb.cv[j]))) * 1e9) AS BIGINT) AS d
      FROM subs sub JOIN cb ON cb.s = sub.s),
    codes AS (
      SELECT vec_id, s, i AS code FROM (
        SELECT vec_id, s, i, ROW_NUMBER() OVER (PARTITION BY vec_id, s ORDER BY d, i) AS rn
        FROM pdists) t WHERE rn = 1),
    qtab AS (SELECT s, i, d FROM pdists WHERE vec_id = $queryId),
    adc AS (
      SELECT c.vec_id, SUM(q.d) AS dist_nano
      FROM codes c JOIN qtab q ON q.s = c.s AND q.i = c.code
      GROUP BY c.vec_id)
    SELECT a.vec_id, a.list_id, CAST(adc.dist_nano AS BIGINT) AS dist_nano
    FROM adc JOIN assigned a ON a.vec_id = adc.vec_id
    JOIN probed p ON p.list_id = a.list_id
    ORDER BY dist_nano, a.vec_id LIMIT $k"""

  /** Embedding near-duplicate pairs: bucket by random-hyperplane LSH,
    * exact cosine within buckets, keep pairs above threshold. The bucket
    * equi-join is the scale move — no O(n²) cross join ever
    * materializes.
    *
    * The default threshold is the CONVENTIONAL near-dup bar (cosine
    * 0.9); the synthetic benchmark corpus has no pairs that similar, so
    * the gated query passes a looser 0.5 explicitly — a harness choice,
    * not this operator's semantics. */
  def embeddingDupPairs(spark: SparkSession, dir: String, threshold: Double = 0.9,
      bits: Int = 8, dim: Int = 64): DataFrame = {
    // each side carries its vector's norm (one dot per VECTOR) so the
    // pair stage pays one dot per candidate pair instead of three —
    // same precompute as the semantic-dedup spine; scores bit-identical
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), asDouble(col("embedding")).as("v"),
        l2Norm(asDouble(col("embedding"))).as("nrm"),
        rhpLshBucket(asDouble(col("embedding")), bits, dim).as("bucket"))
    val a = e.select(col("vec_id").as("id_a"), col("v").as("va"),
      col("nrm").as("na"), col("bucket"))
    val b = e.select(col("vec_id").as("id_b"), col("v").as("vb"),
      col("nrm").as("nb"), col("bucket"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(dot(col("va"), col("vb")) / (col("na") * col("nb")), 6).as("score"))
      .filter(col("score") >= threshold)
      .orderBy(col("id_a"), col("id_b"))
  }

  def embeddingDupPairsSql(threshold: Double = 0.9, bits: Int = 8, dim: Int = 64): String = s"""
    WITH b AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
             ${rhpLshBucketSql(s"CAST(embedding AS DOUBLE[])", bits, dim)} AS bucket
      FROM embeddings)
    SELECT a.vec_id AS id_a, c.vec_id AS id_b,
           ROUND(list_dot_product(a.v, c.v) /
                 (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(c.v, c.v))), 6) AS score
    FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id < c.vec_id
    WHERE ROUND(list_dot_product(a.v, c.v) /
                (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(c.v, c.v))), 6) >= $threshold
    ORDER BY id_a, id_b"""
}
