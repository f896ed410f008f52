package graft.vector

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Lloyd's k-means over embedding vectors — the trained stage of an
  * IVF index (VectorOps.ivfTopK seeds deterministically; this refines
  * the centroids). Built for the cluster execution model:
  *   - centroids are O(k·dim) — always broadcast, never shuffled;
  *   - assignment is a map-side broadcast join over the full table;
  *   - the update step is one (cluster, dim) aggregate — partial
  *     map-side combine makes the shuffle O(k·dim), not O(rows);
  *   - the driver loop holds only the iteration counter; centroid
  *     DataFrames are re-broadcast each round.
  * Determinism: centroid components are rounded to 9 dp every round, so
  * runs are bit-reproducible regardless of aggregation order having
  * produced 1-ulp differences.
  */
object KMeans {

  /** Squared-L2 nearest-centroid id from a broadcast centroid array
    * column (array of struct(list_id, cv)). A min-by FOLD over the k
    * centroids — O(k) per row with no materialized sorted array, where
    * the previous array_sort form paid O(k log k) plus a k-struct
    * allocation per row on the assignment path every Lloyd round and
    * every final assignment walks. Selection is value-identical:
    * centroid_arr is sorted by list_id, distances compare ROUNDED
    * (9 dp) exactly as before, and strict `<` keeps the FIRST minimum
    * — equal distances resolve to the smaller list_id, reproducing
    * array_sort's (dist2, list_id) ascending tie-break. */
  private def nearestCentroid(v: Column): Column =
    aggregate(
      col("centroid_arr"),
      struct(lit(Double.PositiveInfinity).as("dist2"),
        lit(Long.MaxValue).as("list_id")),
      (acc, c) => {
        val d = round(VectorOps.l2Squared(v, c.getField("cv")), 9)
        when(d < acc.getField("dist2"),
          struct(d.as("dist2"), c.getField("list_id").as("list_id")))
          .otherwise(acc)
      }).getField("list_id")

  private def centroidArr(centroids: DataFrame): DataFrame =
    centroids.agg(sort_array(collect_list(struct(col("list_id"), col("cv")))).as("centroid_arr"))

  /** Element-wise vector-sum aggregator: the Lloyd update's partials
    * are (count, Σv) per cluster — O(k·(dim+1)) doubles through ONE
    * shuffle with map-side combine. The previous posexplode form
    * inflated the map stream dim× into (cluster, dim) rows and paid
    * TWO shuffles per round (the per-dim mean, then the collect_list
    * reassembly) — at 100 TB × dim=1024 that is the difference
    * between a model-sized exchange and a corpus×dim one. */
  private object VecSum extends org.apache.spark.sql.expressions.Aggregator[
      Seq[Double], Array[Double], Seq[Double]] {
    override def zero: Array[Double] = Array.empty[Double]
    override def reduce(b: Array[Double], a: Seq[Double]): Array[Double] =
      if (b.isEmpty) a.toArray
      else { var i = 0; while (i < b.length) { b(i) += a(i); i += 1 }; b }
    override def merge(x: Array[Double], y: Array[Double]): Array[Double] =
      if (x.isEmpty) y
      else if (y.isEmpty) x
      else { var i = 0; while (i < x.length) { x(i) += y(i); i += 1 }; x }
    override def finish(r: Array[Double]): Seq[Double] = r.toSeq
    override def bufferEncoder: org.apache.spark.sql.Encoder[Array[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
    override def outputEncoder: org.apache.spark.sql.Encoder[Seq[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
  }

  /** Train centroids: deterministic seed (first k by vec_id) + `iters`
    * Lloyd rounds. Returns (list_id, cv).
    *
    * The centroid set is the MODEL — k·dim doubles — so each round
    * materializes it to the driver and restarts the next round from a
    * literal frame. Without this the lineage nests one full
    * assign+aggregate plan per iteration and re-executes all previous
    * rounds on every action (measured 3× slower at 3 iters). Collecting
    * model parameters is not a driver-side data path: it is exactly
    * what a parameter broadcast is.
    *
    * Determinism note: per-dim means round to 9 dp exactly as the old
    * per-dim `avg` did; the [[VecSum]] partials may add in a different
    * order than avg's, but the 9-dp rounding absorbs 1-ulp association
    * differences (the same argument the round-to-9dp contract has
    * always rested on). */
  def fit(spark: SparkSession, emb: DataFrame, k: Int, iters: Int): DataFrame = {
    import spark.implicits._
    val vecSum = udaf(VecSum)
    var centroids: Seq[(Long, Seq[Double])] = emb.filter(col("vec_id") < k)
      .select(col("vec_id").as("list_id"), col("v").as("cv"))
      .as[(Long, Seq[Double])].collect().toSeq
    for (_ <- 0 until iters) {
      val centDf = centroids.toDF("list_id", "cv")
      val assigned = emb
        .crossJoin(broadcast(centroidArr(centDf)))
        .withColumn("list_id", nearestCentroid(col("v")))
        .select(col("list_id"), col("v"))
      val means = assigned
        .groupBy(col("list_id"))
        .agg(count(lit(1)).as("n"), vecSum(col("v")).as("s"))
        .select(col("list_id"),
          transform(col("s"), x => round(x / col("n"), 9)).as("cv"))
        .as[(Long, Seq[Double])].collect().toMap
      // empty clusters keep their previous centroid
      centroids = centroids.map { case (id, old) => (id, means.getOrElse(id, old)) }
    }
    centroids.toDF("list_id", "cv")
  }

  /** Map-side nearest-centroid assignment: the input frame plus a
    * `list_id` column. Centroids broadcast (O(k·dim)); no shuffle. */
  def assign(emb: DataFrame, centroids: DataFrame): DataFrame =
    emb.crossJoin(broadcast(centroidArr(centroids)))
      .withColumn("list_id", nearestCentroid(col("v")))
      .drop("centroid_arr")

  /** Mean within-cluster squared distance (inertia) of an assignment —
    * the convergence metric. */
  def inertia(emb: DataFrame, centroids: DataFrame): Double = {
    val arr = centroidArr(centroids)
    emb.crossJoin(broadcast(arr))
      .select(element_at(array_sort(transform(
        col("centroid_arr"),
        c => round(VectorOps.l2Squared(col("v"), c.getField("cv")), 9))), 1).as("d2"))
      .agg(avg(col("d2"))).head().getDouble(0)
  }

  /** IVF search with trained centroids: probe the nprobe nearest lists,
    * exact cosine re-rank inside them. */
  def ivfSearch(spark: SparkSession, dir: String, queryId: Long = 0,
      k: Int = 10, nlist: Int = 16, nprobe: Int = 4, iters: Int = 3): DataFrame = {
    // cached: every Lloyd round + the final assignment re-scans this
    // frame (at cluster scale this is the classic iterative-ML persist)
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), VectorOps.asDouble(col("embedding")).as("v"))
      .persist()
      .transform(graft.CacheScope.register)
    val centroids = fit(spark, emb, nlist, iters)
    val arr = centroidArr(centroids)
    def probeLists(v: Column, n: Int): Column = {
      val scored = array_sort(transform(
        col("centroid_arr"),
        c => struct(
          round(VectorOps.l2Squared(v, c.getField("cv")), 9).as("dist2"),
          c.getField("list_id").as("list_id"))))
      slice(transform(scored, s => s.getField("list_id")), 1, n)
    }
    val assigned = emb.crossJoin(broadcast(arr))
      .withColumn("list_id", nearestCentroid(col("v")))
      .select(col("vec_id"), col("v"), col("list_id"))
    val q = emb.filter(col("vec_id") === queryId)
      .crossJoin(broadcast(arr))
      .select(col("v").as("qvec"), VectorOps.l2Norm(col("v")).as("qn"),
        explode(probeLists(col("v"), nprobe)).as("list_id"))
    assigned.join(broadcast(q), Seq("list_id"))
      .select(col("vec_id"), col("list_id"),
        round(VectorOps.cosineQn(col("v"), col("qvec"), col("qn")), 6).as("score"))
      .orderBy(col("score").desc, col("vec_id"))
      .limit(k)
  }

  /** Oracle-checkable form of the trained-IVF probe: the returned ids
    * depend on the learned centroids (engine-private model), but two
    * invariants are assertable blind —
    *  - in_top2k: every IVF top-k result is in the brute-force top-2k
    *    (the recall floor of a 4-of-16-list probe on this corpus);
    *  - self_ok: rank 1 is the query vector itself at cosine 1.0.
    * The hash gate goes red iff the probe's recall degrades. */
  def ivfSearchChecked(spark: SparkSession, dir: String, queryId: Long = 0,
      k: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ivf = ivfSearch(spark, dir, queryId, k)
    val brute = VectorOps.cosineTopK(spark, dir, queryId, 2 * k)
      .select(col("vec_id"), lit(true).as("hit"))
    // window over the k result rows only — single partition by design
    val w = Window.orderBy(col("score").desc, col("vec_id"))
    ivf.withColumn("rk", row_number().over(w).cast("long"))
      .join(brute, Seq("vec_id"), "left")
      .select(col("rk"),
        coalesce(col("hit"), lit(false)).as("in_top2k"),
        when(col("rk") === 1, col("vec_id") === queryId && col("score") === 1.0)
          .otherwise(lit(true)).as("self_ok"))
      .orderBy(col("rk"))
  }

  def ivfSearchCheckedSql(k: Int = 10): String = s"""
    SELECT CAST(u.i AS BIGINT) AS rk, TRUE AS in_top2k, TRUE AS self_ok
    FROM (SELECT unnest(generate_series(1, $k)) AS i) u ORDER BY rk"""
}
