package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A TRAINED document-quality classifier at the corpus-filter boundary
  * — the fastText-shaped linear model the published LLM data pipelines
  * (GPT-3's WebText-vs-Common-Crawl filter, CCNet, RefinedWeb) put in
  * front of training-data selection, built from the same public
  * ingredients as [[graft.vector.HashingEmbedder]]:
  *
  *   1. Feature hashing (Weinberger et al. 2009): word unigrams AND
  *      adjacent bigrams hash into `dim` buckets — vocabulary-free, so
  *      the model is `dim + 1` doubles no matter the corpus.
  *   2. Logistic regression by full-batch gradient descent, executed
  *      as the classic distributed-GD loop: weights broadcast OUT as a
  *      real Spark BROADCAST (executors score map-side — never a
  *      dim-sized plan literal, so plan serialization stays O(1) as
  *      dim grows to a realistic 65k+), gradients aggregate BACK as
  *      one dense `dim + 1` partial per partition, summed on the
  *      driver. The driver only ever holds O(dim × partitions) — the
  *      same bounded-model contract as k-means centroids and the IDF
  *      table, and the per-epoch exchange is model-sized, never the
  *      |corpus|·|features| exploded shuffle it replaced.
  *   3. The bias gradient rides slot `dim` of the same partial array,
  *      so it shares the epoch's single pass (no second corpus scan —
  *      at 100 TB an extra scan per epoch doubles the training bill).
  *
  * The caller materializes the featurized frame ONCE ([[featurize]] is
  * a map-side projection; persist it) and every epoch is one
  * shuffle-free job over it. Training is deterministic up to float-sum
  * order (partition-order partial sums); consumers pin DECISIONS
  * (predictions, margins), not raw weights — the repo-wide sketch
  * discipline. */
object QualityClassifier {

  val DefaultDim = 4096

  /** Learned model: `dim` bucket weights + bias. */
  final case class Model(dim: Int, w: Array[Double], bias: Double)

  /** Word unigrams + adjacent bigrams, hashed to `[0, dim)` with
    * duplicates kept (bag counts). One codegen'd projection — token
    * strings never outlive it. For classification over documents of
    * very different lengths, wrap in `array_distinct` (presence
    * features): raw counts let a long document's common words swamp
    * the decision, the classic reason fastText length-normalizes. */
  def featurize(text: Column, dim: Int = DefaultDim): Column = {
    val toks = TextFunctions.tokens(lower(text))
    val n1 = greatest(size(toks) - 1, lit(0))
    val bi = zip_with(slice(toks, lit(1), n1), slice(toks, lit(2), n1),
      (a, b) => concat_ws(" ", a, b))
    transform(concat(toks, bi),
      g => pmod(xxhash64(g), lit(dim.toLong)).cast("int"))
  }

  /** σ(w·x + b) against an already-broadcast model, consumed by a
    * deterministic scalar fn — the plan carries a broadcast HANDLE and
    * nothing else: no dim-sized `typedLit` (at dim 65536 that is
    * ~0.5 MB of literal per serialized plan for zero benefit) and no
    * bias literal either — a trained FLOAT in the plan text makes the
    * plan's identity (and the bench's canonical fingerprint) a hash of
    * model weights, so any last-bit training wobble masquerades as a
    * re-plan. The whole score is computed inside the fn: sum in array
    * order, bias added after the sum — the same float-op order as the
    * previous plan-side `(lit(bias) + Σ)` form, so decisions are
    * unchanged. A NULL feature array yields NULL (null text must
    * surface as an unscored row, never a task-killing NPE). Broadcast
    * lifecycle is the CALLER's: [[score]]'s broadcast lives as long as
    * its lazy frame may run. */
  private def probOf(bw: org.apache.spark.broadcast.Broadcast[Array[Double]],
      feat: Column): Column = {
    val pFn = udf { idxs: Seq[Int] =>
      if (idxs == null) None
      else {
        // slot `w.length - 1` is the bias (same layout as the
        // gradient partials)
        val w = bw.value
        var s = 0.0
        idxs.foreach(i => s += w(i))
        s += w(w.length - 1)
        Some(1.0 / (1.0 + math.exp(-s)))
      }
    }
    pFn(feat)
  }

  /** Full-batch GD over a featurized frame `(feat: array<int>,
    * y: double ∈ {0,1})`. One distributed SHUFFLE-FREE job per epoch:
    * each partition folds its rows into a dense `dim + 1` gradient
    * array (slot `dim` is the bias — same single-pass accounting as
    * the old −1 sentinel) and emits exactly that array; the driver
    * sums the ≤ `numPartitions` partials in partition order. The
    * exchange per epoch is O(dim × partitions) — model-sized, never
    * corpus-sized. The previous form exploded |corpus|·|features|
    * (doc, bucket) rows into a hash aggregation per epoch; at 100 TB
    * that shuffle IS the training bill, and it buys nothing — the
    * gradient is a dense fixed-width vector, the textbook
    * parameter-server exchange (same contract as k-means centroids
    * and the IDF table). A NULL feature array contributes nothing,
    * exactly as it fell out of the exploded form.
    *
    * `lrDecay` < 1 geometrically shrinks the step per epoch (epoch e
    * runs at `lr * lrDecay^(e-1)`) — the classic schedule that lets a
    * LARGE initial step cover most of the distance while damping the
    * period-2 weight oscillation a large FIXED step falls into on
    * separable data (measured here: fixed lr 16 converged or flipped
    * every decision depending on epoch parity; short 5–6-epoch
    * schedules were gridded again at r16 and flip decisions at one
    * scale factor or another — the 12-epoch decayed schedule is the
    * one that holds 0 wrong / 0 weak at all three). */
  def train(spark: SparkSession, feats: DataFrame, dim: Int = DefaultDim,
      epochs: Int = 8, lr: Double = 0.5, lrDecay: Double = 1.0): Model = {
    import spark.implicits._
    require(lrDecay > 0 && lrDecay <= 1.0, s"lrDecay in (0, 1], got $lrDecay")
    val n = feats.count().toDouble
    require(n > 0, "cannot train on an empty corpus")
    val rows = feats.select(col("feat"), col("y")).as[(Seq[Int], Double)]
    var m = Model(dim, new Array[Double](dim), 0.0)
    var lrE = lr
    for (_ <- 1 to epochs) {
      val bw = spark.sparkContext.broadcast(m.w)
      val bias = m.bias
      try {
        // one gradient array per non-empty partition; summed on the
        // driver in partition order (deterministic for a pinned input)
        val partials = rows.mapPartitions { it =>
          val w = bw.value
          val g = new Array[Double](dim + 1)
          var any = false
          it.foreach { case (feat, y) =>
            if (feat != null) {
              var s = 0.0
              feat.foreach(i => s += w(i))
              val r = 1.0 / (1.0 + math.exp(-(s + bias))) - y
              g(dim) += r
              feat.foreach(j => g(j) += r)
              any = true
            }
          }
          if (any) Iterator.single(g) else Iterator.empty
        }.collect()
        val w = m.w.clone()
        var b = m.bias
        partials.foreach { g =>
          var j = 0
          while (j < dim) { w(j) -= lrE * g(j) / n; j += 1 }
          b -= lrE * g(dim) / n
        }
        m = Model(dim, w, b)
      } finally bw.destroy() // the epoch's job has collected — no leak
      lrE *= lrDecay
    }
    m
  }

  /** Map-side inference: adds `p` (probability) and `pred` (≥ 0.5) to
    * a featurized frame. Model rides a broadcast — no join, no
    * shuffle, no dim-sized plan literal. The broadcast stays alive
    * with the returned LAZY frame (one dim-sized block per score()
    * call, reclaimed by the ContextCleaner once the frame is
    * unreachable — never destroyed eagerly, which would break a
    * not-yet-executed plan). */
  def score(feats: DataFrame, m: Model): DataFrame = {
    val bw = feats.sparkSession.sparkContext.broadcast(m.w :+ m.bias)
    feats.withColumn("p", probOf(bw, col("feat")))
      .withColumn("pred", col("p") >= 0.5)
  }
}
