package graft

import org.apache.spark.sql.functions._
import graft.text.QualityClassifier

/** [[graft.text.QualityClassifier]]: featurization shape, separable
  * training to 100% accuracy with real margins, bias-only learning via
  * the sentinel bucket, and the gate's marker-collision guard. */
class QualityClassifierSpec extends SparkSpec {
  import spark.implicits._

  test("featurize emits unigram+bigram bag hashed into [0, dim)") {
    val out = Seq("a b c").toDF("t")
      .select(QualityClassifier.featurize(col("t"), 64).as("f"))
      .as[Seq[Int]].head()
    assert(out.size == 5) // a, b, c, "a b", "b c"
    assert(out.forall(i => i >= 0 && i < 64))
    // bag semantics: duplicates kept
    val dup = Seq("x x x").toDF("t")
      .select(QualityClassifier.featurize(col("t"), 64).as("f"))
      .as[Seq[Int]].head()
    assert(dup.size == 5 && dup.take(3).distinct.size == 1)
  }

  test("gate decisions hold: sampled training still classifies every doc") {
    val out = SparkEntry.queries("text_quality_classifier")(spark, sf)
      .select(col("correct"), col("margin_ok"))
      .as[(Boolean, Boolean)].collect()
    assert(out.nonEmpty && out.forall(r => r._1 && r._2),
      s"${out.count(!_._1)} wrong, ${out.count(!_._2)} weak margins of ${out.length}")
  }

  test("separable planted corpus trains to 100% accuracy with margin") {
    val docs = (0L until 40L).map { i =>
      val marker = if (i % 2 == 0) "qualmark qualmark" else "junkmark junkmark"
      (i, if (i % 2 == 0) 1.0 else 0.0, s"common words doc $i $marker")
    }.toDF("doc_id", "y", "t")
    val feats = docs.select(col("doc_id"), col("y"),
      QualityClassifier.featurize(col("t")).as("feat"))
    val m = QualityClassifier.train(spark, feats)
    val scored = QualityClassifier.score(feats, m)
      .select(col("y"), col("pred"), abs(col("p") - 0.5).as("margin"))
      .as[(Double, Boolean, Double)].collect()
    assert(scored.forall { case (y, pred, _) => pred == (y == 1.0) })
    assert(scored.forall(_._3 >= 0.05),
      s"weak margin: ${scored.map(_._3).min}")
  }

  test("dim=65536 trains and scores (weights ride a broadcast, not a plan literal)") {
    // the plan-bloat regression guard: at a realistic feature-hashing
    // dim, a typedLit weight vector would serialize ~0.5 MB into every
    // epoch's plan (and its codegen); the broadcast form keeps the
    // plan O(1) in dim — this smoke completes in seconds, and the
    // separable corpus still classifies perfectly
    val docs = (0L until 20L).map { i =>
      val marker = if (i % 2 == 0) "qualmark qualmark" else "junkmark junkmark"
      (i, if (i % 2 == 0) 1.0 else 0.0, s"common words doc $i $marker")
    }.toDF("doc_id", "y", "t")
    val dim = 65536
    val feats = docs.select(col("doc_id"), col("y"),
      QualityClassifier.featurize(col("t"), dim).as("feat")).persist()
    try {
      val m = QualityClassifier.train(spark, feats, dim = dim, epochs = 4, lr = 1.0)
      assert(m.w.length == dim)
      val scored = QualityClassifier.score(feats, m)
        .select(col("y"), col("pred")).as[(Double, Boolean)].collect()
      assert(scored.forall { case (y, pred) => pred == (y == 1.0) })
    } finally feats.unpersist()
  }

  test("NULL text surfaces as an unscored row, never a task-killing NPE") {
    val docs = Seq((1L, 1.0, "qualmark good"), (2L, 0.0, "junkmark bad"),
      (3L, 1.0, null.asInstanceOf[String])).toDF("doc_id", "y", "t")
    val feats = docs.select(col("doc_id"), col("y"),
      QualityClassifier.featurize(col("t"), 64).as("feat"))
    // training over a frame with a NULL feature array completes (the
    // null row contributes no gradient), and scoring yields NULL p —
    // the same propagation the old aggregate() form had
    val m = QualityClassifier.train(spark,
      feats.filter(col("feat").isNotNull), dim = 64, epochs = 2)
    val scored = QualityClassifier.score(feats, m)
      .orderBy("doc_id").select("p").collect()
    assert(!scored(0).isNullAt(0) && !scored(1).isNullAt(0))
    assert(scored(2).isNullAt(0), "null text must score as NULL, not crash")
  }

  test("bias slot learns the class prior on featureless rows") {
    // no features at all: only the bias can move, via the gradient
    // partial's dedicated slot `dim`
    val feats = Seq.fill(8)((Seq.empty[Int], 1.0)).toDF("feat", "y")
    val m = QualityClassifier.train(spark, feats, epochs = 20, lr = 1.0)
    assert(m.bias > 0.5, s"bias did not learn the all-positive prior: ${m.bias}")
    assert(m.w.forall(_ == 0.0))
  }

  test("decisions are partition-layout robust (1 vs 8 partitions)") {
    // the dense-gradient fold sums partials in partition order, so raw
    // weights may differ in the last float bits across layouts — but
    // DECISIONS (the pinned contract) must not. Train the same corpus
    // as one partition and as eight, compare every pred.
    val docs = (0L until 64L).map { i =>
      val marker = if (i % 2 == 0) "qualmark qualmark" else "junkmark junkmark"
      (i, if (i % 2 == 0) 1.0 else 0.0, s"common words doc $i $marker")
    }.toDF("doc_id", "y", "t")
    val feats = docs.select(col("doc_id"), col("y"),
      QualityClassifier.featurize(col("t"), 256).as("feat"))
    def decisions(parts: Int): Seq[(Long, Boolean)] = {
      val f = feats.repartition(parts).persist()
      try {
        val m = QualityClassifier.train(spark, f, dim = 256, epochs = 6, lr = 2.0)
        QualityClassifier.score(feats.coalesce(1), m)
          .orderBy("doc_id").select(col("doc_id"), col("pred"))
          .as[(Long, Boolean)].collect().toSeq
      } finally { f.unpersist(); () }
    }
    assert(decisions(1) == decisions(8))
  }

  test("gate query on the real corpus: every decision correct with margin") {
    val rows = SparkEntry.queries("text_quality_classifier")(spark, sf)
      .select(col("correct"), col("margin_ok")).as[(Boolean, Boolean)].collect()
    assert(rows.nonEmpty && rows.forall { case (c, m) => c && m })
  }

  test("gate markers hash to distinct buckets at the default dim") {
    val idx = Seq("qualmark", "junkmark", "qualmark qualmark", "junkmark junkmark")
      .toDF("t").select(QualityClassifier.featurize(col("t")).as("f"))
      .as[Seq[Int]].collect().map(_.head)
    assert(idx(0) != idx(1), "unigram markers collide — gate would be vacuous")
  }
}
