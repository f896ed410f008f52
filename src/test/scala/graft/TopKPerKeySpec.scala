package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.plans.{TopKPerGroup, TopKPerKeyFinalExec, TopKPerKeyPartialExec}

/** The custom top-k-per-key operator (§2.13 ladder rung (c): logical
  * node + strategy + partial/final SparkPlans): must equal the window
  * row_number formulation exactly, while planning WITHOUT a window
  * sort. */
class TopKPerKeySpec extends SparkSpec {
  import spark.implicits._

  private def windowTopK(k: Int) = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(spark, sf)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .drop("rn")
  }

  private def operatorTopK(k: Int) =
    TopKPerGroup.topK(Tables.orders(spark, sf),
      Seq(col("o_custkey")),
      Seq(col("o_totalprice").desc, col("o_orderkey")), k)

  test("operator equals the window row_number formulation") {
    Seq(1, 3, 10).foreach { k =>
      val got = operatorTopK(k)
        .orderBy("o_custkey", "o_orderkey")
        .select("o_orderkey").as[Long].collect().toSeq
      val want = windowTopK(k)
        .orderBy("o_custkey", "o_orderkey")
        .select("o_orderkey").as[Long].collect().toSeq
      assert(got == want, s"k=$k mismatch")
    }
  }

  test("plan uses the partial/final execs and no WindowExec or sort") {
    val df = operatorTopK(5)
    df.collect()
    val executed = df.queryExecution.executedPlan
    def find(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.SparkPlan] =
      p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => find(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => q +: find(q.plan)
        case other => other +: (other.children.flatMap(find) ++
          other.subqueries.flatMap(find))
      }
    val nodes = find(executed)
    assert(nodes.exists(_.isInstanceOf[TopKPerKeyFinalExec]), "final exec missing")
    assert(nodes.exists(_.isInstanceOf[TopKPerKeyPartialExec]), "partial exec missing")
    val s = executed.toString
    assert(!s.contains("Window"), "must not fall back to a window plan")
    assert(!s.contains("Sort "), "must not sort whole groups")
  }

  test("map-side pruning bounds shuffled rows to k per (key, partition)") {
    // 500 rows, one key, k=2, 4 input partitions -> the exchange can
    // carry at most 8 rows (k per partition), and the result is the
    // global top 2
    val df = (1L to 500L).map(i => (1L, i)).toDF("key", "v").repartition(4)
    val top = TopKPerGroup.topK(df, Seq(col("key")), Seq(col("v").desc), 2)
    val rows = top.as[(Long, Long)].collect().toSeq.sorted
    assert(rows == Seq((1L, 499L), (1L, 500L)))
  }

  test("keys with fewer than k rows keep all their rows") {
    val df = Seq((1L, 10L), (2L, 20L), (2L, 21L)).toDF("key", "v")
    val top = TopKPerGroup.topK(df, Seq(col("key")), Seq(col("v").desc), 5)
    assert(top.count() == 3)
  }

  test("null keys and null order values behave like the window formulation") {
    val df = Seq[(java.lang.Long, java.lang.Long, Long)](
      (null, 5L, 1L), (null, 9L, 2L), (null, null, 3L),
      (1L, null, 4L), (1L, 7L, 5L), (1L, 8L, 6L), (1L, 6L, 7L),
    ).toDF("key", "v", "id")
    def normalize(r: org.apache.spark.sql.Row) =
      (Option(r.get(0)), Option(r.get(1)), r.getLong(2))
    val got = TopKPerGroup.topK(df, Seq(col("key")), Seq(col("v").desc, col("id")), 2)
      .collect().map(normalize).toSet
    val w = Window.partitionBy(col("key")).orderBy(col("v").desc, col("id"))
    val want = df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2).drop("rn")
      .collect().map(normalize).toSet
    assert(got == want)
  }

  test("property: operator equals window for random frames") {
    val rnd = new scala.util.Random(42)
    (1 to 5).foreach { trial =>
      val n = 50 + rnd.nextInt(200)
      val rows = Seq.fill(n)((rnd.nextInt(8).toLong, rnd.nextInt(1000).toLong, rnd.nextLong()))
        .zipWithIndex.map { case ((k, v, _), i) => (k, v, i.toLong) }
      val df = rows.toDF("key", "v", "id").repartition(3 + rnd.nextInt(5))
      val k = 1 + rnd.nextInt(6)
      val got = TopKPerGroup.topK(df, Seq(col("key")), Seq(col("v"), col("id")), k)
        .as[(Long, Long, Long)].collect().toSet
      val w = Window.partitionBy(col("key")).orderBy(col("v"), col("id"))
      val want = df.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= k).drop("rn")
        .as[(Long, Long, Long)].collect().toSet
      assert(got == want, s"trial $trial (n=$n, k=$k)")
    }
  }
}
