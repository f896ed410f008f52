package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

import graft.plans.{AnnProbe, AnnProbeRewrite}
import graft.vector.VectorOps

/** The ANN auto-probe rewrite (AnnProbeRewrite): opt-in optimizer rule
  * turning `ORDER BY cosine(v, literal) DESC LIMIT k` over an
  * LSH-declared table into a probe-bucket scan. Pins: semantic
  * equality with the manually probe-filtered brute force, parquet
  * pushdown of the injected IN filter, driver/Spark bucket agreement,
  * the probe-set math, and every refusal edge (conf off, no
  * declaration, ascending sort, no literal query). */
class AnnProbeSpec extends SparkSpec {
  import spark.implicits._

  private val Bits = 8
  private val Dim = 64
  private val Seed = 42L
  private val K = 10

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-annprobe").toString

  private def freshIndexed(): String = {
    val root = tmp()
    val emb = Tables.embeddings(spark, sf)
      .select(col("vec_id"), VectorOps.asDouble(col("embedding")).as("v"))
    AnnProbe.withLshBucket(emb, "v", Bits, Dim, Seed)
      .write.mode("overwrite").parquet(root)
    root
  }

  private def qvec(): Array[Double] =
    Tables.embeddings(spark, sf).filter(col("vec_id") === 0L)
      .select(VectorOps.asDouble(col("embedding"))).head().getSeq[Double](0).toArray

  private def probeSession(): SparkSession = {
    val s = spark.newSession()
    AnnProbe.enable(s)
    s
  }

  private def topkOver(s: SparkSession, root: String, q: Array[Double]): DataFrame = {
    val qc = array(q.map(lit): _*)
    s.read.parquet(root)
      .select(col("vec_id"), round(VectorOps.cosine(col("v"), qc), 6).as("score"))
      .orderBy(col("score").desc, col("vec_id"))
      .limit(K)
  }

  test("driver-side bucketOf agrees with the Spark expression") {
    val rows = Tables.embeddings(spark, sf).limit(20)
      .select(col("vec_id"), VectorOps.asDouble(col("embedding")).as("v"))
      .select(col("vec_id"), col("v"),
        VectorOps.rhpLshBucket(col("v"), Bits, Dim, Seed).as("bucket"))
      .collect()
    rows.foreach { r =>
      val v = r.getSeq[Double](1).toArray
      assert(AnnProbe.bucketOf(v, Bits, Dim, Seed) == r.getLong(2),
        s"bucket disagreement for vec ${r.getLong(0)}")
    }
  }

  test("probe-set math: radius 0 and 1") {
    val q = qvec()
    val qb = AnnProbe.bucketOf(q, Bits, Dim, Seed)
    assert(AnnProbe.probeBuckets(q, Bits, Dim, Seed, 0).toSeq == Seq(qb))
    val r1 = AnnProbe.probeBuckets(q, Bits, Dim, Seed, 1)
    assert(r1.length == Bits + 1)
    assert(r1.contains(qb))
    assert(r1.forall(b => java.lang.Long.bitCount(b ^ qb) <= 1))
  }

  test("rewrite equals the manually probe-filtered brute force; filter pushed to parquet") {
    val root = freshIndexed()
    val q = qvec()
    val probes = AnnProbe.probeBuckets(q, Bits, Dim, Seed, 1)
    // manual reference on a session WITHOUT the rule
    val expected = topkOver(spark, root, q).getClass // (shape only)
    val manual = {
      val qc = array(q.map(lit): _*)
      spark.read.parquet(root)
        .filter(col("bucket").isin(probes.map(java.lang.Long.valueOf): _*))
        .select(col("vec_id"), round(VectorOps.cosine(col("v"), qc), 6).as("score"))
        .orderBy(col("score").desc, col("vec_id"))
        .limit(K).collect().toSeq.map(_.toString)
    }
    val s = probeSession()
    val df = topkOver(s, root, q)
    val got = df.collect().toSeq.map(_.toString)
    assert(got == manual, "rewritten ranking != probe-filtered brute force")
    // proof the rewrite fired: the optimized plan carries the IN filter
    val opt = df.queryExecution.optimizedPlan.toString
    assert(opt.contains("bucket") && opt.toLowerCase.contains(" in "),
      s"no probe filter in optimized plan:\n${opt.take(600)}")
    // and V1 pushdown saw it: the scan's PushedFilters carries In(bucket)
    val scans = df.queryExecution.executedPlan.collect {
      case a: AdaptiveSparkPlanExec => a.executedPlan.collect {
        case f: FileSourceScanExec => f }
      case f: FileSourceScanExec => Seq(f)
    }.flatten
    assert(scans.nonEmpty)
    assert(scans.exists(_.metadata.getOrElse("PushedFilters", "").contains("In(bucket")),
      scans.map(_.metadata.getOrElse("PushedFilters", "?")).mkString(" | "))
    Scratch.deleteRecursively(root)
    assert(expected != null)
  }

  test("SQL catalog scalar path: gsql.g.cosine_sim(...) DESC LIMIT k rewrites too") {
    // a STOCK session ranking the store by NAME (the reference's
    // retrieval surface) resolves cosine_sim to the V2 function's
    // ApplyFunctionExpression/Invoke, not the DotProduct tree — the
    // rule must match that shape as well
    val root = freshIndexed()
    val q = qvec()
    val s = probeSession()
    s.conf.set("spark.sql.catalog.gsql_ann",
      classOf[graft.catalog.GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.gsql_ann.warehouse", tmp())
    s.read.parquet(root).createOrReplaceTempView("ann_idx")
    val arr = q.mkString("ARRAY(", ", ", ")")
    val df = s.sql(
      s"""SELECT vec_id, ROUND(gsql_ann.g.cosine_sim(v, $arr), 6) AS score
         |FROM ann_idx ORDER BY score DESC, vec_id LIMIT $K""".stripMargin)
    val probes = AnnProbe.probeBuckets(q, Bits, Dim, Seed, 1)
    val manual = {
      val qc = array(q.map(lit): _*)
      spark.read.parquet(root)
        .filter(col("bucket").isin(probes.map(java.lang.Long.valueOf): _*))
        .select(col("vec_id"), round(VectorOps.cosine(col("v"), qc), 6).as("score"))
        .orderBy(col("score").desc, col("vec_id"))
        .limit(K).collect().toSeq.map(_.toString)
    }
    assert(df.collect().toSeq.map(_.toString) == manual,
      "SQL-path rewritten ranking != probe-filtered brute force")
    assert(df.queryExecution.optimizedPlan.exists {
      case org.apache.spark.sql.catalyst.plans.logical.Filter(
        org.apache.spark.sql.catalyst.expressions.In(_, _), _) => true
      case _ => false
    }, s"no probe filter:\n${df.queryExecution.optimizedPlan.toString.take(600)}")
    Scratch.deleteRecursively(root)
  }

  test("refusal edges: conf off, no declaration, ascending sort") {
    val root = freshIndexed()
    val q = qvec()
    def hasProbeFilter(df: DataFrame): Boolean =
      df.queryExecution.optimizedPlan.exists {
        case org.apache.spark.sql.catalyst.plans.logical.Filter(
          org.apache.spark.sql.catalyst.expressions.In(_, _), _) => true
        case _ => false
      }
    // conf off (rule registered but not opted in)
    val off = spark.newSession()
    org.apache.spark.sql.graftbridge.Bridge.addOptimizerRule(off, AnnProbeRewrite)
    assert(!hasProbeFilter(topkOver(off, root, q)))
    // undeclared index: same bucket VALUES, no metadata declaration
    val s = probeSession()
    val plainRoot = tmp()
    Tables.embeddings(spark, sf)
      .select(col("vec_id"), VectorOps.asDouble(col("embedding")).as("v"))
      .select(col("*"), VectorOps.rhpLshBucket(col("v"), Bits, Dim, Seed).as("bucket"))
      .write.mode("overwrite").parquet(plainRoot)
    assert(spark.read.parquet(plainRoot).schema("bucket").metadata.json == "{}",
      "undeclared fixture unexpectedly carries metadata")
    assert(!hasProbeFilter(topkOver(s, plainRoot, q)))
    // ascending sort must not rewrite (probe top-k is a DESC contract)
    val qc = array(q.map(lit): _*)
    val asc = s.read.parquet(root)
      .select(col("vec_id"), round(VectorOps.cosine(col("v"), qc), 6).as("score"))
      .orderBy(col("score").asc, col("vec_id")).limit(K)
    assert(!hasProbeFilter(asc))
    Scratch.deleteRecursively(root); Scratch.deleteRecursively(plainRoot)
  }
}
