package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.plans.AnnProbe
import graft.sources.SnapshotTable
import graft.vector.VectorOps

/** The ANN index as a declared layout of the ACID snapshot table:
  * LSH-bucketed vectors clustered by bucket (statsKey) with the
  * declaration in field metadata, maintained by a merge-on-read
  * DELETE, searched through the table's own read path. Pins:
  *  - gate ranking == an independent in-memory reference over the
  *    post-delete corpus,
  *  - deleted vectors never surface as candidates,
  *  - the probe read keeps FEWER manifest files than the table holds
  *    (manifest-level skipping, not just row filtering),
  *  - the LSH declaration SURVIVES the table round-trip: the auto
  *    -probe rewrite fires on a plain `SnapshotTable.read` ranked by
  *    cosine DESC LIMIT k, before and after a dv-purging compact. */
class AnnSnapshotSpec extends SparkSpec {

  private val Bits = 8
  private val Dim = 64
  private val Seed = 42L
  private val K = 10

  private def qvec(): Array[Double] =
    Tables.embeddings(spark, sf).filter(col("vec_id") === 0L)
      .select(VectorOps.asDouble(col("embedding"))).head().getSeq[Double](0).toArray

  /** Independent reference: bucket the raw corpus in memory, drop the
    * deleted ids, probe-filter, score, top-K. */
  private def reference(q: Array[Double]): Seq[(Long, Double)] = {
    val probes = AnnProbe.probeBuckets(q, Bits, Dim, Seed, 1)
    val qc = array(q.map(lit): _*)
    Tables.embeddings(spark, sf)
      .select(col("vec_id"), VectorOps.asDouble(col("embedding")).as("v"))
      .filter(pmod(col("vec_id"), lit(17)) =!= 0)
      .select(col("vec_id"), col("v"),
        VectorOps.rhpLshBucket(col("v"), Bits, Dim, Seed).as("bucket"))
      .filter(col("bucket").isin(probes.map(java.lang.Long.valueOf): _*))
      .select(col("vec_id"), round(VectorOps.cosine(col("v"), qc), 6).as("score"))
      .orderBy(col("score").desc, col("vec_id"))
      .limit(K).collect().toSeq.map(r => (r.getLong(0), r.getDouble(1)))
  }

  test("gate ranking equals the post-delete in-memory reference") {
    SparkEntry.clearAnnSnapshotFixtureForTests()
    val got = SparkEntry.queries("vec_ann_snapshot_topk")(spark.newSession(), sf)
      .collect().toSeq.map(r => (r.getLong(0), r.getDouble(1)))
    assert(got == reference(qvec()),
      "snapshot-table probe ranking diverged from the post-delete reference")
  }

  /** A fresh throwaway index table for the plan/maintenance pins —
    * same build recipe as the gate fixture, but local to the test so
    * compaction here cannot disturb the gate's memoized master. */
  private def freshTable(): String = {
    val root = java.nio.file.Files
      .createTempDirectory("graft-annsnap-spec").toString
    val emb = Tables.embeddings(spark, sf)
      .select(col("vec_id"), VectorOps.asDouble(col("embedding")).as("v"))
    val bucketed = AnnProbe.withLshBucket(emb, "v", Bits, Dim, Seed)
      .repartitionByRange(16, col("bucket"))
      .sortWithinPartitions(col("bucket"))
    SnapshotTable.create(spark, root, bucketed, statsKey = Some("bucket"))
    SnapshotTable.deleteWhere(spark, root, pmod(col("vec_id"), lit(17)) === 0)
    root
  }

  test("probe read keeps fewer manifest files than the table holds; deleted ids absent") {
    val root = freshTable()
    val q = qvec()
    val probes = AnnProbe.probeBuckets(q, Bits, Dim, Seed, 1)
    val all = SnapshotTable.read(spark, root).inputFiles.length
    val kept = SnapshotTable.readKeys(spark, root, "bucket", probes)
    assert(kept.inputFiles.length < all,
      s"probe read kept ${kept.inputFiles.length} of $all files — no manifest skipping")
    val deleted = kept.filter(pmod(col("vec_id"), lit(17)) === 0).count()
    assert(deleted == 0L, s"$deleted dv-deleted vectors surfaced through readKeys")
    Scratch.deleteRecursively(root)
  }

  private def hasProbeFilter(df: DataFrame): Boolean =
    df.queryExecution.optimizedPlan.exists {
      case org.apache.spark.sql.catalyst.plans.logical.Filter(
        org.apache.spark.sql.catalyst.expressions.In(_, _), _) => true
      case _ => false
    }

  private def rankedRead(s: SparkSession, root: String, q: Array[Double]): DataFrame = {
    val qc = array(q.map(lit): _*)
    SnapshotTable.read(s, root)
      .select(col("vec_id"), round(VectorOps.cosine(col("v"), qc), 6).as("score"))
      .orderBy(col("score").desc, col("vec_id")).limit(K)
  }

  test("the LSH declaration survives the table round-trip: auto-probe rewrite fires on read") {
    val root = freshTable()
    val q = qvec()
    // the declaration must be IN the table's recorded schema, not a
    // property of the writing DataFrame
    val sch = SnapshotTable.read(spark, root).schema
    assert(sch("bucket").metadata.contains(AnnProbe.MetaOn),
      "bucket field lost its LSH declaration through create/read")
    val s = spark.newSession()
    AnnProbe.enable(s)
    val df = rankedRead(s, root, q)
    assert(hasProbeFilter(df),
      s"rewrite did not fire over the snapshot read:\n${df.queryExecution.optimizedPlan.toString.take(600)}")
    assert(df.collect().toSeq.map(_.toString) ==
      reference(q).map { case (id, sc) => s"[$id,$sc]" },
      "rewritten snapshot-read ranking != post-delete reference")
    Scratch.deleteRecursively(root)
  }

  test("union refusal: one undeclared leg blocks the whole rewrite (no partial probing)") {
    // a union whose legs mix declared and undeclared indexes must not
    // rewrite AT ALL — probing only the declared leg would let the
    // undeclared leg's full corpus compete against a filtered one
    val root = freshTable()
    val q = qvec()
    val s = spark.newSession()
    AnnProbe.enable(s)
    val declared = SnapshotTable.read(s, root).select(col("vec_id"), col("v"), col("bucket"))
    val undeclared = Tables.embeddings(s, sf)
      .select(col("vec_id"), VectorOps.asDouble(col("embedding")).as("v"))
      .select(col("vec_id"), col("v"),
        VectorOps.rhpLshBucket(col("v"), Bits, Dim, Seed).as("bucket"))
    val qc = array(q.map(lit): _*)
    val df = declared.unionAll(undeclared)
      .select(col("vec_id"), round(VectorOps.cosine(col("v"), qc), 6).as("score"))
      .orderBy(col("score").desc, col("vec_id")).limit(K)
    assert(!hasProbeFilter(df),
      s"partial-probe rewrite fired over a mixed union:\n${df.queryExecution.optimizedPlan.toString.take(600)}")
    Scratch.deleteRecursively(root)
  }

  test("union refusal: a node between the sort and the union also refuses (no leg-1-only filter)") {
    // distinct() puts an Aggregate between the Sort and the Union —
    // the single-target fallback must refuse rather than descend into
    // leg 1 only (the partially-probed-union wrong-results mode)
    val root = freshTable()
    val q = qvec()
    val s = spark.newSession()
    AnnProbe.enable(s)
    val declared = SnapshotTable.read(s, root).select(col("vec_id"), col("v"), col("bucket"))
    val qc = array(q.map(lit): _*)
    val df = declared.unionAll(declared)
      .select(col("vec_id"), round(VectorOps.cosine(col("v"), qc), 6).as("score"))
      .distinct()
      .orderBy(col("score").desc, col("vec_id")).limit(K)
    assert(!hasProbeFilter(df),
      s"rewrite fired through an intermediate node over a union:\n${df.queryExecution.optimizedPlan.toString.take(600)}")
    Scratch.deleteRecursively(root)
  }

  test("declaration survives a dv-purging compact; rewrite still fires, rows unchanged") {
    val root = freshTable()
    val q = qvec()
    val s = spark.newSession()
    AnnProbe.enable(s)
    val before = rankedRead(s, root, q).collect().toSeq.map(_.toString)
    SnapshotTable.compact(spark, root)
    val sch = SnapshotTable.read(spark, root).schema
    assert(sch("bucket").metadata.contains(AnnProbe.MetaOn),
      "bucket field lost its LSH declaration through compact")
    val df = rankedRead(s, root, q)
    assert(hasProbeFilter(df), "rewrite no longer fires after compact")
    assert(df.collect().toSeq.map(_.toString) == before,
      "compaction changed the probe ranking")
    Scratch.deleteRecursively(root)
  }
}
