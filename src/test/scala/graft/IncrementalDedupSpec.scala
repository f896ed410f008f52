package graft

import org.apache.spark.sql.functions._

import graft.sources.SnapshotTable
import graft.text.TextFunctions
import graft.vector.Dedup

/** Incremental near-dup screening against a stored band index — the
  * daily-crawl shape: the corpus is banded ONCE into a snapshot table
  * clustered by band hash, each new batch probes it without touching
  * corpus text. Pins: probe == the no-index full recompute, manifest
  * file skipping for a small probe, and index GROWTH (append a batch's
  * bands, the next probe sees them — no rebuild). */
class IncrementalDedupSpec extends SparkSpec {

  private val BatchMod = 5
  private val MaxBucket = 64

  private def buildIndex(): String = {
    val root = java.nio.file.Files
      .createTempDirectory("graft-incrdedup-spec").toString
    val old = Tables.documents(spark, sf).filter(col("doc_id") % BatchMod =!= 0)
      .transform(Parallelism.ensure(spark))
    val bands = Dedup.indexBands(old.select(col("doc_id"), col("text")))
      .repartitionByRange(8, col("bh"))
      .sortWithinPartitions(col("bh"))
    SnapshotTable.create(spark, root, bands, statsKey = Some("bh"))
    root
  }

  test("probe against the stored index equals the no-index recompute") {
    val root = buildIndex()
    val got = Dedup.incrementalProbe(spark, sf, root)
      .collect().toSeq.map(_.toString)
    // reference: band EVERYTHING in memory (no index, no pruning) and
    // run the same join-cap-verify pipeline
    val all = Dedup.bandedOf(
      Tables.documents(spark, sf).select(col("doc_id"), col("text")))
    val oldb = all.filter(col("doc_id") % BatchMod =!= 0)
    val newb = all.filter(col("doc_id") % BatchMod === 0)
    val bs = oldb.groupBy(col("band"), col("band_key"))
      .agg(count(lit(1)).as("c")).filter(col("c") <= MaxBucket)
    val cand = newb
      .join(oldb.select(col("doc_id").as("dup_of"), col("band"), col("band_key")),
        Seq("band", "band_key"))
      .join(bs, Seq("band", "band_key"))
      .select(col("doc_id"), col("dup_of")).distinct()
    val sh = Tables.documents(spark, sf)
      .select(col("doc_id"),
        array_distinct(Dedup.shingles(TextFunctions.tokens(lower(col("text"))))).as("sh"))
    val expected = cand
      .join(sh.select(col("doc_id"), col("sh").as("sh_a")), Seq("doc_id"))
      .join(sh.select(col("doc_id").as("dup_of"), col("sh").as("sh_b")), Seq("dup_of"))
      .select(col("doc_id"), col("dup_of"),
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double")
          .divide(size(array_union(col("sh_a"), col("sh_b")))).as("jaccard"))
      .filter(col("jaccard") >= 0.5)
      .orderBy(col("doc_id"), col("dup_of"))
      .collect().toSeq.map(_.toString)
    assert(got == expected, "indexed probe diverged from the full recompute")
    Scratch.deleteRecursively(root)
  }

  test("a small probe reads fewer index files than the table holds (manifest skipping)") {
    val root = buildIndex()
    val all = SnapshotTable.read(spark, root).inputFiles.length
    // one document's band hashes: numBands=4 keys against 8 range files
    val oneDoc = Tables.documents(spark, sf)
      .filter(col("doc_id") % BatchMod === 0).limit(1)
      .select(col("doc_id"), col("text"))
    val keys = Dedup.indexBands(oneDoc)
      .select(col("bh")).distinct().collect().map(_.getLong(0))
    assert(keys.nonEmpty && keys.length <= 4)
    val kept = SnapshotTable.readKeys(spark, root, "bh", keys)
    assert(kept.inputFiles.length < all,
      s"probe kept ${kept.inputFiles.length} of $all files — no skipping")
    Scratch.deleteRecursively(root)
  }

  test("index grows by append: the next probe sees the appended batch (no rebuild)") {
    val root = buildIndex()
    val batch = Tables.documents(spark, sf)
      .filter(col("doc_id") % BatchMod === 0).select(col("doc_id"), col("text"))
    val nBatch = batch.count()
    // fold the screened batch into the index — one ACID append of its
    // band rows, exactly what a crawl pipeline does after admission
    SnapshotTable.append(spark, root, Dedup.indexBands(batch),
      statsKey = Some("bh"))
    val again = Dedup.incrementalProbe(spark, sf, root)
    val selfMatches = again
      .filter(col("doc_id") === col("dup_of") && col("jaccard") === 1.0)
      .count()
    assert(selfMatches == nBatch,
      s"$selfMatches of $nBatch batch docs self-matched after append — index growth not visible")
    Scratch.deleteRecursively(root)
  }
}
