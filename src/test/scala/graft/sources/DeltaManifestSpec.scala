package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Delta manifests (format 8): commit cost ∝ touched files.
  *
  * The contract under test, in order of importance:
  *
  *  1. EQUIVALENCE — a delta commit resolves to exactly the entry set
  *     a full manifest would have recorded: reads, time travel, CDC,
  *     and maintenance see identical state. A resolution bug here is
  *     silent data loss or resurrection.
  *  2. The commit is actually SMALL — an append to an N-file table
  *     writes O(batch) manifest lines, not O(N); a rewrite-most op
  *     (compact) naturally writes a full checkpoint.
  *  3. Chains are BOUNDED — a parent at [[SnapshotTable.MaxChainDepth]]
  *     forces a full manifest, so read-side resolution never walks more
  *     than depth+1 files.
  *  4. RETENTION keeps every retained version readable: expiring a
  *     delta's bases first publishes a shadow checkpoint
  *     (`vN.ckpt.json`), which resolution prefers; vacuum spares live
  *     checkpoints and sweeps orphaned ones.
  */
class DeltaManifestSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("graft-delta").toString

  private def rawLines(root: String, v: Int): Seq[String] = {
    import scala.jdk.CollectionConverters._
    Files.readAllLines(Paths.get(root, "_snapshots", f"v$v%07d.json")).asScala.toSeq
  }

  private def entryLines(root: String, v: Int): Seq[String] =
    rawLines(root, v).drop(1).filterNot(l => l.isEmpty || l.startsWith("S{"))

  private def header(root: String, v: Int): String = rawLines(root, v).head

  private def resolvedPaths(root: String, v: Int): Set[String] =
    SnapshotTable.dataFilePaths(spark, root, v).toSet

  test("appends write O(batch) manifest lines; resolution accumulates the full set") {
    val root = tmp()
    SnapshotTable.create(spark, root,
      (0L until 100L).map(i => (i, s"r$i")).toDF("id", "v")
        .repartitionByRange(4, col("id")), statsKey = Some("id"))
    assert(!header(root, 1).contains("\"base\""), "create is a full manifest")
    val v1 = resolvedPaths(root, 1)
    assert(v1.size == 4)
    (0 until 3).foreach { i =>
      SnapshotTable.append(spark, root,
        Seq((1000L + i, "tiny")).toDF("id", "v").coalesce(1))
    }
    // each append's manifest lists exactly its own adds — one line —
    // however many files the table already holds
    (2 to 4).foreach { v =>
      assert(header(root, v).contains(s""""base":${v - 1}"""),
        s"v$v must be a delta on v${v - 1}")
      val lines = entryLines(root, v)
      assert(lines.size == 1 && !lines.head.startsWith("R\t"),
        s"an append of one file writes one manifest line, got $lines")
    }
    assert(resolvedPaths(root, 4).size == 7)
    assert(v1.subsetOf(resolvedPaths(root, 4)))
    val now = SnapshotTable.read(spark, root)
    assert(now.count() == 103)
    // time travel across the chain: every version resolves its own state
    assert(SnapshotTable.read(spark, root, Some(2)).count() == 101)
    assert(SnapshotTable.read(spark, root, Some(1)).count() == 100)
  }

  test("a merge's delta records its blast radius; a compact checkpoints") {
    val root = tmp()
    SnapshotTable.create(spark, root,
      (0L until 400L).map(i => (i, s"r$i")).toDF("id", "v")
        .repartitionByRange(4, col("id")), statsKey = Some("id"))
    SnapshotTable.merge(spark, root, Seq((10L, "X")).toDF("id", "v"), key = "id")
    val m = entryLines(root, 2)
    assert(m.count(_.startsWith("R\t")) == 1, s"merge removes the one hit file: $m")
    assert(m.size < 4, "delta smaller than the live file list")
    assert(SnapshotTable.read(spark, root).filter(col("id") === 10L)
      .head().getString(1) == "X")
    assert(SnapshotTable.read(spark, root).count() == 400)
    // compact rewrites (almost) everything — the strictly-smaller test
    // fails and the manifest is a natural full checkpoint
    SnapshotTable.compact(spark, root, targetFiles = 2)
    assert(!header(root, 3).contains("\"base\""), "compact writes a full manifest")
    assert(SnapshotTable.read(spark, root).count() == 400)
  }

  test("deleteWhere's dv repoint rides the delta; resolution carries every untouched entry") {
    val root = tmp()
    SnapshotTable.create(spark, root,
      (0L until 400L).map(i => (i, s"r$i")).toDF("id", "v")
        .repartitionByRange(4, col("id")), statsKey = Some("id"))
    SnapshotTable.deleteWhere(spark, root, col("id") === 7L)
    val lines = entryLines(root, 2)
    // one changed entry (the dv-bearing file), zero removals, three carried
    assert(lines.count(_.startsWith("R\t")) == 0, s"dv repoint removes nothing: $lines")
    assert(lines.size == 1, s"only the dv-bearing entry is relisted: $lines")
    assert(resolvedPaths(root, 2) == resolvedPaths(root, 1),
      "the file set is unchanged — only one entry's dv moved")
    assert(SnapshotTable.read(spark, root).count() == 399)
    assert(SnapshotTable.read(spark, root).filter(col("id") === 7L).count() == 0)
  }

  test("chain depth is bounded: a parent at the cap forces a full checkpoint") {
    val root = tmp()
    SnapshotTable.create(spark, root, Seq((0L, "seed")).toDF("id", "v").coalesce(1),
      statsKey = Some("id"))
    val n = SnapshotTable.MaxChainDepth + 3
    (1 to n).foreach { i =>
      SnapshotTable.append(spark, root, Seq((i.toLong, s"a$i")).toDF("id", "v").coalesce(1))
    }
    val headers = (1 to (n + 1)).map(v => header(root, v))
    val fulls = headers.zipWithIndex.collect {
      case (h, i) if !h.contains("\"base\"") => i + 1
    }
    assert(fulls.contains(1), "the create is full")
    assert(fulls.exists(_ > 1), s"some later commit must checkpoint, got fulls=$fulls")
    // no version's recorded depth exceeds the cap
    val depths = headers.flatMap(h =>
      """"depth":(\d+)""".r.findFirstMatchIn(h).map(_.group(1).toInt))
    assert(depths.nonEmpty && depths.max <= SnapshotTable.MaxChainDepth,
      s"depths=$depths")
    assert(SnapshotTable.read(spark, root).count() == n + 1)
    // the scheduler's view of chain health: describeDetail reports the
    // HEAD's resolution cost, and a compact resets it to zero
    assert(SnapshotTable.describeDetail(spark, root).chainDepth > 0)
    SnapshotTable.compact(spark, root, targetFiles = 1)
    assert(SnapshotTable.describeDetail(spark, root).chainDepth == 0)
  }

  test("expire across a chain: shadow checkpoint keeps retained versions readable") {
    val root = tmp()
    SnapshotTable.create(spark, root, Seq((0L, "seed")).toDF("id", "v").coalesce(1),
      statsKey = Some("id"))
    (1 to 4).foreach(i => SnapshotTable.append(spark, root,
      Seq((i.toLong, s"a$i")).toDF("id", "v").coalesce(1)))   // v2..v5, deltas
    val dropped = SnapshotTable.expireVersions(spark, root, keepLast = 2)
    assert(dropped == Seq(1, 2, 3), s"exact expiry semantics, got $dropped")
    assert(SnapshotTable.versions(spark, root) == Seq(4, 5))
    // the oldest retained delta got a checkpoint; the head (chained to
    // v4 via its own base) resolves through it
    assert(Files.exists(Paths.get(root, "_snapshots", "v0000004.ckpt.json")),
      "retained delta whose bases died must have been checkpointed")
    assert(SnapshotTable.read(spark, root, Some(4)).count() == 4)
    assert(SnapshotTable.read(spark, root, Some(5)).count() == 5)
    // vacuum spares the LIVE checkpoint even at zero age
    val swept = SnapshotTable.vacuum(spark, root, minAgeMs = 0L)
    assert(!swept.exists(_.contains("ckpt")), s"live ckpt must survive vacuum: $swept")
    assert(SnapshotTable.read(spark, root, Some(4)).count() == 4)
    // expire again down to the head: v4's manifest AND checkpoint go,
    // and an orphaned ckpt left behind would be vacuum food anyway
    assert(SnapshotTable.expireVersions(spark, root, keepLast = 1) == Seq(4))
    assert(!Files.exists(Paths.get(root, "_snapshots", "v0000004.ckpt.json")),
      "expiry deletes the dropped version's checkpoint with its manifest")
    assert(SnapshotTable.read(spark, root).count() == 5)
  }

  test("expireOlderThan protects age-retained versions whose chain crosses the cutoff") {
    val root = tmp()
    SnapshotTable.create(spark, root, Seq((0L, "seed")).toDF("id", "v").coalesce(1),
      statsKey = Some("id"))
    (1 to 3).foreach(i => SnapshotTable.append(spark, root,
      Seq((i.toLong, s"a$i")).toDF("id", "v").coalesce(1)))   // v2..v4
    // age out everything but the newest two
    def pin(v: Int, ts: Long): Unit =
      Files.setLastModifiedTime(Paths.get(root, "_snapshots", f"v$v%07d.json"),
        java.nio.file.attribute.FileTime.fromMillis(ts))
    val t = System.currentTimeMillis()
    pin(1, t - 100000); pin(2, t - 100000); pin(3, t); pin(4, t)
    val dropped = SnapshotTable.expireOlderThan(spark, root, maxAgeMs = 50000L)
    assert(dropped == Seq(1, 2), s"got $dropped")
    // v3 (delta on dead v2) was checkpointed; v4 resolves through it
    assert(SnapshotTable.read(spark, root, Some(3)).count() == 3)
    assert(SnapshotTable.read(spark, root, Some(4)).count() == 4)
  }

  test("manifest memo: a cold history() opens ≤ V + depth files, a warm one zero") {
    val root = tmp()
    SnapshotTable.create(spark, root, Seq((0L, "seed")).toDF("id", "v"),
      statsKey = Some("id"))
    // 20 micro appends: chains build to the depth cap and checkpoint,
    // so naive per-version resolution would re-walk each chain —
    // Σ(depth+1) ≈ 130 opens for 21 versions; the memo parses each
    // manifest once, so a cold full-history read is ≤ V + depth
    (1 to 20).foreach(i =>
      SnapshotTable.append(spark, root, Seq((i.toLong, s"r$i")).toDF("id", "v")))
    val vCount = SnapshotTable.versions(spark, root).size
    assert(vCount == 21)
    SnapshotTable.clearManifestMemo()
    val cold0 = SnapshotTable.manifestOpens.get()
    val h = SnapshotTable.history(spark, root)
    val coldOpens = SnapshotTable.manifestOpens.get() - cold0
    assert(h.size == vCount)
    assert(coldOpens <= vCount + SnapshotTable.MaxChainDepth,
      s"cold history() opened $coldOpens manifests for $vCount versions — " +
        "the memo must bound this at V + depth, never V·depth")
    // warm: manifests are immutable, the memo serves everything
    val warm0 = SnapshotTable.manifestOpens.get()
    SnapshotTable.history(spark, root)
    assert(SnapshotTable.manifestOpens.get() - warm0 == 0,
      "a second history() over unchanged manifests must open nothing")
    // a NEW commit invalidates nothing: one fresh manifest, one open
    SnapshotTable.append(spark, root, Seq((99L, "new")).toDF("id", "v"))
    val after0 = SnapshotTable.manifestOpens.get()
    val h2 = SnapshotTable.history(spark, root)
    assert(h2.size == vCount + 1)
    assert(SnapshotTable.manifestOpens.get() - after0 <= 1,
      "history() after one commit re-opens only the new manifest")
  }

  test("randomized lifecycle equals the in-memory model at every version") {
    import spark.implicits._
    // a deterministic pseudo-random op sequence (fixed seed: the point
    // is interaction coverage — deltas × dv × merges × compaction ×
    // expiry — not fresh randomness per run) applied BOTH to the table
    // and to an in-memory model; the table must agree after every op
    // and at every still-live historical version at the end.
    val rnd = new scala.util.Random(4242)
    val root = tmp()
    var model = Map[Long, String]((0L until 40L).map(i => i -> s"v0-$i"): _*)
    val history = scala.collection.mutable.ArrayBuffer[(Int, Map[Long, String])]()
    SnapshotTable.create(spark, root,
      model.toSeq.toDF("id", "v").repartitionByRange(3, col("id")),
      statsKey = Some("id"))
    history += 1 -> model
    var nextId = 100L
    (0 until 14).foreach { step =>
      rnd.nextInt(4) match {
        case 0 => // append fresh ids
          val batch = (0 until 1 + rnd.nextInt(3)).map { _ =>
            val id = nextId; nextId += 1; id -> s"a$step-$id" }
          SnapshotTable.append(spark, root, batch.toDF("id", "v").coalesce(1))
          model = model ++ batch
        case 1 => // merge: update a random live key + insert one
          val upd = model.keys.toSeq.sorted.apply(rnd.nextInt(model.size)) -> s"m$step"
          val ins = { val id = nextId; nextId += 1; id -> s"mi$step-$id" }
          SnapshotTable.merge(spark, root, Seq(upd, ins).toDF("id", "v"), key = "id")
          model = model + upd + ins
        case 2 => // dv delete of a random live key
          val victim = model.keys.toSeq.sorted.apply(rnd.nextInt(model.size))
          SnapshotTable.deleteWhere(spark, root, col("id") === victim)
          model = model - victim
        case 3 => // maintenance flavor: compact or expire
          if (rnd.nextBoolean()) SnapshotTable.compact(spark, root, targetFiles = 2)
          else SnapshotTable.expireVersions(spark, root,
            keepLast = 1 + rnd.nextInt(3))
      }
      val vs = SnapshotTable.versions(spark, root)
      if (history.lastOption.forall(_._1 != vs.last)) history += vs.last -> model
      val now = SnapshotTable.read(spark, root).as[(Long, String)].collect().toMap
      assert(now == model, s"divergence after step $step (${vs.last} versions)")
    }
    // every still-live non-compact version must replay its own state
    val live = SnapshotTable.versions(spark, root).toSet
    history.filter { case (v, _) => live.contains(v) }.foreach { case (v, st) =>
      val got = SnapshotTable.read(spark, root, Some(v))
        .as[(Long, String)].collect().toMap
      assert(got == st, s"time travel to v$v diverged")
    }
  }

  test("CDC over delta commits: per-version diffs match the logical state exactly") {
    val root = tmp()
    def rows(r: (Long, String)*) = r.toDF("id", "v")
    SnapshotTable.create(spark, root,
      rows(1L -> "a", 2L -> "b", 3L -> "c").repartitionByRange(3, col("id")),
      statsKey = Some("id"))
    SnapshotTable.append(spark, root, rows(4L -> "d"))          // v2 delta
    SnapshotTable.merge(spark, root, rows(2L -> "B"), key = "id") // v3 delta
    SnapshotTable.deleteWhere(spark, root, col("id") === 3L)    // v4 delta
    assert((2 to 4).forall(v => header(root, v).contains("\"base\"")),
      "the whole window rode deltas")
    val changes = SnapshotTable.readChanges(spark, root, 0)
      .select(col("_commit_version"), col("_change_type"), col("id"), col("v"))
      .as[(Int, String, Long, String)].collect().toSet
    assert(changes == Set(
      (1, "insert", 1L, "a"), (1, "insert", 2L, "b"), (1, "insert", 3L, "c"),
      (2, "insert", 4L, "d"),
      (3, "insert", 2L, "B"), (3, "delete", 2L, "b"),
      (4, "delete", 3L, "c")))
    assert(SnapshotTable.read(spark, root).count() == 3)
  }

  test("mapping-free commits stay format 8; column-mapping activation bumps to 9") {
    val root = tmp()
    SnapshotTable.create(spark, root, Seq((1L, "a")).toDF("id", "v"))
    SnapshotTable.append(spark, root, Seq((2L, "b")).toDF("id", "v"))
    assert((1 to 2).forall(v => header(root, v).contains("\"format\":8")),
      "a table that never activates column mapping must not demand a format-9 " +
        s"reader (got ${header(root, 1)} / ${header(root, 2)})")
    SnapshotTable.renameColumn(spark, root, "v", "body") // activates mapping
    SnapshotTable.append(spark, root, Seq((3L, "c")).toDF("id", "body"))
    assert((3 to 4).forall(v => header(root, v).contains("\"format\":9")),
      "commits carrying a column map must bump the reader requirement")
  }

  test("same-path drop + re-create never serves the dead table's manifest") {
    val root = tmp()
    SnapshotTable.create(spark, root, Seq((1L, "old")).toDF("id", "v"))
    assert(SnapshotTable.read(spark, root).select("v").as[String].collect()
      .toSeq == Seq("old")) // memoize the v1 manifest
    // drop = external rm -rf (there is no drop API — the CI churn pattern);
    // the recreated v1 manifest may coincide in (mtime, length), so only
    // create()'s explicit invalidation makes this deterministic
    val dir = Paths.get(root)
    Files.walk(dir).sorted(java.util.Comparator.reverseOrder())
      .forEach(p => Files.delete(p))
    Files.createDirectories(dir)
    SnapshotTable.create(spark, root, Seq((1L, "new")).toDF("id", "v"))
    assert(SnapshotTable.read(spark, root).select("v").as[String].collect()
      .toSeq == Seq("new"),
      "the recreated table's read must never resolve through the dead table's memo")
  }
}
