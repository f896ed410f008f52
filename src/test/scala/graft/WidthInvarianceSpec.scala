package graft

import org.apache.spark.sql.SparkSession

/** The narrow-probe contract, pinned: gates the bench runs on a
  * narrow throwaway session (width 4, AQE off — SparkEntry.narrowProbe)
  * must produce VALUE-identical rows to the same operator on a wide
  * adaptive session. Round 17 moved ~25 gates to narrow probes for
  * action-floor economics; every move was A/B'd by hand first, and
  * this spec keeps the property under regression for the narrowed
  * gates whose operator is publicly callable (so the wide side is a
  * REAL wide run, not the gate's own internal narrowing). A failure
  * means width- or AQE-sensitive values (float partition-order sums,
  * un-rounded rankings, RNG) crept into a narrowed gate.
  */
class WidthInvarianceSpec extends SparkSpec {

  // the gate's wired terms, referenced so a change can't drift
  private val terms = SparkEntry.queryTerms

  private def wide(): SparkSession = {
    val s = spark.newSession()
    s.conf.set("spark.sql.shuffle.partitions", "13") // deliberately odd
    s.conf.set("spark.sql.adaptive.enabled", "true")
    s
  }

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq.sorted

  test("dedup_decontaminate: narrow gate equals wide operator") {
    assert(rows(SparkEntry.queries("dedup_decontaminate")(spark.newSession(), sf))
      == rows(graft.vector.Dedup.decontaminate(wide(), sf)))
  }

  test("retrieval_snapshot_timetravel: narrow gate equals wide operator") {
    // each side must BUILD its master, not hit the other's fixture
    // memo — this pin is about build-width invariance, not search-only
    graft.vector.SnapshotRetrieval.clearFixtureMemoForTests()
    val narrow = rows(SparkEntry.queries("retrieval_snapshot_timetravel")(spark.newSession(), sf))
    graft.vector.SnapshotRetrieval.clearFixtureMemoForTests()
    assert(narrow == rows(graft.vector.SnapshotRetrieval.searchTimeTravel(wide(), sf, terms)))
  }

  test("retrieval_snapshot_maintenance: narrow gate equals wide operator") {
    graft.vector.SnapshotRetrieval.clearFixtureMemoForTests()
    val narrow = rows(SparkEntry.queries("retrieval_snapshot_maintenance")(spark.newSession(), sf))
    graft.vector.SnapshotRetrieval.clearFixtureMemoForTests()
    assert(narrow == rows(graft.vector.SnapshotRetrieval.searchAfterMaintenance(wide(), sf, terms)))
  }

  /** Replay a gate twice through its OWN wiring — once narrow (the
    * bench shape), once with `-Dgraft.wideProbe=true` flipping every
    * narrowProbe to the caller's width — and demand identical rows.
    * This pins narrowed gates whose cycle is not publicly callable
    * (r17 advice: only 3 of ~27 narrowed gates had replays). */
  private def gateWideReplay(gate: String): Unit = {
    val narrow = rows(SparkEntry.queries(gate)(spark.newSession(), sf))
    System.setProperty("graft.wideProbe", "true")
    try {
      val w = wide()
      assert(narrow == rows(SparkEntry.queries(gate)(w, sf)),
        s"$gate: narrow-probe rows differ from wide replay")
    } finally { System.clearProperty("graft.wideProbe"); () }
  }

  test("meta_snapshot_merge: narrow gate equals its own wide replay") {
    gateWideReplay("meta_snapshot_merge")
  }

  test("meta_snapshot_restore: narrow gate equals wide replay, fixture rebuilt") {
    // fixture-memo policy condition (c): each arm must BUILD the
    // 4-commit master itself — a replay over the other arm's cached
    // master would pin search-width only, not build-width
    SparkEntry.clearRestoreFixtureForTests()
    val narrow = rows(SparkEntry.queries("meta_snapshot_restore")(spark.newSession(), sf))
    SparkEntry.clearRestoreFixtureForTests()
    System.setProperty("graft.wideProbe", "true")
    try assert(narrow ==
      rows(SparkEntry.queries("meta_snapshot_restore")(wide(), sf)))
    finally {
      System.clearProperty("graft.wideProbe")
      SparkEntry.clearRestoreFixtureForTests() // wide master must not serve later gates
    }
  }

  test("meta_snapshot_zorder_read: narrow gate equals its own wide replay") {
    gateWideReplay("meta_snapshot_zorder_read")
  }

  test("meta_snapshot_incr_view: narrow gate equals wide replay, fixture rebuilt") {
    // fixture-memo policy condition (c): each arm builds its own
    // pre-refresh master (table v1..v3 + view) — see the restore test
    SparkEntry.clearIncrViewFixtureForTests()
    val narrow = rows(SparkEntry.queries("meta_snapshot_incr_view")(spark.newSession(), sf))
    SparkEntry.clearIncrViewFixtureForTests()
    System.setProperty("graft.wideProbe", "true")
    try assert(narrow ==
      rows(SparkEntry.queries("meta_snapshot_incr_view")(wide(), sf)))
    finally {
      System.clearProperty("graft.wideProbe")
      SparkEntry.clearIncrViewFixtureForTests()
    }
  }

  /** Gates replayed by the loop test below. Kept in ONE place so the
    * coverage lint can compare it against the actual narrowProbe
    * wirings in SparkEntry's source. */
  private val loopReplayed = Seq(
      "text_lm_perplexity", "dedup_semantic", "dedup_cluster_reps",
      "sample_leakage_split",
      "dedup_jaccard_verify", "dedup_fuzzy_verify", "vec_ivf_kmeans_topk",
      "meta_snapshot_schema_evo", "meta_snapshot_history",
      "meta_snapshot_indexed_read", "meta_snapshot_point_read",
      "meta_snapshot_2d_read", "meta_snapshot_2d_string_read",
      "meta_snapshot_compact_incr", "meta_snapshot_compact_range",
      "meta_snapshot_mirror", "meta_snapshot_string_merge",
      "meta_snapshot_delete", "meta_snapshot_bloom_read",
      "meta_snapshot_column_map", "meta_snapshot_nested_map",
      "meta_snapshot_constraints", "meta_snapshot_files",
      "meta_snapshot_asof", "meta_snapshot_merge_on_read")

  test("every remaining narrowed gate equals its own wide replay") {
    // the full r17-advice closure: all narrowProbe'd gates, not just
    // representatives. Failures accumulate so ONE run reports every
    // width-sensitive gate, not the first.
    val bad = loopReplayed.flatMap { g =>
      try { gateWideReplay(g); None }
      catch { case e: Throwable => Some(s"$g: ${e.getMessage.take(200)}") }
    }
    assert(bad.isEmpty, s"width-sensitive gates:\n${bad.mkString("\n")}")
  }

  test("replay coverage tracks the narrowProbe wirings (self-maintaining)") {
    // lint: parse SparkEntry's queries map for `"gate" -> ... narrowProbe(`
    // wirings and demand each one is replayed by SOME test in this
    // suite. The next gate someone narrows fails here until it gets a
    // replay — the closure cannot silently erode (r18 review finding).
    val srcPath = java.nio.file.Paths.get("src/main/scala/graft/SparkEntry.scala")
    assume(java.nio.file.Files.exists(srcPath), "source tree not present")
    val src = new String(java.nio.file.Files.readAllBytes(srcPath), "UTF-8")
    val mapRegion = src.substring(0, src.indexOf("def oracleSql"))
    val entry = "\"([a-z0-9_]+)\"\\s*->".r
    var current: String = null
    val narrowed = scala.collection.mutable.LinkedHashSet[String]()
    mapRegion.linesIterator.foreach { line =>
      entry.findFirstMatchIn(line).foreach(m => current = m.group(1))
      if (line.contains("narrowProbe(") && current != null) narrowed += current
    }
    assert(narrowed.nonEmpty, "lint lost the wirings — regex or layout drift")
    val covered = loopReplayed.toSet ++ Set(
      "dedup_decontaminate", "retrieval_snapshot_timetravel",
      "retrieval_snapshot_maintenance", "meta_snapshot_merge",
      "meta_snapshot_zorder_read", "text_lm_perplexity",
      "meta_snapshot_restore", "meta_snapshot_incr_view",
      "dedup_incr_probe")
    val uncovered = narrowed.toSet -- covered
    val stale = covered -- narrowed.toSet
    assert(uncovered.isEmpty,
      s"narrowed gates with NO wide replay in this suite: $uncovered")
    assert(stale.isEmpty,
      s"replays for gates that are no longer narrowed (update the lists): $stale")
  }

  test("vec_ann_probe_topk: narrow and wide arms each build their own index") {
    // fixture-memo policy condition (c) for the ANN index fixture: the
    // parquet write's width changes file COUNT, never the declared
    // buckets or the probe ranking
    SparkEntry.clearAnnProbeFixtureForTests()
    val narrow = rows(SparkEntry.queries("vec_ann_probe_topk")(spark.newSession(), sf))
    SparkEntry.clearAnnProbeFixtureForTests()
    try assert(narrow == rows(SparkEntry.queries("vec_ann_probe_topk")(wide(), sf)))
    finally SparkEntry.clearAnnProbeFixtureForTests()
  }

  test("dedup_incr_probe: narrow and wide arms each build their own band index") {
    // fixture-memo policy condition (c): the index table's file layout
    // depends on the build width; the probed pairs must not
    SparkEntry.clearDedupIncrFixtureForTests()
    val narrow = rows(SparkEntry.queries("dedup_incr_probe")(spark.newSession(), sf))
    SparkEntry.clearDedupIncrFixtureForTests()
    System.setProperty("graft.wideProbe", "true")
    try assert(narrow == rows(SparkEntry.queries("dedup_incr_probe")(wide(), sf)))
    finally {
      System.clearProperty("graft.wideProbe")
      SparkEntry.clearDedupIncrFixtureForTests()
    }
  }

  test("vec_ann_snapshot_topk: narrow and wide arms each build their own table") {
    // fixture-memo policy condition (c) for the snapshot-table index:
    // the create's range-partition width and the dv delete's shuffle
    // width change file layout, never the declared buckets, the dv'd
    // row set, or the probe ranking
    SparkEntry.clearAnnSnapshotFixtureForTests()
    val narrow = rows(SparkEntry.queries("vec_ann_snapshot_topk")(spark.newSession(), sf))
    SparkEntry.clearAnnSnapshotFixtureForTests()
    try assert(narrow == rows(SparkEntry.queries("vec_ann_snapshot_topk")(wide(), sf)))
    finally SparkEntry.clearAnnSnapshotFixtureForTests()
  }

  test("graph_pagerank ranks are width- and AQE-independent") {
    import org.apache.spark.sql.functions.col
    def ranks(s: SparkSession): Seq[String] = {
      val ids = Tables.documents(s, sf).select(col("doc_id"))
      val nodes = ids.select(col("doc_id").as("node"))
      val edges = graft.geom.PageRank.modularEdges(ids, "doc_id")
      rows(graft.geom.PageRank.run(nodes, edges, iters = 12))
    }
    val narrow = {
      val s = spark.newSession()
      s.conf.set("spark.sql.shuffle.partitions", "4")
      s.conf.set("spark.sql.adaptive.enabled", "false")
      s
    }
    assert(ranks(narrow) == ranks(wide()))
  }
}
