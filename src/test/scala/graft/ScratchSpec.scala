package graft

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

/** Scratch-directory lifecycle: queries that build a write-lifecycle
  * corpus under /tmp either serve from a JVM-kept master FIXTURE
  * (retrieval gates since r18: at most one `graft-retfix-` dir per
  * gate per process, swept by a shutdown hook), or return a
  * distributed per-doc frame and register the root for the runner's
  * drain (the CacheScope contract, for paths). Before this lifecycle
  * existed, benching leaked a corpus-sized tree per invocation. */
class ScratchSpec extends SparkSpec {

  private val prefixes =
    Seq("graft-retrieval-", "graft-retmaint-", "graft-retfix-",
      "graft-snapq", "graft-schevo", "graft-srcq")

  private def scratchDirs(): Set[String] = {
    val s = Files.list(Paths.get("/tmp"))
    try s.iterator().asScala
      .map(_.getFileName.toString)
      .filter(n => prefixes.exists(n.startsWith))
      .toSet
    finally s.close()
  }

  test("retrieval gates keep BOUNDED fixtures: repeat runs add no dirs") {
    // r18 semantics: each gate memoizes ONE master table per JVM
    // (key: dir + terms + vec id) — the per-invocation
    // graft-retrieval-/graft-retmaint- scratch trees no longer exist,
    // and a re-run must reuse the master, not rebuild it. A regression
    // that rebuilt per call (e.g. key churn) grows /tmp per invocation
    // and fails the diff below.
    for (q <- Seq("retrieval_snapshot_timetravel", "retrieval_snapshot_maintenance")) {
      val n1 = SparkEntry.queries(q)(spark, sf).count() // may build the master
      val after1 = scratchDirs()
      val n2 = SparkEntry.queries(q)(spark, sf).count()
      assert(n1 == n2 && n1 > 0, s"$q must produce stable rows")
      val grown = scratchDirs() diff after1
      assert(grown.isEmpty, s"$q rebuilt its fixture on a repeat run: $grown")
      assert(!after1.exists(d => d.startsWith("graft-retrieval-") ||
        d.startsWith("graft-retmaint-")),
        s"$q must not recreate the per-invocation scratch trees")
    }
  }

  test("per-doc lifecycle queries register their roots; the runner drain removes them") {
    for (q <- Seq("meta_snapshot_merge", "meta_snapshot_schema_evo")) {
      // /tmp may hold residue from OTHER sessions; compare to a baseline
      val baseline = scratchDirs()
      Scratch.scopedCleanup {
        val n = SparkEntry.queries(q)(spark, sf).count()
        assert(n > 0, s"$q must still produce rows")
        assert((scratchDirs() diff baseline).nonEmpty,
          s"$q should hold its scratch root until the drain (distributed result)")
      } // scopedCleanup drains on exit
      val leftover = scratchDirs() diff baseline
      assert(leftover.isEmpty, s"drain must delete $q's registered roots, left: $leftover")
    }
  }

  test("re-ingestion corpus is cached per process: repeated runs add no dirs") {
    // meta_source_convert keeps ONE shutdown-hook-deleted corpus per
    // (process, input dir) — the gated scan+convert path re-executes
    // every run, the file-write input prep does not
    val n1 = SparkEntry.queries("meta_source_convert")(spark, sf).count()
    val after1 = scratchDirs()
    val n2 = SparkEntry.queries("meta_source_convert")(spark, sf).count()
    assert(n1 == n2 && n1 > 0)
    val grown = scratchDirs() diff after1
    assert(grown.isEmpty, s"repeated runs must reuse the cached corpus, grew: $grown")
  }

  test("localized results survive re-execution after scratch deletion") {
    // the returned frame must have no tie to the deleted paths: a
    // second action on the SAME frame re-plays a local relation
    val df = SparkEntry.queries("retrieval_snapshot_timetravel")(spark, sf)
    val first = df.collect().toSeq
    val second = df.collect().toSeq // scratch table long gone
    assert(first == second && first.nonEmpty)
  }
}
