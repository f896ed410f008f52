package graft

import org.apache.spark.storage.StorageLevel

/** Per-runner cache-scope isolation: a drain in one runner's scope
  * must not evict frames a concurrent runner registered — previously
  * the registry was process-global and two drivers in one JVM could
  * silently evict each other's in-flight intermediates (correct via
  * recompute, but a performance cliff). */
class CacheScopeSpec extends SparkSpec {

  test("scoped drains are isolated: one runner cannot evict another's frames") {
    val a = new CacheScope
    val b = new CacheScope
    val dfA = spark.range(1000).toDF("n").persist()
    val dfB = spark.range(2000).toDF("n").persist()
    CacheScope.withScope(a) { CacheScope.register(dfA) }
    CacheScope.withScope(b) { CacheScope.register(dfB) }
    dfA.count(); dfB.count()
    assert(CacheScope.withScope(b) { CacheScope.drain() } == 1)
    assert(dfA.storageLevel != StorageLevel.NONE,
      "scope A's frame must survive scope B's drain")
    assert(dfB.storageLevel == StorageLevel.NONE,
      "scope B's own frame must be released")
    assert(CacheScope.withScope(a) { CacheScope.drain() } == 1)
    assert(dfA.storageLevel == StorageLevel.NONE)
  }

  test("two concurrent scoped runners with interleaved drains: both correct, spines isolated") {
    // two registering queries (both persist internal spines via
    // CacheScope.register) run on separate threads, each under its own
    // scope; each drains its own scope only — as Verify/Bench now do
    val results = new java.util.concurrent.ConcurrentHashMap[String, Long]()
    val spines = new java.util.concurrent.ConcurrentHashMap[String, Int]()
    def runner(name: String, query: String): Thread = new Thread(() => {
      val scope = new CacheScope
      CacheScope.withScope(scope) {
        val n = SparkEntry.queries(query)(spark, sf).count()
        results.put(name, n)
        spines.put(name, scope.size)
        scope.drain()
        ()
      }
    })
    val t1 = runner("jaccard", "dedup_jaccard_verify")
    val t2 = runner("decontam", "dedup_decontaminate")
    t1.start(); t2.start(); t1.join(120000); t2.join(120000)
    // both queries produced their known-correct row counts concurrently
    assert(results.get("jaccard") ==
      SparkEntry.queries("dedup_jaccard_verify")(spark, sf).count())
    assert(results.get("decontam") ==
      SparkEntry.queries("dedup_decontaminate")(spark, sf).count())
    CacheScope.drain() // release the re-run's default-scope frames
    // and each runner's spines landed in ITS scope, not a shared one
    assert(spines.get("jaccard") > 0, "jaccard must register its spine in its own scope")
    assert(spines.get("decontam") > 0, "decontamination must register its gram stream in its own scope")
  }
}
