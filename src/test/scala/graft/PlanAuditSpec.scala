package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Plan-shape regression guards (PLANS.md made executable): the
  * optimizations the 100 TB design depends on must stay in the plans. */
class PlanAuditSpec extends SparkSpec {

  private def executedPlanString(df: DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan.toString
      case p => p.toString
    }
  }
  private def simpleString(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("q1: ship-date filter pushed into the parquet scan") {
    val s = simpleString(relational.Relational.pricingSummary(spark, sf))
    assert(s.contains("PushedFilters") && s.contains("LessThanOrEqual(l_shipdate"))
  }

  test("q1: only needed lineitem columns read (pruning)") {
    val s = simpleString(relational.Relational.pricingSummary(spark, sf))
    assert(!s.contains("l_comment") && !s.contains("l_partkey"),
      "scan should not read unused columns")
  }

  test("global top-k compiles to TakeOrderedAndProject") {
    val s = simpleString(relational.Relational.topLineitems(spark, sf))
    assert(s.contains("TakeOrderedAndProject"))
  }

  test("cosine top-k plans without any shuffle exchange") {
    val s = simpleString(vector.VectorOps.cosineTopK(spark, sf))
    assert(!s.contains("Exchange hashpartitioning"),
      "brute-force scoring must not shuffle the embeddings table")
  }

  test("q5 keeps all dimensions broadcast at execution time") {
    val s = executedPlanString(relational.Relational.regionRevenue(spark, sf))
    assert(s.contains("BroadcastHashJoin"))
    assert(!s.contains("SortMergeJoin"), "dimensions must not sort-merge")
  }

  test("token windows plan with no exchange before the presentation sort") {
    val s = simpleString(chunk.TokenWindows.tokenWindows(spark, sf))
    // tokens, window starts and slices are per-row generators/projections:
    // the only exchange allowed is the final global sort's range partition
    assert(!s.contains("Exchange hashpartitioning"),
      "token windowing must stay map-side")
  }

  test("semantic chunker plans as one map pass (no hash exchange)") {
    val s = simpleString(chunk.SemanticChunker.semanticChunks(spark, sf))
    assert(!s.contains("Exchange hashpartitioning"),
      "document-local chunking must not shuffle")
  }

  test("q2 broadcasts dimension tables at execution time") {
    val s = executedPlanString(relational.Relational.minCostSupplier(spark, sf))
    assert(s.contains("BroadcastHashJoin"))
  }

  test("q11 threshold scalar is broadcast, not recomputed per row") {
    val s = executedPlanString(relational.Relational.importantStock(spark, sf))
    assert(s.contains("BroadcastNestedLoopJoin") || s.contains("BroadcastExchange"),
      "the total-value scalar must arrive via broadcast")
  }

  test("q21 plans without Expand (no distinct aggregates over the fact table)") {
    val s = simpleString(relational.TpchDeep.waitingSuppliers(spark, sf))
    assert(!s.contains("Expand"),
      "the (orderkey, suppkey) pre-aggregation must keep countDistinct — and " +
        "its Expand-tripled shuffle of lineitem — out of the plan")
  }

  test("lang-id plans map-only with one tokenization generator per doc") {
    val df = SparkEntry.queries("text_lang_id")(spark, sf)
    val s = simpleString(df)
    assert(!s.contains("Exchange hashpartitioning"), "lang-id must not shuffle")
    // one Generate materializes the token array, a second the score
    // struct — the barriers that stop CollapseProject from inlining the
    // regex tokenization into every score column (the ~8× regression)
    assert("Generate".r.findAllIn(s).size == 2,
      "tokenization and scoring must each sit behind a Generate barrier")
  }

  test("chunk stats plan is map-only (no chunk text, no aggregation shuffle)") {
    val s = simpleString(chunk.Chunking.chunkStats(Tables.documents(spark, sf)))
    assert(!s.contains("Exchange hashpartitioning"),
      "closed-form stats must not shuffle")
  }

  test("fixed-query BM25 never shuffles the corpus token stream") {
    val df = SparkEntry.queries("bm25_topk")(spark, sf)
    val s = simpleString(df)
    // the only hash exchanges allowed are over the surviving postings
    // (window on term, final per-doc agg) — tiny frames; the corpus-wide
    // exploded (doc, term) aggregate shuffled every token
    assert("Exchange hashpartitioning".r.findAllIn(s).size <= 2,
      "only posting-sized exchanges may remain")
    assert("Generate".r.findAllIn(s).size == 2,
      "token array + per-term counts must each sit behind one Generate")
  }

  test("repetition signals: array stats stay map-side, only the word mode explodes") {
    val df = SparkEntry.queries("text_repetition")(spark, sf)
    val s = simpleString(df)
    // the line/2-gram/bullet fractions are higher-order array ops in a
    // single projection; exactly ONE Generate (the word explode feeding
    // the per-doc mode) is allowed — a second would mean the array
    // stats regressed into corpus-wide exploded aggregates
    assert("Generate".r.findAllIn(s).size == 1,
      "only the word-mode path may explode")
  }

  test("embed-knn search joins broadcast, never sort-merge") {
    val df = SparkEntry.queries("vec_embed_knn")(spark, sf)
    val s = simpleString(df)
    // the query side is one row (its bucket signature + vector): both
    // the bucket probe and any fallback cross join must broadcast —
    // a SortMergeJoin here would shuffle the whole embedding table
    assert(!s.contains("SortMergeJoin"),
      "bucket probe must broadcast the one-row query side")
  }

  test("pii scrub is one map-side projection (no exchange beyond the final sort)") {
    val s = simpleString(SparkEntry.queries("text_pii_scrub")(spark, sf))
    // the only exchange allowed is the presentation sort's range partition
    assert(!s.contains("Exchange hashpartitioning"),
      "regex scrub must not shuffle")
  }

  test("shard shuffle plans exactly one hash exchange (the shard key)") {
    val s = simpleString(SparkEntry.queries("sample_shard_shuffle")(spark, sf))
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(s).size
    assert(hashExchanges == 1,
      s"expected the single shard-key shuffle, saw $hashExchanges hash exchanges")
  }

  test("span dedup shuffles gram hashes, never gram strings") {
    val df = vector.Dedup.duplicateSpans(spark, sf)
    df.collect()
    val s = df.queryExecution.executedPlan.toString
    // both exchanges (global count + position probe) key on the int64
    // hash column g; the concat_ws'd gram string must be projected away
    // before any exchange
    val bad = s.linesIterator.filter(_.contains("Exchange hashpartitioning"))
      .exists(_.contains("concat_ws"))
    assert(!bad, "gram strings must be hashed to int64 before shuffling")
  }

  test("term commonness shuffles token hashes, never token strings") {
    val df = SparkEntry.queries("text_term_commonness")(spark, sf)
    df.collect()
    val s = df.queryExecution.executedPlan.toString
    val bad = s.linesIterator.filter(_.contains("Exchange hashpartitioning"))
      .exists(l => l.contains("tok#"))
    assert(!bad, "token strings must be hashed to int64 before shuffling")
  }

  test("mojibake detection is one map-side counting projection") {
    val s = simpleString(SparkEntry.queries("text_mojibake")(spark, sf))
    // three regexp_count columns + one division: all in the scan's
    // codegen stage; the only exchange is the presentation sort's
    assert(!s.contains("Exchange hashpartitioning"),
      "artifact counting must not shuffle")
  }

  test("reservoir sample plans as top-k, never a global sort") {
    val s = simpleString(SparkEntry.queries("sample_reservoir")(spark, sf))
    assert(s.contains("TakeOrderedAndProject"),
      "budget sample must be per-partition top-k (TakeOrderedAndProject)")
    // the inner k-selection must not pay a range exchange; only the
    // outer presentation sort may
    assert(s.linesIterator.count(_.contains("Exchange rangepartitioning")) <= 1,
      "global sort leaked into the k-selection")
  }

  test("bigram LM shuffles token hashes, never token strings") {
    val df = SparkEntry.queries("text_lm_perplexity")(spark, sf)
    df.collect()
    val s = df.queryExecution.executedPlan.toString
    // every hash exchange must key on the int64 hash pairs (or doc_id);
    // a partitioning expression still computing the tokenizer would
    // mean strings reached the shuffle
    val bad = s.linesIterator.filter(_.contains("Exchange hashpartitioning"))
      .exists(l => l.contains("split(") || l.contains("lower("))
    assert(!bad, "tokenization must stay map-side; only hashes shuffle")
  }

  test("normalization chain stays in one codegen stage with the scan") {
    val df = Tables.documents(spark, sf)
      .select(functions.Nfkc.nfkc(text.TextFunctions.normalize(
        org.apache.spark.sql.functions.col("text"))))
    val s = simpleString(df)
    // '*(n)' prefixes mark WholeStageCodegen stages in toString; the
    // whole expression chain must sit in stage 1 with the scan, with no
    // exchange in between
    assert(s.contains("*(1) Project"))
    assert(!s.contains("Exchange"))
  }
}
