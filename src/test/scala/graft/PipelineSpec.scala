package graft

import org.apache.spark.sql.functions._

/** End-to-end pipeline API (§3.1 lifecycle as one DAG). */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  test("buildIndex produces index_point-shaped rows for every chunk") {
    val idx = Pipeline.buildIndex(spark, sf)
    assert(idx.columns.toSeq == Seq("id", "text", "dense", "metadata"))
    val nChunks = Pipeline.buildChunks(spark, sf).count()
    assert(idx.count() == nChunks)
    // ids unique
    assert(idx.select("id").distinct().count() == nChunks)
    // every doc_id < 500 has an embedding joined
    assert(idx.filter(col("metadata.doc_id") < 500 && col("dense").isNull).count() == 0)
  }

  test("upsertIndex: reprocessing a document replaces its chunks exactly once") {
    val idx = Pipeline.buildIndex(spark, sf)
    val updates = idx.filter(col("metadata.doc_id") === 1)
      .withColumn("text", concat(col("text"), lit(" v2")))
    val once = Pipeline.upsertIndex(idx, updates)
    assert(once.count() == idx.count())
    val twice = Pipeline.upsertIndex(once, updates)
    assert(twice.count() == idx.count())
    val doc1 = twice.filter(col("metadata.doc_id") === 1).select("text").as[String].collect()
    assert(doc1.forall(_.endsWith(" v2")))
  }

  test("upsertIndex: a document shrinking to fewer chunks leaves no stale tail") {
    val idx = Pipeline.buildIndex(spark, sf)
    val before = idx.filter(col("metadata.doc_id") === 1).count()
    assert(before > 1, "fixture doc 1 must have multiple chunks")
    // reprocessed doc 1 now yields only its first chunk
    val shrunk = idx.filter(col("metadata.doc_id") === 1 && col("metadata.chunk_idx") === 0)
      .withColumn("text", concat(col("text"), lit(" v2")))
    val after = Pipeline.upsertIndex(idx, shrunk)
    assert(after.filter(col("metadata.doc_id") === 1).count() == 1)
    assert(after.count() == idx.count() - before + 1)
    val doc1 = after.filter(col("metadata.doc_id") === 1).select("text").as[String].collect()
    assert(doc1.forall(_.endsWith(" v2")))
  }

  test("buildChunks dispatches on the configured splitter (TextSplitterName)") {
    val splitters = Seq("recursive", "markdown", "semantic", "sentence")
    val tables = splitters.map(s =>
      s -> Pipeline.buildChunks(spark, sf, Pipeline.EtlConfig(splitter = s)).cache())
    tables.foreach { case (name, df) =>
      // uniform schema regardless of splitter
      assert(df.columns.toSeq == Seq("doc_id", "chunk_idx", "chunk", "n_tokens", "fingerprint"),
        s"splitter $name schema")
      assert(df.count() > 0, s"splitter $name emitted no chunks")
      // chunk ids unique per doc
      assert(df.select("doc_id", "chunk_idx").distinct().count() == df.count(),
        s"splitter $name duplicate chunk ids")
    }
    // the four strategies genuinely chunk differently
    val counts = tables.map(_._2.count()).toSet
    assert(counts.size >= 3, s"expected distinct chunkings, got $counts")
    // and each feeds buildIndex unchanged
    val idx = Pipeline.buildIndex(spark, sf, Pipeline.EtlConfig(splitter = "semantic"))
    assert(idx.columns.toSeq == Seq("id", "text", "dense", "metadata"))
    assert(idx.count() == tables.toMap.apply("semantic").count())
  }

  test("search dispatches on configured distance") {
    val cos = Pipeline.search(spark, sf, 0, 5)
    val l2 = Pipeline.search(spark, sf, 0, 5, Pipeline.EtlConfig(distance = "euclid"))
    assert(cos.columns.contains("score") && l2.columns.contains("dist2"))
    assert(cos.count() == 5 && l2.count() == 5)
    // self-match first in both
    assert(cos.head().getLong(0) == 0L && l2.head().getLong(0) == 0L)
  }

  test("search dispatches on retrieval_mode; each mode equals its standalone operator") {
    val terms = Seq("spark", "window", "merge", "stream")
    def ranking(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      df.select(df.columns.head).collect().map(_.getLong(0)).toSeq
    // dense (default) ≡ VectorOps.cosineTopK
    assert(ranking(Pipeline.search(spark, sf, 0, 5)) ==
      ranking(graft.vector.VectorOps.cosineTopK(spark, sf, 0, 5)))
    // sparse ≡ Bm25.bm25TopK
    val sparseCfg = Pipeline.EtlConfig(retrievalMode = "sparse", queryTerms = terms)
    assert(ranking(Pipeline.search(spark, sf, 0, 5, sparseCfg)) ==
      ranking(graft.vector.Bm25.bm25TopK(spark, sf, terms, 5)))
    // hybrid ≡ Bm25.hybridRrf
    val hybridCfg = Pipeline.EtlConfig(retrievalMode = "hybrid", queryTerms = terms)
    assert(ranking(Pipeline.search(spark, sf, 0, 5, hybridCfg)) ==
      ranking(graft.vector.Bm25.hybridRrf(spark, sf, terms, 0, 5)))
    // refusal edges: unknown mode; sparse/hybrid without terms
    assert(scala.util.Try(Pipeline.search(spark, sf, 0, 5,
      Pipeline.EtlConfig(retrievalMode = "faiss"))).isFailure)
    assert(scala.util.Try(Pipeline.search(spark, sf, 0, 5,
      Pipeline.EtlConfig(retrievalMode = "sparse"))).isFailure)
  }

  test("dedupReport flags the exact-dup groups found by fingerprinting") {
    val rep = Pipeline.dedupReport(spark, sf)
    assert(rep.columns.toSeq == Seq("kind", "id_a", "weight"))
    rep.count() // materializes both branches
  }

  test("hashing embedder supplies a dense vector for every chunk (no embeddings table needed)") {
    import org.apache.spark.sql.functions.col
    val idx = Pipeline.buildIndex(spark, sf, Pipeline.EtlConfig(embedder = "hashing"))
    assert(idx.filter(col("dense").isNull).count() == 0,
      "inference covers all docs, unlike the precomputed-table join")
    val dims = idx.select(org.apache.spark.sql.functions.size(col("dense"))).distinct().collect()
    assert(dims.length == 1 && dims.head.getInt(0) == 64)
  }

  test("snapshot upsert commits delete-then-add atomically with history") {
    import org.apache.spark.sql.functions.col
    val root = java.nio.file.Files.createTempDirectory("graft-pidx").toString
    val idx = Pipeline.buildIndex(spark, sf)
    graft.sources.SnapshotTable.create(spark, root, idx)
    // reprocess one document down to a single chunk
    val upd = idx.filter(col("metadata.doc_id") === 0L).limit(1)
    val v = Pipeline.upsertIndexSnapshot(spark, root, upd)
    assert(v == 2)
    val now = graft.sources.SnapshotTable.read(spark, root)
    assert(now.filter(col("metadata.doc_id") === 0L).count() == 1)
    assert(now.count() ==
      idx.filter(col("metadata.doc_id") =!= 0L).count() + 1)
  }

  test("dropDups index keeps only cluster representatives (J2 extended to near-dups)") {
    import org.apache.spark.sql.functions.col
    val drops = Pipeline.droppedDocIds(spark, sf)
      .collect().map(_.getLong(0)).toSet
    assert(drops.nonEmpty, "corpus must contain dup clusters for this test to bite")
    // every near-dup non-representative is in the drop set
    val nonReps = graft.vector.Dedup.clusterReps(spark, sf)
      .filter(!col("keep")).collect().map(_.getLong(0)).toSet
    assert(nonReps.subsetOf(drops))
    val full = Pipeline.buildIndex(spark, sf)
    val deduped = Pipeline.buildIndex(spark, sf, Pipeline.EtlConfig(dropDups = true))
    val dedupedDocs = deduped.select(col("metadata.doc_id")).distinct()
      .collect().map(_.getLong(0)).toSet
    // no dropped doc survives, and nothing else was lost
    assert(dedupedDocs.intersect(drops).isEmpty)
    val fullDocs = full.select(col("metadata.doc_id")).distinct()
      .collect().map(_.getLong(0)).toSet
    assert(dedupedDocs == fullDocs -- drops)
  }

  test("retrieval from the snapshot table: MERGE re-ranks v2, v1 stays immutable") {
    import graft.vector.SnapshotRetrieval
    val terms = Seq("spark", "window", "merge", "stream")
    val out = SnapshotRetrieval.searchTimeTravel(spark, sf, terms, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val (v1, v2) = (out.filter(_._1 == 1L).map(_._2).toSeq,
      out.filter(_._1 == 2L).map(_._2).toSeq)
    assert(v1.size == 10 && v2.size == 10)
    // the re-ingested docs (doc_id ≡ 3 mod 97 on the gate's even-id
    // half corpus: boosted text + query embedding) must rise in v2's
    // ranking but not v1's
    val updated = (0L until 500L).filter(i => i % 97 == 3 && i % 2 == 0).toSet
    assert(updated.contains(v2.head),
      s"v2's top hit must be a re-ingested doc, got ${v2.head}")
    val (hitsV1, hitsV2) = (v1.count(updated), v2.count(updated))
    assert(hitsV2 > hitsV1,
      s"the merge must lift updated docs into v2's top-k ($hitsV1 → $hitsV2)")
    // time travel: v1's ranking is the PRE-merge ranking — identical to
    // the same hybrid search over the raw corpus
    val qvec = Tables.embeddings(spark, sf)
      .filter(col("vec_id") === 0)
      .select(graft.vector.VectorOps.asDouble(col("embedding")).as("qvec"))
    // same deterministic half the lifecycle corpus uses (doc_id even)
    val raw = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
      .filter(col("doc_id") % 2 === 0)
      .join(Tables.embeddings(spark, sf)
        .select(col("vec_id").as("doc_id"),
          graft.vector.VectorOps.asDouble(col("embedding")).as("v")), Seq("doc_id"))
    val rawRank = SnapshotRetrieval.hybridOver(raw, qvec, terms, 10, 50)
      .collect().map(_.getLong(0)).toSeq
    assert(v1 == rawRank, "v1 must read exactly the pre-merge corpus")
  }
}
