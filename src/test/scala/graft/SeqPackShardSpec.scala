package graft

import org.apache.spark.sql.functions._

import graft.chunk.SeqPack

/** The 100 TB skew contract of sharded packing: one dominant source
  * must split into bounded (source, shard) groups, with shard-local
  * sequence numbering, and each shard's walk identical to the
  * reference fold. */
class SeqPackShardSpec extends SparkSpec {

  test("shard shuffle: 16 shards, dense positions, monotone token totals, deterministic") {
    import spark.implicits._
    val rows = SparkEntry.queries("sample_shard_shuffle")(spark, sf)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(rows.map(_._3).distinct.size == rows.size) // every doc exactly once
    val byShard = rows.groupBy(_._1)
    assert(byShard.keySet.subsetOf((0L until 16L).toSet))
    byShard.values.foreach { s =>
      val sorted = s.sortBy(_._2)
      assert(sorted.map(_._2) == (0L until s.size).toSeq)  // dense 0-based pos
      // cum_tokens is the running sum of n_tokens in position order
      assert(sorted.scanLeft(0L)(_ + _._4).tail == sorted.map(_._5))
    }
    // seeded hash ⇒ bit-identical across invocations
    val again = SparkEntry.queries("sample_shard_shuffle")(spark, sf)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(again == rows)
  }

  test("a dominant source splits into bounded shards with local numbering") {
    import spark.implicits._
    val shardSize = 50L
    val capacity = 25L
    // 300 docs in one source, 5 in another — the skew that made a
    // source-keyed groupBy a single unbounded task
    val counts = ((0L until 300L).map(i => ("big", i, 10L)) ++
      (300L until 305L).map(i => ("small", i, 10L)))
      .toDF("source", "doc_id", "n_tokens")
    val packed = SeqPack.packCounts(spark, counts, capacity, shardSize)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))

    assert(packed.length == 305)
    // shard minted by doc_id range
    assert(packed.forall { case (_, shard, id, _, _, _) => shard == id / shardSize })
    // every group bounded by shardSize
    val groups = packed.groupBy(p => (p._1, p._2))
    assert(groups.values.forall(_.length <= shardSize))
    assert(groups.size == 6 + 1) // big: shards 0..5, small: shard 6
    // seq_idx and slot restart in every shard
    groups.values.foreach { g =>
      assert(g.map(_._5).min == 0L, "seq_idx must be shard-local")
      assert(g.filter(_._5 == 0L).map(_._6).min == 0L)
    }
    // each shard's walk matches the reference fold exactly
    groups.foreach { case (_, g) =>
      val expect = SeqPack.packShard(g.map(p => (p._3, p._4)).toSeq, capacity)
      val got = g.sortBy(_._3).map(p => (p._3, p._4, p._5, p._6)).toSeq
      assert(got == expect)
    }
  }

  test("BPE-faithful packing satisfies every contract invariant") {
    val rows = SeqPack.packDocsBpe(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(4), s"bounds_ok violated at doc ${r.getLong(2)}")
      assert(r.getBoolean(5), s"fits_ok violated at doc ${r.getLong(2)}")
      assert(r.getBoolean(6), s"maximal_ok violated at doc ${r.getLong(2)}")
    }
  }
}
