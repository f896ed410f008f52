package graft.sources

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** PROPERTY: partition pruning never loses a live row — for ANY
  * predicate from a generated grammar over partition columns, data
  * columns, and mixes of both, the pruned read's result equals the
  * full scan filtered. This is the soundness claim every file skip
  * rests on, and it covers the round-15 generalization
  * (`prunePartTypesOf`: pruning keyed by every path-safe column, not
  * the current spec) across a partition-spec EVOLUTION — era-1 files
  * spell only `lang`, era-2 files spell `lang,day`, and the property
  * must hold on both eras under both keys plus the stats key. */
class PartitionPruningPropertySpec extends SparkSpec {
  import spark.implicits._

  // one fixture for every sample (table builds are the expensive part):
  // a two-era evolved table — the adversarial layout shape
  private lazy val root: String = {
    val r = s"${java.nio.file.Files.createTempDirectory("graft-pprop")}/t"
    val era1 = (0L until 120L).map(i => (i, s"l${i % 3}", s"d${i % 4}"))
      .toDF("id", "lang", "day").repartition(3)
    SnapshotTable.create(spark, r, era1,
      statsKey = Some("id"), partitionCols = Seq("lang"))
    SnapshotTable.setPartitionSpec(spark, r, Seq("lang", "day"))
    val era2 = (120L until 240L).map(i => (i, s"l${i % 3}", s"d${i % 4}"))
      .toDF("id", "lang", "day").repartition(3)
    SnapshotTable.append(spark, r, era2)
    // a dv inside one era: pruning must stay exact under deletion debt
    SnapshotTable.deleteWhere(spark, r, col("id") === 7L)
    r
  }

  // the predicate grammar: equality/IN/range/null-test atoms over all
  // three columns, composed with AND/OR/NOT to depth 2
  private def atom(rnd: scala.util.Random): Column = rnd.nextInt(7) match {
    case 0 => col("lang") === s"l${rnd.nextInt(4)}" // sometimes absent value
    case 1 => col("day") === s"d${rnd.nextInt(5)}"
    case 2 => col("lang").isin(Seq.fill(rnd.nextInt(3) + 1)(s"l${rnd.nextInt(4)}"): _*)
    case 3 => col("id") >= rnd.nextInt(260).toLong
    case 4 => col("id") < rnd.nextInt(260).toLong
    case 5 => col("day") =!= s"d${rnd.nextInt(5)}"
    case 6 => col("lang").isNotNull
  }
  private def pred(rnd: scala.util.Random, depth: Int): Column =
    if (depth == 0) atom(rnd)
    else rnd.nextInt(4) match {
      case 0 => pred(rnd, depth - 1) && pred(rnd, depth - 1)
      case 1 => pred(rnd, depth - 1) || pred(rnd, depth - 1)
      case 2 => !pred(rnd, depth - 1)
      case _ => atom(rnd)
    }

  test("PROPERTY: pruned read ≡ full-scan filter, across an evolved layout with dv debt") {
    val rnd = new scala.util.Random(42)
    // the ground truth, computed ONCE without any pruning machinery:
    // every live row as a local set
    val all = SnapshotTable.read(spark, root)
      .select("id", "lang", "day").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(all.size == 239) // 240 minus the dv'd row
    (1 to 40).foreach { i =>
      val p = pred(rnd, 2)
      // pruned path: the Catalyst-indexed read pushes the filter into
      // ManifestFileIndex (ranges, blooms, partitionKeeps)
      val got = SnapshotTable.readIndexed(spark, root).filter(p)
        .select("id", "lang", "day").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
      // oracle: filter the ground truth with Spark's own evaluation
      // over a local frame (no files, no pruning)
      val want = spark.createDataFrame(
        java.util.Arrays.asList(all.toSeq.map(t =>
          org.apache.spark.sql.Row(t._1, t._2, t._3)): _*),
        SnapshotTable.read(spark, root).select("id", "lang", "day").schema)
        .filter(p).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
      assert(got == want,
        s"sample $i: pruning changed the answer for $p\n" +
          s"missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
    }
  }
}
