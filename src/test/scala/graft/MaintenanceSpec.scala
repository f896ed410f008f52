package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.sources.Maintenance

class MaintenanceSpec extends SparkSpec {
  import spark.implicits._

  test("compaction collapses a fragmented table to the target file count") {
    val frag = s"${Files.createTempDirectory("graft-frag")}/t"
    val out = s"${Files.createTempDirectory("graft-comp")}/t"
    // simulate per-batch appends: 40 tiny files
    Tables.lineitem(spark, sf).repartition(40)
      .write.mode("overwrite").parquet(frag)
    assert(Maintenance.dataFileCount(spark, frag) == 40)
    val total = Maintenance.dataBytes(spark, frag)
    val n = Maintenance.compact(spark, frag, out, targetBytes = total / 4 + 1)
    assert(n <= 4)
    assert(Maintenance.dataFileCount(spark, out) == n)
    // content preserved
    assert(spark.read.parquet(out).count() == Tables.lineitem(spark, sf).count())
  }

  test("range layout: every parquet file owns a disjoint key range") {
    val out = s"${Files.createTempDirectory("graft-range")}/t"
    Maintenance.writeRangeLayout(
      Tables.orders(spark, sf).select("o_orderkey", "o_totalprice"),
      "o_orderkey", numFiles = 4, out)
    val perFile = spark.read.parquet(out)
      .select(input_file_name().as("f"), col("o_orderkey"))
      .groupBy("f").agg(min("o_orderkey").as("lo"), max("o_orderkey").as("hi"))
      .as[(String, Long, Long)].collect().sortBy(_._2)
    assert(perFile.length >= 2)
    perFile.sliding(2).foreach {
      case Array((_, _, hi1), (_, lo2, _)) =>
        assert(hi1 < lo2, s"file ranges overlap: $hi1 >= $lo2")
      case _ =>
    }
  }
}
