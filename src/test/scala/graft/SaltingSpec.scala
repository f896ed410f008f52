package graft

import org.apache.spark.sql.functions._
import graft.relational.Salting

class SaltingSpec extends SparkSpec {
  import spark.implicits._

  test("salted join equals plain join on skewed data") {
    // 90% of big rows share one hot key
    val big = (1 to 2000).map(i => (if (i % 10 == 0) i.toLong else 7L, i)).toDF("k", "v")
    val small = Seq((7L, "hot"), (10L, "a"), (20L, "b")).toDF("k", "name")
    val plain = big.join(small, Seq("k")).orderBy("k", "v").collect().toSeq
    val salted = Salting.saltedJoin(big, small, "k").orderBy("k", "v").collect().toSeq
    assert(salted == plain)
  }

  test("salted two-phase count equals plain count") {
    val df = (1 to 5000).map(i => (if (i % 5 == 0) "cold" + i else "HOT", i)).toDF("k", "v")
    val plain = df.groupBy("k").count().as[(String, Long)].collect().toMap
    val salted = Salting.saltedCount(df, "k").as[(String, Long)].collect().toMap
    assert(salted == plain)
  }

  test("document source scans, tags and stub-converts a file corpus") {
    val dir = java.nio.file.Files.createTempDirectory("corpus").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/a.txt"), "hello world".getBytes)
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/b.pdf"), "pdf bytes".getBytes)
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/c.docx"), "nope".getBytes)
    val scanned = sources.DocumentSource.scan(spark, dir)
    assert(scanned.count() == 3)
    assert(scanned.filter(col("ok")).count() == 2)
    val docs = sources.DocumentSource.convertStub(scanned)
      .select("filename", "text").as[(String, String)].collect().toMap
    assert(docs("a.txt") == "hello world" && docs("b.pdf") == "pdf bytes")
    assert(!docs.contains("c.docx"))
  }
}
