package graft.text

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding subword tokenizer (north-star "token counting
  * (whitespace + a BPE-ish regex)" upgraded to the real algorithm):
  *
  *  - TRAIN: classic BPE merge learning over the corpus word-frequency
  *    table. The word-frequency aggregation is distributed (one
  *    groupBy); the merge loop itself runs on the driver over the
  *    collected vocab — the vocab is model data (like k-means
  *    centroids), bounded and tiny relative to the corpus, and each
  *    merge step is O(vocab), not O(corpus).
  *  - APPLY: the learned merges are broadcast and applied per partition
  *    with Dataset.flatMap — executors tokenize independently.
  *
  * Deterministic: ties in pair frequency break lexicographically, so
  * the same corpus always learns the same merges.
  */
object BpeTokenizer {

  type Merges = Vector[(String, String)]
  private val EndOfWord = "</w>"

  /** Distributed word-frequency table of a documents frame. */
  def wordFreqs(docs: DataFrame): DataFrame =
    docs.select(explode(TextFunctions.tokens(lower(col("text")))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))

  /** Learn `numMerges` BPE merges from the corpus. */
  def train(spark: SparkSession, docs: DataFrame, numMerges: Int): Merges = {
    import spark.implicits._
    val freqs: Map[Vector[String], Long] = wordFreqs(docs)
      .as[(String, Long)].collect()
      .map { case (w, f) => (w.map(_.toString).toVector :+ EndOfWord) -> f }
      .toMap
    var vocab = freqs
    val merges = Vector.newBuilder[(String, String)]
    var i = 0
    var done = false
    while (i < numMerges && !done) {
      val pairCounts = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (sym, f) =>
        sym.sliding(2).foreach {
          case Vector(a, b) => pairCounts((a, b)) = pairCounts.getOrElse((a, b), 0L) + f
          case _ =>
        }
      }
      if (pairCounts.isEmpty) done = true
      else {
        val best = pairCounts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += best
        vocab = vocab.map { case (sym, f) => (mergePair(sym, best), f) }
        i += 1
      }
    }
    merges.result()
  }

  private def mergePair(sym: Vector[String], pair: (String, String)): Vector[String] = {
    val out = Vector.newBuilder[String]
    var j = 0
    while (j < sym.length) {
      if (j + 1 < sym.length && sym(j) == pair._1 && sym(j + 1) == pair._2) {
        out += sym(j) + sym(j + 1); j += 2
      } else { out += sym(j); j += 1 }
    }
    out.result()
  }

  /** Tokenize one word with learned merges (applied in training order —
    * standard BPE inference). */
  def encodeWord(word: String, merges: Merges): Vector[String] = {
    var sym = word.map(_.toString).toVector :+ EndOfWord
    merges.foreach { m => sym = mergePair(sym, m) }
    sym
  }

  /** Corpus tokenization: merges broadcast, applied per partition.
    * Returns (doc_id, n_words, n_subwords). */
  def subwordCounts(spark: SparkSession, docs: DataFrame, merges: Merges): DataFrame = {
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(merges)
    val base: Dataset[(Long, Seq[String])] = docs
      .select(col("doc_id"), TextFunctions.tokens(lower(col("text"))).as("toks"))
      .as[(Long, Seq[String])]
    base.map { case (id, toks) =>
      val m = bc.value
      (id, toks.size.toLong, toks.iterator.map(w => encodeWord(w, m).size.toLong).sum)
    }.toDF("doc_id", "n_words", "n_subwords")
      .orderBy(col("doc_id"))
  }
}
