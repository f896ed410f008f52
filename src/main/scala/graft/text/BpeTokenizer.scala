package graft.text

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding subword tokenizer (north-star "token counting
  * (whitespace + a BPE-ish regex)" upgraded to the real algorithm):
  *
  *  - TRAIN: classic BPE merge learning over the corpus word-frequency
  *    table. The word-frequency aggregation is distributed (one
  *    groupBy), and the vocab that reaches the driver is explicitly
  *    bounded (min-frequency filter + top-`maxVocab` truncation, both
  *    distributed) — unlike k-means centroids, raw distinct-word
  *    counts grow with the corpus, so the bound is what makes the
  *    collect a parameter-sized model fetch rather than a data path.
  *    Each merge step is O(vocab), not O(corpus).
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

  /** Learn `numMerges` BPE merges from the corpus.
    *
    * The collected vocabulary is BOUNDED before it reaches the driver:
    * `minFreq` drops hapax-style noise distributedly, and `maxVocab`
    * truncates to the most frequent words via a distributed top-k
    * (orderBy+limit → TakeOrdered, never a full sort on the driver).
    * Web-scale corpora have effectively unbounded distinct tokens
    * (URLs, typos, code), so an uncapped collect is a driver OOM at
    * 100 TB; truncation is semantics-preserving in practice because
    * rare words contribute no pair counts that survive the argmax.
    * Ties at the cutoff break deterministically on (freq desc, word). */
  def train(spark: SparkSession, docs: DataFrame, numMerges: Int,
      minFreq: Long = 1L, maxVocab: Int = 1000000): Merges = {
    import spark.implicits._
    val freqs: Map[Vector[String], Long] = wordFreqs(docs)
      .filter(col("freq") >= minFreq)
      .orderBy(col("freq").desc, col("word"))
      .limit(maxVocab)
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

  /** Memoizing encoder for one partition's pass: natural-language
    * corpora repeat words heavily (Zipf), so encoding each DISTINCT
    * word once and reusing the result removes the 50-merge scan from
    * almost every occurrence. Capacity-bounded so an adversarial
    * corpus of unique tokens cannot grow task memory — on overflow it
    * degrades to plain encoding, never wrong results. */
  final class MemoEncoder(merges: Merges, maxEntries: Int = 1 << 16) {
    private val cache = new java.util.HashMap[String, Vector[String]]()
    def encode(word: String): Vector[String] = {
      val hit = cache.get(word)
      if (hit != null) hit
      else {
        val enc = encodeWord(word, merges)
        if (cache.size < maxEntries) cache.put(word, enc)
        enc
      }
    }
  }

  /** Corpus tokenization: merges broadcast, applied per partition.
    * Returns (doc_id, n_words, n_subwords). */
  def subwordCounts(spark: SparkSession, docs: DataFrame, merges: Merges): DataFrame = {
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(merges)
    val base: Dataset[(Long, Seq[String])] = docs
      .select(col("doc_id"), TextFunctions.tokens(lower(col("text"))).as("toks"))
      .as[(Long, Seq[String])]
    base.mapPartitions { it =>
      val enc = new MemoEncoder(bc.value) // one distinct-word cache per task
      it.map { case (id, toks) =>
        (id, toks.size.toLong, toks.iterator.map(w => enc.encode(w).size.toLong).sum)
      }
    }.toDF("doc_id", "n_words", "n_subwords")
      .orderBy(col("doc_id"))
  }

  /** Oracle-checkable form of the tokenization: the learned merges are
    * model data DuckDB cannot reproduce, but BPE's defining invariants
    * can be asserted blind per document —
    *  - conserve_ok: merging never creates or destroys characters
    *    (subword chars minus one end-of-word marker per word == word
    *    chars);
    *  - bounds_ok: each word yields between 1 and len+1 subwords.
    * n_words and n_word_chars are oracle-computable exactly. */
  def subwordInvariants(spark: SparkSession, docs: DataFrame, merges: Merges): DataFrame = {
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(merges)
    val base: Dataset[(Long, Seq[String])] = docs
      .select(col("doc_id"), TextFunctions.tokens(lower(col("text"))).as("toks"))
      .as[(Long, Seq[String])]
    val markerLen = EndOfWord.length.toLong
    base.mapPartitions { it =>
      val memo = new MemoEncoder(bc.value)
      it.map { case (id, toks) =>
        val nWords = toks.size.toLong
        val nWordChars = toks.iterator.map(_.length.toLong).sum
        var nSub = 0L
        var subChars = 0L
        toks.foreach { w =>
          val enc = memo.encode(w)
          nSub += enc.size
          subChars += enc.iterator.map(_.length.toLong).sum
        }
        (id, nWords, nWordChars,
          subChars - markerLen * nWords == nWordChars,
          nSub >= nWords && nSub <= nWordChars + nWords)
      }
    }.toDF("doc_id", "n_words", "n_word_chars", "conserve_ok", "bounds_ok")
      .orderBy(col("doc_id"))
  }

  /** Mirrors `tokens(lower(text))`: split of an empty string yields one
    * empty token (Spark split semantics), hence the THEN 1 branch. */
  def subwordInvariantsSql: String = """
    SELECT doc_id,
           CAST(CASE WHEN length(trim(text)) = 0 THEN 1
                ELSE len(string_split_regex(trim(text), '\s+')) END AS BIGINT) AS n_words,
           CAST(length(regexp_replace(lower(trim(text)), '\s+', '', 'g')) AS BIGINT) AS n_word_chars,
           TRUE AS conserve_ok, TRUE AS bounds_ok
    FROM documents ORDER BY doc_id"""
}
