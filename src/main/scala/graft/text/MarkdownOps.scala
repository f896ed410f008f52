package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Markdown structure operators (SURVEY.md §2.8 F12/F13, §2.6 O4):
  * the reference's line-oriented scans re-expressed relationally — one
  * explode to a (doc, lineno, line) frame, then plain filters/windows
  * instead of offset arithmetic.
  */
object MarkdownOps {

  /** Explode text into (doc keys..., lineno, line, line_offset) rows.
    * line_offset is the char offset of the line start — computed as a
    * running sum window, turning the reference's `rfind("\n")` offset
    * arithmetic (markdown_manager.py:185-193) into a relational op. */
  def lineFrame(df: DataFrame, textCol: String, keyCols: Seq[String]): DataFrame = {
    val keys = keyCols.map(col)
    val w = Window.partitionBy(keys: _*).orderBy(col("lineno"))
    df.select(keys :+ posexplode(split(col(textCol), "\n")).as(Seq("lineno", "line")): _*)
      .withColumn("line_offset",
        coalesce(sum(length(col("line")) + 1)
          .over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)).cast("long"))
      .withColumn("lineno", col("lineno").cast("long"))
  }

  /** O4: first long line per document — first line ≥ minLen chars,
    * truncated to maxLen (markdown_manager.py:71-94 get_first_long_line).
    * TakeOrdered-per-group via min_by. */
  def firstLongLine(lines: DataFrame, keyCols: Seq[String],
      minLen: Int = 50, maxLen: Int = 200): DataFrame = {
    val keys = keyCols.map(col)
    lines
      .filter(length(col("line")) >= minLen)
      .groupBy(keys: _*)
      .agg(
        min(col("lineno")).as("first_long_lineno"),
        substring(min_by(col("line"), col("lineno")), 1, maxLen).as("first_long_line"),
      )
  }

  /** F12: caption-spot finder — lines starting with a keyword
    * (e.g. Figure/Table), with blank-line-before detection via lag
    * (markdown_manager.py:166-194). */
  def captionSpots(lines: DataFrame, keyCols: Seq[String],
      keywords: Seq[String] = Seq("Figure", "Table", "Figura")): DataFrame = {
    val keys = keyCols.map(col)
    val w = Window.partitionBy(keys: _*).orderBy(col("lineno"))
    val pat = s"^(${keywords.mkString("|")})\\b"
    lines
      .withColumn("prev_blank",
        coalesce(lag(trim(col("line")), 1).over(w) === "", lit(true)))
      .filter(col("line").rlike(pat))
      .select(keys :+ col("lineno") :+ col("line_offset") :+ col("prev_blank"): _*)
  }

  /** F13: content-break finder with code-fence parity. A break is a
    * blank line, a horizontal rule, or a header line — but only at even
    * fence parity (not inside a ``` block). Fence parity = running
    * count of fence lines (markdown_manager.py:96-137; the reference's
    * dead after-header regex is deliberately not replicated —
    * SURVEY.md §7.6). */
  def contentBreaks(lines: DataFrame, keyCols: Seq[String]): DataFrame = {
    val keys = keyCols.map(col)
    val w = Window.partitionBy(keys: _*).orderBy(col("lineno"))
    val isFence = when(trim(col("line")).startsWith("```"), 1).otherwise(0)
    lines
      .withColumn("fences_before",
        coalesce(sum(isFence).over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0)))
      .withColumn("is_break",
        (trim(col("line")) === "") ||
        trim(col("line")).rlike("^(-{3,}|\\*{3,}|_{3,})$") ||
        col("line").rlike("^#{1,6} "))
      .filter(col("is_break") && col("fences_before") % 2 === 0)
      .select(keys :+ col("lineno") :+ col("line_offset"): _*)
  }

  /** The page-anchor pipeline (SURVEY.md §1 "page-anchor map" +
    * §2.8 F10/F11 + §2.5 W1/W2) — the reference's costliest stage
    * (markdown_manager.py:196-250) as one relational program:
    *   1. pages are assigned (here: contiguous line blocks of the
    *      synthesized markdown — the testdata has no real PDF pages);
    *   2. each page's anchor snippet is its first line's first
    *      `snippetTokens` tokens (F10 builds a regex from these; with
    *      plain text a literal search is exact);
    *   3. the snippet is searched in the full document text (F11's
    *      `rx.search`); misses carry the previous anchor forward
    *      (last non-null over page order);
    *   4. anchors are forced monotone by a running max (W1,
    *      markdown_manager.py:245-249);
    *   5. each page's character range ends at the next page's anchor
    *      (W2, lead), defaulting to the text length.
    */
  def pageAnchors(docs: DataFrame, keyCol: String, textCol: String,
      pagesPerDoc: Int = 4, snippetTokens: Int = 5): DataFrame = {
    val keyed = lineFrame(docs, textCol, Seq(keyCol))
    val withPages = keyed
      .withColumn("n_lines", count(lit(1)).over(Window.partitionBy(col(keyCol))))
      .withColumn("page",
        least(
          floor(col("lineno") / ceil(col("n_lines") / lit(pagesPerDoc))),
          lit(pagesPerDoc - 1)).cast("long") + 1)
    val firstLines = withPages
      .groupBy(col(keyCol), col("page"))
      .agg(min_by(col("line"), col("lineno")).as("first_line"))
      .withColumn("snippet",
        concat_ws(" ", slice(split(trim(col("first_line")), "\\s+"), 1, snippetTokens)))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("page"))
    firstLines
      .join(docs.select(col(keyCol), col(textCol).as("__text")), Seq(keyCol))
      .withColumn("found",
        when(length(col("snippet")) > 0,
          nullif(locate_col(col("snippet"), col("__text")), lit(0)) - 1))
      .withColumn("carried",
        last(col("found"), ignoreNulls = true)
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("anchor",
        greatest(
          max(coalesce(col("carried"), lit(0L)))
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
          lit(0L)).cast("long"))
      .withColumn("range_end",
        lead(col("anchor"), 1).over(w))
      .select(col(keyCol), col("page"),
        col("anchor"),
        coalesce(col("range_end"), length(col("__text")).cast("long")).as("range_end"))
      .orderBy(col(keyCol), col("page"))
  }

  /** `locate` with column haystack (functions.locate wants a literal
    * needle; the expression form takes columns). */
  private def locate_col(needle: Column, hay: Column): Column =
    call_function("locate", needle, hay)

  /** O2: offset splice as an order-insensitive relational rewrite
    * (SURVEY.md §4 — replaces the reference's back-to-front sequential
    * string splice, markdown_conversion_manager.py:201-204). Each
    * insertion offset becomes a segment [prev_offset, offset) via lag;
    * segments + insert markers are reassembled with an ordered
    * aggregate. No sequential dependency, so the parallel plan is free
    * to compute segments anywhere. */
  def spliceAt(docs: DataFrame, textCol: String, keyCol: String,
      offsets: DataFrame, offsetCol: String, insert: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(offsetCol))
    val segs = offsets
      .join(docs.select(col(keyCol), col(textCol)), Seq(keyCol))
      .withColumn("prev_off", coalesce(lag(col(offsetCol), 1).over(w), lit(0L)))
      .select(col(keyCol), col(offsetCol), col(textCol),
        concat(
          col(textCol).substr((col("prev_off") + 1).cast("int"),
            (col(offsetCol) - col("prev_off")).cast("int")),
          lit(insert)).as("seg"))
    val spliced = segs
      .groupBy(col(keyCol), col(textCol))
      .agg(
        concat_ws("", transform(
          sort_array(collect_list(struct(col(offsetCol).as("o"), col("seg").as("s")))),
          x => x.getField("s"))).as("head"),
        max(col(offsetCol)).as("last_off"))
      .select(col(keyCol),
        concat(col("head"),
          col(textCol).substr((col("last_off") + 1).cast("int"), lit(1000000))).as("spliced"))
    docs.select(col(keyCol), col(textCol))
      .join(spliced, Seq(keyCol), "left")
      .select(col(keyCol), coalesce(col("spliced"), col(textCol)).as("spliced"))
  }

  /** Synthetic multi-line rendering of the single-line testdata docs:
    * every 8th space becomes a newline (same regex both engines), so
    * line operators have real line structure to chew on. */
  def synthesizeLines(text: Column): Column =
    regexp_replace(text, "((?:\\S+ ){7}\\S+) ", "$1\n")
}
