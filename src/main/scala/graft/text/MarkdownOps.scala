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

  /** Synthetic multi-line rendering of the single-line testdata docs:
    * every 8th space becomes a newline (same regex both engines), so
    * line operators have real line structure to chew on. */
  def synthesizeLines(text: Column): Column =
    regexp_replace(text, "((?:\\S+ ){7}\\S+) ", "$1\n")
}
