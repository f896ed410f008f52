package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.chunk.RecursiveSplitter

/** Catalyst Generator (UDTF) for the faithful recursive chunker
  * (SURVEY.md §7.4: "custom `Generator` — the one real Catalyst
  * extension"). One text row in → N (chunk_idx, chunk) rows out,
  * streamed via an iterator so a huge document never materializes all
  * its chunks in one buffer (SURVEY.md §7.5 scale discipline).
  *
  * Usage: `df.select($"doc_id", chunk_split($"text", 200, 50))` —
  * the generator contributes columns `chunk_idx`, `chunk`.
  */
case class ChunkSplit(child: Expression, size: Int, overlap: Int)
    extends UnaryExpression with Generator with CodegenFallback {

  override def elementSchema: StructType = StructType(Seq(
    StructField("chunk_idx", LongType, nullable = false),
    StructField("chunk", StringType, nullable = false),
  ))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) Iterator.empty
    else {
      val text = v.asInstanceOf[UTF8String].toString
      RecursiveSplitter.split(text, size, overlap).iterator.zipWithIndex.map {
        case (chunk, i) =>
          InternalRow(i.toLong, UTF8String.fromString(chunk))
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): ChunkSplit =
    copy(child = newChild)
}

object ChunkSplit {
  import org.apache.spark.sql.graftbridge.Bridge
  /** Column-API entry point. */
  def chunk_split(text: Column, size: Int, overlap: Int): Column =
    Bridge.column(ChunkSplit(Bridge.expression(text), size, overlap))
}
