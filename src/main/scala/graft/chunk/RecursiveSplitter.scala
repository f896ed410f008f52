package graft.chunk

/** Faithful boundary-aware recursive text splitter (SURVEY.md §2.9 C2;
  * reference: chunking_manager.py:67-70 configures LangChain's
  * RecursiveCharacterTextSplitter(chunk_size, chunk_overlap)).
  *
  * Semantics (our spec, following the reference's *code* not its
  * docstring — SURVEY.md §2.9 note):
  *   - the text is atomized top-down on a separator hierarchy
  *     (paragraph → line → space → hard cut), keeping each separator
  *     attached to the piece it terminates so that the concatenation of
  *     atoms reproduces the input exactly;
  *   - atoms are greedily packed into chunks of at most `size` chars;
  *   - each new chunk starts with the previous chunk's trailing atoms up
  *     to `overlap` chars (piece-aligned overlap);
  *   - an atom longer than `size` with no separators left is hard-cut,
  *     so every emitted chunk is ≤ `size` unconditionally.
  *
  * Pure function — usable from `Dataset.flatMap`, and wrapped as a
  * Catalyst [[ChunkSplit]] Generator for the declarative surface.
  */
object RecursiveSplitter {
  val DefaultSeparators: List[String] = List("\n\n", "\n", " ")

  /** Split keeping the separator attached to the preceding piece:
    * concat(result) == text, and no piece is empty. */
  private[graft] def splitKeep(text: String, sep: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var from = 0
    var i = text.indexOf(sep, from)
    while (i >= 0) {
      out += text.substring(from, i + sep.length)
      from = i + sep.length
      i = text.indexOf(sep, from)
    }
    if (from < text.length) out += text.substring(from)
    out.result()
  }

  /** Recursively atomize so every atom is ≤ size (hard-cut fallback). */
  private[graft] def atoms(text: String, size: Int, seps: List[String]): Vector[String] =
    if (text.isEmpty) Vector.empty
    else if (text.length <= size) Vector(text)
    else seps match {
      case Nil => text.grouped(size).toVector
      case sep :: rest =>
        splitKeep(text, sep).flatMap { p =>
          if (p.length <= size) Vector(p) else atoms(p, size, rest)
        }
    }

  /** Greedy packing with piece-aligned overlap carry-over. */
  def split(text: String, size: Int, overlap: Int,
      seps: List[String] = DefaultSeparators): Vector[String] = {
    require(size > 0 && overlap >= 0 && overlap < size,
      s"need 0 <= overlap < size, got size=$size overlap=$overlap")
    val pieces = atoms(text, size, seps)
    if (pieces.isEmpty) return Vector.empty
    val chunks = Vector.newBuilder[String]
    var cur = Vector.empty[String] // current chunk's pieces
    var curLen = 0
    def overlapTail(ps: Vector[String]): Vector[String] = {
      // trailing pieces totalling <= overlap chars
      var acc = 0
      ps.reverse.takeWhile { p => acc += p.length; acc <= overlap }.reverse
    }
    pieces.foreach { p =>
      if (curLen + p.length > size && cur.nonEmpty) {
        chunks += cur.mkString
        cur = overlapTail(cur)
        curLen = cur.map(_.length).sum
        // overlap tail + oversized remainder could still exceed size:
        // drop the overlap in that case (piece alone is <= size by
        // construction, so this terminates)
        if (curLen + p.length > size) { cur = Vector.empty; curLen = 0 }
      }
      cur :+= p
      curLen += p.length
    }
    if (cur.nonEmpty) chunks += cur.mkString
    chunks.result()
  }
}
