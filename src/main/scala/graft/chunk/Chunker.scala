package graft.chunk

import scala.collection.mutable.ArrayBuffer

/** Chunking / segmentation operators (SURVEY.md §2.8) — rebuilds of the
  * reference's `TextChunker` (text_chunker.py) and the RAG recursive
  * splitter (data_manager.py:87-95). In the rebuilt pipeline turns are
  * pre-chunked (transcript rows), so these survive as the operator
  * library's explode-shaped segmentation family + test fixtures.
  */
object Chunker extends Serializable {

  /** Sentence split with the regex strategy (text_chunker.py:60-85
    * fallback; cfg_generator.py:332): split on [.!?]+ keeping ≥1-word
    * pieces, delimiters dropped.
    */
  def splitSentences(text: String): Array[String] =
    text.split("[.!?]+").map(_.trim).filter(_.nonEmpty)

  /** Overlapping chunker (C2) — greedy sentence packing to `chunkSize`
    * chars with a `overlap`-char tail carried from the previous chunk,
    * word-boundary aligned (text_chunker.py:22-58 + _get_overlap_text
    * :87-107; config 500/50: config.yaml:14, smart_corrector.py:40-43).
    */
  def chunkText(text: String, chunkSize: Int = 500, overlap: Int = 50): Seq[String] = {
    if (text == null || text.trim.isEmpty) return Nil
    val sentences = splitSentences(text).map(_ + ".")
    if (sentences.isEmpty) return Seq(text.trim)
    val chunks = new ArrayBuffer[String]()
    var current = new StringBuilder
    sentences.foreach { s =>
      if (current.nonEmpty && current.length + 1 + s.length > chunkSize) {
        chunks += current.toString
        val tail = overlapTail(current.toString, overlap)
        current = new StringBuilder(tail)
        if (tail.nonEmpty) current.append(' ')
        current.append(s)
      } else {
        if (current.nonEmpty) current.append(' ')
        current.append(s)
      }
    }
    if (current.nonEmpty) chunks += current.toString
    chunks.toSeq
  }

  /** Last ≤`overlap` chars of `chunk`, advanced to the next word
    * boundary (text_chunker.py:87-107).
    */
  def overlapTail(chunk: String, overlap: Int): String = {
    if (overlap <= 0 || chunk.length <= overlap) return if (overlap <= 0) "" else chunk
    val tail = chunk.substring(chunk.length - overlap)
    val sp = tail.indexOf(' ')
    if (sp >= 0) tail.substring(sp + 1) else tail
  }

  /** Non-overlapping simple chunker (C3, cfg_checker.py:390-410). */
  def simpleChunks(text: String, chunkSize: Int = 500): Seq[String] =
    chunkText(text, chunkSize, overlap = 0)

  /** Recursive character splitter (C4) — deterministic port of the
    * LangChain splitter the reference uses for RAG chunks
    * (data_manager.py:87-95; seps ["\n\n","\n",". "," ",""],
    * size 1000 / overlap 200, config.yaml:29-30).
    */
  def recursiveSplit(
      text: String,
      chunkSize: Int = 1000,
      overlap: Int = 200,
      seps: List[String] = List("\n\n", "\n", ". ", " ", "")
  ): Seq[String] = {
    if (text == null || text.isEmpty) return Nil
    if (text.length <= chunkSize) return Seq(text)
    val sep = seps.find(s => s.isEmpty || text.contains(s)).getOrElse("")
    val parts: Seq[String] =
      if (sep.isEmpty) text.grouped(chunkSize).toSeq
      else text.split(java.util.regex.Pattern.quote(sep), -1).toSeq.filter(_.nonEmpty)
    val rest = seps.dropWhile(_ != sep).drop(1)
    val out = new ArrayBuffer[String]()
    val current = new StringBuilder
    def flush(): Unit = if (current.nonEmpty) {
      out += current.toString
      val tail =
        if (overlap > 0 && current.length > overlap)
          current.substring(current.length - overlap)
        else ""
      current.clear()
      current.append(tail)
    }
    parts.foreach { p0 =>
      val p = if (p0.length > chunkSize) {
        flush()
        // drop the carried overlap tail: the long part's sub-chunks are
        // emitted directly below, and emitting the tail later would
        // produce a stray out-of-order fragment
        current.clear()
        val sub = recursiveSplit(p0, chunkSize, overlap, if (rest.isEmpty) List("") else rest)
        out ++= sub.dropRight(1)
        sub.lastOption.getOrElse("")
      } else p0
      val addLen = p.length + (if (current.isEmpty) 0 else sep.length)
      if (current.length + addLen > chunkSize) flush()
      if (current.nonEmpty) current.append(sep)
      current.append(p)
    }
    if (current.nonEmpty) out += current.toString
    out.toSeq
  }

  /** Word tokenize + lowercase (C5, cfg_generator.py:346). */
  def words(text: String): Array[String] = {
    if (text == null) return Array.empty
    val m = java.util.regex.Pattern.compile("\\b\\w+\\b").matcher(text.toLowerCase)
    val out = new ArrayBuffer[String]()
    while (m.find()) out += m.group()
    out.toArray
  }
}
