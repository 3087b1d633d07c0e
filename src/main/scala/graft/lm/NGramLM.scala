package graft.lm

/** Open-addressing Long→Float hash map over flat primitive arrays —
  * the broadcastable n-gram table (SURVEY.md §2.5: "broadcast
  * primitive-array hash table"). Power-of-two capacity, linear
  * probing; zero boxing, zero per-lookup allocation. Key 0 is reserved
  * as the empty slot marker (keys are mixed hashes, 0 never occurs in
  * practice; inserts of 0 are remapped).
  */
final class LongFloatMap(initialCapacity: Int) extends Serializable {
  private var cap = Integer.highestOneBit(math.max(16, initialCapacity) * 2 - 1) << 1
  private var keys = new Array[Long](cap)
  private var vals = new Array[Float](cap)
  private var n = 0

  @inline private def mask: Int = cap - 1

  def size: Int = n

  def put(key0: Long, v: Float): Unit = {
    val key = if (key0 == 0L) 0x9e3779b97f4a7c15L else key0
    if ((n + 1) * 10 > cap * 7) grow()
    var i = (java.lang.Long.hashCode(key) & mask)
    while (keys(i) != 0L && keys(i) != key) i = (i + 1) & mask
    if (keys(i) == 0L) { keys(i) = key; n += 1 }
    vals(i) = v
  }

  def addTo(key: Long, delta: Float): Unit = put(key, get(key, 0f) + delta)

  def get(key0: Long, default: Float): Float = {
    val key = if (key0 == 0L) 0x9e3779b97f4a7c15L else key0
    var i = (java.lang.Long.hashCode(key) & mask)
    while (keys(i) != 0L) {
      if (keys(i) == key) return vals(i)
      i = (i + 1) & mask
    }
    default
  }

  /** Iterate (storedKey, value) pairs — stored keys are post-remap
    * (an inserted 0 reads back as the golden-ratio sentinel, matching
    * what get() probes for). Needed to export the table as data (the
    * DuckDB oracle re-scores the SAME model from a dumped relation).
    */
  def foreach(f: (Long, Float) => Unit): Unit = {
    var i = 0
    while (i < keys.length) {
      if (keys(i) != 0L) f(keys(i), vals(i))
      i += 1
    }
  }

  private def grow(): Unit = {
    val ok = keys; val ov = vals
    cap <<= 1
    keys = new Array[Long](cap); vals = new Array[Float](cap); n = 0
    var j = 0
    while (j < ok.length) {
      if (ok(j) != 0L) {
        var i = (java.lang.Long.hashCode(ok(j)) & mask)
        while (keys(i) != 0L) i = (i + 1) & mask
        keys(i) = ok(j); vals(i) = ov(j); n += 1
      }
      j += 1
    }
  }
}

/** KenLM-style word n-gram language model with stupid backoff
  * (SURVEY.md §2.5; backoff scheme after Brants et al., "Large Language
  * Models in Machine Translation", EMNLP 2007; hashed-probing table
  * layout after Heafield, "KenLM: Faster and Smaller Language Model
  * Queries", WMT 2011) — the rebuild's upgrade of the reference's binary
  * "is this well-formed language" CYK signal (cfg_generator.py:488-500).
  *
  * log p(w | ctx) = log(c(ctx·w)/c(ctx)) when seen, else
  * log(0.4) + log p(w | shorter ctx); unigram base case smoothed over
  * the train vocabulary. Perplexity = exp(-mean log p) over the row's
  * tokens, exponent clamped to [0, 30].
  *
  * All counts live in ONE [[LongFloatMap]] keyed by an order-aware
  * 64-bit rolling hash of the token window — batched hashed lookups,
  * one table probe per (order, position).
  */
final class NGramLM(
    val order: Int,
    val table: LongFloatMap,   // hash(ngram) -> count; hash(()) -> total tokens
    val vocabSize: Long
) extends Serializable {

  import NGramLM._

  def logProb(tokens: Array[Long], i: Int): Double = {
    // try longest context first: p(w_i | w_{i-order+1..i-1})
    var n = math.min(order, i + 1)
    var backoff = 0.0
    while (n >= 1) {
      val num = table.get(hashWindow(tokens, i - n + 1, i), 0f)
      if (num > 0f) {
        val den =
          if (n == 1) table.get(TOTAL_KEY, 1f) + vocabSize // add-1 smoothed unigram
          else table.get(hashWindow(tokens, i - n + 1, i - 1), 0f)
        if (den > 0f) return backoff + math.log(num / den)
      }
      backoff += LOG_BACKOFF
      n -= 1
    }
    // unseen unigram
    backoff - LOG_BACKOFF + math.log(1.0 / (table.get(TOTAL_KEY, 1f) + vocabSize))
  }

  def perplexity(text: String): Double = {
    val tokens = tokenize(text)
    if (tokens.isEmpty) return PPL_MAX
    var sum = 0.0
    var i = 0
    while (i < tokens.length) { sum += logProb(tokens, i); i += 1 }
    val avg = -sum / tokens.length
    math.exp(math.min(30.0, math.max(0.0, avg)))
  }
}

object NGramLM extends Serializable {
  val LOG_BACKOFF: Double = math.log(0.4)
  val TOTAL_KEY: Long = -1L
  val PPL_MAX: Double = math.exp(30.0)

  /** Lowercase \w+ tokens → 64-bit hashes (cfg_generator.py:346 analog). */
  def tokenize(text: String): Array[Long] = {
    if (text == null || text.isEmpty) return Array.emptyLongArray
    val out = new scala.collection.mutable.ArrayBuffer[Long](32)
    var i = 0
    var h = 0L
    var inTok = false
    while (i < text.length) {
      val c0 = text.charAt(i)
      val isW = Character.isLetterOrDigit(c0) || c0 == '_'
      if (isW) {
        h = h * 31 + Character.toLowerCase(c0)
        inTok = true
      } else if (inTok) {
        out += mix(h); h = 0L; inTok = false
      }
      i += 1
    }
    if (inTok) out += mix(h)
    out.toArray
  }

  @inline def mix(x: Long): Long = graft.util.Hash.mix(x)

  @inline def hashWindow(tokens: Array[Long], from: Int, to: Int): Long = {
    var h = 0x2545f4914f6cdd1dL
    var i = from
    while (i <= to) { h = mix(h ^ tokens(i)); i += 1 }
    h
  }

  /** Train from plain texts; deterministic. */
  def train(texts: Iterable[String], order: Int = 3): NGramLM = {
    val table = new LongFloatMap(1 << 16)
    val vocab = new java.util.HashSet[Long]()
    var total = 0L
    texts.foreach { t =>
      val toks = tokenize(t)
      var i = 0
      while (i < toks.length) {
        vocab.add(toks(i))
        total += 1
        var n = 1
        while (n <= order && n <= i + 1) {
          table.addTo(hashWindow(toks, i - n + 1, i), 1f)
          n += 1
        }
        i += 1
      }
    }
    table.put(TOTAL_KEY, total.toFloat)
    new NGramLM(order, table, math.max(1L, vocab.size.toLong))
  }
}
