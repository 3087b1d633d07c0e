package graft.langid

/** fastText-style character n-gram language identifier (SURVEY.md §2.4;
  * hashed-n-gram linear model after Joulin et al., "Bag of Tricks for
  * Efficient Text Classification", EACL 2017).
  *
  * The reference implicitly assumes English (NLTK English tokenizers,
  * cfg_checker.py:17-25; English-only lexicon cfg_generator.py:138-193);
  * the north_star promotes this to an explicit langid operator: hashed
  * char 1..3-gram features → per-language log-probability weights →
  * argmax + softmax confidence.
  *
  * The model is a dense `Array[Float]` of shape (nBuckets × nLangs)
  * (hashed feature rows, like fastText's hashed n-gram input matrix) —
  * flat primitive array so the broadcast is one compact block and the
  * per-row scoring loop is allocation-free. Training is multinomial
  * Naive Bayes with add-k smoothing over the same hashed features:
  * deterministic, no external data (trained on the seeded synth corpus,
  * SURVEY.md §7.4).
  */
final class LangIdModel(
    val langs: Array[String],
    val nBuckets: Int,
    val weights: Array[Float] // row-major: bucket * nLangs + langIdx
) extends Serializable {

  /** (lang, confidence). "und" with conf 0 when the text yields no
    * features (e.g. digits/punctuation only).
    */
  def predict(text: String): (String, Double) = {
    val nL = langs.length
    val scores = new Array[Double](nL)
    var nGrams = 0
    LangId.foreachGramBucket(text, nBuckets) { b =>
      val base = b * nL
      var l = 0
      while (l < nL) { scores(l) += weights(base + l); l += 1 }
      nGrams += 1
    }
    if (nGrams == 0) return ("und", 0.0)
    // average log-prob → softmax over languages
    var best = 0
    var l = 1
    while (l < nL) { if (scores(l) > scores(best)) best = l; l += 1 }
    var denom = 0.0
    l = 0
    while (l < nL) {
      denom += math.exp((scores(l) - scores(best)) / nGrams)
      l += 1
    }
    (langs(best), 1.0 / denom)
  }
}

object LangId extends Serializable {

  /** Cap on chars scored per row — langid saturates long before this;
    * keeps the operator O(1) per row at 10^12-turn scale.
    */
  val maxChars = 512

  /** Iterate hashed buckets of char 1..3-grams over the lowercased,
    * space-normalized, boundary-marked text. FNV-1a over the gram chars;
    * deterministic across JVMs (no String.hashCode dependence needed,
    * but FNV keeps it explicit).
    */
  @inline def foreachGramBucket(text: String, nBuckets: Int)(f: Int => Unit): Unit = {
    if (text == null || text.isEmpty) return
    val len = math.min(text.length, maxChars)
    // normalized char stream with sentinel boundaries
    val buf = new StringBuilder(len + 2)
    buf.append(' ')
    var i = 0
    var prevSpace = true
    while (i < len) {
      val c0 = text.charAt(i)
      val c = if (Character.isWhitespace(c0)) ' ' else Character.toLowerCase(c0)
      if (c != ' ' || !prevSpace) buf.append(c)
      prevSpace = c == ' '
      i += 1
    }
    if (!prevSpace) buf.append(' ')
    val s = buf
    val n = s.length
    var j = 0
    while (j < n) {
      // 1-gram (skip pure spaces), 2-gram, 3-gram ending at j
      var g = 1
      while (g <= 3 && g <= j + 1) {
        val st = j - g + 1
        // grams with no letter carry no language signal (digits,
        // punctuation) — skipped in BOTH train and predict, so
        // letter-free text yields zero features → "und"
        var hasLetter = false
        var h = 0x811c9dc5 // FNV offset
        var k = st
        while (k <= j) {
          val ch = s.charAt(k)
          if (Character.isLetter(ch)) hasLetter = true
          h = (h ^ ch) * 0x01000193
          k += 1
        }
        if (hasLetter) {
          val b = (h & 0x7fffffff) % nBuckets
          f(b)
        }
        g += 1
      }
      j += 1
    }
  }

  /** Train from (text, lang) samples. Add-k smoothing (k=0.5). */
  def train(samples: Seq[(String, String)], nBuckets: Int = 1 << 15): LangIdModel = {
    val langs = samples.map(_._2).distinct.sorted.toArray
    val nL = langs.length
    val idx = langs.zipWithIndex.toMap
    val counts = new Array[Double](nBuckets * nL)
    val totals = new Array[Double](nL)
    samples.foreach { case (text, lang) =>
      val li = idx(lang)
      foreachGramBucket(text, nBuckets) { b =>
        counts(b * nL + li) += 1.0
        totals(li) += 1.0
      }
    }
    val k = 0.5
    val weights = new Array[Float](nBuckets * nL)
    var b = 0
    while (b < nBuckets) {
      var l = 0
      while (l < nL) {
        val c = counts(b * nL + l)
        weights(b * nL + l) =
          math.log((c + k) / (totals(l) + k * nBuckets)).toFloat
        l += 1
      }
      b += 1
    }
    new LangIdModel(langs, nBuckets, weights)
  }
}
