package graft.ml

import org.apache.spark.sql.{DataFrame, functions => F}

import graft.dedup.Dedup

/** Trainable text-quality classifier — the fastText-style learned
  * scorer a curation pipeline layers over the heuristic rules (the
  * reference's quality gate is rule-only; this is the beyond-reference
  * ML step, same family as the langid model). Logistic regression on
  * five RATIONAL-arithmetic features — no transcendental appears in a
  * feature or in the decision, so the distributed scoring path is
  * bit-replayable in SQL (the sigmoid is monotone: predicted_keep ⟺
  * logit &gt; 0, and the logit is a fixed-order dot product of exact
  * IEEE doubles).
  *
  * Training follows the [[graft.knn.Similarity]] k-means precedent:
  * DRIVER-side full-batch gradient descent on a BOUNDED deterministic
  * set (here a synthetic labeled corpus that is a pure function of the
  * seed — same technique as the langid weight matrix, so the DuckDB
  * oracle re-derives the identical weights when building its SQL).
  * At 10^12 rows the training set stays a bounded sample; SCORING is
  * the distributed, map-only, codegen-friendly part.
  */
object QualityClassifier {

  final case class Model(weights: Array[Double]) {
    require(weights.length == NUM_FEATURES)
  }

  val NUM_FEATURES = 5 // bias, capped word count, symbol ratio, distinct ratio, capped mean word len

  // whitespace as an EXPLICIT char set (ADVICE r5): Java's \s includes
  // \x0B (vertical tab) while RE2's — the oracle's DuckDB regex — does
  // not; the shared class below is what BOTH engines mean
  private val symbolRe = java.util.regex.Pattern.compile("[^\\p{L}\\p{N}\\t\\n\\f\\r ]")

  /** Feature vector — rational arithmetic only (counts and IEEE
    * divisions), every term replayable exactly in SQL.
    */
  def features(text: String): Array[Double] = {
    val t = if (text == null) "" else text
    val toks = Dedup.tokens(t)
    val wc = toks.length
    val cp = t.codePointCount(0, t.length)
    val m = symbolRe.matcher(t)
    var sym = 0
    while (m.find()) sym += 1
    val f = new Array[Double](NUM_FEATURES)
    f(0) = 1.0
    f(1) = math.min(wc, 256).toDouble / 256.0
    f(2) = if (cp == 0) 0.0 else sym.toDouble / cp
    f(3) = if (wc == 0) 0.0 else toks.distinct.length.toDouble / wc
    // CODE-POINT token lengths (ADVICE r5): the oracle's DuckDB
    // length(t) counts code points; UTF-16 units would diverge on
    // non-BMP letters/digits
    f(4) = if (wc == 0) 0.0
    else math.min(
      toks.map(w => w.codePointCount(0, w.length)).sum.toDouble / wc, 16.0) / 16.0
    f
  }

  /** Fixed-order dot product — the SQL replays the same
    * left-to-right association, so the double is bit-identical.
    */
  def logit(model: Model, f: Array[Double]): Double = {
    var acc = 0.0
    var i = 0
    while (i < NUM_FEATURES) { acc = acc + model.weights(i) * f(i); i += 1 }
    acc
  }

  /** Deterministic synthetic labeled corpus (pure function of seed):
    * label 1 = sentence-like text, label 0 = the degenerate modes the
    * heuristic rules also target (too short, symbol-heavy,
    * repetitive). Public so tests and the oracle derive the same set.
    */
  def syntheticTraining(seed: Long = 7L, n: Int = 512): Seq[(String, Int)] = {
    val words = Array("data", "quality", "model", "training", "corpus", "filter",
      "signal", "sample", "measure", "window", "stream", "shard", "token",
      "vector", "branch", "metric")
    (0 until n).map { i =>
      val r = new java.util.SplittableRandom(seed + i)
      (i % 4) match {
        case 0 => // good: varied sentence
          val body = (0 until 8 + r.nextInt(20))
            .map(_ => words(r.nextInt(words.length))).mkString(" ")
          (s"the $body runs end to end", 1)
        case 1 => // good: longer varied prose
          val body = (0 until 20 + r.nextInt(40))
            .map(k => words((r.nextInt(words.length) + k) % words.length)).mkString(" ")
          (body.capitalize + ".", 1)
        case 2 => // bad: repetition
          val w = words(r.nextInt(words.length))
          ((0 until 10 + r.nextInt(20)).map(_ => w).mkString(" "), 0)
        case _ => // bad: symbol soup / near-empty
          if (r.nextBoolean()) ("@#$% &*! ^^ ~~ ++ == " * (1 + r.nextInt(3)), 0)
          else (words(r.nextInt(words.length)), 0)
      }
    }
  }

  /** Full-batch GD, driver-side, deterministic (fixed iteration order,
    * fixed epochs — no early stop, no RNG).
    */
  def train(data: Seq[(String, Int)], epochs: Int = 4000, lr: Double = 4.0): Model = {
    val xs = data.map { case (t, y) => (features(t), y.toDouble) }
    val w = new Array[Double](NUM_FEATURES)
    val n = xs.size.toDouble
    var e = 0
    while (e < epochs) {
      val grad = new Array[Double](NUM_FEATURES)
      xs.foreach { case (f, y) =>
        var z = 0.0
        var i = 0
        while (i < NUM_FEATURES) { z += w(i) * f(i); i += 1 }
        val p = 1.0 / (1.0 + math.exp(-z))
        val d = p - y
        i = 0
        while (i < NUM_FEATURES) { grad(i) += d * f(i); i += 1 }
      }
      var i = 0
      while (i < NUM_FEATURES) { w(i) -= lr * grad(i) / n; i += 1 }
      e += 1
    }
    Model(w)
  }

  /** The default model — trained once per JVM from the fixed synthetic
    * set; the oracle rebuilds the identical weights.
    */
  lazy val defaultModel: Model = train(syntheticTraining())

  /** Distributed scoring: map-only, one UDF per row, no shuffle.
    * Output (id, logit, predicted_keep); predicted_keep ⟺ logit > 0
    * ⟺ sigmoid(logit) > 0.5 — the decision needs no exp.
    */
  def scoreDf(df: DataFrame, idCol: String, textCol: String,
      model: Model = defaultModel): DataFrame = {
    val w = model.weights
    val u = F.udf { (t: String) => logit(Model(w), features(t)) }
    df.select(F.col(idCol).as("id"), u(F.col(textCol)).as("logit"))
      .withColumn("predicted_keep", F.col("logit") > 0.0)
  }
}
