package graft

import graft.ml.QualityClassifier

class QualityClassifierSpec extends SparkTestBase {
  import spark.implicits._

  test("training separates the synthetic classes; model is deterministic") {
    val data = QualityClassifier.syntheticTraining()
    val m = QualityClassifier.train(data)
    val acc = data.count { case (t, y) =>
      (QualityClassifier.logit(m, QualityClassifier.features(t)) > 0.0) == (y == 1)
    }.toDouble / data.size
    assert(acc >= 0.95, s"training accuracy $acc")
    // pure function of the seed: retrain == identical weights
    val m2 = QualityClassifier.train(QualityClassifier.syntheticTraining())
    assert(m.weights.toSeq == m2.weights.toSeq)
    // the classes actually pull the weights where the features say:
    // symbol ratio hurts, distinct ratio helps
    assert(m.weights(2) < 0.0)
    assert(m.weights(3) > 0.0)
  }

  test("features: rational arithmetic, edge cases total") {
    assert(QualityClassifier.features(null).toSeq ==
      Seq(1.0, 0.0, 0.0, 0.0, 0.0))
    assert(QualityClassifier.features("").toSeq ==
      Seq(1.0, 0.0, 0.0, 0.0, 0.0))
    val f = QualityClassifier.features("aa bb aa")
    assert(f(1) == 3.0 / 256.0)
    assert(f(2) == 0.0)
    assert(f(3) == 2.0 / 3.0)
    assert(f(4) == 2.0 / 16.0) // mean word len 2
    assert(QualityClassifier.features("@@@")(2) == 1.0)
  }

  test("features use the oracle's code-point / RE2-whitespace semantics (ADVICE r5)") {
    // non-BMP letter (𝐀, U+1D400, 2 UTF-16 units, 1 code point): token
    // length and cp denominator must count code points like DuckDB's
    // length(), not UTF-16 units
    val astral = "𝐀" // one MATHEMATICAL BOLD CAPITAL A
    val f = QualityClassifier.features(s"$astral$astral $astral$astral")
    assert(f(4) == 2.0 / 16.0, "mean token length must be 2 code points")
    assert(f(2) == 0.0, "astral letters are not symbols")
    // vertical tab \x0B: RE2's \s excludes it, so BOTH engines must
    // count it as a symbol (Java's \s would have silently excluded it)
    val g = QualityClassifier.features("ab\u000Bcd")
    assert(g(2) == 1.0 / 5.0, s"\\x0B must count as a symbol, got ${g(2)}")
  }

  test("scoreDf: map-only plan, decision consistent with the local logit") {
    val docs = Seq(
      (1L, "a well formed sentence about several distinct meaningful topics"),
      (2L, "spam spam spam spam spam spam spam spam spam spam"),
      (3L, "@#$% ^&* !!! ~~~"),
      (4L, "")).toDF("doc_id", "text")
    val out = QualityClassifier.scoreDf(docs, "doc_id", "text")
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"scoring shuffled:\n$plan")
    val got = out.collect().map(r =>
      r.getLong(0) -> ((r.getDouble(1), r.getBoolean(2)))).toMap
    docs.collect().foreach { r =>
      val expected = QualityClassifier.logit(QualityClassifier.defaultModel,
        QualityClassifier.features(r.getString(1)))
      assert(got(r.getLong(0))._1 == expected) // bit-identical
      assert(got(r.getLong(0))._2 == (expected > 0.0))
    }
    // the learned gate agrees with intuition on the planted rows
    assert(got(1L)._2 && !got(2L)._2 && !got(3L)._2 && !got(4L)._2)
  }
}
