package graft

import org.apache.spark.sql.{functions => F}

import graft.sample.Sampling

class TemperatureMixSpec extends SparkTestBase {
  import spark.implicits._

  // skewed sources: a 800, b 150, c 50
  private val corpus: Seq[(Long, String)] =
    (0L until 800L).map(i => (i, "a")) ++
      (800L until 950L).map(i => (i, "b")) ++
      (950L until 1000L).map(i => (i, "c"))

  private def df = corpus.toDF("doc_id", "source")

  test("rates match the local formula; big sources downsampled hardest") {
    val rates = Sampling.sqrtTemperatureRates(df, "source", 0.25)
    val ns = Map("a" -> 800L, "b" -> 150L, "c" -> 50L)
    var sumW = 0.0
    ns.toSeq.sortBy(_._1).foreach { case (_, n) => sumW = sumW + math.sqrt(n.toDouble) }
    val target = 0.25 * 1000.0
    ns.foreach { case (s, n) =>
      val expect = math.min(1.0, (target * math.sqrt(n.toDouble)) / (sumW * n.toDouble))
      assert(rates(s) == expect, s"rate($s)") // bit-identical
    }
    assert(rates("a") < rates("b") && rates("b") < rates("c"))
    // expected kept mass == the budget when nothing caps at 1.0
    val mass = ns.map { case (s, n) => rates(s) * n }.sum
    assert(math.abs(mass - 250.0) < 1e-9, s"expected mass $mass")
  }

  test("sampling is map-only, deterministic, partition-invariant; realized counts near expectation") {
    val rates = Sampling.sqrtTemperatureRates(df, "source", 0.25)
    val out = Sampling.sampleByRates(df, "source", "doc_id", rates)
    assert(!out.queryExecution.executedPlan.toString.contains("Exchange"))
    val ids = out.select("doc_id").collect().map(_.getLong(0)).toSet
    val ids2 = Sampling.sampleByRates(df.repartition(13), "source", "doc_id", rates)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids == ids2)
    // binomial 3-sigma sanity per source
    val kept = out.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    Seq(("a", 800L), ("b", 150L), ("c", 50L)).foreach { case (s, n) =>
      val mu = rates(s) * n
      val sd = math.sqrt(n * rates(s) * (1 - rates(s)))
      assert(math.abs(kept.getOrElse(s, 0L) - mu) <= 3 * sd + 1,
        s"source $s kept ${kept.getOrElse(s, 0L)} vs mu $mu sd $sd")
    }
  }

  test("tiny sources cap at rate 1.0 (kept whole)") {
    val skew = ((0L until 5000L).map(i => (i, "big")) ++
      (5000L until 5004L).map(i => (i, "rare"))).toDF("doc_id", "source")
    val rates = Sampling.sqrtTemperatureRates(skew, "source", 0.5)
    assert(rates("rare") == 1.0)
    assert(rates("big") < 1.0)
  }
}
