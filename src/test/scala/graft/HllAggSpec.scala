package graft

import org.apache.spark.sql.{functions => F}

import graft.dedup.Dedup
import graft.functions.HllAgg

class HllAggSpec extends SparkTestBase {
  import spark.implicits._

  /** Local single-threaded register fold. */
  private def localRegs(texts: Seq[String]): Array[Int] = {
    val regs = new Array[Int](HllAgg.M)
    texts.foreach { t =>
      Dedup.tokens(t).foreach { w =>
        val wh = Dedup.wordHash64(w)
        val idx = (wh >>> (64 - HllAgg.P)).toInt
        val rest = wh << HllAgg.P
        val rank = if (rest == 0L) 64 - HllAgg.P + 1
        else java.lang.Long.numberOfLeadingZeros(rest) + 1
        if (rank > regs(idx)) regs(idx) = rank
      }
    }
    regs
  }

  private def regsBySrc(df: org.apache.spark.sql.DataFrame): Map[String, Array[Int]] =
    df.groupBy("src").agg(HllAgg.hll_agg(F.col("text")).as("regs"))
      .collect().map(r => r.getString(0) -> r.getSeq[Int](1).toArray).toMap

  private val corpus: Seq[(String, String)] = (0 until 400).map { i =>
    val r = new java.util.SplittableRandom(i.toLong)
    val t = (0 until 40).map(_ => s"w${r.nextInt(50000)}").mkString(" ")
    (if (i % 2 == 0) "a" else "b", t)
  }

  test("registers equal the local reference bit for bit; partition-invariant") {
    val df = corpus.toDF("src", "text")
    val got = regsBySrc(df)
    Seq("a", "b").foreach { s =>
      assert(got(s).toSeq == localRegs(corpus.filter(_._1 == s).map(_._2)).toSeq)
    }
    val re = regsBySrc(corpus.toDF("src", "text").repartition(11))
    Seq("a", "b").foreach(s => assert(re(s).toSeq == got(s).toSeq))
  }

  test("estimate within 3 sigma (~10%) of exact on ~8k distinct words") {
    val texts = corpus.filter(_._1 == "a").map(_._2)
    val exact = texts.flatMap(Dedup.tokens).distinct.size.toDouble
    val est = HllAgg.estimate(localRegs(texts))
    assert(math.abs(est - exact) / exact < 0.10,
      s"HLL estimate $est vs exact $exact")
  }

  test("linear-counting branch exact-ish for tiny sets; empty is 0") {
    val est = HllAgg.estimate(localRegs(Seq("alpha beta gamma delta epsilon")))
    assert(math.abs(est - 5.0) < 0.1, s"small-set estimate $est")
    assert(HllAgg.estimate(new Array[Int](HllAgg.M)) == 0.0)
  }

  test("merge is element-wise max: union of splits == whole") {
    val (l, r) = corpus.map(_._2).splitAt(200)
    val whole = localRegs(corpus.map(_._2))
    val merged = localRegs(l).zip(localRegs(r)).map { case (a, b) => math.max(a, b) }
    assert(merged.toSeq == whole.toSeq)
    // and the distributed agg over the concatenation agrees
    val dist = regsBySrc(corpus.map { case (_, t) => ("x", t) }.toDF("src", "text"))
    assert(dist("x").toSeq == whole.toSeq)
  }
}
