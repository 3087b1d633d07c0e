package graft

import org.apache.spark.sql.{functions => F}

import graft.dedup.Dedup
import graft.functions.CountMinAgg

class CountMinAggSpec extends SparkTestBase {
  import spark.implicits._

  private val corpus: Seq[(Long, String, String)] = (0L until 60L).map { i =>
    val words = Array("the", "data", "model", "of", "stream", "to", "the",
      "filter", "and", "the")
    val r = new java.util.SplittableRandom(i)
    val t = (0 until 5 + r.nextInt(30)).map(_ => words(r.nextInt(words.length)))
      .mkString(" ")
    (i, if (i % 2 == 0) "a" else "b", t)
  }

  /** Local single-threaded reference sketch. */
  private def localSketch(texts: Seq[String]): Array[Long] = {
    val buf = new Array[Long](CountMinAgg.DEPTH * CountMinAgg.WIDTH)
    texts.foreach { t =>
      Dedup.tokens(t).foreach { w =>
        val wh = Dedup.wordHash64(w)
        (0 until CountMinAgg.DEPTH).foreach { j =>
          buf(j * CountMinAgg.WIDTH + CountMinAgg.bucket(w, j)) += 1L
        }
        assert(wh == Dedup.wordHash64(w))
      }
    }
    buf
  }

  private def sketchBySrc(df: org.apache.spark.sql.DataFrame): Map[String, Array[Long]] =
    df.groupBy("src").agg(CountMinAgg.count_min_agg(F.col("text")).as("sk"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toArray).toMap

  test("sketch equals the local single-threaded reference, bit for bit") {
    val got = sketchBySrc(corpus.toDF("id", "src", "text"))
    Seq("a", "b").foreach { s =>
      val exp = localSketch(corpus.filter(_._2 == s).map(_._3))
      assert(got(s).toSeq == exp.toSeq, s"sketch mismatch for src $s")
    }
  }

  test("partition-invariant (merge is commutative integer add)") {
    val base = sketchBySrc(corpus.toDF("id", "src", "text"))
    val got = sketchBySrc(corpus.toDF("id", "src", "text").repartition(13))
    assert(base.keySet == got.keySet)
    base.keySet.foreach(s => assert(base(s).toSeq == got(s).toSeq))
  }

  test("estimate >= exact for every word; exact at this vocab size") {
    val sk = localSketch(corpus.map(_._3))
    val exact = corpus.flatMap(t => Dedup.tokens(t._3))
      .groupBy(identity).map { case (w, g) => w -> g.size.toLong }
    exact.foreach { case (w, c) =>
      val est = CountMinAgg.estimate(sk, w)
      assert(est >= c, s"CMS underestimated '$w': $est < $c")
      // 10-word vocab in a 4x1024 sketch: collisions are impossible to
      // engineer here, the estimate must be exact
      assert(est == c, s"unexpected collision for '$w': $est != $c")
    }
    // absent word: estimate is whatever collides — only >= 0 guaranteed
    assert(CountMinAgg.estimate(sk, "xyzzyq") >= 0L)
  }

  test("aggregates two-phase (map-side partial ObjectHashAggregate)") {
    val plan = corpus.toDF("id", "src", "text").groupBy("src")
      .agg(CountMinAgg.count_min_agg(F.col("text")).as("sk"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert(plan.contains("partial_graft_count_min_agg"), plan)
  }
}
