package graft

import org.apache.spark.sql.{functions => F}

import graft.dedup.Dedup

class SpanDedupSpec extends SparkTestBase {
  import spark.implicits._

  private val W = 4

  /** Local brute-force reference of the same semantics. */
  private def brute(docs: Seq[(Long, String)], w: Int): Map[Long, (String, Int, Int)] = {
    val wins = docs.flatMap { case (id, t) =>
      Dedup.windowHashes(t, w).zipWithIndex.map { case (h, s) => (h, id, s) }
    }
    val first = wins.groupBy(_._1).map { case (h, g) =>
      h -> g.map(x => (x._2, x._3)).min
    }
    docs.map { case (id, t) =>
      val toks = Dedup.tokens(t)
      val n = toks.length
      if (n < w) id -> ((toks.mkString(" "), n, n))
      else {
        val hs = Dedup.windowHashes(t, w)
        val kept = (0 until n).filter { i =>
          (math.max(0, i - w + 1) to math.min(i, n - w))
            .exists(s => first(hs(s)) == ((id, s)))
        }
        id -> ((kept.map(toks).mkString(" "), n, kept.size))
      }
    }.toMap
  }

  private def run(docs: Seq[(Long, String)], w: Int) =
    Dedup.spanDedup(docs.toDF("id", "text"), "id", "text", w)
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2), r.getInt(3))))
      .toMap

  // the repeated region must exceed 2(W-1) tokens for interior tokens
  // to lose EVERY covering window (the ExactSubstr property: shorter
  // duplicated spans inside unique context survive via boundary
  // windows — that's the intended maximal-region semantics)
  private val corpus = Seq(
    1L -> "alpha beta gamma delta epsilon zeta eta theta iota kappa unique one tail here",
    2L -> "opening words then alpha beta gamma delta epsilon zeta eta theta iota kappa closing words", // repeats doc1's 10-token region
    3L -> "alpha beta gamma delta", // whole doc = a duplicated window, no unique context
    4L -> "totally different content with no repeats at all",
    5L -> "tiny doc", // < W tokens: untouched
    6L -> "")

  test("matches the brute-force reference") {
    assert(run(corpus, W) == brute(corpus, W))
  }

  test("first occurrence survives; later instances lose the span, boundary context kept") {
    val got = run(corpus, W)
    // doc1 holds the first (id, start) of every repeated window: intact
    assert(got(1L)._1.startsWith("alpha beta gamma delta"))
    assert(got(1L)._2 == got(1L)._3)
    // doc2 loses exactly the interior of the repeated region (tokens
    // whose every covering window is a duplicate: delta..eta); its own
    // unique boundary windows keep W-1 tokens alive at each edge
    assert(got(2L)._2 == 15 && got(2L)._3 == 11)
    assert(!got(2L)._1.contains("gamma delta epsilon"))
    assert(got(2L)._1.startsWith("opening words then alpha beta gamma"))
    assert(got(2L)._1.endsWith("theta iota kappa closing words"))
    // doc3 is nothing but the duplicate span: fully removed
    assert(got(3L) == (("", 4, 0)))
    // unique doc untouched (token-normalized)
    assert(got(4L)._2 == got(4L)._3)
    // short doc untouched
    assert(got(5L) == (("tiny doc", 2, 2)))
    assert(got(6L) == (("", 0, 0)))
  }

  test("plan: no window over the span hash (two-phase min)") {
    val plan = Dedup.spanDedup(corpus.toDF("id", "text"), "id", "text", W)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"hot-key window in span dedup:\n$plan")
  }

  test("window-hash UDF computed once: both consumers read the pinned scalars") {
    val plan = Dedup.spanDedup(corpus.toDF("id", "text"), "id", "text", W)
      .queryExecution.executedPlan.toString
    // the explode of the hash UDF happens at checkpoint time; were it
    // inlined, BOTH the aggregate and the join-back subtree would
    // carry their own Generate over the UDF
    assert(!plan.contains("Generate"), s"window UDF re-inlined:\n$plan")
  }

  test("partition-invariant") {
    val base = run(corpus, W)
    val got = Dedup.spanDedup(corpus.toDF("id", "text").repartition(7),
        "id", "text", W)
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2), r.getInt(3))))
      .toMap
    assert(got == base)
  }

  test("within-doc repeated span also dedups (keep-first inside one doc)") {
    val doc = Seq(7L -> "one two three four filler one two three four")
    val got = run(doc, W)
    // second instance of the 4-gram loses its interior; first stays
    assert(got(7L)._1.startsWith("one two three four filler"))
    assert(got(7L)._3 < got(7L)._2)
    assert(got(7L) == brute(doc, W)(7L))
  }
}
