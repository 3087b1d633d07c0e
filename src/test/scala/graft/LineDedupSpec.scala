package graft

import org.apache.spark.sql.{functions => F}

import graft.dedup.Dedup

/** Line-level corpus dedup (CCNet/C4 style): semantics vs a local
  * brute-force reference, structural blank handling, boilerplate
  * threshold, and the scale guards (no window over the line key;
  * partition invariance).
  */
class LineDedupSpec extends SparkTestBase {
  import spark.implicits._

  /** Local reference: same semantics, straight-line Scala. */
  private def bruteLineDedup(
      docs: Seq[(Long, String)], minDf: Long): Map[Long, (String, Long, Long)] = {
    val lines = docs.flatMap { case (id, t) =>
      t.split("\n", -1).zipWithIndex.map { case (l, p) => (id, p, l, l.trim.toLowerCase) }
    }
    val content = lines.filter(_._4.nonEmpty)
    val df = content.groupBy(_._4).map { case (n, g) => n -> g.size.toLong }
    val first = content.groupBy(_._4).map { case (n, g) =>
      n -> g.map(x => (x._1, x._2)).min
    }
    val kept = lines.filter { case (id, p, _, n) =>
      n.isEmpty || (df(n) < minDf && (df(n) == 1L || first(n) == ((id, p))))
    }
    docs.map { case (id, t) =>
      val mine = kept.filter(_._1 == id).sortBy(_._2)
      id -> ((mine.map(_._3).mkString("\n"),
        t.split("\n", -1).length.toLong, mine.size.toLong))
    }.toMap
  }

  private def run(docs: Seq[(Long, String)], minDf: Long) =
    Dedup.lineDedup(docs.toDF("id", "text"), "id", "text", minDf)
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap

  private val corpus = Seq(
    1L -> "alpha one\ncommon footer\nunique a",
    2L -> "alpha two\ncommon footer\n\nunique b",
    3L -> "common footer\nALPHA ONE\nunique c", // dup of doc1 line (case-folded)
    4L -> "common footer\n  common footer  \nunique d", // trim-folded dup within one doc
    5L -> "common footer", // doc that loses everything at low threshold
    6L -> "" // empty doc: one blank line, survives as ""
  )

  test("matches the brute-force reference (first-wins, no boilerplate threshold)") {
    assert(run(corpus, Long.MaxValue) == bruteLineDedup(corpus, Long.MaxValue))
  }

  test("boilerplate threshold removes frequent lines everywhere, incl. first occurrence") {
    val got = run(corpus, 5L) // 'common footer' df=6 >= 5 -> gone everywhere
    assert(got == bruteLineDedup(corpus, 5L))
    assert(!got.values.exists(_._1.contains("common footer")))
    // doc 5 lost its only content line -> empty skeleton, n_kept 0
    assert(got(5L) == (("", 1L, 0L)))
    // doc 2's blank structural line survives
    assert(got(2L)._1 == "alpha two\n\nunique b")
  }

  test("first occurrence is global (id, pos) order; within-doc dups collapse") {
    val got = run(corpus, Long.MaxValue)
    // 'common footer' first occurs at (1, 1): doc1 keeps it, others lose it
    assert(got(1L)._1.contains("common footer"))
    assert(!got(3L)._1.contains("common footer"))
    // case/trim-folded: doc3's 'ALPHA ONE' loses to doc1's 'alpha one'
    assert(!got(3L)._1.contains("ALPHA ONE"))
    // doc4 had two folded copies of the footer, both lose to doc1
    assert(got(4L) == (("unique d", 3L, 1L)))
    // empty doc survives verbatim
    assert(got(6L) == (("", 1L, 1L)))
  }

  test("plan: no window over the line key; counts aggregate two-phase") {
    val plan = Dedup.lineDedup(corpus.toDF("id", "text"), "id", "text", 5L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"hot-key window in line dedup:\n$plan")
  }

  test("partition-invariant") {
    val base = run(corpus, 5L)
    val got = Dedup.lineDedup(
        corpus.toDF("id", "text").repartition(7), "id", "text", 5L)
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got == base)
  }
}
