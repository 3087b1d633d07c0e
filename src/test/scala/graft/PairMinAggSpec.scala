package graft

import org.apache.spark.sql.{functions => F, Row}

import graft.functions.PairMinAgg.pair_min

/** [[graft.functions.PairMinAgg]]: the hash-aggregable replacement for
  * `min(struct(a, b))` on the first-occurrence dedup paths. The
  * aggregate exists purely for plan shape (HashAggregate instead of
  * SortAggregate), so the spec pins (1) value equivalence with the
  * built-in on adversarial inputs — duplicates, ties on the first
  * field, null fields, empty input — and (2) the plan shape itself on
  * the two production call sites.
  */
class PairMinAggSpec extends SparkTestBase {

  test("pair_min == min(struct) on randomized groups with ties and nulls") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val rows = (0 until 2000).map { _ =>
      val k = rnd.nextInt(37)
      val id = if (rnd.nextInt(50) == 0) null
        else java.lang.Long.valueOf(rnd.nextInt(8).toLong) // dense → ties
      val pos = if (rnd.nextInt(50) == 0) null
        else java.lang.Integer.valueOf(rnd.nextInt(1000))
      (k, id, pos)
    }
    val df = rows.toDF("k", "id", "pos")
    val both = df.groupBy("k").agg(
      pair_min(F.col("id"), F.col("pos"), "id", "pos").as("fast"),
      F.min(F.struct(F.col("id"), F.col("pos"))).as("ref"))
    val bad = both.filter(!(F.col("fast") <=> F.col("ref"))).collect()
    assert(bad.isEmpty, bad.mkString("\n"))
  }

  test("pair_min over an empty frame is NULL, like the built-in") {
    import spark.implicits._
    val df = Seq((1L, 2)).toDF("id", "pos").filter(F.lit(false))
    val r = df.agg(
      pair_min(F.col("id"), F.col("pos"), "id", "pos").as("fast"),
      F.min(F.struct(F.col("id"), F.col("pos"))).as("ref")).head()
    assert(r.isNullAt(0) && r.isNullAt(1), r.toString)
  }

  test("pair_min field access and names match the struct-min contract") {
    import spark.implicits._
    val df = Seq((10L, 5), (3L, 9), (3L, 2)).toDF("id", "pos")
    val r = df.agg(pair_min(F.col("id"), F.col("pos"), "id", "s").as("first"))
      .select(F.col("first.id"), F.col("first.s")).head()
    assert(r == Row(3L, 2), r.toString)
  }

  test("lineDedup/spanDedup first-occurrence stats are HashAggregate, no SortAggregate") {
    // the min(struct) formulation forced SortAggregate — a
    // per-partition sort of every line/window occurrence before the
    // partial aggregate; pair_min must keep both paths sort-free up to
    // the (unavoidable) output collect_list/array_sort reassembly
    import spark.implicits._
    val docs = (0L until 8L)
      .map(i => (i, s"shared line\nuniq $i\nshared line"))
      .toDF("id", "text")
    val line = graft.dedup.Dedup.lineDedup(docs, "id", "text")
    val span = graft.dedup.Dedup.spanDedup(docs, "id", "text", w = 2)
    Seq("lineDedup" -> line, "spanDedup" -> span).foreach { case (name, df) =>
      df.collect() // materializes the localCheckpoint branches
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("SortAggregate"), s"$name plan:\n$p")
      assert(p.contains("graft_pair_min"), s"$name plan:\n$p")
    }
  }

  test("lineDedup values unchanged by the pair_min swap (vs min(struct) reference)") {
    import spark.implicits._
    // duplicated lines across docs + intra-doc dups + boilerplate
    val docs = Seq(
      (4L, "b\na\nb\nc"),
      (2L, "a\nx\n\nb"),
      (7L, "c\na\ny")
    ).toDF("id", "text")
    val got = graft.dedup.Dedup.lineDedup(docs, "id", "text", boilerplateMinDf = 3)
      .orderBy("id").collect().toSeq
    // "a" and "b" occur 3× → boilerplate, removed everywhere;
    // "c" occurs 2× → first occurrence (4,3) kept, (7,0) removed;
    // "x"/"y" unique → kept; doc 2's blank line is kept structure
    val want = Seq(
      Row(2L, "x\n", 4L, 2L),
      Row(4L, "c", 4L, 1L),
      Row(7L, "y", 3L, 1L)
    )
    assert(got == want, got.mkString("\n"))
  }
}
