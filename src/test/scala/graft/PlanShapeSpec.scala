package graft

/** Plan-shape regression guards: the physical plans the scale story
  * depends on (SCALE.md) must not silently regress — broadcast joins
  * for dims, TakeOrderedAndProject for top-k, column-pruned scans,
  * no shuffle in the curate projection.
  */
class PlanShapeSpec extends SparkTestBase {

  val dir = "/root/testdata/sf0.001"

  private def plan(q: String): String =
    SparkEntry.queries(q)(spark, dir).queryExecution.executedPlan.toString

  test("q2: dimension join is a BroadcastHashJoin") {
    assert(plan("q2_join_topk").contains("BroadcastHashJoin"))
  }

  test("q12 knn: top-k is TakeOrderedAndProject (no global sort)") {
    assert(plan("q12_knn").contains("TakeOrderedAndProject"))
  }

  test("q7 scrub: scan reads only (doc_id, text) — column pruning") {
    val p = plan("q7_scrub")
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"), p)
  }

  test("curate projection has NO shuffle (map-only hot path)") {
    val df = graft.pipeline.Curate.curateDf(spark,
      graft.synth.Transcripts.dataset(spark, 5L).toDF())
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), p)
  }

  test("q16 custom expressions are inline in the Project (no UDF wrapper)") {
    // (whole-stage-codegen participation itself is asserted in
    // FunctionsSpec on a non-AQE plan; AQE plans don't render "*(n)"
    // markers before execution)
    val p = plan("q16_custom_expr")
    assert(p.contains("graft_word_count"), p)
    assert(!p.toLowerCase.contains("scalaudf") && !p.contains("BatchEval"), p)
  }
}
