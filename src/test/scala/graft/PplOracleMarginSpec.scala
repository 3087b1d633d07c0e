package graft

import org.apache.spark.sql.{functions => F}

import graft.lm.NGramLM
import graft.pipeline.Curate

/** Hard-signal audit for the `perplexity_turns` exactLn oracle (the
  * CORRECTNESS_r04/r05 red row): proves, on the ACTUAL driver inputs,
  * that after the dumped-ln-table rewrite no cross-engine
  * transcendental disagreement can flip the compared value.
  *
  * 1. BIT-EXACT logp replay: the SQL's per-token logp (pair-table
  *    join + stepwise backoff constants, OracleSql.pplCtes exactLn)
  *    is replicated here operation-for-operation and asserted equal
  *    to the engine's NGramLM.logProb via doubleToRawLongBits — so
  *    the order-forced fold's addends are IEEE-identical on both
  *    sides of the compare boundary by construction (no ln runs in
  *    DuckDB on that path). This also verifies the pair table's
  *    num <= den coverage assumption against every real lookup.
  * 2. ROUND-BOUNDARY MARGIN: the only remaining cross-engine ops are
  *    exp (input now bit-identical) and round(,4). libms agree to a
  *    few ulps; round implementations differ near x.xxxx5 boundaries
  *    by ~ulp(v·1e4). For every row of the driver's correctness SFs
  *    the exact decimal distance of v·10^4 from the nearest .5
  *    boundary is asserted ≥ 64 ulps of v·10^4 — any exp/round pair
  *    within 32 ulps of correct (real libms: ≤2) lands on the same
  *    rounded value.
  * 3. No row can hit the exp(30) clamp (where a 1-ulp libm gap is
  *    ~2e-3 — round-visible): max possible -logp per token is
  *    2·|log 0.4| + ln(denF) ≈ 12.3, asserted < 29 directly.
  */
class PplOracleMarginSpec extends SparkTestBase {

  private val lm = Curate.defaultModels.lm
  private val denF: Float = lm.table.get(NGramLM.TOTAL_KEY, 1f) + lm.vocabSize
  private val lb = NGramLM.LOG_BACKOFF
  private val logUnseen = math.log(1.0 / denF)

  /** The engine's stepwise unseen constant (mirrors OracleSql). */
  private def unseenConst(levels: Int): Double = {
    var backoff = 0.0
    var n = 0
    while (n < levels) { backoff += lb; n += 1 }
    backoff - lb + logUnseen
  }

  /** The SQL CASE of pplCtes(exactLn = true), operation for operation. */
  private def sqlLogp(toks: Array[Long], i: Int): Double = {
    val pos = i + 1
    def cnt(from: Int, to: Int): Float =
      lm.table.get(NGramLM.hashWindow(toks, from, to), 0f)
    val c3n = if (pos >= 3) cnt(i - 2, i) else 0f
    if (pos >= 3 && c3n > 0f) {
      val cd3 = cnt(i - 2, i - 1)
      assert(cd3 > 0f && c3n <= cd3, s"pair-table gap: c3n=$c3n cd3=$cd3")
      return math.log((c3n / cd3).toDouble)
    }
    val c2n = if (pos >= 2) cnt(i - 1, i) else 0f
    if (pos >= 2 && c2n > 0f) {
      val cd2 = cnt(i - 1, i - 1)
      assert(cd2 > 0f && c2n <= cd2, s"pair-table gap: c2n=$c2n cd2=$cd2")
      return (if (pos >= 3) lb else 0.0) + math.log((c2n / cd2).toDouble)
    }
    val c1n = cnt(i, i)
    if (c1n > 0f) {
      assert(c1n <= denF, s"pair-table gap: c1n=$c1n denF=$denF")
      return (math.min(3, pos) - 1) * lb + math.log((c1n / denF).toDouble)
    }
    unseenConst(math.min(3, pos))
  }

  private def auditSf(dir: String): Unit = {
    assume(new java.io.File(s"$dir/documents.parquet").exists(),
      s"testdata $dir not present")
    val texts = spark.read.parquet(s"$dir/documents.parquet")
      .select(F.when(F.col("doc_id") % 17 === 5, F.lit("!!!"))
        .otherwise(F.col("text")).as("text"))
      .collect().map(_.getString(0))
    var minRatio = Double.MaxValue
    var rows = 0
    texts.foreach { t =>
      val toks = NGramLM.tokenize(t)
      if (toks.nonEmpty) {
        rows += 1
        var sum = 0.0
        var i = 0
        while (i < toks.length) {
          val eng = lm.logProb(toks, i)
          val sql = sqlLogp(toks, i)
          assert(java.lang.Double.doubleToRawLongBits(eng) ==
            java.lang.Double.doubleToRawLongBits(sql),
            s"logp bits differ at pos ${i + 1}: engine=$eng sql=$sql " +
              s"text='${t.take(50)}'")
          sum += eng
          i += 1
        }
        val avg = math.min(30.0, math.max(0.0, -sum / toks.length))
        assert(avg < 29.0, s"avg logp $avg can reach the exp(30) clamp")
        val v = math.exp(avg)
        // exact decimal distance of v*10^4 from the nearest .5 boundary
        val scaled = new java.math.BigDecimal(v).movePointRight(4)
        val frac = scaled.subtract(new java.math.BigDecimal(scaled.toBigInteger))
        val dist = frac.subtract(new java.math.BigDecimal("0.5")).abs.doubleValue
        val hazard = 64.0 * math.ulp(v) * 1e4
        assert(dist >= hazard,
          f"round(,4) margin too small: ppl=$v dist=$dist%.3e hazard=$hazard%.3e")
        if (hazard > 0) minRatio = math.min(minRatio, dist / hazard)
      }
    }
    info(f"$dir: $rows token-bearing rows, min dist/hazard ratio $minRatio%.1f")
  }

  test("exactLn oracle logp is bit-identical to the engine and round-safe (sf0.001)") {
    auditSf("/root/testdata/sf0.001")
  }

  test("exactLn oracle logp is bit-identical to the engine and round-safe (sf0.01)") {
    auditSf("/root/testdata/sf0.01")
  }
}
