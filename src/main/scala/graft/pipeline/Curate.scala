package graft.pipeline

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession, functions => F}

import graft.langid.{LangId, LangIdModel}
import graft.lm.NGramLM
import graft.model.Turn
import graft.rules.{GrammarRules, QualityRules}
import graft.scrub.Scrubber
import graft.synth.Transcripts

/** The curation DAG (SURVEY.md §3 "Spark rebuild of this lifecycle"):
  *
  *   transcripts → langid → cheap quality rules → (gated) grammar rules
  *   → (gated) perplexity → keep/drop decision → scrub → curated
  *
  * One lazily-built DataFrame plan, map-only (NO shuffle on the hot
  * path — the per-turn pipeline is embarrassingly parallel; the only
  * shuffles in the whole flow are the tiny metrics aggregations).
  *
  * Expensive-operator gating is STRUCTURAL, mirroring the reference's
  * "only error chunks reach the LLM" short-circuit
  * (smart_corrector.py:114-128, SURVEY.md §4): grammar-rule extraction
  * and perplexity scoring are wrapped in `when(<cheap rules passed>)`
  * so rows already dropped by a cheap column-expression rule never pay
  * for a UDF call.
  *
  * Model state (langid weights, n-gram table) is broadcast explicitly
  * (SURVEY.md §4.2) — one compact block per executor, not per task.
  */
object Curate {

  /** Broadcast-able model bundle; trained deterministically from the
    * seeded synth corpus (SURVEY.md §7.4: no external data).
    */
  final case class Models(langId: LangIdModel, lm: NGramLM) extends Serializable

  /** One deterministic default bundle per JVM. */
  lazy val defaultModels: Models = {
    val corpus = Transcripts.trainingCorpus()
    Models(LangId.train(corpus), NGramLM.train(corpus.map(_._1)))
  }

  val dropWhenPplMissing: Double = Double.NaN

  /** Add lang/lang_conf/ppl/rule_hits/keep/drop_reason/scrubbed_text/
    * scrub_hits columns to a transcripts DataFrame. Pure projection —
    * preserves partitioning, no shuffle; schema =
    * [[graft.model.CuratedTurn]]. Uses the fused [[CurateCore]] kernel
    * (one string conversion + one scan per row — see CurateCore doc for
    * why this beats the unfused column chain, which remains available
    * as [[curateDfUnfused]] and is asserted semantically identical by
    * GoldenPipelineSpec).
    */
  def curateDf(
      spark: SparkSession,
      turns: DataFrame,
      cfg: QualityRules.Config = QualityRules.defaultConfig,
      models: Models = defaultModels
  ): DataFrame = {
    val bCore: Broadcast[CurateCore] = spark.sparkContext.broadcast(
      new CurateCore(models.langId, models.lm, cfg))
    val coreU = F.udf((t: String) => bCore.value.process(t))
    turns
      .withColumn("__c", coreU(F.col("text")))
      .select(
        F.col("conv_id"), F.col("turn_idx"), F.col("role"), F.col("text"),
        F.col("tool"), F.col("ts"),
        F.col("__c.lang").as("lang"), F.col("__c.lang_conf").as("lang_conf"),
        F.col("__c.ppl").as("ppl"), F.col("__c.rule_hits").as("rule_hits"),
        F.col("__c.keep").as("keep"), F.col("__c.drop_reason").as("drop_reason"),
        F.col("__c.scrubbed_text").as("scrubbed_text"),
        F.col("__c.scrub_hits").as("scrub_hits"))
  }

  /** The original unfused column pipeline — kept as the reference
    * implementation (declarative column expressions, per-stage UDFs,
    * structural gating) and for plan-shape demonstrations; semantics
    * identical to [[curateDf]].
    */
  def curateDfUnfused(
      spark: SparkSession,
      turns: DataFrame,
      cfg: QualityRules.Config = QualityRules.defaultConfig,
      models: Models = defaultModels
  ): DataFrame = {
    val bModels: Broadcast[Models] = spark.sparkContext.broadcast(models)

    val langU = F.udf((t: String) => bModels.value.langId.predict(t))
    val pplU = F.udf((t: String) => bModels.value.lm.perplexity(t))
    val hitsU = F.udf((t: String) =>
      GrammarRules.ruleHits(t, withContext = false).map(_.rule_id))
    val cykU = F.udf((t: String) => GrammarRules.cykInvalidCount(t, cfg.cykMaxWords))
    val scrubU = Scrubber.scrubUdf

    val text = F.col("text")
    // custom codegen expressions whose whitespace/symbol semantics are
    // bit-identical to CurateCore's (Character.isWhitespace /
    // isLetterOrDigit) — the generic built-ins (trim strips only
    // spaces, \s is ASCII-only) diverge on tab/newline-only and
    // unicode-whitespace rows
    val wc = graft.functions.TextMetrics.word_count(text)

    // cheap scalar rules — pure codegen'd column expressions, evaluated
    // in the fixed QualityRules.ruleOrder (drop_reason = FIRST failure)
    val cheapDrop: Column =
      F.when(text.isNull || wc === 0, "empty")
        .when(wc < cfg.minWords, "too_short")
        .when(wc > cfg.maxWords || F.length(text) > cfg.maxChars, "too_long")
        .when(wc >= cfg.repMinWords &&
          QualityRules.distinctRatioCol(text) < cfg.minDistinctRatio, "repetition")
        .when(graft.functions.TextMetrics.symbol_ratio(text) > cfg.maxSymbolRatio, "symbol_ratio")
        .when(QualityRules.boilerplateCol(text), "boilerplate")

    val withCheap = turns.withColumn("__cheap", cheapDrop)

    // gated grammar hits (empty for already-dropped rows)
    val withHits = withCheap.withColumn(
      "rule_hits",
      if (!cfg.grammarEnabled) F.typedlit(Seq.empty[String])
      else F.when(F.col("__cheap").isNotNull, F.typedlit(Seq.empty[String]))
        .otherwise(hitsU(text)))

    val afterGrammar =
      if (!cfg.grammarEnabled) F.col("__cheap")
      else F.coalesce(
        F.col("__cheap"),
        F.when(F.size(F.col("rule_hits")) >= cfg.maxRuleHits, "grammar"))

    val afterCyk =
      if (cfg.cykEnabled)
        F.coalesce(afterGrammar,
          F.when(cykU(text) >= cfg.cykMaxInvalid, "cyk"))
      else afterGrammar

    // langid gated behind the cheap/grammar/cyk rules (verdict #6):
    // already-dropped rows carry the ("und", 0.0) sentinel
    val withLang = withHits
      .withColumn("__pre_lang", afterCyk)
      .withColumn("__lang",
        if (!cfg.langIdEnabled)
          F.struct(F.lit("und").as("_1"), F.lit(0.0).as("_2"))
        else F.when(F.col("__pre_lang").isNotNull,
          F.struct(F.lit("und").as("_1"), F.lit(0.0).as("_2")))
          .otherwise(langU(text)))
      .withColumn("lang", F.col("__lang._1"))
      .withColumn("lang_conf", F.col("__lang._2"))

    val langOk = F.col("lang").isInCollection(cfg.allowedLangs) &&
      F.col("lang_conf") >= cfg.minLangConf
    val afterLang =
      if (!cfg.langIdEnabled) F.col("__pre_lang")
      else F.coalesce(F.col("__pre_lang"), F.when(!langOk, "lang"))

    val withPpl = withLang
      .withColumn("__pre_ppl", afterLang)
      .withColumn(
        "ppl",
        if (cfg.pplEnabled)
          F.when(F.col("__pre_ppl").isNotNull, F.lit(dropWhenPplMissing))
            .otherwise(pplU(text))
        else F.lit(dropWhenPplMissing))

    val dropReason =
      if (cfg.pplEnabled)
        F.coalesce(F.col("__pre_ppl"), F.when(F.col("ppl") > cfg.maxPpl, "ppl"))
      else F.col("__pre_ppl")

    withPpl
      .withColumn("drop_reason", dropReason)
      .withColumn("keep", F.col("drop_reason").isNull)
      .withColumn("__scrub", scrubU(text))
      .withColumn("scrubbed_text", F.col("__scrub.scrubbed"))
      .withColumn("scrub_hits", F.col("__scrub.hits"))
      .select(
        "conv_id", "turn_idx", "role", "text", "tool", "ts",
        "lang", "lang_conf", "ppl", "rule_hits", "keep", "drop_reason",
        "scrubbed_text", "scrub_hits")
  }

  def curate(
      spark: SparkSession,
      turns: Dataset[Turn],
      cfg: QualityRules.Config = QualityRules.defaultConfig,
      models: Models = defaultModels
  ): Dataset[graft.model.CuratedTurn] = {
    import spark.implicits._
    curateDf(spark, turns.toDF(), cfg, models).as[graft.model.CuratedTurn]
  }

  /** Per-run metrics — rebuild of the reference's summary aggregates
    * (smart_corrector.py:229-260, SURVEY.md §2.9 A2). Two tiny
    * shuffles over already-reduced data (map-side partial aggregation
    * is automatic for hash aggregates).
    */
  def metrics(curated: DataFrame, partId: Int = 0): DataFrame = {
    val byRule = curated
      .filter(F.col("drop_reason").isNotNull)
      .groupBy("drop_reason").count()
      .agg(F.map_from_entries(
        F.sort_array(F.collect_list(F.struct(F.col("drop_reason"), F.col("count")))))
        .as("dropped_by_rule"))
    val scrubCounts = curated
      .select(F.explode_outer(F.col("scrub_hits")).as(Seq("k", "v")))
      .filter(F.col("k").isNotNull)
      .groupBy("k").agg(F.sum("v").cast("long").as("n"))
      .agg(F.map_from_entries(
        F.sort_array(F.collect_list(F.struct(F.col("k"), F.col("n")))))
        .as("scrub_hit_counts"))
    val base = curated.agg(
      F.count(F.lit(1)).as("turns_seen"),
      F.sum(F.when(F.col("keep"), 1L).otherwise(0L)).as("turns_kept"),
      F.sum(F.when(F.col("keep"), 0L).otherwise(1L)).as("turns_dropped"))
    base
      .crossJoin(byRule)
      .crossJoin(scrubCounts)
      .withColumn("part_id", F.lit(partId))
      .select("part_id", "turns_seen", "turns_kept", "turns_dropped",
        "dropped_by_rule", "scrub_hit_counts")
  }

  /** Two-phase ordered per-conversation reassembly (SURVEY.md §2.7 R3
    * at scale): a 10^5-turn conversation would make a naive
    * groupBy(conv_id).collect_list a single hot reducer holding the
    * whole conversation. Phase 1 groups by (conv_id, turn_idx/blockSize)
    * — bounded state per group regardless of conversation length —
    * and concatenates each block in turn order; phase 2 concatenates
    * the (few) block strings per conversation in block order. Result
    * is byte-identical to the naive reassembly (asserted in tests).
    */
  def reassembleTwoPhase(curated: DataFrame, blockSize: Int = 1024): DataFrame = {
    val block = (F.col("turn_idx") / blockSize).cast("int").as("block")
    val partial = curated
      .filter(F.col("keep"))
      .groupBy(F.col("conv_id"), block)
      .agg(
        F.count(F.lit(1)).as("n_turns"),
        F.concat_ws(" ",
          F.transform(
            F.array_sort(F.collect_list(F.struct(F.col("turn_idx"), F.col("scrubbed_text")))),
            x => x.getField("scrubbed_text"))).as("part"))
    partial
      .groupBy("conv_id")
      .agg(
        F.sum("n_turns").as("n_turns"),
        F.concat_ws(" ",
          F.transform(
            F.array_sort(F.collect_list(F.struct(F.col("block"), F.col("part")))),
            x => x.getField("part"))).as("reassembled"))
  }

  /** Salted two-phase per-conversation aggregation (SURVEY.md §4.1):
    * partial aggregates per (conv_id, salt) spread a hot conversation
    * over `salt` reducers, the final per-conv step combines `salt`
    * tiny rows. (Spark's hash aggregate already does partial+final
    * map-side combine for these; the explicit salt additionally bounds
    * REDUCER-side group size for pathological keys, and is the pattern
    * a conv-level heavy aggregation must follow at 10^12 turns.)
    */
  def convStatsSalted(curated: DataFrame, salt: Int = 16): DataFrame = {
    val partial = curated
      .groupBy(F.col("conv_id"), F.pmod(F.hash(F.col("turn_idx")), F.lit(salt)).as("__salt"))
      .agg(
        F.count(F.lit(1)).as("n"),
        F.sum(F.when(F.col("keep"), 1L).otherwise(0L)).as("kept"),
        F.sum(F.length(F.col("scrubbed_text")).cast("long")).as("chars"))
    partial
      .groupBy("conv_id")
      .agg(
        F.sum("n").as("n_turns"),
        F.sum("kept").as("n_kept"),
        (F.sum("chars") / F.sum("n")).as("avg_chars"))
  }

  /** Skew-safe repartition for the WRITE path (SURVEY.md §4.1): spread
    * a hot conv_id over `salt` buckets while keeping (conv_id,
    * turn_idx) runs sorted within each output file — per-turn outputs
    * stay byte-identical run-to-run.
    */
  def saltedForWrite(df: DataFrame, numPartitions: Int, salt: Int = 16): DataFrame =
    df.repartition(numPartitions, F.col("conv_id"),
        F.pmod(F.hash(F.col("turn_idx")), F.lit(salt)))
      .sortWithinPartitions("conv_id", "turn_idx")
}
