package graft

import org.apache.spark.sql.{DataFrame, SparkSession, functions => F}

import graft.pipeline.Curate
import graft.rules.{GrammarRules, QualityRules}
import graft.scrub.Scrubber
import graft.synth.Transcripts

/** Per-stage cost attribution for the curate pipeline: times each
  * column family in isolation over the same cached input (min-of-3).
  * Diagnostic only — not part of the driver contract.
  */
object StageBench {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val nConvs = sys.env.getOrElse("SPARK_GRAFT_STAGE_CONVS", "18000").toLong
    val turns = Transcripts.dataset(spark, nConvs).toDF()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    val n = turns.count()

    val models = Curate.defaultModels
    val bModels = spark.sparkContext.broadcast(models)
    val langU = F.udf((t: String) => bModels.value.langId.predict(t))
    val pplU = F.udf((t: String) => bModels.value.lm.perplexity(t))
    val hitsU = F.udf((t: String) =>
      GrammarRules.ruleHits(t, withContext = false).map(_.rule_id)) // matches Curate hot path
    val text = F.col("text")

    val stages: Seq[(String, DataFrame)] = Seq(
      "baseline_identity" -> turns.select(F.length(text).as("x")),
      "scalar_rules_cols" -> turns.select(
        QualityRules.wordCountCol(text).as("wc"),
        QualityRules.distinctRatioCol(text).as("dr"),
        QualityRules.symbolRatioCol(text).as("sr"),
        QualityRules.boilerplateCol(text).as("bp")),
      "langid_udf" -> turns.select(langU(text).as("l")),
      "ppl_udf" -> turns.select(pplU(text).as("p")),
      "rule_hits_udf" -> turns.select(hitsU(text).as("h")),
      "scrub_udf" -> turns.select(Scrubber.scrubUdf(text).as("s")),
      "full_curate_unfused" -> Curate.curateDfUnfused(spark, turns),
      "full_curate_fused" -> Curate.curateDf(spark, turns)
    )
    stages.foreach { case (name, df) =>
      Bench.forceMaterialize(df) // warm
      val secs = (1 to 3).map(_ => Bench.time(Bench.forceMaterialize(df)))
      println(f"$name%-20s min=${secs.min}%.3f s  (${n / secs.min}%.0f rows/s)  reps=${secs.map(s => f"$s%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
