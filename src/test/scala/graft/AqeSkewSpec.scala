package graft

/** Evidence for the SURVEY §4 AQE claim: a shuffle join with one hot
  * key gets its skewed partition SPLIT by AQE at runtime
  * (OptimizeSkewedJoin → AQEShuffleRead with skew markers), with
  * values identical to the non-AQE plan. This is the runtime half of
  * the skew story (the static half is the conv_id salting, tested in
  * GoldenPipelineSpec).
  */
class AqeSkewSpec extends SparkTestBase {
  import org.apache.spark.sql.functions._
  import spark.implicits._

  test("AQE splits a skewed join partition (skew markers in the final plan)") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.autoBroadcastJoinThreshold"
    ).map(k => k -> scala.util.Try(conf.get(k)).toOption)
    try {
      conf.set("spark.sql.adaptive.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      // tiny thresholds so the fixture-sized hot key counts as skewed
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ

      // 200k-row fact where 60% of rows share one hot key
      val fact = spark.range(200000L)
        .select(when(col("id") % 5 < 3, lit(7L)).otherwise(col("id") % 1000).as("k"),
          (col("id") * 37 % 1001).as("v"),
          lpad(lit("x"), 64, "x").as("pad"))
      val dim = spark.range(1000L).select(col("id").as("k"), (col("id") % 13).as("w"))

      val joined = fact.join(dim, Seq("k"))
        .groupBy("w").agg(count(lit(1)).as("n"), sum("v").as("sv"))
      val rows = joined.collect() // executes → AQE finalizes the plan
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true") && finalPlan.contains("AQEShuffleRead skewed"),
        s"no skew split in final plan:\n$finalPlan")

      // same values without AQE
      conf.set("spark.sql.adaptive.enabled", "false")
      val plain = fact.join(dim, Seq("k"))
        .groupBy("w").agg(count(lit(1)).as("n"), sum("v").as("sv"))
        .collect()
      assert(rows.map(_.toSeq).toSet == plain.map(_.toSeq).toSet)
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
