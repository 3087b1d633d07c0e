package graft

import java.nio.file.Paths

import graft.tableio.TableIO

/** Evidence for the SURVEY §4 bucketing claim: two tables bucketed on
  * the join key join WITHOUT a shuffle (no Exchange on either side),
  * while the same join on unbucketed parquet shuffles both sides.
  * This is the co-located-join strategy for the repeated big-big joins
  * at 100 TB (e.g. curated ⋈ labels on conv_id).
  */
class BucketedJoinSpec extends SparkTestBase {
  import org.apache.spark.sql.functions._

  test("bucketed tables join with zero Exchange; unbucketed join shuffles") {
    val wh = s"/tmp/graft-wh-${System.nanoTime()}"
    spark.sql(s"CREATE DATABASE IF NOT EXISTS graftbuckets LOCATION '$wh'")
    try {
      val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      val o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      li.write.mode("overwrite")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("graftbuckets.li_b")
      o.write.mode("overwrite")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("graftbuckets.o_b")

      // disable auto-broadcast so the join strategy decision is about
      // shuffle vs co-located, not size
      val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val bucketed = spark.table("graftbuckets.li_b")
          .join(spark.table("graftbuckets.o_b"),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy("o_orderpriority").count()
        val bPlan = bucketed.queryExecution.executedPlan.toString
        // join itself must not shuffle: the only Exchange allowed is the
        // post-join aggregation's
        val joinPart = bPlan.split("SortMergeJoin")(1)
        assert(!joinPart.contains("Exchange"),
          s"bucketed join still shuffles:\n$bPlan")
        assert(bucketed.count() > 0)

        val plain = li.join(o, col("l_orderkey") === col("o_orderkey"))
          .groupBy("o_orderpriority").count()
        val pPlan = plain.queryExecution.executedPlan.toString
        assert(pPlan.split("SortMergeJoin").last.contains("Exchange"),
          s"expected shuffling join on unbucketed input:\n$pPlan")
        // and both give the same answer
        assert(bucketed.collect().map(_.toSeq).toSet ==
          plain.collect().map(_.toSeq).toSet)
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    } finally {
      spark.sql("DROP TABLE IF EXISTS graftbuckets.li_b")
      spark.sql("DROP TABLE IF EXISTS graftbuckets.o_b")
      spark.sql("DROP DATABASE IF EXISTS graftbuckets")
      TableIO.deleteRecursive(Paths.get(wh))
    }
  }
}
