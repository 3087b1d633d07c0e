package graft

import java.nio.file.{Files, Paths}

import graft.pipeline.Curate
import graft.streaming.StreamingCurate
import graft.synth.Transcripts
import graft.tableio.TableIO

class StreamingSpec extends SparkTestBase {

  test("streaming curate over parquet == batch curate (same decisions), incl. incremental files") {
    import org.apache.spark.sql.functions._
    val in = s"/tmp/graft-stream-in-${System.nanoTime()}"
    val out = s"/tmp/graft-stream-out-${System.nanoTime()}"
    val ckpt = s"/tmp/graft-stream-ckpt-${System.nanoTime()}"
    try {
      val batch1 = Transcripts.dataset(spark, 20L).toDF()
      batch1.write.mode("overwrite").parquet(in)
      StreamingCurate.runAvailableNowToParquet(spark, in, out, ckpt)
      def read(path: String) = spark.read.parquet(path)
        .select("conv_id", "turn_idx", "keep", "drop_reason")
        .collect().map(_.toSeq.map(String.valueOf)).sortBy(_.toString)
      def batchRef(df: org.apache.spark.sql.DataFrame) = Curate.curateDf(spark, df)
        .select("conv_id", "turn_idx", "keep", "drop_reason")
        .collect().map(_.toSeq.map(String.valueOf)).sortBy(_.toString)
      assert(read(out).toSeq == batchRef(batch1).toSeq)
      val n1 = spark.read.parquet(out).count()

      // append new conversations; AvailableNow must pick up ONLY new files
      val batch2 = {
        import spark.implicits._
        Transcripts.conversation(7L, 10001L).map(_._1).toDF()
      }
      batch2.write.mode("append").parquet(in)
      StreamingCurate.runAvailableNowToParquet(spark, in, out, ckpt)
      assert(spark.read.parquet(out).count() == n1 + batch2.count()) // only the increment added
      assert(read(out).toSeq == batchRef(spark.read.parquet(in)).toSeq)
    } finally {
      Seq(in, out, ckpt).foreach(d => TableIO.deleteRecursive(Paths.get(d)))
    }
  }

  test("windowed metrics under watermark produce per-window outcome counts") {
    val in = s"/tmp/graft-stream-win-${System.nanoTime()}"
    val ckpt = s"/tmp/graft-stream-winck-${System.nanoTime()}"
    try {
      Transcripts.dataset(spark, 10L).toDF().write.mode("overwrite").parquet(in)
      val q = StreamingCurate.windowedMetrics(
          StreamingCurate.curateStream(spark, in))
        .writeStream.format("memory").queryName("win_out")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      // append-mode emits only watermark-closed windows; correctness of
      // the aggregation itself is covered by running complete-mode below
      val q2 = StreamingCurate.windowedMetrics(
          StreamingCurate.curateStream(spark, in))
        .writeStream.format("memory").queryName("win_out_complete")
        .outputMode("complete")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q2.awaitTermination()
      val rows = spark.table("win_out_complete").collect()
      assert(rows.nonEmpty)
      val outcomes = rows.map(_.getAs[String]("outcome")).toSet
      assert(outcomes.contains("kept"))
    } finally {
      TableIO.deleteRecursive(Paths.get(in))
      TableIO.deleteRecursive(Paths.get(ckpt))
    }
  }

  test("streaming exact dedup within watermark drops replayed duplicate turns") {
    import spark.implicits._
    val in = s"/tmp/graft-stream-dedup-${System.nanoTime()}"
    val ckpt = s"/tmp/graft-stream-dedupck-${System.nanoTime()}"
    try {
      val base = Transcripts.dataset(spark, 6L).toDF()
      // replay: the same turns written twice (duplicate feed), plus the
      // originals — streaming dedup must emit each distinct text once
      base.write.mode("overwrite").parquet(in)
      base.limit(40).write.mode("append").parquet(in)
      val stream = spark.readStream
        .schema(StreamingCurate.turnSchema).parquet(in)
      val q = StreamingCurate.dedupStream(stream)
        .writeStream.format("memory").queryName("dedup_out")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val got = spark.table("dedup_out")
      val distinctTexts = spark.read.parquet(in)
        .select("text").distinct().count()
      assert(got.count() == distinctTexts,
        s"expected $distinctTexts unique-text turns, got ${got.count()}")
      assert(got.select("text").distinct().count() == distinctTexts)
    } finally {
      TableIO.deleteRecursive(Paths.get(in))
      TableIO.deleteRecursive(Paths.get(ckpt))
    }
  }

  test("per-conversation running state via mapGroupsWithState") {
    import spark.implicits._
    val in = s"/tmp/graft-stream-state-${System.nanoTime()}"
    val ckpt = s"/tmp/graft-stream-stateck-${System.nanoTime()}"
    try {
      Transcripts.dataset(spark, 8L).toDF().write.mode("overwrite").parquet(in)
      val curated = StreamingCurate.curateStream(spark, in)
        .as[graft.model.CuratedTurn]
      val q = StreamingCurate.conversationState(spark, curated)
        .writeStream.format("memory").queryName("conv_state")
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val state = spark.table("conv_state").as[StreamingCurate.ConvUpdate]
        .collect().map(u => u.conv_id -> u).toMap
      val expected = Curate.curateDf(spark,
          spark.read.parquet(in))
        .groupBy("conv_id")
        .agg(org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)).as("n"),
          org.apache.spark.sql.functions.sum(org.apache.spark.sql.functions.when(
            org.apache.spark.sql.functions.col("keep"), 1L).otherwise(0L)).as("kept"))
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(state.keySet == expected.keySet)
      expected.foreach { case (c, (n, kept)) =>
        assert(state(c).turns == n, s"conv $c turns")
        assert(state(c).kept == kept, s"conv $c kept")
      }
    } finally {
      TableIO.deleteRecursive(Paths.get(in))
      TableIO.deleteRecursive(Paths.get(ckpt))
    }
  }
}
