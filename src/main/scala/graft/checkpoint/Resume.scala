package graft.checkpoint

import org.apache.spark.sql.{DataFrame, Row, SparkSession, functions => F}

import graft.pipeline.Curate
import graft.rules.QualityRules
import graft.tableio.TableIO

/** Per-partition checkpointed pipeline runner (SURVEY.md §7.2 step 9;
  * FIXTURES.md F5). A killed job resumes without recomputing completed
  * partitions: the driver loops over input partitions not yet in the
  * output manifest; each partition is read with directory pruning,
  * curated, committed atomically, and recorded with lineage + metrics
  * (turns seen / dropped-by-rule / scrub-hit counts — the rebuild of
  * correction_stats, smart_corrector.py:90-96,252-260).
  *
  * Scale notes: the loop is over PARTITIONS (thousands at 10^12 turns),
  * each processed with full cluster parallelism; per-partition work is
  * map-only (no shuffle) + one tiny metrics aggregate. `maxPartitions`
  * lets tests simulate a kill after k partitions.
  */
object Resume {

  final case class RunResult(processed: Seq[Int], skipped: Seq[Int])

  /** @param concurrency number of partitions in flight at once. Spark's
    *   scheduler is thread-safe: each worker thread submits its
    *   partition's jobs independently, keeping the cluster busy while
    *   another partition is in its (cheap, driver-side) commit step.
    *   Each partition still commits atomically and independently.
    */
  def run(
      spark: SparkSession,
      inputBase: String,
      outputBase: String,
      cfg: QualityRules.Config = QualityRules.defaultConfig,
      models: Curate.Models = Curate.defaultModels,
      writePartitions: Int = 8,
      maxPartitions: Int = Int.MaxValue,
      concurrency: Int = 1
  ): RunResult = {
    val inputParts = listInputPartitions(inputBase)
    val done = TableIO.donePartitions(outputBase)
    val todo = inputParts.filterNot(done.contains).sorted.take(maxPartitions)
    val processed = new java.util.concurrent.ConcurrentLinkedQueue[Int]()

    def processOne(p: Int): Unit = {
      val turns = TableIO.readPartition(spark, inputBase, p)
      val curated = Curate.curateDf(spark, turns, cfg, models)
      val ordered = Curate.saltedForWrite(curated, writePartitions)
      val dir = TableIO.commitPartition(ordered, outputBase, p)
      // metrics from the committed files (also validates the write)
      val m = Curate.metrics(spark.read.parquet(dir.toString), p).head()
      TableIO.writeManifest(outputBase, p, manifestJson(p, inputBase, m))
      processed.add(p)
    }

    if (concurrency <= 1) todo.foreach(processOne)
    else {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(concurrency)
      try {
        val futures = todo.map(p =>
          pool.submit(new Runnable { def run(): Unit = processOne(p) }))
        futures.foreach(_.get()) // propagate first failure
      } finally pool.shutdown()
    }
    import scala.jdk.CollectionConverters._
    RunResult(processed.asScala.toSeq.sorted, done.toSeq.sorted)
  }

  def listInputPartitions(inputBase: String): Seq[Int] = {
    val d = java.nio.file.Paths.get(inputBase)
    if (!java.nio.file.Files.isDirectory(d)) return Nil
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.list(d).iterator().asScala
      .map(_.getFileName.toString)
      .collect { case s if s.startsWith(s"${TableIO.PART_COL}=") =>
        s.stripPrefix(s"${TableIO.PART_COL}=").toInt
      }
      .toSeq
  }

  private def jstr(s: String) =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""

  private def jmap(m: Map[String, Long]) =
    m.toSeq.sortBy(_._1)
      .map { case (k, v) => s"${jstr(k)}: $v" }.mkString("{", ", ", "}")

  /** Lineage + metrics manifest row (deterministic fields only). */
  def manifestJson(partId: Int, inputBase: String, m: Row): String = {
    val byRule = Option(m.getAs[Map[String, Long]]("dropped_by_rule")).getOrElse(Map.empty)
    val scrub = Option(m.getAs[Map[String, Long]]("scrub_hit_counts")).getOrElse(Map.empty)
    s"""{"part_id": $partId, "input": ${jstr(s"$inputBase/${TableIO.PART_COL}=$partId")}, """ +
      s""""turns_seen": ${m.getAs[Long]("turns_seen")}, """ +
      s""""turns_kept": ${m.getAs[Long]("turns_kept")}, """ +
      s""""turns_dropped": ${m.getAs[Long]("turns_dropped")}, """ +
      s""""dropped_by_rule": ${jmap(byRule)}, """ +
      s""""scrub_hit_counts": ${jmap(scrub)}}"""
  }
}
