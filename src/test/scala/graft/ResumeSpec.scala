package graft

import java.nio.file.{Files, Path, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.checkpoint.Resume
import graft.synth.Transcripts
import graft.tableio.TableIO

/** Kill-after-partition-k resume fixture (FIXTURES.md F5, SURVEY.md
  * §7.2 step 9): interrupted run + rerun must (a) not recompute
  * completed partitions and (b) produce output identical to an
  * uninterrupted run.
  */
class ResumeSpec extends SparkTestBase {

  private def freshDir(name: String): String = {
    val p = Paths.get(s"/tmp/graft-test-$name-${System.nanoTime()}")
    Files.createDirectories(p)
    p.toString
  }

  private def collectOutput(base: String): Seq[Seq[Any]] =
    TableIO.read(spark, base)
      .select("conv_id", "turn_idx", "keep", "drop_reason", "scrubbed_text", "part_id")
      .collect().map(_.toSeq).toSeq.sortBy(_.toString)

  test("kill after k partitions → resume completes without recompute; output byte-identical") {
    val in = freshDir("in")
    val outA = freshDir("outA")
    val outB = freshDir("outB")
    try {
      val turns = Transcripts.dataset(spark, 60L).toDF()
      TableIO.writeBucketedInput(turns, in, nBuckets = 6)
      assert(Resume.listInputPartitions(in).toSet == (0 until 6).toSet)

      // uninterrupted reference run
      val full = Resume.run(spark, in, outB)
      assert(full.processed.size == 6)

      // interrupted run: only 3 partitions, then "killed"
      val r1 = Resume.run(spark, in, outA, maxPartitions = 3)
      assert(r1.processed.size == 3)
      assert(TableIO.donePartitions(outA).size == 3)

      // record bytes of completed partition files
      def fileBytes(base: String, parts: Seq[Int]): Map[String, Long] =
        parts.flatMap { p =>
          val d = TableIO.partitionDir(base, p)
          import scala.jdk.CollectionConverters._
          Files.walk(d).iterator().asScala.filter(Files.isRegularFile(_))
            .map(f => f.toString -> Files.getLastModifiedTime(f).toMillis)
        }.toMap
      val before = fileBytes(outA, r1.processed)

      // resume
      val r2 = Resume.run(spark, in, outA)
      assert(r2.processed.size == 3)
      assert(r2.skipped.toSet == r1.processed.toSet)
      assert(TableIO.donePartitions(outA).size == 6)

      // completed partitions untouched (same files, same mtimes)
      val after = fileBytes(outA, r1.processed)
      assert(after == before, "completed partitions were recomputed")

      // final output identical to the uninterrupted run
      assert(collectOutput(outA) == collectOutput(outB))

      // manifests carry lineage + metrics
      val m = TableIO.readManifest(outA, r1.processed.head).get
      assert(m.contains("\"turns_seen\""))
      assert(m.contains("\"dropped_by_rule\""))
      assert(m.contains("\"scrub_hit_counts\""))
      assert(m.contains("\"input\""))
    } finally {
      Seq(in, outA, outB).foreach(d => TableIO.deleteRecursive(Paths.get(d)))
    }
  }

  test("crash between data commit and manifest → partition reprocessed, result still identical") {
    val in = freshDir("in2")
    val out = freshDir("out2")
    try {
      val turns = Transcripts.dataset(spark, 20L).toDF()
      TableIO.writeBucketedInput(turns, in, nBuckets = 3)
      Resume.run(spark, in, out, maxPartitions = 2)
      // simulate crash-after-commit-before-manifest on partition done last:
      val victim = TableIO.donePartitions(out).max
      Files.delete(TableIO.manifestPath(out, victim))
      assert(TableIO.donePartitions(out).size == 1)
      val r = Resume.run(spark, in, out, concurrency = 3)
      assert(r.processed.contains(victim))
      assert(TableIO.donePartitions(out).size == 3)
      val rows = collectOutput(out)
      val ref = freshDir("out2ref")
      Resume.run(spark, in, ref, concurrency = 3) // concurrent == sequential output
      assert(rows == collectOutput(ref))
      TableIO.deleteRecursive(Paths.get(ref))
    } finally {
      Seq(in, out).foreach(d => TableIO.deleteRecursive(Paths.get(d)))
    }
  }
}
