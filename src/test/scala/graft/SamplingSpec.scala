package graft

import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.sample.Sampling

class SamplingSpec extends SparkTestBase {
  import spark.implicits._

  private def docs(n: Int) =
    (0 until n).map(i => (i.toLong, s"src${i % 5}",
      s"document number $i talks about topic ${i % 7} in some detail"))
      .toDF("id", "source", "text")

  test("stratifiedQuota: exactly k per stratum, deterministic, partition-invariant") {
    val d = docs(100)
    val s1 = Sampling.stratifiedQuota(d, "source", "id", 7)
      .select("id", "source", "sample_rank").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2))).sortBy(_._1)
    assert(s1.groupBy(_._2).forall { case (_, rows) =>
      rows.length == 7 && rows.map(_._3).sorted.toSeq == (1 to 7)
    })
    // same rows regardless of the input's physical layout
    val s2 = Sampling.stratifiedQuota(d.repartition(13, col("text")), "source", "id", 7)
      .select("id", "source", "sample_rank").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2))).sortBy(_._1)
    assert(s1.toSeq == s2.toSeq)
    // ranks follow the documented key order: mix(fnv(id)) ascending
    s1.groupBy(_._2).foreach { case (_, rows) =>
      val byRank = rows.sortBy(_._3).map(t => Dedup.wordHash64(t._1.toString))
      assert(byRank.toSeq == byRank.sorted.toSeq)
    }
    // quota larger than the stratum keeps everything
    assert(Sampling.stratifiedQuota(d, "source", "id", 1000).count() == 100)
  }

  test("stratifiedFraction: exact threshold semantics, 0 and 1 edges, map-only plan") {
    val d = docs(400)
    val kept = Sampling.stratifiedFraction(d, "source", "id",
      Map("src0" -> 0.0, "src1" -> 1.0), 0.3)
    val rows = kept.select("id", "source").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(!rows.exists(_._2 == "src0"))
    assert(rows.count(_._2 == "src1") == 80) // 400/5 all kept
    // membership is exactly the unsigned-threshold predicate
    val t = Sampling.thresholdOf(0.3)
    rows.filter(r => r._2 != "src0" && r._2 != "src1").foreach { case (id, _) =>
      assert(java.lang.Long.compareUnsigned(Dedup.wordHash64(id.toString), t) < 0)
    }
    // deterministic + partition-invariant
    val again = Sampling.stratifiedFraction(d.repartition(17), "source", "id",
      Map("src0" -> 0.0, "src1" -> 1.0), 0.3)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(again == rows.map(_._1).toSet)
    // map-only: no Exchange anywhere in the physical plan
    val plan = kept.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"fraction sample shuffled:\n$plan")
  }

  test("packGreedy: per-stratum greedy shards match a sequential fold oracle") {
    // tokens chosen to exercise: exact fits, overflow closes, a single
    // oversized row (own shard), strata resets
    val rows = Seq(
      ("a", 0L, 40L), ("a", 1L, 60L),  // fills shard 0 exactly (budget 100)
      ("a", 2L, 10L), ("a", 3L, 95L),  // 10 opens shard 1; 95 overflows → shard 2
      ("a", 4L, 250L),                 // oversized → shard 3 alone
      ("a", 5L, 1L),                   // 250 already > budget → shard 4
      ("b", 0L, 30L), ("b", 1L, 30L), ("b", 2L, 30L), ("b", 3L, 30L))
      .toDF("source", "id", "toks")
    val got = Sampling.packGreedy(rows, "source", "id", "toks", 100L)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getInt(3)))).toMap
    // sequential oracle
    var expect = Map.empty[(String, Long), (Long, Int)]
    rows.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(t => (t._1, t._2))
      .foldLeft(("", 0L, 0L, -1)) { case ((cs, shard, acc, pos), (s, o, t)) =>
        val (s2, sh2, acc2, pos2) =
          if (s != cs) (s, 0L, t, 0)
          else if (acc > 0 && acc + t > 100L) (s, shard + 1, t, 0)
          else (s, shard, acc + t, pos + 1)
        expect += (s, o) -> ((sh2, pos2))
        (s2, sh2, acc2, pos2)
      }
    assert(got == expect)
    // spot-check the interesting assignments
    assert(got(("a", 3L)) == ((2L, 0)))
    assert(got(("a", 4L)) == ((3L, 0))) // oversized row isolated
    assert(got(("a", 5L)) == ((4L, 0)))
    assert(got(("b", 3L)) == ((1L, 0))) // 30·3=90 fits, 4th opens shard 1
    // partition-invariant
    val again = Sampling.packGreedy(rows.repartition(7, col("toks")),
      "source", "id", "toks", 100L)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getInt(3)))).toMap
    assert(again == got)
  }

  test("decontaminate: flags exactly the docs sharing n-grams with the benchmark") {
    // benchmark = 2 docs; plant one corpus doc embedding an exact
    // 8-gram from a benchmark doc, one with a 7-gram near miss
    val benchText = "alpha bravo charlie delta echo foxtrot golf hotel india juliett"
    val bench = Seq((900L, benchText)).toDF("bid", "btext")
    val corpus = Seq(
      (1L, "totally unrelated content about something else entirely here"),
      (2L, s"prefix words then alpha bravo charlie delta echo foxtrot golf hotel and more"), // 8-gram hit
      (3L, "alpha bravo charlie delta echo foxtrot golf stop"), // only 7 shared in a row
      (4L, benchText), // full copy
      (5L, "@@@@")) // token-less
      .toDF("id", "source_text")
    val out = Dedup.decontaminate(corpus, "id", "source_text", bench, "btext")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(out(1L) == ((0L, false)))
    assert(out(2L) == ((1L, true))) // exactly the one embedded 8-gram
    assert(out(3L) == ((0L, false))) // 7 words can't form a shared 8-gram
    assert(out(4L) == ((3L, true))) // 10 words → three 8-grams, all shared
    assert(out(5L) == ((0L, false)))
    // brute-force oracle over every doc: set-intersection of shingles
    val benchSet = Dedup.shingles(benchText, 8).toSet
    corpus.collect().foreach { r =>
      val expected = Dedup.shingles(r.getString(1), 8).toSet.intersect(benchSet).size
      assert(out(r.getLong(0))._1 == expected.toLong, s"doc ${r.getLong(0)}")
    }
  }
}
