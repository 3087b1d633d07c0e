package graft

import org.apache.spark.sql.functions._

import graft.tableio.{TableIO, VectorStore}

/** S8 store-mutation roundtrip (reference data_manager.py:296-390):
  * add / metadata-filter get / delete-by-filter / delete-by-ids /
  * reset / export — each mutation a copy-on-write rewrite of ONLY the
  * affected partitions.
  */
class VectorStoreSpec extends SparkTestBase {
  import spark.implicits._

  private def freshStore(name: String): (VectorStore, String) = {
    val base = s"/tmp/graft-vstore-$name"
    TableIO.deleteRecursive(java.nio.file.Paths.get(base))
    (new VectorStore(spark, base, nBuckets = 4), base)
  }

  private def rows(ids: Range, source: String) =
    ids.map(i => (s"doc-$i", s"chunk text $i", Array.fill(4)(i.toFloat), source))
      .toDF("id", "chunk", "embedding", "source")

  test("add/get roundtrip with metadata filter; second add appends") {
    val (vs, _) = freshStore("roundtrip")
    vs.add(rows(0 until 20, "web"))
    assert(vs.count() == 20)
    vs.add(rows(20 until 30, "pdf"))
    assert(vs.count() == 30)
    // metadata filter (collection.get where=)
    val pdf = vs.read().filter(col("source") === "pdf")
      .select("id").collect().map(_.getString(0)).toSet
    assert(pdf == (20 until 30).map(i => s"doc-$i").toSet)
  }

  test("a batch carrying the same id twice stores it once (within-batch dedup, ADVICE r3)") {
    val (vs, _) = freshStore("batchdup")
    val dup = rows(0 until 5, "web").unionByName(rows(0 until 5, "web"))
    vs.add(dup)
    assert(vs.count() == 5)
    assert(vs.read().groupBy("id").count().filter(col("count") > 1).count() == 0)
  }

  test("deleteWhere removes matches, returns count, rewrites only affected partitions") {
    val (vs, base) = freshStore("delete")
    vs.add(rows(0 until 40, "web"))
    // snapshot per-partition file mtimes before the delete
    val before = TableIO.donePartitions(base).map { p =>
      p -> java.nio.file.Files.getLastModifiedTime(TableIO.manifestPath(base, p)).toMillis
    }.toMap
    Thread.sleep(20)
    val deleted = vs.deleteWhere(col("id") === "doc-7" || col("id") === "doc-13")
    assert(deleted == 2L)
    assert(vs.count() == 38)
    assert(!vs.read().select("id").collect().map(_.getString(0)).toSet
      .exists(Set("doc-7", "doc-13")))
    // only the buckets holding doc-7 / doc-13 were rewritten
    val touched = TableIO.donePartitions(base).count { p =>
      java.nio.file.Files.getLastModifiedTime(TableIO.manifestPath(base, p)).toMillis !=
        before(p)
    }
    assert(touched >= 1 && touched <= 2, s"rewrote $touched partitions")
    // no-match delete rewrites nothing and returns 0
    assert(vs.deleteWhere(col("id") === "doc-does-not-exist") == 0L)
  }

  test("deleteByIds; emptying a partition drops it cleanly") {
    val (vs, _) = freshStore("byids")
    vs.add(rows(0 until 12, "web"))
    assert(vs.deleteByIds(Seq("doc-1", "doc-2", "doc-3")) == 3L)
    assert(vs.count() == 9)
    // delete everything → store reads as empty without schema errors
    assert(vs.deleteWhere(lit(true)) == 9L)
    assert(vs.isEmpty)
  }

  test("deleteWhere with a NULL-evaluating predicate keeps (and doesn't count) those rows") {
    // SQL three-valued logic: cast("abc") is NULL so cond is NULL —
    // a bare !cond would silently drop the row
    val (vs, _) = freshStore("nullpred")
    vs.add(Seq(("abc", "t", Array(0f), "web"), ("7", "t", Array(0f), "web"),
      ("14", "t", Array(0f), "web"), ("3", "t", Array(0f), "web"))
      .toDF("id", "chunk", "embedding", "source"))
    val deleted = vs.deleteWhere(expr("try_cast(id AS BIGINT)") % 7 === 0)
    assert(deleted == 2L) // "7" and "14"
    val left = vs.read().select("id").collect().map(_.getString(0)).toSet
    assert(left == Set("abc", "3"), s"got $left")
  }

  test("crash between partition move and manifest write: store stays consistent, delete re-run is a no-op") {
    val (vs, base) = freshStore("crash")
    vs.add(rows(0 until 16, "web"))
    // simulate the crash: rewrite one affected partition WITHOUT its
    // manifest update (TableIO's manifest write is the commit point)
    val full = TableIO.read(spark, base)
    val victim = full.filter(col("id") === "doc-5")
      .select(TableIO.PART_COL).head().getInt(0)
    val keep = TableIO.readPartition(spark, base, victim).filter(col("id") =!= "doc-5")
    TableIO.commitPartition(keep, base, victim) // moved into place...
    // ...crash here: manifest not rewritten. Partition is still listed
    // (old manifest), directory has the post-delete data → no dup, no
    // phantom row
    assert(vs.count() == 15)
    assert(!vs.read().select("id").collect().map(_.getString(0)).contains("doc-5"))
    // re-running the delete (the resume path) is a no-op
    assert(vs.deleteByIds(Seq("doc-5")) == 0L)
    assert(vs.count() == 15)
  }

  test("add resume is idempotent: re-applying a batch that already landed merges zero new rows (ADVICE r2)") {
    val (vs, _) = freshStore("addresume")
    vs.add(rows(0 until 10, "web"))
    vs.add(rows(10 until 14, "pdf"))
    // the crash window: commitPartition moved the merged data into
    // place but writeManifest never ran → the job reruns the SAME add.
    // With the id anti-join the redo unions zero new rows instead of
    // duplicating the batch.
    vs.add(rows(10 until 14, "pdf"))
    assert(vs.count() == 14)
    val ids = vs.read().select("id").collect().map(_.getString(0))
    assert(ids.length == ids.distinct.length, "duplicate ids after resumed add")
    // and genuinely new ids still append
    vs.add(rows(14 until 16, "pdf"))
    assert(vs.count() == 16)
  }

  test("exportJson streams via toLocalIterator across many partitions (no whole-store collect)") {
    val (vs, _) = freshStore("streamexport")
    vs.add(rows(0 until 200, "web")) // spread over all 4 buckets
    val out = vs.exportJson("/tmp/graft-vstore-export/stream.json", "big")
    val json = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(out)), java.nio.charset.StandardCharsets.UTF_8)
    assert(json.contains("\"total_documents\": 200"))
    // every row present exactly once, valid array separators
    (0 until 200).foreach(i => assert(json.contains(s""""doc-$i"""")))
    assert(json.split("\n").count(_.nonEmpty) == 202) // header + 200 rows + closer
  }

  test("reset drops the collection; export writes the reference JSON shape") {
    val (vs, _) = freshStore("reset")
    vs.add(rows(0 until 5, "web"))
    val out = vs.exportJson("/tmp/graft-vstore-export/export.json", "curated")
    val json = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(out)), java.nio.charset.StandardCharsets.UTF_8)
    assert(json.contains("\"collection_name\": \"curated\""))
    assert(json.contains("\"total_documents\": 5"))
    assert(json.contains("doc-3"))
    vs.reset()
    assert(vs.isEmpty)
    assert(vs.count() == 0L)
  }
}
