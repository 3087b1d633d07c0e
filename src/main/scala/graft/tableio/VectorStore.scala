package graft.tableio

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{Column, DataFrame, SparkSession, functions => F}

/** Vector-store mutations (SURVEY.md §2.1 S7/S8) — rebuild of the
  * reference's ChromaDB collection lifecycle (data_manager.py):
  * add (:97-150), get/metadata-search (:296-319), delete by ids /
  * where-filter (:321-345), reset (:347-357), export (:359-390).
  *
  * Storage is the TableIO seam: rows hash-bucketed on `id` into
  * Hive-style partitions, every mutation a COPY-ON-WRITE rewrite of
  * ONLY the affected partitions with TableIO's atomic
  * staging→move→manifest commit protocol (the Iceberg
  * overwrite-by-partition analog). A delete whose filter matches
  * nothing rewrites nothing; a delete touching 3 of 10^5 partitions
  * rewrites 3 directories — that is the semantics that survives a
  * 10^12-row store.
  *
  * Rows may have any schema with a string `id` column (the reference
  * stores chunk text + embedding + metadata; the store doesn't care).
  */
final class VectorStore(spark: SparkSession, base: String, nBuckets: Int = 16) {

  private def bucketOf(c: Column): Column =
    F.pmod(F.xxhash64(c), F.lit(nBuckets)).cast("int")

  def isEmpty: Boolean = TableIO.donePartitions(base).isEmpty

  def read(): DataFrame = {
    require(!isEmpty, s"vector store at $base is empty")
    TableIO.read(spark, base).drop(TableIO.PART_COL)
  }

  def count(): Long = if (isEmpty) 0L else read().count()

  /** Append rows (upsert-free add, like collection.add): only the
    * partitions receiving new rows are rewritten.
    */
  def add(df: DataFrame): Unit = {
    require(df.columns.contains("id"), "VectorStore rows need a string `id` column")
    val batch = df.withColumn(TableIO.PART_COL, bucketOf(F.col("id"))).cache()
    try {
      val affected = batch.select(TableIO.PART_COL).distinct()
        .collect().map(_.getInt(0)).sorted
      val done = TableIO.donePartitions(base)
      affected.foreach { p =>
        val newRows = batch.filter(F.col(TableIO.PART_COL) === p).drop(TableIO.PART_COL)
        val merged =
          if (done.contains(p))
            TableIO.readPartition(spark, base, p).unionByName(newRows)
          else newRows
        commit(merged, p)
      }
    } finally batch.unpersist()
  }

  /** Delete rows matching `cond`; returns the deleted count. Only
    * partitions that actually contain a match are rewritten
    * (data_manager.py:321-345 delete-by-where).
    */
  def deleteWhere(cond: Column): Long = {
    if (isEmpty) return 0L
    val full = TableIO.read(spark, base)
    val affected = full.filter(cond).groupBy(TableIO.PART_COL)
      .agg(F.count(F.lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1))
    affected.foreach { case (p, _) =>
      // SQL three-valued logic: NOT(NULL) is NULL, so a bare !cond
      // would silently drop rows where cond evaluates to NULL (e.g. a
      // failed cast) without counting them — only TRUE deletes
      val keep = TableIO.readPartition(spark, base, p)
        .filter(!F.coalesce(cond, F.lit(false)))
      commit(keep, p)
    }
    affected.map(_._2).sum
  }

  /** Delete by explicit id list (data_manager.py:324-327). */
  def deleteByIds(ids: Seq[String]): Long =
    if (ids.isEmpty) 0L else deleteWhere(F.col("id").isInCollection(ids))

  /** Drop everything (reset_collection, data_manager.py:347-357). */
  def reset(): Unit = TableIO.deleteRecursive(Paths.get(base))

  /** Export to one JSON file (export_collection, data_manager.py:359-390:
    * {collection_name, total_documents, documents:[{id, document,
    * metadata}]}). Driver-side single-file write — the reference's
    * semantics; for large stores use [[exportDistributed]].
    */
  def exportJson(path: String, collectionName: String = "curated"): String = {
    val rows = if (isEmpty) Array.empty[String] else
      read().toJSON.collect()
    val json = new StringBuilder
    json ++= s"""{"collection_name": "$collectionName", "total_documents": ${rows.length}, "documents": [\n"""
    json ++= rows.mkString(",\n")
    json ++= "\n]}"
    val p = Paths.get(path)
    if (p.getParent != null) Files.createDirectories(p.getParent)
    Files.write(p, json.toString.getBytes(StandardCharsets.UTF_8))
    path
  }

  /** Distributed export: one JSON-lines directory, no driver collect. */
  def exportDistributed(path: String): Unit =
    read().write.mode("overwrite").json(path)

  private def commit(df: DataFrame, partId: Int): Unit = {
    val n = df.count()
    if (n == 0) {
      // fully-emptied partition: drop dir + manifest (an empty parquet
      // directory would break schema inference on later reads)
      TableIO.deleteRecursive(TableIO.partitionDir(base, partId))
      Files.deleteIfExists(TableIO.manifestPath(base, partId))
    } else {
      TableIO.commitPartition(df, base, partId)
      TableIO.writeManifest(base, partId, s"""{"part_id":$partId,"rows":$n}""")
    }
  }
}
