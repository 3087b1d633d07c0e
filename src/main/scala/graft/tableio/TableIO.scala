package graft.tableio

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption, StandardOpenOption}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession, functions => F}

/** Iceberg-shaped table seam (SURVEY.md §1.2): Hive-style partitioned
  * Parquet with the Iceberg semantics the engine needs — partition
  * columns, atomic snapshot-by-directory-swap commits, and a
  * per-partition manifest of lineage + metrics rows. No Iceberg
  * runtime jar ships in the offline image (/opt/spark/jars verified),
  * so a real Iceberg catalog is a drop-in behind this same interface.
  *
  * Layout:
  *   base/part_id=K/&lt;parquet files&gt;  committed partition data
  *   base/_staging/part_id=K/...       in-flight write (never read)
  *   base/_manifest/part-K.json     one JSON object per committed
  *                                  partition: lineage + metrics
  *
  * Commit protocol per partition: write to _staging → atomic directory
  * move into place → append manifest file. A crash between move and
  * manifest leaves the partition NOT in the manifest; the resume loop
  * simply reprocesses it (output is deterministic → byte-identical).
  */
object TableIO {

  val PART_COL = "part_id"

  def partitionDir(base: String, partId: Int): Path =
    Paths.get(base, s"$PART_COL=$partId")
  def manifestPath(base: String, partId: Int): Path =
    Paths.get(base, "_manifest", s"part-$partId.json")

  /** Partitions already committed (manifest present). */
  def donePartitions(base: String): Set[Int] = {
    val dir = Paths.get(base, "_manifest")
    if (!Files.isDirectory(dir)) return Set.empty
    Files.list(dir).iterator().asScala
      .map(_.getFileName.toString)
      .collect { case s if s.startsWith("part-") && s.endsWith(".json") =>
        s.stripPrefix("part-").stripSuffix(".json").toInt
      }
      .toSet
  }

  /** Write one partition's rows atomically; returns the committed dir.
    * `df` must already be in the desired row order (caller applies
    * Curate.saltedForWrite).
    */
  def commitPartition(df: DataFrame, base: String, partId: Int): Path = {
    val staging = Paths.get(base, "_staging", s"$PART_COL=$partId")
    val target = partitionDir(base, partId)
    deleteRecursive(staging)
    df.write.mode("overwrite").parquet(staging.toString)
    deleteRecursive(target)
    Files.createDirectories(target.getParent)
    Files.move(staging, target, StandardCopyOption.ATOMIC_MOVE)
    target
  }

  /** Append the manifest entry LAST — this is the commit point. */
  def writeManifest(base: String, partId: Int, json: String): Unit = {
    val p = manifestPath(base, partId)
    Files.createDirectories(p.getParent)
    val tmp = p.resolveSibling(p.getFileName.toString + ".tmp")
    Files.write(tmp, json.getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
    Files.move(tmp, p, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  def readManifest(base: String, partId: Int): Option[String] = {
    val p = manifestPath(base, partId)
    if (Files.exists(p)) Some(new String(Files.readAllBytes(p), StandardCharsets.UTF_8))
    else None
  }

  /** Read the committed table (all partitions or a pruned subset —
    * `basePath` keeps the partition column in the schema, and a
    * partition filter prunes directories, never touching other files).
    */
  def read(spark: SparkSession, base: String): DataFrame = {
    val parts = donePartitions(base).toSeq.sorted
    require(parts.nonEmpty,
      s"no committed partitions under $base (manifest empty — run the job first)")
    spark.read.option("basePath", base)
      .parquet(parts.map(p => partitionDir(base, p).toString): _*)
  }

  def readPartition(spark: SparkSession, base: String, partId: Int): DataFrame =
    spark.read.parquet(partitionDir(base, partId).toString)

  /** Materialize an input table Hive-partitioned by the conv_id hash
    * bucket — the Iceberg `bucket(N, conv_id)` partition-spec analog.
    * Downstream per-partition reads are genuine directory prunes.
    */
  def writeBucketedInput(df: DataFrame, base: String, nBuckets: Int): Unit =
    df.withColumn(PART_COL, F.pmod(F.xxhash64(F.col("conv_id")), F.lit(nBuckets)).cast("int"))
      .write.mode("overwrite").partitionBy(PART_COL).parquet(base)

  def deleteRecursive(p: Path): Unit = {
    if (Files.exists(p)) {
      Files.walk(p).sorted(java.util.Comparator.reverseOrder[Path]())
        .iterator().asScala.foreach(Files.delete)
    }
  }
}
