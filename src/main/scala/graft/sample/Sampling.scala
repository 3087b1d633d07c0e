package graft.sample

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.expressions.Window

import graft.dedup.Dedup

/** Deterministic corpus sampling — the domain-mixing step of a
  * training-data pipeline (choose how much of each source/domain/
  * language enters the training mix). Both variants key on
  * `mix(fnv(id))` rather than RNG state, so a sample is (a)
  * reproducible run-to-run, (b) stable under repartitioning — the
  * keep/drop decision is a pure row function, independent of
  * partition layout or visit order (Spark's own df.sample is neither
  * across different partitionings), and (c) replayable in plain SQL
  * for the DuckDB oracle (the same splitmix64/FNV chain the dedup
  * oracles already replicate).
  *
  * Scale shape: the FRACTION variant is map-only (a codegen'd filter,
  * zero shuffle — the right default at 10^12 rows). The QUOTA variant
  * needs exactly-k per stratum, so it pays one shuffle + per-stratum
  * sort (row_number window); a hot stratum sorts on one task — at
  * extreme skew prefer the fraction variant or pre-aggregate a
  * threshold key (documented trade, same as any exact top-k).
  */
object Sampling {

  /** The sampling key: splitmix64-mixed FNV of the id's string form —
    * uniform in [0, 2^64), compared UNSIGNED.
    */
  private def keyUdf = F.udf((s: String) => Dedup.wordHash64(s))

  /** Exactly `quota` rows per stratum: the quota smallest sampling
    * keys (ties broken by id), rank exposed as `sample_rank`.
    */
  def stratifiedQuota(
      df: DataFrame,
      strataCol: String,
      idCol: String,
      quota: Int
  ): DataFrame = {
    require(quota > 0)
    val w = Window.partitionBy(F.col(strataCol))
      .orderBy(F.col("__sk"), F.col(idCol))
    df.withColumn("__sk", keyUdf(F.col(idCol).cast("string")))
      .withColumn("sample_rank", F.row_number().over(w))
      .filter(F.col("sample_rank") <= quota)
      .drop("__sk")
  }

  /** Per-stratum Bernoulli-style sampling WITHOUT randomness: keep a
    * row iff its key < fraction · 2^64 (unsigned compare — exact, no
    * float in the decision). Map-only: no shuffle, no state; the same
    * row is kept in every run and on every partitioning.
    */
  def stratifiedFraction(
      df: DataFrame,
      strataCol: String,
      idCol: String,
      fractions: Map[String, Double],
      defaultFraction: Double
  ): DataFrame = {
    require((fractions.values ++ Seq(defaultFraction)).forall(f => f >= 0 && f <= 1))
    val thresholds: Map[String, Long] =
      fractions.view.mapValues(thresholdOf).toMap
    val dflt = thresholdOf(defaultFraction)
    val keepU = F.udf { (strata: String, idStr: String) =>
      val t = thresholds.getOrElse(strata, dflt)
      val k = Dedup.wordHash64(idStr)
      // t == -1 encodes fraction 1.0 (keep all); unsigned k < t otherwise
      t == -1L || java.lang.Long.compareUnsigned(k, t) < 0
    }
    df.filter(keepU(F.col(strataCol), F.col(idCol).cast("string")))
  }

  /** Greedy sequence packing — the training-shard assembly step:
    * within each stratum, walk rows in `orderCol` order and start a
    * new shard whenever adding the next row's tokens would exceed
    * `budgetTokens` (a single oversized row gets a shard of its own).
    * Returns (strataCol, orderCol, shard_idx, shard_pos) for a
    * join-back by the caller; shard identity = (stratum, shard_idx).
    *
    * Scale shape: packing is a sequential fold by definition, so it
    * parallelizes ACROSS strata, not within one — rows repartition by
    * stratum, sort within partitions, and fold in one pass
    * (mapPartitions, the documented exception for genuinely
    * per-partition-imperative logic). A single 10^12-row stratum would
    * serialize; shard at a finer stratum (source × day) in that case.
    */
  def packGreedy(
      df: DataFrame,
      strataCol: String,
      orderCol: String,
      tokenCol: String,
      budgetTokens: Long
  ): DataFrame = {
    require(budgetTokens > 0)
    val spark = df.sparkSession
    import spark.implicits._
    df.select(
        F.col(strataCol).cast("string").as("strata"),
        F.col(orderCol).cast("long").as("ord"),
        F.col(tokenCol).cast("long").as("toks"))
      .as[(String, Long, Long)]
      .repartition(F.col("strata"))
      .sortWithinPartitions("strata", "ord")
      .mapPartitions { it =>
        var cur: String = null
        var shard = 0L
        var acc = 0L
        var pos = -1
        it.map { case (s, o, t) =>
          if (s != cur) { cur = s; shard = 0L; acc = 0L; pos = -1 }
          else if (acc > 0 && acc + t > budgetTokens) { shard += 1; acc = 0L; pos = -1 }
          acc += t
          pos += 1
          (s, o, shard, pos)
        }
      }
      .toDF(strataCol, orderCol, "shard_idx", "shard_pos")
  }

  /** 2^-53 — scales a 53-bit key prefix into [0, 1) exactly (both the
    * shift result's Double conversion and the multiply by a power of
    * two are lossless), so the keep decision below is a pure Double
    * compare that SQL replays bit for bit.
    */
  val P53INV: Double = java.lang.Math.scalb(1.0, -53)

  /** The key as an exact dyadic fraction in [0, 1). */
  def keyFrac(idStr: String): Double =
    (Dedup.wordHash64(idStr) >>> 11).toDouble * P53INV

  /** Square-root temperature mixing (the multilingual-training
    * downsampling rule — sample source s proportionally to
    * sqrt(n_s), e.g. Conneau/Lample XLM 2019's α-smoothing at α=0.5):
    * big sources are downsampled hardest, small sources kept whole.
    * Given a total keep budget `totalFraction`·Σn, source s gets rate
    *   f_s = min(1, totalFraction · Σn · sqrt(n_s) / (Σ_t sqrt(n_t) · n_s)).
    * sqrt is IEEE-correctly-rounded (unlike exp/ln it is REQUIRED to
    * be exact by the standard), and Σ sqrt runs as a left fold in
    * sorted-source order — every arithmetic step is reproducible bit
    * for bit in the DuckDB oracle.
    *
    * The per-source count aggregate is map-side partial; the collect
    * is bounded by the number of SOURCES, not rows (the langid/BM25
    * driver-side-stats precedent).
    */
  def sqrtTemperatureRates(
      df: DataFrame,
      strataCol: String,
      totalFraction: Double
  ): Map[String, Double] = {
    require(totalFraction > 0 && totalFraction <= 1)
    val counts = df.groupBy(F.col(strataCol).cast("string").as("s"))
      .agg(F.count(F.lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
      .sortBy(_._1)
    val nTotal = counts.map(_._2).sum // integer, exact
    var sumW = 0.0
    counts.foreach { case (_, n) => sumW = sumW + math.sqrt(n.toDouble) }
    val target = totalFraction * nTotal.toDouble
    counts.map { case (s, n) =>
      s -> math.min(1.0, (target * math.sqrt(n.toDouble)) / (sumW * n.toDouble))
    }.toMap
  }

  /** Map-only deterministic sampling at per-stratum DOUBLE rates:
    * keep iff keyFrac(id) < rate. Unknown strata keep nothing.
    */
  def sampleByRates(
      df: DataFrame,
      strataCol: String,
      idCol: String,
      rates: Map[String, Double]
  ): DataFrame = {
    val keepU = F.udf { (strata: String, idStr: String) =>
      rates.get(strata).exists(r => keyFrac(idStr) < r)
    }
    df.filter(keepU(F.col(strataCol).cast("string"), F.col(idCol).cast("string")))
  }

  /** fraction → unsigned 2^64 threshold (exact integer arithmetic on
    * the BigDecimal fraction; 1.0 → the keep-all sentinel -1).
    */
  def thresholdOf(fraction: Double): Long = {
    if (fraction >= 1.0) return -1L
    val t = new java.math.BigDecimal(fraction)
      .multiply(new java.math.BigDecimal(java.math.BigInteger.ONE.shiftLeft(64)))
      .toBigInteger
    t.longValue() // wraps to the unsigned-comparable Long
  }

  /** Unsigned HUGEINT threshold string for the SQL oracle. */
  def thresholdSqlOf(fraction: Double): String =
    if (fraction >= 1.0) java.math.BigInteger.ONE.shiftLeft(64).toString
    else new java.math.BigDecimal(fraction)
      .multiply(new java.math.BigDecimal(java.math.BigInteger.ONE.shiftLeft(64)))
      .toBigInteger.toString
}
