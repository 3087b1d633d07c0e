package graft.dedup

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.expressions.Window

import graft.util.Hash.mix

/** Deduplication operator family for large-scale training-data
  * pipelines. Algorithms from the public literature: MinHash resemblance
  * sketches (Broder, "On the resemblance and containment of documents",
  * SEQUENCES 1997) with banded LSH (Leskovec/Rajaraman/Ullman, Mining of
  * Massive Datasets ch.3), SimHash (Charikar, "Similarity estimation
  * techniques from rounding algorithms", STOC 2002) with the Hamming
  * pigeonhole trick (Manku/Jain/Das Sarma, "Detecting near-duplicates
  * for web crawling", WWW 2007). The reference seeds only EXACT dedup
  * (md5 content hash + first-wins, web_scraper.py:154,186-196); the
  * near-dup operators (MinHash+LSH, SimHash, n-gram Jaccard, embedding
  * cosine) are the standard scale path (shingle → sketch → band →
  * bucket-join) so the candidate join is an equi-join on (band,
  * signature) — never an O(n²) cross product.
  *
  * Tokenization is Unicode-aware (`\p{L}\p{N}_` word chars) — CJK text
  * shingles correctly. Rows with NO tokens (symbol-only/empty text)
  * produce no sketch and are excluded from near-dup candidate
  * generation (they'd otherwise all collide on the empty sketch).
  *
  * All randomness is seeded constants — results are deterministic
  * across runs and partitionings.
  */
object Dedup extends Serializable {

  /** Unicode word tokens, lowercased. */
  def tokens(text: String): Array[String] = {
    if (text == null) return Array.empty
    text.toLowerCase.split("[^\\p{L}\\p{N}_]+").filter(_.nonEmpty)
  }

  /** 64-bit word hash (FNV-1a over chars, then mixed). String.hashCode
    * is 32 bits — at web-scale vocabularies word collisions are
    * expected (birthday bound ~1 per 100k words) and would silently
    * merge distinct shingles; 64 bits pushes that out past 10^9.
    */
  @inline def wordHash64(w: String): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < w.length) { h = (h ^ w.charAt(i)) * 0x100000001b3L; i += 1 }
    mix(h)
  }

  /** SQL predicate: row has at least one word token (sketchable). */
  def hasTokensCol(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    c.isNotNull && c.rlike("[\\p{L}\\p{N}_]")

  /** Exact dedup, deterministic first-wins (SURVEY.md §2.2 P9): the
    * reference keeps the FIRST doc per content hash (order-dependent
    * set check, web_scraper.py:186-196); Spark's dropDuplicates keeps
    * an arbitrary row, so we keep the row with the minimum `orderCol`
    * per content hash. `orderCol` must be unique per row (a doc id) —
    * that is also what makes "first" well-defined at all.
    *
    * r6: two-phase min + join-back (the repo-wide first-occurrence
    * shape) instead of `row_number() over (partition by md5(text))` —
    * the window sorted every member of a hot content group (one
    * boilerplate doc repeated 10^7 times at corpus scale) on ONE task,
    * the exact hazard the line/span/minhash paths already engineered
    * out. The map-side partial min ships one row per distinct hash;
    * the join-back build side is one row per hash (shuffle_hash, no
    * sort) and AQE skew-split applies.
    */
  def exactDedup(df: DataFrame, textCol: String, orderCol: String): DataFrame = {
    // NULL text hashes to a sentinel (not valid hex, so it cannot
    // collide with a real md5): the r5 window kept one representative
    // of the NULL-text group, and a plain equi-join on md5(NULL)=NULL
    // would silently drop ALL such rows instead.
    val withH = df.withColumn(
      "__h", F.coalesce(F.md5(F.col(textCol)), F.lit("__null_text__")))
    val firsts = withH.groupBy("__h")
      .agg(F.min(F.col(orderCol)).as("__first"))
    withH.join(firsts.hint("shuffle_hash"), Seq("__h"))
      .filter(F.col(orderCol) === F.col("__first"))
      .drop("__h", "__first")
  }

  /** Word n-gram shingle set: lowercased, distinct, hashed to Long,
    * SORTED ascending (jaccard's merge-intersection requires it).
    *
    * r6: each word's 64-bit hash is computed ONCE (the n-gram fold used
    * to call wordHash64 — an O(len) char walk — n times per word); the
    * fold over precomputed hashes is value-identical by construction.
    */
  def shingles(text: String, n: Int): Array[Long] = {
    val words = tokens(text)
    if (words.isEmpty) return Array.emptyLongArray
    val wh = new Array[Long](words.length)
    var p = 0
    while (p < words.length) { wh(p) = wordHash64(words(p)); p += 1 }
    if (words.length < n) {
      return wh.distinct.sorted
    }
    val out = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i + n <= words.length) {
      var h = 0x2545f4914f6cdd1dL
      var j = i
      while (j < i + n) { h = mix(h ^ wh(j)); j += 1 }
      out.add(h)
      i += 1
    }
    val arr = new Array[Long](out.size)
    val it = out.iterator(); var k = 0
    while (it.hasNext) { arr(k) = it.next(); k += 1 }
    arr
  }

  /** MinHash signature: numHashes permutations h_i(x) = mix(x ^ seed_i).
    * r6: the permutation seeds mix(f ^ const) depend only on f — hoisted
    * out of the |sh|×numHashes hot loop (one mix per cell instead of
    * two); values identical by construction.
    */
  def minhashSignature(sh: Array[Long], numHashes: Int): Array[Long] = {
    val seeds = permSeeds(numHashes)
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < sh.length) {
      var f = 0
      while (f < numHashes) {
        val h = mix(sh(i) ^ seeds(f))
        if (h < sig(f)) sig(f) = h
        f += 1
      }
      i += 1
    }
    sig
  }

  // deterministic constants (NOT data/result caching): the f-th MinHash
  // permutation seed, shared across all rows of a task
  private val permSeedCache =
    new java.util.concurrent.ConcurrentHashMap[Int, Array[Long]]()
  private def permSeeds(numHashes: Int): Array[Long] =
    permSeedCache.computeIfAbsent(numHashes,
      n => Array.tabulate(n)(f => mix(f.toLong + 0x100001b3L)))

  /** Exact Jaccard over two SORTED hash arrays. Empty sets share no
    * content → 0.0 (dedup semantics: token-less rows never match).
    */
  def jaccard(a: Array[Long], b: Array[Long]): Double = {
    if (a.isEmpty || b.isEmpty) return 0.0
    var i = 0; var j = 0; var inter = 0
    while (i < a.length && j < b.length) {
      if (a(i) == b(j)) { inter += 1; i += 1; j += 1 }
      else if (a(i) < b(j)) i += 1
      else j += 1
    }
    inter.toDouble / (a.length + b.length - inter)
  }

  /** One band-hash fold — the SINGLE definition all banded variants
    * share (minhash pairs / clusters / conversation-level).
    */
  def bandHashes(sig: IndexedSeq[Long], bands: Int, rowsPerBand: Int): Seq[(Int, Long)] =
    (0 until bands).map { b =>
      var h = 0x9e3779b97f4a7c15L
      var r = 0
      while (r < rowsPerBand) { h = mix(h ^ sig(b * rowsPerBand + r)); r += 1 }
      (b, h)
    }

  /** MinHash + LSH near-duplicate pairs (ids a < b, verified Jaccard ≥
    * threshold). Plan shape: per-row sketch (map-only) → explode into
    * `bands` ID-ONLY rows → shuffle on (band, band_hash) equi-join →
    * candidate-pair dedup on bare (id_a, id_b) → re-join the two
    * sketch columns BY ID → exact-Jaccard verify. The shingle arrays
    * never ride a per-candidate exchange: the band join and the pair
    * dedup shuffle only ids (a hot LSH bucket of size g otherwise
    * shuffles O(g²) full sketches), and each sketch crosses exactly one
    * exchange per side for the verify join — O(n), not O(candidates).
    * Guarded by PlanShapeSpec ("no array column in any pair exchange").
    * Token-less rows are excluded (no sketch → no candidates).
    *
    * The lazy DAG references `sketched` from four branches (band
    * self-join sides + the two verify joins); a bare projection would
    * make Spark re-run the shingle UDF per branch (4× the shingling
    * cost — the dominant per-row work). The sketch is therefore pinned
    * behind one `repartition(id)` Exchange: all four branches share the
    * identical exchange subtree, Catalyst's ReuseExchange plans ONE
    * shuffle, and the UDF runs exactly once per row (asserted via
    * `sketchCounter` in DedupSpec). One extra O(n) shuffle of compact
    * (id, 64-long sketch) rows buys 3 fewer full-corpus shingling
    * passes — the right trade at any scale where text dominates.
    *
    * @param sketchCounter test hook: incremented once per shingle-UDF
    *   invocation when set (proves single evaluation).
    */
  def minhashNearDups(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int = 3,
      numHashes: Int = 64,
      bands: Int = 16,
      threshold: Double = 0.8,
      sketchCounter: Option[org.apache.spark.util.LongAccumulator] = None
  ): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    val shU = F.udf { (t: String) =>
      sketchCounter.foreach(_.add(1L))
      shingles(t, shingleSize)
    }
    val bandU = F.udf((sh: Array[Long]) =>
      bandHashes(scala.collection.immutable.ArraySeq.unsafeWrapArray(
        minhashSignature(sh, numHashes)), bands, rows))
    val jacU = F.udf((a: Array[Long], b: Array[Long]) => jaccard(a, b))

    // token-less rows are filtered on the CHEAP column predicate BEFORE
    // the UDF (same condition — shingles() is empty iff no word char):
    // a filter on the aliased UDF output would be predicate-pushed
    // below the projection and evaluate the UDF twice per row
    val sketched = df
      .filter(hasTokensCol(F.col(textCol)))
      .select(F.col(idCol).as("id"), shU(F.col(textCol)).as("sh"))
      .repartition(F.col("id"))
    val banded = sketched
      .select(F.col("id"), F.explode(bandU(F.col("sh"))).as("b"))
      .select(F.col("id"), F.col("b._1").as("band"), F.col("b._2").as("bh"))
    val pairs = banded.select(F.col("band"), F.col("bh"), F.col("id").as("id_a"))
      .join(banded.select(F.col("band"), F.col("bh"), F.col("id").as("id_b")),
        Seq("band", "bh"))
      .filter(F.col("id_a") < F.col("id_b"))
      .select("id_a", "id_b")
      .dropDuplicates("id_a", "id_b")
    pairs
      .join(sketched.select(F.col("id").as("id_a"), F.col("sh").as("sh_a")), Seq("id_a"))
      .join(sketched.select(F.col("id").as("id_b"), F.col("sh").as("sh_b")), Seq("id_b"))
      .withColumn("jaccard", jacU(F.col("sh_a"), F.col("sh_b")))
      .filter(F.col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** Scalable MinHash dedup: instead of emitting all O(group²)
    * candidate pairs, each row is assigned the MIN id over all its LSH
    * buckets as its cluster representative — per-bucket work is
    * O(group), the shape that survives 10^12 rows with large duplicate
    * groups (e.g. boilerplate repeated millions of times). Output:
    * (id, rep_id) for EVERY input row; token-less rows are their own
    * representative. Rows with id == rep_id are the survivors.
    * One-pass bucket-min approximation: transitive chains longer than
    * one hop keep their bucket-local representative (iterate to a fixed
    * point for full connected components — rarely needed for dedup).
    */
  def minhashClusters(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int = 3,
      numHashes: Int = 64,
      bands: Int = 16
  ): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    // one UDF: shingle → signature → band hashes, with the empty-sketch
    // marker inline (an empty Seq) so token-less rows need no second
    // evaluation of the sketch over a separate DAG branch
    val bandU = F.udf { (t: String) =>
      val sh = shingles(t, shingleSize)
      if (sh.isEmpty) Seq.empty[(Int, Long)]
      else bandHashes(scala.collection.immutable.ArraySeq.unsafeWrapArray(
        minhashSignature(sh, numHashes)), bands, rows)
    }
    // sketch computed ONCE: the pinned rows are (id, band, bh) —
    // ids + ints only, never text — so the bucket-min aggregate and
    // the join-back below are two cheap jobs over pinned rows, not two
    // sketch passes (same pin technique as ngramNearDupsPrefix)
    val banded = df
      .select(F.col(idCol).as("id"), bandU(F.col(textCol)).as("bs"))
      .select(F.col("id"), F.explode_outer(F.col("bs")).as("b"))
      .select(F.col("id"), F.col("b._1").as("band"), F.col("b._2").as("bh"))
      .localCheckpoint(true)
    // TWO-PHASE bucket min (not a window): map-side partial min bounds
    // per-task state to #distinct buckets per map task, and the reduce
    // side of the aggregate sees at most one row per (bucket, map
    // task) — no task ever materializes O(group) rows, where the
    // previous `min(id) over (partition by band, bh)` sorted every
    // member of a hot bucket (boilerplate repeated 10^7 times at
    // 100 TB) on ONE task. The join-back keys a hot bucket to one
    // partition too, but its build side is exactly one row per bucket
    // (shuffle_hash, no sort) and AQE's skew-join split applies —
    // neither holds group-sized state. Bucket-min VALUES are unchanged,
    // so the bit-exact DuckDB oracle (OracleSql.minhashClustersSql)
    // is unaffected. Token-less rows (null band from explode_outer)
    // fall into per-id singleton buckets.
    val keyed = banded
      .withColumn("gband", F.coalesce(F.col("band"), F.lit(-1)))
      .withColumn("gkey",
        F.when(F.col("band").isNull, F.col("id").cast("string"))
          .otherwise(F.col("bh").cast("string")))
      .select("id", "gband", "gkey")
    val mins = keyed.groupBy("gband", "gkey").agg(F.min("id").as("bucket_rep"))
    keyed.join(mins.hint("shuffle_hash"), Seq("gband", "gkey"))
      .groupBy("id").agg(F.min("bucket_rep").as("rep_id"))
  }

  /** CONVERSATION-level near-duplicates — the true analog of the
    * reference's document-level dedup (web_scraper.py:186-196; conv =
    * doc, SURVEY.md §1.2). The group signature comes from the custom
    * [[graft.functions.MinHashAgg]] TypedImperativeAggregate
    * (element-wise min across turns = MinHash of the union shingle
    * set), so the whole operator is: one hash aggregate on conv_id →
    * band equi-join → signature-agreement Jaccard estimate. No
    * conversation text is ever collected into one place. Conversations
    * with no sketchable turns are excluded.
    */
  def convNearDups(
      turns: DataFrame,
      idCol: String = "conv_id",
      textCol: String = "text",
      numHashes: Int = 64,
      bands: Int = 16,
      threshold: Double = 0.8
  ): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    // pinned: the sketch table feeds the banding AND both sig
    // re-attach joins below; one row per conversation (id + 64 longs),
    // so the materialization is tiny while saving two re-aggregations
    // of every turn's shingles
    val sigs = turns.groupBy(F.col(idCol).as("id"))
      .agg(graft.functions.MinHashAgg.minhash_agg(F.col(textCol), numHashes).as("sig"))
      .filter(F.array_min(F.col("sig")) =!= Long.MaxValue) // some turn had tokens
      .localCheckpoint(true)
    val bandU = F.udf((sig: Seq[Long]) => bandHashes(sig.toIndexedSeq, bands, rows))
    // estimated Jaccard = fraction of agreeing signature components
    val estU = F.udf { (a: Seq[Long], b: Seq[Long]) =>
      var eq = 0
      var i = 0
      while (i < a.length) { if (a(i) == b(i)) eq += 1; i += 1 }
      eq.toDouble / a.length
    }
    // de-payloaded band join (r6, the minhashNearDups/embeddingNearDups
    // shape): only (band, bh, id) scalars reach the band exchange and
    // the pair dedup — previously each banded row carried its 64-long
    // signature through both (≈1 KB/row), and the pair dedup had to
    // first() those arrays, a non-hashable buffer type that forced a
    // SortAggregate over all candidate pairs. Bare (id_a, id_b) pairs
    // dedup as a pure HashAggregate; signatures re-attach by id
    // afterwards, touching only surviving pairs.
    val banded = sigs
      .select(F.col("id"), F.explode(bandU(F.col("sig"))).as("b"))
      .select(F.col("id"), F.col("b._1").as("band"), F.col("b._2").as("bh"))
    val pairs = banded.select(F.col("band"), F.col("bh"), F.col("id").as("id_a"))
      .join(banded.select(F.col("band"), F.col("bh"), F.col("id").as("id_b")),
        Seq("band", "bh"))
      .filter(F.col("id_a") < F.col("id_b"))
      .select("id_a", "id_b")
      .dropDuplicates("id_a", "id_b")
    pairs
      .join(sigs.select(F.col("id").as("id_a"), F.col("sig").as("sig_a")), Seq("id_a"))
      .join(sigs.select(F.col("id").as("id_b"), F.col("sig").as("sig_b")), Seq("id_b"))
      .withColumn("est_jaccard", estU(F.col("sig_a"), F.col("sig_b")))
      .filter(F.col("est_jaccard") >= threshold)
      .select("id_a", "id_b", "est_jaccard")
  }

  /** 64-bit SimHash over word unigrams (Unicode tokens). */
  def simhash(text: String): Long = {
    val counts = new Array[Int](64)
    tokens(text).foreach { w =>
      val h = wordHash64(w)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (counts(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  /** SimHash near-dup pairs with Hamming distance ≤ maxHamming (< 4):
    * 4-band pigeonhole — any pair within Hamming 3 shares at least one
    * exact 16-bit band, so candidates come from 4 equi-join buckets.
    *
    * Scale guard: identical signatures (exact/near-exact duplicate
    * text, e.g. boilerplate repeated millions of times) are collapsed
    * to their min-id representative BEFORE banding — otherwise a group
    * of size g emits O(g²) candidate rows. Output: intra-group dups as
    * (rep, member, 0) plus inter-group pairs between representatives.
    * Token-less rows are excluded.
    */
  def simhashNearDups(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int = 3
  ): DataFrame = {
    val shU = F.udf((t: String) => simhash(t))
    val hamU = F.udf((a: Long, b: Long) => java.lang.Long.bitCount(a ^ b))
    // sketch-once discipline (the minhashClusters r5 lesson, applied to
    // the LAST window-over-a-hot-key on a dedup path): the rep collapse
    // was `min(id) OVER (PARTITION BY sig)` — identical boilerplate
    // repeated 10^7 times shares ONE sig and sorts on ONE task. Now a
    // map-side-partial groupBy(sig).min(id) (one row per distinct sig
    // crosses the exchange) + a shuffle_hash join-back over the eagerly
    // pinned (id, sig) scalars — the UDF still runs exactly once per
    // row (the pin, not Exchange reuse, guarantees it), no sort
    // anywhere before the output ORDER BY, and AQE skew-split applies
    // to the join. Bucket-min VALUES are unchanged, so the bit-exact
    // DuckDB oracle (OracleSql.simhashSql) is unaffected.
    val sigs = df
      .filter(hasTokensCol(F.col(textCol)))
      .select(F.col(idCol).as("id"), shU(F.col(textCol)).as("sig"))
      .localCheckpoint(true)
    val reps = sigs.groupBy("sig").agg(F.min("id").as("rep"))
    val withRep = sigs.join(reps.hint("shuffle_hash"), Seq("sig"))
    // intra-group: every non-rep member pairs with its rep at distance 0
    val intra = withRep.filter(F.col("id") =!= F.col("rep"))
      .select(F.col("rep").as("id_a"), F.col("id").as("id_b"),
        F.lit(0).as("hamming"))
    val groups = reps.select(F.col("rep"), F.col("sig"))
    val banded = groups.select(
      F.col("rep"), F.col("sig"),
      F.explode(F.array((0 until 4).map(b =>
        F.struct(F.lit(b).as("band"),
          F.shiftright(F.col("sig"), b * 16).bitwiseAND(F.lit(0xffffL)).as("bh"))): _*))
        .as("b"))
      .select(F.col("rep"), F.col("sig"), F.col("b.band"), F.col("b.bh"))
    val l = banded.select(F.col("band"), F.col("bh"), F.col("rep").as("id_a"), F.col("sig").as("sig_a"))
    val r = banded.select(F.col("band"), F.col("bh"), F.col("rep").as("id_b"), F.col("sig").as("sig_b"))
    val inter = l.join(r, Seq("band", "bh"))
      .filter(F.col("id_a") < F.col("id_b"))
      // hamming filter BEFORE the dedup shuffle: far pairs (the vast
      // majority of band collisions) never reach the exchange
      .withColumn("hamming", hamU(F.col("sig_a"), F.col("sig_b")))
      .filter(F.col("hamming") <= maxHamming)
      .dropDuplicates("id_a", "id_b")
      .select("id_a", "id_b", "hamming")
    intra.unionByName(inter)
  }

  /** Exact n-gram Jaccard similarity for all pairs sharing ≥1 n-gram:
    * fully relational (explode → equi-join on gram → group) — the
    * shape that survives scale because the join key is the gram, with
    * a frequency cap to drop degenerate stop-grams. Set sizes are
    * computed over the SAME capped gram universe as the intersection,
    * so identical documents always score 1.0 even when they contain
    * capped grams.
    *
    * COVERAGE CAVEAT (not just a cost tradeoff): a pair whose ONLY
    * shared grams all exceed `maxGramFreq` is LOST, not merely
    * expensive — and a gram at the cap still emits O(cap²) candidate
    * rows. Use [[ngramDroppedGrams]] to quantify the loss on a corpus
    * before trusting the recall; prefer [[minhashClusters]] at scale.
    */
  def ngramJaccardPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3,
      threshold: Double = 0.5,
      maxGramFreq: Int = 1000
  ): DataFrame = {
    val shU = F.udf((t: String) => shingles(t, n))
    val grams = df
      .select(F.col(idCol).as("id"), F.explode(shU(F.col(textCol))).as("g"))
    val filtered = grams.join(
      grams.groupBy("g").agg(F.count(F.lit(1)).as("gf")).filter(F.col("gf") <= maxGramFreq),
      Seq("g"))
    val sizes = filtered.groupBy("id").agg(F.count(F.lit(1)).as("sz"))
    val pairs = filtered.select(F.col("g"), F.col("id").as("id_a"))
      .join(filtered.select(F.col("g"), F.col("id").as("id_b")), Seq("g"))
      .filter(F.col("id_a") < F.col("id_b"))
      .groupBy("id_a", "id_b").agg(F.count(F.lit(1)).as("inter"))
    pairs
      .join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("sz", "sz_a"), Seq("id_a"))
      .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("sz", "sz_b"), Seq("id_b"))
      .withColumn("jaccard",
        F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")))
      .filter(F.col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** Exact n-gram Jaccard pairs via PREFIX FILTERING — the published
    * scale-safe alternative to [[ngramJaccardPairs]]'s frequency cap
    * (Bayardo et al., "Scaling Up All Pairs Similarity Search", WWW
    * 2007; the prefix+length filters of PPJoin, Xiao et al. 2008).
    * EXACT: no silent pair loss — every pair with Jaccard ≥ t is
    * found, including pairs whose only shared grams are corpus-wide
    * stop-grams (the case the capped path drops).
    *
    * Theorem (canonical prefix): order the gram universe by a global
    * total order (here: ascending document frequency, rarest first,
    * ties by gram value). For a set x take the first
    * p(x) = |x| − ⌈t·|x|⌉ + 1 grams. If J(x,y) ≥ t then the smallest
    * shared gram lies in BOTH prefixes — if it didn't, the whole
    * intersection would fit in one suffix of size ⌈t·|x|⌉ − 1 <
    * t·|x| ≤ |x∩y|. So an equi-join on prefix grams alone loses
    * nothing, and candidates concentrate on each document's RAREST
    * grams: a stop-gram enters a prefix only when a document has
    * almost nothing rarer, so the O(df²) hot-key blowup of the naive
    * gram join disappears for exactly the grams that caused it.
    *
    * Shape at scale: sketch once (pinned by an eager `localCheckpoint`
    * — ONE shingle evaluation by construction, not by Exchange
    * canonicalization; a cluster job would use a reliable checkpoint
    * dir, same plan), gram df via a PARTIAL-AGGREGATING groupBy (map-
    * side combine: a corpus-wide stop-gram contributes one partial
    * count per map partition, never one shuffled row per occurrence),
    * df joined back to the occurrences with a shuffle-hash hint (the
    * occurrence stream is never sorted by g, and AQE's skew-join split
    * can rebalance a hot gram — a window count could do neither: it
    * forces every occurrence of a gram to ONE task and sorts there),
    * per-doc rank window (one shuffle by id — bounded by doc size),
    * prefix self-join on gram (ids+sizes only — no arrays through the
    * hot join), length filter t·max ≤ min before the pair dedup, then
    * verify exact Jaccard by re-joining the sorted sketch arrays BY ID.
    * The 1e-9 slacks on the float ceil/length tests only ever widen
    * the candidate set (exactness is decided by the final verify).
    */
  def ngramJaccardPrefix(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3,
      threshold: Double = 0.5,
      sketchCounter: Option[org.apache.spark.util.LongAccumulator] = None
  ): DataFrame = {
    val shU = F.udf { (t: String) =>
      sketchCounter.foreach(_.add(1L))
      shingles(t, n)
    }
    // cheap column predicates BEFORE the UDF (shingles() is empty iff
    // no word char) — a filter on the UDF output would be
    // predicate-pushed below the projection and evaluate the UDF twice
    // per row. The eager localCheckpoint pins ONE shingle evaluation
    // for all consuming branches (prefix-join left/right, both verify
    // joins) by construction — downstream plans read the materialized
    // blocks, so no optimizer rule (column-pruning asymmetry,
    // InferFiltersFromGenerate pushing UDF-substituted predicates into
    // the scan — both bit the r3 Exchange-reuse formulation) can ever
    // re-evaluate the UDF. Accumulator-asserted in DedupSimilaritySpec.
    val sketched = df
      .filter(hasTokensCol(F.col(textCol)) && F.col(idCol).isNotNull)
      .select(F.col(idCol).as("id"), shU(F.col(textCol)).as("sh"))
      .localCheckpoint()
    val grams = sketched
      .select(F.col("id"), F.size(F.col("sh")).as("sz"),
        F.explode(F.col("sh")).as("g"))
    // gram df as a PARTIAL-aggregating groupBy: a stop-gram present in
    // every document shuffles one partial count per map partition —
    // never one row per occurrence to a single task. (The r3 window
    // count was exactly that single-reducer sort, reintroducing one
    // stage earlier the hot-key blowup the prefix filter removes.)
    val gramDf = grams.groupBy("g").agg(F.count(F.lit(1)).as("df_g"))
    // shuffle-hash hint: build the (distinct-gram, df) map per
    // partition and STREAM the occurrences through it unsorted; a
    // sort-merge join would re-sort the occurrence stream by g — the
    // same hot-gram sort the groupBy just avoided. AQE skew-split can
    // further rebalance a hot gram's join partition.
    val wRank = Window.partitionBy("id").orderBy(F.col("df_g"), F.col("g"))
    // NOT pinned (r6 measured negative): prefix feeds both sides of the
    // candidate self-join, so an eager localCheckpoint here would run
    // the join+window pipeline once instead of twice — but the A/B
    // (BenchOne, 8 reps, same harness, spin ~80) read 1.23s unpinned vs
    // 1.72s pinned at sf0.1: the materialization costs more than the
    // duplicated window pass saves (the subtree below the window's
    // exchange is already shared via ReuseExchange; only the small
    // post-filter sort+window re-runs). At 100 TB the trade can flip —
    // a future round should gate a reliable checkpoint on input size.
    val prefix = grams
      .join(gramDf.hint("shuffle_hash"), Seq("g"))
      .withColumn("rn", F.row_number().over(wRank))
      .filter(F.col("rn") <=
        F.col("sz") - F.ceil(F.col("sz") * threshold - 1e-9) + 1)
      .select("g", "id", "sz")
    val cand = prefix.select(F.col("g"), F.col("id").as("id_a"), F.col("sz").as("sz_a"))
      .join(prefix.select(F.col("g"), F.col("id").as("id_b"), F.col("sz").as("sz_b")),
        Seq("g"))
      .filter(F.col("id_a") < F.col("id_b"))
      // length filter: J ≥ t forces t·max(|x|,|y|) ≤ min(|x|,|y|)
      .filter(F.least(F.col("sz_a"), F.col("sz_b")) >=
        F.greatest(F.col("sz_a"), F.col("sz_b")) * threshold - 1e-9)
      .select("id_a", "id_b")
      .dropDuplicates("id_a", "id_b")
    val jacU = F.udf((a: Array[Long], b: Array[Long]) => jaccard(a, b))
    cand
      .join(sketched.select(F.col("id").as("id_a"), F.col("sh").as("sh_a")), Seq("id_a"))
      .join(sketched.select(F.col("id").as("id_b"), F.col("sh").as("sh_b")), Seq("id_b"))
      .withColumn("jaccard", jacU(F.col("sh_a"), F.col("sh_b")))
      .filter(F.col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** Side output for [[ngramJaccardPairs]]'s silent-coverage tradeoff:
    * the grams DROPPED by the `maxGramFreq` cut, with their document
    * frequency. `count(*)` of this is the dropped-gram tally a run
    * should log next to the pair output; any pair sharing ONLY these
    * grams is invisible to the pair path.
    */
  def ngramDroppedGrams(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3,
      maxGramFreq: Int = 1000
  ): DataFrame = {
    val shU = F.udf((t: String) => shingles(t, n))
    df.select(F.col(idCol).as("id"), F.explode(shU(F.col(textCol))).as("g"))
      .groupBy("g").agg(F.count(F.lit(1)).as("gf"))
      .filter(F.col("gf") > maxGramFreq)
  }

  /** Embedding cosine near-dup pairs via random-hyperplane LSH (bit
    * signature → ID-ONLY band equi-join → pair dedup → re-join the
    * embeddings by id → exact cosine verify). Same de-payloaded shape
    * as [[minhashNearDups]]: a hot bucket shuffles O(g²) bare id
    * pairs, never O(g²) embedding vectors.
    */
  def embeddingNearDups(
      df: DataFrame,
      idCol: String,
      embCol: String,
      simThreshold: Double = 0.95,
      nBits: Int = 16,
      nBands: Int = 4
  ): DataFrame = {
    import graft.knn.Similarity
    val vecs = df.select(F.col(idCol).as("id"), F.col(embCol).as("emb"))
    // id-only banding (de-payloaded); the ONE bucket-scheme definition
    val banded = Similarity.hyperplaneBanded(
      vecs, "id", "emb", "id", None, nBits, nBands)
    val cosU = F.udf((a: Array[Float], b: Array[Float]) => Similarity.cosine(a, b))
    val pairs = banded.select(F.col("band"), F.col("bh"), F.col("id").as("id_a"))
      .join(banded.select(F.col("band"), F.col("bh"), F.col("id").as("id_b")),
        Seq("band", "bh"))
      .filter(F.col("id_a") < F.col("id_b"))
      .select("id_a", "id_b")
      .dropDuplicates("id_a", "id_b")
    pairs
      .join(vecs.select(F.col("id").as("id_a"), F.col("emb").as("emb_a")), Seq("id_a"))
      .join(vecs.select(F.col("id").as("id_b"), F.col("emb").as("emb_b")), Seq("id_b"))
      .withColumn("sim", cosU(F.col("emb_a"), F.col("emb_b")))
      .filter(F.col("sim") >= simThreshold)
      .select("id_a", "id_b", "sim")
  }

  /** Connected components over an undirected near-dup pair list —
    * the transitive-closure clustering step after ANY of the pair
    * operators above ("merge everything linked by any near-dup edge,
    * keep one representative per cluster"). Pair emission alone is not
    * a dedup policy: A~B and B~C must collapse to one cluster even
    * when A~C was never emitted.
    *
    * Algorithm: minimum-label propagation — comp(v) starts at v, each
    * round takes min(comp(v), min over neighbors' comps), until a
    * round changes nothing. Deterministic (min is order-insensitive)
    * and exact; rounds = graph diameter. Near-dup graphs are unions of
    * near-cliques, so the fixpoint lands in a handful of rounds; for
    * adversarially chained graphs at 10^12 scale the O(log n)-round
    * large-star/small-star scheme (Kiveris et al., SoCC 2014) is the
    * drop-in upgrade behind this same signature. Each round is two
    * shuffles (join by vertex, min-agg by vertex); `localCheckpoint`
    * truncates the growing lineage per round (a production cluster
    * job would use a reliable checkpoint dir instead — same plan).
    *
    * Returns (id, component) for every vertex appearing in any edge,
    * component = smallest reachable id.
    */
  /** @param algo "label" (default) = min-label propagation, rounds =
    *   graph diameter — right for near-dup graphs (unions of
    *   near-cliques, diameter a handful). "star" = alternating
    *   large-star/small-star contraction (Kiveris et al., SoCC 2014),
    *   O(log n) rounds on ANY shape — the 10^12-row safety for
    *   adversarially chained graphs (a path of near-dup pairs), at the
    *   cost of a distinct + two grouped joins per round. Identical
    *   output (spec-asserted on chains, cliques, random graphs).
    */
  def connectedComponents(
      edges: DataFrame,
      aCol: String,
      bCol: String,
      maxIter: Int = 25,
      algo: String = "label"
  ): DataFrame = {
    if (algo == "star") return connectedComponentsStar(edges, aCol, bCol, maxIter)
    val e = edges.select(F.col(aCol).as("u"), F.col(bCol).as("v"))
      .filter(F.col("u").isNotNull && F.col("v").isNotNull)
    // symmetric closure, deduped once up front (every round reuses it)
    val sym = e.unionByName(e.select(F.col("v").as("u"), F.col("u").as("v")))
      .distinct().localCheckpoint()
    var labels = sym.select(F.col("u").as("id")).distinct()
      .withColumn("comp", F.col("id")).localCheckpoint()
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val nbrMin = sym
        .join(labels.withColumnRenamed("id", "u"), Seq("u"))
        .groupBy(F.col("v").as("id")).agg(F.min("comp").as("nbr_comp"))
      val next = labels.join(nbrMin, Seq("id"), "left")
        .select(F.col("id"),
          F.least(F.col("comp"), F.coalesce(F.col("nbr_comp"), F.col("comp")))
            .as("comp"))
        .localCheckpoint()
      val changed = next.join(labels.withColumnRenamed("comp", "old_comp"), Seq("id"))
        .filter(F.col("comp") < F.col("old_comp")).limit(1).count()
      labels.unpersist()
      labels = next
      converged = changed == 0L
      iter += 1
    }
    require(converged, s"connectedComponents did not converge in $maxIter rounds")
    labels
  }

  /** Alternating large-star / small-star connected components
    * (Kiveris et al., "Connected Components in MapReduce and Beyond",
    * SoCC 2014): each round contracts toward the component minimum in
    * O(log n) rounds regardless of diameter — the upgrade min-label
    * propagation needs on chain-shaped graphs (r3 verdict #5).
    *
    * Both stars are expressed as grouped MIN + join-back (map-side
    * partial aggregation; no neighbor-list collect anywhere, so a
    * 10^8-degree hub never materializes its adjacency in one task):
    *   large-star: every neighbor v > u re-points to
    *     m(u) = min(Γ(u) ∪ u)  — computed over the SYMMETRIC edges;
    *   small-star: with edges canonical child→parent (big→small),
    *     every parent and u itself re-point to m(u) = min child-side.
    * Edges stay canonical (big, small); fixpoint = edge set unchanged
    * (two anti-join probes). The converged set is a star forest:
    * (child, root-min) pairs, from which labels read off directly.
    */
  def connectedComponentsStar(
      edges: DataFrame,
      aCol: String,
      bCol: String,
      maxIter: Int = 50
  ): DataFrame = {
    val e0 = edges.select(F.col(aCol).as("u"), F.col(bCol).as("v"))
      .filter(F.col("u").isNotNull && F.col("v").isNotNull)
      .filter(F.col("u") =!= F.col("v"))
      .select(F.greatest(F.col("u"), F.col("v")).as("u"),
        F.least(F.col("u"), F.col("v")).as("v"))
      .distinct()
    var cur = e0.localCheckpoint()
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      // large-star over the symmetric view
      val sym = cur.unionByName(cur.select(F.col("v").as("u"), F.col("u").as("v")))
      val lMin = sym.groupBy("u").agg(F.min("v").as("mn"))
        .select(F.col("u"), F.least(F.col("mn"), F.col("u")).as("m"))
      val large = sym.join(lMin, Seq("u"))
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").as("u"), F.col("m").as("v")) // (big, small)
        .filter(F.col("u") =!= F.col("v"))
        .distinct()
      // small-star on child→parent edges
      val sMin = large.groupBy("u").agg(F.min("v").as("m"))
      val small = large.join(sMin, Seq("u"))
        .select(F.col("v").as("a"), F.col("m").as("b"))
        .unionByName(sMin.select(F.col("u").as("a"), F.col("m").as("b")))
        .filter(F.col("a") =!= F.col("b"))
        .select(F.greatest(F.col("a"), F.col("b")).as("u"),
          F.least(F.col("a"), F.col("b")).as("v"))
        .distinct()
      val next = small.localCheckpoint()
      converged =
        next.join(cur, Seq("u", "v"), "left_anti").limit(1).count() == 0L &&
          cur.join(next, Seq("u", "v"), "left_anti").limit(1).count() == 0L
      cur.unpersist()
      cur = next
      iter += 1
    }
    require(converged, s"connectedComponentsStar did not converge in $maxIter rounds")
    // star forest → labels; roots label themselves
    cur.select(F.col("u").as("id"), F.col("v").as("comp"))
      .unionByName(cur.select(F.col("v").as("id"), F.col("v").as("comp")))
      .groupBy("id").agg(F.min("comp").as("comp"))
  }

  /** Benchmark decontamination — the test-set overlap scrub every LLM
    * training pipeline runs before training (GPT-3 appendix C / The
    * Pile style): flag corpus docs sharing ≥ `minHits` word n-grams
    * with ANY benchmark document. Output has one row per corpus doc:
    * (id, contaminated_grams, is_contaminated).
    *
    * Plan shape: the benchmark's distinct gram-hash set is tiny next
    * to a 10^12-row corpus, so it BROADCASTS and the whole operator is
    * a map-side semi-join + one partial-aggregating groupBy on doc id
    * — the corpus text is sketched once and never shuffled (only
    * (id, gram) longs reach the exchange). Set `broadcastBench =
    * false` for a pathological benchmark too large to broadcast
    * (falls back to a shuffle hash join on the gram hash).
    */
  def decontaminate(
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      bench: DataFrame,
      benchTextCol: String,
      shingleSize: Int = 8,
      minHits: Int = 1,
      broadcastBench: Boolean = true
  ): DataFrame = {
    val gramU = F.udf((t: String) => shingles(t, shingleSize))
    val benchGrams = {
      val g = bench.select(F.explode(gramU(F.col(benchTextCol))).as("g")).distinct()
      if (broadcastBench) F.broadcast(g) else g
    }
    // shingles() returns the DISTINCT gram set per doc, so the join
    // count is the distinct-contaminated-gram count directly
    val hits = corpus
      .filter(hasTokensCol(F.col(textCol)))
      .select(F.col(idCol).as("id"), F.explode(gramU(F.col(textCol))).as("g"))
      .join(benchGrams, Seq("g"))
      .groupBy("id")
      .agg(F.count(F.lit(1)).as("contaminated_grams"))
    corpus.select(F.col(idCol).as("id"))
      .join(hits, Seq("id"), "left")
      .na.fill(0L, Seq("contaminated_grams"))
      .withColumn("is_contaminated", F.col("contaminated_grams") >= minHits)
  }

  /** Per-start-position hashes of every w-token window — the SAME
    * seeded mix-chain fold as [[shingles]] (so the SQL oracle reuses
    * the proven chain template), but positions kept and nothing
    * deduplicated. Empty for docs shorter than w tokens.
    */
  def windowHashes(text: String, w: Int): Array[Long] = {
    val words = tokens(text)
    if (words.length < w) return Array.emptyLongArray
    // r6: hash each word once (the window fold used to re-walk every
    // word's chars w times); fold values identical by construction
    val wh = new Array[Long](words.length)
    var p = 0
    while (p < words.length) { wh(p) = wordHash64(words(p)); p += 1 }
    val out = new Array[Long](words.length - w + 1)
    var i = 0
    while (i + w <= words.length) {
      var h = 0x2545f4914f6cdd1dL
      var j = i
      while (j < i + w) { h = mix(h ^ wh(j)); j += 1 }
      out(i) = h
      i += 1
    }
    out
  }

  /** Span-level corpus dedup (the C4 three-sentence-span /
    * Lee et al. "Deduplicating Training Data Makes Language Models
    * Better" (ACL 2022) ExactSubstr family, on word-token windows):
    * training corpora repeat long SPANS inside otherwise-distinct
    * documents (quotes, licenses, syndicated paragraphs) that
    * doc-level and line-level dedup both miss. Every `w`-token sliding
    * window is hashed; of all instances of a duplicated window, only
    * the globally-first (id, start) occurrence is RETAINED. A token
    * survives iff at least one window covering it is retained (so
    * duplicated regions vanish except in the first-occurrence doc,
    * while boundary tokens shared with unique context survive — the
    * maximal-duplicated-region semantics). Docs with fewer than `w`
    * tokens are untouched.
    *
    * OUTPUT TEXT IS TOKEN-NORMALIZED (lowercased word tokens joined by
    * single spaces): span removal is defined over the token stream, so
    * the operator returns the retained token stream, not a spliced
    * original string. Output (id, text, n_tokens, n_kept).
    *
    * Plan shape at 10^12 rows: the window exchange ships (hash, id,
    * start) scalars only; first-occurrence is the two-phase
    * groupBy-min(struct) (no window over a hot span hash — a license
    * paragraph shared by 10^7 docs aggregates map-side); only the
    * DROPPED starts (the duplicate instances — the small set in a
    * mostly-unique corpus) are collected per doc, and the rebuild is a
    * map-only kernel whose state is one document's tokens, the same
    * bound as reassembly.
    */
  def spanDedup(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      w: Int = 8
  ): DataFrame = {
    require(w >= 2, "window must span at least 2 tokens")
    val whU = F.udf((t: String) => windowHashes(t, w))
    // sketch-once discipline (the minhash/ngram-prefix lesson): wins
    // feeds BOTH the first-occurrence aggregate and the join-back —
    // without pinning, each branch re-runs the O(n·w) hash UDF over
    // the whole corpus. Eager localCheckpoint materializes the
    // (id, s, h) scalars once (a production cluster job would use a
    // reliable checkpoint dir — same plan).
    val wins = docs
      .select(F.col(idCol).as("id"),
        F.posexplode(whU(F.col(textCol))).as(Seq("s", "h")))
      .localCheckpoint()
    // pair_min ≡ min(struct(id, s)) but hash-aggregable (r6): the
    // built-in struct min forces SortAggregate — a per-partition sort
    // of every window occurrence before the partial aggregate
    val firsts = wins.groupBy("h")
      .agg(graft.functions.PairMinAgg
        .pair_min(F.col("id"), F.col("s"), "id", "s").as("first"))
    val dropped = wins
      .join(firsts.hint("shuffle_hash"), Seq("h"))
      .filter(!(F.col("first.id") === F.col("id") && F.col("first.s") === F.col("s")))
      .groupBy("id")
      .agg(F.sort_array(F.collect_list(F.col("s"))).as("drops"))
    val rebuildU = F.udf { (t: String, drops: Seq[Int]) =>
      val toks = tokens(t)
      val n = toks.length
      if (n < w) (toks.mkString(" "), n, n)
      else {
        val droppedSet = if (drops == null) Set.empty[Int] else drops.toSet
        val kept = (0 until n).filter { i =>
          (math.max(0, i - w + 1) to math.min(i, n - w))
            .exists(s => !droppedSet.contains(s))
        }
        (kept.map(toks).mkString(" "), n, kept.size)
      }
    }
    docs.select(F.col(idCol).as("id"), F.col(textCol).as("__t"))
      .join(dropped, Seq("id"), "left")
      .withColumn("__r", rebuildU(F.col("__t"), F.col("drops")))
      .select(F.col("id"), F.col("__r._1").as("text"),
        F.col("__r._2").as("n_tokens"), F.col("__r._3").as("n_kept"))
  }

  /** Line-level corpus dedup (CCNet / C4 style): web text repeats whole
    * LINES across documents (nav bars, cookie banners, footers) far
    * more than whole documents, so curation pipelines dedup at line
    * granularity BEFORE doc-level near-dup. Semantics per non-blank
    * line (matching on lower(trim(line))):
    *   - corpus line frequency == 1           → kept;
    *   - duplicated, df <  `boilerplateMinDf` → FIRST occurrence kept
    *     (global (id, pos) order — the repo-wide first-wins doctrine),
    *     the rest removed;
    *   - duplicated, df >= `boilerplateMinDf` → boilerplate: removed
    *     EVERYWHERE including the first occurrence (CCNet's repeated-
    *     line scrub).
    * Blank/whitespace-only lines are document structure, kept as-is.
    * Survivors reassemble in original order; a doc whose every content
    * line was removed survives with the blank skeleton (possibly "").
    *
    * Plan shape at 10^12 rows: NO window over the line key — a hot
    * boilerplate line ("subscribe to our newsletter") can occur 10^8
    * times and a `row_number() over (partition by line)` would sort all
    * of them on one task. Instead per-line stats are a map-side-partial
    * `groupBy(h).agg(min(struct(id, pos)), count)` — one row per
    * DISTINCT line survives the exchange — joined back shuffle-hash.
    * Only (md5, id, pos) scalars reach the stats exchange; the line
    * text itself shuffles once into the per-doc reassembly (unavoidable
    * — it IS the output). Reassembly state is one document's lines
    * (same bound as conversation reassembly, R3).
    *
    * Output: (id, text, n_lines, n_kept).
    */
  def lineDedup(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      boilerplateMinDf: Long = Long.MaxValue
  ): DataFrame = {
    val lines = docs
      .select(F.col(idCol).as("id"),
        F.posexplode(F.split(F.coalesce(F.col(textCol), F.lit("")), "\n", -1))
          .as(Seq("pos", "line")))
      .withColumn("norm", F.lower(F.trim(F.col("line"))))
    val content = lines.filter(F.col("norm") =!= "")
      .withColumn("h", F.md5(F.col("norm")))
    // two-phase first-occurrence + df: one row per distinct line.
    // pair_min ≡ min(struct(id, pos)) but hash-aggregable (r6): with
    // the struct min this stage was a SortAggregate, sorting every
    // line occurrence per partition before the partial aggregate
    val stats = content.groupBy("h")
      .agg(graft.functions.PairMinAgg
        .pair_min(F.col("id"), F.col("pos"), "id", "pos").as("first"),
        F.count(F.lit(1)).as("df"))
    val keptContent = content
      .join(stats.hint("shuffle_hash"), Seq("h"))
      .filter(F.col("df") < boilerplateMinDf &&
        (F.col("df") === 1 ||
          (F.col("first.id") === F.col("id") && F.col("first.pos") === F.col("pos"))))
      .select("id", "pos", "line")
    val survivors = keptContent
      .unionByName(lines.filter(F.col("norm") === "").select("id", "pos", "line"))
    val reassembled = survivors.groupBy("id")
      .agg(
        F.array_join(
          F.transform(
            F.array_sort(F.collect_list(F.struct(F.col("pos"), F.col("line")))),
            x => x.getField("line")),
          "\n").as("text"),
        F.count(F.lit(1)).as("n_kept"))
    // n_lines = the split-array size, computed MAP-ONLY on the doc row
    // (r6): the count of posexplode rows per id equals the array length
    // by definition, so the old `lines.groupBy(id).count()` was a third
    // full explode of the corpus plus an exchange for a value already
    // known before exploding
    val totals = docs.select(F.col(idCol).as("id"),
      F.size(F.split(F.coalesce(F.col(textCol), F.lit("")), "\n", -1))
        .cast("long").as("n_lines"))
    totals.join(reassembled, Seq("id"), "left")
      .select(F.col("id"),
        F.coalesce(F.col("text"), F.lit("")).as("text"),
        F.col("n_lines"),
        F.coalesce(F.col("n_kept"), F.lit(0L)).as("n_kept"))
  }
}
