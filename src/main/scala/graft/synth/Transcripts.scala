package graft.synth

import java.sql.Timestamp
import java.util.SplittableRandom

import org.apache.spark.sql.{Dataset, SparkSession}

import graft.model.{Turn, TurnLabel}

/** Deterministic seeded generator of the transcripts input table
  * (FIXTURES.md F1; BASELINE.json `input_hint`), with a ground-truth
  * label sidecar never visible to the engine.
  *
  * Determinism: each conversation derives its own `SplittableRandom`
  * from (seed, convIdx), so output is independent of partitioning and
  * parallelism — the distributed `dataset(...)` and the local
  * `conversation(...)` produce identical rows.
  *
  * Scale: generation is `spark.range(nConvs).flatMap(...)` — purely
  * parallel, no shuffle, no driver materialization; bench-tier corpora
  * (millions of turns) stream straight into the pipeline.
  *
  * Turn mixture mirrors FIXTURES.md F1: clean multilingual turns
  * (majority, must be kept verbatim), planted PII (emails/URLs/phones/
  * keys/denylist tokens — web_scraper.py:89-93 seeds), boilerplate
  * (web_scraper.py:77-84 patterns), degenerate turns (short / long /
  * repetition / symbol-heavy), grammar-error turns embedding the
  * reference's canonical mistakes (cfg_checker.py:473-480), and
  * gibberish (high-perplexity) turns.
  */
object Transcripts extends Serializable {

  // --- vocab pools (one per language; mutually distinctive) ---
  // Chosen to avoid the grammar-rule patterns (no "focus", "includes",
  // "machine", bare "there is many") so clean turns stay clean.
  val vocabEn: Array[String] = Array(
    "the", "data", "pipeline", "cluster", "rows", "we", "process", "with",
    "careful", "checks", "and", "model", "answer", "question", "table",
    "run", "job", "result", "good", "fast", "system", "large", "scale",
    "partition", "every", "turn", "clean", "text", "tokens", "sample")
  val vocabFr: Array[String] = Array(
    "le", "la", "les", "nous", "avons", "donnes", "traitement", "avec",
    "une", "réponse", "question", "chaque", "très", "rapide", "grand",
    "système", "modèle", "texte", "propre", "bien", "calcul", "résultat",
    "fichier", "toujours", "jamais", "aussi", "pour", "dans", "cette")
  val vocabEs: Array[String] = Array(
    "el", "los", "una", "nosotros", "tenemos", "datos", "proceso", "con",
    "cuidado", "respuesta", "pregunta", "cada", "muy", "rápido", "grande",
    "sistema", "modelo", "texto", "limpio", "bueno", "cálculo", "resultado",
    "archivo", "siempre", "nunca", "también", "para", "según", "mañana")
  val vocabDe: Array[String] = Array(
    "der", "die", "das", "wir", "haben", "daten", "verarbeitung", "mit",
    "sorgfalt", "antwort", "frage", "jede", "sehr", "schnell", "groß",
    "system", "modell", "text", "sauber", "gut", "berechnung", "ergebnis",
    "datei", "immer", "nie", "auch", "für", "über", "können", "müssen")
  val vocabZh: Array[String] = Array(
    "我们", "数据", "处理", "模型", "回答", "问题", "每个", "非常", "快速",
    "系统", "文本", "干净", "结果", "文件", "总是", "从不", "也", "大规模",
    "计算", "集群", "分区", "清洗", "质量", "过滤", "语言", "对话", "轮次")

  val langs: Array[String] = Array("en", "fr", "es", "de", "zh")
  def vocab(lang: String): Array[String] = lang match {
    case "en" => vocabEn
    case "fr" => vocabFr
    case "es" => vocabEs
    case "de" => vocabDe
    case "zh" => vocabZh
  }

  /** Canonical grammar-error snippets — the reference's golden fixture
    * text in spirit (cfg_checker.py:473-480, matched by rules at
    * cfg_checker.py:141-192).
    */
  val grammarErrorSnippets: Array[String] = Array(
    "It focus on the interaction between computers and humans.",
    "NLP helps machine to understand human language.",
    "The field includes machine translation and sentiment analysis.",
    "There is many challenges in this field.",
    "he are running to the big house now.",
    "they is happy because we was there yesterday."
  )

  val boilerplateTurns: Array[String] = Array(
    "Cookie Policy please accept all cookies to continue reading this site.",
    "Privacy Policy your data is handled according to our terms.",
    "Terms of Service apply to all users of this service today.",
    "Subscribe to our weekly newsletter for the latest updates and offers.",
    "Follow us on all social platforms for more daily content.",
    "Share this article with your friends and colleagues right away."
  )

  private val roles = Array("user", "assistant")
  private val tools = Array("", "", "", "", "search", "code", "browser")

  def pickLang(r: SplittableRandom): String = {
    val x = r.nextDouble()
    if (x < 0.40) "en"
    else if (x < 0.55) "fr"
    else if (x < 0.70) "es"
    else if (x < 0.85) "de"
    else "zh"
  }

  /** One clean sentence in `lang`: 5-14 words, first capitalized
    * (Latin scripts), '.' terminated.
    */
  def sentence(r: SplittableRandom, lang: String): String = {
    val v = vocab(lang)
    val n = 5 + r.nextInt(10)
    val words = Array.fill(n)(v(r.nextInt(v.length)))
    if (lang != "zh") words(0) = words(0).capitalize
    words.mkString(" ") + (if (lang == "zh") "。" else ".")
  }

  def cleanText(r: SplittableRandom, lang: String): String = {
    val nSent = 1 + r.nextInt(3)
    (0 until nSent).map(_ => sentence(r, lang)).mkString(" ")
  }

  private def email(r: SplittableRandom) =
    s"user${r.nextInt(1000)}@example${r.nextInt(10)}.com"
  private def url(r: SplittableRandom) =
    s"https://example${r.nextInt(10)}.com/page/${r.nextInt(1000)}"
  private def phone(r: SplittableRandom) =
    s"+1 ${100 + r.nextInt(900)} ${100 + r.nextInt(900)} ${1000 + r.nextInt(9000)}"
  private def apiKey(r: SplittableRandom) = {
    val chars = "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"
    "sk-" + Array.fill(24)(chars(r.nextInt(chars.length))).mkString
  }
  private def slur(r: SplittableRandom) = {
    val bank = graft.scrub.Scrubber.defaultDenylist
    bank(r.nextInt(bank.size))
  }

  /** (text, label-tags, true_lang) for one turn. */
  def turnText(r: SplittableRandom): (String, Seq[String], String) = {
    val x = r.nextDouble()
    if (x < 0.68) {
      val lang = pickLang(r)
      (cleanText(r, lang), Seq("clean"), lang)
    } else if (x < 0.76) { // PII planted into an otherwise-clean EN turn
      val base = cleanText(r, "en")
      val tags = scala.collection.mutable.ArrayBuffer[String]("pii")
      val parts = scala.collection.mutable.ArrayBuffer[String](base)
      if (r.nextDouble() < 0.6) { parts += s"contact ${email(r)} for details."; tags += "email" }
      if (r.nextDouble() < 0.5) { parts += s"see ${url(r)} for more."; tags += "url" }
      if (r.nextDouble() < 0.4) { parts += s"call ${phone(r)} today."; tags += "phone" }
      if (r.nextDouble() < 0.3) { parts += s"token ${apiKey(r)} expires."; tags += "key" }
      if (r.nextDouble() < 0.3) { parts += s"that ${slur(r)} attitude again."; tags += "slur" }
      if (tags.length == 1) { parts += s"contact ${email(r)} for details."; tags += "email" }
      (parts.mkString(" "), tags.toSeq, "en")
    } else if (x < 0.80) {
      (boilerplateTurns(r.nextInt(boilerplateTurns.length)), Seq("boilerplate"), "en")
    } else if (x < 0.84) { // too short
      val v = vocabEn
      val n = 1 + r.nextInt(3)
      ((0 until n).map(_ => v(r.nextInt(v.length))).mkString(" "), Seq("short"), "en")
    } else if (x < 0.87) { // repetition
      val w = vocabEn(r.nextInt(vocabEn.length))
      (Array.fill(25 + r.nextInt(20))(w).mkString(" "), Seq("repetition"), "en")
    } else if (x < 0.90) { // symbol-heavy
      val junk = Array.fill(8 + r.nextInt(8))("@#$%^&*" + r.nextInt(10)).mkString(" ")
      (s"ok $junk done now yes", Seq("symbols"), "en")
    } else if (x < 0.95) { // grammar-error turn: ≥3 DISTINCT canonical mistakes
      val k = 3 + r.nextInt(3)
      val idx = scala.collection.mutable.LinkedHashSet[Int]()
      while (idx.size < k) idx += r.nextInt(grammarErrorSnippets.length)
      (idx.map(grammarErrorSnippets).mkString(" "), Seq("grammar"), "en")
    } else if (x < 0.97) { // digits-only → langid "conf below threshold" drop
      val n = 5 + r.nextInt(6)
      ((0 until n).map(_ => (100 + r.nextInt(900)).toString).mkString(" "),
        Seq("digits"), "und")
    } else if (x < 0.98) { // over-long turn
      val parts = (0 until 260).map(_ => sentence(r, "en"))
      (parts.mkString(" "), Seq("long"), "en")
    } else { // gibberish → high perplexity
      val chars = "bcdfghjklmnpqrstvwxyz"
      val n = 8 + r.nextInt(10)
      val words = (0 until n).map { _ =>
        Array.fill(4 + r.nextInt(6))(chars(r.nextInt(chars.length))).mkString
      }
      (words.mkString(" ") + ".", Seq("gibberish"), "en")
    }
  }

  val baseEpochMs: Long = 1704067200000L // 2024-01-01T00:00:00Z

  /** All turns (+labels) of one conversation — pure, deterministic. */
  def conversation(seed: Long, convIdx: Long, skewTurns: Int = 0): Seq[(Turn, TurnLabel)] = {
    val r = new SplittableRandom(NGramHash.mix(seed ^ NGramHash.mix(convIdx)))
    val convId = f"conv-$convIdx%08d"
    val nTurns = if (skewTurns > 0) skewTurns else 3 + r.nextInt(28)
    (0 until nTurns).map { t =>
      val (text, tags, lang) = turnText(r)
      val role = if (t == 0 && r.nextInt(10) == 0) "system" else roles(t % 2)
      val tool = if (role == "assistant") tools(r.nextInt(tools.length)) else ""
      val ts = new Timestamp(baseEpochMs + convIdx * 3600000L + t * 7000L)
      (Turn(convId, t, role, text, tool, ts),
        TurnLabel(convId, t, lang, tags))
    }
  }

  /** Distributed generation: nConvs conversations; if `skew`, conv 0 is
    * a pathological 100k-turn conversation (salting fixture,
    * SURVEY.md §7.2 step 8).
    */
  def dataset(
      spark: SparkSession,
      nConvs: Long,
      seed: Long = 42L,
      skew: Boolean = false,
      skewTurns: Int = 100000
  ): Dataset[Turn] = {
    import spark.implicits._
    spark.range(0, nConvs).flatMap { c =>
      val st = if (skew && c == 0L) skewTurns else 0
      conversation(seed, c, st).map(_._1)
    }
  }

  /** Label sidecar — MUST be called with the same skew parameters as
    * the matching `dataset(...)` call or the join keys won't line up.
    */
  def labels(
      spark: SparkSession,
      nConvs: Long,
      seed: Long = 42L,
      skew: Boolean = false,
      skewTurns: Int = 100000
  ): Dataset[TurnLabel] = {
    import spark.implicits._
    spark.range(0, nConvs).flatMap { c =>
      val st = if (skew && c == 0L) skewTurns else 0
      conversation(seed, c, st).map(_._2)
    }
  }

  /** Labeled clean sentences for training langid + the n-gram LM —
    * derived from the same seeded pools (SURVEY.md §7.4: "no external
    * data / models").
    */
  def trainingCorpus(seed: Long = 7L, perLang: Int = 400): Seq[(String, String)] = {
    val r = new SplittableRandom(seed)
    langs.toSeq.flatMap { lang =>
      (0 until perLang).map(_ => (cleanText(r, lang), lang))
    }
  }
}

/** Seed mixer — delegates to the single shared definition. */
private[synth] object NGramHash {
  @inline def mix(x: Long): Long = graft.util.Hash.mix(x)
}
