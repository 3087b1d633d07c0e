package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Static kernels shared by interpreted eval and generated code —
  * `doGenCode` emits direct calls into these, so the expressions stay
  * INSIDE whole-stage codegen (no UDF object, no encoder round-trip,
  * no closure serialization).
  */
object TextMetricsUtil {
  def wordCount(s: UTF8String): Int = {
    if (s == null) return 0
    val t = s.toString
    var n = 0
    var inWord = false
    var i = 0
    while (i < t.length) {
      val ws = Character.isWhitespace(t.charAt(i))
      if (!ws && !inWord) { n += 1; inWord = true }
      else if (ws) inWord = false
      i += 1
    }
    n
  }

  def symbolRatio(s: UTF8String): Double = {
    if (s == null) return 0.0
    val t = s.toString
    if (t.isEmpty) return 0.0
    var sym = 0
    var i = 0
    while (i < t.length) {
      val c = t.charAt(i)
      if (!Character.isLetterOrDigit(c) && !Character.isWhitespace(c)) sym += 1
      i += 1
    }
    sym.toDouble / t.length
  }

  /** 64-bit polynomial rolling hash of the ws-normalized lowercased
    * text (graft.textstats.TextStats.fingerprint semantics).
    */
  def fingerprint(s: UTF8String): Long =
    if (s == null) 0L else graft.textstats.TextStats.fingerprint(s.toString)

  /** Distinct lowercased \s+-token ratio — value-identical to the
    * built-in chain
    * `size(array_distinct(array_remove(split(lower(x), "\\s+"), ""))) /
    *  size(array_remove(split(lower(x), "\\s+"), ""))`
    * on every token-ful input (same lower() = UTF8String.toLowerCase,
    * same Java-regex ASCII \s token boundaries), single-pass with no
    * array allocation. DELIBERATE delta on token-less input: the chain
    * divides by zero (ANSI error / non-ANSI NULL); this returns NaN —
    * unreachable in the pipeline (repetition rule gates on
    * wc >= repMinWords) and asserted in FunctionsSpec.
    */
  def distinctRatio(s: UTF8String): Double = {
    if (s == null) return Double.NaN
    val t = s.toLowerCase.toString
    val set = new java.util.HashSet[String]()
    var total = 0
    var i = 0
    var start = -1
    @inline def asciiWs(c: Char) =
      c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'
    while (i <= t.length) {
      val isWs = i == t.length || asciiWs(t.charAt(i))
      if (!isWs && start < 0) start = i
      else if (isWs && start >= 0) {
        set.add(t.substring(start, i))
        total += 1
        start = -1
      }
      i += 1
    }
    if (total == 0) Double.NaN else set.size.toDouble / total
  }
}

/** Custom Catalyst expressions (SURVEY.md §2.13 "Catalyst Expression
  * (optional)"): codegen'd scalar text metrics. Measured rationale:
  * StageBench showed the generic built-in chain for these metrics
  * (`size(split(...))`, `length(regexp_replace(...))`) allocating
  * arrays / running regexes per row; these single-pass expressions
  * compute the same values with zero allocation beyond the String and
  * participate in whole-stage codegen (no Scala-UDF serialization
  * boundary).
  */
case class WordCountExpr(child: Expression)
    extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = IntegerType
  override protected def nullSafeEval(input: Any): Any =
    TextMetricsUtil.wordCount(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextMetricsUtil.wordCount($c)")
  override protected def withNewChildInternal(newChild: Expression): WordCountExpr =
    copy(child = newChild)
  override def prettyName: String = "graft_word_count"
}

case class SymbolRatioExpr(child: Expression)
    extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(input: Any): Any =
    TextMetricsUtil.symbolRatio(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextMetricsUtil.symbolRatio($c)")
  override protected def withNewChildInternal(newChild: Expression): SymbolRatioExpr =
    copy(child = newChild)
  override def prettyName: String = "graft_symbol_ratio"
}

case class DistinctRatioExpr(child: Expression)
    extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(input: Any): Any =
    TextMetricsUtil.distinctRatio(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextMetricsUtil.distinctRatio($c)")
  override protected def withNewChildInternal(newChild: Expression): DistinctRatioExpr =
    copy(child = newChild)
  override def prettyName: String = "graft_distinct_ratio"
}

case class FingerprintExpr(child: Expression)
    extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType
  override protected def nullSafeEval(input: Any): Any =
    TextMetricsUtil.fingerprint(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextMetricsUtil.fingerprint($c)")
  override protected def withNewChildInternal(newChild: Expression): FingerprintExpr =
    copy(child = newChild)
  override def prettyName: String = "graft_fingerprint"
}

/** Column-API face of the custom expressions. */
object TextMetrics {
  def word_count(c: Column): Column = GraftBridge.column(WordCountExpr(GraftBridge.expression(c)))
  def symbol_ratio(c: Column): Column = GraftBridge.column(SymbolRatioExpr(GraftBridge.expression(c)))
  def fingerprint(c: Column): Column = GraftBridge.column(FingerprintExpr(GraftBridge.expression(c)))
  def distinct_ratio(c: Column): Column = GraftBridge.column(DistinctRatioExpr(GraftBridge.expression(c)))

  /** Register as SQL functions on a session (spark.sql("... graft_word_count(text) ...")). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("graft_word_count",
      es => WordCountExpr(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("graft_symbol_ratio",
      es => SymbolRatioExpr(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("graft_fingerprint",
      es => FingerprintExpr(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("graft_distinct_ratio",
      es => DistinctRatioExpr(es.head), "scala_udf")
  }
}
