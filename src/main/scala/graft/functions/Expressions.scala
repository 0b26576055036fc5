package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.graftshim.{ColumnShim => ExpressionUtils}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions (SURVEY.md §4.3). Each has `doGenCode`
  * that emits a static call into [[TextAlgos]], so the expression stays
  * inside whole-stage codegen (no iterator break, no UDF boxing); `eval`
  * paths call the same static, so interpreted and codegen results are
  * identical by construction.
  */
object GraftExpressions {

  /** Static entry points for generated code (UTF8String in, primitive
    * out — no boxing).
    */
  def repetitionRatio(s: UTF8String, n: Int): Double =
    TextAlgos.distinctNgramFraction(if (s == null) null else s.toString.toLowerCase, n)

  def symbolDensity(s: UTF8String): Double =
    TextAlgos.symbolDensity(if (s == null) null else s.toString)

  def jaroWinkler(a: UTF8String, b: UTF8String): Double =
    TextAlgos.jaroWinkler(
      if (a == null) null else a.toString,
      if (b == null) null else b.toString)

  def simHash(s: UTF8String): Long =
    TextAlgos.simHash(if (s == null) null else s.toString)

  def fingerprint(s: UTF8String): Long =
    TextAlgos.docFingerprint(if (s == null) null else s.toString)

  def ngramJaccard(a: UTF8String, b: UTF8String, k: Int): Double =
    TextAlgos.ngramJaccard(
      if (a == null) null else a.toString,
      if (b == null) null else b.toString, k)

  /** Whitespace-normalize + full PII scrub chain + per-rule counts in
    * ONE pass over the string — literally the oracle's code path
    * (graft.scrub.Scrub), so pipeline/oracle text equality holds by
    * construction. Returns struct<scrubbed_text, c_email, c_key,
    * c_phone, c_slur>. One String materialization instead of nine
    * UTF8String↔String round-trips (GC contention at 32 sort threads
    * was the window-stage scaling bottleneck).
    */
  def scrubAll(s: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val raw = if (s == null) null else s.toString
    val norm = graft.scrub.Scrub.normalizeWsPlain(raw)
    val (scrubbed, counts) = graft.scrub.Scrub.scrubPlain(norm)
    val out = new Array[Any](1 + graft.rules.RuleConfig.ScrubChain.size)
    out(0) = if (scrubbed == null) null else UTF8String.fromString(scrubbed)
    var i = 1
    graft.rules.RuleConfig.ScrubChain.foreach { case (rule, _, _) =>
      out(i) = counts(rule); i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(out)
  }

  // ------------------------------------------------------- Column API

  def repetition_ratio(c: Column, n: Int = 3): Column =
    ExpressionUtils.column(RepetitionRatio(ExpressionUtils.expression(c), n))

  def symbol_density(c: Column): Column =
    ExpressionUtils.column(SymbolDensityExpr(ExpressionUtils.expression(c)))

  def jaro_winkler(a: Column, b: Column): Column =
    ExpressionUtils.column(
      JaroWinklerExpr(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  def sim_hash(c: Column): Column =
    ExpressionUtils.column(SimHashExpr(ExpressionUtils.expression(c)))

  def doc_fingerprint(c: Column): Column =
    ExpressionUtils.column(FingerprintExpr(ExpressionUtils.expression(c)))

  def ngram_jaccard(a: Column, b: Column, k: Int = 3): Column =
    ExpressionUtils.column(
      NgramJaccardExpr(ExpressionUtils.expression(a), ExpressionUtils.expression(b), k))

  def scrub_all(c: Column): Column =
    ExpressionUtils.column(ScrubAllExpr(ExpressionUtils.expression(c)))
}

/** Fused normalize + PII scrub + counts (see GraftExpressions.scrubAll). */
case class ScrubAllExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ScrubAllExpr.schema
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = false
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    GraftExpressions.scrubAll(child.eval(input).asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val c = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${c.code}
        InternalRow ${ev.value} = graft.functions.GraftExpressions.scrubAll(
          ${c.isNull} ? null : ${c.value});
        boolean ${ev.isNull} = false;
      """)
  }
  override protected def withNewChildInternal(newChild: Expression): ScrubAllExpr =
    copy(child = newChild)
}

object ScrubAllExpr {
  import graft.rules.RuleConfig
  val schema: StructType = StructType(
    StructField("scrubbed_text", StringType) +:
      RuleConfig.ScrubChain.map { case (rule, _, _) =>
        StructField(s"c_$rule", IntegerType, nullable = false)
      })
}

/** Distinct-fraction of char n-grams of lowercase(input) — the
  * repetition detector (generalizes data_types.json:8-12's
  * `([a-zA-Z])\1{2,}` which needs backreferences).
  */
case class RepetitionRatio(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(input: Any): Any =
    GraftExpressions.repetitionRatio(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.GraftExpressions.repetitionRatio($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): RepetitionRatio =
    copy(child = newChild)
}

case class SymbolDensityExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(input: Any): Any =
    GraftExpressions.symbolDensity(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GraftExpressions.symbolDensity($c)")
  override protected def withNewChildInternal(newChild: Expression): SymbolDensityExpr =
    copy(child = newChild)
}

/** Jaro-Winkler similarity — Spark only ships levenshtein; the
  * reference's suggestion joins (functions.sql:1665-1779) need JW.
  */
case class JaroWinklerExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(a: Any, b: Any): Any =
    GraftExpressions.jaroWinkler(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.GraftExpressions.jaroWinkler($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinklerExpr =
    copy(left = newLeft, right = newRight)
}

case class SimHashExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(input: Any): Any =
    GraftExpressions.simHash(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GraftExpressions.simHash($c)")
  override protected def withNewChildInternal(newChild: Expression): SimHashExpr =
    copy(child = newChild)
}

case class FingerprintExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(input: Any): Any =
    GraftExpressions.fingerprint(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GraftExpressions.fingerprint($c)")
  override protected def withNewChildInternal(newChild: Expression): FingerprintExpr =
    copy(child = newChild)
}

case class NgramJaccardExpr(left: Expression, right: Expression, k: Int)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(a: Any, b: Any): Any =
    GraftExpressions.ngramJaccard(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.GraftExpressions.ngramJaccard($a, $b, $k)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NgramJaccardExpr =
    copy(left = newLeft, right = newRight)
}
