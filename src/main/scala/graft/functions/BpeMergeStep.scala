package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One BPE merge-rule application over a space-delimited symbol
  * string: the EXACT Sennrich left-to-right greedy merge (Sennrich et
  * al., ACL'16 — learn_bpe's pair rewrite), as a native Catalyst
  * expression doing ONE linear StringBuilder pass.
  *
  * Replaces the `aggregate(slice(split(...)))` higher-order-function
  * fold in the BPE loop, which rebuilt the accumulator string per
  * token — O(m²) UTF8String copying per word per round, all
  * interpreted (HOFs are CodegenFallback). Semantics are identical by
  * construction and spec-pinned against the fold on the adjacency
  * cases: walking tokens left to right, `b` glues onto the
  * accumulator exactly when the accumulator's LAST TOKEN equals `a`
  * ('a a a' + (a,a) → 'aa a'; 'a b a b' + (a,b) → 'ab ab'; a merged
  * token may immediately participate as the `a` of the next position
  * only via its full merged form, never its suffix). The DuckDB
  * oracle keeps the equivalent `list_reduce` fold — cross-engine
  * agreement is the gate's proof.
  */
case class BpeMergeStep(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == StringType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"${BpeMergeStep.FunctionName} expects (string, string, string), got " +
        children.map(_.dataType.catalogString).mkString("(", ", ", ")"))

  override def dataType: DataType = StringType

  override def nullSafeEval(syms: Any, a: Any, b: Any): Any =
    BpeMergeStep.mergeImpl(syms.asInstanceOf[UTF8String],
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, a, b) =>
      s"graft.functions.BpeMergeStep.mergeImpl($s, $a, $b)")

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object BpeMergeStep {
  val FunctionName = "graft_bpe_merge"

  /** The linear greedy pass (static forwarder — codegen calls this
    * directly). `lastTok` tracks the accumulator's trailing token, so
    * the fold's `acc = a || acc.endsWith(' ' + a)` test is O(1) per
    * position instead of a scan of the rebuilt accumulator. */
  def mergeImpl(symsU: UTF8String, aU: UTF8String,
      bU: UTF8String): UTF8String = {
    val syms = symsU.toString
    val a = aU.toString
    val b = bU.toString
    val toks = syms.split(" ")
    val sb = new java.lang.StringBuilder(syms.length)
    sb.append(toks(0))
    var lastTok = toks(0)
    var i = 1
    while (i < toks.length) {
      val t = toks(i)
      if (t == b && lastTok == a) {
        sb.append(b)
        lastTok = lastTok + b
      } else {
        sb.append(' ').append(t)
        lastTok = t
      }
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  /** Expression builder with an arity guard (the CosineSimilarity
    * convention). */
  def builder(exprs: Seq[Expression]): Expression = {
    if (exprs.length != 3)
      throw new org.apache.spark.sql.AnalysisException(
        errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
        messageParameters = Map(
          "functionName" -> s"`$FunctionName`",
          "expectedNum" -> "3",
          "actualNum" -> exprs.length.toString,
          "docroot" -> "https://spark.apache.org/docs/latest"))
    BpeMergeStep(exprs(0), exprs(1), exprs(2))
  }

  /** Idempotent per-session registration (check-then-create — the
    * replace path WARNs per call). */
  def register(spark: SparkSession): Unit =
    GraftFunctions.register(spark, FunctionName, builder)

  /** Column entry point — registers on the caller's session AND the
    * default session (call_function resolves at analysis time against
    * the DataFrame's session — the WordNgrams discipline). */
  def apply(spark: SparkSession, syms: Column, a: Column,
      b: Column): Column = {
    GraftFunctions.call(spark, FunctionName, builder)(syms, a, b)
  }
}
