package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.sqrt
import org.apache.spark.sql.types._

/** Fused dot product over two numeric arrays — the one custom Catalyst
  * `Expression` this engine needs (SURVEY.md §7: perf-gated; the
  * higher-order `aggregate(zip_with(...))` formulation is semantically
  * identical but evaluates interpreted, which dominates wall-clock on
  * O(pairs) similarity joins).
  *
  * Semantics are EXACTLY a sequential left fold in double precision —
  * `acc_{i+1} = acc_i + (double)a[i] * (double)b[i]` — the same
  * floating-point operation sequence as the `aggregate`/`list_reduce`
  * twin queries in DuckDB, so results stay bit-identical and
  * oracle-comparable while running inside whole-stage codegen.
  *
  * Element types may be float or double on each side independently
  * (embeddings are array<float>; LSH plane literals are array<double>)
  * — enforced at analysis time by checkInputDataTypes. Null elements
  * read as 0.0 (no contribution); arrays may differ in length (the dot
  * stops at the shorter).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_dot"

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    // parquet-sourced arrays read as containsNull=true even when the
    // data has no nulls, so only the element type is enforced; a null
    // element reads as 0.0 (contributes nothing to the fold).
    def ok(e: Expression): Boolean = e.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float|double> arguments, " +
        s"got ${left.dataType.sql}, ${right.dataType.sql}")
  }

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (aa, bb) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val n = math.min(aa.numElements(), bb.numElements())
    val aFloat = elemType(left) == FloatType
    val bFloat = elemType(right) == FloatType
    var acc = 0.0
    var i = 0
    while (i < n) {
      val x = if (aFloat) aa.getFloat(i).toDouble else aa.getDouble(i)
      val y = if (bFloat) bb.getFloat(i).toDouble else bb.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val getA =
        if (elemType(left) == FloatType) s"(double) $a.getFloat($i)"
        else s"$a.getDouble($i)"
      val getB =
        if (elemType(right) == FloatType) s"(double) $b.getFloat($i)"
        else s"$b.getDouble($i)"
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $getA * $getB;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Column-level helpers around [[DotProduct]]. */
object VectorOps {
  def dot(a: Column, b: Column): Column =
    GraftSqlBridge.toColumn(
      DotProduct(GraftSqlBridge.toExpression(a), GraftSqlBridge.toExpression(b)))

  def l2norm(a: Column): Column = sqrt(dot(a, a))

  /** cosine(a,b) given precomputed norms — division order fixed as
    * dot / (na * nb) to mirror the oracle SQL exactly. */
  def cosine(a: Column, b: Column, na: Column, nb: Column): Column =
    dot(a, b) / (na * nb)
}
