package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Custom Catalyst expression for the similarity hot path (SURVEY §4
  * flagged this as the one custom-Expression candidate worth building).
  *
  * The built-in higher-order route — `aggregate(zip_with(a, b, *), …)` —
  * allocates an intermediate array and evaluates interpreted lambdas per
  * element, and HOFs are excluded from whole-stage codegen. This fused
  * dot product generates a tight primitive loop inside the codegen'd
  * stage instead: no allocation, no virtual calls. On the O(n²) pair
  * joins (dedup_embedding_cosine, sim_ann_lsh, sim_cosine_topk) that is
  * the difference between the fold dominating the query and the join
  * dominating it.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {

  override def dataType: DataType = DoubleType

  /** Typed analysis instead of runtime garbage: the embeddings table
    * stores array<float>, and without declared input types a raw-column
    * call would pass analysis and misread 4-byte float slots as
    * doubles. ImplicitCastInputTypes inserts the float→double cast. */
  override def inputTypes: Seq[DataType] =
    Seq(org.apache.spark.sql.types.ArrayType(DoubleType),
      org.apache.spark.sql.types.ArrayType(DoubleType))

  /** A null ELEMENT nulls the product (the `aggregate(zip_with(...))`
    * HOF twin's propagation) — reading the slot as 0.0 would silently
    * fabricate a plausible number from corrupt data. */
  override def nullable: Boolean = true

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // fresh names: two DotProducts inlined into one codegen scope must
      // not redeclare the same locals (janino would reject the stage and
      // Spark would silently fall back to interpreted evaluation).
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  $acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object VectorExprs {
  /** Register `vec_dot(arr<double>, arr<double>) -> double` in the
    * session's function registry (idempotent — check-before-register,
    * so repeated query construction doesn't spam "function replaced"
    * WARNs into the logs) so plans can use it via expr("vec_dot(a, b)").
    * The check-then-register pair is synchronized: concurrent query
    * construction (the 8-wide verify driver) would otherwise race the
    * guard and spam "replaced a previously registered function" WARNs. */
  def register(spark: SparkSession): Unit =
    Registry.ensure(spark, "vec_dot", arity = 2,
      exprs => DotProduct(exprs.head, exprs(1)))
}
