package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Count of distinct common elements of two string arrays —
  * `size(array_intersect(a, b))` with no result-array materialization.
  *
  * The LSH verification kernel computes jaccard from ONLY the intersection
  * COUNT, but the built-in route allocates the intersection array (hash set
  * + growable output array + UnsafeArrayData copy) per candidate pair just
  * to take its size. At ~10^8 candidate pairs the allocation is the kernel.
  *
  * Semantics match `size(array_intersect(a, b))` exactly, including
  * duplicate and null elements: the set holds a's DISTINCT elements (null
  * tracked as its own marker, as array_intersect keeps one null when both
  * sides hold one), and every b element removes its match at most once, so
  * the count is |distinct(a) ∩ distinct(b)| whatever the inputs.
  */
object IntersectCount {
  def count(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    if (na == 0 || nb == 0) return 0
    val set = new java.util.HashSet[UTF8String](Math.max(4, na * 2))
    var aHasNull = false
    var i = 0
    while (i < na) {
      if (a.isNullAt(i)) aHasNull = true
      else set.add(a.getUTF8String(i))
      i += 1
    }
    var n = 0
    var j = 0
    while (j < nb && (!set.isEmpty || aHasNull)) {
      if (b.isNullAt(j)) {
        if (aHasNull) { n += 1; aHasNull = false }
      } else if (set.remove(b.getUTF8String(j))) n += 1
      j += 1
    }
    n
  }
}

/** `graft_intersect_count(a, b)` over `array<string>` columns. */
case class IntersectCountExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_intersect_count"

  override def nullSafeEval(a: Any, b: Any): Any =
    IntersectCount.count(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.IntersectCount.count($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): IntersectCountExpr =
    copy(left = l, right = r)
}
