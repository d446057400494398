package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct k-shingle count in one pass over the string — equals
  * `size(array_distinct(shingles(text, k)))` without materializing the
  * shingle array or running interpreted lambdas (the composed form was the
  * slowest projection in the whole benchmark at 5000 docs).
  */
object ShingleCount {
  def distinctShingles(s: UTF8String, k: Int): Long = {
    if (s == null) return 0L
    val str = s.toString
    val n = str.length
    if (n < k) return 0L
    val seen = new java.util.HashSet[String](math.min(n, 1024))
    var i = 0
    while (i + k <= n) {
      seen.add(str.substring(i, i + k))
      i += 1
    }
    seen.size.toLong
  }
}

case class ShingleCountExpr(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_shingle_count"

  override def nullSafeEval(v: Any): Any =
    ShingleCount.distinctShingles(v.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleCount.distinctShingles($c, $k)")

  override protected def withNewChildInternal(c: Expression): ShingleCountExpr = copy(child = c)
}
