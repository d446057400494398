package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType}

/** Scalar int8 quantization (SQ8) of embedding vectors — the public concept
  * behind FAISS's `ScalarQuantizer`: store each vector as one signed byte
  * per dimension instead of a 4-byte float, and score candidates on the
  * codes directly. At 100 TB this is the ANN family's bandwidth lever — the
  * candidate side of a top-k scan reads 4× fewer bytes (a 64-dim vector is
  * 64 code bytes vs 256 float bytes), and the integer dot product JITs at
  * least as well as the float loop.
  *
  * Scheme: per-vector symmetric quantization. `scale = max(|x_i|)` and
  * `code_i = floor(x_i * 127 / scale + 0.5)` (an all-zero vector encodes to
  * all-zero codes). Codes land in [-127, 127] with no clamp: |x*127/scale| ≤
  * 127 + one ulp, and floor(·+0.5) cannot reach ±128 from there. COSINE is
  * what makes per-vector scaling work: uniform scaling preserves direction,
  * so cosine over codes approximates cosine over floats with only the
  * rounding error (~1/254 per dimension) — no dequantization, no stored
  * scale needed for scoring.
  *
  * Everything here is floor-based double arithmetic on exact float→double
  * widenings, so the whole pipeline (encode → integer dot → cosine) is
  * replayable in ANSI SQL — the `sim_topk_sq8` driver oracle restates it
  * verbatim in DuckDB. `round()` is deliberately avoided: engines disagree
  * on half-even vs half-up; `floor(x + 0.5)` does not.
  *
  * Accumulation in [[cosine]] is index-ordered into exact integer sums, so
  * results are bit-reproducible across partitionings.
  */
object Sq8Ops {

  def encode(a: ArrayData): Array[Byte] = {
    val n = a.numElements()
    var maxabs = 0f
    var i = 0
    while (i < n) {
      val v = math.abs(a.getFloat(i))
      if (v > maxabs) maxabs = v
      i += 1
    }
    val out = new Array[Byte](n)
    if (maxabs != 0f) {
      val m = maxabs.toDouble
      i = 0
      while (i < n) {
        out(i) = math.floor(a.getFloat(i).toDouble * 127.0 / m + 0.5).toByte
        i += 1
      }
    }
    out
  }

  def cosine(a: Array[Byte], b: Array[Byte]): Double = {
    val n = math.min(a.length, b.length)
    var dot = 0L
    var na = 0L
    var nb = 0L
    var i = 0
    while (i < n) {
      val x = a(i).toLong
      val y = b(i).toLong
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    if (na == 0L || nb == 0L) 0.0
    else dot.toDouble / (math.sqrt(na.toDouble) * math.sqrt(nb.toDouble))
  }
}

/** `graft_sq8_encode(vec)` — quantize an `array<float>` to int8 codes
  * (`binary`, one signed byte per dimension).
  */
case class Sq8EncodeExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_sq8_encode"

  override def nullSafeEval(a: Any): Any = Sq8Ops.encode(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.Sq8Ops.encode($a)")

  override protected def withNewChildInternal(c: Expression): Sq8EncodeExpr = copy(child = c)
}

/** `graft_sq8_cosine(a, b)` — cosine over two SQ8 code vectors; 0.0 when
  * either is all-zero.
  */
case class Sq8CosineExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_sq8_cosine"

  override def nullSafeEval(a: Any, b: Any): Any =
    Sq8Ops.cosine(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Sq8Ops.cosine($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Sq8CosineExpr =
    copy(left = l, right = r)
}
