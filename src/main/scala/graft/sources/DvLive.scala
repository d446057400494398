package graft.sources

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression,
  Predicate}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.SerializableConfiguration

/** Native codegen'd deletion-vector membership test — the scan-side DV
  * regime's row filter as a Catalyst [[Expression]], so the read stays
  * inside WholeStageCodegen (a `functions.udf` wrapper pays per-row boxing
  * plus a converter round-trip and—worse—reads as an opaque black box to
  * anyone auditing the plan). `left` is the file leaf (`__file`), `right`
  * the row ordinal (`__ord`); TRUE ⇔ the row is live. All heavy lifting
  * stays in [[DvScanFilter]] (thread-local sidecar LRU, binary search);
  * the generated code is one static call per row.
  *
  * The broadcasts ride Catalyst references (`addReferenceObj`), so the
  * driver ships O(manifest) bytes however many rows are dead — the same
  * contract as the UDF form this replaces.
  */
case class DvLive(left: Expression, right: Expression,
    conf: Broadcast[SerializableConfiguration], dvDir: String,
    dv: Broadcast[Map[String, String]])
  extends BinaryExpression with Predicate {

  // inputs are the engine-tagged `__file` (string) / `__ord` (long)
  // metadata columns — construction is internal, never user-facing SQL

  override def prettyName: String = "dv_live"

  override protected def nullSafeEval(file: Any, ord: Any): Any =
    !DvScanFilter.dead(conf.value.value, dvDir, dv.value,
      file.asInstanceOf[UTF8String].toString, ord.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val confRef = ctx.addReferenceObj("dvConf", conf,
      classOf[Broadcast[SerializableConfiguration]].getName)
    val dvRef = ctx.addReferenceObj("dvMap", dv,
      classOf[Broadcast[Map[String, String]]].getName)
    val dirRef = ctx.addReferenceObj("dvDir", dvDir, "java.lang.String")
    nullSafeCodeGen(ctx, ev, (f, o) =>
      s"""${ev.value} = !graft.sources.DvScanFilter.dead(
         |  ((org.apache.spark.util.SerializableConfiguration) $confRef.value()).value(),
         |  $dirRef,
         |  (scala.collection.immutable.Map) $dvRef.value(),
         |  $f.toString(), $o);""".stripMargin)
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}
