package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.graft.CodegenBridge
import org.apache.spark.sql.graft.CodegenBridge.KernelAudit

import graft.expressions.{LongDotProduct, QuantizedDotProduct}

/** ANN-kernel observability: is the codegen'd dot-product kernel actually
  * engaged in an executed plan, or did whole-stage codegen silently fall
  * back to the ~30×-slower interpreted `nullSafeEval` path?
  *
  * Round-8 motivation: the round-7 driver bench ran the five IVF/LSH ANN
  * queries 5–8× their recorded means while the median query skew was only
  * 1.10×, and "kernel not codegen'd in that environment" was one of two
  * candidate mechanisms with zero observability. [[audit]] makes it a
  * measurable fact in ANY environment: Bench emits it per ANN query and
  * PlanShapeSpec pins `healthy` at build time.
  */
object KernelProbe {

  /** The two hot-path dot kernels (VectorFunctions.dotQF / dotLL). */
  private def isKernel(e: org.apache.spark.sql.catalyst.expressions.Expression): Boolean =
    e match {
      case _: QuantizedDotProduct | _: LongDotProduct => true
      case _ => false
    }

  /** Audit a DataFrame's OWN executed plan. `df.count()` would not do:
    * it builds a separate QueryExecution, leaving this df's AQE plan
    * un-finalized (and codegen never collapsed into it) — so the audit
    * executes `df.queryExecution.toRdd` itself, then walks the finalized
    * plan.
    */
  def audit(df: DataFrame): KernelAudit = {
    df.queryExecution.toRdd.count()
    CodegenBridge.kernelAudit(df, isKernel)
  }
}
