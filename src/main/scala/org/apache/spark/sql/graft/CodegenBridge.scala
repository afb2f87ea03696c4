package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator
import org.apache.spark.sql.execution.{InputAdapter, SparkPlan, WholeStageCodegenExec}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

/** Codegen-engagement audit (sibling of [[ColumnBridge]]/[[PlanBridge]]).
  *
  * The ANN kernels ([[graft.expressions.QuantizedDotProduct]] /
  * `LongDotProduct`) are ~30× faster codegen'd than interpreted, so a
  * silent whole-stage-codegen fallback turns a 1 s probe into an 8 s one
  * with no visible signal. This bridge makes engagement OBSERVABLE: walk
  * the executed plan (descending through AQE wrappers), count
  * kernel-bearing expressions inside vs outside `WholeStageCodegenExec`
  * spans, and TRY-COMPILE each kernel-bearing span with the same
  * `CodeGenerator.compile` the executor uses (result is cached by code
  * text, so the probe costs one compile at most — and zero if execution
  * already compiled it).
  */
object CodegenBridge {

  /** @param inCodegen   kernel occurrences inside a WholeStageCodegen span
    * @param interpreted kernel occurrences on nodes OUTSIDE any span
    *                    (these run through `nullSafeEval` per row)
    * @param spansCompiled kernel-bearing spans that compile cleanly
    * @param spansFailed   kernel-bearing spans whose generated code does
    *                      NOT compile (executor falls back to interpreted)
    */
  final case class KernelAudit(inCodegen: Int, interpreted: Int,
      spansCompiled: Int, spansFailed: Int) {
    def healthy: Boolean = interpreted == 0 && spansFailed == 0 && inCodegen > 0
    def render: String =
      s"inCodegen=$inCodegen interpreted=$interpreted " +
        s"spansCompiled=$spansCompiled spansFailed=$spansFailed"
  }

  /** Audit `df`'s EXECUTED plan (run an action first so AQE has
    * finalized) for expressions matching `isKernel`.
    */
  def kernelAudit(df: DataFrame, isKernel: Expression => Boolean): KernelAudit = {
    var inCg, interp, ok, failed = 0

    def exprKernels(p: SparkPlan): Int =
      p.expressions.iterator.map(_.collect { case k if isKernel(k) => k }.size).sum

    def walk(p: SparkPlan, handleSpan: Boolean): Unit = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan, handleSpan)
      case q: QueryStageExec => walk(q.plan, handleSpan)
      case w: WholeStageCodegenExec if handleSpan =>
        var spanKernels = 0
        def inner(s: SparkPlan): Unit = s match {
          case i: InputAdapter => walk(i.child, true) // outside the span
          case q: QueryStageExec => walk(q, true)
          case a: AdaptiveSparkPlanExec => walk(a, true)
          case other =>
            spanKernels += exprKernels(other)
            other.children.foreach(inner)
        }
        inner(w.child)
        inCg += spanKernels
        if (spanKernels > 0) {
          try { CodeGenerator.compile(w.doCodeGen()._2); ok += 1 }
          catch { case _: Throwable => failed += 1 }
        }
      case leaf: org.apache.spark.sql.execution.LeafExecNode =>
        // scans carry pushdown METADATA (dataFilters and friends) that can
        // textually contain kernels without ever evaluating them per row —
        // not an interpreted-execution signal
        ()
      case other =>
        interp += exprKernels(other)
        other.children.foreach(walk(_, handleSpan))
    }

    walk(df.queryExecution.executedPlan, handleSpan = true)
    KernelAudit(inCg, interp, ok, failed)
  }
}
