package graft.analytics

import org.apache.spark.sql.Dataset

/** Single enforcement point for the engine's driver-materialization
  * contract: any driver-side collect must fit inside a fixed fraction of
  * the ACTUAL driver heap (`Runtime.maxMemory`, which tracks
  * `spark.driver.memory`), and every caller must have a distributed
  * fallback for when it doesn't. The two operators that materialize on
  * the driver — union-find's edge list ([[Dedup.duplicateClusters]]) and
  * the per-Lloyd-round centroid table
  * ([[Similarity]]'s k-means) — both route through here, so the scale
  * contract lives in one audited place instead of per-operator ad-hoc
  * caps.
  */
object DriverBudget {

  /** Test seam: when >= 0, overrides the computed heap budget so specs
    * can force the distributed fallback without a tiny-heap JVM.
    */
  @volatile private[graft] var budgetOverrideBytes: Long = -1L

  /** Bytes of driver heap a single materialization may claim: 1/16 of
    * max heap — small enough that a handful of concurrent queries plus
    * Spark's own driver structures (task results, broadcast pieces)
    * still fit.
    */
  def budgetBytes: Long =
    if (budgetOverrideBytes >= 0L) budgetOverrideBytes
    else Runtime.getRuntime.maxMemory() / 16

  /** Rows affordable at `bytesPerRow`, clamped to `hardCap`. */
  def maxRows(bytesPerRow: Long, hardCap: Long = Long.MaxValue): Long =
    math.min(hardCap, budgetBytes / math.max(bytesPerRow, 1L))

  /** Branch observability (round-8 bench instrumentation): how many
    * [[collectWithin]] calls took the driver-collect fast path vs the
    * distributed fallback since the last [[resetBranchCounts]]. The
    * 8×-slower driver-bench ANN cluster had two candidate mechanisms and
    * neither was observable; this distinguishes the "fallback branch
    * fired" hypothesis in any environment.
    */
  private val localHits = new java.util.concurrent.atomic.AtomicLong(0L)
  private val fallbackHits = new java.util.concurrent.atomic.AtomicLong(0L)

  /** (driver-collect count, distributed-fallback count) since reset. */
  def branchCounts: (Long, Long) = (localHits.get, fallbackHits.get)

  def resetBranchCounts(): Unit = { localHits.set(0L); fallbackHits.set(0L) }

  /** Collects `ds` when `knownCount` rows at `bytesPerRow` fit the
    * budget; otherwise `None`, signalling the caller to run its
    * distributed fallback. `knownCount` must already be known (callers
    * have it from the cache-and-count they do anyway, or it is a fixed
    * parameter like k) — this guard never triggers an extra Spark job to
    * size its input.
    */
  def collectWithin[T](ds: Dataset[T], knownCount: Long, bytesPerRow: Long,
      hardCap: Long = Long.MaxValue): Option[Array[T]] =
    if (knownCount <= maxRows(bytesPerRow, hardCap)) {
      localHits.incrementAndGet()
      Some(ds.collect())
    } else {
      fallbackHits.incrementAndGet()
      None
    }
}
