package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Release the block-manager storage behind an EAGER `localCheckpoint`
  * once every consumer of the frame has materialized (optimization guide
  * §5: caching competes with execution memory — unpersist when done).
  *
  * Why this exists: `spark.catalog.clearCache()` — what the bench calls
  * between queries — releases only `Dataset.persist` entries, NOT the
  * RDD-level blocks a `localCheckpoint(true)` pins. Across a long
  * session (the 274-query bench, a streaming deployment's micro-batches)
  * those blocks accumulate in the block manager until the ContextCleaner
  * happens to GC the dead RDD references; VERDICT r17 measured an
  * UNTOUCHED checkpoint-heavy query (`sim_nndescent`) regressing 2×
  * from exactly this accumulation. Iterative operators therefore release
  * each superseded round/hop frame as soon as its successor checkpoint
  * has materialized, and serve operators release their staged corpora /
  * adjacency levels when the serve's (small, checkpointed) result frame
  * is in hand.
  *
  * Safety contract: a local checkpoint's lineage is truncated at
  * materialization, so a released frame can never be recomputed — call
  * this ONLY on frames that are provably dead: every row a consumer
  * needs has already been copied into a newer eager checkpoint, and no
  * returned plan references the frame. (This is the same failure domain
  * `localCheckpoint` itself accepts: lost blocks are unrecoverable.)
  */
private[graft] object CheckpointLease {

  /** Unpersist the RDD blocks behind every `LogicalRDD` leaf of `df`'s
    * plan (non-blocking). `df` must be the checkpointed frame itself or
    * a narrow projection over it — passing a wider plan would release
    * every checkpoint it scans.
    */
  def release(df: DataFrame): Unit =
    df.queryExecution.logical.foreach {
      case lr: LogicalRDD => lr.rdd.unpersist(blocking = false)
      case _              => ()
    }
}
