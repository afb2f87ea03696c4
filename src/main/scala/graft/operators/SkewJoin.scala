package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salting for skewed equi-joins — the manual lever when AQE's runtime
  * skew-join split isn't available (e.g. the skew is in a broadcast-unable
  * build side, or the join feeds a stateful operator that pins
  * partitioning).
  *
  * A hot key that lands 10% of a 100 TB fact table in one shuffle
  * partition stalls the stage on one task; salting shards each key across
  * `factor` sub-partitions: the probe side gets a deterministic per-row
  * shard, the build side is replicated across all shards, and the join
  * result is provably identical to the unsalted join (every (probe row,
  * build row) pair still meets in exactly one shard).
  */
object SkewJoin {

  /** Equi-join `left.key == right.key` with the LEFT side salted (use when
    * left's key distribution is skewed and right is too big to broadcast
    * but small enough to replicate `factor`×).
    *
    * Only probe-side-preserving join types are accepted: the build (right)
    * side is replicated `factor`×, so a right-preserving type
    * (`right_outer`/`full_outer`) would emit each UNMATCHED right row once
    * per replica — not the unsalted result.
    */
  def salted(left: DataFrame, right: DataFrame, key: String, factor: Int,
      joinType: String = "inner"): DataFrame = {
    require(factor > 0, "salt factor must be positive")
    val normalized = joinType.toLowerCase.replace("_", "")
    require(Set("inner", "left", "leftouter", "leftsemi", "semi", "leftanti", "anti")
      .contains(normalized),
      s"joinType '$joinType' is not sound under build-side replication; " +
        "use inner/left_outer/left_semi/left_anti")
    // deterministic per-row shard: hash of the whole row spreads rows of
    // ONE hot key across shards (hashing only the key would keep them
    // together — the point is to split within a key)
    val sl = left.withColumn("__salt",
      pmod(xxhash64(struct(left.columns.map(col).toIndexedSeq: _*)), lit(factor)))
    val sr = right.withColumn("__salt",
      explode(array((0 until factor).map(i => lit(i.toLong)): _*)))
    // SHUFFLE_HASH on the build side: salting is for builds too big to
    // broadcast, so don't let the planner broadcast the factor×-replicated
    // relation (a single-threaded driver hash build); a shuffled hash join
    // builds factor× smaller per-task maps in parallel, and beats
    // sort-merge because the replicated side never needs sorting.
    sl.join(sr.hint("shuffle_hash"), Seq(key, "__salt"), joinType)
      .drop("__salt")
  }
}
