package graft.tsdb

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

/** Store configuration.
  *
  * Mirrors the reference's `initialize(orderedPartitionWidth, purgeQueName)`
  * surface (reference: /root/reference/index.js:46-62): a store is identified
  * by the SHA-256 of its settings, so stores with different settings live in
  * disjoint namespaces (index.js:48,149-155). Here the namespace is a
  * sub-directory of the store root rather than a Redis key prefix.
  *
  * @param partitionWidth width of a time partition in sort-key units
  *                       (reference default 120000 ms, index.js:46)
  * @param purgeQueueName logical name of the purge staging queue
  *                       (index.js:46)
  * @param version        settings-format version, part of the namespace hash
  *                       (index.js:47)
  */
final case class StoreSettings(
    partitionWidth: Long = 120000L,
    purgeQueueName: String = "Purge",
    version: Long = 1L) {
  require(partitionWidth > 0, "partitionWidth must be positive")

  /** Canonical JSON used for hashing — key order is fixed so the hash is
    * stable (the reference hashes `JSON.stringify` of an object literal,
    * index.js:47,149-151).
    */
  def canonicalJson: String =
    s"""{"version":$version,"partitionWidth":$partitionWidth,"purgeQueueName":"$purgeQueueName"}"""

  /** SHA-256 namespace hash (index.js:149-151). */
  lazy val settingsHash: String = {
    val md = MessageDigest.getInstance("SHA-256")
    md.update(canonicalJson.getBytes(StandardCharsets.UTF_8))
    md.digest().map("%02x".format(_)).mkString
  }
}

object Limits {
  /** Max samples per write batch (reference `safeMaxItemLimit`, index.js:12). */
  val MaxSamplesPerWrite = 2000
  /** Max tags per indexed read (reference `safeIndexedTagsRead`, index.js:13). */
  val MaxTagsPerRead = 100
  /** Max tag-name length (reference `SafeKeyNameLength`, index.js:15). */
  val MaxKeyNameLength = 200
  /** Separator between tag and partition start in a partition name
    * (reference `Seperator` "-", index.js:14,122).
    */
  val Separator = "-"
  /** L0 batch-file count that triggers an automatic flush into the
    * Hive-partitioned tier (bounds point-read fan-in; the LSM
    * memtable-size analog).
    */
  val L0FlushFileCount = 64
  /** Point-read fast path only engages when the pruned candidate file set
    * is at most this many bytes; larger scans go through Spark.
    */
  val FastPathMaxBytes: Long = 64L * 1024 * 1024
  /** Test seam: when >= 0 overrides [[FastPathMaxBytes]] so specs can
    * force the Spark read path on small fixtures.
    */
  @volatile private[graft] var fastPathMaxBytesOverride: Long = -1L
  private[graft] def fastPathMaxBytes: Long =
    if (fastPathMaxBytesOverride >= 0L) fastPathMaxBytesOverride
    else FastPathMaxBytes
  /** L0 flushes at or below this volume regroup driver-side (parquet-java);
    * larger flushes run as a distributed partitioned append.
    */
  val DirectFlushMaxBytes: Long = 128L * 1024 * 1024
  /** Streaming micro-batches above this row count ingest via the
    * executor-parallel bulk lane (`writeSamplesDistributed`) instead of
    * the driver L0 path.
    */
  val DistributedWriteRows: Long = 100000L
  /** File-name prefix of every REWRITE-lane publish (flush/compact/ack/
    * delete survivors) — Delta's `dataChange=false` bit encoded in the
    * name, the contract `graft-store-tail` relies on to emit each
    * new-data file exactly once. See
    * [[TimeSeriesStore.RewritePrefix]] for the full discipline.
    */
  val RewritePrefix = "rw-"
}
