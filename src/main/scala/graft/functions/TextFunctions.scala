package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable text primitives.
  *
  * Every construct here has an exact ANSI-SQL twin (used in the DuckDB
  * oracles): md5 hex, `ascii`/`substring`, integer arithmetic — no
  * engine-specific hash functions (Spark's murmur `hash()` and DuckDB's
  * `hash()` disagree), no float accumulation.
  *
  * Design rule for anything built on these: Catalyst higher-order-function
  * lambdas run INTERPRETED and re-evaluate inlined subexpressions per
  * element (a `split(text)` referenced inside a `transform` lambda
  * re-splits per access — measured quadratic). Multi-step text pipelines
  * must therefore be RELATIONAL (explode / window / groupBy — see
  * Dedup.shingleSet, Dedup.simhashFingerprints) rather than nested HOFs;
  * the helpers below are safe because each is evaluated once per row over
  * an already-materialized column.
  */
object TextFunctions {

  /** Whitespace tokenization (single-space split — the documents table is
    * single-space normalized).
    */
  def words(text: Column): Column = split(text, " ")

  /** A 24-bit integer hash of a word: first 3 md5 hex chars as bytes.
    * Portable: `ascii(substr(md5(w), i, 1))` is identical in DuckDB.
    */
  def wordHash(w: Column): Column =
    (ascii(substring(md5(w), 1, 1)) * 65536 +
      ascii(substring(md5(w), 2, 1)) * 256 +
      ascii(substring(md5(w), 3, 1))).cast("long")

  /** Polynomial rolling-hash document fingerprint over the word sequence —
    * ORDER-SENSITIVE (unlike the shingle-set ops): h = (h*1000003 +
    * wordHash) mod 2147483647, folded left-to-right. The SQL twin uses
    * `list_reduce` with a prepended 0 seed. (A single linear fold per row
    * — the one acceptable HOF use; see the object scaladoc.)
    */
  def rollingFingerprint(ws: Column): Column =
    aggregate(ws, lit(0L),
      (h, w) => (h * 1000003L + wordHash(w)) % 2147483647L)

  /** Stopword set used by quality scoring + language ID (subset of the
    * synthetic corpus vocabulary).
    */
  val Stopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in")

  def stopwordCount(ws: Column): Column =
    aggregate(ws, lit(0), (acc, w) =>
      acc + when(w.isInCollection(Stopwords), 1).otherwise(0))
}
