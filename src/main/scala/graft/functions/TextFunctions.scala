package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable text primitives.
  *
  * Every construct here has an exact ANSI-SQL twin (used in the DuckDB
  * oracles): md5 hex, `ascii`/`substring`, integer arithmetic — no
  * engine-specific hash functions (Spark's murmur `hash()` and DuckDB's
  * `hash()` disagree), no float accumulation. All are `functions._`
  * compositions, so they stay inside whole-stage codegen — no UDFs.
  */
object TextFunctions {

  /** Whitespace tokenization (single-space split — the documents table is
    * single-space normalized).
    */
  def words(text: Column): Column = split(text, " ")

  /** Word n-gram shingles (n=3), empty for docs shorter than n words.
    * 0-based Spark array indexing; the SQL twin uses 1-based `range`.
    */
  def shingles3(ws: Column): Column =
    when(size(ws) >= 3,
      transform(sequence(lit(0), size(ws) - 3),
        i => concat_ws(" ", element_at(ws, i + 1), element_at(ws, i + 2), element_at(ws, i + 3))))
      .otherwise(array().cast("array<string>"))

  /** A 24-bit integer hash of a word: first 3 md5 hex chars as bytes.
    * Portable: `ascii(substr(md5(w), i, 1))` is identical in DuckDB.
    */
  def wordHash(w: Column): Column =
    (ascii(substring(md5(w), 1, 1)) * 65536 +
      ascii(substring(md5(w), 2, 1)) * 256 +
      ascii(substring(md5(w), 3, 1))).cast("long")

  /** SimHash bit j (1-based, j in 1..32): parity of the j-th md5 hex char
    * of the token. ±1 contribution for sign aggregation.
    */
  private def bitContribution(w: Column, j: Int): Column =
    when(ascii(substring(md5(w), j, 1)) % 2 === 1, 1).otherwise(-1)

  /** 32-bit SimHash fingerprint of a token array as a '0'/'1' string.
    * Computed entirely inside one projection (no shuffle): for each bit,
    * sum the ±1 contributions over all token instances; positive → '1'.
    */
  def simhash32(ws: Column): Column = {
    val bits = (1 to 32).map { j =>
      val s = aggregate(ws, lit(0),
        (acc, w) => acc + bitContribution(w, j))
      when(s > 0, lit("1")).otherwise(lit("0"))
    }
    concat(bits: _*)
  }

  /** Hamming distance between two equal-length bit-string fingerprints. */
  def hammingStr(a: Column, b: Column, n: Int = 32): Column =
    aggregate(sequence(lit(1), lit(n)), lit(0),
      (acc, j) => acc + when(charAt(a, j) =!= charAt(b, j), 1).otherwise(0))

  /** One character at a dynamic (1-based) position. */
  private def charAt(s: Column, j: Column): Column = s.substr(j.cast("int"), lit(1))

  /** Polynomial rolling-hash document fingerprint over the word sequence —
    * ORDER-SENSITIVE (unlike the shingle-set ops): h = (h*1000003 +
    * wordHash) mod 2147483647, folded left-to-right. The SQL twin uses
    * `list_reduce` with a prepended 0 seed.
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
