package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** As-of (backward) join: for every left row, the latest right row with
  * `rightTs <= leftTs` within the same key group — the canonical
  * time-series enrichment operator (e.g. "the last login before each
  * purchase").
  *
  * Implementation is MERGE-based, not pair-based: both sides are unioned
  * into one stream, shuffled once on the key, and a running
  * `last(right, ignoreNulls)` window carries the most recent right row
  * forward. Cost is O(n log n) per key group — there is no
  * candidate-pair blowup like the naive range-join + argmax plan, so it
  * survives 100 TB-scale key groups with millions of rows.
  */
object AsOfJoin {

  /** @param keys        equality keys (both sides must have them)
    * @param leftTs      left event-time column (numeric)
    * @param rightTs     right event-time column (numeric)
    * @param tiebreak    column present on both sides ordering same-ts rows
    *                    deterministically
    * @param rightPrefix prefix for the right side's columns in the output
    * @return left rows (all columns) + prefixed right columns of the as-of
    *         match (null when no right row precedes)
    */
  def backward(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, tiebreak: String,
      rightPrefix: String = "r_"): DataFrame = {
    val lStruct = StructType(left.schema.fields)
    val rStruct = StructType(right.schema.fields)
    val lSide = left.select(
      keys.map(col) ++ Seq(
        col(leftTs).cast("long").as("__t"),
        lit(1).as("__isL"),
        col(tiebreak).cast("long").as("__tb"),
        struct(left.columns.map(col): _*).as("__l"),
        lit(null).cast(rStruct).as("__r")): _*)
    val rSide = right.select(
      keys.map(col) ++ Seq(
        col(rightTs).cast("long").as("__t"),
        lit(0).as("__isL"),
        col(tiebreak).cast("long").as("__tb"),
        lit(null).cast(lStruct).as("__l"),
        struct(right.columns.map(col): _*).as("__r")): _*)
    // right rows sort before left rows at equal __t, so "<=" includes ties
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__isL"), col("__tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val merged = lSide.unionByName(rSide)
      .withColumn("__asof", last(col("__r"), ignoreNulls = true).over(w))
      .where(col("__isL") === 1)
    val leftCols = left.columns.map(c => col(s"__l.$c").as(c))
    val rightCols = right.columns.map(c => col(s"__asof.$c").as(s"$rightPrefix$c"))
    merged.select(leftCols ++ rightCols: _*)
  }

  /** Forward variant: the earliest right row with `rightTs >= leftTs`;
    * among right rows tied on `rightTs` the SMALLEST tiebreak wins (the
    * mirror of backward's largest-wins — both pick the row "closest" to
    * the left event, with the tiebreak ordered the same direction as
    * time). Implemented by running [[backward]] over negated time AND
    * negated tiebreak (negating only time would silently flip tie
    * resolution to largest-tiebreak-wins).
    */
  def forward(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, tiebreak: String,
      rightPrefix: String = "r_"): DataFrame = {
    def neg(df: DataFrame, cs: String*): DataFrame =
      cs.foldLeft(df)((d, c) => d.withColumn(c, -col(c).cast("long")))
    val out = backward(neg(left, leftTs, tiebreak), neg(right, rightTs, tiebreak),
      keys, leftTs, rightTs, tiebreak, rightPrefix)
    // un-negate every emitted column that was negated on the way in
    out.withColumn(leftTs, -col(leftTs))
      .withColumn(tiebreak, -col(tiebreak))
      .withColumn(s"$rightPrefix$rightTs",
        when(col(s"$rightPrefix$rightTs").isNotNull, -col(s"$rightPrefix$rightTs")))
      .withColumn(s"$rightPrefix$tiebreak",
        when(col(s"$rightPrefix$tiebreak").isNotNull, -col(s"$rightPrefix$tiebreak")))
  }

  /** Nearest-in-time as-of join: the right row minimizing
    * `|leftTs − rightTs|` within the key group. An equal-distance tie (and
    * the zero-distance case) resolves to the BACKWARD match, so the result
    * is deterministic. Composition of [[backward]] and [[forward]] — two
    * merge passes joined back on the left row, never a pair join.
    *
    * The left rows must be unique (they are joined back on all their
    * columns to stitch the two directions together).
    */
  def nearest(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, tiebreak: String,
      rightPrefix: String = "r_"): DataFrame = {
    val bwd = backward(left, right, keys, leftTs, rightTs, tiebreak, "__b_")
    val fwd = forward(left, right, keys, leftTs, rightTs, tiebreak, "__f_")
    val joined = bwd.join(fwd, left.columns.toIndexedSeq)
    val bTs = col(s"__b_$rightTs")
    val fTs = col(s"__f_$rightTs")
    val pickB = fTs.isNull ||
      (bTs.isNotNull && (col(leftTs) - bTs) <= (fTs - col(leftTs)))
    val rightCols = right.columns.map { rc =>
      when(pickB, col(s"__b_$rc")).otherwise(col(s"__f_$rc"))
        .as(s"$rightPrefix$rc")
    }
    joined.select(left.columns.map(col) ++ rightCols: _*)
  }
}
