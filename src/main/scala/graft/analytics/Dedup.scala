package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._
import graft.functions.VectorFunctions._

/** Document deduplication operators for large-scale training-data curation:
  * exact, MinHash+LSH, SimHash, exact n-gram Jaccard, and embedding-cosine
  * near-dup. All are declarative DataFrame plans:
  *
  *  - candidate generation is always a key-equality join (content hash,
  *    LSH band, SimHash block) so it shuffles on a high-cardinality key and
  *    scales linearly — never an all-pairs cross join;
  *  - verification (exact Jaccard / Hamming) runs only on candidate pairs;
  *  - hashes are md5-derived and engine-portable (oracle-checkable).
  */
object Dedup {

  /** Exact content dedup by full-text hash: every doc annotated with its
    * content group, the group's keeper (min doc_id — deterministic) and
    * group size. One shuffle on the content hash.
    */
  def exact(docs: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("content_hash"))
    docs.select(col("doc_id"), md5(col("text")).as("content_hash"))
      .withColumn("keeper_id", min(col("doc_id")).over(w))
      .withColumn("group_size", count(lit(1)).over(w))
      .withColumn("is_dup", (col("doc_id") =!= col("keeper_id")).cast("int"))
  }

  /** Distinct word-3-gram shingles per document (the basis of the Jaccard
    * and MinHash operators).
    */
  def shingleSet(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(shingles3(words(col("text")))).as("shingle"))
      .distinct()

  /** Exact n-gram Jaccard near-dup pairs with similarity ≥ `threshold`.
    * Candidates come from a shingle-equality join (shuffle on shingle),
    * then |A∩B| / (|A|+|B|-|A∩B|) is computed from exact counts. Documents
    * sharing no shingle never pair — no quadratic blowup as long as
    * shingle document-frequency is bounded (drop ultra-common shingles
    * upstream if the corpus has them).
    */
  def jaccardPairs(docs: DataFrame, threshold: Double): DataFrame = {
    val sh = shingleSet(docs)
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val common = sh.as("a").join(sh.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_common"))
    common
      .join(sizes.select(col("doc_id").as("doc_a"), col("n_sh").as("n_a")), "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("n_sh").as("n_b")), "doc_b")
      .withColumn("jaccard",
        col("n_common").cast("double") /
          (col("n_a") + col("n_b") - col("n_common")).cast("double"))
      .where(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "n_common", "n_a", "n_b", "jaccard")
  }

  /** MinHash signatures: for seeds 0..k-1, the min over the doc's shingles
    * of md5(seed || ':' || shingle). Returns (doc_id, seed, mh).
    */
  def minhashSignatures(docs: DataFrame, k: Int): DataFrame =
    shingleSet(docs)
      .crossJoin(broadcast(
        docs.sparkSession.range(k).select(col("id").cast("int").as("seed"))))
      .groupBy("doc_id", "seed")
      .agg(min(md5(concat(col("seed").cast("string"), lit(":"), col("shingle")))).as("mh"))

  /** MinHash + LSH banding: k seeds split into `bands` bands; documents
    * sharing any band signature become candidate pairs; each candidate is
    * then scored by its full-signature agreement (est. Jaccard = matching
    * seeds / k). The band join is the only shuffle that touches pairs.
    */
  def minhashCandidates(docs: DataFrame, k: Int = 12, bands: Int = 4): DataFrame = {
    require(k % bands == 0, "k must divide into equal bands")
    val r = k / bands
    val sig = minhashSignatures(docs, k).cache()
    val bandSig = sig
      .withColumn("band", col("seed").divide(r).cast("int"))
      .groupBy("doc_id", "band")
      .agg(md5(concat_ws(",",
        transform(array_sort(collect_list(struct(col("seed"), col("mh")))),
          x => x.getField("mh")))).as("band_sig"))
    val cand = bandSig.as("x").join(bandSig.as("y"),
        col("x.band") === col("y.band") && col("x.band_sig") === col("y.band_sig") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    val sa = sig.select(col("doc_id").as("doc_a"), col("seed"), col("mh").as("mh_a"))
    val sb = sig.select(col("doc_id").as("doc_b2"), col("seed").as("seed_b"), col("mh").as("mh_b"))
    cand
      .join(sa, Seq("doc_a"))
      .join(sb, col("doc_b") === col("doc_b2") && col("seed") === col("seed_b"))
      .groupBy("doc_a", "doc_b")
      .agg(sum(when(col("mh_a") === col("mh_b"), 1).otherwise(0)).as("n_matching"))
      .withColumn("est_jaccard", col("n_matching").cast("double") / k)
  }

  /** SimHash fingerprints (32-bit as a bit-string) per document. */
  def simhashFingerprints(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), simhash32(words(col("text"))).as("fp"))

  /** SimHash near-dup pairs: candidates share at least one of 4 8-bit
    * blocks (catches every pair with Hamming ≤ 3 exactly; higher distances
    * probabilistically), verified by full Hamming ≤ `maxHamming` (default 3 = the certainty bound).
    */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    val fp = simhashFingerprints(docs)
    val blocks = fp.select(col("doc_id"), col("fp"),
        explode(sequence(lit(0), lit(3))).as("blk"))
      .withColumn("blk_sig", expr("substring(fp, blk * 8 + 1, 8)"))
    blocks.as("x").join(blocks.as("y"),
        col("x.blk") === col("y.blk") && col("x.blk_sig") === col("y.blk_sig") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        col("x.fp").as("fp_a"), col("y.fp").as("fp_b"))
      .distinct()
      .withColumn("hamming", hammingStr(col("fp_a"), col("fp_b")))
      .where(col("hamming") <= maxHamming)
      .select("doc_a", "doc_b", "hamming")
  }

  /** Embedding-cosine near-dup pairs within a blocking key (label):
    * exact quantized-integer cosine over candidate pairs from the
    * label-equality join.
    */
  def embeddingNearDups(emb: DataFrame, threshold: Double): DataFrame = {
    val q = emb.select(col("vec_id"), col("label"), quantize(col("embedding")).as("v"))
      .withColumn("nrm", normSqQ(col("v")))
    q.as("a").join(q.as("b"),
        col("a.label") === col("b.label") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        col("a.label").as("label"),
        cosineQ(dotQ(col("a.v"), col("b.v")), col("a.nrm"), col("b.nrm")).as("cos"))
      .where(col("cos") >= threshold)
  }
}
