package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deduplication operators for training-data pipelines (SURVEY §2.5).
  *
  * All of these are expressed as shuffles over key columns — no driver-side
  * loops, no collect — so they scale horizontally: the dominant cost at
  * 100 TB is one token-explode (size ≈ corpus token count) plus hash
  * aggregations whose keys are doc ids / band buckets.
  */
object Dedup {

  /** Exact dedup by key columns: deterministic representative (min id) +
    * duplicate count per group. One hash aggregate; the dedup'd dataset is
    * recovered by semi-joining `keep_id` back against the source.
    */
  def exactByKey(df: DataFrame, keys: Seq[String], idCol: String): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))

  /** Distinct-token table: (id, blockCol?, tok). The explode is linear in
    * corpus size and partitions by document — the scan-side heavy step. */
  private def tokenTable(df: DataFrame, idCol: String, textCol: String,
                         extraCols: Seq[String] = Nil): DataFrame =
    df.select((idCol +: extraCols).map(col) :+
        explode(array_distinct(split(col(textCol), " "))).as("tok"): _*)

  /** Exact word-set Jaccard similarity for all document pairs sharing
    * `blockCol`, keeping pairs with jaccard >= threshold.
    *
    * |A∩B| via token-equi-join inside the block, |A∪B| = |A|+|B|-|A∩B|.
    * The block key bounds the pair space (realistic: source/domain/bucket);
    * at scale the same code runs with an LSH band as the block key — see
    * [[minHashLsh]].
    */
  def jaccardPairs(df: DataFrame, idCol: String, textCol: String,
                   blockCol: String, threshold: Double): DataFrame = {
    val toks = tokenTable(df, idCol, textCol, Seq(blockCol)).cache()
    val sizes = toks.groupBy(col(idCol)).agg(count(lit(1)).as("n"))
    val a = toks.select(col(idCol).as("doc_a"), col(blockCol).as("blk"), col("tok"))
    val b = toks.select(col(idCol).as("doc_b"), col(blockCol).as("blk_b"), col("tok").as("tok_b"))
    val inter = a.join(b, col("blk") === col("blk_b") && col("tok") === col("tok_b") &&
                          col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("n_inter"))
    val sa = sizes.select(col(idCol).as("doc_a"), col("n").as("n_a"))
    val sb = sizes.select(col(idCol).as("doc_b"), col("n").as("n_b"))
    val jac = col("n_inter").cast(DoubleType) /
      (col("n_a") + col("n_b") - col("n_inter")).cast(DoubleType)
    inter.join(sa, "doc_a").join(sb, "doc_b")
      .select(col("doc_a"), col("doc_b"), jac.as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** MinHash signatures: one row per doc, columns mh0..mh{n-1}.
    * Hash family: xxhash64(tok, seed=i) — i.e. n independent 64-bit hash
    * functions evaluated columnar-wise (no row explosion beyond the token
    * table; the n mins fold into a single hash aggregate).
    */
  def minHashSignatures(df: DataFrame, idCol: String, textCol: String,
                        numHashes: Int): DataFrame = {
    val toks = tokenTable(df, idCol, textCol)
    val mins = (0 until numHashes).map(i => min(xxhash64(col("tok"), lit(i))).as(s"mh$i"))
    toks.groupBy(col(idCol)).agg(mins.head, mins.tail: _*)
  }

  /** MinHash + LSH banding + exact-Jaccard verification.
    *
    * numHashes minhashes split into `bands` bands of numHashes/bands rows;
    * docs colliding on any band's hash become candidate pairs; candidates
    * are verified with exact word-set Jaccard (so precision is exact and
    * only recall depends on the banding parameters).
    *
    * Scale shape: signatures (1 row/doc) -> explode to `bands` rows/doc ->
    * self-join per (band, bandHash) bucket -> verify. Bucket sizes are the
    * skew risk; genuinely-duplicated content produces hot buckets, which
    * AQE skew-join splitting handles at runtime.
    */
  def minHashLsh(df: DataFrame, idCol: String, textCol: String,
                 numHashes: Int, bands: Int, jaccardThreshold: Double): DataFrame = {
    require(numHashes % bands == 0, "numHashes must be divisible by bands")
    val rowsPerBand = numHashes / bands
    val sigs = minHashSignatures(df, idCol, textCol, numHashes)
    // one row per (doc, band): bandHash = xxhash64 of the band's minhashes
    val bandRows = (0 until bands).map { b =>
      val cols = (0 until rowsPerBand).map(r => col(s"mh${b * rowsPerBand + r}"))
      sigs.select(col(idCol), lit(b).as("band"), xxhash64(cols: _*).as("band_hash"))
    }.reduce(_ unionAll _)
    val l = bandRows.select(col(idCol).as("doc_a"), col("band"), col("band_hash"))
    val r = bandRows.select(col(idCol).as("doc_b"), col("band").as("band_r"), col("band_hash").as("band_hash_r"))
    val candidates = l.join(r, col("band") === col("band_r") &&
        col("band_hash") === col("band_hash_r") && col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
    // verification: exact jaccard on the candidate pairs only
    val toks = tokenTable(df, idCol, textCol)
    val sizes = toks.groupBy(col(idCol)).agg(count(lit(1)).as("n"))
    val ta = toks.select(col(idCol).as("doc_a"), col("tok"))
    val tb = toks.select(col(idCol).as("doc_b2"), col("tok").as("tok_b"))
    val inter = candidates.join(ta, "doc_a").join(tb,
        col("doc_b") === col("doc_b2") && col("tok") === col("tok_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("n_inter"))
    val sa = sizes.select(col(idCol).as("doc_a"), col("n").as("n_a"))
    val sb = sizes.select(col(idCol).as("doc_b"), col("n").as("n_b"))
    val jac = col("n_inter").cast(DoubleType) /
      (col("n_a") + col("n_b") - col("n_inter")).cast(DoubleType)
    inter.join(sa, "doc_a").join(sb, "doc_b")
      .select(col("doc_a"), col("doc_b"), jac.as("jaccard"))
      .filter(col("jaccard") >= jaccardThreshold)
  }

  /** 64-bit SimHash per document + near-dup pairs with hamming distance <=
    * maxHamming, using 4x16-bit chunk banding for candidate generation
    * (pigeonhole: hamming <= 3 guarantees one identical chunk; for larger
    * maxHamming this is a recall-bounded approximation, verified exactly).
    */
  def simHash(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = tokenTable(df, idCol, textCol)
      .withColumn("h", xxhash64(col("tok")))
      .select(col(idCol), explode(sequence(lit(0), lit(63))).as("bit"), col("h"))
      .withColumn("vote",
        when(expr("(shiftright(h, CAST(bit AS INT)) & 1) = 1"), lit(1L)).otherwise(lit(-1L)))
      .groupBy(col(idCol), col("bit")).agg(sum(col("vote")).as("votes"))
      .withColumn("bitval", when(col("votes") > 0, expr("shiftleft(CAST(1 AS BIGINT), CAST(bit AS INT))")).otherwise(lit(0L)))
    toks.groupBy(col(idCol)).agg(sum(col("bitval")).as("simhash"))
  }

  def simHashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int): DataFrame = {
    val sigs = simHash(df, idCol, textCol)
    // 4 chunks of 16 bits as LSH bands
    val chunks = (0 until 4).map { c =>
      sigs.select(col(idCol), lit(c).as("chunk"),
        expr(s"(simhash >> ${c * 16}) & 65535").as("chunk_val"), col("simhash"))
    }.reduce(_ unionAll _)
    val l = chunks.select(col(idCol).as("doc_a"), col("chunk"), col("chunk_val"), col("simhash").as("sh_a"))
    val r = chunks.select(col(idCol).as("doc_b"), col("chunk").as("chunk_r"), col("chunk_val").as("chunk_val_r"), col("simhash").as("sh_b"))
    l.join(r, col("chunk") === col("chunk_r") && col("chunk_val") === col("chunk_val_r") &&
        col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b", "sh_a", "sh_b").distinct()
      .withColumn("hamming", bit_count(expr("sh_a ^ sh_b")).cast(IntegerType))
      .filter(col("hamming") <= maxHamming)
      .select("doc_a", "doc_b", "hamming")
  }
}
