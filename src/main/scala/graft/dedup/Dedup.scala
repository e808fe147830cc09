package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Deduplication operators for the LLM-data-pipeline surface.
  *
  * Scale notes (these run over 100 TB corpora):
  *  - exact: one shuffle on the 128-bit content hash; never on raw text.
  *  - ngramJaccardPairs: candidate pairs are generated ONLY within
  *    blocking buckets (never a global cross join); bucket size is
  *    bounded by construction (lang × length band).
  *  - minhashLsh: the classic shingle → minhash → band-bucket →
  *    bucket-join pipeline; the only shuffle keys are (band, bandHash),
  *    and oversized buckets (degenerate content) are capped.
  *  - simhash: 64-bit signature; candidate pairs via 16-bit chunk
  *    blocking (any pair within Hamming distance 3 shares ≥1 of 4
  *    exact chunks — pigeonhole), then exact Hamming verify.
  */
object Dedup {

  /** Exact dedup on normalized content hash: canonical id = min doc id
    * per group (deterministic survivor pick).
    */
  def exact(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    docs
      .select(md5(normalize(col(textCol))).as("fp"), col(idCol))
      .groupBy("fp")
      .agg(min(col(idCol)).as("canonical_id"), count(lit(1)).as("n_docs"))

  /** Near-dup pairs by exact word-k-gram Jaccard within blocking
    * buckets. Jaccard = |A∩B| / |A∪B| over distinct shingles.
    */
  def ngramJaccardPairs(
      docs: DataFrame,
      k: Int,
      threshold: Double,
      blockCols: Seq[Column],
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val base = docs.select(
      (col(idCol) +: shingles(col(textCol), k).as("sh") +:
        blockCols.zipWithIndex.map { case (c, i) => c.as(s"blk$i") }): _*)
    val a = base.columns.foldLeft(base)((d, c) => d.withColumnRenamed(c, s"a_$c"))
    val b = base.columns.foldLeft(base)((d, c) => d.withColumnRenamed(c, s"b_$c"))
    val blockEq = blockCols.indices
      .map(i => col(s"a_blk$i") === col(s"b_blk$i")).reduce(_ && _)
    val inter = size(array_intersect(col("a_sh"), col("b_sh"))).cast("double")
    val uni = size(array_union(col("a_sh"), col("b_sh"))).cast("double")
    a.join(b, blockEq && col(s"a_$idCol") < col(s"b_$idCol"))
      .withColumn("jaccard", inter / uni)
      .filter(col("jaccard") >= threshold)
      .select(col(s"a_$idCol").as("a_id"), col(s"b_$idCol").as("b_id"),
        col("jaccard"))
  }

  /** MinHash signature: for each of nHashes hash families, the min
    * over shingles of a deterministic 60-bit integer derived from
    * md5(shingle # seed). Pure column expressions.
    */
  def minhashSig(sh: Column, nHashes: Int): Column =
    array((0 until nHashes).map { seed =>
      array_min(transform(sh, s =>
        conv(substring(md5(concat(s, lit("#"), lit(seed))), 1, 15), 16, 10)
          .cast("long")))
    }: _*)

  /** MinHash + LSH near-dup candidate pairs, verified by exact
    * Jaccard. nBands × rowsPerBand = signature length; a pair is a
    * candidate iff some band of the signature matches exactly.
    */
  def minhashLshPairs(
      docs: DataFrame,
      k: Int,
      nBands: Int,
      rowsPerBand: Int,
      verifyThreshold: Double,
      maxBucket: Int = 1000,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val nH = nBands * rowsPerBand
    val base = docs
      .select(col(idCol), shingles(col(textCol), k).as("sh"))
      .withColumn("sig", minhashSig(col("sh"), nH))
    // explode into (band, bandKey) — shuffle key is the band bucket
    val banded = base.select(
      col(idCol), col("sh"),
      posexplode(transform(sequence(lit(0), lit(nBands - 1)), b =>
        concat_ws(",", slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand))))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "band_key")
    // cap degenerate buckets (e.g. empty/boilerplate docs) to bound skew
    val bucketed = banded
      .withColumn("__bn", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("band", "band_key")))
      .filter(col("__bn") <= maxBucket)
    val a = bucketed.select(col("band"), col("band_key"),
      col(idCol).as("a_id"), col("sh").as("a_sh"))
    val b = bucketed.select(col("band"), col("band_key"),
      col(idCol).as("b_id"), col("sh").as("b_sh"))
    val cand = a.join(b, Seq("band", "band_key"))
      .filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id", "a_sh", "b_sh").distinct()
    val inter = size(array_intersect(col("a_sh"), col("b_sh"))).cast("double")
    val uni = size(array_union(col("a_sh"), col("b_sh"))).cast("double")
    cand.withColumn("jaccard", inter / uni)
      .filter(col("jaccard") >= verifyThreshold)
      .select("a_id", "b_id", "jaccard")
  }

  /** 64-bit SimHash from word tokens: bit j of the signature is the
    * sign of Σ_tokens (bit j of xxhash64(token) ? +1 : −1).
    */
  def simhash64(tokens: Column): Column = {
    val bits = (0 until 64).map { j =>
      val contrib = aggregate(
        transform(tokens, t =>
          when(shiftright(xxhash64(t), j).bitwiseAND(1) === 1, 1).otherwise(-1)),
        lit(0), (acc, v) => acc + v)
      when(contrib >= 0, shiftleft(lit(1L), j)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** SimHash near-dup pairs with Hamming distance ≤ maxHamming (< 16),
    * candidates via 16-bit chunk blocking.
    */
  def simhashPairs(
      docs: DataFrame,
      maxHamming: Int,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    require(maxHamming < 4, "chunk blocking assumes maxHamming ≤ 3 over 4 chunks")
    val base = docs.select(col(idCol),
      simhash64(words(col(textCol))).as("sh64"))
    val chunked = base.select(col(idCol), col("sh64"),
      posexplode(array((0 until 4).map(c =>
        shiftrightunsigned(col("sh64"), c * 16).bitwiseAND(0xffffL)): _*)))
      .withColumnRenamed("pos", "chunk").withColumnRenamed("col", "chunk_val")
    val a = chunked.select(col("chunk"), col("chunk_val"),
      col(idCol).as("a_id"), col("sh64").as("a_sh"))
    val b = chunked.select(col("chunk"), col("chunk_val"),
      col(idCol).as("b_id"), col("sh64").as("b_sh"))
    a.join(b, Seq("chunk", "chunk_val"))
      .filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id", "a_sh", "b_sh").distinct()
      .withColumn("hamming", bit_count(col("a_sh").bitwiseXOR(col("b_sh"))))
      .filter(col("hamming") <= maxHamming)
      .select("a_id", "b_id", "hamming")
  }

  /** Embedding-cosine near-dup pairs within blocking buckets. */
  def embeddingPairs(
      embs: DataFrame,
      threshold: Double,
      blockCol: Column,
      vecCol: String = "embedding",
      idCol: String = "vec_id"): DataFrame = {
    import graft.functions.VectorFunctions._
    val base = embs.select(col(idCol), col(vecCol).as("v"), blockCol.as("blk"))
    val a = base.select(col("blk"), col(idCol).as("a_id"), col("v").as("a_v"))
    val b = base.select(col("blk"), col(idCol).as("b_id"), col("v").as("b_v"))
    a.join(b, Seq("blk"))
      .filter(col("a_id") < col("b_id"))
      .withColumn("cos", cosine(col("a_v"), col("b_v")))
      .filter(col("cos") >= threshold)
      .select(col("a_id"), col("b_id"), round(col("cos"), 6).as("cos"))
  }
}
