package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Near-duplicate detection for document corpora (SURVEY §2B L1 family):
  * MinHash+LSH banding and SimHash fingerprints.
  *
  * Everything here is hash-based and seedless-deterministic (xxhash64
  * with constant salts, no `rand()`), expressed entirely in codegen'd
  * built-ins (HOFs over arrays) — no UDFs, no driver-side loops.
  *
  * Scale shape: signature computation is a narrow map at scan speed;
  * candidate generation shuffles once on (band, bandHash) — the classic
  * inverted-index plan whose cost is O(candidates), never O(n²).
  */
object Dedup {

  /** Word-token shingles of size `n` (falls back to the whole text when
    * shorter than `n` tokens). */
  def shingles(text: Column, n: Int = 3): Column = {
    val toks = split(text, " ")
    when(size(toks) < n, array(text)).otherwise(
      array_distinct(transform(sequence(lit(0), size(toks) - n), i =>
        concat_ws(" ", (0 until n).map(j => element_at(toks, (i + j + 1).cast("int"))): _*))))
  }

  /** MinHash signature: `sig[h] = min over shingles of xxhash64(s, h)`. */
  def minHashSignature(text: Column, numHashes: Int): Column =
    transform(sequence(lit(0), lit(numHashes - 1)), h =>
      array_min(transform(shingles(text), sh => xxhash64(sh, h))))

  /** LSH banding: candidate pairs (d1 < d2) that collide in ≥1 band.
    * Output: (d1, d2, n_bands) where n_bands counts colliding bands. */
  def minHashLshPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      numHashes: Int = 64,
      bands: Int = 16): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val r = numHashes / bands
    val sig = df.select(col(idCol).as("id"),
      minHashSignature(col(textCol), numHashes).as("sig"))
    val banded = sig.select(col("id"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)), b =>
        xxhash64(slice(col("sig"), b * r + 1, lit(r)), lit(42)))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "band_hash")
    val a = banded.select(col("id").as("d1"), col("band"), col("band_hash"))
    val b = banded.select(col("id").as("d2"), col("band"), col("band_hash"))
    a.join(b, Seq("band", "band_hash")).filter(col("d1") < col("d2"))
      .groupBy(col("d1"), col("d2"))
      .agg(count(lit(1)).as("n_bands"))
  }

  /** Exact token-set Jaccard for a pair of texts (used to verify LSH
    * candidates). */
  def jaccard(t1: Column, t2: Column): Column = {
    val s1 = array_distinct(split(t1, " "))
    val s2 = array_distinct(split(t2, " "))
    val inter = size(array_intersect(s1, s2)).cast("double")
    inter / (size(s1) + size(s2) - size(array_intersect(s1, s2))).cast("double")
  }

  /** 64-bit SimHash over distinct word tokens: bit j is set iff the sum
    * of ±1 contributions (sign of the j-seeded token hash) is positive.
    * (Per-bit independent hashes rather than bit-slicing one hash — the
    * Column API has no variable-shift, and independent hashes are the
    * statistically cleaner variant anyway.) */
  def simHashBits(text: Column): Column = {
    val toks = array_distinct(split(text, " "))
    transform(sequence(lit(0), lit(63)), j =>
      when(aggregate(toks, lit(0L), (acc, t) =>
        acc + when(xxhash64(t, j) > 0, 1L).otherwise(-1L)
      ) > 0, 1L).otherwise(0L))
  }

  private val pow2: Array[Long] = Array.tabulate(64)(j => 1L << j)

  /** Fold SimHash bits into a single signed 64-bit fingerprint
    * (bit-weights via a literal power-of-two table + bitwise OR — no
    * overflow, ANSI-safe). */
  def simHashFingerprint(text: Column): Column =
    aggregate(
      zip_with(simHashBits(text), typedlit(pow2), (b, p) => b * p),
      lit(0L), (acc, x) => acc.bitwiseOR(x))

  def simHash(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), simHashFingerprint(col(textCol)).as("simhash"))

  /** Hamming distance between two SimHash fingerprints. */
  def hamming(f1: Column, f2: Column): Column = bit_count(f1.bitwiseXOR(f2))
}
