package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-prefiltered semi-join (SURVEY §2B J-family extension): the
  * explicit runtime-filter pattern for a selective dim side that is too
  * big to broadcast as a hash relation but whose KEY SET compacts into a
  * few MB of bloom bits.
  *
  * Plan shape: one dim-side aggregation builds the filter (distributed,
  * `DataFrameStatFunctions.bloomFilter`), the fact scan drops
  * non-candidate rows through the codegen'd
  * [[graft.functions.BloomMightContain]] predicate BEFORE the shuffle,
  * and an exact left-semi join on the survivors restores exactness —
  * false positives (rate `fpp`) cost only wasted shuffle rows, never a
  * wrong answer; false negatives cannot occur. At 100 TB this turns
  * "shuffle the whole fact table, then discard 99% at the join" into
  * "shuffle ~selectivity + fpp of it".
  *
  * Spark's InjectRuntimeFilter does the same transparently but only
  * when its thresholds and join-shape heuristics fire; this operator is
  * the deterministic, caller-controlled version (and composes with
  * derived keys the optimizer can't see through).
  *
  * Keys are probed as BIGINT: both build and probe sides cast through
  * LongType so put/probe hashing agree. NULL keys never match (join
  * semantics).
  */
object BloomJoin {

  /** Serialize a filter for embedding as a plan literal. */
  def serialize(bloom: BloomFilter): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    bloom.writeTo(bos)
    bos.toByteArray
  }

  /** Column predicate: does `key` (cast to long) possibly appear in the
    * serialized filter? Codegen'd, registers the expression on first use. */
  def mightContain(key: Column, filterBytes: Array[Byte]): Column =
    call_function(graft.functions.BloomMightContain.name,
      key.cast("long"), lit(filterBytes))

  /** Build a bloom over `dim`'s key set. `expectedItems` sizes the bit
    * array — overshooting wastes plan bytes, undershooting inflates the
    * false-positive rate (never correctness). */
  def buildFilter(
      dim: DataFrame, dimKey: String,
      expectedItems: Long, fpp: Double): BloomFilter =
    // an EMPTY build side NPEs inside stat.bloomFilter itself (the
    // zero-row aggregation deserializes a null buffer). A day-one
    // history and a fully-filtered dim are routine inputs, not errors:
    // substitute a valid match-nothing filter, which keeps the fast
    // path sound (everything reads "definitely novel").
    try
      dim.select(col(dimKey).cast("long").as("__k"))
        .filter(col("__k").isNotNull)
        .stat.bloomFilter("__k", expectedItems, fpp)
    catch {
      case _: NullPointerException => BloomFilter.create(1, fpp)
    }

  /** `fact LEFT SEMI JOIN dim ON fact(factKey) = dim(dimKey)`, with the
    * fact side pre-filtered through the dim key set's bloom filter.
    * Result is EXACTLY the plain semi-join (BloomJoinSpec pins this). */
  def bloomSemiJoin(
      fact: DataFrame,
      dim: DataFrame,
      factKey: String,
      dimKey: String,
      expectedItems: Long = 1L << 16,
      fpp: Double = 0.02): DataFrame = {
    graft.GraftFunctions.ensureRegistered(fact.sparkSession)
    val bytes = serialize(buildFilter(dim, dimKey, expectedItems, fpp))
    val keys = dim.select(col(dimKey).cast("long").as("__bloom_k"))
      .filter(col("__bloom_k").isNotNull)
    fact
      .filter(mightContain(col(factKey), bytes))
      .join(keys, col(factKey).cast("long") === col("__bloom_k"), "left_semi")
  }
}
