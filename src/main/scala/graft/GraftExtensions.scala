package graft

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.functions.{call_function, lit}
import graft.functions.{Barrier, BloomMightContain, BpeTokenCount, CharEntropy, CosineSimilarity, DsirBuckets, LangId, SortedPairs, MinHashSignature, NearestCentroid, NgramHashes, RepetitionStats, ShingleHashes, TokenFingerprint, UnicodeNormalize, VecDot, WinnowStats, GramSpans}

/** Session extension registering graft's native expressions, for use via
  * `spark.sql.extensions=graft.GraftExtensions` or
  * `SparkSession.builder.withExtensions(new GraftExtensions)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(
      (FunctionIdentifier(CosineSimilarity.name), CosineSimilarity.info,
        CosineSimilarity.builder))
    ext.injectFunction(
      (FunctionIdentifier(MinHashSignature.name), MinHashSignature.info,
        MinHashSignature.builder))
    ext.injectFunction(
      (FunctionIdentifier(UnicodeNormalize.name), UnicodeNormalize.info,
        UnicodeNormalize.builder))
    ext.injectFunction(
      (FunctionIdentifier(BloomMightContain.name), BloomMightContain.info,
        BloomMightContain.builder))
    ext.injectFunction(
      (FunctionIdentifier(LangId.name), LangId.info, LangId.builder))
    ext.injectFunction(
      (FunctionIdentifier(TokenFingerprint.name), TokenFingerprint.info,
        TokenFingerprint.builder))
    ext.injectFunction(
      (FunctionIdentifier(RepetitionStats.name), RepetitionStats.info,
        RepetitionStats.builder))
    ext.injectFunction(
      (FunctionIdentifier(CharEntropy.name), CharEntropy.info,
        CharEntropy.builder))
    ext.injectFunction(
      (FunctionIdentifier(NearestCentroid.name), NearestCentroid.info,
        NearestCentroid.builder))
    ext.injectFunction(
      (FunctionIdentifier(DsirBuckets.name), DsirBuckets.info,
        DsirBuckets.builder))
    ext.injectFunction(
      (FunctionIdentifier(SortedPairs.name), SortedPairs.info,
        SortedPairs.builder))
    ext.injectFunction(
      (FunctionIdentifier(ShingleHashes.name), ShingleHashes.info,
        ShingleHashes.builder))
    ext.injectFunction(
      (FunctionIdentifier(NgramHashes.name), NgramHashes.info,
        NgramHashes.builder))
    ext.injectFunction(
      (FunctionIdentifier(BpeTokenCount.name), BpeTokenCount.info,
        BpeTokenCount.builder))
    ext.injectFunction(
      (FunctionIdentifier(WinnowStats.name), WinnowStats.info,
        WinnowStats.builder))
    ext.injectFunction(
      (FunctionIdentifier(VecDot.name), VecDot.info, VecDot.builder))
    ext.injectFunction(
      (FunctionIdentifier(GramSpans.name), GramSpans.info,
        GramSpans.builder))
    ext.injectFunction(
      (FunctionIdentifier(Barrier.name), Barrier.info, Barrier.builder))
    ext.injectOptimizerRule(graft.plans.CorruptDateRebaseRule.apply)
  }
}

object GraftFunctions {
  /** Idempotent runtime registration — for sessions (like the driver's)
    * that were built without the extensions conf. */
  def ensureRegistered(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    val cos = FunctionIdentifier(CosineSimilarity.name)
    if (!reg.functionExists(cos))
      reg.registerFunction(cos, CosineSimilarity.info, CosineSimilarity.builder)
    val mh = FunctionIdentifier(MinHashSignature.name)
    if (!reg.functionExists(mh))
      reg.registerFunction(mh, MinHashSignature.info, MinHashSignature.builder)
    val un = FunctionIdentifier(UnicodeNormalize.name)
    if (!reg.functionExists(un))
      reg.registerFunction(un, UnicodeNormalize.info, UnicodeNormalize.builder)
    val bc = FunctionIdentifier(BloomMightContain.name)
    if (!reg.functionExists(bc))
      reg.registerFunction(bc, BloomMightContain.info, BloomMightContain.builder)
    val li = FunctionIdentifier(LangId.name)
    if (!reg.functionExists(li))
      reg.registerFunction(li, LangId.info, LangId.builder)
    val fp = FunctionIdentifier(TokenFingerprint.name)
    if (!reg.functionExists(fp))
      reg.registerFunction(fp, TokenFingerprint.info, TokenFingerprint.builder)
    val rp = FunctionIdentifier(RepetitionStats.name)
    if (!reg.functionExists(rp))
      reg.registerFunction(rp, RepetitionStats.info, RepetitionStats.builder)
    val ce = FunctionIdentifier(CharEntropy.name)
    if (!reg.functionExists(ce))
      reg.registerFunction(ce, CharEntropy.info, CharEntropy.builder)
    val nc = FunctionIdentifier(NearestCentroid.name)
    if (!reg.functionExists(nc))
      reg.registerFunction(nc, NearestCentroid.info, NearestCentroid.builder)
    val db = FunctionIdentifier(DsirBuckets.name)
    if (!reg.functionExists(db))
      reg.registerFunction(db, DsirBuckets.info, DsirBuckets.builder)
    val sp = FunctionIdentifier(SortedPairs.name)
    if (!reg.functionExists(sp))
      reg.registerFunction(sp, SortedPairs.info, SortedPairs.builder)
    val sh = FunctionIdentifier(ShingleHashes.name)
    if (!reg.functionExists(sh))
      reg.registerFunction(sh, ShingleHashes.info, ShingleHashes.builder)
    val ng = FunctionIdentifier(NgramHashes.name)
    if (!reg.functionExists(ng))
      reg.registerFunction(ng, NgramHashes.info, NgramHashes.builder)
    val bp = FunctionIdentifier(BpeTokenCount.name)
    if (!reg.functionExists(bp))
      reg.registerFunction(bp, BpeTokenCount.info, BpeTokenCount.builder)
    val ws = FunctionIdentifier(WinnowStats.name)
    if (!reg.functionExists(ws))
      reg.registerFunction(ws, WinnowStats.info, WinnowStats.builder)
    val vd = FunctionIdentifier(VecDot.name)
    if (!reg.functionExists(vd))
      reg.registerFunction(vd, VecDot.info, VecDot.builder)
    val gs = FunctionIdentifier(GramSpans.name)
    if (!reg.functionExists(gs))
      reg.registerFunction(gs, GramSpans.info, GramSpans.builder)
    val ba = FunctionIdentifier(Barrier.name)
    if (!reg.functionExists(ba))
      reg.registerFunction(ba, Barrier.info, Barrier.builder)
    // sessions built without withExtensions still get the transparent
    // corrupt-date rebase via the user-provided optimizer batch; skip
    // when the extensions path already injected it (double installation
    // would run the rule in two batches on every optimization)
    val viaExtensions = spark.sessionState.optimizer.extendedOperatorOptimizationRules
      .exists(_.isInstanceOf[graft.plans.CorruptDateRebaseRule])
    if (!viaExtensions && !spark.experimental.extraOptimizations
        .exists(_.isInstanceOf[graft.plans.CorruptDateRebaseRule]))
      spark.experimental.extraOptimizations ++=
        Seq(graft.plans.CorruptDateRebaseRule(spark))
  }

  /** Column API for the native cosine (registers on first use). */
  def cosineNative(spark: SparkSession, a: Column, b: Column): Column = {
    ensureRegistered(spark)
    call_function(CosineSimilarity.name, a, b)
  }

  /** Zero-cost projection barrier (see [[graft.functions.Barrier]]):
    * fences an expensive computed-once column against CollapseProject
    * re-inlining into downstream per-element HOF lambdas — the
    * shuffle-free replacement for the old repartition-as-barrier. */
  def barrier(spark: SparkSession, c: Column): Column = {
    ensureRegistered(spark)
    call_function(Barrier.name, c)
  }

  /** Column API for the native nearest-centroid assignment kernel. */
  def nearestCentroidNative(spark: SparkSession, vec: Column, centroids: Column): Column = {
    ensureRegistered(spark)
    call_function(NearestCentroid.name, vec, centroids)
  }

  /** Column API for the native DSIR hashed-ngram bucket histogram. */
  def dsirBucketsNative(spark: SparkSession, tokens: Column): Column = {
    ensureRegistered(spark)
    call_function(DsirBuckets.name, tokens)
  }

  /** l38b production twin: xxhash64(seed 42) buckets instead of md5. */
  def dsirBucketsXxhNative(spark: SparkSession, tokens: Column): Column = {
    ensureRegistered(spark)
    call_function(DsirBuckets.name, tokens, lit(true))
  }

  /** Column API for the native all-(i<j)-pairs fan-out. */
  def sortedPairsNative(spark: SparkSession, arr: Column): Column = {
    ensureRegistered(spark)
    call_function(SortedPairs.name, arr)
  }

  /** Column API for the native one-pass shingle-hash array. */
  def shingleHashesNative(spark: SparkSession, text: Column): Column = {
    ensureRegistered(spark)
    call_function(ShingleHashes.name, text)
  }

  /** Column API for the native one-pass n-gram hash-key array. */
  def ngramHashesNative(
      spark: SparkSession, text: Column, n: Int,
      distinct: Boolean = true): Column = {
    ensureRegistered(spark)
    call_function(NgramHashes.name, text,
      org.apache.spark.sql.functions.lit(n),
      org.apache.spark.sql.functions.lit(distinct))
  }

  /** Column API for the native DSIR score fold (n, dot) over a histogram. */
  def vecDotNative(spark: SparkSession, counts: Column, weights: Column): Column = {
    ensureRegistered(spark)
    call_function(VecDot.name, counts, weights)
  }

  /** Column API for the native one-pass word n-gram string-span array. */
  def gramSpansNative(
      spark: SparkSession, text: Column, n: Int, clamp: Boolean): Column = {
    ensureRegistered(spark)
    call_function(GramSpans.name, text,
      org.apache.spark.sql.functions.lit(n),
      org.apache.spark.sql.functions.lit(clamp))
  }

  /** Column API for the native one-pass winnowing signature summary. */
  def winnowStatsNative(
      spark: SparkSession, text: Column, k: Int, w: Int): Column = {
    ensureRegistered(spark)
    call_function(WinnowStats.name, text,
      org.apache.spark.sql.functions.lit(k),
      org.apache.spark.sql.functions.lit(w))
  }

  /** Column API for the native priority-merge BPE token count. */
  def bpeTokenCountNative(
      spark: SparkSession, text: Column,
      merges: Seq[(String, String)]): Column = {
    ensureRegistered(spark)
    call_function(BpeTokenCount.name, text,
      org.apache.spark.sql.functions.typedlit(merges.map(_._1)),
      org.apache.spark.sql.functions.typedlit(merges.map(_._2)))
  }

  /** Column API for the native one-pass MinHash signature. */
  def minhashNative(spark: SparkSession, hashes: Column, numHashes: Int): Column = {
    ensureRegistered(spark)
    call_function(MinHashSignature.name, hashes,
      org.apache.spark.sql.functions.lit(numHashes))
  }

  /** Column API for the native one-pass language ID. */
  def langIdNative(spark: SparkSession, text: Column): Column = {
    ensureRegistered(spark)
    call_function(LangId.name, text)
  }

  /** Column API for the native rolling token fingerprint. */
  def fingerprintNative(spark: SparkSession, text: Column): Column = {
    ensureRegistered(spark)
    call_function(TokenFingerprint.name, text)
  }

  /** Column API for the native one-pass repetition metrics struct. */
  def repetitionNative(spark: SparkSession, text: Column): Column = {
    ensureRegistered(spark)
    call_function(RepetitionStats.name, text)
  }

  /** Column API for the native one-pass char-entropy struct. */
  def charEntropyNative(spark: SparkSession, text: Column): Column = {
    ensureRegistered(spark)
    call_function(CharEntropy.name, text)
  }

  /** Column API for native Unicode normalization (NFC/NFD/NFKC/NFKD). */
  def normalizeNative(spark: SparkSession, s: Column, form: String = "NFC"): Column = {
    ensureRegistered(spark)
    call_function(UnicodeNormalize.name, s,
      org.apache.spark.sql.functions.lit(form))
  }
}
