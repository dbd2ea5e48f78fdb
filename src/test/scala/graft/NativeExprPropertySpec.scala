package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.{Dedup, Similarity}

/** Property tests for the two native Catalyst expressions: on generated
  * inputs the codegen'd one-pass forms must be bit-identical to their
  * HOF compositions (raw ScalaCheck generators with fixed seeds — the
  * scalatest↔scalacheck bridge isn't in the offline cache). */
class NativeExprPropertySpec extends SparkSpec {
  import spark.implicits._

  test("graft_nearest_centroid == HOF fold on generated vectors and centroids") {
    val dim = 8
    val vGen = Gen.listOfN(dim, Gen.chooseNum(-1e3, 1e3).map(_ / 7.0))
    val rows = (1 to 80).map { seed =>
      Tuple1(vGen.pureApply(Gen.Parameters.default, Seed(seed.toLong)).toArray)
    }
    val df = rows.toDF("v")
    for (k <- Seq(1, 3, 8)) {
      val cents: Array[Array[Double]] = (0 until k).map { j =>
        vGen.pureApply(Gen.Parameters.default, Seed(1000L + j)).toArray
      }.toArray
      // include a duplicated centroid so the strict-< lowest-index
      // tie-break is actually exercised
      val withDup = if (k >= 3) cents.updated(2, cents(0).clone) else cents
      val centLit = array(withDup.map(c => array(c.map(lit): _*)): _*)
      val both = df.select(
        Similarity.nearestHof(col("v"), centLit, withDup.length).as("hof"),
        graft.GraftFunctions.nearestCentroidNative(spark, col("v"), centLit)
          .as("native"))
      val diff = both.filter(
        (col("hof").isNull =!= col("native").isNull) ||
          (col("hof").isNotNull && col("hof") =!= col("native"))).count()
      assert(diff == 0, s"k=$k")
    }
    // ragged centroid (skipped by both) and the nothing-qualifies seed
    val rag = array(array(lit(1.0), lit(2.0)), array((1 to dim).map(i => lit(i * 1.0)): _*))
    val both = df.select(
      Similarity.nearestHof(col("v"), rag, 2).as("hof"),
      graft.GraftFunctions.nearestCentroidNative(spark, col("v"), rag).as("native"))
    assert(both.filter(col("hof") =!= col("native")).count() == 0)
    assert(both.filter(col("native.cell") === -1).count() == 0) // dim-matching one wins
    val none = array(array(lit(1.0), lit(2.0), lit(3.0)))
    val empty = df.select(
      graft.GraftFunctions.nearestCentroidNative(spark, col("v"), none).as("n"))
    assert(empty.filter(col("n.cell") =!= -1).count() == 0)
  }

  test("graft_minhash == HOF composition on generated shingle-hash arrays") {
    val arrGen = Gen.nonEmptyListOf(Gen.chooseNum(Long.MinValue, Long.MaxValue))
      .map(_.take(200))
    val rows = (1 to 60).map(seed =>
      Tuple1(arrGen.pureApply(Gen.Parameters.default, Seed(seed.toLong))))
    val df = rows.toDF("hashes")
    for (k <- Seq(1, 16, 64)) {
      val both = df.select(
        Dedup.minHashSignatureFromHashes(col("hashes"), k).as("hof"),
        graft.GraftFunctions.minhashNative(spark, col("hashes"), k).as("native"))
      // null-symmetric compare: `hof =!= native` is NULL (filtered out)
      // when either side is NULL, which would hide a one-sided NULL
      val diff = both.filter(
        (col("hof").isNull =!= col("native").isNull) ||
          (col("hof").isNotNull && col("hof") =!= col("native"))).count()
      assert(diff == 0, s"k=$k")
      assert(both.filter(col("native").isNull).count() == 0)
    }
  }

  test("graft_cosine == HOF composition on generated same-length float vectors") {
    val vecGen = for {
      n <- Gen.chooseNum(1, 128)
      a <- Gen.listOfN(n, Gen.chooseNum(-1e6f, 1e6f))
      b <- Gen.listOfN(n, Gen.chooseNum(-1e6f, 1e6f))
    } yield (a, b)
    val rows = (1 to 80).map(seed =>
      vecGen.pureApply(Gen.Parameters.default, Seed(seed.toLong)))
    val df = rows.toDF("a", "b")
    val both = df.select(
      Similarity.cosine(col("a"), col("b")).as("hof"),
      graft.GraftFunctions.cosineNative(spark, col("a"), col("b")).as("native"))
    // bit-identical doubles or both NULL (zero-norm guard)
    val diff = both.filter(
      (col("hof").isNull =!= col("native").isNull) ||
        (col("hof").isNotNull && col("hof") =!= col("native"))).count()
    assert(diff == 0)
  }

  test("graft_cosine accepts double and mixed float/double vectors (driver-drift guard)") {
    val vecGen = for {
      n <- Gen.chooseNum(1, 64)
      a <- Gen.listOfN(n, Gen.chooseNum(-1e6, 1e6))
      b <- Gen.listOfN(n, Gen.chooseNum(-1e6, 1e6))
    } yield (a, b)
    val rows = (1 to 40).map(seed =>
      vecGen.pureApply(Gen.Parameters.default, Seed(seed.toLong)))
    val df = rows.toDF("a", "b") // array<double> columns
    // double × double: native == HOF bit-for-bit
    val both = df.select(
      Similarity.cosine(col("a"), col("b")).as("hof"),
      graft.GraftFunctions.cosineNative(spark, col("a"), col("b")).as("native"))
    assert(both.filter(
      (col("hof").isNull =!= col("native").isNull) ||
        (col("hof").isNotNull && col("hof") =!= col("native"))).count() == 0)
    // mixed float/double sides analyze and agree with the all-double HOF
    // (the float side loses precision identically on both paths)
    val mixed = df.select(
      Similarity.cosine(col("a").cast("array<float>"), col("b")).as("hof"),
      graft.GraftFunctions.cosineNative(
        spark, col("a").cast("array<float>"), col("b")).as("native"))
    assert(mixed.filter(
      (col("hof").isNull =!= col("native").isNull) ||
        (col("hof").isNotNull && col("hof") =!= col("native"))).count() == 0)
  }

  /** Generated text: whitespace-heavy, stopword-seeded, occasional CJK
    * and empty strings — the edge surface of both tokenizers (leading/
    * trailing/repeated separators, ties, case folding). */
  private def textGen = {
    val stop = graft.operators.TextAnalysis.stopwords.values.flatten.toSeq
    val word = Gen.oneOf(
      Gen.oneOf(stop), Gen.oneOf(stop.map(_.toUpperCase)),
      Gen.alphaNumStr.map(_.take(12)), Gen.const("中文"),
      Gen.const(""), Gen.const("the,"))
    val sep = Gen.oneOf(" ", "  ", "\t", "\n", " \r ")
    for {
      n <- Gen.chooseNum(0, 40)
      ws <- Gen.listOfN(n, word)
      ss <- Gen.listOfN(n, sep)
      lead <- Gen.oneOf("", " ", "\t")
    } yield lead + ws.zip(ss).map { case (w, s) => w + s }.mkString
  }

  /** SQL-NULL text rows included: the null branch of the bit-identical
    * contract (NULL→'und' for langid, NULL for fingerprint, struct of
    * NULLs for repetition) must be tested, and with NULL-SAFE compares
    * — a plain =!= evaluates to NULL on a one-sided NULL and silently
    * filters the very divergence it should catch. */
  private def textRows = (1 to 150).map(seed =>
    Tuple1(textGen.pureApply(Gen.Parameters.default, Seed(seed.toLong)))) ++
    Seq(Tuple1(null: String), Tuple1(""))

  test("graft_langid == Column composition on generated multilingual text") {
    val df = textRows.toDF("text")
    val both = df.select(
      graft.operators.TextAnalysis.languageId(col("text")).as("hof"),
      graft.GraftFunctions.langIdNative(spark, col("text")).as("native"))
    assert(both.filter(!(col("hof") <=> col("native"))).count() == 0)
    // sanity: the generator actually exercises >1 language + zh + und
    assert(both.select(col("native")).distinct().count() >= 3)
    // the NULL row classifies as 'und' on BOTH surfaces
    assert(both.filter(col("hof").isNull || col("native").isNull).count() == 0)
  }

  test("graft_fingerprint == HOF composition on generated token text") {
    val df = textRows.toDF("text")
    val both = df.select(
      graft.operators.TextAnalysis.rollingFingerprint(col("text")).as("hof"),
      graft.GraftFunctions.fingerprintNative(spark, col("text")).as("native"))
    assert(both.filter(!(col("hof") <=> col("native"))).count() == 0)
  }

  test("graft_repetition == HOF composition on generated token text") {
    val df = textRows.toDF("text")
    val both = df.select(
      graft.operators.TextAnalysis.repetitionMetrics(col("text")).as("hof"),
      graft.GraftFunctions.repetitionNative(spark, col("text")).as("native"))
    assert(both.filter(!(col("hof") <=> col("native"))).count() == 0)
  }

  test("graft_char_entropy == explode/groupBy composition on generated + corpus text") {
    // the r5 l29 shape (explode → (id, ch) count → per-id sum of
    // floor-scaled ln terms), reproduced at test grain as the oracle
    // for the native one-pass expression — including astral-plane
    // chars, where "one char" must mean one CODE POINT on both sides
    def composition(df: org.apache.spark.sql.DataFrame) = {
      val counts = df
        .filter(col("text").isNotNull && length(col("text")) > 0)
        .select(col("id"), explode(split(col("text"), "")).as("ch"))
        .filter(col("ch") =!= "")
        .groupBy(col("id"), col("ch")).agg(count(lit(1)).as("c"))
      counts.groupBy(col("id"))
        .agg(sum(col("c")).as("nc"), count(lit(1)).as("nd"),
          sum(col("c") * floor(log(col("c").cast("double")) * 1e6).cast("bigint"))
            .as("sum_term"))
        .select(col("id"), col("nc"), col("nd"),
          (floor(log(col("nc").cast("double")) * 1e6).cast("bigint")
            - expr("sum_term div nc")).as("em"))
    }
    def native(df: org.apache.spark.sql.DataFrame) = df
      .filter(col("text").isNotNull && length(col("text")) > 0)
      .select(col("id"),
        graft.GraftFunctions.charEntropyNative(spark, col("text")).as("e"))
      .select(col("id"), col("e.n_chars_seen").as("nc"),
        col("e.n_distinct_chars").as("nd"), col("e.entropy_micro").as("em"))
    def assertSame(df: org.apache.spark.sql.DataFrame): Unit = {
      val joined = composition(df).as("h")
        .join(native(df).as("n"), Seq("id"), "full_outer")
      val diff = joined.filter(
        !(col("h.nc") <=> col("n.nc")) || !(col("h.nd") <=> col("n.nd")) ||
          !(col("h.em") <=> col("n.em"))).count()
      assert(diff == 0)
    }
    val texts = textRows.map(_._1) ++
      Seq("😀😀a", "𝄞x𝄞", "日本語テキスト", "aaa bbb a", "x")
    assertSame(texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("id", "text"))
    assertSame(spark.read.parquet(sf("documents"))
      .select(col("doc_id").as("id"), col("text")))
    // NULL and "" both yield NULL from the expression itself
    val edge = Seq((0L, null: String), (1L, "")).toDF("id", "text")
      .select(graft.GraftFunctions.charEntropyNative(spark, col("text")).as("e"))
    assert(edge.filter(col("e").isNotNull).count() == 0)
  }

  test("native text expressions on the documents corpus (sf0.001)") {
    val docs = spark.read.parquet(sf("documents"))
    val both = docs.select(
      graft.operators.TextAnalysis.languageId(col("text")).as("lh"),
      graft.GraftFunctions.langIdNative(spark, col("text")).as("ln"),
      graft.operators.TextAnalysis.rollingFingerprint(col("text")).as("fh"),
      graft.GraftFunctions.fingerprintNative(spark, col("text")).as("fn"),
      graft.operators.TextAnalysis.repetitionMetrics(col("text")).as("rh"),
      graft.GraftFunctions.repetitionNative(spark, col("text")).as("rn"))
    assert(both.filter(!(col("lh") <=> col("ln")) || !(col("fh") <=> col("fn")) ||
      !(col("rh") <=> col("rn"))).count() == 0)
  }

  test("graft_dsir_buckets == md5-hex gram composition on corpus + edge arrays") {
    val docs = spark.read.parquet(sf("documents"))
      .filter(col("text").isNotNull)
      .select(col("doc_id").as("id"), split(col("text"), " ").as("ws"))
      .union(Seq(
        // space INSIDE a token, empty token, non-ASCII, single, empty
        (9001L, Array("汉字", "tokens", "汉字 mixed", "", "a")),
        (9002L, Array("solo")),
        (9003L, Array.empty[String])).toDF("id", "ws"))
    val comp = docs.select(col("id"), explode(concat(
        col("ws"),
        when(size(col("ws")) >= 2,
          transform(sequence(lit(1), size(col("ws")) - 1),
            i => concat_ws(" ",
              element_at(col("ws"), i), element_at(col("ws"), i + 1))))
          .otherwise(typedlit(Array.empty[String])))).as("g"))
      .withColumn("b", expr(
        "(instr('0123456789abcdef', substring(md5(g), 1, 1)) - 1) * 16" +
          " + (instr('0123456789abcdef', substring(md5(g), 2, 1)) - 1)"))
      .groupBy(col("id"), col("b")).agg(count(lit(1)).cast("int").as("c_comp"))
    val nat = docs.select(col("id"), posexplode(
        graft.GraftFunctions.dsirBucketsNative(spark, col("ws")))
        .as(Seq("b", "c_nat")))
      .filter(col("c_nat") > 0)
    val joined = nat.join(comp, Seq("id", "b"), "full_outer")
    assert(joined.filter(!(col("c_nat") <=> col("c_comp"))).count() == 0)
    // the native histogram always sums to the gram count: 2·|ws| − 1
    val sums = docs.select(col("id"), size(col("ws")).as("n"),
      aggregate(graft.GraftFunctions.dsirBucketsNative(spark, col("ws")),
        lit(0L), (a, c) => a + c).as("s"))
    assert(sums.filter(col("n") >= 1 && col("s") =!= col("n") * 2 - 1)
      .count() == 0)
    assert(sums.filter(col("n") === 0 && col("s") =!= 0).count() == 0)
  }

  test("graft_sorted_pairs == flatten/transform/slice HOF on long + string arrays") {
    def hofPairs(c: String) = expr(
      s"flatten(transform($c, (x, i) -> " +
        s"transform(slice($c, i + 2, size($c) - i - 1), " +
        "y -> struct(x AS a, y AS b))))")
    // long arrays: generated sizes 0..12 incl. duplicates and nulls
    val longRows = (0 until 60).map { seed =>
      val n = seed % 13
      Tuple1((0 until n).map { i =>
        val v = Gen.chooseNum(0L, 20L).pureApply(Gen.Parameters.default,
          Seed(seed * 100L + i))
        if ((seed + i) % 11 == 0) null else java.lang.Long.valueOf(v)
      }.toArray)
    }
    val dl = longRows.toDF("arr")
    val bothL = dl.select(hofPairs("arr").as("hof"),
      graft.GraftFunctions.sortedPairsNative(spark, col("arr")).as("native"))
    assert(bothL.filter(!(col("hof") <=> col("native"))).count() == 0)
    // string arrays (the l34 source-set shape), incl. empty strings
    val ds = Seq(
      Tuple1(Array("src1", "src2", "src3")),
      Tuple1(Array("", "a", "a b", "汉")),
      Tuple1(Array("solo")),
      Tuple1(Array.empty[String]),
      Tuple1(null.asInstanceOf[Array[String]])).toDF("arr")
    val bothS = ds.select(hofPairs("arr").as("hof"),
      graft.GraftFunctions.sortedPairsNative(spark, col("arr")).as("native"))
    assert(bothS.filter(!(col("hof") <=> col("native"))).count() == 0)
  }
}

/** Property tests for the round-4 operators: the bucketed interval join
  * must agree with the naive O(n·m) predicate join on generated data,
  * and the Morton interleave must match a bit-by-bit reference. */
class Round4PropertySpec extends SparkSpec {
  import spark.implicits._
  import graft.operators.IntervalJoin
  import graft.sources.ZOrder

  test("bucketed interval join == naive non-equi join on generated timestamps") {
    val tsGen = Gen.chooseNum(0L, 100000L)
    for (seed <- 1 to 5) {
      val lRows = (0 until 80).map(i =>
        (i.toLong, tsGen.pureApply(Gen.Parameters.default, Seed(seed * 1000L + i))))
      val rRows = (0 until 80).map(i =>
        (1000L + i, tsGen.pureApply(Gen.Parameters.default, Seed(seed * 2000L + i))))
      val l = lRows.toDF("a_id", "a_us")
      val r = rRows.toDF("b_id", "b_us")
      for (tol <- Seq(1L, 777L, 10000L)) {
        val bucketed = IntervalJoin.join(l, r, "a_us", "b_us", tol)
          .select($"a_id", $"b_id").collect().map(x => (x.getLong(0), x.getLong(1)))
        val naive = l.join(r, abs($"b_us" - $"a_us") <= tol)
          .select($"a_id", $"b_id").collect().map(x => (x.getLong(0), x.getLong(1)))
        assert(bucketed.sorted.toSeq == naive.sorted.toSeq,
          s"seed=$seed tol=$tol: bucketed ${bucketed.length} vs naive ${naive.length}")
      }
    }
  }

  test("graft_winnow_stats == window/agg composition on corpus + edge docs") {
    // edge docs hit every regime the kernel branches on: empty text
    // (split -> [""], one clamped gram), single token, k-1 / k / k+w-1
    // token boundaries (partial vs full windows), repeated spaces
    // (EMPTY tokens rejoined into the same byte span), and non-ASCII
    // multi-byte tokens
    val edges = Seq(
      (9001L, ""), (9002L, "solo"), (9003L, "a b c"), (9004L, "a b c d"),
      (9005L, "a b c d e f g"), (9006L, "a  b   c d"), (9007L, "汉字 字 mixed 漢 字"),
      (9008L, "x x x x x x x x x x")).toDF("doc_id", "text")
    val docs = spark.read.parquet(sf("documents"))
      .select(col("doc_id"), col("text")).union(edges)
    for ((k, w) <- Seq((4, 4), (3, 5), (1, 1))) {
      val nat = Dedup.winnowedFingerprints(docs, "doc_id", "text", k, w)
      val comp = Dedup.winnowedFingerprintsComposed(docs, "doc_id", "text", k, w)
        .withColumnsRenamed(Map("n_windows" -> "cw", "n_fp" -> "cf",
          "fp_min" -> "cmin", "fp_max" -> "cmax"))
      val joined = nat.join(comp, Seq("doc_id"), "full_outer")
      assert(joined.filter(!(col("n_windows") <=> col("cw")) ||
        !(col("n_fp") <=> col("cf")) || !(col("fp_min") <=> col("cmin")) ||
        !(col("fp_max") <=> col("cmax"))).count() == 0, s"k=$k w=$w")
    }
  }

  test("graft_gram_spans == transform/slice compositions on corpus + edge docs") {
    val edges = Seq(
      (9001L, ""), (9002L, "solo"), (9003L, "a b"), (9004L, "a b c d e"),
      (9005L, "a  b   c"), (9006L, " leading two  empties"),
      (9007L, "汉字 字 mixed 漢"), (9008L, "trailing space ")).toDF("doc_id", "text")
    val docs = spark.read.parquet(sf("documents"))
      .select(col("doc_id"), col("text")).union(edges)
      .filter(col("text").isNotNull)
    // clamp = false, n = 2: the l36 bigram build it replaced
    val bigComposed = docs.select(col("doc_id"),
      when(size(split(col("text"), " ")) >= 2,
        expr("transform(sequence(1, size(split(text, ' ')) - 1)," +
          " i -> concat_ws(' ', element_at(split(text, ' '), i)," +
          " element_at(split(text, ' '), i + 1)))"))
        .otherwise(typedlit(Array.empty[String])).as("comp"))
    val big = docs.select(col("doc_id"),
      graft.GraftFunctions.gramSpansNative(spark, col("text"), 2, clamp = false)
        .as("nat"))
    assert(big.join(bigComposed, Seq("doc_id"))
      .filter(!(col("nat") <=> col("comp"))).count() == 0)
    // clamp = true, n = 4: the winnowing gram build (sub-k docs keep one
    // clamped gram)
    val winComposed = docs.select(col("doc_id"),
      expr("transform(sequence(0, greatest(size(split(text, ' ')) - 4, 0))," +
        " i -> concat_ws(' ', slice(split(text, ' '), i + 1, 4)))").as("comp"))
    val win = docs.select(col("doc_id"),
      graft.GraftFunctions.gramSpansNative(spark, col("text"), 4, clamp = true)
        .as("nat"))
    assert(win.join(winComposed, Seq("doc_id"))
      .filter(!(col("nat") <=> col("comp"))).count() == 0)
  }

  test("graft_vec_dot == aggregate/zip_with HOF fold on generated histograms") {
    val cGen = Gen.listOfN(256, Gen.chooseNum(0, 1000))
    val rows = (1 to 60).map { seed =>
      Tuple1(cGen.pureApply(Gen.Parameters.default, Seed(seed.toLong)).toArray)
    }
    val df = rows.toDF("counts")
    val wGen = Gen.listOfN(256, Gen.chooseNum(-2000000L, 2000000L))
    for (wseed <- Seq(1L, 2L)) {
      val w = wGen.pureApply(Gen.Parameters.default, Seed(wseed)).toArray
      val wLit = typedlit(w.toSeq)
      val both = df.select(
        aggregate(col("counts"), lit(0L), (a, c) => a + c).as("nh"),
        aggregate(zip_with(col("counts"), wLit, (c, d) => c.cast("long") * d),
          lit(0L), (a, x) => a + x).as("dh"),
        graft.GraftFunctions.vecDotNative(spark, col("counts"), wLit).as("nat"))
      assert(both.filter(col("nat.n") =!= col("nh") ||
        col("nat.dot") =!= col("dh")).count() == 0, s"wseed=$wseed")
    }
    // empty histogram and the real corpus histograms
    assert(Seq(Tuple1(Array.empty[Int])).toDF("counts")
      .select(graft.GraftFunctions.vecDotNative(spark, col("counts"),
        typedlit(Seq.fill(256)(3L))).as("d"))
      .filter(col("d.n") =!= 0L || col("d.dot") =!= 0L).count() == 0)
  }

  test("Morton interleave == bit-by-bit reference on generated buckets") {
    def reference(bs: Seq[Long], bits: Int): Long = {
      var z = 0L
      for (i <- 0 until bits; j <- bs.indices)
        z |= ((bs(j) >> i) & 1L) << (i * bs.size + j)
      z
    }
    val bGen = Gen.chooseNum(0L, (1L << 16) - 1)
    for (seed <- 1 to 40) {
      val n = 1 + seed % 3 // 1..3 columns
      val bs = (0 until n).map(j =>
        bGen.pureApply(Gen.Parameters.default, Seed(seed * 100L + j)))
      val bits = 16
      val got = spark.range(1)
        .select(ZOrder.interleave(bs.map(lit(_)), bits).as("z"))
        .head().getLong(0)
      assert(got == reference(bs, bits), s"seed=$seed buckets=$bs")
    }
  }

  test("builders fail the SQL surface as AnalysisException, not internal errors") {
    // r11 ADVICE: a require/IllegalArgumentException thrown inside a
    // registered builder surfaces as an INTERNAL error from the
    // analyzer; the graft_* builders now raise real AnalysisExceptions
    // under Spark's public error classes. Assert the CLASS, not the
    // message text — the condition is the stable contract.
    import org.apache.spark.sql.AnalysisException
    graft.GraftFunctions.ensureRegistered(spark)
    val docs = Seq(("a b c d e", 2)).toDF("text", "n")

    val wrongArity = intercept[AnalysisException] {
      spark.sql("SELECT graft_gram_spans('a b c')").collect()
    }
    assert(wrongArity.getCondition == "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
      wrongArity.getMessage)

    val nonFoldableN = intercept[AnalysisException] {
      docs.selectExpr("graft_gram_spans(text, n, true)").collect()
    }
    assert(nonFoldableN.getCondition == "NON_FOLDABLE_ARGUMENT",
      nonFoldableN.getMessage)

    val nonFoldableK = intercept[AnalysisException] {
      docs.selectExpr("graft_winnow_stats(text, n, 4)").collect()
    }
    assert(nonFoldableK.getCondition == "NON_FOLDABLE_ARGUMENT",
      nonFoldableK.getMessage)

    val badMerges = intercept[AnalysisException] {
      docs.selectExpr(
        "graft_bpe_token_count(text, array('a','b'), array('c'))").collect()
    }
    assert(badMerges.getCondition == "INVALID_PARAMETER_VALUE.PATTERN",
      badMerges.getMessage)
  }

  test("graft_vec_dot rejects nullable-element arrays at analysis time") {
    // r11 ADVICE: compute() reads elements via getInt/getLong (undefined
    // for null elements, where the HOF composition propagates NULL) — a
    // SQL-surface caller handing a containsNull array must get a type
    // error, not garbage values.
    import org.apache.spark.sql.AnalysisException
    graft.GraftFunctions.ensureRegistered(spark)
    val e = intercept[AnalysisException] {
      spark.sql(
        "SELECT graft_vec_dot(array(1, CAST(NULL AS INT)), array(1L, 2L))")
        .collect()
    }
    assert(Option(e.getCondition).exists(_.startsWith("DATATYPE_MISMATCH")),
      s"condition=${e.getCondition}: ${e.getMessage}")
    // the pinned producers (containsNull = false on both sides) pass
    val ok = spark.sql(
      "SELECT graft_vec_dot(array(1, 2), array(10L, 100L)) AS d")
      .selectExpr("d.n", "d.dot").head()
    assert(ok.getLong(0) == 3L && ok.getLong(1) == 210L)
  }
}
