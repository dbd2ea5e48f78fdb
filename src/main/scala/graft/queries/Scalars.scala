package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Scalar-function surface (SURVEY §2B X1, X3–X6): strings, math,
  * conditionals, cast matrix, JSON. All whole-stage-codegen built-ins;
  * zero UDFs in this file by design.
  *
  * Determinism: transcendentals (ln/pow) are rounded to 6 dp to absorb
  * possible last-ulp libm differences between JVM and DuckDB; double →
  * string formatting is never used (doubles go through round/decimal
  * first).
  */
object Scalars extends QGroup {

  def defs: Seq[QDef] = Seq(

    // X1: string functions over part names.
    QDef("x1_string_scalars",
      (s, dir) =>
        Tables(s, dir, "part").select(
          col("p_partkey"),
          concat(col("p_name"), lit("|"), col("p_brand")).as("cat"),
          upper(col("p_name")).as("up"),
          lower(col("p_type")).as("lo"),
          substring(col("p_name"), 1, 5).as("sub5"),
          element_at(split(col("p_name"), " "), 1).as("first_word"),
          regexp_extract(col("p_name"), "([a-z]+) ([a-z]+)", 2).as("second_word"),
          regexp_replace(col("p_name"), "[aeiou]", "_").as("devoweled"),
          length(col("p_name")).as("len"),
          lpad(col("p_brand"), 10, "*").as("padded"),
          trim(lit("  x  ")).as("trimmed")),
      Some("""SELECT p_partkey,
        |  p_name || '|' || p_brand AS cat,
        |  upper(p_name) AS up,
        |  lower(p_type) AS lo,
        |  substring(p_name, 1, 5) AS sub5,
        |  string_split(p_name, ' ')[1] AS first_word,
        |  regexp_extract(p_name, '([a-z]+) ([a-z]+)', 2) AS second_word,
        |  regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
        |  CAST(length(p_name) AS INTEGER) AS len,
        |  lpad(p_brand, 10, '*') AS padded,
        |  trim('  x  ') AS trimmed
        |FROM part""".stripMargin)),

    // X1b: more string functions — reverse, repeat, position, left/right,
    // contains/starts/ends predicates.
    QDef("x1b_string_scalars2",
      (s, dir) =>
        Tables(s, dir, "part").select(
          col("p_partkey"),
          reverse(col("p_name")).as("rev"),
          repeat(col("p_brand"), 2).as("brand2"),
          instr(col("p_name"), "e").as("pos_e"),
          substring(col("p_name"), 1, 3).as("left3"),
          col("p_name").substr(length(col("p_name")) - 2, lit(3)).as("right3"),
          col("p_name").contains("ring").cast("int").as("has_ring"),
          col("p_name").startsWith("red").cast("int").as("starts_red"),
          col("p_type").endsWith("ED").cast("int").as("ends_ed")),
      Some("""SELECT p_partkey,
        |  reverse(p_name) AS rev,
        |  repeat(p_brand, 2) AS brand2,
        |  CAST(strpos(p_name, 'e') AS INTEGER) AS pos_e,
        |  left(p_name, 3) AS left3,
        |  right(p_name, 3) AS right3,
        |  CAST(contains(p_name, 'ring') AS INTEGER) AS has_ring,
        |  CAST(starts_with(p_name, 'red') AS INTEGER) AS starts_red,
        |  CAST(ends_with(p_type, 'ED') AS INTEGER) AS ends_ed
        |FROM part""".stripMargin)),

    // X3: math functions (floor/ceil as BIGINT on both sides; ln/pow
    // rounded; sqrt is IEEE-exact; integer modulo).
    QDef("x3_math_scalars",
      (s, dir) =>
        Tables(s, dir, "part").select(
          col("p_partkey"),
          round(col("p_retailprice") / 3.0, 2).as("third"),
          floor(col("p_retailprice")).cast("long").as("flr"),
          ceil(col("p_retailprice")).cast("long").as("cl"),
          abs(col("p_retailprice") - 1000.0).as("dist1000"),
          round(pow(col("p_retailprice"), 0.5), 6).as("sqrt_pow"),
          sqrt(col("p_retailprice")).as("sqrt_exact"),
          round(log(col("p_retailprice") + 1.0), 6).as("ln6"),
          (col("p_size") % 7).as("size_mod7"),
          signum(col("p_retailprice") - 1000.0).cast("int").as("sgn")),
      Some("""SELECT p_partkey,
        |  round(p_retailprice / 3.0, 2) AS third,
        |  CAST(floor(p_retailprice) AS BIGINT) AS flr,
        |  CAST(ceil(p_retailprice) AS BIGINT) AS cl,
        |  abs(p_retailprice - 1000.0) AS dist1000,
        |  round(pow(p_retailprice, 0.5), 6) AS sqrt_pow,
        |  sqrt(p_retailprice) AS sqrt_exact,
        |  round(ln(p_retailprice + 1.0), 6) AS ln6,
        |  p_size % 7 AS size_mod7,
        |  CAST(sign(p_retailprice - 1000.0) AS INTEGER) AS sgn
        |FROM part""".stripMargin)),

    // X4: conditionals — CASE, coalesce, nullif, least/greatest.
    QDef("x4_conditional_scalars",
      (s, dir) =>
        Tables(s, dir, "lineitem").select(
          col("l_orderkey"), col("l_linenumber"), col("l_quantity"), col("l_discount"),
          when(col("l_discount") >= 0.05, "high")
            .when(col("l_discount") >= 0.02, "mid")
            .otherwise("low").as("disc_band"),
          coalesce(nullif(col("l_returnflag"), lit("N")), lit("none")).as("flag_or_none"),
          least(col("l_quantity"), col("l_discount") * 100).as("least_v"),
          greatest(col("l_quantity"), col("l_discount") * 100).as("greatest_v")),
      Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_discount,
        |  CASE WHEN l_discount >= 0.05 THEN 'high'
        |       WHEN l_discount >= 0.02 THEN 'mid'
        |       ELSE 'low' END AS disc_band,
        |  COALESCE(NULLIF(l_returnflag, 'N'), 'none') AS flag_or_none,
        |  least(l_quantity, l_discount * 100) AS least_v,
        |  greatest(l_quantity, l_discount * 100) AS greatest_v
        |FROM lineitem""".stripMargin)),

    // X5: cast matrix — numeric↔string↔decimal↔date round-trips.
    QDef("x5_cast_matrix",
      (s, dir) =>
        Tables(s, dir, "lineitem").select(
          col("l_orderkey"), col("l_linenumber"),
          col("l_quantity").cast("int").as("qty_int"),
          col("l_quantity").cast("int").cast("string").as("qty_str"),
          col("l_quantity").cast("int").cast("string").cast("double").as("qty_back"),
          // decimal → double for the hashed cell (a raw scale-2 decimal
          // renders "123.40" vs the oracle's float64 "123.4" under the
          // driver's hasher); price_dec_str still certifies dec→string.
          col("l_extendedprice").cast("decimal(12,2)").cast("double").as("price_dec"),
          col("l_extendedprice").cast("decimal(12,2)").cast("string").as("price_dec_str"),
          col("l_shipdate").cast("date").cast("string").as("ship_date_str"),
          col("l_linenumber").cast("double").as("ln_dbl")),
      Some("""SELECT l_orderkey, l_linenumber,
        |  CAST(trunc(l_quantity) AS INTEGER) AS qty_int,
        |  CAST(CAST(trunc(l_quantity) AS INTEGER) AS VARCHAR) AS qty_str,
        |  CAST(CAST(CAST(trunc(l_quantity) AS INTEGER) AS VARCHAR) AS DOUBLE) AS qty_back,
        |  CAST(CAST(l_extendedprice AS DECIMAL(12,2)) AS DOUBLE) AS price_dec,
        |  CAST(CAST(l_extendedprice AS DECIMAL(12,2)) AS VARCHAR) AS price_dec_str,
        |  CAST(CAST(l_shipdate AS DATE) AS VARCHAR) AS ship_date_str,
        |  CAST(l_linenumber AS DOUBLE) AS ln_dbl
        |FROM lineitem""".stripMargin)),

    // X6b: VARIANT (Spark 4 semi-structured type) — parse once, extract
    // typed fields; oracle via DuckDB JSON operators.
    // r11 shape: `$.k` is extracted ONCE (as string) and the int view is
    // a cast of that string — each try_variant_get re-walks the variant
    // binary (no codegen CSE across the three calls; stepwise
    // decomposition at sf0.1: scan 0.05 s, +parse_json ~0.21, each
    // extraction +0.04). The dominant cost is parse_json itself — the
    // string->variant-binary encode — which is the query's whole point;
    // its CPU floor vs DuckDB's fused JSON operators is ledgered in
    // FLOORS.md. A/B (interleaved, identical rows): 0.28 -> 0.24 s.
    QDef("x6b_variant",
      (s, dir) =>
        Tables(s, dir, "events")
          .withColumn("v", parse_json(col("props")))
          .withColumn("k_str", try_variant_get(col("v"), "$.k", "string"))
          .select(col("event_id"),
            col("k_str").cast("int").as("k_int"),
            col("k_str"),
            try_variant_get(col("v"), "$.missing", "int").as("k_missing")),
      Some("""SELECT event_id,
        |  CAST(props->>'$.k' AS INTEGER) AS k_int,
        |  props->>'$.k' AS k_str,
        |  CAST(NULL AS INTEGER) AS k_missing
        |FROM events""".stripMargin)),

    // X6d: the x6b FLOORS lever realized — typed extraction over the
    // PERSISTED variant-encoded events projection (QShared
    // .variantEvents: parse_json runs once per snapshot at ingest and
    // lands as a Parquet VARIANT column; mtime+length-guarded like
    // every layout). Same outputs and oracle as x6b; what remains in
    // the query is the extraction walk only. A/B at sf0.1
    // (interleaved, identical rows): 0.24 (x6b live parse) -> see
    // BASELINE.md r11; the oracle side intentionally re-parses JSON
    // per query — that asymmetry IS the posture being demonstrated,
    // same basis as every bucketed-layout ride.
    QDef("x6d_variant_store",
      (s, dir) =>
        QShared.variantEvents(s, dir)
          .withColumn("k_str", try_variant_get(col("v"), "$.k", "string"))
          .select(col("event_id"),
            col("k_str").cast("int").as("k_int"),
            col("k_str"),
            try_variant_get(col("v"), "$.missing", "int").as("k_missing")),
      Some("""SELECT event_id,
        |  CAST(props->>'$.k' AS INTEGER) AS k_int,
        |  props->>'$.k' AS k_str,
        |  CAST(NULL AS INTEGER) AS k_missing
        |FROM events""".stripMargin)),

    // X6: JSON extraction from the events.props string column. One
    // json_tuple generator parses each props string ONCE for both keys
    // (three get_json_object calls would lean on codegen CSE to avoid a
    // triple parse — json_tuple makes the single parse structural).
    QDef("x6_json_scalars",
      (s, dir) =>
        Tables(s, dir, "events")
          .select(col("event_id"), json_tuple(col("props"), "k", "missing"))
          .toDF("event_id", "k_raw", "m_raw")
          .select(
            col("event_id"),
            col("k_raw").as("k_str"),
            col("k_raw").cast("int").as("k_int"),
            col("m_raw").as("k_missing")),
      Some("""SELECT event_id,
        |  json_extract_string(props, '$.k') AS k_str,
        |  CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_int,
        |  json_extract_string(props, '$.missing') AS k_missing
        |FROM events""".stripMargin)),

    // X7: digest + binary-encoding scalars — the content-addressing
    // primitives dedup pipelines key on (md5/sha256 hex, hex/base64
    // encode, base64 round-trip). Both engines emit lowercase digest
    // hex and uppercase byte hex.
    QDef("x7_digest_scalars",
      (s, dir) =>
        Tables(s, dir, "part").select(
          col("p_partkey"),
          md5(col("p_name")).as("md5_hex"),
          sha2(col("p_name"), 256).as("sha256_hex"),
          hex(col("p_name")).as("name_hex"),
          base64(col("p_name").cast("binary")).as("name_b64"),
          length(unbase64(base64(col("p_name").cast("binary")))).as("b64_roundtrip_len")),
      Some("""SELECT p_partkey,
        |  md5(p_name) AS md5_hex,
        |  sha256(p_name) AS sha256_hex,
        |  hex(p_name) AS name_hex,
        |  base64(p_name::BLOB) AS name_b64,
        |  CAST(octet_length(from_base64(base64(p_name::BLOB))) AS INTEGER) AS b64_roundtrip_len
        |FROM part""".stripMargin)),

    // X8: Unicode NFC normalization via the native graft_normalize
    // expression (Spark ships none; DuckDB's nfc_normalize is the
    // oracle). A decomposed e+U+0301 suffix is appended so the query
    // exercises real recomposition, not just the ASCII fast path —
    // composed vs decomposed forms of the same text must unify before
    // any digest/dedup/token-count sees them.
    QDef("x8_unicode_normalize",
      (s, dir) => {
        // the literal is DECOMPOSED on purpose: 'e' + combining acute
        // (U+0301), which NFC recomposes to a single code point
        def raw = concat(col("p_name"), lit(" café"))
        Tables(s, dir, "part").select(
          col("p_partkey"),
          graft.GraftFunctions.normalizeNative(s, raw).as("nfc"),
          length(raw).as("len_raw"),
          length(graft.GraftFunctions.normalizeNative(s, raw)).as("len_nfc"))
      },
      Some("""SELECT p_partkey,
        |  nfc_normalize(p_name || ' cafe' || chr(769)) AS nfc,
        |  CAST(length(p_name || ' cafe' || chr(769)) AS INTEGER) AS len_raw,
        |  CAST(length(nfc_normalize(p_name || ' cafe' || chr(769))) AS INTEGER) AS len_nfc
        |FROM part""".stripMargin)),

    // X9: URL parsing — host/path/query/param extraction (crawl-corpus
    // provenance analysis: per-domain counts, dedup keys, robots
    // filtering all start here). URLs are synthesized deterministically
    // from customer rows; Spark's parse_url (Hive-compatible java.net
    // parsing) is cross-checked against an independent regexp
    // formulation in DuckDB — the oracle certifies the two mechanisms
    // agree, not that one copies the other.
    QDef("x9_url_parse",
      (s, dir) => {
        val url = concat(lit("https://shop"), col("c_custkey") % 5,
          lit(".example.com/seg/"), col("c_mktsegment"),
          lit("/item?cust="), col("c_custkey"),
          lit("&nation="), col("c_nationkey"))
        Tables(s, dir, "customer").select(
          col("c_custkey"),
          parse_url(url, lit("HOST")).as("host"),
          parse_url(url, lit("PATH")).as("path"),
          parse_url(url, lit("QUERY")).as("query"),
          parse_url(url, lit("QUERY"), lit("nation")).as("nation_param"))
      },
      Some("""WITH u AS (
        |  SELECT c_custkey,
        |    'https://shop' || (c_custkey % 5) || '.example.com/seg/' ||
        |    c_mktsegment || '/item?cust=' || c_custkey ||
        |    '&nation=' || c_nationkey AS url
        |  FROM customer)
        |SELECT c_custkey,
        |  regexp_extract(url, '^[a-z]+://([^/?#]+)', 1) AS host,
        |  regexp_extract(url, '^[a-z]+://[^/?#]+([^?#]*)', 1) AS path,
        |  regexp_extract(url, '\?([^#]*)', 1) AS query,
        |  regexp_extract(url, '[?&]nation=([^&#]*)', 1) AS nation_param
        |FROM u""".stripMargin)),

    // X6c: malformed-JSON resilience — real pipelines meet truncated
    // payloads; the engine must null them out, not fail the scan. A
    // deterministic 1-in-7 slice of rows gets a truncated payload;
    // Spark's get_json_object/from_json return NULL on malformed input,
    // mirrored by DuckDB's json_valid guard. Integer-only JSON values
    // so the rendered text is engine-independent.
    QDef("x6c_json_malformed",
      (s, dir) => {
        val js = when(col("event_id") % 7 === 0,
          concat(lit("{\"u\":"), col("user_id").cast("string")))  // truncated
          .otherwise(concat(lit("{\"u\":"), col("user_id").cast("string"),
            lit(",\"t\":\""), col("event_type"), lit("\"}")))
        Tables(s, dir, "events")
          .filter(col("event_id") < 2000)
          .select(col("event_id"),
            get_json_object(js, "$.u").as("u"),
            get_json_object(js, "$.t").as("t"),
            get_json_object(js, "$.u").isNull.as("is_corrupt"))
      },
      Some("""WITH j AS (
        |  SELECT event_id,
        |    CASE WHEN event_id % 7 = 0 THEN '{"u":' || CAST(user_id AS VARCHAR)
        |         ELSE '{"u":' || CAST(user_id AS VARCHAR) || ',"t":"' || event_type || '"}'
        |    END AS js
        |  FROM events WHERE event_id < 2000)
        |SELECT event_id,
        |  CASE WHEN json_valid(js) THEN json_extract_string(js, '$.u') END AS u,
        |  CASE WHEN json_valid(js) THEN json_extract_string(js, '$.t') END AS t,
        |  (CASE WHEN json_valid(js) THEN json_extract_string(js, '$.u') END) IS NULL AS is_corrupt
        |FROM j""".stripMargin)),

    // X11: error-safe arithmetic — ANSI mode (Spark 4 default) makes
    // x/0 and overflow THROW mid-scan; try_divide/try_multiply turn the
    // poison rows into NULLs so one bad record can't kill a 100 TB job.
    // DuckDB's plain operators already yield NULL on /0 (and the
    // multiply is CASE-guarded), making the NULL surface comparable.
    QDef("x11_try_arith",
      (s, dir) =>
        Tables(s, dir, "lineitem")
          .filter(col("l_orderkey") < 3000)
          .select(col("l_orderkey"), col("l_linenumber"),
            try_divide(col("l_quantity"), col("l_linenumber") - 1).as("q_over_lm1"),
            try_divide(lit(1.0), col("l_quantity") - col("l_quantity")).as("one_over_zero"),
            try_multiply(col("l_orderkey"), lit(2L)).as("ok2"))
          ,
      Some("""SELECT l_orderkey, l_linenumber,
        |  CASE WHEN l_linenumber - 1 = 0 THEN NULL
        |       ELSE l_quantity / (l_linenumber - 1) END AS q_over_lm1,
        |  CAST(NULL AS DOUBLE) AS one_over_zero,
        |  l_orderkey * 2 AS ok2
        |FROM lineitem WHERE l_orderkey < 3000""".stripMargin)),

    // X10: bitwise scalars + bit aggregates — flag-mask analytics
    // (feature bitmaps, permission masks, partition-id math all live on
    // these). Scalar &, |, ^, shifts per row; bit_and/bit_or/bit_xor
    // fold per group (all three are commutative+associative, so
    // map-side partials make them order-independent by construction).
    QDef("x10_bitwise",
      (s, dir) =>
        Tables(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_partkey"), col("l_returnflag"),
            (col("l_orderkey").bitwiseAND(255)).as("low_byte"),
            (col("l_orderkey").bitwiseOR(col("l_linenumber"))).as("or_line"),
            (col("l_orderkey").bitwiseXOR(col("l_partkey"))).as("xor_part"),
            shiftleft(col("l_linenumber"), 4).as("line_shl4"),
            shiftright(col("l_partkey"), 3).as("part_shr3"))
          .groupBy(col("l_returnflag"))
          .agg(expr("bit_and(low_byte)").as("band"),
            expr("bit_or(or_line)").as("bor"),
            expr("bit_xor(xor_part)").as("bxor"),
            sum(col("line_shl4")).as("sum_shl"),
            sum(col("part_shr3")).as("sum_shr"))
          ,
      Some("""SELECT l_returnflag,
        |  bit_and(l_orderkey & 255) AS band,
        |  bit_or(l_orderkey | l_linenumber) AS bor,
        |  bit_xor(xor(l_orderkey, l_partkey)) AS bxor,
        |  CAST(SUM(l_linenumber * 16) AS BIGINT) AS sum_shl,
        |  CAST(SUM(l_partkey // 8) AS BIGINT) AS sum_shr
        |FROM lineitem GROUP BY l_returnflag""".stripMargin))
  )
}
