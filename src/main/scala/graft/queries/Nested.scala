package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Flatten

/** Nested-data surface (SURVEY §2B F1–F5): flatten-to-multimap, deep
  * stringify, explode/posexplode, array + map functions.
  *
  * f1/f2 have no DuckDB oracle (float→string rendering differs between
  * engines); their semantics are pinned by FlattenSpec goldens over the
  * reference corpus instead. Everything else is oracle-checked.
  */
object Nested extends QGroup {

  def defs: Seq[QDef] = Seq(

    // F1: multimap flatten of a list-bearing table (rows-only check +
    // FlattenSpec golden). The multimap arrays are JSON-rendered for the
    // gate: the driver's pandas sorter crashes on raw array cells.
    QDef("f1_flatten_multimap",
      (s, dir) => {
        val flat = Flatten.flattenToMultimap(Tables(s, dir, "embeddings"))
        // dotted names kept verbatim; order by the vec_id leaf (single-elem array)
        QShared.jsonifyComplex(
          flat.orderBy(element_at(col("`vec_id`"), 1).cast("long").asc_nulls_first))
      },
      None),

    // F1b: flatten over an all-string/integer table — oracle-checkable
    // (no float→string rendering involved). Every leaf of `documents` is
    // a scalar, so each multimap cell is a single-element array; the
    // element is extracted for the hash (raw arrays crash the driver).
    QDef("f1b_flatten_documents",
      (s, dir) => {
        val flat = Flatten.flattenToMultimap(Tables(s, dir, "documents"))
        val scalars = flat.schema.fieldNames.toSeq
          .map(n => element_at(col(s"`$n`"), 1).as(n))
        flat.select(scalars: _*)
          
      },
      Some("""SELECT CAST(doc_id AS VARCHAR) AS doc_id, text, lang, source,
        |  CAST(n_chars AS VARCHAR) AS n_chars
        |FROM documents""".stripMargin)),

    // F2: deep-structure stringify (struct → JSON string).
    QDef("f2_stringify_deep",
      (s, dir) => {
        val nested = Tables(s, dir, "events")
          .select(col("event_id"),
            struct(col("user_id"),
              struct(col("event_type"), col("value")).as("inner"),
              array(col("props"), col("props")).as("arr")).as("deep"))
        Flatten.stringifyDeep(nested, maxDepth = 1)
          
      },
      None),

    // F3: posexplode of the embedding vector (1-based index to match
    // DuckDB list indexing).
    QDef("f3_posexplode",
      (s, dir) =>
        Tables(s, dir, "embeddings")
          .filter(col("vec_id") < 50)
          .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "val")))
          .select(col("vec_id"), (col("pos") + 1).as("idx1"), col("val"))
          ,
      Some("""SELECT vec_id, i AS idx1, embedding[i] AS val
        |FROM embeddings, LATERAL (SELECT unnest(generate_series(1, len(embedding))) AS i)
        |WHERE vec_id < 50""".stripMargin)),

    // F4: array functions — size, slice, element access, sort, contains,
    // distinct count.
    QDef("f4_array_functions",
      (s, dir) =>
        Tables(s, dir, "embeddings").select(
          col("vec_id"),
          size(col("embedding")).as("dim"),
          // try_element_at: ANSI mode throws on out-of-range indexes for
          // short/empty vectors where the oracle's [i] returns NULL
          try_element_at(col("embedding"), lit(1)).as("first_v"),
          try_element_at(col("embedding"), lit(-1)).as("last_v"),
          // float arrays are rendered as joined DECIMAL(18,6) strings: raw
          // array cells crash the driver's pandas sorter, and float→string
          // differs between engines. Both sides must promote FLOAT→DOUBLE
          // before the decimal cast: DuckDB's direct FLOAT→DECIMAL rounds
          // in float precision (×10^6 in float), off by 1 ulp vs Spark.
          array_join(transform(slice(col("embedding"), 1, 3),
            x => x.cast("decimal(18,6)").cast("string")), ",").as("head3"),
          array_join(transform(array_sort(slice(col("embedding"), 1, 5)),
            x => x.cast("decimal(18,6)").cast("string")), ",").as("sorted5"),
          array_contains(col("embedding"), try_element_at(col("embedding"), lit(5))).as("has_5th"),
          array_max(col("embedding")).as("vmax"),
          array_min(col("embedding")).as("vmin"),
          size(array_distinct(col("embedding"))).as("n_distinct"))
          ,
      Some("""SELECT vec_id,
        |  CAST(len(embedding) AS INTEGER) AS dim,
        |  embedding[1] AS first_v,
        |  embedding[-1] AS last_v,
        |  array_to_string(list_transform(embedding[1:3],
        |    x -> CAST(CAST(CAST(x AS DOUBLE) AS DECIMAL(18,6)) AS VARCHAR)), ',') AS head3,
        |  array_to_string(list_transform(list_sort(embedding[1:5]),
        |    x -> CAST(CAST(CAST(x AS DOUBLE) AS DECIMAL(18,6)) AS VARCHAR)), ',') AS sorted5,
        |  list_contains(embedding, embedding[5]) AS has_5th,
        |  list_max(embedding) AS vmax,
        |  list_min(embedding) AS vmin,
        |  CAST(len(list_distinct(embedding)) AS INTEGER) AS n_distinct
        |FROM embeddings""".stripMargin)),

    // F4b: higher-order functions — transform, filter, aggregate, zip_with.
    QDef("f4b_array_hofs",
      (s, dir) =>
        Tables(s, dir, "embeddings").select(
          col("vec_id"),
          size(filter(col("embedding"), x => x > 0)).as("n_pos"),
          round(aggregate(transform(col("embedding"), x => x.cast("double")),
            lit(0.0), (acc, x) => acc + x), 6).as("sum6"),
          round(aggregate(
            // cast BEFORE multiplying — float×float rounds differently
            // than the oracle's CAST(x AS DOUBLE)*CAST(x AS DOUBLE)
            zip_with(col("embedding"), col("embedding"),
              (a, b) => a.cast("double") * b.cast("double")),
            lit(0.0), (acc, x) => acc + x), 6).as("norm_sq6"))
          ,
      Some("""SELECT vec_id,
        |  CAST(len(list_filter(embedding, x -> x > 0)) AS INTEGER) AS n_pos,
        |  round(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE))), 6) AS sum6,
        |  round(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), 6) AS norm_sq6
        |FROM embeddings""".stripMargin)),

    // F5: map functions — construction, key/value access, cardinality.
    QDef("f5_map_functions",
      (s, dir) =>
        Tables(s, dir, "events")
          .withColumn("m", map(lit("t"), col("event_type"), lit("u"), col("user_id").cast("string")))
          .select(col("event_id"),
            // try_element_at: ANSI mode (Spark 4 default) makes plain
            // element_at throw on a missing map key.
            try_element_at(col("m"), lit("t")).as("m_t"),
            try_element_at(col("m"), lit("u")).as("m_u"),
            try_element_at(col("m"), lit("zz")).as("m_missing"),
            size(col("m")).as("m_card"),
            // joined string, not a raw array: array cells crash the
            // driver's pandas sorter (VERDICT r1 §2)
            array_join(array_sort(map_keys(col("m"))), ",").as("keys_sorted"))
          ,
      Some("""SELECT event_id,
        |  MAP {'t': event_type, 'u': CAST(user_id AS VARCHAR)}['t'][1] AS m_t,
        |  MAP {'t': event_type, 'u': CAST(user_id AS VARCHAR)}['u'][1] AS m_u,
        |  CAST(NULL AS VARCHAR) AS m_missing,
        |  CAST(cardinality(MAP {'t': event_type, 'u': CAST(user_id AS VARCHAR)}) AS INTEGER) AS m_card,
        |  array_to_string(list_sort(map_keys(MAP {'t': event_type, 'u': CAST(user_id AS VARCHAR)})), ',') AS keys_sorted
        |FROM events""".stripMargin)),

    // F6: inline — the array-of-structs generator (explode + struct
    // field flattening in one op), the shape event payloads and API
    // responses land in. Built per order from its own columns, then
    // inlined back to rows; DuckDB mirrors with unnest(list_of_rows)
    // field access.
    QDef("f6_inline_structs",
      (s, dir) =>
        Tables(s, dir, "orders")
          .filter(col("o_orderkey") % 100 === 0)
          .select(col("o_orderkey"),
            inline(array(
              struct(lit("status").as("k"), col("o_orderstatus").as("v")),
              struct(lit("priority").as("k"), col("o_orderpriority").as("v")))))
          ,
      Some("""SELECT o_orderkey, u.k AS k, u.v AS v
        |FROM (
        |  SELECT o_orderkey,
        |    unnest([{'k': 'status', 'v': o_orderstatus},
        |            {'k': 'priority', 'v': o_orderpriority}]) AS u
        |  FROM orders WHERE o_orderkey % 100 = 0)""".stripMargin))
  )
}
