package graft

import org.apache.spark.sql.functions._
import graft.operators.Flatten

/** F1/F2 golden tests: the reference's R4 flatten semantics over its own
  * corpus fixtures (values cross-checked with pyarrow). */
class FlattenSpec extends SparkSpec {

  test("triple-nested lists flatten to one leaf with nulls preserved") {
    val df = spark.read.parquet(s"$refDir/nested_lists.snappy.parquet")
    val flat = Flatten.flattenToMultimap(df)
    assert(flat.columns.toSeq == Seq("a", "b"))
    val rows = flat.orderBy(size(col("`a`"))).collect()
    assert(rows.length == 3)
    // row 0: a = [[[a,b],[c]],[null,[d]]] → [a,b,c,null,d]
    val a0 = rows(0).getSeq[String](0)
    assert(a0 == Seq("a", "b", "c", null, "d"))
    assert(rows(0).getSeq[String](1) == Seq("1"))
  }

  test("map flatten contributes key and value leaves") {
    val df = spark.read.parquet(s"$refDir/nested_maps.snappy.parquet")
    val flat = Flatten.flattenToMultimap(df)
    assert(flat.columns.contains("a.key"))
    assert(flat.columns.contains("a.value.key"))
    assert(flat.columns.contains("a.value.value"))
    val r = flat.orderBy(col("`a.key`")).limit(1).collect()(0)
    // first row: a = {a -> {1->true, 2->false}}
    assert(r.getSeq[String](r.fieldIndex("a.key")) == Seq("a"))
    assert(r.getSeq[String](r.fieldIndex("a.value.key")) == Seq("1", "2"))
    assert(r.getSeq[String](r.fieldIndex("a.value.value")) == Seq("true", "false"))
  }

  test("deeply nested impala fixture flattens without list/element segments") {
    val flat = Flatten.flattenToMultimap(
      spark.read.parquet(s"$refDir/nullable.impala.parquet"))
    // dotted paths elide list/element but keep struct/map steps
    assert(flat.columns.contains("int_array"))
    assert(flat.columns.contains("int_array_Array"))
    assert(flat.columns.contains("nested_struct.A"))
    assert(flat.columns.exists(_.startsWith("nested_struct.g.")))
    assert(!flat.columns.exists(c => c.contains(".list.") || c.contains(".element")))
    assert(flat.count() == 7)
  }

  test("nonnullable impala fixture: exact leaf values through maximum nesting") {
    // the one-row file with struct→list→struct→list nesting; values
    // cross-checked with pyarrow: nested_Struct.c.D = [[{e:-1, f:"nonnullable"}]]
    val flat = Flatten.flattenToMultimap(
      spark.read.parquet(s"$refDir/nonnullable.impala.parquet"))
    val r = flat.collect()(0)
    def get(c: String) = r.getSeq[String](r.fieldIndex(c))
    assert(get("ID") == Seq("8"))
    assert(get("Int_Array") == Seq("-1"))
    assert(get("int_array_array") == Seq("-1", "-2")) // [[−1,−2],[]] flattens through
    assert(get("Int_Map.key") == Seq("k1"))
    assert(get("Int_Map.value") == Seq("-1"))
    assert(get("nested_Struct.a") == Seq("-1"))
    assert(get("nested_Struct.c.D.e") == Seq("-1"))
    assert(get("nested_Struct.c.D.f") == Seq("nonnullable"))
  }

  test("scalars become single-element arrays; missing stays null entry") {
    val flat = Flatten.flattenToMultimap(
      spark.read.parquet(s"$refDir/nulls.snappy.parquet"))
    assert(flat.columns.toSeq == Seq("b_struct.b_c_int"))
    val vals = flat.collect().map(_.getSeq[String](0))
    assert(vals.forall(_ == Seq(null)))
  }

  test("stringifyDeep JSON-ifies only deep columns") {
    val df = spark.read.parquet(s"$refDir/nested_structs.rust.parquet")
    val out = Flatten.stringifyDeep(df, maxDepth = 0)
    assert(out.schema.fields.forall(_.dataType.typeName == "string"))
    val j = out.limit(1).collect()(0).getString(0)
    assert(j.startsWith("{") && j.contains(":"))

    val shallow = spark.read.parquet(sf("lineitem"))
    val same = Flatten.stringifyDeep(shallow, maxDepth = 3)
    assert(same.schema == shallow.schema)
  }
}
