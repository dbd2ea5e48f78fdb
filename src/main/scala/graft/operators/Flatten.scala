package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Record flatten → multimap (SURVEY §2B F1/F2), reproducing the
  * reference's R4/R17 semantics (ParquetConverter.java:115-170,
  * ParquetReaderUtility.java:236-271) schema-driven instead of
  * exception-driven:
  *
  *  - every leaf becomes one output column named by its dotted path,
  *    with `list`/`element` (and parquet-cpp `item`) segments elided;
  *  - a repeated field contributes ALL its values flattened into one
  *    `array<string>` per leaf (nested repetition is flattened through);
  *  - scalars become single-element arrays; absent/null leaves yield a
  *    single null entry (ParquetConverter.java:123-124);
  *  - leaves are stringified: primitives via CAST, timestamps via
  *    Spark's ISO rendering, binary via base64, decimals in plain form;
  *  - maps contribute `<path>.key` and `<path>.value` leaves.
  *
  * This is a pure projection over built-ins (`transform`/`flatten`/
  * `cast`) — one narrow stage, fully codegen'd, no shuffle, no UDFs —
  * so it runs at scan speed at any scale.
  */
object Flatten {

  /** All leaves of `dt` as (dottedPathSegments, extractor) where the
    * extractor maps a column of type `dt` to an `array<string>` of every
    * leaf value under that path. */
  private def leavesOf(dt: DataType): Seq[(Seq[String], Column => Column)] = dt match {
    case st: StructType =>
      st.fields.toSeq.flatMap { f =>
        leavesOf(f.dataType).map { case (p, g) =>
          (f.name +: p, (c: Column) => g(c.getField(f.name)))
        }
      }
    case ArrayType(et, _) =>
      // path unchanged (list/element elision); values multiply.
      leavesOf(et).map { case (p, g) =>
        (p, (c: Column) =>
          when(c.isNull, array(lit(null).cast("string")))
            .otherwise(flatten(transform(c, e => g(e)))))
      }
    case MapType(kt, vt, _) =>
      val keyLeaves = leavesOf(kt).map { case (p, g) =>
        ("key" +: p, (c: Column) =>
          when(c.isNull, array(lit(null).cast("string")))
            .otherwise(flatten(transform(map_keys(c), e => g(e)))))
      }
      val valLeaves = leavesOf(vt).map { case (p, g) =>
        ("value" +: p, (c: Column) =>
          when(c.isNull, array(lit(null).cast("string")))
            .otherwise(flatten(transform(map_values(c), e => g(e)))))
      }
      keyLeaves ++ valLeaves
    case BinaryType =>
      Seq((Nil, (c: Column) => array(base64(c))))
    case _ =>
      Seq((Nil, (c: Column) => array(c.cast(StringType))))
  }

  /** F1: one `array<string>` column per dotted leaf path. */
  def flattenToMultimap(df: DataFrame): DataFrame = {
    val cols = df.schema.fields.toSeq.flatMap { f =>
      leavesOf(f.dataType).map { case (p, g) =>
        g(col(s"`${f.name}`")).as((f.name +: p).mkString("."))
      }
    }
    df.select(cols: _*)
  }

  /** F2 (R23 catch-all): stringify any column nested deeper than
    * `maxDepth` (or any multi-child struct when `maxDepth==0`) to JSON,
    * leaving shallow columns untouched. */
  def stringifyDeep(df: DataFrame, maxDepth: Int = 3): DataFrame = {
    def depth(dt: DataType): Int = dt match {
      case st: StructType => 1 + (if (st.fields.isEmpty) 0 else st.fields.map(f => depth(f.dataType)).max)
      case ArrayType(et, _) => 1 + depth(et)
      case MapType(kt, vt, _) => 1 + math.max(depth(kt), depth(vt))
      case _ => 0
    }
    val cols = df.schema.fields.toSeq.map { f =>
      if (depth(f.dataType) > maxDepth) to_json(col(s"`${f.name}`")).as(f.name)
      else col(s"`${f.name}`")
    }
    df.select(cols: _*)
  }
}
