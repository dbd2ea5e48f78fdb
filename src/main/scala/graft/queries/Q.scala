package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One certified query: a Spark definition, an optional DuckDB oracle
  * (ANSI SQL over the same parquet tables), and a headline flag for the
  * benchmark set.
  *
  * Determinism contract (SURVEY §2B): result VALUES are deterministic —
  * float aggregates are computed on DECIMAL(38,6) so summation order
  * can't change the result; timestamps are rendered as UTC strings;
  * LIMIT only after a total order (the one place ordering is semantic).
  * Result row ORDER is deliberately unconstrained: the gate's comparator
  * canonicalizes it (sorts rows by every column, then hashes rendered
  * cells), so a final total-order ORDER BY would buy nothing and cost a
  * full-output range-exchange — at corpus scale, a sampling pass plus a
  * sort of every output row that no consumer needs. Queries whose
  * SEMANTIC is ordering (sort/top-k operators, window ORDER BY) keep
  * their sorts; the oracle SQL mirrors whatever the Spark side declares.
  * Column names are aliased identically on both sides (the comparator
  * sorts columns by name before hashing).
  */
final case class QDef(
    name: String,
    spark: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    headline: Boolean = false)

trait QGroup {
  def defs: Seq[QDef]
}

/** Suite-wide constants of the determinism contract. */
object QShared {
  /** All float/money aggregates are computed on this type so results are
    * independent of partitioning and summation order (Q.scala contract). */
  val dec: org.apache.spark.sql.types.DecimalType =
    org.apache.spark.sql.types.DecimalType(38, 6)

  /** Idempotent sink path for queries that exercise the write path:
    * stable per (sf dir, query), overwritten on rerun. */
  def sink(dir: String, name: String): String =
    s"/tmp/graft_sink/${name}_${Integer.toHexString(dir.hashCode)}"

  /** DuckDB rendering of `TextAnalysis.qualityMetrics`' composite
    * score over a `text` column — ONE definition interpolated into
    * every oracle that scores quality (l3d, l18, l19): three drifting
    * copies of a 16-line formula is how oracle parity silently breaks
    * for exactly one query. */
  val qualityScoreSql: String =
    """round(greatest(0.0, least(1.0,
      |    1.0
      |    - (CAST(length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')) AS DOUBLE)
      |       / greatest(length(text), 1)) * 2.0
      |    - CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE)
      |      / greatest(length(text), 1)
      |    - CASE WHEN CAST(length(replace(text, ' ', '')) AS DOUBLE)
      |                / (length(text) - length(replace(text, ' ', '')) + 1) < 2.0
      |             OR CAST(length(replace(text, ' ', '')) AS DOUBLE)
      |                / (length(text) - length(replace(text, ' ', '')) + 1) > 12.0
      |           THEN 0.3 ELSE 0.0 END
      |    - CASE WHEN length(text) - length(replace(text, ' ', '')) + 1 < 5
      |           THEN 0.3 ELSE 0.0 END)), 4)""".stripMargin

  /** Render every array/map/struct column as its JSON string. The
    * driver's comparator sorts result rows with pandas, which crashes on
    * ndarray cells ("unhashable type: numpy.ndarray", VERDICT r1 §2) —
    * complex-typed outputs must be stringified to be checkable at all. */
  def jsonifyComplex(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{col, to_json}
    import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
    val cols = df.schema.fields.toSeq.map { f =>
      f.dataType match {
        case _: ArrayType | _: MapType | _: StructType =>
          to_json(col(s"`${f.name}`")).as(f.name)
        case _ => col(s"`${f.name}`")
      }
    }
    df.select(cols: _*)
  }
}
