package graft

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import scala.jdk.CollectionConverters._

/** SURVEY §5.2 item 2: property-based write→read round-trips over
  * generated schemas (primitives, decimal, date/ts, arrays, structs) and
  * generated rows with nulls. (Raw ScalaCheck generators with fixed
  * seeds — the scalatest↔scalacheck bridge isn't in the offline cache.) */
class RoundTripPropertySpec extends SparkSpec {

  private val leafGens: Seq[(DataType, Gen[Any])] = Seq(
    (IntegerType, Gen.chooseNum(Int.MinValue, Int.MaxValue)),
    (LongType, Gen.chooseNum(Long.MinValue, Long.MaxValue)),
    (DoubleType, Gen.oneOf(Gen.chooseNum(-1e12, 1e12), Gen.const(Double.NaN))),
    (BooleanType, Gen.oneOf(true, false)),
    (StringType, Gen.alphaNumStr.map(_.take(20))),
    (BinaryType, Gen.listOf(Gen.chooseNum(-128, 127).map(_.toByte)).map(_.take(16).toArray)),
    (DecimalType(18, 4),
      Gen.chooseNum(-999999999L, 999999999L).map(n => new java.math.BigDecimal(n).movePointLeft(4))),
    (DateType, Gen.chooseNum(0, 20000).map(d => Date.valueOf(java.time.LocalDate.ofEpochDay(d.toLong)))),
    (TimestampType, Gen.chooseNum(0L, 2000000000L).map(s => new Timestamp(s * 1000L))))

  private def valueGen(dt: DataType): Gen[Any] = dt match {
    case ArrayType(et, _) => Gen.listOfN(3, nullable(valueGen(et))).map(_.toSeq)
    case st: StructType =>
      Gen.sequence[List[Any], Any](st.fields.toList.map(f => nullable(valueGen(f.dataType))))
        .map(vs => Row.fromSeq(vs))
    case other => leafGens.find(_._1 == other).get._2
  }

  private def nullable(g: Gen[Any]): Gen[Any] =
    Gen.frequency(4 -> g, 1 -> Gen.const(null))

  private val fieldType: Gen[DataType] = Gen.frequency(
    6 -> Gen.oneOf(leafGens.map(_._1)),
    2 -> Gen.oneOf(leafGens.map(_._1)).map(ArrayType(_, containsNull = true)),
    1 -> Gen.oneOf(leafGens.map(_._1)).map(t =>
      StructType(Seq(StructField("x", t), StructField("y", StringType)))))

  private val schemaGen: Gen[StructType] =
    Gen.chooseNum(1, 6).flatMap { n =>
      Gen.listOfN(n, fieldType).map { ts =>
        StructType(ts.zipWithIndex.map { case (t, i) => StructField(s"c$i", t) })
      }
    }

  /** Structural canonicalization: byte arrays → hex, seq impls unified,
    * recursion through rows/seqs — identity-based toString is useless for
    * Array[Byte]. */
  private def canonValue(v: Any): String = v match {
    case null => "null"
    case b: Array[Byte] => "0x" + b.map("%02x".format(_)).mkString
    case r: Row => r.toSeq.map(canonValue).mkString("[", ",", "]")
    case s: scala.collection.Seq[_] => s.map(canonValue).mkString("(", ",", ")")
    case other => other.toString
  }

  private def canon(rows: Seq[Row]): Seq[String] = rows.map(canonValue).sorted

  test("write→read preserves data for arbitrary schemas (20 seeded cases)") {
    val caseGen = for {
      schema <- schemaGen
      n <- Gen.chooseNum(0, 30)
      rows <- Gen.listOfN(n, valueGen(schema).map(_.asInstanceOf[Row]))
    } yield (schema, rows)

    for (seed <- 1 to 20) {
      val (schema, rows) = caseGen.pureApply(Gen.Parameters.default, Seed(seed.toLong))
      val dir = tmpDir("graft-prop") + "/t"
      val df = spark.createDataFrame(rows.asJava, schema)
      df.write.parquet(dir)
      val back = spark.read.schema(schema).parquet(dir)
      assert(back.schema == schema, s"seed=$seed schema=$schema")
      assert(canon(back.collect().toSeq) == canon(rows),
        s"seed=$seed schema=$schema")
    }
  }
}
