package graft

import org.apache.spark.sql.types._

/** Tripwire for harness testdata schema drift. The generator has
  * already changed a column's physical type once across rounds
  * (`events.ts`: INT64 nanos → timestamp[us]) and the failure mode
  * was 11 broken tests with no pointer at the cause. This spec reads
  * every table's ACTUAL schema at the smoke SF and asserts the field
  * names + the type classes the loaders and oracle SQL assume — on
  * the next regeneration, the failure message names the exact table
  * and field instead of scattering analysis errors across suites.
  */
class TestdataSchemaSpec extends SparkSpec {

  private val dir = sf("sf0.001")

  /** (table, field) → acceptable type classes. Liberal where loaders
    * adapt (events.ts), exact where operators/oracles depend on it.
    */
  private val expected: Map[String, Map[String, DataType => Boolean]] = Map(
    "events" -> Map(
      "event_id" -> (_ == LongType),
      // Tables.events normalizes all three representations (SinksSpec)
      "ts" -> (t => t == LongType || t == TimestampType ||
        t == TimestampNTZType),
      "user_id" -> (_ == LongType),
      "event_type" -> (_ == StringType),
      "value" -> (_ == DoubleType),
      "props" -> (_ == StringType)),
    "documents" -> Map(
      "doc_id" -> (_ == LongType),
      "text" -> (_ == StringType),
      "lang" -> (_ == StringType),
      "source" -> (_ == StringType),
      "n_chars" -> (_ == LongType)),
    "embeddings" -> Map(
      "vec_id" -> (_ == LongType),
      // Similarity/Dedup accept float or double elements
      "embedding" -> {
        case ArrayType(FloatType | DoubleType, _) => true
        case _ => false
      },
      "label" -> (t => t == IntegerType || t == LongType)),
    "lineitem" -> Map(
      "l_orderkey" -> (_ == LongType),
      "l_quantity" -> (_ == DoubleType),
      "l_extendedprice" -> (_ == DoubleType),
      "l_returnflag" -> (_ == StringType),
      "l_shipdate" -> (t => t == TimestampType || t == TimestampNTZType ||
        t == DateType)),
    "orders" -> Map(
      "o_orderkey" -> (_ == LongType),
      "o_custkey" -> (_ == LongType),
      "o_totalprice" -> (_ == DoubleType),
      "o_orderdate" -> (t => t == TimestampType || t == TimestampNTZType ||
        t == DateType)),
    "customer" -> Map(
      "c_custkey" -> (_ == LongType),
      "c_name" -> (_ == StringType),
      "c_mktsegment" -> (_ == StringType),
      "c_nationkey" -> (t => t == IntegerType || t == LongType)),
    "nation" -> Map(
      "n_nationkey" -> (t => t == IntegerType || t == LongType),
      "n_name" -> (_ == StringType)),
    "region" -> Map(
      "r_regionkey" -> (t => t == IntegerType || t == LongType),
      "r_name" -> (_ == StringType)))

  test("testdata schemas carry the fields and type classes the engine assumes") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val drift = expected.toSeq.sortBy(_._1).flatMap { case (table, fields) =>
      val actual = spark.read.parquet(s"$dir/$table.parquet").schema
      val byName = actual.fields.map(f => f.name -> f.dataType).toMap
      fields.toSeq.sortBy(_._1).flatMap { case (name, ok) =>
        byName.get(name) match {
          case None => Some(s"$table.$name: MISSING (have: " +
            s"${actual.fieldNames.mkString(", ")})")
          case Some(t) if !ok(t) =>
            Some(s"$table.$name: unexpected type ${t.simpleString}")
          case _ => None
        }
      }
    }
    assert(drift.isEmpty,
      "testdata schema drift — update loaders/oracles for:\n  " +
        drift.mkString("\n  "))
  }
}
