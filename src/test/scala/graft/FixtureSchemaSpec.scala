package graft

import org.apache.spark.sql.types._

/** Pins the Spark-read schema of every driver-generated fixture table.
  *
  * The driver regenerates /root/testdata between rounds and has changed
  * physical types before (round 6: events.ts went from parquet
  * TIMESTAMP(NANOS), read as ns LONGs under `nanosAsLong`, to
  * timestamp[us], read as TIMESTAMP_NTZ — breaking three distant suites
  * with no common error message). This spec makes the NEXT drift fail
  * loudly in exactly one place. If it fails: the fixture changed, not the
  * engine — update the expectation here AND audit [[graft.core.EventTime]]
  * callers plus any code matching the drifted column.
  */
class FixtureSchemaSpec extends SparkSpec {

  private val expected: Map[String, Seq[(String, DataType)]] = Map(
    "region" -> Seq("r_regionkey" -> IntegerType, "r_name" -> StringType),
    "nation" -> Seq("n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType),
    "customer" -> Seq("c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType),
    "supplier" -> Seq("s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType),
    "part" -> Seq("p_partkey" -> LongType, "p_name" -> StringType,
      "p_brand" -> StringType, "p_type" -> StringType, "p_size" -> IntegerType,
      "p_retailprice" -> DoubleType),
    "orders" -> Seq("o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
      "o_orderdate" -> TimestampNTZType, "o_orderpriority" -> StringType),
    "lineitem" -> Seq("l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType,
      "l_shipdate" -> TimestampNTZType),
    "events" -> Seq("event_id" -> LongType, "ts" -> TimestampNTZType,
      "user_id" -> LongType, "event_type" -> StringType,
      "value" -> DoubleType, "props" -> StringType),
    "documents" -> Seq("doc_id" -> LongType, "text" -> StringType,
      "lang" -> StringType, "source" -> StringType, "n_chars" -> LongType),
    "embeddings" -> Seq("vec_id" -> LongType,
      "embedding" -> ArrayType(FloatType), "label" -> IntegerType)
  )

  // Event-time columns whose physical type has actually drifted before;
  // all consumers must route through EventTime, which accepts these types.
  private val eventTimeTolerated: Set[DataType] =
    Set(LongType, TimestampNTZType, TimestampType)
  private val eventTimeCols = Set("events.ts")

  for ((table, cols) <- expected.toSeq.sortBy(_._1)) {
    test(s"fixture schema: $table") {
      val schema = spark.read.parquet(s"$sfDir/$table.parquet").schema
      val actual = schema.fields.map(f => f.name -> f.dataType).toMap
      for ((name, tpe) <- cols) {
        assert(actual.contains(name),
          s"FIXTURE DRIFT: $table.$name is missing (have: ${actual.keys.toSeq.sorted.mkString(", ")}). " +
            "The driver regenerated testdata with a new shape — update FixtureSchemaSpec and audit consumers.")
        val got = actual(name)
        if (eventTimeCols(s"$table.$name")) {
          assert(got == tpe || eventTimeTolerated(got),
            s"FIXTURE DRIFT: $table.$name read as $got, expected $tpe " +
              s"(or one of the EventTime-tolerated types $eventTimeTolerated). " +
              "Update graft.core.EventTime FIRST, then this spec.")
        } else {
          assert(got == tpe,
            s"FIXTURE DRIFT: $table.$name read as $got, expected $tpe. " +
              "The driver regenerated testdata with a new type — update FixtureSchemaSpec " +
              "and audit every consumer of this column.")
        }
      }
    }
  }

  test("EventTime normalizes every tolerated physical type identically") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val base = Seq(1690000000123456L * 1000L, 1690003600000000L * 1000L).toDF("ts") // ns longs
    val asNs = base
    val asNtz = base.select(timestamp_micros(expr("ts div 1000")).cast(TimestampNTZType).as("ts"))
    val asLtz = base.select(timestamp_micros(expr("ts div 1000")).as("ts"))
    val micros = Seq(asNs, asNtz, asLtz).map(df =>
      df.select(graft.core.EventTime.asMicros(df, "ts").as("us")).as[Long].collect().toSeq)
    assert(micros.distinct.size == 1, s"asMicros disagrees across types: $micros")
    val stamps = Seq(asNs, asNtz, asLtz).map(df =>
      df.select(graft.core.EventTime.asTimestamp(df, "ts").cast("string").as("t"))
        .as[String].collect().toSeq)
    assert(stamps.distinct.size == 1, s"asTimestamp disagrees across types: $stamps")
  }
}
