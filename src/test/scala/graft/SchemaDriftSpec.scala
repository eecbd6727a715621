package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Canary for driver-side testdata regeneration (the r10/r11 incident:
  * events.ts silently changed parquet logical type from int64-nanos to
  * timestamp[us] no-tz and 36 queries crashed at analysis time). Two
  * guards:
  *
  *  1. `Tables.loadEvents` must accept every `ts` encoding the data has
  *     ever shipped with — int64 nanos, timestamp_ntz, UTC-adjusted
  *     timestamp — and normalize all of them to the SAME TimestampType
  *     values, so a future regeneration degrades to one red test naming
  *     the encoding instead of 36 driver crashes.
  *  2. Every table in `Tables.names` must load from the real testdata
  *     and present exactly the pinned post-load schema — any type drift
  *     (`o_orderdate`, `embeddings.embedding`, …) fails here BY NAME
  *     before it can fan out across the query surface.
  */
class SchemaDriftSpec extends SparkSpec {

  test("events.ts loads identically from all three historical encodings") {
    import spark.implicits._
    val base = Qx.tmpOut("tsenc", sf())
    // µs-exact instants (the generator's contract: ns % 1000 == 0)
    val micros = Seq(1704067200000000L, 1704070800123456L, 1706572800999999L)
    val rows = micros.zipWithIndex.map { case (us, i) =>
      (i.toLong, us, i.toLong % 3, s"type$i", i * 1.5, s"""{"k": $i}""")
    }.toDF("event_id", "us", "user_id", "event_type", "value", "props")

    val asLongNanos = rows.withColumn("ts", $"us" * 1000L).drop("us")
    val asTz = rows.withColumn("ts", timestamp_micros($"us")).drop("us")
    val asNtz = asTz.withColumn("ts", $"ts".cast(TimestampNTZType))

    val dirs = Seq("nanos" -> asLongNanos, "tz" -> asTz, "ntz" -> asNtz)
      .map { case (name, df) =>
        val dir = s"$base/$name"
        df.select("event_id", "ts", "user_id", "event_type", "value", "props")
          .write.mode("overwrite").parquet(s"$dir/events.parquet")
        name -> dir
      }

    val loaded = dirs.map { case (name, dir) =>
      val df = Tables.load(spark, dir, "events")
      assert(df.schema("ts").dataType === TimestampType,
        s"encoding $name must normalize to TimestampType")
      name -> df.select($"event_id", unix_micros($"ts").as("us"))
        .as[(Long, Long)].collect().sortBy(_._1).toSeq
    }
    val expected = micros.zipWithIndex.map { case (us, i) => (i.toLong, us) }
    loaded.foreach { case (name, got) =>
      assert(got === expected, s"encoding $name changed ts values")
    }
  }

  test("events loader rejects an unrecognized ts type with a clear error") {
    import spark.implicits._
    val dir = s"${Qx.tmpOut("tsenc_bad", sf())}/bad"
    Seq((1L, "not-a-timestamp")).toDF("event_id", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val e = intercept[IllegalStateException](Tables.load(spark, dir, "events"))
    assert(e.getMessage.contains("unsupported parquet-declared type"))
  }

  // The pinned POST-LOAD schema contract for the driver testdata —
  // what every query in the surface assumes. Pyarrow-profiled
  // 2026-08-13: all timestamp columns are parquet timestamp[us] no-tz
  // (Spark: TIMESTAMP_NTZ) except events.ts, which Tables.loadEvents
  // normalizes to TimestampType for the streaming/window surface.
  private val pinned: Map[String, Seq[(String, DataType)]] = Map(
    "region" -> Seq("r_regionkey" -> IntegerType, "r_name" -> StringType),
    "nation" -> Seq("n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType),
    "customer" -> Seq("c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType),
    "supplier" -> Seq("s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType),
    "part" -> Seq("p_partkey" -> LongType, "p_name" -> StringType,
      "p_brand" -> StringType, "p_type" -> StringType,
      "p_size" -> IntegerType, "p_retailprice" -> DoubleType),
    "orders" -> Seq("o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
      "o_orderdate" -> TimestampNTZType, "o_orderpriority" -> StringType),
    "lineitem" -> Seq("l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType,
      "l_shipdate" -> TimestampNTZType),
    "events" -> Seq("event_id" -> LongType, "ts" -> TimestampType,
      "user_id" -> LongType, "event_type" -> StringType,
      "value" -> DoubleType, "props" -> StringType),
    "documents" -> Seq("doc_id" -> LongType, "text" -> StringType,
      "lang" -> StringType, "source" -> StringType, "n_chars" -> LongType),
    "embeddings" -> Seq("vec_id" -> LongType,
      "embedding" -> ArrayType(FloatType, containsNull = true),
      "label" -> IntegerType))

  for (sfDir <- Seq("0.001", "0.01", "0.1")) {
    test(s"every table loads with the pinned post-load schema at sf$sfDir") {
      assert(Tables.names.toSet === pinned.keySet, "table inventory drift")
      val drift = Tables.names.flatMap { t =>
        val got = Tables.load(spark, sf(sfDir), t).schema
          .map(f => f.name -> f.dataType)
        if (got == pinned(t)) None else Some(s"$t: got $got, pinned ${pinned(t)}")
      }
      assert(drift.isEmpty, "testdata schema drift (regenerate contract):\n" +
        drift.mkString("\n"))
    }
  }
}
