package graft.sources

import graft.{Qx, Tables}
import graft.functions.FhirJson
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sources and sinks (SURVEY §2.1).
  *
  * The reference ingests HL7 v2 delimited segment text and nested FHIR
  * JSON bundles into a fixed relational schema via etl/loaders.py
  * (/root/reference/README.md:3,7,76) and exports FHIR MedicationRequest
  * JSON (README.md:10,28-29,71). Spark-side: text/JSON parsing is pure
  * Column expressions (codegen'd, no UDFs), so parse → project stays in
  * one whole-stage-codegen span and scales linearly with input splits.
  */
object Scans {
  import Qx._

  type Q = (SparkSession, String) => DataFrame

  /** Full parquet scan (DuckDB storage ≈ README.md:7; parquet per
    * TESTDATA.md). Vectorized reader + column projection for free. */
  val scanParquet: Q = (s, dir) => {
    import s.implicits._
    Tables.load(s, dir, "region").orderBy($"r_regionkey")
  }

  /** HL7-v2-style delimited segment ingest (README.md:3,7,76): build a
    * PID-like pipe-delimited segment per customer, then parse it back to
    * typed columns with split + casts — the loader path the reference's
    * etl/loaders.py implements in Python. Money travels as integer cents
    * so the string round-trip is exact. */
  /** Malformed-input handling: ~10% of the CSV lines carry a
    * non-numeric key (custkey % 10 == 0 → "BAD<k>"), and the reader
    * runs PERMISSIVE with a corrupt-record column — bad rows are
    * CAPTURED, not dropped or fatal, which is what a 100 TB ingest of
    * third-party files needs (one bad line must not kill a 6-hour
    * job, and silently dropping it corrupts counts). Output is the
    * parse audit: totals, good/corrupt split, and an exact checksum
    * over the rows that parsed — all derivable by the oracle from the
    * clean table plus the same % 10 rule. */
  val scanCsvBadrecords: Q = (s, dir) => {
    import s.implicits._
    val out = Qx.tmpOut("badcsv", dir)
    Tables.load(s, dir, "customer")
      .select(concat_ws(",",
        when($"c_custkey" % 10 === 0, concat(lit("BAD"), $"c_custkey"))
          .otherwise($"c_custkey".cast("string")),
        $"c_nationkey",
        round($"c_acctbal" * 100).cast("long")).as("value"))
      .write.mode("overwrite").text(out)
    val parsed = s.read
      .schema("c_custkey BIGINT, c_nationkey INT, acctbal_cents BIGINT, _bad STRING")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_bad")
      .csv(out)
    // A corrupt row still parses its OTHER fields (only the failing
    // cast nulls out, _bad carries the raw line) — so every "good"
    // metric must gate on _bad being null or corrupt rows' cents
    // would leak into the checksum. One aggregate = one parse pass.
    val good = $"_bad".isNull
    parsed.agg(
      count(lit(1)).as("n_total"),
      count($"_bad").as("n_corrupt"),
      count(when(good, 1)).as("n_good"),
      sum(when(good, $"c_custkey")).as("good_key_sum"),
      sum(when(good, $"acctbal_cents")).as("good_cents_sum"))
  }

  val scanCsvHl7: Q = (s, dir) => {
    import s.implicits._
    val seg = Tables.load(s, dir, "customer").select(
      concat_ws("|", lit("PID"), $"c_custkey", $"c_name", $"c_nationkey",
        round($"c_acctbal" * 100).cast("long"), $"c_mktsegment").as("line"))
    seg.select(split($"line", "\\|").as("p"))
      .select(
        element_at($"p", 2).cast("long").as("custkey"),
        element_at($"p", 3).as("name"),
        element_at($"p", 4).cast("int").as("nationkey"),
        element_at($"p", 5).cast("long").as("acctbal_cents"),
        element_at($"p", 6).as("segment"))
      .orderBy($"custkey")
  }

  /** FHIR-bundle-style nested JSON ingest (README.md:3,76): serialize
    * each order to a nested JSON resource, then parse with an explicit
    * schema and flatten dot-paths — round-trip is identity on values. */
  val scanJsonFhir: Q = (s, dir) => {
    import s.implicits._
    val o = Tables.load(s, dir, "orders")
    val js = o.select($"o_orderkey",
      to_json(struct($"o_orderkey".as("id"),
        struct($"o_custkey".as("subject_id"), $"o_orderstatus".as("status")).as("subject"))).as("j"))
    js.select($"o_orderkey",
        from_json($"j", org.apache.spark.sql.types.StructType.fromDDL(
          "id BIGINT, subject STRUCT<subject_id: BIGINT, status: STRING>")).as("r"))
      .select($"o_orderkey", $"r.id".as("id"),
        $"r.subject.subject_id".as("subject_id"), $"r.subject.status".as("status"))
      .orderBy($"o_orderkey")
  }

  /** Multi-segment HL7 v2 message ingest (README.md:3,7,76) — the
    * reference's real loader shape, not the single-segment toy: each
    * message is MSH (header) + PID (patient) + RXE (pharmacy order),
    * and the parser routes segments by their 3-letter type to produce
    * ONE typed med row per message. Framing is one message per row
    * (file-per-message / length-prefixed sources land this way), so
    * parsing is pure per-row Column work: split into segments, pick
    * each segment with a type-prefix lambda filter, split fields on
    * `|` — embarrassingly parallel, no shuffle before the final sort.
    * The DuckDB oracle stages the identical text and parses it with
    * string_split + list_filter. Money travels as integer cents. */
  /** Staged HL7 v2 message corpus (one message STRING per row, column
    * `msg`; segments separated by `sep` — `\n` for the in-plan batch
    * staging, `\r` — the actual HL7 v2 segment terminator — when the
    * messages are written one-per-line to text files for the streaming
    * ingest twin). Shared generator for [[scanHl7Message]],
    * `stream_hl7_ingest`, and the file-source stream in StreamRunner. */
  private[graft] def hl7Messages(s: SparkSession, dir: String,
      sep: String = "\n"): DataFrame = {
    import s.implicits._
    val joined = Tables.load(s, dir, "orders")
      .join(Tables.load(s, dir, "customer"), $"o_custkey" === $"c_custkey")
      .join(Tables.load(s, dir, "lineitem").filter($"l_linenumber" === 1),
        $"l_orderkey" === $"o_orderkey")
      .join(Tables.load(s, dir, "part"), $"l_partkey" === $"p_partkey")
      .filter($"o_orderkey" <= 4000)
    joined.select(concat(
      lit("MSH|^~\\&|PHARMACY|SIGMA|RX|SITE|"), $"o_orderkey", lit(sep),
      lit("PID|1|"), $"o_custkey", lit("|"), $"c_name", lit("|"), $"c_mktsegment", lit(sep),
      lit("RXE|1|CUI"), $"l_partkey", lit("|"), $"p_name", lit("|"),
      $"l_quantity".cast("long"), lit("|"),
      round($"l_extendedprice" * 100).cast("long")).as("msg"))
  }

  /** Segment-routing HL7 parser over a `msg` string column — pure
    * per-row Column work (split on any of `\r`/`\n`, type-prefix lambda
    * filter, field split on `|`), shared verbatim by the batch scan and
    * the Structured Streaming file-source ingest (StreamRunner
    * .hl7FileStream): the parity the spec asserts is BY CONSTRUCTION
    * the same expressions. No sort — callers order (streams can't). */
  private[graft] def hl7Rows(msgs: DataFrame): DataFrame = {
    val segs = msgs.select(split(col("msg"), "[\r\n]").as("segs"))
    // try_element_at, not element_at: a message MISSING a segment type
    // (malformed feed input) must yield null fields for that segment,
    // not throw INVALID_ARRAY_INDEX and kill the whole batch/stream
    // (EdgeCaseSpec pins this).
    def seg(prefix: String): Column =
      split(try_element_at(filter(col("segs"), x => x.startsWith(prefix)), lit(1)), "\\|")
    // try_element_at on fields too: a TRUNCATED segment ("PID|1") must
    // null its missing fields, not throw
    def f(c: String, i: Int): Column = try_element_at(col(c), lit(i))
    // try_cast, not cast: these fields come from UNTRUSTED message text,
    // and under Spark 4's default ANSI mode a present-but-non-numeric
    // field (e.g. "PID|1|abc|...") in a plain cast throws
    // CAST_INVALID_INPUT and kills the whole batch/stream — the exact
    // failure the try_element_at hardening above exists to prevent; the
    // null field is the dead-letterable signal instead
    def fl(c: String, i: Int): Column = f(c, i).try_cast("long")
    segs.select(seg("MSH").as("msh"), seg("PID").as("pid"), seg("RXE").as("rxe"))
      .select(
        fl("msh", 7).as("msg_id"),
        fl("pid", 3).as("patient_id"),
        f("pid", 4).as("patient_name"),
        f("pid", 5).as("segment"),
        f("rxe", 3).as("rxnorm_cui"),
        f("rxe", 4).as("drug_name"),
        fl("rxe", 5).as("qty"),
        fl("rxe", 6).as("price_cents"))
  }

  val scanHl7Message: Q = (s, dir) => {
    import s.implicits._
    hl7Rows(hl7Messages(s, dir))
      // lineitem has no unique key — (orderkey, linenumber) repeats with
      // different parts, so msg_id ties: total ORDER BY over all columns.
      .orderBy($"msg_id", $"rxnorm_cui", $"qty", $"price_cents")
  }

  /** Batch twin of the continuous HL7 ingest monitor (StreamRunner
    * .hl7FileStream runs the REAL file-source stream over the same
    * parser; StreamingSpec asserts row-level parity): per market
    * segment, message count and quantity/cents totals — the per-source
    * health aggregation an ingest loop publishes each interval.
    * Integer-exact measures, so no rounding concerns. */
  val streamHl7Ingest: Q = (s, dir) => {
    import s.implicits._
    hl7Rows(hl7Messages(s, dir))
      .groupBy($"segment")
      .agg(count(lit(1)).as("n_msgs"),
        sum($"qty").as("qty_sum"),
        sum($"price_cents").as("cents_sum"))
      .orderBy($"segment")
  }

  /** FHIR Bundle ingest (README.md:3,76) — the reference's real JSON
    * shape: one Bundle per patient whose `entry[]` array mixes a
    * Patient resource with that patient's MedicationRequest resources.
    * Construction serializes a union-struct entry array (to_json drops
    * null fields, so each resource carries only its own keys); the
    * read path is from_json → explode(entry.resource) → route by
    * resourceType → join the patient entry back onto its med entries.
    * Per-bundle entry count is bounded by per-patient fills, so the
    * collect_list stays small at any corpus scale (partitioned by
    * patient, never global). */
  /** Staged FHIR Bundle corpus (one serialized Bundle per row, column
    * `bundle`) — shared generator for [[scanFhirBundle]] and the NDJSON
    * landing files the streaming ingest twin tails (to_json emits
    * compact single-line JSON, so one-bundle-per-line framing is free). */
  private[graft] def fhirBundles(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cust = Tables.load(s, dir, "customer").filter($"c_custkey" <= 300)
    val reqs = Tables.load(s, dir, "orders").filter($"o_custkey" <= 300)
      .select($"o_custkey",
        struct(lit("MedicationRequest").as("resourceType"),
          concat(lit("rx-"), $"o_orderkey").as("id"),
          lit(null).cast("string").as("name"),
          lit(null).cast("string").as("segment"),
          $"o_orderkey".as("okey"),
          $"o_orderstatus".as("status")).as("res"))
      .groupBy($"o_custkey").agg(sort_array(collect_list($"res")).as("reqs"))
    cust.join(reqs, $"c_custkey" === $"o_custkey")
      .select(to_json(struct(
        lit("Bundle").as("resourceType"),
        concat(lit("bundle-"), $"c_custkey").as("id"),
        concat(
          array(struct(struct(
            lit("Patient").as("resourceType"),
            concat(lit("pat-"), $"c_custkey").as("id"),
            $"c_name".as("name"),
            $"c_mktsegment".as("segment"),
            lit(null).cast("long").as("okey"),
            lit(null).cast("string").as("status")).as("resource"))),
          transform($"reqs", r => struct(r.as("resource")))).as("entry"))).as("bundle"))
  }

  /** Bundle parser over a `bundle` JSON-string column: from_json with
    * an explicit schema, then ROW-LOCAL resource routing — the patient
    * entry is picked out of the entry array with a lambda filter and
    * carried alongside while only the med entries explode. Zero
    * shuffle (the r1–r7 form exploded everything and joined patient
    * back on bundle_id — one exchange per scan and a stream-stream
    * join in the streaming form; this is strictly better at any
    * scale). Shared verbatim by the batch scan and StreamRunner
    * .fhirFileStream, so batch/stream parity holds by construction.
    * No sort — callers order (streams can't). */
  private[graft] def fhirBundleRows(bundles: DataFrame): DataFrame = {
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "resourceType STRING, id STRING, entry ARRAY<STRUCT<resource: STRUCT<" +
        "resourceType: STRING, id: STRING, name: STRING, segment: STRING, " +
        "okey: BIGINT, status: STRING>>>")
    bundles
      .select(from_json(col("bundle"), schema).as("b"))
      .select(
        col("b"),
        // try_element_at: a bundle with no Patient entry (malformed
        // input) carries null patient fields instead of failing the run
        try_element_at(filter(col("b.entry.resource"),
          r => r.getField("resourceType") === "Patient"), lit(1)).as("pat"),
        explode_outer(filter(col("b.entry.resource"),
          r => r.getField("resourceType") === "MedicationRequest")).as("m"))
      // an UNDECODABLE bundle surfaces as ONE all-null dead-letter row
      // — the ingest monitor's corrupt-record signal, matching hl7Rows.
      // from_json in permissive mode yields a struct of NULL FIELDS for
      // corrupt input (never a null struct), so the signal is a null
      // entry array — every decoded bundle carries one, possibly empty.
      // A valid bundle with zero med entries still emits nothing
      // (explode_outer's null med is filtered when entry decoded).
      .filter(col("m").isNotNull || col("b.entry").isNull)
      .select(col("m.okey").as("order_key"),
        col("pat.id").as("patient_ref"),
        col("pat.name").as("patient_name"),
        col("pat.segment").as("segment"),
        col("m.status").as("status"))
  }

  val scanFhirBundle: Q = (s, dir) => {
    import s.implicits._
    fhirBundleRows(fhirBundles(s, dir)).orderBy($"order_key")
  }

  /** Batch twin of the continuous FHIR-bundle ingest monitor
    * (StreamRunner.fhirFileStream runs the real NDJSON file-source
    * stream over the same parser; StreamingSpec asserts row parity):
    * per (segment, status) med-request counts + distinct patients —
    * the per-source health aggregation the ingest loop publishes. */
  val streamFhirIngest: Q = (s, dir) => {
    import s.implicits._
    fhirBundleRows(fhirBundles(s, dir))
      .groupBy($"segment", $"status")
      .agg(count(lit(1)).as("n_meds"),
        countDistinct($"patient_ref").as("n_patients"))
      .orderBy($"segment", $"status")
  }

  /** Parquet sink + re-read (bootstrap persistence, README.md:36,55). */
  val sinkParquet: Q = (s, dir) => {
    import s.implicits._
    val agg = Tables.load(s, dir, "orders")
      .groupBy($"o_orderstatus")
      .agg(count(lit(1)).as("n"), dsum($"o_totalprice").as("total"))
    val out = Qx.tmpOut("sink_parquet", dir)
    agg.write.mode("overwrite").parquet(out)
    s.read.parquet(out).orderBy($"o_orderstatus")
  }

  /** FHIR MedicationRequest-shaped JSON export (README.md:10,28-29,71):
    * one draft resource per order as a serialized JSON string with
    * pinned field order; string/long fields only so the byte form is
    * engine-independent. */
  val sinkJsonFhir: Q = (s, dir) => {
    import s.implicits._
    Tables.load(s, dir, "orders")
      .filter($"o_orderkey" <= 1000)
      .select($"o_orderkey",
        FhirJson.medicationRequest(concat(lit("rx-"), $"o_orderkey"),
          concat(lit("Patient/"), $"o_custkey"),
          "authoredOn" -> date_format($"o_orderdate", "yyyy-MM-dd")).as("resource"))
      .orderBy($"o_orderkey")
  }

  /** Partitioned parquet sink + partition-pruned re-read — the layout a
    * 100 TB table actually uses: one directory per partition value, so
    * a filter on the partition column prunes whole directories before
    * any I/O (PartitionFilters in the scan, not PushedFilters). */
  val sinkParquetPartitioned: Q = (s, dir) => {
    import s.implicits._
    val out = Qx.tmpOut("sink_part", dir)
    Tables.load(s, dir, "orders")
      .write.mode("overwrite").partitionBy("o_orderstatus").parquet(out)
    s.read.parquet(out)
      .filter($"o_orderstatus" === "F")
      .groupBy($"o_orderstatus")
      .agg(count(lit(1)).as("n"), dsum($"o_totalprice").as("total"))
      .orderBy($"o_orderstatus")
  }

  /** Schema-evolution scan (mergeSchema) — how a 100 TB table actually
    * grows: early files lack a column later files carry; the merged
    * read resolves the union schema and nulls the missing column in old
    * files, with no rewrite of historical data. Two batches are
    * materialized with divergent schemas (pid-isolated dir), then read
    * back merged. */
  val scanParquetMergeSchema: Q = (s, dir) => {
    import s.implicits._
    val o = Tables.load(s, dir, "orders")
    val out = Qx.tmpOut("evolve", dir)
    o.filter($"o_orderkey" <= 1000)
      .select($"o_orderkey", $"o_totalprice")
      .write.mode("overwrite").parquet(s"$out/batch=1")
    o.filter($"o_orderkey" > 1000)
      .select($"o_orderkey", $"o_totalprice", $"o_orderpriority")
      .write.mode("overwrite").parquet(s"$out/batch=2")
    s.read.option("mergeSchema", "true").parquet(out)
      .select($"o_orderkey", $"o_totalprice", $"o_orderpriority")
      .orderBy($"o_orderkey")
  }

  /** ORC sink + re-read round-trip — Spark's second first-class columnar
    * format (built into spark-sql, no extra jars): same predicate
    * pushdown / column pruning machinery as parquet, so a pipeline can
    * land in either without plan changes. Values compare against the
    * DuckDB oracle over the original parquet, proving the round-trip is
    * identity on values. */
  val sinkOrc: Q = (s, dir) => {
    import s.implicits._
    val agg = Tables.load(s, dir, "orders")
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n"), dsum($"o_totalprice").as("total"))
    val out = Qx.tmpOut("sink_orc", dir)
    agg.write.mode("overwrite").orc(out)
    s.read.orc(out).orderBy($"o_orderpriority")
  }

  /** CSV sink + typed re-read round-trip — the interchange format every
    * external consumer still speaks. Projection uses integer cents and
    * strings only, so the text round-trip is exact (no float
    * formatting ambiguity); the re-read parses with an explicit schema
    * (never inferSchema — a second pass over 100 TB). */
  val sinkCsv: Q = (s, dir) => {
    import s.implicits._
    val out = Qx.tmpOut("sink_csv", dir)
    Tables.load(s, dir, "customer")
      .select($"c_custkey", $"c_name", $"c_nationkey",
        round($"c_acctbal" * 100).cast("long").as("acctbal_cents"),
        $"c_mktsegment")
      .write.mode("overwrite").option("header", "true")
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false").csv(out)
    // whitespace trimming is ON by default in BOTH the CSV writer and
    // reader and would corrupt values with leading/trailing spaces —
    // disable on both sides for a faithful round-trip (proven on
    // hostile strings in Round2OpsSpec)
    s.read.schema(
        "c_custkey BIGINT, c_name STRING, c_nationkey INT, " +
          "acctbal_cents BIGINT, c_mktsegment STRING")
      .option("header", "true")
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false").csv(out)
      .orderBy($"c_custkey")
  }

  /** Avro format, addressed by its implementing class: this Spark build
    * ships the Avro reader/writer classes inside spark-sql but does not
    * service-register the `avro` short name (no spark-avro module jar),
    * so `.format("avro")` throws while the class-name route plans the
    * identical FileFormat — same vectorized machinery, same options. */
  private val avroFormat = "org.apache.spark.sql.avro.AvroFileFormat"

  /** AVRO sink + re-read round-trip (`sink_avro`) — the row-oriented
    * interchange format HL7/FHIR feeds commonly land as (topic payloads
    * with embedded schemas). Same discipline as [[sinkOrc]]: values
    * compare against the DuckDB oracle over the ORIGINAL parquet, so a
    * lossy round-trip (schema mangling, precision loss) hash-fails. */
  val sinkAvro: Q = (s, dir) => {
    import s.implicits._
    val agg = Tables.load(s, dir, "supplier")
      .groupBy($"s_nationkey")
      .agg(count(lit(1)).as("n"), dsum($"s_acctbal").as("total"))
    val out = Qx.tmpOut("sink_avro", dir)
    agg.write.mode("overwrite").format(avroFormat).save(out)
    s.read.format(avroFormat).load(out).orderBy($"s_nationkey")
  }

  /** AVRO scan (`scan_avro`): stage typed rows as Avro, read them back
    * through a filter + projection + aggregate — proving the read path
    * resolves Avro's union-typed (nullable) fields and logical types
    * into the same typed columns a parquet scan yields. Ints/longs/
    * strings/doubles cover Avro's primitive branches. */
  val scanAvro: Q = (s, dir) => {
    import s.implicits._
    val out = Qx.tmpOut("scan_avro", dir)
    Tables.load(s, dir, "part")
      .select($"p_partkey", $"p_brand", $"p_size", $"p_retailprice")
      .write.mode("overwrite").format(avroFormat).save(out)
    s.read.format(avroFormat).load(out)
      .filter($"p_size" <= 15)
      .groupBy($"p_brand")
      .agg(count(lit(1)).as("n"), dsum($"p_retailprice").as("total"))
      .orderBy($"p_brand")
  }

  /** SQL-centric staging surface (README.md:7): register every table as
    * a view and run one multi-table SQL statement — the exact string the
    * DuckDB oracle runs too. */
  val registerViewSqlText: String = """
    SELECT n_name,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_orders
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name ORDER BY n_name"""

  val registerViewSql: Q = (s, dir) => {
    Tables.registerAll(s, dir)
    s.sql(registerViewSqlText)
  }

  val queries: Map[String, Q] = Map(
    "scan_parquet" -> scanParquet,
    "scan_csv_badrecords" -> scanCsvBadrecords,
    "scan_csv_hl7" -> scanCsvHl7,
    "scan_hl7_message" -> scanHl7Message,
    "scan_json_fhir" -> scanJsonFhir,
    "scan_fhir_bundle" -> scanFhirBundle,
    "sink_parquet" -> sinkParquet,
    "sink_parquet_partitioned" -> sinkParquetPartitioned,
    "sink_json_fhir" -> sinkJsonFhir,
    "sink_orc" -> sinkOrc,
    "sink_csv" -> sinkCsv,
    "sink_avro" -> sinkAvro,
    "scan_avro" -> scanAvro,
    "scan_parquet_merge_schema" -> scanParquetMergeSchema,
    "stream_hl7_ingest" -> streamHl7Ingest,
    "stream_fhir_ingest" -> streamFhirIngest,
    "register_view_sql" -> registerViewSql)

  /** The HL7 message-construction CTE shared VERBATIM by the
    * scan_hl7_message and stream_hl7_ingest oracles — one copy, so an
    * edit to the message shape (or the o_orderkey cap, mirrored from
    * [[hl7Messages]]) can never silently diverge between them. */
  private val hl7OracleCte = """      WITH src AS (
        SELECT concat(
          'MSH|^~\&|PHARMACY|SIGMA|RX|SITE|', o_orderkey, chr(10),
          'PID|1|', o_custkey, '|', c_name, '|', c_mktsegment, chr(10),
          'RXE|1|CUI', l_partkey, '|', p_name, '|',
          CAST(l_quantity AS BIGINT), '|',
          CAST(round(l_extendedprice * 100) AS BIGINT)) AS msg
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN lineitem ON l_orderkey = o_orderkey AND l_linenumber = 1
        JOIN part ON l_partkey = p_partkey
        WHERE o_orderkey <= 4000),
      seg AS (SELECT string_split(msg, chr(10)) AS segs FROM src)"""

  val oracle: Map[String, String] = Map(
    "scan_parquet" -> "SELECT * FROM region ORDER BY r_regionkey",
    "scan_csv_badrecords" -> """
      SELECT COUNT(*) AS n_total,
             CAST(SUM(CASE WHEN c_custkey % 10 = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_corrupt,
             CAST(SUM(CASE WHEN c_custkey % 10 <> 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_good,
             CAST(SUM(CASE WHEN c_custkey % 10 <> 0 THEN c_custkey END) AS BIGINT)
               AS good_key_sum,
             CAST(SUM(CASE WHEN c_custkey % 10 <> 0
                           THEN CAST(round(c_acctbal * 100) AS BIGINT) END) AS BIGINT)
               AS good_cents_sum
      FROM customer""",
    "scan_csv_hl7" -> """
      SELECT CAST(p[2] AS BIGINT) AS custkey, p[3] AS name,
             CAST(p[4] AS INT) AS nationkey,
             CAST(p[5] AS BIGINT) AS acctbal_cents, p[6] AS segment
      FROM (SELECT string_split(concat('PID', '|', c_custkey, '|', c_name, '|',
                     c_nationkey, '|', CAST(round(c_acctbal * 100) AS BIGINT), '|',
                     c_mktsegment), '|') AS p
            FROM customer)
      ORDER BY custkey""",
    "scan_hl7_message" -> s"""
      $hl7OracleCte,
      f AS (SELECT
          string_split(list_filter(segs, x -> x LIKE 'MSH%')[1], '|') AS msh,
          string_split(list_filter(segs, x -> x LIKE 'PID%')[1], '|') AS pid,
          string_split(list_filter(segs, x -> x LIKE 'RXE%')[1], '|') AS rxe
        FROM seg)
      SELECT CAST(msh[7] AS BIGINT) AS msg_id,
             CAST(pid[3] AS BIGINT) AS patient_id,
             pid[4] AS patient_name,
             pid[5] AS segment,
             rxe[3] AS rxnorm_cui,
             rxe[4] AS drug_name,
             CAST(rxe[5] AS BIGINT) AS qty,
             CAST(rxe[6] AS BIGINT) AS price_cents
      FROM f ORDER BY msg_id, rxnorm_cui, qty, price_cents""",
    "stream_hl7_ingest" -> s"""
      $hl7OracleCte,
      f AS (SELECT
          string_split(list_filter(segs, x -> x LIKE 'PID%')[1], '|') AS pid,
          string_split(list_filter(segs, x -> x LIKE 'RXE%')[1], '|') AS rxe
        FROM seg)
      SELECT pid[5] AS segment, COUNT(*) AS n_msgs,
             CAST(SUM(CAST(rxe[5] AS BIGINT)) AS BIGINT) AS qty_sum,
             CAST(SUM(CAST(rxe[6] AS BIGINT)) AS BIGINT) AS cents_sum
      FROM f GROUP BY segment ORDER BY segment""",
    "scan_fhir_bundle" -> """
      SELECT o_orderkey AS order_key, 'pat-' || c_custkey AS patient_ref,
             c_name AS patient_name, c_mktsegment AS segment,
             o_orderstatus AS status
      FROM orders JOIN customer ON o_custkey = c_custkey
      WHERE c_custkey <= 300
      ORDER BY order_key""",
    "stream_fhir_ingest" -> """
      SELECT c_mktsegment AS segment, o_orderstatus AS status,
             COUNT(*) AS n_meds,
             CAST(COUNT(DISTINCT 'pat-' || c_custkey) AS BIGINT) AS n_patients
      FROM orders JOIN customer ON o_custkey = c_custkey
      WHERE c_custkey <= 300
      GROUP BY segment, status ORDER BY segment, status""",
    "scan_json_fhir" -> """
      SELECT o_orderkey, o_orderkey AS id, o_custkey AS subject_id,
             o_orderstatus AS status
      FROM orders ORDER BY o_orderkey""",
    "sink_parquet" -> s"""
      SELECT o_orderstatus, COUNT(*) AS n,
             ${Qx.dsumSql("o_totalprice")} AS total
      FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    "sink_parquet_partitioned" -> s"""
      SELECT o_orderstatus, COUNT(*) AS n,
             ${Qx.dsumSql("o_totalprice")} AS total
      FROM orders WHERE o_orderstatus = 'F'
      GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    "sink_json_fhir" -> """
      SELECT o_orderkey,
             concat('{"resourceType":"MedicationRequest","id":"rx-', o_orderkey,
                    '","status":"draft","subject":{"reference":"Patient/', o_custkey,
                    '"},"authoredOn":"', strftime(o_orderdate, '%Y-%m-%d'), '"}') AS resource
      FROM orders WHERE o_orderkey <= 1000 ORDER BY o_orderkey""",
    "scan_parquet_merge_schema" -> """
      SELECT o_orderkey, o_totalprice,
             CASE WHEN o_orderkey <= 1000 THEN NULL
                  ELSE o_orderpriority END AS o_orderpriority
      FROM orders ORDER BY o_orderkey""",
    "sink_orc" -> s"""
      SELECT o_orderpriority, COUNT(*) AS n,
             ${Qx.dsumSql("o_totalprice")} AS total
      FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "sink_csv" -> """
      SELECT c_custkey, c_name, c_nationkey,
             CAST(round(c_acctbal * 100) AS BIGINT) AS acctbal_cents,
             c_mktsegment
      FROM customer ORDER BY c_custkey""",
    "sink_avro" -> s"""
      SELECT s_nationkey, COUNT(*) AS n,
             ${Qx.dsumSql("s_acctbal")} AS total
      FROM supplier GROUP BY s_nationkey ORDER BY s_nationkey""",
    "scan_avro" -> s"""
      SELECT p_brand, COUNT(*) AS n,
             ${Qx.dsumSql("p_retailprice")} AS total
      FROM part WHERE p_size <= 15
      GROUP BY p_brand ORDER BY p_brand""",
    "register_view_sql" -> registerViewSqlText)
}
