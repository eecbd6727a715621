package graft.functions

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scalar function surface (SURVEY §2.8).
  *
  * Reference basis: RxNorm-style name normalization
  * (/root/reference/README.md:3,7), clinical-history date math
  * (README.md:3,7), the explicit logistic denial-risk score
  * (README.md:9,27,77), FHIR JSON in/out (README.md:10,76). Everything
  * is a built-in Column expression — codegen'd, Catalyst-foldable, and
  * (unlike a UDF) transparent to predicate pushdown.
  */
object Scalars {

  type Q = (SparkSession, String) => DataFrame

  /** upper/lower/trim/substring/concat/split/regexp — drug-name
    * normalization shape (README.md:3,7). */
  val fnStringNorm: Q = (s, dir) => {
    import s.implicits._
    Tables.load(s, dir, "part")
      .select($"p_partkey",
        upper($"p_name").as("name_upper"),
        trim(lower($"p_brand")).as("brand_lower"),
        substring($"p_type", 1, 4).as("type_prefix"),
        concat($"p_brand", lit(":"), $"p_type").as("brand_type"),
        regexp_extract($"p_name", "^(\\w+)", 1).as("first_word"),
        regexp_replace($"p_name", " ", "_").as("name_snake"))
      .orderBy($"p_partkey")
  }

  /** date_trunc / extract / day-diff / month-add — coverage windows and
    * refill intervals (README.md:3,7). Day arithmetic is expressed as
    * ANSI date_part-style diffs so the DuckDB oracle matches. */
  val fnDate: Q = (s, dir) => {
    import s.implicits._
    Tables.load(s, dir, "orders")
      .select($"o_orderkey",
        year($"o_orderdate").as("order_year"),
        month($"o_orderdate").as("order_month"),
        date_trunc("month", $"o_orderdate").as("month_start"),
        datediff($"o_orderdate", to_date(lit("1995-01-01"))).as("days_since_95"),
        date_format(add_months($"o_orderdate", 3), "yyyy-MM-dd").as("plus_3m"))
      .orderBy($"o_orderkey")
  }

  /** FLAGSHIP — the reference's explicit denial-risk model: "simple
    * logistic-style function based on price, tier and prior
    * authorisation" (README.md:9,27,77). Plain Column arithmetic, no
    * UDF, so Catalyst folds constants and the whole expression stays in
    * one codegen stage. Rounded: libm exp() may differ by 1 ulp across
    * engines. */
  val fnMathLogistic: Q = (s, dir) => {
    import s.implicits._
    val o = Tables.load(s, dir, "orders")
    val tier = when($"o_totalprice" > 300000.0, 1.0)
      .when($"o_totalprice" > 150000.0, 2.0)
      .when($"o_totalprice" > 50000.0, 3.0).otherwise(4.0)
    val priorAuth = when($"o_orderpriority" === "1-URGENT", 1.0).otherwise(0.0)
    val z = lit(-1.0) + lit(0.8) * ($"o_totalprice" / 100000.0) +
      lit(-0.35) * tier + lit(1.2) * priorAuth
    o.select($"o_orderkey", $"o_totalprice", tier.as("tier"),
        priorAuth.as("prior_auth"),
        round(lit(1.0) / (lit(1.0) + exp(-z)), 4).as("denial_risk"))
      .orderBy($"o_orderkey")
  }

  /** Array ops over the embedding vectors (testdata `embeddings`; med
    * lists README.md:7): size, index, higher-order aggregate/transform.
    * Elements are cast to double before summing; the fold runs in array
    * order so both engines agree to ~1e-13 and a 4-digit round pins it. */
  val fnArray: Q = (s, dir) => {
    import s.implicits._
    Tables.load(s, dir, "embeddings")
      .select($"vec_id",
        size($"embedding").as("n_dims"),
        element_at($"embedding", 1).as("first_elem"),
        round(aggregate(transform($"embedding", x => x.cast("double")),
          lit(0.0), (acc, x) => acc + x), 4).as("sum_elems"),
        array_max($"embedding").as("max_elem"))
      .orderBy($"vec_id")
  }

  /** Map construction + lookup over event props ([NS]). DuckDB's MAP
    * literal syntax is not in the ANSI intersection, but the *values* a
    * map lookup produces are — the oracle recomputes them relationally,
    * so the check is on lookup results, not map internals. Output columns
    * are all scalar: the driver's pandas-based compare cannot sort array
    * columns (round-1 crash), so map_keys is emitted joined to a string. */
  val fnMap: Q = (s, dir) => {
    import s.implicits._
    Tables.load(s, dir, "events")
      .select($"event_id",
        map(lit("k"), get_json_object($"props", "$.k").cast("long"),
            lit("user"), $"user_id").as("props_map"))
      .select($"event_id",
        element_at($"props_map", "k").as("k_val"),
        element_at($"props_map", "user").as("user_val"),
        array_join(map_keys($"props_map"), ",").as("keys"))
      .orderBy($"event_id")
  }

  /** JSON field extraction from the props string (README.md:10,76;
    * testdata events.props = {"k": int}). */
  val fnJson: Q = (s, dir) => {
    import s.implicits._
    Tables.load(s, dir, "events")
      .select($"event_id", $"event_type",
        get_json_object($"props", "$.k").cast("int").as("k"))
      .orderBy($"event_id")
  }

  /** Nested MedicationRequest-shaped struct with an array of dosage
    * structs, serialized with pinned field order (README.md:10,28-29,71). */
  val fnStructFhir: Q = (s, dir) => {
    import s.implicits._
    Tables.load(s, dir, "orders")
      .filter($"o_orderkey" <= 2000)
      .select($"o_orderkey",
        FhirJson.medicationRequest(concat(lit("rx-"), $"o_orderkey"),
          concat(lit("Patient/"), $"o_custkey"),
          "authoredOn" -> date_format($"o_orderdate", "yyyy-MM-dd"),
          "dosageInstruction" ->
            array(struct(concat(lit("priority "), $"o_orderpriority").as("text")))
        ).as("resource"))
      .orderBy($"o_orderkey")
  }

  val queries: Map[String, Q] = Map(
    "fn_string_norm" -> fnStringNorm,
    "fn_date" -> fnDate,
    "fn_math_logistic" -> fnMathLogistic,
    "fn_array" -> fnArray,
    "fn_map" -> fnMap,
    "fn_json" -> fnJson,
    "fn_struct_fhir" -> fnStructFhir)

  val oracle: Map[String, String] = Map(
    "fn_string_norm" -> """
      SELECT p_partkey,
             upper(p_name) AS name_upper,
             trim(lower(p_brand)) AS brand_lower,
             substring(p_type, 1, 4) AS type_prefix,
             concat(p_brand, ':', p_type) AS brand_type,
             regexp_extract(p_name, '^(\w+)', 1) AS first_word,
             regexp_replace(p_name, ' ', '_', 'g') AS name_snake
      FROM part ORDER BY p_partkey""",
    "fn_date" -> """
      SELECT o_orderkey,
             CAST(year(o_orderdate) AS INT) AS order_year,
             CAST(month(o_orderdate) AS INT) AS order_month,
             CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
             CAST(date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS INT) AS days_since_95,
             strftime(o_orderdate + INTERVAL 3 MONTH, '%Y-%m-%d') AS plus_3m
      FROM orders ORDER BY o_orderkey""",
    "fn_math_logistic" -> """
      SELECT o_orderkey, o_totalprice,
             CASE WHEN o_totalprice > 300000.0 THEN 1.0
                  WHEN o_totalprice > 150000.0 THEN 2.0
                  WHEN o_totalprice > 50000.0 THEN 3.0 ELSE 4.0 END AS tier,
             CASE WHEN o_orderpriority = '1-URGENT' THEN 1.0 ELSE 0.0 END AS prior_auth,
             ROUND(1.0 / (1.0 + exp(-(-1.0 + 0.8 * (o_totalprice / 100000.0)
               + (-0.35) * (CASE WHEN o_totalprice > 300000.0 THEN 1.0
                    WHEN o_totalprice > 150000.0 THEN 2.0
                    WHEN o_totalprice > 50000.0 THEN 3.0 ELSE 4.0 END)
               + 1.2 * (CASE WHEN o_orderpriority = '1-URGENT' THEN 1.0 ELSE 0.0 END)))), 4)
               AS denial_risk
      FROM orders ORDER BY o_orderkey""",
    "fn_array" -> """
      SELECT e.vec_id, CAST(len(e.embedding) AS INT) AS n_dims,
             e.embedding[1] AS first_elem, a.sum_elems, a.max_elem
      FROM embeddings e
      JOIN (SELECT vec_id, ROUND(SUM(CAST(u AS DOUBLE)), 4) AS sum_elems,
                   MAX(u) AS max_elem
            FROM (SELECT vec_id, unnest(embedding) AS u FROM embeddings)
            GROUP BY vec_id) a ON e.vec_id = a.vec_id
      ORDER BY e.vec_id""",
    "fn_json" -> """
      SELECT event_id, event_type, CAST(props->>'k' AS INT) AS k
      FROM events ORDER BY event_id""",
    "fn_map" -> """
      SELECT event_id,
             CAST(props->>'k' AS BIGINT) AS k_val,
             user_id AS user_val,
             'k,user' AS keys
      FROM events ORDER BY event_id""",
    "fn_struct_fhir" -> """
      SELECT o_orderkey,
             concat('{"resourceType":"MedicationRequest","id":"rx-', o_orderkey,
                    '","status":"draft","subject":{"reference":"Patient/', o_custkey,
                    '"},"authoredOn":"', strftime(o_orderdate, '%Y-%m-%d'),
                    '","dosageInstruction":[{"text":"priority ', o_orderpriority,
                    '"}]}') AS resource
      FROM orders WHERE o_orderkey <= 2000 ORDER BY o_orderkey""")
}
