package graft.functions

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** UDF / UDAF / UDTF surface (SURVEY §2.10).
  *
  * Reference basis: HL7 segment handling in etl/loaders.py
  * (/root/reference/README.md:76), price aggregation (README.md:8-9),
  * one-row→many explosion of message segments (README.md:7,76).
  *
  * Policy note: every UDF here could be (and elsewhere is) a built-in
  * Column expression — built-ins are codegen'd and pushdown-transparent
  * while a Scala UDF is an opaque black box to Catalyst. These exist to
  * cover the extension-point surface itself, on deliberately small
  * inputs.
  */
object Udfs {

  type Q = (SparkSession, String) => DataFrame

  /** Weighted-average price aggregator (README.md:8-9). The buffer
    * carries exact scaled-integer sums (price is 2-decimal exact, qty is
    * integral) so merge order never changes the result — the same trick
    * as Qx.dsum, but through the typed Aggregator API. */
  object WeightedAvgPrice extends Aggregator[(Double, Double), (Long, Long), Double] {
    def zero: (Long, Long) = (0L, 0L)
    def reduce(b: (Long, Long), a: (Double, Double)): (Long, Long) =
      (b._1 + math.round(a._1 * a._2 * 100.0), b._2 + math.round(a._2))
    def merge(x: (Long, Long), y: (Long, Long)): (Long, Long) =
      (x._1 + y._1, x._2 + y._2)
    def finish(b: (Long, Long)): Double =
      if (b._2 == 0L) 0.0 else b._1.toDouble / 100.0 / b._2.toDouble
    def bufferEncoder: Encoder[(Long, Long)] = Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Scalar Scala UDF — HL7 segment field extractor (README.md:76):
    * given 'PID|f1|f2|…', return the i-th field. */
  val udfScalar: Q = (s, dir) => {
    import s.implicits._
    val extractField = udf((line: String, i: Int) => {
      val parts = line.split('|')
      if (i >= 0 && i < parts.length) parts(i) else null
    })
    val seg = Tables.load(s, dir, "customer").select(
      concat_ws("|", lit("PID"), $"c_custkey", $"c_name", $"c_mktsegment").as("line"))
    seg.select(
        extractField($"line", lit(1)).cast("long").as("custkey"),
        extractField($"line", lit(2)).as("name"),
        extractField($"line", lit(3)).as("segment"))
      .orderBy($"custkey")
  }

  /** Typed Aggregator registered via udaf(): exact weighted-average
    * price per return flag (README.md:8-9). */
  val udafTyped: Q = (s, dir) => {
    import s.implicits._
    val wavg = udaf(WeightedAvgPrice)
    Tables.load(s, dir, "lineitem")
      .groupBy($"l_returnflag")
      .agg(wavg($"l_extendedprice", $"l_quantity").as("wavg_price"))
      .orderBy($"l_returnflag")
  }

  /** Generator — one row to many (README.md:7,76): tokenize documents
    * with position via posexplode (built-in Generator; a custom
    * Generator expression is only needed for shapes explode can't
    * cover). 0-based pos aligns with DuckDB's generate_subscripts-1. */
  val udtfGenerator: Q = (s, dir) => {
    import s.implicits._
    Tables.load(s, dir, "documents")
      .filter($"doc_id" < 50)
      .select($"doc_id", posexplode(split($"text", " ")).as(Seq("pos", "token")))
      .select($"doc_id", $"pos".cast("long").as("pos"), $"token")
      .orderBy($"doc_id", $"pos")
  }

  /** Null-preserving generator — explode_outer keeps rows whose array
    * is empty (doc with no long token → one (doc_id, NULL) row), the
    * LEFT-JOIN-LATERAL semantics an ETL needs when the parent row must
    * survive an empty child list (patient with no meds still exports). */
  val udtfGeneratorOuter: Q = (s, dir) => {
    import s.implicits._
    Tables.load(s, dir, "documents")
      .select($"doc_id",
        explode_outer(filter(split($"text", " "), x => length(x) > 6))
          .as("token"))
      .orderBy($"doc_id", $"token".asc_nulls_first)
  }

  val queries: Map[String, Q] = Map(
    "udf_scalar" -> udfScalar,
    "udaf_typed" -> udafTyped,
    "udtf_generator" -> udtfGenerator,
    "udtf_generator_outer" -> udtfGeneratorOuter)

  val oracle: Map[String, String] = Map(
    "udf_scalar" -> """
      SELECT CAST(p[2] AS BIGINT) AS custkey, p[3] AS name, p[4] AS segment
      FROM (SELECT string_split(concat('PID', '|', c_custkey, '|', c_name, '|',
                     c_mktsegment), '|') AS p
            FROM customer)
      ORDER BY custkey""",
    "udaf_typed" -> """
      SELECT l_returnflag,
             CAST(SUM(CAST(round(l_extendedprice * l_quantity * 100) AS BIGINT)) AS DOUBLE)
               / 100.0 / CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) AS wavg_price
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "udtf_generator" -> """
      SELECT doc_id, generate_subscripts(toks, 1) - 1 AS pos, unnest(toks) AS token
      FROM (SELECT doc_id, string_split(text, ' ') AS toks
            FROM documents WHERE doc_id < 50)
      ORDER BY doc_id, pos""",
    "udtf_generator_outer" -> """
      SELECT d.doc_id, t.token
      FROM documents d
      LEFT JOIN (SELECT doc_id,
                        unnest(list_filter(string_split(text, ' '),
                               x -> len(x) > 6)) AS token
                 FROM documents) t USING (doc_id)
      ORDER BY doc_id, token NULLS FIRST""")
}
