package graft

import graft.functions.HashExprs
import org.apache.spark.sql.functions._

import scala.util.hashing.MurmurHash3

/** The r9 UDF→expression swap for the sketch family: lsh_bucket8 and
  * simhash64 must be bit-identical to the former UDF formulas and must
  * run as codegen'd expressions (no ScalaUDF boundary in the plan).
  */
class HashExprsSpec extends SparkSpec {
  import spark.implicits._

  test("lsh_bucket8 matches the reference hyperplane formula bit for bit") {
    HashExprs.register(spark)
    val vecs = Tables.load(spark, sf(), "embeddings")
      .select($"vec_id", transform($"embedding", x => x.cast("double")).as("v"))
    val got = vecs.select($"vec_id", expr("lsh_bucket8(v)").as("b"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // independent JVM-side reference: the exact former-UDF loop
    val planes = Array.tabulate(8, 64)((p, d) => math.sin((p * 64 + d + 1).toDouble))
    val want = vecs.collect().map { r =>
      val emb = r.getSeq[Double](1)
      var bucket = 0
      for (p <- 0 until 8) {
        var acc = 0.0
        var i = 0
        while (i < emb.length && i < 64) { acc += emb(i) * planes(p)(i); i += 1 }
        if (acc > 0) bucket |= (1 << p)
      }
      r.getLong(0) -> bucket
    }.toMap
    assert(got.nonEmpty && got == want)
    assert(got.values.toSet.size > 1, "buckets must actually spread")
  }

  test("simhash64 matches the reference murmur3 sign-vote formula bit for bit") {
    HashExprs.register(spark)
    val docs = Tables.load(spark, sf(), "documents")
      .select($"doc_id", split($"text", " ").as("words"))
    val got = docs.select($"doc_id", expr("simhash64(words)").as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = docs.collect().map { r =>
      val words = r.getSeq[String](1)
      val sums = new Array[Int](64)
      words.foreach { w =>
        val h = (MurmurHash3.stringHash(w).toLong << 32) |
          (MurmurHash3.stringHash(w.reverse).toLong & 0xffffffffL)
        for (i <- 0 until 64)
          if (((h >>> i) & 1L) == 1L) sums(i) += 1 else sums(i) -= 1
      }
      var out = 0L
      for (i <- 0 until 64) if (sums(i) > 0) out |= (1L << i)
      r.getLong(0) -> out
    }.toMap
    assert(got.nonEmpty && got == want)
  }

  test("both run as native expressions inside whole-stage codegen, not as UDFs") {
    HashExprs.register(spark)
    // stage plain array columns through parquet: a higher-order function
    // (transform/split's siblings) in the SAME projection would keep the
    // whole Project interpreted regardless of the hash expression — the
    // codegen claim is about the expressions themselves
    val staged = Qx.tmpOut("hashexpr", sf())
    Tables.load(spark, sf(), "embeddings")
      .select($"vec_id", transform($"embedding", x => x.cast("double")).as("v"))
      .write.mode("overwrite").parquet(s"$staged/v")
    Tables.load(spark, sf(), "documents")
      .select($"doc_id", split($"text", " ").as("words"))
      .write.mode("overwrite").parquet(s"$staged/w")
    val lsh = spark.read.parquet(s"$staged/v").select(expr("lsh_bucket8(v)"))
    val sh = spark.read.parquet(s"$staged/w").select(expr("simhash64(words)"))
    Seq(lsh, sh).foreach { df =>
      val plan = df.queryExecution.executedPlan
      assert(!plan.toString.contains("ScalaUDF"), plan.toString)
      // the projection carrying the expression is inside a codegen stage
      val codegenSpans = plan.collect {
        case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w.toString
      }
      assert(codegenSpans.exists(s =>
        s.contains("lsh_bucket8") || s.contains("simhash64")),
        s"expression not inside WholeStageCodegen:\n$plan")
    }
    // the generated stage actually compiles (no silent interpreted
    // fallback): force codegen-only evaluation for the collect
    val saved = spark.conf.get("spark.sql.codegen.factoryMode", "FALLBACK")
    try {
      spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
      assert(lsh.collect().nonEmpty && sh.collect().nonEmpty)
    } finally spark.conf.set("spark.sql.codegen.factoryMode", saved)
  }
}
