package graft

import org.apache.spark.sql.functions._

import graft.operators.SimOps

/** Round-7 additions and hardening. */
class Round7OpsSpec extends SparkSpec {

  test("embedding quantization pins a constant dimension to q=0, err=0 (no NaN)") {
    import spark.implicits._
    // dim 1 varies; dim 2 is constant across the corpus (mx == mn).
    val e = Seq(
      (1L, 1, 0.0), (1L, 2, 7.5),
      (2L, 1, 1.0), (2L, 2, 7.5),
      (3L, 1, 2.0), (3L, 2, 7.5)).toDF("vec_id", "dim", "x")
    val out = SimOps.quantizeExploded(e).collect()
    assert(out.length == 3)
    out.foreach { r =>
      assert(!r.anyNull, s"NaN/null leaked through the degenerate guard: $r")
      assert(r.getLong(1) == 2) // n_dims
      // + 5e-7: err itself is rounded to 6 decimals before the max
      assert(r.getDouble(5) <= 0.5 * (2.0 - 0.0) / 255.0 + 5e-7,
        s"reconstruction error bound violated: $r")
    }
    // the constant dimension contributes q = 0 to every checksum, so
    // the checksums are exactly the varying dimension's codes.
    val byVec = out.map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(byVec == Map(1L -> -128L, 2L -> 0L, 3L -> 127L), s"$byVec")
  }
}
