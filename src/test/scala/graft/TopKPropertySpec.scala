package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.plans.TopK

/** Property-based parity: for arbitrary data, k, and partial-mode group
  * caps, the native TopKPerGroup (codegen final + interpreted partial)
  * must agree exactly with the window row_number plan under the same
  * total order — including empty inputs, single-row groups, heavy ties
  * on the ranking value, and caps small enough to force pass-through on
  * every partition. */
class TopKPropertySpec extends SparkSpec {

  test("property: native top-k equals window ranking for random data/k/cap") {
    import spark.implicits._
    val rowsGen: Gen[List[(Int, Int)]] = for {
      n <- Gen.choose(0, 120)
      rows <- Gen.listOfN(n, for {
        g <- Gen.choose(0, 8)   // few groups → big groups, k bites
        v <- Gen.choose(-9, 9)  // narrow range → frequent rank ties
      } yield (g, v))
    } yield rows
    val prop = Prop.forAll(rowsGen, Gen.choose(1, 6), Gen.oneOf(1, 2, 1000)) {
      (rows, k, cap) =>
        // id makes (v desc, id asc) a total order within each group.
        val df = rows.zipWithIndex
          .map { case ((g, v), id) => (g, v, id.toLong) }
          .toDF("g", "v", "id").repartition(4)
        val prev = spark.conf.getOption(TopK.MaxPartialGroupsKey)
        spark.conf.set(TopK.MaxPartialGroupsKey, cap.toString)
        try {
          val native = TopK.perGroup(df, k, Seq("g"), Seq(("v", true), ("id", false)))
            .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSet
          val w = Window.partitionBy($"g").orderBy($"v".desc, $"id")
          val expected = df.withColumn("rn", row_number().over(w))
            .filter($"rn" <= k).drop("rn")
            .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSet
          native == expected
        } finally {
          prev match {
            case Some(v) => spark.conf.set(TopK.MaxPartialGroupsKey, v)
            case None => spark.conf.unset(TopK.MaxPartialGroupsKey)
          }
        }
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(25), prop)
    assert(res.passed, s"property falsified: $res")
  }

  test("property: interleave_bits is a monotone bijection with the z-order locality law") {
    import graft.functions.BitExprs.{mortonRef, spread}
    val u16 = Gen.choose(0L, 0xFFFFL)
    val prop = Prop.forAll(u16, u16, u16, u16) { (x1, y1, x2, y2) =>
      val z1 = spread(x1) | (spread(y1) << 1)
      val z2 = spread(x2) | (spread(y2) << 1)
      val twiddleMatchesArithmetic =
        z1 == mortonRef(x1, y1) && z2 == mortonRef(x2, y2)
      val injective = (z1 == z2) == (x1 == x2 && y1 == y2)
      // per-dimension monotonicity: fixing one coordinate, the z-order
      // is ordered by the other — the property that makes range
      // predicates on either dimension map to z-ranges.
      val monotone =
        (y1 != y2 || (x1 < x2) == (z1 < z2) || x1 == x2) &&
        (x1 != x2 || (y1 < y2) == (z1 < z2) || y1 == y2)
      // locality law behind the zcell bucketing: equal 2k-bit z-prefixes
      // ⟺ both coordinates agree on their high (16−k) bits, for the
      // k = 6 cell size layout_zorder uses.
      val cellLaw =
        ((z1 >> 12) == (z2 >> 12)) == ((x1 >> 6) == (x2 >> 6) && (y1 >> 6) == (y2 >> 6))
      twiddleMatchesArithmetic && injective && monotone && cellLaw
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, s"property falsified: $res")
  }
}
