package graft

import graft.domain.MedRules
import org.apache.spark.sql.functions._

/** Domain-layer tests on the healthcare micro-fixtures (FIXTURES.md §2)
  * — the reference's EP1 flow end to end.
  */
class MedRulesSpec extends SparkSpec {
  import spark.implicits._

  private lazy val meds = Seq(
    (1L, 1L, "statin_brand_a", "Lipitorin"),
    (2L, 1L, "statin_brand_b", "Statorin"),  // overlap with med 1 (same class)
    (3L, 1L, "ppi_brand", "Omepra"),
    (4L, 2L, "statin_brand_a", "Lipitorin"),
    (5L, 3L, "ppi_brand", "Omepra")
  ).toDF("med_id", "patient_id", "rxnorm_cui", "drug_name")

  private lazy val drugClasses = Seq(
    ("statin_brand_a", "statin"), ("statin_brand_b", "statin"),
    ("ppi_brand", "ppi"),
    ("statin_gen", "statin"), ("ppi_gen", "ppi")
  ).toDF("rxnorm_cui", "drug_class")

  private lazy val orangeBook = Seq(
    ("statin_brand_a", "statin_gen"), ("statin_brand_b", "statin_gen"),
    ("ppi_brand", "ppi_gen")
  ).toDF("brand_cui", "generic_cui")

  private lazy val prices = Seq(
    ("statin_brand_a", 120.0), ("statin_brand_b", 95.0),
    ("statin_gen", 12.0), ("ppi_brand", 60.0) // ppi_gen price missing
  ).toDF("rxnorm_cui", "price")

  private lazy val allergies = Seq((3L, "ppi_gen")).toDF("patient_id", "substance")

  private lazy val coverage = Seq(
    (1L, "acme"), (2L, "acme"), (3L, "zenith")
  ).toDF("patient_id", "payer")

  private lazy val formulary = Seq(
    ("acme", "statin_gen", 1, false), ("acme", "statin_brand_a", 3, true),
    ("zenith", "ppi_gen", 2, false)
  ).toDF("payer", "rxnorm_cui", "tier", "prior_auth")

  test("therapeuticOverlap flags only the same-class pair of patient 1") {
    val pairs = MedRules.therapeuticOverlap(meds, drugClasses)
      .select("patient_id", "med_1", "med_2").as[(Long, Long, Long)].collect()
    assert(pairs.toSet == Set((1L, 1L, 2L)))
  }

  test("genericSubstitutions: allergy conflict excluded, missing price survives as null") {
    val subs = MedRules.genericSubstitutions(meds, orangeBook, prices, allergies)
    val byMed = subs.collect().map(r => r.getAs[Long]("med_id") -> r).toMap
    assert(!byMed.contains(5L), "patient 3 is allergic to ppi_gen")
    assert(byMed(1L).getAs[Double]("saving") == 108.0)
    assert(byMed(3L).isNullAt(byMed(3L).fieldIndex("generic_price")),
      "ppi_gen has no price row — left join must keep it")
  }

  test("formularyStatus marks off-formulary meds") {
    val fs = MedRules.formularyStatus(meds, coverage, formulary)
    val off = fs.filter($"off_formulary").select("med_id").as[Long].collect().toSet
    // acme lists statin_gen + statin_brand_a; zenith lists ppi_gen only:
    // meds 2 (statin_brand_b), 3 (ppi_brand@acme), 5 (ppi_brand@zenith)
    // are off-formulary; meds 1 and 4 (statin_brand_a@acme) are on it.
    assert(off == Set(2L, 3L, 5L), s"got $off")
  }

  test("denialRisk is monotone in tier and prior auth, bounded (0,1)") {
    val df = Seq((10.0, 1, false), (10.0, 4, false), (10.0, 1, true))
      .toDF("price", "tier", "pa")
    val scores = df.select(MedRules.denialRisk($"price", $"tier", $"pa").as("s"))
      .as[Double].collect()
    assert(scores.forall(s => s > 0 && s < 1))
    assert(scores(1) > scores(0) && scores(2) > scores(0))
  }

  test("recommend produces one valid draft FHIR resource per substitutable med") {
    val recs = MedRules.recommend(meds, orangeBook, prices,
      allergies, coverage, formulary)
    val rows = recs.collect()
    // med 5 excluded (allergy); meds 1-4 each get exactly one best generic
    assert(rows.map(_.getAs[Long]("med_id")).sorted.toSeq == Seq(1L, 2L, 3L, 4L))
    rows.foreach { r =>
      val json = r.getAs[String]("resource")
      assert(json.startsWith("""{"resourceType":"MedicationRequest","id":"rx-"""))
      assert(json.contains(""""status":"draft""""))
      assert(json.contains(""""medicationReference":{"reference":"RxNorm/"""))
    }
    val m1 = rows.find(_.getAs[Long]("med_id") == 1L).get
    assert(m1.getAs[String]("generic_cui") == "statin_gen")
    assert(m1.getAs[Double]("saving") == 108.0)
  }
}
