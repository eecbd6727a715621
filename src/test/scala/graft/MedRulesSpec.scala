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

  // diversifyTherapy fixture: class A holds two therapeutic types, class
  // B offers two same-priced T1 alternatives (the tiebreak pair), class
  // C shares no type with A (never a candidate).
  private lazy val divCatalog = Seq(
    ("a1", "A", "T1", 10.0), ("a2", "A", "T1", 20.0), ("a3", "A", "T2", 30.0),
    ("b1", "B", "T1", 5.0), ("b2", "B", "T1", 5.0),
    ("c1", "C", "T3", 1.0)
  ).toDF("rxnorm_cui", "drug_class", "drug_type", "price")

  test("diversifyTherapy: threshold boundary — 3 meds concentrate, 2 do not") {
    val meds = Seq(
      (10L, 1L, "a1", "A1"), (11L, 1L, "a2", "A2"), (12L, 1L, "a3", "A3"),
      (20L, 2L, "a1", "A1"), (21L, 2L, "a2", "A2")
    ).toDF("med_id", "patient_id", "rxnorm_cui", "drug_name")
    val out = MedRules.diversifyTherapy(meds, divCatalog).collect()
    assert(out.map(_.getAs[Long]("patient_id")).toSeq == Seq(1L),
      "only patient 1 (3 distinct class-A meds) crosses threshold=3")
    assert(out.head.getAs[Long]("n_meds") == 3L)
  }

  test("diversifyTherapy: equal-price candidates break ties on cui") {
    val meds = Seq(
      (10L, 1L, "a1", "A1"), (11L, 1L, "a2", "A2"), (12L, 1L, "a3", "A3")
    ).toDF("med_id", "patient_id", "rxnorm_cui", "drug_name")
    val out = MedRules.diversifyTherapy(meds, divCatalog).collect()
    assert(out.length == 1)
    val r = out.head
    // b1 and b2 both cost 5.0 and share type T1 with the concentrated
    // meds; (price, cui) must pick b1 deterministically.
    assert(r.getAs[String]("alt_cui") == "b1", s"got ${r.getAs[String]("alt_cui")}")
    assert(r.getAs[String]("alt_class") == "B")
    assert(r.getAs[Double]("alt_price") == 5.0)
  }

  test("diversifyTherapy: patient already taking every same-type alternative → no row") {
    val meds = Seq(
      (30L, 3L, "a1", "A1"), (31L, 3L, "a2", "A2"), (32L, 3L, "a3", "A3"),
      (33L, 3L, "b1", "B1"), (34L, 3L, "b2", "B2")
    ).toDF("med_id", "patient_id", "rxnorm_cui", "drug_name")
    // class A is concentrated (3 meds) but both T1 alternatives outside
    // the class are already in the regimen; class B sits below threshold.
    assert(MedRules.diversifyTherapy(meds, divCatalog).count() == 0L)
  }

  test("diversifyTherapy: single-class catalog yields no cross-class candidate") {
    val oneClass = divCatalog.filter($"drug_class" === "A")
    val meds = Seq(
      (10L, 1L, "a1", "A1"), (11L, 1L, "a2", "A2"), (12L, 1L, "a3", "A3")
    ).toDF("med_id", "patient_id", "rxnorm_cui", "drug_name")
    assert(MedRules.diversifyTherapy(meds, oneClass).count() == 0L)
  }

  test("domain_denial_train: the fit learns the real signal, deterministically") {
    val rows = graft.domain.DomainQueries
      .queries("domain_denial_train")(spark, sf()).collect()
    assert(rows.length == 5)
    val b1 = rows.head.getAs[Double]("b1")
    assert(b1 > 0.1,
      s"total-units coefficient must capture the units↔lines signal, got $b1")
    assert(rows.map(_.getAs[Double]("b1")).distinct.length == 1,
      "one global model — every segment row carries the same coefficients")
    // the linear-probability fit tracks the per-segment denial rate
    rows.foreach { r =>
      val n = r.getAs[Long]("n").toDouble
      val pred = r.getAs[Double]("pred_sum") / n
      val actual = r.getAs[Double]("denied") / n
      assert(math.abs(pred - actual) < 0.05,
        s"${r.getAs[String]("o_orderpriority")}: pred=$pred actual=$actual")
    }
    // bit-deterministic across runs (the oracle hash-compare relies on it)
    val again = graft.domain.DomainQueries
      .queries("domain_denial_train")(spark, sf()).collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }
}
