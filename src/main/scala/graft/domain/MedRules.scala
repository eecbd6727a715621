package graft.domain

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** The reference's domain layer re-expressed as composable DataFrame
  * functions — one per module of pchj/sigma-rx7
  * (/root/reference/README.md:15-39):
  *
  *  - rules/overlap.py  → [[therapeuticOverlap]]   (README.md:3,9,23)
  *  - rules/generics.py → [[genericSubstitutions]] (README.md:8-9,24)
  *  - rules/payer.py    → [[formularyStatus]]      (README.md:9,25)
  *  - ml/denial.py      → [[denialRisk]]           (README.md:9,27,77)
  *  - fhir/export.py    → [[fhirMedicationRequest]] (README.md:10,28-29,71)
  *  - EP1 end to end    → [[recommend]]            (README.md:41-71)
  *
  * Inputs use the reference's schema (FIXTURES.md §2): meds(med_id,
  * patient_id, rxnorm_cui, drug_name[, start_date, end_date]),
  * drug_classes(rxnorm_cui, class), orange_book(brand_cui,
  * generic_cui), prices(rxnorm_cui, price[, as_of]), formulary(payer,
  * rxnorm_cui, tier, prior_auth), coverage(patient_id, payer
  * [, effective, expires]), allergies(patient_id, substance). The
  * bracketed temporal columns are honored when present (price history
  * collapses to the latest as-of row; med/coverage activity windows are
  * enforced) and ignored when a caller supplies the column-free shape.
  *
  * Everything is a plain Column/DataFrame pipeline: at 100 TB the drug
  * knowledge base (classes, orange book, prices, formulary — bounded
  * catalogs) broadcasts, and only the patient-scaled tables (meds,
  * coverage, allergies) shuffle, always on patient/med keys.
  */
object MedRules {

  /** Latest price per drug: if the table carries an as-of history
    * (FIXTURES.md §2: "two as-of rows per drug"), keep the most recent
    * row per rxnorm_cui (price as the deterministic tiebreak on equal
    * as_of); otherwise the table is already one row per drug. */
  private def latestPrices(prices: DataFrame): DataFrame =
    if (prices.columns.contains("as_of")) {
      val w = Window.partitionBy(col("rxnorm_cui"))
        .orderBy(col("as_of").desc, col("price").desc)
      prices.withColumn("price_rn", row_number().over(w))
        .filter(col("price_rn") === 1)
        .select(col("rxnorm_cui"), col("price"))
    } else prices.select(col("rxnorm_cui"), col("price"))

  /** Coverage rows active at `asOf` when the table carries
    * effective/expires windows; all rows otherwise. */
  private def activeCoverage(coverage: DataFrame, asOf: Column): DataFrame =
    if (coverage.columns.contains("effective") && coverage.columns.contains("expires"))
      coverage.filter(col("effective") <= asOf &&
        (col("expires").isNull || col("expires") >= asOf))
    else coverage

  /** Therapeutic duplication: two meds for the same patient in the same
    * therapeutic class whose activity windows overlap (the flagship
    * self-join, README.md:3,9,23) — a null end_date means still active.
    * Without date columns, every same-class pair is flagged. Returns
    * one row per offending pair. */
  def therapeuticOverlap(meds: DataFrame, drugClasses: DataFrame): DataFrame = {
    // FIXTURES.md §2 declares the column as `class`; accept that or the
    // keyword-friendly `drug_class` spelling.
    val dc = if (drugClasses.columns.contains("class"))
      drugClasses.withColumnRenamed("class", "drug_class") else drugClasses
    val dated = meds.columns.contains("start_date") && meds.columns.contains("end_date")
    val classed = meds.join(broadcast(dc), Seq("rxnorm_cui"))
    val aCols = Seq(col("patient_id"), col("med_id").as("med_1"),
      col("drug_name").as("drug_1"), col("drug_class")) ++
      (if (dated) Seq(col("start_date").as("s1"), col("end_date").as("e1")) else Nil)
    val bCols = Seq(col("patient_id").as("p2"), col("med_id").as("med_2"),
      col("drug_name").as("drug_2"), col("drug_class").as("dc2")) ++
      (if (dated) Seq(col("start_date").as("s2"), col("end_date").as("e2")) else Nil)
    val a = classed.select(aCols: _*)
    val b = classed.select(bCols: _*)
    val pairCond = col("patient_id") === col("p2") &&
      col("drug_class") === col("dc2") && col("med_1") < col("med_2")
    val cond = if (dated)
      pairCond && col("s1") <= coalesce(col("e2"), lit("9999-12-31").cast("date")) &&
        col("s2") <= coalesce(col("e1"), lit("9999-12-31").cast("date"))
    else pairCond
    a.join(b, cond)
      .select(col("patient_id"), col("drug_class"), col("med_1"), col("drug_1"),
        col("med_2"), col("drug_2"))
  }

  /** Generic substitution candidates: brand meds with an Orange Book
    * generic link, enriched with the latest brand/generic prices and
    * the saving (README.md:8-9,24). Left join keeps brands with no
    * price row; allergy conflicts are anti-joined away (README.md:7). */
  def genericSubstitutions(meds: DataFrame, orangeBook: DataFrame,
      prices: DataFrame, allergies: DataFrame): DataFrame = {
    val latest = latestPrices(prices)
    val brandPrice = latest.select(col("rxnorm_cui").as("brand_cui"),
      col("price").as("brand_price"))
    val genPrice = latest.select(col("rxnorm_cui").as("generic_cui"),
      col("price").as("generic_price"))
    meds.join(broadcast(orangeBook), meds("rxnorm_cui") === orangeBook("brand_cui"))
      .join(broadcast(brandPrice), Seq("brand_cui"), "left")
      .join(broadcast(genPrice), Seq("generic_cui"), "left")
      .join(allergies,
        meds("patient_id") === allergies("patient_id") &&
          orangeBook("generic_cui") === allergies("substance"), "left_anti")
      .select(meds("patient_id"), col("med_id"), col("drug_name"),
        col("brand_cui"), col("generic_cui"),
        col("brand_price"), col("generic_price"),
        (coalesce(col("brand_price"), lit(0.0)) -
          coalesce(col("generic_price"), lit(0.0))).as("saving"))
  }

  /** Condition-gated therapy filter (README.md:3,7 — "diversifies
    * therapy based on the patient's clinical history"): a med is
    * blocked when its drug is contraindicated for a condition the
    * patient carries. Inputs: conditions(patient_id, condition_code),
    * contraindications(rxnorm_cui, condition_code). Returns the meds
    * that SURVIVE the gate. Shape: the contraindication catalog is a
    * bounded drug-knowledge table (broadcast); the patient-condition
    * check is a left_semi on (patient, condition) and the gate itself a
    * left_anti on med_id — both patient-key shuffles, nothing
    * collected. */
  def conditionGated(meds: DataFrame, conditions: DataFrame,
      contraindications: DataFrame): DataFrame = {
    val blocked = meds.join(broadcast(contraindications), Seq("rxnorm_cui"))
      .join(conditions, Seq("patient_id", "condition_code"), "left_semi")
      .select(col("med_id"))
    meds.join(blocked, Seq("med_id"), "left_anti")
      .select(col("med_id"), col("patient_id"), col("rxnorm_cui"), col("drug_name"))
  }

  /** THERAPY DIVERSIFICATION (README.md:3 — "diversifies therapy based
    * on the patient's clinical history"): when a patient's regimen
    * concentrates ≥ `threshold` distinct meds in ONE drug class, the
    * rule proposes the cheapest alternative drug that
    *
    *  1. shares a therapeutic TYPE with one of the concentrated meds
    *     (same mechanism family — a real alternative, not a random
    *     drug),
    *  2. belongs to a DIFFERENT class (the diversification), and
    *  3. the patient does not already take (anti join on the
    *     clinical history — the "based on the patient's clinical
    *     history" clause).
    *
    * Inputs: `meds` as elsewhere; `catalog(rxnorm_cui, drug_class,
    * drug_type, price)` — the drug knowledge base. Returns one row per
    * concentrated (patient, class): the concentration count plus the
    * suggested alternative.
    *
    * Shape at 100 TB: the patient-side flows through hash partitions
    * on patient keys (concentration agg, per-type regimen counts,
    * candidate build, history anti join); the catalog is the bounded
    * knowledge base and broadcasts (same contract as
    * [[therapeuticOverlap]]'s class table). The candidate space is
    * pruned EXACTLY before it exists (see the inline proof): each
    * (patient, class, type) row joins only the head of a pre-ranked
    * per-(type, excluded-class) alternative list, never the full
    * catalog slice, so the pre-argmin row count is
    * Σ (n_taken(patient, type) + 1) — regimen-bounded — instead of
    * |groups|·|catalog|/|types|. */
  def diversifyTherapy(meds: DataFrame, catalog: DataFrame,
      threshold: Int = 3): DataFrame = {
    val cat = broadcast(catalog.select(col("rxnorm_cui"), col("drug_class"),
      col("drug_type"), col("price")))
    val classed = meds.join(cat, Seq("rxnorm_cui"))
    val concentrated = classed.groupBy(col("patient_id"), col("drug_class"))
      .agg(countDistinct(col("med_id")).as("n_meds"))
      .filter(col("n_meds") >= threshold)
    // the concentrated meds' therapeutic types — what an alternative
    // must share to count as one. The concentration count rides along
    // (n_meds is functionally determined by the (patient, class) key),
    // so no re-join against `concentrated` is needed after the argmin.
    val ptypes = classed
      .join(concentrated, Seq("patient_id", "drug_class"))
      .select(col("patient_id"), col("drug_class"), col("n_meds"),
        col("drug_type"))
      .distinct()
    // EXACT candidate pruning — the scale move of this rule. The naive
    // type-match join multiplies every (patient, class, type) row by
    // the type's FULL alternative list (~|catalog|/|types|: 150M
    // intermediate rows at sf0.1) and the argmin then discards all but
    // one per group. Instead, candidates are drawn from a pre-ranked
    // list that already encodes BOTH structural filters:
    //
    //   rankedAlts: for each (drug_type t, excluded class c), the
    //   type-t alternatives OUTSIDE class c ranked by the argmin's own
    //   (price, cui) order. Catalog-side work: |catalog|·|classes|
    //   rows through one window — bounded by the knowledge base,
    //   independent of patients.
    //
    // For a (patient p, class c, type t) row, the only candidates the
    // remaining rule (not-already-taken) can strike from that list are
    // p's own type-t drugs — at most n_taken(p, t) of them — so the
    // group's type-t argmin sits within the list's first
    // n_taken(p, t) + 1 entries, and deeper entries can never win
    // (any survivor there is dominated by a survivor in the prefix).
    // The per-row bound joins from the per-(patient, type) regimen
    // counts (one patient-keyed aggregate); the broadcast side is
    // pre-cut to the per-type worst case max(n_taken) + 1. Both cuts
    // are exact — a pathological regimen only widens its own rows'
    // prefix. The pre-argmin row count falls from |ptypes|·|type
    // slice| to Σ (n_taken + 1) ≈ |regimen rows| — the same order as
    // the input itself.
    // one distinct pass serves BOTH the per-(patient, type) regimen
    // counts and the clinical-history anti side below: (patient, cui)
    // is unique within it (the catalog maps a cui to exactly one
    // type), so the counts are exact and the history projection is
    // duplicate-free without a second aggregate. Restricting the
    // history to CATALOGED drugs is safe — every candidate comes from
    // the catalog, so an uncataloged med can never collide with one.
    val pcui = classed.select(col("patient_id"), col("rxnorm_cui"),
      col("drug_type")).distinct()
    val ptc = pcui.groupBy(col("patient_id"), col("drug_type"))
      .agg(count(lit(1)).as("n_taken"))
    val maxTaken = ptc.groupBy(col("drug_type").as("alt_type"))
      .agg(max(col("n_taken")).as("max_taken"))
    val exclClasses = cat.select(col("drug_class").as("excl_class")).distinct()
    val rankedAlts = cat.select(col("rxnorm_cui").as("alt_cui"),
        col("drug_class").as("alt_class"), col("drug_type").as("alt_type"),
        col("price").as("alt_price"))
      .join(exclClasses, col("alt_class") =!= col("excl_class"))
      .withColumn("type_rank", row_number().over(
        Window.partitionBy(col("alt_type"), col("excl_class"))
          .orderBy(col("alt_price").asc, col("alt_cui").asc)))
      .join(maxTaken, Seq("alt_type"))
      .filter(col("type_rank") <= col("max_taken") + lit(1L))
      .select(col("alt_cui"), col("alt_class"), col("alt_type"),
        col("alt_price"), col("excl_class"), col("type_rank"))
    // The clinical-history anti side: the patient's distinct drug set
    // (the pcui projection — already duplicate-free). PATIENT-SCALED,
    // so no broadcast hint: a forced hint would collect the whole
    // per-patient drug history on the driver at any scale. AQE
    // broadcasts it while its runtime size fits the threshold (the
    // bench shape) and keeps the shuffled anti join — both sides
    // already keyed on (patient, drug) — when a 100× history doesn't.
    val hist = pcui.select(col("patient_id"), col("rxnorm_cui").as("alt_cui"))
    val candidates = ptypes
      .join(ptc.select(col("patient_id"), col("drug_type"),
        col("n_taken")), Seq("patient_id", "drug_type"), "left")
      .join(broadcast(rankedAlts), col("drug_type") === col("alt_type") &&
        col("excl_class") === col("drug_class"))
      .filter(col("type_rank") <= coalesce(col("n_taken"), lit(0L)) + lit(1L))
      .join(hist, Seq("patient_id", "alt_cui"), "left_anti")
      .select(col("patient_id"), col("drug_class"), col("n_meds"),
        col("alt_cui"), col("alt_class"), col("alt_price"))
    // the per-(patient, class) argmin runs through the native
    // TopKPerGroup(k=1) operator, NOT min_by(struct, struct) and NOT a
    // window: a struct-buffered min_by falls off HashAggregate onto
    // SortAggregate (struct agg buffers aren't mutable), which SORTS
    // the candidate set on both sides of the exchange. The heap
    // operator is the scale shape: the map side folds each partition
    // to ≤1 row per group in one streaming pass (no sort, same
    // map-side-combine property), and the exchange moves only
    // group-sized partials of the already-pruned candidate set.
    // Tiebreak (price, cui) is total — cui is unique per group.
    val best = graft.plans.TopK.perGroup(candidates, 1,
      Seq("patient_id", "drug_class"),
      Seq(("alt_price", false), ("alt_cui", false)))
    best.select(col("patient_id"), col("drug_class"), col("n_meds"),
      col("alt_cui"), col("alt_class"), col("alt_price"))
  }

  /** Formulary placement for each med under the patient's payer(s)
    * active at `asOf` (README.md:9,25): tier + prior-auth flag, null
    * tier = off-formulary. */
  def formularyStatus(meds: DataFrame, coverage: DataFrame,
      formulary: DataFrame, asOf: Column = current_date()): DataFrame =
    // No explicit broadcast hint on the formulary: it is derived from
    // the drug catalog and scales with it, so the join is left to the
    // size estimator — AQE broadcasts it while it fits and demotes to
    // shuffle when a 100× catalog exceeds the threshold.
    meds.join(activeCoverage(coverage, asOf), Seq("patient_id"))
      .join(formulary, Seq("payer", "rxnorm_cui"), "left")
      .select(col("patient_id"), col("med_id"), col("rxnorm_cui"), col("payer"),
        col("tier"), coalesce(col("prior_auth"), lit(false)).as("prior_auth"),
        col("tier").isNull.as("off_formulary"))

  /** The reference's explicit denial-risk model — "simple
    * logistic-style function based on price, tier and prior
    * authorisation" (README.md:9,27,77) — as a reusable Column. Plain
    * arithmetic: Catalyst folds it, codegen runs it. */
  def denialRisk(price: Column, tier: Column, priorAuth: Column): Column = {
    val z = lit(-2.0) + lit(0.002) * coalesce(price, lit(0.0)) +
      lit(0.4) * (coalesce(tier, lit(5)) - lit(1)) +
      lit(1.5) * priorAuth.cast("double")
    lit(1.0) / (lit(1.0) + exp(-z))
  }

  /** Draft FHIR MedicationRequest per recommendation row
    * (README.md:10,28-29,71): pinned field order, string/long fields
    * only, so the serialized bytes are stable. Additive — appends a
    * `resource` column so callers keep their scoring columns without
    * re-evaluating the pipeline. */
  def fhirMedicationRequest(recs: DataFrame): DataFrame =
    recs.withColumn("resource",
      graft.functions.FhirJson.medicationRequest(
        concat(lit("rx-"), col("med_id")),
        concat(lit("Patient/"), col("patient_id")),
        "medicationReference" ->
          struct(concat(lit("RxNorm/"), col("generic_cui")).as("reference")),
        "denialRiskScore" -> col("denial_risk").cast("string")))

  /** EP1 end to end (README.md:41-71): substitution candidates scored
    * by denial risk under the patient's active formulary,
    * lowest-risk/cheapest-first per med (win_rank_topk shape), exported
    * as draft FHIR resources. Patients without an active coverage row
    * get NO recommendation (inner join — denial scoring requires payer
    * context by design). */
  def recommend(meds: DataFrame, orangeBook: DataFrame,
      prices: DataFrame, allergies: DataFrame, coverage: DataFrame,
      formulary: DataFrame, asOf: Column = current_date()): DataFrame = {
    val subs = genericSubstitutions(meds, orangeBook, prices, allergies)
    val genericFormulary = formulary.select(col("payer"),
      col("rxnorm_cui").as("generic_cui"), col("tier"), col("prior_auth"))
    // Size-estimated join (no hint): see formularyStatus — AQE keeps
    // the broadcast while the catalog-derived formulary is small.
    val scored = subs.join(activeCoverage(coverage, asOf), Seq("patient_id"))
      .join(genericFormulary, Seq("payer", "generic_cui"), "left")
      .withColumn("denial_risk",
        round(denialRisk(col("generic_price"), col("tier"),
          coalesce(col("prior_auth"), lit(false))), 4))
    // (payer, generic_cui) is unique per scored row for a given med, so
    // the trailing keys make the ordering total — rn=1 is deterministic.
    val w = Window.partitionBy(col("med_id"))
      .orderBy(col("denial_risk").asc, col("generic_price").asc_nulls_last,
        col("generic_cui").asc, col("payer").asc)
    val best = scored.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
    fhirMedicationRequest(best)
      .select(col("patient_id"), col("med_id"), col("resource"),
        col("generic_cui"), col("saving"), col("denial_risk"))
  }
}
