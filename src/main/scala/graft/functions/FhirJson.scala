package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Single source of truth for the draft FHIR MedicationRequest JSON
  * shape (/root/reference/README.md:10,28-29,71). Field order is pinned
  * by construction order — the golden-file test and the DuckDB
  * string-concat oracles byte-compare this output, so every producer
  * (sink_json_fhir, fn_struct_fhir, MedRules export) must build through
  * here rather than hand-rolling the struct.
  */
object FhirJson {
  /** resourceType/id/status/subject header + ordered extra fields.
    * `ignoreNullFields=false`: to_json's default silently DROPS null
    * fields, which would break the pinned-field-order byte contract the
    * moment an extra (e.g. a null denial score) is null — a resource
    * must carry every declared field, null spelled out, so the golden
    * files and string-concat oracles stay byte-comparable. */
  def medicationRequest(id: Column, subjectRef: Column,
      extras: (String, Column)*): Column =
    to_json(struct(
      (Seq(
        lit("MedicationRequest").as("resourceType"),
        id.as("id"),
        lit("draft").as("status"),
        struct(subjectRef.as("reference")).as("subject")) ++
        extras.map { case (name, c) => c.as(name) }): _*),
      Map("ignoreNullFields" -> "false"))
}
