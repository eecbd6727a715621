package graft

import graft.functions.Scalars
import scala.io.Source

/** Golden-file check (SURVEY §5.4): the FHIR MedicationRequest export
  * byte-compared against a checked-in golden (pinned field order,
  * /root/reference/README.md:10,28-29,71).
  */
class GoldenFhirSpec extends SparkSpec {
  test("first MedicationRequest resource byte-matches the golden file") {
    val golden = {
      val src = Source.fromInputStream(
        getClass.getResourceAsStream("/golden/medication_request.json"), "UTF-8")
      try src.mkString.trim finally src.close()
    }
    val first = Scalars.fnStructFhir(spark, sf())
      .select("resource").limit(1).collect().head.getString(0)
    assert(first == golden)
  }
}
