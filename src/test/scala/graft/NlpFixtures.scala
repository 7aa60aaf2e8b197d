package graft

/** FIXTURES.md B2/B3-shaped NLP response payloads, shared across specs. */
object NlpFixtures {
  val medcatJson: String =
    """{"result": {"annotations": {"entities": {
      |  "0": {"id": 0, "cui": "C0008031", "tuis": "T184", "types": "Sign or Symptom",
      |        "detected_name": "chest~pain", "pretty_name": "Chest Pain",
      |        "source_value": "chest pain", "acc": 0.99, "context_similarity": 0.99,
      |        "start": 22, "end": 32,
      |        "meta_anns": {"Status": {"name": "Status", "value": "Affirmed", "confidence": 0.97}}},
      |  "1": {"id": 1, "cui": "C0013404", "tuis": "T184", "types": "Sign or Symptom",
      |        "detected_name": "shortness~of~breath", "pretty_name": "Dyspnea",
      |        "source_value": "shortness of breath", "acc": 0.95, "context_similarity": 0.91,
      |        "start": 37, "end": 56, "meta_anns": {}}}},
      | "timestamp": "2020-03-15T12:00:00"},
      | "medcat_info": {"model": "medcat-1.x", "ontology": "UMLS"}}""".stripMargin

  val gateJson: String =
    """{"text": "John Smith was seen by Dr. Jones.",
      |"entities": {
      |  "Person": [{"indices": ["0", "10"], "firstName": "John", "surname": "Smith",
      |              "gender": "male", "kind": "fullName", "rule": "PersonFinal",
      |              "ruleFinal": "PersonFinal", "matchedWithLonger": false, "matches": 2}],
      |  "Title": [{"indices": ["23", "26"], "title": "Dr.", "rule": "TitleRule",
      |             "matchedWithLonger": true, "matches": 1}]}}""".stripMargin
}
