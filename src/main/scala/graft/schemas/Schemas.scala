package graft.schemas

import org.apache.spark.sql.types._

/** The reference's four hard-coded ES mappings (its entire type system,
  * SURVEY.md §1.2) as Spark StructTypes, plus the NLP response-envelope
  * schemas used to parse service payloads with `from_json`.
  *
  * Sources: `ingester/annotations_indexer.py:359-440` (medcat nested),
  * `:588-688` (medcat separate), `:442-586` (gate nested), `:690-833`
  * (gate separate); response shapes `ingester/nlp_service.py:101-125`.
  */
object Schemas {

  /** `meta_anns.Status.{confidence, name, value}`
    * (`ingester/annotations_indexer.py:620-648`).
    */
  val metaAnnStruct: StructType = StructType(Seq(
    StructField("confidence", FloatType),
    StructField("name", StringType),
    StructField("value", StringType)))

  /** MedCAT annotation entity (`ingester/annotations_indexer.py:588-688`).
    * ES text+keyword multi-fields collapse to StringType; start/end/id are
    * longs.
    */
  val medcatAnnotation: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("cui", StringType),
    StructField("tuis", StringType),
    StructField("types", StringType),
    StructField("detected_name", StringType),
    StructField("pretty_name", StringType),
    StructField("source_value", StringType),
    StructField("acc", FloatType),
    StructField("context_similarity", FloatType),
    StructField("start", LongType),
    StructField("end", LongType),
    StructField("meta_anns", MapType(StringType, metaAnnStruct)),
    StructField("timestamp", StringType)))

  /** GATE annotation entity (`ingester/annotations_indexer.py:690-833`).
    * Includes the reference's real-data quirk fields with trailing spaces
    * (`"orgType "` at `:520`, `"rule "` at `:538`) — faithfully kept, since
    * sink records in the wild carry them.
    */
  val gateAnnotation: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("type", StringType),
    StructField("indices", ArrayType(LongType)),
    StructField("NMRule", StringType),
    StructField("firstName", StringType),
    StructField("gender", StringType),
    StructField("initials", StringType),
    StructField("kind", StringType),
    StructField("orgType", StringType),
    StructField("orgType ", StringType),
    StructField("rule", StringType),
    StructField("rule ", StringType),
    StructField("ruleFinal", StringType),
    StructField("surname", StringType),
    StructField("title", StringType),
    StructField("matchedWithLonger", BooleanType),
    StructField("matches", LongType),
    StructField("pipeline_url", StringType),
    StructField("timestamp", StringType),
    StructField("source_value", StringType)))

  /** MedCAT response envelope (`ingester/nlp_service.py:101-109`,
    * FIXTURES.md B2): `entities` is a MAP keyed by stringified index, not an
    * array — the engine's canonical `explode(map_values(...))` input.
    */
  val medcatResponse: StructType = StructType(Seq(
    StructField("result", StructType(Seq(
      StructField("annotations", StructType(Seq(
        StructField("entities", MapType(StringType, medcatAnnotation))))),
      StructField("timestamp", StringType)))),
    StructField("medcat_info", MapType(StringType, StringType))))

  /** GATE response envelope (`ingester/nlp_service.py:112-125`,
    * FIXTURES.md B3): `entities` keyed by entity TYPE, values are LISTS of
    * entities; `indices` arrive as strings-or-ints → StringType array, cast
    * after parse (the reference coerces with `map(int, ...)`).
    */
  val gateResponse: StructType = StructType(Seq(
    StructField("text", StringType),
    StructField("entities", MapType(StringType, ArrayType(
      StructType(Seq(
        StructField("indices", ArrayType(StringType)),
        StructField("firstName", StringType),
        StructField("surname", StringType),
        StructField("gender", StringType),
        StructField("kind", StringType),
        StructField("title", StringType),
        StructField("rule", StringType),
        StructField("ruleFinal", StringType),
        StructField("matchedWithLonger", BooleanType),
        StructField("matches", LongType))))))))

  /** Flat sink record in separate-index mode (FIXTURES.md B4): `meta.*` +
    * `nlp.*` namespaced columns (literal dots in names).
    */
  def flatSinkSchema(persistFields: Seq[(String, DataType)],
                     annFields: Seq[(String, DataType)]): StructType =
    StructType(
      StructField("_id", StringType) +:
        (persistFields.map { case (f, t) => StructField(s"meta.$f", t) } ++
         annFields.map { case (f, t) => StructField(s"nlp.$f", t) }))

  /** K7 put-mapping body: render a StructType as the ES index-creation
    * JSON (`{"mappings":{"properties":{…}}}`), the engine-side equivalent
    * of the reference's hard-coded mapping dicts
    * (`ingester/annotations_indexer.py:359-833`). Arrays map to their
    * element type (ES arrays are implicit); structs nest as `properties`;
    * maps become open `object`s (ES dynamic mapping — the reference's
    * `meta_anns` shape). Field names pass through [[graft.functions
    * .JsonUtil]] quoting, so the trailing-space quirk fields survive
    * verbatim.
    */
  def esMappingJson(schema: StructType): String = {
    def quote(s: String) = graft.functions.JsonUtil.quote(s)
    def render(dt: DataType): String = dt match {
      case s: StructType =>
        s.fields.map(f => s"${quote(f.name)}:${render(f.dataType)}")
          .mkString("{\"properties\":{", ",", "}}")
      case ArrayType(e, _) => render(e)
      case MapType(_, _, _) => """{"type":"object"}"""
      case LongType | IntegerType => """{"type":"long"}"""
      case ShortType => """{"type":"short"}"""
      case ByteType => """{"type":"byte"}"""
      case FloatType => """{"type":"float"}"""
      case DoubleType | _: DecimalType => """{"type":"double"}"""
      case BooleanType => """{"type":"boolean"}"""
      case TimestampType | DateType => """{"type":"date"}"""
      case BinaryType => """{"type":"binary"}"""
      case _ => """{"type":"text"}"""
    }
    s"""{"mappings":${render(schema)}}"""
  }
}
