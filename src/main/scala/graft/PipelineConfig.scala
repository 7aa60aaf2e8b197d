package graft

/** Typed mirror of the reference's YAML query surface: the 17 mapping
  * parameters of `AnnotationIndexerConfig`
  * (`ingester/annotations_indexer.py:18-49`) plus source/sink/NLP blocks
  * (`config/config.yml:1-73`), with the reference's config quirks fixed and
  * documented:
  *
  *  - `skip-processed-doc-check: true` ENABLES the check in the reference
  *    (`annotations_indexer.py:252` vs `README.md:86`); here the flag is
  *    named for what it does: [[checkAlreadyProcessed]].
  *  - date segments are half-open `[start, end)` (the reference's inclusive
  *    ends double-process boundary days, `annotations_indexer.py:847-857`).
  */
final case class PipelineConfig(
    // source (config.yml:3-24)
    sourcePath: String,
    textField: String = "text",            // config.yml:53 'document'
    docIdField: String = "doc_id",         // config.yml:54 '_id'
    dateField: String = "dct",             // config.yml:58
    dateFormat: String = "yyyy-MM-dd",     // config.yml:59
    // batching (config.yml:57-64)
    dateStart: Option[String] = None,
    dateEnd: Option[String] = None,
    intervalDays: Int = 30,                // config.yml:61
    // filters
    minTextLen: Int = 5,                   // annotations_indexer.py:66
    checkAlreadyProcessed: Boolean = false, // fixed-polarity F3 (config.yml:65)
    // projection (config.yml:55-56, 66-70)
    persistFields: Seq[String] = Seq("doc_id"),
    splitIndexByField: Option[String] = None, // config.yml:66
    useNestedObjects: Boolean = false,        // config.yml:67
    annIdField: String = "id",                // config.yml:69
    // NLP (config.yml:26-39)
    nlpEndpoints: Seq[String] = Seq.empty,
    maxRetriesOnFailure: Int = 1,          // config.yml:39
    // sink (config.yml:41-50)
    sinkPath: String = "",
    bulkMaxRecordsPerFile: Int = 10000)    // es_common.py:98 BULK_CHUNK_SIZE
