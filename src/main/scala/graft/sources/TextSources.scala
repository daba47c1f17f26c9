package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Batch ingestion sources for the documents corpus (SURVEY.md §2.7's
  * batch-side complement): schema-ENFORCED JSON-Lines and CSV readers
  * with corrupt-record quarantine.
  *
  * Scale rules baked in:
  *  - The schema is always supplied, never inferred — inference is an
  *    extra full scan (or a sampled guess that breaks on the tail) and
  *    at 100 TB either is unacceptable.
  *  - Malformed rows NEVER fail the job and NEVER silently vanish:
  *    PERMISSIVE mode routes them to a quarantine frame the caller can
  *    persist and audit (count rejects, alert on rate, replay later).
  *  - JSONL and (non-multiline) CSV stay line-splittable, so a 100 TB
  *    input still parallelizes by HDFS/S3 block, not by file.
  */
object TextSources {

  /** The documents table contract (TESTDATA.md). */
  val documentsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  private val Corrupt = "_corrupt_record"
  private def withCorrupt(s: StructType): StructType =
    s.add(StructField(Corrupt, StringType))

  /** Clean rows + quarantined raw lines. */
  final case class Ingest(clean: DataFrame, rejects: DataFrame)

  private val required = Seq("doc_id", "text")

  /** Schema-enforced JSON-Lines reader. Reads the file as raw LINES and
    * parses with from_json, so EVERY quarantined row — unparseable,
    * type-mismatched, or parsed-but-missing a required key — carries its
    * full original line in `_corrupt_record` for audit and replay
    * (a schema-first json() read loses the raw text for rows that parse
    * but fail validation). The cache guarantees clean/rejects come from
    * ONE pass over the input. */
  def jsonlDocuments(spark: SparkSession, path: String): Ingest = {
    val parsed = spark.read.text(path)
      .select(col("value").as(Corrupt),
        from_json(col("value"), documentsSchema).as("r"))
      .select(col(Corrupt), col("r.*"))
      .cache()
    val malformed = required.map(col(_).isNull).reduce(_ || _)
    Ingest(
      clean = parsed.filter(!malformed).drop(Corrupt),
      rejects = parsed.filter(malformed))
  }

  /** Schema-enforced CSV reader (header row, RFC-4180 quoting with
    * doubled in-field quotes — the layout `csvWriteOptions` produces).
    * Type-mismatched or short rows quarantine; unparseable raw text
    * lands in `_corrupt_record` (null for rows that parse but fail the
    * required-field check — CSV loses raw lines there; corpora needing
    * full replay audit should ship JSONL). Texts containing embedded
    * line separators are NOT round-trippable in splittable CSV — use
    * JSONL (escapes newlines, stays line-splittable) for such corpora.
    * The cache is REQUIRED, not an optimization: Spark refuses queries
    * filtering only on the internal corrupt-record column of a live
    * scan (SPARK-21610). */
  def csvDocuments(spark: SparkSession, path: String): Ingest = {
    val cached = spark.read
      .schema(withCorrupt(documentsSchema))
      .options(csvReadOptions)
      .csv(path)
      .cache()
    val malformed = col(Corrupt).isNotNull ||
      required.map(col(_).isNull).reduce(_ || _)
    Ingest(
      clean = cached.filter(!malformed).drop(Corrupt),
      rejects = cached.filter(malformed))
  }

  /** Columnar (ORC) reader — the third ingest format next to parquet's
    * native path and the text formats above. ORC carries its types, so
    * "corrupt record" cannot occur; enforcement here is the CONTRACT:
    * the supplied schema makes missing columns fail at analysis time
    * (not mid-job on a late partition), extra columns are dropped by
    * the projection, and rows violating required-field nullability
    * quarantine exactly like the text readers (ORC nulls where the
    * contract demands values are data bugs, not format errors). Scan
    * behavior matches parquet: predicate pushdown + stripe-level
    * min/max skipping, so the engine is format-agnostic at scan level. */
  def orcDocuments(spark: SparkSession, path: String): Ingest = {
    val read = spark.read.schema(documentsSchema).orc(path)
    val malformed = required.map(col(_).isNull).reduce(_ || _)
    Ingest(
      clean = read.filter(!malformed),
      rejects = read.filter(malformed)
        .withColumn(Corrupt, lit(null).cast(StringType)))
  }

  /** Reader options paired with [[csvWriteOptions]]. */
  val csvReadOptions: Map[String, String] = Map(
    "header" -> "true",
    "mode" -> "PERMISSIVE",
    "columnNameOfCorruptRecord" -> Corrupt,
    "quote" -> "\"",
    "escape" -> "\"")

  /** Writer options that keep CSV line-splittable and round-trippable:
    * quotes are doubled (RFC 4180) rather than backslash-escaped, so a
    * quoted field never fools a naive line splitter. */
  val csvWriteOptions: Map[String, String] = Map(
    "header" -> "true",
    "quote" -> "\"",
    "escape" -> "\"",
    "quoteAll" -> "true")
}
