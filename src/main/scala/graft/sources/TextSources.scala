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

  /** Split a PERMISSIVE-parsed frame into clean/quarantine. The cache is
    * REQUIRED, not an optimization: Spark refuses queries that filter on
    * only the internal corrupt-record column of a live scan
    * (SPARK-21610), and it also guarantees clean/rejects come from ONE
    * pass over the input. */
  private def split(raw: DataFrame, required: Seq[String]): Ingest = {
    val cached = raw.cache()
    val malformed = col(Corrupt).isNotNull ||
      required.map(col(_).isNull).reduce(_ || _)
    Ingest(
      clean = cached.filter(!malformed).drop(Corrupt),
      rejects = cached.filter(malformed))
  }

  /** Schema-enforced JSON-Lines reader. A line that fails to parse, or
    * parses but lacks the required keys, lands in `rejects` with its
    * raw text in `_corrupt_record`. */
  def jsonlDocuments(spark: SparkSession, path: String): Ingest =
    split(
      spark.read
        .schema(withCorrupt(documentsSchema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", Corrupt)
        .json(path),
      required = Seq("doc_id", "text"))

  /** Schema-enforced CSV reader (header row, RFC-4180 quoting with
    * doubled in-field quotes — the layout `csvWriteOptions` produces).
    * Type-mismatched or short rows quarantine like JSON. */
  def csvDocuments(spark: SparkSession, path: String): Ingest =
    split(
      spark.read
        .schema(withCorrupt(documentsSchema))
        .options(csvReadOptions)
        .csv(path),
      required = Seq("doc_id", "text"))

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
