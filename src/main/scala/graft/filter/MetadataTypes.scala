package graft.filter

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Metadata value typing (SURVEY.md §1.2): the reference maps every metadata
 * value to 'int' | 'float' | 'timestamp' | 'text', detects datetimes by key
 * suffix (`_date` / `_datetime`), and normalizes parseable datetimes to
 * ISO-8601 (reference: lexical-graph/.../indexing/utils/… metadata.py:22-98,
 * config.py:52). Here the same rules are Column expressions, applied at
 * ingest so filter pushdown sees typed columns, not strings.
 */
object MetadataTypes {

  val DateTimeSuffixes: Seq[String] = Seq("_date", "_datetime")

  /** True when the metadata key opts into datetime parsing by suffix. */
  def isDateTimeKey(key: String): Boolean =
    DateTimeSuffixes.exists(key.toLowerCase.endsWith)

  private val IntRe = "^[+-]?\\d+$"
  private val FloatRe = "^[+-]?(\\d+\\.\\d*|\\.\\d+|\\d+)([eE][+-]?\\d+)?$"

  /** Accepted datetime shapes, tried in order (the reference uses a fuzzy
    * parser; these cover its test corpus: ISO date, ISO datetime, slashed). */
  private val Formats = Seq(
    "yyyy-MM-dd'T'HH:mm:ss", "yyyy-MM-dd HH:mm:ss", "yyyy-MM-dd",
    "MM/dd/yyyy", "yyyy/MM/dd")

  /** Best-effort parse of a raw string to TimestampType (null if no format
    * matches). */
  def parseTimestamp(value: Column): Column =
    coalesce(Formats.map(f => try_to_timestamp(value, lit(f))): _*)

  /** ISO-8601 normalization of a parseable datetime, null otherwise
    * (reference metadata.py:38-59). */
  def toIso8601(value: Column): Column =
    date_format(parseTimestamp(value), "yyyy-MM-dd'T'HH:mm:ss")

  /**
   * 'int' | 'float' | 'timestamp' | 'text' for a (key, value) pair
   * (reference metadata.py:63-98 `type_name_for_key_value`; nested
   * list/dict values are rejected by the map-typed schema itself —
   * MAP<STRING,STRING> cannot hold them, which is the reference's
   * "reject collections" rule enforced structurally).
   */
  def typeNameForKeyValue(key: Column, value: Column): Column =
    when(isDateTimeKeyCol(key) && parseTimestamp(value).isNotNull,
      lit("timestamp"))
      .when(value.rlike(IntRe), lit("int"))
      .when(value.rlike(FloatRe), lit("float"))
      .otherwise(lit("text"))

  private def isDateTimeKeyCol(key: Column): Column =
    DateTimeSuffixes
      .map(s => lower(key).endsWith(s))
      .reduce(_ || _)

  /** Typed value column for filter pushdown: casts the string value to the
    * inferred type's canonical form (timestamp → ISO string, numerics →
    * themselves, text unchanged). */
  def normalizedValue(key: Column, value: Column): Column =
    when(isDateTimeKeyCol(key) && parseTimestamp(value).isNotNull,
      toIso8601(value))
      .otherwise(value)

  /** DefaultSourceMetadataFormatter (reference metadata.py:135-172): apply
    * the per-type formatter to every entry of a metadata map, keeping the
    * original value where formatting fails — one `transform_values`, no
    * UDF. */
  def formatMetadata(metadataCol: Column): Column =
    transform_values(metadataCol, (k, v) => normalizedValue(k, v))
}
