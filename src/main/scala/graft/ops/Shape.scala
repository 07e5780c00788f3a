package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Row-shaping operators — the dataflow the reference applies between
  * extract and load (SURVEY.md §2.2/§2.3). Reference semantics live in
  * Airflow contrib's `write_object_to_file` (invoked from
  * `/root/reference/operators/salesforce_to_s3_operator.py:208-212`) and in
  * `special_query` (`salesforce_to_s3_operator.py:148-162`).
  *
  * All of these are narrow (no shuffle): pure projections/maps that stay
  * inside one whole-stage-codegen span, so they cost one pass over the data
  * regardless of scale.
  */
object Shape {

  /** P3 — drop the Salesforce `attributes` envelope column before writing
    * (ref: contrib `write_object_to_file`, call site
    * `salesforce_to_s3_operator.py:208-212`). No-op when absent. */
  def dropAttributes(df: DataFrame): DataFrame =
    if (df.columns.contains("attributes")) df.drop("attributes") else df

  /** P4 — lowercase every column name, mirroring `rs_name = name.lower()`
    * (ref: `salesforce_schema_to_redshift_operator.py:97,146` and contrib's
    * dataframe lowercasing). Metadata-only — free. */
  def lowercaseColumns(df: DataFrame): DataFrame =
    df.toDF(df.columns.map(_.toLowerCase): _*)

  /** P5 — `coerce_to_timestamp=True`: convert every date/datetime column to
    * epoch **milliseconds** UTC (ref: `salesforce_to_s3_operator.py:109-113,
    * 130,211`; millisecond fidelity required by the generated COPY command's
    * `TIMEFORMAT 'epochmillisecs'`, `salesforce_schema_to_redshift_operator
    * .py:282`). Column set is derived from the schema, the Spark analogue of
    * the reference consulting `describe()` type metadata. */
  def coerceTimestamps(df: DataFrame): DataFrame = {
    val coerced = df.schema.fields.map { f =>
      f.dataType match {
        case TimestampType | TimestampNTZType =>
          unix_millis(col(f.name).cast(TimestampType)).as(f.name)
        case DateType =>
          unix_millis(col(f.name).cast(TimestampType)).as(f.name)
        case _ => col(f.name)
      }
    }
    df.select(coerced.toIndexedSeq: _*)
  }

  /** P6 — `record_time_added=True`: stamp an ingest-time audit column (ref:
    * `salesforce_to_s3_operator.py:103-107,129,212`). One constant per
    * batch — the reference computes `time.time()` once per run, NOT per
    * record — so we take the epoch as a parameter rather than calling
    * `current_timestamp()` per row. */
  def auditColumn(df: DataFrame, fetchEpochMillis: Long): DataFrame =
    df.withColumn("time_fetched_from_salesforce_at", lit(fetchEpochMillis))

  /** P7 — csv sanitization: contrib's csv path casts every value to string
    * and strips CR/LF so each record stays on one line (ref: fmt="csv"
    * default `salesforce_to_s3_operator.py:126,142,211`). We keep the
    * semantic (strip newlines from string columns) but let `df.write.csv`
    * handle quoting; non-string columns are left typed rather than
    * stringified (documented deviation — lossless superset). */
  def sanitizeCsv(df: DataFrame): DataFrame = {
    val cols = df.schema.fields.map { f =>
      f.dataType match {
        case StringType => regexp_replace(col(f.name), "[\\r\\n]", "").as(f.name)
        case _          => col(f.name)
      }
    }
    df.select(cols.toIndexedSeq: _*)
  }

  /** N1 — relationship flattening (UNNEST with inner semantics): for each
    * parent record take the nested `records` array under the relationship
    * column and emit one row per child; parents lacking the relationship are
    * dropped, and parent columns are discarded (ref: `special_query`,
    * `salesforce_to_s3_operator.py:148-162` — the `if r.get(relationship)`
    * guard at :158 is exactly inner-explode semantics).
    *
    * Scale: `explode` is a narrow generator inside codegen — no shuffle. */
  def flattenRelationship(df: DataFrame, relationshipObject: String): DataFrame = {
    val child = df.select(
      explode(col(s"$relationshipObject.records")).as("__rec"))
    child.select("__rec.*")
  }
}
