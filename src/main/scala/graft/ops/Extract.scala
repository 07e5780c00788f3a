package graft.ops

import graft.Tables
import graft.soql.Soql
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Extract-side operators (SURVEY.md §2.1). The reference pushes its whole
  * relational plan to Salesforce as a SOQL string; the Spark-native analogue
  * is a declarative DataFrame plan whose projection/predicates Catalyst
  * pushes into the parquet scan (check `.explain`: `PushedFilters`,
  * `ReadSchema`).
  */
object Extract {

  /** S1 — full-object scan with field list: the reference builds
    * `SELECT f1,…,fn FROM obj` and runs `query_all` (contrib
    * `get_object_from_salesforce`, call site
    * `/root/reference/operators/salesforce_to_s3_operator.py:201-202`).
    * Empty field list = all fields (S2 `get_available_fields` fallback,
    * `salesforce_to_s3_operator.py:80-82,186-188`). Projection reaches the
    * parquet reader (column pruning) — at 100 TB a 2-column read scans only
    * those column chunks. */
  def objectScan(spark: SparkSession, dir: String, obj: String,
                 fields: Seq[String] = Nil): DataFrame = {
    val df = Tables.load(spark, dir, obj)
    if (fields.isEmpty) df else df.select(fields.map(col): _*)
  }

  /** S2 — field-list discovery: `describe()` → all field names (ref call
    * site `salesforce_to_s3_operator.py:186-188`). Spark: schema metadata,
    * no data read. */
  def availableFields(spark: SparkSession, dir: String, obj: String): Seq[String] =
    Tables.load(spark, dir, obj).schema.fieldNames.toIndexedSeq

  /** S3/S4 — ad-hoc SOQL scan: arbitrary SOQL string (ref:
    * `salesforce_to_s3_operator.py:50,148-154`; Bulk-vs-REST is a transport
    * detail with no relational semantics). Translated to Spark SQL and
    * planned by Catalyst — filter/projection/limit pushdown all built-in. */
  def soqlQuery(spark: SparkSession, dir: String, soqlText: String,
                fiscalYearStartMonth: Int = 1): DataFrame = {
    Tables.registerAll(spark, dir)
    spark.sql(Soql.translate(soqlText, fiscalYearStartMonth))
  }

  /** S4+ — PK-CHUNKED parallel extract: the Bulk API's PK-chunking pattern
    * (`Sforce-Enable-PKChunking`, the production path for >10M-row object
    * extracts behind the reference's `query_all` transport,
    * `salesforce_to_s3_operator.py:50`) — split one big scan into disjoint
    * primary-key ranges and run each range as an independent chunk query,
    * unioned. Here each chunk is its own parquet scan with the range
    * predicate PUSHED to the reader (plan-locked), so a 1000-executor
    * cluster fans chunks out with row-group/file pruning per chunk instead
    * of one serial cursor; against a range-clustered layout
    * ([[graft.ops.Scale.clusteredParquet]]) each chunk touches only its own
    * files. Result ≡ the unchunked scan (spec + oracle).
    *
    * The [lo, hi] bounds come from one 1-row min/max agg — the analogue of
    * the Bulk API's chunk-planning pass; ranges are equal-width id spans
    * (the Salesforce semantics: id-ordered fixed-size windows, skew handled
    * by AQE at execution rather than by re-planning the split). */
  def pkChunkedScan(spark: SparkSession, dir: String, obj: String, pkCol: String,
                    fields: Seq[String] = Nil, nChunks: Int = 8): DataFrame = {
    require(nChunks > 0, s"nChunks must be positive, got $nChunks")
    val base = objectScan(spark, dir, obj, fields)
    val bounds = base.agg(org.apache.spark.sql.functions.min(col(pkCol)),
      org.apache.spark.sql.functions.max(col(pkCol))).head()
    if (bounds.isNullAt(0)) return base.limit(0) // empty object: no chunks
    // key may be any integral type (int region keys, bigint order keys)
    val (lo, hi) = (bounds.getAs[Number](0).longValue(), bounds.getAs[Number](1).longValue())
    val span = hi - lo + 1
    val ranges = (0 until nChunks)
      .map(i => (lo + span * i / nChunks, lo + span * (i + 1) / nChunks))
      .filter { case (s, e) => e > s } // span < nChunks leaves empty ranges
    ranges
      .map { case (s, e) => base.filter(col(pkCol) >= s && col(pkCol) < e) }
      .reduce(_ unionAll _)
  }

  /** Templated SOQL — the reference's incremental-extract pattern: both S3
    * operators declare `template_fields = ('soql'/'query', …)` so Airflow
    * renders `{{ ds }}`-style params into the SOQL before execution
    * (`salesforce_to_s3_operator.py:25,115-116`). The engine analogue
    * substitutes `{{ key }}` placeholders (whitespace-tolerant) then
    * translates. Values land as raw SOQL text — a bare ISO date/datetime
    * param hits the date-literal lexer path, giving the
    * `WHERE SystemModstamp > {{ last_run }}` incremental idiom its exact
    * Salesforce semantics. Unresolved placeholders throw (a silently
    * un-rendered template is the classic scheduler foot-gun). */
  def templatedSoqlQuery(spark: SparkSession, dir: String, soqlTemplate: String,
                         params: Map[String, String],
                         fiscalYearStartMonth: Int = 1): DataFrame = {
    val rendered = params.foldLeft(soqlTemplate) { case (acc, (k, v)) =>
      acc.replaceAll("\\{\\{\\s*" + java.util.regex.Pattern.quote(k) + "\\s*\\}\\}",
        java.util.regex.Matcher.quoteReplacement(v))
    }
    val leftover = "\\{\\{[^}]*\\}\\}".r.findFirstIn(rendered)
    require(leftover.isEmpty, s"unresolved template placeholder ${leftover.get} in SOQL")
    soqlQuery(spark, dir, rendered, fiscalYearStartMonth)
  }
}
