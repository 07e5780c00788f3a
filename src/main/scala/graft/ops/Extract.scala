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
