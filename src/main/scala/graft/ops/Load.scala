package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import graft.model.SfColumn

/** Sink-side operators (SURVEY.md §2.4). The reference spools the whole
  * result through driver memory (one NDJSON string / one tmpfile —
  * `/root/reference/operators/salesforce_to_s3_operator.py:54-55,173`);
  * Spark writes one file per task in parallel, which is the scalable
  * equivalent of the Redshift-COPY-from-S3 parallel load the reference
  * delegates to (`salesforce_schema_to_redshift_operator.py:276-286`).
  */
object Load {

  /** K1 — NDJSON sink with overwrite (`replace=True`) semantics (ref:
    * `salesforce_to_s3_operator.py:53-57`). Spark's json output *is*
    * one-object-per-line. */
  def ndjson(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  /** K2 — csv sink (contrib `write_object_to_file` fmt="csv", the default —
    * ref `salesforce_to_s3_operator.py:89,126`): header row, newline-safe
    * via [[Shape.sanitizeCsv]]. */
  def csv(df: DataFrame, path: String): Unit =
    Shape.sanitizeCsv(df).write.mode(SaveMode.Overwrite)
      .option("header", "true").csv(path)

  /** K2 — fmt="json": the reference writes a single JSON array. Spark has no
    * array-JSON writer (it would serialize the world on one node); we write
    * NDJSON instead — documented deviation (SURVEY.md §7.4), lossless and
    * scalable. For the reference's literal single-array shape on SMALL
    * results, use [[jsonArray]]. */
  def json(df: DataFrame, path: String): Unit = ndjson(df, path)

  /** K2 — fmt="json" FAITHFUL form: ONE file holding one JSON array, byte
    * shape the reference uploads (`salesforce_to_s3_operator.py:84-90`,
    * `json.dumps(...)` of the record list). Single-writer by construction —
    * the reference materializes the whole result in driver memory anyway,
    * so this path is for the same small-result regime (schema dumps,
    * describe() artifacts, reconcile reports; guarded by `maxRows`). Rows
    * are serialized by Spark's own JSON encoder (same field formatting as
    * [[ndjson]]), concatenated on the one post-shuffle task — the driver
    * never holds the data; for anything big, use [[ndjson]].
    *
    * Execution shape, deliberately: `repartition(1)` (a shuffle), NOT
    * `coalesce(1)` — coalesce would collapse the upstream narrow lineage
    * onto the single surviving task, serializing the whole computation
    * onto one core; the shuffle boundary keeps upstream parallelism. The
    * serialized strings are cached across the row-count guard and the
    * write, so the upstream query runs ONCE. */
  def jsonArray(df: DataFrame, path: String, maxRows: Long = 100000): Unit = {
    import df.sparkSession.implicits._
    val json = df.toJSON.repartition(1).cache()
    try {
      val n = json.count()
      require(n <= maxRows,
        s"jsonArray is the small-result single-file sink ($n rows > $maxRows); " +
        "use ndjson for large results")
      json.mapPartitions { it =>
        val sb = new StringBuilder("[")
        var first = true
        it.foreach { s => if (!first) sb.append(','); sb.append(s); first = false }
        sb.append(']')
        Iterator(sb.toString)
      }.write.mode(SaveMode.Overwrite).text(path)
    } finally { json.unpersist(); () }
  }

  /** TRUNCATECOLUMNS fidelity (ref COPY option,
    * `salesforce_schema_to_redshift_operator.py:283`): clamp string columns
    * to their declared varchar length. Narrow map — no shuffle. */
  def varcharClamp(df: DataFrame, lengths: Map[String, Int]): DataFrame = {
    val cols = df.columns.map { c =>
      lengths.get(c.toLowerCase) match {
        case Some(n) => substring(col(c), 1, n).as(c)
        case None    => col(c)
      }
    }
    df.select(cols.toIndexedSeq: _*)
  }

  /** K3 — column-aligned table load: select destination columns in
    * destination ordinal order (P9 intersection,
    * `salesforce_schema_to_redshift_operator.py:322-326`), clamping
    * varchars. This is the engine-native COPY: the actual parallel load is
    * Spark's partitioned write. */
  def alignForLoad(df: DataFrame, rsColsOrdered: Seq[String],
                   sfCols: Seq[SfColumn]): DataFrame = {
    val present = df.columns.map(_.toLowerCase).toSet
    val selected = graft.model.SfSchema.copyColumnFilter(rsColsOrdered, sfCols)
      .filter(c => present.contains(c.toLowerCase))
    val lengths = sfCols.filter(c => Set("string", "textarea", "picklist", "email", "phone", "url")
        .contains(c.soapType))
      .map(c => c.rsName -> (if (c.length > 0) c.length else 65535)).toMap
    varcharClamp(df.select(selected.map(col): _*), lengths)
  }
}
