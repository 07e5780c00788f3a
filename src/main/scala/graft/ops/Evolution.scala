package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.{SfColumn, SfField, SfSchema}

/** K4 + S6 — the executed schema-evolution path: the reference generates
  * CREATE/ALTER from describe() and *runs* them against the warehouse via
  * `PostgresHook.run` (`/root/reference/operators/
  * salesforce_schema_to_redshift_operator.py:296-339`), fetching the
  * destination's live column list back from `information_schema.columns`
  * in ordinal order (`:153-215`) to drive the CREATE-vs-ALTER decision and
  * the COPY column alignment. The engine-native equivalents here:
  *
  *   - DDL executor  → `spark.sql(CREATE/ALTER)` against the session
  *     catalog (Spark-dialect DDL from the same SfColumn metadata);
  *   - information_schema scan → `spark.catalog.listColumns` (returns
  *     columns in table-schema = ordinal order);
  *   - COPY → column-aligned `INSERT INTO` ([[Load.alignForLoad]] +
  *     ANSI store-assignment casts).
  *
  * Everything here is O(#columns) driver-side metadata work except the two
  * INSERTs, which are fully distributed writes.
  */
object Evolution {

  /** Synthetic describe() v1: the destination is first created from a
    * 2-field Salesforce object... */
  val supplierV1: Seq[SfField] = Seq(
    SfField("S_SuppKey", "xsd:int", precision = 10),
    SfField("S_Name", "xsd:string", length = 25))

  /** ...and v2 adds two fields, driving the ALTER path (D2/D3). */
  val supplierV2: Seq[SfField] = supplierV1 ++ Seq(
    SfField("S_NationKey", "xsd:int", precision = 10),
    SfField("S_AcctBal", "xsd:double", precision = 18))

  /** S6 — catalog-backed destination schema fetch in ordinal order (the
    * `information_schema.columns ... ORDER BY ordinal_position` analogue). */
  def destinationColumns(spark: SparkSession, db: String, table: String): Seq[String] =
    if (!spark.catalog.tableExists(s"$db.$table")) Nil
    else spark.catalog.listColumns(s"$db.$table").collect().map(_.name).toSeq

  /** K4 — execute the reconcile decision (D3) against the live catalog:
    * CREATE when the table is absent, one ALTER ADD COLUMNS per missing
    * column otherwise. Returns the DDL that was run. */
  def reconcileAndExecute(spark: SparkSession, db: String, table: String,
                          sfCols: Seq[SfColumn]): Seq[String] = {
    val existing = destinationColumns(spark, db, table)
    val ddl =
      if (existing.isEmpty)
        Seq(SfSchema.sparkCreateTableDdl(db, table, SfSchema.toStruct(sfCols)))
      else
        SfSchema.sparkAlterTableDdl(db, table, SfSchema.missingColumns(sfCols, existing))
    ddl.foreach(spark.sql(_))
    ddl
  }

  /** Column-aligned distributed load into the catalog table: destination
    * ordinal order ∩ source columns (P9), varchar clamp (TRUNCATECOLUMNS),
    * positional INSERT with ANSI store-assignment casts — the engine-native
    * COPY. */
  def loadAligned(spark: SparkSession, db: String, table: String,
                  df: DataFrame, sfCols: Seq[SfColumn]): Unit = {
    val dest = destinationColumns(spark, db, table)
    val aligned = Load.alignForLoad(df, dest, sfCols)
    // project the aligned columns in destination order; columns the source
    // doesn't provide (pre-evolution loads) land as typed NULLs — Redshift
    // COPY's behavior for unlisted columns. The INSERT goes through the
    // DataFrame writer directly (positional resolution + ANSI
    // store-assignment casts, same as SQL INSERT) — a session-global named
    // temp view here would let two concurrent loads of one table race
    // between view registration and INSERT.
    val provided = aligned.columns.map(_.toLowerCase).toSet
    val proj = spark.table(s"$db.$table").schema.map(f =>
      if (provided.contains(f.name.toLowerCase)) s"`${f.name}`"
      else s"CAST(NULL AS ${f.dataType.sql}) AS `${f.name}`")
    aligned.selectExpr(proj: _*).write.insertInto(s"$db.$table")
  }

  /** The end-to-end evolve-then-load round trip over the `supplier` table:
    * create from describe v1 → load the odd-key half (2 columns) → source
    * schema grows to v2 → reconcile emits+executes ALTERs against the live
    * catalog → load the even-key half (4 columns, ordinal-aligned) → read
    * the final table back. Pre-evolution rows surface NULL in the added
    * columns, exactly like a warehouse table that evolved mid-history.
    * Idempotent: the database (and its physical location) is recreated from
    * scratch on every call. */
  def roundtrip(spark: SparkSession, dir: String,
                db: String = "graft_evo",
                location: String = "/tmp/graft_evo_wh"): DataFrame = {
    val supplier = graft.Tables.load(spark, dir, "supplier")
    val v1 = SfSchema.fetchSfColumns(supplierV1)
    val v2 = SfSchema.fetchSfColumns(supplierV2)

    spark.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
    // a previous *process* may have left files behind that the fresh
    // session's catalog no longer tracks — clear the location physically
    val path = new org.apache.hadoop.fs.Path(location)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(path)) fs.delete(path, true)
    spark.sql(s"CREATE DATABASE $db LOCATION '$location'")

    reconcileAndExecute(spark, db, "supplier", v1) // CREATE branch
    loadAligned(spark, db, "supplier",
      supplier.filter(pmod(col("s_suppkey"), lit(2)) === 1), v1)

    reconcileAndExecute(spark, db, "supplier", v2) // ALTER branch
    loadAligned(spark, db, "supplier",
      supplier.filter(pmod(col("s_suppkey"), lit(2)) === 0), v2)

    spark.table(s"$db.supplier").orderBy("s_suppkey")
  }
}
