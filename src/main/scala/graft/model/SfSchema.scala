package graft.model

import org.apache.spark.sql.types._

/** Source-side field metadata, modeling the subset of a Salesforce
  * `describe()['fields']` entry the reference consumes
  * (`/root/reference/operators/salesforce_schema_to_redshift_operator.py:84-106`).
  */
case class SfField(
    name: String,
    soapType: String, // may carry a namespace prefix, e.g. "xsd:string"
    length: Int = 0,
    precision: Int = 0,
    compoundFieldName: Option[String] = None)

/** One reconciled column, the reference's
  * `{rs_name, sf_name, path, type, length, precision}` dict
  * (`salesforce_schema_to_redshift_operator.py:96-106`). `path` supports
  * multi-level string keys and integer array indices exactly like
  * `create_paths` (`:217-248`), though describe output only ever emits
  * single-element paths (`:99`). */
case class SfColumn(
    rsName: String,
    sfName: String,
    path: Seq[Either[String, Int]],
    soapType: String,
    length: Int,
    precision: Int)

/** Schema/type machinery (SURVEY.md §1.2-1.3, §2.5). All functions here are
  * pure metadata transforms — they run on the driver in O(#columns), never
  * touching data, exactly as the reference's describe/information_schema
  * round-trips do. At 100 TB this stays O(columns), not O(rows).
  */
object SfSchema {

  /** The authoritative soapType → warehouse-DDL mapping, reproducing
    * `dt_conv` (`salesforce_schema_to_redshift_operator.py:41-55`) including
    * the varchar(MAX)-over-65535 rule. */
  def dtConv(soapType: String, length: Int, precision: Int): Option[String] =
    soapType match {
      case "boolean"  => Some("boolean")
      case "date"     => Some("date")
      case "dateTime" => Some("TIMESTAMP")
      case "double"   => Some("float8")
      case "email"    => Some("varchar(80)")
      case "id" | "ID" => Some("varchar(100)")
      case "int"      => Some("int")
      case "picklist" | "string" | "textarea" =>
        Some(if (length > 65535) "varchar(MAX)" else s"varchar($length)")
      case "phone"    => Some("varchar(40)")
      case "url"      => Some("varchar(256)")
      case _          => None // unmapped types are skipped, as in the reference
    }

  /** soapType → Spark type (SURVEY.md §1.2 table). Strings keep their
    * varchar length in column Metadata for the TRUNCATECOLUMNS clamp. */
  def toSparkType(soapType: String): DataType = soapType match {
    case "boolean"  => BooleanType
    case "date"     => DateType
    case "dateTime" => TimestampType
    case "double"   => DoubleType
    case "int"      => IntegerType
    case _          => StringType
  }

  /** S5 + P2 — `fetch_sf_columns`: normalize describe metadata into ordered
    * columns. Compound fields (addresses/geolocations) are excluded by
    * *name*: every `compoundFieldName` value goes into a set and any field
    * whose name appears there is dropped
    * (`salesforce_schema_to_redshift_operator.py:90-94,106`). soapType
    * namespace prefix is stripped (`split(':')[-1]`, `:100`); rs_name is the
    * lowercased sf name (`:97`). */
  def fetchSfColumns(fields: Seq[SfField]): Seq[SfColumn] = {
    val compound: Set[String] = fields.flatMap(_.compoundFieldName).toSet
    fields
      .filterNot(f => compound.contains(f.name))
      .map { f =>
        val soap = f.soapType.split(':').last
        SfColumn(
          rsName = f.name.toLowerCase,
          sfName = f.name,
          path = Seq(Left(f.name)),
          soapType = soap,
          length = f.length,
          precision = f.precision)
      }
  }

  /** SfColumn list → StructType with length/precision in field Metadata. */
  def toStruct(cols: Seq[SfColumn]): StructType =
    StructType(cols.map { c =>
      val md = new MetadataBuilder()
        .putString("sfName", c.sfName)
        .putString("soapType", c.soapType)
        .putLong("length", c.length.toLong)
        .putLong("precision", c.precision.toLong)
        .build()
      StructField(c.rsName, toSparkType(c.soapType), nullable = true, md)
    })

  /** D1 — CREATE TABLE generation
    * (`salesforce_schema_to_redshift_operator.py:108-128`). */
  def createTableDdl(schema: String, table: String, cols: Seq[SfColumn]): String = {
    val colDefs = cols.flatMap(c =>
      dtConv(c.soapType, c.length, c.precision).map(t => s"${c.rsName} $t"))
    s"CREATE TABLE IF NOT EXISTS $schema.$table (${colDefs.mkString(", ")})"
  }

  /** D2 — one ALTER TABLE ... ADD COLUMN per missing column
    * (`salesforce_schema_to_redshift_operator.py:130-151`). */
  def alterTableDdl(schema: String, table: String, missing: Seq[SfColumn]): Seq[String] =
    missing.flatMap(c =>
      dtConv(c.soapType, c.length, c.precision)
        .map(t => s"ALTER TABLE $schema.$table ADD COLUMN ${c.rsName} $t"))

  /** P8 — new-column detection: source columns absent from the destination
    * (`salesforce_schema_to_redshift_operator.py:184-188`). Matching is
    * case-insensitive via the lowercased rsName. */
  def missingColumns(sfCols: Seq[SfColumn], rsCols: Seq[String]): Seq[SfColumn] = {
    val existing = rsCols.map(_.toLowerCase).toSet
    sfCols.filterNot(c => existing.contains(c.rsName))
  }

  /** D3 — CREATE vs ALTER vs no-op decision
    * (`salesforce_schema_to_redshift_operator.py:153-192`). */
  def reconcile(schema: String, table: String,
                sfCols: Seq[SfColumn], rsCols: Seq[String]): Seq[String] =
    if (rsCols.isEmpty) Seq(createTableDdl(schema, table, sfCols))
    else alterTableDdl(schema, table, missingColumns(sfCols, rsCols))

  /** P9 — COPY column filter: destination columns restricted to those the
    * source provides, preserving destination order
    * (`salesforce_schema_to_redshift_operator.py:322-326`). */
  def copyColumnFilter(rsColsOrdered: Seq[String], sfCols: Seq[SfColumn]): Seq[String] = {
    val sfSet = sfCols.map(_.rsName).toSet
    rsColsOrdered.filter(c => sfSet.contains(c.toLowerCase))
  }

  /** N2 — JSONPath rendering: `$['a']['b']` for string keys, `[0]` for
    * array indices (`salesforce_schema_to_redshift_operator.py:217-248`).
    * We do NOT reproduce the reference's comma-stripping bug (`:245` strips
    * every comma in the final path via str.replace, corrupting any path
    * containing a comma — SURVEY.md §7.4). */
  def renderPath(path: Seq[Either[String, Int]]): String =
    "$" + path.map {
      case Left(key) => s"['$key']"
      case Right(ix) => s"[$ix]"
    }.mkString

  /** N2 — the ordered jsonpaths artifact: source paths ordered by the
    * destination's ordinal column order
    * (`salesforce_schema_to_redshift_operator.py:250-269`). */
  def jsonPathsFile(rsColsOrdered: Seq[String], sfCols: Seq[SfColumn]): String = {
    val byName = sfCols.map(c => c.rsName -> c).toMap
    val paths = rsColsOrdered.flatMap(rc => byName.get(rc.toLowerCase))
      .map(c => "\"" + renderPath(c.path) + "\"")
    s"""{"jsonpaths": [${paths.mkString(", ")}]}"""
  }

  /** K3 — COPY command generation with late-bound credential placeholders,
    * reproducing the template (`salesforce_schema_to_redshift_operator
    * .py:271-294`): JSON + jsonpaths load, epoch-millis timestamps,
    * TRUNCATECOLUMNS, stats updates off. Placeholders stay double-braced
    * exactly as the reference leaves them for a downstream renderer. */
  def copyCommand(schema: String, table: String, cols: Seq[String],
                  s3Bucket: String, s3Key: String, jsonPathKey: String): String =
    s"""COPY $schema.$table (${cols.mkString(", ")})
       |FROM 's3://$s3Bucket/$s3Key'
       |CREDENTIALS 'aws_access_key_id={{ access_key }};aws_secret_access_key={{ secret_key }}'
       |JSON 's3://$s3Bucket/$jsonPathKey'
       |REGION as 'us-east-1'
       |TIMEFORMAT 'epochmillisecs'
       |TRUNCATECOLUMNS
       |COMPUPDATE OFF
       |STATUPDATE OFF""".stripMargin

  /** Spark-side DDL from a StructType — the engine-native analogue of D1
    * (SURVEY.md §2.5 "StructType.toDDL"). */
  def sparkCreateTableDdl(db: String, table: String, st: StructType): String =
    s"CREATE TABLE IF NOT EXISTS $db.$table (${st.toDDL})"

  /** Spark-side ALTER DDL — the engine-native analogue of D2, executable by
    * `spark.sql` against the session catalog (see [[graft.ops.Evolution]]). */
  def sparkAlterTableDdl(db: String, table: String, missing: Seq[SfColumn]): Seq[String] =
    missing.map(c =>
      s"ALTER TABLE $db.$table ADD COLUMNS (${c.rsName} ${toSparkType(c.soapType).sql})")
}
