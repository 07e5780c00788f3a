package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.model.{SfField, SfSchema}
import graft.ops.{Extract, Load, Shape}

/** Reference-parity queries (SURVEY.md §2.1-2.6) wired into the driver
  * contract. Every entry has a DuckDB oracle in [[ParityQueries.oracles]].
  *
  * Determinism discipline (SURVEY.md §7.4): every query carries a
  * total-order sort key; double aggregates are computed over exact decimals
  * and only cast back to double at the end, so the value is independent of
  * partitioning/aggregation order on both engines.
  */
object ParityQueries {

  /** Order-insensitive exact sum of a 2-decimal money column. */
  private def dsum(c: Column): Column = sum(c.cast(DecimalType(18, 2))).cast(DoubleType)
  /** Exact discounted-revenue sum: cast the FACTORS to 2-decimal decimals
    * before multiplying — the inputs are 2-decimal money/rate values, so the
    * product is exact and the sum order-independent. Casting the double
    * product instead leaves a half-digit rounding that Spark (HALF_UP) and
    * DuckDB (half-even) resolve differently about once per 10⁵ rows. */
  private def revSum(price: Column, discount: Column): Column =
    sum(price.cast(DecimalType(18, 2)) * (lit(1) - discount.cast(DecimalType(18, 2))))
      .cast(DoubleType)

  // ---- schema-reconciliation fixture: a synthetic Salesforce-shaped
  // describe() result (SURVEY.md §5 "Salesforce-shaped record/describe
  // fixtures"), including a compound Address field whose *components* are
  // kept and whose compound parent is dropped (P2 semantics,
  // `salesforce_schema_to_redshift_operator.py:90-94,106`).
  val leadDescribe: Seq[SfField] = Seq(
    SfField("Id", "tns:ID", length = 18),
    SfField("FirstName", "xsd:string", length = 40),
    SfField("LastName", "xsd:string", length = 80),
    SfField("Email", "email", length = 80),
    SfField("Phone", "phone", length = 40),
    SfField("Website", "url", length = 256),
    SfField("AnnualRevenue", "xsd:double", precision = 18),
    SfField("NumberOfEmployees", "xsd:int", precision = 8),
    SfField("IsConverted", "xsd:boolean"),
    SfField("CreatedDate", "xsd:dateTime"),
    SfField("LastActivityDate", "xsd:date"),
    SfField("Industry", "picklist", length = 40),
    SfField("Description", "textarea", length = 131072),
    SfField("Address", "urn:address"), // compound parent — dropped
    SfField("Street", "xsd:string", length = 255, compoundFieldName = Some("Address")),
    SfField("City", "xsd:string", length = 40, compoundFieldName = Some("Address")))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // S1+S2+P1+P3-P5+K1 — the SalesforceToS3Operator happy path (SURVEY.md
    // §7.2 step 1): scan with field list, envelope drop, lowercase,
    // epoch-millis coercion. The ndjson write itself is exercised in tests.
    "extract_shape_lineitem" -> ((s, dir) => {
      val fields = Seq("l_orderkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_returnflag", "l_shipdate")
      val scanned = Extract.objectScan(s, dir, "lineitem", fields)
      Shape.coerceTimestamps(Shape.lowercaseColumns(Shape.dropAttributes(scanned)))
        .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
    }),

    // S4+ — PK-chunked parallel extract (Bulk API PK-chunking): 8 disjoint
    // id-range chunk scans unioned, ≡ the unchunked scan
    "extract_pk_chunked" -> ((s, dir) =>
      Extract.pkChunkedScan(s, dir, "orders", "o_orderkey",
        Seq("o_orderkey", "o_custkey", "o_totalprice")).orderBy("o_orderkey")),

    // S2 — empty field list → all fields (get_available_fields fallback)
    "fields_discovery" -> ((s, dir) => {
      val all = Extract.availableFields(s, dir, "part")
      Extract.objectScan(s, dir, "part", all).orderBy("p_partkey")
    }),

    // §2.6 WHERE: =, >=, IN, AND — via the SOQL front-end
    "soql_filter_project" -> ((s, dir) =>
      Extract.soqlQuery(s, dir,
        """SELECT o_orderkey, o_custkey, o_totalprice FROM Orders
          |WHERE o_orderstatus = 'F' AND o_totalprice >= 150000
          |  AND o_orderpriority IN ('1-URGENT', '2-HIGH')
          |ORDER BY o_orderkey""".stripMargin)),

    // §2.6 LIKE / OR / NOT
    "soql_like" -> ((s, dir) =>
      Extract.soqlQuery(s, dir,
        """SELECT p_partkey, p_name, p_brand FROM Part
          |WHERE (p_name LIKE '%el%' OR p_brand LIKE '%#1%')
          |  AND NOT p_type LIKE 'SMALL%'
          |ORDER BY p_partkey""".stripMargin)),

    // §2.6 GROUP BY + SUM/COUNT/MIN/MAX (TPC-H q1 flavor). Partial (map-side)
    // aggregation + one shuffle on the group keys; decimal sums for
    // order-independence.
    "soql_groupby_agg" -> ((s, dir) => {
      Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          revSum(col("l_extendedprice"), col("l_discount")).as("sum_disc_price"),
          min(col("l_quantity")).as("min_qty"),
          max(col("l_quantity")).as("max_qty"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // §2.6 HAVING (post-aggregation filter)
    "soql_having" -> ((s, dir) =>
      Tables.load(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("total_spend"))
        .filter(col("n_orders") > 12)
        .orderBy("o_custkey")),

    // §2.6 ORDER BY ... DESC + LIMIT (top-k: Spark plans TakeOrderedAndProject
    // — a per-partition heap + driver merge, no global sort at scale)
    "soql_orderby_limit" -> ((s, dir) =>
      Tables.load(s, dir, "orders")
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(10)),

    // §2.6 OFFSET
    "soql_offset" -> ((s, dir) =>
      Tables.load(s, dir, "orders")
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .offset(5).limit(10)),

    // §2.6 GROUP BY ROLLUP (SOQL supports ROLLUP/CUBE). NULLS FIRST pinned on
    // both sides — Spark's asc default is nulls-first, DuckDB's is nulls-last.
    "soql_rollup" -> ((s, dir) =>
      Tables.load(s, dir, "orders")
        .rollup(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
        .orderBy(asc_nulls_first("o_orderstatus"), asc_nulls_first("o_orderpriority"))),

    // §2.6 GROUPING() subtotal indicator through the parser (SOQL aggregate
    // queries expose it next to ROLLUP/CUBE; INT-pinned for both engines)
    "soql_grouping" -> ((s, dir) =>
      Extract.soqlQuery(s, dir,
        """SELECT o_orderstatus, GROUPING(o_orderstatus) g, COUNT(o_orderkey) n_orders
          |FROM Orders GROUP BY ROLLUP(o_orderstatus)
          |ORDER BY o_orderstatus NULLS FIRST, g""".stripMargin)),

    // §2.6 GROUP BY CUBE
    "soql_cube" -> ((s, dir) =>
      Tables.load(s, dir, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
        .orderBy(asc_nulls_first("o_orderstatus"), asc_nulls_first("o_orderpriority"))),

    // §2.6 date functions CALENDAR_YEAR/CALENDAR_MONTH/DAY_ONLY via the
    // SOQL front-end (renamed to year/month/to_date by graft.soql.Soql)
    "soql_date_functions" -> ((s, dir) =>
      Extract.soqlQuery(s, dir,
        """SELECT CALENDAR_YEAR(o_orderdate) AS yr, CALENDAR_MONTH(o_orderdate) AS mo,
          |       COUNT(o_orderkey) AS n, MIN(DAY_ONLY(o_orderdate)) AS first_day
          |FROM Orders
          |GROUP BY CALENDAR_YEAR(o_orderdate), CALENDAR_MONTH(o_orderdate)
          |ORDER BY yr, mo""".stripMargin)),

    // §2.6 HOUR_IN_DAY over the events stream table
    "soql_hour_in_day" -> ((s, dir) =>
      Extract.soqlQuery(s, dir,
        """SELECT HOUR_IN_DAY(ts) AS hr, COUNT(event_id) AS n
          |FROM Events GROUP BY HOUR_IN_DAY(ts) ORDER BY hr""".stripMargin)),

    // §2.6 COUNT_DISTINCT (exact — SOQL COUNT_DISTINCT is exact)
    "soql_count_distinct" -> ((s, dir) =>
      Extract.soqlQuery(s, dir,
        """SELECT o_orderstatus, COUNT_DISTINCT(o_custkey) AS n_cust,
          |       COUNT(o_orderkey) AS n_orders
          |FROM Orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)),

    // §2.6 child subselect with WHERE / ORDER BY / LIMIT — the per-parent
    // top-n shape (`(SELECT ... FROM Contacts WHERE ... ORDER BY ... LIMIT n)`).
    // (l_orderkey, l_linenumber) is NOT unique in the fixture, so the window
    // order lists quantity + extendedprice too — a total order, making the
    // row_number pick (and the oracle's) deterministic.
    "soql_child_subquery_limit" -> ((s, dir) => {
      val nested = Extract.soqlQuery(s, dir,
        """SELECT o_orderkey, o_totalprice,
          |  (SELECT l_orderkey, l_linenumber, l_quantity FROM Lineitems
          |   WHERE l_quantity >= 30
          |   ORDER BY l_linenumber DESC, l_quantity DESC, l_extendedprice DESC
          |   LIMIT 2)
          |FROM Orders WHERE o_totalprice >= 400000""".stripMargin)
      Shape.flattenRelationship(nested, "lineitems")
        .orderBy("l_orderkey", "l_linenumber", "l_quantity")
    }),

    // §2.6 bare (unquoted) ISO date literals — legal SOQL date tokens
    // (`WHERE CreatedDate > 2005-10-08`, ref salesforce_to_s3_operator.py:50).
    // Regression trap: 1995-01-01 must lex as one date token, never reach
    // the arithmetic grammar as 1995-01-01 = 1993. Comparisons get the
    // half-open day-range rewrite (dates denote the whole day).
    "soql_bare_date_range" -> ((s, dir) =>
      Extract.soqlQuery(s, dir,
        """SELECT o_orderkey, o_orderdate, o_totalprice FROM Orders
          |WHERE o_orderdate >= 1995-01-01 AND o_orderdate < 1996-07-01
          |  AND o_totalprice > 200000
          |ORDER BY o_orderkey""".stripMargin)),

    // §2.6 bare ISO datetime literals with offsets — normalized to UTC
    // TIMESTAMP literals at translate time (session tz is pinned UTC)
    "soql_bare_datetime" -> ((s, dir) =>
      Extract.soqlQuery(s, dir,
        """SELECT event_id, user_id, event_type FROM Events
          |WHERE ts >= 2024-01-10T06:30:00Z AND ts < 2024-01-10T18:30:00+02:00
          |ORDER BY event_id""".stripMargin)),

    // S3 template_fields — the reference's incremental-extract idiom: Airflow
    // renders {{ param }} into the SOQL before execution; bare datetime
    // params hit the date-literal lexer path
    "soql_incremental" -> ((s, dir) =>
      Extract.templatedSoqlQuery(s, dir,
        """SELECT event_id, user_id, event_type FROM Events
          |WHERE ts >= {{ since }} AND ts < {{ until }}
          |ORDER BY event_id""".stripMargin,
        Map("since" -> "2024-01-10T00:00:00Z", "until" -> "2024-01-12T00:00:00Z"))),

    // §2.6 Salesforce expr-numbering: unaliased aggregates in an aggregate
    // query come back labeled expr0, expr1, … — result column names
    // downstream code keys on
    "soql_expr_alias" -> ((s, dir) =>
      Extract.soqlQuery(s, dir,
        """SELECT o_orderstatus, COUNT(o_orderkey), MAX(o_totalprice)
          |FROM Orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)),

    // §2.6 bare COUNT() — the SOQL row-count idiom (`SELECT COUNT() FROM X`,
    // no field arg) → count(*)
    "soql_count_bare" -> ((s, dir) =>
      Extract.soqlQuery(s, dir,
        "SELECT COUNT() n FROM Lineitem WHERE l_quantity > 45")),

    // §2.6 three-level child-to-parent dot path — the registry chain walker
    // is depth-generic: orders → Customer → Nation → Region, one broadcast
    // dimension join per unvisited prefix
    "soql_dot_path_3" -> ((s, dir) =>
      Extract.soqlQuery(s, dir,
        """SELECT o_orderkey, Customer.Nation.Region.r_name FROM Orders
          |WHERE o_totalprice > 450000 ORDER BY o_orderkey""".stripMargin)),

    // §2.6 dot path inside GROUP BY/aggregate queries — group order rows by
    // their customer's nation (one broadcast dimension join, then the agg)
    "soql_dot_path_groupby" -> ((s, dir) =>
      Extract.soqlQuery(s, dir,
        """SELECT Customer.Nation.n_name, COUNT() n, MAX(o_totalprice) max_price
          |FROM Orders GROUP BY Customer.Nation.n_name
          |ORDER BY Customer.Nation.n_name""".stripMargin)),

    // §2.6 table alias through the parser (`FROM Customer c`, alias-qualified
    // field refs everywhere — projection, WHERE, ORDER BY)
    "soql_alias" -> ((s, dir) =>
      Extract.soqlQuery(s, dir,
        """SELECT c.c_custkey, c.c_name, c.c_acctbal FROM Customer c
          |WHERE c.c_acctbal > 9000
          |ORDER BY c.c_acctbal DESC, c.c_custkey LIMIT 100""".stripMargin)),

    // §2.6 result-preserving clause no-ops (WITH SECURITY_ENFORCED, FOR VIEW)
    // accepted without changing the row set
    "soql_clause_noops" -> ((s, dir) =>
      Extract.soqlQuery(s, dir,
        """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice FROM Lineitem
          |WHERE l_quantity >= 49 WITH SECURITY_ENFORCED
          |ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice
          |FOR VIEW""".stripMargin)),

    // §2.6 DISTANCE/GEOLOCATION geo filter → haversine over a struct-typed
    // location column. The fixture has no geo table, so one is derived
    // deterministically from nation (integer arithmetic → exact on both
    // engines); the oracle replays the identical haversine expression. Only
    // the FILTER uses the distance (output columns are exact), so the
    // cross-libm trig ulp can only matter if a distance sits within ~1e-9
    // of the threshold — verified not the case for this fixture.
    "soql_distance" -> ((s, dir) => {
      Tables.load(s, dir, "nation")
        .selectExpr("n_nationkey", "n_name",
          "named_struct('latitude',  CAST((n_nationkey * 7) % 140 - 70 + 0.5 AS DOUBLE), " +
          "'longitude', CAST((n_nationkey * 13) % 340 - 170 + 0.5 AS DOUBLE)) AS loc")
        .createOrReplaceTempView("places")
      Extract.soqlQuery(s, dir,
        """SELECT n_nationkey, n_name FROM places
          |WHERE DISTANCE(loc, GEOLOCATION(40.0, -75.0), 'km') < 9000
          |ORDER BY n_nationkey""".stripMargin)
    }),

    // §2.6 raw TYPEOF through the parser: flattened to one CASE-gated
    // column per branch field (the relational shape of Salesforce's
    // per-type record projection).
    "soql_typeof" -> ((s, dir) =>
      Extract.soqlQuery(s, dir,
        """SELECT event_id,
          |  TYPEOF event_type
          |    WHEN purchase THEN value
          |    WHEN signup THEN user_id
          |    ELSE event_type
          |  END
          |FROM Events ORDER BY event_id""".stripMargin)),

    // §2.6 TYPEOF-equivalent: CASE WHEN over a discriminator column
    "soql_typeof_case" -> ((s, dir) =>
      Tables.load(s, dir, "events")
        .select(col("event_id"),
          when(col("event_type") === "purchase", lit("revenue"))
            .when(col("event_type").isin("signup", "login"), lit("auth"))
            .otherwise(lit("other")).as("category"))
        .orderBy("event_id")),

    // N1 — relationship flattening: build the nested parent→child shape the
    // SOQL parent-to-child subquery returns (left join + collect_list(struct)
    // → ArrayType(StructType) under a `records` key), then `special_query`'s
    // inner explode (`salesforce_to_s3_operator.py:148-162`). Oracle = the
    // equivalent inner join. collect_list order nondeterminism is erased by
    // the post-explode total sort.
    "relationship_flatten" -> ((s, dir) => {
      val orders = Tables.load(s, dir, "orders")
      val li = Tables.load(s, dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
      // left join keeps childless parents; collect_list skips the null
      // child-struct so they get an empty `records` array, which the inner
      // explode then drops — exactly the reference's `if r.get(rel)` guard.
      val childStruct = when(col("l_orderkey").isNotNull,
        struct(li.columns.map(col).toIndexedSeq: _*))
      val nested = orders.join(li, col("o_orderkey") === col("l_orderkey"), "left")
        .groupBy(col("o_orderkey"))
        .agg(collect_list(childStruct).as("records"))
        .select(col("o_orderkey"), struct(col("records")).as("lineitems"))
      // (l_orderkey, l_linenumber) is not unique in the synthetic data —
      // sort on the full natural key for a total order (SURVEY.md §7.4).
      Shape.flattenRelationship(nested, "lineitems")
        .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
    }),

    // §2.6 parent-to-child nested subselect through the SOQL front-end:
    // translator rewrites the subselect to a pre-aggregated left join
    // (Soql.rewriteChildSubqueries), then the reference's special_query
    // flattening consumes the nested records (inner semantics).
    "soql_parent_child_subquery" -> ((s, dir) => {
      val nested = Extract.soqlQuery(s, dir,
        """SELECT o_orderkey, o_totalprice,
          |  (SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice FROM Lineitems)
          |FROM Orders WHERE o_totalprice >= 400000""".stripMargin)
      Shape.flattenRelationship(nested, "lineitems")
        .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
    }),

    // §2.6 child-to-parent dot path (`Account.Name`) ≡ dimension join;
    // customer is small → broadcast (no shuffle of the fact side).
    "soql_child_to_parent" -> ((s, dir) => {
      val orders = Tables.load(s, dir, "orders")
      val cust = Tables.load(s, dir, "customer").select("c_custkey", "c_name", "c_mktsegment")
      orders.join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), col("c_name"), col("c_mktsegment"), col("o_totalprice"))
        .orderBy("o_orderkey")
    }),

    // §2.6 the same dot path translated from raw SOQL text: the parser
    // resolves `Customer.*` via Soql.parentRelationships into a dimension
    // left join (Catalyst auto-broadcasts the small side).
    "soql_dot_path" -> ((s, dir) =>
      Extract.soqlQuery(s, dir,
        """SELECT o_orderkey, Customer.c_name, Customer.c_mktsegment, o_totalprice
          |FROM Orders ORDER BY o_orderkey""".stripMargin)),

    // §2.6 two-level dot path (`Customer.Nation.n_name`) → chained
    // dimension joins, one alias per path prefix.
    "soql_dot_path_nested" -> ((s, dir) =>
      Extract.soqlQuery(s, dir,
        """SELECT o_orderkey, Customer.Nation.n_name, o_totalprice
          |FROM Orders WHERE o_totalprice >= 400000 ORDER BY o_orderkey""".stripMargin)),

    // §2.6 semi-join subquery (SOQL `WHERE Id IN (SELECT ...)`) — passes
    // through the translator untouched (valid Spark SQL); Catalyst plans a
    // LeftSemi with the small side broadcast.
    "soql_semi_join" -> ((s, dir) =>
      Extract.soqlQuery(s, dir,
        """SELECT o_orderkey, o_custkey, o_totalprice FROM Orders
          |WHERE o_custkey IN (SELECT c_custkey FROM Customer WHERE c_mktsegment = 'BUILDING')
          |ORDER BY o_orderkey""".stripMargin)),

    // §2.6 anti-join subquery (`NOT IN (SELECT ...)`) — LeftAnti plan
    "soql_anti_join" -> ((s, dir) =>
      Extract.soqlQuery(s, dir,
        """SELECT o_orderkey, o_custkey FROM Orders
          |WHERE o_custkey NOT IN (SELECT c_custkey FROM Customer WHERE c_acctbal < 0)
          |ORDER BY o_orderkey""".stripMargin)),

    // big-big fact join: lineitem ⋈ orders on the order key, then aggregate —
    // the sort-merge/shuffle-join shape (both sides large; AQE may convert
    // post-shuffle). Revenue per order priority.
    "soql_fact_join" -> ((s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
      val ord = Tables.load(s, dir, "orders")
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_items"),
          revSum(col("l_extendedprice"), col("l_discount")).as("revenue"))
        .orderBy("o_orderpriority")
    }),

    // P9 + K3 — COPY column alignment + TRUNCATECOLUMNS varchar clamp
    "copy_column_align" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val sfCols = SfSchema.fetchSfColumns(Seq(
        SfField("doc_id", "xsd:int"),
        SfField("lang", "xsd:string", length = 8),
        SfField("text", "textarea", length = 100),
        SfField("source", "xsd:string", length = 16)))
      Load.alignForLoad(docs, Seq("doc_id", "lang", "text", "source"), sfCols)
        .orderBy("doc_id")
    }),

    // P7 — csv sanitization semantics on string columns
    "csv_sanitize" -> ((s, dir) =>
      Shape.sanitizeCsv(Tables.load(s, dir, "documents").select("doc_id", "text"))
        .orderBy("doc_id")),

    // S5+P2 — describe() normalization on the fixture; verified as data
    "schema_describe" -> ((s, dir) => {
      val cols = SfSchema.fetchSfColumns(leadDescribe)
      val rows = cols.zipWithIndex.map { case (c, i) =>
        (i, c.rsName, c.sfName, c.soapType, c.length, c.precision)
      }
      s.createDataFrame(rows)
        .toDF("ordinal", "rs_name", "sf_name", "soap_type", "length", "precision")
        .orderBy("ordinal")
    }),

    // D1/D3 — CREATE path (empty destination)
    "schema_reconcile_create" -> ((s, dir) => {
      val ddl = SfSchema.reconcile("sf_schema", "lead",
        SfSchema.fetchSfColumns(leadDescribe), Nil)
      s.createDataFrame(ddl.zipWithIndex.map(_.swap)).toDF("i", "ddl").orderBy("i")
    }),

    // D2/D3 — ALTER path (destination missing two columns)
    "schema_reconcile_alter" -> ((s, dir) => {
      val sfCols = SfSchema.fetchSfColumns(leadDescribe)
      val existing = sfCols.map(_.rsName).filterNot(Set("industry", "description"))
      val ddl = SfSchema.reconcile("sf_schema", "lead", sfCols, existing)
      s.createDataFrame(ddl.zipWithIndex.map(_.swap)).toDF("i", "ddl").orderBy("i")
    }),

    // N2 — ordered jsonpaths artifact
    "schema_jsonpaths" -> ((s, dir) => {
      val sfCols = SfSchema.fetchSfColumns(leadDescribe)
      val rsOrder = Seq("id", "lastname", "email", "createddate", "street")
      val content = SfSchema.jsonPathsFile(rsOrder, sfCols)
      s.createDataFrame(Seq((0, content))).toDF("i", "jsonpaths").orderBy("i")
    }),

    // K4 + S6 + D1-D3 executed end-to-end: CREATE from describe v1 → load
    // half the rows → describe grows to v2 → ALTERs run against the live
    // catalog (destination columns fetched back via spark.catalog) → load
    // the rest column-aligned → read the evolved table back. Pre-evolution
    // rows carry NULL in the added columns.
    "schema_evolution_roundtrip" -> ((s, dir) => ops.Evolution.roundtrip(s, dir))
  )

  // ---------------------------------------------------------------------
  // DuckDB oracles — same column names/types, total ORDER BY everywhere.
  // ---------------------------------------------------------------------
  private def sqlQuote(s: String): String = s.replace("'", "''")

  def oracles: Map[String, String] = {
    val sfCols = SfSchema.fetchSfColumns(leadDescribe)
    val createDdl = SfSchema.reconcile("sf_schema", "lead", sfCols, Nil)
    val alterDdl = SfSchema.reconcile("sf_schema", "lead", sfCols,
      sfCols.map(_.rsName).filterNot(Set("industry", "description")))
    val jsonPaths = SfSchema.jsonPathsFile(
      Seq("id", "lastname", "email", "createddate", "street"), sfCols)
    val describeValues = sfCols.zipWithIndex.map { case (c, i) =>
      s"($i, '${sqlQuote(c.rsName)}', '${sqlQuote(c.sfName)}', '${sqlQuote(c.soapType)}', ${c.length}, ${c.precision})"
    }.mkString(", ")

    Map(
      "extract_shape_lineitem" ->
        """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_returnflag,
          |       epoch_ms(l_shipdate) AS l_shipdate
          |FROM lineitem ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice""".stripMargin,

      "extract_pk_chunked" ->
        "SELECT o_orderkey, o_custkey, o_totalprice FROM orders ORDER BY o_orderkey",

      "fields_discovery" -> "SELECT * FROM part ORDER BY p_partkey",

      "soql_filter_project" ->
        """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
          |WHERE o_orderstatus = 'F' AND o_totalprice >= 150000
          |  AND o_orderpriority IN ('1-URGENT', '2-HIGH')
          |ORDER BY o_orderkey""".stripMargin,

      "soql_like" ->
        """SELECT p_partkey, p_name, p_brand FROM part
          |WHERE (p_name LIKE '%el%' OR p_brand LIKE '%#1%')
          |  AND NOT p_type LIKE 'SMALL%'
          |ORDER BY p_partkey""".stripMargin,

      "soql_groupby_agg" ->
        """SELECT l_returnflag, l_linestatus,
          |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
          |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
          |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
          |  min(l_quantity) AS min_qty, max(l_quantity) AS max_qty,
          |  count(*) AS count_order
          |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
          |GROUP BY l_returnflag, l_linestatus
          |ORDER BY l_returnflag, l_linestatus""".stripMargin,

      "soql_having" ->
        """SELECT o_custkey, count(*) AS n_orders,
          |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend
          |FROM orders GROUP BY o_custkey HAVING count(*) > 12
          |ORDER BY o_custkey""".stripMargin,

      "soql_orderby_limit" ->
        """SELECT o_orderkey, o_totalprice FROM orders
          |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin,

      "soql_offset" ->
        """SELECT o_orderkey, o_totalprice FROM orders
          |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10 OFFSET 5""".stripMargin,

      "soql_rollup" ->
        """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
          |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
          |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
          |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,

      "soql_cube" ->
        """SELECT o_orderstatus, o_orderpriority, count(*) AS n
          |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
          |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,

      "soql_grouping" ->
        """SELECT o_orderstatus, CAST(GROUPING(o_orderstatus) AS INT) AS g,
          |       count(o_orderkey) AS n_orders
          |FROM orders GROUP BY ROLLUP(o_orderstatus)
          |ORDER BY o_orderstatus NULLS FIRST, g""".stripMargin,

      "soql_date_functions" ->
        """SELECT CAST(year(o_orderdate) AS INT) AS yr, CAST(month(o_orderdate) AS INT) AS mo,
          |       count(o_orderkey) AS n, min(CAST(o_orderdate AS DATE)) AS first_day
          |FROM orders GROUP BY 1, 2 ORDER BY yr, mo""".stripMargin,

      "soql_hour_in_day" ->
        """SELECT CAST(hour(ts) AS INT) AS hr, count(event_id) AS n
          |FROM events GROUP BY 1 ORDER BY hr""".stripMargin,

      "soql_count_distinct" ->
        """SELECT o_orderstatus, count(DISTINCT o_custkey) AS n_cust,
          |       count(o_orderkey) AS n_orders
          |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

      "soql_child_subquery_limit" ->
        """WITH c AS (
          |  SELECT l_orderkey, l_linenumber, l_quantity,
          |         row_number() OVER (PARTITION BY l_orderkey
          |                            ORDER BY l_linenumber DESC, l_quantity DESC,
          |                                     l_extendedprice DESC, l_orderkey) AS rn
          |  FROM lineitem WHERE l_quantity >= 30)
          |SELECT c.l_orderkey, c.l_linenumber, c.l_quantity
          |FROM c JOIN orders o ON c.l_orderkey = o.o_orderkey
          |WHERE o.o_totalprice >= 400000 AND c.rn <= 2
          |ORDER BY c.l_orderkey, c.l_linenumber, c.l_quantity""".stripMargin,

      "soql_bare_date_range" ->
        """SELECT o_orderkey, o_orderdate, o_totalprice FROM orders
          |WHERE o_orderdate >= DATE '1995-01-01' AND o_orderdate < DATE '1996-07-01'
          |  AND o_totalprice > 200000
          |ORDER BY o_orderkey""".stripMargin,

      "soql_bare_datetime" ->
        """SELECT event_id, user_id, event_type FROM events
          |WHERE ts >= TIMESTAMP '2024-01-10 06:30:00' AND ts < TIMESTAMP '2024-01-10 16:30:00'
          |ORDER BY event_id""".stripMargin,

      "soql_expr_alias" ->
        """SELECT o_orderstatus, count(o_orderkey) AS expr0, max(o_totalprice) AS expr1
          |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

      "soql_incremental" ->
        """SELECT event_id, user_id, event_type FROM events
          |WHERE ts >= TIMESTAMP '2024-01-10 00:00:00' AND ts < TIMESTAMP '2024-01-12 00:00:00'
          |ORDER BY event_id""".stripMargin,

      "soql_count_bare" ->
        "SELECT count(*) AS n FROM lineitem WHERE l_quantity > 45",

      "soql_dot_path_3" ->
        """SELECT o.o_orderkey, r.r_name FROM orders o
          |JOIN customer c ON o.o_custkey = c.c_custkey
          |JOIN nation n ON c.c_nationkey = n.n_nationkey
          |JOIN region r ON n.n_regionkey = r.r_regionkey
          |WHERE o.o_totalprice > 450000 ORDER BY o.o_orderkey""".stripMargin,

      "soql_dot_path_groupby" ->
        """SELECT n.n_name, count(*) AS n, max(o.o_totalprice) AS max_price
          |FROM orders o
          |JOIN customer c ON o.o_custkey = c.c_custkey
          |JOIN nation n ON c.c_nationkey = n.n_nationkey
          |GROUP BY n.n_name ORDER BY n.n_name""".stripMargin,

      "soql_alias" ->
        """SELECT c.c_custkey, c.c_name, c.c_acctbal FROM customer c
          |WHERE c.c_acctbal > 9000
          |ORDER BY c.c_acctbal DESC, c.c_custkey LIMIT 100""".stripMargin,

      "soql_clause_noops" ->
        """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice FROM lineitem
          |WHERE l_quantity >= 49
          |ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice""".stripMargin,

      "soql_distance" ->
        """WITH places AS (SELECT n_nationkey, n_name,
          |  CAST((n_nationkey * 7) % 140 - 70 + 0.5 AS DOUBLE) AS lat,
          |  CAST((n_nationkey * 13) % 340 - 170 + 0.5 AS DOUBLE) AS lon
          |FROM nation)
          |SELECT n_nationkey, n_name FROM places
          |WHERE 2 * 6371.0087714 * ASIN(SQRT(POWER(SIN(RADIANS(40.0 - lat) / 2), 2) +
          |      COS(RADIANS(lat)) * COS(RADIANS(40.0)) * POWER(SIN(RADIANS(-75.0 - lon) / 2), 2))) < 9000
          |ORDER BY n_nationkey""".stripMargin,

      "soql_typeof" ->
        """SELECT event_id,
          |  CASE WHEN event_type = 'purchase' THEN value END AS value,
          |  CASE WHEN event_type = 'signup' THEN user_id END AS user_id,
          |  CASE WHEN event_type NOT IN ('purchase', 'signup') THEN event_type END AS event_type
          |FROM events ORDER BY event_id""".stripMargin,

      "soql_typeof_case" ->
        """SELECT event_id,
          |  CASE WHEN event_type = 'purchase' THEN 'revenue'
          |       WHEN event_type IN ('signup', 'login') THEN 'auth'
          |       ELSE 'other' END AS category
          |FROM events ORDER BY event_id""".stripMargin,

      "relationship_flatten" ->
        """SELECT l.l_orderkey, l.l_linenumber, l.l_quantity, l.l_extendedprice
          |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
          |ORDER BY l.l_orderkey, l.l_linenumber, l.l_quantity, l.l_extendedprice""".stripMargin,

      "soql_parent_child_subquery" ->
        """SELECT l.l_orderkey, l.l_linenumber, l.l_quantity, l.l_extendedprice
          |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
          |WHERE o.o_totalprice >= 400000
          |ORDER BY l.l_orderkey, l.l_linenumber, l.l_quantity, l.l_extendedprice""".stripMargin,

      "soql_child_to_parent" ->
        """SELECT o_orderkey, c_name, c_mktsegment, o_totalprice
          |FROM orders JOIN customer ON o_custkey = c_custkey
          |ORDER BY o_orderkey""".stripMargin,

      // FK integrity holds in the fixture, so the translator's LEFT JOIN
      // equals this inner join row-for-row
      "soql_dot_path" ->
        """SELECT o_orderkey, c_name, c_mktsegment, o_totalprice
          |FROM orders JOIN customer ON o_custkey = c_custkey
          |ORDER BY o_orderkey""".stripMargin,

      "soql_dot_path_nested" ->
        """SELECT o_orderkey, n_name, o_totalprice
          |FROM orders JOIN customer ON o_custkey = c_custkey
          |             JOIN nation ON c_nationkey = n_nationkey
          |WHERE o_totalprice >= 400000
          |ORDER BY o_orderkey""".stripMargin,

      "soql_semi_join" ->
        """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
          |WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
          |ORDER BY o_orderkey""".stripMargin,

      "soql_anti_join" ->
        """SELECT o_orderkey, o_custkey FROM orders
          |WHERE o_custkey NOT IN (SELECT c_custkey FROM customer WHERE c_acctbal < 0)
          |ORDER BY o_orderkey""".stripMargin,

      "soql_fact_join" ->
        """SELECT o_orderpriority, count(*) AS n_items,
          |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
          |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

      "copy_column_align" ->
        """SELECT doc_id, lang, substr(text, 1, 100) AS text, source
          |FROM documents ORDER BY doc_id""".stripMargin,

      "csv_sanitize" ->
        """SELECT doc_id, regexp_replace(text, '[\r\n]', '', 'g') AS text
          |FROM documents ORDER BY doc_id""".stripMargin,

      "schema_describe" ->
        s"""SELECT * FROM (VALUES $describeValues)
           |AS t(ordinal, rs_name, sf_name, soap_type, length, precision)
           |ORDER BY ordinal""".stripMargin,

      "schema_reconcile_create" ->
        s"SELECT 0 AS i, '${sqlQuote(createDdl.head)}' AS ddl",

      "schema_reconcile_alter" ->
        s"""SELECT * FROM (VALUES ${alterDdl.zipWithIndex
             .map { case (d, i) => s"($i, '${sqlQuote(d)}')" }.mkString(", ")})
           |AS t(i, ddl) ORDER BY i""".stripMargin,

      "schema_jsonpaths" ->
        s"SELECT 0 AS i, '${sqlQuote(jsonPaths)}' AS jsonpaths",

      // the evolved table: odd keys loaded pre-ALTER (NULL in added cols),
      // even keys post-ALTER; int soapType + varchar(25) clamp applied
      "schema_evolution_roundtrip" ->
        """SELECT CAST(s_suppkey AS INTEGER) AS s_suppkey, substr(s_name, 1, 25) AS s_name,
          |  CASE WHEN s_suppkey % 2 = 0 THEN CAST(s_nationkey AS INTEGER) END AS s_nationkey,
          |  CASE WHEN s_suppkey % 2 = 0 THEN s_acctbal END AS s_acctbal
          |FROM supplier ORDER BY s_suppkey""".stripMargin
    )
  }
}
