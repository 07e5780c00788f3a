package graft.soql

/** SOQL → Spark SQL translation (SURVEY.md §2.6, §7.2 phase 5).
  *
  * The reference accepts arbitrary SOQL strings as operator parameters
  * (`soql` — `/root/reference/operators/salesforce_to_s3_operator.py:18,29,50`;
  * `query` — `:91-95,127,195-199`) and ships them to Salesforce for
  * server-side execution. Here the equivalent relational surface is planned
  * by Catalyst: we translate the SOQL dialect's divergences into Spark SQL
  * text and let `spark.sql` do the rest (parse → analyze → optimize →
  * physical, with pushdown for free).
  *
  * Supported dialect surface (public Salesforce SOQL spec):
  *   - SELECT / WHERE (=, !=, <>, <, <=, >, >=, LIKE, IN, NOT IN, AND/OR/NOT)
  *   - GROUP BY [ROLLUP|CUBE] / HAVING / ORDER BY ... NULLS FIRST|LAST
  *   - LIMIT n / OFFSET n
  *   - agg fns COUNT/SUM/AVG/MIN/MAX, COUNT_DISTINCT(f) → count(DISTINCT f)
  *   - date fns CALENDAR_YEAR/MONTH/QUARTER, DAY_ONLY, HOUR_IN_DAY,
  *     DAY_IN_MONTH/WEEK/YEAR, WEEK_IN_YEAR
  *   - date literals TODAY/YESTERDAY/TOMORROW, LAST_N_DAYS:n / NEXT_N_DAYS:n,
  *     THIS_MONTH/LAST_MONTH/THIS_YEAR/LAST_YEAR (range-rewritten per the
  *     SOQL spec: `f = TODAY` means "within today", so it becomes a
  *     half-open range — dates and datetimes both handled)
  *   - multipicklist INCLUDES/EXCLUDES → split(';') + arrays_overlap
  *
  * NOT supported (documented): TYPEOF (polymorphic fields — no analogue in
  * the test schema), parent-to-child nested subselects in the SELECT list
  * (use `graft.ops.Shape.flattenRelationship` / a join + collect_list —
  * SURVEY.md §2.3), WITH / USING SCOPE / FOR VIEW|UPDATE (CRM-specific).
  */
object Soql {

  private val fnRenames: Seq[(String, String)] = Seq(
    "CALENDAR_YEAR" -> "year",
    "CALENDAR_MONTH" -> "month",
    "CALENDAR_QUARTER" -> "quarter",
    "DAY_ONLY" -> "to_date",
    "HOUR_IN_DAY" -> "hour",
    "DAY_IN_MONTH" -> "day",
    "DAY_IN_WEEK" -> "dayofweek",
    "DAY_IN_YEAR" -> "dayofyear",
    "WEEK_IN_YEAR" -> "weekofyear"
  )

  def translate(soql: String): String = {
    require(!soql.toUpperCase.contains("TYPEOF"),
      "SOQL TYPEOF is not supported; use CASE WHEN over a discriminator column")
    // Mask quoted string literals with placeholders so rewrites never touch
    // literal text, yet patterns spanning literals (e.g. INCLUDES ('a','b'))
    // still match across the whole statement.
    val segments = splitQuoted(soql)
    val lits = scala.collection.mutable.ArrayBuffer.empty[String]
    val masked = segments.map {
      case Left(code) => code
      case Right(lit) => lits += lit; s"${lits.size - 1}"
    }.mkString
    val rewritten = rewrite(rewriteChildSubqueries(masked))
    "(\\d+)".r.replaceAllIn(rewritten, m =>
      java.util.regex.Matcher.quoteReplacement(lits(m.group(1).toInt)))
  }

  /** Parent-to-child relationship metadata for the test schema -- the engine
    * analogue of Salesforce's childRelationships in describe() (relationship
    * name -> child object + join keys). */
  final case class Relationship(childTable: String, parentKey: String, childKey: String)
  val relationships: Map[(String, String), Relationship] = Map(
    ("orders", "lineitems")   -> Relationship("lineitem", "o_orderkey", "l_orderkey"),
    ("customer", "orders")    -> Relationship("orders", "c_custkey", "o_custkey"),
    ("nation", "customers")   -> Relationship("customer", "n_nationkey", "c_nationkey"),
    ("nation", "suppliers")   -> Relationship("supplier", "n_nationkey", "s_nationkey"),
    ("region", "nations")     -> Relationship("nation", "r_regionkey", "n_regionkey"),
    ("part", "lineitems")     -> Relationship("lineitem", "p_partkey", "l_partkey"),
    ("supplier", "lineitems") -> Relationship("lineitem", "s_suppkey", "l_suppkey"))

  /** SOQL parent-to-child nested subselect:
    * `SELECT p1, (SELECT c1, c2 FROM Children) FROM Parent ...`
    * becomes a left join against a pre-aggregated child relation producing
    * the reference's nested `{relationship: {records: [...]}}` shape
    * (`special_query`, salesforce_to_s3_operator.py:155-160) as an
    * ArrayType(StructType) under `.records`, ready for
    * [[graft.ops.Shape.flattenRelationship]]. Parents without children get a
    * NULL struct, which the inner-semantics explode then drops -- the
    * reference's `if r.get(relationship)` guard (line 158).
    * Scale: the child side pre-aggregates per key and joins -- one shuffle
    * each side, no row explosion, no correlated per-parent execution. */
  private def rewriteChildSubqueries(code0: String): String = {
    val sub = "(?is)\\(\\s*SELECT\\s+([^()]*?)\\s+FROM\\s+([A-Za-z_][A-Za-z0-9_]*)\\s*\\)".r
    // SOQL semi/anti-join subqueries (`WHERE f IN (SELECT ...)`) are valid
    // Spark SQL as-is -- only rewrite subselects in the SELECT list, i.e.
    // those NOT preceded by IN.
    def isInSubquery(m: scala.util.matching.Regex.Match): Boolean =
      "(?is).*\\bIN\\s*$".r.matches(code0.substring(0, m.start))
    val found = sub.findAllMatchIn(code0).toList.filterNot(isInSubquery)
    if (found.isEmpty) return code0
    // outer FROM = first FROM once subselects are blanked out
    val stripped = sub.replaceAllIn(code0, "@SUB@")
    val parent = "(?i)\\bFROM\\s+([A-Za-z_][A-Za-z0-9_]*)".r
      .findFirstMatchIn(stripped)
      .map(_.group(1).toLowerCase)
      .getOrElse(throw new IllegalArgumentException(s"no outer FROM in: $code0"))
    var code = code0
    val joins = new StringBuilder
    found.zipWithIndex.foreach { case (m, i) =>
      val cols = m.group(1).trim
      val relName = m.group(2).toLowerCase
      val rel = relationships.getOrElse((parent, relName),
        throw new IllegalArgumentException(
          s"unknown relationship $relName under $parent -- register it in Soql.relationships"))
      code = code.replace(m.matched,
        s"named_struct('records', __rel$i.__records) AS $relName")
      joins.append(
        s" LEFT JOIN (SELECT ${rel.childKey} AS __jk$i, collect_list(struct($cols)) AS __records" +
        s" FROM ${rel.childTable} GROUP BY ${rel.childKey}) __rel$i" +
        s" ON ${rel.parentKey} = __rel$i.__jk$i")
    }
    // splice the joins right after the outer `FROM <table>`
    val outerFrom = "(?i)\\bFROM\\s+[A-Za-z_][A-Za-z0-9_]*".r
    val fromText = outerFrom.findFirstIn(code).get
    val idx = code.indexOf(fromText) + fromText.length
    code.substring(0, idx) + joins.toString + code.substring(idx)
  }

  /** Left = code to rewrite, Right = quoted literal (verbatim, incl quotes) */
  private def splitQuoted(s: String): Seq[Either[String, String]] = {
    val res = scala.collection.mutable.ArrayBuffer.empty[Either[String, String]]
    val cur = new StringBuilder
    var inStr = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (!inStr && c == '\'') {
        if (cur.nonEmpty) { res += Left(cur.toString); cur.clear() }
        inStr = true; cur.append(c)
      } else if (inStr && c == '\'') {
        // SOQL escapes quotes with backslash, SQL with doubling; handle both
        if (i + 1 < s.length && s.charAt(i + 1) == '\'') {
          cur.append("''"); i += 1
        } else {
          cur.append(c); res += Right(cur.toString); cur.clear(); inStr = false
        }
      } else if (inStr && c == '\\' && i + 1 < s.length && s.charAt(i + 1) == '\'') {
        cur.append("''"); i += 1 // SOQL \' → SQL ''
      } else cur.append(c)
      i += 1
    }
    if (cur.nonEmpty) res += (if (inStr) Right(cur.toString) else Left(cur.toString))
    res.toSeq
  }

  private def rewrite(code0: String): String = {
    var code = code0

    // FIELDS(ALL|STANDARD|CUSTOM) → * (the test schema has no custom-field
    // tier split; all fields are "standard")
    code = code.replaceAll("(?i)\\bFIELDS\\s*\\(\\s*(ALL|STANDARD|CUSTOM)\\s*\\)", "*")

    // COUNT_DISTINCT(f) → count(DISTINCT f)
    code = code.replaceAll("(?i)\\bCOUNT_DISTINCT\\s*\\(", "count(DISTINCT ")

    // date function renames
    for ((soqlFn, sparkFn) <- fnRenames)
      code = code.replaceAll(s"(?i)\\b$soqlFn\\s*\\(", s"$sparkFn(")

    // date literals in comparisons: `field OP LITERAL`
    val cmp = "(=|!=|<>|>=|<=|>|<)"
    val ident = "([A-Za-z_][A-Za-z0-9_.]*)"
    def dayRange(lo: String, hiExcl: String, f: String, op: String): String = op match {
      case "="          => s"($f >= $lo AND $f < $hiExcl)"
      case "!=" | "<>"  => s"($f < $lo OR $f >= $hiExcl)"
      case ">"          => s"$f >= $hiExcl"
      case ">="         => s"$f >= $lo"
      case "<"          => s"$f < $lo"
      case "<="         => s"$f < $hiExcl"
    }
    def replaceLit(pattern: String, lo: String => String, hi: String => String): Unit = {
      val r = s"(?i)$ident\\s*$cmp\\s*$pattern".r
      code = r.replaceAllIn(code, m => {
        val f = m.group(1); val op = m.group(2)
        val n = if (m.groupCount >= 3 && m.group(3) != null) m.group(3) else ""
        java.util.regex.Matcher.quoteReplacement(dayRange(lo(n), hi(n), f, op))
      })
    }
    replaceLit("\\bTODAY\\b", _ => "current_date()", _ => "date_add(current_date(), 1)")
    replaceLit("\\bYESTERDAY\\b", _ => "date_sub(current_date(), 1)", _ => "current_date()")
    replaceLit("\\bTOMORROW\\b", _ => "date_add(current_date(), 1)", _ => "date_add(current_date(), 2)")
    // LAST_N_DAYS:n — starts midnight n days ago, ends end of *yesterday*
    replaceLit("\\bLAST_N_DAYS\\s*:\\s*(\\d+)", n => s"date_sub(current_date(), $n)", _ => "current_date()")
    replaceLit("\\bLAST_90_DAYS\\b", _ => "date_sub(current_date(), 90)", _ => "current_date()")
    replaceLit("\\bNEXT_90_DAYS\\b", _ => "date_add(current_date(), 1)", _ => "date_add(current_date(), 91)")
    // NEXT_N_DAYS:n — starts tomorrow, ends n days from today (inclusive)
    replaceLit("\\bNEXT_N_DAYS\\s*:\\s*(\\d+)", _ => "date_add(current_date(), 1)", n => s"date_add(current_date(), ${n.toInt + 1})")
    replaceLit("\\bTHIS_MONTH\\b",
      _ => "trunc(current_date(), 'MM')", _ => "add_months(trunc(current_date(), 'MM'), 1)")
    replaceLit("\\bLAST_MONTH\\b",
      _ => "add_months(trunc(current_date(), 'MM'), -1)", _ => "trunc(current_date(), 'MM')")
    replaceLit("\\bTHIS_YEAR\\b",
      _ => "trunc(current_date(), 'YYYY')", _ => "add_months(trunc(current_date(), 'YYYY'), 12)")
    replaceLit("\\bLAST_YEAR\\b",
      _ => "add_months(trunc(current_date(), 'YYYY'), -12)", _ => "trunc(current_date(), 'YYYY')")

    // multipicklist INCLUDES / EXCLUDES ('a;b', 'c') — true when the
    // semicolon-separated field shares a value with any listed entry
    val inc = s"(?i)$ident\\s+(INCLUDES|EXCLUDES)\\s*\\(([^)]*)\\)".r
    code = inc.replaceAllIn(code, m => {
      val f = m.group(1)
      val neg = if (m.group(2).equalsIgnoreCase("EXCLUDES")) "NOT " else ""
      val items = m.group(3)
      java.util.regex.Matcher.quoteReplacement(
        s"${neg}arrays_overlap(split($f, ';'), array($items))")
    })

    // normalize FROM <Object> — Salesforce object names are case-insensitive
    // and the Bulk operator title-cases them (`salesforce_to_s3_operator
    // .py:44`); our temp views are lowercase.
    val fromR = "(?i)(\\bFROM\\s+)([A-Za-z_][A-Za-z0-9_]*)".r
    code = fromR.replaceAllIn(code, m =>
      java.util.regex.Matcher.quoteReplacement(m.group(1) + m.group(2).toLowerCase))

    code
  }
}
