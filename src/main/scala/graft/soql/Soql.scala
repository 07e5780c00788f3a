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
  * Front-end: a real tokenizer + recursive-descent parser (not regexes) —
  * string literals are atomic tokens (rewrites can never touch literal
  * text), parenthesis nesting is tracked by the grammar (nested functions
  * inside subselects work), and `IN (SELECT …)` vs select-list subselects
  * are distinguished structurally, not by lookbehind.
  *
  * Supported dialect surface (public Salesforce SOQL spec):
  *   - SELECT / WHERE (=, !=, <>, <, <=, >, >=, LIKE, IN, NOT IN, AND/OR/NOT)
  *   - GROUP BY [ROLLUP|CUBE] / HAVING / ORDER BY ... NULLS FIRST|LAST
  *   - LIMIT n / OFFSET n
  *   - agg fns COUNT/SUM/AVG/MIN/MAX, COUNT_DISTINCT(f) → count(DISTINCT f),
  *     COUNT() → count(*)
  *   - date fns CALENDAR_YEAR/MONTH/QUARTER, DAY_ONLY, HOUR_IN_DAY,
  *     DAY_IN_MONTH/WEEK/YEAR, WEEK_IN_YEAR
  *   - date literals TODAY/YESTERDAY/TOMORROW, LAST_N_DAYS:n / NEXT_N_DAYS:n /
  *     N_DAYS_AGO:n, THIS|LAST|NEXT_WEEK (ISO Monday weeks — Salesforce's
  *     week start is locale-dependent; documented deviation),
  *     THIS|LAST|NEXT_MONTH, THIS|LAST|NEXT_QUARTER, THIS|LAST|NEXT_YEAR,
  *     the LAST_N_/NEXT_N_ WEEKS/MONTHS/QUARTERS/YEARS:n and
  *     N_WEEKS|MONTHS|QUARTERS|YEARS_AGO:n families, and the fiscal families
  *     THIS|LAST|NEXT_FISCAL_QUARTER|YEAR + LAST_N_/NEXT_N_/`_AGO`
  *     FISCAL_QUARTERS|YEARS:n (fiscal-year start month configurable via
  *     `translate(soql, fiscalYearStartMonth)`; default January = calendar)
  *     (range-rewritten per the SOQL spec: `f = TODAY` means "within
  *     today", so it becomes a half-open range — dates and datetimes both
  *     handled)
  *   - bare (unquoted) ISO date literals `1995-01-01` and datetime literals
  *     `2005-10-08T01:02:03Z` / `…±hh:mm` — lexed atomically (never integer
  *     arithmetic); dates get the same half-open day-range rewrite in
  *     comparisons, datetimes are normalized to UTC TIMESTAMP literals
  *   - multipicklist INCLUDES/EXCLUDES → split(';') + arrays_overlap
  *   - GROUPING(f) subtotal indicator (INT-pinned), toLabel/convertCurrency
  *     as identity (single-locale/single-currency engine), WITH
  *     SECURITY_ENFORCED|USER_MODE|SYSTEM_MODE and FOR VIEW|REFERENCE|UPDATE
  *     / UPDATE TRACKING|VIEWSTAT accepted as result-preserving no-ops;
  *     USING SCOPE is rejected loudly (needs a user context — ignoring it
  *     would silently change the row set)
  *   - parent-to-child nested subselect in the SELECT list → pre-aggregated
  *     left join (one shuffle per side, no correlated execution)
  *   - child-to-parent dot paths (`Customer.c_name`,
  *     `Customer.Nation.n_name`) → dimension joins via [[parentRelationships]]
  *
  *   - TYPEOF discriminated projection — flattened to one output column per
  *     branch field, gated by CASE on the discriminator (the test schema has
  *     no polymorphic lookup field, so the TYPEOF subject is the string
  *     discriminator column itself; THEN lists may contain dot paths, which
  *     join through [[parentRelationships]])
  *
  *   - table aliases (`FROM Contact c` — `c.field` strips the qualifier)
  *   - DISTANCE(loc, GEOLOCATION(lat, lon), 'mi'|'km') → haversine over the
  *     struct-typed location column (latitude/longitude fields)
  *
  * NOT supported (documented): USING SCOPE (requires a user context;
  * rejected loudly rather than silently changing the row set); ALL ROWS
  * (the `query_all` path — asks for Recycle-Bin deleted / archived rows,
  * and the engine's snapshot tables carry no IsDeleted/archive data, so
  * honoring it is impossible and ignoring it would misrepresent the
  * result as recycle-bin-inclusive; rejected loudly).
  */
object Soql {

  // ------------------------------------------------------------------
  // Relationship metadata (the engine analogue of describe()'s
  // childRelationships / lookup fields)
  // ------------------------------------------------------------------

  /** Parent-to-child relationship metadata for the test schema (relationship
    * name → child object + join keys). */
  final case class Relationship(childTable: String, parentKey: String, childKey: String)
  val relationships: Map[(String, String), Relationship] = Map(
    ("orders", "lineitems")   -> Relationship("lineitem", "o_orderkey", "l_orderkey"),
    ("customer", "orders")    -> Relationship("orders", "c_custkey", "o_custkey"),
    ("nation", "customers")   -> Relationship("customer", "n_nationkey", "c_nationkey"),
    ("nation", "suppliers")   -> Relationship("supplier", "n_nationkey", "s_nationkey"),
    ("region", "nations")     -> Relationship("nation", "r_regionkey", "n_regionkey"),
    ("part", "lineitems")     -> Relationship("lineitem", "p_partkey", "l_partkey"),
    ("supplier", "lineitems") -> Relationship("lineitem", "s_suppkey", "l_suppkey"))

  /** Child-to-parent (lookup) metadata for dot paths: (child table,
    * relationship name) → parent table + join keys. */
  final case class ParentRel(parentTable: String, childKey: String, parentKey: String)
  val parentRelationships: Map[(String, String), ParentRel] = Map(
    ("orders", "customer")   -> ParentRel("customer", "o_custkey", "c_custkey"),
    ("lineitem", "orders")   -> ParentRel("orders", "l_orderkey", "o_orderkey"),
    ("lineitem", "part")     -> ParentRel("part", "l_partkey", "p_partkey"),
    ("lineitem", "supplier") -> ParentRel("supplier", "l_suppkey", "s_suppkey"),
    ("customer", "nation")   -> ParentRel("nation", "c_nationkey", "n_nationkey"),
    ("supplier", "nation")   -> ParentRel("nation", "s_nationkey", "n_nationkey"),
    ("nation", "region")     -> ParentRel("region", "n_regionkey", "r_regionkey"))

  private val fnRenames: Map[String, String] = Map(
    "CALENDAR_YEAR" -> "year",
    "CALENDAR_MONTH" -> "month",
    "CALENDAR_QUARTER" -> "quarter",
    "DAY_ONLY" -> "to_date",
    "HOUR_IN_DAY" -> "hour",
    "DAY_IN_MONTH" -> "day",
    "DAY_IN_WEEK" -> "dayofweek",
    "DAY_IN_YEAR" -> "dayofyear",
    "WEEK_IN_YEAR" -> "weekofyear")

  /** Translate a SOQL string to Spark SQL text.
    *
    * @param fiscalYearStartMonth month (1-12) the org's fiscal year starts
    *   in — drives the `*_FISCAL_*` date-literal families (Salesforce reads
    *   this from company settings; default January = calendar-aligned).
    */
  def translate(soql: String, fiscalYearStartMonth: Int = 1): String = {
    require(fiscalYearStartMonth >= 1 && fiscalYearStartMonth <= 12,
      s"fiscalYearStartMonth must be 1-12, got $fiscalYearStartMonth")
    new Parser(Lexer.tokenize(soql), fiscalYearStartMonth - 1).parseQuery(top = true).emit
  }

  /** Normalize a bare SOQL datetime literal to a UTC `yyyy-MM-dd HH:mm:ss[.ffffff]`
    * string (session timezone is pinned to UTC across the engine, so a naive
    * Spark/DuckDB TIMESTAMP literal in UTC is exact). A missing offset is
    * treated as UTC (Salesforce requires an offset; we accept the omission). */
  private[soql] def normalizeDateTime(raw: String): String = {
    val withZone =
      if (raw.endsWith("Z") || raw.matches(""".*[+-]\d{2}:\d{2}$""")) raw else raw + "Z"
    val utc = java.time.OffsetDateTime.parse(withZone)
      .withOffsetSameInstant(java.time.ZoneOffset.UTC).toLocalDateTime
    val base = f"${utc.getYear}%04d-${utc.getMonthValue}%02d-${utc.getDayOfMonth}%02d " +
      f"${utc.getHour}%02d:${utc.getMinute}%02d:${utc.getSecond}%02d"
    if (utc.getNano == 0) base else f"$base.${utc.getNano / 1000}%06d"
  }

  // ------------------------------------------------------------------
  // Tokenizer
  // ------------------------------------------------------------------

  private[soql] sealed trait Tok
  private[soql] final case class TIdent(s: String) extends Tok
  private[soql] final case class TNum(s: String) extends Tok
  /** String literal, quotes included; SOQL \' already normalized to SQL ''. */
  private[soql] final case class TStr(s: String) extends Tok
  /** Bare ISO date literal (`1995-01-01`) — SOQL dates are UNQUOTED
    * (`WHERE CreatedDate > 2005-10-08` is legal dialect; the reference ships
    * such strings verbatim — salesforce_to_s3_operator.py:50,195-199).
    * Lexed as one atomic token so it can never fall into the arithmetic
    * grammar as `1995 - 01 - 01`. */
  private[soql] final case class TDate(s: String) extends Tok
  /** Bare ISO datetime literal (`2005-10-08T01:02:03Z` / `…+01:00`). */
  private[soql] final case class TDateTime(s: String) extends Tok
  private[soql] final case class TOp(s: String) extends Tok
  private[soql] case object TEnd extends Tok

  private[soql] object Lexer {
    /** Anchored ISO shape: date, optionally `THH:MM:SS[.f][Z|±hh:mm]`.
      * Group 1 non-null ⇒ datetime. */
    private val IsoPat = java.util.regex.Pattern.compile(
      """\d{4}-\d{2}-\d{2}(T\d{2}:\d{2}:\d{2}(\.\d+)?(Z|[+-]\d{2}:\d{2})?)?""")

    def tokenize(s: String): Vector[Tok] = {
      val out = Vector.newBuilder[Tok]
      var i = 0
      while (i < s.length) {
        val c = s.charAt(i)
        if (c.isWhitespace) i += 1
        else if (c == '\'') {
          val sb = new StringBuilder("'")
          i += 1
          var closed = false
          while (i < s.length && !closed) {
            val d = s.charAt(i)
            if (d == '\\' && i + 1 < s.length && s.charAt(i + 1) == '\'') {
              sb.append("''"); i += 2 // SOQL \' → SQL ''
            } else if (d == '\'' && i + 1 < s.length && s.charAt(i + 1) == '\'') {
              sb.append("''"); i += 2 // already-doubled quote stays
            } else if (d == '\'') {
              sb.append('\''); i += 1; closed = true
            } else { sb.append(d); i += 1 }
          }
          require(closed, s"unterminated string literal in SOQL: $s")
          out += TStr(sb.toString)
        } else if (c.isLetter || c == '_') {
          val start = i
          while (i < s.length && (s.charAt(i).isLetterOrDigit || s.charAt(i) == '_')) i += 1
          out += TIdent(s.substring(start, i))
        } else if (c.isDigit) {
          val m = IsoPat.matcher(s)
          m.region(i, s.length)
          // date/datetime first — `1995-01-01` must never reach the
          // arithmetic grammar (it would silently compute 1993)
          val isoEnd =
            if (m.lookingAt() &&
                (m.end == s.length || !s.charAt(m.end).isLetterOrDigit)) m.end
            else -1
          if (isoEnd > 0) {
            val text = s.substring(i, isoEnd)
            out += (if (m.group(1) != null) TDateTime(text) else TDate(text))
            i = isoEnd
          } else {
            val start = i
            while (i < s.length && s.charAt(i).isDigit) i += 1
            if (i < s.length && s.charAt(i) == '.' && i + 1 < s.length && s.charAt(i + 1).isDigit) {
              i += 1
              while (i < s.length && s.charAt(i).isDigit) i += 1
            }
            out += TNum(s.substring(start, i))
          }
        } else {
          val two = if (i + 1 < s.length) s.substring(i, i + 2) else ""
          if (two == ">=" || two == "<=" || two == "!=" || two == "<>") {
            out += TOp(two); i += 2
          } else {
            require("()=<>,.:*+-/%".indexOf(c) >= 0, s"unexpected character '$c' in SOQL: $s")
            out += TOp(c.toString); i += 1
          }
        }
      }
      out += TEnd
      out.result()
    }
  }

  // ------------------------------------------------------------------
  // AST
  // ------------------------------------------------------------------

  /** Resolution context accumulated while emitting one query level: child
    * subselect joins and dot-path parent joins. */
  private final class Ctx(val fromTable: String, val tableAlias: Option[String] = None) {
    val childJoins = new StringBuilder
    var childIx = 0
    /** Parent WHERE (base-table columns only) — child subselects semi-join
      * against it to prune their pre-aggregation. */
    var parentFilter: Option[String] = None
    /** path prefix (lowercased, dot-joined) → join alias */
    val parentAliases = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val parentJoins = new StringBuilder

    /** Resolve a multi-segment dot path to a joined column reference,
      * registering LEFT JOINs for each unvisited prefix. */
    def resolvePath(path: Seq[String]): String = {
      // `Orders.o_orderkey` / `o.o_orderkey` (declared table alias) —
      // a base-table qualifier is just the column
      val head = path.head.toLowerCase
      val segs =
        if (path.length > 1 && (head == fromTable || tableAlias.contains(head))) path.tail
        else path
      if (segs.length == 1) return segs.head
      var curTable = fromTable
      var curAlias = "" // empty = base table (unqualified keys)
      val prefix = new StringBuilder
      for (seg <- segs.dropRight(1)) {
        val rel = parentRelationships.getOrElse((curTable, seg.toLowerCase),
          throw new IllegalArgumentException(
            s"unknown parent relationship $seg under $curTable -- register it in Soql.parentRelationships"))
        if (prefix.nonEmpty) prefix.append('.')
        prefix.append(seg.toLowerCase)
        val key = prefix.toString
        val alias = parentAliases.getOrElseUpdate(key, {
          val a = s"__p${parentAliases.size}"
          val childRef = if (curAlias.isEmpty) rel.childKey else s"$curAlias.${rel.childKey}"
          parentJoins.append(s" LEFT JOIN ${rel.parentTable} $a ON $childRef = $a.${rel.parentKey}")
          a
        })
        curTable = rel.parentTable
        curAlias = alias
      }
      s"$curAlias.${segs.last}"
    }
  }

  private sealed trait Expr { def emit(ctx: Ctx): String }
  private final case class Path(segs: Seq[String]) extends Expr {
    def emit(ctx: Ctx): String = ctx.resolvePath(segs)
  }
  private final case class Lit(text: String) extends Expr {
    def emit(ctx: Ctx): String = text
  }
  private case object Star extends Expr { def emit(ctx: Ctx): String = "*" }
  private final case class Func(name: String, distinct: Boolean, args: Seq[Expr]) extends Expr {
    def emit(ctx: Ctx): String = {
      val n = fnRenames.getOrElse(name.toUpperCase, name)
      if (distinct) s"count(DISTINCT ${args.map(_.emit(ctx)).mkString(", ")})"
      else if (args.isEmpty && name.equalsIgnoreCase("COUNT")) "count(*)"
      // SOQL GROUPING(f) (ROLLUP/CUBE subtotal indicator) — Spark's
      // grouping() returns TINYINT; pin INT for a stable cross-engine type
      else if (name.equalsIgnoreCase("GROUPING"))
        s"CAST(grouping(${args.map(_.emit(ctx)).mkString(", ")}) AS INT)"
      // toLabel = translation-workbench label (single-locale engine),
      // convertCurrency = org currency conversion (single-currency engine):
      // both are the identity here — documented deviations
      else if (name.equalsIgnoreCase("TOLABEL") || name.equalsIgnoreCase("CONVERTCURRENCY"))
        args.head.emit(ctx)
      // DISTANCE(locField, GEOLOCATION(lat, lon), 'mi'|'km') → haversine
      // over the struct's latitude/longitude (the Spark shape of the
      // compound geolocation field). Great-circle on the mean Earth radius.
      else if (name.equalsIgnoreCase("DISTANCE")) {
        val loc = args(0).emit(ctx)
        val (lat2, lon2) = args(1) match {
          case Func(g, _, gargs) if g.equalsIgnoreCase("GEOLOCATION") =>
            (gargs(0).emit(ctx), gargs(1).emit(ctx))
          case other => // location-to-location form
            (s"${other.emit(ctx)}.latitude", s"${other.emit(ctx)}.longitude")
        }
        val unit = args(2).emit(ctx).replace("'", "").toLowerCase
        val r = unit match {
          case "km" => "6371.0087714"
          case "mi" => "3958.7558657441"
          case u    => throw new IllegalArgumentException(s"DISTANCE unit must be 'mi' or 'km', got '$u'")
        }
        val (lat1, lon1) = (s"$loc.latitude", s"$loc.longitude")
        s"2 * $r * ASIN(SQRT(POWER(SIN(RADIANS($lat2 - $lat1) / 2), 2) + " +
          s"COS(RADIANS($lat1)) * COS(RADIANS($lat2)) * POWER(SIN(RADIANS($lon2 - $lon1) / 2), 2)))"
      }
      else s"$n(${args.map(_.emit(ctx)).mkString(", ")})"
    }
  }
  private final case class Arith(op: String, l: Expr, r: Expr) extends Expr {
    def emit(ctx: Ctx): String = s"${l.emit(ctx)} $op ${r.emit(ctx)}"
  }
  private final case class ParenE(e: Expr) extends Expr {
    def emit(ctx: Ctx): String = s"(${e.emit(ctx)})"
  }
  private final case class And(l: Expr, r: Expr) extends Expr {
    def emit(ctx: Ctx): String = s"${l.emit(ctx)} AND ${r.emit(ctx)}"
  }
  private final case class Or(l: Expr, r: Expr) extends Expr {
    def emit(ctx: Ctx): String = s"${l.emit(ctx)} OR ${r.emit(ctx)}"
  }
  private final case class NotE(e: Expr) extends Expr {
    def emit(ctx: Ctx): String = s"NOT ${e.emit(ctx)}"
  }
  private final case class Cmp(l: Expr, op: String, r: Expr) extends Expr {
    def emit(ctx: Ctx): String = s"${l.emit(ctx)} $op ${r.emit(ctx)}"
  }
  /** `field OP <date literal>` — rewritten to a half-open day range. */
  private final case class DateCmp(l: Expr, op: String, lo: String, hiExcl: String) extends Expr {
    def emit(ctx: Ctx): String = {
      val f = l.emit(ctx)
      op match {
        case "="         => s"($f >= $lo AND $f < $hiExcl)"
        case "!=" | "<>" => s"($f < $lo OR $f >= $hiExcl)"
        case ">"         => s"$f >= $hiExcl"
        case ">="        => s"$f >= $lo"
        case "<"         => s"$f < $lo"
        case "<="        => s"$f < $hiExcl"
      }
    }
  }
  private final case class Like(l: Expr, negated: Boolean, pattern: Expr) extends Expr {
    def emit(ctx: Ctx): String =
      s"${l.emit(ctx)} ${if (negated) "NOT LIKE" else "LIKE"} ${pattern.emit(ctx)}"
  }
  private final case class InList(l: Expr, negated: Boolean, items: Seq[Expr]) extends Expr {
    def emit(ctx: Ctx): String =
      s"${l.emit(ctx)} ${if (negated) "NOT IN" else "IN"} (${items.map(_.emit(ctx)).mkString(", ")})"
  }
  private final case class InSubquery(l: Expr, negated: Boolean, sub: Query) extends Expr {
    def emit(ctx: Ctx): String =
      s"${l.emit(ctx)} ${if (negated) "NOT IN" else "IN"} (${sub.emit})"
  }
  /** multipicklist INCLUDES/EXCLUDES — true when the semicolon-separated
    * field shares a value with any listed entry. */
  private final case class Includes(l: Expr, negated: Boolean, items: Seq[Expr]) extends Expr {
    def emit(ctx: Ctx): String = {
      val neg = if (negated) "NOT " else ""
      s"${neg}arrays_overlap(split(${l.emit(ctx)}, ';'), array(${items.map(_.emit(ctx)).mkString(", ")}))"
    }
  }
  /** SOQL parent-to-child nested subselect in the SELECT list:
    * `SELECT p1, (SELECT c1, c2 FROM Children) FROM Parent ...` becomes a
    * left join against a pre-aggregated child relation producing the
    * reference's nested `{relationship: {records: [...]}}` shape
    * (`special_query`, salesforce_to_s3_operator.py:155-160) as an
    * ArrayType(StructType) under `.records`, ready for
    * [[graft.ops.Shape.flattenRelationship]]. Parents without children get a
    * NULL struct, which the inner-semantics explode then drops — the
    * reference's `if r.get(relationship)` guard (line 158).
    * Scale: the child side pre-aggregates per key and joins — one shuffle
    * each side, no row explosion, no correlated per-parent execution. */
  /** Child subselect body: columns plus the optional WHERE / ORDER BY /
    * LIMIT SOQL allows inside `(SELECT … FROM Children …)`.
    *
    *  - WHERE filters the child relation before pre-aggregation;
    *  - LIMIT n keeps the first n children PER PARENT via a
    *    `row_number() OVER (PARTITION BY childKey ORDER BY …)` window
    *    (the given ORDER BY; the child key appended as a final tiebreak so
    *    the window order is at least as deterministic as Salesforce's);
    *  - ORDER BY without LIMIT is accepted, but the ORDER of records inside
    *    the nested array is unspecified (`collect_list` is
    *    arrival-ordered; Shape.flattenRelationship consumers re-sort) —
    *    matching the documented nondeterminism of the reference's row
    *    iteration, and it still drives the LIMIT window. */
  private final case class ChildSub(cols: Seq[Expr], relName: String,
                                    where: Option[Expr], order: Seq[OrderItem],
                                    limit: Option[String]) extends Expr {
    def emit(ctx: Ctx): String = {
      val rel = relationships.getOrElse((ctx.fromTable, relName),
        throw new IllegalArgumentException(
          s"unknown relationship $relName under ${ctx.fromTable} -- register it in Soql.relationships"))
      val i = ctx.childIx
      ctx.childIx += 1
      val childCtx = new Ctx(rel.childTable)
      val colSql = cols.map(_.emit(childCtx)).mkString(", ")
      // semi-join-prune against the parent's own filter: groups for parents
      // the outer WHERE discards would be collected only to be dropped by
      // the join — Catalyst plans this as a LeftSemi before the pre-agg
      val pruned = ctx.parentFilter.map(f =>
        s"${rel.childKey} IN (SELECT ${rel.parentKey} FROM ${ctx.fromTable} WHERE $f)")
      val conds = where.map(_.emit(childCtx)).toSeq ++ pruned
      val whereSql = if (conds.isEmpty) "" else conds.mkString(" WHERE ", " AND ", "")
      val sub = limit match {
        case Some(n) =>
          val ord = (order.map(_.emit(childCtx)) :+ rel.childKey).mkString(", ")
          s"(SELECT ${rel.childKey} AS __jk$i, collect_list(struct($colSql)) AS __records" +
          s" FROM (SELECT *, row_number() OVER (PARTITION BY ${rel.childKey} ORDER BY $ord) AS __rn$i" +
          s" FROM ${rel.childTable}${childCtx.parentJoins}$whereSql)" +
          s" WHERE __rn$i <= $n GROUP BY __jk$i) __rel$i"
        case None =>
          s"(SELECT ${rel.childKey} AS __jk$i, collect_list(struct($colSql)) AS __records" +
          s" FROM ${rel.childTable}${childCtx.parentJoins}$whereSql GROUP BY ${rel.childKey}) __rel$i"
      }
      ctx.childJoins.append(s" LEFT JOIN $sub ON ${rel.parentKey} = __rel$i.__jk$i")
      s"named_struct('records', __rel$i.__records) AS $relName"
    }
  }

  /** SOQL `TYPEOF disc WHEN Type THEN f1, f2 … ELSE g1 END` — Salesforce
    * shapes each record by its branch; the relational flattening is the
    * union of branch fields as columns, each NULL unless its branch's type
    * matched (ELSE fields: unless ANY listed type matched). A field named
    * in several branches merges into one multi-arm CASE column. */
  private final case class TypeofBranch(typeName: String, fields: Seq[Path])
  private final case class Typeof(disc: Path, branches: Seq[TypeofBranch],
                                  elseFields: Seq[Path]) extends Expr {
    def emit(ctx: Ctx): String = {
      val d = disc.emit(ctx)
      val allTypes = branches.map(b => s"'${b.typeName}'").mkString(", ")
      val arms = scala.collection.mutable.LinkedHashMap
        .empty[String, scala.collection.mutable.ArrayBuffer[(String, String)]]
      for (b <- branches; f <- b.fields)
        arms.getOrElseUpdate(f.segs.last.toLowerCase, scala.collection.mutable.ArrayBuffer()) +=
          (s"$d = '${b.typeName}'" -> f.emit(ctx))
      // ELSE covers any record not matching a listed type — including a NULL
      // discriminator (bare NOT IN is NULL for NULL, which would drop them)
      for (f <- elseFields)
        arms.getOrElseUpdate(f.segs.last.toLowerCase, scala.collection.mutable.ArrayBuffer()) +=
          (s"($d IS NULL OR $d NOT IN ($allTypes))" -> f.emit(ctx))
      arms.map { case (leaf, cs) =>
        "CASE " + cs.map { case (c, e) => s"WHEN $c THEN $e" }.mkString(" ") + s" END AS $leaf"
      }.mkString(", ")
    }
  }

  private final case class SelectItem(expr: Expr, alias: Option[String]) {
    def emit(ctx: Ctx): String =
      alias.map(a => s"${expr.emit(ctx)} AS $a").getOrElse(expr.emit(ctx))
  }
  private final case class OrderItem(expr: Expr, dir: Option[String], nulls: Option[String]) {
    def emit(ctx: Ctx): String =
      (Seq(expr.emit(ctx)) ++ dir ++ nulls.map("NULLS " + _)).mkString(" ")
  }
  private final case class GroupBy(kind: Option[String], exprs: Seq[Expr]) {
    def emit(ctx: Ctx): String = kind match {
      case Some(k) => s"GROUP BY $k (${exprs.map(_.emit(ctx)).mkString(", ")})"
      case None    => s"GROUP BY ${exprs.map(_.emit(ctx)).mkString(", ")}"
    }
  }

  private final case class Query(
      select: Seq[SelectItem], from: String, fromAlias: Option[String],
      where: Option[Expr],
      groupBy: Option[GroupBy], having: Option[Expr],
      orderBy: Seq[OrderItem], limit: Option[String], offset: Option[String]) {
    def emit: String = {
      val ctx = new Ctx(from, fromAlias)
      // emit WHERE before the SELECT items: when the parent filter touches
      // only base-table columns (no dot-path join aliases), child subselects
      // can semi-join-prune their pre-aggregation with it — at scale the
      // collect_list otherwise aggregates EVERY parent's children only for
      // the join to drop the filtered-out groups
      val whereStr = where.map(_.emit(ctx))
      if (whereStr.exists(w => !w.contains("__p")))
        ctx.parentFilter = whereStr
      // SELECT items next: child subselects register their joins in order
      val sel = select.map(_.emit(ctx)).mkString(", ")
      val whereSql = whereStr.map(" WHERE " + _).getOrElse("")
      val groupSql = groupBy.map(" " + _.emit(ctx)).getOrElse("")
      val havingSql = having.map(" HAVING " + _.emit(ctx)).getOrElse("")
      val orderSql =
        if (orderBy.isEmpty) "" else " ORDER BY " + orderBy.map(_.emit(ctx)).mkString(", ")
      val limitSql = limit.map(" LIMIT " + _).getOrElse("")
      val offsetSql = offset.map(" OFFSET " + _).getOrElse("")
      s"SELECT $sel FROM $from${ctx.childJoins}${ctx.parentJoins}" +
        whereSql + groupSql + havingSql + orderSql + limitSql + offsetSql
    }
  }

  // ------------------------------------------------------------------
  // Parser (recursive descent)
  // ------------------------------------------------------------------

  private val keywords = Set("SELECT", "FROM", "WHERE", "AND", "OR", "NOT", "IN",
    "LIKE", "INCLUDES", "EXCLUDES", "GROUP", "BY", "HAVING", "ORDER", "LIMIT",
    "OFFSET", "AS", "ASC", "DESC", "NULLS", "FIRST", "LAST", "ROLLUP", "CUBE",
    "TYPEOF", "WHEN", "THEN", "ELSE", "END")

  /** Families that REQUIRE a `:n` argument — a bare `LAST_N_DAYS` would
    * otherwise silently compile with n=0 (an empty range returning 0 rows
    * with no diagnostic). */
  private val parameterizedDateLiterals = Set(
    "LAST_N_DAYS", "NEXT_N_DAYS", "N_DAYS_AGO",
    "LAST_N_WEEKS", "NEXT_N_WEEKS", "LAST_N_MONTHS", "NEXT_N_MONTHS",
    "LAST_N_QUARTERS", "NEXT_N_QUARTERS", "LAST_N_YEARS", "NEXT_N_YEARS",
    "N_WEEKS_AGO", "N_MONTHS_AGO", "N_QUARTERS_AGO", "N_YEARS_AGO",
    "LAST_N_FISCAL_QUARTERS", "NEXT_N_FISCAL_QUARTERS", "N_FISCAL_QUARTERS_AGO",
    "LAST_N_FISCAL_YEARS", "NEXT_N_FISCAL_YEARS", "N_FISCAL_YEARS_AGO")

  /** Date literal → (lo, hiExcl) half-open day range; `n` for the :n forms;
    * `k` = fiscal-year start month offset (startMonth - 1, 0 = calendar). */
  private def dateRange(name: String, n: => String, k: Int = 0): Option[(String, String)] = {
    // Fiscal period start containing today: shift back k months so fiscal
    // boundaries land on calendar boundaries, trunc, shift forward again.
    // k=0 folds to the plain calendar trunc (same SQL, constant-folded).
    def fStart(unit: String): String =
      if (k == 0) s"trunc(current_date(), '$unit')"
      else s"add_months(trunc(add_months(current_date(), -$k), '$unit'), $k)"
    def fy = fStart("YYYY")
    def fq = fStart("QUARTER")
    name.toUpperCase match {
      // ---- fiscal families (Salesforce: org-configurable FY start) ----
      case "THIS_FISCAL_YEAR"    => Some((fy, s"add_months($fy, 12)"))
      case "LAST_FISCAL_YEAR"    => Some((s"add_months($fy, -12)", fy))
      case "NEXT_FISCAL_YEAR"    => Some((s"add_months($fy, 12)", s"add_months($fy, 24)"))
      case "LAST_N_FISCAL_YEARS" => Some((s"add_months($fy, -${n.toInt * 12})", fy))
      case "NEXT_N_FISCAL_YEARS" => Some((s"add_months($fy, 12)", s"add_months($fy, ${(n.toInt + 1) * 12})"))
      case "N_FISCAL_YEARS_AGO"  => Some((s"add_months($fy, -${n.toInt * 12})", s"add_months($fy, -${(n.toInt - 1) * 12})"))
      case "THIS_FISCAL_QUARTER"    => Some((fq, s"add_months($fq, 3)"))
      case "LAST_FISCAL_QUARTER"    => Some((s"add_months($fq, -3)", fq))
      case "NEXT_FISCAL_QUARTER"    => Some((s"add_months($fq, 3)", s"add_months($fq, 6)"))
      case "LAST_N_FISCAL_QUARTERS" => Some((s"add_months($fq, -${n.toInt * 3})", fq))
      case "NEXT_N_FISCAL_QUARTERS" => Some((s"add_months($fq, 3)", s"add_months($fq, ${(n.toInt + 1) * 3})"))
      case "N_FISCAL_QUARTERS_AGO"  => Some((s"add_months($fq, -${n.toInt * 3})", s"add_months($fq, -${(n.toInt - 1) * 3})"))
      // ---- exactly-one-period-ago calendar family ----
      case "N_WEEKS_AGO"    => Some((s"date_sub(trunc(current_date(), 'WEEK'), ${n.toInt * 7})",
                                     s"date_sub(trunc(current_date(), 'WEEK'), ${(n.toInt - 1) * 7})"))
      case "N_MONTHS_AGO"   => Some((s"add_months(trunc(current_date(), 'MM'), -$n)",
                                     s"add_months(trunc(current_date(), 'MM'), -${n.toInt - 1})"))
      case "N_QUARTERS_AGO" => Some((s"add_months(trunc(current_date(), 'QUARTER'), -${n.toInt * 3})",
                                     s"add_months(trunc(current_date(), 'QUARTER'), -${(n.toInt - 1) * 3})"))
      case "N_YEARS_AGO"    => Some((s"add_months(trunc(current_date(), 'YYYY'), -${n.toInt * 12})",
                                     s"add_months(trunc(current_date(), 'YYYY'), -${(n.toInt - 1) * 12})"))
      case _ => calendarRange(name, n)
    }
  }

  private def calendarRange(name: String, n: => String): Option[(String, String)] =
    name.toUpperCase match {
      case "TODAY"        => Some(("current_date()", "date_add(current_date(), 1)"))
      case "YESTERDAY"    => Some(("date_sub(current_date(), 1)", "current_date()"))
      case "TOMORROW"     => Some(("date_add(current_date(), 1)", "date_add(current_date(), 2)"))
      // LAST_N_DAYS:n — starts midnight n days ago, ends end of *yesterday*
      case "LAST_N_DAYS"  => Some((s"date_sub(current_date(), $n)", "current_date()"))
      case "LAST_90_DAYS" => Some(("date_sub(current_date(), 90)", "current_date()"))
      case "NEXT_90_DAYS" => Some(("date_add(current_date(), 1)", "date_add(current_date(), 91)"))
      // NEXT_N_DAYS:n — starts tomorrow, ends n days from today (inclusive)
      case "NEXT_N_DAYS"  => Some(("date_add(current_date(), 1)", s"date_add(current_date(), ${n.toInt + 1})"))
      // N_DAYS_AGO:n — exactly the day n days before today
      case "N_DAYS_AGO"   => Some((s"date_sub(current_date(), $n)", s"date_sub(current_date(), ${n.toInt - 1})"))
      case "THIS_MONTH"   => Some(("trunc(current_date(), 'MM')", "add_months(trunc(current_date(), 'MM'), 1)"))
      case "LAST_MONTH"   => Some(("add_months(trunc(current_date(), 'MM'), -1)", "trunc(current_date(), 'MM')"))
      case "NEXT_MONTH"   => Some(("add_months(trunc(current_date(), 'MM'), 1)", "add_months(trunc(current_date(), 'MM'), 2)"))
      case "LAST_N_MONTHS" => Some((s"add_months(trunc(current_date(), 'MM'), -$n)", "trunc(current_date(), 'MM')"))
      case "NEXT_N_MONTHS" => Some(("add_months(trunc(current_date(), 'MM'), 1)", s"add_months(trunc(current_date(), 'MM'), ${n.toInt + 1})"))
      // weeks are ISO (Monday-start) — Salesforce's week start is
      // locale-dependent; documented deviation, same week length
      case "THIS_WEEK"    => Some(("trunc(current_date(), 'WEEK')", "date_add(trunc(current_date(), 'WEEK'), 7)"))
      case "LAST_WEEK"    => Some(("date_sub(trunc(current_date(), 'WEEK'), 7)", "trunc(current_date(), 'WEEK')"))
      case "NEXT_WEEK"    => Some(("date_add(trunc(current_date(), 'WEEK'), 7)", "date_add(trunc(current_date(), 'WEEK'), 14)"))
      case "LAST_N_WEEKS" => Some((s"date_sub(trunc(current_date(), 'WEEK'), ${n.toInt * 7})", "trunc(current_date(), 'WEEK')"))
      case "NEXT_N_WEEKS" => Some(("date_add(trunc(current_date(), 'WEEK'), 7)", s"date_add(trunc(current_date(), 'WEEK'), ${(n.toInt + 1) * 7})"))
      case "THIS_QUARTER" => Some(("trunc(current_date(), 'QUARTER')", "add_months(trunc(current_date(), 'QUARTER'), 3)"))
      case "LAST_QUARTER" => Some(("add_months(trunc(current_date(), 'QUARTER'), -3)", "trunc(current_date(), 'QUARTER')"))
      case "NEXT_QUARTER" => Some(("add_months(trunc(current_date(), 'QUARTER'), 3)", "add_months(trunc(current_date(), 'QUARTER'), 6)"))
      case "LAST_N_QUARTERS" => Some((s"add_months(trunc(current_date(), 'QUARTER'), -${n.toInt * 3})", "trunc(current_date(), 'QUARTER')"))
      case "NEXT_N_QUARTERS" => Some(("add_months(trunc(current_date(), 'QUARTER'), 3)", s"add_months(trunc(current_date(), 'QUARTER'), ${(n.toInt + 1) * 3})"))
      case "THIS_YEAR"    => Some(("trunc(current_date(), 'YYYY')", "add_months(trunc(current_date(), 'YYYY'), 12)"))
      case "LAST_YEAR"    => Some(("add_months(trunc(current_date(), 'YYYY'), -12)", "trunc(current_date(), 'YYYY')"))
      case "NEXT_YEAR"    => Some(("add_months(trunc(current_date(), 'YYYY'), 12)", "add_months(trunc(current_date(), 'YYYY'), 24)"))
      case "LAST_N_YEARS" => Some((s"add_months(trunc(current_date(), 'YYYY'), -${n.toInt * 12})", "trunc(current_date(), 'YYYY')"))
      case "NEXT_N_YEARS" => Some(("add_months(trunc(current_date(), 'YYYY'), 12)", s"add_months(trunc(current_date(), 'YYYY'), ${(n.toInt + 1) * 12})"))
      case _              => None
    }

  private final class Parser(toks: Vector[Tok], fiscalK: Int = 0) {
    private var pos = 0
    private def peek: Tok = toks(pos)
    private def peekAt(k: Int): Tok = toks(math.min(pos + k, toks.length - 1))
    private def next(): Tok = { val t = toks(pos); pos += 1; t }
    private def isKw(t: Tok, kw: String): Boolean = t match {
      case TIdent(s) => s.equalsIgnoreCase(kw)
      case _         => false
    }
    private def acceptKw(kw: String): Boolean =
      if (isKw(peek, kw)) { pos += 1; true } else false
    private def expectKw(kw: String): Unit =
      require(acceptKw(kw), s"expected $kw at token $pos, found $peek")
    private def acceptOp(op: String): Boolean = peek match {
      case TOp(s) if s == op => pos += 1; true
      case _                 => false
    }
    private def expectOp(op: String): Unit =
      require(acceptOp(op), s"expected '$op' at token $pos, found $peek")
    private def expectIdent(): String = next() match {
      case TIdent(s) => s
      case t         => throw new IllegalArgumentException(s"expected identifier, found $t")
    }
    private def expectNum(): String = next() match {
      case TNum(s) => s
      case t       => throw new IllegalArgumentException(s"expected number, found $t")
    }

    /** Aggregate function names whose unaliased select items Salesforce
      * auto-labels `expr0, expr1, …` in aggregate queries — result column
      * names downstream code keys on. */
    private val aggFns = Set("COUNT", "COUNT_DISTINCT", "SUM", "AVG", "MIN", "MAX", "GROUPING")

    /** Salesforce expr-numbering: in a query with any aggregate context
      * (GROUP BY, or an aggregate function anywhere in the projection),
      * every unaliased function-call select item is labeled `expr{n}`,
      * numbered sequentially over the unaliased ones only. Plain field
      * items keep their names; explicitly-aliased items are untouched. */
    private def exprNumber(items: Seq[SelectItem], grouped: Boolean): Seq[SelectItem] = {
      val isAggQuery = grouped || items.exists {
        case SelectItem(Func(n, _, _), _) => aggFns.contains(n.toUpperCase)
        case _ => false
      }
      if (!isAggQuery) return items
      var n = -1
      items.map {
        case SelectItem(f: Func, None) =>
          n += 1; SelectItem(f, Some(s"expr$n"))
        case si => si
      }
    }

    def parseQuery(top: Boolean): Query = {
      expectKw("SELECT")
      val items = scala.collection.mutable.ArrayBuffer.empty[SelectItem]
      items += parseSelectItem()
      while (acceptOp(",")) items += parseSelectItem()
      expectKw("FROM")
      // Salesforce object names are case-insensitive and the Bulk operator
      // title-cases them (salesforce_to_s3_operator.py:44); views are lowercase
      val from = expectIdent().toLowerCase
      // optional SOQL table alias (`FROM Contact c`): any identifier that
      // is not a clause keyword; references through it strip the qualifier
      val fromAlias = peek match {
        case TIdent(a) if !keywords.contains(a.toUpperCase) &&
            !Set("USING", "WITH", "FOR", "UPDATE", "ALL").contains(a.toUpperCase) =>
          next(); Some(a.toLowerCase)
        case _ => None
      }
      // USING SCOPE filters rows by org/user context (mine, team, …) —
      // there is no user context in the engine, so silently ignoring it
      // would return the WRONG row set. Reject loudly.
      if (acceptKw("USING"))
        throw new IllegalArgumentException(
          "USING SCOPE requires a Salesforce user context and is unsupported; " +
          "express the scope as a WHERE predicate instead")
      val where = if (acceptKw("WHERE")) Some(parseOr()) else None
      // WITH SECURITY_ENFORCED / USER_MODE / SYSTEM_MODE govern field-level
      // security ERRORS, not the result relation — accepted and ignored
      // (the engine always behaves like SYSTEM_MODE; documented deviation)
      while (acceptKw("WITH")) {
        val mode = expectIdent().toUpperCase
        // WITH DATA CATEGORY filters knowledge articles by category data the
        // engine does not have — ignoring it would change the row set, so
        // reject loudly (same policy as USING SCOPE)
        require(mode != "DATA",
          "WITH DATA CATEGORY requires knowledge-article category data and is unsupported; " +
            "remove the clause or pre-filter the category column explicitly")
        require(Set("SECURITY_ENFORCED", "USER_MODE", "SYSTEM_MODE").contains(mode),
          s"unknown WITH clause: $mode")
      }
      var groupBy: Option[GroupBy] = None
      if (isKw(peek, "GROUP")) {
        next(); expectKw("BY")
        val kind = if (acceptKw("ROLLUP")) Some("ROLLUP")
                   else if (acceptKw("CUBE")) Some("CUBE") else None
        val exprs = scala.collection.mutable.ArrayBuffer.empty[Expr]
        if (kind.isDefined) {
          expectOp("(")
          exprs += parseValue()
          while (acceptOp(",")) exprs += parseValue()
          expectOp(")")
        } else {
          exprs += parseValue()
          while (acceptOp(",")) exprs += parseValue()
        }
        groupBy = Some(GroupBy(kind, exprs.toSeq))
      }
      val having = if (acceptKw("HAVING")) Some(parseOr()) else None
      val orderBy = scala.collection.mutable.ArrayBuffer.empty[OrderItem]
      if (isKw(peek, "ORDER")) {
        next(); expectKw("BY")
        orderBy += parseOrderItem()
        while (acceptOp(",")) orderBy += parseOrderItem()
      }
      val limit = if (acceptKw("LIMIT")) Some(expectNum()) else None
      val offset = if (acceptKw("OFFSET")) Some(expectNum()) else None
      // ALL ROWS is `query_all`'s grammar form: include Recycle-Bin
      // deleted and archived (Task/Event) rows. The engine's snapshot
      // tables hold no IsDeleted/archive data, so the requested extra
      // rows cannot be produced; a silent no-op would misrepresent the
      // result as recycle-bin-inclusive. Reject loudly (the USING SCOPE
      // / WITH DATA CATEGORY policy).
      if (acceptKw("ALL")) {
        expectKw("ROWS")
        throw new IllegalArgumentException(
          "ALL ROWS requires Recycle-Bin / archive (IsDeleted) data the engine's " +
          "snapshot tables do not carry; remove the clause — the snapshot already " +
          "holds every non-deleted row")
      }
      // row-lock / UI-telemetry suffixes: no effect on the result relation
      if (acceptKw("FOR")) {
        val k = expectIdent().toUpperCase
        require(Set("VIEW", "REFERENCE", "UPDATE").contains(k), s"unknown FOR clause: $k")
      } else if (acceptKw("UPDATE")) {
        val k = expectIdent().toUpperCase
        require(Set("TRACKING", "VIEWSTAT").contains(k), s"unknown UPDATE clause: $k")
      }
      if (top) peek match {
        case TEnd => ()
        case t    => throw new IllegalArgumentException(s"unexpected trailing token $t")
      }
      Query(exprNumber(items.toSeq, groupBy.isDefined), from, fromAlias,
        where, groupBy, having, orderBy.toSeq, limit, offset)
    }

    private def parseSelectItem(): SelectItem = {
      if (isKw(peek, "TYPEOF")) return SelectItem(parseTypeof(), None)
      // select-list subselect: '(' SELECT cols FROM Relationship ')'
      if (peek == TOp("(") && isKw(peekAt(1), "SELECT")) {
        next(); next()
        val cols = scala.collection.mutable.ArrayBuffer.empty[Expr]
        cols += parseValue()
        while (acceptOp(",")) cols += parseValue()
        expectKw("FROM")
        val rel = expectIdent().toLowerCase
        val where = if (acceptKw("WHERE")) Some(parseOr()) else None
        val order = scala.collection.mutable.ArrayBuffer.empty[OrderItem]
        if (isKw(peek, "ORDER")) {
          next(); expectKw("BY")
          order += parseOrderItem()
          while (acceptOp(",")) order += parseOrderItem()
        }
        val limit = if (acceptKw("LIMIT")) Some(expectNum()) else None
        expectOp(")")
        return SelectItem(ChildSub(cols.toSeq, rel, where, order.toSeq, limit), None)
      }
      val e = parseValue()
      val alias = peek match {
        case TIdent(s) if s.equalsIgnoreCase("AS") =>
          next(); Some(expectIdent())
        case TIdent(s) if !keywords.contains(s.toUpperCase) =>
          next(); Some(s)
        case _ => None
      }
      SelectItem(e, alias)
    }

    /** `TYPEOF disc (WHEN Type THEN path[, path…])+ (ELSE path[, path…])? END` */
    private def parseTypeof(): Typeof = {
      expectKw("TYPEOF")
      val disc = parsePath()
      val branches = scala.collection.mutable.ArrayBuffer.empty[TypeofBranch]
      while (isKw(peek, "WHEN")) {
        next()
        val t = expectIdent()
        expectKw("THEN")
        branches += TypeofBranch(t, parsePathList())
      }
      require(branches.nonEmpty, "TYPEOF requires at least one WHEN branch")
      val elseFields = if (acceptKw("ELSE")) parsePathList() else Nil
      expectKw("END")
      Typeof(disc, branches.toSeq, elseFields)
    }

    private def parsePath(): Path = {
      val segs = scala.collection.mutable.ArrayBuffer(expectIdent())
      while (peek == TOp(".")) { next(); segs += expectIdent() }
      Path(segs.toSeq)
    }

    private def parsePathList(): Seq[Path] = {
      val fields = scala.collection.mutable.ArrayBuffer(parsePath())
      while (acceptOp(",")) fields += parsePath()
      fields.toSeq
    }

    private def parseOrderItem(): OrderItem = {
      val e = parseValue()
      val dir = if (acceptKw("ASC")) Some("ASC")
                else if (acceptKw("DESC")) Some("DESC") else None
      val nulls = if (acceptKw("NULLS")) {
        if (acceptKw("FIRST")) Some("FIRST") else { expectKw("LAST"); Some("LAST") }
      } else None
      OrderItem(e, dir, nulls)
    }

    // ---- boolean grammar: OR > AND > NOT > condition ----
    private def parseOr(): Expr = {
      var l = parseAnd()
      while (acceptKw("OR")) l = Or(l, parseAnd())
      l
    }
    private def parseAnd(): Expr = {
      var l = parseNot()
      while (acceptKw("AND")) l = And(l, parseNot())
      l
    }
    private def parseNot(): Expr =
      if (acceptKw("NOT")) NotE(parseNot()) else parseCond()

    /** Boolean node vs value node — seen through any depth of grouping
      * parens (`((NOT a = 1 AND b = 2))` parses to ParenE(ParenE(And))). */
    private def isBooleanNode(e: Expr): Boolean = e match {
      case _: Cmp | _: DateCmp | _: Like | _: InList | _: InSubquery |
           _: Includes | _: And | _: Or | _: NotE => true
      case ParenE(inner) => isBooleanNode(inner)
      case _ => false
    }

    /** One condition: a parenthesized boolean, or operand + predicate rest. */
    private def parseCond(): Expr = {
      if (peek == TOp("(")) {
        // lookahead: boolean group vs parenthesized value expression — parse
        // as boolean (the value grammar handles arithmetic parens itself)
        val save = pos
        next()
        val inner = parseOr()
        expectOp(")")
        if (isBooleanNode(inner)) return ParenE(inner)
        pos = save // plain value in parens: re-parse as operand
      }
      val l = parseValue()
      peek match {
        case TOp(op) if Set("=", "!=", "<>", "<", "<=", ">", ">=").contains(op) =>
          next()
          (peek, peekAt(1)) match {
            // date literal with :n argument
            case (TIdent(name), TOp(":")) if dateRange(name, "1", fiscalK).isDefined =>
              next(); next()
              val n = expectNum()
              val (lo, hi) = dateRange(name, n, fiscalK).get
              DateCmp(l, op, lo, hi)
            case (TIdent(name), _) if dateRange(name, "1", fiscalK).isDefined =>
              require(!parameterizedDateLiterals.contains(name.toUpperCase),
                s"date literal $name requires an argument: $name:n")
              next()
              val (lo, hi) = dateRange(name, "1", fiscalK).get
              DateCmp(l, op, lo, hi)
            // Bare ISO date: SOQL date literals denote the whole day, so a
            // comparison against a datetime field is the same half-open
            // rewrite as the named literals (`f = 1995-01-01` ⇒ within that
            // day). For pure DATE fields the rewrite is equivalent to the
            // exact compare (a date truncates to itself), so one rule covers
            // both field types with no schema lookup.
            case (TDate(d), _) =>
              next()
              val hi = java.time.LocalDate.parse(d).plusDays(1).toString
              DateCmp(l, op, s"DATE '$d'", s"DATE '$hi'")
            case (TDateTime(dt), _) =>
              next()
              Cmp(l, op, Lit(s"TIMESTAMP '${normalizeDateTime(dt)}'"))
            case _ => Cmp(l, op, parseValue())
          }
        case t if isKw(t, "LIKE") =>
          next(); Like(l, negated = false, parseValue())
        case t if isKw(t, "NOT") && isKw(peekAt(1), "LIKE") =>
          next(); next(); Like(l, negated = true, parseValue())
        case t if isKw(t, "NOT") && isKw(peekAt(1), "IN") =>
          next(); next(); parseInRest(l, negated = true)
        case t if isKw(t, "IN") =>
          next(); parseInRest(l, negated = false)
        case t if isKw(t, "INCLUDES") =>
          next(); Includes(l, negated = false, parseLiteralList())
        case t if isKw(t, "EXCLUDES") =>
          next(); Includes(l, negated = true, parseLiteralList())
        case _ => l // bare boolean field/expression
      }
    }

    private def parseInRest(l: Expr, negated: Boolean): Expr = {
      expectOp("(")
      if (isKw(peek, "SELECT")) {
        val sub = parseQuery(top = false)
        expectOp(")")
        InSubquery(l, negated, sub)
      } else {
        val items = scala.collection.mutable.ArrayBuffer.empty[Expr]
        items += parseValue()
        while (acceptOp(",")) items += parseValue()
        expectOp(")")
        InList(l, negated, items.toSeq)
      }
    }

    private def parseLiteralList(): Seq[Expr] = {
      expectOp("(")
      val items = scala.collection.mutable.ArrayBuffer.empty[Expr]
      items += parseValue()
      while (acceptOp(",")) items += parseValue()
      expectOp(")")
      items.toSeq
    }

    // ---- value grammar: additive > multiplicative > factor ----
    private def parseValue(): Expr = {
      var l = parseTerm()
      while (peek == TOp("+") || peek == TOp("-")) {
        val op = next().asInstanceOf[TOp].s
        l = Arith(op, l, parseTerm())
      }
      l
    }
    private def parseTerm(): Expr = {
      var l = parseFactor()
      while (peek == TOp("*") || peek == TOp("/") || peek == TOp("%")) {
        val op = next().asInstanceOf[TOp].s
        l = Arith(op, l, parseFactor())
      }
      l
    }

    private def parseFactor(): Expr = next() match {
      case TNum(n)      => Lit(n)
      case TStr(s)      => Lit(s)
      // in value position (IN lists, select items): plain typed literals —
      // midnight-exact, no day-range semantics outside comparisons
      case TDate(d)     => Lit(s"DATE '$d'")
      case TDateTime(dt) => Lit(s"TIMESTAMP '${normalizeDateTime(dt)}'")
      case TOp("*") => Star
      case TOp("-") => Arith("-", Lit("0"), parseFactor()) // unary minus
      case TOp("(") =>
        val e = parseValue()
        expectOp(")")
        ParenE(e)
      case TIdent(name) if name.equalsIgnoreCase("TYPEOF") =>
        throw new IllegalArgumentException(
          "TYPEOF is only valid as a top-level SELECT list item")
      case TIdent(name) if peek == TOp("(") =>
        next()
        // FIELDS(ALL|STANDARD|CUSTOM) → * (no custom-field tier in the schema)
        if (name.equalsIgnoreCase("FIELDS")) {
          val tier = expectIdent()
          require(Set("ALL", "STANDARD", "CUSTOM").contains(tier.toUpperCase),
            s"unknown FIELDS tier $tier")
          expectOp(")")
          Star
        } else if (name.equalsIgnoreCase("COUNT_DISTINCT")) {
          val args = parseArgs()
          Func("count", distinct = true, args)
        } else {
          Func(name, distinct = false, parseArgs())
        }
      case TIdent(name) =>
        val segs = scala.collection.mutable.ArrayBuffer(name)
        while (peek == TOp(".")) { next(); segs += expectIdent() }
        Path(segs.toSeq)
      case t => throw new IllegalArgumentException(s"unexpected token $t in expression")
    }

    private def parseArgs(): Seq[Expr] = {
      if (acceptOp(")")) return Nil
      val args = scala.collection.mutable.ArrayBuffer.empty[Expr]
      args += parseValue()
      while (acceptOp(",")) args += parseValue()
      expectOp(")")
      args.toSeq
    }
  }
}
