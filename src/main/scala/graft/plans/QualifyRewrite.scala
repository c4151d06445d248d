package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Snowflake's `QUALIFY` clause (reference dialect: the warehouse the
  * reference's SQL runs on evaluates QUALIFY after window functions —
  * FROM → WHERE → GROUP BY → HAVING → WINDOW → QUALIFY → DISTINCT →
  * ORDER BY → LIMIT) for Spark, which has no such clause. The rewrite
  * is the documented Snowflake equivalence: the predicate becomes a
  * computed boolean column of the SAME select block (so its window
  * functions evaluate exactly where QUALIFY semantics put them), the
  * block wraps as a subquery, and the outer query filters on the
  * boolean and drops it:
  *
  * {{{
  *   SELECT <list> FROM <rest> QUALIFY <pred> [ORDER …] [LIMIT …]
  *     ⇒
  *   SELECT * EXCEPT (__graft_qualify)
  *   FROM (SELECT <list>, (<pred>) AS __graft_qualify FROM <rest>) __gq
  *   WHERE __graft_qualify [ORDER …] [LIMIT …]
  * }}}
  *
  * `SELECT DISTINCT` hoists the DISTINCT to the outer block (Snowflake
  * applies DISTINCT after QUALIFY). The scan is purely lexical but
  * structure-aware: strings ('…' with '' and \' escapes, "…", `…`),
  * line and nested block comments, and parenthesis depth are tracked,
  * and only DEPTH-0 keywords count — a QUALIFY inside a subquery or a
  * string never triggers. One QUALIFY per top-level block; set
  * operators at depth 0 refuse the rewrite (per-branch QUALIFY would
  * need a real parser). The rewrite only ever runs on text Spark's own
  * parser ALREADY REJECTED, and if the rewritten text fails to parse
  * the ORIGINAL error is rethrown — a false positive can never change
  * the meaning of a working query.
  *
  * Wired twice, mirroring the engine's other dual surfaces: the
  * [[GraftSqlParser]] hook (extensions sessions get literal
  * `spark.sql("… QUALIFY …")`), and [[QualifyRewrite.sql]] for
  * extension-less sessions (the library entry the driver mains use).
  */
object QualifyRewrite {

  private val Ident = ((c: Char) =>
    c.isLetterOrDigit || c == '_' || c == '$')

  /** Depth-0 keyword occurrences (uppercased) with their [start, end)
    * spans, in text order.
    */
  private def scanKeywords(s: String): Seq[(String, Int, Int)] = {
    val hits = Seq.newBuilder[(String, Int, Int)]
    val n = s.length
    var i = 0
    var depth = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c == '-' && i + 1 < n && s.charAt(i + 1) == '-') {
        while (i < n && s.charAt(i) != '\n') i += 1
      } else if (c == '/' && i + 1 < n && s.charAt(i + 1) == '*') {
        var lvl = 1; i += 2 // Spark block comments nest
        while (i < n && lvl > 0) {
          if (s.charAt(i) == '/' && i + 1 < n && s.charAt(i + 1) == '*') {
            lvl += 1; i += 2
          } else if (s.charAt(i) == '*' && i + 1 < n &&
              s.charAt(i + 1) == '/') {
            lvl -= 1; i += 2
          } else i += 1
        }
      } else if (c == '\'' || c == '"') {
        i += 1
        var done = false
        while (i < n && !done) {
          val d = s.charAt(i)
          if (d == '\\' && i + 1 < n) i += 2
          else if (d == c && i + 1 < n && s.charAt(i + 1) == c) i += 2
          else if (d == c) { done = true; i += 1 }
          else i += 1
        }
      } else if (c == '`') {
        i += 1
        var done = false
        while (i < n && !done) {
          if (s.charAt(i) == '`' && i + 1 < n && s.charAt(i + 1) == '`')
            i += 2
          else if (s.charAt(i) == '`') { done = true; i += 1 }
          else i += 1
        }
      } else if (c == '(') { depth += 1; i += 1 }
      else if (c == ')') { depth -= 1; i += 1 }
      else if (Ident(c)) {
        val start = i
        while (i < n && Ident(s.charAt(i))) i += 1
        if (depth == 0) {
          val w = s.substring(start, i).toUpperCase(java.util.Locale.ROOT)
          w match {
            case "SELECT" | "DISTINCT" | "FROM" | "QUALIFY" | "ORDER" |
                 "LIMIT" | "OFFSET" | "UNION" | "INTERSECT" | "EXCEPT" |
                 "MINUS" =>
              hits += ((w, start, i))
            case _ =>
          }
        }
      } else i += 1
    }
    hits.result()
  }

  /** The rewritten text, or None when there is no rewritable top-level
    * QUALIFY (no QUALIFY at depth 0, no depth-0 SELECT/FROM to anchor
    * the block, or depth-0 set operators whose per-branch semantics a
    * lexical rewrite cannot honor).
    */
  def rewrite(sqlText: String): Option[String] = {
    val kw = scanKeywords(sqlText)
    val qualify = kw.find(_._1 == "QUALIFY").getOrElse(return None)
    val select = kw.find(_._1 == "SELECT").getOrElse(return None)
    if (select._2 > qualify._2) return None
    val from = kw.find(k => k._1 == "FROM" && k._2 > select._3 &&
      k._2 < qualify._2).getOrElse(return None)
    // set operators: UNION/INTERSECT/MINUS anywhere at depth 0, and
    // EXCEPT after the block's FROM (before it, EXCEPT is Spark's
    // select-list `* EXCEPT (…)` form, which composes fine)
    if (kw.exists(k => Set("UNION", "INTERSECT", "MINUS").contains(k._1) ||
        (k._1 == "EXCEPT" && k._2 > from._2))) return None
    // DISTINCT directly after SELECT hoists to the OUTER block
    // (Snowflake applies DISTINCT after QUALIFY)
    val distinct = kw.find(k => k._1 == "DISTINCT" &&
      k._2 >= select._3 &&
      sqlText.substring(select._3, k._2).trim.isEmpty)
    val tail = kw.find(k => Set("ORDER", "LIMIT", "OFFSET")
      .contains(k._1) && k._2 > qualify._3)
    val listStart = distinct.map(_._3).getOrElse(select._3)
    val selectList = sqlText.substring(listStart, from._2)
    val rest = sqlText.substring(from._2, qualify._2)
    val predEnd = tail.map(_._2).getOrElse(sqlText.length)
    val pred = sqlText.substring(qualify._3, predEnd).trim
    if (pred.isEmpty) return None
    val tailText = tail.map(t => " " + sqlText.substring(t._2)).getOrElse("")
    val prefix = sqlText.substring(0, select._2) // the WITH chain, if any
    val outerDistinct = if (distinct.isDefined) "DISTINCT " else ""
    Some(s"${prefix}SELECT $outerDistinct* EXCEPT (__graft_qualify) " +
      s"FROM (SELECT $selectList, ($pred) AS __graft_qualify " +
      s"$rest) __graft_q WHERE __graft_qualify$tailText")
  }

  /** Run `sqlText` with QUALIFY support on ANY session: Spark's own
    * parse is tried first (zero overhead and zero behavior change for
    * every query Spark accepts), the rewrite only on rejection.
    */
  def sql(spark: SparkSession, sqlText: String): DataFrame =
    try spark.sql(sqlText)
    catch {
      case e: org.apache.spark.sql.catalyst.parser.ParseException =>
        rewrite(sqlText) match {
          case Some(r) =>
            try spark.sql(r)
            catch { case _: Throwable => throw e } // original error wins
          case None => throw e
        }
    }
}
