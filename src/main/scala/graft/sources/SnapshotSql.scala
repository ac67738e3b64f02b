package graft.sources

import org.apache.spark.sql.DataFrame

/** Minimal SQL front-end for the snapshot store — the r15 verdict's
  * scope decision (#8) made EXPLICIT and in-scope: the table format's
  * time travel and maintenance operations get the SQL spellings
  * Delta/Iceberg users reach for, without pretending to be a full
  * DSv2 catalog.
  *
  * Surface (everything else in the submitted text passes through to
  * `spark.sql` verbatim):
  *
  *   - `SELECT ... FROM <table> [FOR] VERSION AS OF <n> ...` —
  *     time-traveled read (the Spark 3.3+/Delta spelling; Iceberg's
  *     `FOR` prefix accepted). Any snapshot table named after
  *     FROM/JOIN resolves against the store; non-store names (temp
  *     views, catalog tables) pass through untouched.
  *   - `... FROM <table> [FOR] TAG AS OF '<name>' ...` — read at a
  *     named tag ([[SnapshotStore.readTagged]]).
  *   - `... FROM <table> [FOR] TIMESTAMP AS OF '<yyyy-mm-dd hh:mm:ss>'`
  *     — wall-clock time travel ([[SnapshotStore.versionAsOfTimestamp]]:
  *     the newest live version committed at or before the instant).
  *   - plain `FROM <table>` — the current version.
  *   - `FROM <group>.<sub>` — one sub-table of a multi-table group
  *     ([[SnapshotStore.readTableVersion]]); composes with every
  *     AS OF clause; the unaliased reference resolves under the SUB
  *     name.
  *   - `FROM CHANGES(<table>, <from>, <to>)` — the row-level
  *     changelog as a composable relation (Delta's table_changes TVF
  *     shape; r17): [[SnapshotStore.changesBetween]], or
  *     [[SnapshotStore.changesBetweenTable]] for `<group>.<sub>`;
  *     `_change` / `_commit_v` columns included, full SELECT grammar
  *     around it. Each bound is an integer version, a `'tag'`, or a
  *     `'timestamp'` (r18 — tag-first resolution, so "what changed
  *     between releases" is one SQL query).
  *   - `DELETE FROM <t> WHERE <p>` / `UPDATE <t> SET c = e[, ...]
  *     WHERE <p>` — statement sugar over the predicate CoW mutations
  *     (r18): clause spans recovered from the masked match, so
  *     keywords inside literals never split them; `<group>.<sub>`
  *     routes to the per-sub mutation. Returns the same status frame
  *     as the CALL spellings.
  *   - `DESCRIBE HISTORY <table>` — [[SnapshotStore.history]].
  *   - `CALL <proc>(...)` — maintenance procedures (the Iceberg CALL
  *     shape): expire_versions, expire_by_policy, vacuum,
  *     vacuum_dry_run, optimize_small_files, optimize_clustering,
  *     tag, delete_tag, add_check, drop_check, clone, publish,
  *     merge_from_table, delete_where, update_where (r17 — the
  *     predicate CoW mutations [[SnapshotStore.commitDeleteWhere]] /
  *     [[SnapshotStore.commitUpdateWhere]] as Iceberg-shaped
  *     procedures), rollback, compact_keyed, compact_delete_keys
  *     (r17), drop_table, rename_table, changes. Arguments are
  *     positional or NAMED (`arg => value`, the Iceberg shape, r17) —
  *     named calls reorder against the procedure signature and may
  *     omit trailing optionals; gaps/unknown names/mixing refuse.
  *
  * Scope honestly declared: SELECT over snapshots, CALL procedures,
  * and the two row-level mutation statements above (r18 — the
  * recorded scope decision: `DELETE FROM`/`UPDATE ... SET ... WHERE`
  * are token-level sugar over the CALLs; MERGE INTO and ALTER TABLE
  * grammar stay out of scope — a writable DSv2 catalog remains the
  * recorded non-goal (COVERAGE.md), and `merge_from_table` is the
  * merge spelling). The rewriter is a token-level pass, not a parser:
  * it replaces exactly `FROM|JOIN <ident> [VERSION|TAG AS OF …]`
  * where `<ident>` names a store table, and leaves every other
  * character of the query to Spark's own parser, so the full Spark
  * SQL language (CTEs, window functions, lateral views) keeps working
  * around it.
  *
  * Execution: each referenced (table, version) registers once as a
  * session temp view over the store's read (zone pruning, delete
  * vectors, schema markers all apply — it IS [[SnapshotStore
  * .readVersion]]), the rewritten text runs through `spark.sql`, and
  * the views drop again after analysis — the returned frame's plan is
  * already bound, so callers hold a self-contained DataFrame. View
  * names carry a per-call unique suffix, so concurrent `sql` calls on
  * one session (and any pre-existing user view) can never collide.
  *
  * The token pass runs over a MASKED copy of the query (r17): string
  * literals (with `''` escaping), double-quoted strings, backtick
  * identifiers, `--` line comments and slash-star block comments are
  * blanked to a sentinel character of the same length before the
  * FROM/JOIN regex applies, and every replacement maps back to the
  * ORIGINAL text by offset — so `WHERE note = 'excerpt from t'` keeps
  * its literal byte-for-byte even when `t` is a store table, while
  * `TAG AS OF '<name>'` still resolves (the tag text recovers from the
  * original through the match offsets).
  */
object SnapshotSql {

  // FROM/JOIN <ident> [VERSION AS OF n | TAG AS OF 'x'] [[AS] alias] —
  // the alias is captured (keyword-fenced lookahead) so an unaliased
  // snapshot reference keeps resolving under its ORIGINAL name
  // (`FROM t JOIN u ON t.k = u.k` rewrites to `FROM <view> AS t ...`,
  // the Delta time-travel naming behavior), while a user alias binds
  // untouched.
  private val aliasStopWords =
    "JOIN|ON|WHERE|GROUP|ORDER|LEFT|RIGHT|FULL|INNER|CROSS|OUTER|" +
      "UNION|EXCEPT|INTERSECT|LIMIT|HAVING|WINDOW|USING|NATURAL|SEMI|" +
      "ANTI|LATERAL|VALUES|SELECT|SORT|CLUSTER|DISTRIBUTE|TABLESAMPLE|" +
      "PIVOT|UNPIVOT|VERSION|TAG|TIMESTAMP|FOR"
  private val tableRef =
    """(?i)\b(FROM|JOIN)\s+([A-Za-z_][A-Za-z0-9._-]*)""" +
      """((?:\s+FOR)?\s+VERSION\s+AS\s+OF\s+(\d+)""" +
      """|(?:\s+FOR)?\s+TAG\s+AS\s+OF\s+'([^']+)'""" +
      """|(?:\s+FOR)?\s+TIMESTAMP\s+AS\s+OF\s+'([^']+)')?""" +
      s"""(\\s+(?:AS\\s+)?(?!(?:$aliasStopWords)\\b)""" +
      """([A-Za-z_][A-Za-z0-9_]*))?"""
  private val tableRefRe = tableRef.r

  private val callRe =
    """(?is)^\s*CALL\s+([A-Za-z_]+)\s*\((.*)\)\s*;?\s*$""".r

  private val historyRe =
    """(?is)^\s*DESCRIBE\s+HISTORY\s+([A-Za-z_][A-Za-z0-9._-]*)\s*;?\s*$""".r

  /** Per-call unique suffix for the rewrite's temp views: concurrent
    * `sql` calls on one SparkSession referencing the same (table,
    * version) must never drop a view out from under each other, and a
    * pre-existing USER view must never be clobbered by
    * createOrReplaceTempView. */
  private val callSeq = new java.util.concurrent.atomic.AtomicLong()

  /** The mask sentinel: never letter/digit/quote, so no token of
    * [[tableRef]] can match inside a masked span, while a quoted span's
    * kept delimiters still match the regex's literal shape. */
  private val Mask = '\u0001'

  /** Length-preserving mask of every span the FROM/JOIN token pass must
    * not see INTO: single-quoted string literals (SQL `''` doubling AND
    * backslash escapes — Spark's default lexer with
    * `escapedStringLiterals=false` treats `\'` as an escaped quote, so
    * the scanner must too or the mask desyncs; r18), double-quoted
    * strings (same escapes), backtick identifiers (with backtick
    * doubling, r18), `--` line comments (to end of line) and
    * slash-star block comments (NESTED — Spark supports bracketed
    * comment nesting, so a depth counter tracks slash-star inside
    * slash-star; r18). Literal/identifier DELIMITERS stay (so `TAG AS OF
    * '<masked>'` still matches structurally); comment delimiters mask
    * away with their body. Same length in ⇒ every match offset maps
    * 1:1 back to the original. */
  private[sources] def maskQuotedAndComments(q: String): String = {
    val out = q.toCharArray
    val n = q.length
    var i = 0
    while (i < n) {
      q.charAt(i) match {
        case '\'' | '"' =>
          val quote = q.charAt(i)
          var j = i + 1
          var open = true
          while (j < n && open) {
            val c = q.charAt(j)
            if (c == '\\' && j + 1 < n) { // lexer escape: skip next char
              out(j) = Mask; out(j + 1) = Mask; j += 2
            } else if (c == quote) {
              if (j + 1 < n && q.charAt(j + 1) == quote) {
                out(j) = Mask; out(j + 1) = Mask; j += 2 // '' escape
              } else open = false
            } else { out(j) = Mask; j += 1 }
          }
          i = if (open) j else j + 1 // unterminated: Spark will refuse it
        case '`' =>
          var j = i + 1
          var open = true
          while (j < n && open) {
            if (q.charAt(j) == '`') {
              if (j + 1 < n && q.charAt(j + 1) == '`') {
                out(j) = Mask; out(j + 1) = Mask; j += 2 // `` escape
              } else open = false
            } else { out(j) = Mask; j += 1 }
          }
          i = if (open) j else j + 1
        case '-' if i + 1 < n && q.charAt(i + 1) == '-' =>
          var j = i
          while (j < n && q.charAt(j) != '\n') { out(j) = Mask; j += 1 }
          i = j
        case '/' if i + 1 < n && q.charAt(i + 1) == '*' =>
          out(i) = Mask; out(i + 1) = Mask
          var j = i + 2
          var depth = 1
          while (j < n && depth > 0) {
            if (q.charAt(j) == '/' && j + 1 < n &&
                q.charAt(j + 1) == '*') {
              out(j) = Mask; out(j + 1) = Mask; j += 2; depth += 1
            } else if (q.charAt(j) == '*' && j + 1 < n &&
                q.charAt(j + 1) == '/') {
              out(j) = Mask; out(j + 1) = Mask; j += 2; depth -= 1
            } else { out(j) = Mask; j += 1 }
          }
          i = j
        case _ => i += 1
      }
    }
    new String(out)
  }

  /** `TIMESTAMP AS OF` instant, parsed in the SESSION timezone
    * (`spark.sql.session.timeZone`) — never the JVM default, which
    * would resolve the same query string to different versions on
    * different machines. Accepts `yyyy-MM-dd[ HH:mm:ss[.fraction]]`
    * (the Delta/Spark literal shape); anything else refuses loudly. */
  private[sources] def timestampAsOfMillis(
      spark: org.apache.spark.sql.SparkSession, s: String): Long = {
    val zone = java.time.ZoneId.of(
      spark.conf.get("spark.sql.session.timeZone"))
    val t = s.trim
    try {
      val ldt =
        if (t.length == 10) java.time.LocalDate.parse(t).atStartOfDay()
        else java.time.LocalDateTime.parse(t.replace(' ', 'T'))
      ldt.atZone(zone).toInstant.toEpochMilli
    } catch {
      case e: java.time.format.DateTimeParseException =>
        throw new IllegalArgumentException(
          s"cannot parse TIMESTAMP AS OF '$s' — use " +
            "'yyyy-MM-dd[ HH:mm:ss[.SSS]]' (resolved in the session " +
            s"timezone, currently '$zone')", e)
    }
  }

  // FROM/JOIN CHANGES(<table>, <from>, <to>) [[AS] alias] — the
  // table-valued changelog read (Delta's table_changes TVF shape),
  // composing with the full SELECT grammar around it. Each bound is an
  // integer version OR a 'string' (r18): a tag name, or a timestamp —
  // "what changed between releases" spelled directly in SQL.
  private val changesRef =
    ("""(?i)\b(FROM|JOIN)\s+CHANGES\s*\(\s*([A-Za-z_][A-Za-z0-9._-]*)""" +
      """\s*,\s*(\d+|'(?:[^'\\]|''|\\.)*')\s*""" +
      """,\s*(\d+|'(?:[^'\\]|''|\\.)*')\s*\)""" +
      s"""(\\s+(?:AS\\s+)?(?!(?:$aliasStopWords)\\b)""" +
      """([A-Za-z_][A-Za-z0-9_]*))?""").r

  /** Resolve one CHANGES bound (r18): a bare integer is a version; a
    * 'string' resolves TAG-FIRST (tags are exact user-chosen names —
    * [[SnapshotStore.readTag]]), then as a `TIMESTAMP AS OF`-shaped
    * instant ([[SnapshotStore.versionAsOfTimestamp]] in the session
    * timezone); anything neither refuses loudly naming both paths. */
  private def resolveBound(store: SnapshotStore, tbl: String,
      raw: String): Long =
    if (raw.forall(_.isDigit)) raw.toLong
    else resolveVersionBound(store, tbl,
      unescapeSqlString(raw.substring(1, raw.length - 1)))

  /** Undo SQL string-literal escaping the way Spark's default lexer
    * applies it: a backslash escapes the NEXT character (so `\\` is
    * one backslash, `\'` one quote — a single-pass scan, not ordered
    * replaces that mangle `\\` followed by `'`; r18 review fix), and
    * `''` doubles to one quote. */
  private def unescapeSqlString(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) { sb += s.charAt(i + 1); i += 2 }
      else if (c == '\'' && i + 1 < s.length && s.charAt(i + 1) == '\'') {
        sb += '\''; i += 2
      } else { sb += c; i += 1 }
    }
    sb.toString
  }

  /** Tag-first resolution of an UNQUOTED string bound — shared by the
    * CHANGES TVF and `CALL changes` (r18). */
  private def resolveVersionBound(store: SnapshotStore, tbl: String,
      s: String): Long =
    if (store.tags(tbl).contains(s)) store.readTag(tbl, s)
    else try store.versionAsOfTimestamp(tbl,
      timestampAsOfMillis(store.spark, s))
    catch {
      case e: IllegalArgumentException =>
        throw new IllegalArgumentException(
          s"CHANGES bound '$s' is neither a tag of '$tbl' (has: " +
            s"${store.tags(tbl).keys.toSeq.sorted.mkString(", ")}) " +
            s"nor a parseable timestamp: ${e.getMessage}", e)
    }

  /** One masked rewrite pass: the regex runs over the MASKED text
    * (literals/comments can never match), each replacement is computed
    * from ORIGINAL-text group values recovered by offset, and `None`
    * from `repl` passes the matched slice through untouched. */
  private def maskedRewrite(query: String,
      re: scala.util.matching.Regex)(
      repl: (Int => String) => Option[String]): String = {
    val masked = maskQuotedAndComments(query)
    val sb = new StringBuilder
    var last = 0
    re.findAllMatchIn(masked).foreach { m =>
      def g(i: Int): String =
        if (m.start(i) < 0) null else query.substring(m.start(i), m.end(i))
      sb.append(query.substring(last, m.start))
      sb.append(repl(g).getOrElse(query.substring(m.start, m.end)))
      last = m.end
    }
    sb.append(query.substring(last))
    sb.toString
  }

  // DELETE FROM <t> WHERE <p>  /  UPDATE <t> SET <assignments> WHERE <p>
  // — statement-level sugar over the CALL procedures (r18, closing the
  // r17 scope question the affirmative way: the spelling users type
  // dispatches to the same commits). Matched against the MASKED text
  // (keywords inside literals/comments can never split the clauses);
  // every clause recovers from the ORIGINAL by offset.
  // leading/trailing comment spans arrive MASKED (runs of the Mask
  // char), so the anchors accept them alongside whitespace, and a
  // top-level `;` (never maskable) may close the statement
  private val stmtTail = "\\s*;?[\\s" + Mask + "]*$"
  private val stmtHead = "(?is)^[\\s" + Mask + "]*"
  private val deleteStmtRe =
    (stmtHead + """DELETE\s+FROM\s+([A-Za-z_][A-Za-z0-9._-]*)""" +
      """\s+WHERE\s+(.+?)""" + stmtTail).r
  // the UPDATE statement captures SET-through-end as ONE span; the
  // SET/WHERE boundary is found by a DEPTH-AWARE scan of the masked
  // text (r18 review fix: a regex split at the first textual WHERE
  // broke on SET expressions containing scalar subqueries with their
  // own WHERE — those sit at paren depth >= 1 and are now skipped)
  private val updateHeadRe =
    (stmtHead + """UPDATE\s+([A-Za-z_][A-Za-z0-9._-]*)""" +
      """\s+SET\s+([\s\S]+?)""" + stmtTail).r

  /** Match an UPDATE statement: (table, set clause, predicate), all
    * recovered from the ORIGINAL text; the WHERE that splits them is
    * the first one at paren/bracket depth 0 in the masked body. */
  private def matchUpdateStmt(query: String)
      : Option[(String, String, String)] = {
    val masked = maskQuotedAndComments(query)
    updateHeadRe.findFirstMatchIn(masked).flatMap { m =>
      val (s2, e2) = (m.start(2), m.end(2))
      var i = s2; var depth = 0; var w = -1
      def wordAt(j: Int): Boolean =
        j + 5 <= e2 && masked.substring(j, j + 5)
          .equalsIgnoreCase("WHERE") &&
          (j == s2 || { val c = masked.charAt(j - 1)
            !Character.isLetterOrDigit(c) && c != '_' }) &&
          (j + 5 == e2 || { val c = masked.charAt(j + 5)
            !Character.isLetterOrDigit(c) && c != '_' })
      while (i < e2 && w < 0) {
        masked.charAt(i) match {
          case '(' | '[' => depth += 1; i += 1
          case ')' | ']' => depth -= 1; i += 1
          case 'w' | 'W' if depth == 0 && wordAt(i) => w = i
          case _ => i += 1
        }
      }
      if (w < 0) None
      else Some((query.substring(m.start(1), m.end(1)),
        query.substring(s2, w).trim,
        query.substring(w + 5, e2).trim))
    }
  }

  /** Match `re` against the MASKED text, returning original-text group
    * access by offset — [[maskedRewrite]]'s recovery trick for
    * whole-statement matches. */
  private def maskedMatch(query: String, re: scala.util.matching.Regex)
      : Option[Int => String] =
    re.findFirstMatchIn(maskQuotedAndComments(query)).map { m =>
      (i: Int) =>
        if (m.start(i) < 0) null
        else query.substring(m.start(i), m.end(i))
    }

  /** `<group>.<sub>` split: a literal table whose NAME contains a dot
    * wins over the split (checked first); a non-store name returns
    * as-is with no sub. */
  private def splitTableRef(store: SnapshotStore, name: String)
      : (String, Option[String]) =
    if (store.exists(name)) (name, None)
    else name.indexOf('.') match {
      case i if i > 0 => (name.substring(0, i), Some(name.substring(i + 1)))
      case _ => (name, None)
    }

  /** Run `query` against the store (see object doc for the surface). */
  def sql(store: SnapshotStore, query: String): DataFrame = query match {
    case historyRe(t) =>
      store.history(t)
    case callRe(proc, rawArgs) =>
      val p = proc.toLowerCase
      call(store, p, resolveArgs(p, parseArgs(rawArgs)))
    case _ =>
      val del = maskedMatch(query, deleteStmtRe)
        .filter(g => store.exists(splitTableRef(store, g(1))._1))
      val upd = matchUpdateStmt(query)
        .filter(t => store.exists(splitTableRef(store, t._1)._1))
      (del, upd) match {
        case (Some(g), _) =>
          deleteWhere(store, g(1), g(2))
        case (_, Some((tbl, setClause, pred))) =>
          updateWhere(store, tbl, pred, parseSetClause(setClause).toMap)
        case _ => selectQuery(store, query)
      }
  }

  private def selectQuery(store: SnapshotStore, query: String)
      : DataFrame = {
      val spark = store.spark
      val callId = callSeq.incrementAndGet()
      val registered = scala.collection.mutable.ArrayBuffer.empty[String]
      // one temp view per distinct (table, sub, version) reference
      val views = scala.collection.mutable.LinkedHashMap[
        (String, Option[String], Long), String]()
      def register(nm: String, df: DataFrame): String = {
        df.createOrReplaceTempView(nm)
        registered += nm
        nm
      }
      def splitRef(name: String): (String, Option[String]) =
        splitTableRef(store, name)
      def sanitize(name: String): String =
        name.map(c => if (c.isLetterOrDigit) c else '_')
      // BOTH rewrite passes sit inside the try (r18, the ADVICE leak):
      // a rewrite step that throws AFTER registering views (an unknown
      // tag, an unparseable TIMESTAMP AS OF) must still drop them.
      try {
        // pass 1: CHANGES(t, a, b) table-valued reads — the changelog
        // as a composable relation ([[SnapshotStore.changesBetween]] /
        // [[SnapshotStore.changesBetweenTable]] for <group>.<sub>);
        // bounds are versions, tags, or timestamps ([[resolveBound]])
        val afterChanges = maskedRewrite(query, changesRef) { g =>
          val (kw, name) = (g(1), g(2))
          val (tbl, sub) = splitRef(name)
          if (!store.exists(tbl)) None // not ours: pass through
          else {
            val (a, b) =
              (resolveBound(store, tbl, g(3)), resolveBound(store, tbl, g(4)))
            val nm = register(
              s"graft_sql_ch_${sanitize(name)}_${a}_${b}_c$callId",
              sub.fold(store.changesBetween(tbl, a, b))(
                store.changesBetweenTable(tbl, _, a, b)))
            val alias = Option(g(6)).getOrElse(sub.getOrElse(name))
            Some(s"$kw $nm AS `$alias`")
          }
        }
        // pass 2: snapshot references with optional AS OF clauses (the
        // pass-1 view names are not store tables, so they pass through)
        val rewritten = maskedRewrite(afterChanges, tableRefRe) { g =>
          val (kw, name) = (g(1), g(2))
          // `<group>.<sub>` reads ONE sub-table of a multi-table group
          // ([[SnapshotStore.readTableVersion]]); a plain name reads a
          // single-table snapshot. A literal table whose NAME contains
          // a dot wins over the split (checked first). Neither → not
          // ours.
          val (tbl, sub) = splitRef(name)
          if (!store.exists(tbl)) None // not ours: pass through
          else {
            val v =
              if (g(4) != null) g(4).toLong
              else if (g(5) != null) store.readTag(tbl, g(5))
              else if (g(6) != null) store.versionAsOfTimestamp(tbl,
                timestampAsOfMillis(spark, g(6)))
              else store.currentVersion(tbl)
            val view = views.getOrElseUpdate((tbl, sub, v), register(
              s"graft_sql_${sanitize(name)}_v${v}_c$callId",
              sub.fold(store.readVersion(tbl, v))(
                store.readTableVersion(tbl, v, _))))
            val alias = Option(g(8)).getOrElse(sub.getOrElse(name))
            Some(s"$kw $view AS `$alias`")
          }
        }
        spark.sql(rewritten)
      } finally registered.foreach(spark.catalog.dropTempView(_))
  }

  /** Shared dispatch of the DELETE surface (statement and CALL):
    * single tables take the zone-pruned CoW path, `<group>.<sub>`
    * the atomic per-sub overwrite. */
  private def deleteWhere(store: SnapshotStore, name: String,
      predicate: String): DataFrame =
    splitTableRef(store, name) match {
      case (tbl, None) =>
        val (v, reused) = store.commitDeleteWhere(tbl, predicate)
        status(store, Seq("version" -> v.toString,
          "files_reused" -> reused.toString))
      case (tbl, Some(sub)) =>
        val v = store.commitDeleteWhereTable(tbl, sub, predicate)
        status(store, Seq("version" -> v.toString, "sub" -> sub))
    }

  /** Shared dispatch of the UPDATE surface (statement and CALL). */
  private def updateWhere(store: SnapshotStore, name: String,
      predicate: String, set: Map[String, String]): DataFrame =
    splitTableRef(store, name) match {
      case (tbl, None) =>
        val (v, reused) = store.commitUpdateWhere(tbl, predicate, set)
        status(store, Seq("version" -> v.toString,
          "files_reused" -> reused.toString))
      case (tbl, Some(sub)) =>
        val v = store.commitUpdateWhereTable(tbl, sub, predicate, set)
        status(store, Seq("version" -> v.toString, "sub" -> sub))
    }

  /** Split a `col = expr[, col = expr ...]` SET clause (r18): commas
    * split only at paren/bracket depth 0 outside string literals; each
    * assignment splits on its FIRST top-level `=` — so SET expressions
    * may contain commas inside calls, `=` inside strings, and nested
    * parens. String scanning honors backslash escapes exactly like
    * [[maskQuotedAndComments]] (review fix: `\'` inside a literal
    * would otherwise close the string early and mis-split the
    * assignments). A clause assigning the same column twice refuses
    * loudly (SQL duplicate-assignment semantics — `.toMap` would have
    * silently kept only the last). */
  private[sources] def parseSetClause(s: String): Seq[(String, String)] = {
    val parts = scala.collection.mutable.ArrayBuffer.empty[String]
    val sb = new StringBuilder
    var depth = 0
    var inStr = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (inStr) {
        if (c == '\\' && i + 1 < s.length) {       // lexer escape
          sb += c; sb += s.charAt(i + 1); i += 1
        } else { sb += c; if (c == '\'') inStr = false }
      } else c match {
        case '\'' => inStr = true; sb += c
        case '(' | '[' => depth += 1; sb += c
        case ')' | ']' => depth -= 1; sb += c
        case ',' if depth == 0 => parts += sb.toString; sb.clear()
        case _ => sb += c
      }
      i += 1
    }
    parts += sb.toString
    val pairs = parts.toSeq.map { p =>
      var j = 0; var d = 0; var q = false; var eq = -1
      while (j < p.length && eq < 0) {
        val ch = p.charAt(j)
        if (q) {
          if (ch == '\\' && j + 1 < p.length) j += 1
          else if (ch == '\'') q = false
        } else ch match {
          case '\'' => q = true
          case '(' | '[' => d += 1
          case ')' | ']' => d -= 1
          case '=' if d == 0 => eq = j
          case _ =>
        }
        j += 1
      }
      require(eq > 0 && eq < p.length - 1,
        s"cannot parse SET assignment '${p.trim}' — expected col = expr")
      (p.substring(0, eq).trim, p.substring(eq + 1).trim)
    }
    requireDistinctSetColumns(pairs)
    pairs
  }

  /** SQL refuses `SET v = ..., v = ...`; so do we, case-insensitively
    * (r18 review fix — the `.toMap` downstream would silently keep
    * only the last assignment). */
  private def requireDistinctSetColumns(
      pairs: Seq[(String, String)]): Unit = {
    val dup = pairs.map(_._1.toLowerCase)
      .groupBy(identity).filter(_._2.size > 1).keys
    require(dup.isEmpty,
      s"SET clause assigns ${dup.mkString(", ")} more than once — " +
        "SQL UPDATE refuses duplicate assignments")
  }

  /** CALL argument list: 'single-quoted strings' (SQL `''` escaping)
    * and integer literals, comma-separated, each optionally prefixed
    * `name =>` (the Iceberg named-argument shape — resolved against
    * [[procParams]], all-or-nothing per call). */
  private def parseArgs(raw: String): Seq[(Option[String], Any)] = {
    val argRe = ("""\s*(?:([A-Za-z_][A-Za-z0-9_]*)\s*=>\s*)?""" +
      """(?:'((?:[^']|'')*)'|(-?\d+))\s*(?:,|$)""").r
    val trimmed = raw.trim
    if (trimmed.isEmpty) Nil
    else {
      val parsed = argRe.findAllMatchIn(trimmed).map { m =>
        val v: Any =
          if (m.group(2) != null) m.group(2).replace("''", "'")
          else m.group(3).toLong
        (Option(m.group(1)), v)
      }.toSeq
      val consumed = argRe.findAllMatchIn(trimmed).map(_.matched.length).sum
      require(consumed == trimmed.length,
        s"cannot parse CALL arguments: $raw (only 'string' and integer " +
          "literals are supported, each optionally named `arg => value`)")
      parsed
    }
  }

  /** Parameter names per procedure, in positional order — what named
    * arguments resolve against. `update_where` resolves named calls
    * against (table, predicate, set) where `set` is one
    * `'col = expr[, col = expr]'` string (r18); the positional
    * variadic (col, expr, ...) pair form still works. */
  private val procParams: Map[String, Seq[String]] = Map(
    "update_where" -> Seq("table", "predicate", "set"),
    "expire_versions" -> Seq("table", "keep_from"),
    "expire_by_policy" -> Seq("table", "keep_last", "max_age_millis"),
    "vacuum" -> Seq("table"),
    "vacuum_dry_run" -> Seq("table"),
    "optimize_small_files" -> Seq("table", "target_bytes"),
    "optimize_clustering" -> Seq("table"),
    "tag" -> Seq("table", "name", "version"),
    "delete_tag" -> Seq("table", "name"),
    "add_check" -> Seq("table", "name", "predicate"),
    "drop_check" -> Seq("table", "name"),
    "clone" -> Seq("table", "source", "source_version"),
    "publish" -> Seq("table", "source", "mode"),
    "merge_from_table" -> Seq("table", "source", "key"),
    "rollback" -> Seq("table", "version"),
    "compact_keyed" -> Seq("table", "key", "num_files"),
    "compact_delete_keys" -> Seq("table"),
    "delete_where" -> Seq("table", "predicate"),
    "drop_table" -> Seq("table"),
    "rename_table" -> Seq("table", "new_name"),
    "changes" -> Seq("table", "from_version", "to_version"))

  /** Resolve a parsed argument list to positional order: positional
    * calls pass through; named calls (all-or-nothing — mixing refuses)
    * reorder against [[procParams]], allowing only TRAILING optionals
    * to be omitted (a gap before a later argument refuses loudly —
    * silently shifting positions would call with wrong values). */
  private def resolveArgs(proc: String,
      parsed: Seq[(Option[String], Any)]): Seq[Any] =
    if (parsed.forall(_._1.isEmpty)) parsed.map(_._2)
    else {
      require(parsed.forall(_._1.isDefined),
        s"CALL $proc mixes named and positional arguments — use one style")
      val names = procParams.getOrElse(proc,
        throw new IllegalArgumentException(
          s"procedure '$proc' does not support named arguments"))
      val given = parsed.map { case (n, v) => n.get -> v }
      require(given.map(_._1).distinct.size == given.size,
        s"CALL $proc repeats a named argument")
      val m = given.toMap
      m.keys.foreach(k => require(names.contains(k),
        s"unknown argument '$k' for $proc — expected: " +
          names.mkString(", ")))
      val vals = names.map(m.get)
      val last = vals.lastIndexWhere(_.isDefined)
      require(vals.take(last + 1).forall(_.isDefined),
        s"CALL $proc omits an argument before a later one — only " +
          "trailing optionals may be left out (expected order: " +
          names.mkString(", ") + ")")
      vals.take(last + 1).map(_.get)
    }

  private def str(a: Any): String = a match {
    case s: String => s
    case other => throw new IllegalArgumentException(
      s"expected a 'string' argument, got $other")
  }
  private def num(a: Any): Long = a match {
    case n: Long => n
    case other => throw new IllegalArgumentException(
      s"expected an integer argument, got '$other'")
  }

  private def status(store: SnapshotStore,
      rows: Seq[(String, String)]): DataFrame = {
    import store.spark.implicits._
    rows.toDF("key", "value")
  }

  private def call(store: SnapshotStore, proc: String,
      args: Seq[Any]): DataFrame = {
    def ok(kv: (String, String)*) = status(store, kv.toSeq)
    proc match {
      case "expire_versions" =>
        val dirs = store.expireVersions(str(args(0)), num(args(1)))
        ok("reclaimed_dirs" -> dirs.size.toString)
      case "expire_by_policy" =>
        val dirs = store.expireByPolicy(str(args(0)),
          keepLast = num(args(1)).toInt,
          maxAgeMillis = args.lift(2).map(num))
        ok("reclaimed_dirs" -> dirs.size.toString)
      case "vacuum" =>
        val dirs = store.vacuum(str(args(0)))
        ok("removed_dirs" -> dirs.size.toString)
      case "vacuum_dry_run" =>
        val p = store.vacuumDryRun(str(args(0)))
        ok("orphan_dirs" -> p.orphanDirs.mkString(","),
          "orphan_files" -> p.orphanFiles.mkString(","),
          "stale_zone_dirs" -> p.staleZoneDirs.mkString(","),
          "stale_claims" -> p.staleClaims.mkString(","),
          "stale_manifests" -> p.staleManifests.mkString(","),
          "stale_del_dirs" -> p.staleDelDirs.mkString(","))
      case "optimize_small_files" =>
        val (v, rewrote, reused) = store.optimizeSmallFiles(str(args(0)),
          targetBytes = args.lift(1).map(num).getOrElse(128L << 20))
        ok("version" -> v.toString, "rewrote" -> rewrote.toString,
          "reused" -> reused.toString)
      case "optimize_clustering" =>
        val (v, rewrote, reused) = store.optimizeClustering(str(args(0)))
        ok("version" -> v.toString, "rewrote" -> rewrote.toString,
          "reused" -> reused.toString)
      case "tag" =>
        store.tag(str(args(0)), str(args(1)), num(args(2)))
        ok("tagged" -> s"${str(args(1))} -> v${num(args(2))}")
      case "delete_tag" =>
        store.deleteTag(str(args(0)), str(args(1)))
        ok("deleted_tag" -> str(args(1)))
      case "add_check" =>
        store.addCheck(str(args(0)), str(args(1)), str(args(2)))
        ok("check" -> str(args(1)))
      case "drop_check" =>
        store.dropCheck(str(args(0)), str(args(1)))
        ok("dropped_check" -> str(args(1)))
      case "clone" =>
        val v = store.cloneTable(str(args(0)), str(args(1)),
          args.lift(2).map(num))
        ok("cloned" -> s"${str(args(0))} v$v")
      case "publish" =>
        val v = store.commitFromTable(str(args(0)), str(args(1)),
          force = args.lift(2).map(str).contains("force"))
        ok("published" -> s"${str(args(0))} v$v")
      case "merge_from_table" =>
        val v = store.mergeFromTable(str(args(0)), str(args(1)),
          str(args(2)))
        ok("merged" -> s"${str(args(0))} v$v")
      case "rollback" =>
        val v = store.rollback(str(args(0)), num(args(1)))
        ok("version" -> v.toString, "rolled_back_to" -> num(args(1)).toString)
      case "compact_keyed" =>
        val v = store.compactKeyed(str(args(0)), str(args(1)),
          args.lift(2).map(num(_).toInt).getOrElse(16))
        ok("version" -> v.toString)
      case "compact_delete_keys" =>
        val (v, reused) = store.compactDeleteKeys(str(args(0)))
        ok("version" -> v.toString, "files_reused" -> reused.toString)
      case "delete_where" =>
        // a '<group>.<sub>' table routes to the per-sub mutation (r18)
        deleteWhere(store, str(args(0)), str(args(1)))
      case "update_where" =>
        // (table, predicate, col1, expr1 [, col2, expr2 ...]) — or the
        // 3-argument form (table, predicate, 'col = expr[, ...]'),
        // which is also what named `set =>` calls resolve to (r18)
        val sets =
          if (args.size == 3) parseSetClause(str(args(2))).toMap
          else {
            val pairs = args.drop(2).map(str).grouped(2).map {
              case Seq(c, e) => c -> e
              case other => throw new IllegalArgumentException(
                s"update_where takes (table, predicate, col, expr ...) " +
                  s"pairs — dangling argument ${other.mkString}")
            }.toSeq
            requireDistinctSetColumns(pairs)
            pairs.toMap
          }
        updateWhere(store, str(args(0)), str(args(1)), sets)
      case "drop_table" =>
        store.dropTable(str(args(0)))
        ok("dropped" -> str(args(0)))
      case "rename_table" =>
        store.renameTable(str(args(0)), str(args(1)))
        ok("renamed" -> s"${str(args(0))} -> ${str(args(1))}")
      case "changes" =>
        // bounds: integer version, 'tag', or 'timestamp' — and a
        // '<group>.<sub>' table routes to the per-sub changelog (r18,
        // parity with the CHANGES(...) TVF)
        val (tbl, sub) = splitTableRef(store, str(args(0)))
        def bound(a: Any): Long = a match {
          case n: Long => n
          case s: String => resolveVersionBound(store, tbl, s)
          case other => throw new IllegalArgumentException(
            s"cannot resolve changes bound '$other'")
        }
        sub.fold(store.changesBetween(tbl, bound(args(1)), bound(args(2))))(
          store.changesBetweenTable(tbl, _, bound(args(1)), bound(args(2))))
      case other =>
        throw new IllegalArgumentException(
          s"unknown procedure '$other' — supported: expire_versions, " +
            "expire_by_policy, vacuum, vacuum_dry_run, " +
            "optimize_small_files, optimize_clustering, tag, delete_tag, " +
            "add_check, drop_check, clone, publish, merge_from_table, " +
            "rollback, compact_keyed, compact_delete_keys, delete_where, " +
            "update_where, drop_table, rename_table, changes")
    }
  }
}
