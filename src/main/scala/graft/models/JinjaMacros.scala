package graft.models

/** User-defined dbt macros — `{% macro name(params) %} body {% endmacro %}`
  * definitions expanded at `{{ name(args) }}` call sites, the authoring
  * construct a real dbt project adds on day one (the reference project
  * itself defines none, but its lifecycle — `dbt run` compiling Jinja
  * before SQL — assumes the capability; reference README.md:44-55).
  *
  * Supported subset, chosen to cover how dbt macros are actually written
  * in SQL models:
  *   - parameters with optional defaults: `{% macro m(col, scale=2) %}`
  *   - calls with positional and keyword args, nested parens and quotes
  *     respected: `{{ m(round(x, 2), scale=4) }}`
  *   - string-literal args render UNQUOTED in the body (`{{ m('amt') }}`
  *     with body `{{ col }}` renders `amt` — Jinja string semantics, the
  *     dbt idiom for passing column names); any other arg text passes
  *     through verbatim (numbers, SQL fragments)
  *   - macro bodies may call other macros and `{{ ref('x') }}` — bodies
  *     are re-scanned after substitution, so dependency extraction on
  *     the expanded text sees refs introduced by macros
  *   - whitespace-control markers (`{%-`, `-%}`) are accepted and the
  *     body trimmed
  *
  * Not supported (fail fast or out of scope by design): recursive
  * macros (expansion depth guard), nested `{% macro %}` definitions,
  * and Jinja control flow (`{% if %}`/`{% for %}`) — the latter is
  * documented as out of scope; everything this library ships renders
  * with substitution only.
  *
  * Expansion is driver-side string work on model TEXTS (bytes of SQL,
  * never data) — nothing here touches the cluster.
  */
object JinjaMacros {

  /** One parsed macro: name, ordered params (with optional default
    * VALUES, already unquoted), and the raw body text.
    */
  final case class MacroDef(name: String,
      params: Seq[(String, Option[String])], body: String)

  private val MacroToken = raw"\{%-?\s*macro\b".r
  private val DefEnd = raw"\{%-?\s*endmacro\s*-?%\}".r

  /** Index of the `)` matching the `(` at `open` (quote-aware — parens
    * inside string literals don't count), or -1 when unbalanced.
    */
  private def matchParen(s: String, open: Int): Int = {
    var depth = 0
    var quote = 0.toChar
    var i = open
    while (i < s.length) {
      val c = s.charAt(i)
      if (quote != 0) { if (c == quote) quote = 0.toChar }
      else c match {
        case '\'' | '"' => quote = c
        case '('        => depth += 1
        case ')'        => depth -= 1; if (depth == 0) return i
        case _          =>
      }
      i += 1
    }
    -1
  }

  /** Parse every `{% macro %}…{% endmacro %}` in a macro-file text.
    * The signature is scanned by hand — name, then a BALANCED-paren
    * parameter list (defaults may contain parens and commas, e.g.
    * `scale=pow(10, 2)`), then `%}`. A `{% macro` token whose signature
    * does not parse FAILS here with the macro's name — the earlier
    * regex-group form silently skipped it, and the unexpanded call
    * sites surfaced later as confusing SQL parse errors (r6 advice).
    */
  def parse(source: String): Seq[MacroDef] = {
    val defs = MacroToken.findAllMatchIn(source).toSeq.map { tk =>
      var i = tk.end
      while (i < source.length && source.charAt(i).isWhitespace) i += 1
      val ns = i
      while (i < source.length &&
        (source.charAt(i).isLetterOrDigit || source.charAt(i) == '_')) i += 1
      val name = source.substring(ns, i)
      def fail(why: String): Nothing = throw new IllegalArgumentException(
        s"unparseable {% macro %} definition" +
          (if (name.nonEmpty) s" '$name'" else "") + s": $why")
      if (name.isEmpty || !(name.head.isLetter || name.head == '_'))
        fail("expected a macro name")
      while (i < source.length && source.charAt(i).isWhitespace) i += 1
      if (i >= source.length || source.charAt(i) != '(')
        fail("expected '(' after the macro name")
      val close = matchParen(source, i)
      if (close < 0) fail("unbalanced parentheses in the parameter list")
      val paramsRaw = source.substring(i + 1, close)
      i = close + 1
      while (i < source.length && source.charAt(i).isWhitespace) i += 1
      if (i < source.length && source.charAt(i) == '-') i += 1
      if (i + 1 >= source.length ||
        source.charAt(i) != '%' || source.charAt(i + 1) != '}')
        fail("expected '%}' after the parameter list")
      val rest = source.substring(i + 2)
      val end = DefEnd.findFirstMatchIn(rest).getOrElse(
        fail("no {% endmacro %}"))
      val body = rest.substring(0, end.start)
      require(MacroToken.findFirstIn(body).isEmpty,
        s"macro '$name' contains a nested macro definition")
      val params = splitArgs(paramsRaw).map { p =>
        p.split("=", 2) match {
          case Array(n, d) => (n.trim, Some(unquote(d.trim)))
          case Array(n)    => (n.trim, None)
        }
      }
      val dupP = params.map(_._1).diff(params.map(_._1).distinct)
      require(dupP.isEmpty,
        s"macro '$name' repeats parameter(s): ${dupP.mkString(", ")}")
      MacroDef(name, params, body.trim)
    }
    val dup = defs.map(_.name).diff(defs.map(_.name).distinct)
    require(dup.isEmpty, s"duplicate macro definition(s): ${dup.mkString(", ")}")
    defs
  }

  /** Expand every known-macro call site in `sql`, re-scanning until the
    * text is stable so macros may call macros. `maxDepth` bounds the
    * rescan count — a self-referential macro fails fast instead of
    * looping. `{{ ref(…) }}` and other non-macro `{{ … }}` constructs
    * pass through untouched for the downstream renderer.
    */
  def expand(sql: String, macros: Seq[MacroDef], maxDepth: Int = 16): String = {
    if (macros.isEmpty) return sql
    val byName = macros.map(m => m.name -> m).toMap
    var cur = sql
    var depth = 0
    var changed = true
    while (changed) {
      require(depth < maxDepth,
        s"macro expansion did not terminate in $maxDepth passes — recursive macro?")
      val next = expandOnce(cur, byName)
      changed = next != cur
      cur = next
      depth += 1
    }
    cur
  }

  /** One left-to-right pass replacing each outermost macro call. */
  private def expandOnce(sql: String, byName: Map[String, MacroDef]): String = {
    val out = new StringBuilder
    var i = 0
    while (i < sql.length) {
      val open = sql.indexOf("{{", i)
      if (open < 0) { out.append(sql.substring(i)); i = sql.length }
      else {
        out.append(sql.substring(i, open))
        parseCall(sql, open, byName) match {
          case Some((m, args, end)) =>
            out.append(render(m, args))
            i = end
          case None =>
            out.append("{{")
            i = open + 2
        }
      }
    }
    out.toString
  }

  /** Try to read `{{ name( balanced-args ) }}` at `open` for a KNOWN
    * macro name; returns (macro, raw args, index past the closing}}).
    */
  private def parseCall(sql: String, open: Int,
      byName: Map[String, MacroDef]): Option[(MacroDef, Seq[String], Int)] = {
    var i = open + 2
    while (i < sql.length && sql.charAt(i).isWhitespace) i += 1
    val ns = i
    while (i < sql.length &&
      (sql.charAt(i).isLetterOrDigit || sql.charAt(i) == '_')) i += 1
    val name = sql.substring(ns, i)
    byName.get(name).flatMap { m =>
      while (i < sql.length && sql.charAt(i).isWhitespace) i += 1
      if (i >= sql.length || sql.charAt(i) != '(') None
      else {
        // balanced-paren, quote-aware scan for the matching ')'
        var depth = 0
        var quote = 0.toChar
        val as = i + 1
        var ae = -1
        while (i < sql.length && ae < 0) {
          val c = sql.charAt(i)
          if (quote != 0) { if (c == quote) quote = 0.toChar }
          else c match {
            case '\'' | '"' => quote = c
            case '('        => depth += 1
            case ')'        => depth -= 1; if (depth == 0) ae = i
            case _          =>
          }
          i += 1
        }
        if (ae < 0) None
        else {
          while (i < sql.length && sql.charAt(i).isWhitespace) i += 1
          if (i + 1 < sql.length && sql.charAt(i) == '}' && sql.charAt(i + 1) == '}')
            Some((m, splitArgs(sql.substring(as, ae)), i + 2))
          else None
        }
      }
    }
  }

  /** Split a raw argument string on top-level commas (parens and quotes
    * shield nested ones). An all-whitespace string is a ZERO-arg call —
    * Jinja treats `m( )` like `m()`, binding defaults (r6 advice); the
    * error stays for genuinely empty positions like `m(a,,b)`.
    */
  private def splitArgs(s: String): Seq[String] = {
    if (s.trim.isEmpty) return Nil
    val out = scala.collection.mutable.Buffer.empty[String]
    val cur = new StringBuilder
    var depth = 0
    var quote = 0.toChar
    s.foreach { c =>
      if (quote != 0) { cur += c; if (c == quote) quote = 0.toChar }
      else c match {
        case '\'' | '"'           => quote = c; cur += c
        case '('                  => depth += 1; cur += c
        case ')'                  => depth -= 1; cur += c
        case ',' if depth == 0    => out += cur.toString; cur.clear()
        case _                    => cur += c
      }
    }
    out += cur.toString
    val parts = out.toSeq.map(_.trim)
    // a trailing comma is fine (Jinja is Python-like): drop the empty tail
    val args = if (parts.last.isEmpty) parts.init else parts
    require(args.forall(_.nonEmpty),
      s"empty argument in macro call args '($s)'")
    args
  }

  private val KwArg = raw"(?s)^([A-Za-z_][A-Za-z0-9_]*)\s*=(?!=)\s*(.*)$$".r

  /** Bind args to params (positional first, then keywords, then
    * defaults) and substitute `{{ param }}` sites in the body.
    */
  private def render(m: MacroDef, args: Seq[String]): String = {
    val (positional, keyword) = args.span(a => KwArg.findFirstIn(a).isEmpty)
    require(positional.size <= m.params.size,
      s"macro '${m.name}' takes ${m.params.size} argument(s), got ${args.size}")
    val kw = keyword.map {
      case KwArg(k, v) => k -> v
      case a => throw new IllegalArgumentException(
        s"macro '${m.name}': positional arg '$a' after keyword args")
    }.toMap
    val unknown = kw.keySet.diff(m.params.map(_._1).toSet)
    require(unknown.isEmpty,
      s"macro '${m.name}' has no parameter(s): ${unknown.mkString(", ")}")
    val bound = m.params.zipWithIndex.map { case ((p, default), idx) =>
      val v = if (idx < positional.size) {
        require(!kw.contains(p),
          s"macro '${m.name}': parameter '$p' given both positionally and by keyword")
        positional(idx)
      } else kw.getOrElse(p, default.getOrElse(throw new IllegalArgumentException(
        s"macro '${m.name}' missing required argument '$p'")))
      p -> unquote(v)
    }.toMap
    substituteParams(m.body, bound)
  }

  /** Jinja variable substitution over a macro body: inside every
    * `{{ … }}` span, bound param identifiers resolve to their values
    * (quote-aware — string literals in the span are untouched; kwarg
    * names and call names are syntax, not variables, and are skipped).
    * A span that is EXACTLY one param prints the value (Jinja's
    * `{{ x }}`); any other span re-emits with substituted text for the
    * next expansion pass (nested macro calls) or the downstream
    * renderer (`ref`). Text outside `{{ … }}` is never touched — it is
    * SQL, where an identifier coinciding with a param name must survive.
    */
  private def substituteParams(body: String, bound: Map[String, String]): String = {
    val out = new StringBuilder
    var i = 0
    while (i < body.length) {
      val open = body.indexOf("{{", i)
      val close = if (open < 0) -1 else body.indexOf("}}", open + 2)
      if (close < 0) { out.append(body.substring(i)); i = body.length }
      else {
        out.append(body.substring(i, open))
        val inner = body.substring(open + 2, close)
        if (bound.contains(inner.trim)) out.append(bound(inner.trim))
        else out.append("{{").append(substIdents(inner, bound)).append("}}")
        i = close + 2
      }
    }
    out.toString
  }

  /** Replace word-boundary occurrences of bound identifiers outside
    * quotes; an identifier followed by `(` (a call) or a single `=`
    * (a kwarg name) is syntax, not a variable reference.
    */
  private def substIdents(s: String, bound: Map[String, String]): String = {
    val out = new StringBuilder
    var i = 0
    var quote = 0.toChar
    while (i < s.length) {
      val c = s.charAt(i)
      if (quote != 0) { out += c; if (c == quote) quote = 0.toChar; i += 1 }
      else if (c == '\'' || c == '"') { quote = c; out += c; i += 1 }
      else if (c.isLetter || c == '_') {
        val ns = i
        while (i < s.length &&
          (s.charAt(i).isLetterOrDigit || s.charAt(i) == '_')) i += 1
        val ident = s.substring(ns, i)
        var j = i
        while (j < s.length && s.charAt(j).isWhitespace) j += 1
        val isSyntax = j < s.length && (s.charAt(j) == '(' ||
          (s.charAt(j) == '=' && (j + 1 >= s.length || s.charAt(j + 1) != '=')))
        out.append(if (isSyntax) ident else bound.getOrElse(ident, ident))
      } else { out += c; i += 1 }
    }
    out.toString
  }

  /** Jinja string semantics: a fully quoted arg renders unquoted;
    * anything else passes through verbatim.
    */
  private def unquote(s: String): String =
    if (s.length >= 2 &&
      (s.head == '\'' || s.head == '"') && s.last == s.head &&
      // 'a' + 'b' is an expression, not one literal — only strip when
      // the opening quote closes at the END
      s.indexOf(s.head, 1) == s.length - 1) s.substring(1, s.length - 1)
    else s
}
