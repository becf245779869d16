package graft.query

/** Zed EXPRESSION surface → Spark SQL text, shared by the ETL-config
  * translator ([[graft.etl.ZedEtl]]) and the script compiler ([[ZedScript]]).
  *
  * The supported surface is the one the reference's configs and demo scripts
  * actually use (etl/yaml.go:20-29 rules; the demo .zed scripts; design.md's
  * walkthrough): field paths, record literals, string/number/bool/null
  * literals, comparisons (`==`, `!=`, `<`, `<=`, `>`, `>=`, `=`),
  * `in [list]` membership, and/or/not, arithmetic (`+ - * / %`), subscripts
  * (`arr[0]`, `map[key]` — Spark's SQL subscript has the same array/map
  * semantics), `is(<name>)` named-type tests (compiled against the engine's
  * discriminator column — `_kind` for pool envelopes, `_type` for
  * ZSON-loaded frames), const substitution, and the
  * `cast(null, typeof(x))` tombstone idiom (→ untyped NULL; sound because
  * pools widen values to a nullable superset). Anything outside raises with
  * a clear message instead of mis-translating.
  */
object ZedExpr {

  /** Translation environment.
    *
    * @param root       prefix for bare field paths (`Some("in")` binds
    *                   `value.op` as `in.value.op` — the rule-expression
    *                   binding); None leaves bare paths as top-level columns
    *                   (script binding)
    * @param consts     const name → SQL fragment substitutions
    * @param kindCol    discriminator column `is(<name>)` tests against
    * @param namedTypes declared named types (`type done = {…}`) that
    *                   `cast(rec, name)` may tag
    */
  final case class Env(
      root: Option[String],
      consts: Map[String, String] = Map.empty,
      kindCol: String = "_kind",
      namedTypes: Set[String] = Set.empty)

  sealed trait E
  final case class Raw(s: String) extends E // already-SQL fragment
  final case class Rec(fields: Seq[(String, E)]) extends E
  /** `cast(rec, name)` to a declared named type: the value is the record;
    * the type identity rides the discriminator column when yielded at the
    * top level (the engine's `_kind` convention for `(=name)` decorators).
    */
  final case class TypedRec(rec: E, name: String) extends E

  /** Scalar functions of the reference's doc/demo shaper surface → Spark
    * codegen'd equivalents (`split` is special-cased for literal-separator
    * quoting; aggregates live in [[ZedScript]]).
    */
  private val scalarFns = Map(
    "to_upper" -> "upper", "to_lower" -> "lower", "len" -> "length",
    "trim" -> "trim", "replace" -> "replace", "join" -> "array_join",
    "abs" -> "abs", "ceil" -> "ceil", "floor" -> "floor", "round" -> "round",
    "sqrt" -> "sqrt", "pow" -> "power", "coalesce" -> "coalesce",
    "lower" -> "lower", "upper" -> "upper")

  def sql(e: E): String = e match {
    case Raw(s) => s
    case Rec(fs) =>
      fs.map { case (n, v) => s"'${n.replace("'", "''")}', ${sql(v)}" }
        .mkString("named_struct(", ", ", ")")
    case TypedRec(rec, _) => sql(rec) // type identity handled at yield level
  }

  def err(msg: String): Nothing =
    throw new IllegalArgumentException(s"zed: $msg")

  /** Translate one expression (entire string) to SQL. */
  def translate(zed: String, env: Env): String = {
    val c = new Cursor(zed)
    val e = c.expr(env)
    c.ws()
    if (!c.eof) err(s"trailing content in Zed expression: ${c.rest}")
    sql(e)
  }

  /** Character cursor + recursive-descent expression parser. The script
    * parser ([[ZedScript]]) drives the same cursor through its grammar and
    * calls into [[expr]] at expression positions.
    */
  final class Cursor(val s: String) {
    var i = 0
    def mark: Int = i
    def reset(m: Int): Unit = i = m
    def eof: Boolean = { ws(); i >= s.length }
    def rest: String = s.drop(i).take(40)

    /** Skip whitespace and `//` line comments. */
    def ws(): Unit = {
      while (i < s.length &&
        (s.charAt(i).isWhitespace ||
          (s.charAt(i) == '/' && i + 1 < s.length && s.charAt(i + 1) == '/'))) {
        if (s.charAt(i) == '/') while (i < s.length && s.charAt(i) != '\n') i += 1
        else i += 1
      }
    }

    def peekChar: Char = { ws(); if (i < s.length) s.charAt(i) else '\u0000' }

    def expect(c: Char): Unit = {
      ws()
      if (i >= s.length || s.charAt(i) != c) err(s"expected '$c' at …$rest")
      i += 1
    }

    def ident(): String = {
      ws()
      val start = i
      while (i < s.length && (s.charAt(i).isLetterOrDigit || s.charAt(i) == '_')) i += 1
      if (i == start) err(s"expected identifier at …$rest")
      s.substring(start, i)
    }

    /** Does `tok` appear next (not glued onto a longer identifier)? */
    def peek(tok: String): Boolean = {
      ws()
      s.startsWith(tok, i) && {
        !tok.last.isLetterOrDigit || i + tok.length >= s.length ||
          !(s.charAt(i + tok.length).isLetterOrDigit || s.charAt(i + tok.length) == '_')
      }
    }

    def eat(tok: String): Boolean = { val ok = peek(tok); if (ok) i += tok.length; ok }

    /** Dotted path (no expression context — e.g. join keys, sort keys). */
    def pathName(): String = {
      val segs = scala.collection.mutable.ArrayBuffer(ident())
      while (i < s.length && s.charAt(i) == '.') { i += 1; segs += ident() }
      segs.mkString(".")
    }

    // ---- expression grammar -----------------------------------------------
    // expr := and ('or' and)* ; and := not ('and' not)* ; not := ['not'] cmp
    // cmp  := add (relop add | 'in' '[' …,* ']')?
    // add  := mul (('+'|'-') mul)* ; mul := postfix (('*'|'/'|'%') postfix)*
    // postfix := primary ('[' expr ']' | '.' ident)*

    def expr(env: Env): E = {
      var l = andExpr(env)
      while (eat("or")) l = Raw(s"(${sql(l)} OR ${sql(andExpr(env))})")
      l
    }

    private def andExpr(env: Env): E = {
      var l = notExpr(env)
      while (eat("and")) l = Raw(s"(${sql(l)} AND ${sql(notExpr(env))})")
      l
    }

    private def notExpr(env: Env): E =
      if (eat("!") || eat("not")) Raw(s"(NOT ${sql(notExpr(env))})")
      else cmp(env)

    private def cmp(env: Env): E = {
      val l = add(env)
      ws()
      if (eat("==")) Raw(s"(${sql(l)} = ${sql(add(env))})")
      else if (eat("!=")) Raw(s"(${sql(l)} <> ${sql(add(env))})")
      else if (eat("<=")) Raw(s"(${sql(l)} <= ${sql(add(env))})")
      else if (eat(">=")) Raw(s"(${sql(l)} >= ${sql(add(env))})")
      else if (eat("<")) Raw(s"(${sql(l)} < ${sql(add(env))})")
      else if (!peek("=>") && eat("=")) Raw(s"(${sql(l)} = ${sql(add(env))})")
      else if (peek("in") && {
        val save = i; i += 2; ws()
        val isList = i < s.length && s.charAt(i) == '['
        i = save; isList
      }) {
        i += 2; ws(); expect('[')
        val items = scala.collection.mutable.ArrayBuffer[E]()
        ws()
        while (i < s.length && s.charAt(i) != ']') {
          items += add(env)
          ws()
          if (i < s.length && s.charAt(i) == ',') { i += 1; ws() }
        }
        expect(']')
        Raw(s"(${sql(l)} IN (${items.map(sql).mkString(", ")}))")
      } else l
    }

    private def add(env: Env): E = {
      var l = mul(env)
      var done = false
      while (!done) {
        ws()
        if (i < s.length && s.charAt(i) == '+') { i += 1; l = Raw(s"(${sql(l)} + ${sql(mul(env))})") }
        else if (i < s.length && s.charAt(i) == '-' &&
          // binary minus needs a left operand boundary; `->`/`-- ` don't occur
          (i + 1 >= s.length || s.charAt(i + 1) != '=')) {
          i += 1; l = Raw(s"(${sql(l)} - ${sql(mul(env))})")
        } else done = true
      }
      l
    }

    private def mul(env: Env): E = {
      var l = postfix(env)
      var done = false
      while (!done) {
        ws()
        if (i < s.length && s.charAt(i) == '*') { i += 1; l = Raw(s"(${sql(l)} * ${sql(postfix(env))})") }
        else if (i < s.length && s.charAt(i) == '/' &&
          !(i + 1 < s.length && s.charAt(i + 1) == '/')) {
          i += 1; l = Raw(s"(${sql(l)} / ${sql(postfix(env))})")
        }
        else if (i < s.length && s.charAt(i) == '%') { i += 1; l = Raw(s"(${sql(l)} % ${sql(postfix(env))})") }
        else done = true
      }
      l
    }

    private def postfix(env: Env): E = {
      var l = primary(env)
      var done = false
      while (!done) {
        // no ws() before '[': a subscript binds tightly to its base
        if (i < s.length && s.charAt(i) == '[') {
          i += 1
          val idx = expr(env)
          expect(']')
          l = Raw(s"${sql(l)}[${sql(idx)}]")
        } else if (i < s.length && s.charAt(i) == '.') {
          i += 1
          l = Raw(s"${sql(l)}.`${ident()}`")
        } else done = true
      }
      l
    }

    private def primary(env: Env): E = {
      ws()
      if (i >= s.length) err("expected an expression")
      s.charAt(i) match {
        case '(' => i += 1; val e = expr(env); ws(); expect(')'); Raw(s"(${sql(e)})")
        case '{' => record(env)
        case '"' => Raw(stringLit())
        case c if c.isDigit => Raw(number())
        case '-' => Raw(number())
        case _ =>
          val id = ident()
          ws()
          if (i < s.length && s.charAt(i) == '(') call(id, env)
          else id match {
            case "null" => Raw("NULL")
            case "true" => Raw("TRUE")
            case "false" => Raw("FALSE")
            case _ => path(id, env)
          }
      }
    }

    /** Field path: keep `left.`/`right.`/`in.` roots, rewrite `this`, prefix
      * bare paths with the env root (or leave bare for script scope), and
      * substitute consts. Segments are backquoted — `left`, `in`, `value`
      * are SQL keywords in various positions.
      */
    private def path(first: String, env: Env): E = {
      val segs = scala.collection.mutable.ArrayBuffer(first)
      while (i < s.length && s.charAt(i) == '.') { i += 1; segs += ident() }
      if (segs.length == 1 && env.consts.contains(first))
        return Raw(s"(${env.consts(first)})")
      val rooted: Seq[String] = segs.head match {
        case "left" | "right" | "in" => segs.toSeq
        case "this" =>
          env.root match {
            case Some(r) => if (segs.tail.isEmpty) Seq(r) else r +: segs.tail.toSeq
            case None =>
              // script scope: `this` is the whole record
              if (segs.tail.isEmpty) return Raw("struct(*)")
              else segs.tail.toSeq
          }
        case _ => env.root match {
          case Some(r) => r +: segs.toSeq
          case None => segs.toSeq
        }
      }
      Raw(rooted.map(seg => s"`$seg`").mkString("."))
    }

    /** Supported call forms: `is(<name>)` named-type tests, the
      * `cast(null, typeof(x))` tombstone idiom, `cast(rec, name)` casts to a
      * DECLARED named type (record decorated with the discriminator — see
      * [[TypedRec]]), and the scalar function table below (the functions the
      * reference's docs/demo shapers use, mapped to their codegen'd Spark
      * equivalents). Anything else is outside the surface and raises.
      */
    private def call(name: String, env: Env): E = {
      expect('(')
      name match {
        case "is" =>
          ws(); expect('<')
          val tn = ident()
          ws(); expect('>'); ws(); expect(')')
          // null-safe: rows without a discriminator are plain records, so
          // is() is false (and `not is()` true) rather than null-filtered
          Raw(s"coalesce(`${env.kindCol}` = '$tn', false)")
        case "cast" =>
          val v = expr(env); ws(); expect(',')
          ws()
          if (peekChar.isLetter && !peek("typeof")) {
            // cast to a DECLARED named type: keep the record, tag the type
            val tn = ident()
            ws(); expect(')')
            if (!env.namedTypes.contains(tn))
              err(s"cast to undeclared named type $tn (declare with `type $tn = {…}`)")
            TypedRec(v, tn)
          } else {
            val fn = ident(); ws(); expect('(')
            val _ = expr(env) // the typeof argument — type-only, no value
            ws(); expect(')'); ws(); expect(')')
            if (fn != "typeof" || sql(v) != "NULL")
              err(s"only cast(null, typeof(x)) is supported, got cast(${sql(v)}, $fn(…))")
            Raw("NULL")
          }
        case "split" =>
          // Zed split is by a literal separator; Spark's is by Java regex —
          // literal separators are regex-quoted so `.`/`|` split literally
          val a = expr(env); ws(); expect(',')
          val b = expr(env); ws(); expect(')')
          val sep = sql(b) match {
            case lit if lit.startsWith("'") && lit.endsWith("'") =>
              "'\\\\Q" + lit.substring(1, lit.length - 1) + "\\\\E'"
            case other => other // non-literal separator: caller gets regex semantics
          }
          Raw(s"split(${sql(a)}, $sep)")
        case other =>
          scalarFns.get(other) match {
            case Some(sparkFn) =>
              val args = scala.collection.mutable.ArrayBuffer[E]()
              ws()
              while (peekChar != ')') {
                args += expr(env)
                ws()
                if (peekChar == ',') { i += 1; ws() }
              }
              expect(')')
              Raw(s"$sparkFn(${args.map(sql).mkString(", ")})")
            case None => err(s"unsupported Zed function in expression: $other(…)")
          }
      }
    }

    def record(env: Env): E = {
      expect('{')
      val fields = scala.collection.mutable.ArrayBuffer[(String, E)]()
      ws()
      while (i < s.length && s.charAt(i) != '}') {
        // quoted field names come back RAW — sql(Rec) escapes once at
        // emission; stripping stringLit's SQL form would double-escape
        val name = if (s.charAt(i) == '"') rawString() else ident()
        ws(); expect(':')
        fields += name -> expr(env)
        ws()
        if (i < s.length && s.charAt(i) == ',') { i += 1; ws() }
      }
      expect('}')
      Rec(fields.toSeq)
    }

    /** Zed double-quoted string → its RAW (unescaped) content. */
    def rawString(): String = {
      expect('"')
      val b = new StringBuilder
      while (i < s.length && s.charAt(i) != '"') {
        val c = s.charAt(i)
        if (c == '\\' && i + 1 < s.length) {
          i += 1
          b.append(s.charAt(i) match {
            case 'n' => '\n'; case 't' => '\t'; case 'r' => '\r'
            case other => other
          })
        } else b.append(c)
        i += 1
      }
      expect('"')
      b.toString
    }

    /** Zed double-quoted string → SQL single-quoted string. */
    def stringLit(): String = {
      val b = new StringBuilder(rawString())
      // re-escape for Spark SQL: the parser above UNESCAPED Zed sequences
      // into real chars, and Spark's string literals process backslash
      // escapes (the split() literal-quoting below depends on exactly that),
      // so raw backslashes must double or they'd mangle the literal
      "'" + b.toString.replace("\\", "\\\\").replace("'", "''") + "'"
    }

    def number(): String = {
      ws()
      val start = i
      if (i < s.length && s.charAt(i) == '-') i += 1
      while (i < s.length && (s.charAt(i).isDigit || s.charAt(i) == '.')) i += 1
      // signed scientific exponent: 1e-5, 2E+3
      if (i < s.length && (s.charAt(i) == 'e' || s.charAt(i) == 'E') &&
        i > start && s.charAt(i - 1).isDigit) {
        val expStart = i
        i += 1
        if (i < s.length && (s.charAt(i) == '+' || s.charAt(i) == '-')) i += 1
        if (i < s.length && s.charAt(i).isDigit) {
          while (i < s.length && s.charAt(i).isDigit) i += 1
        } else i = expStart // bare `e` glued to a number is not an exponent
      }
      if (i == start || (i == start + 1 && s.charAt(start) == '-'))
        err(s"expected a number at …$rest")
      s.substring(start, i)
    }
  }
}
