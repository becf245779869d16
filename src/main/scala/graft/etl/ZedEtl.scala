package graft.etl

import scala.jdk.CollectionConverters._
import org.yaml.snakeyaml.Yaml

/** Reader for the reference's OWN ETL config format (etl/yaml.go:9-29):
  * `inputs`/`output` routes carry `{topic, pool}` pairs and each rule in
  * `transforms` carries a Zed expression surface — a `where` filter over the
  * bare record and a `zed` script assigning `out:={key:…, value:…}` — rather
  * than [[EtlYaml]]'s SQL fields. `demo/invoices.yaml` is the canonical
  * instance.
  *
  * The Zed surface those configs use (op filters, field paths, record
  * literals, `in [...]` membership, `cast(null, typeof(x))` — etl/yaml.go's
  * rules as exercised by demo/invoices.yaml and README.md:268-317) is
  * translated into the SQL rule model of [[Etl]]: record literals become
  * `named_struct`, `==` becomes `=`, double-quoted strings become SQL
  * strings, bare field paths bind to the rule's input struct (`in`; denorm
  * `join-on` paths already carry `left.`/`right.`). This is a TRANSLATOR for
  * the rule surface, not a general Zed compiler — unsupported constructs
  * raise with a clear message instead of mis-translating.
  *
  * Divergence, documented: `cast(null, typeof(x))` (the CDC delete-tombstone
  * idiom, demo/invoices.yaml:57-63) translates to an untyped SQL `NULL`.
  * The reference needs the typed null to keep Zed's per-record types; our
  * pools widen every batch to a nullable superset schema (SchemaUnion), so
  * a typed and an untyped null value are indistinguishable downstream.
  */
object ZedEtl {

  /** Parse a reference-format YAML config into the engine's [[EtlConfig]]. */
  def parse(text: String): EtlConfig = {
    val root = new Yaml().load[java.util.Map[String, Object]](text).asScala

    def route(m: collection.Map[String, Object]): (String, String) =
      (m.getOrElse("topic", err("route missing topic")).toString,
        m.getOrElse("pool", err("route missing pool")).toString)

    val inputs = root.getOrElse("inputs", err("missing inputs"))
      .asInstanceOf[java.util.List[java.util.Map[String, Object]]].asScala
      .map(m => route(m.asScala)).toSeq
    val pools = inputs.map(_._2).distinct
    require(pools.size == 1, s"all inputs must come from one pool, got $pools") // routes.go:66-69

    val (outTopic, outPool) = route(
      root.getOrElse("output", err("missing output"))
        .asInstanceOf[java.util.Map[String, Object]].asScala)

    val rules = root.getOrElse("transforms", err("missing transforms"))
      .asInstanceOf[java.util.List[java.util.Map[String, Object]]].asScala.map(_.asScala)
      .map { r =>
        def req(k: String): String = r.getOrElse(k, err(s"rule missing $k")).toString
        def opt(k: String): Option[String] = r.get(k).map(_.toString)
        val whereSql = opt("where").map(w => translate(w, bindRoot = Some("in")))
        val (outKey, outValue) = translateOutScript(req("zed"))
        req("type") match {
          case "stateless" =>
            StatelessRule(req("in"), whereSql, outKey, outValue)
          case "denorm" =>
            // join-on paths are already left./right.-rooted (yaml.go:24)
            DenormRule(req("left"), req("right"),
              translate(req("join-on"), bindRoot = None), whereSql, outKey, outValue)
          case other => err(s"unknown rule type $other")
        }
      }.toSeq
    require(rules.nonEmpty, "no transforms")

    EtlConfig(pools.head, outPool, Transform(inputs.map(_._1).distinct, outTopic, rules))
  }

  /** Translate one Zed `out:={…}` script into (outKey, outValue) SQL. */
  def translateOutScript(zed: String): (String, String) = {
    // scripts open with the Zed pipe continuation: `| out:={…}`
    val p = new P(zed.trim.stripPrefix("|"))
    p.ws()
    val target = p.ident()
    require(target == "out", s"expected `out:=` assignment, got `$target`")
    p.ws(); p.expect(':'); p.expect('=')
    val e = p.expr(Some("in"))
    p.ws()
    require(p.eof, s"trailing content after out:= expression: ${p.rest}")
    e match {
      case Rec(fields) =>
        val f = fields.toMap
        (sql(f.getOrElse("key", err("out record has no key field"))),
          sql(f.getOrElse("value", err("out record has no value field"))))
      case _ => err("out:= must assign a record literal {key:…, value:…}")
    }
  }

  /** Translate one Zed expression to a SQL string. Bare field paths are
    * prefixed with `bindRoot` (None = paths must already be rooted, as in
    * denorm `join-on`).
    */
  def translate(zed: String, bindRoot: Option[String]): String = {
    val p = new P(zed)
    val e = p.expr(bindRoot)
    p.ws()
    require(p.eof, s"trailing content in Zed expression: ${p.rest}")
    sql(e)
  }

  // ---- tiny AST -----------------------------------------------------------
  private sealed trait E
  private final case class Raw(s: String) extends E // already-SQL fragment
  private final case class Rec(fields: Seq[(String, E)]) extends E

  private def sql(e: E): String = e match {
    case Raw(s) => s
    case Rec(fs) =>
      fs.map { case (n, v) => s"'${n.replace("'", "''")}', ${sql(v)}" }
        .mkString("named_struct(", ", ", ")")
  }

  private def err(msg: String): Nothing =
    throw new IllegalArgumentException(s"zed etl: $msg")

  // ---- recursive-descent parser over the rule-expression subset -----------
  private final class P(s: String) {
    private var i = 0
    def eof: Boolean = { ws(); i >= s.length }
    def rest: String = s.drop(i).take(40)

    def ws(): Unit = while (i < s.length && s.charAt(i).isWhitespace) i += 1

    def expect(c: Char): Unit = {
      if (i >= s.length || s.charAt(i) != c) err(s"expected '$c' at …${rest}")
      i += 1
    }

    def ident(): String = {
      ws()
      val start = i
      while (i < s.length && (s.charAt(i).isLetterOrDigit || s.charAt(i) == '_')) i += 1
      if (i == start) err(s"expected identifier at …$rest")
      s.substring(start, i)
    }

    private def peek(tok: String): Boolean = {
      ws()
      s.startsWith(tok, i) && {
        // keywords must not glue onto a longer identifier
        !tok.last.isLetter || i + tok.length >= s.length ||
          !(s.charAt(i + tok.length).isLetterOrDigit || s.charAt(i + tok.length) == '_')
      }
    }

    private def eat(tok: String): Boolean = { val ok = peek(tok); if (ok) i += tok.length; ok }

    /** expr := and ('or' and)* */
    def expr(root: Option[String]): E = {
      var l = andExpr(root)
      while (eat("or")) l = Raw(s"(${sql(l)} OR ${sql(andExpr(root))})")
      l
    }

    private def andExpr(root: Option[String]): E = {
      var l = notExpr(root)
      while (eat("and")) l = Raw(s"(${sql(l)} AND ${sql(notExpr(root))})")
      l
    }

    private def notExpr(root: Option[String]): E =
      if (eat("!") || eat("not")) Raw(s"(NOT ${sql(notExpr(root))})")
      else cmp(root)

    /** cmp := primary (op primary | 'in' '[' lit,* ']')? */
    private def cmp(root: Option[String]): E = {
      val l = primary(root)
      ws()
      if (eat("==")) Raw(s"(${sql(l)} = ${sql(primary(root))})")
      else if (eat("!=")) Raw(s"(${sql(l)} <> ${sql(primary(root))})")
      else if (eat("<=")) Raw(s"(${sql(l)} <= ${sql(primary(root))})")
      else if (eat(">=")) Raw(s"(${sql(l)} >= ${sql(primary(root))})")
      else if (eat("<")) Raw(s"(${sql(l)} < ${sql(primary(root))})")
      else if (eat(">")) Raw(s"(${sql(l)} > ${sql(primary(root))})")
      else if (eat("=")) Raw(s"(${sql(l)} = ${sql(primary(root))})")
      else if (peek("in") && { val save = i; i += 2; ws(); val isList = i < s.length && s.charAt(i) == '['; i = save; isList }) {
        i += 2; ws(); expect('[')
        val items = scala.collection.mutable.ArrayBuffer[E]()
        ws()
        while (i < s.length && s.charAt(i) != ']') {
          items += primary(root)
          ws()
          if (i < s.length && s.charAt(i) == ',') { i += 1; ws() }
        }
        expect(']')
        Raw(s"(${sql(l)} IN (${items.map(sql).mkString(", ")}))")
      } else l
    }

    private def primary(root: Option[String]): E = {
      ws()
      if (i >= s.length) err("expected an expression")
      s.charAt(i) match {
        case '(' => i += 1; val e = expr(root); ws(); expect(')'); Raw(s"(${sql(e)})")
        case '{' => record(root)
        case '"' => Raw(stringLit())
        case c if c.isDigit || c == '-' => Raw(number())
        case _ =>
          val id = ident()
          ws()
          if (i < s.length && s.charAt(i) == '(') call(id, root)
          else id match {
            case "null" => Raw("NULL")
            case "true" => Raw("TRUE")
            case "false" => Raw("FALSE")
            case _ => path(id, root)
          }
      }
    }

    /** Field path: keep `left.`/`right.`/`in.` roots, rewrite `this`, prefix
      * bare paths with the bound root. Segments are backquoted — `left`,
      * `in`, `value` are SQL keywords in various positions.
      */
    private def path(first: String, root: Option[String]): E = {
      val segs = scala.collection.mutable.ArrayBuffer(first)
      while (i < s.length && s.charAt(i) == '.') { i += 1; segs += ident() }
      val rooted: Seq[String] = segs.head match {
        case "left" | "right" | "in" => segs.toSeq
        case "this" =>
          root.getOrElse(err("`this` used where no record is bound")) +: segs.tail.toSeq
        case _ => root match {
          case Some(r) => r +: segs.toSeq
          case None => err(s"unrooted path ${segs.mkString(".")} in a left/right-rooted context")
        }
      }
      Raw(rooted.map(seg => s"`$seg`").mkString("."))
    }

    /** The one supported call form: `cast(null, typeof(x))` → untyped NULL
      * (see the class doc for why this is sound here). Anything else is
      * outside the rule surface and raises.
      */
    private def call(name: String, root: Option[String]): E = {
      expect('(')
      name match {
        case "cast" =>
          val v = expr(root); ws(); expect(',')
          ws()
          val fn = ident(); ws(); expect('(')
          val _ = expr(root) // the typeof argument — type-only, no value
          ws(); expect(')'); ws(); expect(')')
          if (fn != "typeof" || sql(v) != "NULL")
            err(s"only cast(null, typeof(x)) is supported, got cast(${sql(v)}, $fn(…))")
          Raw("NULL")
        case other => err(s"unsupported Zed function in rule expression: $other(…)")
      }
    }

    private def record(root: Option[String]): E = {
      expect('{')
      val fields = scala.collection.mutable.ArrayBuffer[(String, E)]()
      ws()
      while (i < s.length && s.charAt(i) != '}') {
        val name = if (s.charAt(i) == '"') {
          val q = stringLit(); q.substring(1, q.length - 1)
        } else ident()
        ws(); expect(':')
        fields += name -> expr(root)
        ws()
        if (i < s.length && s.charAt(i) == ',') { i += 1; ws() }
      }
      expect('}')
      Rec(fields.toSeq)
    }

    /** Zed double-quoted string → SQL single-quoted string. */
    private def stringLit(): String = {
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
      "'" + b.toString.replace("'", "''") + "'"
    }

    private def number(): String = {
      val start = i
      if (s.charAt(i) == '-') i += 1
      while (i < s.length && (s.charAt(i).isDigit || s.charAt(i) == '.' ||
        s.charAt(i) == 'e' || s.charAt(i) == 'E')) i += 1
      s.substring(start, i)
    }
  }
}
