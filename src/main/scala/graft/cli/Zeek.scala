package graft.cli

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Zeek TSV log format for `consume -f zeek` / `produce *.zeek` — the
  * network-monitor log format the reference's consume can emit through the
  * zed CLI's output formats (cmd/zync/consume/command.go:71-107; zed ships a
  * zeekio reader/writer). The reference repo carries no zeek fixtures, so
  * semantics here follow the public zeek log conventions, pinned by
  * self-golden specs:
  *
  *  - A log is a header block (`#separator`, `#set_separator`,
  *    `#empty_field`, `#unset_field`, `#path`, `#fields`, `#types`) followed
  *    by tab-separated value lines.
  *  - A top-level string `_path` column maps to the `#path` header (the
  *    zeek/zed convention) and is dropped from the field list; a new header
  *    block starts whenever the path changes mid-stream — exactly how zed's
  *    zeekio writer handles heterogeneous streams.
  *  - Types: bool (T/F), int, double, time (epoch seconds, 6 decimals),
  *    string, vector[T]. Nested records flatten to dotted field names (the
  *    zeek `id.orig_h` convention); any other Spark type renders as its
  *    single-line ZSON text under type `string`.
  *  - null → `-` (unset), empty string/vector → `(empty)`, vector elements
  *    joined by `,`. Cells that would collide with a separator or marker are
  *    hex-escaped (`\x09`, `\x2c`, leading `\x2d` / `\x28`), the zeek
  *    convention for ambiguous values.
  *
  * Rendering happens driver-side over the collected rows, matching the
  * consume contract (a consume is a terminal, stdout-scale read).
  */
object Zeek {

  private val Hex = "0123456789abcdef"

  def zeekType(dt: DataType): String = dt match {
    case LongType | IntegerType | ShortType | ByteType => "int"
    case DoubleType | FloatType                        => "double"
    case BooleanType                                   => "bool"
    case TimestampType | TimestampNTZType              => "time"
    case ArrayType(et, _)                              => s"vector[${zeekType(et)}]"
    case _                                             => "string"
  }

  private def hexEscape(c: Char): String =
    s"\\x${Hex((c >> 4) & 0xf)}${Hex(c & 0xf)}"

  /** Escape one scalar cell: tabs/newlines/backslashes always; a leading
    * `-` or `(` only when the cell would otherwise read back as the unset /
    * empty marker; commas only inside collection elements.
    */
  private def escapeCell(s: String, inSet: Boolean): String = {
    val b = new StringBuilder(s.length + 8)
    s.foreach {
      case '\t'          => b.append("\\x09")
      case '\n'          => b.append("\\x0a")
      case '\r'          => b.append("\\x0d")
      case '\\'          => b.append("\\\\")
      case ',' if inSet  => b.append("\\x2c")
      case c if c < 0x20 => b.append(hexEscape(c))
      case c             => b.append(c)
    }
    val out = b.toString
    if (out == "-") "\\x2d"
    else if (out == "(empty)") "\\x28empty)"
    else out
  }

  private def timeText(micros: Long): String = {
    val sign = if (micros < 0) "-" else ""
    val abs = math.abs(micros)
    s"$sign${abs / 1000000}.${"%06d".format(abs % 1000000)}"
  }

  private def cell(v: Any, dt: DataType, inSet: Boolean): String = (v, dt) match {
    case (null, _)                 => "-"
    case ("", _)                   => "(empty)"
    case (b: Boolean, _)           => if (b) "T" else "F"
    case (t: java.sql.Timestamp, _) =>
      timeText(t.getTime * 1000 + (t.getNanos / 1000) % 1000)
    case (t: java.time.LocalDateTime, _) =>
      val inst = t.toInstant(java.time.ZoneOffset.UTC)
      timeText(inst.getEpochSecond * 1000000 + inst.getNano / 1000)
    case (xs: scala.collection.Seq[_], ArrayType(et, _)) =>
      if (xs.isEmpty) "(empty)"
      else xs.map(x => cell(x, et, inSet = true)).mkString(",")
    case (s: String, StringType)   => escapeCell(s, inSet)
    case (n, LongType | IntegerType | ShortType | ByteType |
             DoubleType | FloatType) => n.toString
    case (other, odt)              => escapeCell(Tabular.zsonText(other, odt), inSet)
  }

  /** Render a record stream as zeek TSV lines. Rows must share `df`'s
    * schema (a pool scan's merged schema satisfies this); blocks split on
    * `_path` changes.
    */
  def write(df: DataFrame): Seq[String] = {
    val schema = df.schema
    val pathIdx = schema.fields.indexWhere(f =>
      f.name == "_path" && f.dataType == StringType)
    val valueSchema = StructType(schema.fields.toIndexedSeq.filterNot(_.name == "_path"))
    val leaves = Tabular.flattenSchema(valueSchema)
    val header = Seq(
      "#separator \\x09",
      "#set_separator\t,",
      "#empty_field\t(empty)",
      "#unset_field\t-")
    val fieldsLine = "#fields\t" + leaves.map(_._1).mkString("\t")
    val typesLine = "#types\t" + leaves.map(l => zeekType(l._2)).mkString("\t")

    val out = Seq.newBuilder[String]
    var currentPath: Option[String] = None
    var started = false
    df.collect().foreach { row =>
      val path = if (pathIdx < 0) None
        else Option(row.get(pathIdx)).map(_.toString)
      if (!started || path != currentPath) {
        out ++= header
        path.foreach(p => out += s"#path\t${escapeCell(p, inSet = false)}")
        out += fieldsLine
        out += typesLine
        currentPath = path
        started = true
      }
      val values = Row.fromSeq(schema.fields.toIndexedSeq.zipWithIndex
        .filterNot(_._1.name == "_path").map { case (_, i) => row.get(i) })
      out += flattenCells(values, valueSchema).mkString("\t")
    }
    if (!started) out ++= header ++ Seq(fieldsLine, typesLine) // header-only empty log
    out.result()
  }

  private def flattenCells(row: Row, schema: StructType): Seq[String] =
    schema.fields.toIndexedSeq.zipWithIndex.flatMap { case (f, i) =>
      val v = if (row == null) null else row.get(i)
      f.dataType match {
        case st: StructType => flattenCells(v.asInstanceOf[Row], st)
        case dt             => Seq(cell(v, dt, inSet = false))
      }
    }

  // ---------------------------------------------------------------- reader

  private def unescape(s: String): String = {
    val b = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 'x' if i + 3 < s.length =>
            b.append(Integer.parseInt(s.substring(i + 2, i + 4), 16).toChar); i += 4
          case '\\' => b.append('\\'); i += 2
          case c    => b.append(c); i += 2
        }
      } else { b.append(s.charAt(i)); i += 1 }
    }
    b.toString
  }

  /** Parse zeek TSV text into JSON lines (the same bridge Zson/Zjson use, so
    * `produce` feeds them all through one schema-inferring reader). The
    * `#path` header is re-injected as a `_path` field on every row, the
    * zeek/zed convention. Dotted field names become nested JSON objects.
    */
  def toJsonLines(text: String): Seq[String] = {
    var sep = "\t"
    var setSep = ","
    var emptyField = "(empty)"
    var unsetField = "-"
    var path: Option[String] = None
    var fields: Seq[String] = Nil
    var types: Seq[String] = Nil
    val out = Seq.newBuilder[String]

    def jsonScalar(raw: String, tpe: String): Option[String] = {
      if (raw == unsetField) return None
      val baseType = tpe.takeWhile(_ != '[')
      if (baseType == "vector" || baseType == "set") {
        if (raw == emptyField) return Some("[]")
        val et = tpe.drop(baseType.length + 1).dropRight(1)
        return Some(raw.split(java.util.regex.Pattern.quote(setSep), -1)
          .toIndexedSeq.flatMap(e => jsonScalar(e, et)).mkString("[", ",", "]"))
      }
      val v = if (raw == emptyField) "" else unescape(raw)
      Some(tpe match {
        case "bool"             => if (v == "T") "true" else "false"
        case "int" | "count" | "port" => v
        case "double" | "time" | "interval" => v
        case _                  => graft.codec.MiniJson.quote(v)
      })
    }

    def render(cells: Seq[String]): String = {
      // dotted names → nested objects, preserving field order per prefix
      val entries = fields.zip(types).zip(cells)
        .flatMap { case ((f, t), c) => jsonScalar(c, t).map(j => (f.split('.').toSeq, j)) }
      def obj(pairs: Seq[(Seq[String], String)]): String =
        pairs.groupBy(_._1.head).toSeq
          .sortBy { case (h, _) => pairs.indexWhere(_._1.head == h) }
          .map { case (h, grp) =>
            val inner = grp.map { case (p, j) => (p.tail, j) }
            val v = if (inner.exists(_._1.isEmpty)) inner.find(_._1.isEmpty).get._2
              else obj(inner)
            s"${graft.codec.MiniJson.quote(h)}:$v"
          }.mkString("{", ",", "}")
      val pathEntry = path.map(p => Seq((Seq("_path"), graft.codec.MiniJson.quote(p))))
        .getOrElse(Nil)
      obj(pathEntry ++ entries)
    }

    text.split("\n", -1).foreach { lineRaw =>
      val line = lineRaw.stripSuffix("\r")
      if (line.startsWith("#")) {
        val parts = line.split(java.util.regex.Pattern.quote(sep), -1).toIndexedSeq
        parts.head match {
          case "#separator" | "#separator \\x09" =>
            // written as "#separator \x09" with a literal space, per zeek
            val arg = line.drop("#separator ".length)
            sep = unescape(arg)
          case "#set_separator" => setSep = parts(1)
          case "#empty_field"   => emptyField = parts(1)
          case "#unset_field"   => unsetField = parts(1)
          case "#path"          => path = Some(unescape(parts(1)))
          case "#fields"        => fields = parts.tail.map(unescape)
          case "#types"         => types = parts.tail
          case _                => () // #open/#close timestamps: ignored
        }
      } else if (line.nonEmpty) {
        val cells = line.split(java.util.regex.Pattern.quote(sep), -1).toIndexedSeq
        require(cells.length == fields.length,
          s"zeek row has ${cells.length} cells for ${fields.length} fields: $line")
        out += render(cells)
      }
    }
    out.result()
  }
}
