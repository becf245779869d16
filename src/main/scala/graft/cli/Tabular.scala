package graft.cli

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Tabular / line-oriented output formats for `consume`: csv, tsv, text,
  * table, line. The reference's consume writes any zed output format
  * (cmd/zync/consume/command.go:71-107 via the zed CLI's outputflags); the
  * reference repo carries no fixtures for these text formats, so the
  * semantics here are self-defined from the public zed docs and pinned by
  * self-golden specs:
  *
  *  - '''csv/tsv''' flatten nested records into dotted column paths with a
  *    single header line. The zed writer demands uniform records ("CSV
  *    output requires uniform records ... consider 'fuse'"); a pool scan
  *    already presents one merged superset schema (pool/Pool.scala read()),
  *    so the fuse is built into the scan and the stream is uniform by
  *    construction. csv quotes per RFC 4180; tsv backslash-escapes embedded
  *    tab/newline/backslash. null renders as an empty cell.
  *  - '''text''' is the values-only form: the same flattened leaf cells,
  *    tab-separated, no header, null rendered "-" (the zeek-ish convention).
  *  - '''table''' adds the header and pads every column to its widest cell
  *    (single block — one schema per scan, so no mid-stream header breaks).
  *  - '''line''' emits one value per line: a lone top-level string column is
  *    written raw, anything else as single-line ZSON text.
  *
  * Rendering happens driver-side over the collected rows, matching the
  * existing consume contract (a consume is a terminal, stdout-scale read;
  * the reference's consume is likewise a single-process formatter).
  */
object Tabular {

  /** Leaf columns of a schema in declaration order: structs recurse into
    * dotted paths; arrays/maps/binary stay whole as single (ZSON-rendered)
    * cells.
    */
  def flattenSchema(schema: StructType, prefix: String = ""): Seq[(String, DataType)] =
    schema.fields.toIndexedSeq.flatMap { f =>
      val path = if (prefix.isEmpty) f.name else s"$prefix.${f.name}"
      f.dataType match {
        case st: StructType => flattenSchema(st, path)
        case dt             => Seq(path -> dt)
      }
    }

  /** The same leaves extracted from one row (null structs yield null leaves). */
  private def flattenRow(row: Row, schema: StructType): Seq[(DataType, Any)] =
    schema.fields.toIndexedSeq.zipWithIndex.flatMap { case (f, i) =>
      val v = if (row == null) null else row.get(i)
      f.dataType match {
        case st: StructType => flattenRow(v.asInstanceOf[Row], st)
        case dt             => Seq(dt -> v)
      }
    }

  /** Single-line ZSON text for any Spark value — used for composite cells
    * and the `line` format. Mirrors Zson.fromJsonLine's output on records
    * but works from typed rows, so null fields stay present (toJSON drops
    * them) and binary/timestamp get their ZSON-native spellings.
    */
  def zsonText(v: Any, dt: DataType): String = (v, dt) match {
    case (null, _) => "null"
    case (s: String, _) => graft.codec.MiniJson.quote(s)
    case (b: Array[Byte], _) => "0x" + b.map("%02x".format(_)).mkString
    case (t: java.sql.Timestamp, _) => t.toInstant.toString
    case (d: java.sql.Date, _) => d.toString
    case (xs: scala.collection.Seq[_], ArrayType(et, _)) =>
      xs.map(zsonText(_, et)).mkString("[", ",", "]")
    case (m: scala.collection.Map[_, _], MapType(kt, vt, _)) =>
      if (m.isEmpty) "|{}|"
      else m.toSeq.map { case (k, x) => s"${zsonText(k, kt)}:${zsonText(x, vt)}" }
        .mkString("|{", ",", "}|")
    case (r: Row, st: StructType) =>
      // a string `_type` field is the stored spelling of a ZSON named-type
      // decorator (Zson.toJsonLines injects it) — restore `{...}(=name)`
      // exactly as Zson.fromJsonLine does, so -f line and -f zson agree
      val fields = st.fields.toIndexedSeq.zipWithIndex
      val decorator = fields.collectFirst {
        case (f, i) if f.name == "_type" && f.dataType == StringType &&
          !r.isNullAt(i) => r.getString(i)
      }
      val body = fields
        .filterNot { case (f, _) => decorator.isDefined && f.name == "_type" }
        .map { case (f, i) =>
          val key = if (Zson.isBareName(f.name)) f.name
            else graft.codec.MiniJson.quote(f.name)
          s"$key:${zsonText(r.get(i), f.dataType)}"
        }.mkString("{", ",", "}")
      decorator.fold(body)(d => s"$body(=$d)")
    case (other, _) => other.toString
  }

  /** Raw (unescaped) cell text: strings bare, composites as ZSON, null as
    * the format's null spelling.
    */
  private def cellText(v: Any, dt: DataType, nullAs: String): String = (v, dt) match {
    case (null, _) => nullAs
    case (s: String, _) => s
    case _ => zsonText(v, dt)
  }

  private def csvQuote(cell: String): String =
    if (cell.exists(c => c == ',' || c == '"' || c == '\n' || c == '\r'))
      "\"" + cell.replace("\"", "\"\"") + "\""
    else cell

  private def tsvEscape(cell: String): String =
    cell.replace("\\", "\\\\").replace("\t", "\\t").replace("\n", "\\n").replace("\r", "\\r")

  private def collectCells(df: DataFrame, nullAs: String): (Seq[String], Seq[Seq[String]]) = {
    val header = flattenSchema(df.schema).map(_._1)
    val rows = df.collect().toIndexedSeq.map { row =>
      flattenRow(row, df.schema).map { case (dt, v) => cellText(v, dt, nullAs) }
    }
    (header, rows)
  }

  def csv(df: DataFrame): Seq[String] = {
    val (header, rows) = collectCells(df, nullAs = "")
    header.map(csvQuote).mkString(",") +: rows.map(_.map(csvQuote).mkString(","))
  }

  def tsv(df: DataFrame): Seq[String] = {
    val (header, rows) = collectCells(df, nullAs = "")
    header.map(tsvEscape).mkString("\t") +: rows.map(_.map(tsvEscape).mkString("\t"))
  }

  def text(df: DataFrame): Seq[String] =
    collectCells(df, nullAs = "-")._2.map(_.map(tsvEscape).mkString("\t"))

  def table(df: DataFrame): Seq[String] = {
    // cells are backslash-escaped like tsv/text: an embedded newline or tab
    // would break the one-line-per-element contract and the column alignment
    val (header, raw) = collectCells(df, nullAs = "-")
    val all = (header +: raw).map(_.map(tsvEscape))
    val widths = header.indices.map(i => all.map(_(i).length).max)
    all.map { cells =>
      cells.zipWithIndex.map { case (c, i) => c.padTo(widths(i), ' ') }
        .mkString(" ").replaceAll("\\s+$", "")
    }
  }

  def line(df: DataFrame): Seq[String] = df.schema.fields.toSeq match {
    case Seq(f) if f.dataType == StringType =>
      df.collect().toIndexedSeq.map(r => if (r.isNullAt(0)) "null" else r.getString(0))
    case _ =>
      val schema = df.schema
      df.collect().toIndexedSeq.map(r => zsonText(r, schema))
  }
}
