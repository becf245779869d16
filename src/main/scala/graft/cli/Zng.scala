package graft.cli

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import graft.codec.MiniJson
import net.jpountz.lz4.LZ4Factory

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.UTF_8
import scala.collection.mutable

/** ZNG (binary Zed) reader/writer for `produce`, covering the frame-based
  * format of zed v1.14 (the version the reference pins in go.mod; its
  * produce reads any Zed format via zio/anyio — cmd/zync/produce/command.go:72-81).
  * Decoded records are rendered as JSON lines with the same conventions as
  * [[Zson]] (named record types inject a leading `_type` discriminator
  * field), so a `.zng` file and its `.zson` twin produce identical pool
  * contents.
  *
  * Format, per the public ZNG spec (brimdata/zed docs/formats/zng.md):
  *  - a stream is a sequence of frames; the byte 0xff is end-of-stream and
  *    resets the type context (typedef ids restart at 30).
  *  - frame header byte `0 C TT LLLL`: C = compressed payload, TT = frame
  *    type (0 types / 1 values / 2 control), LLLL = low 4 bits of the
  *    payload length; the remaining length bits follow as a uvarint
  *    (len = uvarint<<4 | LLLL).
  *  - a compressed payload is uvarint(format: 0 = LZ4 block) +
  *    uvarint(uncompressed size) + the compressed bytes (lz4-java ships
  *    with Spark).
  *  - a types frame is a sequence of typedefs, each binding the next
  *    sequential id from 30 up: 0 record, 1 array, 2 set, 3 map, 4 union,
  *    5 enum, 6 error, 7 named. Names are counted strings
  *    (uvarint length + UTF-8 bytes); child types are uvarint ids.
  *  - a values frame is a sequence of values: uvarint(type id) followed by
  *    the tag-encoded body. A tag is uvarint(0) for null, else
  *    uvarint(len + 1) + len body bytes. Container bodies are the
  *    concatenation of their children's tag-encoded values; a union body is
  *    tag(int64 selector) + tag(value).
  *  - primitive bodies: unsigned ints are minimal little-endian; signed
  *    ints (and time/duration, signed nanoseconds) are zigzag-encoded then
  *    minimal little-endian; floats are fixed-width IEEE little-endian;
  *    bool is one byte; string is UTF-8; bytes is raw.
  *  - control frames are application-defined and skipped, as the spec
  *    directs for readers that don't understand them.
  *
  * Scope, mirroring [[Zson]]'s fixture-driven subset and erring loudly
  * beyond it: records, arrays, sets (rendered as JSON arrays), enums
  * (rendered as their symbol), unions, named types, errors, and the
  * primitives through 64 bits plus string/bytes/bool/null/time/duration/
  * ip/net. 128/256-bit ints, decimals, and first-class `type` values raise
  * a clear error — nothing the reference's fixtures or demo flows emit.
  * No zed binary exists in this sandbox (zero egress), so byte-level
  * interop is asserted against this file's own writer; the encoding
  * follows the published spec so real zed output of the supported subset
  * decodes too.
  */
object Zng {

  // Primitive type ids (zed/zed.go, public API).
  private val IdUint8 = 0
  private val IdUint64 = 3
  private val IdInt8 = 6
  private val IdInt64 = 9
  private val IdDuration = 12
  private val IdTime = 13
  private val IdFloat16 = 14
  private val IdFloat32 = 15
  private val IdFloat64 = 16
  private val IdBool = 23
  private val IdBytes = 24
  private val IdString = 25
  private val IdIp = 26
  private val IdNet = 27
  private val IdType = 28
  private val IdNull = 29
  private val FirstDefId = 30

  private val FrameTypes = 0
  private val FrameValues = 1
  private val FrameControl = 2

  sealed trait ZType
  private final case class ZPrim(id: Int) extends ZType
  private final case class ZRecord(fields: Vector[(String, ZType)]) extends ZType
  private final case class ZArray(elem: ZType) extends ZType
  private final case class ZSet(elem: ZType) extends ZType
  private final case class ZMap(key: ZType, value: ZType) extends ZType
  private final case class ZUnion(branches: Vector[ZType]) extends ZType
  private final case class ZEnum(symbols: Vector[String]) extends ZType
  private final case class ZError(inner: ZType) extends ZType
  private final case class ZNamed(name: String, inner: ZType) extends ZType

  private def fail(pos: Int, msg: String): Nothing =
    throw new IllegalArgumentException(s"ZNG decode error at byte $pos: $msg")

  // ---------------------------------------------------------------- reader

  /** Decode a whole ZNG stream to JSON lines (one per top-level value). */
  def readJsonLines(bytes: Array[Byte]): Seq[String] = {
    val out = mutable.ArrayBuffer[String]()
    val defs = mutable.ArrayBuffer[ZType]() // ids FirstDefId+
    var pos = 0
    while (pos < bytes.length) {
      val hdr = bytes(pos) & 0xff
      if (hdr == 0xff) { pos += 1; defs.clear() } // end-of-stream: reset context
      else {
        if ((hdr & 0x80) != 0) fail(pos, f"bad frame header 0x$hdr%02x (high bit set, not EOS)")
        val compressed = (hdr & 0x40) != 0
        val ftype = (hdr >> 4) & 0x3
        val (lenHi, afterLen) = uvarint(bytes, pos + 1, bytes.length)
        if (lenHi > (Int.MaxValue >> 4)) fail(pos, s"frame length overflow ($lenHi<<4)")
        val len = (lenHi.toInt << 4) | (hdr & 0xf)
        if (afterLen + len > bytes.length)
          fail(pos, s"frame length $len overruns stream (${bytes.length - afterLen} bytes left)")
        val payload =
          if (compressed) decompress(bytes, afterLen, len)
          else java.util.Arrays.copyOfRange(bytes, afterLen, afterLen + len)
        ftype match {
          case FrameTypes   => parseTypes(payload, defs)
          case FrameValues  => parseValues(payload, defs, out)
          case FrameControl => () // application-defined; spec says skip
          case other        => fail(pos, s"unknown frame type $other")
        }
        pos = afterLen + len
      }
    }
    out.toSeq
  }

  private def decompress(bytes: Array[Byte], start: Int, len: Int): Array[Byte] = {
    val (format, p1) = uvarint(bytes, start, start + len)
    if (format != 0L) fail(start, s"unsupported compression format $format (0=LZ4)")
    val (rawSize, p2) = uvarint(bytes, p1, start + len)
    if (rawSize > (1L << 30)) fail(p1, s"unreasonable uncompressed frame size $rawSize")
    val dst = new Array[Byte](rawSize.toInt)
    LZ4Factory.fastestInstance().fastDecompressor()
      .decompress(bytes, p2, dst, 0, rawSize.toInt)
    dst
  }

  /** LEB128 unsigned varint; bounds-checked against `limit`. Capped at 63
    * bits so no length/tag/id ever decodes negative — sign-blind guards
    * downstream would otherwise turn a crafted 10-byte varint into a
    * NegativeArraySizeException instead of a clear error.
    */
  private def uvarint(b: Array[Byte], start: Int, limit: Int): (Long, Int) = {
    var v = 0L; var shift = 0; var p = start
    while (true) {
      if (p >= limit) fail(start, "truncated uvarint")
      if (shift > 63) fail(start, "uvarint too long")
      val byte = b(p) & 0xff
      v |= (byte & 0x7fL) << shift
      p += 1
      if ((byte & 0x80) == 0) {
        if (v < 0L) fail(start, "uvarint exceeds 63 bits")
        return (v, p)
      }
      shift += 7
    }
    sys.error("unreachable")
  }

  private def parseTypes(b: Array[Byte], defs: mutable.ArrayBuffer[ZType]): Unit = {
    var p = 0
    def typeById(pos: Int, id: Long): ZType =
      if (id < FirstDefId) ZPrim(id.toInt)
      else if (id - FirstDefId >= defs.size) fail(pos, s"typedef references unknown type id $id")
      else defs(id.toInt - FirstDefId)
    def readId(): ZType = {
      val at = p; val (id, np) = uvarint(b, p, b.length); p = np; typeById(at, id)
    }
    def counted(): String = {
      val (n, np) = uvarint(b, p, b.length)
      if (np + n > b.length) fail(p, s"counted string of $n bytes overruns frame")
      val s = new String(b, np, n.toInt, UTF_8); p = np + n.toInt; s
    }
    while (p < b.length) {
      val op = b(p) & 0xff
      p += 1
      val t: ZType = op match {
        case 0 =>
          val (n, np) = uvarint(b, p, b.length); p = np
          ZRecord(Vector.fill(n.toInt) { val name = counted(); (name, readId()) })
        case 1 => ZArray(readId())
        case 2 => ZSet(readId())
        case 3 => ZMap(readId(), readId())
        case 4 =>
          val (n, np) = uvarint(b, p, b.length); p = np
          ZUnion(Vector.fill(n.toInt)(readId()))
        case 5 =>
          val (n, np) = uvarint(b, p, b.length); p = np
          ZEnum(Vector.fill(n.toInt)(counted()))
        case 6 => ZError(readId())
        case 7 => val name = counted(); ZNamed(name, readId())
        case other => fail(p - 1, s"unknown typedef opcode $other")
      }
      defs += t
    }
  }

  private def parseValues(
      b: Array[Byte],
      defs: mutable.ArrayBuffer[ZType],
      out: mutable.ArrayBuffer[String]): Unit = {
    var p = 0
    while (p < b.length) {
      val (id, afterId) = uvarint(b, p, b.length)
      val typ =
        if (id < FirstDefId) ZPrim(id.toInt)
        else if (id - FirstDefId >= defs.size) fail(p, s"value references unknown type id $id")
        else defs(id.toInt - FirstDefId)
      val sb = new StringBuilder
      p = decodeValue(b, afterId, b.length, typ, None, sb)
      out += sb.toString
    }
  }

  /** Decode one tag-encoded value of `typ` at `pos`, appending JSON to `sb`;
    * returns the position after the value. `pendingName`: innermost named
    * type wrapping this value — injected as a `_type` field on records, the
    * same convention [[Zson]] uses for `(=name)` decorators.
    */
  private def decodeValue(
      b: Array[Byte], pos: Int, limit: Int,
      typ: ZType, pendingName: Option[String], sb: StringBuilder): Int = {
    typ match {
      case ZNamed(name, inner) =>
        // inner name wins, like Zson's first-decorator-wins rule
        return decodeValue(b, pos, limit, inner, Some(name), sb)
      case _ => ()
    }
    val (tag, bodyStart) = uvarint(b, pos, limit)
    if (tag == 0L) { sb.append("null"); return bodyStart }
    val len = tag - 1
    if (bodyStart + len > limit)
      fail(pos, s"value of $len bytes overruns its container")
    val end = bodyStart + len.toInt
    typ match {
      case ZPrim(id)        => renderPrimitive(b, bodyStart, end, id, sb)
      case ZRecord(fields)  =>
        sb.append('{')
        var first = true
        pendingName.filterNot(_ => fields.exists(_._1 == "_type")).foreach { n =>
          sb.append("\"_type\":").append(MiniJson.quote(n)); first = false
        }
        var q = bodyStart
        for ((name, ft) <- fields) {
          if (!first) sb.append(','); first = false
          sb.append(MiniJson.quote(name)).append(':')
          q = decodeValue(b, q, end, ft, None, sb)
        }
        if (q != end) fail(q, s"record body has ${end - q} trailing bytes")
        sb.append('}')
      case ZArray(elem)     => renderElems(b, bodyStart, end, elem, sb)
      case ZSet(elem)       => renderElems(b, bodyStart, end, elem, sb)
      case ZMap(k, v)       =>
        // no JSON-native map; render as an array of {key,value} pairs
        sb.append('[')
        var q = bodyStart; var first = true
        while (q < end) {
          if (!first) sb.append(','); first = false
          sb.append("{\"key\":")
          q = decodeValue(b, q, end, k, None, sb)
          sb.append(",\"value\":")
          q = decodeValue(b, q, end, v, None, sb)
          sb.append('}')
        }
        sb.append(']')
      case ZUnion(branches) =>
        val (selTag, selBody) = uvarint(b, bodyStart, end)
        if (selTag == 0L) fail(bodyStart, "union selector is null")
        if (selBody + (selTag - 1) > end)
          fail(bodyStart, s"union selector of ${selTag - 1} bytes overruns its container")
        val sel = decodeSignedInt(b, selBody, selBody + selTag.toInt - 1)
        val branch = branches.lift(sel.toInt)
          .getOrElse(fail(bodyStart, s"union selector $sel out of range (${branches.size} branches)"))
        val q = decodeValue(b, selBody + selTag.toInt - 1, end, branch, None, sb)
        if (q != end) fail(q, s"union body has ${end - q} trailing bytes")
      case ZEnum(symbols)   =>
        val idx = decodeUnsignedInt(b, bodyStart, end)
        if (idx >= symbols.size) fail(bodyStart, s"enum index $idx out of range (${symbols.size} symbols)")
        sb.append(MiniJson.quote(symbols(idx.toInt)))
      case ZError(inner)    =>
        sb.append("{\"error\":")
        val q = decodeValue(b, bodyStart, end, inner, None, sb)
        if (q != end) fail(q, s"error body has ${end - q} trailing bytes")
        sb.append('}')
      case ZNamed(_, _)     => sys.error("unreachable: unwrapped above")
    }
    end
  }

  private def renderElems(b: Array[Byte], start: Int, end: Int, elem: ZType, sb: StringBuilder): Unit = {
    sb.append('[')
    var q = start; var first = true
    while (q < end) {
      if (!first) sb.append(','); first = false
      q = decodeValue(b, q, end, elem, None, sb)
    }
    sb.append(']')
  }

  /** Minimal little-endian unsigned int. */
  private def decodeUnsignedInt(b: Array[Byte], start: Int, end: Int): Long = {
    if (end - start > 8) fail(start, s"unsigned int of ${end - start} bytes exceeds 64 bits")
    var v = 0L; var i = start
    while (i < end) { v |= (b(i) & 0xffL) << ((i - start) * 8); i += 1 }
    v
  }

  /** Zigzag-over-minimal-little-endian signed int. */
  private def decodeSignedInt(b: Array[Byte], start: Int, end: Int): Long = {
    val u = decodeUnsignedInt(b, start, end)
    (u >>> 1) ^ -(u & 1L)
  }

  private def renderPrimitive(b: Array[Byte], start: Int, end: Int, id: Int, sb: StringBuilder): Unit = {
    def fixed(n: Int): Unit =
      if (end - start != n) fail(start, s"primitive id $id expects $n bytes, got ${end - start}")
    id match {
      case i if i >= IdUint8 && i <= IdUint64 =>
        sb.append(java.lang.Long.toUnsignedString(decodeUnsignedInt(b, start, end)))
      case i if i >= IdInt8 && i <= IdInt64 =>
        sb.append(decodeSignedInt(b, start, end).toString)
      case IdDuration =>
        // signed nanoseconds; rendered as the integer nanos (JSON has no
        // duration syntax and the fixtures carry none)
        sb.append(decodeSignedInt(b, start, end).toString)
      case IdTime =>
        val nanos = decodeSignedInt(b, start, end)
        val inst = java.time.Instant.ofEpochSecond(
          Math.floorDiv(nanos, 1000000000L), Math.floorMod(nanos, 1000000000L))
        sb.append(MiniJson.quote(inst.toString))
      case IdFloat16 =>
        fixed(2)
        val bits = ((b(start + 1) & 0xff) << 8) | (b(start) & 0xff)
        sb.append(renderDouble(halfToDouble(bits)))
      case IdFloat32 =>
        fixed(4)
        var bits = 0; var i = 0
        while (i < 4) { bits |= (b(start + i) & 0xff) << (8 * i); i += 1 }
        sb.append(renderDouble(java.lang.Float.intBitsToFloat(bits).toDouble))
      case IdFloat64 =>
        fixed(8)
        var bits = 0L; var i = 0
        while (i < 8) { bits |= (b(start + i) & 0xffL) << (8 * i); i += 1 }
        sb.append(renderDouble(java.lang.Double.longBitsToDouble(bits)))
      case IdBool =>
        fixed(1)
        sb.append(if (b(start) != 0) "true" else "false")
      case IdBytes =>
        // ZSON bytes-literal form
        val hex = new StringBuilder("0x")
        var i = start
        while (i < end) { hex.append(f"${b(i) & 0xff}%02x"); i += 1 }
        sb.append(MiniJson.quote(hex.toString))
      case IdString =>
        sb.append(MiniJson.quote(new String(b, start, end - start, UTF_8)))
      case IdIp =>
        if (end - start != 4 && end - start != 16) fail(start, s"ip of ${end - start} bytes")
        val addr = java.net.InetAddress.getByAddress(java.util.Arrays.copyOfRange(b, start, end))
        sb.append(MiniJson.quote(addr.getHostAddress))
      case IdNet =>
        // address + mask, both 4 or both 16 bytes
        val half = (end - start) / 2
        if (end - start != 8 && end - start != 32) fail(start, s"net of ${end - start} bytes")
        val addr = java.net.InetAddress.getByAddress(java.util.Arrays.copyOfRange(b, start, start + half))
        var prefix = 0
        var i = start + half
        while (i < end) { prefix += java.lang.Integer.bitCount(b(i) & 0xff); i += 1 }
        sb.append(MiniJson.quote(s"${addr.getHostAddress}/$prefix"))
      case IdNull =>
        sb.append("null")
      case IdType =>
        fail(start, "first-class type values are not supported by this reader")
      case other =>
        fail(start, s"primitive type id $other (128/256-bit ints, decimals) is not supported by this reader")
    }
  }

  /** Shortest JSON number for a double (fixtures are ints/simple decimals;
    * non-finite values have no JSON literal and are quoted).
    */
  private def renderDouble(d: Double): String =
    if (java.lang.Double.isFinite(d)) {
      if (d == Math.rint(d) && Math.abs(d) < 1e15) {
        // keep a fractional marker so the JSON reader infers double, not
        // long; d.toLong would drop the sign of -0.0
        val sign = if (java.lang.Double.doubleToRawLongBits(d) < 0L) "-" else ""
        s"$sign${Math.abs(d).toLong}.0"
      } else d.toString
    } else "\"" + d.toString + "\""

  private def halfToDouble(bits: Int): Double = {
    val sign = if ((bits & 0x8000) != 0) -1.0 else 1.0
    val exp = (bits >> 10) & 0x1f
    val frac = bits & 0x3ff
    if (exp == 0) sign * frac * Math.pow(2, -24)
    else if (exp == 0x1f) { if (frac == 0) sign * Double.PositiveInfinity else Double.NaN }
    else sign * (1 + frac / 1024.0) * Math.pow(2, exp - 15)
  }

  // ---------------------------------------------------------------- writer

  /** Encode JSON lines as a ZNG stream (the inverse of [[readJsonLines]] on
    * the supported subset). Used to build `.zng` fixtures and by tests;
    * inference mirrors the reader's rendering so a round trip is exact:
    * integral JSON numbers → int64, other numbers → float64, strings →
    * string, booleans → bool, nulls → the null type, arrays → arrays (empty
    * → array of null type), objects → records — except an object whose
    * `_type` field is a string becomes a named record type (the [[Zson]]
    * decorator convention, inverted).
    */
  def write(jsonLines: Seq[String], compress: Boolean = false): Array[Byte] = {
    val mapper = new ObjectMapper
    val typesBuf = new ByteArrayOutputStream()
    val ids = mutable.LinkedHashMap[ZType, Int]()

    def intern(t: ZType): Int = t match {
      case ZPrim(id) => id
      case _ =>
        ids.getOrElse(t, {
          // children first: a typedef may only reference already-defined ids
          val body = new ByteArrayOutputStream()
          t match {
            case ZRecord(fields) =>
              val childIds = fields.map { case (n, ft) => (n, intern(ft)) }
              body.write(0)
              writeUvarint(body, childIds.size.toLong)
              childIds.foreach { case (n, id) =>
                val nb = n.getBytes(UTF_8)
                writeUvarint(body, nb.length.toLong); body.write(nb)
                writeUvarint(body, id.toLong)
              }
            case ZArray(e) => val id = intern(e); body.write(1); writeUvarint(body, id.toLong)
            case ZNamed(name, inner) =>
              val id = intern(inner)
              body.write(7)
              val nb = name.getBytes(UTF_8)
              writeUvarint(body, nb.length.toLong); body.write(nb)
              writeUvarint(body, id.toLong)
            case other => sys.error(s"writer does not emit $other typedefs")
          }
          val id = FirstDefId + ids.size
          ids(t) = id
          body.writeTo(typesBuf)
          id
        })
    }

    def infer(n: JsonNode): ZType =
      if (n.isNull) ZPrim(IdNull)
      else if (n.isTextual) ZPrim(IdString)
      else if (n.isBoolean) ZPrim(IdBool)
      else if (n.isIntegralNumber) {
        if (!n.canConvertToLong)
          throw new IllegalArgumentException(s"integer out of int64 range: $n")
        ZPrim(IdInt64)
      } else if (n.isNumber) ZPrim(IdFloat64)
      else if (n.isArray) {
        // nulls are compatible with any element type (a null encodes as
        // tag 0 regardless), so [1,null] is array<int64>, not a union
        val elemTypes = (0 until n.size).map(i => infer(n.get(i)))
          .distinct.filterNot(_ == ZPrim(IdNull))
        if (elemTypes.size > 1)
          throw new IllegalArgumentException(
            s"mixed array element types ${elemTypes.mkString(", ")} need a union; not emitted by this writer")
        ZArray(elemTypes.headOption.getOrElse(ZPrim(IdNull)))
      } else if (n.isObject) {
        val names = iterFields(n)
        names.find { case (k, v) => k == "_type" && v.isTextual } match {
          case Some((_, tn)) =>
            ZNamed(tn.asText, ZRecord(names.filterNot(_._1 == "_type")
              .map { case (k, v) => (k, infer(v)) }.toVector))
          case None =>
            ZRecord(names.map { case (k, v) => (k, infer(v)) }.toVector)
        }
      } else throw new IllegalArgumentException(s"unsupported JSON node ${n.getNodeType}")

    def encode(out: ByteArrayOutputStream, n: JsonNode, t: ZType): Unit = if (n.isNull) {
      writeUvarint(out, 0L) // null encodes as tag 0 under ANY type
    } else t match {
      case ZPrim(IdNull) => writeUvarint(out, 0L)
      case ZPrim(IdString) =>
        val b = n.asText.getBytes(UTF_8); writeTag(out, b.length); out.write(b)
      case ZPrim(IdBool) =>
        writeTag(out, 1); out.write(if (n.asBoolean) 1 else 0)
      case ZPrim(IdInt64) =>
        val z = zigzag(n.asLong)
        val b = minimalLe(z); writeTag(out, b.length); out.write(b)
      case ZPrim(IdFloat64) =>
        val bits = java.lang.Double.doubleToLongBits(n.asDouble)
        writeTag(out, 8)
        var i = 0
        while (i < 8) { out.write(((bits >>> (8 * i)) & 0xff).toInt); i += 1 }
      case ZArray(elem) =>
        val body = new ByteArrayOutputStream()
        (0 until n.size).foreach(i => encode(body, n.get(i), elem))
        writeTag(out, body.size); body.writeTo(out)
      case ZRecord(fields) =>
        val body = new ByteArrayOutputStream()
        fields.foreach { case (name, ft) =>
          encode(body, Option(n.get(name)).getOrElse(com.fasterxml.jackson.databind.node.NullNode.getInstance), ft)
        }
        writeTag(out, body.size); body.writeTo(out)
      case ZNamed(_, inner) => encode(out, n, inner)
      case other => sys.error(s"writer does not encode $other")
    }

    val valuesBuf = new ByteArrayOutputStream()
    jsonLines.foreach { line =>
      val node = mapper.readTree(line)
      val t = infer(node)
      val id = intern(t)
      writeUvarint(valuesBuf, id.toLong)
      encode(valuesBuf, node, t)
    }

    val stream = new ByteArrayOutputStream()
    if (typesBuf.size > 0) writeFrame(stream, FrameTypes, typesBuf.toByteArray, compress = false)
    if (valuesBuf.size > 0) writeFrame(stream, FrameValues, valuesBuf.toByteArray, compress)
    stream.write(0xff) // end-of-stream
    stream.toByteArray
  }

  private def iterFields(n: JsonNode): Seq[(String, JsonNode)] = {
    val names = n.fieldNames()
    val buf = mutable.ArrayBuffer[(String, JsonNode)]()
    while (names.hasNext) { val k = names.next(); buf += ((k, n.get(k))) }
    buf.toSeq
  }

  private def zigzag(v: Long): Long = (v << 1) ^ (v >> 63)

  private def minimalLe(u: Long): Array[Byte] = {
    if (u == 0L) return Array.emptyByteArray
    val buf = mutable.ArrayBuffer[Byte]()
    var v = u
    while (v != 0L) { buf += (v & 0xff).toByte; v >>>= 8 }
    buf.toArray
  }

  private def writeUvarint(out: ByteArrayOutputStream, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7fL) != 0L) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
    out.write((v & 0x7f).toInt)
  }

  private def writeTag(out: ByteArrayOutputStream, bodyLen: Int): Unit =
    writeUvarint(out, bodyLen.toLong + 1L)

  private def writeFrame(out: ByteArrayOutputStream, ftype: Int, payload0: Array[Byte], compress: Boolean): Unit = {
    val payload =
      if (!compress) payload0
      else {
        val pre = new ByteArrayOutputStream()
        writeUvarint(pre, 0L) // format 0 = LZ4
        writeUvarint(pre, payload0.length.toLong)
        val packed = LZ4Factory.fastestInstance().fastCompressor().compress(payload0)
        pre.write(packed, 0, packed.length)
        pre.toByteArray
      }
    val len = payload.length
    val cbit = if (compress) 0x40 else 0
    out.write(cbit | (ftype << 4) | (len & 0xf))
    writeUvarint(out, (len >> 4).toLong)
    out.write(payload, 0, len)
  }
}
