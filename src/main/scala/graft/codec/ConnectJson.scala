package graft.codec

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Kafka Connect JSON codec: the `{"schema": …, "payload": …}` envelope
  * (reference: connectjson/connectjson.go:29-43 encode, 185-228 decode+shape,
  * 97-160 schema generation, 230-273 schema→type).
  *
  * Spark-first shape: schema generation is plan-time Scala (StructType →
  * Connect schema JSON, embedded as a literal), payload encode is codegen'd
  * `to_json`, decode+shape is `from_json` — which already casts and orders
  * fields to the target schema, replacing the reference's cached const-shaper
  * (connectjson.go:214-227). Base64 `bytes` round-trip through from_json /
  * to_json natively (connectjson.go:59-60,288-294 analog).
  */
object ConnectJson {

  // --- schema generation: Spark type → Connect schema (connectjson.go:102-158)

  def connectType(dt: DataType): JObject = dt match {
    case ByteType      => JObject("type" -> JString("int8"))
    case ShortType     => JObject("type" -> JString("int16"))
    case IntegerType   => JObject("type" -> JString("int32"))
    case LongType      => JObject("type" -> JString("int64"))
    case FloatType     => JObject("type" -> JString("float"))
    case DoubleType    => JObject("type" -> JString("double"))
    case BooleanType   => JObject("type" -> JString("boolean"))
    case StringType    => JObject("type" -> JString("string"))
    case BinaryType    => JObject("type" -> JString("bytes"))
    // reference stringifies time via the codecs (SURVEY §1.2) — ISO strings
    case TimestampType | TimestampNTZType | DateType => JObject("type" -> JString("string"))
    case ArrayType(et, _) =>
      JObject("type" -> JString("array"), "items" -> connectType(et))
    case st: StructType =>
      JObject(
        "type" -> JString("struct"),
        "fields" -> JArray(st.fields.toList.map { f =>
          val JObject(base) = connectType(f.dataType)
          JObject(base ++ List("field" -> JString(f.name), "optional" -> JBool(true)))
        }))
    case other =>
      // map/union: unsupported in the reference codecs too (connectjson.go:83-86)
      throw new IllegalArgumentException(s"Connect JSON: unsupported type $other")
  }

  def schemaJson(st: StructType): String =
    JsonMethods.compact(JsonMethods.render(connectType(st)))

  // --- Connect schema JSON → Spark type (connectjson.go:230-273)

  def sparkType(schema: JValue): DataType = {
    val tpe = (schema \ "type") match {
      case JString(s) => s
      case _ => throw new IllegalArgumentException(s"Connect schema missing type: $schema")
    }
    tpe match {
      case "int8"    => ByteType
      case "int16"   => ShortType
      case "int32"   => IntegerType
      case "int64"   => LongType
      case "float"   => FloatType
      case "double"  => DoubleType
      case "boolean" => BooleanType
      case "string"  => StringType
      case "bytes"   => BinaryType
      case "array"   => ArrayType(sparkType(schema \ "items"))
      case "struct" =>
        val fields = (schema \ "fields") match {
          case JArray(fs) => fs.map { f =>
            val name = (f \ "field") match {
              case JString(n) => n
              case _ => throw new IllegalArgumentException(s"Connect field missing name: $f")
            }
            StructField(name, sparkType(f), nullable = true)
          }
          case _ => Nil
        }
        StructType(fields)
      case other => throw new IllegalArgumentException(s"Connect JSON: unsupported type $other")
    }
  }

  def sparkTypeOf(schemaJsonText: String): DataType =
    sparkType(JsonMethods.parse(schemaJsonText))

  // --- encode / decode columns

  /** value struct column → envelope JSON string `{"schema":…,"payload":…}`.
    * The schema half is a plan-time literal (one per DataFrame schema — the
    * analog of the reference's per-type caches).
    */
  def encode(payload: Column, schema: StructType): Column =
    concat(
      lit("""{"schema":""" + schemaJson(schema) + ""","payload":"""),
      coalesce(to_json(payload), lit("null")),
      lit("}"))

  /** envelope JSON string → shaped struct of `schema`. from_json casts and
    * field-orders to the target type, exactly the reference's shaper step
    * (connectjson.go:203-212). Empty/whitespace input → null
    * (connectjson_test.go:48-54).
    */
  def decode(envelope: Column, schema: StructType): Column =
    from_json(get_json_object(envelope, "$.payload"), schema)

  /** Extract the embedded Connect schema text (for runtime schema discovery,
    * decode side of connectjson.go:191-201).
    */
  def embeddedSchema(envelope: Column): Column =
    get_json_object(envelope, "$.schema")
}
