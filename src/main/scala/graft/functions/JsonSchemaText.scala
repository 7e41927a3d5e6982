package graft.functions

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.types.StructType

/** Parser for the JSON-intermediate schema language as TEXT — the form
  * users actually hand the engine (a schema file/string), not a Scala
  * ADT. The reference builds its converter chain from exactly this
  * document shape (gobblin-core/.../converter/avro/
  * JsonElementConversionFactory.java:66-84: a JsonArray of
  * {"columnName", "dataType": {"type", ...}, "isNullable"} descriptors;
  * JsonIntermediateToAvroConverter.java:50 feeds it).
  *
  * Composite forms: {"type":"array","items":<t>},
  * {"type":"map","values":<t>}, {"type":"record","name":...,
  * "values":[<columns>]} ("fields" also accepted), union as a JSON
  * array of types. <t> may be a primitive name, a nested dataType
  * object, a column-like object carrying "dataType", or an array
  * (union). The output is the [[JsonSchema.SType]] tree, so the whole
  * existing type matrix (tagged unions, recursion elimination, date
  * formats) applies to text-loaded schemas unchanged.
  */
object JsonSchemaText {
  import JsonSchema._

  private val mapper = new ObjectMapper()

  /** Parse a schema document: a JSON array of column descriptors. */
  def parseFields(text: String): Seq[(String, SType)] = {
    val root = mapper.readTree(text)
    require(root != null && root.isArray,
      s"schema text must be a JSON array of column descriptors")
    root.elements().asScala.map(parseField).toSeq
  }

  /** Whole document → Spark schema, with the mandatory recursion
    * elimination applied (matching the ingest pipeline's behavior).
    */
  def toStruct(text: String): StructType = {
    val rec = SRecord("$root", parseFields(text))
    JsonSchema.toSpark(JsonSchema.eliminateRecursion(rec)).asInstanceOf[StructType]
  }

  private def parseField(f: JsonNode): (String, SType) = {
    val name = Option(f.get("columnName")).map(_.asText)
      .getOrElse(throw new IllegalArgumentException(s"column missing columnName: $f"))
    val dt = Option(f.get("dataType"))
      .getOrElse(throw new IllegalArgumentException(s"column '$name' missing dataType"))
    val t = parseType(dt)
    // isNullable on the COLUMN is the reference's outer nullability knob;
    // union-with-null inside the type expresses the same thing
    val nullable = Option(f.get("isNullable")).exists(_.asBoolean(false))
    name -> (if (nullable && !isNullableT(t)) SUnion(Seq(t, SNull)) else t)
  }

  private def isNullableT(t: SType): Boolean = t match {
    case SNull => true
    case SUnion(bs) => bs.contains(SNull)
    case _ => false
  }

  private def parseType(dt: JsonNode): SType = {
    if (dt.isTextual) return primitive(dt.asText)
    if (dt.isArray) return union(dt)
    val tn = dt.get("type")
    require(tn != null, s"dataType missing 'type': $dt")
    if (tn.isArray) union(tn)
    else tn.asText.toLowerCase match {
      case "array" => SArray(subType(dt, "items"))
      case "map" => SMap(subType(dt, "values"))
      case "record" =>
        val recName = Option(dt.get("name")).map(_.asText).getOrElse("record")
        val fieldsNode = Option(dt.get("values")).orElse(Option(dt.get("fields")))
          .getOrElse(throw new IllegalArgumentException(s"record missing 'values': $dt"))
        require(fieldsNode.isArray, s"record 'values' must be an array of columns: $dt")
        SRecord(recName, fieldsNode.elements().asScala.map(parseField).toSeq)
      case prim => primitive(prim)
    }
  }

  private def union(branches: JsonNode): SType =
    SUnion(branches.elements().asScala.map(parseType).toSeq)

  private def subType(dt: JsonNode, key: String): SType = {
    val n = dt.get(key)
    require(n != null, s"'${dt.get("type").asText}' type missing '$key': $dt")
    if (n.isObject && n.has("dataType")) parseType(n.get("dataType"))
    else parseType(n)
  }

  private def primitive(name: String): SType = name.toLowerCase match {
    case "date" => SDate
    case "timestamp" => STimestamp
    case "time" => STime
    case "fixed" => SFixed
    case "string" => SString
    case "bytes" => SBytes
    case "int" => SInt
    case "long" => SLong
    case "float" => SFloat
    case "double" => SDouble
    case "boolean" => SBoolean
    case "null" => SNull
    case "enum" => SEnum
    case other => throw new IllegalArgumentException(s"unknown dataType '$other'")
  }
}
