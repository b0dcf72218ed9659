package graft.spec

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import scala.jdk.CollectionConverters._

/** Shared Jackson plumbing for the metadata JSON codecs. */
private[spec] object Js {
  val mapper = new ObjectMapper()
  def obj(): ObjectNode = mapper.createObjectNode()
  def arr(): ArrayNode = mapper.createArrayNode()
  def parse(s: String): JsonNode = mapper.readTree(s)
  def write(n: JsonNode): String =
    mapper.writerWithDefaultPrettyPrinter().writeValueAsString(n)
  def fields(n: JsonNode): Iterator[(String, JsonNode)] =
    n.properties().iterator().asScala.map(e => e.getKey -> e.getValue)
  def elems(n: JsonNode): Iterator[JsonNode] = n.elements().asScala
  def optNode(n: JsonNode, key: String): Option[JsonNode] =
    Option(n.get(key)).filterNot(_.isNull)
}

/** Iceberg schema/type JSON codec. Wire format matches the Iceberg spec
  * and the reference (`spec/schema.go:111-334`, `spec/types.go:300-324`):
  * primitives as strings ("long", "decimal(10, 2)"), nested types as
  * objects with explicit element/key/value IDs.
  */
object SchemaJson {
  import Js._

  /** Parse arbitrary JSON to a tree (for other packages' small needs). */
  def parseTree(s: String): JsonNode = Js.parse(s)

  def write(s: Schema): String = Js.write(schemaNode(s))

  def schemaNode(s: Schema): ObjectNode = {
    val n = obj()
    n.put("type", "struct")
    n.put("schema-id", s.schemaId)
    if (s.identifierFieldIds.nonEmpty) {
      val ids = arr(); s.identifierFieldIds.foreach(ids.add)
      n.set[ObjectNode]("identifier-field-ids", ids)
    }
    val fs = arr()
    s.fields.foreach(f => fs.add(fieldNode(f)))
    n.set[ObjectNode]("fields", fs)
    n
  }

  private def fieldNode(f: NestedField): ObjectNode = {
    val n = obj()
    n.put("id", f.id)
    n.put("name", f.name)
    n.put("required", f.required)
    n.set[ObjectNode]("type", typeNode(f.fieldType))
    f.doc.foreach(n.put("doc", _))
    n
  }

  def typeNode(t: IcebergType): JsonNode = t match {
    case StructType(fields) =>
      val n = obj()
      n.put("type", "struct")
      val fs = arr(); fields.foreach(f => fs.add(fieldNode(f)))
      n.set[ObjectNode]("fields", fs)
      n
    case ListType(eid, elem, req) =>
      val n = obj()
      n.put("type", "list")
      n.put("element-id", eid)
      n.set[ObjectNode]("element", typeNode(elem))
      n.put("element-required", req)
      n
    case MapType(kid, k, vid, v, req) =>
      val n = obj()
      n.put("type", "map")
      n.put("key-id", kid)
      n.set[ObjectNode]("key", typeNode(k))
      n.put("value-id", vid)
      n.set[ObjectNode]("value", typeNode(v))
      n.put("value-required", req)
      n
    case prim =>
      // primitives (incl. fixed/decimal) serialize as their string form,
      // without the display space: "decimal(10,2)" per the Iceberg spec
      mapper.getNodeFactory.textNode(prim.typeString.replace(", ", ","))
  }

  def parse(json: String): Schema = parseSchema(Js.parse(json))

  def parseSchema(n: JsonNode): Schema = Schema(
    schemaId = optNode(n, "schema-id").map(_.asInt).getOrElse(0),
    fields = parseFields(n.get("fields")),
    identifierFieldIds = optNode(n, "identifier-field-ids")
      .map(a => elems(a).map(_.asInt).toSeq).getOrElse(Nil))

  private def parseFields(n: JsonNode): Seq[NestedField] =
    elems(n).map { f =>
      NestedField(
        id = f.get("id").asInt,
        name = f.get("name").asText,
        fieldType = parseType(f.get("type")),
        required = optNode(f, "required").exists(_.asBoolean),
        doc = optNode(f, "doc").map(_.asText))
    }.toSeq

  def parseType(n: JsonNode): IcebergType =
    if (n.isTextual) IcebergType.parse(n.asText)
    else n.get("type").asText match {
      case "struct" => StructType(parseFields(n.get("fields")))
      case "list" => ListType(
        elementId = n.get("element-id").asInt,
        element = parseType(n.get("element")),
        elementRequired = optNode(n, "element-required").exists(_.asBoolean))
      case "map" => MapType(
        keyId = n.get("key-id").asInt,
        key = parseType(n.get("key")),
        valueId = n.get("value-id").asInt,
        value = parseType(n.get("value")),
        valueRequired = optNode(n, "value-required").exists(_.asBoolean))
      case prim => IcebergType.parse(prim)
    }
}
