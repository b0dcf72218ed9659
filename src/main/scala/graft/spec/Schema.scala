package graft.spec

/** An Iceberg table schema: a struct with a version ID and optional
  * identifier (primary-key-ish) field IDs (`spec/schema.go:10-31`). */
final case class Schema(
    schemaId: Int,
    fields: Seq[NestedField],
    identifierFieldIds: Seq[Int] = Nil) {

  def asStruct: StructType = StructType(fields)
  def field(id: Int): Option[NestedField] = asStruct.field(id)
  def fieldByName(name: String): Option[NestedField] =
    asStruct.fieldByName(name)
  def numFields: Int = fields.size

  /** Highest field ID anywhere in the schema, recursing into nested
    * types (`spec/schema.go:53-90`). */
  def highestFieldId: Int =
    fields.foldLeft(0)((m, f) =>
      math.max(math.max(m, f.id), IcebergType.maxFieldId(f.fieldType)))

  def columnNames: Seq[String] = fields.map(_.name)

  def toJson: String = SchemaJson.write(this)
}

object Schema {
  def fromJson(json: String): Schema = SchemaJson.parse(json)
}
