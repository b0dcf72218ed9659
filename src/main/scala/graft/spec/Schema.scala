package graft.spec

/** An Iceberg table schema: a struct with a version ID and optional
  * identifier (primary-key-ish) field IDs (`spec/schema.go:10-31`). */
final case class Schema(
    schemaId: Int,
    fields: Seq[NestedField],
    identifierFieldIds: Seq[Int] = Nil) {

  def asStruct: StructType = StructType(fields)
  /** Lookup by field ID at ANY depth (ids are globally unique in a
    * schema) — stats maps key nested leaves by their own ids. */
  def field(id: Int): Option[NestedField] = Schema.deepField(fields, id)
  def fieldByName(name: String): Option[NestedField] =
    asStruct.fieldByName(name)
  def numFields: Int = fields.size

  /** Highest field ID anywhere in the schema, recursing into nested
    * types (`spec/schema.go:53-90`). */
  def highestFieldId: Int =
    fields.foldLeft(0)((m, f) =>
      math.max(math.max(m, f.id), IcebergType.maxFieldId(f.fieldType)))

  def columnNames: Seq[String] = fields.map(_.name)

  /** Resolve a dotted path ("profile.age") to the NESTED leaf field by
    * descending structs — the identity stats and nested pruning key on.
    * A plain top-level name resolves as before; paths through lists or
    * maps don't resolve (their element stats aren't usable for
    * row-level pruning). */
  def fieldByPath(path: String): Option[NestedField] = {
    val parts = path.split('.')
    var cur: Option[NestedField] = fieldByName(parts.head)
    parts.tail.foreach { p =>
      cur = cur.flatMap(_.fieldType match {
        case s: StructType => s.fieldByName(p)
        case _ => None
      })
    }
    cur
  }

  def toJson: String = SchemaJson.write(this)
}

object Schema {
  def fromJson(json: String): Schema = SchemaJson.parse(json)

  private[spec] def deepField(fs: Seq[NestedField],
      id: Int): Option[NestedField] = {
    val direct = fs.find(_.id == id)
    if (direct.isDefined) direct
    else fs.iterator.map(f => f.fieldType match {
      case s: StructType => deepField(s.fields, id)
      case _ => None
    }).collectFirst { case Some(x) => x }
  }
}
