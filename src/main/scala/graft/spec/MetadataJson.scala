package graft.spec

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.node.ObjectNode

/** TableMetadata JSON codec, kebab-case wire keys per the Iceberg spec
  * (`spec/metadata.go:55-78`), with the reference's V1→V2 migration on
  * parse (`spec/metadata.go:160-184`). Summary counters serialize as
  * strings with zero-valued counters omitted (`spec/snapshot.go:84-146`).
  */
object MetadataJson {
  import Js._

  // ------------------------------------------------------------- write
  def write(m: TableMetadata): String = {
    val n = obj()
    n.put("format-version", m.formatVersion)
    n.put("table-uuid", m.tableUuid)
    n.put("location", m.location)
    n.put("last-sequence-number", m.lastSequenceNumber)
    n.put("last-updated-ms", m.lastUpdatedMs)
    n.put("last-column-id", m.lastColumnId)
    val schemas = arr()
    m.schemas.foreach(s => schemas.add(SchemaJson.schemaNode(s)))
    n.set[ObjectNode]("schemas", schemas)
    n.put("current-schema-id", m.currentSchemaId)
    val specs = arr()
    m.partitionSpecs.foreach(s => specs.add(specNode(s)))
    n.set[ObjectNode]("partition-specs", specs)
    n.put("default-spec-id", m.defaultSpecId)
    n.put("last-partition-id", m.lastPartitionId)
    if (m.properties.nonEmpty) {
      val p = obj()
      m.properties.toSeq.sortBy(_._1).foreach { case (k, v) => p.put(k, v) }
      n.set[ObjectNode]("properties", p)
    }
    m.currentSnapshotId.foreach(n.put("current-snapshot-id", _))
    val snaps = arr()
    m.snapshots.foreach(s => snaps.add(snapshotNode(s)))
    n.set[ObjectNode]("snapshots", snaps)
    if (m.snapshotLog.nonEmpty) {
      val log = arr()
      m.snapshotLog.foreach { e =>
        val en = obj()
        en.put("snapshot-id", e.snapshotId)
        en.put("timestamp-ms", e.timestampMs)
        log.add(en)
      }
      n.set[ObjectNode]("snapshot-log", log)
    }
    if (m.metadataLog.nonEmpty) {
      val log = arr()
      m.metadataLog.foreach { e =>
        val en = obj()
        en.put("timestamp-ms", e.timestampMs)
        en.put("metadata-file", e.metadataFile)
        log.add(en)
      }
      n.set[ObjectNode]("metadata-log", log)
    }
    val orders = arr()
    m.sortOrders.foreach(o => orders.add(sortOrderNode(o)))
    n.set[ObjectNode]("sort-orders", orders)
    n.put("default-sort-order-id", m.defaultSortOrderId)
    if (m.refs.nonEmpty) {
      val r = obj()
      m.refs.toSeq.sortBy(_._1).foreach { case (name, ref) =>
        r.set[ObjectNode](name, refNode(ref))
      }
      n.set[ObjectNode]("refs", r)
    }
    Js.write(n)
  }

  private def specNode(s: PartitionSpec): ObjectNode = {
    val n = obj()
    n.put("spec-id", s.specId)
    val fs = arr()
    s.fields.foreach { f =>
      val fn = obj()
      fn.put("source-id", f.sourceId)
      fn.put("field-id", f.fieldId)
      fn.put("name", f.name)
      fn.put("transform", f.transform.name)
      fs.add(fn)
    }
    n.set[ObjectNode]("fields", fs)
    n
  }

  private def sortOrderNode(o: SortOrder): ObjectNode = {
    val n = obj()
    n.put("order-id", o.orderId)
    val fs = arr()
    o.fields.foreach { f =>
      val fn = obj()
      fn.put("transform", f.transform.name)
      fn.put("source-id", f.sourceId)
      fn.put("direction", f.direction.name)
      fn.put("null-order", f.nullOrder.name)
      fs.add(fn)
    }
    n.set[ObjectNode]("fields", fs)
    n
  }

  private def snapshotNode(s: Snapshot): ObjectNode = {
    val n = obj()
    n.put("snapshot-id", s.snapshotId)
    s.parentSnapshotId.foreach(n.put("parent-snapshot-id", _))
    n.put("sequence-number", s.sequenceNumber)
    n.put("timestamp-ms", s.timestampMs)
    n.put("manifest-list", s.manifestList)
    s.summary.foreach { sum =>
      val sn = obj()
      sn.put("operation", sum.operation.name)
      sum.counters.toSeq.sortBy(_._1).foreach { case (k, v) =>
        if (v != 0L) sn.put(k, v.toString)
      }
      sum.extra.toSeq.sortBy(_._1).foreach { case (k, v) => sn.put(k, v) }
      n.set[ObjectNode]("summary", sn)
    }
    s.schemaId.foreach(n.put("schema-id", _))
    n
  }

  private def refNode(r: SnapshotRef): ObjectNode = {
    val n = obj()
    n.put("snapshot-id", r.snapshotId)
    n.put("type", r.refType)
    r.minSnapshotsToKeep.foreach(n.put("min-snapshots-to-keep", _))
    r.maxSnapshotAgeMs.foreach(n.put("max-snapshot-age-ms", _))
    r.maxRefAgeMs.foreach(n.put("max-ref-age-ms", _))
    n
  }

  // ------------------------------------------------------------- parse
  def parse(json: String): TableMetadata = {
    val n = Js.parse(json)
    val formatVersion = n.get("format-version").asInt
    var schemas = optNode(n, "schemas")
      .map(a => elems(a).map(SchemaJson.parseSchema).toSeq).getOrElse(Nil)
    var currentSchemaId = optNode(n, "current-schema-id")
      .map(_.asInt).getOrElse(0)
    var specs = optNode(n, "partition-specs")
      .map(a => elems(a).map(parseSpec).toSeq).getOrElse(Nil)
    var defaultSpecId = optNode(n, "default-spec-id").map(_.asInt).getOrElse(0)
    var sortOrders = optNode(n, "sort-orders")
      .map(a => elems(a).map(parseSortOrder).toSeq).getOrElse(Nil)

    // V1 → V2 migration (spec/metadata.go:160-184)
    if (formatVersion == 1) {
      optNode(n, "schema").foreach { sn =>
        if (schemas.isEmpty) {
          val s = SchemaJson.parseSchema(sn)
          schemas = Seq(s); currentSchemaId = s.schemaId
        }
      }
      optNode(n, "partition-spec").foreach { pn =>
        if (specs.isEmpty) {
          specs = Seq(PartitionSpec(0, elems(pn).map(parsePartitionField).toSeq))
          defaultSpecId = 0
        }
      }
      if (sortOrders.isEmpty) sortOrders = Seq(SortOrder.unsorted)
    }
    if (sortOrders.isEmpty) sortOrders = Seq(SortOrder.unsorted)

    TableMetadata(
      formatVersion = 2, // normalized on parse like the reference
      tableUuid = optNode(n, "table-uuid").map(_.asText).getOrElse(""),
      location = optNode(n, "location").map(_.asText).getOrElse(""),
      lastUpdatedMs = optNode(n, "last-updated-ms").map(_.asLong).getOrElse(0L),
      lastColumnId = optNode(n, "last-column-id").map(_.asInt).getOrElse(0),
      schemas = schemas,
      currentSchemaId = currentSchemaId,
      partitionSpecs = specs,
      defaultSpecId = defaultSpecId,
      lastPartitionId = optNode(n, "last-partition-id").map(_.asInt)
        .getOrElse(specs.map(_.lastFieldId).maxOption.getOrElse(0)),
      properties = optNode(n, "properties")
        .map(p => fields(p).map { case (k, v) => k -> v.asText }.toMap)
        .getOrElse(Map.empty),
      currentSnapshotId = optNode(n, "current-snapshot-id").map(_.asLong),
      snapshots = optNode(n, "snapshots")
        .map(a => elems(a).map(parseSnapshot).toSeq).getOrElse(Nil),
      snapshotLog = optNode(n, "snapshot-log").map(a => elems(a).map(e =>
        SnapshotLogEntry(e.get("snapshot-id").asLong,
          e.get("timestamp-ms").asLong)).toSeq).getOrElse(Nil),
      metadataLog = optNode(n, "metadata-log").map(a => elems(a).map(e =>
        MetadataLogEntry(e.get("timestamp-ms").asLong,
          e.get("metadata-file").asText)).toSeq).getOrElse(Nil),
      sortOrders = sortOrders,
      defaultSortOrderId = optNode(n, "default-sort-order-id")
        .map(_.asInt).getOrElse(0),
      refs = optNode(n, "refs").map(r => fields(r).map { case (name, rn) =>
        name -> parseRef(rn)
      }.toMap).getOrElse(Map.empty),
      lastSequenceNumber = optNode(n, "last-sequence-number")
        .map(_.asLong).getOrElse(0L))
  }

  private def parseSpec(n: JsonNode): PartitionSpec = PartitionSpec(
    specId = optNode(n, "spec-id").map(_.asInt).getOrElse(0),
    fields = optNode(n, "fields")
      .map(a => elems(a).map(parsePartitionField).toSeq).getOrElse(Nil))

  private def parsePartitionField(n: JsonNode): PartitionField =
    PartitionField(
      sourceId = n.get("source-id").asInt,
      fieldId = optNode(n, "field-id").map(_.asInt).getOrElse(0),
      name = n.get("name").asText,
      transform = Transform.parse(n.get("transform").asText))

  /** Public: the REST layer ships sort orders as bare JSON objects
    * (`add-sort-order` updates). */
  def parseSortOrder(n: JsonNode): SortOrder = SortOrder(
    orderId = optNode(n, "order-id").map(_.asInt).getOrElse(0),
    fields = optNode(n, "fields").map(a => elems(a).map(f => SortField(
      sourceId = f.get("source-id").asInt,
      transform = Transform.parse(
        optNode(f, "transform").map(_.asText).getOrElse("identity")),
      direction = SortDirection.parse(
        optNode(f, "direction").map(_.asText).getOrElse("asc")),
      nullOrder = NullOrder.parse(
        optNode(f, "null-order").map(_.asText).getOrElse("nulls-first"))))
      .toSeq).getOrElse(Nil))

  /** Public: the REST layer ships snapshots as bare JSON objects. */
  def parseSnapshot(n: JsonNode): Snapshot = Snapshot(
    snapshotId = n.get("snapshot-id").asLong,
    parentSnapshotId = optNode(n, "parent-snapshot-id").map(_.asLong),
    sequenceNumber = optNode(n, "sequence-number").map(_.asLong).getOrElse(0L),
    timestampMs = n.get("timestamp-ms").asLong,
    manifestList = n.get("manifest-list").asText,
    summary = optNode(n, "summary").map { sn =>
      var op: Operation = Operation.Append
      val counters = Map.newBuilder[String, Long]
      val extra = Map.newBuilder[String, String]
      fields(sn).foreach { case (k, v) =>
        if (k == "operation") op = Operation.parse(v.asText)
        else if (Summary.counterKeys.contains(k)) counters += k -> v.asText.toLong
        else extra += k -> v.asText
      }
      Summary(op, counters.result(), extra.result())
    },
    schemaId = optNode(n, "schema-id").map(_.asInt))

  private def parseRef(n: JsonNode): SnapshotRef = SnapshotRef(
    snapshotId = n.get("snapshot-id").asLong,
    refType = n.get("type").asText,
    minSnapshotsToKeep = optNode(n, "min-snapshots-to-keep").map(_.asInt),
    maxSnapshotAgeMs = optNode(n, "max-snapshot-age-ms").map(_.asLong),
    maxRefAgeMs = optNode(n, "max-ref-age-ms").map(_.asLong))
}
