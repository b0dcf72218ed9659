package graft.spec

/** Root table metadata (`spec/metadata.go:55-78`): the single JSON file
  * a table pointer chain hangs off. Immutable; every commit produces a
  * new copy via [[TableMetadata#updated]]-style copies. */
final case class TableMetadata(
    formatVersion: Int = 2,
    tableUuid: String,
    location: String,
    lastUpdatedMs: Long = 0L,
    lastColumnId: Int = 0,
    schemas: Seq[Schema],
    currentSchemaId: Int,
    partitionSpecs: Seq[PartitionSpec],
    defaultSpecId: Int = 0,
    lastPartitionId: Int = 0,
    properties: Map[String, String] = Map.empty,
    currentSnapshotId: Option[Long] = None,
    snapshots: Seq[Snapshot] = Nil,
    snapshotLog: Seq[SnapshotLogEntry] = Nil,
    metadataLog: Seq[MetadataLogEntry] = Nil,
    sortOrders: Seq[SortOrder] = Seq(SortOrder.unsorted),
    defaultSortOrderId: Int = 0,
    refs: Map[String, SnapshotRef] = Map.empty,
    lastSequenceNumber: Long = 0L) {

  def currentSchema: Schema =
    schemas.find(_.schemaId == currentSchemaId)
      .getOrElse(throw new IllegalStateException(
        s"current schema $currentSchemaId not found"))

  def schemaById(id: Int): Option[Schema] = schemas.find(_.schemaId == id)

  /** The schema a snapshot was committed under (its recorded
    * schema-id), falling back to the current schema for pre-schema-id
    * metadata. THE resolution rule for pinned/time-travel reads —
    * every caller must share it or projection and validation drift. */
  def schemaForSnapshot(snapshotId: Long): Schema =
    snapshotById(snapshotId).flatMap(_.schemaId).flatMap(schemaById)
      .getOrElse(currentSchema)

  def defaultPartitionSpec: PartitionSpec =
    partitionSpecs.find(_.specId == defaultSpecId)
      .getOrElse(PartitionSpec.unpartitioned)

  def specById(id: Int): Option[PartitionSpec] =
    partitionSpecs.find(_.specId == id)

  def currentSnapshot: Option[Snapshot] =
    currentSnapshotId.flatMap(id => snapshots.find(_.snapshotId == id))

  def snapshotById(id: Long): Option[Snapshot] =
    snapshots.find(_.snapshotId == id)

  /** Time travel: snapshot with max timestamp <= asOfMs
    * (`table/table.go:104-120`). */
  def snapshotAsOf(asOfMs: Long): Option[Snapshot] =
    snapshots.filter(_.timestampMs <= asOfMs)
      .sortBy(_.timestampMs).lastOption

  def defaultSortOrder: SortOrder =
    sortOrders.find(_.orderId == defaultSortOrderId)
      .getOrElse(SortOrder.unsorted)

  def ref(name: String): Option[SnapshotRef] = refs.get(name)

  /** Append a new schema version; auto-assigns the next schema ID when
    * the proposed one collides or is 0 (`spec/metadata.go:307-333`). */
  def addSchema(schema: Schema, setCurrent: Boolean): TableMetadata = {
    val id =
      if (schema.schemaId != 0 && !schemas.exists(_.schemaId == schema.schemaId))
        schema.schemaId
      else schemas.map(_.schemaId).max + 1
    val s2 = schema.copy(schemaId = id)
    copy(
      schemas = schemas :+ s2,
      currentSchemaId = if (setCurrent) id else currentSchemaId,
      lastColumnId = math.max(lastColumnId, s2.highestFieldId))
  }

  /** Spec `add-snapshot`: records the snapshot WITHOUT moving any ref.
    * Ref movement is a separate `set-snapshot-ref` update — the exact
    * vocabulary of the Iceberg REST spec and the reference's update
    * enum (`catalog/catalog.go:205-280`), so a commit serialized over
    * REST is meaningful to any spec-compliant server. */
  def addSnapshotOnly(snap: Snapshot): TableMetadata = copy(
    snapshots = snapshots :+ snap,
    lastSequenceNumber = math.max(lastSequenceNumber, snap.sequenceNumber),
    // clamp like the ref-update path: a writer with a skewed-behind
    // clock must not move the table's last-updated time backwards
    lastUpdatedMs = math.max(lastUpdatedMs, snap.timestampMs))

  /** Adds the snapshot and advances `branch` to it. Only `main` moves
    * `currentSnapshotId` and the snapshot log (both follow main, as in
    * Iceberg); other branches move their ref alone, so main's content
    * is untouched until a fast-forward publish. */
  def withSnapshot(snap: Snapshot, branch: String = "main"): TableMetadata = {
    // tags are immutable pointers; last-line defense for every commit
    // path (local CAS and REST server side)
    refs.get(branch).filter(_.refType == "tag").foreach(_ =>
      throw new IllegalStateException(
        s"cannot commit to ref '$branch': it is a tag (immutable)"))
    val base = copy(
      snapshots = snapshots :+ snap,
      lastSequenceNumber = math.max(lastSequenceNumber, snap.sequenceNumber),
      lastUpdatedMs = snap.timestampMs,
      refs = refs + (branch -> SnapshotRef(snap.snapshotId, "branch")))
    if (branch == "main")
      base.copy(
        currentSnapshotId = Some(snap.snapshotId),
        snapshotLog = snapshotLog :+
          SnapshotLogEntry(snap.snapshotId, snap.timestampMs))
    else base
  }

  def removeSnapshots(ids: Set[Long]): TableMetadata = copy(
    snapshots = snapshots.filterNot(s => ids.contains(s.snapshotId)),
    snapshotLog = snapshotLog.filterNot(e => ids.contains(e.snapshotId)),
    // refs pointing at removed snapshots would dangle (and break scans
    // by tag/branch); drop them with the snapshots they referenced
    refs = refs.filterNot { case (_, r) => ids.contains(r.snapshotId) })

  def toJson: String = MetadataJson.write(this)
}

object TableMetadata {
  /** Fresh V2 metadata for a new table (`spec/metadata.go:194-233`). */
  def newTable(
      tableUuid: String,
      location: String,
      schema: Schema,
      spec: PartitionSpec = PartitionSpec.unpartitioned,
      properties: Map[String, String] = Map.empty): TableMetadata =
    TableMetadata(
      formatVersion = 2,
      tableUuid = tableUuid,
      location = location,
      lastUpdatedMs = System.currentTimeMillis(),
      lastColumnId = schema.highestFieldId,
      schemas = Seq(schema),
      currentSchemaId = schema.schemaId,
      partitionSpecs = Seq(spec),
      defaultSpecId = spec.specId,
      lastPartitionId = spec.lastFieldId,
      properties = properties)

  def fromJson(json: String): TableMetadata = MetadataJson.parse(json)
}
