package graft.catalog

import graft.spec._

final case class TableIdentifier(namespace: Seq[String], name: String) {
  override def toString: String = (namespace :+ name).mkString(".")
}

object TableIdentifier {
  def of(parts: String*): TableIdentifier =
    TableIdentifier(parts.init, parts.last)
  def parse(s: String): TableIdentifier = of(s.split('.').toSeq: _*)
}

/** Commit-time preconditions (optimistic concurrency), mirroring
  * `catalog/catalog.go:131-203`. */
sealed trait TableRequirement
object TableRequirement {
  case object AssertCreate extends TableRequirement
  final case class AssertTableUuid(uuid: String) extends TableRequirement
  /** `snapshotId = None` asserts the ref does NOT exist. */
  final case class AssertRefSnapshotId(ref: String, snapshotId: Option[Long])
      extends TableRequirement
  final case class AssertCurrentSchemaId(id: Int) extends TableRequirement
  final case class AssertLastAssignedFieldId(id: Int) extends TableRequirement
  final case class AssertDefaultSpecId(id: Int) extends TableRequirement
  final case class AssertDefaultSortOrderId(id: Int) extends TableRequirement

  /** Check one requirement against current metadata; returns an error
    * message if violated (`catalog/catalog.go` REST-server semantics). */
  def check(r: TableRequirement, m: TableMetadata): Option[String] = r match {
    case AssertCreate => Some("table already exists")
    case AssertTableUuid(u) =>
      if (m.tableUuid == u) None
      else Some(s"uuid mismatch: ${m.tableUuid} != $u")
    case AssertRefSnapshotId(ref, expected) =>
      val actual = m.ref(ref).map(_.snapshotId)
      if (actual == expected) None
      else Some(s"ref $ref snapshot changed: $actual != $expected")
    case AssertCurrentSchemaId(id) =>
      if (m.currentSchemaId == id) None
      else Some(s"current schema changed: ${m.currentSchemaId} != $id")
    case AssertLastAssignedFieldId(id) =>
      if (m.lastColumnId == id) None
      else Some(s"last column id changed: ${m.lastColumnId} != $id")
    case AssertDefaultSpecId(id) =>
      if (m.defaultSpecId == id) None
      else Some(s"default spec changed: ${m.defaultSpecId} != $id")
    case AssertDefaultSortOrderId(id) =>
      if (m.defaultSortOrderId == id) None
      else Some(s"default sort order changed: ${m.defaultSortOrderId} != $id")
  }
}

/** Metadata mutations applied atomically at commit
  * (`catalog/catalog.go:205-280`). */
sealed trait TableUpdate
object TableUpdate {
  /** Spec `add-snapshot`: records the snapshot without moving any ref.
    * A data commit pairs it with a [[SetSnapshotRef]] for the target
    * branch — the Iceberg REST spec's vocabulary (reference
    * `catalog/catalog.go:205-280`), so commits serialize losslessly to
    * any compliant server. */
  final case class AddSnapshot(snapshot: Snapshot) extends TableUpdate
  final case class SetSnapshotRef(refName: String, snapshotId: Long,
      refType: String,
      minSnapshotsToKeep: Option[Int] = None,
      maxSnapshotAgeMs: Option[Long] = None,
      maxRefAgeMs: Option[Long] = None) extends TableUpdate
  final case class RemoveSnapshots(snapshotIds: Seq[Long]) extends TableUpdate
  final case class RemoveSnapshotRef(refName: String) extends TableUpdate
  final case class AddSchema(schema: Schema, setCurrent: Boolean)
      extends TableUpdate
  final case class SetCurrentSchema(schemaId: Int) extends TableUpdate
  final case class AddPartitionSpec(spec: PartitionSpec) extends TableUpdate
  final case class SetDefaultSpec(specId: Int) extends TableUpdate
  final case class AddSortOrder(order: SortOrder) extends TableUpdate
  final case class SetDefaultSortOrder(orderId: Int) extends TableUpdate
  final case class SetLocation(location: String) extends TableUpdate
  final case class SetProperties(updates: Map[String, String])
      extends TableUpdate
  final case class RemoveProperties(removals: Seq[String]) extends TableUpdate

  /** Apply a commit's updates in order. Threads the set of snapshot
    * ids ADDED IN THIS BATCH so `set-snapshot-ref` can tell a fresh
    * data commit (log entry at the snapshot's own time) from a
    * retarget of a pre-existing snapshot — rollback or WAP
    * fast-forward publish — which logs at the retarget's own time. */
  def applyAll(m: TableMetadata, updates: Seq[TableUpdate]): TableMetadata = {
    val batchAdded = updates.collect {
      case AddSnapshot(s) => s.snapshotId
    }.toSet
    updates.foldLeft(m)((acc, u) => apply(acc, u, batchAdded))
  }

  def apply(m: TableMetadata, u: TableUpdate): TableMetadata =
    apply(m, u, Set.empty)

  private def apply(m: TableMetadata, u: TableUpdate,
      batchAdded: Set[Long]): TableMetadata = u match {
    case AddSnapshot(s) => m.addSnapshotOnly(s)
    case SetSnapshotRef(name, id, tpe, minKeep, maxSnapAge, maxRefAge) =>
      // last-line defense for every commit path (local CAS and REST
      // server side): a data commit emits type "branch", so advancing
      // an existing TAG this way is a misdirected write, not a retarget
      // (retargeting a tag stays possible via an explicit "tag" update)
      if (tpe == "branch" &&
          m.refs.get(name).exists(_.refType == "tag"))
        throw new IllegalStateException(
          s"cannot commit to ref '$name': it is a tag (immutable)")
      val base = m.copy(refs = m.refs +
        (name -> SnapshotRef(id, tpe, minKeep, maxSnapAge, maxRefAge)))
      if (name == "main") {
        if (m.currentSnapshotId.contains(id)) base // idempotent re-set
        else {
          // The snapshot log records WHEN each snapshot became current
          // (Iceberg semantics — as-of-timestamp resolves through it).
          // A fresh data commit (the snapshot was ADDED in this same
          // update batch) logs at the snapshot's own timestamp; a
          // RETARGET of a pre-existing snapshot — rollback, or a WAP
          // fast-forward publish of a branch head — logs at the
          // retarget's own time: re-stamping the old timestamp would
          // claim main contained the snapshot during a window it did
          // not, mis-resolving as-of reads. Clamped to the log head so
          // clock skew can never unsort the history.
          val fresh = batchAdded.contains(id)
          val entryTs = Seq(
            if (fresh)
              m.snapshotById(id).map(_.timestampMs)
                .getOrElse(m.lastUpdatedMs)
            else System.currentTimeMillis(),
            m.snapshotLog.lastOption.map(_.timestampMs)
              .getOrElse(Long.MinValue)).max
          base.copy(
            currentSnapshotId = Some(id),
            lastUpdatedMs = math.max(m.lastUpdatedMs, entryTs),
            snapshotLog = m.snapshotLog :+ SnapshotLogEntry(id, entryTs))
        }
      } else base
    case RemoveSnapshots(ids) => m.removeSnapshots(ids.toSet)
    case RemoveSnapshotRef(name) => m.copy(refs = m.refs - name)
    case AddSchema(s, setCurrent) => m.addSchema(s, setCurrent)
    case SetCurrentSchema(id) => m.copy(currentSchemaId = id)
    case AddPartitionSpec(s) =>
      m.copy(partitionSpecs = m.partitionSpecs :+ s,
        lastPartitionId = math.max(m.lastPartitionId, s.lastFieldId))
    case SetDefaultSpec(id) => m.copy(defaultSpecId = id)
    case AddSortOrder(o) => m.copy(sortOrders = m.sortOrders :+ o)
    case SetDefaultSortOrder(id) => m.copy(defaultSortOrderId = id)
    case SetLocation(loc) => m.copy(location = loc)
    case SetProperties(updates) => m.copy(properties = m.properties ++ updates)
    case RemoveProperties(removals) =>
      m.copy(properties = m.properties -- removals)
  }
}

class NoSuchTableException(msg: String) extends RuntimeException(msg)
class NoSuchNamespaceException(msg: String) extends RuntimeException(msg)
class AlreadyExistsException(msg: String) extends RuntimeException(msg)
/** Retryable: another writer won the CAS (`errors.go:95-123`). */
class CommitFailedException(msg: String) extends RuntimeException(msg)

/** Raised when a commit retry detects that files the pending snapshot
  * depends on (CoW candidates, MoR delete targets) were concurrently
  * rewritten or removed — recommitting would resurrect deleted rows or
  * target dead files; the caller must re-plan the rewrite against the
  * refreshed table (the richer requirement semantics the reference
  * declares at `catalog/catalog.go:170-203`). */
class CommitConflictException(msg: String) extends RuntimeException(msg)

/** Catalog client surface mirroring `catalog/catalog.go:11-53`. */
trait Catalog {
  def listNamespaces(): Seq[Seq[String]]
  def createNamespace(ns: Seq[String],
      properties: Map[String, String] = Map.empty): Unit
  def dropNamespace(ns: Seq[String]): Unit
  def namespaceExists(ns: Seq[String]): Boolean

  /** Namespace properties (`catalog/catalog.go:27-31`). */
  def loadNamespaceProperties(ns: Seq[String]): Map[String, String]

  /** Apply `removals` then `updates` atomically per the Iceberg REST
    * contract (`catalog/catalog.go:30-31`; body shape
    * `{"removals": [...], "updates": {...}}`). A key in both is
    * removed-then-set, i.e. ends at the updated value. */
  def updateNamespaceProperties(ns: Seq[String],
      removals: Seq[String] = Nil,
      updates: Map[String, String] = Map.empty): Unit

  def listTables(ns: Seq[String]): Seq[TableIdentifier]
  def createTable(id: TableIdentifier, schema: Schema,
      spec: PartitionSpec = PartitionSpec.unpartitioned,
      sortOrder: SortOrder = SortOrder.unsorted,
      properties: Map[String, String] = Map.empty): TableMetadata
  def loadTable(id: TableIdentifier): TableMetadata
  def tableExists(id: TableIdentifier): Boolean
  def dropTable(id: TableIdentifier, purge: Boolean = false): Unit
  def renameTable(from: TableIdentifier, to: TableIdentifier): Unit

  /** Register an EXISTING table's metadata file under `id` — the
    * Iceberg REST `POST /namespaces/{ns}/register` operation (spec
    * parity beyond the reference, like add_files). No data, manifest,
    * or metadata content moves: the catalog simply starts tracking the
    * given metadata as the table's current version; the table's
    * `location` (and therefore all future writes) stays wherever the
    * registered metadata says it is. */
  def registerTable(id: TableIdentifier,
      metadataLocation: String): TableMetadata

  /** Atomic commit: re-validate requirements against the CURRENT
    * metadata, apply updates, swap. Throws [[CommitFailedException]]
    * when a concurrent writer invalidated a requirement. */
  def commitTable(id: TableIdentifier,
      requirements: Seq[TableRequirement],
      updates: Seq[TableUpdate]): TableMetadata
}
