package graft.spec

/** Snapshot operation vocabulary (`spec/snapshot.go:9-17`). */
sealed trait Operation { def name: String }
object Operation {
  case object Append extends Operation { val name = "append" }
  case object Replace extends Operation { val name = "replace" }
  case object Overwrite extends Operation { val name = "overwrite" }
  case object Delete extends Operation { val name = "delete" }
  def parse(s: String): Operation = s match {
    case "append" => Append
    case "replace" => Replace
    case "overwrite" => Overwrite
    case "delete" => Delete
    case other => throw new IllegalArgumentException(s"unknown operation: $other")
  }
}

/** Snapshot summary: operation + string-encoded counters
  * (`spec/snapshot.go:20-40,84-209`). Counters are kept in a typed map;
  * zero values are omitted on serialization like the reference. */
final case class Summary(
    operation: Operation,
    counters: Map[String, Long] = Map.empty,
    extra: Map[String, String] = Map.empty) {
  def counter(key: String): Long = counters.getOrElse(key, 0L)
  def withCounter(key: String, v: Long): Summary =
    if (v == 0L) this else copy(counters = counters + (key -> v))
}

object Summary {
  // Canonical counter keys (spec/snapshot.go:22-37)
  val AddedDataFiles = "added-data-files"
  val AddedRecords = "added-records"
  val AddedFilesSize = "added-files-size"
  val RemovedDataFiles = "removed-data-files"
  val RemovedRecords = "removed-records"
  val RemovedFilesSize = "removed-files-size"
  val DeletedDataFiles = "deleted-data-files"
  val DeletedRecords = "deleted-records"
  val AddedDeleteFiles = "added-delete-files"
  val AddedPositionDeletes = "added-position-deletes"
  val AddedEqualityDeletes = "added-equality-deletes"
  val TotalRecords = "total-records"
  val TotalFilesSize = "total-files-size"
  val TotalDataFiles = "total-data-files"
  val TotalDeleteFiles = "total-delete-files"
  val TotalPositionDeletes = "total-position-deletes"
  val TotalEqualityDeletes = "total-equality-deletes"
  val counterKeys: Set[String] = Set(AddedDataFiles, AddedRecords,
    AddedFilesSize, RemovedDataFiles, RemovedRecords, RemovedFilesSize,
    DeletedDataFiles, DeletedRecords, AddedDeleteFiles,
    AddedPositionDeletes, AddedEqualityDeletes, TotalRecords,
    TotalFilesSize, TotalDataFiles, TotalDeleteFiles,
    TotalPositionDeletes, TotalEqualityDeletes)
}

final case class Snapshot(
    snapshotId: Long,
    parentSnapshotId: Option[Long],
    sequenceNumber: Long,
    timestampMs: Long,
    manifestList: String,
    summary: Option[Summary],
    schemaId: Option[Int])

/** Branch or tag pointer with retention knobs (`spec/snapshot.go:64-70`). */
final case class SnapshotRef(
    snapshotId: Long,
    refType: String, // "branch" | "tag"
    minSnapshotsToKeep: Option[Int] = None,
    maxSnapshotAgeMs: Option[Long] = None,
    maxRefAgeMs: Option[Long] = None)

final case class SnapshotLogEntry(snapshotId: Long, timestampMs: Long)

final case class MetadataLogEntry(timestampMs: Long, metadataFile: String)
