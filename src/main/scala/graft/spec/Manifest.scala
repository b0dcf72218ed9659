package graft.spec

/** Manifest-layer model (`spec/manifest.go`). A snapshot points at one
  * manifest list; each list row ([[ManifestFile]]) points at a manifest
  * Avro file whose rows ([[ManifestEntry]]) each carry one [[DataFile]].
  */
sealed abstract class ManifestContent(val id: Int, val name: String)
object ManifestContent {
  case object Data extends ManifestContent(0, "data")
  case object Deletes extends ManifestContent(1, "deletes")
  def fromId(id: Int): ManifestContent =
    if (id == 1) Deletes else Data
}

sealed abstract class FileContent(val id: Int, val name: String)
object FileContent {
  case object Data extends FileContent(0, "data")
  case object PositionDeletes extends FileContent(1, "position-deletes")
  case object EqualityDeletes extends FileContent(2, "equality-deletes")
  def fromId(id: Int): FileContent = id match {
    case 1 => PositionDeletes
    case 2 => EqualityDeletes
    case _ => Data
  }
}

sealed abstract class EntryStatus(val id: Int, val name: String)
object EntryStatus {
  case object Existing extends EntryStatus(0, "existing")
  case object Added extends EntryStatus(1, "added")
  case object Deleted extends EntryStatus(2, "deleted")
  def fromId(id: Int): EntryStatus = id match {
    case 1 => Added
    case 2 => Deleted
    case _ => Existing
  }
}

sealed abstract class FileFormat(val name: String)
object FileFormat {
  case object Parquet extends FileFormat("PARQUET")
  case object Avro extends FileFormat("AVRO")
  case object Orc extends FileFormat("ORC")
  def parse(s: String): FileFormat = s.toUpperCase match {
    case "PARQUET" => Parquet
    case "AVRO" => Avro
    case "ORC" => Orc
    case other => throw new IllegalArgumentException(s"unknown format: $other")
  }
}

/** A data (or delete) file with per-column stats keyed by FIELD ID
  * (`spec/manifest.go:101-149`). Bounds use the single-value binary
  * serialization in [[Bounds]]. */
final case class DataFile(
    content: FileContent = FileContent.Data,
    filePath: String,
    fileFormat: FileFormat = FileFormat.Parquet,
    partition: Map[String, Any] = Map.empty,
    recordCount: Long = 0L,
    fileSizeInBytes: Long = 0L,
    columnSizes: Map[Int, Long] = Map.empty,
    valueCounts: Map[Int, Long] = Map.empty,
    nullValueCounts: Map[Int, Long] = Map.empty,
    nanValueCounts: Map[Int, Long] = Map.empty,
    lowerBounds: Map[Int, Array[Byte]] = Map.empty,
    upperBounds: Map[Int, Array[Byte]] = Map.empty,
    keyMetadata: Option[Array[Byte]] = None,
    splitOffsets: Seq[Long] = Nil,
    equalityIds: Seq[Int] = Nil,
    sortOrderId: Option[Int] = None)

final case class ManifestEntry(
    status: EntryStatus,
    snapshotId: Option[Long],
    sequenceNumber: Option[Long],
    fileSequenceNumber: Option[Long],
    dataFile: DataFile)

/** Partition-value summary used for scan pruning
  * (`spec/manifest.go:199-205`). */
final case class PartitionFieldSummary(
    containsNull: Boolean,
    containsNan: Option[Boolean],
    lowerBound: Option[Array[Byte]],
    upperBound: Option[Array[Byte]])

/** One row of a manifest list (`spec/manifest.go:152-197`). */
final case class ManifestFile(
    manifestPath: String,
    manifestLength: Long,
    partitionSpecId: Int,
    content: ManifestContent,
    sequenceNumber: Long,
    minSequenceNumber: Long,
    addedSnapshotId: Long,
    addedFilesCount: Int,
    existingFilesCount: Int,
    deletedFilesCount: Int,
    addedRowsCount: Long,
    existingRowsCount: Long,
    deletedRowsCount: Long,
    partitions: Seq[PartitionFieldSummary] = Nil,
    keyMetadata: Option[Array[Byte]] = None) {
  def hasAddedFiles: Boolean = addedFilesCount > 0
  def hasDeletedFiles: Boolean = deletedFilesCount > 0
  def hasExistingFiles: Boolean = existingFilesCount > 0
  def totalFilesCount: Int =
    addedFilesCount + existingFilesCount + deletedFilesCount
  def liveRowsCount: Long = addedRowsCount + existingRowsCount
}

/** A parsed manifest: OCF metadata + entries (`spec/manifest.go:227-248`). */
final case class Manifest(
    schemaId: Int,
    partitionSpecId: Int,
    content: ManifestContent,
    sequenceNumber: Long,
    entries: Seq[ManifestEntry]) {
  def liveEntries: Seq[ManifestEntry] =
    entries.filter(_.status != EntryStatus.Deleted)
  def addedEntries: Seq[ManifestEntry] =
    entries.filter(_.status == EntryStatus.Added)
  def deletedEntries: Seq[ManifestEntry] =
    entries.filter(_.status == EntryStatus.Deleted)
}
