package graft.catalog

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

import graft.avro.ManifestAvro
import graft.io.HadoopFileIO
import graft.spec._
import graft.table._

object Fixtures {
  /** A1 users schema (FIXTURES.md, examples/basic/main.go:49-54). */
  val usersSchema: Schema = Schema(0, Seq(
    NestedField(1, "id", LongType, required = true),
    NestedField(2, "name", StringType, required = true),
    NestedField(3, "email", StringType, required = false),
    NestedField(4, "created_at", TimestampType, required = true)))

  def dataFile(path: String, records: Long, idLo: Long,
      idHi: Long): DataFile = DataFile(
    filePath = path,
    recordCount = records,
    fileSizeInBytes = records * 100,
    valueCounts = Map(1 -> records),
    nullValueCounts = Map(1 -> 0L),
    lowerBounds = Map(1 -> Bounds.serialize(idLo, LongType)),
    upperBounds = Map(1 -> Bounds.serialize(idHi, LongType)))
}

class ManifestAvroSpec extends AnyFunSuite {
  import Fixtures._

  test("manifest list round-trips through Avro OCF") {
    val mf = ManifestFile(
      manifestPath = "file:///t/metadata/manifest-1.avro",
      manifestLength = 1234L,
      partitionSpecId = 0,
      content = ManifestContent.Data,
      sequenceNumber = 3L,
      minSequenceNumber = 1L,
      addedSnapshotId = 99L,
      addedFilesCount = 2,
      existingFilesCount = 1,
      deletedFilesCount = 0,
      addedRowsCount = 200L,
      existingRowsCount = 100L,
      deletedRowsCount = 0L,
      partitions = Seq(PartitionFieldSummary(
        containsNull = false, containsNan = Some(false),
        lowerBound = Some(Bounds.serialize(5, IntType)),
        upperBound = Some(Bounds.serialize(9, IntType)))))
    val back = ManifestAvro.readManifestList(
      ManifestAvro.writeManifestList(Seq(mf, mf.copy(sequenceNumber = 4L))))
    assert(back.size == 2)
    assert(back.head.manifestPath == mf.manifestPath)
    assert(back.head.content == ManifestContent.Data)
    assert(back.head.partitions.head.upperBound.map(
      Bounds.deserialize(_, IntType)).contains(9))
    assert(back(1).sequenceNumber == 4L)
  }

  test("manifest entries round-trip with stats and partition tuple") {
    val spec = PartitionSpec.builder(0).day(4, "day").build()
    val pt = spec.partitionType(usersSchema)
    val df = dataFile("file:///t/data/f1.parquet", 100L, 1L, 100L)
      .copy(partition = Map("day" -> 19800))
    val entry = ManifestEntry(EntryStatus.Added, Some(7L), Some(2L),
      Some(2L), df)
    val bytes = ManifestAvro.writeManifest(0, spec, pt,
      ManifestContent.Data, Seq(entry))
    val m = ManifestAvro.readManifest(bytes)
    assert(m.schemaId == 0)
    assert(m.partitionSpecId == 0)
    assert(m.content == ManifestContent.Data)
    assert(m.entries.size == 1)
    val e = m.entries.head
    assert(e.status == EntryStatus.Added)
    assert(e.snapshotId.contains(7L))
    assert(e.dataFile.filePath == df.filePath)
    assert(e.dataFile.partition == Map("day" -> 19800))
    assert(e.dataFile.recordCount == 100L)
    assert(Bounds.deserialize(e.dataFile.lowerBounds(1), LongType) == 1L)
    assert(Bounds.deserialize(e.dataFile.upperBounds(1), LongType) == 100L)
  }

  test("delete-content manifest keeps content flag") {
    val spec = PartitionSpec.unpartitioned
    val pt = spec.partitionType(usersSchema)
    val df = dataFile("file:///t/data/del1.parquet", 10L, 1L, 10L)
      .copy(content = FileContent.PositionDeletes)
    val bytes = ManifestAvro.writeManifest(0, spec, pt,
      ManifestContent.Deletes,
      Seq(ManifestEntry(EntryStatus.Added, Some(1L), Some(1L), None, df)))
    val m = ManifestAvro.readManifest(bytes)
    assert(m.content == ManifestContent.Deletes)
    assert(m.entries.head.dataFile.content == FileContent.PositionDeletes)
  }
}

class LocalCatalogSpec extends AnyFunSuite {
  import Fixtures._

  private def freshCatalog(): (LocalCatalog, String) = {
    val dir = Files.createTempDirectory("graft-cat-").toString
    (new LocalCatalog(dir), dir)
  }

  test("namespace + table CRUD (iceberg.go:117-292 surface)") {
    val (cat, _) = freshCatalog()
    cat.createNamespace(Seq("db"))
    assert(cat.namespaceExists(Seq("db")))
    intercept[AlreadyExistsException](cat.createNamespace(Seq("db")))

    val id = TableIdentifier(Seq("db"), "users")
    assert(!cat.tableExists(id))
    val meta = cat.createTable(id, usersSchema)
    assert(cat.tableExists(id))
    assert(meta.currentSchema == usersSchema)
    assert(cat.listTables(Seq("db")) == Seq(id))
    intercept[AlreadyExistsException](cat.createTable(id, usersSchema))

    val loaded = cat.loadTable(id)
    assert(loaded.tableUuid == meta.tableUuid)

    val id2 = TableIdentifier(Seq("db"), "users2")
    cat.renameTable(id, id2)
    assert(!cat.tableExists(id) && cat.tableExists(id2))

    cat.dropTable(id2, purge = true)
    assert(!cat.tableExists(id2))
    intercept[NoSuchTableException](cat.loadTable(id2))

    cat.dropNamespace(Seq("db"))
    assert(!cat.namespaceExists(Seq("db")))
  }

  test("registerTable points a new identifier at existing metadata") {
    val (cat, dir) = freshCatalog()
    cat.createNamespace(Seq("db"))
    val id = TableIdentifier(Seq("db"), "users")
    val meta = cat.createTable(id, usersSchema)
    val mloc = s"$dir/db/users/metadata/v00001.metadata.json"

    cat.createNamespace(Seq("mirror"))
    val rid = TableIdentifier(Seq("mirror"), "users_reg")
    val reg = cat.registerTable(rid, mloc)
    assert(reg.tableUuid == meta.tableUuid)
    val loaded = cat.loadTable(rid)
    assert(loaded.tableUuid == meta.tableUuid)
    // location untouched: the registered entry still points at the
    // ORIGINAL table location, nothing was copied or moved
    assert(loaded.location == meta.location)

    intercept[AlreadyExistsException](cat.registerTable(rid, mloc))
    intercept[NoSuchTableException](
      cat.registerTable(TableIdentifier(Seq("mirror"), "nope"),
        s"$dir/db/users/metadata/v99999.metadata.json"))
    // a metadata-only drop of the original leaves the registered entry
    cat.dropTable(id, purge = false)
    assert(cat.loadTable(rid).tableUuid == meta.tableUuid)
  }

  test("namespace properties: create, load, update, drop cleanup") {
    val (cat, _) = freshCatalog()
    cat.createNamespace(Seq("np"), Map("owner" -> "graft"))
    assert(cat.loadNamespaceProperties(Seq("np")) == Map("owner" -> "graft"))
    // a namespace created without properties loads empty
    cat.createNamespace(Seq("np0"))
    assert(cat.loadNamespaceProperties(Seq("np0")).isEmpty)
    // removals then updates; removal of an absent key is a no-op
    cat.updateNamespaceProperties(Seq("np"),
      removals = Seq("owner", "ghost"), updates = Map("tier" -> "gold"))
    assert(cat.loadNamespaceProperties(Seq("np")) == Map("tier" -> "gold"))
    // the properties dot-file is invisible to namespace/table listings
    assert(cat.listTables(Seq("np")).isEmpty)
    assert(cat.listNamespaces().contains(Seq("np")))
    // and does not block namespace drop
    cat.dropNamespace(Seq("np"))
    assert(!cat.namespaceExists(Seq("np")))
    intercept[NoSuchNamespaceException](
      cat.loadNamespaceProperties(Seq("np")))
    intercept[NoSuchNamespaceException](
      cat.updateNamespaceProperties(Seq("ghostns"), Nil, Map("a" -> "b")))
  }

  test("commit bumps version and records metadata log") {
    val (cat, _) = freshCatalog()
    cat.createNamespace(Seq("db"))
    val id = TableIdentifier(Seq("db"), "t")
    cat.createTable(id, usersSchema)
    val m1 = cat.commitTable(id, Nil,
      Seq(TableUpdate.SetProperties(Map("k" -> "v"))))
    assert(m1.properties("k") == "v")
    assert(m1.metadataLog.size == 1)
    val m2 = cat.loadTable(id)
    assert(m2.properties("k") == "v")
  }

  test("stale requirement -> CommitFailedException (optimistic concurrency)") {
    val (cat, _) = freshCatalog()
    cat.createNamespace(Seq("db"))
    val id = TableIdentifier(Seq("db"), "t")
    cat.createTable(id, usersSchema)
    // writer A commits a snapshot ref
    cat.commitTable(id, Nil, Seq(TableUpdate.SetSnapshotRef("main", 111L,
      "branch")))
    // writer B still believes main is unset
    intercept[CommitFailedException] {
      cat.commitTable(id,
        Seq(TableRequirement.AssertRefSnapshotId("main", None)),
        Seq(TableUpdate.SetSnapshotRef("main", 222L, "branch")))
    }
    // B refreshes and retries with the right expectation
    val m = cat.commitTable(id,
      Seq(TableRequirement.AssertRefSnapshotId("main", Some(111L))),
      Seq(TableUpdate.SetSnapshotRef("main", 222L, "branch")))
    assert(m.ref("main").map(_.snapshotId).contains(222L))
  }

  test("concurrent version write: exactly one winner") {
    val (cat, _) = freshCatalog()
    cat.createNamespace(Seq("db"))
    val id = TableIdentifier(Seq("db"), "race")
    cat.createTable(id, usersSchema)
    import scala.collection.parallel.CollectionConverters._
    val results = (1 to 8).par.map { i =>
      try { cat.commitTable(id, Nil, Seq(TableUpdate.SetProperties(
        Map("writer" -> i.toString)))); 1 } catch {
        case _: CommitFailedException => 0
      }
    }
    // every attempt either succeeded or got a clean conflict; the final
    // state is a consistent chain of versions
    val m = cat.loadTable(id)
    assert(m.properties.contains("writer"))
    assert(results.sum >= 1)
  }
}

class SnapshotCommitSpec extends AnyFunSuite {
  import Fixtures._

  private def freshTable(): Table = {
    val dir = Files.createTempDirectory("graft-tbl-").toString
    val cat = new LocalCatalog(dir)
    cat.createNamespace(Seq("db"))
    Table.create(cat, TableIdentifier(Seq("db"), "t"), usersSchema,
      io = new HadoopFileIO())
  }

  test("append snapshots carry forward earlier manifests (fixes table.go:436-446 gap)") {
    var t = freshTable()
    t = t.commitSnapshot(PendingSnapshot(Operation.Append,
      addedDataFiles = Seq(dataFile("file:///d/f1.parquet", 10, 1, 10))))
    t = t.commitSnapshot(PendingSnapshot(Operation.Append,
      addedDataFiles = Seq(dataFile("file:///d/f2.parquet", 20, 11, 30))))
    val snap = t.currentSnapshot.get
    assert(snap.sequenceNumber == 2L)
    val manifests = t.manifestList(snap)
    assert(manifests.size == 2, "second snapshot must keep first manifest")
    val allFiles = manifests.flatMap(m => t.readManifest(m).liveEntries)
      .map(_.dataFile.filePath)
    assert(allFiles.toSet == Set("file:///d/f1.parquet", "file:///d/f2.parquet"))
    assert(snap.summary.get.counter(Summary.TotalRecords) == 30L)
    assert(snap.summary.get.counter(Summary.TotalDataFiles) == 2L)
    // time travel to snapshot 1 still sees only f1
    val first = t.metadata.snapshots.head
    val firstFiles = t.manifestList(first)
      .flatMap(m => t.readManifest(m).liveEntries).map(_.dataFile.filePath)
    assert(firstFiles == Seq("file:///d/f1.parquet"))
  }

  test("delete rewrites affected manifest, keeps survivors as Existing") {
    var t = freshTable()
    t = t.commitSnapshot(PendingSnapshot(Operation.Append, addedDataFiles =
      Seq(dataFile("file:///d/f1.parquet", 10, 1, 10),
        dataFile("file:///d/f2.parquet", 20, 11, 30))))
    t = t.commitSnapshot(PendingSnapshot(Operation.Delete,
      deletedFilePaths = Set("file:///d/f1.parquet")))
    val snap = t.currentSnapshot.get
    val live = t.manifestList(snap)
      .flatMap(m => t.readManifest(m).liveEntries)
    assert(live.map(_.dataFile.filePath) == Seq("file:///d/f2.parquet"))
    assert(live.head.status == EntryStatus.Existing)
    // original data sequence number preserved on the survivor
    assert(live.head.sequenceNumber.contains(1L))
    val sum = snap.summary.get
    assert(sum.counter(Summary.DeletedDataFiles) == 1L)
    assert(sum.counter(Summary.DeletedRecords) == 10L)
    assert(sum.counter(Summary.TotalRecords) == 20L)
  }

  test("concurrent appends both land via retry loop") {
    val t0 = freshTable()
    import scala.collection.parallel.CollectionConverters._
    (1 to 4).par.foreach { i =>
      t0.refresh().commitSnapshot(PendingSnapshot(Operation.Append,
        addedDataFiles = Seq(dataFile(s"file:///d/c$i.parquet", i, i, i))))
    }
    val t = t0.refresh()
    val files = t.manifestList(t.currentSnapshot.get)
      .flatMap(m => t.readManifest(m).liveEntries).map(_.dataFile.filePath)
    assert(files.size == 4, s"all 4 concurrent appends must survive: $files")
    assert(t.metadata.snapshots.size == 4)
  }

  test("metadata-only transaction: refs, properties, schema evolution") {
    var t = freshTable()
    t = t.commitSnapshot(PendingSnapshot(Operation.Append,
      addedDataFiles = Seq(dataFile("file:///d/f1.parquet", 10, 1, 10))))
    val sid = t.currentSnapshot.get.snapshotId
    t = t.newTransaction()
      .setRef("audit", sid, "tag")
      .setProperties(Map("owner" -> "graft"))
      .commit()
    assert(t.metadata.ref("audit").exists(_.refType == "tag"))
    assert(t.metadata.properties("owner") == "graft")

    val evolved = t.schema.copy(fields = t.schema.fields :+
      NestedField(5, "age", IntType, required = false))
    t = t.newTransaction().addSchema(evolved).commit()
    assert(t.schema.fieldByName("age").isDefined)
    assert(t.metadata.lastColumnId == 5)
  }

  test("rollback keeps the snapshot log chronological (no back-dating)") {
    var t = freshTable()
    t = t.commitSnapshot(PendingSnapshot(Operation.Append,
      addedDataFiles = Seq(dataFile("file:///d/f1.parquet", 10, 1, 10))))
    val s1 = t.currentSnapshot.get.snapshotId
    Thread.sleep(5)
    t = t.commitSnapshot(PendingSnapshot(Operation.Append,
      addedDataFiles = Seq(dataFile("file:///d/f2.parquet", 20, 11, 30))))
    val s2 = t.currentSnapshot.get.snapshotId
    // rollback: main moves BACK to s1 — the log must gain an entry at
    // the rollback's own position in time, not re-stamp s1's original
    // timestamp (which would break as-of-timestamp resolution and any
    // reader that requires a sorted history)
    t = t.newTransaction().setRef("main", s1).commit()
    val log = t.metadata.snapshotLog
    assert(log.map(_.snapshotId) == Seq(s1, s2, s1),
      s"rollback must append, got ${log.map(_.snapshotId)}")
    assert(log.sliding(2).forall(p =>
      p.head.timestampMs <= p.last.timestampMs),
      s"log must stay non-decreasing, got ${log.map(_.timestampMs)}")
    assert(t.currentSnapshot.map(_.snapshotId).contains(s1))
    // idempotent re-set: no duplicate entry
    t = t.newTransaction().setRef("main", s1).commit()
    assert(t.metadata.snapshotLog.size == 3)
  }
}
