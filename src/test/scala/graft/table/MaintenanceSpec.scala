package graft.table

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame

import graft.SparkTestSession
import graft.catalog._
import graft.io.HadoopFileIO
import graft.spec._

class MaintenanceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def freshTable(name: String): Table = {
    val dir = Files.createTempDirectory("graft-maint-").toString
    val cat = new LocalCatalog(dir)
    cat.createNamespace(Seq("db"))
    Table.create(cat, TableIdentifier(Seq("db"), name),
      Fixtures4.usersSchema, io = new HadoopFileIO())
  }

  private def usersDf(ids: Range): DataFrame = {
    import spark.implicits._
    ids.map(i => (i.toLong, s"user_$i", s"u$i@x.com",
      new java.sql.Timestamp(1704067200000L + i)))
      .toDF("id", "name", "email", "created_at")
  }

  test("branch maxSnapshotAgeMs pins young ancestors beyond " +
      "minSnapshotsToKeep") {
    var t = freshTable("brage")
    (1 to 4).foreach(i => t = TableOps.append(t, usersDf(i to i)))
    val all = t.metadata.snapshots.map(_.snapshotId).toSet
    val head = t.currentSnapshot.get.snapshotId
    val now = System.currentTimeMillis()
    // a generous per-branch age window pins the WHOLE ancestry even
    // though the global cutoff would expire everything but the head
    t = t.newTransaction().setRef("b", head,
      maxSnapshotAgeMs = Some(3600L * 1000)).commit()
    val kept = Maintenance.expireSnapshots(t, olderThanMs = now + 60000,
      nowMs = now)
    assert(kept.metadata.snapshots.map(_.snapshotId).toSet == all,
      "ancestors inside the branch age window must survive")
    // a zero window pins only the head (minSnapshotsToKeep default 1):
    // the global cutoff now removes the older ancestors
    var t2 = kept.newTransaction().setRef("b", head,
      maxSnapshotAgeMs = Some(0L)).commit()
    t2 = Maintenance.expireSnapshots(t2, olderThanMs = now + 60000,
      nowMs = now + 10)
    assert(t2.metadata.snapshots.map(_.snapshotId).toSet == Set(head),
      s"aged-out ancestors must expire, kept ${t2.metadata.snapshots.size}")
  }

  test("compaction bin-packs many files into few, content-preserving") {
    var t = freshTable("compact")
    (1 to 6).foreach { b =>
      t = TableOps.append(t,
        usersDf((b * 100) to (b * 100 + 9)).coalesce(1))
    }
    assert(Scan(t, spark).planFiles().size == 6)
    val before = Scan(t, spark).toDF.orderBy("id").collect().toSeq
    t = Maintenance.compactDataFiles(t, spark)
    assert(Scan(t, spark).planFiles().size < 6, "fewer files after compaction")
    assert(t.currentSnapshot.get.summary.get.operation == Operation.Replace)
    val after = Scan(t, spark).toDF.orderBy("id").collect().toSeq
    assert(after == before, "compaction must not change content")
  }

  test("compaction absorbs MoR delete files into rewritten data") {
    var t = freshTable("compactmor")
    t = TableOps.append(t, usersDf(1 to 20).coalesce(1))
    t = t.newDelete(spark).where(Col("id").lte(5L))
      .withMergeOnRead(true).execute()
    assert(Scan(t, spark).planFiles().exists(_.deleteFiles.nonEmpty))
    t = Maintenance.compactDataFiles(t, spark)
    val tasks = Scan(t, spark).planFiles()
    assert(tasks.forall(_.deleteFiles.isEmpty),
      "post-compaction scan needs no delete-file application")
    assert(Scan(t, spark).count() == 15)
  }

  test("incremental compaction leaves well-sized files untouched, keeps shared deletes") {
    var t = freshTable("incrcompact")
    t = TableOps.append(t, usersDf(1 to 10).coalesce(1))   // small
    t = TableOps.append(t, usersDf(11 to 20).coalesce(1))  // small
    t = TableOps.append(t, usersDf(21 to 1000).coalesce(1)) // "big"
    val bigPath = Scan(t, spark).planFiles()
      .maxBy(_.file.fileSizeInBytes).file.filePath
    val bigSize = Scan(t, spark).planFiles()
      .maxBy(_.file.fileSizeInBytes).file.fileSizeInBytes
    // MoR-delete rows living in a small file; the global delete file
    // attaches to every task
    t = Mutations.deleteMoR(t, spark, Col("id").in(1L, 2L))

    t = Maintenance.compactDataFiles(t, spark,
      smallFileThresholdBytes = bigSize, // compact everything below big
      absorbDeleteFiles = false) // cheap pass: don't chase global deletes
    val after = Scan(t, spark).planFiles()
    assert(after.map(_.file.filePath).contains(bigPath),
      "the well-sized file must survive compaction untouched")
    assert(after.size == 2,
      s"two small files bin-pack into one, big untouched: ${after.size}")
    // the delete file still attaches to the untouched big file (it was
    // NOT retired — the big file wasn't rewritten); rewritten files are
    // newer than it and unaffected
    val bigTask = after.find(_.file.filePath == bigPath).get
    assert(bigTask.deleteFiles.nonEmpty,
      "shared delete file must be retained for non-rewritten files")
    assert(Scan(t, spark).toDF.select("id").collect().map(_.getLong(0)).toSet ==
      (3 to 1000).map(_.toLong).toSet,
      "deleted rows stay deleted through incremental compaction")
  }

  test("compaction range-clusters output: disjoint bounds, better pruning") {
    var t = freshTable("compactrange")
    // six small files with INTERLEAVED id ranges: every file spans
    // nearly the full id domain, so pre-compaction pruning is useless
    (0 until 6).foreach { b =>
      t = TableOps.append(t, usersDf((b + 1) to 600 by 6).coalesce(1))
    }
    val before = Scan(t, spark).planFiles()
    assert(before.size == 6)
    assert(Scan(t, spark).filter(Col("id").lte(50L)).planFiles().size == 6,
      "interleaved files: bounds pruning can't help before compaction")
    val totalBytes = before.map(_.file.fileSizeInBytes).sum

    // target ≈ a third of the data → ~3 output files
    t = Maintenance.compactDataFiles(t, spark,
      targetFileSizeBytes = totalBytes / 3 + 1)
    val after = Scan(t, spark).planFiles()
    assert(after.size >= 2 && after.size < 6,
      s"multiple range-clustered outputs expected: ${after.size}")

    // id bounds of compacted files must be pairwise disjoint — that is
    // what repartitionByRange buys over round-robin
    val ranges = after.map { task =>
      val lo = Bounds.deserialize(task.file.lowerBounds(1), LongType)
        .asInstanceOf[Long]
      val hi = Bounds.deserialize(task.file.upperBounds(1), LongType)
        .asInstanceOf[Long]
      (lo, hi)
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Seq((_, hi1), (lo2, _)) =>
        assert(hi1 < lo2, s"overlapping compacted bounds: $ranges")
      case _ => ()
    }
    // and pruning now planFiles strictly fewer files than exist
    val pruned = Scan(t, spark).filter(Col("id").lte(50L)).planFiles()
    assert(pruned.size == 1,
      s"post-compaction pruning must isolate the low-id file: ${pruned.size}")
    assert(Scan(t, spark).toDF.count() == 600)
  }

  test("expireSnapshots removes snapshots and GCs orphaned files") {
    var t = freshTable("expire")
    t = TableOps.append(t, usersDf(1 to 10).coalesce(1))
    Thread.sleep(5)
    // full overwrite -> first snapshot's data file becomes unreferenced
    // once the first snapshot is expired
    t = Mutations.overwrite(t, spark, usersDf(100 to 109).coalesce(1))
    val firstDataFiles = {
      val first = t.metadata.snapshots.head
      t.manifestList(first).flatMap(m => t.readManifest(m).entries)
        .map(_.dataFile.filePath)
    }
    assert(firstDataFiles.nonEmpty)
    val cutoff = t.currentSnapshot.get.timestampMs
    t = Maintenance.expireSnapshots(t, olderThanMs = cutoff, retainLast = 1)
    assert(t.metadata.snapshots.size == 1)
    // old data file physically gone, current data intact
    firstDataFiles.foreach { p =>
      assert(!t.io.exists(p), s"orphan not GCed: $p")
    }
    assert(Scan(t, spark).count() == 10)
    assert(Scan(t, spark).toDF.agg(org.apache.spark.sql.functions.min("id"))
      .head.getLong(0) == 100L)
  }

  test("expireSnapshots pins each stream's LATEST batch-stamp " +
      "carrying snapshot (the crash heal's anchor source)") {
    var t = freshTable("expirestamp")
    val key = "graft.ann-index.last-batch-id.s1"
    // batch 0's corpus commit (stamp rides it, property + summary)
    t = TableOps.append(t, usersDf(1 to 5),
      props = Map(key -> "0"), summary = Map(key -> "0"))
    val carrying0 = t.currentSnapshot.get.snapshotId
    Thread.sleep(5)
    // batch 1 supersedes it — batch 0's index half has committed, so
    // its carrying snapshot is ordinary history again
    t = TableOps.append(t, usersDf(6 to 10),
      props = Map(key -> "1"), summary = Map(key -> "1"))
    val carrying1 = t.currentSnapshot.get.snapshotId
    Thread.sleep(5)
    // unrelated commits advance the head past the carrying snapshot
    t = TableOps.append(t, usersDf(11 to 15))
    t = TableOps.append(t, usersDf(16 to 20))
    val cutoff = t.currentSnapshot.get.timestampMs + 1
    t = Maintenance.expireSnapshots(t, olderThanMs = cutoff,
      retainLast = 1)
    val ids = t.metadata.snapshots.map(_.snapshotId).toSet
    assert(ids.contains(carrying1),
      "the LATEST stamp's carrying snapshot must survive expiry — a " +
        "crashed stream's heal resolves its index anchor from it")
    assert(!ids.contains(carrying0),
      "superseded stamps' carrying snapshots expire normally")
    assert(Scan(t, spark).count() == 20)
  }

  test("expireSnapshots keeps files still referenced by retained snapshots") {
    var t = freshTable("expire2")
    t = TableOps.append(t, usersDf(1 to 10).coalesce(1))
    Thread.sleep(5)
    t = TableOps.append(t, usersDf(11 to 20).coalesce(1)) // carries fwd file 1
    val sharedFile = {
      val first = t.metadata.snapshots.head
      t.manifestList(first).flatMap(m => t.readManifest(m).entries)
        .map(_.dataFile.filePath).head
    }
    val cutoff = t.currentSnapshot.get.timestampMs
    t = Maintenance.expireSnapshots(t, olderThanMs = cutoff, retainLast = 1)
    assert(t.metadata.snapshots.size == 1)
    assert(t.io.exists(sharedFile),
      "file referenced by the retained snapshot must survive GC")
    assert(Scan(t, spark).count() == 20)
  }
}

class CaseSensitivitySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("case-insensitive scan resolves filter and projection names") {
    val dir = Files.createTempDirectory("graft-case-").toString
    val cat = new LocalCatalog(dir)
    cat.createNamespace(Seq("db"))
    var t = Table.create(cat, TableIdentifier(Seq("db"), "c"),
      Fixtures4.usersSchema, io = new HadoopFileIO())
    import spark.implicits._
    def users(ids: Range) = ids.map(i => (i.toLong, s"u$i", s"e$i",
      new java.sql.Timestamp(i.toLong))).toDF("id", "name", "email",
      "created_at")
    t = TableOps.append(t, users(1 to 10).coalesce(1))
    t = TableOps.append(t, users(11 to 20).coalesce(1))
    val got = Scan(t, spark).withCaseSensitive(false)
      .filter(Col("ID").gt(18L))
      .select("NAME")
      .toDF.orderBy("NAME").collect().map(_.getString(0)).toSeq
    assert(got == Seq("u19", "u20"))
    // the engine-level flag drives PRUNING: a case-mismatched name
    // resolves (and prunes) only in insensitive mode; in sensitive mode
    // the unknown column disables stats pruning (conservative keep-all)
    assert(Scan(t, spark).withCaseSensitive(false)
      .filter(Col("ID").gt(18L)).planFiles().size == 1)
    assert(Scan(t, spark).filter(Col("ID").gt(18L)).planFiles().size == 2)
  }
}

class BoundsTruncationSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("long string bounds truncate but stay pruning-correct") {
    val dir = Files.createTempDirectory("graft-trunc-").toString
    val cat = new LocalCatalog(dir)
    cat.createNamespace(Seq("db"))
    val schema = Schema(0, Seq(
      NestedField(1, "doc_id", LongType, required = true),
      NestedField(2, "text", StringType, required = false)))
    var t = Table.create(cat, TableIdentifier(Seq("db"), "docs"), schema,
      io = new HadoopFileIO())
    import spark.implicits._
    val longText = "m" + ("x" * 100) // 101 chars, > 16-char bound cap
    t = TableOps.append(t, Seq(
      (1L, "aaa " + ("y" * 80)),
      (2L, longText),
      (3L, "zebra")).toDF("doc_id", "text").coalesce(1))
    val f = Scan(t, spark).planFiles().head.file
    val lower = new String(f.lowerBounds(2), "UTF-8")
    val upper = new String(f.upperBounds(2), "UTF-8")
    assert(lower.length <= 16 && upper.length <= 16,
      s"bounds must be truncated: '$lower' / '$upper'")
    // truncated bounds remain conservative for pruning + StartsWith
    assert(Scan(t, spark).filter(Col("text").startsWith("zeb")).toDF
      .count() == 1)
    assert(Scan(t, spark).filter(Col("text").eqTo(longText)).toDF
      .count() == 1)
    // a value clearly outside [lower, upper] prunes the file
    assert(Scan(t, spark).filter(Col("text").eqTo("zzzzz"))
      .planFiles().isEmpty)
  }

  test("dropColumn refuses partition-source columns") {
    val dir = Files.createTempDirectory("graft-dropguard-").toString
    val cat = new LocalCatalog(dir)
    cat.createNamespace(Seq("db"))
    val schema = Fixtures4.usersSchema
    val spec = PartitionSpec.builder(0).day(4, "d").build()
    val t = Table.create(cat, TableIdentifier(Seq("db"), "g"), schema,
      spec, io = new HadoopFileIO())
    intercept[IllegalArgumentException] {
      t.updateSchema().dropColumn("created_at")
    }
    // non-partition columns still droppable
    t.updateSchema().dropColumn("email")
  }
}

class RefExpirySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def freshTable(name: String): Table = {
    val dir = Files.createTempDirectory("graft-refexp-").toString
    val cat = new LocalCatalog(dir)
    cat.createNamespace(Seq("db"))
    Table.create(cat, TableIdentifier(Seq("db"), name),
      Fixtures4.usersSchema, io = new HadoopFileIO())
  }

  private def usersDf(ids: Range): DataFrame = {
    import spark.implicits._
    ids.map(i => (i.toLong, s"user_$i", s"u$i@x.com",
      new java.sql.Timestamp(1704067200000L + i)))
      .toDF("id", "name", "email", "created_at")
  }

  test("expiry cleans refs with unresolvable snapshots") {
    var t = freshTable("dangling")
    t = TableOps.append(t, usersDf(1 to 5))
    val s1 = t.currentSnapshot.get
    t = TableOps.append(t, usersDf(6 to 10))
    // dangle a tag: point it at s1, then drop s1 out from under it
    t = t.newTransaction().setRef("dangling", s1.snapshotId, "tag").commit()
    t = t.newTransaction().removeSnapshots(Seq(s1.snapshotId)).commit()
    assert(t.metadata.snapshotById(s1.snapshotId).isEmpty)
    val cleaned = Maintenance.expireSnapshots(t,
      olderThanMs = 0, nowMs = System.currentTimeMillis())
    assert(!cleaned.metadata.refs.contains("dangling"),
      "a ref whose snapshot no longer resolves pins nothing and is stale")
    assert(cleaned.currentSnapshot.isDefined)
  }

  test("main branch is never expired by maxRefAgeMs") {
    var t = freshTable("mainref")
    t = TableOps.append(t, usersDf(1 to 5))
    val sid = t.currentSnapshot.get.snapshotId
    // a max-ref-age far in the past on BOTH main and a side tag
    t = t.newTransaction()
      .setRef("main", sid, "branch", maxRefAgeMs = Some(1L))
      .setRef("old-tag", sid, "tag", maxRefAgeMs = Some(1L))
      .commit()
    val later = System.currentTimeMillis() + 1000000L
    val cleaned = Maintenance.expireSnapshots(t,
      olderThanMs = 0, nowMs = later)
    assert(cleaned.metadata.refs.contains("main"),
      "main is the table's current lineage — never age-expired")
    assert(!cleaned.metadata.refs.contains("old-tag"),
      "ordinary refs past maxRefAgeMs are dropped")
    assert(cleaned.currentSnapshot.map(_.snapshotId).contains(sid))
  }

  test("rewriteManifests preserves MoR delete application") {
    var t = freshTable("rwm")
    (1 to 4).foreach(b =>
      t = TableOps.append(t, usersDf((b * 10) to (b * 10 + 4)).coalesce(1)))
    // MoR-delete two rows, THEN rewrite manifests: delete application
    // is sequence-number-based, so the rewritten (Existing) entries
    // must keep their original sequence numbers for deletes to stick
    t = Mutations.deleteMoR(t, spark, Col("id").in(11L, 22L))
    val before = Scan(t, spark).toDF.orderBy("id").collect().toSeq
    val dataManifests = (x: Table) => x.manifestList(x.currentSnapshot.get)
      .count(_.content == ManifestContent.Data)
    assert(dataManifests(t) >= 4)
    t = Maintenance.rewriteManifests(t)
    assert(dataManifests(t) == 1, "data manifests bin-packed into one")
    assert(t.currentSnapshot.get.summary.get.operation == Operation.Replace)
    val after = Scan(t, spark).toDF.orderBy("id").collect().toSeq
    assert(after == before, "content identical; MoR deletes still apply")
    assert(!after.exists(r => r.getLong(0) == 11L || r.getLong(0) == 22L))
    // idempotent: a second rewrite is a no-op (already one manifest)
    val again = Maintenance.rewriteManifests(t)
    assert(again.currentSnapshot.get.snapshotId ==
      t.currentSnapshot.get.snapshotId)
  }

  test("rewriteManifests groups by write schema id (remap provenance)") {
    var t = freshTable("rwms")
    t = TableOps.append(t, usersDf(1 to 5).coalesce(1))
    t = TableOps.append(t, usersDf(6 to 9).coalesce(1))
    // evolve the schema, then append under the NEW schema id
    t = t.updateSchema().renameColumn("email", "contact").commit()
    import spark.implicits._
    t = TableOps.append(t, (10 to 12).map(i => (i.toLong, s"user_$i",
      s"u$i@x.com", new java.sql.Timestamp(1704067200000L + i)))
      .toDF("id", "name", "contact", "created_at").coalesce(1))
    t = Maintenance.rewriteManifests(t)
    // one manifest per write schema — merging would lose the per-file
    // schema id that drives renamed-column remapping at read
    val mfs = t.manifestList(t.currentSnapshot.get)
      .filter(_.content == ManifestContent.Data)
    assert(mfs.size == 2, s"one manifest per write schema, got ${mfs.size}")
    val schemaIds = mfs.map(mf => t.readManifest(mf).schemaId).toSet
    assert(schemaIds.size == 2)
    // pre-rename rows still surface their values under the new name
    val vals = Scan(t, spark).toDF.orderBy("id")
      .select("contact").collect().map(_.getString(0))
    assert(vals.length == 12 && vals.head == "u1@x.com")
  }

  test("removeOrphanFiles keeps everything reachable, removes the rest") {
    var t = freshTable("orphan")
    t = TableOps.append(t, usersDf(1 to 10))
    val dataDir = t.metadata.location.stripSuffix("/") + "/data"
    val orphan = s"$dataDir/leftover-from-crash.parquet"
    t.io.writeString(orphan, "junk")
    val report = Maintenance.removeOrphanFiles(t,
      olderThanMs = System.currentTimeMillis() + 60000)
    assert(report.deleted.exists(_.endsWith("leftover-from-crash.parquet")))
    assert(report.failed.isEmpty)
    assert(!t.io.exists(orphan))
    assert(Scan(t, spark).toDF.count() == 10, "live data untouched")
    // a second pass finds nothing
    val second = Maintenance.removeOrphanFiles(t,
      olderThanMs = System.currentTimeMillis() + 60000)
    assert(second.deleted.isEmpty && second.failed.isEmpty)
  }

  test("removeOrphanFiles never deletes tailer checkpoints") {
    var t = freshTable("tailgc")
    t = TableOps.append(t, usersDf(1 to 5))
    val metaDir = t.metadata.location.stripSuffix("/") + "/metadata"
    // a TableTailer's durable consumer state: unreachable from any
    // snapshot, not .json — deleting it would silently reset the
    // consumer to a full-table redelivery
    val cp = s"$metaDir/tail-checkpoint-myconsumer"
    t.io.writeString(cp, "12345")
    val report = Maintenance.removeOrphanFiles(t,
      olderThanMs = System.currentTimeMillis() + 60000)
    assert(t.io.exists(cp), "tailer checkpoint must survive orphan GC")
    assert(!report.deleted.exists(_.contains("tail-checkpoint")),
      report.deleted.toString)
  }

  test("GC failures are surfaced, and expiry still commits") {
    var t = freshTable("gcfail")
    t = TableOps.append(t, usersDf(1 to 5))
    t = TableOps.append(t.refresh(), usersDf(6 to 10))

    // Failure injection: an IO that refuses to delete chosen paths —
    // the deterministic analog of an object store returning 403/500.
    // (Posix tricks — chmod-555 parents, file-as-directory — can't
    // force a delete failure here: tests run as root, and listFiles
    // is recursive so a planted directory's CHILD becomes the orphan.)
    def norm(p: String): String = p.replaceFirst("^file:/+", "/")
    class VetoDeleteIO(inner: graft.io.FileIO, veto: String => Boolean)
        extends graft.io.FileIO {
      def open(path: String) = inner.open(path)
      def openRange(path: String, offset: Long, length: Long) =
        inner.openRange(path, offset, length)
      def create(path: String, overwrite: Boolean) =
        inner.create(path, overwrite)
      def delete(path: String): Unit =
        if (veto(path)) throw new java.io.IOException(
          s"injected delete failure: $path")
        else inner.delete(path)
      def exists(path: String) = inner.exists(path)
      def length(path: String) = inner.length(path)
      def listFiles(prefix: String) = inner.listFiles(prefix)
      override def modificationTime(path: String) =
        inner.modificationTime(path)
      override def rename(src: String, dst: String) =
        inner.rename(src, dst)
    }
    def withVeto(base: Table, veto: String => Boolean): Table =
      new Table(base.catalog, base.id, base.refresh().metadata,
        new VetoDeleteIO(base.io, veto))

    // orphan half: the GC must report (not swallow, not abort on) a
    // file it cannot delete, and still delete the rest
    val dataDir = t.metadata.location.stripSuffix("/") + "/data"
    val stubborn = s"$dataDir/stubborn-orphan.parquet"
    val disposable = s"$dataDir/plain-orphan.parquet"
    t.io.writeString(stubborn, "junk")
    t.io.writeString(disposable, "junk")
    val report = Maintenance.removeOrphanFiles(
      withVeto(t, _.endsWith("stubborn-orphan.parquet")),
      olderThanMs = System.currentTimeMillis() + 60000)
    assert(report.failed.exists(_.endsWith("stubborn-orphan.parquet")),
      s"undeletable orphan must be reported, got $report")
    assert(report.deleted.exists(_.endsWith("plain-orphan.parquet")),
      "one failure must not abort the rest of the GC pass")
    assert(t.io.exists(stubborn), "a failed delete leaves the file")
    assert(!t.io.exists(disposable))
    t.io.delete(stubborn) // clean up for the expiry half

    // expiry with an undeletable expired data file: the metadata
    // commit must land, the failure must be observable
    val firstDataFiles = Scan(t, spark).planFiles().map(_.file.filePath)
    val expireCutoff = System.currentTimeMillis() + 60000
    // replace first-append content so its files become expirable
    t = Mutations.overwrite(t.refresh(), spark, usersDf(1 to 10))
    Thread.sleep(5)
    val victim = norm(firstDataFiles.head)
    val before = withVeto(t, p => norm(p) == victim)
    val expired = Maintenance.expireSnapshots(before,
      olderThanMs = expireCutoff, retainLast = 1)
    assert(expired.metadata.snapshots.size <
      before.metadata.snapshots.size, "expiry must still commit")
    assert(Maintenance.lastExpireFailedDeletes.exists(norm(_) == victim),
      s"failed delete must be surfaced, got " +
        s"${Maintenance.lastExpireFailedDeletes}")
    assert(new java.io.File(victim).exists(),
      "the file expiry failed to delete must survive for the next pass")
    assert(Scan(expired, spark).toDF.count() == 10, "data intact")
  }

  test("rewritePositionDeletes consolidates files, drops dangling rows, " +
      "spares equality deletes, and no-ops when already consolidated") {
    var t = freshTable("posrw")
    // single-file appends: the CoW rewrite below must hit the ONE file
    // P1's position deletes reference, or nothing dangles
    t = TableOps.append(t, usersDf(1 to 50).coalesce(1)) // F1
    t = TableOps.append(t, usersDf(51 to 100).coalesce(1)) // F2
    t = Mutations.deleteMoR(t, spark, Col("id").lt(5L)) // P1 -> F1 rows
    t = Mutations.deleteMoR(t, spark, Col("id").gt(95L)) // P2 -> F2 rows
    val before = Maintenance.positionDeleteFiles(t)
    assert(before.size >= 2, s"fixture needs >=2 delete files: $before")
    // CoW-rewrite F1 (MoR deletes applied into the rewrite): P1's rows
    // now reference a dead path — dangling
    t = Mutations.deleteCoW(t, spark,
      Col("id").gt(19L).and(Col("id").lt(31L)))
    val expected = ((5 to 19) ++ (31 to 50) ++ (51 to 95)).map(_.toLong)
    assert(Scan(t, spark).toDF.select("id").collect()
      .map(_.getLong(0)).sorted.toSeq == expected)

    val beforeRows =
      Maintenance.positionDeleteFiles(t).map(_.recordCount).sum
    val dataBefore = Scan(t, spark).planFiles().map(_.file.filePath).toSet
    val t2 = Maintenance.rewritePositionDeletes(t, spark)
    val after = Maintenance.positionDeleteFiles(t2)
    assert(after.size == 1, s"expected 1 consolidated file, got $after")
    assert(after.map(_.recordCount).sum < beforeRows,
      "dangling rows (dead data path) must be dropped")
    // exactly P1's 4 rows (ids 1..4 pointed at the rewritten-away F1)
    // dangle; P2's 5 rows (ids 96..100 in the still-live F2) survive
    assert(beforeRows - after.map(_.recordCount).sum == 4,
      s"expected exactly 4 dangling rows dropped, " +
        s"got ${beforeRows - after.map(_.recordCount).sum}")
    assert(Scan(t2, spark).planFiles().map(_.file.filePath).toSet ==
      dataBefore, "data files must be untouched")
    assert(Scan(t2, spark).toDF.select("id").collect()
      .map(_.getLong(0)).sorted.toSeq == expected, "rows unchanged")

    // already consolidated -> no new snapshot
    val t3 = Maintenance.rewritePositionDeletes(t2, spark)
    assert(t3.currentSnapshot.map(_.snapshotId) ==
      t2.currentSnapshot.map(_.snapshotId), "single file must no-op")

    // an equality delete must survive a later rewrite untouched
    import spark.implicits._
    val t4 = Mutations.deleteByKeys(t3, spark, Seq(60L).toDF("id"))
    val t5 = Mutations.deleteMoR(t4, spark, Col("id").eqTo(40L))
    val t6 = Maintenance.rewritePositionDeletes(t5, spark)
    val eqLive = t6.currentSnapshot.toSeq.flatMap(t6.manifestList)
      .filter(_.content == ManifestContent.Deletes)
      .flatMap(mf => t6.readManifest(mf).liveEntries.map(_.dataFile))
      .filter(_.content == FileContent.EqualityDeletes)
    assert(eqLive.nonEmpty, "equality delete files must not be rewritten")
    assert(Maintenance.positionDeleteFiles(t6).size == 1)
    assert(Scan(t6, spark).toDF.select("id").collect()
      .map(_.getLong(0)).sorted.toSeq ==
      expected.filterNot(id => id == 60L || id == 40L))
  }

  test("rewriteEqualityDeletes converts to position deletes, retires " +
      "equality files, drops dangling keys, no-ops when none left") {
    import spark.implicits._
    var t = freshTable("eqrw")
    t = TableOps.append(t, usersDf(1 to 50).coalesce(1)) // F1
    t = TableOps.append(t, usersDf(51 to 100).coalesce(1)) // F2
    t = Mutations.deleteByKeys(t, spark, Seq(10L, 60L).toDF("id")) // E1
    t = Mutations.deleteByKeys(t, spark, Seq(20L).toDF("id")) // E2
    t = Mutations.deleteMoR(t, spark, Col("id").eqTo(30L)) // P1
    assert(Maintenance.equalityDeleteFiles(t).size == 2)
    val expected = (1 to 100).map(_.toLong)
      .filterNot(Set(10L, 20L, 30L, 60L))
    val dataBefore = Scan(t, spark).planFiles().map(_.file.filePath).toSet

    val t2 = Maintenance.rewriteEqualityDeletes(t, spark)
    assert(Maintenance.equalityDeleteFiles(t2).isEmpty,
      "every equality-delete file must be retired")
    val pos2 = Maintenance.positionDeleteFiles(t2)
    assert(pos2.size == 1, s"expected 1 consolidated file, got $pos2")
    // E1 (10, 60) + E2 (20) convert; P1 (30) consolidates: 4 positions
    assert(pos2.map(_.recordCount).sum == 4)
    assert(Scan(t2, spark).planFiles().map(_.file.filePath).toSet ==
      dataBefore, "data files must be untouched")
    assert(Scan(t2, spark).toDF.select("id").collect()
      .map(_.getLong(0)).sorted.toSeq == expected, "rows unchanged")

    // no equality files left -> no new snapshot
    val t3 = Maintenance.rewriteEqualityDeletes(t2, spark)
    assert(t3.currentSnapshot.map(_.snapshotId) ==
      t2.currentSnapshot.map(_.snapshotId), "no eq files must no-op")

    // dangling key: E3 deletes id 40, then a CoW rewrite of F1 removes
    // 36..44 — E3's key no longer matches any live row, and the
    // consolidated file's F1 positions point at a dead path
    val t4 = Mutations.deleteByKeys(t3, spark, Seq(40L).toDF("id")) // E3
    val t5 = Mutations.deleteCoW(t4, spark,
      Col("id").gt(35L).and(Col("id").lt(45L)))
    val expected2 = expected.filterNot(id => id >= 36L && id <= 44L)
    assert(Scan(t5, spark).toDF.select("id").collect()
      .map(_.getLong(0)).sorted.toSeq == expected2)
    val t6 = Maintenance.rewriteEqualityDeletes(t5, spark)
    assert(Maintenance.equalityDeleteFiles(t6).isEmpty)
    val pos6 = Maintenance.positionDeleteFiles(t6)
    assert(pos6.size == 1)
    // only F2's position row (id 60) survives: E3 dangles (40 is gone)
    // and F1's three positions reference the rewritten-away file
    assert(pos6.map(_.recordCount).sum == 1,
      s"expected 1 live position row, got ${pos6.map(_.recordCount).sum}")
    assert(Scan(t6, spark).toDF.select("id").collect()
      .map(_.getLong(0)).sorted.toSeq == expected2, "rows unchanged")
  }

  test("rewriteEqualityDeletes routes converted deletes per partition") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-maint-").toString
    val cat = new LocalCatalog(dir)
    cat.createNamespace(Seq("db"))
    val spec = PartitionSpec.builder(0).identity(2, "name").build()
    var t = Table.create(cat, TableIdentifier(Seq("db"), "eqpart"),
      Fixtures4.usersSchema, spec, io = new HadoopFileIO())
    def df(ids: Range) = ids.map(i => (i.toLong,
        if (i % 2 == 0) "even" else "odd", s"u$i@x.com",
        new java.sql.Timestamp(1704067200000L + i)))
      .toDF("id", "name", "email", "created_at")
    t = TableOps.append(t, df(1 to 40).coalesce(1))
    // a GLOBAL equality delete (keys carry no partition column)
    t = Mutations.deleteByKeys(t, spark, Seq(2L, 3L, 4L).toDF("id"))
    assert(Maintenance.equalityDeleteFiles(t).nonEmpty)
    val t2 = Maintenance.rewriteEqualityDeletes(t, spark)
    assert(Maintenance.equalityDeleteFiles(t2).isEmpty)
    // the converted positions route into PER-PARTITION delete files
    // (ids 2/4 live in 'even', 3 in 'odd'), so a scan of one partition
    // never drags in the other's deletes
    val pos = Maintenance.positionDeleteFiles(t2)
    assert(pos.size == 2, s"expected per-partition delete files: $pos")
    assert(pos.map(_.recordCount).sum == 3)
    val tasks = Scan(t2, spark).planFiles()
    assert(tasks.forall(_.deleteFiles.size <= 1),
      "each task must attach at most its own partition's delete file")
    assert(Scan(t2, spark).toDF.select("id").collect()
      .map(_.getLong(0)).sorted.toSeq ==
      (1 to 40).map(_.toLong).filterNot(Set(2L, 3L, 4L)))
  }
}
