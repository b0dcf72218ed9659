package graft.table

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

import graft.avro.ManifestAvro
import graft.spec._

/** Table maintenance: small-file compaction and snapshot expiry with
  * orphan-file GC (SURVEY M8 "+ orphan-file GC (stretch)"). At 100 TB
  * these are the operations that keep scan planning O(live files) and
  * storage bounded; both are metadata-driven — no full-table listing.
  */
object Maintenance {

  /** Incremental bin-pack compaction: rewrite ONLY the files worth
    * rewriting — files under `smallFileThresholdBytes` (default 3/4 of
    * the target, Iceberg's bin-pack convention) and files carrying MoR
    * delete files (rewriting absorbs the deletes) — into
    * ~targetFileSizeBytes files, one replace snapshot. Well-sized,
    * delete-free files are left untouched, so compacting a 100 TB table
    * costs proportional to its SMALL-file volume, not its size. The
    * read goes through the scan (MoR-applying), so absorbed delete
    * files are retired with the rewrite. */
  def compactDataFiles(table: Table, spark: SparkSession,
      targetFileSizeBytes: Long = 128L * 1024 * 1024,
      smallFileThresholdBytes: Long = -1L,
      /** also rewrite well-sized files that carry MoR delete files
        * (absorbing the deletes). Default on — matches a maintenance
        * pass that retires delete files; turn off for cheap
        * small-files-only passes on tables with wide-attaching
        * (global) delete files. */
      absorbDeleteFiles: Boolean = true): Table =
    Mutations.withConflictRetry(table)(
      compactOnce(_, spark, targetFileSizeBytes,
        if (smallFileThresholdBytes >= 0) smallFileThresholdBytes
        else targetFileSizeBytes * 3 / 4,
        absorbDeleteFiles))

  private def compactOnce(table: Table, spark: SparkSession,
      targetFileSizeBytes: Long, smallThreshold: Long,
      absorbDeleteFiles: Boolean): Table = {
    val tasks = Scan(table, spark).planFiles()
    val candidates = tasks.filter(t =>
      t.file.fileSizeInBytes < smallThreshold ||
        (absorbDeleteFiles && t.deleteFiles.nonEmpty))
    // one small delete-free file alone can't be improved
    if (candidates.isEmpty ||
        (candidates.size == 1 && candidates.head.deleteFiles.isEmpty))
      return table
    val totalBytes = candidates.map(_.file.fileSizeInBytes).sum
    val totalRecords = candidates.map(_.file.recordCount).sum
    val nFiles = math.max(1L, (totalBytes + targetFileSizeBytes - 1)
      / targetFileSizeBytes)
    val recordsPerFile = math.max(1L, totalRecords / nFiles)
    // read through the scan path (applies MoR deletes of the selected
    // candidates) — only the candidate tasks, not the whole table
    val df = Scan(table, spark).readTasks(table.schema, candidates)
    val newFiles = {
      val spec = table.spec
      if (spec.isUnpartitioned) {
        // Range-cluster the output, never round-robin: repartition(n)
        // gives every compacted file near-full-range min/max bounds, so
        // post-compaction scans would prune WORSE than pre-compaction.
        // Cluster keys: the table's sort order, else the first primitive
        // column — compaction should improve clustering, not destroy it.
        val schema = table.schema
        val sortCols = table.metadata.defaultSortOrder.fields
          .flatMap(sf => schema.field(sf.sourceId).map(f => col(f.name)))
        // fallback key must be range-orderable (repartitionByRange on a
        // map column throws); non-orderable-only schemas round-robin
        val clusterCols =
          if (sortCols.nonEmpty) sortCols
          else schema.fields.filter(f => df.columns.contains(f.name) &&
              org.apache.spark.sql.catalyst.expressions.RowOrdering
                .isOrderable(graft.spec.SchemaConverters.toSparkType(f.fieldType)))
            .take(1).map(f => col(f.name)).toSeq
        val clustered =
          if (clusterCols.isEmpty) df.repartition(nFiles.toInt)
          else df.repartitionByRange(nFiles.toInt, clusterCols: _*)
            .sortWithinPartitions(clusterCols: _*)
        DataWriter.writeDataFiles(table.metadata, clustered,
          maxRecordsPerFile = recordsPerFile)
      } else PartitionedWriter.writeDataFiles(table.metadata, df)
    }
    // a delete file is retired only when EVERY data file it attaches to
    // was rewritten — removing one still referenced by an untouched
    // file would resurrect that file's deleted rows. Retained delete
    // files can't affect the rewrite's output: new files carry higher
    // sequence numbers.
    val candidateSet = candidates.map(_.file.filePath).toSet
    val attachments = tasks
      .flatMap(t => t.deleteFiles.map(d => d.file.filePath -> t.file.filePath))
      .groupBy(_._1)
    val retiredDeletes = attachments.collect {
      case (d, pairs) if pairs.map(_._2).toSet.subsetOf(candidateSet) => d
    }
    table.commitSnapshot(PendingSnapshot(Operation.Replace,
      addedDataFiles = newFiles,
      deletedFilePaths = candidateSet ++ retiredDeletes))
  }

  /** All storage paths reachable from a snapshot: its manifest list,
    * manifests, and every referenced data/delete file. */
  private def reachableFrom(table: Table,
      snapshots: Seq[Snapshot]): Set[String] = {
    val paths = Set.newBuilder[String]
    snapshots.foreach { s =>
      if (s.manifestList.nonEmpty) {
        paths += s.manifestList
        val manifests = ManifestAvro.readManifestList(
          table.io.readAllBytes(s.manifestList))
        manifests.foreach { mf =>
          paths += mf.manifestPath
          ManifestAvro.readManifest(table.io.readAllBytes(mf.manifestPath))
            .entries.foreach(e => paths += e.dataFile.filePath)
        }
      }
    }
    paths.result()
  }

  /** Expire snapshots older than `olderThanMs` (always keeping the
    * current one and at least `retainLast`), then delete every file
    * reachable ONLY from the expired snapshots. Deletion happens after
    * the metadata commit, so a crash leaves orphans (safe), never
    * dangling references.
    *
    * Branch/tag refs pin their snapshots: a tagged snapshot is never
    * expired while its ref lives (refs past their own `maxRefAgeMs` are
    * dropped first), and a branch's `minSnapshotsToKeep` newest
    * ancestors stay — otherwise expiry would break time travel through
    * refs the API (Transaction.setRef) explicitly supports. */
  def expireSnapshots(table: Table, olderThanMs: Long,
      retainLast: Int = 1, nowMs: Long = System.currentTimeMillis()): Table = {
    val meta = table.metadata
    val current = table.currentSnapshot.map(_.snapshotId).toSet
    val ordered = meta.snapshots.sortBy(_.timestampMs)

    // refs past their own retention window are themselves expired, as
    // are refs whose snapshot no longer resolves (they pin nothing and
    // would otherwise linger forever). `main` is the table's current
    // lineage and is never age-expired — upstream Iceberg has the same
    // carve-out — else expiry could drop the branch currentSnapshotId
    // still points at.
    val (staleRefs, liveRefs) = meta.refs.partition { case (name, r) =>
      val resolved = meta.snapshotById(r.snapshotId)
      resolved.isEmpty ||
        (name != "main" && r.maxRefAgeMs.exists(age =>
          resolved.exists(s => nowMs - s.timestampMs > age)))
    }
    // every live ref pins its snapshot; branches also pin their newest
    // minSnapshotsToKeep ancestors (walked over parent-snapshot-id)
    val refPinned = liveRefs.values.flatMap { r =>
      val keepN = r.minSnapshotsToKeep.getOrElse(1)
      Iterator.iterate(meta.snapshotById(r.snapshotId))(
        _.flatMap(_.parentSnapshotId).flatMap(meta.snapshotById))
        .takeWhile(_.isDefined).take(keepN).flatten.map(_.snapshotId)
    }.toSet

    val retained = ordered.takeRight(math.max(retainLast, 1))
      .map(_.snapshotId).toSet ++ current ++ refPinned
    val expired = ordered.filter(s =>
      s.timestampMs < olderThanMs && !retained.contains(s.snapshotId))
    if (expired.isEmpty && staleRefs.isEmpty) return table
    if (expired.isEmpty) {
      var tx = table.newTransaction()
      staleRefs.keys.foreach(n => tx = tx.removeRef(n))
      return tx.commit()
    }

    val keepSnapshots = meta.snapshots
      .filterNot(s => expired.exists(_.snapshotId == s.snapshotId))
    val reachable = reachableFrom(table, keepSnapshots)
    val candidates = reachableFrom(table, expired)
    val orphans = candidates -- reachable

    var tx = table.newTransaction()
      .removeSnapshots(expired.map(_.snapshotId))
    staleRefs.keys.foreach(n => tx = tx.removeRef(n))
    val committed = tx.commit()
    orphans.foreach { p =>
      try committed.io.delete(p)
      catch { case _: Exception => () } // best-effort GC
    }
    committed
  }
}
