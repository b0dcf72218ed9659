package graft.catalog

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.UUID

import graft.spec._

/** Filesystem catalog for offline operation (SURVEY §7 step 4a — the
  * reference only ships a REST client, so this is the piece its own
  * examples lack). Layout, per table:
  *
  *   <warehouse>/<ns...>/<table>/metadata/v<N>.metadata.json
  *   <warehouse>/<ns...>/<table>/metadata/version-hint.text   (latest N)
  *
  * Commit protocol (SURVEY §7 hard-part 1): the new metadata is written
  * to a temp file, then HARD-LINKED to `v<N+1>.metadata.json`. On POSIX
  * link(2) fails atomically if the target exists, so two concurrent
  * committers race on the link and exactly one wins; the loser gets a
  * [[CommitFailedException]] and retries on fresh metadata. The
  * version-hint write afterwards is advisory (readers fall back to
  * scanning for the highest version).
  */
class LocalCatalog(warehouse: String) extends Catalog {

  private val root = Paths.get(stripScheme(warehouse)).toAbsolutePath

  private def stripScheme(p: String): String =
    if (p.startsWith("file://")) p.substring("file://".length) else p

  private def nsDir(ns: Seq[String]): Path =
    ns.foldLeft(root)(_.resolve(_))

  private def tableDir(id: TableIdentifier): Path =
    nsDir(id.namespace).resolve(id.name)

  private def metadataDir(id: TableIdentifier): Path =
    tableDir(id).resolve("metadata")

  private def versionFile(id: TableIdentifier, v: Int): Path =
    metadataDir(id).resolve(f"v$v%05d.metadata.json")

  // ------------------------------------------------------- namespaces

  override def listNamespaces(): Seq[Seq[String]] = {
    if (!Files.isDirectory(root)) return Nil
    val out = Seq.newBuilder[Seq[String]]
    def walk(dir: Path, prefix: Seq[String]): Unit = {
      val children = listDirs(dir)
      children.foreach { c =>
        val name = c.getFileName.toString
        if (Files.isDirectory(c.resolve("metadata"))) ()
        else {
          out += (prefix :+ name)
          walk(c, prefix :+ name)
        }
      }
    }
    walk(root, Nil)
    out.result()
  }

  private def listDirs(dir: Path): Seq[Path] =
    if (!Files.isDirectory(dir)) Nil
    else {
      val s = Files.list(dir)
      try s.filter(Files.isDirectory(_)).iterator().asScala.toSeq
      finally s.close()
    }
  private implicit class IterConv[T](it: java.util.Iterator[T]) {
    def asScala: Iterator[T] = new Iterator[T] {
      def hasNext = it.hasNext; def next() = it.next()
    }
  }

  override def createNamespace(ns: Seq[String],
      properties: Map[String, String]): Unit = {
    val dir = nsDir(ns)
    if (Files.isDirectory(dir))
      throw new AlreadyExistsException(s"namespace ${ns.mkString(".")} exists")
    Files.createDirectories(dir)
    if (properties.nonEmpty) writeNsProps(ns, properties)
  }

  override def dropNamespace(ns: Seq[String]): Unit = {
    val dir = nsDir(ns)
    if (!Files.isDirectory(dir))
      throw new NoSuchNamespaceException(ns.mkString("."))
    if (listDirs(dir).nonEmpty)
      throw new IllegalStateException(s"namespace ${ns.mkString(".")} not empty")
    Files.deleteIfExists(propsFile(ns))
    Files.delete(dir)
  }

  override def namespaceExists(ns: Seq[String]): Boolean =
    Files.isDirectory(nsDir(ns))

  // -------------------------------------------- namespace properties

  /** Stored as a dot-file JSON map so namespace walks (directory-based)
    * never mistake it for a table or child namespace. */
  private def propsFile(ns: Seq[String]): Path =
    nsDir(ns).resolve(".namespace-properties.json")

  private def writeNsProps(ns: Seq[String],
      props: Map[String, String]): Unit = {
    val node = new com.fasterxml.jackson.databind.ObjectMapper()
      .createObjectNode()
    props.toSeq.sortBy(_._1).foreach { case (k, v) => node.put(k, v) }
    Files.write(propsFile(ns), node.toString.getBytes(UTF_8))
    ()
  }

  override def loadNamespaceProperties(
      ns: Seq[String]): Map[String, String] = {
    if (!namespaceExists(ns))
      throw new NoSuchNamespaceException(ns.mkString("."))
    val f = propsFile(ns)
    if (!Files.isRegularFile(f)) Map.empty
    else {
      val node = graft.spec.SchemaJson.parseTree(
        new String(Files.readAllBytes(f), UTF_8))
      val it = node.properties().iterator()
      val out = Map.newBuilder[String, String]
      while (it.hasNext) {
        val e = it.next(); out += e.getKey -> e.getValue.asText
      }
      out.result()
    }
  }

  override def updateNamespaceProperties(ns: Seq[String],
      removals: Seq[String], updates: Map[String, String]): Unit = {
    val cur = loadNamespaceProperties(ns) // throws on missing namespace
    writeNsProps(ns, (cur -- removals) ++ updates)
  }

  // ------------------------------------------------------------ tables

  override def listTables(ns: Seq[String]): Seq[TableIdentifier] =
    listDirs(nsDir(ns))
      .filter(d => Files.isDirectory(d.resolve("metadata")))
      .map(d => TableIdentifier(ns, d.getFileName.toString))

  override def tableExists(id: TableIdentifier): Boolean =
    currentVersion(id).isDefined

  private def currentVersion(id: TableIdentifier): Option[Int] = {
    val dir = metadataDir(id)
    if (!Files.isDirectory(dir)) return None
    val hint = dir.resolve("version-hint.text")
    val hinted =
      if (Files.exists(hint))
        scala.util.Try(new String(Files.readAllBytes(hint), UTF_8)
          .trim.toInt).toOption
      else None
    // trust the hint only if that version exists; otherwise scan
    hinted.filter(v => Files.exists(versionFile(id, v))) match {
      case some @ Some(hv) =>
        // a newer version may exist if a hint write was lost — probe up
        var v = hv
        while (Files.exists(versionFile(id, v + 1))) v += 1
        Some(v)
      case None =>
        val s = Files.list(dir)
        val re = """v(\d+)\.metadata\.json""".r
        try {
          val versions = s.iterator().asScala.flatMap { p =>
            p.getFileName.toString match {
              case re(v) => Some(v.toInt)
              case _ => None
            }
          }.toSeq
          versions.maxOption
        } finally s.close()
    }
  }

  override def createTable(id: TableIdentifier, schema: Schema,
      spec: PartitionSpec, sortOrder: SortOrder,
      properties: Map[String, String]): TableMetadata = {
    if (tableExists(id))
      throw new AlreadyExistsException(s"table $id exists")
    Files.createDirectories(metadataDir(id))
    val location = "file://" + tableDir(id).toString
    val meta0 = TableMetadata.newTable(
      UUID.randomUUID().toString, location, schema, spec, properties)
    val meta =
      if (sortOrder == SortOrder.unsorted) meta0
      else meta0.copy(sortOrders = Seq(sortOrder),
        defaultSortOrderId = sortOrder.orderId)
    writeVersion(id, 1, meta)
    meta
  }

  override def registerTable(id: TableIdentifier,
      metadataLocation: String): TableMetadata = {
    if (tableExists(id))
      throw new AlreadyExistsException(s"table $id exists")
    if (!namespaceExists(id.namespace))
      throw new NoSuchNamespaceException(id.namespace.mkString("."))
    val src = java.nio.file.Paths.get(stripScheme(metadataLocation))
    if (!Files.isRegularFile(src))
      throw new NoSuchTableException(
        s"no metadata file at $metadataLocation")
    val meta = TableMetadata.fromJson(
      new String(Files.readAllBytes(src), UTF_8))
    Files.createDirectories(metadataDir(id))
    // the catalog pointer is a copy of the metadata JSON; location
    // inside it is untouched, so data/manifests stay in place
    writeVersion(id, 1, meta)
    meta
  }

  override def loadTable(id: TableIdentifier): TableMetadata =
    currentVersion(id) match {
      case None => throw new NoSuchTableException(id.toString)
      case Some(v) => TableMetadata.fromJson(
        new String(Files.readAllBytes(versionFile(id, v)), UTF_8))
    }

  override def dropTable(id: TableIdentifier, purge: Boolean): Unit = {
    if (!tableExists(id)) throw new NoSuchTableException(id.toString)
    val dir = tableDir(id)
    if (purge) deleteRecursively(dir)
    else {
      // metadata-only drop: remove the metadata dir, leave data files
      deleteRecursively(metadataDir(id))
      if (listDirs(dir).isEmpty && !Files.list(dir).findFirst().isPresent)
        Files.deleteIfExists(dir)
    }
    ()
  }

  private def deleteRecursively(p: Path): Unit = {
    if (!Files.exists(p)) return
    val s = Files.walk(p)
    try s.sorted(java.util.Comparator.reverseOrder())
      .forEach(f => Files.deleteIfExists(f))
    finally s.close()
  }

  override def renameTable(from: TableIdentifier,
      to: TableIdentifier): Unit = {
    if (!tableExists(from)) throw new NoSuchTableException(from.toString)
    if (tableExists(to)) throw new AlreadyExistsException(to.toString)
    Files.createDirectories(nsDir(to.namespace))
    Files.move(tableDir(from), tableDir(to), StandardCopyOption.ATOMIC_MOVE)
    ()
  }

  // ------------------------------------------------------------ commit

  override def commitTable(id: TableIdentifier,
      requirements: Seq[TableRequirement],
      updates: Seq[TableUpdate]): TableMetadata = {
    val version = currentVersion(id)
      .getOrElse(throw new NoSuchTableException(id.toString))
    val current = loadTable(id)

    requirements.flatMap(r => TableRequirement.check(r, current)) match {
      case err +: _ => throw new CommitFailedException(err)
      case _ => ()
    }

    val prevFile = versionFile(id, version)
    val updated0 = TableUpdate.applyAll(current, updates)
    val updated = updated0.copy(
      metadataLog = updated0.metadataLog :+ MetadataLogEntry(
        current.lastUpdatedMs, "file://" + prevFile.toString))
    writeVersion(id, version + 1, updated)
    updated
  }

  /** Write v<N> atomically-if-absent: temp file + hard link. */
  private def writeVersion(id: TableIdentifier, v: Int,
      meta: TableMetadata): Unit = {
    val dir = metadataDir(id)
    Files.createDirectories(dir)
    val tmp = dir.resolve(s".tmp-${UUID.randomUUID()}.metadata.json")
    Files.write(tmp, meta.toJson.getBytes(UTF_8))
    val target = versionFile(id, v)
    try {
      Files.createLink(target, tmp)
    } catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        throw new CommitFailedException(
          s"version $v of $id was committed concurrently")
    } finally {
      Files.deleteIfExists(tmp)
    }
    // advisory hint — overwrite is fine, readers re-validate
    Files.write(dir.resolve("version-hint.text"),
      v.toString.getBytes(UTF_8))
    ()
  }
}
