package graft.catalog

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

import graft.spec._

/** RestCatalog client against an in-process HTTP server that translates
  * the Iceberg REST protocol onto a LocalCatalog (no egress in this
  * environment, so the server is the test fixture; the CLIENT is the
  * product — `catalog/rest.go` parity). */
class RestCatalogSpec extends AnyFunSuite {

  private def withServer(f: (RestCatalog, LocalCatalog) => Unit): Unit =
    withServerUri((cat, backing, _) => f(cat, backing))

  /** [[withServer]] plus the loopback base URI, for tests that wire a
    * whole SparkSession catalog at the server. */
  private def withServerUri(
      f: (RestCatalog, LocalCatalog, String) => Unit): Unit = {
    val backing = new LocalCatalog(
      Files.createTempDirectory("graft-rest-wh-").toString)
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", (ex: HttpExchange) => handle(ex, backing))
    server.start()
    try {
      val uri = s"http://127.0.0.1:${server.getAddress.getPort}"
      val cat = new RestCatalog(uri, token = Some("test-token"))
      cat.fetchConfig()
      f(cat, backing, uri)
    } finally server.stop(0)
  }

  // ------------------------------------------------- mini REST server

  /** Last commit request body, for wire-format assertions. */
  private val lastCommitBody =
    new java.util.concurrent.atomic.AtomicReference[String]("")

  /** Last register-table request body, same purpose. */
  private val lastRegisterBody =
    new java.util.concurrent.atomic.AtomicReference[String]("")

  private def handle(ex: HttpExchange, cat: LocalCatalog): Unit = {
    def reply(code: Int, body: String = ""): Unit = {
      val bytes = body.getBytes(UTF_8)
      if (ex.getRequestMethod == "HEAD") {
        ex.sendResponseHeaders(code, -1)
      } else {
        ex.sendResponseHeaders(code, if (bytes.isEmpty) -1 else bytes.length)
        if (bytes.nonEmpty) ex.getResponseBody.write(bytes)
      }
      ex.close()
    }
    val path = ex.getRequestURI.getPath
    val method = ex.getRequestMethod
    val body = new String(ex.getRequestBody.readAllBytes(), UTF_8)
    def ns(seg: String): Seq[String] = seg.split('\u001F').toSeq
    try {
      val parts = path.stripPrefix("/v1/").split("/").toList
      (method, parts) match {
        case ("GET", List("config")) =>
          reply(200, """{"defaults": {}, "overrides": {}}""")
        case ("GET", List("namespaces")) =>
          val arr = cat.listNamespaces().map(n =>
            n.map(s => s""""$s"""").mkString("[", ",", "]"))
            .mkString("[", ",", "]")
          reply(200, s"""{"namespaces": $arr}""")
        case ("POST", List("namespaces")) =>
          val n = SchemaJson.parseTree(body)
          val names = {
            val it = n.get("namespace").elements()
            val b = Seq.newBuilder[String]
            while (it.hasNext) b += it.next().asText
            b.result()
          }
          val props = Option(n.get("properties")).map { p =>
            val it = p.properties().iterator()
            val b = Map.newBuilder[String, String]
            while (it.hasNext) {
              val e = it.next(); b += e.getKey -> e.getValue.asText
            }
            b.result()
          }.getOrElse(Map.empty[String, String])
          try { cat.createNamespace(names, props); reply(200, "{}") }
          catch { case _: AlreadyExistsException => reply(409) }
        case ("HEAD", List("namespaces", s)) =>
          reply(if (cat.namespaceExists(ns(s))) 204 else 404)
        case ("GET", List("namespaces", s)) =>
          try {
            val props = cat.loadNamespaceProperties(ns(s)).toSeq.sorted
              .map { case (k, v) => s""""$k": "$v"""" }.mkString(",")
            val names = ns(s).map(x => s""""$x"""").mkString("[", ",", "]")
            reply(200, s"""{"namespace": $names, "properties": {$props}}""")
          } catch { case _: NoSuchNamespaceException => reply(404) }
        case ("POST", List("namespaces", s, "properties")) =>
          val n = SchemaJson.parseTree(body)
          val removals = Option(n.get("removals")).map { r =>
            val it = r.elements()
            val b = Seq.newBuilder[String]
            while (it.hasNext) b += it.next().asText
            b.result()
          }.getOrElse(Nil)
          val updates = Option(n.get("updates")).map { p =>
            val it = p.properties().iterator()
            val b = Map.newBuilder[String, String]
            while (it.hasNext) {
              val e = it.next(); b += e.getKey -> e.getValue.asText
            }
            b.result()
          }.getOrElse(Map.empty[String, String])
          try {
            cat.updateNamespaceProperties(ns(s), removals, updates)
            reply(200, """{"removed": [], "updated": [], "missing": []}""")
          } catch { case _: NoSuchNamespaceException => reply(404) }
        case ("DELETE", List("namespaces", s)) =>
          try { cat.dropNamespace(ns(s)); reply(204) }
          catch { case _: NoSuchNamespaceException => reply(404) }
        case ("GET", List("namespaces", s, "tables")) =>
          val ids = cat.listTables(ns(s)).map { id =>
            s"""{"namespace": ${id.namespace.map(x => s""""$x"""")
              .mkString("[", ",", "]")}, "name": "${id.name}"}"""
          }.mkString("[", ",", "]")
          reply(200, s"""{"identifiers": $ids}""")
        case ("POST", List("namespaces", s, "tables")) =>
          val n = SchemaJson.parseTree(body)
          val schema = SchemaJson.parseSchema(n.get("schema"))
          // spec: the create request's properties land on the table
          // (the persisted-model procedures stamp their config here)
          val props = Option(n.get("properties")).map(p =>
            p.fields.asScala.map(e =>
              e.getKey -> e.getValue.asText).toMap)
            .getOrElse(Map.empty[String, String])
          val meta = cat.createTable(
            TableIdentifier(ns(s), n.get("name").asText), schema,
            properties = props)
          reply(200, s"""{"metadata-location": "x", "metadata": ${meta.toJson}}""")
        case ("POST", List("namespaces", s, "register")) =>
          lastRegisterBody.set(body)
          val n = SchemaJson.parseTree(body)
          val meta = cat.registerTable(
            TableIdentifier(ns(s), n.get("name").asText),
            n.get("metadata-location").asText)
          reply(200, s"""{"metadata-location": "x", "metadata": ${meta.toJson}}""")
        case ("GET", List("namespaces", s, "tables", t)) =>
          try reply(200, s"""{"metadata-location": "x",
            |"metadata": ${cat.loadTable(TableIdentifier(ns(s), t)).toJson}}"""
            .stripMargin)
          catch { case _: NoSuchTableException => reply(404) }
        case ("HEAD", List("namespaces", s, "tables", t)) =>
          reply(if (cat.tableExists(TableIdentifier(ns(s), t))) 204 else 404)
        case ("DELETE", List("namespaces", s, "tables", t)) =>
          try { cat.dropTable(TableIdentifier(ns(s), t)); reply(204) }
          catch { case _: NoSuchTableException => reply(404) }
        case ("POST", List("tables", "rename")) =>
          val n = SchemaJson.parseTree(body)
          def id(node: com.fasterxml.jackson.databind.JsonNode) = {
            val it = node.get("namespace").elements()
            val b = Seq.newBuilder[String]
            while (it.hasNext) b += it.next().asText
            TableIdentifier(b.result(), node.get("name").asText)
          }
          cat.renameTable(id(n.get("source")), id(n.get("destination")))
          reply(204)
        case ("POST", List("namespaces", s, "tables", t)) =>
          lastCommitBody.set(body)
          val n = SchemaJson.parseTree(body)
          val reqs = {
            val it = n.get("requirements").elements()
            val b = Seq.newBuilder[TableRequirement]
            while (it.hasNext) {
              val r = it.next()
              r.get("type").asText match {
                case "assert-ref-snapshot-id" =>
                  b += TableRequirement.AssertRefSnapshotId(
                    r.get("ref").asText,
                    Option(r.get("snapshot-id"))
                      .filterNot(_.isNull).map(_.asLong))
                case _ => ()
              }
            }
            b.result()
          }
          val ups = {
            val it = n.get("updates").elements()
            val b = Seq.newBuilder[TableUpdate]
            while (it.hasNext) {
              val u = it.next()
              u.get("action").asText match {
                case "add-snapshot" =>
                  // spec-faithful: unknown fields (if any) are ignored,
                  // and add-snapshot moves NO ref — the client must pair
                  // it with set-snapshot-ref or the write is lost
                  b += TableUpdate.AddSnapshot(
                    MetadataJson.parseSnapshot(u.get("snapshot")))
                case "set-properties" =>
                  val props = Map.newBuilder[String, String]
                  val fit = u.get("updates").properties().iterator()
                  while (fit.hasNext) {
                    val e = fit.next(); props += e.getKey -> e.getValue.asText
                  }
                  b += TableUpdate.SetProperties(props.result())
                case "set-snapshot-ref" =>
                  def optInt(k: String) =
                    Option(u.get(k)).map(_.asInt)
                  def optLong(k: String) =
                    Option(u.get(k)).map(_.asLong)
                  b += TableUpdate.SetSnapshotRef(u.get("ref-name").asText,
                    u.get("snapshot-id").asLong, u.get("type").asText,
                    optInt("min-snapshots-to-keep"),
                    optLong("max-snapshot-age-ms"),
                    optLong("max-ref-age-ms"))
                case "add-sort-order" =>
                  // spec-faithful: the order definition must ride in the
                  // "sort-order" field or the server records nothing
                  b += TableUpdate.AddSortOrder(
                    MetadataJson.parseSortOrder(u.get("sort-order")))
                case "set-default-sort-order" =>
                  b += TableUpdate.SetDefaultSortOrder(
                    u.get("sort-order-id").asInt)
                case _ => ()
              }
            }
            b.result()
          }
          try {
            val meta = cat.commitTable(TableIdentifier(ns(s), t), reqs, ups)
            reply(200, s"""{"metadata-location": "x", "metadata": ${meta.toJson}}""")
          } catch {
            case e: CommitFailedException => reply(409, e.getMessage)
          }
        case _ => reply(404, s"no route: $method $path")
      }
    } catch {
      case e: Exception => reply(500, String.valueOf(e.getMessage))
    }
  }

  // ------------------------------------------------------------- tests

  private val schema = Schema(0, Seq(
    NestedField(1, "id", LongType, required = true),
    NestedField(2, "name", StringType, required = false)))

  test("namespace + table lifecycle over HTTP") {
    withServer { (cat, _) =>
      cat.createNamespace(Seq("db"))
      assert(cat.namespaceExists(Seq("db")))
      assert(!cat.namespaceExists(Seq("nope")))
      intercept[AlreadyExistsException](cat.createNamespace(Seq("db")))

      val id = TableIdentifier(Seq("db"), "t1")
      val meta = cat.createTable(id, schema)
      assert(meta.currentSchema.fieldByName("id").isDefined)
      assert(cat.tableExists(id))
      assert(cat.listTables(Seq("db")) == Seq(id))

      val loaded = cat.loadTable(id)
      assert(loaded.tableUuid == meta.tableUuid)

      val id2 = TableIdentifier(Seq("db"), "t2")
      cat.renameTable(id, id2)
      assert(cat.tableExists(id2) && !cat.tableExists(id))

      cat.dropTable(id2)
      intercept[NoSuchTableException](cat.loadTable(id2))
    }
  }

  test("registerTable posts the spec body and round-trips metadata") {
    withServer { (cat, _) =>
      cat.createNamespace(Seq("db"))
      val meta = cat.createTable(TableIdentifier(Seq("db"), "src"), schema)
      val mloc = meta.location.stripPrefix("file://") +
        "/metadata/v00001.metadata.json"
      cat.createNamespace(Seq("mirror"))
      val rid = TableIdentifier(Seq("mirror"), "src_reg")
      val reg = cat.registerTable(rid, mloc)
      assert(reg.tableUuid == meta.tableUuid)
      val loaded = cat.loadTable(rid)
      assert(loaded.tableUuid == meta.tableUuid)
      assert(loaded.location == meta.location)
    }
  }

  test("commit round-trips snapshots and conflicts map to CommitFailed") {
    withServer { (cat, _) =>
      cat.createNamespace(Seq("db"))
      val id = TableIdentifier(Seq("db"), "t")
      cat.createTable(id, schema)
      val snap = Snapshot(7L, None, 1L, 123456789L, "file:///ml.avro",
        Some(Summary(Operation.Append, Map(Summary.AddedRecords -> 5L))),
        Some(0))
      val meta = cat.commitTable(id,
        Seq(TableRequirement.AssertRefSnapshotId("main", None)),
        Seq(TableUpdate.AddSnapshot(snap),
          TableUpdate.SetSnapshotRef("main", 7L, "branch")))
      assert(meta.currentSnapshotId.contains(7L))
      assert(meta.snapshotById(7L).flatMap(_.summary)
        .map(_.counter(Summary.AddedRecords)).contains(5L))
      // stale requirement now -> 409 -> CommitFailedException
      intercept[CommitFailedException] {
        cat.commitTable(id,
          Seq(TableRequirement.AssertRefSnapshotId("main", None)),
          Seq(TableUpdate.SetProperties(Map("x" -> "y"))))
      }
      // ref retention knobs survive the JSON round-trip
      val meta2 = cat.commitTable(id,
        Seq(TableRequirement.AssertRefSnapshotId("main", Some(7L))),
        Seq(TableUpdate.SetSnapshotRef("audit", 7L, "tag",
          minSnapshotsToKeep = Some(2),
          maxSnapshotAgeMs = Some(86400000L),
          maxRefAgeMs = Some(604800000L))))
      val ref = meta2.ref("audit").get
      assert(ref.snapshotId == 7L && ref.refType == "tag")
      assert(ref.minSnapshotsToKeep.contains(2))
      assert(ref.maxSnapshotAgeMs.contains(86400000L))
      assert(ref.maxRefAgeMs.contains(604800000L))
    }
  }

  test("branch (WAP) commit uses spec vocabulary: the ref moves on a " +
      "server that ignores unknown fields, main stays put") {
    withServer { (cat, _) =>
      cat.createNamespace(Seq("db"))
      val id = TableIdentifier(Seq("db"), "t")
      cat.createTable(id, schema)
      // seed main at snapshot 1
      val s1 = Snapshot(1L, None, 1L, 1000L, "file:///ml1.avro",
        Some(Summary(Operation.Append)), Some(0))
      cat.commitTable(id,
        Seq(TableRequirement.AssertRefSnapshotId("main", None)),
        Seq(TableUpdate.AddSnapshot(s1),
          TableUpdate.SetSnapshotRef("main", 1L, "branch")))
      // branch commit: the exact update pair Table.commitSnapshot emits.
      // The loopback server parses ONLY spec actions (any extension
      // field would be dropped), so this passing proves no silent
      // write loss against a spec-compliant catalog.
      val s2 = Snapshot(2L, Some(1L), 2L, 2000L, "file:///ml2.avro",
        Some(Summary(Operation.Append)), Some(0))
      val meta = cat.commitTable(id,
        Seq(TableRequirement.AssertRefSnapshotId("audit", None)),
        Seq(TableUpdate.AddSnapshot(s2),
          TableUpdate.SetSnapshotRef("audit", 2L, "branch")))
      assert(meta.ref("audit").map(_.snapshotId).contains(2L),
        "branch ref must move")
      assert(meta.currentSnapshotId.contains(1L), "main must not move")
      assert(meta.ref("main").map(_.snapshotId).contains(1L))
      // WIRE assertion (parsed, not whitespace-sensitive): the commit
      // body is pure spec vocabulary — add-snapshot carries no
      // extension field, and the branch move is an explicit
      // set-snapshot-ref
      val ups = SchemaJson.parseTree(lastCommitBody.get()).get("updates")
      val actions = (0 until ups.size)
        .map(i => ups.get(i).get("action").asText)
      assert(actions == Seq("add-snapshot", "set-snapshot-ref"),
        s"commit must pair add-snapshot with set-snapshot-ref: $actions")
      val addSnap = ups.get(0)
      assert(addSnap.get("branch") == null,
        s"no nonstandard 'branch' field on add-snapshot: $addSnap")
      assert(ups.get(1).get("ref-name").asText == "audit")
      assert(ups.get(1).get("type").asText == "branch")
      // hostile ref name: JSON escaping must keep the body parseable
      // and the name intact through the wire round-trip
      val evil = "q\"uote\\back\n"
      val meta2 = cat.commitTable(id, Nil,
        Seq(TableUpdate.SetSnapshotRef(evil, 2L, "tag")))
      assert(meta2.ref(evil).map(_.snapshotId).contains(2L),
        s"escaped ref name must round-trip, got refs ${meta2.refs.keySet}")
      // add-snapshot ALONE must not move any ref (spec semantics)
      val s3 = Snapshot(3L, Some(1L), 3L, 3000L, "file:///ml3.avro",
        Some(Summary(Operation.Append)), Some(0))
      val meta3 = cat.commitTable(id, Nil,
        Seq(TableUpdate.AddSnapshot(s3)))
      assert(meta3.currentSnapshotId.contains(1L))
      assert(meta3.snapshotById(3L).isDefined)
    }
  }

  test("sort order round-trips the wire: add-sort-order carries the " +
      "full definition, set-default-sort-order the real id") {
    withServer { (cat, _) =>
      cat.createNamespace(Seq("db"))
      val id = TableIdentifier(Seq("db"), "t")
      cat.createTable(id, schema)
      val order = SortOrder(1, Seq(
        SortField(1, Transform.Identity, SortDirection.Desc,
          NullOrder.NullsLast),
        SortField(2, Transform.Truncate(4), SortDirection.Asc,
          NullOrder.NullsFirst)))
      val meta = cat.commitTable(id, Nil,
        Seq(TableUpdate.AddSortOrder(order),
          TableUpdate.SetDefaultSortOrder(1)))
      // the server parsed ONLY spec vocabulary — the declared order must
      // be applied, not flattened to unsorted
      assert(meta.defaultSortOrderId == 1,
        s"default order id must be 1, got ${meta.defaultSortOrderId}")
      assert(meta.defaultSortOrder == order,
        s"order must round-trip intact, got ${meta.defaultSortOrder}")
      // WIRE assertions: real fields and the real id on the body
      val ups = SchemaJson.parseTree(lastCommitBody.get()).get("updates")
      val actions = (0 until ups.size)
        .map(i => ups.get(i).get("action").asText)
      assert(actions == Seq("add-sort-order", "set-default-sort-order"),
        s"actions: $actions")
      val so = ups.get(0).get("sort-order")
      assert(so.get("order-id").asInt == 1)
      assert(so.get("fields").size == 2)
      assert(so.get("fields").get(0).get("direction").asText == "desc")
      assert(so.get("fields").get(0).get("null-order").asText == "nulls-last")
      assert(so.get("fields").get(1).get("transform").asText == "truncate[4]")
      assert(ups.get(1).get("sort-order-id").asInt == 1)
    }
  }

  test("OAuth2 client_credentials: token fetched, attached, refreshed " +
      "on expiry (rest.go:455-476 parity)") {
    val fetches = new java.util.concurrent.atomic.AtomicInteger(0)
    val lastForm = new java.util.concurrent.atomic.AtomicReference[String]("")
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", { (ex: HttpExchange) =>
      val body = new String(ex.getRequestBody.readAllBytes(), UTF_8)
      def reply(code: Int, s: String): Unit = {
        val b = s.getBytes(UTF_8)
        ex.sendResponseHeaders(code, if (b.isEmpty) -1 else b.length)
        if (b.nonEmpty) ex.getResponseBody.write(b)
        ex.close()
      }
      ex.getRequestURI.getPath match {
        case "/v1/oauth/tokens" =>
          lastForm.set(body)
          val n = fetches.incrementAndGet()
          // expires_in=1s is inside the client's 30s refresh margin, so
          // every subsequent call must re-fetch
          reply(200, s"""{"access_token": "tok-$n", "token_type": "bearer",
            |"expires_in": 1}""".stripMargin)
        case "/v1/config" =>
          val auth = Option(ex.getRequestHeaders.getFirst("Authorization"))
          if (!auth.exists(a => a.startsWith("Bearer tok-")))
            reply(401, "no/bad token")
          else reply(200, """{"defaults": {}, "overrides": {}}""")
        case "/v1/namespaces" =>
          val auth = Option(ex.getRequestHeaders.getFirst("Authorization"))
          if (!auth.exists(a => a.startsWith("Bearer tok-")))
            reply(401, "no/bad token")
          else reply(200, """{"namespaces": []}""")
        case p => reply(404, s"no route: $p")
      }
    })
    server.start()
    try {
      val cat = new RestCatalog(
        s"http://127.0.0.1:${server.getAddress.getPort}",
        token = None, warehouse = None, credential = Some("cid:csecret"))
      cat.fetchConfig()
      assert(fetches.get() == 1, "config call must trigger a token fetch")
      assert(lastForm.get() ==
        "grant_type=client_credentials&client_id=cid" +
          "&client_secret=csecret&scope=catalog",
        s"unexpected form body: ${lastForm.get()}")
      assert(cat.listNamespaces().isEmpty)
      assert(fetches.get() >= 2,
        "expired token must be refreshed before the next call")
    } finally server.stop(0)
  }

  test("server-side token revocation: 401 invalidates the cached " +
      "bearer and the request retries once with a fresh token") {
    val fetches = new java.util.concurrent.atomic.AtomicInteger(0)
    val revoked = new java.util.concurrent.atomic.AtomicReference[String]("")
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", { (ex: HttpExchange) =>
      def reply(code: Int, s: String): Unit = {
        val b = s.getBytes(UTF_8)
        ex.sendResponseHeaders(code, if (b.isEmpty) -1 else b.length)
        if (b.nonEmpty) ex.getResponseBody.write(b)
        ex.close()
      }
      ex.getRequestURI.getPath match {
        case "/v1/oauth/tokens" =>
          val n = fetches.incrementAndGet()
          // long-lived tokens: the client will NOT refresh on its own
          reply(200, s"""{"access_token": "tok-$n", "token_type": "bearer",
            |"expires_in": 3600}""".stripMargin)
        case "/v1/namespaces" =>
          val auth = Option(ex.getRequestHeaders.getFirst("Authorization"))
            .getOrElse("")
          if (auth == s"Bearer ${revoked.get()}") reply(401, "revoked")
          else if (auth.startsWith("Bearer tok-"))
            reply(200, """{"namespaces": []}""")
          else reply(401, "no token")
        case p => reply(404, s"no route: $p")
      }
    })
    server.start()
    try {
      val cat = new RestCatalog(
        s"http://127.0.0.1:${server.getAddress.getPort}",
        token = None, warehouse = None, credential = Some("cid"))
      assert(cat.listNamespaces().isEmpty)
      assert(fetches.get() == 1)
      // revoke tok-1 server-side, well before its client-side expiry
      revoked.set("tok-1")
      assert(cat.listNamespaces().isEmpty,
        "revoked token must refresh + retry, not fail")
      assert(fetches.get() == 2, "exactly one re-fetch on 401")
    } finally server.stop(0)
  }

  test("list pagination follows next-page-token to the last page") {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    val tables = (1 to 5).map(i => s"t$i")
    server.createContext("/", { (ex: HttpExchange) =>
      def reply(code: Int, s: String): Unit = {
        val b = s.getBytes(UTF_8)
        ex.sendResponseHeaders(code, if (b.isEmpty) -1 else b.length)
        if (b.nonEmpty) ex.getResponseBody.write(b)
        ex.close()
      }
      val q = Option(ex.getRequestURI.getQuery).getOrElse("")
      val page = q.split("&").collectFirst {
        case p if p.startsWith("pageToken=") => p.stripPrefix("pageToken=")
      }.map(_.toInt).getOrElse(0)
      ex.getRequestURI.getPath match {
        case "/v1/namespaces/db/tables" =>
          // two tables per page, three pages
          val slice = tables.slice(page * 2, page * 2 + 2)
          val ids = slice.map(t =>
            s"""{"namespace": ["db"], "name": "$t"}""")
            .mkString("[", ",", "]")
          val next =
            if ((page + 1) * 2 < tables.length)
              s""", "next-page-token": "${page + 1}""""
            else ""
          reply(200, s"""{"identifiers": $ids$next}""")
        case "/v1/namespaces" =>
          // one namespace per page, two pages
          val all = Seq("""["db"]""", """["db2"]""")
          val next = if (page == 0) s""", "next-page-token": "1"""" else ""
          reply(200, s"""{"namespaces": [${all(page)}]$next}""")
        case p => reply(404, s"no route: $p")
      }
    })
    server.start()
    try {
      val cat = new RestCatalog(
        s"http://127.0.0.1:${server.getAddress.getPort}",
        token = Some("tok"))
      assert(cat.listTables(Seq("db")).map(_.name) == tables,
        "all three pages must be drained in order")
      assert(cat.listNamespaces() == Seq(Seq("db"), Seq("db2")))
    } finally server.stop(0)
  }

  test("namespace properties round-trip (catalog.go:27-31 parity)") {
    withServer { (cat, _) =>
      cat.createNamespace(Seq("propsns"),
        Map("owner" -> "graft", "tier" -> "gold"))
      assert(cat.loadNamespaceProperties(Seq("propsns")) ==
        Map("owner" -> "graft", "tier" -> "gold"))
      // removals apply before updates; a key in both ends updated
      cat.updateNamespaceProperties(Seq("propsns"),
        removals = Seq("tier", "absent"),
        updates = Map("owner" -> "etl", "region" -> "eu"))
      assert(cat.loadNamespaceProperties(Seq("propsns")) ==
        Map("owner" -> "etl", "region" -> "eu"))
      intercept[NoSuchNamespaceException] {
        cat.loadNamespaceProperties(Seq("missing"))
      }
      intercept[NoSuchNamespaceException] {
        cat.updateNamespaceProperties(Seq("missing"), Nil, Map("a" -> "b"))
      }
    }
  }

  // --------------------- procedures over the REST wire (round-15 ask)

  /** Register a GraftSparkCatalog at the loopback REST server under a
    * fresh name and hand it to the test; cleans up the conf keys. */
  private def withSparkRestCatalog(uri: String)(
      f: (org.apache.spark.sql.SparkSession, String) => Unit): Unit = {
    val spark = graft.SparkTestSession.spark
    val c = "restp" + java.util.UUID.randomUUID.toString.take(8)
    spark.conf.set(s"spark.sql.catalog.$c",
      "graft.sources.GraftSparkCatalog")
    spark.conf.set(s"spark.sql.catalog.$c.uri", uri)
    spark.conf.set(s"spark.sql.catalog.$c.token", "test-token")
    try f(spark, c)
    finally {
      spark.conf.unset(s"spark.sql.catalog.$c")
      spark.conf.unset(s"spark.sql.catalog.$c.uri")
      spark.conf.unset(s"spark.sql.catalog.$c.token")
    }
  }

  test("CALL system.add_files through the REST catalog: the server " +
      "sees a pure spec-vocabulary append commit with real counters") {
    withServerUri { (_, _, uri) =>
      withSparkRestCatalog(uri) { (spark, c) =>
        import spark.implicits._
        spark.sql(s"CREATE NAMESPACE $c.db")
        spark.sql(s"CREATE TABLE $c.db.t (id BIGINT, name STRING)")
        val ext = Files.createTempDirectory("graft-rest-af-").toString
        (1 to 6).map(i => (i.toLong, s"n$i")).toDF("id", "name")
          .coalesce(1).write.mode("overwrite").parquet(ext)
        val res = spark.sql(
          s"CALL $c.system.add_files('db', 't', '$ext')").collect().head
        assert(res.getLong(0) == 1L && res.getLong(1) == 6L,
          s"(files, records) = (${res.getLong(0)}, ${res.getLong(1)})")
        // WIRE assertion: the commit the server received is spec
        // vocabulary — one add-snapshot whose summary carries the real
        // append operation and counters, then the main-ref move
        val body = SchemaJson.parseTree(lastCommitBody.get())
        val ups = body.get("updates")
        val actions = (0 until ups.size)
          .map(i => ups.get(i).get("action").asText)
        assert(actions.contains("add-snapshot"), s"actions: $actions")
        val snap = ups.get(actions.indexOf("add-snapshot"))
          .get("snapshot")
        val sum = snap.get("summary")
        assert(sum.get("operation").asText == "append", s"summary: $sum")
        assert(sum.get("added-data-files").asText == "1", s"summary: $sum")
        assert(sum.get("added-records").asText == "6", s"summary: $sum")
        // and the import is readable back through the same catalog
        assert(spark.sql(s"SELECT id FROM $c.db.t ORDER BY id").collect()
          .map(_.getLong(0)).toSeq == (1L to 6L))
      }
    }
  }

  test("CALL system.dedup_table through the REST catalog: the server " +
      "sees a spec-vocabulary overwrite commit with the kept count") {
    withServerUri { (_, _, uri) =>
      withSparkRestCatalog(uri) { (spark, c) =>
        import spark.implicits._
        spark.sql(s"CREATE NAMESPACE $c.db")
        spark.sql(s"CREATE TABLE $c.db.docs (doc_id BIGINT, text STRING)")
        // two exact-dup pairs, one unique text, one NULL-text row
        // (NULL text is exempt from exact-mode collapse)
        val tmp = "restdedup_" + java.util.UUID.randomUUID.toString.take(8)
        Seq((1L, "alpha"), (2L, "beta"), (3L, "alpha"), (4L, "gamma"),
          (5L, "beta"), (6L, null.asInstanceOf[String]))
          .toDF("doc_id", "text").createOrReplaceTempView(tmp)
        spark.sql(s"INSERT INTO $c.db.docs SELECT * FROM $tmp")
        val res = spark.sql(
          s"CALL $c.system.dedup_table('db', 'docs')").collect().head
        assert(res.getLong(0) == 6L && res.getLong(1) == 4L &&
          res.getLong(2) == 2L,
          s"(before, kept, removed) = $res")
        // WIRE assertion: the commit the server received is spec
        // vocabulary — an overwrite snapshot whose summary carries the
        // committed kept-row counter
        val body = SchemaJson.parseTree(lastCommitBody.get())
        val ups = body.get("updates")
        val actions = (0 until ups.size)
          .map(i => ups.get(i).get("action").asText)
        assert(actions.contains("add-snapshot"), s"actions: $actions")
        val sum = ups.get(actions.indexOf("add-snapshot"))
          .get("snapshot").get("summary")
        assert(sum.get("operation").asText == "overwrite", s"summary: $sum")
        assert(sum.get("added-records").asText == "4", s"summary: $sum")
        // read-back through the same catalog: min id per text survives,
        // the NULL-text row survives
        assert(spark.sql(s"SELECT doc_id FROM $c.db.docs ORDER BY doc_id")
          .collect().map(_.getLong(0)).toSeq == Seq(1L, 2L, 4L, 6L))
      }
    }
  }

  test("CALL system.train_lm through the REST catalog: the ledger " +
      "model table lives server-side; score_text, chain, and " +
      "corpus_stats round-trip over the wire") {
    withServerUri { (_, backing, uri) =>
      withSparkRestCatalog(uri) { (spark, c) =>
        spark.sql(s"CREATE NAMESPACE $c.db")
        spark.sql(s"CREATE TABLE $c.db.docs (doc_id BIGINT, text STRING)")
        spark.sql(s"INSERT INTO $c.db.docs VALUES " +
          "(1, 'a b c a b c'), (2, 'a b x')")
        // full train: ug a3 b3 c2 x1 | bg ab3 bc2 ca1 bx1 |
        // tri abc2 bca1 cab1 abx1 -> 12 ledger rows, 9 tokens
        val rep = spark.sql(s"CALL $c.system.train_lm('db', 'docs')")
          .collect().head
        assert(rep.getString(0) == "docs_lm_model" &&
          rep.getLong(1) == 12L && rep.getLong(2) == 9L, s"report $rep")
        // the model table and its stamped config exist SERVER-side
        val mdl = backing.loadTable(
          TableIdentifier(Seq("db"), "docs_lm_model"))
        assert(mdl.properties("graft.lm-model.total-tokens") == "9" &&
          mdl.properties("graft.lm-model.source-table") == "db.docs",
          mdl.properties.toString)
        // score over the wire: (a,b,c) -> P*2 div 3; (b,c,d) -> OOV
        val s1 = spark.sql(s"CALL $c.system.score_text(" +
          s"'db', 'docs_lm_model', 'a b c d')").collect().head
        assert((s1.getLong(0), s1.getLong(1), s1.getLong(4),
          s1.getLong(5)) == ((2L, 1L, 1L, 666666666L)), s1.toString)
        // chain over the wire: 'c c' -> ug c2 + bg cc1, total 9+2
        spark.sql(s"INSERT INTO $c.db.docs VALUES (4, 'c c')")
        val rep2 = spark.sql(s"CALL $c.system.train_lm(" +
          s"'db', 'docs', incremental => true)").collect().head
        assert(rep2.getLong(1) == 2L && rep2.getLong(2) == 11L,
          s"chain report $rep2")
        assert(backing.loadTable(
            TableIdentifier(Seq("db"), "docs_lm_model"))
          .properties("graft.lm-model.total-tokens") == "11")
        // corpus_stats over the wire: 3 docs, 0 NULL, 11+5+3=19 chars,
        // 11 tokens, distinct {a,b,c,x} = 4
        val st = spark.sql(s"CALL $c.system.corpus_stats(" +
          s"'db', 'docs')").collect().head
        assert((st.getLong(1), st.getLong(2), st.getLong(3),
          st.getLong(4), st.getLong(5)) == ((3L, 0L, 19L, 11L, 4L)),
          st.toString)
      }
    }
  }

  test("CALL system.train_classifier through the REST catalog: a " +
      "label-pred with double quotes survives the create-table JSON") {
    withServerUri { (_, backing, uri) =>
      withSparkRestCatalog(uri) { (spark, c) =>
        spark.sql(s"CREATE NAMESPACE $c.db")
        spark.sql(s"CREATE TABLE $c.db.docs " +
          "(doc_id BIGINT, lang STRING, text STRING)")
        spark.sql(s"INSERT INTO $c.db.docs VALUES " +
          "(1, 'en', 'x y'), (2, 'fr', 'y z')")
        // Spark SQL double-quoted string literal inside the predicate
        // — the stamped property value carries literal double quotes,
        // which a naively interpolated create-table JSON body would
        // corrupt
        val pred = """lang = "en""""
        val rep = spark.sql(s"CALL $c.system.train_classifier(" +
          s"'db', 'docs', 'lang = \"en\"')").collect().head
        assert(rep.getLong(2) == 2L && rep.getLong(3) == 2L,
          s"report $rep")
        val mdl = backing.loadTable(
          TableIdentifier(Seq("db"), "docs_clf_model"))
        assert(mdl.properties("graft.clf-model.label-pred") == pred,
          mdl.properties.toString)
        // chain with the identical quoted predicate round-trips
        spark.sql(s"INSERT INTO $c.db.docs VALUES (3, 'en', 'z')")
        val rep2 = spark.sql(s"CALL $c.system.train_classifier(" +
          s"'db', 'docs', 'lang = \"en\"', incremental => true)")
          .collect().head
        assert(rep2.getLong(2) == 3L && rep2.getLong(3) == 2L,
          s"chain report $rep2")
      }
    }
  }

  test("CALL system.register_table through the REST catalog posts the " +
      "metadata location and round-trips the table") {
    withServerUri { (_, backing, uri) =>
      withSparkRestCatalog(uri) { (spark, c) =>
        spark.sql(s"CREATE NAMESPACE $c.db")
        spark.sql(s"CREATE NAMESPACE $c.mirror")
        spark.sql(s"CREATE TABLE $c.db.t (id BIGINT)")
        (1 to 3).foreach(i =>
          spark.sql(s"INSERT INTO $c.db.t VALUES ($i)"))
        val src = backing.loadTable(TableIdentifier(Seq("db"), "t"))
        val mloc = src.location.stripPrefix("file://") +
          "/metadata/v00004.metadata.json"
        val res = spark.sql(s"CALL $c.system.register_table('mirror', " +
          s"'t_reg', '$mloc')").collect().head
        assert(res.getString(0) == src.tableUuid,
          s"uuid ${res.getString(0)} != ${src.tableUuid}")
        assert(res.getLong(1) == src.currentSnapshotId.getOrElse(-1L))
        // WIRE assertion: the register request body is spec vocabulary
        val n = SchemaJson.parseTree(lastRegisterBody.get())
        assert(n.get("name").asText == "t_reg", s"body: $n")
        assert(n.get("metadata-location").asText == mloc, s"body: $n")
        // and the registered table reads back through the same catalog
        assert(spark.sql(s"SELECT id FROM $c.mirror.t_reg ORDER BY id")
          .collect().map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
      }
    }
  }
}
