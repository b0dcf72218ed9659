package graft.catalog

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets.UTF_8
import java.time.Duration

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}

import graft.spec._
import graft.spec.{SchemaJson, MetadataJson}

/** Iceberg REST catalog client (`catalog/rest.go:17-509`) over
  * `java.net.http.HttpClient`. Endpoint shapes follow the Iceberg REST
  * OpenAPI spec the reference implements: `/v1/config`, namespace CRUD,
  * table CRUD, rename, and requirement/update commits. Offline-testable
  * against an in-process server (the environment has no egress).
  */
class RestCatalog(
    baseUri: String,
    token: Option[String] = None,
    warehouse: Option[String] = None,
    /** OAuth2 client credential (`"client_id:client_secret"`, or a bare
      * client id as the reference sends — `catalog/rest.go:455-476`).
      * When set and no static `token` is given, a bearer token is
      * fetched from `/v1/oauth/tokens` and refreshed on expiry. */
    credential: Option[String] = None,
    /** OAuth2 scope requested with the token (`config.go` WithScope). */
    oauthScope: String = "catalog",
    timeout: Duration = Duration.ofSeconds(30)) extends Catalog {

  private val http = HttpClient.newBuilder()
    .connectTimeout(timeout).build()
  private val root = baseUri.stripSuffix("/")
  private val mapper = SchemaJson.parseTree("{}") // warm jackson
  private var prefix: String = ""

  // ------------------------------------------------------------ oauth

  @volatile private var bearer: Option[String] = token
  @volatile private var bearerExpiresAtMs: Long = Long.MaxValue
  private val tokenLock = new Object

  /** POST `client_credentials` to `/v1/oauth/tokens` (reference
    * FetchToken, `catalog/rest.go:455-476`) and cache the bearer with
    * its expiry. A `id:secret` credential sends both fields (Iceberg
    * REST convention); a bare id matches the reference's single-field
    * form. */
  def fetchToken(): String = {
    val cred = credential.getOrElse(throw new IllegalStateException(
      "fetchToken requires a client credential"))
    val (cid, secret) = cred.indexOf(':') match {
      case -1 => (cred, None)
      case i => (cred.substring(0, i), Some(cred.substring(i + 1)))
    }
    val form = s"grant_type=client_credentials&client_id=${enc(cid)}" +
      secret.map(s => s"&client_secret=${enc(s)}").getOrElse("") +
      s"&scope=${enc(oauthScope)}"
    val req = HttpRequest.newBuilder(URI.create(s"$root/v1/oauth/tokens"))
      .timeout(timeout)
      .header("Content-Type", "application/x-www-form-urlencoded")
      .POST(HttpRequest.BodyPublishers.ofString(form))
      .build()
    val resp = http.send(req, HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() != 200)
      throw new RuntimeException(
        s"oauth token fetch failed ${resp.statusCode()}: ${resp.body()}")
    val n = SchemaJson.parseTree(resp.body())
    val tok = Option(n.get("access_token")).map(_.asText).getOrElse(
      throw new RuntimeException(s"no access_token in: ${resp.body()}"))
    val ttlMs = Option(n.get("expires_in")).map(_.asLong * 1000L)
    bearer = Some(tok)
    // refresh 30 s early so in-flight requests never carry a token that
    // expires mid-call; no expires_in → token never expires client-side
    bearerExpiresAtMs = ttlMs
      .map(t => System.currentTimeMillis() + math.max(0L, t - 30000L))
      .getOrElse(Long.MaxValue)
    tok
  }

  /** Current bearer: the static token if configured, else the cached
    * OAuth token (fetched/refreshed on demand). Refresh is
    * double-check-locked so concurrent driver threads crossing the
    * expiry line issue one fetch, not a stampede. */
  private def currentBearer: Option[String] =
    if (token.isDefined) token
    else if (credential.isDefined) {
      if (bearer.isEmpty || System.currentTimeMillis() >= bearerExpiresAtMs)
        tokenLock.synchronized {
          if (bearer.isEmpty ||
              System.currentTimeMillis() >= bearerExpiresAtMs)
            fetchToken()
        }
      bearer
    } else None

  /** `/v1/config` (`catalog/rest.go` GetConfig): may supply a route
    * prefix and defaults. Call before first use; safe to skip. */
  def fetchConfig(): Map[String, String] = {
    val q = warehouse.map(w => s"?warehouse=${enc(w)}").getOrElse("")
    val n = getJson(s"$root/v1/config$q")
    val defaults = Option(n.get("defaults")).map(d =>
      fieldsOf(d).map { case (k, v) => k -> v.asText }.toMap)
      .getOrElse(Map.empty)
    val overrides = Option(n.get("overrides")).map(d =>
      fieldsOf(d).map { case (k, v) => k -> v.asText }.toMap)
      .getOrElse(Map.empty)
    val merged = defaults ++ overrides
    prefix = merged.get("prefix").map(p => "/" + p.stripPrefix("/")).getOrElse("")
    merged
  }

  private def base = s"$root/v1$prefix"
  private def enc(s: String) =
    java.net.URLEncoder.encode(s, UTF_8)

  /** JSON string literal with escaping — names, locations, and property
    * values are user-controlled and must never break the request body. */
  private def jstr(s: String): String = {
    val sb = new StringBuilder(s.length + 2).append('"')
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append('"').toString
  }
  private def nsPath(ns: Seq[String]) = ns.mkString("%1F") // unit sep per spec

  // ------------------------------------------------------------- http

  private def request(method: String, uri: String,
      body: Option[String] = None): HttpRequest = {
    var b = HttpRequest.newBuilder(URI.create(uri))
      .timeout(timeout)
      .header("Content-Type", "application/json")
    currentBearer.foreach(t => b = b.header("Authorization", s"Bearer $t"))
    b = method match {
      case "GET" => b.GET()
      case "DELETE" => b.DELETE()
      case m => b.method(m,
        HttpRequest.BodyPublishers.ofString(body.getOrElse("")))
    }
    b.build()
  }

  private def send(method: String, uri: String,
      body: Option[String] = None): (Int, String) = {
    val resp = http.send(request(method, uri, body),
      HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() == 401 && token.isEmpty && credential.isDefined) {
      // server-side revocation before client-side expiry: invalidate the
      // cached bearer and retry exactly once with a fresh token (the
      // rebuilt request re-resolves currentBearer, which refetches)
      tokenLock.synchronized { bearerExpiresAtMs = 0L }
      val retry = http.send(request(method, uri, body),
        HttpResponse.BodyHandlers.ofString())
      (retry.statusCode(), retry.body())
    } else (resp.statusCode(), resp.body())
  }

  private def expect(method: String, uri: String, body: Option[String],
      ok: Set[Int]): String = {
    val (code, respBody) = send(method, uri, body)
    if (ok.contains(code)) respBody
    else code match {
      case 404 => throw new NoSuchTableException(s"$method $uri: $respBody")
      case 409 => throw new CommitFailedException(s"$method $uri: $respBody")
      case 419 | 401 | 403 => throw new RuntimeException(
        s"auth failure $code: $respBody")
      case _ => throw new RuntimeException(
        s"$method $uri -> $code: $respBody")
    }
  }

  private def getJson(uri: String): JsonNode =
    SchemaJson.parseTree(expect("GET", uri, None, Set(200)))

  private def fieldsOf(n: JsonNode): Iterator[(String, JsonNode)] = {
    val it = n.properties().iterator()
    new Iterator[(String, JsonNode)] {
      def hasNext = it.hasNext
      def next() = { val e = it.next(); e.getKey -> e.getValue }
    }
  }

  // ------------------------------------------------------- namespaces

  /** Follow `next-page-token` until the server stops returning one —
    * the REST spec's list pagination (large real catalogs page their
    * listings; a server that doesn't paginate simply omits the token
    * and the loop runs once). */
  private def paged[A](uri: String, parse: JsonNode => Seq[A]): Seq[A] = {
    val out = Seq.newBuilder[A]
    var pageToken: Option[String] = None
    var pages = 0
    var done = false
    while (!done) {
      val q = pageToken.map(t => s"?pageToken=${enc(t)}").getOrElse("")
      val n = getJson(uri + q)
      out ++= parse(n)
      val next = Option(n.get("next-page-token")).filterNot(_.isNull)
        .map(_.asText).filter(_.nonEmpty)
      // fail loud, never hang: a server re-issuing the same token (or
      // paging without end) would otherwise spin this loop forever
      if (next.isDefined && next == pageToken)
        throw new RuntimeException(
          s"REST pagination did not advance at $uri (token ${next.get})")
      pages += 1
      if (next.isDefined && pages >= 10000)
        throw new RuntimeException(
          s"REST pagination exceeded 10000 pages at $uri")
      pageToken = next
      done = pageToken.isEmpty
    }
    out.result()
  }

  override def listNamespaces(): Seq[Seq[String]] =
    paged(s"$base/namespaces", n =>
      Option(n.get("namespaces")).map { arr =>
        elems(arr).map(e => elems(e).map(_.asText).toSeq).toSeq
      }.getOrElse(Nil))

  private def elems(n: JsonNode): Iterator[JsonNode] = {
    val it = n.elements()
    new Iterator[JsonNode] {
      def hasNext = it.hasNext; def next() = it.next()
    }
  }

  override def createNamespace(ns: Seq[String],
      properties: Map[String, String]): Unit = {
    val props = properties.map { case (k, v) =>
      s""""${k}": "${v}"""" }.mkString(",")
    val body = s"""{"namespace": [${ns.map(n => s""""$n"""").mkString(",")}],
      |"properties": {$props}}""".stripMargin
    val (code, resp) = send("POST", s"$base/namespaces", Some(body))
    if (code == 409) throw new AlreadyExistsException(ns.mkString("."))
    if (code != 200) throw new RuntimeException(s"createNamespace: $code $resp")
  }

  override def dropNamespace(ns: Seq[String]): Unit = {
    val (code, resp) = send("DELETE", s"$base/namespaces/${nsPath(ns)}")
    if (code == 404) throw new NoSuchNamespaceException(ns.mkString("."))
    if (code != 204 && code != 200)
      throw new RuntimeException(s"dropNamespace: $code $resp")
  }

  override def namespaceExists(ns: Seq[String]): Boolean =
    send("HEAD", s"$base/namespaces/${nsPath(ns)}")._1 match {
      case 200 | 204 => true
      case _ => false
    }

  /** GET /v1/namespaces/{ns} → `properties` (`catalog/rest.go:246-262`). */
  override def loadNamespaceProperties(
      ns: Seq[String]): Map[String, String] = {
    val (code, resp) = send("GET", s"$base/namespaces/${nsPath(ns)}")
    if (code == 404) throw new NoSuchNamespaceException(ns.mkString("."))
    if (code != 200)
      throw new RuntimeException(s"loadNamespaceProperties: $code $resp")
    val node = SchemaJson.parseTree(resp)
    Option(node.get("properties")).map { p =>
      fieldsOf(p).map { case (k, v) => k -> v.asText }.toMap
    }.getOrElse(Map.empty)
  }

  /** POST /v1/namespaces/{ns}/properties with
    * `{"removals": [...], "updates": {...}}` (`catalog/rest.go:264-277`). */
  override def updateNamespaceProperties(ns: Seq[String],
      removals: Seq[String], updates: Map[String, String]): Unit = {
    val body = new com.fasterxml.jackson.databind.ObjectMapper()
      .createObjectNode()
    val rem = body.putArray("removals")
    removals.foreach(rem.add)
    val ups = body.putObject("updates")
    updates.toSeq.sortBy(_._1).foreach { case (k, v) => ups.put(k, v) }
    val (code, resp) = send("POST",
      s"$base/namespaces/${nsPath(ns)}/properties",
      Some(body.toString))
    if (code == 404) throw new NoSuchNamespaceException(ns.mkString("."))
    if (code != 200 && code != 204)
      throw new RuntimeException(s"updateNamespaceProperties: $code $resp")
  }

  // ------------------------------------------------------------ tables

  override def listTables(ns: Seq[String]): Seq[TableIdentifier] =
    paged(s"$base/namespaces/${nsPath(ns)}/tables", n =>
      Option(n.get("identifiers")).map { arr =>
        elems(arr).map { e =>
          TableIdentifier(
            elems(e.get("namespace")).map(_.asText).toSeq,
            e.get("name").asText)
        }.toSeq
      }.getOrElse(Nil))

  override def createTable(id: TableIdentifier, schema: Schema,
      spec: PartitionSpec, sortOrder: SortOrder,
      properties: Map[String, String]): TableMetadata = {
    // jstr-escape keys AND values: stamped config like a classifier's
    // label predicate can carry quotes/backslashes, and a naive
    // interpolation would emit invalid JSON
    val props = properties.map { case (k, v) =>
      s"${jstr(k)}: ${jstr(v)}" }.mkString(",")
    val body =
      s"""{"name": ${jstr(id.name)},
         |"schema": ${schema.toJson},
         |"properties": {$props}}""".stripMargin
    val resp = expect("POST",
      s"$base/namespaces/${nsPath(id.namespace)}/tables", Some(body),
      Set(200))
    parseLoadResponse(resp)
  }

  /** `POST /namespaces/{ns}/register` (Iceberg REST spec §register):
    * `{"name", "metadata-location"}`. */
  override def registerTable(id: TableIdentifier,
      metadataLocation: String): TableMetadata = {
    val body = s"""{"name": ${jstr(id.name)}, """ +
      s""""metadata-location": ${jstr(metadataLocation)}}"""
    parseLoadResponse(expect("POST",
      s"$base/namespaces/${nsPath(id.namespace)}/register", Some(body),
      Set(200)))
  }

  override def loadTable(id: TableIdentifier): TableMetadata =
    parseLoadResponse(expect("GET", tableUri(id), None, Set(200)))

  private def tableUri(id: TableIdentifier) =
    s"$base/namespaces/${nsPath(id.namespace)}/tables/${enc(id.name)}"

  private def parseLoadResponse(body: String): TableMetadata = {
    val n = SchemaJson.parseTree(body)
    val meta = Option(n.get("metadata")).getOrElse(n)
    MetadataJson.parse(meta.toString)
  }

  override def tableExists(id: TableIdentifier): Boolean =
    send("HEAD", tableUri(id))._1 match {
      case 200 | 204 => true
      case _ => false
    }

  override def dropTable(id: TableIdentifier, purge: Boolean): Unit = {
    val suffix = if (purge) "?purgeRequested=true" else ""
    val (code, resp) = send("DELETE", tableUri(id) + suffix)
    if (code == 404) throw new NoSuchTableException(id.toString)
    if (code != 204 && code != 200)
      throw new RuntimeException(s"dropTable: $code $resp")
  }

  override def renameTable(from: TableIdentifier,
      to: TableIdentifier): Unit = {
    def idJson(id: TableIdentifier) =
      s"""{"namespace": [${id.namespace.map(n => s""""$n"""").mkString(",")}],
         |"name": "${id.name}"}""".stripMargin
    expect("POST", s"$base/tables/rename",
      Some(s"""{"source": ${idJson(from)}, "destination": ${idJson(to)}}"""),
      Set(200, 204))
    ()
  }

  // ------------------------------------------------------------ commit

  override def commitTable(id: TableIdentifier,
      requirements: Seq[TableRequirement],
      updates: Seq[TableUpdate]): TableMetadata = {
    val body =
      s"""{"requirements": [${requirements.map(reqJson).mkString(",")}],
         |"updates": [${updates.map(updateJson).mkString(",")}]}""".stripMargin
    parseLoadResponse(expect("POST", tableUri(id), Some(body), Set(200)))
  }

  /** Requirement JSON per `catalog/catalog.go:131-203`. */
  private def reqJson(r: TableRequirement): String = r match {
    case TableRequirement.AssertCreate =>
      """{"type": "assert-create"}"""
    case TableRequirement.AssertTableUuid(u) =>
      s"""{"type": "assert-table-uuid", "uuid": "$u"}"""
    case TableRequirement.AssertRefSnapshotId(ref, sid) =>
      val sidJson = sid.map(_.toString).getOrElse("null")
      s"""{"type": "assert-ref-snapshot-id", "ref": ${jstr(ref)}, "snapshot-id": $sidJson}"""
    case TableRequirement.AssertCurrentSchemaId(i) =>
      s"""{"type": "assert-current-schema-id", "current-schema-id": $i}"""
    case TableRequirement.AssertLastAssignedFieldId(i) =>
      s"""{"type": "assert-last-assigned-field-id", "last-assigned-field-id": $i}"""
    case TableRequirement.AssertDefaultSpecId(i) =>
      s"""{"type": "assert-default-spec-id", "default-spec-id": $i}"""
    case TableRequirement.AssertDefaultSortOrderId(i) =>
      s"""{"type": "assert-default-sort-order-id", "default-sort-order-id": $i}"""
  }

  /** Update JSON per `catalog/catalog.go:205-280`. */
  private def updateJson(u: TableUpdate): String = u match {
    case TableUpdate.AddSnapshot(s) =>
      // spec vocabulary only: add-snapshot records the snapshot; the
      // commit path pairs it with a set-snapshot-ref for the target
      // branch (reference `catalog/catalog.go:252-260`), so a
      // spec-compliant server that ignores unknown fields still moves
      // the ref — no silent write loss on branch (WAP) commits.
      s"""{"action": "add-snapshot", "snapshot": ${snapshotJson(s)}}"""
    case TableUpdate.SetSnapshotRef(name, sid, tpe, minKeep, maxSnapAge,
        maxRefAge) =>
      val knobs = Seq(
        minKeep.map(v => s""""min-snapshots-to-keep": $v"""),
        maxSnapAge.map(v => s""""max-snapshot-age-ms": $v"""),
        maxRefAge.map(v => s""""max-ref-age-ms": $v""")).flatten
      val extra = if (knobs.isEmpty) "" else knobs.mkString(", ", ", ", "")
      s"""{"action": "set-snapshot-ref", "ref-name": ${jstr(name)},
         |"snapshot-id": $sid, "type": ${jstr(tpe)}$extra}""".stripMargin
    case TableUpdate.RemoveSnapshots(ids) =>
      s"""{"action": "remove-snapshots", "snapshot-ids": [${ids.mkString(",")}]}"""
    case TableUpdate.RemoveSnapshotRef(name) =>
      s"""{"action": "remove-snapshot-ref", "ref-name": ${jstr(name)}}"""
    case TableUpdate.AddSchema(s, _) =>
      s"""{"action": "add-schema", "schema": ${s.toJson}}"""
    case TableUpdate.SetCurrentSchema(i) =>
      s"""{"action": "set-current-schema", "schema-id": $i}"""
    case TableUpdate.AddPartitionSpec(s) =>
      s"""{"action": "add-spec", "spec": ${specJson(s)}}"""
    case TableUpdate.SetDefaultSpec(i) =>
      s"""{"action": "set-default-spec", "spec-id": $i}"""
    case TableUpdate.AddSortOrder(o) =>
      s"""{"action": "add-sort-order", "sort-order": ${sortOrderJson(o)}}"""
    case TableUpdate.SetDefaultSortOrder(i) =>
      s"""{"action": "set-default-sort-order", "sort-order-id": $i}"""
    case TableUpdate.SetLocation(l) =>
      s"""{"action": "set-location", "location": ${jstr(l)}}"""
    case TableUpdate.SetProperties(m) =>
      val kvs = m.map { case (k, v) => s"${jstr(k)}: ${jstr(v)}" }.mkString(",")
      s"""{"action": "set-properties", "updates": {$kvs}}"""
    case TableUpdate.RemoveProperties(ks) =>
      s"""{"action": "remove-properties",
         |"removals": [${ks.map(jstr).mkString(",")}]}""".stripMargin
  }

  private def snapshotJson(s: Snapshot): String = {
    // reuse the metadata writer by wrapping in a single-snapshot doc
    val m = TableMetadata(tableUuid = "x", location = "x",
      schemas = Seq(Schema(0, Nil)), currentSchemaId = 0,
      partitionSpecs = Seq(PartitionSpec.unpartitioned))
      .copy(snapshots = Seq(s))
    val n = SchemaJson.parseTree(MetadataJson.write(m))
    n.get("snapshots").get(0).toString
  }

  /** Sort order per the spec's `sort-orders` shape (reference
    * `spec/metadata.go:16-52`): order id plus (transform, source-id,
    * direction, null-order) per field — the same fields
    * `MetadataJson.sortOrderNode` persists locally, so a REST server
    * round-trips exactly what the local catalog applies. */
  private def sortOrderJson(o: SortOrder): String = {
    val fields = o.fields.map { f =>
      s"""{"transform": ${jstr(f.transform.name)},
         |"source-id": ${f.sourceId},
         |"direction": "${f.direction.name}",
         |"null-order": "${f.nullOrder.name}"}""".stripMargin
    }.mkString(",")
    s"""{"order-id": ${o.orderId}, "fields": [$fields]}"""
  }

  private def specJson(s: PartitionSpec): String = {
    val fields = s.fields.map { f =>
      s"""{"source-id": ${f.sourceId}, "field-id": ${f.fieldId},
         |"name": "${f.name}", "transform": "${f.transform.name}"}"""
        .stripMargin
    }.mkString(",")
    s"""{"spec-id": ${s.specId}, "fields": [$fields]}"""
  }
}
