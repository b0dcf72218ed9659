package graft.table

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame

import graft.SparkTestSession
import graft.catalog._
import graft.io.HadoopFileIO
import graft.spec._

/** Branch writes / write-audit-publish (round-9 verdict #3): data
  * commits on `forBranch(name)` advance that ref only; main (and the
  * snapshot log, which follows main) is untouched until a fast-forward
  * publish via `setRef("main", branchHead)`. The reference always
  * commits to main (`table/table.go:179-183`). */
class BranchSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val schema = Schema(0, Seq(
    NestedField(1, "id", LongType, required = true),
    NestedField(2, "v", DoubleType, required = true)))

  private def freshTable(name: String): Table = {
    val dir = Files.createTempDirectory("graft-branch-").toString
    val cat = new LocalCatalog(dir)
    cat.createNamespace(Seq("db"))
    Table.create(cat, TableIdentifier(Seq("db"), name),
      schema, io = new HadoopFileIO())
  }

  private def df(ids: Range): DataFrame = {
    import spark.implicits._
    ids.map(i => (i.toLong, i * 1.0)).toDF("id", "v")
  }

  private def ids(t: Table): Set[Long] =
    Scan(t, spark).toDF.select("id").collect().map(_.getLong(0)).toSet

  test("branch append advances the branch only; main is untouched") {
    var t = freshTable("wap1")
    t = TableOps.append(t, df(1 to 10))
    val mainHead = t.currentSnapshot.get.snapshotId

    var audit = t.forBranch("audit")
    audit = TableOps.append(audit, df(11 to 20))

    assert(ids(audit) == (1L to 20L).toSet,
      "branch scan sees fork content + branch write")
    val fresh = t.refresh()
    assert(fresh.currentSnapshot.get.snapshotId == mainHead,
      "main head must not move on a branch commit")
    assert(ids(fresh) == (1L to 10L).toSet, "main content untouched")
    val ref = fresh.metadata.ref("audit")
    assert(ref.exists(_.snapshotId == audit.currentSnapshot.get.snapshotId))
    // the snapshot log follows main
    assert(fresh.history.map(_.snapshotId) == Seq(mainHead))
  }

  test("a new branch forks from the handle's current state") {
    var t = freshTable("wap2")
    t = TableOps.append(t, df(1 to 5))
    var b = t.forBranch("exp")
    b = TableOps.append(b, df(6 to 8))
    // a later main append is NOT visible on the branch
    t = TableOps.append(t.refresh(), df(100 to 101))
    assert(ids(b.refresh()) == (1L to 8L).toSet,
      "branch lineage must not pick up post-fork main commits")
    assert(ids(t) == ((1L to 5L) ++ (100L to 101L)).toSet)
    // parent chain: branch head's parent is the fork snapshot
    val forkSnap = b.refresh().currentSnapshot.get
    assert(forkSnap.parentSnapshotId.contains(
      t.metadata.snapshotLog.head.snapshotId))
  }

  test("chained branch writes, mutations included, stay on the branch") {
    var t = freshTable("wap3")
    t = TableOps.append(t, df(1 to 10))
    var b = t.forBranch("audit")
    b = TableOps.append(b, df(11 to 20))
    b = b.newDelete(spark).where(Col("id").between(3L, 5L)).execute()
    b = Mutations.deleteMoR(b, spark, Col("id").eqTo(15L))
    assert(ids(b) == (1L to 20L).toSet -- Set(3L, 4L, 5L, 15L))
    assert(ids(t.refresh()) == (1L to 10L).toSet,
      "CoW + MoR deletes on the branch must not touch main")
    assert(b.writeBranch == "audit", "mutations keep the branch handle")
  }

  test("fast-forward publish: setRef moves main to the branch head") {
    var t = freshTable("wap4")
    t = TableOps.append(t, df(1 to 10))
    var b = t.forBranch("audit")
    b = TableOps.append(b, df(11 to 20))
    val head = b.currentSnapshot.get.snapshotId
    val published = t.refresh().newTransaction()
      .setRef("main", head).commit()
    assert(published.currentSnapshot.get.snapshotId == head)
    assert(ids(published) == (1L to 20L).toSet,
      "published main serves the audited branch content")
  }

  test("branch and main commits interleave without clobbering each other") {
    var t = freshTable("wap5")
    t = TableOps.append(t, df(1 to 5))
    var b = t.forBranch("audit")
    // main moves AFTER the branch handle was taken: the branch commit's
    // CAS loses, retries on refreshed metadata, and must still land on
    // the branch without absorbing or clobbering the main commit
    t = TableOps.append(t.refresh(), df(50 to 55))
    b = TableOps.append(b, df(6 to 9))
    val fresh = t.refresh()
    assert(ids(fresh) == ((1L to 5L) ++ (50L to 55L)).toSet)
    assert(ids(b.refresh()) == (1L to 9L).toSet)
  }

  test("tags are immutable: forBranch on a tag is rejected") {
    var t = freshTable("wap10")
    t = TableOps.append(t, df(1 to 3))
    t = t.newTransaction()
      .setRef("v1", t.currentSnapshot.get.snapshotId, "tag").commit()
    val e = intercept[IllegalArgumentException] { t.forBranch("v1") }
    assert(e.getMessage.contains("tag"))
    // and the metadata-level last line of defense
    val e2 = intercept[IllegalStateException] {
      t.metadata.withSnapshot(t.currentSnapshot.get, "v1")
    }
    assert(e2.getMessage.contains("immutable"))
  }

  test("parallel appends to one branch all land via CAS retry") {
    var t = freshTable("wap11")
    t = TableOps.append(t, df(1 to 5))
    var b = t.forBranch("audit")
    b = TableOps.append(b, df(6 to 9)) // create the ref up front
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    val futs = (0 until 4).map { i =>
      Future {
        val rows = df((100 + i * 10) to (100 + i * 10 + 4))
        var done = false
        while (!done) {
          // commitSnapshot retries internally; under 4-way contention it
          // can still exhaust its budget — the caller re-plans, exactly
          // like a real writer would
          try { TableOps.append(b.refresh(), rows); done = true }
          catch { case _: graft.catalog.CommitFailedException => }
        }
      }
    }
    Await.result(Future.sequence(futs), 120.seconds)
    pool.shutdown()
    val expected = (1L to 9L).toSet ++
      (0 until 4).flatMap(i => (100L + i * 10) to (100L + i * 10 + 4))
    assert(ids(b.refresh()) == expected,
      "every contending branch append must land exactly once")
    assert(ids(t.refresh()) == (1L to 5L).toSet, "main untouched")
  }

  test("changelog spans branch lineage from the fork point") {
    var t = freshTable("wap7")
    t = TableOps.append(t, df(1 to 3))
    val fork = t.currentSnapshot.get.snapshotId
    var b = t.forBranch("audit")
    b = TableOps.append(b, df(4 to 6))
    b = TableOps.append(b, df(7 to 9))
    val changes = Changelog.between(b, spark, fork,
      b.currentSnapshot.get.snapshotId)
      .select("id", Changelog.ChangeType).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(changes == (4L to 9L).map((_, Changelog.Insert)).toSet,
      s"branch commits must appear as changelog INSERTs, got $changes")
  }

  test("snapshot expiry keeps a live branch readable") {
    var t = freshTable("wap8")
    t = TableOps.append(t, df(1 to 3))
    var b = t.forBranch("audit")
    b = TableOps.append(b, df(4 to 6))
    t = TableOps.append(t.refresh(), df(10 to 12))
    // expire everything age-eligible: the branch ref must pin its head
    // (and with it every data file its manifest list references)
    val cleaned = Maintenance.expireSnapshots(t.refresh(),
      olderThanMs = System.currentTimeMillis() + 60000)
    assert(ids(cleaned.forBranch("audit")) == (1L to 6L).toSet,
      "ref-pinned branch head must stay fully readable after expiry")
    assert(ids(cleaned) == ((1L to 3L) ++ (10L to 12L)).toSet)
  }

  test("reads by ref name resolve the branch (VERSION AS OF parity)") {
    var t = freshTable("wap6")
    t = TableOps.append(t, df(1 to 5))
    var b = t.forBranch("audit")
    b = TableOps.append(b, df(6 to 9))
    val scanByRef = Scan(t.refresh(), spark).useRef("audit").toDF
      .select("id").collect().map(_.getLong(0)).toSet
    assert(scanByRef == (1L to 9L).toSet)
  }
}
