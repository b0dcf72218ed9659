package graft.table

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.SparkTestSession
import graft.catalog._
import graft.io.HadoopFileIO
import graft.spec._

/** Changelog (CDC) semantics: for EVERY commit kind the invariant
  *   state(parent) ++ inserts(s) \ deletes(s) == state(s)
  * must hold as a multiset — that is the definition of a changelog. */
class ChangelogSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def freshTable(name: String): Table = {
    val dir = Files.createTempDirectory("graft-cdc-").toString
    val cat = new LocalCatalog(dir)
    cat.createNamespace(Seq("db"))
    Table.create(cat, TableIdentifier(Seq("db"), name),
      Fixtures4.usersSchema, io = new HadoopFileIO())
  }

  private def usersDf(ids: Range): DataFrame = {
    import spark.implicits._
    ids.map(i => (i.toLong, s"user_$i",
      if (i % 2 == 1) null else s"u$i@x.com",
      new java.sql.Timestamp(1704067200000L + i * 1000L)))
      .toDF("id", "name", "email", "created_at")
  }

  private def state(t: Table, sid: Long): DataFrame =
    Scan(t, spark).useSnapshot(sid).toDF

  private def sorted(df: DataFrame): Seq[Row] =
    df.orderBy(df.columns.map(col): _*).collect().toSeq

  /** Replays the changelog commit by commit and checks each
    * intermediate state against a real time-travel scan. */
  private def assertReplays(t: Table, chain: Seq[Long]): DataFrame = {
    val changes = Changelog.between(t, spark, chain.head, chain.last)
    val meta = Seq(Changelog.ChangeType, Changelog.ChangeOrdinal,
      Changelog.CommitSnapshotId)
    chain.tail.zipWithIndex.foreach { case (sid, ordinal) =>
      val delta = changes.where(col(Changelog.ChangeOrdinal) === ordinal)
      assert(delta.where(
        col(Changelog.CommitSnapshotId) =!= sid).isEmpty,
        s"ordinal $ordinal must carry snapshot $sid")
      val ins = delta.where(col(Changelog.ChangeType) === "INSERT")
        .drop(meta: _*)
      val del = delta.where(col(Changelog.ChangeType) === "DELETE")
        .drop(meta: _*)
      val replayed = state(t, chain(ordinal))
        .unionAll(ins).exceptAll(del)
      assert(sorted(replayed) == sorted(state(t, sid)),
        s"replaying ordinal $ordinal must reproduce snapshot $sid")
    }
    changes
  }

  test("append / CoW delete / MoR position delete / equality delete") {
    var t = freshTable("kinds")
    t = TableOps.append(t, usersDf(1 to 10).coalesce(1))
    val s0 = t.currentSnapshot.get.snapshotId
    t = TableOps.append(t, usersDf(11 to 20).coalesce(1))       // INSERT
    t = t.newDelete(spark).where(Col("id").between(15L, 17L))
      .execute()                                                 // CoW
    t = Mutations.deleteMoR(t, spark, Col("id").eqTo(3L))        // MoR pos
    t = Mutations.deleteByKeys(t, spark, {                       // MoR eq
      import spark.implicits._
      Seq(8L, 19L).toDF("id")
    })
    t = TableOps.append(t, usersDf(21 to 25))                    // INSERT
    val changes = assertReplays(t, lineage(t, s0))

    // spot semantics: the CoW delete (ordinal 1) emits DELETEs for all
    // rows of the rewritten file and INSERTs for the survivors
    val ord1 = changes.where(col(Changelog.ChangeOrdinal) === 1)
    val deleted1 = ord1.where(col(Changelog.ChangeType) === "DELETE")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(Set(15L, 16L, 17L).subsetOf(deleted1))
    // MoR position delete (ordinal 2) emits EXACTLY the killed row
    val ord2 = changes.where(col(Changelog.ChangeOrdinal) === 2)
    assert(ord2.select("id", Changelog.ChangeType).collect().toSet ==
      Set(Row(3L, "DELETE")))
    // MoR equality delete (ordinal 3) emits exactly the two killed rows
    val ord3 = changes.where(col(Changelog.ChangeOrdinal) === 3)
    assert(ord3.select("id", Changelog.ChangeType).collect().map(r =>
      (r.getLong(0), r.getString(1))).toSet ==
      Set((8L, "DELETE"), (19L, "DELETE")))
  }

  test("replace (compaction) snapshots contribute no changes") {
    var t = freshTable("compact")
    t = TableOps.append(t, usersDf(1 to 5).coalesce(1))
    val s0 = t.currentSnapshot.get.snapshotId
    t = TableOps.append(t, usersDf(6 to 10).coalesce(1))
    t = Maintenance.compactDataFiles(t, spark,
      targetFileSizeBytes = 512L * 1024 * 1024)
    assert(t.currentSnapshot.get.summary.get.operation == Operation.Replace)
    t = TableOps.append(t, usersDf(11 to 12))
    val changes = Changelog.between(t, spark, s0,
      t.currentSnapshot.get.snapshotId)
    // only the two appends show; the replace is silent
    assert(changes.where(col(Changelog.ChangeType) === "DELETE").isEmpty)
    assert(changes.select("id").collect().map(_.getLong(0)).toSet ==
      ((6 to 12).map(_.toLong)).toSet)
    assertReplays(t, lineage(t, s0))
  }

  test("update emits DELETE of old rows and INSERT of new rows") {
    var t = freshTable("upd")
    t = TableOps.append(t, usersDf(1 to 6).coalesce(1))
    val s0 = t.currentSnapshot.get.snapshotId
    t = Mutations.update(t, spark, Col("id").eqTo(4L),
      Map("name" -> "renamed"))
    val changes = assertReplays(t, lineage(t, s0))
    val byType = changes.select("id", "name", Changelog.ChangeType)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(byType.count(x => x._1 == 4L && x._2 == "renamed" &&
      x._3 == "INSERT") == 1)
    assert(byType.count(x => x._1 == 4L && x._2 == "user_4" &&
      x._3 == "DELETE") == 1)
  }

  test("netChanges collapses insert-then-delete and keeps net effect") {
    var t = freshTable("net")
    t = TableOps.append(t, usersDf(1 to 4).coalesce(1))
    val s0 = t.currentSnapshot.get.snapshotId
    t = TableOps.append(t, usersDf(5 to 8).coalesce(1))
    t = Mutations.deleteMoR(t, spark, Col("id").eqTo(6L)) // added then gone
    val net = Changelog.netChanges(Changelog.between(t, spark, s0,
      t.currentSnapshot.get.snapshotId))
    val rows = net.select("id", Changelog.ChangeType).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(rows == Set((5L, "INSERT"), (7L, "INSERT"), (8L, "INSERT")),
      s"net=$rows")
  }

  test("removeCarryovers + withUpdates turn CoW churn into UPDATE pairs") {
    var t = freshTable("upd2")
    t = TableOps.append(t, usersDf(1 to 6).coalesce(1))
    val s0 = t.currentSnapshot.get.snapshotId
    t = Mutations.update(t, spark, Col("id").eqTo(4L),
      Map("name" -> "renamed"))
    val raw = Changelog.between(t, spark, s0,
      t.currentSnapshot.get.snapshotId)
    // the rewrite emits all 6 rows as DELETE + 6 as INSERT...
    assert(raw.count() == 12)
    // ...but only id=4 actually changed
    val clean = Changelog.removeCarryovers(raw)
    assert(clean.count() == 2, "carry-overs must vanish")
    val updates = Changelog.withUpdates(clean, Seq("id"))
      .select("id", "name", Changelog.ChangeType).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(updates == Set(
      (4L, "user_4", Changelog.UpdateBefore),
      (4L, "renamed", Changelog.UpdateAfter)), s"got $updates")
  }

  test("withUpdates leaves unpaired inserts and deletes untouched") {
    var t = freshTable("upd3")
    t = TableOps.append(t, usersDf(1 to 4).coalesce(1))
    val s0 = t.currentSnapshot.get.snapshotId
    t = TableOps.append(t, usersDf(5 to 6).coalesce(1))   // pure insert
    t = Mutations.deleteMoR(t, spark, Col("id").eqTo(2L)) // pure delete
    val out = Changelog.withUpdates(
      Changelog.removeCarryovers(Changelog.between(t, spark, s0,
        t.currentSnapshot.get.snapshotId)), Seq("id"))
      .select("id", Changelog.ChangeType).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(out == Set((5L, "INSERT"), (6L, "INSERT"), (2L, "DELETE")),
      s"got $out")
  }

  test("withUpdates tolerates unorderable (map) data columns") {
    import spark.implicits._
    // a MapType column cannot appear in ORDER BY — the pairing window
    // must skip it instead of throwing AnalysisException
    val df = Seq(
      (1L, Map("a" -> 1), "x1", Changelog.Delete),
      (1L, Map("a" -> 2), "x2", Changelog.Insert))
      .toDF("id", "m", "name", Changelog.ChangeType)
      .withColumn(Changelog.ChangeOrdinal, lit(0))
      .withColumn(Changelog.CommitSnapshotId, lit(1L))
    val out = Changelog.withUpdates(df, Seq("id"))
      .select(Changelog.ChangeType).collect().map(_.getString(0)).toSet
    assert(out == Set(Changelog.UpdateBefore, Changelog.UpdateAfter),
      s"map-typed table must still pair, got $out")
  }

  test("rows differing ONLY in a map column still pair deterministically") {
    import spark.implicits._
    // all orderable columns equal across the sides — the tiebreaker
    // must fall back to the map surrogate (xxhash64 of key-sorted
    // entries), not silently to shuffle order
    def changes(rows: Seq[(Long, Map[String, Int], String)]) =
      rows.toDF("id", "m", Changelog.ChangeType)
        .withColumn(Changelog.ChangeOrdinal, lit(0))
        .withColumn(Changelog.CommitSnapshotId, lit(1L))
    val rows = Seq(
      (1L, Map("a" -> 2), Changelog.Delete),
      (1L, Map("a" -> 1), Changelog.Delete),
      (1L, Map("b" -> 9), Changelog.Insert))
    def run(df: DataFrame) =
      Changelog.withUpdates(df, Seq("id"))
        .select("m", Changelog.ChangeType).collect()
        .map(r => (r.getAs[scala.collection.Map[String, Int]]("m").toMap,
          r.getString(1))).toSet
    val out1 = run(changes(rows).repartition(4))
    val out2 = run(changes(rows.reverse).repartition(7))
    assert(out1 == out2,
      s"map-only difference must pair deterministically: $out1 vs $out2")
    assert(out1.count(_._2 == Changelog.UpdateBefore) == 1 &&
      out1.count(_._2 == Changelog.UpdateAfter) == 1 &&
      out1.count(_._2 == Changelog.Delete) == 1, s"got $out1")
  }

  test("NESTED maps reordered-but-equal get one surrogate; distinct " +
      "nested maps pair deterministically") {
    import spark.implicits._
    // surrogate equality: a map nested inside a struct, physically
    // reordered, must canonicalize to the same hash at every level
    val dt = org.apache.spark.sql.types.StructType.fromDDL(
      "p STRUCT<tags: MAP<STRING, MAP<STRING, INT>>>").head.dataType
    def hashOf(m: String): Long =
      spark.sql(s"SELECT named_struct('tags', $m) AS p")
        .select(xxhash64(to_json(struct(
          Changelog.canonicalized(col("p"), dt)))).as("h"))
        .head.getLong(0)
    val fwd = hashOf(
      "map('x', map('a', 1, 'b', 2), 'y', map('c', 3))")
    val rev = hashOf(
      "map('y', map('c', 3), 'x', map('b', 2, 'a', 1))")
    val other = hashOf(
      "map('x', map('a', 1, 'b', 99), 'y', map('c', 3))")
    assert(fwd == rev,
      "physically reordered equal nested maps must hash identically")
    assert(fwd != other, "distinct nested maps must (generically) differ")

    // end-to-end: rows whose ONLY difference is a nested map pair the
    // same way regardless of physical entry order and shuffle layout
    def changes(rows: Seq[(Long, Map[String, Map[String, Int]], String)]) =
      rows.toDF("id", "m", Changelog.ChangeType)
        .withColumn(Changelog.ChangeOrdinal, lit(0))
        .withColumn(Changelog.CommitSnapshotId, lit(1L))
    val rows = Seq(
      (1L, Map("k" -> Map("a" -> 1, "b" -> 2)), Changelog.Delete),
      (1L, Map("k" -> Map("a" -> 1, "b" -> 3)), Changelog.Delete),
      (1L, Map("k" -> Map("z" -> 9)), Changelog.Insert))
    def run(df: DataFrame) =
      Changelog.withUpdates(df, Seq("id"))
        .select("m", Changelog.ChangeType).collect()
        .map(r => (r.getAs[scala.collection.Map[String,
          scala.collection.Map[String, Int]]]("m")
          .map { case (k, v) => k -> v.toMap }.toMap,
          r.getString(1))).toSet
    val out1 = run(changes(rows).repartition(4))
    val out2 = run(changes(rows.reverse).repartition(7))
    assert(out1 == out2,
      s"nested-map-only difference must pair deterministically: " +
        s"$out1 vs $out2")
    assert(out1.count(_._2 == Changelog.UpdateBefore) == 1 &&
      out1.count(_._2 == Changelog.UpdateAfter) == 1 &&
      out1.count(_._2 == Changelog.Delete) == 1, s"got $out1")
  }

  test("withUpdates pairs deterministically with multiple changes per key") {
    import spark.implicits._
    // Two DELETEs + one INSERT for the same key in one commit: exactly
    // one DELETE pairs into UPDATE_BEFORE. Which one must not depend on
    // shuffle order — the window now orders by the non-identifier
    // columns, so the smaller row value ("a1") always pairs.
    def changes(rows: Seq[(Long, String, String)]) =
      rows.toDF("id", "name", Changelog.ChangeType)
        .withColumn(Changelog.ChangeOrdinal, lit(0))
        .withColumn(Changelog.CommitSnapshotId, lit(1L))
    val rows = Seq(
      (1L, "a2", Changelog.Delete),
      (1L, "a1", Changelog.Delete),
      (1L, "b9", Changelog.Insert))
    def run(df: DataFrame) =
      Changelog.withUpdates(df, Seq("id"))
        .select("name", Changelog.ChangeType).collect()
        .map(r => (r.getString(0), r.getString(1))).toSet
    val out1 = run(changes(rows).repartition(4))
    val out2 = run(changes(rows.reverse).repartition(7))
    assert(out1 == out2, s"pairing must be stable: $out1 vs $out2")
    assert(out1 == Set(
      ("a1", Changelog.UpdateBefore),
      ("b9", Changelog.UpdateAfter),
      ("a2", Changelog.Delete)), s"got $out1")
  }

  test("from == to yields empty; non-ancestor from is loud") {
    var t = freshTable("edges")
    t = TableOps.append(t, usersDf(1 to 3))
    val s0 = t.currentSnapshot.get.snapshotId
    assert(Changelog.between(t, spark, s0, s0).isEmpty)
    val e = intercept[IllegalArgumentException] {
      Changelog.between(t, spark, 12345L, s0).collect()
    }
    assert(e.getMessage.contains("not an ancestor"))
  }

  /** snapshot ids from `fromExclusive` (inclusive head, for state
    * addressing) to current, oldest→newest. */
  private def lineage(t: Table, fromExclusive: Long): Seq[Long] = {
    var chain = List.empty[Long]
    var cur = t.currentSnapshot
    while (cur.isDefined && cur.get.snapshotId != fromExclusive) {
      chain = cur.get.snapshotId :: chain
      cur = cur.get.parentSnapshotId.flatMap(t.snapshotById)
    }
    fromExclusive :: chain
  }
}
