package graft.sources

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.catalog.{LocalCatalog, TableIdentifier}
import graft.io.HadoopFileIO
import graft.table.Table

/** INSERT OVERWRITE by filter, ALTER TABLE column evolution, and CALL
  * procedures through the CatalogPlugin. */
class SqlSurfaceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def withCatalog(tag: String)(f: (String, String) => Unit): Unit = {
    val dir = Files.createTempDirectory(s"graft-ss-$tag-").toString
    val name = s"gss$tag"
    spark.conf.set(s"spark.sql.catalog.$name",
      classOf[GraftSparkCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.warehouse", dir)
    f(name, dir)
  }

  private def loadT(dir: String, tbl: String): Table =
    Table.load(new LocalCatalog(dir), TableIdentifier(Seq("db"), tbl),
      new HadoopFileIO())

  test("INSERT OVERWRITE with a static partition filter is selective") {
    withCatalog("ovw") { (c, dir) =>
      spark.sql(s"CREATE NAMESPACE $c.db")
      spark.sql(s"CREATE TABLE $c.db.t (id BIGINT, cat STRING, v DOUBLE) " +
        "PARTITIONED BY (cat)")
      spark.sql(s"INSERT INTO $c.db.t VALUES " +
        "(1, 'a', 1.0), (2, 'a', 2.0), (3, 'b', 3.0)")
      // replace ONLY partition a; b untouched
      spark.sql(s"INSERT OVERWRITE $c.db.t PARTITION (cat = 'a') " +
        "SELECT id, v FROM VALUES (10L, 10.0) AS x(id, v)")
      val got = spark.sql(s"SELECT id, cat, v FROM $c.db.t ORDER BY id")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      assert(got.toSeq == Seq((3L, "b", 3.0), (10L, "a", 10.0)),
        s"selective overwrite, got ${got.toSeq}")
      // one atomic overwrite snapshot
      assert(loadT(dir, "t").metadata.snapshots.size == 2)
    }
  }

  test("ALTER TABLE rename, drop, widen type, drop NOT NULL") {
    withCatalog("alt") { (c, dir) =>
      spark.sql(s"CREATE NAMESPACE $c.db")
      spark.sql(s"CREATE TABLE $c.db.t " +
        "(id INT NOT NULL, v DOUBLE, dead STRING)")
      spark.sql(s"INSERT INTO $c.db.t VALUES (1, 1.0, 'x')")
      spark.sql(s"ALTER TABLE $c.db.t RENAME COLUMN v TO score")
      spark.sql(s"ALTER TABLE $c.db.t DROP COLUMN dead")
      spark.sql(s"ALTER TABLE $c.db.t ALTER COLUMN id TYPE BIGINT")
      spark.sql(s"ALTER TABLE $c.db.t ALTER COLUMN id DROP NOT NULL")

      val t = loadT(dir, "t")
      assert(t.schema.fields.map(_.name).toSeq == Seq("id", "score"))
      assert(t.schema.fieldByName("id").exists(f =>
        f.fieldType == graft.spec.LongType && !f.required))
      // old data reads through the evolved schema (field-id remap)
      val got = spark.sql(s"SELECT id, score FROM $c.db.t").collect()
      assert(got.head.getLong(0) == 1L && got.head.getDouble(1) == 1.0)
      // and new inserts land with the new shape
      spark.sql(s"INSERT INTO $c.db.t VALUES (CAST(2 AS BIGINT), 2.0)")
      assert(spark.sql(s"SELECT count(*) FROM $c.db.t")
        .collect().head.getLong(0) == 2)
    }
  }

  test("CALL system.rollback_to_snapshot and set_ref/remove_ref") {
    withCatalog("roll") { (c, dir) =>
      spark.sql(s"CREATE NAMESPACE $c.db")
      spark.sql(s"CREATE TABLE $c.db.t (id BIGINT)")
      spark.sql(s"INSERT INTO $c.db.t VALUES (1)")
      val sid1 = loadT(dir, "t").currentSnapshot.get.snapshotId
      spark.sql(s"INSERT INTO $c.db.t VALUES (2)")
      assert(spark.sql(s"SELECT count(*) FROM $c.db.t")
        .collect().head.getLong(0) == 2)

      val res = spark.sql(
        s"CALL $c.system.rollback_to_snapshot('db', 't', $sid1)")
        .collect()
      assert(res.head.getLong(0) == sid1)
      assert(spark.sql(s"SELECT count(*) FROM $c.db.t")
        .collect().head.getLong(0) == 1, "rolled back to snapshot 1")

      spark.sql(s"CALL $c.system.set_ref('db', 't', 'v1', $sid1, 'tag')")
      val refs = spark.sql(s"SELECT name, type FROM $c.db.t.refs")
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      assert(refs("v1") == "tag")
      spark.sql(s"CALL $c.system.remove_ref('db', 't', 'v1')")
      assert(!spark.sql(s"SELECT name FROM $c.db.t.refs").collect()
        .map(_.getString(0)).contains("v1"))
    }
  }

  test("CALL system.fast_forward publishes a branch; refuses divergence") {
    withCatalog("ffw") { (c, dir) =>
      spark.sql(s"CREATE NAMESPACE $c.db")
      spark.sql(s"CREATE TABLE $c.db.t (id BIGINT)")
      spark.sql(s"INSERT INTO $c.db.t VALUES (1)")
      // branch off main and add audited rows via the Table API
      var b = loadT(dir, "t").forBranch("audit")
      import spark.implicits._
      b = graft.table.TableOps.append(b, Seq(2L, 3L).toDF("id"))
      // main is still the pre-branch content
      assert(spark.sql(s"SELECT count(*) FROM $c.db.t")
        .collect().head.getLong(0) == 1)
      val res = spark.sql(
        s"CALL $c.system.fast_forward('db', 't', 'main', 'audit')")
        .collect().head
      assert(res.getString(0) == "main" &&
        res.getLong(2) == b.currentSnapshot.get.snapshotId)
      assert(spark.sql(s"SELECT sum(id) FROM $c.db.t")
        .collect().head.getLong(0) == 6, "published main serves 1+2+3")
      // diverge: a fresh main commit makes main no ancestor of audit
      spark.sql(s"INSERT INTO $c.db.t VALUES (100)")
      val e = intercept[Exception] {
        spark.sql(s"CALL $c.system.fast_forward('db', 't', 'main', 'audit')")
      }
      val msgs = Iterator.iterate(e: Throwable)(_.getCause)
        .takeWhile(_ != null).map(m => Option(m.getMessage).getOrElse(""))
        .mkString(" | ")
      assert(msgs.contains("not a fast-forward"),
        s"diverged publish must fail loud, got: $msgs")
    }
  }

  test("CALL system.expire_snapshots and compact") {
    withCatalog("mx") { (c, dir) =>
      spark.sql(s"CREATE NAMESPACE $c.db")
      spark.sql(s"CREATE TABLE $c.db.t (id BIGINT)")
      (1 to 4).foreach(i =>
        spark.sql(s"INSERT INTO $c.db.t VALUES ($i)"))
      assert(loadT(dir, "t").metadata.snapshots.size == 4)

      val compacted = spark.sql(
        s"CALL $c.system.compact('db', 't')").collect().head
      assert(compacted.getInt(0) >= compacted.getInt(1),
        s"files_before ${compacted.getInt(0)} >= after " +
          s"${compacted.getInt(1)}")

      val expired = spark.sql(
        s"CALL $c.system.expire_snapshots('db', 't', " +
          s"${Long.MaxValue}, 1)").collect().head.getInt(0)
      assert(expired >= 3, s"expired $expired snapshots")
      assert(spark.sql(s"SELECT id FROM $c.db.t ORDER BY id").collect()
        .map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 4L),
        "data intact after maintenance")
    }
  }

  test("CALL system.add_files imports external parquet in place") {
    withCatalog("af") { (c, dir) =>
      import spark.implicits._
      spark.sql(s"CREATE NAMESPACE $c.db")
      spark.sql(s"CREATE TABLE $c.db.t (id BIGINT, name STRING)")
      val ext = Files.createTempDirectory("graft-af-sql-").toString
      (1 to 6).map(i => (i.toLong, s"n$i")).toDF("id", "name")
        .coalesce(1).write.mode("overwrite").parquet(ext)
      val parts = new java.io.File(ext).listFiles()
        .filter(_.getName.endsWith(".parquet"))
        .map(_.getAbsolutePath).mkString(",")
      val res = spark.sql(
        s"CALL $c.system.add_files('db', 't', '$parts')").collect().head
      assert(res.getLong(0) == 1L && res.getLong(1) == 6L,
        s"(files, records) = (${res.getLong(0)}, ${res.getLong(1)})")
      assert(spark.sql(s"SELECT id FROM $c.db.t ORDER BY id").collect()
        .map(_.getLong(0)).toSeq == (1L to 6L))
      // duplicate import rejected through the SQL face too
      val e = intercept[Exception] {
        spark.sql(s"CALL $c.system.add_files('db', 't', '$parts')")
      }
      val msgs = Iterator.iterate(e: Throwable)(_.getCause)
        .takeWhile(_ != null).map(m => Option(m.getMessage).getOrElse(""))
        .mkString(" | ")
      assert(msgs.contains("already referenced"))
    }
  }

  test("CALL system.add_files expands a directory arg to its parquet " +
      "children and reports committed entries") {
    withCatalog("afd") { (c, dir) =>
      import spark.implicits._
      spark.sql(s"CREATE NAMESPACE $c.db")
      spark.sql(s"CREATE TABLE $c.db.t (id BIGINT, name STRING)")
      val ext = Files.createTempDirectory("graft-afd-sql-").toString
      (1 to 8).map(i => (i.toLong, s"n$i")).toDF("id", "name")
        .repartition(2).write.mode("overwrite").parquet(ext)
      // pass the DIRECTORY: no comma-joining of child paths needed
      val res = spark.sql(
        s"CALL $c.system.add_files('db', 't', '$ext')").collect().head
      assert(res.getLong(0) == 2L && res.getLong(1) == 8L,
        s"(files, records) = (${res.getLong(0)}, ${res.getLong(1)})")
      assert(spark.sql(s"SELECT id FROM $c.db.t ORDER BY id").collect()
        .map(_.getLong(0)).toSeq == (1L to 8L))
    }
  }

  test("CALL system.dedup_table rewrites the table keeping canonical " +
      "docs; time travel still sees the pre-dedup snapshot") {
    withCatalog("dd") { (c, _) =>
      import spark.implicits._
      spark.sql(s"CREATE NAMESPACE $c.db")
      spark.sql(s"CREATE TABLE $c.db.docs (doc_id BIGINT, text STRING)")
      Seq((1L, "alpha beta gamma"), (2L, "alpha  BETA gamma"),
        (3L, "unique text here"), (4L, "alpha beta gamma"))
        .toDF("doc_id", "text").createOrReplaceTempView("dd_src")
      spark.sql(s"INSERT INTO $c.db.docs SELECT * FROM dd_src")
      val res = spark.sql(
        s"CALL $c.system.dedup_table('db', 'docs')").collect().head
      assert((res.getLong(0), res.getLong(1), res.getLong(2)) ==
        ((4L, 2L, 2L)), s"report $res")
      // docs 2 and 4 normalize to doc 1's text -> min id 1 kept
      assert(spark.sql(s"SELECT doc_id FROM $c.db.docs ORDER BY doc_id")
        .collect().map(_.getLong(0)).toSeq == Seq(1L, 3L))
      // the pre-dedup snapshot is still reachable via time travel
      val versions = spark.sql(s"SELECT snapshot_id FROM " +
        s"$c.db.docs.snapshots ORDER BY committed_at").collect()
      val preDedup = versions(versions.length - 2).getLong(0)
      assert(spark.sql(s"SELECT count(*) FROM $c.db.docs " +
        s"VERSION AS OF $preDedup").head.getLong(0) == 4L)
      // minhash mode on the already-deduped table removes nothing
      val res2 = spark.sql(s"CALL $c.system.dedup_table('db', 'docs', " +
        s"'minhash')").collect().head
      assert(res2.getLong(2) == 0L, s"minhash pass report $res2")
      // unknown mode fails loud
      val e = intercept[Exception] {
        spark.sql(s"CALL $c.system.dedup_table('db', 'docs', 'fuzzy')")
      }
      val msgs = Iterator.iterate(e: Throwable)(_.getCause)
        .takeWhile(_ != null).map(m => Option(m.getMessage).getOrElse(""))
        .mkString(" | ")
      assert(msgs.contains("unknown mode"))
    }
  }

  test("CALL system.dedup_table since_snapshot_id dedups ONLY the new " +
      "batch vs the canonical base; base files untouched") {
    withCatalog("ddi") { (c, _) =>
      import spark.implicits._
      spark.sql(s"CREATE NAMESPACE $c.db")
      spark.sql(s"CREATE TABLE $c.db.docs (doc_id BIGINT, text STRING)")
      // NOTE: base itself contains an exact dup pair (1, 2) — the
      // canonical base is NEVER touched by an incremental pass
      Seq((1L, "alpha beta gamma"), (2L, "alpha beta gamma"),
        (3L, "unique text here")).toDF("doc_id", "text")
        .createOrReplaceTempView("ddi_base")
      spark.sql(s"INSERT INTO $c.db.docs SELECT * FROM ddi_base")
      val since = spark.sql(s"SELECT snapshot_id FROM " +
        s"$c.db.docs.snapshots").head.getLong(0)
      Seq((10L, "alpha beta gamma"), // dup of base -> removed
        (11L, "fresh new words"), (12L, "fresh  NEW words"), // 11 wins
        (13L, null.asInstanceOf[String])) // NULL text -> kept
        .toDF("doc_id", "text").createOrReplaceTempView("ddi_batch")
      spark.sql(s"INSERT INTO $c.db.docs SELECT * FROM ddi_batch")
      val res = spark.sql(s"CALL $c.system.dedup_table('db', 'docs', " +
        s"'exact', 'text', 'doc_id', 0.8, '', $since)").collect().head
      assert((res.getLong(0), res.getLong(1), res.getLong(2)) ==
        ((7L, 5L, 2L)), s"report $res")
      // base dups 1/2 both SURVIVE (canonical); batch dups removed
      assert(spark.sql(s"SELECT doc_id FROM $c.db.docs ORDER BY doc_id")
        .collect().map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 11L, 13L))
      // the base snapshot still reads in full via time travel
      assert(spark.sql(s"SELECT count(*) FROM $c.db.docs " +
        s"VERSION AS OF $since").head.getLong(0) == 3L)
      // a second incremental pass from the NEW head removes nothing
      // (head = the snapshot that is nobody's parent — ids are random,
      // commit timestamps can tie, so neither orders reliably)
      val snaps = spark.sql(s"SELECT snapshot_id, parent_id FROM " +
        s"$c.db.docs.snapshots").collect()
        .map(r => r.getLong(0) -> Option(r.get(1)).map(_ => r.getLong(1)))
      val parents = snaps.flatMap(_._2).toSet
      val head = snaps.map(_._1).filterNot(parents).head
      val res2 = spark.sql(s"CALL $c.system.dedup_table('db', 'docs', " +
        s"'exact', 'text', 'doc_id', 0.8, '', $head)").collect().head
      assert(res2.getLong(2) == 0L, s"clean pass report $res2")
      // unknown since id fails loud
      val e = intercept[Exception] {
        spark.sql(s"CALL $c.system.dedup_table('db', 'docs', " +
          s"'exact', 'text', 'doc_id', 0.8, '', 424242)")
      }
      val msgs = Iterator.iterate(e: Throwable)(_.getCause)
        .takeWhile(_ != null).map(m => Option(m.getMessage).getOrElse(""))
        .mkString(" | ")
      assert(msgs.contains("not found"))
    }
  }

  test("CALL system.build_dedup_index + dedup_table(index_table) " +
      "dedups batches against the index and chains day over day") {
    withCatalog("ddx") { (c, dir) =>
      import spark.implicits._
      spark.sql(s"CREATE NAMESPACE $c.db")
      spark.sql(s"CREATE TABLE $c.db.docs (doc_id BIGINT, text STRING)")
      Seq((1L, "alpha beta gamma"), (2L, "unique text here"),
        (3L, null.asInstanceOf[String]))
        .toDF("doc_id", "text").createOrReplaceTempView("ddx_base")
      spark.sql(s"INSERT INTO $c.db.docs SELECT * FROM ddx_base")
      val idx = spark.sql(s"CALL $c.system.build_dedup_index(" +
        s"'db', 'docs', num_hashes => 32)").collect().head
      assert(idx.getString(0) == "docs_minhash_idx")
      assert(idx.getLong(1) == 2L, s"NULL text not indexed: $idx") // NULL text excluded
      val since = idx.getLong(2)
      // index content: fp + sig per non-NULL-text doc
      val irows = spark.sql(s"SELECT doc_id, fp, hs, sig FROM " +
        s"$c.db.docs_minhash_idx ORDER BY doc_id").collect()
      assert(irows.map(_.getLong(0)).toSeq == Seq(1L, 2L))
      assert(irows.forall(r => r.getString(1).length == 32 &&
        r.getSeq[Long](3).size == 32))
      // day 1 batch: dup-of-base, fresh pair (11 wins), NULL
      Seq((10L, "alpha  BETA gamma"), (11L, "fresh new words"),
        (12L, "fresh NEW words"), (13L, null.asInstanceOf[String]))
        .toDF("doc_id", "text").createOrReplaceTempView("ddx_b1")
      spark.sql(s"INSERT INTO $c.db.docs SELECT * FROM ddx_b1")
      val r1 = spark.sql(s"CALL $c.system.dedup_table('db', 'docs', " +
        s"'exact', 'text', 'doc_id', 0.8, '', $since, " +
        s"'docs_minhash_idx')").collect().head
      assert((r1.getLong(0), r1.getLong(1), r1.getLong(2)) ==
        ((7L, 5L, 2L)), s"day-1 report $r1")
      assert(spark.sql(s"SELECT doc_id FROM $c.db.docs ORDER BY doc_id")
        .collect().map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 11L, 13L))
      // the index chained: survivor 11's signatures appended, recorded
      // snapshot advanced to the post-delete head
      assert(spark.sql(s"SELECT doc_id FROM $c.db.docs_minhash_idx " +
        s"ORDER BY doc_id").collect().map(_.getLong(0)).toSeq ==
        Seq(1L, 2L, 11L))
      val t = loadT(dir, "docs")
      val head1 = t.currentSnapshot.get.snapshotId
      assert(loadT(dir, "docs_minhash_idx").metadata.properties(
        "graft.dedup-index.source-snapshot-id") == head1.toString)
      // day 2 chains from head1 WITHOUT rebuilding: near-dup of day-1
      // survivor 11 (only in the index via the chain) is caught
      Seq((20L, "fresh new  WORDS"), (21L, "genuinely novel content"))
        .toDF("doc_id", "text").createOrReplaceTempView("ddx_b2")
      spark.sql(s"INSERT INTO $c.db.docs SELECT * FROM ddx_b2")
      val r2 = spark.sql(s"CALL $c.system.dedup_table('db', 'docs', " +
        s"'exact', 'text', 'doc_id', 0.8, '', $head1, " +
        s"'docs_minhash_idx')").collect().head
      assert(r2.getLong(2) == 1L, s"day-2 report $r2")
      assert(spark.sql(s"SELECT doc_id FROM $c.db.docs ORDER BY doc_id")
        .collect().map(_.getLong(0)).toSeq ==
        Seq(1L, 2L, 3L, 11L, 13L, 21L))
      // stale since -> loud error naming the recorded snapshot
      val e = intercept[Exception] {
        spark.sql(s"CALL $c.system.dedup_table('db', 'docs', " +
          s"'exact', 'text', 'doc_id', 0.8, '', $since, " +
          s"'docs_minhash_idx')")
      }
      val msgs = Iterator.iterate(e: Throwable)(_.getCause)
        .takeWhile(_ != null).map(m => Option(m.getMessage).getOrElse(""))
        .mkString(" | ")
      assert(msgs.contains("stale or wrong index"), msgs)
      // column mismatch -> loud error
      val head2 = loadT(dir, "docs").currentSnapshot.get.snapshotId
      val e2 = intercept[Exception] {
        spark.sql(s"CALL $c.system.dedup_table('db', 'docs', " +
          s"'exact', 'body', 'doc_id', 0.8, '', $head2, " +
          s"'docs_minhash_idx')")
      }
      val msgs2 = Iterator.iterate(e2: Throwable)(_.getCause)
        .takeWhile(_ != null).map(m => Option(m.getMessage).getOrElse(""))
        .mkString(" | ")
      assert(msgs2.contains("was built on"), msgs2)
      // missing index -> loud error
      val e3 = intercept[Exception] {
        spark.sql(s"CALL $c.system.dedup_table('db', 'docs', " +
          s"'exact', 'text', 'doc_id', 0.8, '', $head2, 'nope_idx')")
      }
      val msgs3 = Iterator.iterate(e3: Throwable)(_.getCause)
        .takeWhile(_ != null).map(m => Option(m.getMessage).getOrElse(""))
        .mkString(" | ")
      assert(msgs3.contains("build_dedup_index first"), msgs3)
    }
  }

  test("indexed dedup chain survives source maintenance: compaction " +
      "and equality-delete rewrite between batches deliver no rows") {
    withCatalog("ddm") { (c, dir) =>
      import spark.implicits._
      spark.sql(s"CREATE NAMESPACE $c.db")
      spark.sql(s"CREATE TABLE $c.db.docs (doc_id BIGINT, text STRING)")
      Seq((1L, "alpha beta gamma"), (2L, "unique text here"))
        .toDF("doc_id", "text").createOrReplaceTempView("ddm_base")
      spark.sql(s"INSERT INTO $c.db.docs SELECT * FROM ddm_base")
      val since = spark.sql(s"CALL $c.system.build_dedup_index(" +
        s"'db', 'docs', num_hashes => 32)").collect().head.getLong(2)
      Seq((10L, "ALPHA beta gamma"), (11L, "fresh new words"))
        .toDF("doc_id", "text").createOrReplaceTempView("ddm_b1")
      spark.sql(s"INSERT INTO $c.db.docs SELECT * FROM ddm_b1")
      val r1 = spark.sql(s"CALL $c.system.dedup_table('db', 'docs', " +
        s"'exact', 'text', 'doc_id', 0.8, '', $since, " +
        s"'docs_minhash_idx')").collect().head
      assert(r1.getLong(2) == 1L, s"day-1 report $r1")
      // MAINTENANCE between batches: rewrite the MoR equality deletes
      // to position deletes, then compact data files — both commit
      // Replace/Delete snapshots the incremental scan must skip
      spark.sql(s"CALL $c.system.rewrite_equality_deletes('db', 'docs')")
      spark.sql(s"CALL $c.system.compact('db', 'docs')")
      assert(spark.sql(s"SELECT doc_id FROM $c.db.docs ORDER BY doc_id")
        .collect().map(_.getLong(0)).toSeq == Seq(1L, 2L, 11L))
      // day 2 chains from the index's recorded snapshot (pre-
      // maintenance) — the compaction rewrites must NOT re-deliver,
      // or every base row would look like batch rows and mass-dedup
      val recorded = loadT(dir, "docs_minhash_idx").metadata.properties(
        "graft.dedup-index.source-snapshot-id").toLong
      Seq((20L, "fresh NEW words"), (21L, "novel content"))
        .toDF("doc_id", "text").createOrReplaceTempView("ddm_b2")
      spark.sql(s"INSERT INTO $c.db.docs SELECT * FROM ddm_b2")
      val r2 = spark.sql(s"CALL $c.system.dedup_table('db', 'docs', " +
        s"'exact', 'text', 'doc_id', 0.8, '', $recorded, " +
        s"'docs_minhash_idx')").collect().head
      assert((r2.getLong(0), r2.getLong(2)) == ((5L, 1L)),
        s"day-2 must see 5 live docs and remove only the replay: $r2")
      assert(spark.sql(s"SELECT doc_id FROM $c.db.docs ORDER BY doc_id")
        .collect().map(_.getLong(0)).toSeq == Seq(1L, 2L, 11L, 21L))
      // the index stayed exact: live non-null-text rows only
      assert(spark.sql(s"SELECT doc_id FROM $c.db.docs_minhash_idx " +
        s"ORDER BY doc_id").collect().map(_.getLong(0)).toSeq ==
        Seq(1L, 2L, 11L, 21L))
    }
  }

  test("CALL system.build_ann_index persists a cell-partitioned " +
      "inverted file whose search matches the unindexed IVF path") {
    withCatalog("ann") { (c, dir) =>
      import spark.implicits._
      import org.apache.spark.sql.functions.col
      spark.sql(s"CREATE NAMESPACE $c.db")
      spark.sql(s"CREATE TABLE $c.db.vecs " +
        "(vec_id BIGINT, embedding ARRAY<FLOAT>)")
      // two tight dim-4 clusters + one wrong-dim row (not indexable)
      val rows = (0L until 6L).map { i =>
        val base = if (i % 2 == 0) Seq(1f, 0f, 0f, 0f)
          else Seq(0f, 0f, 0f, 1f)
        (i, base.map(_ + i.toFloat / 100f))
      } :+ (99L, Seq(1f, 2f))
      rows.toDF("vec_id", "embedding").createOrReplaceTempView("ann_src")
      spark.sql(s"INSERT INTO $c.db.vecs SELECT * FROM ann_src")

      val rep = spark.sql(s"CALL $c.system.build_ann_index(" +
        s"'db', 'vecs', n_centroids => 2)").collect().head
      assert(rep.getString(0) == "vecs_ann_idx" && rep.getInt(1) == 2 &&
        rep.getInt(2) == 4 && rep.getLong(3) == 6L && rep.getLong(4) == 7L,
        s"report $rep")

      // the index table: identity-partitioned by cell, model stamped
      val idxT = loadT(dir, "vecs_ann_idx")
      assert(idxT.spec.fields.map(f =>
        (f.name, f.transform)) == Seq(("cell", graft.spec.Transform.Identity)))
      val props = idxT.metadata.properties
      assert(props("graft.ann-index.dim") == "4" &&
        props("graft.ann-index.source-snapshot-id") ==
          rep.getLong(5).toString, props.toString)
      val centroids = graft.ops.Similarity.centroidsFromJson(
        props("graft.ann-index.centroids"))
      assert(centroids.size == 2 && centroids.forall(_.length == 4))
      // same-cluster rows share a cell; the clusters get distinct cells
      val cells = spark.sql(
        s"SELECT vec_id, cell FROM $c.db.vecs_ann_idx")
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(cells.keySet == Set(0L, 1L, 2L, 3L, 4L, 5L))
      assert(cells(0L) == cells(2L) && cells(1L) == cells(3L) &&
        cells(0L) != cells(1L), s"cells $cells")

      // indexed search == unindexed IVF with the same trained model,
      // and the cell filter partition-prunes the index read
      // ONE query → one probed cell of 2 → the read must prune
      val qs = rows.take(1).toDF("vec_id", "embedding")
      val allFiles = graft.table.Scan(idxT, spark).planFiles().size
      val got = graft.ops.Similarity.ivfTopKFromIndex(
        wanted => {
          val pruned = graft.table.Scan(idxT, spark)
            .filter(graft.table.Col("cell").in(wanted: _*))
          assert(pruned.planFiles().size < allFiles,
            s"${pruned.planFiles().size} of $allFiles files")
          pruned.toDF
        }, qs, centroids, k = 2, nprobe = 1)
        .select("qid", "nid", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val full = graft.ops.Similarity.ivfTopKWithCentroids(
        spark.sql(s"SELECT * FROM $c.db.vecs WHERE size(embedding) = 4"),
        qs, centroids, k = 2, nprobe = 1)
        .select("qid", "nid", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(got == full && got.nonEmpty, s"indexed $got vs full $full")

      // rebuild after new data: one overwrite, report + stamp advance
      spark.sql(s"INSERT INTO $c.db.vecs VALUES " +
        "(6, array(CAST(0.5 AS FLOAT), CAST(0.5 AS FLOAT), " +
        "CAST(0.5 AS FLOAT), CAST(0.5 AS FLOAT)))")
      val rep2 = spark.sql(s"CALL $c.system.build_ann_index(" +
        s"'db', 'vecs', n_centroids => 2)").collect().head
      assert(rep2.getLong(3) == 7L && rep2.getLong(5) != rep.getLong(5),
        s"rebuild report $rep2")
      assert(spark.sql(s"SELECT count(*) FROM $c.db.vecs_ann_idx")
        .collect().head.getLong(0) == 7L, "rebuilt index replaces rows")

      // incremental chain: assign ONLY the appended rows with the
      // stamped centroids — no refit, no base rescan, one append
      val stamp = loadT(dir, "vecs_ann_idx").metadata.properties(
        "graft.ann-index.centroids")
      spark.sql(s"INSERT INTO $c.db.vecs VALUES " +
        "(7, array(CAST(1.0 AS FLOAT), CAST(0.1 AS FLOAT), " +
        "CAST(0.0 AS FLOAT), CAST(0.0 AS FLOAT))), " +
        "(8, array(CAST(9.9 AS FLOAT), CAST(9.9 AS FLOAT)))") // wrong dim
      val rep3 = spark.sql(s"CALL $c.system.build_ann_index(" +
        s"'db', 'vecs', incremental => true)").collect().head
      assert(rep3.getLong(3) == 1L && rep3.getLong(4) == 2L,
        s"chain report $rep3")
      val idxT2 = loadT(dir, "vecs_ann_idx")
      assert(idxT2.metadata.properties("graft.ann-index.centroids")
        == stamp, "incremental must not refit")
      assert(idxT2.metadata.properties(
        "graft.ann-index.source-snapshot-id") == rep3.getLong(5).toString)
      assert(spark.sql(s"SELECT count(*) FROM $c.db.vecs_ann_idx")
        .collect().head.getLong(0) == 8L, "7 rebuilt + 1 chained")
      // the chained row landed in the cluster-A cell
      val cellOf7 = spark.sql(s"SELECT cell FROM $c.db.vecs_ann_idx " +
        "WHERE vec_id = 7").collect().head.getInt(0)
      val cellOf0 = spark.sql(s"SELECT cell FROM $c.db.vecs_ann_idx " +
        "WHERE vec_id = 0").collect().head.getInt(0)
      assert(cellOf7 == cellOf0, "chained vector assigned by the model")
      // idempotent no-op when nothing new appended
      val rep4 = spark.sql(s"CALL $c.system.build_ann_index(" +
        s"'db', 'vecs', incremental => true)").collect().head
      assert(rep4.getLong(3) == 0L, s"no-op chain $rep4")

      def causes(e: Throwable): String =
        Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
          .map(m => Option(m.getMessage).getOrElse("")).mkString(" | ")
      val e1 = intercept[Exception] { spark.sql(
        s"CALL $c.system.build_ann_index('db', 'vecs', n_centroids => 0)") }
      assert(causes(e1).contains("must be positive"), causes(e1))
      val e4 = intercept[Exception] { spark.sql(
        s"CALL $c.system.build_ann_index('db', 'vecs', " +
        "incremental => true, index_table => 'nope_idx')") }
      assert(causes(e4).contains("run a full build first"), causes(e4))

      // ann_search: external query near cluster A; vec 0 (a real id)
      // must be includable — the sentinel qid never self-excludes
      val hits = spark.sql(s"CALL $c.system.ann_search('db', " +
        "'vecs_ann_idx', '[1.0, 0.05, 0.0, 0.0]', 3, 1)")
        .orderBy("rank").collect()
      assert(hits.length == 3 && hits.map(_.getLong(1)).contains(0L),
        s"hits ${hits.toSeq}")
      assert(hits.forall(r => r.getDouble(2) > 0.9),
        "cluster-A neighbors only")
      val e6 = intercept[Exception] { spark.sql(
        s"CALL $c.system.ann_search('db', 'vecs_ann_idx', '[1.0]', 3)") }
      assert(causes(e6).contains("dims"), causes(e6))
      val e7 = intercept[Exception] { spark.sql(
        s"CALL $c.system.ann_search('db', 'vecs', '[1,0,0,0]', 3)") }
      assert(causes(e7).contains("not a build_ann_index table"),
        causes(e7))
      val e8 = intercept[Exception] { spark.sql(
        s"CALL $c.system.ann_search('db', 'vecs_ann_idx', " +
        "'[1,0,0,0]', 0)") }
      assert(causes(e8).contains("must be positive"), causes(e8))
      val e5 = intercept[Exception] { spark.sql(
        s"CALL $c.system.build_ann_index('db', 'vecs', " +
        "incremental => true, id_col => 'other')") }
      assert(causes(e5).contains("was built on"), causes(e5))
      val e2 = intercept[Exception] { spark.sql(
        s"CALL $c.system.build_ann_index('db', 'vecs', snapshot_id => 9)") }
      assert(causes(e2).contains("not found"), causes(e2))
      spark.sql(s"CREATE TABLE $c.db.empty (vec_id BIGINT, " +
        "embedding ARRAY<FLOAT>)")
      val e3 = intercept[Exception] { spark.sql(
        s"CALL $c.system.build_ann_index('db', 'empty')") }
      assert(causes(e3).contains("no snapshots"), causes(e3))
    }
  }

  test("CALL system.build_pq_index persists frozen-model codes; " +
      "incremental chain encodes only appended rows") {
    withCatalog("pqi") { (c, dir) =>
      import spark.implicits._
      spark.sql(s"CREATE NAMESPACE $c.db")
      spark.sql(s"CREATE TABLE $c.db.vecs (vec_id BIGINT, " +
        "embedding ARRAY<FLOAT>)")
      val rows = (0L until 6L).map { i =>
        val base = if (i % 2 == 0) Seq(1f, 0f, 0f, 0f)
          else Seq(0f, 0f, 0f, 1f)
        (i, base.map(_ + i.toFloat / 100f))
      }
      rows.toDF("vec_id", "embedding").createOrReplaceTempView("pqi_src")
      spark.sql(s"INSERT INTO $c.db.vecs SELECT * FROM pqi_src")
      val rep = spark.sql(s"CALL $c.system.build_pq_index(" +
        s"'db', 'vecs', m => 2, ksub => 2)").collect().head
      assert(rep.getString(0) == "vecs_pq_idx" && rep.getInt(1) == 2 &&
        rep.getInt(2) == 2 && rep.getInt(3) == 4 &&
        rep.getLong(4) == 6L && rep.getLong(5) == 6L, s"report $rep")
      val props = loadT(dir, "vecs_pq_idx").metadata.properties
      val cbs = graft.ops.Similarity.pqCodebooksFromJson(
        props("graft.pq-index.codebooks"), 2)
      assert(cbs.size == 2 && cbs.forall(_.size == 2) &&
        cbs.forall(_.forall(_.length == 2)))
      // stored codes == a frozen-model re-encode
      val expect = graft.ops.Similarity.pqEncode(
        rows.toDF("vec_id", "embedding"), cbs).collect()
        .map(r => r.getLong(0) -> r.getSeq[Int](1).toSeq).toMap
      val got = spark.sql(s"SELECT vec_id, codes FROM $c.db.vecs_pq_idx")
        .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toSeq).toMap
      assert(got == expect, s"codes $got vs $expect")
      // incremental: only the appended row is encoded, codebooks frozen
      spark.sql(s"INSERT INTO $c.db.vecs VALUES " +
        "(7, array(CAST(1.0 AS FLOAT), CAST(0.1 AS FLOAT), " +
        "CAST(0.0 AS FLOAT), CAST(0.0 AS FLOAT)))")
      val rep2 = spark.sql(s"CALL $c.system.build_pq_index(" +
        s"'db', 'vecs', incremental => true)").collect().head
      assert(rep2.getLong(4) == 1L && rep2.getLong(5) == 1L,
        s"chain report $rep2")
      assert(loadT(dir, "vecs_pq_idx").metadata.properties(
        "graft.pq-index.codebooks") ==
        props("graft.pq-index.codebooks"), "chain must not refit")
      assert(spark.sql(s"SELECT count(*) FROM $c.db.vecs_pq_idx")
        .collect().head.getLong(0) == 7L)
      def causes(e: Throwable): String =
        Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
          .map(m => Option(m.getMessage).getOrElse("")).mkString(" | ")
      val e1 = intercept[Exception] { spark.sql(
        s"CALL $c.system.build_pq_index('db', 'vecs', m => 0)") }
      assert(causes(e1).contains("must be positive"), causes(e1))
      val e2 = intercept[Exception] { spark.sql(
        s"CALL $c.system.build_pq_index('db', 'vecs', " +
        "incremental => true, index_table => 'nope_idx')") }
      assert(causes(e2).contains("run a full build first"), causes(e2))

      // pq_search straight from SQL: cluster-A query, top hits are
      // cluster-A members ranked by ADC; vec 0 includable (sentinel)
      val hits = spark.sql(s"CALL $c.system.pq_search('db', " +
        "'vecs_pq_idx', '[1.0, 0.05, 0.0, 0.0]', 3)")
        .orderBy("rank").collect()
      assert(hits.length == 3 && hits.map(_.getLong(1)).contains(0L),
        s"hits ${hits.toSeq}")
      val libTop = graft.ops.Similarity.pqTopKFromCodes(
        spark.sql(s"SELECT vec_id, codes FROM $c.db.vecs_pq_idx"),
        Seq((Long.MinValue, Seq(1.0f, 0.05f, 0f, 0f)))
          .toDF("vec_id", "embedding"),
        graft.ops.Similarity.pqCodebooksFromJson(
          loadT(dir, "vecs_pq_idx").metadata.properties(
            "graft.pq-index.codebooks"), 2), k = 3)
        .orderBy("rank").collect()
        .map(r => (r.getInt(3), r.getLong(1))).toSeq
      assert(hits.map(r => (r.getInt(0), r.getLong(1))).toSeq == libTop,
        s"sql=${hits.toSeq} lib=$libTop")
      val e3 = intercept[Exception] { spark.sql(
        s"CALL $c.system.pq_search('db', 'vecs', '[1,0,0,0]', 3)") }
      assert(causes(e3).contains("not a build_pq_index table"),
        causes(e3))
      val e4 = intercept[Exception] { spark.sql(
        s"CALL $c.system.pq_search('db', 'vecs_pq_idx', '[1.0]', 3)") }
      assert(causes(e4).contains("dims"), causes(e4))
    }
  }

  test("CALL system.build_text_index persists bucket-partitioned " +
      "postings with exact stats; incremental chain equals a rebuild") {
    withCatalog("txi") { (c, dir) =>
      import spark.implicits._
      spark.sql(s"CREATE NAMESPACE $c.db")
      spark.sql(s"CREATE TABLE $c.db.docs (doc_id BIGINT, text STRING)")
      Seq((1L, "spark engine data"), (2L, "spark spark"),
        (3L, null.asInstanceOf[String]))
        .toDF("doc_id", "text").createOrReplaceTempView("txi_base")
      spark.sql(s"INSERT INTO $c.db.docs SELECT * FROM txi_base")
      val rep = spark.sql(s"CALL $c.system.build_text_index(" +
        s"'db', 'docs', num_buckets => 4)").collect().head
      // postings: doc1 × 3 distinct terms + doc2 × 1; NULL text → none
      assert(rep.getString(0) == "docs_text_idx" && rep.getInt(1) == 4 &&
        rep.getLong(2) == 4L && rep.getLong(3) == 3L, s"report $rep")
      val idxT = loadT(dir, "docs_text_idx")
      assert(idxT.spec.fields.map(f => (f.name, f.transform)) ==
        Seq(("tbucket", graft.spec.Transform.Identity)))
      val props = idxT.metadata.properties
      // n_docs counts the NULL-text doc; total_dl = 3 + 2 tokens
      assert(props("graft.text-index.n-docs") == "3" &&
        props("graft.text-index.total-dl") == "5", props.toString)
      // stored tbucket = the murmur3 bucket kernel of the term
      val rows = spark.sql(s"SELECT term, tbucket FROM " +
        s"$c.db.docs_text_idx").collect()
      assert(rows.forall(r => r.getInt(1) == graft.functions.BucketUtil
        .bucketUTF8(org.apache.spark.unsafe.types.UTF8String
          .fromString(r.getString(0)), 4)))
      // incremental chain: new doc's postings + exact stat arithmetic
      spark.sql(s"INSERT INTO $c.db.docs VALUES (4, 'engine tuning')")
      val rep2 = spark.sql(s"CALL $c.system.build_text_index(" +
        s"'db', 'docs', incremental => true)").collect().head
      assert(rep2.getLong(2) == 2L && rep2.getLong(3) == 4L,
        s"chain report $rep2")
      val props2 = loadT(dir, "docs_text_idx").metadata.properties
      assert(props2("graft.text-index.n-docs") == "4" &&
        props2("graft.text-index.total-dl") == "7", props2.toString)
      assert(props2("graft.text-index.source-snapshot-id") ==
        rep2.getLong(4).toString)
      // chained index content == a from-scratch postings pass
      val expect = graft.ops.Retrieval.postings(
        spark.sql(s"SELECT doc_id, text FROM $c.db.docs"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          r.getLong(3))).toSet
      val got = spark.sql(s"SELECT doc_id, term, dl, tf FROM " +
        s"$c.db.docs_text_idx").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          r.getLong(3))).toSet
      assert(got == expect, s"chained == rebuild: $got vs $expect")
      // idempotent no-op
      val rep3 = spark.sql(s"CALL $c.system.build_text_index(" +
        s"'db', 'docs', incremental => true)").collect().head
      assert(rep3.getLong(2) == 0L && rep3.getLong(3) == 4L, s"$rep3")
      def causes(e: Throwable): String =
        Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
          .map(m => Option(m.getMessage).getOrElse("")).mkString(" | ")
      val e1 = intercept[Exception] { spark.sql(
        s"CALL $c.system.build_text_index('db', 'docs', " +
        "num_buckets => 0)") }
      assert(causes(e1).contains("must be positive"), causes(e1))
      val e2 = intercept[Exception] { spark.sql(
        s"CALL $c.system.build_text_index('db', 'docs', " +
        "incremental => true, index_table => 'nope_idx')") }
      assert(causes(e2).contains("run a full build first"), causes(e2))
      val e3 = intercept[Exception] { spark.sql(
        s"CALL $c.system.build_text_index('db', 'docs', " +
        "incremental => true, text_col => 'body')") }
      assert(causes(e3).contains("was built on"), causes(e3))

      // text_search straight from SQL: bit-identical to the library
      // path over the live table (corpus: docs 1, 2, 4 have text)
      val hits = spark.sql(s"CALL $c.system.text_search('db', " +
        "'docs_text_idx', 'spark tuning', 5)").orderBy("rank").collect()
      import spark.implicits._
      val libHits = graft.ops.Retrieval.bm25TopK(
        spark.sql(s"SELECT doc_id, text FROM $c.db.docs"),
        Seq((0L, "spark tuning")).toDF("query_id", "query"), k = 5)
        .orderBy("rank").collect()
        .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
      assert(hits.map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSeq == libHits.toSeq, s"sql=${hits.toSeq} lib=${libHits.toSeq}")
      val e4 = intercept[Exception] { spark.sql(
        s"CALL $c.system.text_search('db', 'docs', 'spark', 5)") }
      assert(causes(e4).contains("not a build_text_index table"),
        causes(e4))
      val e5 = intercept[Exception] { spark.sql(
        s"CALL $c.system.text_search('db', 'docs_text_idx', 'x', 0)") }
      assert(causes(e5).contains("must be positive"), causes(e5))
    }
  }

  test("CALL system.hybrid_search fuses the persisted text and ann " +
      "indexes; row-for-row parity with the library composition") {
    withCatalog("hyb") { (c, dir) =>
      import spark.implicits._
      import org.apache.spark.sql.functions.{col, lit, typedLit}
      spark.sql(s"CREATE NAMESPACE $c.db")
      spark.sql(s"CREATE TABLE $c.db.docs (doc_id BIGINT, text STRING)")
      spark.sql(s"CREATE TABLE $c.db.vecs " +
        "(vec_id BIGINT, embedding ARRAY<FLOAT>)")
      Seq(
        (0L, "alpha bravo charlie delta echo"),
        (1L, "alpha bravo zulu yankee xray"),
        (2L, "charlie delta foxtrot golf"),
        (3L, "hotel india juliet kilo"),
        (4L, "alpha charlie echo golf india"),
        (5L, "mike november oscar papa"))
        .toDF("doc_id", "text").createOrReplaceTempView("hyb_docs")
      val vrows = (0L until 6L).map { i =>
        val base = if (i % 2 == 0) Seq(1f, 0f, 0f, 0f)
          else Seq(0f, 0f, 0f, 1f)
        (i, base.map(_ + i.toFloat / 100f))
      }
      vrows.toDF("vec_id", "embedding")
        .createOrReplaceTempView("hyb_vecs")
      spark.sql(s"INSERT INTO $c.db.docs SELECT * FROM hyb_docs")
      spark.sql(s"INSERT INTO $c.db.vecs SELECT * FROM hyb_vecs")
      spark.sql(s"CALL $c.system.build_text_index('db', 'docs', " +
        "num_buckets => 4)").collect()
      spark.sql(s"CALL $c.system.build_ann_index('db', 'vecs', " +
        "n_centroids => 2)").collect()

      val qstr = "alpha bravo charlie delta"
      val qvec = vrows.head._2
      val json = qvec.mkString("[", ",", "]")
      val got = spark.sql(s"CALL $c.system.hybrid_search('db', " +
        s"'docs_text_idx', 'vecs_ann_idx', '$qstr', '$json', " +
        "5, 5, 1, 60)").orderBy("rank").collect().map(_.toSeq).toSeq

      // the library composition with the same inputs and models
      val tIdx = loadT(dir, "docs_text_idx")
      val aIdx = loadT(dir, "vecs_ann_idx")
      val tProps = tIdx.metadata.properties
      val nb = tProps("graft.text-index.num-buckets").toInt
      val centroids = graft.ops.Similarity.centroidsFromJson(
        aIdx.metadata.properties("graft.ann-index.centroids"))
      val probe = spark.range(1).select(lit(0L).as("query_id"),
        lit(qstr).as("query"))
      val lex = graft.ops.Retrieval.bm25FromIndex(
        terms => {
          val buckets = terms.map(tm => graft.functions.BucketUtil
            .bucketUTF8(org.apache.spark.unsafe.types.UTF8String
              .fromString(tm), nb)).distinct.sorted
          graft.table.Scan(tIdx, spark)
            .filter(graft.table.Col("tbucket").in(buckets: _*)).toDF
        },
        probe, tProps("graft.text-index.n-docs").toLong,
        tProps("graft.text-index.total-dl").toLong, k = 5)
      val qdf = spark.range(1).select(
        lit(Long.MinValue).as("vec_id"),
        typedLit(qvec).as("embedding"))
      val vec = graft.ops.Similarity.ivfTopKFromIndex(
        cells => graft.table.Scan(aIdx, spark)
          .filter(graft.table.Col("cell").in(cells: _*)).toDF,
        qdf, centroids, k = 5, nprobe = 1)
      val exp = graft.ops.Retrieval.rrfFuse(Seq(
          lex.select(lit(0L).as("query_id"), col("doc_id"),
            col("rank")),
          vec.select(lit(0L).as("query_id"), col("nid").as("doc_id"),
            col("rank"))),
          k = 5)
        .select(col("rank"), col("doc_id"), col("rrf_scaled"),
          col("n_lists"))
        .orderBy("rank").collect().map(_.toSeq).toSeq
      assert(got == exp, s"sql $got vs lib $exp")
      // vec 0 is a corpus member passed as an EXTERNAL vector: its
      // self-hit is the vector rank-1, and doc 0 leads the lexical
      // list too, so id 0 must fuse to rank 1 with both lists
      assert(got.head(0) == 1L && got.head(1) == 0L &&
        got.head(3) == 2L, s"fused head ${got.head}")

      def causes(e: Throwable): String =
        Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
          .map(m => Option(m.getMessage).getOrElse("")).mkString(" | ")
      // error surface: a non-text-index first table
      val e1 = intercept[Exception] { spark.sql(
        s"CALL $c.system.hybrid_search('db', 'vecs_ann_idx', " +
        s"'vecs_ann_idx', 'x', '$json', 5, 5, 1, 60)") }
      assert(causes(e1).contains("not a build_text_index table"),
        causes(e1))
      // mismatched id domains: a STRING-keyed text index cannot fuse
      // with the BIGINT-keyed ann index
      spark.sql(s"CREATE TABLE $c.db.sdocs (name STRING, text STRING)")
      spark.sql(s"INSERT INTO $c.db.sdocs VALUES ('a', 'alpha bravo')")
      spark.sql(s"CALL $c.system.build_text_index('db', 'sdocs', " +
        "id_col => 'name', num_buckets => 4)").collect()
      val e2 = intercept[Exception] { spark.sql(
        s"CALL $c.system.hybrid_search('db', 'sdocs_text_idx', " +
        s"'vecs_ann_idx', 'alpha', '$json', 5, 5, 1, 60)") }
      assert(causes(e2).contains("id domain"), causes(e2))
      val e3 = intercept[Exception] { spark.sql(
        s"CALL $c.system.hybrid_search('db', 'docs_text_idx', " +
        s"'vecs_ann_idx', 'x', '$json', 0, 5, 1, 60)") }
      assert(causes(e3).contains("need k > 0"), causes(e3))
    }
  }

  test("CALL system.mmr_search re-ranks the IVF candidates by " +
      "maximal marginal relevance over int8-code dots") {
    withCatalog("mmr") { (c, _) =>
      import spark.implicits._
      spark.sql(s"CREATE NAMESPACE $c.db")
      spark.sql(s"CREATE TABLE $c.db.vecs " +
        "(vec_id BIGINT, embedding ARRAY<FLOAT>)")
      // v1 on the x axis, v2 a near-duplicate of v1, v3 diverse but
      // still query-relevant: pure relevance ranks (1, 2, 3); MMR at
      // λ=3/10 must demote the near-duplicate v2 behind v3
      Seq(
        (1L, Seq(1f, 0f, 0f, 0f)),
        (2L, Seq(0.996f, 0.004f, 0f, 0f)),
        (3L, Seq(0.6f, 1f, 0f, 0f)))
        .toDF("vec_id", "embedding").createOrReplaceTempView("mmr_src")
      spark.sql(s"INSERT INTO $c.db.vecs SELECT * FROM mmr_src")
      spark.sql(s"CALL $c.system.build_ann_index('db', 'vecs', " +
        "n_centroids => 2)").collect()
      val json = "[1.0, 0.0, 0.0, 0.0]"
      val got = spark.sql(s"CALL $c.system.mmr_search('db', " +
        s"'vecs_ann_idx', '$json', 3, 3, 2, 3, 10)")
        .orderBy("step").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      // codes: v1 (255,0,0,0), v2 (255,1,0,0), v3 (153,255,0,0);
      // q (255,0,0,0). rel: v1 = v2 = 65025, v3 = 39015.
      // sims: (v2,v1) = 65025, (v3,v1) = 39015, (v3,v2) = 39270.
      // step1: rel tie 65025 -> lowest id v1, mmr = 3·65025 = 195075.
      // step2: v2 margin 3·65025 − 7·65025 = −260100 LOSES to v3
      // margin 3·39015 − 7·39015 = −156060 -> the DIVERSE v3 wins.
      // step3: v2 at max-sim 65025 -> −260100.
      assert(got.toSeq == Seq((1L, 1L, 195075L), (2L, 3L, -156060L),
        (3L, 2L, -260100L)), s"got ${got.toSeq}")

      def causes(e: Throwable): String =
        Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
          .map(m => Option(m.getMessage).getOrElse("")).mkString(" | ")
      val e1 = intercept[Exception] { spark.sql(
        s"CALL $c.system.mmr_search('db', 'vecs', '$json', 3, 3, " +
        "2, 7, 10)") }
      assert(causes(e1).contains("not a build_ann_index table"),
        causes(e1))
      val e2 = intercept[Exception] { spark.sql(
        s"CALL $c.system.mmr_search('db', 'vecs_ann_idx', '$json', " +
        "5, 3, 2, 7, 10)") }
      assert(causes(e2).contains("0 < k <= candidates"), causes(e2))
      val e3 = intercept[Exception] { spark.sql(
        s"CALL $c.system.mmr_search('db', 'vecs_ann_idx', '$json', " +
        "3, 3, 2, 11, 10)") }
      assert(causes(e3).contains("lam_num/lam_den"), causes(e3))
    }
  }

  test("CALL system.hybrid_mmr_search diversifies the fused hybrid " +
      "list in one call; a vector-less candidate contributes zero " +
      "redundancy") {
    withCatalog("hmm") { (c, dir) =>
      import spark.implicits._
      import org.apache.spark.sql.functions.{aggregate => hofAggregate,
        broadcast, coalesce, col, lit, when, zip_with}
      spark.sql(s"CREATE NAMESPACE $c.db")
      spark.sql(s"CREATE TABLE $c.db.docs (doc_id BIGINT, text STRING)")
      spark.sql(s"CREATE TABLE $c.db.vecs " +
        "(vec_id BIGINT, embedding ARRAY<FLOAT>)")
      // doc 1 is a near-duplicate of doc 0 in BOTH modalities; doc 2
      // is relevant but diverse; doc 3 is LEXICAL-ONLY — it has no
      // vector row at all, so its redundancy must be the deliberate 0
      Seq(
        (0L, "alpha bravo charlie delta"),
        (1L, "alpha bravo charlie delta echo"),
        (2L, "alpha bravo golf hotel"),
        (3L, "alpha charlie india juliet"),
        (4L, "mike november oscar papa"))
        .toDF("doc_id", "text").createOrReplaceTempView("hmm_docs")
      Seq(
        (0L, Seq(1f, 0f, 0f, 0f)),
        (1L, Seq(0.996f, 0.004f, 0f, 0f)),
        (2L, Seq(0.6f, 1f, 0f, 0f)),
        (4L, Seq(0f, 0f, 1f, 0f)))
        .toDF("vec_id", "embedding").createOrReplaceTempView("hmm_vecs")
      spark.sql(s"INSERT INTO $c.db.docs SELECT * FROM hmm_docs")
      spark.sql(s"INSERT INTO $c.db.vecs SELECT * FROM hmm_vecs")
      spark.sql(s"CALL $c.system.build_text_index('db', 'docs', " +
        "num_buckets => 4)").collect()
      spark.sql(s"CALL $c.system.build_ann_index('db', 'vecs', " +
        "n_centroids => 2)").collect()
      val qstr = "alpha bravo charlie delta"
      val json = "[1.0, 0.0, 0.0, 0.0]"
      // relevance is rrf-scaled (~1e7 per list here) while redundancy
      // is an int8-code dot (~6.5e4): λ must sit near the scale ratio
      // for the trade to bite — 3/100 here (see the procedure scaladoc)
      val got = spark.sql(s"CALL $c.system.hybrid_mmr_search('db', " +
        s"'docs_text_idx', 'vecs_ann_idx', '$qstr', '$json', " +
        "3, 4, 5, 2, 60, 3, 100)").orderBy("step")
      assert(got.columns.toSeq ==
        Seq("step", "doc_id", "mmr_scaled", "rrf_scaled"))
      val gotRows = got.collect().map(_.toSeq).toSeq

      // the library composition: the gated hybrid_search fused list
      // re-ranked by mmrDiversify with left-join-0 pairwise sims
      val fused = spark.sql(s"CALL $c.system.hybrid_search('db', " +
        s"'docs_text_idx', 'vecs_ann_idx', '$qstr', '$json', " +
        "4, 5, 2, 60)")
      val rel = fused.select(lit(0L).as("qid"),
        col("doc_id").as("nid"), col("rrf_scaled").as("rel"))
      val candIds = fused.select("doc_id").collect().map(_.getLong(0))
      // the vector-less lexical hit must actually be in the fused list
      // for this test to exercise the 0-sim path
      assert(candIds.contains(3L), s"doc 3 not fused: ${candIds.toSeq}")
      val cvecs = graft.table.Scan(loadT(dir, "vecs"), spark)
        .filter(graft.table.Col("vec_id")
          .in(candIds.map(_.asInstanceOf[AnyRef]): _*)).toDF
      val codes = graft.ops.Similarity.quantizeInt8(cvecs,
        vecCol = "embedding", idCol = "vec_id")
        .select("vec_id", "codes")
      def dotc(a: org.apache.spark.sql.Column,
          b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
        hofAggregate(zip_with(a, b, (x, y) => x * y), lit(0L),
          (acc, x) => acc + x)
      val grid = fused.select(col("doc_id").as("a"))
        .crossJoin(broadcast(fused.select(col("doc_id").as("b"))))
        .where(col("a") =!= col("b"))
      val sims = grid
        .join(broadcast(codes.select(col("vec_id").as("a"),
          col("codes").as("ca"))), Seq("a"), "left")
        .join(broadcast(codes.select(col("vec_id").as("b"),
          col("codes").as("cb"))), Seq("b"), "left")
        .select(lit(0L).as("qid"), col("a"), col("b"),
          coalesce(when(col("ca").isNotNull && col("cb").isNotNull,
            dotc(col("ca"), col("cb"))), lit(0L)).as("sim"))
      val exp = graft.ops.Similarity.mmrDiversify(rel, sims, k = 3,
          lamNum = 3L, lamDen = 100L)
        .join(fused.select(col("doc_id").as("nid"), col("rrf_scaled")),
          Seq("nid"))
        .select(col("step"), col("nid").as("doc_id"),
          col("mmr_scaled"), col("rrf_scaled"))
        .orderBy("step").collect().map(_.toSeq).toSeq
      assert(gotRows == exp, s"sql $gotRows vs lib $exp")
      // semantics: doc 0 tops both retrievers -> step 1; at λ = 3/10
      // the near-duplicate doc 1 must NOT be step 2 — a diverse or
      // zero-redundancy candidate beats it
      assert(gotRows.head(0) == 1L && gotRows.head(1) == 0L,
        s"step 1 must be doc 0: ${gotRows.head}")
      assert(gotRows(1)(1) != 1L,
        s"near-dup doc 1 must be demoted at step 2: ${gotRows(1)}")
      // every returned rrf_scaled matches the fused list's value
      val fusedById = fused.collect()
        .map(r => r.getLong(1) -> r.getLong(2)).toMap
      gotRows.foreach { r =>
        assert(r(3) == fusedById(r(1).asInstanceOf[Long]),
          s"rrf carry mismatch: $r vs $fusedById")
      }

      def causes(e: Throwable): String =
        Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
          .map(m => Option(m.getMessage).getOrElse("")).mkString(" | ")
      val e1 = intercept[Exception] { spark.sql(
        s"CALL $c.system.hybrid_mmr_search('db', 'docs_text_idx', " +
        s"'vecs_ann_idx', '$qstr', '$json', 5, 4, 5, 2, 60, 3, 10)") }
      assert(causes(e1).contains("0 < k <= candidates"), causes(e1))
      val e2 = intercept[Exception] { spark.sql(
        s"CALL $c.system.hybrid_mmr_search('db', 'docs_text_idx', " +
        s"'vecs_ann_idx', '$qstr', '$json', 3, 4, 5, 2, 60, 11, 10)") }
      assert(causes(e2).contains("lam_num/lam_den"), causes(e2))
      // a STRING-keyed id domain passes fusion but cannot MMR-re-rank
      spark.sql(s"CREATE TABLE $c.db.sdocs (name STRING, text STRING)")
      spark.sql(s"CREATE TABLE $c.db.svecs " +
        "(name STRING, embedding ARRAY<FLOAT>)")
      spark.sql(s"INSERT INTO $c.db.sdocs VALUES ('a', 'alpha bravo')")
      Seq(("a", Seq(1f, 0f, 0f, 0f)), ("b", Seq(0f, 1f, 0f, 0f)))
        .toDF("name", "embedding").createOrReplaceTempView("hmm_svecs")
      spark.sql(s"INSERT INTO $c.db.svecs SELECT * FROM hmm_svecs")
      spark.sql(s"CALL $c.system.build_text_index('db', 'sdocs', " +
        "id_col => 'name', num_buckets => 4)").collect()
      spark.sql(s"CALL $c.system.build_ann_index('db', 'svecs', " +
        "id_col => 'name', n_centroids => 2)").collect()
      val e3 = intercept[Exception] { spark.sql(
        s"CALL $c.system.hybrid_mmr_search('db', 'sdocs_text_idx', " +
        s"'svecs_ann_idx', 'alpha', '$json', 1, 1, 5, 1, 60, 3, 10)") }
      assert(causes(e3).contains("requires an integer id"), causes(e3))
    }
  }

  test("CALL system.sample_mixture writes a stratum-partitioned " +
      "sample table with exact Hamilton quotas") {
    withCatalog("smx") { (c, dir) =>
      import spark.implicits._
      spark.sql(s"CREATE NAMESPACE $c.db")
      spark.sql(s"CREATE TABLE $c.db.docs (doc_id BIGINT, " +
        "source STRING, text STRING)")
      // 6 docs in a, 6 in b, 2 in c (c smaller than any real quota),
      // plus a stratum absent from the weights (contributes nothing)
      val rows = (0L until 6L).map(i => (i, "a", s"doc a$i")) ++
        (10L until 16L).map(i => (i, "b", s"doc b$i")) ++
        Seq((20L, "c", "doc c0"), (21L, "c", "doc c1"),
          (30L, "zz", "unweighted"))
      rows.toDF("doc_id", "source", "text")
        .createOrReplaceTempView("smx_src")
      spark.sql(s"INSERT INTO $c.db.docs SELECT * FROM smx_src")
      // weights 3:2:5 over total 10 -> exact quotas 3, 2, 5; stratum
      // c yields only its 2 rows (shortfall), so 3+2+2 = 7 rows land
      val rep = spark.sql(s"CALL $c.system.sample_mixture('db', " +
        """'docs', '{"a": 3, "b": 2, "c": 5}', 10)""").collect().head
      assert(rep.getString(0) == "docs_sample" &&
        rep.getLong(1) == 7L && rep.getLong(2) == 10L &&
        rep.getInt(3) == 3, s"report $rep")
      val got = spark.sql(
        s"SELECT source, COUNT(*) FROM $c.db.docs_sample GROUP BY 1")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == Map("a" -> 3L, "b" -> 2L, "c" -> 2L), s"$got")
      // full rows (not just keys) landed, stratum-partitioned
      val sampleT = loadT(dir, "docs_sample")
      assert(sampleT.spec.fields.map(f => (f.name, f.transform)) ==
        Seq(("source", graft.spec.Transform.Identity)))
      assert(spark.sql(s"SELECT text FROM $c.db.docs_sample " +
        "WHERE source = 'c'").collect().map(_.getString(0)).toSet ==
        Set("doc c0", "doc c1"))
      // the kept ids are the library sample exactly
      val expected = graft.ops.Packing.mixtureSample(
          spark.sql(s"SELECT * FROM $c.db.docs"), "source", "doc_id",
          Map("a" -> 3L, "b" -> 2L, "c" -> 5L), 10L)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      val gotIds = spark.sql(s"SELECT doc_id FROM $c.db.docs_sample")
        .collect().map(_.getLong(0)).toSet
      assert(gotIds == expected, s"$gotIds vs $expected")

      def causes(e: Throwable): String =
        Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
          .map(m => Option(m.getMessage).getOrElse("")).mkString(" | ")
      val e1 = intercept[Exception] { spark.sql(
        s"CALL $c.system.sample_mixture('db', 'docs', 'nonsense', 5)") }
      assert(causes(e1).contains("JSON object"), causes(e1))
      val e2 = intercept[Exception] { spark.sql(
        s"""CALL $c.system.sample_mixture('db', 'docs', '{"a": 0}', 5)""") }
      assert(causes(e2).contains("sum > 0"), causes(e2))
      // target exists -> refuse (never silently overwrite a sample)
      val e3 = intercept[Exception] { spark.sql(
        s"""CALL $c.system.sample_mixture('db', 'docs', '{"a": 1}', 5)""") }
      assert(causes(e3).contains("already exists"), causes(e3))
      val e4 = intercept[Exception] { spark.sql(
        s"""CALL $c.system.sample_mixture('db', 'docs', '{"a": 1}', 5,
           stratum_col => 'nope', target_table => 's2')""") }
      assert(causes(e4).toLowerCase.contains("nope"), causes(e4))

      // sample_budget: the cost-cut twin — inclusive per-stratum cap,
      // row-for-row parity with the library prefix cut
      spark.sql(s"ALTER TABLE $c.db.docs ADD COLUMN cost BIGINT")
      spark.sql(s"UPDATE $c.db.docs SET cost = doc_id % 7 + 1")
      val rep2 = spark.sql(s"CALL $c.system.sample_budget('db', " +
        "'docs', 'cost', 9, target_table => 'bcut')").collect().head
      assert(rep2.getString(0) == "bcut" && rep2.getLong(2) == 9L,
        s"report $rep2")
      val expectedB = graft.ops.Packing.budgetSample(
          spark.sql(s"SELECT * FROM $c.db.docs"), "source", "doc_id",
          "cost", 9L)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      val gotB = spark.sql(s"SELECT doc_id FROM $c.db.bcut")
        .collect().map(_.getLong(0)).toSet
      assert(gotB == expectedB && rep2.getLong(1) == expectedB.size,
        s"$gotB vs $expectedB")
      val overs = spark.sql(s"SELECT source, SUM(cost) AS t FROM " +
        s"$c.db.bcut GROUP BY 1 HAVING SUM(cost) > 9").collect()
      assert(overs.isEmpty, s"budget exceeded: ${overs.toSeq}")
      val e5 = intercept[Exception] { spark.sql(
        s"CALL $c.system.sample_budget('db', 'docs', 'cost', -1, " +
        "target_table => 'b2')") }
      assert(causes(e5).contains("must be >= 0"), causes(e5))
      val e6 = intercept[Exception] { spark.sql(
        s"CALL $c.system.sample_budget('db', 'docs', 'cost', 9, " +
        "target_table => 'bcut')") }
      assert(causes(e6).contains("already exists"), causes(e6))

      // duplicate (stratum, id) in the source → refuse loudly: the
      // key semi-join would pull BOTH rows back and silently break
      // the per-stratum count/budget contract
      spark.sql(s"INSERT INTO $c.db.docs VALUES (0, 'a', 'dup a0', 1)")
      val e7 = intercept[Exception] { spark.sql(
        s"""CALL $c.system.sample_mixture('db', 'docs', '{"a": 1}',
           5, target_table => 'dup1')""") }
      assert(causes(e7).contains("not unique"), causes(e7))
      val e8 = intercept[Exception] { spark.sql(
        s"CALL $c.system.sample_budget('db', 'docs', 'cost', 9, " +
        "target_table => 'dup2')") }
      assert(causes(e8).contains("not unique"), causes(e8))
    }
  }

  test("CALL system.pack_corpus writes a shard-partitioned packed " +
      "table with library parity and loud error paths") {
    withCatalog("pck") { (c, dir) =>
      import spark.implicits._
      spark.sql(s"CREATE NAMESPACE $c.db")
      spark.sql(s"CREATE TABLE $c.db.docs (doc_id BIGINT, text STRING)")
      // shard 0: ids 0-3 (docs_per_shard 4); shard 1: ids 4-5.
      // window 5 tokens → shard 0 packs [0,1] (2+3), [2] (4 alone:
      // 2+3+4 > 5 twice over), [3] (oversized 6-token doc, bin alone);
      // shard 1 packs [4,5] (1+4).
      val rows = Seq(
        (0L, "a b"), (1L, "c d e"), (2L, "f g h i"),
        (3L, "one two three four five six"),
        (4L, "j"), (5L, "k l m n"))
      rows.toDF("doc_id", "text").createOrReplaceTempView("pck_src")
      spark.sql(s"INSERT INTO $c.db.docs SELECT * FROM pck_src")
      val rep = spark.sql(s"CALL $c.system.pack_corpus('db', 'docs', " +
        "5, docs_per_shard => 4)").collect().head
      assert(rep.getString(0) == "docs_packed" &&
        rep.getLong(1) == 4L && rep.getLong(2) == 6L &&
        rep.getLong(3) == 5L, s"report $rep")
      val got = spark.sql("SELECT shard, bin, n_docs, n_tokens, " +
        s"packed_text FROM $c.db.docs_packed ORDER BY shard, bin")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getString(4))).toSeq
      assert(got == Seq(
        (0L, 0L, 2L, 5L, "a b c d e"),
        (0L, 1L, 1L, 4L, "f g h i"),
        (0L, 2L, 1L, 6L, "one two three four five six"),
        (1L, 0L, 2L, 5L, "j k l m n")), s"$got")
      // shard-partitioned
      val packedT = loadT(dir, "docs_packed")
      assert(packedT.spec.fields.map(f => (f.name, f.transform)) ==
        Seq(("shard", graft.spec.Transform.Identity)))
      // the pack stamps ride the BIN append, never the create: the
      // create-time metadata (the log's prior version) must carry NO
      // graft.pack.* properties — a crash between the two commits
      // must leave "not a pack_corpus table", never an empty table
      // stamped as fully packed
      val createMeta = graft.spec.MetadataJson.parse(
        new HadoopFileIO().readString(
          packedT.metadata.metadataLog.head.metadataFile))
      assert(!createMeta.properties.keys.exists(_.startsWith(
        "graft.pack.")), s"create metadata must not stamp pack " +
        s"props, has ${createMeta.properties.keys}")
      assert(packedT.metadata.properties.get("graft.pack.window")
        .contains("5"))
      def causes(e: Throwable): String =
        Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
          .map(m => Option(m.getMessage).getOrElse("")).mkString(" | ")
      val e1 = intercept[Exception] { spark.sql(
        s"CALL $c.system.pack_corpus('db', 'docs', 0)") }
      assert(causes(e1).contains("window must be positive"), causes(e1))
      val e2 = intercept[Exception] { spark.sql(
        s"CALL $c.system.pack_corpus('db', 'docs', 5, " +
        "docs_per_shard => 0)") }
      assert(causes(e2).contains("docs_per_shard must be positive"),
        causes(e2))
      val e3 = intercept[Exception] { spark.sql(
        s"CALL $c.system.pack_corpus('db', 'docs', 5)") }
      assert(causes(e3).contains("already exists"), causes(e3))
      val e4 = intercept[Exception] { spark.sql(
        s"CALL $c.system.pack_corpus('db', 'docs', 5, " +
        "text_col => 'nope', target_table => 'p2')") }
      assert(causes(e4).contains("nope"), causes(e4))
      val e5 = intercept[Exception] { spark.sql(
        s"CALL $c.system.pack_corpus('db', 'docs', 5, " +
        "snapshot_id => 12345, target_table => 'p3')") }
      assert(causes(e5).contains("not found"), causes(e5))

      // ---- the incremental chain
      // nothing appended since the full pack → a no-op report
      val r0 = spark.sql(s"CALL $c.system.pack_corpus('db', 'docs', " +
        "5, incremental => true)").collect().head
      assert(r0.getLong(1) == 0L && r0.getLong(2) == 0L, s"$r0")
      // fresh shard (ids 8-9 → shard 2 > packed max-shard 1) chains
      spark.sql(s"INSERT INTO $c.db.docs VALUES (8, 'p q'), (9, 'r')")
      val r1 = spark.sql(s"CALL $c.system.pack_corpus('db', 'docs', " +
        "5, incremental => true)").collect().head
      assert(r1.getLong(1) == 1L && r1.getLong(2) == 2L, s"$r1")
      val chained = spark.sql("SELECT shard, bin, packed_text FROM " +
        s"$c.db.docs_packed WHERE shard = 2").collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
      assert(chained == Seq((2L, 0L, "p q r")), s"$chained")
      // an append into an already-packed shard is refused loudly
      spark.sql(s"INSERT INTO $c.db.docs VALUES (6, 'late arrival')")
      val e6 = intercept[Exception] { spark.sql(
        s"CALL $c.system.pack_corpus('db', 'docs', 5, " +
        "incremental => true)") }
      assert(causes(e6).contains("already-packed shard"), causes(e6))
      // config drift is refused: a chain cannot change the window
      val e7 = intercept[Exception] { spark.sql(
        s"CALL $c.system.pack_corpus('db', 'docs', 7, " +
        "incremental => true)") }
      assert(causes(e7).contains("cannot change the window"), causes(e7))
      // incremental against a missing target
      val e8 = intercept[Exception] { spark.sql(
        s"CALL $c.system.pack_corpus('db', 'docs', 5, " +
        "incremental => true, target_table => 'absent')") }
      assert(causes(e8).contains("does not exist"), causes(e8))

      // ---- snapshot_id-bounded chain (the sibling-chain contract):
      // a fresh lineage packs the current state, two shard batches
      // land, and a chain with snapshot_id => S must pack ONLY the
      // rows up to S and anchor there — the later batch stays
      // unpacked until the next default chain
      spark.sql(s"CALL $c.system.pack_corpus('db', 'docs', 5, " +
        "docs_per_shard => 4, target_table => 'p5')").collect()
      spark.sql(s"INSERT INTO $c.db.docs VALUES (12, 's t'), (13, 'u')")
      val snapS = loadT(dir, "docs").currentSnapshot.get.snapshotId
      spark.sql(s"INSERT INTO $c.db.docs VALUES (16, 'v w x')")
      val rS = spark.sql(s"CALL $c.system.pack_corpus('db', 'docs', " +
        s"5, docs_per_shard => 4, incremental => true, " +
        s"target_table => 'p5', snapshot_id => $snapS)").collect().head
      assert(rS.getLong(2) == 2L && rS.getLong(4) == snapS,
        s"bounded chain must pack ids 12-13 and anchor at $snapS: $rS")
      assert(loadT(dir, "p5").metadata
        .properties("graft.pack.source-snapshot-id") == snapS.toString)
      val shard3 = spark.sql("SELECT packed_text FROM " +
        s"$c.db.p5 WHERE shard = 3").collect().map(_.getString(0)).toSeq
      assert(shard3 == Seq("s t u"), s"$shard3")
      // the default chain then picks up the batch after S
      val rT = spark.sql(s"CALL $c.system.pack_corpus('db', 'docs', " +
        "5, docs_per_shard => 4, incremental => true, " +
        "target_table => 'p5')").collect().head
      assert(rT.getLong(2) == 1L, s"follow-up chain packs id 16: $rT")
      assert(spark.sql(s"SELECT packed_text FROM $c.db.p5 " +
        "WHERE shard = 4").collect().map(_.getString(0)).toSeq ==
        Seq("v w x"))
    }
  }

  test("CALL system.dedup_table mode 'best' keeps the max-quality " +
      "copy per exact-dup cluster and requires quality_col") {
    withCatalog("db2") { (c, _) =>
      import spark.implicits._
      spark.sql(s"CREATE NAMESPACE $c.db")
      spark.sql(s"CREATE TABLE $c.db.docs " +
        "(doc_id BIGINT, text STRING, quality BIGINT)")
      Seq((1L, "alpha beta gamma", 5L), (2L, "alpha  BETA gamma", 9L),
        (3L, "unique text here", 1L), (4L, "alpha beta gamma", 9L))
        .toDF("doc_id", "text", "quality")
        .createOrReplaceTempView("db2_src")
      spark.sql(s"INSERT INTO $c.db.docs SELECT * FROM db2_src")
      val res = spark.sql(s"CALL $c.system.dedup_table('db', 'docs', " +
        s"'best', 'text', 'doc_id', 0.8, 'quality')").collect().head
      assert((res.getLong(0), res.getLong(1), res.getLong(2)) ==
        ((4L, 2L, 2L)), s"report $res")
      // 1/2/4 normalize identically; quality 9 tie -> min id 2 wins
      assert(spark.sql(s"SELECT doc_id FROM $c.db.docs ORDER BY doc_id")
        .collect().map(_.getLong(0)).toSeq == Seq(2L, 3L))
      // mode 'best' without quality_col fails loud
      val e = intercept[Exception] {
        spark.sql(s"CALL $c.system.dedup_table('db', 'docs', 'best')")
      }
      val msgs = Iterator.iterate(e: Throwable)(_.getCause)
        .takeWhile(_ != null).map(m => Option(m.getMessage).getOrElse(""))
        .mkString(" | ")
      assert(msgs.contains("requires quality_col"))
    }
  }

  test("CALL system.cherrypick_snapshot republishes a detached append " +
      "and rejects published / non-append / unknown snapshots") {
    withCatalog("cp") { (c, _) =>
      import spark.implicits._
      spark.sql(s"CREATE NAMESPACE $c.db")
      spark.sql(s"CREATE TABLE $c.db.t (id BIGINT, v STRING)")
      def causes(e: Throwable): String =
        Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
          .map(m => Option(m.getMessage).getOrElse("")).mkString(" | ")
      def snaps(): Map[Long, Option[Long]] =
        spark.sql(s"SELECT snapshot_id, parent_id FROM $c.db.t.snapshots")
          .collect().map(r => r.getLong(0) ->
            (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
      spark.sql(s"INSERT INTO $c.db.t VALUES (1, 'a'), (2, 'b')")
      spark.sql(s"INSERT INTO $c.db.t VALUES (3, 'c')")
      val after2 = snaps()
      val s2 = after2.collectFirst { case (sid, Some(_)) => sid }.get
      val s1 = after2(s2).get
      spark.sql(s"CALL $c.system.rollback_to_snapshot('db', 't', $s1)")
      assert(spark.table(s"$c.db.t").count() == 2)
      val rep = spark.sql(
        s"CALL $c.system.cherrypick_snapshot('db', 't', $s2)")
        .collect().head
      assert(rep.getLong(0) == s2 && rep.getLong(3) == 1L, s"report $rep")
      assert(spark.sql(s"SELECT id FROM $c.db.t ORDER BY id")
        .collect().map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
      // the new head is a NEW snapshot sharing s2's file, so a second
      // pick of s2 must trip the live-file guard
      val eDup = intercept[Exception] {
        spark.sql(s"CALL $c.system.cherrypick_snapshot('db', 't', $s2)")
      }
      assert(causes(eDup).contains("already published"))
      // an ancestor of the current head is rejected outright
      val eAnc = intercept[Exception] {
        spark.sql(s"CALL $c.system.cherrypick_snapshot('db', 't', $s1)")
      }
      assert(causes(eAnc).contains("already an ancestor"))
      // a delete snapshot cannot be cherry-picked
      spark.sql(s"DELETE FROM $c.db.t WHERE id = 1")
      val dRows = spark.sql(s"SELECT snapshot_id FROM $c.db.t.snapshots " +
        "WHERE operation <> 'append'").collect()
      assert(dRows.length == 1)
      val dHead = dRows.head.getLong(0)
      val dParent = snaps()(dHead).get
      spark.sql(s"CALL $c.system.rollback_to_snapshot('db', 't', $dParent)")
      val eOp = intercept[Exception] {
        spark.sql(s"CALL $c.system.cherrypick_snapshot('db', 't', $dHead)")
      }
      assert(causes(eOp).contains("only append snapshots"))
      val eMissing = intercept[Exception] {
        spark.sql(s"CALL $c.system.cherrypick_snapshot('db', 't', 424242)")
      }
      assert(causes(eMissing).contains("not found"))
    }
  }

  test("CALL system.register_table tracks existing metadata in place") {
    withCatalog("rt") { (c, dir) =>
      spark.sql(s"CREATE NAMESPACE $c.db")
      spark.sql(s"CREATE NAMESPACE $c.mirror")
      spark.sql(s"CREATE TABLE $c.db.t (id BIGINT)")
      (1 to 3).foreach(i => spark.sql(s"INSERT INTO $c.db.t VALUES ($i)"))
      val res = spark.sql(
        s"CALL $c.system.register_table('mirror', 't_reg', " +
          s"'$dir/db/t/metadata/v00004.metadata.json')").collect().head
      assert(res.getString(0).nonEmpty && res.getLong(1) != -1L)
      assert(spark.sql(s"SELECT id FROM $c.mirror.t_reg ORDER BY id")
        .collect().map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    }
  }

  test("CALL system.rewrite_manifests compacts the manifest list") {
    withCatalog("rwm") { (c, dir) =>
      spark.sql(s"CREATE NAMESPACE $c.db")
      spark.sql(s"CREATE TABLE $c.db.t (id BIGINT)")
      (1 to 5).foreach(i =>
        spark.sql(s"INSERT INTO $c.db.t VALUES ($i)"))
      def dataManifests(): Long = spark.sql(
        s"SELECT count(*) FROM $c.db.t.manifests WHERE content = 0")
        .collect().head.getLong(0)
      assert(dataManifests() == 5, "one data manifest per append")

      val res = spark.sql(
        s"CALL $c.system.rewrite_manifests('db', 't')").collect().head
      assert(res.getInt(0) == 5 && res.getInt(1) == 1,
        s"5 manifests -> 1, got (${res.getInt(0)}, ${res.getInt(1)})")
      assert(dataManifests() == 1)
      // content identical, history intact (one extra replace snapshot)
      assert(spark.sql(s"SELECT id FROM $c.db.t ORDER BY id").collect()
        .map(_.getLong(0)).toSeq == (1L to 5L))
      val t = loadT(dir, "t")
      assert(t.currentSnapshot.get.summary.get.operation ==
        graft.spec.Operation.Replace)
      // sequence numbers preserved: a MoR delete committed BEFORE the
      // rewrite still applies after it
      spark.sql(s"INSERT INTO $c.db.t VALUES (6)")
      assert(spark.sql(s"SELECT count(*) FROM $c.db.t")
        .collect().head.getLong(0) == 6)
    }
  }

  test("CALL system.remove_orphan_files deletes unreferenced files only") {
    withCatalog("orph") { (c, dir) =>
      spark.sql(s"CREATE NAMESPACE $c.db")
      spark.sql(s"CREATE TABLE $c.db.t (id BIGINT)")
      spark.sql(s"INSERT INTO $c.db.t VALUES (1), (2)")
      val t = loadT(dir, "t")
      // plant an orphan (a crashed write's leftover) in the data dir
      val orphan = t.metadata.location.stripSuffix("/") +
        "/data/orphan-leftover.parquet"
      t.io.writeString(orphan, "not really parquet")
      // dry run reports but keeps it
      val dry = spark.sql(s"CALL $c.system.remove_orphan_files(" +
        s"'db', 't', ${System.currentTimeMillis() + 60000}, true)")
        .collect().head
      assert(dry.getInt(0) == 1 && t.io.exists(orphan))
      // real run removes it; referenced files and metadata survive
      val res = spark.sql(s"CALL $c.system.remove_orphan_files(" +
        s"'db', 't', ${System.currentTimeMillis() + 60000}, false)")
        .collect().head
      assert(res.getInt(0) == 1 && !t.io.exists(orphan))
      assert(spark.sql(s"SELECT id FROM $c.db.t ORDER BY id").collect()
        .map(_.getLong(0)).toSeq == Seq(1L, 2L))
      // default age gate (3 days) protects a fresh leftover
      t.io.writeString(orphan, "fresh in-flight file")
      val guarded = spark.sql(
        s"CALL $c.system.remove_orphan_files('db', 't')").collect().head
      assert(guarded.getInt(0) == 0 && t.io.exists(orphan),
        "age gate must keep files younger than the cutoff")
    }
  }

  test("CALL system.create_changelog_view registers a CDC view") {
    withCatalog("cdc") { (c, dir) =>
      spark.sql(s"CREATE NAMESPACE $c.db")
      spark.sql(s"CREATE TABLE $c.db.t (id BIGINT, v STRING)")
      spark.sql(s"INSERT INTO $c.db.t VALUES (1, 'a'), (2, 'b')")
      val s0 = loadT(dir, "t").currentSnapshot.get.snapshotId
      spark.sql(s"INSERT INTO $c.db.t VALUES (3, 'c')")
      spark.sql(s"DELETE FROM $c.db.t WHERE id = 1")
      val res = spark.sql(
        s"CALL $c.system.create_changelog_view('db', 't', ${s0}L)")
        .collect().head
      assert(res.getString(0) == "t_changes")
      val rows = spark.sql(
        "SELECT id, v, _change_type, _change_ordinal FROM t_changes")
        .collect().map(r => (r.getLong(0), r.getString(1),
          r.getString(2), r.getInt(3))).toSet
      assert(rows.contains((3L, "c", "INSERT", 0)))
      assert(rows.contains((1L, "a", "DELETE", 1)), s"got $rows")
      // net form collapses any CoW rewrite churn (DELETE+INSERT of
      // surviving rows) down to the two real changes
      spark.sql(s"CALL $c.system.create_changelog_view(" +
        s"'db', 't', ${s0}L, -1L, 'net_view', true)")
      val net = spark.sql(
        "SELECT id, _change_type FROM net_view").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      assert(net == Set((3L, "INSERT"), (1L, "DELETE")), s"net=$net")
    }
  }

  test("CALL system.rewrite_data_files: binpack and zorder strategies") {
    withCatalog("rdf") { (c, dir) =>
      spark.sql(s"CREATE NAMESPACE $c.db")
      spark.sql(s"CREATE TABLE $c.db.t (id BIGINT, x BIGINT, y BIGINT)")
      for (k <- 0 until 4)
        spark.sql(s"INSERT INTO $c.db.t VALUES " +
          (0 until 25).map(i => s"(${k * 25 + i}, ${i % 5}, ${i / 5})")
            .mkString(", "))
      val packed = spark.sql(
        s"CALL $c.system.rewrite_data_files('db', 't')").collect().head
      assert(packed.getString(2) == "binpack")
      assert(packed.getInt(1) <= packed.getInt(0),
        s"binpack must not grow the file count: $packed")
      val zed = spark.sql(s"CALL $c.system.rewrite_data_files(" +
        "'db', 't', 'x,y')").collect().head
      assert(zed.getString(2) == "zorder")
      assert(spark.sql(s"SELECT count(*) FROM $c.db.t")
        .collect().head.getLong(0) == 100)
    }
  }

  test("CALL system.train_tokenizer persists an additive ledger; " +
      "chain == rebuild; segment_text matches the library") {
    withCatalog("tok") { (c, dir) =>
      import spark.implicits._
      spark.sql(s"CREATE NAMESPACE $c.db")
      spark.sql(s"CREATE TABLE $c.db.docs (doc_id BIGINT, text STRING)")
      Seq((1L, "ab ab"), (2L, "abc"), (3L, null.asInstanceOf[String]))
        .toDF("doc_id", "text").createOrReplaceTempView("tok_base")
      spark.sql(s"INSERT INTO $c.db.docs SELECT * FROM tok_base")
      val rep = spark.sql(s"CALL $c.system.train_tokenizer(" +
        s"'db', 'docs', max_piece_len => 2)").collect().head
      // words: ab x2, abc x1 -> pieces a:3 b:3 c:1 ab:3 bc:1
      assert(rep.getString(0) == "docs_tok_model" &&
        rep.getLong(1) == 5L && rep.getLong(2) == 11L, s"report $rep")
      val props = loadT(dir, "docs_tok_model").metadata.properties
      assert(props("graft.tok-model.total-cnt") == "11" &&
        props("graft.tok-model.max-piece-len") == "2", props.toString)
      // segment_text == the library's segmentation of the same words
      val viaSql = spark.sql(s"CALL $c.system.segment_text(" +
        s"'db', 'docs_tok_model', 'Ab abc!', vocab_size => 2)")
        .collect().map(r => (r.getString(0), r.getString(1),
          r.getLong(2), r.getLong(3)))
      val mdl = loadT(dir, "docs_tok_model")
      val (vocab, qlogT) = graft.ops.Unigram.vocabFromCounts(
        graft.table.Scan(mdl, spark).toDF, 2, 11L)
      val viaLib = graft.ops.Unigram.segmentWords(
          Seq("ab", "abc").toDF("word"), vocab, qlogT, 2)
        .orderBy("word").collect()
        .map(r => (r.getString(0), r.getSeq[String](1).mkString(" "),
          r.getLong(2), r.getLong(3)))
      assert(viaSql.toSeq == viaLib.toSeq, s"sql $viaSql lib $viaLib")
      // hand-check: 'abc' ties [ab c] and [a bc] at equal score ->
      // the lexicographically smaller [a bc] must win
      assert(viaSql(1)._2 == "a bc", viaSql(1).toString)
      // incremental chain: word 'b' adds one ledger row, total 11+1
      spark.sql(s"INSERT INTO $c.db.docs VALUES (4, 'b')")
      val rep2 = spark.sql(s"CALL $c.system.train_tokenizer(" +
        s"'db', 'docs', incremental => true)").collect().head
      assert(rep2.getLong(1) == 1L && rep2.getLong(2) == 12L,
        s"chain report $rep2")
      val props2 = loadT(dir, "docs_tok_model").metadata.properties
      assert(props2("graft.tok-model.total-cnt") == "12" &&
        props2("graft.tok-model.source-snapshot-id") ==
          rep2.getLong(3).toString, props2.toString)
      // no-op re-chain appends nothing
      val rep3 = spark.sql(s"CALL $c.system.train_tokenizer(" +
        s"'db', 'docs', incremental => true)").collect().head
      assert(rep3.getLong(1) == 0L && rep3.getLong(2) == 12L, s"$rep3")
      // chained ledger (duplicate piece rows, sum-merged at read)
      // == a from-scratch train over the full corpus
      val full = spark.sql(s"SELECT doc_id, text FROM $c.db.docs")
      val (fsVocab, fsQlogT) = graft.ops.Unigram.trainVocab(full,
        vocabSize = 2, maxPieceLen = 2)
      val mdl2 = loadT(dir, "docs_tok_model")
      val (chVocab, chQlogT) = graft.ops.Unigram.vocabFromCounts(
        graft.table.Scan(mdl2, spark).toDF, 2,
        props2("graft.tok-model.total-cnt").toLong)
      assert(chQlogT == fsQlogT)
      val canon = (df: org.apache.spark.sql.DataFrame) =>
        df.orderBy("piece").collect()
          .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      assert(canon(chVocab) == canon(fsVocab),
        "chained model must equal a from-scratch train")
    }
  }

  test("train_tokenizer / segment_text error surface") {
    withCatalog("toke") { (c, _) =>
      import spark.implicits._
      spark.sql(s"CREATE NAMESPACE $c.db")
      spark.sql(s"CREATE TABLE $c.db.docs (doc_id BIGINT, text STRING)")
      spark.sql(s"INSERT INTO $c.db.docs VALUES (1, 'hello world')")
      def causes(e: Throwable): String =
        Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
          .map(_.getMessage).mkString(" | ")
      // bad max_piece_len
      val e1 = intercept[Exception] { spark.sql(
        s"CALL $c.system.train_tokenizer('db', 'docs', " +
          "max_piece_len => 0)").collect() }
      assert(causes(e1).contains("max_piece_len"), causes(e1))
      // incremental before any full train
      val e2 = intercept[Exception] { spark.sql(
        s"CALL $c.system.train_tokenizer('db', 'docs', " +
          "incremental => true)").collect() }
      assert(causes(e2).contains("does not exist"), causes(e2))
      spark.sql(s"CALL $c.system.train_tokenizer('db', 'docs')")
        .collect()
      // chain with a mismatched text column
      val e3 = intercept[Exception] { spark.sql(
        s"CALL $c.system.train_tokenizer('db', 'docs', " +
          "text_col => 'other', incremental => true)").collect() }
      assert(causes(e3).contains("trained on"), causes(e3))
      // chain asking for a different (non-default) piece length: the
      // ledger's candidate universe is fixed at train time, so this
      // must error instead of silently using the stamped value
      val e3b = intercept[Exception] { spark.sql(
        s"CALL $c.system.train_tokenizer('db', 'docs', " +
          "max_piece_len => 7, incremental => true)").collect() }
      assert(causes(e3b).contains("cannot change the piece length"),
        causes(e3b))
      // segment_text against a table that is not a tokenizer model
      val e4 = intercept[Exception] { spark.sql(
        s"CALL $c.system.segment_text('db', 'docs', 'hello')")
        .collect() }
      assert(causes(e4).contains("not a train_tokenizer"), causes(e4))
      // empty text -> empty result set, no error
      assert(spark.sql(s"CALL $c.system.segment_text(" +
        s"'db', 'docs_tok_model', '!!!')").collect().isEmpty)
    }
  }

  test("CALL system.train_lm persists an additive gram ledger; " +
      "chain == rebuild; score_text backoff arithmetic is exact") {
    withCatalog("lm") { (c, dir) =>
      import spark.implicits._
      spark.sql(s"CREATE NAMESPACE $c.db")
      spark.sql(s"CREATE TABLE $c.db.docs (doc_id BIGINT, text STRING)")
      Seq((1L, "a b c a b c"), (2L, "a b x"),
          (3L, null.asInstanceOf[String]))
        .toDF("doc_id", "text").createOrReplaceTempView("lm_base")
      spark.sql(s"INSERT INTO $c.db.docs SELECT * FROM lm_base")
      val rep = spark.sql(s"CALL $c.system.train_lm('db', 'docs')")
        .collect().head
      // ug a3 b3 c2 x1 | bg ab3 bc2 ca1 bx1 | tri abc2 bca1 cab1 abx1
      assert(rep.getString(0) == "docs_lm_model" &&
        rep.getLong(1) == 12L && rep.getLong(2) == 9L, s"report $rep")
      val props = loadT(dir, "docs_lm_model").metadata.properties
      assert(props("graft.lm-model.total-tokens") == "9" &&
        props("graft.lm-model.source-table") == "db.docs",
        props.toString)
      val P = graft.ops.LangModel.ProbScale
      // trigram hit + OOV: (a,b,c) -> P*2 div 3; (b,c,d) -> OOV 0
      val s1 = spark.sql(s"CALL $c.system.score_text(" +
        s"'db', 'docs_lm_model', 'a b c d')").collect().head
      assert((s1.getLong(0), s1.getLong(1), s1.getLong(4),
        s1.getLong(5)) == ((2L, 1L, 1L, 2L * P / 3)), s1.toString)
      assert(s1.getDouble(6) == 0.333333, s1.toString)
      // bigram backoff: (x,a,b) -> trigram absent, bigram (a,b) n2=3
      // with context n1(a)=3 -> 2P*3 div (5*3) = 2P/5
      val s2 = spark.sql(s"CALL $c.system.score_text(" +
        s"'db', 'docs_lm_model', 'x a b')").collect().head
      assert((s2.getLong(0), s2.getLong(2), s2.getLong(5)) ==
        ((1L, 1L, 2L * P * 3 / (5 * 3))), s2.toString)
      // unigram backoff: (q,q,c) -> 4P*n1(c)=2 div (25*T=9)
      val s3 = spark.sql(s"CALL $c.system.score_text(" +
        s"'db', 'docs_lm_model', 'q q c')").collect().head
      assert((s3.getLong(0), s3.getLong(3), s3.getLong(5)) ==
        ((1L, 1L, 4L * P * 2 / (25 * 9))), s3.toString)
      // too short to score -> zero row, no error
      val s4 = spark.sql(s"CALL $c.system.score_text(" +
        s"'db', 'docs_lm_model', 'a b')").collect().head
      assert(s4.getLong(0) == 0L && s4.getDouble(6) == 0.0, s4.toString)
      // incremental chain: 'c c' adds ug c:2 + bg cc:1 rows, total 9+2
      spark.sql(s"INSERT INTO $c.db.docs VALUES (4, 'c c')")
      val rep2 = spark.sql(s"CALL $c.system.train_lm(" +
        s"'db', 'docs', incremental => true)").collect().head
      assert(rep2.getLong(1) == 2L && rep2.getLong(2) == 11L,
        s"chain report $rep2")
      val props2 = loadT(dir, "docs_lm_model").metadata.properties
      assert(props2("graft.lm-model.total-tokens") == "11" &&
        props2("graft.lm-model.source-snapshot-id") ==
          rep2.getLong(3).toString, props2.toString)
      // no-op re-chain appends nothing
      val rep3 = spark.sql(s"CALL $c.system.train_lm(" +
        s"'db', 'docs', incremental => true)").collect().head
      assert(rep3.getLong(1) == 0L && rep3.getLong(2) == 11L, s"$rep3")
      // chained ledger (duplicate gram rows, sum-merged) == a
      // from-scratch gramCounts over the full corpus
      val full = spark.sql(s"SELECT doc_id, text FROM $c.db.docs")
      def canon(df: org.apache.spark.sql.DataFrame) =
        df.groupBy("n", "w1", "w2", "w3")
          .agg(org.apache.spark.sql.functions.sum("cnt").as("cnt"))
          .collect()
          .map(r => (r.getInt(0), r.getString(1), Option(r.getString(2)),
            Option(r.getString(3)), r.getLong(4))).sortBy(_.toString)
          .toSeq
      val chained = canon(
        graft.table.Scan(loadT(dir, "docs_lm_model"), spark).toDF)
      val scratch = canon(graft.ops.LangModel.gramCounts(full))
      assert(chained == scratch,
        "chained ledger must equal a from-scratch train")
    }
  }

  test("train_lm / train_classifier chains survive source compaction: " +
      "replace snapshots are never re-delivered") {
    withCatalog("lmc") { (c, dir) =>
      spark.sql(s"CREATE NAMESPACE $c.db")
      spark.sql(s"CREATE TABLE $c.db.docs " +
        "(doc_id BIGINT, lang STRING, text STRING)")
      spark.sql(s"INSERT INTO $c.db.docs VALUES " +
        "(1, 'en', 'a b c'), (2, 'fr', 'b c d')")
      spark.sql(s"CALL $c.system.train_lm('db', 'docs')").collect()
      spark.sql(s"CALL $c.system.train_classifier('db', 'docs', " +
        "'lang = ''en''')").collect()
      // grow the table in two small appends, then COMPACT — the
      // rewrite commits a replace snapshot containing every row
      spark.sql(s"INSERT INTO $c.db.docs VALUES (3, 'en', 'c d')")
      spark.sql(s"INSERT INTO $c.db.docs VALUES (4, 'fr', 'd e')")
      spark.sql(s"CALL $c.system.compact('db', 'docs')").collect()
      // chain across the compaction: only docs 3 and 4 are deltas
      val lm = spark.sql(s"CALL $c.system.train_lm('db', 'docs', " +
        "incremental => true)").collect().head
      val clf = spark.sql(s"CALL $c.system.train_classifier(" +
        s"'db', 'docs', 'lang = ''en''', incremental => true)")
        .collect().head
      // full-recount totals: tokens 3+3+2+2 = 10; pos (en) 3+2 = 5,
      // neg (fr) 3+2 = 5 — a re-delivered compaction rewrite would
      // roughly double these
      assert(lm.getLong(2) == 10L, s"lm chained total: $lm")
      assert(clf.getLong(2) == 5L && clf.getLong(3) == 5L,
        s"clf chained totals: $clf")
      // and the chained ledgers equal from-scratch builds
      val full = spark.sql(
        s"SELECT doc_id, lang, text FROM $c.db.docs")
      def canonLm(df: org.apache.spark.sql.DataFrame) =
        df.groupBy("n", "w1", "w2", "w3")
          .agg(org.apache.spark.sql.functions.sum("cnt").as("cnt"))
          .collect().map(r => (r.getInt(0), r.getString(1),
            Option(r.getString(2)), Option(r.getString(3)),
            r.getLong(4))).sortBy(_.toString).toSeq
      assert(canonLm(graft.table.Scan(loadT(dir, "docs_lm_model"),
          spark).toDF) ==
        canonLm(graft.ops.LangModel.gramCounts(full)),
        "LM chain across compaction must equal a full retrain")
      val viaLedger = graft.ops.Classifier.weightsFromCounts(
          graft.table.Scan(loadT(dir, "docs_clf_model"), spark).toDF)
        .orderBy("bucket").collect().map(_.toSeq).toSeq
      val scratch = graft.ops.Classifier.fit(
          full.where(org.apache.spark.sql.functions
            .col("lang") === "en"),
          full.where(org.apache.spark.sql.functions
            .col("lang") =!= "en"))
        .orderBy("bucket").collect().map(_.toSeq).toSeq
      assert(viaLedger == scratch,
        "classifier chain across compaction must equal a full refit")
    }
  }

  test("train_lm / score_text error surface") {
    withCatalog("lme") { (c, _) =>
      spark.sql(s"CREATE NAMESPACE $c.db")
      spark.sql(s"CREATE TABLE $c.db.docs (doc_id BIGINT, text STRING)")
      spark.sql(s"INSERT INTO $c.db.docs VALUES (1, 'hello world now')")
      spark.sql(s"CREATE TABLE $c.db.docs2 (doc_id BIGINT, text STRING)")
      spark.sql(s"INSERT INTO $c.db.docs2 VALUES (1, 'other corpus')")
      def causes(e: Throwable): String =
        Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
          .map(_.getMessage).mkString(" | ")
      // incremental before any full train
      val e1 = intercept[Exception] { spark.sql(
        s"CALL $c.system.train_lm('db', 'docs', " +
          "incremental => true)").collect() }
      assert(causes(e1).contains("does not exist"), causes(e1))
      spark.sql(s"CALL $c.system.train_lm('db', 'docs')").collect()
      // chain with a mismatched text column
      val e2 = intercept[Exception] { spark.sql(
        s"CALL $c.system.train_lm('db', 'docs', " +
          "text_col => 'other', incremental => true)").collect() }
      assert(causes(e2).contains("trained on"), causes(e2))
      // chain against the wrong source table
      val e3 = intercept[Exception] { spark.sql(
        s"CALL $c.system.train_lm('db', 'docs2', " +
          "model_table => 'docs_lm_model', incremental => true)")
        .collect() }
      assert(causes(e3).contains("was trained from"), causes(e3))
      // score_text against a table that is not an LM model
      val e4 = intercept[Exception] { spark.sql(
        s"CALL $c.system.score_text('db', 'docs', 'hello')")
        .collect() }
      assert(causes(e4).contains("not a train_lm"), causes(e4))
    }
  }

  test("CALL system.train_classifier persists an additive bucket " +
      "ledger; chain == rebuild; classify_text weights are exact") {
    withCatalog("clf") { (c, dir) =>
      import spark.implicits._
      spark.sql(s"CREATE NAMESPACE $c.db")
      spark.sql(s"CREATE TABLE $c.db.docs " +
        "(doc_id BIGINT, lab BOOLEAN, text STRING)")
      Seq((1L, java.lang.Boolean.TRUE, "x x y"),
          (2L, java.lang.Boolean.FALSE, "y z"),
          (3L, null.asInstanceOf[java.lang.Boolean], "z z z"),
          (4L, java.lang.Boolean.TRUE, null.asInstanceOf[String]))
        .toDF("doc_id", "lab", "text")
        .createOrReplaceTempView("clf_base")
      spark.sql(s"INSERT INTO $c.db.docs SELECT * FROM clf_base")
      val rep = spark.sql(s"CALL $c.system.train_classifier(" +
        s"'db', 'docs', 'lab')").collect().head
      // pos: x2 y1 | neg: y1 z1 (NULL label doc 3 in neither;
      // NULL text doc 4 contributes nothing) -> 3 bucket rows
      assert(rep.getString(0) == "docs_clf_model" &&
        rep.getLong(1) == 3L && rep.getLong(2) == 3L &&
        rep.getLong(3) == 2L, s"report $rep")
      val S = graft.ops.Classifier.Scale
      // w(x) = S*3 div 4 - S/2; w(y) = 0; q unseen -> 0
      val s1 = spark.sql(s"CALL $c.system.classify_text(" +
        s"'db', 'docs_clf_model', 'x y q')").collect().head
      assert((s1.getLong(0), s1.getLong(1), s1.getBoolean(3)) ==
        ((3L, S * 3 / 4 - S / 2, true)), s1.toString)
      // w(z) = S*1 div 3 - S/2, twice; negative margin -> reject
      val s2 = spark.sql(s"CALL $c.system.classify_text(" +
        s"'db', 'docs_clf_model', 'z z')").collect().head
      assert((s2.getLong(0), s2.getLong(1), s2.getBoolean(3)) ==
        ((2L, 2 * (S / 3 - S / 2), false)), s2.toString)
      // incremental chain: (5, false, 'x') adds one delta row for x
      spark.sql(s"INSERT INTO $c.db.docs VALUES (5, false, 'x')")
      val rep2 = spark.sql(s"CALL $c.system.train_classifier(" +
        s"'db', 'docs', 'lab', incremental => true)").collect().head
      assert(rep2.getLong(1) == 1L && rep2.getLong(2) == 3L &&
        rep2.getLong(3) == 3L, s"chain report $rep2")
      // chained weight w(x) = S*3 div 5 - S/2 = S/10
      val s3 = spark.sql(s"CALL $c.system.classify_text(" +
        s"'db', 'docs_clf_model', 'x')").collect().head
      assert((s3.getLong(0), s3.getLong(1), s3.getBoolean(3)) ==
        ((1L, S * 3 / 5 - S / 2, true)), s3.toString)
      // no-op re-chain appends nothing
      val rep3 = spark.sql(s"CALL $c.system.train_classifier(" +
        s"'db', 'docs', 'lab', incremental => true)").collect().head
      assert(rep3.getLong(1) == 0L, s"$rep3")
      // chained ledger sum-merge == from-scratch labelCounts
      val full = spark.sql(s"SELECT * FROM $c.db.docs")
      def canon(df: org.apache.spark.sql.DataFrame) =
        df.groupBy("bucket").agg(
            org.apache.spark.sql.functions.sum("p_cnt").as("p"),
            org.apache.spark.sql.functions.sum("n_cnt").as("n"))
          .collect()
          .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
          .sortBy(_._1).toSeq
      assert(canon(graft.table.Scan(loadT(dir, "docs_clf_model"),
          spark).toDF) ==
        canon(graft.ops.Classifier.labelCounts(full,
          org.apache.spark.sql.functions.col("lab"))),
        "chained ledger must equal a from-scratch fit")
    }
  }

  test("train_classifier / classify_text error surface") {
    withCatalog("clfe") { (c, _) =>
      spark.sql(s"CREATE NAMESPACE $c.db")
      spark.sql(s"CREATE TABLE $c.db.docs " +
        "(doc_id BIGINT, lang STRING, text STRING)")
      spark.sql(s"INSERT INTO $c.db.docs VALUES (1, 'en', 'hi there')")
      def causes(e: Throwable): String =
        Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
          .map(_.getMessage).mkString(" | ")
      // incremental before any full train
      val e1 = intercept[Exception] { spark.sql(
        s"CALL $c.system.train_classifier('db', 'docs', " +
          "'lang = ''en''', incremental => true)").collect() }
      assert(causes(e1).contains("does not exist"), causes(e1))
      spark.sql(s"CALL $c.system.train_classifier('db', 'docs', " +
        "'lang = ''en''')").collect()
      // chain with a different label predicate must refuse
      val e2 = intercept[Exception] { spark.sql(
        s"CALL $c.system.train_classifier('db', 'docs', " +
          "'lang = ''fr''', incremental => true)").collect() }
      assert(causes(e2).contains("was labeled by"), causes(e2))
      // chain with a mismatched text column
      val e3 = intercept[Exception] { spark.sql(
        s"CALL $c.system.train_classifier('db', 'docs', " +
          "'lang = ''en''', text_col => 'other', " +
          "incremental => true)").collect() }
      assert(causes(e3).contains("trained on"), causes(e3))
      // classify_text against a table that is not a classifier model
      val e4 = intercept[Exception] { spark.sql(
        s"CALL $c.system.classify_text('db', 'docs', 'hello')")
        .collect() }
      assert(causes(e4).contains("not a train_classifier"), causes(e4))
      // zero-token text -> margin-0 reject row, no error (note '!!!'
      // WOULD count as one whitespace token — the classifier buckets
      // raw whitespace tokens, unlike the tokenizer's [a-z0-9]+ words)
      val s0 = spark.sql(s"CALL $c.system.classify_text(" +
        s"'db', 'docs_clf_model', '')").collect().head
      assert(s0.getLong(0) == 0L && !s0.getBoolean(3), s0.toString)
    }
  }

  test("ancestors_of: newest-first lineage walk with parent links " +
      "and operations; snapshot-pinned walk is a suffix") {
    withCatalog("anc") { (c, dir) =>
      spark.sql(s"CREATE NAMESPACE $c.db")
      spark.sql(s"CREATE TABLE $c.db.t (id BIGINT)")
      (1 to 3).foreach(i =>
        spark.sql(s"INSERT INTO $c.db.t VALUES ($i)"))
      val rows = spark.sql(s"CALL $c.system.ancestors_of('db', 't')")
        .collect()
      assert(rows.length == 3, rows.mkString(","))
      // newest first; each row's parent is the next row's id
      assert(rows(0).getLong(0) ==
        loadT(dir, "t").currentSnapshot.get.snapshotId)
      assert(rows(0).getLong(1) == rows(1).getLong(0) &&
        rows(1).getLong(1) == rows(2).getLong(0))
      assert(rows(2).isNullAt(1), "root has no parent")
      assert(rows.forall(_.getString(3) == "append"),
        rows.map(_.getString(3)).mkString(","))
      assert(rows(0).getLong(2) >= rows(2).getLong(2),
        "timestamps must not decrease toward the head")
      // pinned walk from the middle snapshot is the 2-row suffix
      val mid = rows(1).getLong(0)
      val sub = spark.sql(s"CALL $c.system.ancestors_of('db', 't', " +
        s"snapshot_id => ${mid}L)").collect()
      assert(sub.map(_.getLong(0)).toSeq ==
        rows.drop(1).map(_.getLong(0)).toSeq, sub.mkString(","))
      def causes(e: Throwable): String =
        Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
          .map(_.getMessage).mkString(" | ")
      val e1 = intercept[Exception] { spark.sql(
        s"CALL $c.system.ancestors_of('db', 't', " +
          "snapshot_id => 999L)").collect() }
      assert(causes(e1).contains("snapshot_id"), causes(e1))
    }
  }

  test("corpus_stats: hand-counted totals; snapshot-addressed audit") {
    withCatalog("cst") { (c, dir) =>
      spark.sql(s"CREATE NAMESPACE $c.db")
      spark.sql(s"CREATE TABLE $c.db.docs (doc_id BIGINT, text STRING)")
      spark.sql(s"INSERT INTO $c.db.docs VALUES " +
        "(1, 'A  b'), (2, NULL), (3, 'c c')")
      val snap0 = loadT(dir, "docs").currentSnapshot.get.snapshotId
      val s0 = spark.sql(s"CALL $c.system.corpus_stats('db', 'docs')")
        .collect().head
      // 'A  b' -> 'a b' (2 toks, 4 raw chars); 'c c' (2 toks, 3 chars)
      assert((s0.getLong(1), s0.getLong(2), s0.getLong(3),
        s0.getLong(4), s0.getLong(5)) == ((3L, 1L, 7L, 4L, 3L)),
        s0.toString)
      // mutate, then audit BOTH states: head sees the change, the
      // pinned snapshot still reports the original totals
      spark.sql(s"INSERT INTO $c.db.docs VALUES (4, 'b b')")
      val s1 = spark.sql(s"CALL $c.system.corpus_stats('db', 'docs')")
        .collect().head
      assert((s1.getLong(1), s1.getLong(3), s1.getLong(4),
        s1.getLong(5)) == ((4L, 10L, 6L, 3L)), s1.toString)
      val sOld = spark.sql(s"CALL $c.system.corpus_stats(" +
        s"'db', 'docs', snapshot_id => ${snap0}L)").collect().head
      assert(sOld.getLong(0) == snap0 && sOld.getLong(1) == 3L &&
        sOld.getLong(4) == 4L, sOld.toString)
      def causes(e: Throwable): String =
        Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
          .map(_.getMessage).mkString(" | ")
      val e1 = intercept[Exception] { spark.sql(
        s"CALL $c.system.corpus_stats('db', 'docs', " +
          "snapshot_id => 12345L)").collect() }
      assert(causes(e1).contains("snapshot_id"), causes(e1))
    }
  }

  test("corpus_diff: self-diff is all-unchanged; bad snapshots error") {
    withCatalog("cdf") { (c, dir) =>
      spark.sql(s"CREATE NAMESPACE $c.db")
      spark.sql(s"CREATE TABLE $c.db.docs (doc_id BIGINT, text STRING)")
      spark.sql(s"INSERT INTO $c.db.docs VALUES " +
        "(1, 'alpha'), (2, 'beta'), (3, NULL)")
      val snap = loadT(dir, "docs").currentSnapshot.get.snapshotId
      val self = spark.sql(s"CALL $c.system.corpus_diff(" +
        s"'db', 'docs', ${snap}L)").collect().head
      // NULL text fingerprints to the sentinel: NULL-vs-NULL unchanged
      assert((self.getLong(2), self.getLong(3), self.getLong(4),
        self.getLong(5)) == ((0L, 0L, 0L, 3L)), self.toString)
      // a NULL -> non-NULL rewrite counts as changed
      spark.sql(s"UPDATE $c.db.docs SET text = 'now set' " +
        "WHERE doc_id = 3")
      val d2 = spark.sql(s"CALL $c.system.corpus_diff(" +
        s"'db', 'docs', ${snap}L)").collect().head
      assert((d2.getLong(2), d2.getLong(3), d2.getLong(4),
        d2.getLong(5)) == ((0L, 0L, 1L, 2L)), d2.toString)
      def causes(e: Throwable): String =
        Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
          .map(_.getMessage).mkString(" | ")
      val e1 = intercept[Exception] { spark.sql(
        s"CALL $c.system.corpus_diff('db', 'docs', 12345L)").collect() }
      assert(causes(e1).contains("from_snapshot"), causes(e1))
      val e2 = intercept[Exception] { spark.sql(
        s"CALL $c.system.corpus_diff('db', 'docs', ${snap}L, " +
          "to_snapshot => 999L)").collect() }
      assert(causes(e2).contains("to_snapshot"), causes(e2))
    }
  }

  test("unknown procedure errors with the available list") {
    withCatalog("nop") { (c, _) =>
      val e = intercept[Exception] {
        spark.sql(s"CALL $c.system.nope('a','b')").collect()
      }
      // Spark wraps the catalog's message in FAILED_TO_LOAD_ROUTINE;
      // the available-procedures hint lives in the cause chain
      val msgs = Iterator.iterate(e: Throwable)(_.getCause)
        .takeWhile(_ != null).map(_.getMessage).mkString(" | ")
      assert(msgs.contains("nope"), s"got: $msgs")
    }
  }
}
