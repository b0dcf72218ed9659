package graft.spec

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Arbitrary, Gen}
import org.scalacheck.rng.Seed

/** Deterministic sampling bridge (scalatestplus isn't in the offline
  * cache, so property tests drive scalacheck Gens directly). */
trait GenSampling {
  def forAllSamples[A](gen: Gen[A], n: Int = 60)(f: A => Unit): Unit = {
    var seed = Seed(42L)
    var i = 0
    while (i < n) {
      gen.apply(Gen.Parameters.default, seed).foreach { a => f(a); i += 1 }
      seed = seed.next
    }
  }
}

/** Ports of the reference's spec unit suites (spec/types_test.go,
  * spec/schema_test.go) plus property-based JSON round-trips the
  * reference never had (SURVEY §5.2 item 2). */
class TypesSpec extends AnyFunSuite {

  test("primitive type string forms (types_test.go:7-34)") {
    assert(BooleanType.typeString == "boolean")
    assert(IntType.typeString == "int")
    assert(LongType.typeString == "long")
    assert(FloatType.typeString == "float")
    assert(DoubleType.typeString == "double")
    assert(DateType.typeString == "date")
    assert(TimeType.typeString == "time")
    assert(TimestampType.typeString == "timestamp")
    assert(TimestampTzType.typeString == "timestamptz")
    assert(StringType.typeString == "string")
    assert(UUIDType.typeString == "uuid")
    assert(BinaryType.typeString == "binary")
  }

  test("fixed type (types_test.go)") {
    val t = FixedType(16)
    assert(t.typeString == "fixed[16]")
    assert(IcebergType.parse("fixed[16]") == t)
    assert(t != FixedType(8))
  }

  test("decimal type (types_test.go:78-91)") {
    val t = DecimalType(10, 2)
    assert(t.typeString == "decimal(10, 2)")
    assert(IcebergType.parse("decimal(10, 2)") == t)
    assert(IcebergType.parse("decimal(10,2)") == t)
    assert(t != DecimalType(10, 3))
  }

  test("struct type with field lookup") {
    val st = StructType(Seq(
      NestedField(1, "id", LongType, required = true),
      NestedField(2, "name", StringType, required = false)))
    assert(st.field(1).exists(_.name == "id"))
    assert(st.fieldByName("name").exists(_.id == 2))
    assert(st.field(99).isEmpty)
    assert(st.typeString ==
      "struct<1: id: required long, 2: name: optional string>")
  }

  test("map type (types_test.go:126-153)") {
    val mt = MapType(101, StringType, 102, IntType, valueRequired = true)
    assert(mt.typeString == "map<string, int>")
    assert(mt == MapType(101, StringType, 102, IntType, valueRequired = true))
    assert(mt != MapType(101, StringType, 103, IntType, valueRequired = true))
  }

  test("parse rejects unknown types") {
    intercept[IllegalArgumentException](IcebergType.parse("varchar(10)"))
  }
}

class SchemaSpec extends AnyFunSuite {
  // A2 fixture: nested schema (spec/schema_test.go:79-116)
  private val nested = Schema(1, Seq(
    NestedField(1, "id", LongType, required = true),
    NestedField(2, "name", StringType, required = true),
    NestedField(3, "address", StructType(Seq(
      NestedField(100, "street", StringType, required = true),
      NestedField(101, "city", StringType, required = true),
      NestedField(102, "zip", StringType, required = false))),
      required = false),
    NestedField(4, "tags",
      ListType(103, StringType, elementRequired = true), required = false),
    NestedField(5, "metadata",
      MapType(104, StringType, 105, StringType, valueRequired = false),
      required = false)))

  test("highestFieldID recurses into nested types (schema.go:53-90)") {
    assert(nested.highestFieldId == 105)
  }

  test("field access") {
    assert(nested.fieldByName("address").exists(_.id == 3))
    assert(nested.field(4).exists(_.name == "tags"))
    assert(nested.numFields == 5)
  }

  test("JSON round-trip of nested schema") {
    val json = nested.toJson
    val back = Schema.fromJson(json)
    assert(back == nested)
  }

  test("identifier field ids survive JSON") {
    val s = Schema(7, Seq(NestedField(1, "id", LongType, required = true)),
      identifierFieldIds = Seq(1))
    assert(Schema.fromJson(s.toJson) == s)
  }
}

object SpecGens {
  val genPrimitive: Gen[IcebergType] = Gen.oneOf(
    Gen.oneOf[IcebergType](BooleanType, IntType, LongType, FloatType,
      DoubleType, DateType, TimeType, TimestampType, TimestampTzType,
      StringType, UUIDType, BinaryType),
    Gen.choose(1, 64).map(FixedType(_)),
    for { p <- Gen.choose(1, 38); s <- Gen.choose(0, p) }
      yield DecimalType(p, s))

  def genType(depth: Int, ids: Iterator[Int]): Gen[IcebergType] =
    if (depth <= 0) genPrimitive
    else Gen.frequency(
      6 -> genPrimitive,
      1 -> Gen.lzy(for {
        n <- Gen.choose(1, 3)
        fs <- Gen.listOfN(n, genField(depth - 1, ids))
      } yield StructType(fs)),
      1 -> Gen.lzy(for {
        e <- genType(depth - 1, ids); req <- Arbitrary.arbBool.arbitrary
      } yield ListType(ids.next(), e, req)),
      1 -> Gen.lzy(for {
        k <- genPrimitive; v <- genType(depth - 1, ids)
        req <- Arbitrary.arbBool.arbitrary
      } yield MapType(ids.next(), k, ids.next(), v, req)))

  def genField(depth: Int, ids: Iterator[Int]): Gen[NestedField] = for {
    name <- Gen.identifier.map(_.take(12))
    t <- genType(depth, ids)
    req <- Arbitrary.arbBool.arbitrary
    doc <- Gen.option(Gen.alphaNumStr.map(_.take(20)))
  } yield NestedField(ids.next(), name, t, req, doc)

  val genSchema: Gen[Schema] = Gen.sized { _ =>
    val ids = Iterator.from(1)
    for {
      n <- Gen.choose(1, 6)
      fields <- Gen.listOfN(n, genField(2, ids))
      sid <- Gen.choose(0, 10)
    } yield Schema(sid, fields)
  }
}

class SchemaPropertySpec extends AnyFunSuite with GenSampling {
  test("arbitrary schema JSON round-trips exactly") {
    forAllSamples(SpecGens.genSchema) { s =>
      assert(Schema.fromJson(s.toJson) == s)
    }
  }

  test("arbitrary schema survives Spark StructType round-trip") {
    forAllSamples(SpecGens.genSchema) { s =>
      val spark = SchemaConverters.toSparkSchema(s)
      val back = SchemaConverters.fromSparkSchema(spark, s.schemaId)
      // Nested list/map position IDs are not representable in Spark
      // metadata, so compare names/types/nullability + top-level IDs.
      assert(back.schemaId == s.schemaId)
      assert(back.fields.map(f => (f.id, f.name, f.required)) ==
        s.fields.map(f => (f.id, f.name, f.required)))
    }
  }
}

class PartitionSpecSpec extends AnyFunSuite {
  test("transform parse/print round-trip") {
    for (t <- Seq("identity", "year", "month", "day", "hour", "void",
        "bucket[4]", "truncate[3]")) {
      assert(Transform.parse(t).name == t)
    }
  }

  test("builder assigns field ids from 1000 (partition.go:113)") {
    val spec = PartitionSpec.builder(0)
      .day(4, "created_day")
      .bucket(1, "id_bucket", 4)
      .build()
    assert(spec.fields.map(_.fieldId) == Seq(1000, 1001))
    assert(spec.lastFieldId == 1001)
    assert(!spec.isUnpartitioned)
  }

  test("partitionType resolves source fields") {
    val schema = Schema(0, Seq(
      NestedField(1, "id", LongType, required = true),
      NestedField(2, "ts", TimestampType, required = true)))
    val spec = PartitionSpec.builder(0)
      .identity(1, "id").month(2, "ts_month").build()
    val pt = spec.partitionType(schema)
    assert(pt.fields.map(_.fieldType) == Seq(LongType, IntType))
  }
}

class MetadataSpec extends AnyFunSuite {
  private val schema = Schema(0, Seq(
    NestedField(1, "id", LongType, required = true),
    NestedField(2, "name", StringType, required = true),
    NestedField(3, "email", StringType, required = false),
    NestedField(4, "created_at", TimestampType, required = true)))

  test("new table metadata (metadata.go:194-233)") {
    val m = TableMetadata.newTable("uuid-1", "file:///tmp/t", schema)
    assert(m.formatVersion == 2)
    assert(m.lastColumnId == 4)
    assert(m.currentSchema == schema)
    assert(m.defaultPartitionSpec.isUnpartitioned)
    assert(m.currentSnapshot.isEmpty)
  }

  test("metadata JSON round-trip with snapshots and refs") {
    val snap = Snapshot(123L, None, 1L, 1700000000000L,
      "file:///tmp/t/metadata/snap-123.avro",
      Some(Summary(Operation.Append,
        Map(Summary.AddedRecords -> 100L, Summary.AddedDataFiles -> 2L))),
      Some(0))
    val m = TableMetadata.newTable("uuid-2", "file:///tmp/t2", schema,
        PartitionSpec.builder(0).day(4, "day").build(),
        Map("write.format" -> "parquet"))
      .withSnapshot(snap)
    val back = TableMetadata.fromJson(m.toJson)
    assert(back.tableUuid == m.tableUuid)
    assert(back.schemas == m.schemas)
    assert(back.partitionSpecs == m.partitionSpecs)
    assert(back.currentSnapshotId.contains(123L))
    assert(back.snapshotById(123L).flatMap(_.summary.map(
      _.counter(Summary.AddedRecords))).contains(100L))
    assert(back.refs.get("main").exists(_.snapshotId == 123L))
    assert(back.properties == m.properties)
  }

  test("snapshotAsOf picks max ts <= asOf (table/table.go:104-120)") {
    val s1 = Snapshot(1, None, 1, 1000L, "ml1", None, None)
    val s2 = Snapshot(2, Some(1L), 2, 2000L, "ml2", None, None)
    val m = TableMetadata.newTable("u", "loc", schema)
      .withSnapshot(s1).withSnapshot(s2)
    assert(m.snapshotAsOf(1500L).map(_.snapshotId).contains(1L))
    assert(m.snapshotAsOf(2000L).map(_.snapshotId).contains(2L))
    assert(m.snapshotAsOf(999L).isEmpty)
  }

  test("addSchema auto-assigns next id and tracks lastColumnId") {
    val m = TableMetadata.newTable("u", "loc", schema)
    val evolved = schema.copy(fields = schema.fields :+
      NestedField(5, "age", IntType, required = false))
    val m2 = m.addSchema(evolved, setCurrent = true)
    assert(m2.schemas.size == 2)
    assert(m2.currentSchemaId == 1)
    assert(m2.lastColumnId == 5)
  }

  test("removeSnapshots filters snapshots and log") {
    val s1 = Snapshot(1, None, 1, 1000L, "ml1", None, None)
    val s2 = Snapshot(2, Some(1L), 2, 2000L, "ml2", None, None)
    val m = TableMetadata.newTable("u", "loc", schema)
      .withSnapshot(s1).withSnapshot(s2).removeSnapshots(Set(1L))
    assert(m.snapshots.map(_.snapshotId) == Seq(2L))
    assert(m.snapshotLog.map(_.snapshotId) == Seq(2L))
  }

  test("v1 metadata migrates on parse (metadata.go:160-184)") {
    val v1 = """{
      "format-version": 1,
      "table-uuid": "v1-uuid",
      "location": "file:///tmp/v1",
      "last-updated-ms": 1,
      "last-column-id": 2,
      "schema": {"type": "struct", "schema-id": 0, "fields": [
        {"id": 1, "name": "id", "required": true, "type": "long"},
        {"id": 2, "name": "name", "required": false, "type": "string"}]},
      "partition-spec": [
        {"source-id": 1, "field-id": 1000, "name": "id", "transform": "identity"}]
    }"""
    val m = TableMetadata.fromJson(v1)
    assert(m.schemas.size == 1)
    assert(m.currentSchema.fieldByName("id").exists(_.required))
    assert(m.partitionSpecs.size == 1)
    assert(m.partitionSpecs.head.fields.head.transform == Transform.Identity)
    assert(m.sortOrders == Seq(SortOrder.unsorted))
  }
}

class BoundsSpec extends AnyFunSuite with GenSampling {
  test("primitive round-trips") {
    assert(Bounds.deserialize(Bounds.serialize(true, BooleanType),
      BooleanType) == true)
    assert(Bounds.deserialize(Bounds.serialize(42, IntType), IntType) == 42)
    assert(Bounds.deserialize(Bounds.serialize(42L, LongType),
      LongType) == 42L)
    assert(Bounds.deserialize(Bounds.serialize(1.5f, FloatType),
      FloatType) == 1.5f)
    assert(Bounds.deserialize(Bounds.serialize(2.5d, DoubleType),
      DoubleType) == 2.5d)
    assert(Bounds.deserialize(Bounds.serialize("héllo", StringType),
      StringType) == "héllo")
  }

  test("little-endian layout matches the reference (spec/avro.go:814-841)") {
    assert(Bounds.serialize(1, IntType).toSeq ==
      Seq[Byte](1, 0, 0, 0))
    assert(Bounds.serialize(258L, LongType).toSeq ==
      Seq[Byte](2, 1, 0, 0, 0, 0, 0, 0))
  }

  test("decimal round-trip at scale") {
    val t = DecimalType(10, 2)
    val v = new java.math.BigDecimal("12345.67")
    assert(Bounds.deserialize(Bounds.serialize(v, t), t) == v)
  }

  test("property: long/string round-trip and compare consistently") {
    forAllSamples(Gen.zip(Arbitrary.arbLong.arbitrary,
        Arbitrary.arbLong.arbitrary)) { case (a, b) =>
      val (ba, bb) = (Bounds.serialize(a, LongType), Bounds.serialize(b, LongType))
      val (da, db) = (Bounds.deserialize(ba, LongType), Bounds.deserialize(bb, LongType))
      assert(da == a && db == b)
      assert(Integer.signum(Bounds.compare(da, db, LongType)) ==
        Integer.signum(a.compareTo(b)))
    }
    forAllSamples(Gen.zip(Gen.alphaNumStr, Gen.alphaNumStr)) { case (a, b) =>
      assert(Integer.signum(Bounds.compare(a, b, StringType)) ==
        Integer.signum(Integer.signum(a.compareTo(b))))
    }
  }
}
