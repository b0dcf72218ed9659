package graft.avro

import java.io.ByteArrayOutputStream
import java.nio.ByteBuffer
import scala.jdk.CollectionConverters._

import org.apache.avro.{Schema => AvroSchema}
import org.apache.avro.file.{CodecFactory, DataFileStream, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.util.Utf8

import graft.spec._

/** Avro OCF codec for manifest lists and manifests (SURVEY S11). Record
  * schemas follow `spec/avro.go:14-81` verbatim in structure; the
  * per-spec partition record is synthesized from the spec's RESULT types
  * (`spec/avro.go:302-335`, done with real types instead of the
  * reference's string default), deflate-compressed with the reference's
  * OCF metadata keys (`spec/avro.go:271-277`). */
object ManifestAvro {

  private val manifestListSchemaJson = """{
    "type": "record",
    "name": "manifest_file",
    "fields": [
      {"name": "manifest_path", "type": "string"},
      {"name": "manifest_length", "type": "long"},
      {"name": "partition_spec_id", "type": "int"},
      {"name": "content", "type": "int", "default": 0},
      {"name": "sequence_number", "type": "long", "default": 0},
      {"name": "min_sequence_number", "type": "long", "default": 0},
      {"name": "added_snapshot_id", "type": "long"},
      {"name": "added_files_count", "type": "int", "default": 0},
      {"name": "existing_files_count", "type": "int", "default": 0},
      {"name": "deleted_files_count", "type": "int", "default": 0},
      {"name": "added_rows_count", "type": "long", "default": 0},
      {"name": "existing_rows_count", "type": "long", "default": 0},
      {"name": "deleted_rows_count", "type": "long", "default": 0},
      {"name": "partitions", "type": {
        "type": "array",
        "items": {
          "type": "record",
          "name": "field_summary",
          "fields": [
            {"name": "contains_null", "type": "boolean"},
            {"name": "contains_nan", "type": ["null", "boolean"], "default": null},
            {"name": "lower_bound", "type": ["null", "bytes"], "default": null},
            {"name": "upper_bound", "type": ["null", "bytes"], "default": null}
          ]
        }
      }, "default": []},
      {"name": "key_metadata", "type": ["null", "bytes"], "default": null}
    ]
  }"""

  private val manifestListSchema = new AvroSchema.Parser().parse(manifestListSchemaJson)

  /** Avro type for a partition-tuple field, derived from the transform's
    * Iceberg result type (not the reference's lossy string default). */
  private def avroTypeFor(t: IcebergType): String = t match {
    case BooleanType => "\"boolean\""
    case IntType | DateType => "\"int\""
    case LongType | TimeType | TimestampType | TimestampTzType => "\"long\""
    case FloatType => "\"float\""
    case DoubleType => "\"double\""
    case StringType => "\"string\""
    case _ => "\"bytes\"" // uuid/fixed/binary/decimal
  }

  /** Synthesize the manifest-entry schema for one partition type
    * (`spec/avro.go:50-81,302-335`). */
  def manifestEntrySchema(partitionType: StructType): AvroSchema = {
    val pfields = partitionType.fields.map { f =>
      s"""{"name": "${f.name}", "type": ["null", ${avroTypeFor(f.fieldType)}], "default": null}"""
    }.mkString(",")
    val partitionSchema =
      s"""{"type": "record", "name": "partition_data", "fields": [$pfields]}"""
    val json = s"""{
      "type": "record",
      "name": "manifest_entry",
      "fields": [
        {"name": "status", "type": "int"},
        {"name": "snapshot_id", "type": ["null", "long"], "default": null},
        {"name": "sequence_number", "type": ["null", "long"], "default": null},
        {"name": "file_sequence_number", "type": ["null", "long"], "default": null},
        {"name": "data_file", "type": {
          "type": "record",
          "name": "data_file",
          "fields": [
            {"name": "content", "type": "int", "default": 0},
            {"name": "file_path", "type": "string"},
            {"name": "file_format", "type": "string"},
            {"name": "partition", "type": $partitionSchema},
            {"name": "record_count", "type": "long"},
            {"name": "file_size_in_bytes", "type": "long"},
            {"name": "column_sizes", "type": ["null", {"type": "map", "values": "long"}], "default": null},
            {"name": "value_counts", "type": ["null", {"type": "map", "values": "long"}], "default": null},
            {"name": "null_value_counts", "type": ["null", {"type": "map", "values": "long"}], "default": null},
            {"name": "nan_value_counts", "type": ["null", {"type": "map", "values": "long"}], "default": null},
            {"name": "lower_bounds", "type": ["null", {"type": "map", "values": "bytes"}], "default": null},
            {"name": "upper_bounds", "type": ["null", {"type": "map", "values": "bytes"}], "default": null},
            {"name": "key_metadata", "type": ["null", "bytes"], "default": null},
            {"name": "split_offsets", "type": ["null", {"type": "array", "items": "long"}], "default": null},
            {"name": "equality_ids", "type": ["null", {"type": "array", "items": "int"}], "default": null},
            {"name": "sort_order_id", "type": ["null", "int"], "default": null}
          ]
        }}
      ]
    }"""
    new AvroSchema.Parser().parse(json)
  }

  // ------------------------------------------------------------- write

  private def ocfWrite(schema: AvroSchema,
      metadata: Map[String, String],
      records: Iterator[GenericRecord]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val writer = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](schema))
    writer.setCodec(CodecFactory.deflateCodec(6))
    metadata.foreach { case (k, v) => writer.setMeta(k, v) }
    writer.create(schema, out)
    records.foreach(writer.append)
    writer.close()
    out.toByteArray
  }

  def writeManifestList(files: Seq[ManifestFile]): Array[Byte] = {
    val itemSchema = manifestListSchema
    val summarySchema = itemSchema.getField("partitions").schema()
      .getElementType
    ocfWrite(itemSchema, Map("format-version" -> "2"), files.iterator.map { mf =>
      val r = new GenericData.Record(itemSchema)
      r.put("manifest_path", mf.manifestPath)
      r.put("manifest_length", mf.manifestLength)
      r.put("partition_spec_id", mf.partitionSpecId)
      r.put("content", mf.content.id)
      r.put("sequence_number", mf.sequenceNumber)
      r.put("min_sequence_number", mf.minSequenceNumber)
      r.put("added_snapshot_id", mf.addedSnapshotId)
      r.put("added_files_count", mf.addedFilesCount)
      r.put("existing_files_count", mf.existingFilesCount)
      r.put("deleted_files_count", mf.deletedFilesCount)
      r.put("added_rows_count", mf.addedRowsCount)
      r.put("existing_rows_count", mf.existingRowsCount)
      r.put("deleted_rows_count", mf.deletedRowsCount)
      r.put("partitions", mf.partitions.map { p =>
        val pr = new GenericData.Record(summarySchema)
        pr.put("contains_null", p.containsNull)
        pr.put("contains_nan", p.containsNan.map(Boolean.box).orNull)
        pr.put("lower_bound", p.lowerBound.map(ByteBuffer.wrap).orNull)
        pr.put("upper_bound", p.upperBound.map(ByteBuffer.wrap).orNull)
        pr
      }.asJava)
      r.put("key_metadata", mf.keyMetadata.map(ByteBuffer.wrap).orNull)
      r
    })
  }

  def writeManifest(
      schemaId: Int,
      spec: PartitionSpec,
      partitionType: StructType,
      content: ManifestContent,
      entries: Seq[ManifestEntry]): Array[Byte] = {
    val schema = manifestEntrySchema(partitionType)
    val dfSchema = schema.getField("data_file").schema()
    val pSchema = dfSchema.getField("partition").schema()
    val meta = Map(
      "schema" -> s"""{"schema-id": $schemaId}""",
      "partition-spec" -> s"""{"spec-id": ${spec.specId}}""",
      "content" -> content.id.toString,
      "format-version" -> "2")
    ocfWrite(schema, meta, entries.iterator.map { e =>
      val r = new GenericData.Record(schema)
      r.put("status", e.status.id)
      r.put("snapshot_id", e.snapshotId.map(Long.box).orNull)
      r.put("sequence_number", e.sequenceNumber.map(Long.box).orNull)
      r.put("file_sequence_number", e.fileSequenceNumber.map(Long.box).orNull)
      val df = e.dataFile
      val dr = new GenericData.Record(dfSchema)
      dr.put("content", df.content.id)
      dr.put("file_path", df.filePath)
      dr.put("file_format", df.fileFormat.name)
      val pr = new GenericData.Record(pSchema)
      partitionType.fields.foreach { f =>
        df.partition.get(f.name).foreach { v =>
          pr.put(f.name, toAvroValue(v))
        }
      }
      dr.put("partition", pr)
      dr.put("record_count", df.recordCount)
      dr.put("file_size_in_bytes", df.fileSizeInBytes)
      dr.put("column_sizes", longMap(df.columnSizes))
      dr.put("value_counts", longMap(df.valueCounts))
      dr.put("null_value_counts", longMap(df.nullValueCounts))
      dr.put("nan_value_counts", longMap(df.nanValueCounts))
      dr.put("lower_bounds", bytesMap(df.lowerBounds))
      dr.put("upper_bounds", bytesMap(df.upperBounds))
      dr.put("key_metadata", df.keyMetadata.map(ByteBuffer.wrap).orNull)
      dr.put("split_offsets",
        if (df.splitOffsets.isEmpty) null
        else df.splitOffsets.map(Long.box).asJava)
      dr.put("equality_ids",
        if (df.equalityIds.isEmpty) null
        else df.equalityIds.map(Int.box).asJava)
      dr.put("sort_order_id", df.sortOrderId.map(Int.box).orNull)
      r.put("data_file", dr)
      r
    })
  }

  private def toAvroValue(v: Any): Any = v match {
    case b: Array[Byte] => ByteBuffer.wrap(b)
    case other => other
  }

  private def longMap(m: Map[Int, Long]): Any =
    if (m.isEmpty) null
    else m.map { case (k, v) => k.toString -> Long.box(v) }.asJava

  private def bytesMap(m: Map[Int, Array[Byte]]): Any =
    if (m.isEmpty) null
    else m.map { case (k, v) => k.toString -> ByteBuffer.wrap(v) }.asJava

  // -------------------------------------------------------------- read

  private def ocfRead(bytes: Array[Byte])
      : (DataFileStream[GenericRecord], Iterator[GenericRecord]) = {
    val stream = new DataFileStream[GenericRecord](
      new java.io.ByteArrayInputStream(bytes),
      new GenericDatumReader[GenericRecord]())
    (stream, stream.iterator().asScala)
  }

  def readManifestList(bytes: Array[Byte]): Seq[ManifestFile] = {
    val (stream, it) = ocfRead(bytes)
    try it.map { r =>
      ManifestFile(
        manifestPath = str(r.get("manifest_path")),
        manifestLength = lng(r.get("manifest_length")),
        partitionSpecId = int(r.get("partition_spec_id")),
        content = ManifestContent.fromId(int(r.get("content"))),
        sequenceNumber = lng(r.get("sequence_number")),
        minSequenceNumber = lng(r.get("min_sequence_number")),
        addedSnapshotId = lng(r.get("added_snapshot_id")),
        addedFilesCount = int(r.get("added_files_count")),
        existingFilesCount = int(r.get("existing_files_count")),
        deletedFilesCount = int(r.get("deleted_files_count")),
        addedRowsCount = lng(r.get("added_rows_count")),
        existingRowsCount = lng(r.get("existing_rows_count")),
        deletedRowsCount = lng(r.get("deleted_rows_count")),
        partitions = Option(r.get("partitions")).map {
          case arr: java.util.List[_] => arr.asScala.toSeq.map {
            case pr: GenericRecord => PartitionFieldSummary(
              containsNull = pr.get("contains_null").asInstanceOf[Boolean],
              containsNan = Option(pr.get("contains_nan"))
                .map(_.asInstanceOf[Boolean]),
              lowerBound = Option(pr.get("lower_bound")).map(bytes_),
              upperBound = Option(pr.get("upper_bound")).map(bytes_))
          }
        }.getOrElse(Nil),
        keyMetadata = Option(r.get("key_metadata")).map(bytes_))
    }.toList
    finally stream.close()
  }

  def readManifest(bytes: Array[Byte]): Manifest = {
    val (stream, it) = ocfRead(bytes)
    try {
      val schemaId = Option(stream.getMetaString("schema"))
        .map(s => Js.parse(s).path("schema-id").asInt).getOrElse(0)
      val specId = Option(stream.getMetaString("partition-spec"))
        .map(s => Js.parse(s).path("spec-id").asInt).getOrElse(0)
      val content = Option(stream.getMetaString("content"))
        .map(c => ManifestContent.fromId(c.trim.toInt))
        .getOrElse(ManifestContent.Data)
      val entries = it.map { r =>
        val dr = r.get("data_file").asInstanceOf[GenericRecord]
        ManifestEntry(
          status = EntryStatus.fromId(int(r.get("status"))),
          snapshotId = Option(r.get("snapshot_id")).map(lng),
          sequenceNumber = Option(r.get("sequence_number")).map(lng),
          fileSequenceNumber = Option(r.get("file_sequence_number")).map(lng),
          dataFile = DataFile(
            content = FileContent.fromId(int(dr.get("content"))),
            filePath = str(dr.get("file_path")),
            fileFormat = FileFormat.parse(str(dr.get("file_format"))),
            partition = Option(dr.get("partition")).map {
              case pr: GenericRecord =>
                pr.getSchema.getFields.asScala.flatMap { f =>
                  Option(pr.get(f.name)).map(v => f.name -> fromAvroValue(v))
                }.toMap
            }.getOrElse(Map.empty),
            recordCount = lng(dr.get("record_count")),
            fileSizeInBytes = lng(dr.get("file_size_in_bytes")),
            columnSizes = readLongMap(dr.get("column_sizes")),
            valueCounts = readLongMap(dr.get("value_counts")),
            nullValueCounts = readLongMap(dr.get("null_value_counts")),
            nanValueCounts = readLongMap(dr.get("nan_value_counts")),
            lowerBounds = readBytesMap(dr.get("lower_bounds")),
            upperBounds = readBytesMap(dr.get("upper_bounds")),
            keyMetadata = Option(dr.get("key_metadata")).map(bytes_),
            splitOffsets = Option(dr.get("split_offsets")).map {
              case l: java.util.List[_] => l.asScala.toSeq.map(x => lng(x))
            }.getOrElse(Nil),
            equalityIds = Option(dr.get("equality_ids")).map {
              case l: java.util.List[_] => l.asScala.toSeq.map(x => int(x))
            }.getOrElse(Nil),
            sortOrderId = Option(dr.get("sort_order_id")).map(int)))
      }.toList
      val seqNum = entries.flatMap(_.sequenceNumber).minOption.getOrElse(0L)
      Manifest(schemaId, specId, content, seqNum, entries)
    } finally stream.close()
  }

  private def fromAvroValue(v: Any): Any = v match {
    case u: Utf8 => u.toString
    case b: ByteBuffer => bytes_(b)
    case other => other
  }

  private def str(v: Any): String = v match {
    case u: Utf8 => u.toString
    case s: String => s
    case other => other.toString
  }
  private def lng(v: Any): Long = v.asInstanceOf[Number].longValue()
  private def int(v: Any): Int = v.asInstanceOf[Number].intValue()
  private def bytes_(v: Any): Array[Byte] = v match {
    case bb: ByteBuffer =>
      val b = new Array[Byte](bb.remaining()); bb.duplicate().get(b); b
    case b: Array[Byte] => b
  }

  private def readLongMap(v: Any): Map[Int, Long] = Option(v).map {
    case m: java.util.Map[_, _] => m.asScala.map {
      case (k, value) => str(k).toInt -> lng(value)
    }.toMap
  }.getOrElse(Map.empty)

  private def readBytesMap(v: Any): Map[Int, Array[Byte]] = Option(v).map {
    case m: java.util.Map[_, _] => m.asScala.map {
      case (k, value) => str(k).toInt -> bytes_(value)
    }.toMap
  }.getOrElse(Map.empty)
}

/** tiny local alias to the spec package's Jackson helper */
private object Js {
  def parse(s: String) = graft.spec.SchemaJson.parseTree(s)
}
