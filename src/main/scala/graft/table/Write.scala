package graft.table

import java.util.UUID
import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.column.statistics.{Statistics => PStats}
import org.apache.spark.sql.DataFrame

import graft.spec._

/** Executor-parallel data writing with REAL per-file stats harvested
  * from parquet footers — fixing the reference's approximations
  * (`table/writer.go:144-167`: sizes guessed as fileSize/numCols, bounds
  * left empty). Stats feed the pruner, so they must round-trip through
  * [[graft.spec.Bounds]] exactly.
  */
object DataWriter {

  /** Normalize to the URI form Spark's `_metadata.file_path` reports
    * ("file:///abs/path") so MoR position deletes join exactly. */
  def normalizePath(p: String): String = {
    val u = new java.net.URI(p)
    if (u.getScheme == null) "file://" + p
    else if (u.getScheme == "file") "file://" + u.getPath
    else p
  }

  /** Write `df` as Snappy parquet into a fresh directory under the
    * table's data/ prefix; returns harvested [[DataFile]]s. */
  def writeDataFiles(meta: TableMetadata, df: DataFrame,
      maxRecordsPerFile: Long = 0L): Seq[DataFile] = {
    val spark = df.sparkSession
    // µs timestamps (Iceberg physical semantics, SURVEY §1.2); INT96 has
    // no usable min/max for pruning. Scoped save/restore: leaking this
    // conf would silently flip OTHER writers' outputs to tz-aware µs.
    val key = "spark.sql.parquet.outputTimestampType"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "TIMESTAMP_MICROS")
    try {
      val dir = meta.location.stripSuffix("/") + "/data/" +
        UUID.randomUUID().toString
      var w = df.write.option("compression", "snappy")
      if (maxRecordsPerFile > 0)
        w = w.option("maxRecordsPerFile", maxRecordsPerFile)
      w.parquet(dir)
      harvestDataFiles(spark.sessionState.newHadoopConf(), dir,
        meta.currentSchema)
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  /** Read back parquet footers under `dir` and build stats-complete
    * DataFile entries (SURVEY S7's "harvest real per-file row counts &
    * min/max from Parquet footers"). */
  def harvestDataFiles(conf: Configuration, dir: String, schema: Schema,
      partition: Map[String, Any] = Map.empty): Seq[DataFile] = {
    val dirPath = new Path(dir)
    val fs = dirPath.getFileSystem(conf)
    val statuses = fs.listStatus(dirPath)
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .sortBy(_.getPath.getName)
    statuses.toSeq.map { st =>
      val footer = {
        val r = ParquetFileReader.open(HadoopInputFile.fromStatus(st, conf))
        try r.getFooter finally r.close()
      }
      val blocks = footer.getBlocks.asScala.toSeq
      val rowCount = blocks.map(_.getRowCount).sum
      val splitOffsets = blocks.map(_.getStartingPos).sorted

      val columnSizes = collection.mutable.Map[Int, Long]()
      val valueCounts = collection.mutable.Map[Int, Long]()
      val nullCounts = collection.mutable.Map[Int, Long]()
      val mins = collection.mutable.Map[Int, Any]()
      val maxs = collection.mutable.Map[Int, Any]()

      for (block <- blocks; chunk <- block.getColumns.asScala) {
        val name = chunk.getPath.toDotString
        schema.fieldByName(name).foreach { field =>
          val fid = field.id
          columnSizes(fid) =
            columnSizes.getOrElse(fid, 0L) + chunk.getTotalSize
          valueCounts(fid) =
            valueCounts.getOrElse(fid, 0L) + chunk.getValueCount
          val stats = chunk.getStatistics
          if (stats != null && !stats.isEmpty) {
            if (stats.isNumNullsSet)
              nullCounts(fid) = nullCounts.getOrElse(fid, 0L) + stats.getNumNulls
            if (stats.hasNonNullValue) {
              statsValue(stats, field.fieldType, isMin = true).foreach { v =>
                mins(fid) = mins.get(fid) match {
                  case Some(cur) if Bounds.compare(cur, v, field.fieldType) <= 0 => cur
                  case _ => v
                }
              }
              statsValue(stats, field.fieldType, isMin = false).foreach { v =>
                maxs(fid) = maxs.get(fid) match {
                  case Some(cur) if Bounds.compare(cur, v, field.fieldType) >= 0 => cur
                  case _ => v
                }
              }
            }
          }
        }
      }

      def boundsOf(m: collection.Map[Int, Any]): Map[Int, Array[Byte]] =
        m.flatMap { case (fid, v) =>
          schema.field(fid).map(f => fid -> Bounds.serialize(v, f.fieldType))
        }.toMap

      DataFile(
        filePath = normalizePath(st.getPath.toString),
        recordCount = rowCount,
        fileSizeInBytes = st.getLen,
        partition = partition,
        columnSizes = columnSizes.toMap,
        valueCounts = valueCounts.toMap,
        nullValueCounts = nullCounts.toMap,
        lowerBounds = boundsOf(mins),
        upperBounds = boundsOf(maxs),
        splitOffsets = splitOffsets,
        sortOrderId = Some(0))
    }
  }

  /** Parquet chunk statistics → Iceberg-typed scalar. */
  private def statsValue(stats: PStats[_], t: IcebergType,
      isMin: Boolean): Option[Any] = {
    import org.apache.parquet.column.statistics._
    import org.apache.parquet.io.api.Binary
    def raw: Any = stats match {
      case s: IntStatistics => if (isMin) s.getMin else s.getMax
      case s: LongStatistics => if (isMin) s.getMin else s.getMax
      case s: FloatStatistics => if (isMin) s.getMin else s.getMax
      case s: DoubleStatistics => if (isMin) s.getMin else s.getMax
      case s: BooleanStatistics => if (isMin) s.getMin else s.getMax
      case s: BinaryStatistics =>
        val b: Binary = if (isMin) s.genericGetMin else s.genericGetMax
        b
      case _ => null
    }
    (t, raw) match {
      case (_, null) => None
      case (IntType | DateType, i: Int) => Some(i)
      case (LongType | TimeType | TimestampType | TimestampTzType, l: Long) =>
        Some(l)
      case (IntType, l: Long) => Some(l.toInt)
      case (LongType, i: Int) => Some(i.toLong)
      case (FloatType, f: Float) => Some(f)
      case (DoubleType, d: Double) => Some(d)
      case (BooleanType, b: Boolean) => Some(b)
      case (StringType, b: org.apache.parquet.io.api.Binary) =>
        Some(b.toStringUsingUTF8)
      case (BinaryType | UUIDType | _: FixedType,
          b: org.apache.parquet.io.api.Binary) => Some(b.getBytes)
      case (DecimalType(_, s), b: org.apache.parquet.io.api.Binary) =>
        Some(new java.math.BigDecimal(
          new java.math.BigInteger(b.getBytes), s))
      case (DecimalType(_, s), i: Int) =>
        Some(java.math.BigDecimal.valueOf(i.toLong, s))
      case (DecimalType(_, s), l: Long) =>
        Some(java.math.BigDecimal.valueOf(l, s))
      case _ => None
    }
  }
}

/** Convenience write ops on a table (fluent facades in M7 widen this). */
object TableOps {
  /** Unpartitioned append (`table/insert.go:49-170`). */
  def append(table: Table, df: DataFrame): Table = {
    val files = DataWriter.writeDataFiles(table.metadata, df)
    table.commitSnapshot(PendingSnapshot(Operation.Append,
      addedDataFiles = files))
  }
}
