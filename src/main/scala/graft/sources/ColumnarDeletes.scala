package graft.sources

import org.apache.spark.sql.vectorized.{
  ColumnarArray, ColumnarBatch, ColumnarMap, ColumnVector}
import org.apache.spark.unsafe.types.UTF8String

/** Selection-vector view over a [[ColumnVector]]: exposes only the
  * surviving row ids of a position-delete-filtered batch through an int
  * mapping, ZERO-COPY — the same shape Iceberg's vectorized reads use
  * for deletes (a row-id mapping over the original vectors) so MoR
  * tables keep whole-stage codegen's columnar handoff instead of
  * dropping the whole scan to the row path.
  *
  * Lifetime: the underlying vectors belong to the parquet reader's
  * (reused) batch; this view owns nothing, so `close()` is a no-op —
  * exactly like Spark's own `ColumnarBatchRow` views.
  */
private[sources] final class MappedColumnVector(
    delegate: ColumnVector, map: Array[Int])
    extends ColumnVector(delegate.dataType()) {

  override def close(): Unit = ()
  // Upper bounds: the delegate's null counts include filtered-out rows.
  // Consumers use these as hints (isNullAt stays exact per row).
  override def hasNull: Boolean = delegate.hasNull
  override def numNulls: Int = delegate.numNulls

  override def isNullAt(rowId: Int): Boolean = delegate.isNullAt(map(rowId))
  override def getBoolean(rowId: Int): Boolean =
    delegate.getBoolean(map(rowId))
  override def getByte(rowId: Int): Byte = delegate.getByte(map(rowId))
  override def getShort(rowId: Int): Short = delegate.getShort(map(rowId))
  override def getInt(rowId: Int): Int = delegate.getInt(map(rowId))
  override def getLong(rowId: Int): Long = delegate.getLong(map(rowId))
  override def getFloat(rowId: Int): Float = delegate.getFloat(map(rowId))
  override def getDouble(rowId: Int): Double =
    delegate.getDouble(map(rowId))
  override def getArray(rowId: Int): ColumnarArray =
    delegate.getArray(map(rowId))
  override def getMap(rowId: Int): ColumnarMap = delegate.getMap(map(rowId))
  override def getDecimal(rowId: Int, precision: Int,
      scale: Int): org.apache.spark.sql.types.Decimal =
    delegate.getDecimal(map(rowId), precision, scale)
  override def getUTF8String(rowId: Int): UTF8String =
    delegate.getUTF8String(map(rowId))
  override def getBinary(rowId: Int): Array[Byte] =
    delegate.getBinary(map(rowId))
  // struct children are addressed with the PARENT's row id — they need
  // the same mapping
  override def getChild(ordinal: Int): ColumnVector =
    new MappedColumnVector(delegate.getChild(ordinal), map)
}

private[sources] object ColumnarDeletes {

  /** `batch` with the rows whose FILE positions (`startRow` = position
    * of the batch's first row) appear in `deleted` dropped. Returns the
    * original batch untouched when nothing in it is deleted; otherwise
    * a zero-copy mapped view. */
  def filterBatch(batch: ColumnarBatch, startRow: Long,
      deleted: java.util.HashSet[java.lang.Long]): ColumnarBatch = {
    val n = batch.numRows()
    var kept = 0
    val map = new Array[Int](n)
    var i = 0
    while (i < n) {
      if (!deleted.contains(startRow + i)) { map(kept) = i; kept += 1 }
      i += 1
    }
    if (kept == n) return batch
    remap(batch, map, kept)
  }

  /** `batch` with the rows failing `keep` dropped (zero-copy mapped
    * view; the original batch when every row survives). Drives the
    * columnar equality-delete filter: the predicate reads key columns
    * row-wise, but everything downstream keeps the columnar handoff. */
  def filterBatchRows(batch: ColumnarBatch,
      keep: Int => Boolean): ColumnarBatch = {
    val n = batch.numRows()
    var kept = 0
    val map = new Array[Int](n)
    var i = 0
    while (i < n) {
      if (keep(i)) { map(kept) = i; kept += 1 }
      i += 1
    }
    if (kept == n) return batch
    remap(batch, map, kept)
  }

  /** Zero-copy column projection: the same batch exposing only
    * `ordinals`, in order. Used to drop equality-key columns the batch
    * had to decode but the query did not project. */
  def projectColumns(batch: ColumnarBatch,
      ordinals: Array[Int]): ColumnarBatch = {
    val cols = new Array[ColumnVector](ordinals.length)
    var c = 0
    while (c < cols.length) {
      cols(c) = batch.column(ordinals(c))
      c += 1
    }
    new ColumnarBatch(cols, batch.numRows())
  }

  private def remap(batch: ColumnarBatch, map: Array[Int],
      kept: Int): ColumnarBatch = {
    val cols = new Array[ColumnVector](batch.numCols())
    var c = 0
    while (c < cols.length) {
      cols(c) = new MappedColumnVector(batch.column(c), map)
      c += 1
    }
    new ColumnarBatch(cols, kept)
  }
}
