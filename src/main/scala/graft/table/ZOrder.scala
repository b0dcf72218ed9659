package graft.table

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.spec._

/** Z-order (Morton-curve) clustering for data-file rewrites: each
  * row's cluster key interleaves the bits of its columns' quantized
  * positions, so files written in key ranges get TIGHT min/max bounds
  * on EVERY z-ordered column at once — a scan filtered on any one of
  * them prunes files, where a linear sort only serves its leading
  * column. This is Iceberg's `rewrite_data_files(strategy => 'sort',
  * sort_order => 'zorder(...)')`, built as pure Catalyst column
  * expressions (shift/and/or — whole-stage codegen, no UDF).
  *
  * Quantization: each column maps to a 16-bit lattice position by
  * min-max normalization (numerics/date/timestamp; bounds come from
  * manifest stats when available — zero I/O — else one agg pass);
  * strings use their first two bytes (order-preserving truncation,
  * the same spirit as Iceberg's 8-byte string magnitude). Up to 4
  * columns interleave into one 64-bit key. NULLs quantize to 0.
  */
object ZOrder {
  val MaxColumns = 4
  private val Bits = 16

  /** The interleaved z-value column for `colNames`, quantized with
    * `bounds` (column → (min, max) in double space). */
  def zvalue(df: DataFrame, schema: Schema, colNames: Seq[String],
      bounds: Map[String, (Double, Double)]): Column = {
    require(colNames.nonEmpty && colNames.size <= MaxColumns,
      s"zorder takes 1..$MaxColumns columns, got ${colNames.size}")
    val k = colNames.size
    // Keep every interleaved bit below position 63: with 4 columns a full
    // 16 bits/col would place the 4th column's MSB on the long's SIGN bit,
    // inverting the Morton curve's coarsest split of that column. Use the
    // TOP effBits of each quantized value (truncation preserves order).
    val effBits = if (k * Bits > 63) 63 / k else Bits
    val spread = colNames.zipWithIndex.map { case (name, i) =>
      val f = schema.fieldByName(name).getOrElse(
        throw new IllegalArgumentException(s"zorder column $name not found"))
      val q16 = quantize(col(name), f.fieldType, bounds.get(name))
      val q = if (effBits == Bits) q16 else shiftright(q16, Bits - effBits)
      // spread the effBits bits of q to positions b*k + i of the z key
      (0 until effBits).map { b =>
        shiftleft(shiftright(q, b).bitwiseAND(lit(1L)), b * k + i)
      }.reduce(_ bitwiseOR _)
    }
    spread.reduce(_ bitwiseOR _)
  }

  /** 0..65535 lattice position of `c`. Unbounded / non-numeric types
    * degrade gracefully: they still produce a valid key, just with
    * less discriminating bits. */
  private def quantize(c: Column, t: IcebergType,
      minMax: Option[(Double, Double)]): Column = {
    val pos: Column = t match {
      case StringType =>
        // first two bytes, order-preserving for ASCII/BMP prefixes
        coalesce(ascii(substring(c, 1, 1)), lit(0)) * 256 +
          coalesce(ascii(substring(c, 2, 1)), lit(0))
      case BooleanType => when(c, lit(65535)).otherwise(lit(0))
      case DateType => scaled(datediff(c, to_date(lit("1970-01-01")))
        .cast("double"), minMax) // epoch DAYS — matches manifest bounds
      case TimestampType | TimestampTzType =>
        // epoch MICROS — the unit manifest bounds are stored in
        scaled(unix_micros(c.cast("timestamp")).cast("double"), minMax)
      case IntType | LongType | FloatType | DoubleType |
           _: DecimalType => scaled(c.cast("double"), minMax)
      case _ => lit(0) // binary/uuid/fixed/nested: no useful order
    }
    least(greatest(coalesce(pos.cast("long"), lit(0L)), lit(0L)),
      lit(65535L))
  }

  private def scaled(v: Column, minMax: Option[(Double, Double)]): Column =
    minMax match {
      case Some((lo, hi)) if hi > lo =>
        (v - lit(lo)) / lit(hi - lo) * lit(65535.0)
      case _ => v // constant or unknown range: clamp handles the rest
    }

  /** (min, max) per column from the candidate files' manifest bounds —
    * free (already in hand from planning). Columns whose stats are
    * missing in ANY file fall back to one aggregate pass over `df`. */
  def columnBounds(tasks: Seq[FileScanTask], schema: Schema,
      colNames: Seq[String], df: DataFrame): Map[String, (Double, Double)] = {
    val numeric = colNames.filter(n =>
      schema.fieldByName(n).exists(f => f.fieldType match {
        case IntType | LongType | FloatType | DoubleType | DateType |
             TimestampType | TimestampTzType | _: DecimalType => true
        case _ => false
      }))
    def toD(v: Any): Option[Double] = v match {
      case n: java.lang.Number => Some(n.doubleValue())
      case d: java.math.BigDecimal => Some(d.doubleValue())
      case _ => None
    }
    val (statted, missing) = numeric.partition { n =>
      val f = schema.fieldByName(n).get
      tasks.nonEmpty && tasks.forall(t =>
        t.file.lowerBounds.contains(f.id) && t.file.upperBounds.contains(f.id))
    }
    val fromStats = statted.flatMap { n =>
      val f = schema.fieldByName(n).get
      val los = tasks.flatMap(t =>
        toD(Bounds.deserialize(t.file.lowerBounds(f.id), f.fieldType)))
      val his = tasks.flatMap(t =>
        toD(Bounds.deserialize(t.file.upperBounds(f.id), f.fieldType)))
      if (los.isEmpty || his.isEmpty) None
      else Some(n -> (los.min, his.max))
    }.toMap
    val fromAgg =
      if (missing.isEmpty) Map.empty[String, (Double, Double)]
      else {
        val aggs = missing.flatMap(n => Seq(
          min(col(n).cast("double")).as(s"__lo_$n"),
          max(col(n).cast("double")).as(s"__hi_$n")))
        val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
        missing.flatMap { n =>
          val lo = row.getAs[Any](s"__lo_$n")
          val hi = row.getAs[Any](s"__hi_$n")
          (toD(lo), toD(hi)) match {
            case (Some(l), Some(h)) => Some(n -> (l, h))
            case _ => None
          }
        }.toMap
      }
    fromStats ++ fromAgg
  }
}
