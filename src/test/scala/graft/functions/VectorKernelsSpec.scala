package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** The kernels' whole value rests on BIT-exact parity with the HOF
  * folds they replaced (every ANN oracle replays those folds in SQL) —
  * so parity is asserted on raw doubles, not within a tolerance. */
class VectorKernelsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def foldDot(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) =>
      x.cast("double") * y.cast("double")), lit(0.0), (acc, v) => acc + v)

  test("dot kernel is bit-identical to the zip_with/aggregate fold " +
      "on random float vectors") {
    val rnd = new scala.util.Random(3)
    val df = (0 until 200).map { i =>
      val n = 1 + rnd.nextInt(96)
      (i.toLong, Seq.fill(n)(rnd.nextFloat() * 4 - 2),
        Seq.fill(n)(rnd.nextFloat() * 4 - 2))
    }.toDF("id", "a", "b")
    val rows = df.select(
      VectorFunctions.vecDot(col("a"), col("b")).as("k"),
      foldDot(col("a"), col("b")).as("f")).collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToRawLongBits(r.getDouble(1)),
        s"kernel ${r.getDouble(0)} != fold ${r.getDouble(1)}")
    }
  }

  test("sqdist kernel is bit-identical to the (x-c)^2 fold, incl. " +
      "double-array right side") {
    val rnd = new scala.util.Random(9)
    val ctr = Seq.fill(16)(rnd.nextDouble() * 2 - 1)
    val df = (0 until 100).map(i =>
      (i.toLong, Seq.fill(16)(rnd.nextFloat() * 2 - 1))).toDF("id", "v")
    val fold = aggregate(
      zip_with(col("v"), typedlit(ctr), (x, c) => {
        val d = x.cast("double") - c; d * d
      }), lit(0.0), (acc, t) => acc + t)
    val rows = df.select(
      VectorFunctions.vecSqDist(col("v"), typedlit(ctr)).as("k"),
      fold.as("f")).collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToRawLongBits(r.getDouble(1)))
    }
  }

  test("null semantics mirror the fold: length mismatch, null element, " +
      "null array -> NULL; empty arrays -> 0.0") {
    val df = Seq(
      (1L, Option(Seq(Option(1f), Option(2f))), Option(Seq(Option(1f)))),
      (2L, Option(Seq(Option(1f), Option.empty[Float])),
        Option(Seq(Option(1f), Option(2f)))),
      (3L, Option.empty[Seq[Option[Float]]],
        Option(Seq(Option(1f)))),
      (4L, Option(Seq.empty[Option[Float]]), Option(Seq.empty[Option[Float]]))
    ).toDF("id", "a", "b")
    val got = df.select(col("id"),
      VectorFunctions.vecDot(col("a"), col("b")).as("d")).collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(got(1L).isEmpty && got(2L).isEmpty && got(3L).isEmpty)
    assert(got(4L).contains(0.0))
  }


  test("integer-element arrays widen per element like the old cast fold") {
    val df = Seq((Seq(1, 2, 3), Seq(2L, 3L, 4L))).toDF("a", "b")
    val r = df.select(
      VectorFunctions.vecDot(col("a"), col("b")).as("d"),
      VectorFunctions.vecSqDist(col("a"), col("b")).as("s")).head
    assert(r.getDouble(0) == 20.0 && r.getDouble(1) == 3.0)
  }

  test("SQL registration: vec_dot / vec_sqdist usable from spark.sql") {
    VectorFunctions.register(spark)
    val r = spark.sql(
      """SELECT vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d,
        |       vec_sqdist(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS s
        |""".stripMargin).head
    assert(r.getDouble(0) == 11.0 && r.getDouble(1) == 8.0)
  }

  test("kernel runs inside WholeStageCodegen (not interpreted fallback)") {
    // spark.range, not a literal Seq: ConvertToLocalRelation would fold
    // a literal frame into a LocalTableScan with no codegen stage at all
    val df = spark.range(4).select(col("id"),
      array(col("id").cast("float"), lit(2f)).as("a"),
      array(lit(3f), lit(4f)).as("b"))
    val out = df.select(col("id"),
      VectorFunctions.vecDot(col("a"), col("b")).as("d"))
    assert(out.orderBy("id").head.getDouble(1) == 8.0) // 0*3 + 2*4
    // the `*(n)` prefix is the WholeStageCodegen marker; the kernel
    // expression must sit INSIDE a starred Project, not break the stage
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.contains("*(") && l.contains("vec_dot")), s"plan:\n$plan")
  }
}
