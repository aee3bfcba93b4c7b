package graft

import graft.functions.GraftFunctions
import org.apache.spark.sql.functions._

/** The codegen'd graft_dot expression must be bit-identical to the
  * higher-order-function fold it replaced (same left-to-right accumulation),
  * and must actually run inside whole-stage codegen.
  */
class DotProductSpec extends SparkSpec {

  private val hofDot =
    "aggregate(zip_with(a, b, (x, y) -> x * y), CAST(0 AS DOUBLE), (acc, p) -> acc + p)"

  test("graft_dot equals the zip_with/aggregate fold bit-for-bit") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val rows = Seq.fill(200)((
      Array.fill(64)(rnd.nextDouble() * 2e3 - 1e3),
      Array.fill(64)(rnd.nextDouble() * 2e3 - 1e3)))
    val got = rows.toDF("a", "b")
      .select(expr("graft_dot(a, b)").as("fused"), expr(hofDot).as("hof"))
      .collect()
    got.foreach { row =>
      assert(java.lang.Double.doubleToLongBits(row.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(row.getDouble(1)))
    }
  }

  test("graft_dot handles length mismatch and nulls") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val df = Seq((Array(1.0, 2.0, 3.0), Array(10.0, 20.0)))
      .toDF("a", "b")
    assert(df.select(expr("graft_dot(a, b)")).collect().head.getDouble(0) == 50.0)
    val withNull = df.select(expr("graft_dot(a, CAST(NULL AS ARRAY<DOUBLE>))"))
    assert(withNull.collect().head.isNullAt(0))
  }

  test("graft_dot stays inside whole-stage codegen") {
    // A local relation would be constant-folded before planning, so check the
    // real parquet-backed path every vector query uses.
    val df = graft.functions.VectorOps.normalized(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    // "*(n)" prefixes mark operators inside a WholeStageCodegen stage; the
    // graft_dot projection must carry one (the transform-lambda projection
    // below it legitimately cannot — higher-order functions don't codegen).
    val dotLine = plan.linesIterator.find(_.contains("graft_dot")).getOrElse("")
    assert(dotLine.contains("*("), plan)
    assert(df.count() > 0)
  }
}
