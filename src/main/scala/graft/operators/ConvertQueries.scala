package graft.operators

import graft.{GQuery, Tables}
import graft.functions.Exact
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Reference-parity conversion queries: the full app.py pipeline (O1+O4+O5,
  * /root/reference/app.py:27-52,109-131) as verifiable projections, plus the
  * footer-metadata row count (O2, app.py:94).
  */
object ConvertQueries {

  /** Static schemas for oracle generation (footer truth, TESTDATA.md). */
  private val lineitemSchema: Seq[(String, DataType)] = Seq(
    "l_orderkey" -> LongType, "l_partkey" -> LongType, "l_suppkey" -> LongType,
    "l_linenumber" -> IntegerType, "l_quantity" -> DoubleType,
    "l_extendedprice" -> DoubleType, "l_discount" -> DoubleType,
    "l_tax" -> DoubleType, "l_returnflag" -> StringType,
    "l_linestatus" -> StringType, "l_shipdate" -> TimestampType)

  private val ordersSchema: Seq[(String, DataType)] = Seq(
    "o_orderkey" -> LongType, "o_custkey" -> LongType,
    "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
    "o_orderdate" -> TimestampType, "o_orderpriority" -> StringType)

  /** Sort by every output column: a total order even without a primary key
    * (lineitem's (l_orderkey, l_linenumber) is NOT unique in this data, but
    * full-duplicate rows hash identically regardless of their mutual order).
    */
  private def orderAll(df: DataFrame): DataFrame =
    df.orderBy(df.columns.map(col).toIndexedSeq: _*)

  private def convertOracle(table: String, schema: Seq[(String, DataType)]): String = {
    val proj = schema.map { case (n, t) => Convert.oracleColumnSql(n, t) }.mkString(", ")
    val ord = schema.map(_._1).mkString(", ")
    s"SELECT $proj FROM $table ORDER BY $ord"
  }

  val defs: Seq[GQuery] = Seq(
    GQuery(
      "convert_lineitem",
      (s, dir) => orderAll(Convert.pipeline(Tables.lineitem(s, dir))),
      Some(convertOracle("lineitem", lineitemSchema))
    ),
    GQuery(
      "convert_orders",
      (s, dir) => orderAll(Convert.pipeline(Tables.orders(s, dir))),
      Some(convertOracle("orders", ordersSchema))
    ),
    GQuery(
      "meta_rowcount",
      (s, dir) => {
        // O2: count(*) per table — Catalyst serves this from parquet footer
        // statistics (no column scan), the distributed analog of app.py:94.
        Tables.all
          .map { t =>
            Tables.table(s, dir, t).agg(count(lit(1)).as("n")).select(lit(t).as("tbl"), col("n"))
          }
          .reduce(_ union _)
          .orderBy("tbl")
      },
      Some(
        Tables.all
          .map(t => s"SELECT '$t' AS tbl, ${Exact.countStarSql} AS n FROM $t")
          .mkString("", " UNION ALL ", " ORDER BY tbl")
      )
    )
  )
}
