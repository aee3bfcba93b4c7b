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
        // O2 (app.py:94): row counts from parquet FOOTER METADATA — no row
        // group is read and no executor job runs, exactly the reference's
        // pq_file.metadata.num_rows. Goes through the Hadoop FS + parquet
        // footer reader so it works on any scheme (s3a://, hdfs://); cost
        // is one footer read per file, independent of data volume — the
        // V1 parquet source has no count pushdown, so the df.count()
        // formulation this replaces scanned every row group.
        import org.apache.hadoop.fs.Path
        import org.apache.parquet.hadoop.ParquetFileReader
        import org.apache.parquet.hadoop.util.HadoopInputFile
        val conf = s.sparkContext.hadoopConfiguration
        val rows = Tables.all.map { t =>
          val p = new Path(s"$dir/$t.parquet")
          val fs = p.getFileSystem(conf)
          // recursive listing: partitioned layouts (day=.../part-*.parquet)
          // nest data files below the table root — a shallow listStatus
          // would silently count 0
          val files: Array[Path] = if (fs.getFileStatus(p).isDirectory) {
            val it = fs.listFiles(p, true)
            val buf = Array.newBuilder[Path]
            while (it.hasNext) {
              val st = it.next()
              if (st.getPath.getName.endsWith(".parquet")) buf += st.getPath
            }
            buf.result()
          } else Array(p)
          val n = files.map { f =>
            val r = ParquetFileReader.open(HadoopInputFile.fromPath(f, conf))
            try r.getRecordCount finally r.close()
          }.sum
          (t, n)
        }
        import s.implicits._
        rows.toDF("tbl", "n").orderBy("tbl")
      },
      Some(
        Tables.all
          .map(t => s"SELECT '$t' AS tbl, ${Exact.countStarSql} AS n FROM $t")
          .mkString("", " UNION ALL ", " ORDER BY tbl")
      )
    )
  )
}
