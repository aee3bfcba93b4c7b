package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator registers one [[GQuery]] (Spark build + DuckDB
  * oracle SQL where expressible); the driver hash-compares each against the
  * oracle at sf0.01 and benches the headline set at sf0.1.
  */
object SparkEntry {

  /** Flagship: the reference's entire conversion pipeline (scan → type
    * normalize → numeric sanitize, /root/reference/app.py:109-131) on the
    * smoke-test scale factor. Driver checks rows > 0.
    */
  def entry(spark: SparkSession): DataFrame =
    Convert.pipeline(Tables.lineitem(spark, "/root/testdata/sf0.001"))

  /** The complete operator registry (SURVEY.md §2 inventory). */
  def registry: Seq[GQuery] =
    ConvertQueries.defs ++
      RelationalQueries.defs ++
      LayoutQueries.defs ++
      AdvancedQueries.defs ++
      EventQueries.defs ++
      TextQueries.defs ++
      SearchQueries.defs ++
      DedupQueries.defs ++
      SimilarityQueries.defs ++
      MultimodalQueries.defs

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.build).toMap

  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(sql => q.name -> sql)).toMap
}
