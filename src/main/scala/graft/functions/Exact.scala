package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Oracle-parity arithmetic: helpers that make float aggregation bit-exact
  * between Spark and the DuckDB oracle.
  *
  * The driver hash-compares query results (SURVEY.md §5.2), so "close enough"
  * doubles are mismatches. The discipline: the test data's money columns sit
  * on an exact 10^-2 grid (verified: max |x*100 - round(x*100)| < 1e-8 across
  * all tables), so we snap each row to an integer grid BEFORE aggregating.
  * Sums of longs are bit-exact and order-independent on both engines; a final
  * division of identical longs by an identical double constant yields
  * identical doubles. Per-row expressions (a*(1-b) etc.) are IEEE-identical
  * on both engines as long as the operation tree is the same, which the
  * paired SQL generators below guarantee.
  *
  * Each Spark helper has a `...Sql` twin producing the equivalent DuckDB SQL
  * text — keep them in lockstep.
  */
object Exact {

  /** Snap a double expression to an integer grid: round(e * scale) as long. */
  def grid(e: Column, scale: Long): Column = round(e * scale.toDouble).cast("long")
  def gridSql(e: String, scale: Long): String =
    s"CAST(round(($e)*CAST($scale AS DOUBLE)) AS BIGINT)"

  /** Exact sum of a gridded double, reported back on the original scale. */
  def sumGrid(e: Column, scale: Long): Column =
    sum(grid(e, scale)).cast("double") / scale.toDouble
  def sumGridSql(e: String, scale: Long): String =
    s"CAST(SUM(${gridSql(e, scale)}) AS DOUBLE)/CAST($scale AS DOUBLE)"

  /** Exact mean of a gridded double: (exact sum) / count, both deterministic. */
  def avgGrid(e: Column, scale: Long): Column =
    sumGrid(e, scale) / count(lit(1)).cast("double")
  def avgGridSql(e: String, scale: Long): String =
    s"${sumGridSql(e, scale)}/CAST(COUNT(*) AS DOUBLE)"

  /** Money (2-decimal) shorthands. */
  def sumMoney(e: Column): Column = sumGrid(e, 100L)
  def sumMoneySql(e: String): String = sumGridSql(e, 100L)
  def avgMoney(e: Column): Column = avgGrid(e, 100L)
  def avgMoneySql(e: String): String = avgGridSql(e, 100L)

  /** COUNT(*) as BIGINT on both sides (DuckDB count is already int64; Spark
    * count is long — but DuckDB SUM(BIGINT) is int128, hence the casts
    * everywhere else).
    */
  def countStarSql: String = "CAST(COUNT(*) AS BIGINT)"

  /** First 8 hex digits of md5, parsed as a non-negative long in [0, 2^32).
    * The only 64-bit-safe hash primitive available identically on both
    * engines (Spark `hash`/`xxhash64` and DuckDB `hash` use different
    * algorithms). Used for fingerprints, MinHash seeds, SimHash bits.
    */
  def md5Int(e: Column): Column = conv(substring(md5(e), 1, 8), 16, 10).cast("long")
  def md5IntSql(e: String): String =
    s"CAST(concat('0x', substr(md5($e), 1, 8)) AS BIGINT)"
}
