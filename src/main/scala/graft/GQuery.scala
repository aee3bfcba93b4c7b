package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable engine capability: a Spark DataFrame build plus (where SQL
  * can express it) an equivalent ANSI SQL the driver runs in DuckDB over the
  * same parquet tables (BASELINE.json "metric"). Column names/aliases must
  * match exactly between the two (driver sorts columns by name, then hashes).
  *
  * Determinism discipline (SURVEY.md §5.2): every query ends in a total-order
  * sort; float aggregates are snapped to an integer grid per-row BEFORE
  * summing (cents-exact — sums of longs are bit-exact on both engines) or
  * rounded where boundary drift is provably impossible.
  *
  * @param bench whether Bench.scala times this query at sf0.1 (headline set).
  * @param trainer whether the build runs an iterative model-training loop
  *                (BPE/WordPiece merge rounds): its cost is algorithmic
  *                (K census-rewrite rounds), not plan cost, so Bench.scala
  *                reports it in a separate `trainer_sec` subtotal to keep
  *                cross-round headline totals comparable as trainers
  *                accumulate.
  */
final case class GQuery(
    name: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    bench: Boolean = true,
    trainer: Boolean = false
)
