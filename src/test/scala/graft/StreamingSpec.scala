package graft

import graft.streaming.EventsStream
import org.apache.spark.sql.functions._

/** Streaming path: the watermarked streaming aggregation must produce
  * exactly the batch `window()` result on the same bounded input (and the
  * batch twin is oracle-verified, closing the loop).
  */
class StreamingSpec extends SparkSpec {

  test("streaming tumbling counts equal batch tumbling counts") {
    val streamed = EventsStream.runTumblingOnce(spark, sfDir, "stream_tumbling_test")
      .orderBy("hour_start", "event_type")
      .collect()
    val batch = Tables.events(spark, sfDir)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("hour_start"), col("event_type"), col("n"))
      .orderBy("hour_start", "event_type")
      .collect()
    assert(streamed.nonEmpty)
    assert(streamed.toSeq == batch.toSeq)
  }
}
