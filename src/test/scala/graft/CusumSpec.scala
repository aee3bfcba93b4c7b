package graft

/** Pins `q_events_cusum`'s window formulation against the textbook
  * sequential recursion S_t = max(0, S_{t-1} + d_t): the query computes
  * S via prefix_t − min(0, running-min of prefix), and this spec re-runs
  * the recursion directly over the same hourly censuses in plain Scala —
  * if the identity (or the window frames implementing it) ever drifts,
  * the failure names the exact (event_type, hr) cell.
  */
class CusumSpec extends SparkSpec {

  test("q_events_cusum equals the direct max(0, S + d) recursion") {
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01").foreach { dir =>
      val got = SparkEntry.queries("q_events_cusum")(spark, dir).collect()
        .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(3), r.getBoolean(4)))
        .toMap
      assert(got.nonEmpty)

      val hourly = Tables.events(spark, dir)
        .selectExpr("event_type", "CAST(unix_micros(ts) div 3600000000 AS LONG) AS hr")
        .groupBy("event_type", "hr").count().collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))

      hourly.groupBy(_._1).foreach { case (et, rows) =>
        val sorted = rows.sortBy(_._2)
        val s = sorted.map(_._3).sum
        val nh = sorted.length.toLong
        var acc = 0L
        sorted.foreach { case (_, hr, n) =>
          val d = 4L * nh * n - 5L * s
          acc = math.max(0L, acc + d)
          val (cusum, alarm) = got((et, hr))
          assert(cusum == acc,
            s"$dir ($et, hr=$hr): window cusum $cusum != recursion $acc")
          assert(alarm == (acc > 4L * s))
        }
      }
    }
  }
}
