package graft.operators

import graft.{GQuery, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) layout: multi-dimensional data skipping
  * (SURVEY.md §2.2 sources / §11 scale).
  *
  * A 100 TB table is read through its file/row-group min-max stats: a file
  * is opened only when its stat box overlaps the query's predicate box.
  * Sorting by ONE column makes that column's boxes tight and every other
  * column's boxes full-range, so a two-dimensional predicate prunes on one
  * dimension only. Interleaving the bits of both sort keys (the Morton
  * curve) makes every file's box a small hyper-rectangle in BOTH
  * dimensions — the layout trick behind Delta/Iceberg `ZORDER BY`.
  *
  * Everything here is exact integer bit arithmetic, so the DuckDB oracle
  * replays the curve bit-for-bit:
  *   - `q_zorder_bucket_stats` — the per-bucket stat boxes a footer would
  *     hold, showing each z-bucket tight in BOTH dimensions.
  *   - `q_zorder_skipping` — the skipping audit: for one 2-d rectangle,
  *     how many equal-width buckets each layout (z-order / custkey-sort /
  *     date-sort) must read, and how many rows that IO touches.
  *   - [[writeZorderLayout]] / [[zorderRead]] — the persisted lifecycle:
  *     data partitioned by z-bucket plus a bounded stats sidecar (the
  *     footer-stats stand-in a lakehouse keeps in table metadata); serving
  *     derives overlapping buckets from the sidecar and prunes partitions
  *     (pinned in PartitionBucketSpec).
  *
  * TEST-SCALE knobs: 16 interleaved bits per dimension (covers custkey to
  * sf0.1 and the full 1995-2001 date range; at larger scale raise to the
  * key's bit width), 64 stat buckets for the persisted layout, and 256
  * equal-count files in the skipping audit (size file count ∝
  * data / target-file-size at scale).
  */
object LayoutQueries {

  private val ZBITS = 16
  private val NBUCKETS = 64L
  // Skipping-audit file count. Finer than NBUCKETS so the file grid gives the
  // curve ~4 bits per dimension: at 64 files the 45-55% rectangle straddling
  // the curve's center (all four quadrants meet there) reads as many files as
  // a 1-d sort; at 256 the z-layout scans ~2.5-3x fewer rows even at that
  // worst-case placement (measured at sf0.01: 607 vs 1463/1522 rows).
  private val NFILES = 256L
  // Must precede `defs`: the oracle SQL strings interpolate it eagerly at
  // object init (a forward val reference would bake in 0).
  private val MICRO = 4096L

  /** Morton interleave of the low [[ZBITS]] bits of two BIGINT expressions,
    * as engine SQL. Bit i of x lands at position 2i, of y at 2i+1.
    */
  private[graft] def mortonSpark(x: String, y: String): String =
    (0 until ZBITS).map(i =>
      s"shiftleft(shiftright($x, $i) & 1, ${2 * i}) + " +
        s"shiftleft(shiftright($y, $i) & 1, ${2 * i + 1})").mkString(" + ")

  private def mortonDuck(x: String, y: String): String =
    (0 until ZBITS).map(i =>
      s"((($x >> $i) & 1) << ${2 * i}) + ((($y >> $i) & 1) << ${2 * i + 1})")
      .mkString(" + ")

  /** Orders keyed by the two skip dimensions: customer and day-number
    * (map-only; the date epoch matches q_date_funcs' oracle convention).
    */
  private def zbase(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir).select(
      col("o_orderkey"),
      col("o_custkey").as("ck"),
      datediff(col("o_orderdate"), lit("1995-01-01").cast("date"))
        .cast("long").as("d"))
      .withColumn("zv", expr(mortonSpark("ck", "d")))

  private val zbaseDuck: String =
    s"""SELECT o_orderkey, o_custkey AS ck,
       |  CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS d
       |FROM orders""".stripMargin

  val defs: Seq[GQuery] = Seq(

    GQuery(
      // The stat boxes a z-ordered file footer would carry: bucket rows by
      // equal-width slices of the z-range (64 buckets ~ 64 files) and report
      // each bucket's min-max box in BOTH dimensions. The boxes being small
      // in ck AND d at once is the property 1-d sorting cannot give. One
      // scan, one 1-row stats agg broadcast back, one shuffle on bucket.
      "q_zorder_bucket_stats",
      (s, dir) => {
        val z = zbase(s, dir)
        // the extra min/max pairs feed the ZBITS range guard below: a key
        // past 2^ZBITS-1 would silently alias z-values (merged stat boxes,
        // degraded skipping), so the query fails loudly instead — no extra
        // pass, the guard rides the existing 1-row stats agg
        val st = z.agg(min("zv").as("zmin"), max("zv").as("zmax"),
          min("ck").as("g_ck_lo"), max("ck").as("g_ck_hi"),
          min("d").as("g_d_lo"), max("d").as("g_d_hi"))
        val lim = 1L << ZBITS
        z.crossJoin(broadcast(st)) // 1-row bound
          .filter(expr(
            s"assert_true(g_ck_lo >= 0 AND g_ck_hi < $lim AND " +
              s"g_d_lo >= 0 AND g_d_hi < $lim, " +
              s"'z-order key exceeds ZBITS=$ZBITS bits — raise ZBITS') IS NULL"))
          .withColumn("bucket",
            expr(s"(zv - zmin) * $NBUCKETS div (zmax - zmin + 1)"))
          .groupBy("bucket")
          .agg(count(lit(1)).as("n"),
            min("ck").as("min_ck"), max("ck").as("max_ck"),
            min("d").as("min_d"), max("d").as("max_d"))
          .orderBy("bucket")
      },
      Some(s"""WITH base AS ($zbaseDuck),
              |z AS (SELECT *, ${mortonDuck("ck", "d")} AS zv FROM base),
              |st AS (SELECT min(zv) AS zmin, max(zv) AS zmax FROM z)
              |SELECT (zv - zmin) * $NBUCKETS // (zmax - zmin + 1) AS bucket,
              |  CAST(count(*) AS BIGINT) AS n,
              |  min(ck) AS min_ck, max(ck) AS max_ck,
              |  min(d) AS min_d, max(d) AS max_d
              |FROM z CROSS JOIN st
              |GROUP BY 1 ORDER BY bucket""".stripMargin)
    ),

    GQuery(
      // The skipping audit: fix one 2-d rectangle (the middle ~10% of each
      // dimension's range, derived from data so it is scale-free) and ask,
      // for each of three layouts — z-order, custkey-sorted, date-sorted —
      // how many of NFILES equal-SIZE files a reader must open (stat box
      // overlaps the rectangle) and how many rows that IO touches. Files
      // are equal-count because real files are: rows are cut into files by
      // cumulative position along the layout's sort key. That cut is exact
      // without any corpus-scale window: a micro-bucket census (≤ 4096 rows
      // PER LAYOUT, fixed regardless of corpus size) is cumulated by a
      // window partitioned by layout over the bounded census — control
      // plane, not data plane — and each micro-bucket lands in the file its
      // starting offset falls in. rows_matched is layout-invariant and
      // anchors correctness. One corpus scan via a 3-way explode, one
      // shuffle on (layout, micro-bucket), then bounded-frame ops only.
      "q_zorder_skipping",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val z = zbase(s, dir)
        val st = z.agg(
          min("ck").as("ckmin"), max("ck").as("ckmax"),
          min("d").as("dmin"), max("d").as("dmax"),
          min("zv").as("zmin"), max("zv").as("zmax"))
        val census = z.crossJoin(broadcast(st)) // 1-row bound
          .withColumn("lo_ck", expr("ckmin + (ckmax - ckmin) * 45 div 100"))
          .withColumn("hi_ck", expr("ckmin + (ckmax - ckmin) * 55 div 100"))
          .withColumn("lo_d", expr("dmin + (dmax - dmin) * 45 div 100"))
          .withColumn("hi_d", expr("dmin + (dmax - dmin) * 55 div 100"))
          .withColumn("layout",
            explode(array(lit("zorder"), lit("custkey"), lit("orderdate"))))
          .withColumn("mb", expr(
            s"""CASE layout
               |  WHEN 'zorder' THEN (zv - zmin) * $MICRO div (zmax - zmin + 1)
               |  WHEN 'custkey' THEN (ck - ckmin) * $MICRO div (ckmax - ckmin + 1)
               |  ELSE (d - dmin) * $MICRO div (dmax - dmin + 1)
               |END""".stripMargin))
          .withColumn("hit", expr(
            "CASE WHEN ck BETWEEN lo_ck AND hi_ck AND d BETWEEN lo_d AND hi_d " +
              "THEN 1L ELSE 0L END"))
          .groupBy("layout", "mb")
          .agg(count(lit(1)).as("n"),
            min("ck").as("bmin_ck"), max("ck").as("bmax_ck"),
            min("d").as("bmin_d"), max("d").as("bmax_d"),
            sum("hit").as("matched"),
            max("lo_ck").as("lo_ck"), max("hi_ck").as("hi_ck"),
            max("lo_d").as("lo_d"), max("hi_d").as("hi_d"))
        val wCum = Window.partitionBy("layout").orderBy("mb")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wAll = Window.partitionBy("layout")
        census
          .withColumn("start", sum("n").over(wCum) - col("n"))
          .withColumn("total", sum("n").over(wAll))
          .withColumn("file", expr(s"start * $NFILES div total"))
          .groupBy("layout", "file")
          .agg(sum("n").as("n"),
            min("bmin_ck").as("fmin_ck"), max("bmax_ck").as("fmax_ck"),
            min("bmin_d").as("fmin_d"), max("bmax_d").as("fmax_d"),
            sum("matched").as("matched"),
            max("lo_ck").as("lo_ck"), max("hi_ck").as("hi_ck"),
            max("lo_d").as("lo_d"), max("hi_d").as("hi_d"))
          .withColumn("read", expr(
            "CASE WHEN fmax_ck >= lo_ck AND fmin_ck <= hi_ck " +
              "AND fmax_d >= lo_d AND fmin_d <= hi_d THEN 1L ELSE 0L END"))
          .groupBy("layout")
          .agg(count(lit(1)).as("n_files"),
            sum("read").as("n_files_read"),
            sum(expr("CASE WHEN read = 1 THEN n ELSE 0L END")).as("rows_scanned"),
            sum("matched").as("rows_matched"))
          .orderBy("layout")
      },
      Some(s"""WITH base AS ($zbaseDuck),
              |z AS (SELECT *, ${mortonDuck("ck", "d")} AS zv FROM base),
              |st AS (SELECT min(ck) AS ckmin, max(ck) AS ckmax,
              |    min(d) AS dmin, max(d) AS dmax,
              |    min(zv) AS zmin, max(zv) AS zmax FROM z),
              |ex AS (SELECT l.layout, z.ck, z.d, z.zv,
              |    st.ckmin + (st.ckmax - st.ckmin) * 45 // 100 AS lo_ck,
              |    st.ckmin + (st.ckmax - st.ckmin) * 55 // 100 AS hi_ck,
              |    st.dmin + (st.dmax - st.dmin) * 45 // 100 AS lo_d,
              |    st.dmin + (st.dmax - st.dmin) * 55 // 100 AS hi_d,
              |    CASE l.layout
              |      WHEN 'zorder' THEN (z.zv - st.zmin) * $MICRO // (st.zmax - st.zmin + 1)
              |      WHEN 'custkey' THEN (z.ck - st.ckmin) * $MICRO // (st.ckmax - st.ckmin + 1)
              |      ELSE (z.d - st.dmin) * $MICRO // (st.dmax - st.dmin + 1)
              |    END AS mb
              |  FROM z CROSS JOIN st
              |  CROSS JOIN (SELECT unnest(['zorder', 'custkey', 'orderdate']) AS layout) l),
              |pb AS (SELECT layout, mb, CAST(count(*) AS BIGINT) AS n,
              |    min(ck) AS bmin_ck, max(ck) AS bmax_ck,
              |    min(d) AS bmin_d, max(d) AS bmax_d,
              |    CAST(sum(CASE WHEN ck BETWEEN lo_ck AND hi_ck
              |      AND d BETWEEN lo_d AND hi_d THEN 1 ELSE 0 END) AS BIGINT) AS matched,
              |    max(lo_ck) AS lo_ck, max(hi_ck) AS hi_ck,
              |    max(lo_d) AS lo_d, max(hi_d) AS hi_d
              |  FROM ex GROUP BY layout, mb),
              |fb AS (SELECT *,
              |    sum(n) OVER (PARTITION BY layout ORDER BY mb
              |      ROWS UNBOUNDED PRECEDING) - n AS start,
              |    sum(n) OVER (PARTITION BY layout) AS total
              |  FROM pb),
              |ff AS (SELECT layout, start * $NFILES // total AS file,
              |    CAST(sum(n) AS BIGINT) AS n,
              |    min(bmin_ck) AS fmin_ck, max(bmax_ck) AS fmax_ck,
              |    min(bmin_d) AS fmin_d, max(bmax_d) AS fmax_d,
              |    CAST(sum(matched) AS BIGINT) AS matched,
              |    max(lo_ck) AS lo_ck, max(hi_ck) AS hi_ck,
              |    max(lo_d) AS lo_d, max(hi_d) AS hi_d
              |  FROM fb GROUP BY 1, 2),
              |rb AS (SELECT *, CASE WHEN fmax_ck >= lo_ck AND fmin_ck <= hi_ck
              |    AND fmax_d >= lo_d AND fmin_d <= hi_d THEN 1 ELSE 0 END AS read
              |  FROM ff)
              |SELECT layout, $countStarSqlAlias AS n_files,
              |  CAST(sum(read) AS BIGINT) AS n_files_read,
              |  CAST(sum(CASE WHEN read = 1 THEN n ELSE 0 END) AS BIGINT) AS rows_scanned,
              |  CAST(sum(matched) AS BIGINT) AS rows_matched
              |FROM rb GROUP BY layout ORDER BY layout""".stripMargin)
    )
  )

  private def countStarSqlAlias = "CAST(count(*) AS BIGINT)"

  // ---- persisted layout lifecycle (pinned in PartitionBucketSpec) ---------

  /** Write orders z-ordered: data partitioned by z-bucket (each partition
    * dir ~ one tight hyper-rectangle) plus a `_zstats` sidecar holding each
    * bucket's stat box — the metadata a lakehouse table format keeps in its
    * manifest, so a probe never scans data to learn where things are.
    */
  /** `nBuckets` is the [[NBUCKETS]] sizing knob (buckets ≈ table bytes /
    * 256 MB–1 GB target file at scale); probes derive the bucket set from
    * the sidecar, never from the count, so any build size serves correctly
    * (non-default size pinned in PartitionBucketSpec).
    */
  def writeZorderLayout(s: SparkSession, dir: String, path: String,
                        nBuckets: Long = NBUCKETS): Unit = {
    val z = zbase(s, dir)
    // loud range guard: the Morton interleave uses only the low ZBITS bits
    // of each key, so a key past 2^ZBITS-1 would silently alias onto an
    // unrelated z-value and merge stat boxes (skipping quietly degrades,
    // results stay correct only via the residual filter). Fail the BUILD
    // instead — one extra 4-column row on the stats pass already paid here.
    val lim = 1L << ZBITS
    val b = z.agg(min("ck"), max("ck"), min("d"), max("d")).head()
    val (ckLo, ckHi, dLo, dHi) =
      (b.getLong(0), b.getLong(1), b.getLong(2), b.getLong(3))
    require(ckLo >= 0 && ckHi < lim && dLo >= 0 && dHi < lim,
      s"z-order keys out of range for ZBITS=$ZBITS: ck in [$ckLo,$ckHi], " +
        s"d in [$dLo,$dHi], allowed [0,${lim - 1}] — raise ZBITS to cover " +
        "the key width or the interleave aliases unrelated rows")
    val st = z.agg(min("zv").as("zmin"), max("zv").as("zmax"))
    val bucketed = z.crossJoin(broadcast(st))
      .withColumn("zb", expr(s"(zv - zmin) * $nBuckets div (zmax - zmin + 1)"))
      .select("o_orderkey", "ck", "d", "zb")
    bucketed.write.mode("overwrite").partitionBy("zb").parquet(s"$path/data")
    bucketed.groupBy("zb")
      .agg(min("ck").as("min_ck"), max("ck").as("max_ck"),
        min("d").as("min_d"), max("d").as("max_d"))
      .coalesce(1).write.mode("overwrite").parquet(s"$path/_zstats")
  }

  /** Serve a 2-d rectangle query from the layout: consult the sidecar for
    * buckets whose box overlaps the rectangle (bounded ≤ [[NBUCKETS]]-row
    * control-plane collect, broadcast-equivalent), then read ONLY those
    * partitions — the isin literal must land in PartitionFilters — with the
    * residual predicate on the pruned rows. Stat boxes bound their rows, so
    * a skipped bucket can hold no match: equals the full-scan filter
    * exactly.
    */
  def zorderRead(s: SparkSession, path: String,
                 ckLo: Long, ckHi: Long, dLo: Long, dHi: Long): DataFrame = {
    val hot = s.read.parquet(s"$path/_zstats")
      .filter(col("max_ck") >= ckLo && col("min_ck") <= ckHi &&
        col("max_d") >= dLo && col("min_d") <= dHi)
      .select("zb").collect().map(_.getLong(0))
    s.read.parquet(s"$path/data")
      .filter(col("zb").isin(hot: _*))
      .filter(col("ck").between(ckLo, ckHi) && col("d").between(dLo, dHi))
      .select("o_orderkey", "ck", "d")
  }
}
