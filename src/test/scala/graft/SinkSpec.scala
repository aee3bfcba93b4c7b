package graft

import graft.sources.Sink
import org.apache.spark.sql.types._
import java.nio.file.Files

/** Converter surface: guards, conversion write, zip artifact (reference
  * parity O6/O7/O9/O10/O11 — see Sink's Scaladoc for citations).
  */
class SinkSpec extends SparkSpec {

  test("convertParquet writes widened output and reports rows") {
    val out = Files.createTempDirectory("graft-sink").toString
    val res = Sink.convertParquet(spark, s"$sfDir/lineitem.parquet", out)
    assert(res.rows == 6000)
    val written = spark.read.parquet(res.outputPath)
    assert(written.schema("l_linenumber").dataType == LongType)
    assert(written.count() == 6000)
    assert(res.zipPath.isEmpty)
  }

  test("zip artifact is produced when requested") {
    val out = Files.createTempDirectory("graft-sink-zip").toString
    val res = Sink.convertParquet(spark, s"$sfDir/region.parquet", out,
      Sink.ConvertOptions(zipArtifact = true))
    assert(res.zipPath.isDefined)
    val zf = new java.util.zip.ZipFile(res.zipPath.get)
    try assert(zf.entries().asIterator().hasNext)
    finally zf.close()
  }

  test("input size guard rejects oversized input") {
    intercept[Sink.InputTooLargeException] {
      Sink.convertParquet(spark, s"$sfDir/lineitem.parquet", "/tmp/unused",
        Sink.ConvertOptions(maxInputMb = 0))
    }
  }

  test("jdbcShaped inserts into embedded Derby and reads back widened rows") {
    // Derby ships in /opt/spark/jars (derby + derbyshared + derbytools),
    // so the declared write path runs against a live database: chunked
    // inserts (batchsize 500 over 6000 rows ⇒ 12 inserter round-trips,
    // the reference's 10k-row Inserter shape), then a read-back.
    val url = "jdbc:derby:memory:graftdb;create=true"
    val driver = "org.apache.derby.iapi.jdbc.AutoloadedDriver"
    val li = Tables.lineitem(spark, sfDir)
    Sink.jdbcShaped(li, url, "graft_extract", batchSize = 500, driver = Some(driver))
      .mode(org.apache.spark.sql.SaveMode.Overwrite)
      .save()
    val back = spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", "graft_extract")
      .option("driver", driver)
      .load()
    assert(back.count() == 6000)
    // O5 widening survives the round-trip: ints → BIGINT → LongType
    assert(back.schema("l_linenumber").dataType == LongType)
    assert(back.schema("l_orderkey").dataType == LongType)
    // O4 sanitize: numeric columns are never null after the pipeline
    assert(back.filter(back("l_quantity").isNull).count() == 0)
    // value spot-check against the source
    val srcSum = li.agg(org.apache.spark.sql.functions.sum("l_orderkey")).first.getLong(0)
    val backSum = back.agg(org.apache.spark.sql.functions.sum("l_orderkey")).first.getLong(0)
    assert(srcSum == backSum)
  }

  test("classifyError maps the reference's O13 taxonomy") {
    assert(Sink.classifyError(new OutOfMemoryError()) == "memory")
    assert(Sink.classifyError(new Sink.ConversionTimeoutException(600)) == "timeout")
    assert(Sink.classifyError(new Sink.InputTooLargeException(2048, 1024)) == "input-too-large")
    assert(Sink.classifyError(new RuntimeException(
      "wrap", new IllegalStateException("Schema mismatch on column x"))) == "schema")
    assert(Sink.classifyError(new RuntimeException("boom")) == "other")
  }

  test("writePartitioned overwrites only the partitions present in the frame") {
    import org.apache.spark.sql.functions._
    val out = s"${Files.createTempDirectory("graft-dyn").toString}/orders"
    val orders = Tables.orders(spark, sfDir)
    Sink.writePartitioned(orders, out, "o_orderstatus")
    val full = spark.read.parquet(out).count()
    assert(full == orders.count())

    // re-write ONLY the F partition with a filtered slice; O and P survive
    val fOnly = orders.filter(col("o_orderstatus") === "F").limit(10)
    Sink.writePartitioned(fOnly, out, "o_orderstatus")
    val after = spark.read.parquet(out)
    assert(after.filter(col("o_orderstatus") === "F").count() == 10)
    assert(after.filter(col("o_orderstatus") =!= "F").count() ==
      orders.filter(col("o_orderstatus") =!= "F").count())
  }

  test("DataSourceV2 connector round-trips converted rows in batchsize chunks") {
    // the modern-connector half of "write via JDBC/connector": full V2
    // batch write (WriteBuilder → DataWriter → commit messages) and batch
    // read (ScanBuilder → InputPartition) through GraftSinkProvider
    import graft.sources.GraftMemorySink
    import graft.operators.Convert
    GraftMemorySink.clear("v2rt")
    val src = Convert.pipeline(spark.read.parquet(s"$sfDir/region.parquet"))
    def write(mode: String) = src.write
      .format("graft.sources.GraftSinkProvider")
      .option("name", "v2rt").option("batchsize", "2")
      .mode(mode).save()
    write("append")
    // O6: the stored schema is all-nullable, like the reference's DDL
    assert(GraftMemorySink.schemaOf("v2rt").get.fields.forall(_.nullable))
    // O7: rows arrived in batchsize-bounded chunks (>= ceil(n/2) of them)
    val n = src.count()
    assert(GraftMemorySink.chunksOf("v2rt") >= (n + 1) / 2)
    // V2 read path round-trip: same rows, widened types intact
    val back = spark.read.format("graft.sources.GraftSinkProvider")
      .option("name", "v2rt").load()
    assert(back.schema("r_regionkey").dataType == LongType)
    assert(back.orderBy("r_regionkey").collect().toSeq ==
      src.orderBy("r_regionkey").collect().toSeq)
    // SupportsTruncate: overwrite replaces instead of doubling
    write("overwrite")
    assert(GraftMemorySink.rows("v2rt").length == n)
    GraftMemorySink.clear("v2rt")
  }

  test("V2 connector streaming write: chunked epoch commits, replays dropped") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.sources.GraftMemorySink
    import spark.implicits._
    GraftMemorySink.clear("v2stream")
    val mem = MemoryStream[Long](spark)
    val ckpt = Files.createTempDirectory("graft-v2s").toString
    val q = mem.toDF.toDF("v").writeStream
      .format("graft.sources.GraftSinkProvider")
      .option("name", "v2stream").option("batchsize", "2")
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
    try {
      mem.addData(1L, 2L, 3L, 4L, 5L); q.processAllAvailable()
      mem.addData(6L, 7L); q.processAllAvailable()
    } finally q.stop()
    assert(GraftMemorySink.rows("v2stream").map(_.head).toSet ==
      (1L to 7L).map(x => x: Any).toSet)
    // O7 carried into streaming: rows arrived in batchsize-bounded chunks
    assert(GraftMemorySink.chunksOf("v2stream") >= 4) // ceil(5/2) + ceil(2/2)
    // both epochs committed and recorded
    val epochs = GraftMemorySink.epochsOf("v2stream")
    assert(epochs.size == 2, s"epochs=$epochs")
    // a replayed epoch (micro-batch retry) must be dropped, not re-appended
    val schema = GraftMemorySink.schemaOf("v2stream").get
    GraftMemorySink.commit("v2stream", schema, Array(Seq(99L)), 1L,
      truncate = false, epoch = Some(epochs.head))
    assert(GraftMemorySink.rows("v2stream").length == 7, "replayed epoch re-appended")
    GraftMemorySink.clear("v2stream")
  }

  test("V2 connector streaming: Complete mode truncates per epoch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.sources.GraftMemorySink
    import spark.implicits._
    GraftMemorySink.clear("v2complete")
    val mem = MemoryStream[Long](spark)
    val ckpt = Files.createTempDirectory("graft-v2c").toString
    val q = mem.toDF.toDF("v")
      .agg(org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)).as("n"))
      .writeStream
      .format("graft.sources.GraftSinkProvider")
      .option("name", "v2complete")
      .option("checkpointLocation", ckpt)
      .outputMode("complete").start()
    try {
      mem.addData(1L, 2L, 3L); q.processAllAvailable()
      mem.addData(4L, 5L); q.processAllAvailable()
    } finally q.stop()
    // each epoch REPLACED the table (SupportsTruncate negotiated by the
    // Complete-mode sink): one row, the latest running total. The
    // pre-fix behavior appended every epoch's full result — [3, 5].
    assert(GraftMemorySink.rows("v2complete").map(_.head) == Seq(5L),
      s"rows=${GraftMemorySink.rows("v2complete")}")
    GraftMemorySink.clear("v2complete")
  }

  test("V2 connector streaming: fresh-checkpoint restart appends, not dropped as replay") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.sources.GraftMemorySink
    import spark.implicits._
    GraftMemorySink.clear("v2restart")
    def runOnce(vals: Seq[Long]): Unit = {
      val mem = MemoryStream[Long](spark)
      val ckpt = Files.createTempDirectory("graft-v2r").toString
      val q = mem.toDF.toDF("v").writeStream
        .format("graft.sources.GraftSinkProvider")
        .option("name", "v2restart")
        .option("checkpointLocation", ckpt)
        .outputMode("append").start()
      try { mem.addData(vals: _*); q.processAllAvailable() } finally q.stop()
    }
    // two independent query lifetimes, each committing ITS epoch 0 — keying
    // replays by epoch id alone would silently drop the second batch
    runOnce(Seq(1L, 2L))
    runOnce(Seq(3L))
    assert(GraftMemorySink.rows("v2restart").map(_.head).toSet ==
      Set[Any](1L, 2L, 3L),
      s"rows=${GraftMemorySink.rows("v2restart")}")
    GraftMemorySink.clear("v2restart")
  }

  test("connector options: batchSize is case-insensitive and validated") {
    import graft.sources.GraftMemorySink
    GraftMemorySink.clear("v2opts")
    val src = spark.read.parquet(s"$sfDir/region.parquet")
    // camelCase spelling must not silently fall back to the 10000 default
    src.write.format("graft.sources.GraftSinkProvider")
      .option("name", "v2opts").option("batchSize", "2").mode("append").save()
    assert(GraftMemorySink.chunksOf("v2opts") >= (src.count() + 1) / 2)
    GraftMemorySink.clear("v2opts")
    // a non-numeric value fails fast with a clear message, not a bare
    // NumberFormatException from deep inside the provider
    val e = intercept[Throwable] {
      src.write.format("graft.sources.GraftSinkProvider")
        .option("name", "v2opts").option("batchsize", "abc").mode("append").save()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("batchsize")), messages(e).mkString(" | "))
    GraftMemorySink.clear("v2opts")
  }

  test("V2 connector append with a different schema fails fast") {
    import graft.sources.GraftMemorySink
    GraftMemorySink.clear("v2schema")
    val src = spark.read.parquet(s"$sfDir/region.parquet")
    def write(df: org.apache.spark.sql.DataFrame) = df.write
      .format("graft.sources.GraftSinkProvider")
      .option("name", "v2schema").mode("append").save()
    write(src)
    val e = intercept[Throwable] { write(src.select("r_regionkey")) }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("schema")), messages(e).mkString(" | "))
    // the failed append neither replaced the schema nor dropped rows
    assert(GraftMemorySink.schemaOf("v2schema").get.fields.length ==
      src.schema.fields.length)
    assert(GraftMemorySink.rows("v2schema").length == src.count())
    GraftMemorySink.clear("v2schema")
  }

  test("compact rewrites many small files into the target count, data intact") {
    val dir = s"${Files.createTempDirectory("graft-compact").toString}/li"
    val li = Tables.lineitem(spark, sfDir)
    li.repartition(16).write.parquet(dir)
    def files(d: String) = Option(new java.io.File(d).listFiles()).getOrElse(Array.empty)
      .count(_.getName.endsWith(".parquet"))
    assert(files(dir) == 16)
    Sink.compact(spark, dir, targetMb = 512, sortCols = Seq("l_shipdate"))
    assert(files(dir) == 1) // sf0.001 lineitem << 512 MB
    val re = spark.read.parquet(dir)
    assert(re.count() == li.count())
    assert(re.columns.toSeq == li.columns.toSeq)
  }
}
