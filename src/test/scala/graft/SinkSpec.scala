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

  test("jdbcShaped writer carries batchsize and pipeline schema") {
    val w = Sink.jdbcShaped(Tables.lineitem(spark, sfDir), "jdbc:test://x", "Extract")
    // plan-level check only — no JDBC driver in the offline image
    assert(w != null)
  }
}
