package graft

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.schema.LogicalTypeAnnotation
import org.apache.parquet.schema.LogicalTypeAnnotation.{TimeUnit, TimestampLogicalTypeAnnotation}
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.apache.spark.sql.types._

/** Schema-drift canary (round 11, VERDICT r10 directive 2).
  *
  * Round 10 lost 23 registry entries and 40 tests because the driver
  * regenerated the testdata between rounds, silently flipping `events.ts`
  * from parquet TIMESTAMP(NANOS) to timestamp[us], and the loader assumed
  * nanos. This spec fails FAST and READABLY on the next such flip:
  *
  *  1. a raw-footer probe that names the exact physical/logical type of `ts`
  *     at every SF, so a new representation (µs→ns flip-back, int96, string…)
  *     fails with a message that says what changed, and
  *  2. a loader-output contract: [[Tables.events]] must always yield the
  *     session-UTC schema the DuckDB oracle has hash-matched since round 1,
  *     regardless of what the footer said.
  */
class SchemaCanarySpec extends SparkSpec {

  private val sfDirs =
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")

  /** Footer (physicalType, logicalAnnotation) of `ts` via the typed parquet API. */
  private def footerTsType(dir: String)
      : (PrimitiveTypeName, Option[org.apache.parquet.schema.LogicalTypeAnnotation]) = {
    val in = HadoopInputFile.fromPath(new Path(s"$dir/events.parquet"), new Configuration())
    val reader = ParquetFileReader.open(in)
    try {
      val schema = reader.getFooter.getFileMetaData.getSchema
      val prim = schema.getType(Seq("ts"): _*).asPrimitiveType()
      (prim.getPrimitiveTypeName, Option(prim.getLogicalTypeAnnotation))
    } finally reader.close()
  }

  test("footer canary: events.ts physical+logical type is one the loader handles") {
    // Every representation Tables.events knows how to normalize. A driver-side
    // regeneration that introduces anything else must fail HERE, with the new
    // type spelled out, not 23 queries deep in an AnalysisException.
    for (dir <- sfDirs) {
      val (phys, logical) = footerTsType(dir)
      val handled = (phys, logical) match {
        case (PrimitiveTypeName.INT64, Some(t: TimestampLogicalTypeAnnotation)) =>
          t.getUnit == TimeUnit.MICROS || t.getUnit == TimeUnit.NANOS
        case _ => false
      }
      assert(
        handled,
        s"\nSCHEMA DRIFT at $dir/events.parquet: ts is now " +
          s"[$phys/${logical.map(_.toString).getOrElse("no-logical-type")}], which " +
          "Tables.events has no branch for (handled: INT64 TIMESTAMP in MICROS or NANOS). " +
          "The driver regenerated the testdata with a new timestamp encoding — " +
          "add a branch in Tables.events AND extend eventsOracleFrom to match.")
    }
  }

  test("loader contract: Tables.events yields the oracle-matched schema at all SFs") {
    val want = StructType(Seq(
      StructField("event_id", LongType),
      StructField("ts", TimestampType),
      StructField("user_id", LongType),
      StructField("event_type", StringType),
      StructField("value", DoubleType),
      StructField("props", StringType)))
    for (dir <- sfDirs) {
      val got = Tables.events(spark, dir).schema
      val gotShape = StructType(got.map(f => StructField(f.name, f.dataType)))
      assert(
        gotShape == want,
        s"\nevents loader at $dir drifted: got ${gotShape.simpleString}, " +
          s"want ${want.simpleString}")
    }
  }

  // ---- documents + embeddings (round 12, VERDICT r11 directive 6) ---------
  // The same insurance on the two other driver-regenerated tables the r10
  // failure mode hasn't hit yet: pin the footer encodings the loaders (and
  // every embedded oracle SQL) silently assume — string columns as
  // BINARY/UTF8, the embedding as list<FLOAT> — plus the one VALUE contract
  // both engines hardcode: dim = 64 (every spectral/RP/whitening oracle
  // spells range(1, 65); ADVICE r11 item 4). A driver-side width or
  // element-type regeneration fails HERE with the drift named, not as
  // dozens of opaque oracle mismatches.

  /** Footer primitive type at a dot-separated path (e.g. "embedding.list.element"). */
  private def footerType(dir: String, table: String, path: String)
      : (PrimitiveTypeName, Option[org.apache.parquet.schema.LogicalTypeAnnotation]) = {
    val in = HadoopInputFile.fromPath(new Path(s"$dir/$table.parquet"), new Configuration())
    val reader = ParquetFileReader.open(in)
    try {
      val schema = reader.getFooter.getFileMetaData.getSchema
      val prim = schema.getType(path.split('.'): _*).asPrimitiveType()
      (prim.getPrimitiveTypeName, Option(prim.getLogicalTypeAnnotation))
    } finally reader.close()
  }

  private def assertStringCol(dir: String, table: String, colName: String): Unit = {
    val (phys, logical) = footerType(dir, table, colName)
    assert(
      phys == PrimitiveTypeName.BINARY &&
        logical.exists(_.isInstanceOf[LogicalTypeAnnotation.StringLogicalTypeAnnotation]),
      s"\nSCHEMA DRIFT at $dir/$table.parquet: $colName is now " +
        s"[$phys/${logical.map(_.toString).getOrElse("no-logical-type")}], " +
        "expected BINARY/STRING — the driver regenerated the table with a new " +
        "string encoding (dictionary id? large_string?); check the loader and " +
        "every oracle reading this column.")
  }

  test("footer canary: documents string columns stay BINARY/STRING, ids stay INT64") {
    for (dir <- sfDirs) {
      Seq("text", "lang", "source").foreach(assertStringCol(dir, "documents", _))
      Seq("doc_id", "n_chars").foreach { c =>
        val (phys, _) = footerType(dir, "documents", c)
        assert(phys == PrimitiveTypeName.INT64,
          s"\nSCHEMA DRIFT at $dir/documents.parquet: $c is now $phys, expected INT64")
      }
    }
  }

  test("footer canary: embeddings element type stays FLOAT, vec_id INT64") {
    for (dir <- sfDirs) {
      val (ePhys, _) = footerType(dir, "embeddings", "embedding.list.element")
      assert(ePhys == PrimitiveTypeName.FLOAT,
        s"\nSCHEMA DRIFT at $dir/embeddings.parquet: embedding element is now " +
          s"$ePhys, expected FLOAT — VectorOps.normalized's float→double cast " +
          "contract (and the oracle's list_transform twin) assumes 32-bit input.")
      val (vPhys, _) = footerType(dir, "embeddings", "vec_id")
      assert(vPhys == PrimitiveTypeName.INT64,
        s"\nSCHEMA DRIFT at $dir/embeddings.parquet: vec_id is now $vPhys, expected INT64")
    }
  }

  test("loader contract: documents and embeddings yield the oracle-matched schemas") {
    val wantDocs = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("text", StringType),
      StructField("lang", StringType),
      StructField("source", StringType),
      StructField("n_chars", LongType)))
    val wantEmb = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("label", IntegerType)))
    for (dir <- sfDirs) {
      def shape(df: org.apache.spark.sql.DataFrame) =
        StructType(df.schema.map(f => StructField(f.name, f.dataType match {
          case ArrayType(t, _) => ArrayType(t)
          case t => t
        })))
      assert(shape(Tables.documents(spark, dir)) == wantDocs,
        s"\ndocuments loader at $dir drifted: got " +
          s"${shape(Tables.documents(spark, dir)).simpleString}, want ${wantDocs.simpleString}")
      assert(shape(Tables.embeddings(spark, dir)) == wantEmb,
        s"\nembeddings loader at $dir drifted: got " +
          s"${shape(Tables.embeddings(spark, dir)).simpleString}, want ${wantEmb.simpleString}")
    }
  }

  test("value canary: every embedding is exactly 64-dim at all SFs") {
    // Both engines HARDCODE dim=64 (Spark: powerVec/gram dims; oracle SQL:
    // range(1, 65) in every spectral/RP/whitening chain). A driver-side
    // width regeneration must fail here, naming the drift, not as a sweep
    // of oracle hash mismatches.
    import org.apache.spark.sql.functions._
    for (dir <- sfDirs) {
      val row = Tables.embeddings(spark, dir)
        .agg(min(size(col("embedding"))).as("lo"), max(size(col("embedding"))).as("hi"))
        .head()
      assert(row.getInt(0) == 64 && row.getInt(1) == 64,
        s"\nembeddings.embedding width at $dir drifted: size range " +
          s"[${row.getInt(0)},${row.getInt(1)}], expected exactly 64 — every " +
          "spectral/RP/whitening oracle hardcodes range(1,65); re-derive DIMS " +
          "in both engines or regenerate the data.")
    }
  }

  test("loader value canary: ts round-trips a concrete microsecond instant") {
    // Schema equality alone would not catch a wrong-by-1000× unit bug (ns
    // interpreted as µs): pin the min/max epoch-micros range to something
    // plausible for driver-generated 2023-2024 event data at every SF.
    import org.apache.spark.sql.functions._
    for (dir <- sfDirs) {
      val row = Tables.events(spark, dir)
        .agg(
          min(unix_micros(col("ts"))).as("lo"),
          max(unix_micros(col("ts"))).as("hi"))
        .head()
      val (lo, hi) = (row.getLong(0), row.getLong(1))
      val y2000 = 946684800000000L  // 2000-01-01 in epoch-µs
      val y2100 = 4102444800000000L // 2100-01-01 in epoch-µs
      assert(
        lo >= y2000 && hi <= y2100 && lo <= hi,
        s"\nevents.ts at $dir decodes outside [2000,2100): epoch-µs range " +
          s"[$lo,$hi] — a unit-scale bug (ns read as µs or vice versa) or " +
          "driver-side data drift.")
    }
  }
}
