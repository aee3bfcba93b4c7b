package graft
import org.apache.spark.sql.SparkSession
// scratch audit main (not part of the driver contract): write
// explain("formatted") for the named queries to plans/<tag>/<name>_<tag>.txt
// — the optimization rounds' before/after plan evidence. Usage:
//   runMain graft.PlanDump <tag> <query...>
// Runs at sf0.1 (the bench scale) so stats-dependent choices match the bench.
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanDump <tag> <query...>")
    val tag = args.head
    val names = args.tail.toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = java.nio.file.Paths.get("/root/repo/plans/r21")
    java.nio.file.Files.createDirectories(dir)
    SparkEntry.registry.filter(q => names(q.name)).foreach { q =>
      try {
        val df = q.build(spark, "/root/testdata/sf0.1")
        val p = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.writeString(dir.resolve(s"${q.name}_$tag.txt"), p)
        println(s"WROTE ${q.name}")
      } catch { case e: Throwable => println(s"ERR ${q.name}: ${e.getMessage.take(120)}") }
      graft.operators.Materialize.releaseAll(spark)
      spark.sharedState.cacheManager.clearCache()
    }
    println("DUMP_DONE")
    spark.stop()
  }
}
