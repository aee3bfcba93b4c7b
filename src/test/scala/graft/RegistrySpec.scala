package graft

/** Smoke-executes every registered query at sf0.001 (driver t1 analog) and
  * sanity-checks the registry invariants the driver contract relies on.
  */
class RegistrySpec extends SparkSpec {

  test("registry names are unique and oracle keys are a subset of queries") {
    val names = SparkEntry.registry.map(_.name)
    assert(names.distinct.size == names.size, s"duplicate names: ${names.diff(names.distinct)}")
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("SURVEY.md registry counts match the code") {
    // the doc inventory line is machine-checked so it can never drift from
    // the registry again (r12 verdict: stale "263/260" vs actual 266/263)
    // resolve from user.dir (the forked test JVM's working dir — the sbt
    // project base) with a loud failure if the layout ever changes, rather
    // than a silent bare-relative open
    val path = java.nio.file.Paths.get(sys.props("user.dir"), "SURVEY.md")
    assert(java.nio.file.Files.exists(path),
      s"SURVEY.md not found at $path — test JVM cwd is not the project base")
    val survey = new String(
      java.nio.file.Files.readAllBytes(path),
      java.nio.charset.StandardCharsets.UTF_8)
    val pat = """Registry as of end-r\d+: \*\*(\d+) entries, (\d+) oracle-paired""".r
    val ms = pat.findAllMatchIn(survey).toSeq
    assert(ms.nonEmpty, "SURVEY.md registry count line not found")
    // the inventory line must be UNIQUE — a second bolded count would let
    // this pin silently check the wrong one
    assert(ms.size == 1,
      s"SURVEY.md has ${ms.size} bolded registry-count lines; expected exactly 1")
    val m = ms.head
    assert(m.group(1).toInt == SparkEntry.registry.size,
      s"SURVEY says ${m.group(1)} entries, registry has ${SparkEntry.registry.size}")
    assert(m.group(2).toInt == SparkEntry.oracleSql.size,
      s"SURVEY says ${m.group(2)} oracle-paired, registry has ${SparkEntry.oracleSql.size}")
  }

  // Queries where an empty result at sf0.001 would be fine (tiny data).
  private val mayBeEmpty = Set("q_except", "q_join_anti")

  SparkEntry.registry.foreach { q =>
    test(s"query ${q.name} executes at sf0.001") {
      val n = q.build(spark, sfDir).count()
      if (!mayBeEmpty(q.name)) assert(n > 0, s"${q.name} returned no rows")
    }
  }
}
