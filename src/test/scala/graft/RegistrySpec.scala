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

  // Queries where an empty result at sf0.001 would be fine (tiny data).
  private val mayBeEmpty = Set("q_except", "q_join_anti")

  SparkEntry.registry.foreach { q =>
    test(s"query ${q.name} executes at sf0.001") {
      val n = q.build(spark, sfDir).count()
      if (!mayBeEmpty(q.name)) assert(n > 0, s"${q.name} returned no rows")
    }
  }
}
