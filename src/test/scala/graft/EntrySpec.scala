package graft

/** Driver-contract sanity: entry smoke, registry consistency. */
class EntrySpec extends SparkSpec {

  test("entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("registry names are unique") {
    val names = SparkEntry.registry.map(_.name)
    assert(names.distinct.size == names.size)
  }

  test("every oracle key has a queries entry") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("oracle coverage is the large majority of the surface") {
    val covered = SparkEntry.oracleSql.size.toDouble / SparkEntry.queries.size
    assert(covered > 0.8, s"oracle coverage $covered")
  }

  test("every query executes at sf0.001 and returns a readable result") {
    val failures = SparkEntry.registry.flatMap { q =>
      try {
        q.run(spark, "/root/testdata/sf0.001").write
          .format("noop").mode("overwrite").save()
        None
      } catch { case e: Throwable => Some(q.name -> e.getMessage) }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
