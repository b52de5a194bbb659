package graft

import java.nio.file.{Files, Paths}

/** Data-contract preflight (round-9 postmortem): fails in seconds, by
  * name, if the driver-regenerated testdata drifts — before the
  * 10-minute suites produce 10 confusing failures. Keep this suite
  * cheap; it is the first thing to look at when anything events-related
  * goes red.
  */
class CanarySpec extends SparkSpec {

  private val sfDirs = Seq("sf0.001", "sf0.01", "sf0.1")
    .map(sf => sf -> s"/root/testdata/$sf")
    .filter { case (_, dir) => Files.exists(Paths.get(dir)) }

  test("at least one testdata scale factor is present") {
    assert(sfDirs.nonEmpty, "no /root/testdata/sf* directory found")
  }

  for ((sf, dir) <- sfDirs)
    test(s"data contract holds at $sf") {
      val problems = Canary.check(spark, dir)
      assert(problems.isEmpty, problems.mkString("\n  ", "\n  ", ""))
    }
}
