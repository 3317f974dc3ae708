package graft.tools

import org.scalatest.funsuite.AnyFunSuite

/** Build-time guard for the perf canary: the frozen 20-query set must
  * stay inside the registry, so a query rename breaks the BUILD, not
  * the round-close capture (the canary is the one cross-round
  * comparable statistic — discovering a stale name while the box is
  * warmed for the closing sweep would waste the capture window). */
class CanarySpec extends AnyFunSuite {

  test("every canary query exists in the registry") {
    val registry = graft.SparkEntry.queries.keySet
    val missing = Canary.set.filterNot(registry.contains)
    assert(missing.isEmpty,
      s"canary names drifted from the registry: $missing")
  }

  test("the canary set is frozen at 20 distinct queries") {
    assert(Canary.set.size == 20, "the set must not grow with the registry")
    assert(Canary.set.distinct.size == Canary.set.size)
  }
}
