package graft

/** Whole-surface plan lint: every SparkEntry query must PLAN (analysis +
  * optimization succeed against the real schemas) and the physical plan
  * must never contain a CartesianProductExec — the one operator shape
  * that is always a scale bug in this library's domain (candidate
  * generation is required to be a band/bucket/cell equi-join; tiny
  * one-row cross joins lower to BroadcastNestedLoopJoin, which is
  * allowed). Catches a regression the per-query oracles cannot: a future
  * edit that stays correct but degrades to an all-pairs plan.
  */
class PlanLintSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("all queries plan without CartesianProduct") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val plan = fn(spark, dir).queryExecution.executedPlan.toString
        if (plan.contains("CartesianProduct")) Some(name) else None
    }
    assert(offenders.isEmpty,
      s"cartesian product in: ${offenders.mkString(", ")}")
  }

  test("flagship entry returns rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
