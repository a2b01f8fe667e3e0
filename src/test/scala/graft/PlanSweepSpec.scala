package graft

/** Global plan anti-pattern sweep: EVERY registered query's physical plan
  * is checked for the one join shape that is never acceptable at 100 TB —
  * a non-broadcast CartesianProduct (both sides shuffled, all-pairs).
  * Explicit broadcast cross joins (1-row scalars, k-row centroid/probe
  * tables) compile to BroadcastNestedLoopJoin and pass. Auto-enrolls new
  * queries: planning only, nothing executes.
  */
class PlanSweepSpec extends SparkSpec {

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name plans without a non-broadcast cartesian product") {
      val plan = fn(spark, Sf).queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"),
        s"$name contains an all-pairs cartesian product:\n$plan")
    }
  }
}
