package graft

/** Global plan-shape regression net: EVERY declared query's physical plan,
  * planned (not executed) at sf0.001, must be free of `CartesianProduct`.
  * The per-family plan asserts in EngineSurfaceSpec/PipelineSpec pin
  * richer properties (pushdown, pruning, broadcast shapes) for the plans
  * they name; this sweep guarantees no FUTURE query ships an accidental
  * unconstrained cartesian — the one plan shape that is never right at
  * 100 TB. (`BroadcastNestedLoopJoin` is deliberately NOT banned here:
  * the engine's scalar-attachment crossJoins against broadcast 1-row/k-row
  * frames legitimately plan as BNLJ; the cartesian-with-two-big-sides
  * failure mode is exactly `CartesianProduct`.)
  *
  * One test per query so a violation names its query in the report. Plans
  * are built with the session's default AQE settings; the initial
  * executedPlan suffices — AQE re-planning never INTRODUCES a cartesian.
  */
class PlanGuardSpec extends SparkSpec {

  SparkEntry.queries.keys.toSeq.sorted.foreach { name =>
    test(s"no cartesian: $name") {
      val plan = SparkEntry.queries(name)(spark, Sf)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"),
        s"$name plans a CartesianProduct:\n$plan")
    }
  }
}
