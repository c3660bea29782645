package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards on the oracle-side SQL machinery (ADVICE r12/r13): the
  * `AS MATERIALIZED` rewrite in [[Oracles.pipeline]] is family-scoped by
  * construction (only `pipelineRaw` flows through it), but nothing used
  * to assert HOW MANY definition sites each shared CTE name matched — a
  * future pipeline oracle that happens to define an unrelated CTE named
  * `s` or `j` would pick up the hint silently (semantics-neutral for the
  * plan, but an unreviewed behavior change, and the string-literal guard
  * only fires on odd quote parity). The pin below records the exact
  * per-CTE substitution counts over the current oracle set; ANY drift —
  * a new same-named CTE, a renamed chain stage, a dropped family member —
  * fails this spec with the actual map, forcing a human re-adjudication
  * before re-pinning. */
class OraclesGuardSpec extends AnyFunSuite {

  /** Recorded over the round-15 oracle set (re-pinned in r15: the new
    * eq153 oracle legitimately reuses the advance-chain prefix like
    * eq152 did — adjudicated +1 on exactly the chain CTEs it contains,
    * nothing else moved). Update ONLY after verifying every new match is
    * a genuine chain CTE. */
  private val Expected: Map[String, Int] = Map(
    "toks" -> 55, "shingled" -> 55, "s" -> 55, "xx" -> 20, "mins" -> 20,
    "keys" -> 20, "kk" -> 3, "cand" -> 12, "ver" -> 5, "j" -> 20,
    "zq" -> 16, "o_cs" -> 14, "d_cs" -> 14, "o_k6" -> 14, "d_k6" -> 14,
    "o_k7" -> 14, "d_k7" -> 14, "d_k8" -> 14, "o_ex" -> 14, "d_ex" -> 14,
    "o_tv" -> 14, "oldh" -> 17, "old_keys" -> 17, "new_keys" -> 17,
    "po" -> 17, "okb" -> 14, "stopb" -> 2, "del" -> 1, "ret_keys" -> 1,
    "mm" -> 15)

  private def hitsOf(sqls: Iterable[String]): Map[String, Int] =
    sqls.toSeq.flatMap(Oracles.sharedCteHits)
      .groupMapReduce(_._1)(_._2)(_ + _)

  test("materializeShared substitution counts are pinned per CTE name") {
    val actual = hitsOf(Oracles.pipelineRaw.values)
    assert(actual == Expected,
      "per-CTE substitution drift — re-adjudicate before re-pinning:\n" +
        actual.toSeq.sortBy(_._1)
          .map { case (k, v) => s""""$k" -> $v""" }.mkString(", "))
  }

  test("a colliding CTE name trips the pin") {
    // a hypothetical new oracle reusing the chain name `j` for an
    // unrelated CTE: the counter sees it, so the pin above would fail
    val collision = "WITH j AS (SELECT 1 AS x) SELECT * FROM j"
    assert(Oracles.sharedCteHits(collision) == Map("j" -> 1))
    val drifted = hitsOf(Oracles.pipelineRaw.values ++ Seq(collision))
    assert(drifted != Expected,
      "an added same-named CTE definition must change the pinned map")
  }

  test("a quoted-literal hit still fails loudly at rewrite time") {
    // the load-time guard (ADVICE r12) rejects a match inside a string
    // literal — the rewrite would corrupt DATA, not the plan
    val sql = "SELECT 'kk AS (' AS lit_text"
    assert(Oracles.sharedCteHits(sql) == Map("kk" -> 1)) // counted...
    // ...and the pipeline map's construction would refuse it: the same
    // regex + quote-parity check runs in materializeShared (pinned by
    // the require message contract)
    val e = intercept[IllegalArgumentException] {
      Oracles.materializeSharedForTest(sql)
    }
    assert(e.getMessage.contains("matched inside a string literal"))
  }
}
