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

  /** Recorded over the round-16 oracle set (re-pinned in r16: the new
    * eq154 oracle legitimately reuses the advance-chain prefix like
    * eq152/eq153 did — adjudicated +1 on exactly the chain CTEs it
    * contains, nothing else moved). Update ONLY after verifying every new
    * match is a genuine chain CTE. */
  private val Expected: Map[String, Int] = Map(
    "toks" -> 56, "shingled" -> 56, "s" -> 56, "xx" -> 21, "mins" -> 21,
    "keys" -> 21, "kk" -> 3, "cand" -> 12, "ver" -> 5, "j" -> 20,
    "zq" -> 17, "o_cs" -> 15, "d_cs" -> 15, "o_k6" -> 15, "d_k6" -> 15,
    "o_k7" -> 15, "d_k7" -> 15, "d_k8" -> 15, "o_ex" -> 15, "d_ex" -> 15,
    "o_tv" -> 15, "oldh" -> 18, "old_keys" -> 18, "new_keys" -> 18,
    "po" -> 18, "okb" -> 15, "stopb" -> 2, "del" -> 1, "ret_keys" -> 1,
    "mm" -> 16)

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
