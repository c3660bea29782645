package graft

import graft.pipeline.{Dedup, TextAnalysis}

/** VERDICT r9 task 3's pinned invariant: on the deterministic ScaleBench
  * fixture (linear near-dup/span structure BY CONSTRUCTION), the dedup
  * family's work proxies must grow EXACTLY linearly with the corpus —
  * prefix candidates, verified pairs, and span-emitting docs at 10× the
  * corpus are 10× the 1× counts, to the row. A Σdf²-style candidate
  * blowup, a lossy prefix filter, or a pair table that starts admitting
  * false candidates all break the equality. Wall-clock lives in
  * SCALEBENCH.md/json (local[32] timing is overhead-dominated at these
  * sizes and would pin nothing); counts are the scale CLAIM. */
class ScaleSpec extends SparkSpec {

  test("1x→10x: prefix candidates, pairs, and span docs grow exactly linearly") {
    val d1 = ScaleBench.corpus(spark, 2000).localCheckpoint()
    val d10 = ScaleBench.corpus(spark, 20000).localCheckpoint()
    Dedup.clearDerivedCaches()
    val c1 = Dedup.prefixCandidatesDf(d1).count()
    val p1 = Dedup.jaccardPairsDf(d1).count()
    val s1 = TextAnalysis.maxDupSpansDf(d1).count()
    val c10 = Dedup.prefixCandidatesDf(d10).count()
    val p10 = Dedup.jaccardPairsDf(d10).count()
    val s10 = TextAnalysis.maxDupSpansDf(d10).count()
    // per 100 ids: 2 template groups × C(4,2) + 1 span pair = 13 pairs;
    // 8 template members + 2 span docs = 10 span-emitting docs
    assert(c1 == 2000 / 100 * 13, s"prefix candidates at 1x: $c1")
    assert(p1 == c1, "every prefix candidate on this fixture is a true pair " +
      "(the filter admits no false candidates here)")
    assert(s1 == 2000 / 100 * 10, s"span docs at 1x: $s1")
    assert(c10 == 10 * c1, s"candidates must grow 10x, got $c1 -> $c10")
    assert(p10 == 10 * p1, s"pairs must grow 10x, got $p1 -> $p10")
    assert(s10 == 10 * s1, s"span docs must grow 10x, got $s1 -> $s10")
    Dedup.clearDerivedCaches() // 20k-doc frames must not outlive the test
  }

  test("1x→10x: the mining pass's SHUFFLE MASS grows linearly, not " +
    "quadratically (VERDICT r10 task 2)") {
    // Candidate COUNTS being linear (above) does not by itself prove the
    // plan ships linear bytes — a Σdf²-style self-join would explode the
    // shuffle before the filter prunes the count back down. Pin the bytes:
    // at 10× the corpus, the cold mining pass's total shuffle read must be
    // ≤ ~1.5× linear (constant per-run framing overhead makes small runs
    // read slightly super-linear-proportionally LOW, never high), and far
    // below the ~100× a quadratic candidate blowup would ship.
    val meter = WorkMass.meter(spark.sparkContext)
    val d1 = ScaleBench.corpus(spark, 2000).localCheckpoint()
    val d10 = ScaleBench.corpus(spark, 20000).localCheckpoint()
    Dedup.clearDerivedCaches()
    val w1 = meter(Dedup.jaccardPairsDf(d1).count())
    val w10 = meter(Dedup.jaccardPairsDf(d10).count())
    assert(w1.shuffleRead > 0, "meter must observe the 1x mining shuffle")
    assert(w10.shuffleRead > 3L * w1.shuffleRead,
      s"10x corpus must shuffle materially more than 1x " +
        s"(meter sanity): ${w1.shuffleRead} -> ${w10.shuffleRead}")
    assert(w10.shuffleRead < 15L * w1.shuffleRead,
      s"10x corpus must shuffle ~10x the bytes, not quadratically more: " +
        s"${w1.shuffleRead} -> ${w10.shuffleRead}")
    Dedup.clearDerivedCaches() // 20k-doc frames must not outlive the test
  }
}
