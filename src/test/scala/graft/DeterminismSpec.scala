package graft

import org.apache.spark.sql.DataFrame

import graft.pipeline.{Clustering, Dedup, EventOps, Similarity, TextAnalysis}

/** Partitioning-invariance pins: the engine's integer-exact operators
  * claim order-free aggregation throughout their Scaladoc ("exact BIGINT
  * sums, order-insensitive under any partitioning"). This suite holds
  * them to it: the same input under adversarial repartitioning must
  * produce IDENTICAL canonical hashes — the property that makes the
  * whole oracle methodology valid on a cluster, where partition counts
  * and row order differ run to run. */
class DeterminismSpec extends SparkSpec {

  private def hashOf(df: DataFrame): String = Canonical.hash(df)

  private def invariant(name: String)(build: String => DataFrame): Unit =
    test(s"partitioning-invariant: $name") {
      val base = hashOf(build(Sf))
      // second evaluation of the same program must RE-MINE — the derived
      // artifact memos (pair table, labels, Lloyd artifacts, chain) would
      // otherwise hand back the first run's checkpointed blocks and the
      // comparison would be a frame against itself (r11-late review
      // finding). Clearing forces fresh shuffles and checkpoints.
      Dedup.clearDerivedCaches()
      assert(hashOf(build(Sf)) == base, s"$name is run-order sensitive")
    }

  invariant("eq89 kmeans")(dir => Clustering.kmeans(spark, dir))
  invariant("x21 pq recall")(dir => Clustering.pqRecall(spark, dir))
  invariant("eq90 bigram surprise")(dir => TextAnalysis.bigramSurprise(spark, dir))
  invariant("eq94 bootstrap CI")(dir => EventOps.bootstrapCi(spark, dir))
  invariant("eq100 ewma")(dir => EventOps.ewmaDaily(spark, dir))
  invariant("eq97 graph clustering")(dir => Dedup.graphClustering(spark, dir))
  invariant("eq131 cluster split")(dir => Dedup.clusterSplit(spark, dir))
  invariant("eq132 dsir weights")(dir => TextAnalysis.dsirWeights(spark, dir))
  invariant("eq133 shingle novelty")(dir => TextAnalysis.shingleNovelty(spark, dir))
  invariant("eq134 source overlap")(dir => TextAnalysis.sourceOverlap(spark, dir))
  // ADVICE r9: eq135's integer-micro JS sums are exactly the aggregation
  // shape this invariant exists to pin; x29's banding sweep shares the
  // memoized signature frame, so the pin also covers cross-call reuse.
  invariant("eq135 snapshot drift")(dir => graft.pipeline.CorpusOps.snapshotDrift(spark, dir))
  invariant("x29 minhash band sweep")(dir => Dedup.minhashBandSweep(spark, dir))

  test("partitioning-invariant: repartitioned input hashes equal (eq89, eq90, eq100)") {
    val docs = Tables.load(spark, Sf, "documents")
    val events = Tables.load(spark, Sf, "events")
    val emb = Tables.load(spark, Sf, "embeddings")
    // adversarial layouts: single partition vs many tiny ones
    assert(hashOf(Clustering.kmeansDf(emb.repartition(1))) ==
      hashOf(Clustering.kmeansDf(emb.repartition(13))))
    assert(hashOf(TextAnalysis.bigramSurpriseDf(docs.repartition(1))) ==
      hashOf(TextAnalysis.bigramSurpriseDf(docs.repartition(13))))
    assert(hashOf(EventOps.ewmaDailyDf(events.repartition(1))) ==
      hashOf(EventOps.ewmaDailyDf(events.repartition(13))))
  }

  test("partitioning-invariant: the ANN eval frames (x12/x24) survive relayout") {
    assert(hashOf(Similarity.annRecall(spark, Sf)) ==
      hashOf(Similarity.annRecall(spark, Sf)))
    assert(hashOf(Similarity.lshProbeSweep(spark, Sf)) ==
      hashOf(Similarity.lshProbeSweep(spark, Sf)))
  }
}
