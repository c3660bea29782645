package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.SparkPlan

import graft.pipeline.Clustering

class ClusteringSpec extends SparkSpec {
  import spark.implicits._

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("kmeans: two well-separated blobs converge to the blob means (k=2)") {
    // blob A around (0, 0), blob B around (10, 10); means are exact in
    // micro-units so the centroid read-back is bit-predictable
    val e = Seq(
      (0L, Array(0.0f, 0.0f)), (1L, Array(0.2f, 0.0f)), (2L, Array(0.0f, 0.2f)),
      (3L, Array(10.0f, 10.0f)), (4L, Array(10.2f, 10.0f)), (5L, Array(10.0f, 10.2f))
    ).toDF("vec_id", "embedding")
    val out = Clustering.kmeansDf(e, k = 2, iters = 5).collect()
    assert(out.length == 4) // 2 clusters x 2 dims
    val byCluster = out.groupBy(_.getInt(0)).view.mapValues(
      _.sortBy(_.getInt(1)).map(r => (r.getLong(2), r.getDouble(3)))).toMap
    val centroids = byCluster.values.map(_.map(_._2).toSeq).toSet
    // means: (0.066667, 0.066667) and (10.066667, 10.066667) — micro-unit
    // floor division of (200000+0+0)/3 = 66666 micros
    assert(centroids == Set(Seq(0.066666, 0.066666), Seq(10.066666, 10.066666)))
    assert(byCluster.values.forall(_.forall(_._1 == 3L))) // 3 members each
  }

  test("kmeans: emptied cluster keeps its previous centroid (duplicate-point seeding)") {
    // three seeds over two distinct coordinates: the duplicated coordinate
    // ties every member to the smaller cid, so the other seed's cluster
    // empties and must carry its centroid forward unchanged
    val e = Seq(
      (0L, Array(1.0f, 1.0f)), (1L, Array(1.0f, 1.0f)), (2L, Array(5.0f, 5.0f))
    ).toDF("vec_id", "embedding")
    val out = Clustering.kmeansDf(e, k = 3, iters = 3).collect()
    assert(out.length == 6) // 3 clusters x 2 dims
    val sizes = out.groupBy(_.getInt(0)).view.mapValues(_.head.getLong(2)).toMap
    assert(sizes.values.sum == 3L)      // every vector assigned exactly once
    assert(sizes.values.exists(_ == 0L)) // one cluster emptied
    // the emptied cluster's centroid is still one of the two input points
    val empties = out.filter(_.getLong(2) == 0L).map(_.getDouble(3)).toSet
    assert(empties.subsetOf(Set(1.0, 5.0)))
  }

  test("pq recall: separated blobs retrieve the query's blob, adc ranking is monotone") {
    // two tight 64-dim blobs; query vec 0 sits in blob A, so the exact
    // top-5 and the PQ top ranks must both stay inside A
    def vec(base: Float, jitter: Float): Array[Float] =
      Array.tabulate(64)(i => base + (if (i % 2 == 0) jitter else -jitter))
    val e = (
      (0L to 5L).map(i => (i, vec(0.1f, 0.001f * i))) ++
      (6L to 11L).map(i => (i, vec(-0.4f, 0.001f * i)))
    ).toDF("vec_id", "embedding")
    val out = Clustering.pqRecallDf(e).collect()
    assert(out.length == 10)
    assert(out.map(_.getInt(0)).toSeq == (1 to 10)) // ranks dense
    val adc = out.map(_.getLong(2))
    assert(adc.zip(adc.tail).forall { case (a, b) => a <= b }) // monotone
    // the 5 nearest by ADC are the rest of blob A, all exact-top-5 hits
    val top5 = out.take(5)
    assert(top5.forall(r => r.getLong(1) >= 1L && r.getLong(1) <= 5L))
    assert(top5.forall(_.getBoolean(3)))
    assert(out.drop(5).forall(!_.getBoolean(3))) // blob B never hits
  }

  test("pq recall: plan is broadcast/hash joins only, no cartesian (sf0.001)") {
    val p = plan(Clustering.pqRecall(spark, Sf))
    assert(!p.contains("CartesianProduct"), s"unexpected cartesian:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast lut join:\n$p")
  }

  test("kmeans: assignment is broadcast-join shaped, no cartesian (sf0.001)") {
    // The returned frame is a memoized-artifact readout (ExistingRDD
    // scans + the broadcast sizes join) — asserting on it alone would
    // let a training-join regression ship (r11-late review finding). So
    // pin BOTH plans: the readout, and the TRAINING-TIME assignment join
    // inspected directly at the assignTo seam the Lloyd loop calls.
    val df = Clustering.kmeans(spark, Sf)
    val p = plan(df)
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast readout join:\n$p")
    assert(!p.contains("CartesianProduct"), s"unexpected cartesian:\n$p")

    import spark.implicits._
    val v = Seq((0, 0L, 0, 5L), (0, 1L, 0, 7L)).toDF("sub", "vec_id", "pos", "v")
    val cents = Seq((0, 0, 0, 4L), (0, 1, 0, 8L)).toDF("sub", "cid", "pos", "cv")
    val tp = plan(Clustering.assignTo(v, cents))
    assert(tp.contains("BroadcastHashJoin"), s"expected broadcast assignment join:\n$tp")
    assert(!tp.contains("CartesianProduct") && !tp.contains("BroadcastNestedLoopJoin"),
      s"unexpected cartesian in the assignment pass:\n$tp")
  }

  test("lloyd artifacts train exactly once per (corpus, config); re-runs read the memo") {
    // The pair-table/labels/vocabulary contract extended to learned
    // clustering artifacts: eq89's centroids and x21's PQ codebooks are
    // each trained ONCE per (session, embeddings plan, config) and every
    // re-run reads the materialized result — counted, not argued.
    graft.pipeline.Dedup.clearDerivedCaches()
    val l0 = Clustering.lloydMisses
    Clustering.kmeans(spark, Sf).collect()
    Clustering.pqRecall(spark, Sf).collect()
    assert(Clustering.lloydMisses == l0 + 2,
      s"expected one kmeans + one PQ training pass, got ${Clustering.lloydMisses - l0}")
    Clustering.kmeans(spark, Sf).collect()
    Clustering.pqRecall(spark, Sf).collect()
    assert(Clustering.lloydMisses == l0 + 2,
      "re-runs must read the memoized Lloyd artifacts, not re-train")
  }
}
