package graft.functions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{SetOperation, Sketches, Union}
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator`s over the Apache DataSketches library (on the Spark
  * classpath since 4.x for the built-in HLL functions): mergeable KLL
  * quantile sketches (x26) and theta set-operation sketches (x27). These
  * cover the two sketch families Spark exposes no SQL surface for — KLL
  * (mergeable quantiles with a priori rank-error bounds, unlike
  * `percentile_approx`'s merge-degrading GK) and theta (the only sketch
  * family with INTERSECTION/A-NOT-B estimates, which no HLL can answer).
  *
  * Buffers are the sketches' own serialized byte images, so partial
  * aggregates shuffle as compact binary and re-associate freely — the
  * mergeable-sketch contract. The per-row heapify/serialize round-trip is
  * the robustness-over-throughput choice for this verification engine; the
  * production variant keeps a live sketch object per group with a custom
  * `bufferEncoder` and serializes only at partial-output boundaries.
  *
  * Determinism: theta hashes with a fixed seed (9001) so its estimates are
  * partition-invariant; KLL compaction draws random level offsets, so its
  * quantile VALUES are run-varying — which is why x26 surfaces them only
  * through the rank-interval flags its a-priori bound guarantees, never as
  * hash-checked columns.
  */
object DsSketchAggregators {

  /** KLL doubles quantile sketch of a value stream; result = serialized
    * sketch image (heapify to query ranks/quantiles). */
  class KllDoublesAgg(k: Int)
      extends Aggregator[Double, Array[Byte], Array[Byte]] {
    override def zero: Array[Byte] =
      KllDoublesSketch.newHeapInstance(k).toByteArray
    override def reduce(b: Array[Byte], v: Double): Array[Byte] = {
      val sk = KllDoublesSketch.heapify(Memory.wrap(b))
      sk.update(v)
      sk.toByteArray
    }
    override def merge(x: Array[Byte], y: Array[Byte]): Array[Byte] = {
      val a = KllDoublesSketch.heapify(Memory.wrap(x))
      a.merge(KllDoublesSketch.heapify(Memory.wrap(y)))
      a.toByteArray
    }
    override def finish(b: Array[Byte]): Array[Byte] = b
    override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Theta sketch (union-built) of a long-key stream; result = serialized
    * compact sketch (wrap to estimate, or feed Intersection/AnotB). */
  class ThetaUnionAgg(lgK: Int)
      extends Aggregator[Long, Array[Byte], Array[Byte]] {
    private def newUnion: Union =
      SetOperation.builder().setLogNominalEntries(lgK).buildUnion()
    override def zero: Array[Byte] = newUnion.getResult.toByteArray
    override def reduce(b: Array[Byte], v: Long): Array[Byte] = {
      val u = newUnion
      u.union(Sketches.wrapSketch(Memory.wrap(b)))
      u.update(v)
      u.getResult.toByteArray
    }
    override def merge(x: Array[Byte], y: Array[Byte]): Array[Byte] = {
      val u = newUnion
      u.union(Sketches.wrapSketch(Memory.wrap(x)))
      u.union(Sketches.wrapSketch(Memory.wrap(y)))
      u.getResult.toByteArray
    }
    override def finish(b: Array[Byte]): Array[Byte] = b
    override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }
}
