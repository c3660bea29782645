package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Single-pass Gramian (Σ vᵢvⱼ over all vectors) of an embedding column,
  * as a typed `Aggregator[Array[Float], Array[Long], Array[Long]]` — the
  * covariance-structure primitive behind PCA/whitening feature analysis
  * of an embedding corpus.
  *
  * The buffer is the upper triangle (d·(d+1)/2 longs) in row-major order;
  * each vector contributes `floor(vᵢ·vⱼ·1e6)` per cell — float→double is
  * exact, the double product and the ×1e6 are single correctly-rounded
  * IEEE ops, so every term is a deterministic integer and the partial
  * sums re-associate freely across partitions (the eq36/eq62 scaled-
  * integer convention). This is why the result can be hash-compared
  * against a DuckDB oracle at all.
  *
  * Scale: one pass, map-side partial aggregation — executors exchange
  * only d·(d+1)/2-long buffers (16 KB at d=64), never vectors. At
  * ~1e12 rows the micro-integer cells approach Long range; the
  * production variant widens the buffer to DECIMAL(38,0) like eq62's
  * moment sums.
  */
class GramAggregator(dim: Int)
    extends Aggregator[Array[Float], Array[Long], Array[Long]] {

  private val cells = dim * (dim + 1) / 2

  override def zero: Array[Long] = new Array[Long](cells)

  override def reduce(b: Array[Long], v: Array[Float]): Array[Long] = {
    require(v.length == dim, s"expected dim $dim, got ${v.length}")
    var k = 0
    var i = 0
    while (i < dim) {
      val vi = v(i).toDouble
      var j = i
      while (j < dim) {
        b(k) += math.floor(vi * v(j).toDouble * 1e6).toLong
        k += 1
        j += 1
      }
      i += 1
    }
    b
  }

  override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
    var k = 0
    while (k < cells) { x(k) += y(k); k += 1 }
    x
  }

  override def finish(b: Array[Long]): Array[Long] = b

  override def bufferEncoder: Encoder[Array[Long]] =
    Encoders.kryo[Array[Long]]
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}
