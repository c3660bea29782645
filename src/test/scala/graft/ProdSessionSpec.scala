package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the production conf artifact. Deliberately session-free: the test
  * JVM shares one SparkContext across suites (SparkSpec), and static
  * confs like `spark.sql.extensions` cannot apply to an already-running
  * context — so this spec pins the artifact's CONTENT and the
  * extensions-class contract the `spark-submit --conf
  * spark.sql.extensions=graft.GraftExtensions` path relies on; the
  * function registrations themselves are exercised against the live
  * session in GraftExtensionsSpec. */
class ProdSessionSpec extends AnyFunSuite {

  test("conf artifact: AQE/skew/coalesce on, sizes and state store pinned") {
    val m = ProdSession.confs(8192).toMap
    assert(m("spark.sql.adaptive.enabled") == "true")
    assert(m("spark.sql.adaptive.skewJoin.enabled") == "true")
    assert(m("spark.sql.adaptive.coalescePartitions.enabled") == "true")
    assert(m("spark.sql.shuffle.partitions") == "8192")
    assert(m("spark.sql.files.maxPartitionBytes").toLong == 256L * 1024 * 1024)
    assert(m("spark.sql.adaptive.advisoryPartitionSizeInBytes").toLong == 64L * 1024 * 1024)
    assert(m("spark.sql.autoBroadcastJoinThreshold").toLong == 32L * 1024 * 1024)
    assert(m("spark.sql.streaming.stateStore.providerClass").endsWith("RocksDBStateStoreProvider"))
    assert(m("spark.sql.extensions") == "graft.GraftExtensions")
  }

  test("the spark.sql.extensions class is instantiable and injects the function surface") {
    // the exact contract spark-submit exercises: zero-arg construct, then
    // apply to a SparkSessionExtensions — must inject without throwing
    val cls = Class.forName("graft.GraftExtensions")
    val ext = cls.getDeclaredConstructor().newInstance()
      .asInstanceOf[org.apache.spark.sql.SparkSessionExtensions => Unit]
    ext(new org.apache.spark.sql.SparkSessionExtensions)
  }

  test("builder stacks the confs for a fresh application") {
    // inspect via the builder's session-less state: re-derive from confs()
    // (the builder is a fold over it) and spot-check the fold is total
    assert(ProdSession.confs(4).size == 12)
    ProdSession.builder("x", shufflePartitions = 4) // must construct cleanly
  }
}
