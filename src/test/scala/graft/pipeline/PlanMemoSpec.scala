package graft.pipeline

import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** VERDICT r9 task 5: the memoized-artifact lifecycle under CONCURRENT
  * first use and under context stop. The r8 fix (TrieMap + lazy Cell)
  * claims exactly one mining pass per (session, plan, extra) key no matter
  * how many threads race the first call — these tests hammer that claim
  * with a countable side effect instead of trusting the construction. */
class PlanMemoSpec extends SparkSpec {

  private def docsFrame(tag: String): DataFrame =
    spark.range(100).select(col("id").as("doc_id"),
      concat(lit(s"$tag text "), col("id")).as("text"))

  test("N threads racing first use run EXACTLY one mining pass; all see the same value") {
    val memo = new PlanMemo[Long]
    val ran = new AtomicLong(0)
    val docs = docsFrame("race")
    val threads = 16
    val pool = Executors.newFixedThreadPool(threads)
    val gate = new CountDownLatch(1)
    try {
      val futures = (1 to threads).map { _ =>
        pool.submit(new java.util.concurrent.Callable[Long] {
          def call(): Long = {
            gate.await()
            memo(docs) {
              ran.incrementAndGet()
              Thread.sleep(50) // widen the window a lost-update bug needs
              docs.count()
            }
          }
        })
      }
      gate.countDown() // release all threads into the memo at once
      val results = futures.map(_.get(60, TimeUnit.SECONDS))
      assert(results.toSet == Set(100L), s"divergent memo values: $results")
      assert(ran.get() == 1, s"mining pass ran ${ran.get()} times, expected exactly 1")
      assert(memo.misses.get() == 1)
      assert(memo.size == 1)
    } finally pool.shutdownNow()
  }

  test("distinct plans and distinct extras never share an entry") {
    val memo = new PlanMemo[Long]
    val a = docsFrame("corpus-a")
    val b = docsFrame("corpus-b")
    assert(memo(a)(1L) == 1L)
    assert(memo(b)(2L) == 2L) // different source plan
    assert(memo(a, extra = "k=5")(3L) == 3L) // same plan, different extra
    assert(memo(a)(99L) == 1L) // hit: body not run
    assert(memo.misses.get() == 3)
    assert(memo.size == 3)
  }

  test("structurally equal plans share one entry across separate DataFrame objects") {
    val memo = new PlanMemo[Long]
    val ran = new AtomicLong(0)
    // two independently-built frames with the same logical program — the
    // canonicalized-plan key must treat them as the same corpus
    assert(memo(docsFrame("same")) { ran.incrementAndGet(); 7L } == 7L)
    assert(memo(docsFrame("same")) { ran.incrementAndGet(); 8L } == 7L)
    assert(ran.get() == 1)
  }

  test("context stop evicts this context's entries and re-arms the hook") {
    val memo = new PlanMemo[Long]
    val docs = docsFrame("evict")
    memo(docs)(42L)
    assert(memo.size == 1)
    assert(PlanMemo.isHooked(spark.sparkContext),
      "first use must register the eviction listener")
    // drive the listener's effect directly (stopping the suite-shared
    // context would break every other suite in this JVM; Spark delivering
    // onApplicationEnd at stop is Spark's contract, not ours)
    PlanMemo.onContextStop(spark.sparkContext)
    assert(memo.size == 0, "entries keyed by the stopped context must drop")
    assert(!PlanMemo.isHooked(spark.sparkContext),
      "the hook must re-arm so a NEW context in this JVM gets its own listener")
    // a fresh session after the stop re-mines and re-hooks
    assert(memo(docs)(43L) == 43L)
    assert(memo.misses.get() == 2)
    assert(PlanMemo.isHooked(spark.sparkContext))
    PlanMemo.onContextStop(spark.sparkContext) // leave no cross-suite residue
  }

  test("concurrent first use against TWO keys runs one pass each, no cross-talk") {
    val memo = new PlanMemo[Long]
    val ranA = new AtomicLong(0)
    val ranB = new AtomicLong(0)
    val a = docsFrame("two-keys-a")
    val b = docsFrame("two-keys-b")
    val pool = Executors.newFixedThreadPool(8)
    val gate = new CountDownLatch(1)
    try {
      val futures = (1 to 8).map { i =>
        pool.submit(new java.util.concurrent.Callable[Long] {
          def call(): Long = {
            gate.await()
            if (i % 2 == 0) memo(a) { ranA.incrementAndGet(); Thread.sleep(30); 10L }
            else memo(b) { ranB.incrementAndGet(); Thread.sleep(30); 20L }
          }
        })
      }
      gate.countDown()
      val results = futures.map(_.get(60, TimeUnit.SECONDS))
      assert(results.count(_ == 10L) == 4 && results.count(_ == 20L) == 4)
      assert(ranA.get() == 1 && ranB.get() == 1)
    } finally pool.shutdownNow()
  }
}
