package graft

import scala.jdk.CollectionConverters._

/** Golden-hash regression tests (SURVEY.md §5.3): every oracle-checked
  * query's canonical SHA-256 at sf0.001, pinned in
  * `src/test/resources/golden/hashes.txt`. Regenerate with
  * `sbt "runMain graft.GoldenGen"` after an INTENTIONAL semantic change —
  * the DuckDB parity harness is the arbiter of whether the new hashes are
  * right. */
class GoldenSpec extends SparkSpec {

  private lazy val golden: Map[String, String] =
    java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get(GoldenGen.GoldenPath)).asScala
      .filter(_.nonEmpty)
      .map { l => val Array(k, v) = l.split("\\s+"); k -> v }
      .toMap

  Oracles.retail.keys.toSeq.sorted.foreach { name =>
    test(s"golden: $name") {
      assert(Canonical.hash(SparkEntry.queries(name)(spark, Sf)) == golden(name))
    }
  }

  Oracles.pipeline.keys.toSeq.sorted.foreach { name =>
    test(s"golden: $name") {
      assert(Canonical.hash(SparkEntry.queries(name)(spark, Sf)) == golden(name))
    }
  }
}
