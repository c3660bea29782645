package graft

import org.apache.spark.sql.functions._

import graft.functions.SketchExpressions
import graft.pipeline.{CorpusOps, TextAnalysis}

/** Specs for the sketch-backed operators (x9 bloom-prefiltered
  * decontamination, x10 Count-Min heavy hitters) and the probe
  * expressions behind them. */
class SketchOpsSpec extends SparkSpec {
  import spark.implicits._

  private def fixtureDocs = Tables.load(spark, Sf, "documents")

  test("bloom probe has no false negatives over the fixture vocabulary") {
    val vocab = fixtureDocs
      .select(explode(graft.functions.ShingleExpressions.shingles(col("text"), 3)).as("sg"))
      .distinct()
    val bf = vocab.stat.bloomFilter("sg", 100000L, 0.03)
    val missed = vocab
      .filter(!SketchExpressions.bloom_might_contain(col("sg"), bf))
      .count()
    assert(missed == 0L, "a Bloom filter must never miss an inserted member")
  }

  test("cms estimates are >= true counts for every fixture shingle") {
    val exploded = fixtureDocs
      .select(explode(graft.functions.ShingleExpressions.shingles(col("text"), 3)).as("sg"))
    val cms = exploded.stat.countMinSketch(col("sg"), 1e-4, 0.99, 42)
    val bad = exploded.groupBy("sg").agg(count(lit(1)).as("n"))
      .filter(SketchExpressions.cms_estimate(col("sg"), cms) < col("n"))
      .count()
    assert(bad == 0L, "Count-Min never underestimates")
  }

  test("x9 totals equal the unfiltered eq29 contamination aggregated per lang") {
    val viaBloom = TextAnalysis.bloomContaminationDf(fixtureDocs)
      .select("lang", "total_contaminated")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val direct = TextAnalysis.contaminationDf(fixtureDocs)
      .join(fixtureDocs.select("doc_id", "lang"), "doc_id")
      .groupBy("lang").agg(sum("n_contaminated").as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    direct.foreach { case (lang, t) =>
      assert(viaBloom.getOrElse(lang, 0L) == t,
        s"bloom-prefiltered total for $lang must match the direct join")
    }
  }

  test("x9 physical plan prefilters with the bloom probe before the verify join") {
    val plan = TextAnalysis.bloomContaminationDf(fixtureDocs)
      .queryExecution.executedPlan.toString
    assert(plan.contains("bloommightcontain") || plan.contains("BloomMightContain"),
      s"expected a BloomMightContain filter in the plan")
  }

  test("x10 exact counts match eq33 and both sketch flags hold") {
    val cmsRows = CorpusOps.cmsTopKDf(fixtureDocs).collect()
    val exact = CorpusOps.trigramTopKDf(fixtureDocs).collect()
    assert(cmsRows.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      == exact.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq)
    cmsRows.foreach { r =>
      assert(r.getAs[Boolean]("cms_ge"), s"cms_ge must hold for ${r.getString(0)}")
      assert(r.getAs[Boolean]("cms_close"), s"cms_close must hold for ${r.getString(0)}")
    }
  }

  test("x20: per-type and merged-union HLL flags hold; ALL row covers the global distinct") {
    val out = graft.pipeline.EventOps.hllMergeUsersDf(Tables.load(spark, Sf, "events"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getBoolean(2)))
    assert(out.exists(_._1 == "ALL"), "merged rollup row must be present")
    out.foreach { case (t, _, ok) => assert(ok, s"HLL estimate out of bounds for $t") }
    val all = out.find(_._1 == "ALL").get._2
    val perMax = out.filter(_._1 != "ALL").map(_._2).max
    val perSum = out.filter(_._1 != "ALL").map(_._2).sum
    assert(all >= perMax && all <= perSum,
      "global distinct must sit between the largest slice and the slice sum")
  }

  test("x26: KLL rank flags hold per type and for the merged ALL row; exact quantiles ordered") {
    val out = graft.star.AggSurface.kllQuantiles(spark, Sf).collect()
    assert(out.exists(_.getString(0) == "ALL"), "merged-buffer ALL row must be present")
    out.foreach { r =>
      assert(r.getAs[Boolean]("p50_in_bounds") && r.getAs[Boolean]("p90_in_bounds"),
        s"KLL guarantee violated for ${r.getString(0)}")
      assert(r.getAs[Double]("p50_exact") <= r.getAs[Double]("p90_exact"))
    }
  }

  test("x27: theta set-op estimates are exact-mode on known cohorts; query flags hold") {
    import graft.functions.DsSketchAggregators.ThetaUnionAgg
    import org.apache.datasketches.memory.Memory
    import org.apache.datasketches.theta.{SetOperation, Sketches}
    // two hand-built cohorts: {1..60} and {41..100} → |A∩B|=20, |A\B|=40, |A∪B|=100
    val agg = new ThetaUnionAgg(12)
    def sketchOf(ids: Range): Array[Byte] =
      ids.foldLeft(agg.zero)((b, i) => agg.reduce(b, i.toLong))
    val a = Sketches.wrapSketch(Memory.wrap(sketchOf(1 to 60)))
    val b = Sketches.wrapSketch(Memory.wrap(sketchOf(41 to 100)))
    assert(SetOperation.builder().buildIntersection().intersect(a, b).getEstimate == 20.0)
    assert(SetOperation.builder().buildANotB().aNotB(a, b).getEstimate == 40.0)
    val u = SetOperation.builder().buildUnion(); u.union(a); u.union(b)
    assert(u.getResult.getEstimate == 100.0)
    // split-and-merge associativity in exact mode: same estimate
    val m = agg.merge(sketchOf(1 to 30), sketchOf(31 to 60))
    assert(Sketches.wrapSketch(Memory.wrap(m)).getEstimate == 60.0)
    val out = graft.star.AggSurface.thetaAudience(spark, Sf).collect()
    assert(out.length == 1 && Seq("view_only_ok", "both_ok", "any_ok")
      .forall(c => out(0).getAs[Boolean](c)), "theta estimate flags must hold")
  }

  test("bloom contamination on a corpus with no train/test overlap reports zero") {
    // doc_ids chosen so the md5 split assigns at least one test doc; with
    // wholly distinct vocabularies any test doc must report 0 contaminated
    val rows = (0L until 40L).map { i =>
      val toks = (0 until 6).map(j => s"tok${i}_$j").mkString(" ")
      (i, toks, "en", "s", toks.length.toLong)
    }
    val out = TextAnalysis.bloomContaminationDf(rows.toDF("doc_id", "text", "lang", "source", "n_chars"))
      .collect()
    assert(out.forall(_.getAs[Long]("total_contaminated") == 0L))
  }
}
