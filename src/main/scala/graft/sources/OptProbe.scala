package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool (r16 optimization round): phase-level wall timing for the
  * state-log lifecycle drills — the bench's dominant family. Runs the
  * same phases as eq144/eq147/eq150/eq151 with a timer around each, so
  * the optimization targets the measured phase, not a guess. Not a
  * declared query; results are printed, never recorded. */
object OptProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[probe] $label%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    if (args.headOption.contains("breakdown")) {
      // sub-phase costs of the two dominant lifecycle phases
      (1 to 2).foreach { pass =>
        println(s"=== breakdown pass $pass ===")
        val docs = graft.Tables.load(spark, sfDir, "documents")
        val st = t("snapshot_write")(SnapshotStateSink.write(spark, docs))
        val store = t("corpus_store_write")(StateLog.writeCorpusStore(
          spark, docs.filter(!DedupIndexSink.isNewCol)))
        val ref = StateLog.fromSnapshot(spark, st, store)
        // ingest sub-phases (mirrors ingestOnce)
        val batch = docs.filter(DedupIndexSink.isNewCol)
        val corp = t("corpus_resolve_frame")(StateLog.corpus(spark, ref))
        val docsU = corp.withColumn("is_new", lit(false))
          .unionByName(batch.select(col("doc_id"), col("text"), col("lang"),
            col("source"), col("n_chars")).withColumn("is_new", lit(true)))
        val surv = t("delta_survivors_ckpt")(
          graft.pipeline.Curation.deltaSurvivorsFromState(docsU, col("is_new"),
            spark.table(st.index.hash),
            DedupIndexSink.effectiveBandIndex(spark, st.index),
            spark.table(st.testVocab), spark.table(st.mixRates)).localCheckpoint())
        println(s"[probe] survivors rows: ${surv.count()}")
        t("ingest_batch_full")(StateLog.ingestBatch(spark, ref, st, batch, 0L))
        // repack sub-phases
        t("retract")(StateLog.retractBatch(spark, ref, col("doc_id") % 7 === 3, 1L))
        val store2 = spark.table(store)
        t("pairs_mine")(graft.pipeline.Dedup.jaccardPairsDf(store2).count())
        t("labels_mine")(graft.pipeline.Dedup.neardupLabelsDf(store2).count())
        val cd1 = t("curatedDocsDf_mine")(
          graft.pipeline.Curation.curatedDocsDf(store2).count())
        val cd2 = t("curatedDocsDf_warm")(
          graft.pipeline.Curation.curatedDocsDf(store2).count())
        println(s"[probe] curated rows: $cd1 / $cd2")
        t("repack_log_full")(StateLog.repackLog(spark, ref, 2L))
        t("compact_log")(StateLog.compactLog(spark, ref))
        t("audit_repacked_noop")(StateLog.auditLogRepacked(spark, ref)
          .write.format("noop").mode("overwrite").save())
      }
      spark.stop()
      return
    }

    val passes = args.headOption.map(_.toInt).getOrElse(2)
    (1 to passes).foreach { pass =>
      println(s"=== pass $pass (eq151 lifecycle phases) ===")
      val docs = graft.Tables.load(spark, sfDir, "documents")
      val st = t("snapshot_write")(SnapshotStateSink.write(spark, docs))
      val store = t("corpus_store_write")(StateLog.writeCorpusStore(
        spark, docs.filter(!DedupIndexSink.isNewCol)))
      val ref = t("from_snapshot")(StateLog.fromSnapshot(spark, st, store))
      t("ingest_batch")(StateLog.ingestBatch(spark, ref, st,
        docs.filter(DedupIndexSink.isNewCol), 0L))
      t("retract_batch")(StateLog.retractBatch(spark, ref,
        col("doc_id") % 7 === 3, 1L))
      t("repack_log")(StateLog.repackLog(spark, ref, 2L))
      t("compact_log")(StateLog.compactLog(spark, ref))
      t("audit_repacked_noop")(StateLog.auditLogRepacked(spark, ref)
        .write.format("noop").mode("overwrite").save())
      t("checkpoint_manifest")(StateLog.checkpointManifest(spark, ref))
      t("vacuum")(StateLog.vacuum(spark, ref))
      t("audit_folded_noop")(StateLog.auditFolded(spark, ref)
        .write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}
