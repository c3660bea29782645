package graft.sources

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipeline.{Curation, Dedup}

/** The GENERATIONAL state log — exactly-once STREAMING ingest into the
  * at-rest curation state (the composition of the streaming family with
  * eq139–eq143's stored-state family).
  *
  * [[SnapshotStateSink.advance]] appends into shared tables, which is the
  * right shape for a driver-run batch job but cannot give a streaming
  * sink exactly-once: a micro-batch REPLAYED after a crash would append
  * its survivor rows twice, and worse, the replay's probes would see the
  * first attempt's rows and gate the whole batch out as duplicates. The
  * log fixes both with the same discipline the repo's foreachBatch upsert
  * sink uses (deterministic overwrite per batch id), extended to a
  * multi-table state:
  *
  *  - every micro-batch writes its delta as its OWN GENERATION — four
  *    tables whose names derive deterministically from (log, batchId),
  *    written in overwrite mode, so a replay rewrites byte-identical
  *    content into the same locations;
  *  - a single-row append to the MANIFEST table is the COMMIT POINT.
  *    Probes and views read only manifest-committed generations, so an
  *    in-flight (crashed, half-written) generation is invisible — the
  *    replay recomputes survivors against exactly the pre-batch state
  *    and converges;
  *  - a replayed batch whose id is already in the manifest is skipped
  *    outright (the at-least-once → exactly-once gate).
  *
  * Layer semantics per generation: `hash` — the batch survivors' content
  * hashes not present in any committed generation; `band` — the
  * survivors' band keys (probes filter by the UNION of stop lists, the
  * monotone guard, exactly eq141's posture); `stop` — buckets the batch
  * pushed past the cap, relative to the committed raw mass; `pack` — the
  * CUMULATIVE per-lang pack summary ([[Curation.appendPackSummary]]'s
  * O(batch) math over the latest committed summary), so the newest
  * generation's pack table is always the whole corpus's summary.
  *
  * Generation count is bounded by [[compactLog]]: fold all committed
  * generations into one (the effective views made physical — eq142's
  * compaction applied to the log) and swap the manifest to the single
  * folded row; the old generation tables stay readable until dropped,
  * the manifest overwrite is the catalog pointer flip.
  *
  * The driver-side manifest read (one tiny collect per batch, rows =
  * generations since the last compaction) is the log's only
  * driver-side state — nothing else survives a restart, which is the
  * point: StreamingSpec pins that a fresh "driver" resuming from the
  * manifest skips committed batches and lands on the same final state.
  *
  * Reference basis: the reference persists ETL output and serves queries
  * from the stored copy (`etl_project/data.py:41-42`); this is that
  * round-trip under continuous arrival with failure recovery.
  */
object StateLog {

  private val logSeq = new AtomicLong()

  /** Handle to a log: just the manifest table name — every generation
    * table is recorded IN the manifest, and batch-generation names
    * derive deterministically from (manifest, batchId) so replays
    * collide on purpose. */
  final case class LogRef(manifest: String)

  /** Start a log over a finished full curation: generation 0 POINTS AT
    * the snapshot's existing index + pack tables (no copy — the log
    * wraps the snapshot; eq140's write is the expensive pass, the log
    * is a one-row manifest write). */
  def fromSnapshot(spark: SparkSession, st: SnapshotStateSink.StateTables): LogRef = {
    require(st.index.tomb.isEmpty,
      "the log ingests forward — apply pending retraction tombstones first")
    val id = s"${ProcessHandle.current().pid()}_${logSeq.incrementAndGet()}"
    val ref = LogRef(s"graft_state_log_$id")
    genRow(spark, 0L, -1L, st.index.hash, st.index.band, st.index.stop, st.packSummary)
      .write.mode("overwrite")
      .option("path", s"${sys.props("java.io.tmpdir")}/graft_state_log_${id}_manifest")
      .saveAsTable(ref.manifest)
    ref
  }

  private def genRow(spark: SparkSession, genId: Long, batchId: Long,
      hash: String, band: String, stop: String, pack: String): DataFrame = {
    import spark.implicits._
    Seq((genId, batchId, hash, band, stop, pack))
      .toDF("gen_id", "batch_id", "hash_tbl", "band_tbl", "stop_tbl", "pack_tbl")
  }

  /** The committed generations, oldest first. One tiny driver-side read
    * per call — the manifest is generations-since-compaction rows. */
  private def committed(spark: SparkSession, ref: LogRef): Seq[(Long, Long, String, String, String, String)] =
    spark.table(ref.manifest).orderBy("gen_id").collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3),
        r.getString(4), r.getString(5)))

  /** The committed state's layer views: raw hash union, raw band union,
    * stop-key union (the monotone guard across generations), and the
    * LATEST generation's cumulative pack summary. */
  def views(spark: SparkSession, ref: LogRef): (DataFrame, DataFrame, DataFrame, DataFrame) = {
    val gens = committed(spark, ref)
    def union(tbls: Seq[String]): DataFrame =
      tbls.map(spark.table).reduce(_ unionAll _)
    (union(gens.map(_._3)), union(gens.map(_._4)), union(gens.map(_._5)),
      spark.table(gens.last._6))
  }

  /** The committed EFFECTIVE band index: every generation's band rows,
    * minus the union stop list — the probe view (eq141's stop-filter
    * posture across generations). */
  def effectiveBand(spark: SparkSession, ref: LogRef): DataFrame = {
    val (_, band, stop, _) = views(spark, ref)
    band.join(broadcast(stop.distinct()), Seq("band", "band_key"), "left_anti")
  }

  /** Exactly-once micro-batch ingest — the foreachBatch body. `docs`
    * must be the corpus store unioned with the batch (`isNew` marking
    * the batch rows): the near-verify layer point-reads candidate old
    * docs' shingle sets from it, broadcast-pruned, exactly like the
    * advance. Gates (test vocabulary, mix rates) come from the frozen
    * snapshot `st`. Returns true if the batch was applied, false if the
    * manifest already had it (replay of a committed batch — skipped).
    *
    * Crash matrix: die before any write → nothing visible; die
    * mid-generation-write → the half-generation is not in the manifest,
    * invisible to every view, and the replay OVERWRITES the same
    * deterministic locations; die after commit but before the offset
    * commit → the replay finds the batch id in the manifest and skips.
    * Every path converges to the same committed state. */
  def ingestBatch(spark: SparkSession, ref: LogRef, st: SnapshotStateSink.StateTables,
      docs: DataFrame, isNew: Column, batchId: Long): Boolean = {
    val gens = committed(spark, ref)
    if (gens.exists(_._2 == batchId)) return false
    val (hashV, bandRawV, stopV, packV) = views(spark, ref)
    val effBand = bandRawV.join(broadcast(stopV.distinct()), Seq("band", "band_key"), "left_anti")
    val survivors = Curation.deltaSurvivorsFromState(docs, isNew,
      hashV, effBand, spark.table(st.testVocab), spark.table(st.mixRates))
      .localCheckpoint()

    // generation content — all batch-bounded, all derived from COMMITTED
    // views + the batch, so a replay recomputes identical frames
    val newHashes = survivors.select(md5(col("text")).as("h"))
      .filter(col("h").isNotNull).distinct()
      .join(hashV, Seq("h"), "left_anti")
    val survBanded = Dedup.batchBandKeys(docs.filter(isNew))
      .join(broadcast(survivors.select("doc_id")), Seq("doc_id"), "left_semi")
      .select("band", "band_key", "doc_id")
      .localCheckpoint()
    val touched = survBanded.groupBy("band", "band_key").agg(count(lit(1)).as("dc"))
    val storedCnt = bandRawV
      .join(broadcast(touched.select("band", "band_key")), Seq("band", "band_key"), "left_semi")
      .groupBy("band", "band_key").agg(count(lit(1)).as("oc"))
    val newlyHot = touched
      .join(storedCnt, Seq("band", "band_key"), "left_outer")
      .filter(coalesce(col("oc"), lit(0L)) + col("dc") > Dedup.maxBucket)
      .select("band", "band_key")
      .join(broadcast(stopV.distinct()), Seq("band", "band_key"), "left_anti")
    val pack = Curation.appendPackSummary(packV, survivors)

    // deterministic per-batch generation tables, overwrite mode
    val tag = s"b$batchId"
    val tmp = sys.props("java.io.tmpdir")
    def save(df: DataFrame, layer: String, bucketCol: Option[String]): String = {
      val tbl = s"${ref.manifest}_${layer}_$tag"
      val w = df.write.mode("overwrite")
        .option("path", s"$tmp/${ref.manifest}_${layer}_$tag")
      bucketCol.fold(w)(c => w.bucketBy(DedupIndexSink.Buckets, c).sortBy(c))
        .saveAsTable(tbl)
      tbl
    }
    val hashT = save(newHashes, "hash", Some("h"))
    val bandT = save(survBanded, "band", Some("band_key"))
    val stopT = save(newlyHot, "stop", None)
    val packT = save(pack, "pack", None)

    // THE COMMIT POINT: one manifest row
    genRow(spark, gens.map(_._1).max + 1, batchId, hashT, bandT, stopT, packT)
      .write.mode("append").saveAsTable(ref.manifest)
    true
  }

  /** Fold every committed generation into one (eq142's compaction
    * applied to the log): the effective views written physically as a
    * fresh generation, the union stop list kept (the monotone guard's
    * memory), the latest cumulative pack carried, and the manifest
    * OVERWRITTEN with the single folded row — the pointer flip that
    * bounds both generation count and the per-probe union width. */
  def compactLog(spark: SparkSession, ref: LogRef): Unit = {
    val gens = committed(spark, ref)
    val (hashV, _, stopV, packV) = views(spark, ref)
    val eff = effectiveBand(spark, ref)
    val tag = s"c${gens.map(_._1).max}"
    val tmp = sys.props("java.io.tmpdir")
    def save(df: DataFrame, layer: String, bucketCol: Option[String]): String = {
      val tbl = s"${ref.manifest}_${layer}_$tag"
      val w = df.write.mode("overwrite")
        .option("path", s"$tmp/${ref.manifest}_${layer}_$tag")
      bucketCol.fold(w)(c => w.bucketBy(DedupIndexSink.Buckets, c).sortBy(c))
        .saveAsTable(tbl)
      tbl
    }
    val hashT = save(hashV, "hash", Some("h"))
    val bandT = save(eff, "band", Some("band_key"))
    val stopT = save(stopV.distinct(), "stop", None)
    val packT = save(packV, "pack", None)
    genRow(spark, gens.map(_._1).max + 1, gens.map(_._2).max, hashT, bandT, stopT, packT)
      .write.mode("overwrite")
      .option("path", s"$tmp/${ref.manifest}_manifest_$tag")
      .saveAsTable(ref.manifest)
  }
}
