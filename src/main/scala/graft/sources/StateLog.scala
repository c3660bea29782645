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
  * The manifest itself is APPEND-ONLY — including compaction and
  * deletion. A fold ([[compactLog]]) writes the merged generation's
  * tables and then appends ONE `fold`-kind manifest row; readers
  * resolve the active state as "the latest fold row plus everything
  * after it", so the pointer flip is a single atomic-append commit,
  * never an in-place rewrite of the table every reader depends on (an
  * overwrite would have a drop-recreate window in which a crash strands
  * the whole log). A retraction ([[retractBatch]]) commits eq143's two
  * tombstones as a `retract`-kind generation that every view subtracts,
  * applied physically at the next fold. Batch-id skip checks scan the
  * FULL manifest history (kind-aware), so a replay of a long-committed
  * operation is still skipped after any number of folds. Manifest rows
  * accumulate one per operation — tiny — while the per-probe union
  * width is bounded by the folds.
  *
  * Layer semantics per generation: `hash` — the batch survivors' content
  * hashes not present in any committed generation (probed scan-only:
  * batch hashes broadcast INTO the state union, never a state-wide
  * shuffle); `band` — the survivors' band keys (probes filter by the
  * UNION of stop lists, the monotone guard, exactly eq141's posture);
  * `stop` — buckets the batch pushed past the cap, relative to the
  * committed raw mass; `pack` — the CUMULATIVE per-lang pack summary
  * ([[Curation.appendPackSummary]]'s O(batch) math over the latest
  * committed summary), so the newest generation's pack table is always
  * the whole corpus's summary.
  *
  * The driver-side manifest read (one tiny collect per batch) is the
  * log's only driver-side state — nothing else survives a restart,
  * which is the point: StreamingSpec pins that a fresh "driver"
  * resuming from the manifest skips committed batches and lands on the
  * same final state.
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

  /** Manifest row kinds: `base` — the genesis pointer at a finished full
    * curation's tables; `delta` — one ingested micro-batch's generation;
    * `retract` — one deletion operation's tombstone generation (its
    * `hash` table holds ORPHANED hashes, its `band` table holds deleted
    * doc_ids — eq143's two tombstones as a committed generation, which
    * every view subtracts); `fold` — a compaction pointer: the merged
    * generation all prior rows collapse into (tombstones applied). */
  private final case class Gen(genId: Long, batchId: Long, kind: String,
      hash: String, band: String, stop: String, pack: String)

  /** Start a log over a finished full curation: generation 0 POINTS AT
    * the snapshot's existing index + pack tables (no copy — the log
    * wraps the snapshot; eq140's write is the expensive pass, the log
    * is a one-row manifest write). Gen 0 is the genesis fold point. */
  def fromSnapshot(spark: SparkSession, st: SnapshotStateSink.StateTables): LogRef = {
    require(st.index.tomb.isEmpty,
      "the log ingests forward — apply pending retraction tombstones first")
    val id = s"${ProcessHandle.current().pid()}_${logSeq.incrementAndGet()}"
    val ref = LogRef(s"graft_state_log_$id")
    genRow(spark, Gen(0L, -1L, "base",
      st.index.hash, st.index.band, st.index.stop, st.packSummary))
      .write.mode("overwrite")
      .option("path", s"${sys.props("java.io.tmpdir")}/graft_state_log_${id}_manifest")
      .saveAsTable(ref.manifest)
    ref
  }

  private def genRow(spark: SparkSession, g: Gen): DataFrame = {
    import spark.implicits._
    Seq((g.genId, g.batchId, g.kind, g.hash, g.band, g.stop, g.pack))
      .toDF("gen_id", "batch_id", "kind", "hash_tbl", "band_tbl", "stop_tbl", "pack_tbl")
  }

  /** The FULL manifest history, oldest first — one tiny driver-side
    * read. The skip set needs all of it; the active state is the suffix
    * from the latest fold point ([[active]]). */
  private def history(spark: SparkSession, ref: LogRef): Seq[Gen] =
    spark.table(ref.manifest).orderBy("gen_id").collect().toSeq
      .map(r => Gen(r.getLong(0), r.getLong(1), r.getString(2), r.getString(3),
        r.getString(4), r.getString(5), r.getString(6)))

  private def active(hist: Seq[Gen]): Seq[Gen] =
    hist.drop(hist.lastIndexWhere(g => g.kind == "base" || g.kind == "fold"))

  /** The committed state's layer views over a resolved generation list:
    * the hash layer (delta unions MINUS retract generations' orphaned-
    * hash tombstones), the LIVE band rows (delta unions MINUS retract
    * generations' doc tombstones — stop-unfiltered: the guard recount
    * counts live rows, eq143's retained-keys semantics), the stop-key
    * union (the monotone guard, never shrunk by retraction), and the
    * LATEST delta generation's cumulative pack summary (retraction does
    * not re-account packing — that is a repack/full-recuration concern,
    * the eq143 posture). */
  private def viewsOf(spark: SparkSession, gens: Seq[Gen]): (DataFrame, DataFrame, DataFrame, DataFrame) = {
    def union(tbls: Seq[String]): DataFrame =
      tbls.map(spark.table).reduce(_ unionAll _)
    val deltas = gens.filter(_.kind != "retract")
    val retracts = gens.filter(_.kind == "retract")
    val hashRaw = union(deltas.map(_.hash))
    val bandRaw = union(deltas.map(_.band))
    val hashV =
      if (retracts.isEmpty) hashRaw
      else hashRaw.join(broadcast(union(retracts.map(_.hash))), Seq("h"), "left_anti")
    val bandLive =
      if (retracts.isEmpty) bandRaw
      else bandRaw.join(
        broadcast(union(retracts.map(_.band)).select("doc_id")), Seq("doc_id"), "left_anti")
    (hashV, bandLive, union(deltas.map(_.stop)), spark.table(deltas.last.pack))
  }

  def views(spark: SparkSession, ref: LogRef): (DataFrame, DataFrame, DataFrame, DataFrame) =
    viewsOf(spark, active(history(spark, ref)))

  private def effectiveBandOf(bandRaw: DataFrame, stop: DataFrame): DataFrame =
    bandRaw.join(broadcast(stop.distinct()), Seq("band", "band_key"), "left_anti")

  /** The committed EFFECTIVE band index: every active generation's band
    * rows, minus the union stop list — the probe view (eq141's
    * stop-filter posture across generations). */
  def effectiveBand(spark: SparkSession, ref: LogRef): DataFrame = {
    val (_, band, stop, _) = views(spark, ref)
    effectiveBandOf(band, stop)
  }

  /** One generation table: deterministic name + path from (log, layer,
    * tag), overwrite mode — the shared writer for batch generations and
    * folds, so the two can never drift in layout. */
  private def saveGen(spark: SparkSession, ref: LogRef, df: DataFrame,
      layer: String, tag: String, bucketCol: Option[String]): String = {
    val tbl = s"${ref.manifest}_${layer}_$tag"
    val w = df.write.mode("overwrite")
      .option("path", s"${sys.props("java.io.tmpdir")}/${ref.manifest}_${layer}_$tag")
    bucketCol.fold(w)(c => w.bucketBy(DedupIndexSink.Buckets, c).sortBy(c))
      .saveAsTable(tbl)
    tbl
  }

  /** Exactly-once micro-batch ingest — the foreachBatch body. `docs`
    * must be the corpus store unioned with the batch (`isNew` marking
    * the batch rows): the near-verify layer point-reads candidate old
    * docs' shingle sets from it, broadcast-pruned, exactly like the
    * advance. Gates (test vocabulary, mix rates) come from the frozen
    * snapshot `st`. Returns true if the batch was applied, false if the
    * manifest already had it (replay of a committed batch — skipped,
    * checked against the FULL history so folds never forget a batch).
    *
    * Crash matrix: die before any write → nothing visible; die
    * mid-generation-write → the half-generation is not in the manifest,
    * invisible to every view, and the replay OVERWRITES the same
    * deterministic locations; die after commit but before the offset
    * commit → the replay finds the batch id in the manifest and skips.
    * Every path converges to the same committed state. */
  def ingestBatch(spark: SparkSession, ref: LogRef, st: SnapshotStateSink.StateTables,
      docs: DataFrame, isNew: Column, batchId: Long): Boolean = {
    val hist = history(spark, ref)
    if (hist.exists(g => g.batchId == batchId && g.kind == "delta")) return false
    val (hashV, bandRawV, stopV, packV) = viewsOf(spark, active(hist))
    val survivors = Curation.deltaSurvivorsFromState(docs, isNew,
      hashV, effectiveBandOf(bandRawV, stopV),
      spark.table(st.testVocab), spark.table(st.mixRates))
      .localCheckpoint()

    // generation content — all batch-bounded, all derived from COMMITTED
    // views + the batch, so a replay recomputes identical frames. The
    // hash dedup is the storedMatchedHashes shape: batch hashes
    // broadcast INTO the state-union scan (scan-only on the state side),
    // the matched set broadcast back — never a state-wide shuffle.
    val survHashes = survivors.select(md5(col("text")).as("h"))
      .filter(col("h").isNotNull).distinct()
    val matchedHashes = hashV.join(broadcast(survHashes), Seq("h"), "left_semi")
    val newHashes = survHashes.join(broadcast(matchedHashes), Seq("h"), "left_anti")
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
    val hashT = saveGen(spark, ref, newHashes, "hash", tag, Some("h"))
    val bandT = saveGen(spark, ref, survBanded, "band", tag, Some("band_key"))
    val stopT = saveGen(spark, ref, newlyHot, "stop", tag, None)
    val packT = saveGen(spark, ref, pack, "pack", tag, None)

    // THE COMMIT POINT: one manifest row
    genRow(spark, Gen(hist.map(_.genId).max + 1, batchId, "delta",
      hashT, bandT, stopT, packT))
      .write.mode("append").saveAsTable(ref.manifest)
    true
  }

  /** Exactly-once RETRACTION through the log — eq143's tombstones as a
    * committed generation, under the same discipline as every ingest:
    * deterministic per-operation tables (overwrite mode), a one-row
    * manifest append as the commit point, operation ids skipped if
    * already committed (kind-aware, so a deletion op and a stream batch
    * may share a numeric id space without colliding).
    *
    * `indexedDocs` must be the INDEXED corpus store — the base snapshot
    * plus committed survivors (production maintains exactly this: it is
    * the curated training corpus, eq138's written product). The orphan
    * recount is eq143's, extended across prior retractions: a deleted
    * hash survives only if some indexed doc that is neither in THIS
    * deletion set nor in any PRIOR retract generation still owns it.
    * The stop list is never shrunk (the monotone guard); pack
    * re-accounting is deferred to a repack (the eq143 posture). */
  def retractBatch(spark: SparkSession, ref: LogRef, indexedDocs: DataFrame,
      isDeleted: Column, opId: Long): Boolean = {
    val hist = history(spark, ref)
    if (hist.exists(g => g.batchId == opId && g.kind == "retract")) return false
    val priorTombs = active(hist).filter(_.kind == "retract")
    val deleted = indexedDocs.filter(isDeleted)
    val delHashes = deleted.select(md5(col("text")).as("h"))
      .filter(col("h").isNotNull).distinct().localCheckpoint()
    val retained0 = indexedDocs.filter(!isDeleted)
    val retained =
      if (priorTombs.isEmpty) retained0
      else retained0.join(
        broadcast(priorTombs.map(g => spark.table(g.band)).reduce(_ unionAll _)
          .select("doc_id")), Seq("doc_id"), "left_anti")
    val surviving = retained.select(md5(col("text")).as("h"))
      .join(broadcast(delHashes), Seq("h"), "left_semi").distinct()
    val orphaned = delHashes.join(broadcast(surviving), Seq("h"), "left_anti")

    val tag = s"r$opId"
    val tombDocsT = saveGen(spark, ref, deleted.select("doc_id"), "band", tag, None)
    val tombHashT = saveGen(spark, ref, orphaned, "hash", tag, None)
    // stop/pack slots carry pointers (never read through a retract row:
    // the stop union and the latest pack resolve over delta rows only)
    val lastDelta = active(hist).filter(_.kind != "retract").last
    genRow(spark, Gen(hist.map(_.genId).max + 1, opId, "retract",
      tombHashT, tombDocsT, lastDelta.stop, lastDelta.pack))
      .write.mode("append").saveAsTable(ref.manifest)
    true
  }

  /** Fold every active generation into one (eq142's compaction applied
    * to the log): the effective views written physically as a fresh
    * generation — retraction tombstones applied, stop-guarded rows
    * dropped, the union stop list kept (the monotone guard's memory),
    * the latest cumulative pack carried — committed by APPENDING one
    * `fold` manifest row, the same atomic-append discipline as every
    * batch commit. Readers resolve the active state from the latest
    * fold, so the flip has no drop-recreate window; the superseded
    * generation tables stay readable until dropped. */
  def compactLog(spark: SparkSession, ref: LogRef): Unit = {
    val hist = history(spark, ref)
    val gens = active(hist)
    val (hashV, bandLiveV, stopV, packV) = viewsOf(spark, gens)
    val tag = s"c${hist.map(_.genId).max}"
    val hashT = saveGen(spark, ref, hashV, "hash", tag, Some("h"))
    val bandT = saveGen(spark, ref, effectiveBandOf(bandLiveV, stopV), "band", tag, Some("band_key"))
    val stopT = saveGen(spark, ref, stopV.distinct(), "stop", tag, None)
    val packT = saveGen(spark, ref, packV, "pack", tag, None)
    genRow(spark, Gen(hist.map(_.genId).max + 1, hist.map(_.batchId).max, "fold",
      hashT, bandT, stopT, packT))
      .write.mode("append").saveAsTable(ref.manifest)
  }

  /** Active generation count (post-fold width) — the bounded quantity
    * probes pay for; test-visible. */
  private[graft] def activeGenerations(spark: SparkSession, ref: LogRef): Int =
    active(history(spark, ref)).size

  def eq144(spark: SparkSession, dir: String): DataFrame = {
    val docs = graft.Tables.load(spark, dir, "documents")
    val st = SnapshotStateSink.write(spark, docs)
    val ref = fromSnapshot(spark, st)
    ingestBatch(spark, ref, st, docs, DedupIndexSink.isNewCol, 0L)
    compactLog(spark, ref)
    auditFolded(spark, ref)
  }

  /** eq144 — the log under the ORACLE: one micro-batch ingested through
    * [[ingestBatch]] and folded must land on EXACTLY the state
    * [[SnapshotStateSink.advance]] reaches — same survivor gates against
    * the same committed views, same monotone guard update, same O(batch)
    * pack append — so the audit shares eq141's DuckDB oracle VERBATIM
    * (the eq140/eq137 pattern): the scratch rebuild over the merged
    * population hash-checks the whole
    * ingest→generation→commit→fold path, not just the test fixtures. */
  private[graft] def auditFolded(spark: SparkSession, ref: LogRef): DataFrame = {
    val (hashV, bandLive, stopV, packV) = views(spark, ref)
    val eff = effectiveBandOf(bandLive, stopV)
    def one(item: String, df: DataFrame): DataFrame =
      df.select(lit(item).as("item"), col("n"))
    one("idx_hash_entries", hashV.agg(count(lit(1)).as("n")))
      .unionAll(one("idx_band_entries", eff.agg(count(lit(1)).as("n"))))
      .unionAll(one("idx_stop_buckets", stopV.distinct().agg(count(lit(1)).as("n"))))
      .unionAll(one("pack_docs", packV.agg(coalesce(sum(col("n_docs")), lit(0L)).as("n"))))
      .unionAll(one("pack_tokens", packV.agg(coalesce(sum(col("t_tokens")), lit(0L)).as("n"))))
      .unionAll(one("pack_chars", packV.agg(coalesce(sum(col("t_chars")), lit(0L)).as("n"))))
      .unionAll(one("pack_shards", packV.agg(coalesce(sum(col("n_shards")), lit(0L)).as("n"))))
      .orderBy("item")
  }
}
