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

  /** Index-hash table names of snapshots a log wraps ([[fromSnapshot]]'s
    * gen 0 POINTS at the snapshot's live tables, no copy) — an in-place
    * [[SnapshotStateSink.advance]] on such a snapshot would retroactively
    * mutate a committed generation (ADVICE r11), so the sink refuses it.
    * The marker is DURABLE (a catalog marker table derived from the
    * wrapped hash table's name) plus a fast in-process set: the failure
    * this guard exists for is precisely the OTHER-driver restart — a
    * fresh JVM resolving the same names through a persistent metastore —
    * where a memory-only set would silently fail open (r12 review). */
  private val wrappedSnapshots =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private def wrapMarker(hashTable: String): String = s"${hashTable}_logwrapped"
  private[sources] def wrapsSnapshotIndex(spark: SparkSession, hashTable: String): Boolean =
    wrappedSnapshots.contains(hashTable) ||
      spark.catalog.tableExists(wrapMarker(hashTable))
  /** Test hook: forget the in-process wrap registration, simulating a
    * FRESH driver that resolves the same names through the catalog — the
    * durable marker must still refuse the in-place advance. */
  private[graft] def forgetWrappedInProcess(hashTable: String): Unit =
    wrappedSnapshots.remove(hashTable): Unit

  /** Per-manifest commit mutex + optimistic re-check (VERDICT r11 task 4).
    * The manifest is append-only and every committer mints gen_id =
    * max+1 from its own read, so two concurrent committers racing the
    * read→append window would mint duplicate gen_ids and lose an update.
    * The commit point therefore (a) serializes same-process committers on
    * a per-manifest mutex, and (b) re-checks under the mutex that the max
    * gen_id is still the one this operation READ its views at — if the
    * manifest advanced, the operation's survivor math is stale against
    * the new committed state and the commit ABORTS; the public ops catch
    * the abort and recompute from fresh history ([[withCommitRetry]]),
    * making each operation linearizable. Cross-PROCESS writers are out of
    * contract (single-writer per log, like every table-format compaction
    * daemon): the mutex cannot see them, and the re-check narrows but
    * cannot close that window. */
  private val commitLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  private def commitRow(spark: SparkSession, ref: LogRef,
      expectedMaxGen: Long, g: Gen): Unit = {
    val lock = commitLocks.computeIfAbsent(ref.manifest, _ => new Object)
    lock.synchronized {
      val cur = spark.table(ref.manifest)
        .agg(max(col("gen_id"))).head().getLong(0)
      if (cur != expectedMaxGen)
        throw new java.util.ConcurrentModificationException(
          s"state log ${ref.manifest}: manifest advanced " +
            s"($expectedMaxGen -> $cur) since this operation read its views")
      genRow(spark, g).write.mode("append").saveAsTable(ref.manifest)
    }
  }

  /** Re-run `body` (which re-reads history, recomputes against the NEW
    * committed views, overwrites its deterministic generation tables and
    * re-attempts the commit) after an optimistic-commit abort. Bounded:
    * a log with more concurrent committers than this is misconfigured. */
  private def withCommitRetry[T](attemptsLeft: Int = 16)(body: => T): T =
    try body catch {
      case _: java.util.ConcurrentModificationException if attemptsLeft > 1 =>
        withCommitRetry(attemptsLeft - 1)(body)
    }

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
    * generation all prior rows collapse into (tombstones applied).
    *
    * `cur` is the CORPUS layer (eq147): the generation's contribution to
    * the raw document store — the base's at-rest corpus table for gen 0,
    * each delta's survivor rows, the merged store for a fold, and the
    * doc-tombstone table for a retract (corpus resolution subtracts it,
    * order-aware like every layer). With it the log is SELF-CONTAINED:
    * ingest and retraction can resolve the store from the log instead of
    * trusting the caller to reconstruct it — the last caller-maintained
    * piece of the state's life between sessions. */
  private final case class Gen(genId: Long, batchId: Long, kind: String,
      hash: String, band: String, stop: String, pack: String, cur: String)

  /** The raw-store columns every funnel input needs — what the corpus
    * layer persists per generation. */
  private val StoreCols = Seq("doc_id", "text", "lang", "source", "n_chars")

  /** An at-rest RAW corpus store for [[fromSnapshot]]'s gen-0 corpus
    * pointer — the production table eq138's product build reads from;
    * written here as a plain parquet table of the store columns. */
  def writeCorpusStore(spark: SparkSession, docs: DataFrame): String = {
    val id = s"${ProcessHandle.current().pid()}_${logSeq.incrementAndGet()}"
    val tbl = s"graft_corpus_store_$id"
    docs.select(StoreCols.map(col): _*).write.mode("overwrite")
      .option("path", s"${sys.props("java.io.tmpdir")}/$tbl").saveAsTable(tbl)
    tbl
  }

  /** Start a log over a finished full curation: generation 0 POINTS AT
    * the snapshot's existing index + pack tables and the at-rest corpus
    * store (no copy — the log wraps the snapshot; eq140's write is the
    * expensive pass, the log is a one-row manifest write). Gen 0 is the
    * genesis fold point. */
  def fromSnapshot(spark: SparkSession, st: SnapshotStateSink.StateTables,
      corpusStore: String): LogRef = {
    require(st.index.tomb.isEmpty,
      "the log ingests forward — apply pending retraction tombstones first")
    val id = s"${ProcessHandle.current().pid()}_${logSeq.incrementAndGet()}"
    val ref = LogRef(s"graft_state_log_$id")
    val row = genRow(spark, Gen(0L, -1L, "base",
      st.index.hash, st.index.band, st.index.stop, st.packSummary, corpusStore))
    // the durable wrap marker goes FIRST: a crash between the two writes
    // then fails CLOSED (a spurious refusal on a log that never
    // materialized) instead of open (a live log whose snapshot a fresh
    // driver could still advance in place — r12 review)
    wrappedSnapshots.add(st.index.hash)
    row.write.mode("overwrite")
      .option("path",
        s"${sys.props("java.io.tmpdir")}/${wrapMarker(st.index.hash)}")
      .saveAsTable(wrapMarker(st.index.hash))
    row.write.mode("overwrite")
      .option("path", s"${sys.props("java.io.tmpdir")}/graft_state_log_${id}_manifest")
      .saveAsTable(ref.manifest)
    ref
  }

  private def genRow(spark: SparkSession, g: Gen): DataFrame = {
    import spark.implicits._
    Seq((g.genId, g.batchId, g.kind, g.hash, g.band, g.stop, g.pack, g.cur))
      .toDF("gen_id", "batch_id", "kind", "hash_tbl", "band_tbl", "stop_tbl",
        "pack_tbl", "cur_tbl")
  }

  /** The FULL manifest history, oldest first — one tiny driver-side
    * read. The skip set needs all of it; the active state is the suffix
    * from the latest fold point ([[active]]). */
  private def history(spark: SparkSession, ref: LogRef): Seq[Gen] =
    spark.table(ref.manifest).orderBy("gen_id").collect().toSeq
      .map(r => Gen(r.getLong(0), r.getLong(1), r.getString(2), r.getString(3),
        r.getString(4), r.getString(5), r.getString(6), r.getString(7)))

  private def active(hist: Seq[Gen]): Seq[Gen] =
    hist.drop(hist.lastIndexWhere(g => g.kind == "base" || g.kind == "fold"))

  /** The committed state's layer views over a resolved generation list:
    * the hash layer (delta unions MINUS orphaned-hash tombstones), the
    * LIVE band rows (delta unions MINUS doc tombstones — stop-unfiltered:
    * the guard recount counts live rows, eq143's retained-keys
    * semantics), the stop-key union (the monotone guard, never shrunk by
    * retraction), and the LATEST delta generation's cumulative pack
    * summary (retraction does not re-account packing — that is
    * [[SnapshotStateSink.repack]]'s job, the eq143 posture).
    *
    * Tombstone subtraction is ORDER-AWARE (ADVICE r11): a retract row
    * tombstones only what was committed BEFORE it. Content re-admitted
    * by a LATER ingest legitimately owns its hash again — the ingest
    * probed the post-retraction views, saw the hash gone, and wrote it
    * into its own generation — so each delta generation subtracts only
    * the retract rows with a HIGHER gen_id. Without the ordering, a
    * retract→re-admit sequence would subtract the re-admitted hash
    * forever, the next fold would bake the loss in physically, and
    * further exact duplicates of live content would probe 'novel'.
    * Deltas sharing the same later-retract suffix share one anti-join
    * (retracts are gen_id-sorted, so "the retracts after delta d" is
    * always a suffix). */
  /** Delta-layer union MINUS the order-aware tombstones: each delta
    * generation subtracts only the retract rows with a HIGHER gen_id
    * (deltas sharing the same later-retract suffix share one anti-join;
    * retracts are gen_id-sorted, so the applicable set is always a
    * suffix). `tombLayer` names the retract row's table holding the
    * tombstones for this layer. */
  private def minusLaterTombs(spark: SparkSession, gens: Seq[Gen],
      layer: Gen => String, tombLayer: Gen => String, key: String,
      tombCols: DataFrame => DataFrame): DataFrame = {
    def union(tbls: Seq[String]): DataFrame =
      tbls.map(spark.table).reduce(_ unionAll _)
    val deltas = gens.filter(_.kind != "retract")
    val retracts = gens.filter(_.kind == "retract")
    deltas.groupBy(d => retracts.count(_.genId > d.genId)).toSeq.sortBy(_._1)
      .map { case (nLater, ds) =>
        val raw = union(ds.map(layer))
        if (nLater == 0) raw
        else raw.join(
          broadcast(tombCols(union(retracts.takeRight(nLater).map(tombLayer)))),
          Seq(key), "left_anti")
          // the USING-join fronts the key column; restore the layer's
          // order so the cross-group unionAll stays position-aligned
          .select(raw.columns.map(col).toIndexedSeq: _*)
      }.reduce(_ unionAll _)
  }

  private def viewsOf(spark: SparkSession, gens: Seq[Gen]): (DataFrame, DataFrame, DataFrame, DataFrame) = {
    val deltas = gens.filter(_.kind != "retract")
    val hashV = minusLaterTombs(spark, gens, _.hash, _.hash, "h", identity)
    val bandLive = minusLaterTombs(spark, gens, _.band, _.band, "doc_id", _.select("doc_id"))
    (hashV, bandLive,
      deltas.map(g => spark.table(g.stop)).reduce(_ unionAll _),
      spark.table(deltas.last.pack))
  }

  /** The committed CORPUS STORE resolved from the log itself (eq147):
    * the base at-rest corpus plus every committed batch's survivors,
    * minus deleted docs — order-aware like every layer (a retract's doc
    * tombstones live in its band/cur table). This is "the corpus store"
    * every funnel input and every retraction's orphan recount needs, so
    * the self-contained [[ingestBatch]]/[[retractBatch]] overloads
    * resolve it here instead of trusting the caller to reconstruct it. */
  def corpus(spark: SparkSession, ref: LogRef): DataFrame =
    corpusOf(spark, active(history(spark, ref)))

  private def corpusOf(spark: SparkSession, gens: Seq[Gen]): DataFrame =
    minusLaterTombs(spark, gens, _.cur, _.band, "doc_id", _.select("doc_id"))

  def views(spark: SparkSession, ref: LogRef): (DataFrame, DataFrame, DataFrame, DataFrame) =
    viewsOf(spark, active(history(spark, ref)))

  /** TIME-TRAVEL read (eq146): the state's views AS OF generation `gen` —
    * the manifest prefix ending there, resolved exactly like the live
    * read (latest fold point in the prefix + its suffix). Nearly free:
    * generations are immutable once committed, so a historical read is
    * just a different manifest resolution, no data movement — the
    * audit/debugging surface every versioned store ships. [[vacuum]]
    * bounds it from below: a generation whose tables were vacuumed away
    * fails with a clear error instead of a missing-table resolve. */
  def viewsAsOf(spark: SparkSession, ref: LogRef, gen: Long): (DataFrame, DataFrame, DataFrame, DataFrame) = {
    val hist = history(spark, ref)
    require(hist.exists(_.genId == gen),
      s"generation $gen was never committed to ${ref.manifest}")
    val need = active(hist.filter(_.genId <= gen))
    need.flatMap(g => Seq(g.hash, g.band, g.stop, g.pack, g.cur)).distinct.foreach { t =>
      if (!spark.catalog.tableExists(t))
        throw new IllegalStateException(s"as-of generation $gen needs $t, " +
          "which a vacuum dropped — time travel is bounded by the latest fold")
    }
    viewsOf(spark, need)
  }

  /** Generation GC (VERDICT r11 task 3): drop every generation table
    * STRICTLY BEFORE the latest fold point — the superseded deltas,
    * retract tombstones, and earlier folds the active resolution no
    * longer reads. What stays: the FULL manifest history (one tiny row
    * per operation — the replay-skip set and the audit trail), and the
    * latest fold + suffix (the active state). Only log-OWNED tables are
    * dropped: gen 0 (`base`) points INTO the wrapped snapshot's tables,
    * which the snapshot owns (and retract rows carry borrowed stop/pack
    * pointers — the keep-set and ownership-prefix checks cover both).
    * After a vacuum, [[viewsAsOf]] is bounded below by the latest fold —
    * the retention trade every versioned table format ships. Returns the
    * dropped table names. */
  def vacuum(spark: SparkSession, ref: LogRef): Seq[String] = {
    val hist = history(spark, ref)
    val cut = hist.lastIndexWhere(g => g.kind == "base" || g.kind == "fold")
    val keep = hist.drop(cut)
      .flatMap(g => Seq(g.hash, g.band, g.stop, g.pack, g.cur)).toSet
    val dropped = hist.take(cut)
      .flatMap(g => Seq(g.hash, g.band, g.stop, g.pack, g.cur)).distinct
      .filter(t => t.startsWith(ref.manifest + "_") && !keep(t))
      .filter(spark.catalog.tableExists) // already-vacuumed rows are a no-op
    dropped.foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS `$t`")
      val p = new org.apache.hadoop.fs.Path(s"${sys.props("java.io.tmpdir")}/$t")
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(p, true): Unit
    }
    dropped
  }

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
      docs: DataFrame, isNew: Column, batchId: Long): Boolean = withCommitRetry() {
    ingestOnce(spark, ref, st, history(spark, ref), docs, isNew, batchId)
  }

  /** `hist` is the ONE manifest snapshot this attempt works from: the
    * views, the (self-contained path's) corpus resolution, and the
    * commit's optimistic max-gen check all derive from it, so a commit
    * landing after the snapshot ALWAYS aborts the attempt (no window in
    * which half the inputs see the newer state — r12 review). */
  private def ingestOnce(spark: SparkSession, ref: LogRef, st: SnapshotStateSink.StateTables,
      hist: Seq[Gen], docs: DataFrame, isNew: Column, batchId: Long): Boolean = {
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
    val curT = saveGen(spark, ref,
      survivors.select(StoreCols.map(col): _*), "cur", tag, None)

    // THE COMMIT POINT: one manifest row, iff the manifest is still at
    // the max gen_id the views above were read at
    val base = hist.map(_.genId).max
    commitRow(spark, ref, base, Gen(base + 1, batchId, "delta",
      hashT, bandT, stopT, packT, curT))
    true
  }

  /** SELF-CONTAINED ingest (eq147): the corpus store is resolved from
    * the log's own corpus layer — the caller hands over ONLY the batch.
    * The corpus, the views, and the commit check all derive from the
    * SAME manifest snapshot, taken inside the retry scope: a concurrent
    * commit aborts the attempt at the commit point and the retry
    * re-resolves everything against the post-conflict state. */
  def ingestBatch(spark: SparkSession, ref: LogRef, st: SnapshotStateSink.StateTables,
      batch: DataFrame, batchId: Long): Boolean = withCommitRetry() {
    val hist = history(spark, ref)
    val docs = corpusOf(spark, active(hist)).withColumn("is_new", lit(false))
      .unionByName(batch.select(StoreCols.map(col): _*)
        .withColumn("is_new", lit(true)))
    ingestOnce(spark, ref, st, hist, docs, col("is_new"), batchId)
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
      isDeleted: Column, opId: Long): Boolean = withCommitRetry() {
    retractOnce(spark, ref, history(spark, ref), indexedDocs, isDeleted, opId,
      priorTombsApplied = false)
  }

  /** `priorTombsApplied`: the self-contained path's corpus resolution
    * already subtracts prior tombstones ORDER-AWARE (a doc_id re-admitted
    * by a later delta stays live) — re-subtracting them here would be
    * order-BLIND and could exclude a legitimately live re-admitted doc
    * from the orphan recount, wrongly tombstoning its hash (r12 review).
    * The caller-supplied path keeps the subtraction (its contract: a raw
    * store with prior deletions possibly still present, fresh doc_ids on
    * re-admission). */
  private def retractOnce(spark: SparkSession, ref: LogRef, hist: Seq[Gen],
      indexedDocs: DataFrame, isDeleted: Column, opId: Long,
      priorTombsApplied: Boolean): Boolean = {
    if (hist.exists(g => g.batchId == opId && g.kind == "retract")) return false
    val priorTombs =
      if (priorTombsApplied) Seq.empty
      else active(hist).filter(_.kind == "retract")
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
    // the stop union and the latest pack resolve over delta rows only);
    // the cur slot names the doc-tombstone table — corpus resolution
    // subtracts it, order-aware like the band layer
    val lastDelta = active(hist).filter(_.kind != "retract").last
    val base = hist.map(_.genId).max
    commitRow(spark, ref, base, Gen(base + 1, opId, "retract",
      tombHashT, tombDocsT, lastDelta.stop, lastDelta.pack, tombDocsT))
    true
  }

  /** SELF-CONTAINED retraction (eq147): the indexed corpus store — the
    * base snapshot plus committed survivors, prior deletions already
    * subtracted — is resolved from the log's own corpus layer, so the
    * orphan recount can never be computed against a store the caller
    * reconstructed wrong. Prior tombstones are already applied by the
    * resolution itself. */
  def retractBatch(spark: SparkSession, ref: LogRef,
      isDeleted: Column, opId: Long): Boolean = withCommitRetry() {
    val hist = history(spark, ref)
    retractOnce(spark, ref, hist, corpusOf(spark, active(hist)), isDeleted, opId,
      priorTombsApplied = true)
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
  def compactLog(spark: SparkSession, ref: LogRef): Unit = withCommitRetry() {
    val hist = history(spark, ref)
    val gens = active(hist)
    val (hashV, bandLiveV, stopV, packV) = viewsOf(spark, gens)
    val base = hist.map(_.genId).max
    val tag = s"c$base"
    val hashT = saveGen(spark, ref, hashV, "hash", tag, Some("h"))
    val bandT = saveGen(spark, ref, effectiveBandOf(bandLiveV, stopV), "band", tag, Some("band_key"))
    val stopT = saveGen(spark, ref, stopV.distinct(), "stop", tag, None)
    val packT = saveGen(spark, ref, packV, "pack", tag, None)
    val curT = saveGen(spark, ref, corpusOf(spark, gens), "cur", tag, None)
    try commitRow(spark, ref, base, Gen(base + 1, hist.map(_.batchId).max, "fold",
      hashT, bandT, stopT, packT, curT))
    catch { case e: java.util.ConcurrentModificationException =>
      // a lost fold race retries against the NEW max gen, so the retry's
      // tag differs — drop this attempt's tables now or they would be
      // orphaned forever (no manifest row ever points at them, so
      // vacuum, which walks manifest rows, could never reclaim them).
      // UNLESS the race was another fold from the same base: both wrote
      // the SAME deterministic c$base names (overwrite mode, identical
      // content by determinism) and the winner's committed row now
      // points at them — dropping would corrupt the committed fold
      // (r12 review), so re-read the manifest and keep any table a row
      // references. Batch/retract tags (b$id / r$id) are retry-stable
      // and need none of this: their retry overwrites the same
      // locations.
      val committed = history(spark, ref)
        .flatMap(g => Seq(g.hash, g.band, g.stop, g.pack, g.cur)).toSet
      Seq(hashT, bandT, stopT, packT, curT).filterNot(committed).foreach { t =>
        spark.sql(s"DROP TABLE IF EXISTS `$t`")
        val p = new org.apache.hadoop.fs.Path(s"${sys.props("java.io.tmpdir")}/$t")
        p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true): Unit
      }
      throw e
    }
  }

  /** Active generation count (post-fold width) — the bounded quantity
    * probes pay for; test-visible. */
  private[graft] def activeGenerations(spark: SparkSession, ref: LogRef): Int =
    active(history(spark, ref)).size

  def eq144(spark: SparkSession, dir: String): DataFrame = {
    val docs = graft.Tables.load(spark, dir, "documents")
    val st = SnapshotStateSink.write(spark, docs)
    val ref = fromSnapshot(spark, st,
      writeCorpusStore(spark, docs.filter(!DedupIndexSink.isNewCol)))
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
  private[graft] def auditFolded(spark: SparkSession, ref: LogRef): DataFrame =
    auditItems(views(spark, ref), "").orderBy("item")

  private def auditItems(vs: (DataFrame, DataFrame, DataFrame, DataFrame),
      prefix: String): DataFrame = {
    val (hashV, bandLive, stopV, packV) = vs
    val eff = effectiveBandOf(bandLive, stopV)
    def one(item: String, df: DataFrame): DataFrame =
      df.select(lit(prefix + item).as("item"), col("n"))
    one("idx_hash_entries", hashV.agg(count(lit(1)).as("n")))
      .unionAll(one("idx_band_entries", eff.agg(count(lit(1)).as("n"))))
      .unionAll(one("idx_stop_buckets", stopV.distinct().agg(count(lit(1)).as("n"))))
      .unionAll(one("pack_docs", packV.agg(coalesce(sum(col("n_docs")), lit(0L)).as("n"))))
      .unionAll(one("pack_tokens", packV.agg(coalesce(sum(col("t_tokens")), lit(0L)).as("n"))))
      .unionAll(one("pack_chars", packV.agg(coalesce(sum(col("t_chars")), lit(0L)).as("n"))))
      .unionAll(one("pack_shards", packV.agg(coalesce(sum(col("n_shards")), lit(0L)).as("n"))))
  }

  def eq146(spark: SparkSession, dir: String): DataFrame = {
    val docs = graft.Tables.load(spark, dir, "documents")
    val st = SnapshotStateSink.write(spark, docs)
    val ref = fromSnapshot(spark, st,
      writeCorpusStore(spark, docs.filter(!DedupIndexSink.isNewCol)))
    ingestBatch(spark, ref, st, docs, DedupIndexSink.isNewCol, 0L)
    compactLog(spark, ref)
    auditTimeTravel(spark, ref)
  }

  /** eq146 — TIME TRAVEL under the oracle: after one ingest + fold, the
    * same audit read twice — as-of generation 0 (`g0_` items: the base
    * snapshot exactly as it stood before the batch, though the live
    * tables have long since been superseded by the fold) and at the
    * head (`live_` items, eq144's advanced state). The DuckDB oracle
    * rebuilds BOTH states from scratch over the raw population — the
    * historical read must equal the scratch OLD-corpus state (eq139's
    * numbers) while the head equals the scratch MERGED state (eq141's),
    * proving manifest-prefix resolution reconstructs committed history,
    * not just the head. */
  private[graft] def auditTimeTravel(spark: SparkSession, ref: LogRef): DataFrame =
    auditItems(viewsAsOf(spark, ref, 0L), "g0_")
      .unionAll(auditItems(views(spark, ref), "live_"))
      .orderBy("item")

  def eq147(spark: SparkSession, dir: String): DataFrame = {
    val docs = graft.Tables.load(spark, dir, "documents")
    val st = SnapshotStateSink.write(spark, docs)
    val ref = fromSnapshot(spark, st,
      writeCorpusStore(spark, docs.filter(!DedupIndexSink.isNewCol)))
    // the caller hands over ONLY the batch — the store comes from the log
    ingestBatch(spark, ref, st, docs.filter(DedupIndexSink.isNewCol), 0L)
    compactLog(spark, ref)
    auditSelfContained(spark, ref)
  }

  /** eq147 — the SELF-CONTAINED log under the oracle: the same single
    * batch as eq144, but the ingest resolves the corpus store from the
    * log's own corpus layer instead of receiving it from the caller. The
    * final state must therefore be EXACTLY eq144's (the seven audit items
    * share eq141's scratch-rebuild oracle verbatim — any divergence in
    * the self-resolved store breaks the hash), plus three corpus items
    * proving the store itself: the resolved corpus's row count, char
    * mass, and doc_id checksum must equal the scratch population (old
    * corpus ∪ the funnel's delta survivors) rebuilt in DuckDB. */
  private[graft] def auditSelfContained(spark: SparkSession, ref: LogRef): DataFrame = {
    val c = corpus(spark, ref)
    def one(item: String, df: DataFrame): DataFrame =
      df.select(lit(item).as("item"), col("n"))
    auditItems(views(spark, ref), "")
      .unionAll(one("corpus_docs", c.agg(count(lit(1)).as("n"))))
      .unionAll(one("corpus_chars",
        c.agg(coalesce(sum(col("n_chars")), lit(0L)).as("n"))))
      .unionAll(one("corpus_id_checksum",
        c.agg(coalesce(sum(col("doc_id")), lit(0L)).as("n"))))
      .orderBy("item")
  }
}
