package graft

import org.apache.spark.sql.functions._

import graft.pipeline.{Curation, Dedup}
import graft.sources.{SnapshotStateSink, StateLog}

/** The LAST-WINS object-store posture of the commit-claim CAS (VERDICT
  * r14 task 3 + the r14 ADVICE medium):
  *
  *  - on a scheme the refusal list cannot know about, a deterministic
  *    double-publish through a last-wins rename must be arbitrated by
  *    the read-back VERIFY — exactly one manifest row per generation,
  *    the mis-reported winner aborting into retry;
  *  - on a KNOWN last-wins scheme (s3a here), commits are REFUSED up
  *    front with the store requirement spelled out, and
  *    `allowNonAtomicStore=true` accepts the single-writer posture
  *    explicitly.
  */
class LastWinsClaimSpec extends SparkSpec {
  import spark.implicits._

  private def docsDf(rows: Seq[(Long, String, String, String, Long)]) =
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")

  private def sameSet(a: org.apache.spark.sql.DataFrame,
      b: org.apache.spark.sql.DataFrame, what: String): Unit =
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0,
      s"$what diverged")

  /** Re-register `ref`'s manifest at the SAME local directory but under
    * `scheme`, so every claims-dir and manifest-file operation routes
    * through that scheme's FileSystem impl. */
  private def reRoot(ref: StateLog.LogRef, scheme: String): Unit = {
    val dataDir = s"${sys.props("java.io.tmpdir")}/${ref.manifest}_manifest"
    spark.sql(s"DROP TABLE `${ref.manifest}`") // metadata only; data stays
    StateLog.registerExternalParquet(spark, ref.manifest, s"$scheme://$dataDir")
  }

  test("claim CAS vs a last-wins store: the double-publish is caught by the " +
    "read-back verify — one row per generation, loser retries (VERDICT r14 task 3)") {
    spark.sparkContext.hadoopConfiguration.set(
      "fs.lastwins.impl", classOf[LastWinsFileSystem].getName)
    LastWinsFileSystem.reset()

    import HotBucketFixture.aDocs
    val oldDocs = docsDf(aDocs).localCheckpoint()
    val st = SnapshotStateSink.write(spark, oldDocs, lit(false), lit(true))
    val storeTbl = StateLog.writeCorpusStore(spark, oldDocs)
    val ref = StateLog.fromSnapshot(spark, st, storeTbl)
    reRoot(ref, "lastwins")

    // two mutually-inert batches (disjoint vocabularies), staged as
    // catalog tables so each writer session resolves them independently
    val frRows = Seq(
      (4100L, "luthiers vernissent violons anciens sous lumiere douce", "fr", "src", 54L),
      (4101L, "meuniers moulent farine fraiche au moulin de pierre", "fr", "src", 51L))
    val tmp = sys.props("java.io.tmpdir")
    val batchTbl = Map(20L -> "graft_lw_b20", 21L -> "graft_lw_b21")
    docsDf(HotBucketFixture.bDocs).write.mode("overwrite")
      .option("path", s"$tmp/graft_lw_b20").saveAsTable(batchTbl(20L))
    docsDf(frRows).write.mode("overwrite")
      .option("path", s"$tmp/graft_lw_b21").saveAsTable(batchTbl(21L))
    def docsFor(s: org.apache.spark.sql.SparkSession, id: Long) =
      s.table(storeTbl).withColumn("is_new", lit(false))
        .unionByName(s.table(batchTbl(id)).withColumn("is_new", lit(true)))
    val (h0, _, _, _) = StateLog.views(spark, ref)
    val eb0 = StateLog.effectiveBand(spark, ref)
    val expect = batchTbl.keys.toSeq.sorted.map { id =>
      Curation.deltaSurvivorsFromState(docsFor(spark, id), col("is_new"), h0,
        eb0, spark.table(st.testVocab), spark.table(st.mixRates)).localCheckpoint()
    }

    // cross-process shape (in-process mutex off) + the armed one-shot
    // double-publish: both writers WILL both "win" the rename — only the
    // verify can arbitrate
    StateLog.simulateCrossProcessWriters(ref.manifest, on = true)
    LastWinsFileSystem.armRace.set(true)
    try {
      import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
      val pool = Executors.newFixedThreadPool(2)
      val go = new CountDownLatch(1)
      val sessions = batchTbl.keys.map(id => id -> spark.newSession()).toMap
      val done = batchTbl.keys.toSeq.sorted.map { id =>
        pool.submit(new java.util.concurrent.Callable[Boolean] {
          def call(): Boolean = {
            go.await()
            StateLog.ingestBatch(sessions(id), ref, st,
              docsFor(sessions(id), id), col("is_new"), id)
          }
        })
      }
      go.countDown()
      done.foreach(_.get(300, TimeUnit.SECONDS): Unit)
      pool.shutdown()
    } finally StateLog.simulateCrossProcessWriters(ref.manifest, on = false)
    // capture BEFORE the reset: the raced slot must have been
    // double-published — the deterministic last-wins interleaving
    // happened, both renames reported a win
    val publishes = LastWinsFileSystem.published.get()
    LastWinsFileSystem.reset()
    assert(publishes == 2,
      s"the drill must drive two physical publishes at the raced marker, got $publishes")
    // ...and the verify arbitrated it: unique dense gen_ids, both
    // batches exactly once (without the verify, both writers would have
    // appended gen 1 and history() would fail loudly on the collision)
    spark.catalog.refreshTable(ref.manifest)
    val manifest = spark.table(ref.manifest).distinct().collect()
    assert(manifest.map(_.getLong(0)).toSeq.sorted == Seq(0L, 1L, 2L),
      s"gen_ids must be unique and dense, got ${manifest.map(_.getLong(0)).toSeq.sorted}")
    assert(manifest.map(_.getLong(1)).toSet == Set(-1L, 20L, 21L),
      "both batch commits must be present exactly once")
    // zero claim residue (self-drop holds on the last-wins store too)
    val claims = new java.io.File(s"$tmp/${ref.manifest}_manifest_claims")
    val residue = Option(claims.listFiles()).map(_.toSeq).getOrElse(Seq.empty)
      .filter(_.getName.endsWith(".claim"))
    assert(residue.isEmpty, s"claims must self-drop, found $residue")

    // final state ≡ scratch over (old ∪ both survivor sets)
    val cols = Seq("doc_id", "text", "lang", "source", "n_chars")
    val pop = expect.foldLeft(oldDocs.select(cols.head, cols.tail: _*)) {
      (acc, s) => acc.unionByName(s.select(cols.head, cols.tail: _*)) }
    val (sh, _, _) = Dedup.indexBuildFrames(pop, lit(false))
    sameSet(StateLog.views(spark, ref)._1, sh,
      "hash view after the last-wins race vs scratch")
  }

  test("attach with a wrong root fails fast naming the resolved location — " +
    "no silent empty-manifest registration (ADVICE r14 low)") {
    val e = intercept[IllegalArgumentException] {
      StateLog.attach(spark.newSession(), "graft_no_such_log_xyz",
        root = s"${sys.props("java.io.tmpdir")}/nonexistent_subdir")
    }
    assert(e.getMessage.contains("no manifest data at") &&
      e.getMessage.contains("graft_no_such_log_xyz_manifest"), e.getMessage)
    assert(!spark.catalog.tableExists("graft_no_such_log_xyz"),
      "a failed attach must register NOTHING")
  }

  test("claim CAS vs a KNOWN last-wins scheme: refused up front naming the " +
    "store requirement; allowNonAtomicStore accepts single-writer explicitly " +
    "(ADVICE r14 medium)") {
    // a stand-in s3a impl backed by the local fs — only the SCHEME matters
    spark.sparkContext.hadoopConfiguration.set(
      "fs.s3a.impl", classOf[FakeS3aFileSystem].getName)
    import HotBucketFixture.{aDocs, bDocs}
    val oldDocs = docsDf(aDocs).localCheckpoint()
    val st = SnapshotStateSink.write(spark, oldDocs, lit(false), lit(true))
    val ref = StateLog.fromSnapshot(spark, st, StateLog.writeCorpusStore(spark, oldDocs))
    reRoot(ref, "s3a")

    val docs = oldDocs.withColumn("is_new", lit(false))
      .unionByName(docsDf(bDocs).withColumn("is_new", lit(true)))
    val e = intercept[UnsupportedOperationException] {
      StateLog.ingestBatch(spark, ref, st, docs, col("is_new"), 0L)
    }
    assert(e.getMessage.contains("atomic exclusive") &&
      e.getMessage.contains("allowNonAtomicStore"), e.getMessage)
    // attach is the READ entry point and succeeds with no flag (ADVICE
    // r15: a pure reader accepts no commit risk — forcing risk-acceptance
    // on it misstated the contract); the refusal stays at the first
    // commit, which the attached session hits exactly like `e` above
    val s2 = spark.newSession()
    val ref2 = StateLog.attach(s2, ref.manifest)
    assert(ref2.manifest == ref.manifest, "a reader attach on a known " +
      "last-wins store must succeed (warn-only)")
    val e2 = intercept[UnsupportedOperationException] {
      // the self-contained form: the corpus resolves from the log itself
      StateLog.ingestBatch(s2, ref2, st, docsDf(bDocs), 0L)
    }
    assert(e2.getMessage.contains("atomic exclusive"), e2.getMessage)

    // the explicit escape hatch: single-writer commits proceed (warned)
    spark.conf.set("spark.graft.statelog.claims.allowNonAtomicStore", "true")
    try {
      assert(StateLog.ingestBatch(spark, ref, st, docs, col("is_new"), 0L),
        "a single writer on an accepted non-atomic store must commit")
      spark.catalog.refreshTable(ref.manifest)
      assert(spark.table(ref.manifest).distinct().count() == 2)
    } finally spark.conf.unset("spark.graft.statelog.claims.allowNonAtomicStore")
  }

  test("graced age decisions follow the STORE's clock, not the JVM's — the " +
    "probe basis cancels skew (VERDICT r15 task 5)") {
    spark.sparkContext.hadoopConfiguration.set(
      "fs.skewclock.impl", classOf[SkewedClockFileSystem].getName)
    val dir = java.nio.file.Files.createTempDirectory("graft_skew").toFile
    val live = new java.io.File(dir, "live_candidate")
    live.mkdirs()
    java.nio.file.Files.writeString(
      new java.io.File(live, "part-x.parquet").toPath, "x")
    val root = new org.apache.hadoop.fs.Path(s"skewclock://${dir.getAbsolutePath}")
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val grace = 600000L
    val livePath = new org.apache.hadoop.fs.Path(root, "live_candidate")

    // this store's clock runs 2h behind the JVM's: a WALL-clock basis ages
    // the just-written candidate by the full skew — far past the grace —
    // and would reclaim a live writer's in-flight attempt
    val wallNow = System.currentTimeMillis()
    assert(StateLog.agedOnStore(fs, livePath, wallNow, grace),
      "sanity: the wall-clock basis mis-ages a live candidate under this skew")

    // the probe basis reads "now" through the same skewed store — the two
    // sides of the age comparison are on ONE clock, so the skew cancels
    val probedNow = StateLog.probedStoreNow(spark, root)
    assert(math.abs(probedNow - (wallNow - SkewedClockFileSystem.SkewMs)) < 60000L,
      s"the probe must report the STORE's clock (got $probedNow vs wall $wallNow)")
    assert(!StateLog.agedOnStore(fs, livePath, probedNow, grace),
      "the store-probed basis must keep a just-written candidate under skew")

    // a genuinely crashed (day-old) candidate is still reclaimed
    val aged = new java.io.File(dir, "aged_candidate")
    aged.mkdirs()
    java.nio.file.Files.writeString(
      new java.io.File(aged, "part-y.parquet").toPath, "y")
    def backdate(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(backdate))
      f.setLastModified(System.currentTimeMillis() - 86400000L): Unit
    }
    backdate(aged)
    assert(StateLog.agedOnStore(fs,
      new org.apache.hadoop.fs.Path(root, "aged_candidate"), probedNow, grace),
      "a day-old candidate must age out under the probe basis too")
  }
}
