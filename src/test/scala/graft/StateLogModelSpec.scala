package graft

import org.apache.spark.sql.functions._

import graft.pipeline.{Curation, Dedup}
import graft.sources.{SnapshotStateSink, StateLog}

/** MODEL-BASED randomized soak of the state log (r15): a seeded random
  * interleaving of every lifecycle operation — ingest, duplicate
  * replay, retraction (including empty), fold, vacuum, graced sweep,
  * full and incremental checkpoint, time-travel probe — checked after
  * EVERY op against an independently maintained model of the corpus
  * membership. The fixed-order soaks (StateLogSoakBench, the
  * PipelineSpec lifecycle pins) prove the production sequence; this
  * spec walks the op lattice in an order no one hand-picked, which is
  * where maintenance-op interaction bugs live (retract-after-fold,
  * checkpoint-mid-epoch, sweep-between-retract-and-fold, ...).
  *
  * The model is driver-side truth: batches have per-batch-unique
  * vocabularies, so expected survivors are derived from the MODEL's own
  * scratch index frames (never from the log under test), and a
  * retraction's expected removals are a pure Scala filter. The seed is
  * FIXED — the walk is deterministic, a failure is reproducible, and
  * the op trace prints with every assertion. */
class StateLogModelSpec extends SparkSpec {
  import spark.implicits._

  private type DocRow = (Long, String, String, String, Long)

  private def docsDf(rows: Seq[DocRow]) =
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")

  /** One mutually-inert batch per id (the two-process drill's shape):
    * every token embeds (batch, doc, position), so no two docs anywhere
    * share a shingle — survivors are exactly the quality-gate-passing
    * batch rows, order-independent. */
  private def batchRows(batchId: Long): Seq[DocRow] = {
    def alpha(n: Long) = n.toString.map(c => ('a' + (c - '0')).toChar)
    (0 until 24).map { i =>
      val text = (0 until 12)
        .map(j => s"x${alpha(batchId)}d${alpha(i.toLong)}t$j").mkString(" ")
      (batchId * 1000L + i + 1000000L, text, "en", "src", text.length.toLong)
    }
  }

  private def sameSet(a: org.apache.spark.sql.DataFrame,
      b: org.apache.spark.sql.DataFrame, what: String): Unit =
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0,
      s"$what diverged")

  test("seeded random op walk: every interleaving of ingest/replay/retract/" +
    "fold/vacuum/graced-sweep/checkpoint/as-of lands on the model's state") {
    import HotBucketFixture.aDocs
    val oldDocs = docsDf(aDocs).localCheckpoint()
    val st = SnapshotStateSink.write(spark, oldDocs, lit(false), lit(true))
    val ref = StateLog.fromSnapshot(spark, st, StateLog.writeCorpusStore(spark, oldDocs))

    // the MODEL: corpus membership as driver-side rows + committed ids
    var model: Vector[DocRow] = aDocs.toVector
    var nextBatch = 0L
    var nextRetract = 500L
    val committedBatches = scala.collection.mutable.ArrayBuffer[Long]()
    var genCount = 1L // genesis
    val trace = new StringBuilder

    def corpusIds(): Seq[Long] =
      StateLog.corpus(spark, ref).select("doc_id").collect()
        .map(_.getLong(0)).toSeq.sorted
    def checkMembership(op: String): Unit =
      assert(corpusIds() == model.map(_._1).sorted,
        s"corpus membership diverged from the model after [$op]; trace:\n$trace")
    def fullCheck(op: String): Unit = {
      val (sh, sb, _) = Dedup.indexBuildFrames(docsDf(model), lit(false))
      sameSet(StateLog.views(spark, ref)._1, sh,
        s"hash view vs model scratch after [$op]; trace:\n$trace")
      // the band invariant under retraction is eq143's MONOTONE-guard
      // semantics: the log's stop list is a union over committed history
      // and is never shrunk by retraction, so the effective band is the
      // retained membership's band rows minus the LOG's stop union (a
      // scratch build over the smaller retained corpus computes a
      // smaller stop list — any bucket over cap in the retained pop was
      // over cap historically too, so logStop ⊇ scratchStop and the
      // subtraction below is exact, found by this walk's first run)
      val logStop = StateLog.views(spark, ref)._3.distinct()
      sameSet(StateLog.effectiveBand(spark, ref).select("band", "band_key", "doc_id"),
        sb.select("band", "band_key", "doc_id")
          .join(broadcast(logStop), Seq("band", "band_key"), "left_anti"),
        s"effective band vs model scratch after [$op]; trace:\n$trace")
    }

    val rnd = new scala.util.Random(20260816L)
    val Ops = 22
    (0 until Ops).foreach { step =>
      // step 0 is always an ingest (a non-trivial state to walk from) and
      // every 7th step is a FOLD — the seed must not be able to walk
      // around the op whose interleavings (fold→retract, fold→ingest,
      // vacuum-after-fold) are the likeliest bug nests; everything else
      // is the seeded roll
      val roll =
        if (step == 0) 0
        else if (step % 7 == 3) { rnd.nextInt(100): Unit; 65 }
        else rnd.nextInt(100)
      val op: String = roll match {
        case r if r < 35 => // INGEST a fresh mutually-inert batch
          val id = nextBatch; nextBatch += 1
          val rows = batchRows(id)
          // expected survivors from the MODEL's scratch frames, never
          // from the log under test
          val (shM, sbM, _) = Dedup.indexBuildFrames(docsDf(model), lit(false))
          val exp = Curation.deltaSurvivorsFromState(
            docsDf(model).withColumn("is_new", lit(false))
              .unionByName(docsDf(rows).withColumn("is_new", lit(true))),
            col("is_new"), shM, sbM.select("band", "band_key", "doc_id"),
            spark.table(st.testVocab), spark.table(st.mixRates))
            .select("doc_id", "text", "lang", "source", "n_chars").collect()
            .map(r => (r.getLong(0), r.getString(1), r.getString(2),
              r.getString(3), r.getLong(4))).toVector
          assert(StateLog.ingestBatch(spark, ref, st, docsDf(rows), id),
            s"fresh batch $id must apply; trace:\n$trace")
          model ++= exp
          committedBatches += id
          genCount += 1
          s"ingest($id, ${exp.size} survivors)"
        case r if r < 45 => // REPLAY a committed batch id — must no-op
          if (committedBatches.isEmpty) "noop(replay)"
          else {
            val id = committedBatches(rnd.nextInt(committedBatches.size))
            assert(!StateLog.ingestBatch(spark, ref, st, docsDf(batchRows(id)), id),
              s"replay of committed batch $id must be skipped; trace:\n$trace")
            s"replay($id)"
          }
        case r if r < 52 => // caller-supplied REPACK (legal at any epoch)
          val id = nextRetract; nextRetract += 1
          val retained = docsDf(model).select(col("lang"), col("doc_id"),
            graft.functions.TextCountExpressions.ws_token_count(col("text"))
              .as("n_tokens"), col("n_chars"))
          assert(StateLog.repackLog(spark, ref, retained, id),
            s"repack $id must commit; trace:\n$trace")
          genCount += 1
          // at this instant the pack view IS the model's re-windowed
          // summary (the next delta appends over it cumulatively)
          sameSet(StateLog.views(spark, ref)._4,
            Curation.packSummaryOf(retained),
            s"pack view vs model summary after repack($id); trace:\n$trace")
          s"repack($id)"
        case r if r < 64 => // RETRACT by predicate (possibly empty)
          val m = 5 + rnd.nextInt(5); val rem = rnd.nextInt(m)
          val id = nextRetract; nextRetract += 1
          assert(StateLog.retractBatch(spark, ref,
            col("doc_id") % m === rem, id),
            s"retraction $id must commit (even empty); trace:\n$trace")
          val before = model.size
          model = model.filterNot { case (d, _, _, _, _) => d % m == rem }
          genCount += 1
          s"retract($id, %$m==$rem, ${before - model.size} docs)"
        case r if r < 74 => // FOLD
          StateLog.compactLog(spark, ref)
          genCount += 1
          "fold"
        case r if r < 81 => // VACUUM
          val dropped = StateLog.vacuum(spark, ref)
          s"vacuum(${dropped.size})"
        case r if r < 86 => // GRACED SWEEP with a planted aged orphan
          val orphan = new java.io.File(sys.props("java.io.tmpdir"),
            s"${ref.manifest}_hash_b9_amodel${step}_1")
          Seq(("junk")).toDF("h").write.mode("overwrite").parquet(orphan.getPath)
          def back(f: java.io.File): Unit = {
            Option(f.listFiles()).foreach(_.foreach(back))
            f.setLastModified(System.currentTimeMillis() - 86400000L): Unit
          }
          back(orphan)
          val dropped = StateLog.sweep(spark, ref, graceMs = 600000L)
          assert(dropped.contains(orphan.getName) && !orphan.exists(),
            s"graced sweep must reclaim the planted aged orphan; trace:\n$trace")
          s"sweep(${dropped.size})"
        case r if r < 95 => // CHECKPOINT (sometimes incremental)
          val (b, a) =
            if (rnd.nextBoolean()) StateLog.checkpointManifest(spark, ref)
            else StateLog.checkpointManifest(spark, ref, maxFiles = 2)
          assert(a <= b && a >= 1, s"checkpoint $b->$a malformed; trace:\n$trace")
          s"checkpoint($b->$a)"
        case _ => // TIME-TRAVEL probe: resolves, or is cleanly bounded
          val gen = rnd.nextLong(genCount)
          try {
            StateLog.viewsAsOf(spark, ref, gen)._1.count(): Unit
            s"asof($gen ok)"
          } catch {
            case e: IllegalStateException if e.getMessage.contains("bounded") =>
              s"asof($gen bounded)"
          }
      }
      trace.append(s"$step: $op\n")
      checkMembership(op)
      if (op == "fold" || step == Ops - 1) fullCheck(op)
    }

    // closing invariants: the walk's final state survives one more full
    // maintenance pass and a scratch comparison on every layer
    StateLog.compactLog(spark, ref)
    StateLog.vacuum(spark, ref): Unit
    StateLog.sweep(spark, ref, graceMs = 600000L): Unit
    StateLog.checkpointManifest(spark, ref): Unit
    checkMembership("closing pass")
    fullCheck("closing pass")
    // every committed batch id still replay-skips at the very end
    committedBatches.foreach { id =>
      assert(!StateLog.ingestBatch(spark, ref, st, docsDf(batchRows(id)), id),
        s"batch $id must stay skipped after the walk; trace:\n$trace")
    }
    println(s"[modelspec] walk complete (${Ops} ops):\n$trace")
  }

  test("concurrent two-writer walk: randomized op sequences raced through the " +
    "claim CAS land on the model replayed in COMMITTED manifest order " +
    "(VERDICT r15 task 4; r16 adds the MAINTENANCE ops to the race)") {
    import HotBucketFixture.aDocs
    val oldDocs = docsDf(aDocs).localCheckpoint()
    val st = SnapshotStateSink.write(spark, oldDocs, lit(false), lit(true))
    val ref = StateLog.fromSnapshot(spark, st, StateLog.writeCorpusStore(spark, oldDocs))

    // each writer is its own SESSION with the in-process commit mutex OFF
    // (the eq148 posture): every interleaving is arbitrated by the durable
    // claim CAS alone, exactly like two driver processes — the fixed-script
    // two-process drill taken onto a seeded RANDOM op lattice. The model
    // cannot predict the race's serialization, so it is updated from the
    // COMMITTED manifest order after each round's quiesce point: the order
    // the CAS durably chose IS the truth the views must replay.
    //
    // r16 widens the raced op set to the MAINTENANCE side: zero-grace
    // vacuum (legal against writers — only as-of readers touch pre-fold
    // generations, and those race guarded), the GRACED sweep (the
    // live-writer-safe form; zero-grace sweep is quiesced-only BY
    // CONTRACT — it reclaims every in-flight temp), and guardAsOfRead
    // probes. The GC invariants here are implicit and strict: a raced
    // vacuum/sweep must never take a LIVE table (the membership and
    // scratch checks after the quiesce would diverge), must reclaim a
    // planted aged orphan (whichever racer gets there), and must be
    // IDEMPOTENT under a concurrent twin (both-vacuum / both-sweep
    // rounds drop overlapping sets — "already gone" is success, never a
    // crash). A guarded as-of probe racing a vacuum must land on resolve
    // or the clean bounded error, never a raw missing-file failure.
    val sessions = Vector(spark.newSession(), spark.newSession())
    val rnd = new scala.util.Random(20260817L)
    var model: Vector[DocRow] = aDocs.toVector
    val trace = new StringBuilder
    val retractSpec = scala.collection.mutable.Map[Long, (Int, Int)]()
    var nextBatch = Vector(0L, 1L)      // writer w mints ids ≡ w (mod 2)
    var nextRetract = Vector(500L, 501L)
    var lastSeenGen = 0L
    val committedBatches = scala.collection.mutable.ArrayBuffer[Long]()

    def corpusIds(): Seq[Long] =
      StateLog.corpus(spark, ref).select("doc_id").collect()
        .map(_.getLong(0)).toSeq.sorted
    def fullCheck(op: String): Unit = {
      val (sh, sb, _) = Dedup.indexBuildFrames(docsDf(model), lit(false))
      sameSet(StateLog.views(spark, ref)._1, sh,
        s"hash view vs model scratch after [$op]; trace:\n$trace")
      val logStop = StateLog.views(spark, ref)._3.distinct()
      sameSet(StateLog.effectiveBand(spark, ref).select("band", "band_key", "doc_id"),
        sb.select("band", "band_key", "doc_id")
          .join(broadcast(logStop), Seq("band", "band_key"), "left_anti"),
        s"effective band vs model scratch after [$op]; trace:\n$trace")
    }

    val Rounds = 9
    val opHist = scala.collection.mutable.Map.empty[String, Int].withDefaultValue(0)
    StateLog.simulateCrossProcessWriters(ref.manifest, on = true)
    try {
      (0 until Rounds).foreach { round =>
        // one seeded random op per writer, the pair raced concurrently
        // (round 0 is two ingests — a non-trivial state to walk from;
        // round 2 forces vacuum||sweep, round 3 forces fold||ingest so a
        // superseded generation exists, round 5 forces asof||vacuum, and
        // round 7 forces checkpoint||ingest — the seed cannot walk around
        // the maintenance races this test exists to pin, and the round-5
        // vacuum has pre-fold tables to take from under the guarded probe)
        val plans: Seq[(Int, String, Long)] = (0 until 2).map { w =>
          val roll =
            if (round == 0) 0
            else if (round == 2) { rnd.nextInt(100): Unit; if (w == 0) 76 else 84 }
            else if (round == 3) { rnd.nextInt(100): Unit; if (w == 0) 56 else 0 }
            else if (round == 5) { rnd.nextInt(100): Unit; if (w == 0) 95 else 76 }
            else if (round == 7) { rnd.nextInt(100): Unit; if (w == 0) 70 else 0 }
            else rnd.nextInt(100)
          if (roll < 35) {
            val id = nextBatch(w); nextBatch = nextBatch.updated(w, id + 2)
            (w, "ingest", id)
          } else if (roll < 55) {
            val id = nextRetract(w); nextRetract = nextRetract.updated(w, id + 2)
            retractSpec(id) = (5 + rnd.nextInt(5), rnd.nextInt(5))
            (w, "retract", id)
          } else if (roll < 67) (w, "fold", -1L)
          else if (roll < 75) (w, "checkpoint", -1L)
          else if (roll < 83) (w, "vacuum", -1L)
          else if (roll < 91) (w, "sweep", -1L)
          else (w, "asof", rnd.nextLong(lastSeenGen + 1))
        }
        plans.foreach(p => opHist(p._2) += 1)
        // a planted aged orphan when a sweep is in the round: whichever
        // racer sweeps first reclaims it — asserted gone after the quiesce
        val orphan: Option[java.io.File] =
          if (!plans.exists(_._2 == "sweep")) None
          else {
            val f = new java.io.File(sys.props("java.io.tmpdir"),
              s"${ref.manifest}_hash_b9_race${round}_1")
            Seq(("junk")).toDF("h").write.mode("overwrite").parquet(f.getPath)
            def back(x: java.io.File): Unit = {
              Option(x.listFiles()).foreach(_.foreach(back))
              x.setLastModified(System.currentTimeMillis() - 86400000L): Unit
            }
            back(f)
            Some(f)
          }
        trace.append(s"round $round: ${plans.map(p => s"w${p._1}:${p._2}(${p._3})").mkString(" || ")}\n")
        val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
        val go = new java.util.concurrent.CountDownLatch(1)
        val futs = plans.map { case (w, kind, id) =>
          pool.submit(new java.util.concurrent.Callable[Unit] {
            def call(): Unit = {
              go.await()
              val s = sessions(w)
              kind match {
                case "ingest" =>
                  assert(StateLog.ingestBatch(s, ref, st, docsDf(batchRows(id)), id),
                    s"fresh batch $id must apply; trace:\n$trace")
                case "retract" =>
                  assert(StateLog.retractBatch(s, ref,
                    col("doc_id") % retractSpec(id)._1 === retractSpec(id)._2, id),
                    s"retraction $id must commit; trace:\n$trace")
                case "fold" => StateLog.compactLog(s, ref)
                case "checkpoint" =>
                  val (b, a) = StateLog.checkpointManifest(s, ref)
                  assert(a <= b && a >= 1, s"checkpoint $b->$a malformed")
                case "vacuum" => StateLog.vacuum(s, ref): Unit
                case "sweep" => StateLog.sweep(s, ref, graceMs = 600000L): Unit
                case "asof" =>
                  // a committed gen raced against a possible vacuum: the
                  // guard's contract is resolve OR the clean bounded
                  // error — a raw missing-file failure fails the walk
                  try StateLog.guardAsOfRead(s, ref, id) {
                    StateLog.corpusAsOf(s, ref, id).count(): Unit
                  } catch {
                    case e: IllegalStateException
                      if e.getMessage.contains("bounded") => ()
                  }
              }
            }
          })
        }
        go.countDown()
        futs.foreach(_.get(300, java.util.concurrent.TimeUnit.SECONDS): Unit)
        pool.shutdown()
        orphan.foreach(f => assert(!f.exists(),
          s"round $round's planted aged orphan must be swept; trace:\n$trace"))

        // QUIESCE POINT: replay the round's committed rows IN GEN ORDER —
        // the serialization the claim CAS chose — into the model
        spark.catalog.refreshTable(ref.manifest)
        val newRows = spark.table(ref.manifest).distinct()
          .filter(col("gen_id") > lastSeenGen)
          .orderBy("gen_id").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
        val rowCommitting = Set("ingest", "retract", "fold")
        assert(newRows.nonEmpty || !plans.exists(p => rowCommitting(p._2)),
          s"round $round committed nothing; trace:\n$trace")
        newRows.foreach { case (gen, bid, kind) =>
          kind match {
            case "delta" =>
              // expected survivors from the MODEL's scratch frames at this
              // point of the committed order, never from the log under test
              val (shM, sbM, _) = Dedup.indexBuildFrames(docsDf(model), lit(false))
              val exp = Curation.deltaSurvivorsFromState(
                docsDf(model).withColumn("is_new", lit(false))
                  .unionByName(docsDf(batchRows(bid)).withColumn("is_new", lit(true))),
                col("is_new"), shM, sbM.select("band", "band_key", "doc_id"),
                spark.table(st.testVocab), spark.table(st.mixRates))
                .select("doc_id", "text", "lang", "source", "n_chars").collect()
                .map(r => (r.getLong(0), r.getString(1), r.getString(2),
                  r.getString(3), r.getLong(4))).toVector
              model ++= exp
              committedBatches += bid
              trace.append(s"  g$gen delta($bid, ${exp.size} survivors)\n")
            case "retract" =>
              val (m, rem) = retractSpec(bid)
              val before = model.size
              model = model.filterNot { case (d, _, _, _, _) => d % m == rem }
              trace.append(s"  g$gen retract($bid, %$m==$rem, ${before - model.size} docs)\n")
            case other =>
              trace.append(s"  g$gen $other\n")
          }
          lastSeenGen = gen
        }
        assert(corpusIds() == model.map(_._1).sorted,
          s"corpus membership diverged after round $round; trace:\n$trace")
        if (newRows.exists(_._3 == "fold")) fullCheck(s"round $round fold")
      }
    } finally StateLog.simulateCrossProcessWriters(ref.manifest, on = false)

    // closing invariants: dense unique gen_ids (the CAS never minted a
    // duplicate or a gap), zero claim residue, full scratch comparison,
    // and every committed batch id still replay-skips
    spark.catalog.refreshTable(ref.manifest)
    val genIds = spark.table(ref.manifest).distinct().orderBy("gen_id")
      .collect().map(_.getLong(0)).toSeq
    assert(genIds == (0L to lastSeenGen),
      s"gen_ids must be dense and unique, got $genIds; trace:\n$trace")
    val claims = new java.io.File(sys.props("java.io.tmpdir"),
      s"${ref.manifest}_manifest_claims")
    val residue = Option(claims.listFiles()).map(_.toSeq).getOrElse(Seq.empty)
      .filter(_.getName.endsWith(".claim"))
    assert(residue.isEmpty, s"claims must self-drop, found $residue")
    fullCheck("closing")
    committedBatches.foreach { id =>
      assert(!StateLog.ingestBatch(spark, ref, st, docsDf(batchRows(id)), id),
        s"batch $id must stay skipped after the walk; trace:\n$trace")
    }
    // the forced rounds guarantee the maintenance races happened no
    // matter where the seed walked
    Seq("vacuum", "sweep", "asof", "checkpoint").foreach(k =>
      assert(opHist(k) >= 1, s"the walk must race at least one $k; got $opHist"))
    println(s"[modelspec] concurrent walk complete ($Rounds rounds, " +
      s"${lastSeenGen} generations, ops ${opHist.toSeq.sorted.mkString(", ")}):" +
      s"\n$trace")
  }
}
