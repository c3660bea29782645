package graft.sources

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

import graft.Tables
import graft.pipeline.Curation

/** eq140 — the CURATION SNAPSHOT STATE at rest: eq137 proves the delta
  * path touches only the batch, but every frozen artifact it consumes —
  * the dedup index, the test-split vocabulary, the release mix rates,
  * the shipped BPE encoder, the per-lang pack summary — lives in
  * session-lifetime PlanMemos. eq139 persisted the index; this persists
  * THE REST, closing the loop: a full curation ends by writing its
  * snapshot state ([[write]]), and the next delta ingest — possibly
  * days later, in a different driver — runs the eq137 funnel reading
  * every artifact from storage ([[readAndCurate]]), holding nothing in
  * memory from the last full run.
  *
  * Table layouts: the test vocabulary (the one corpus-scaled artifact)
  * is bucketed+sorted by `sg` so the decontamination probe shuffles only
  * the delta side; mix rates / pack summary are |langs|-row frames and
  * the BPE encoder is vocabulary-bounded — plain parquet tables read
  * back whole and broadcast where the funnel needs them.
  *
  * The query's funnel is BIT-IDENTICAL to eq137's — it shares that
  * oracle verbatim, so any loss or mangling across the write→read
  * round-trip of ANY artifact breaks the hash compare. PipelineSpec
  * pins the restart contract the memos can't give: a FRESH session
  * running [[readAndCurate]] mines only the delta (+1 pair table, +1
  * labels, +1 batch signing) and re-learns nothing (BPE vocabulary +0,
  * index memos +0).
  *
  * Reference basis: the reference persists ETL output to a second store
  * and queries the stored copy (`etl_project/data.py:41-42`); this is
  * that round-trip for the pipeline's whole inter-snapshot state.
  */
object SnapshotStateSink {

  private val sinkSeq = new AtomicLong()

  /** The five at-rest artifact tables (plus the index's three inside
    * [[DedupIndexSink.IndexTables]]) a finished full curation hands the
    * next delta ingest. */
  final case class StateTables(index: DedupIndexSink.IndexTables,
      testVocab: String, mixRates: String, bpeEnc: String, packSummary: String)

  def eq140(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    val t = write(spark, docs)
    readAndCurate(spark, docs, t)
  }

  /** Ends a full curation of the OLD snapshot (eq104's split rule) by
    * writing its state tables — per-invocation names + tmp paths, the
    * eq138/eq139 convention. */
  def write(spark: SparkSession, docs: DataFrame): StateTables = {
    val idx = DedupIndexSink.write(spark, docs, DedupIndexSink.isNewCol)
    val (testVocab, mixRates, bpeEnc, packSummary) =
      Curation.snapshotArtifactFrames(docs.filter(col("doc_id") % 10 < 8))
    val id = s"${ProcessHandle.current().pid()}_${sinkSeq.incrementAndGet()}"
    val tmp = sys.props("java.io.tmpdir")
    def save(df: DataFrame, name: String): String = {
      val tbl = s"graft_snapshot_state_${name}_$id"
      val w = df.write.mode("overwrite")
        .option("path", s"$tmp/graft_snapshot_state_${id}_$name")
      (if (name == "test_vocab") w.bucketBy(DedupIndexSink.Buckets, "sg").sortBy("sg")
       else w).saveAsTable(tbl)
      tbl
    }
    StateTables(idx, save(testVocab, "test_vocab"), save(mixRates, "mix_rates"),
      save(bpeEnc, "bpe_enc"), save(packSummary, "pack_summary"))
  }

  /** The next delta ingest: the eq137 funnel over the incoming batch
    * with every frozen artifact read back through the catalog. Callable
    * from any session of the context — the restart path PipelineSpec
    * drives. */
  def readAndCurate(spark: SparkSession, docs: DataFrame, t: StateTables): DataFrame = {
    val (hashIdx, bandIdx, _) = DedupIndexSink.readBack(spark, t.index)
    Curation.incrementalCurationFromState(docs, DedupIndexSink.isNewCol,
      hashIdx, bandIdx, spark.table(t.testVocab), spark.table(t.mixRates),
      spark.table(t.bpeEnc), spark.table(t.packSummary))
  }
}
