package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loads the driver parquet fixtures (TESTDATA.md) and builds the
  * reference-schema retarget views declared in SURVEY.md §2.9:
  *
  *   pdv(dateid, prodid, catid, fabid, magid)  ≙ points_de_vente
  *     (reference /root/reference/etl_project/data.py:30-38)
  *   produits(dateid, prodid, catid, fabid)    ≙ produits
  *     (reference /root/reference/etl_project/data.py:21-28)
  *
  * realized as `lineitem ⋈ part ON l_partkey = p_partkey`. The join is left
  * to Catalyst/AQE to plan: at test scale `part` is far under the broadcast
  * threshold so it becomes a BroadcastHashJoin; at 100 TB scale AQE would
  * pick a shuffled hash join on the same declarative plan — we deliberately
  * do not force a `broadcast()` hint here.
  */
object Tables {
  val base: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** The events fixture's at-rest schema: ts is parquet TIMESTAMP(NANOS),
    * which Spark's TimestampType (micros) refuses outright during schema
    * inference. Declaring ts as LongType reads the raw INT64 epoch-nanos
    * directly — no inference, no session-global
    * `spark.sql.legacy.parquet.nanosAsLong` flag (which would silently
    * change how any OTHER nanos parquet in the same session reads). */
  private val eventsSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("event_id", org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("ts", org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("user_id", org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("event_type", org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("value", org.apache.spark.sql.types.DoubleType),
    org.apache.spark.sql.types.StructField("props", org.apache.spark.sql.types.StringType)))

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") {
      // Integer-divide nanos to micros: `ts div 1000`, NOT `/1000` —
      // epoch-nanos ≈ 1.7e18 exceeds double's 2^53 exact range, so a double
      // division would silently corrupt timestamps.
      spark.read.schema(eventsSchema).parquet(s"$sfDir/$name.parquet")
        .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
    } else {
      spark.read.parquet(s"$sfDir/$name.parquet")
    }

  /** Register every base table plus the pdv/produits views as temp views.
    * Idempotent; cheap (metadata only — reads parquet footers, no data). */
  def register(spark: SparkSession, sfDir: String): Unit = {
    base.foreach(t => load(spark, sfDir, t).createOrReplaceTempView(t))
    pdv(spark, sfDir).createOrReplaceTempView("pdv")
    produits(spark, sfDir).createOrReplaceTempView("produits")
  }

  /** The fact view. Column pruning + filter pushdown reach the parquet scans
    * because this is a pure declarative plan (no action, no collect). */
  def pdv(spark: SparkSession, sfDir: String): DataFrame =
    pdvOf(load(spark, sfDir, "lineitem"), load(spark, sfDir, "part"))

  /** The one pdv join+projection, shared with the bucketed layout so the
    * column mapping cannot drift between the two physical strategies. */
  def pdvOf(li: DataFrame, pt: DataFrame): DataFrame =
    li.join(pt, li("l_partkey") === pt("p_partkey"))
      .select(
        li("l_shipdate").cast("date").as("dateid"),
        li("l_partkey").as("prodid"),
        pt("p_type").as("catid"),
        pt("p_brand").as("fabid"),
        li("l_suppkey").as("magid"))

  def produits(spark: SparkSession, sfDir: String): DataFrame =
    pdv(spark, sfDir).select("dateid", "prodid", "catid", "fabid")
}
