package graft

/** Dev/deploy tool: smoke the [[ProdSession]] conf artifact in a real
  * session — build with the production confs (master and shuffle ceiling
  * overridden for the local run), execute the flagship query and one
  * graft SQL function through the extensions line, print the confs that
  * were live. On a cluster the same invocation minus the master override
  * is the deployment smoke test. */
object ProdCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = ProdSession.builder("graft-prod-check", shufflePartitions = 8)
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[4]"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val rows = SparkEntry.entry(spark).count()
    val toks = spark.sql("SELECT graft_ws_token_count('a b c') AS n").head().getInt(0)
    val live = Seq("spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.autoBroadcastJoinThreshold", "spark.sql.extensions")
      .map(k => s"$k=${spark.conf.get(k)}").mkString(", ")
    println(s"""{"prodcheck":"ok","entry_rows":$rows,"graft_sql_tokens":$toks,"confs":"$live"}""")
    spark.stop()
  }
}
