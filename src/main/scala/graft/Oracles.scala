package graft

/** DuckDB-dialect oracle SQL for every oracle-checkable query in
  * SparkEntry.queries (driver contract: Verify dumps these to
  * oracle_sql.json; the driver runs them in DuckDB 1.0 over the same
  * parquet tables and hash-compares against our parquet output).
  *
  * Dialect-parity rules (SURVEY.md §2.9):
  *  - every double literal that Spark evaluates as Double is written
  *    `x::DOUBLE` so DuckDB doesn't compute in DECIMAL;
  *  - arithmetic written in the same association order as the Spark plan so
  *    IEEE results are bit-identical before `ROUND(_, 6)`;
  *  - doubles rounded *before* any order-sensitive step (top-k cuts);
  *  - dates/timestamps rendered as ISO strings;
  *  - full deterministic ORDER BY on output, `magid`/id tie-breaks.
  */
object Oracles {

  /** Shared CTEs: the §2.9 retarget views. */
  private val pdvCte =
    """pdv AS (
      |  SELECT CAST(l_shipdate AS DATE) AS dateid, l_partkey AS prodid,
      |         p_type AS catid, p_brand AS fabid, l_suppkey AS magid
      |  FROM lineitem JOIN part ON l_partkey = p_partkey),
      |produits AS (SELECT dateid, prodid, catid, fabid FROM pdv)""".stripMargin

  private def withPdv(sql: String): String = s"WITH $pdvCte\n$sql"

  private val top10AllCats =
    """SELECT magid,
      |       COUNT(DISTINCT fabid) AS total_fabricants,
      |       COUNT(DISTINCT catid) AS total_categories,
      |       COUNT(DISTINCT prodid) AS total_produits,
      |       COUNT(*) AS total_ventes,
      |       ROUND(COUNT(DISTINCT fabid) * 0.1::DOUBLE
      |           + COUNT(DISTINCT catid) * 0.2::DOUBLE
      |           + COUNT(DISTINCT prodid) * 0.3::DOUBLE
      |           + COUNT(*) * 0.4::DOUBLE, 6) AS score
      |FROM pdv
      |WHERE dateid BETWEEN DATE '1995-01-01' AND DATE '1996-12-31'
      |GROUP BY magid
      |ORDER BY score DESC, magid ASC
      |LIMIT 10""".stripMargin

  private def top10Cat(fin: String) =
    s"""SELECT magid,
       |       COUNT(DISTINCT fabid) AS total_fabricants,
       |       COUNT(DISTINCT prodid) AS total_produits,
       |       COUNT(*) AS total_ventes,
       |       ROUND(COUNT(DISTINCT fabid) * 0.1::DOUBLE
       |           + COUNT(DISTINCT prodid) * 0.3::DOUBLE
       |           + COUNT(*) * 0.6::DOUBLE, 6) AS score
       |FROM pdv
       |WHERE catid = 'STANDARD'
       |  AND dateid BETWEEN DATE '1995-01-01' AND DATE '$fin'
       |GROUP BY magid
       |ORDER BY score DESC, magid ASC
       |LIMIT 10""".stripMargin

  val retail: Map[String, String] = Map(
    "q1_filter_cat" -> withPdv(
      """SELECT CAST(dateid AS VARCHAR) AS dateid, prodid, catid, fabid
        |FROM produits WHERE catid = 'STANDARD'
        |ORDER BY 1, 2, 3, 4""".stripMargin),

    "q2_count_distinct_mag" -> withPdv(
      "SELECT COUNT(DISTINCT magid) AS total_magasins FROM pdv WHERE catid = 'STANDARD'"),

    "q3_count_distinct_fab" -> withPdv(
      "SELECT COUNT(DISTINCT fabid) AS total_fabricants FROM produits WHERE catid = 'STANDARD'"),

    "q4_avg_prod_per_fab" -> withPdv(
      """SELECT ROUND(AVG(product_count), 6) AS avg_products_per_fab
        |FROM (SELECT fabid, COUNT(DISTINCT prodid) AS product_count
        |      FROM produits
        |      WHERE catid = 'STANDARD'
        |        AND dateid BETWEEN DATE '1995-01-01' AND DATE '1996-12-31'
        |      GROUP BY fabid) s""".stripMargin),

    "q5_top_magasins" -> withPdv(top10AllCats),

    "q6_top_magasins_cat" -> withPdv(top10Cat("1996-12-31")),

    "q7_mag_per_month" -> withPdv(
      """SELECT strftime(dateid, '%Y-%m') AS mois, COUNT(DISTINCT magid) AS nbmag
        |FROM pdv
        |WHERE catid = 'STANDARD' AND year(dateid) = 1995
        |GROUP BY mois ORDER BY mois""".stripMargin),

    "q8_score_evolution" -> withPdv(
      """SELECT strftime(dateid, '%Y-%m') AS mois,
        |       COUNT(*) AS total_ventes,
        |       CAST(SUM(CASE WHEN fabid = 'Brand#12' THEN 1 ELSE 0 END) AS BIGINT) AS ventes_fab,
        |       ROUND(COALESCE(
        |         SUM(CASE WHEN fabid = 'Brand#12' THEN 1 ELSE 0 END) * 100.0::DOUBLE
        |           / NULLIF(COUNT(*), 0), 0.0::DOUBLE), 6) AS score_sante
        |FROM pdv
        |WHERE catid = 'STANDARD'
        |  AND dateid BETWEEN DATE '1995-01-01' AND DATE '1998-09-01'
        |GROUP BY mois ORDER BY mois""".stripMargin),

    "q9_top1" -> withPdv(
      s""", top10 AS ($top10AllCats)
         |SELECT magid,
         |       COUNT(DISTINCT fabid) AS total_fabricants,
         |       COUNT(DISTINCT prodid) AS total_produits,
         |       COUNT(*) AS total_ventes,
         |       ROUND(COUNT(DISTINCT prodid) * 0.3::DOUBLE
         |           + COUNT(*) * 0.6::DOUBLE
         |           + COUNT(DISTINCT fabid) * 0.1::DOUBLE, 6) AS score
         |FROM pdv
         |WHERE catid = 'STANDARD' AND magid IN (SELECT magid FROM top10)
         |GROUP BY magid
         |ORDER BY score DESC, magid ASC
         |LIMIT 1""".stripMargin),

    "q10_avg_fab_top10" -> withPdv(
      s""", top10 AS (${top10Cat("1996-12-31")}),
         |best AS (
         |  SELECT magid, COUNT(DISTINCT prodid) AS nb
         |  FROM pdv
         |  WHERE catid = 'STANDARD' AND fabid = 'Brand#12'
         |    AND magid IN (SELECT magid FROM top10)
         |  GROUP BY magid),
         |j AS (
         |  SELECT t.magid, t.total_produits,
         |         COALESCE(b.nb, 0) AS nb_produits_fab,
         |         CAST(COALESCE(b.nb, 0) AS DOUBLE) / t.total_produits * 100.0::DOUBLE AS pct_raw
         |  FROM top10 t LEFT JOIN best b ON t.magid = b.magid)
         |SELECT magid, total_produits, nb_produits_fab,
         |       ROUND(pct_raw, 6) AS percentage,
         |       (SELECT ROUND(AVG(CASE WHEN total_produits <> 0 THEN pct_raw END), 6) FROM j) AS average
         |FROM j
         |ORDER BY magid""".stripMargin),

    "q11_score_sante_months" -> withPdv(
      s""", top10 AS (${top10Cat("1998-09-01")}),
         |permonth AS (
         |  SELECT magid, strftime(dateid, '%Y-%m') AS mois_annee,
         |         COUNT(DISTINCT prodid) AS nb
         |  FROM pdv
         |  WHERE catid = 'STANDARD' AND fabid = 'Brand#12'
         |    AND magid IN (SELECT magid FROM top10)
         |  GROUP BY magid, mois_annee),
         |spine AS (
         |  SELECT strftime(m, '%Y-%m') AS mois_annee
         |  FROM (SELECT unnest(generate_series(DATE '1995-01-01', DATE '1998-09-01',
         |                                      INTERVAL 1 MONTH)) AS m)),
         |monthly AS (
         |  SELECT s.mois_annee,
         |         AVG(CASE WHEN p.nb IS NOT NULL AND t.total_produits <> 0
         |                  THEN CAST(p.nb AS DOUBLE) / t.total_produits * 100.0::DOUBLE END) AS avg_raw
         |  FROM spine s
         |  CROSS JOIN top10 t
         |  LEFT JOIN permonth p ON p.magid = t.magid AND p.mois_annee = s.mois_annee
         |  GROUP BY s.mois_annee)
         |SELECT mois_annee,
         |       ROUND(COALESCE(avg_raw, 0.0::DOUBLE), 6) AS avg_percentage,
         |       (SELECT ROUND(AVG(avg_raw), 6) FROM monthly) AS average
         |FROM monthly
         |ORDER BY mois_annee""".stripMargin),

    "q12_ingest" ->
      """WITH raw AS (
        |  SELECT line
        |  FROM read_csv('/root/repo/src/test/resources/fixtures/pointsDeVente-tous.csv',
        |                columns = {'line': 'VARCHAR'}, delim = '|', header = false)),
        |toks AS (
        |  SELECT regexp_split_to_array(trim(line), '\s+') AS a
        |  FROM raw WHERE trim(line) <> ''),
        |data AS (SELECT a FROM toks WHERE lower(a[1]) <> 'dateid')
        |SELECT COUNT(*) AS n_rows,
        |       CAST(MIN(strptime(a[1], '%Y%m%d')::DATE) AS VARCHAR) AS min_date,
        |       CAST(MAX(strptime(a[1], '%Y%m%d')::DATE) AS VARCHAR) AS max_date,
        |       CAST(SUM(a[2]::BIGINT) AS BIGINT) AS sum_prodid,
        |       CAST(SUM(a[3]::BIGINT) AS BIGINT) AS sum_catid,
        |       CAST(SUM(a[4]::BIGINT) AS BIGINT) AS sum_fabid,
        |       CAST(SUM(a[5]::BIGINT) AS BIGINT) AS sum_magid
        |FROM data""".stripMargin,
  )
}
