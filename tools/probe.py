import duckdb
con = duckdb.connect()
d='/root/testdata/sf0.01'
for t in ['documents','embeddings','events','part','lineitem']:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{d}/{t}.parquet')")
print('regexp_split:', con.execute(r"SELECT regexp_split_to_array(trim('a  b   c'), '\s+')").fetchone())
print('genseries:', con.execute("SELECT strftime(unnest(generate_series(DATE '1995-01-01', DATE '1995-03-01', INTERVAL 1 MONTH)),'%Y-%m')").fetchall())
print('time_bucket:', con.execute("SELECT time_bucket(INTERVAL '1 hour', ts::TIMESTAMP) FROM events LIMIT 2").fetchall())
print('list_transform/range:', con.execute("SELECT list_transform(range(1,4), i -> i*2)").fetchone())
print('epoch_us:', con.execute("SELECT epoch_us(ts::TIMESTAMP) FROM events LIMIT 1").fetchone())
print('list_filter:', con.execute("SELECT len(list_filter(['a','the','b'], x -> x IN ('the','a')))").fetchone())
print('list_aggregate min:', con.execute("SELECT list_aggregate(['b','a','c'],'min')").fetchone())
r = con.execute('''
WITH un AS (SELECT a.vec_id va, b.vec_id vb, unnest(a.embedding)::DOUBLE x, unnest(b.embedding)::DOUBLE y
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id),
sims AS (SELECT va, vb, SUM(x*y)/(SQRT(SUM(x*x))*SQRT(SUM(y*y))) sim FROM un GROUP BY va, vb)
SELECT MAX(sim), quantile_cont(sim, 0.999), COUNT(CASE WHEN sim>=0.99 THEN 1 END), COUNT(CASE WHEN sim>=0.9 THEN 1 END), COUNT(CASE WHEN sim>=0.8 THEN 1 END), COUNT(CASE WHEN sim>=0.5 THEN 1 END) FROM sims''').fetchall()
print('cosine dist:', r)
# jaccard shingle overlap probe
r2 = con.execute(r'''
WITH toks AS (SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') t FROM documents),
sh AS (SELECT doc_id, list_distinct(list_transform(range(1, len(t)-1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) s FROM toks),
ex AS (SELECT doc_id, unnest(s) sg, len(s) sz FROM sh),
pairs AS (SELECT a.doc_id da, b.doc_id db, COUNT(*) common, ANY_VALUE(a.sz) sza, ANY_VALUE(b.sz) szb
          FROM ex a JOIN ex b ON a.sg = b.sg AND a.doc_id < b.doc_id GROUP BY 1,2),
j AS (SELECT da, db, common::DOUBLE/(sza+szb-common) jac FROM pairs)
SELECT MAX(jac), COUNT(CASE WHEN jac>=0.2 THEN 1 END), COUNT(CASE WHEN jac>=0.1 THEN 1 END), COUNT(CASE WHEN jac>=0.05 THEN 1 END), COUNT(*) FROM j''').fetchall()
print('jaccard dist:', r2)
print('docs sf0.1:', duckdb.sql("SELECT COUNT(*) FROM read_parquet('/root/testdata/sf0.1/documents.parquet')").fetchall(),
      duckdb.sql("SELECT COUNT(*) FROM read_parquet('/root/testdata/sf0.1/embeddings.parquet')").fetchall(),
      duckdb.sql("SELECT COUNT(*) FROM read_parquet('/root/testdata/sf0.1/events.parquet')").fetchall())
