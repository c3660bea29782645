#!/usr/bin/env python3
"""Local t2 parity check: compare Verify parquet output vs DuckDB oracle.

Mimics the driver: load oracle_sql.json, run each SQL in DuckDB over the
base parquet tables, load our parquet result, sort columns by name, sort
rows, compare values.

Usage: parity.py [SF_DIR] [VERIFY_OUT] [name,name,...] [--emit=FILE]

--emit=FILE writes the per-query outcome in the driver's CORRECTNESS
schema ({name: {rows_match, schema_match, hash_match, spark_rows,
oracle_rows, err}}) — the builder-side redundancy for the round record
(round 11's driver file arrived empty; this one is committed with the
round so the correctness signal can never go missing again). The emit
also carries a _meta entry with per-oracle DuckDB seconds so the slow
scratch-rebuild oracles stay profiled.
"""
import sys, json, glob, time
import duckdb, pandas as pd

args = [a for a in sys.argv[1:] if not a.startswith('--')]
emit = next((a.split('=', 1)[1] for a in sys.argv[1:]
             if a.startswith('--emit=')), None)
sf = args[0] if len(args) > 0 else '/root/testdata/sf0.01'
out = args[1] if len(args) > 1 else '/tmp/verify_out'

con = duckdb.connect()
for p in glob.glob(f'{sf}/*.parquet'):
    t = p.split('/')[-1].replace('.parquet', '')
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

# Preflight: the engine's decoded view of the fixtures (written by Verify)
# must agree with DuckDB's native read BEFORE any query comparison — a
# fixture-schema drift (e.g. the r7 events ts-unit flip) then fails here
# with one explicit message instead of dozens of opaque hash mismatches.
import os
meta_path = f'{out}/_fixture_meta.json'
if os.path.exists(meta_path):
    meta = json.load(open(meta_path))
    problems = []
    for t, n in meta['counts'].items():
        dn = con.execute(f'SELECT COUNT(*) FROM {t}').fetchone()[0]
        if dn != n:
            problems.append(f'{t}: engine={n} rows, oracle={dn} rows')
    lo, hi = con.execute(
        'SELECT epoch_us(min(ts)::TIMESTAMP), epoch_us(max(ts)::TIMESTAMP) FROM events').fetchone()
    if (lo, hi) != (meta['events_ts_min_us'], meta['events_ts_max_us']):
        problems.append(
            f"events ts range (epoch us): engine=[{meta['events_ts_min_us']}, "
            f"{meta['events_ts_max_us']}], oracle=[{lo}, {hi}] — likely ts-unit drift")
    if problems:
        print('PREFLIGHT FAIL — engine and oracle disagree on the fixtures themselves:')
        for p in problems:
            print(f'  {p}')
        sys.exit(2)
    print('preflight: engine and oracle agree on fixture counts and events ts range')

oracle = json.load(open(f'{out}/oracle_sql.json'))
if len(args) > 2:  # optional comma-separated subset of query names
    keep = set(args[2].split(','))
    oracle = {k: v for k, v in oracle.items() if k in keep}
fails = []
record = {}   # driver CORRECTNESS schema, per query
timing = {}   # oracle DuckDB seconds, per query
for name, sql in sorted(oracle.items()):
    # match fields start as None = NOT CHECKED (ADVICE r12): a consumer
    # of the emitted record can distinguish "schema check short-circuited
    # the row compare" from "rows actually mismatched"; err carries a
    # reason string for EVERY failure class, not just DuckDB/hash ones
    rec = {'rows_match': None, 'schema_match': None, 'hash_match': None,
           'spark_rows': None, 'oracle_rows': None, 'err': None}
    record[name] = rec
    t0 = time.monotonic()
    try:
        exp = con.execute(sql).fetchdf()
    except Exception as e:
        rec['err'] = f'duckdb error: {e}'
        print(f'FAIL {name}: duckdb error: {e}')
        fails.append(name); continue
    finally:
        timing[name] = round(time.monotonic() - t0, 3)
    try:
        got = pd.concat([pd.read_parquet(f) for f in sorted(glob.glob(f'{out}/{name}/*.parquet'))])
    except Exception as e:
        rec['err'] = f'missing spark output: {e}'
        print(f'FAIL {name}: missing spark output: {e}')
        fails.append(name); continue
    rec['spark_rows'], rec['oracle_rows'] = len(got), len(exp)
    exp = exp[sorted(exp.columns)].reset_index(drop=True)
    got = got[sorted(got.columns)].reset_index(drop=True)
    exp = exp.sort_values(list(exp.columns)).reset_index(drop=True)
    got = got.sort_values(list(got.columns)) .reset_index(drop=True)
    rec['schema_match'] = list(exp.columns) == list(got.columns)
    if not rec['schema_match']:
        rec['err'] = f'schema mismatch: oracle={list(exp.columns)} spark={list(got.columns)}'
        print(f'FAIL {name}: columns exp={list(exp.columns)} got={list(got.columns)}')
        fails.append(name); continue
    rec['rows_match'] = len(exp) == len(got)
    if not rec['rows_match']:
        rec['err'] = f'row count mismatch: oracle={len(exp)} spark={len(got)}'
        print(f'FAIL {name}: rows exp={len(exp)} got={len(got)}')
        fails.append(name); continue
    # value-level compare, exact (hash-style)
    mismatch = None
    for c in exp.columns:
        ev, gv = exp[c].tolist(), got[c].tolist()
        ev = [str(x) for x in ev]; gv = [str(x) for x in gv]
        if ev != gv:
            bad = next(i for i in range(len(ev)) if ev[i] != gv[i])
            mismatch = (c, bad, ev[bad], gv[bad]); break
    if mismatch:
        c, i, e, g = mismatch
        rec['hash_match'] = False
        rec['err'] = f'hash mismatch: col {c} row {i}: oracle={e} spark={g}'
        print(f'FAIL {name}: col {c} row {i}: oracle={e} spark={g}')
        fails.append(name)
    else:
        rec['hash_match'] = True
        print(f'OK   {name} ({len(exp)} rows)')
slow = sorted(timing.items(), key=lambda kv: -kv[1])[:5]
print('\nslowest oracles (DuckDB sec): ' +
      ', '.join(f'{n}={s}' for n, s in slow))
print(f'{len(oracle)-len(fails)}/{len(oracle)} pass')
if emit:
    payload = dict(record)
    payload['_meta'] = {'sf_dir': sf, 'verify_out': out,
                        'oracle_sec': timing,
                        'passed': len(oracle) - len(fails),
                        'total': len(oracle)}
    with open(emit, 'w') as f:
        json.dump(payload, f, indent=1, sort_keys=True)
    print(f'emitted {emit}')
sys.exit(1 if fails else 0)
