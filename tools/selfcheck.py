#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/selfcheck.py <sfDir> <verifyOutDir> [--exact]

Reads each <verifyOutDir>/<name>/ parquet (Spark output), runs the matching
oracle SQL from <verifyOutDir>/oracle_sql.json in DuckDB against the sfDir
tables, and compares: column names (sorted), row count, and values (rows
sorted by all columns).

Default mode rounds floats to 9 dp before comparing (near-miss triage).
--exact performs NO float normalization and additionally md5-hashes the
canonicalized rows (columns sorted by name, rows sorted, values repr'd)
on both sides, approximating the driver's hash gate: a PASS here still
only certifies THIS DuckDB build — the authoritative numbers are the
driver's CORRECTNESS_r{N}.json, and round-close claims must quote that
file, never this tool's output.
"""
import hashlib, json, sys, glob, os
import duckdb

args = [a for a in sys.argv[1:] if not a.startswith("--")]
EXACT = "--exact" in sys.argv
sf_dir, out_dir = args[0], args[1]

print(f"duckdb={duckdb.__version__} mode={'exact' if EXACT else 'approx(round 9dp)'}")

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    # <t>.parquet may be a single file OR a Spark-written directory of part
    # files (the ScaleBench blow-up corpora) — glob the parts in that case
    p = f"{sf_dir}/{t}.parquet"
    if os.path.isdir(p):
        p = f"{p}/*.parquet"
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

oracles = json.load(open(f"{out_dir}/oracle_sql.json"))

def norm(v):
    # NaN compares unequal to itself, but the driver's hash canonicalizes
    # via repr ('nan' == 'nan') — mirror that so an intentionally-NaN cell
    # (ieee-specials corpus) doesn't false-fail the local gate
    if isinstance(v, float) and v != v:
        return "__nan__"
    if not EXACT and isinstance(v, float):
        return round(v, 9)
    return v

def rows_of(cols, rows):
    # sort columns by name, then rows
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(out, key=lambda r: tuple((x is None, str(x)) for x in r))

def row_hash(rows):
    h = hashlib.md5()
    for r in rows:
        h.update(("\x1f".join(repr(x) for x in r) + "\x1e").encode())
    return h.hexdigest()

n_pass = n_fail = n_skip = 0
fails = []
for name in sorted(os.listdir(out_dir)):
    d = os.path.join(out_dir, name)
    if not os.path.isdir(d):
        continue
    files = glob.glob(f"{d}/*.parquet")
    if not files:
        print(f"MISSING-OUTPUT {name}")
        n_fail += 1; fails.append(name)
        continue
    spark_rel = con.execute(f"SELECT * FROM read_parquet('{d}/*.parquet')")
    s_cols = [c[0] for c in spark_rel.description]
    s_rows = spark_rel.fetchall()
    if name not in oracles:
        print(f"ROWS-ONLY {name}: {len(s_rows)} rows {'OK' if len(s_rows)>0 else 'EMPTY!'}")
        n_skip += 1
        continue
    try:
        o_rel = con.execute(oracles[name])
        o_cols = [c[0] for c in o_rel.description]
        o_rows = o_rel.fetchall()
        # Type-surface check: a HUGEINT/DECIMAL oracle column compares
        # equal to Spark's BIGINT here (python ints), but the DRIVER's
        # hash canonicalization can differ per DuckDB build — exactly
        # the r10 t_bpe_train red (uncast sum). Flag them so the class
        # of bug is visible locally even though values match.
        try:
            desc = con.execute(f"DESCRIBE {oracles[name]}").fetchall()
            for cname, ctype, *_ in desc:
                if any(t in str(ctype).upper()
                       for t in ("HUGEINT", "DECIMAL", "INT128", "UHUGEINT")):
                    print(f"WARN-TYPE {name}.{cname}: oracle returns {ctype} "
                          f"— CAST it (BIGINT/DOUBLE) per ORACLES.md")
        except Exception:
            pass
    except Exception as e:
        print(f"ORACLE-ERROR {name}: {e}")
        n_fail += 1; fails.append(name)
        continue
    sc, sr = rows_of(s_cols, s_rows)
    oc, orr = rows_of(o_cols, o_rows)
    if sc != oc:
        print(f"FAIL-COLS {name}: spark={sc} oracle={oc}")
        n_fail += 1; fails.append(name); continue
    if len(sr) != len(orr):
        print(f"FAIL-COUNT {name}: spark={len(sr)} oracle={len(orr)}")
        n_fail += 1; fails.append(name); continue
    if sr == orr:
        suffix = f" hash={row_hash(sr)[:12]}" if EXACT else ""
        print(f"PASS {name} ({len(sr)} rows){suffix}")
        n_pass += 1
    else:
        # find first diff
        diffs = [(a, b) for a, b in zip(sr, orr) if a != b][:3]
        print(f"FAIL-VALUES {name}: first diffs {diffs}")
        n_fail += 1; fails.append(name)

print(f"\n== {n_pass} pass, {n_fail} fail, {n_skip} rows-only == (duckdb {duckdb.__version__})")
if fails:
    print("failed:", " ".join(fails))
    sys.exit(1)
