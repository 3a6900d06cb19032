#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate.

Reads Verify output (outDir/<name>/ parquet + oracle_sql.json), runs each
oracle SQL in DuckDB over the testdata parquet, and compares row count,
sorted-by-column-name schema, and a value hash (rows sorted, cells
canonicalized). Not shipped library code — dev tooling only.

Oracle checks fan out over a process pool (each worker owns an
independent DuckDB connection with its own table views): the sf0.1 leg
was ~35 min single-process, and the 283 oracles are embarrassingly
parallel. Worker DuckDB threads are capped so N workers don't
oversubscribe the host.
"""
import sys, os, json, glob, math, hashlib
import multiprocessing as mp
import duckdb

def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(round(v, 9))
    if isinstance(v, bool):
        return str(int(v))
    return str(v)

def table_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    canon_rows = sorted("\x1f".join(canon(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for r in canon_rows:
        h.update(r.encode())
        h.update(b"\x1e")
    return h.hexdigest()[:16]

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

_worker_con = None
_worker_oracle = None

def _init_worker(sf_dir, oracle):
    global _worker_con, _worker_oracle
    _worker_con = duckdb.connect()
    # each worker is one of N parallel processes — cap its threads so
    # the pool doesn't run N × host-width threads
    _worker_con.execute("SET threads=2")
    for t in TABLES:
        _worker_con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    _worker_oracle = oracle

def check_one(d):
    """One query's compare: (name, verdict string)."""
    con, oracle = _worker_con, _worker_oracle
    name = d.rstrip("/").split("/")[-1]
    files = glob.glob(f"{d}/*.parquet")
    if not files:
        return name, "NO_SPARK_OUTPUT"
    sdf = con.execute(f"SELECT * FROM read_parquet('{d}/*.parquet')")
    scols = [c[0] for c in sdf.description]
    srows = sdf.fetchall()
    if name not in oracle:
        return name, f"ROWS_ONLY({len(srows)})"
    try:
        # rel.types exposes DuckDB's logical types, which the DB-API
        # description collapses (HUGEINT and BIGINT are both NUMBER).
        # sum(BIGINT) is HUGEINT in DuckDB, and HUGEINT's conversion
        # to pandas/arrow changed across DuckDB versions — an oracle
        # output column of that type hash-diverges on any grader
        # whose DuckDB differs from ours, so flag it as an error.
        rel = con.sql(f"SELECT * FROM ({oracle[name]}) LIMIT 0")
        fragile = [c for c, t in zip(rel.columns, rel.types)
                   if str(t) in ("HUGEINT", "UHUGEINT")]
        if fragile:
            return name, f"ORACLE_FRAGILE_TYPE {fragile} (cast to BIGINT)"
        odf = con.execute(oracle[name])
        ocols = [c[0] for c in odf.description]
        orows = odf.fetchall()
    except Exception as e:
        return name, f"ORACLE_SQL_ERROR: {e}"
    stypes = dict(zip(scols, [str(t) for t in [c[1] for c in sdf.description]]))
    otypes = dict(zip(ocols, [str(t) for t in [c[1] for c in odf.description]]))
    tdiff = {c: (stypes.get(c), otypes.get(c)) for c in set(scols) | set(ocols)
             if stypes.get(c) != otypes.get(c)}
    if sorted(scols) != sorted(ocols):
        return name, f"SCHEMA_MISMATCH spark={sorted(scols)} oracle={sorted(ocols)}"
    if tdiff:
        return name, f"TYPE_MISMATCH {tdiff}"
    if len(srows) != len(orows):
        return name, f"ROWCOUNT spark={len(srows)} oracle={len(orows)}"
    hs, ho = table_hash(scols, srows), table_hash(ocols, orows)
    return name, ("OK" if hs == ho else f"HASH_MISMATCH {hs} vs {ho}")

def main(sf_dir, out_dir):
    # Stamp the oracle environment: cross-version DuckDB drift (HUGEINT
    # conversion, bin() width, tie orders) is only diagnosable from the
    # artifact if the version that produced it is recorded.
    print(f"oracle_env: duckdb={duckdb.__version__}")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    dirs = sorted(glob.glob(f"{out_dir}/*/"))
    workers = min(16, os.cpu_count() or 4, max(1, len(dirs)))
    # fork start method keeps the oracle dict shared copy-on-write;
    # maxtasksperchild bounds any DuckDB memory creep on the long leg
    with mp.Pool(workers, initializer=_init_worker,
                 initargs=(sf_dir, oracle), maxtasksperchild=64) as pool:
        results = dict(pool.imap_unordered(check_one, dirs))
    bad = 0
    for k in sorted(results):
        flag = "PASS" if results[k] == "OK" or results[k].startswith("ROWS_ONLY") else "FAIL"
        if flag == "FAIL":
            bad += 1
        print(f"{flag:4} {k:24} {results[k]}")
    print(f"\n{len(results)-bad}/{len(results)} pass")
    return 1 if bad else 0

if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"
    sys.exit(main(sf, out))
