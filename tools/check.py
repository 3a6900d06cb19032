#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate.

Reads Verify output (outDir/<name>/ parquet + oracle_sql.json), runs each
oracle SQL in DuckDB over the testdata parquet, and compares row count,
sorted-by-column-name schema, and a value hash (rows sorted, cells
canonicalized). Not shipped library code — dev tooling only.
"""
import sys, json, glob, math, hashlib
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

def main(sf_dir, out_dir):
    # Stamp the oracle environment: cross-version DuckDB drift (HUGEINT
    # conversion, bin() width, tie orders) is only diagnosable from the
    # artifact if the version that produced it is recorded.
    print(f"oracle_env: duckdb={duckdb.__version__}")
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    for d in sorted(glob.glob(f"{out_dir}/*/")):
        name = d.rstrip("/").split("/")[-1]
        files = glob.glob(f"{d}/*.parquet")
        if not files:
            results[name] = "NO_SPARK_OUTPUT"; continue
        sdf = con.execute(f"SELECT * FROM read_parquet('{d}/*.parquet')")
        scols = [c[0] for c in sdf.description]
        srows = sdf.fetchall()
        if name not in oracle:
            results[name] = f"ROWS_ONLY({len(srows)})"
            continue
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
                results[name] = f"ORACLE_FRAGILE_TYPE {fragile} (cast to BIGINT)"
                continue
            odf = con.execute(oracle[name])
            ocols = [c[0] for c in odf.description]
            orows = odf.fetchall()
        except Exception as e:
            results[name] = f"ORACLE_SQL_ERROR: {e}"; continue
        stypes = dict(zip(scols, [str(t) for t in [c[1] for c in sdf.description]]))
        otypes = dict(zip(ocols, [str(t) for t in [c[1] for c in odf.description]]))
        tdiff = {c: (stypes.get(c), otypes.get(c)) for c in set(scols) | set(ocols)
                 if stypes.get(c) != otypes.get(c)}
        if sorted(scols) != sorted(ocols):
            results[name] = f"SCHEMA_MISMATCH spark={sorted(scols)} oracle={sorted(ocols)}"
        elif tdiff:
            results[name] = f"TYPE_MISMATCH {tdiff}"
        elif len(srows) != len(orows):
            results[name] = f"ROWCOUNT spark={len(srows)} oracle={len(orows)}"
        else:
            hs, ho = table_hash(scols, srows), table_hash(ocols, orows)
            results[name] = "OK" if hs == ho else f"HASH_MISMATCH {hs} vs {ho}"
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
