#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB oracle compare: for each
query dir in outDir, run the oracle SQL over the sf parquet tables and
compare (sorted columns, sorted rows, exact values)."""
import duckdb, json, sys, glob, os, math

outdir, sfdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
oracle = json.load(open(f"{outdir}/oracle_sql.json"))
qdirs = sorted(d for d in os.listdir(outdir) if os.path.isdir(f"{outdir}/{d}"))
def norm(v):
    if isinstance(v, float):
        # SQL NULL surfaces as NaN in fetchdf; NaN != NaN would flag a
        # both-sides-NULL row as a mismatch
        if math.isnan(v):
            return None
        r = round(v, 9)
        # The driver's compare hashes raw bytes, where -0.0 != +0.0
        # (Python's == treats them equal and would hide the mismatch —
        # this is exactly how the round-6 ceil() hash failure slipped
        # past the local sweep). Tag the sign explicitly.
        if r == 0.0 and math.copysign(1.0, r) < 0:
            return "-0.0"
        return r
    return v
fails = []
for q in qdirs:
    files = glob.glob(f"{outdir}/{q}/*.parquet")
    if not files:
        print(f"{q:25s} NO-OUTPUT"); fails.append(q); continue
    spark_df = con.execute(f"SELECT * FROM '{outdir}/{q}/*.parquet'").fetchdf()
    nrows = len(spark_df)
    if q not in oracle:
        print(f"{q:25s} rows-only rows={nrows} {'OK' if nrows>0 else 'EMPTY!'}")
        if nrows == 0: fails.append(q)
        continue
    try:
        cur = con.execute(oracle[q])
        # The driver hashes raw bytes, so DuckDB result *types* matter:
        # SUM(BIGINT) silently widens to HUGEINT (int128) and mismatches
        # Spark's int64 even on value-identical rows (round-7 failures).
        otypes = {d[0]: str(d[1]) for d in cur.description}
        hug = [c for c, t in otypes.items() if "HUGEINT" in t.upper() or "INT128" in t.upper()]
        oracle_df = cur.fetchdf()
        if hug:
            print(f"{q:25s} ORACLE-TYPE HUGEINT cols={hug} (driver hash WILL fail)"); fails.append(q); continue
    except Exception as e:
        print(f"{q:25s} ORACLE-SQL-ERROR {e}"); fails.append(q); continue
    sc, oc = sorted(spark_df.columns), sorted(oracle_df.columns)
    if sc != oc:
        print(f"{q:25s} SCHEMA-MISMATCH spark={sc} oracle={oc}"); fails.append(q); continue
    a = spark_df[sc].sort_values(sc).reset_index(drop=True)
    b = oracle_df[oc].sort_values(oc).reset_index(drop=True)
    if len(a) != len(b):
        print(f"{q:25s} ROWCOUNT spark={len(a)} oracle={len(b)}"); fails.append(q); continue
    ra = [tuple(norm(v) for v in row) for row in a.itertuples(index=False)]
    rb = [tuple(norm(v) for v in row) for row in b.itertuples(index=False)]
    if ra == rb:
        print(f"{q:25s} MATCH rows={len(a)}")
    else:
        bad = [(i, x, y) for i, (x, y) in enumerate(zip(ra, rb)) if x != y][:3]
        print(f"{q:25s} VALUE-MISMATCH {len([1 for x,y in zip(ra,rb) if x!=y])}/{len(ra)} rows differ; first: {bad}")
        fails.append(q)
print("\nFAILED:", fails if fails else "none")
