"""Driver-contract simulation: what the verify harness does each round.

Fresh process → import __spark_entry__ → entry(spark) smoke → run every
queries()[name] at sf0.01 → run oracle_sql()[name] in DuckDB on the same
parquet views → order-insensitive value-hash compare.
"""
import hashlib, math, datetime, sys
from decimal import Decimal
sys.path.insert(0, "/root/repo")
import duckdb
import __spark_entry__ as e
from mapreduce_google_spark.session import get_spark

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
spark = get_spark(app_name="driver-sim", master="local[8]", shuffle_partitions=8)

# 1. smoke: entry()
df = e.entry(spark)
rows = df.collect()
print(f"SMOKE entry(): {len(rows)} rows, schema={df.schema.simpleString()}")
assert len(rows) >= 0

# 2. oracle harness
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

def norm(v):
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else f"{round(v,6):.6f}"
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    return str(v)

def valhash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(norm(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines: h.update(ln.encode()); h.update(b"\n")
    return h.hexdigest()[:16]

qs, oracles = e.queries(), e.oracle_sql()
fails = 0
for name in sorted(qs):
    sdf = qs[name](spark, SF)
    srows = [tuple(r) for r in sdf.collect()]
    scols = sdf.columns
    if name not in oracles:
        print(f"ROWS-ONLY {name}: {len(srows)} rows"); continue
    rel = con.execute(oracles[name])
    dcols = [d[0] for d in rel.description]; drows = rel.fetchall()
    ok_n = len(srows) == len(drows)
    ok_c = sorted(scols) == sorted(dcols)
    ok_h = valhash(scols, srows) == valhash(dcols, drows)
    status = "OK" if (ok_n and ok_c and ok_h) else "MISMATCH"
    if status != "OK": fails += 1
    print(f"{status} {name}: rows {len(srows)}/{len(drows)} cols={ok_c} hash={ok_h}")
print("FAILURES:", fails)
spark.stop()
sys.exit(1 if fails else 0)
