#!/usr/bin/env python3
"""Dev tool (driver-side, not shipped code): replicate the sf0.1 corpus
~10x with shifted keys into a scratch dir, so shuffle/spill behavior can
be exercised at sf~1 even though the driver only generates up to sf0.1.

Usage: python3 tools/make_bigdata.py /root/testdata/sf0.1 /tmp/sfbig 10
"""
import sys, os, shutil
import duckdb

src, dst, k = sys.argv[1], sys.argv[2], int(sys.argv[3])
os.makedirs(dst, exist_ok=True)
con = duckdb.connect()

# key-shifted replication: each copy offsets ids so group cardinalities
# scale with data volume (plain duplication would only deepen groups)
# per-table: column -> replacement expression ({o} = copy index).
# ts: duckdb reads the source TIMESTAMP(NANOS) as us, so re-emit as ns
# BIGINT — Spark's nanosAsLong read path treats that identically.
SCALED = {
    # p_name gets a per-copy 3-char tag: pairwise tag distance is 3, above
    # q_editdist_*'s maxDist=2, so copies of one name are NOT near-dups of
    # each other — pair density scales linearly with volume instead of
    # exploding quadratically inside copy groups (which would swamp the
    # bucket-vs-segment comparison with identical verify work)
    "part": {"p_partkey": "p_partkey + {o} * 10000000",
             "p_name": "p_name || ' ' || repeat(chr(97 + {o}), 3)"},
    "lineitem": {"l_orderkey": "l_orderkey + {o} * 10000000"},
    "orders":   {"o_orderkey": "o_orderkey + {o} * 10000000"},
    "events":   {"event_id": "event_id + {o} * 10000000",
                 "user_id": "user_id + {o} * 100000",
                 "ts": "epoch_ns(ts)"},
    "documents": {"doc_id": "doc_id + {o} * 10000000"},
    "embeddings": {"vec_id": "vec_id + {o} * 10000000"},
}

for name in ["region","nation","customer","supplier","part","orders",
             "lineitem","events","documents","embeddings"]:
    sp, dp = f"{src}/{name}.parquet", f"{dst}/{name}.parquet"
    if not os.path.exists(sp):
        continue
    if name not in SCALED:
        shutil.copyfile(sp, dp)
        continue
    cols = [r[0] for r in con.execute(
        f"DESCRIBE SELECT * FROM read_parquet('{sp}')").fetchall()]
    shifted = SCALED[name]
    parts = []
    for o in range(k):
        sel = ", ".join(
            (shifted[c].format(o=o) + f" AS {c}") if c in shifted else c
            for c in cols)
        parts.append(f"SELECT {sel} FROM read_parquet('{sp}')")
    con.execute(f"COPY ({' UNION ALL '.join(parts)}) TO '{dp}' (FORMAT PARQUET)")
    n = con.execute(f"SELECT count(*) FROM read_parquet('{dp}')").fetchone()[0]
    print(f"{name}: {n} rows")
print("done ->", dst)
