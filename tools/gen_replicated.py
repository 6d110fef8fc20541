#!/usr/bin/env python
"""Build a K×-replicated fixture family from a base sf dir (scaling probes).

Same recipe as round 7's /tmp/sfx2 & /tmp/sfx4 (SCALE.md "Replication
scaling probe"):

- dims (region/nation/customer/supplier/part) copied as-is;
- orders & lineitem replicated with a SHARED o_orderkey offset per
  replica (k * base_order_rows) so the order/lineitem join stays
  referentially intact; customer/part/supplier FKs untouched, so fact
  fan-out per dim key grows K× — the skew shape a 100 TB fact table has;
- events replicated with event_id offsets, ts untouched (every timestamp
  appears K× — a duplicate-ts tie probe for windows/asof);
- documents replicated with doc_id offsets and a replica-unique token
  appended to text (keeps exact-dedup semantics realistic: replicas are
  NOT exact duplicates); n_chars recomputed to preserve the generator
  invariant n_chars == len(text);
- embeddings replicated with vec_id offsets, vectors untouched
  (replica-identical vectors => K-way cosine ties).

Deterministic (pure arithmetic, no RNG).  Output keeps each table's
original arrow schema.

Usage: python tools/gen_replicated.py K [base_sf_dir] [out_dir]
       e.g.  python tools/gen_replicated.py 8 /root/testdata/sf0.1 /tmp/sfx8
"""
import os
import sys

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

K = int(sys.argv[1]) if len(sys.argv) > 1 else 8
BASE = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
OUT = sys.argv[3] if len(sys.argv) > 3 else f"/tmp/sfx{K}"

DIMS = ["region", "nation", "customer", "supplier", "part"]
FACTS = ["orders", "lineitem", "events", "documents", "embeddings"]


def main():
    os.makedirs(OUT, exist_ok=True)
    n_orders = pq.read_metadata(
        os.path.join(BASE, "orders.parquet")).num_rows
    for name in DIMS + FACTS:
        src = os.path.join(BASE, f"{name}.parquet")
        schema = pq.read_schema(src)
        df = pd.read_parquet(src)
        if name in DIMS:
            out = df
        else:
            reps = []
            for k in range(K):
                r = df.copy()
                if name == "orders":
                    r["o_orderkey"] = r.o_orderkey + k * n_orders
                elif name == "lineitem":
                    r["l_orderkey"] = r.l_orderkey + k * n_orders
                elif name == "events":
                    r["event_id"] = r.event_id + k * len(df)
                elif name == "documents":
                    r["doc_id"] = r.doc_id + k * len(df)
                    if k > 0:
                        r["text"] = r.text + f" replicatoken{k}"
                        r["n_chars"] = r.text.str.len()
                elif name == "embeddings":
                    r["vec_id"] = r.vec_id + k * len(df)
                reps.append(r)
            out = pd.concat(reps, ignore_index=True)
        tbl = pa.Table.from_pandas(out, schema=schema, preserve_index=False)
        pq.write_table(tbl, os.path.join(OUT, f"{name}.parquet"))
        print(f"  {name}: {len(out)} rows")
    print(f"{K}x fixtures written to {OUT}")


if __name__ == "__main__":
    main()
