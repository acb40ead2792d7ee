"""Local scale-factor generator for the driver's synthetic schema.

The driver ships read-only parquet at sf0.001/0.01/0.1
(``/root/testdata``, TESTDATA.md). Scale-validation (VERDICT r04 item 2)
needs sf1.0: this script regenerates the same ten-table schema at an
arbitrary scale factor, with value distributions matched to the driver
data (measured on sf0.1: vocab, key ranges, enum sets, per-order line
counts, event time span). It is NOT bit-identical to the driver
generator (seed/stream unknown) — it exists for *scaling* measurements,
where only shape and cardinality matter, never for oracle correctness
(the driver's own sf0.01 remains the correctness substrate).

Output goes under the repo (gitignored), e.g.::

    python tools/gen_testdata.py --sf 1.0 --out .localdata/sf1.0

Differences vs driver data, by design:
- multiple parquet row groups per file (the driver's single-row-group
  files under-split scans — the very artifact ``widen_small_scan``
  works around; at sf1.0 we want honest split behavior);
- embeddings scale linearly with sf (the driver's 500→2000 step from
  sf0.01→0.1 is 4x, not 10x; linear keeps ANN cost claims honest).
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

# Measured on /root/testdata/sf0.1 (see VERDICT r04 / this file's header).
VOCAB = (
    "a agg batch big column customer data dup fast filter group hash join "
    "key line merge order part query row scan slow small sort spark stream "
    "table the value vector window"
).split()
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
EVENT_TYPES = ["signup", "purchase", "view", "click", "error"]
LANGS = ["en", "zh", "es", "fr", "de"]
LANG_W = [0.41, 0.15, 0.15, 0.15, 0.14]
PART_ADJ = ["large", "hot", "blue", "red", "small", "dim", "pale", "spry"]
PART_NOUN = ["ring", "bolt", "cog", "gear", "pin", "rod", "cap", "nut"]
PART_TYPES = ["LARGE", "ECONOMY", "SMALL", "STANDARD", "MEDIUM", "PROMO"]
REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]

DAY_US = 86_400_000_000
T0_EVENTS = np.datetime64("2024-01-01", "us").astype("int64")
T0_ORDERS = np.datetime64("1995-01-01", "us").astype("int64")
ORDER_SPAN_DAYS = 2404  # 1995-01-01 .. 2001-08-01


def counts_for(sf: float) -> dict[str, int]:
    return {
        "region": 5,
        "nation": 25,
        "customer": int(150_000 * sf),
        "supplier": int(10_000 * sf),
        "part": int(200_000 * sf),
        "orders": int(1_500_000 * sf),
        "events": int(1_000_000 * sf),
        "users": int(15_000 * sf),
        "documents": int(50_000 * sf),
        "embeddings": int(20_000 * sf),
    }


def _write(path: str, table: pa.Table, row_group_rows: int) -> None:
    pq.write_table(table, path, row_group_size=row_group_rows)


def _ts_us(int_us: np.ndarray) -> pa.Array:
    return pa.array(int_us, type=pa.timestamp("us"))


def gen(sf: float, out: str, seed: int = 42) -> None:
    n = counts_for(sf)
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(seed)

    _write(
        f"{out}/region.parquet",
        pa.table(
            {
                "r_regionkey": pa.array(range(5), pa.int32()),
                "r_name": REGIONS,
            }
        ),
        5,
    )
    _write(
        f"{out}/nation.parquet",
        pa.table(
            {
                "n_nationkey": pa.array(range(25), pa.int32()),
                "n_name": [f"NATION_{i}" for i in range(25)],
                "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
            }
        ),
        25,
    )

    nc = n["customer"]
    _write(
        f"{out}/customer.parquet",
        pa.table(
            {
                "c_custkey": np.arange(nc, dtype=np.int64),
                "c_name": [f"Customer#{i:09d}" for i in range(nc)],
                "c_nationkey": pa.array(
                    rng.integers(0, 25, nc, dtype=np.int32), pa.int32()
                ),
                "c_acctbal": np.round(rng.uniform(-1000.0, 10_000.0, nc), 2),
                "c_mktsegment": np.array(SEGMENTS)[rng.integers(0, 5, nc)],
            }
        ),
        max(nc, 1),
    )

    ns = n["supplier"]
    _write(
        f"{out}/supplier.parquet",
        pa.table(
            {
                "s_suppkey": np.arange(ns, dtype=np.int64),
                "s_name": [f"Supplier#{i:09d}" for i in range(ns)],
                "s_nationkey": pa.array(
                    rng.integers(0, 25, ns, dtype=np.int32), pa.int32()
                ),
                "s_acctbal": np.round(rng.uniform(-1000.0, 10_000.0, ns), 2),
            }
        ),
        max(ns, 1),
    )

    npart = n["part"]
    adj = np.array(PART_ADJ)[rng.integers(0, len(PART_ADJ), npart)]
    noun = np.array(PART_NOUN)[rng.integers(0, len(PART_NOUN), npart)]
    _write(
        f"{out}/part.parquet",
        pa.table(
            {
                "p_partkey": np.arange(npart, dtype=np.int64),
                "p_name": np.char.add(np.char.add(adj, " "), noun),
                "p_brand": np.array(
                    [f"Brand#{b}" for b in range(25)]
                )[rng.integers(0, 25, npart)],
                "p_type": np.array(PART_TYPES)[rng.integers(0, 6, npart)],
                "p_size": pa.array(
                    rng.integers(1, 51, npart, dtype=np.int32), pa.int32()
                ),
                "p_retailprice": np.round(rng.uniform(900.0, 1000.0, npart), 2),
            }
        ),
        min(max(npart, 1), 131072),
    )

    # orders + lineitem, chunked (sf1.0 = 1.5M orders / ~6.1M lineitem)
    no = n["orders"]
    chunk = 250_000
    o_schema = pa.schema(
        [
            ("o_orderkey", pa.int64()),
            ("o_custkey", pa.int64()),
            ("o_orderstatus", pa.string()),
            ("o_totalprice", pa.float64()),
            ("o_orderdate", pa.timestamp("us")),
            ("o_orderpriority", pa.string()),
        ]
    )
    l_schema = pa.schema(
        [
            ("l_orderkey", pa.int64()),
            ("l_partkey", pa.int64()),
            ("l_suppkey", pa.int64()),
            ("l_linenumber", pa.int32()),
            ("l_quantity", pa.float64()),
            ("l_extendedprice", pa.float64()),
            ("l_discount", pa.float64()),
            ("l_tax", pa.float64()),
            ("l_returnflag", pa.string()),
            ("l_linestatus", pa.string()),
            ("l_shipdate", pa.timestamp("us")),
        ]
    )
    with (
        pq.ParquetWriter(f"{out}/orders.parquet", o_schema) as ow,
        pq.ParquetWriter(f"{out}/lineitem.parquet", l_schema) as lw,
    ):
        for lo in range(0, no, chunk):
            hi = min(lo + chunk, no)
            m = hi - lo
            okey = np.arange(lo, hi, dtype=np.int64)
            odate_day = rng.integers(0, ORDER_SPAN_DAYS + 1, m)
            odate = T0_ORDERS + odate_day * DAY_US
            ow.write_table(
                pa.table(
                    {
                        "o_orderkey": okey,
                        "o_custkey": rng.integers(
                            0, max(nc, 1), m, dtype=np.int64
                        ),
                        "o_orderstatus": np.array(["O", "F", "P"])[
                            rng.choice(3, m, p=[0.48, 0.48, 0.04])
                        ],
                        "o_totalprice": np.round(
                            rng.uniform(1000.0, 500_000.0, m), 2
                        ),
                        "o_orderdate": _ts_us(odate),
                        "o_orderpriority": np.array(PRIORITIES)[
                            rng.integers(0, 5, m)
                        ],
                    },
                    schema=o_schema,
                ),
                row_group_size=chunk,
            )
            # 1..7 lines per order, mean ~4 (matches sf0.1's 4.08)
            nlines = rng.integers(1, 8, m)
            li_okey = np.repeat(okey, nlines)
            li_odate = np.repeat(odate, nlines)
            k = li_okey.shape[0]
            linenum = (
                np.arange(k) - np.repeat(np.cumsum(nlines) - nlines, nlines) + 1
            )
            qty = rng.integers(1, 51, k).astype(np.float64)
            lw.write_table(
                pa.table(
                    {
                        "l_orderkey": li_okey,
                        "l_partkey": rng.integers(
                            0, max(npart, 1), k, dtype=np.int64
                        ),
                        "l_suppkey": rng.integers(
                            0, max(ns, 1), k, dtype=np.int64
                        ),
                        "l_linenumber": pa.array(
                            linenum.astype(np.int32), pa.int32()
                        ),
                        "l_quantity": qty,
                        "l_extendedprice": np.round(
                            qty * rng.uniform(900.0, 2100.0, k), 2
                        ),
                        "l_discount": rng.integers(0, 11, k) / 100.0,
                        "l_tax": rng.integers(0, 9, k) / 100.0,
                        "l_returnflag": np.array(["R", "A", "N"])[
                            rng.integers(0, 3, k)
                        ],
                        "l_linestatus": np.array(["F", "O"])[
                            rng.integers(0, 2, k)
                        ],
                        "l_shipdate": _ts_us(
                            li_odate
                            + rng.integers(1, 96, k) * DAY_US
                        ),
                    },
                    schema=l_schema,
                ),
                row_group_size=chunk,
            )

    ne, nu = n["events"], n["users"]
    e_schema = pa.schema(
        [
            ("event_id", pa.int64()),
            ("ts", pa.timestamp("us")),
            ("user_id", pa.int64()),
            ("event_type", pa.string()),
            ("value", pa.float64()),
            ("props", pa.string()),
        ]
    )
    with pq.ParquetWriter(f"{out}/events.parquet", e_schema) as ew:
        for lo in range(0, ne, chunk):
            hi = min(lo + chunk, ne)
            m = hi - lo
            ks = rng.integers(0, 100, m)
            ew.write_table(
                pa.table(
                    {
                        "event_id": np.arange(lo, hi, dtype=np.int64),
                        "ts": _ts_us(
                            T0_EVENTS
                            + rng.integers(0, 30 * DAY_US, m)
                        ),
                        "user_id": rng.integers(0, max(nu, 1), m, dtype=np.int64),
                        "event_type": np.array(EVENT_TYPES)[
                            rng.integers(0, 5, m)
                        ],
                        "value": np.round(
                            np.minimum(rng.exponential(50.0, m), 600.0), 2
                        ),
                        "props": np.array([f'{{"k": {k}}}' for k in ks]),
                    },
                    schema=e_schema,
                ),
                row_group_size=chunk,
            )

    # documents: ~51 words each from the 31-word vocab; plant exact dups
    # (~0.2%) and near-dups (~0.5%, one word changed) so the dedup
    # family finds real work at every sf.
    nd = n["documents"]
    d_schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("text", pa.string()),
            ("lang", pa.string()),
            ("source", pa.string()),
            ("n_chars", pa.int64()),
        ]
    )
    vocab = np.array(VOCAB)
    with pq.ParquetWriter(f"{out}/documents.parquet", d_schema) as dw:
        for lo in range(0, nd, 100_000):
            hi = min(lo + 100_000, nd)
            m = hi - lo
            lens = rng.integers(8, 96, m)
            texts = [
                " ".join(vocab[rng.integers(0, len(vocab), ln)])
                for ln in lens
            ]
            for i in range(m):
                r = rng.random()
                if i > 0 and r < 0.002:
                    texts[i] = texts[i - 1]  # exact dup
                elif i > 0 and r < 0.007:  # near dup: mutate one word
                    w = texts[i - 1].split()
                    w[int(rng.integers(0, len(w)))] = str(
                        vocab[int(rng.integers(0, len(vocab)))]
                    )
                    texts[i] = " ".join(w)
            dw.write_table(
                pa.table(
                    {
                        "doc_id": np.arange(lo, hi, dtype=np.int64),
                        "text": texts,
                        "lang": np.array(LANGS)[rng.choice(5, m, p=LANG_W)],
                        "source": np.array(
                            [f"src{s}" for s in range(20)]
                        )[rng.integers(0, 20, m)],
                        "n_chars": np.array(
                            [len(t) for t in texts], dtype=np.int64
                        ),
                    },
                    schema=d_schema,
                ),
                row_group_size=100_000,
            )

    # embeddings: 10 planted clusters in 64-d (matches driver layout)
    nv = n["embeddings"]
    centers = rng.normal(0, 1, (10, 64))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = rng.integers(0, 10, nv).astype(np.int32)
    vecs = (centers[labels] + rng.normal(0, 0.35, (nv, 64))).astype(np.float32)
    _write(
        f"{out}/embeddings.parquet",
        pa.table(
            {
                "vec_id": np.arange(nv, dtype=np.int64),
                "embedding": pa.FixedSizeListArray.from_arrays(
                    pa.array(vecs.reshape(-1), pa.float32()), 64
                ).cast(pa.list_(pa.float32())),
                "label": pa.array(labels, pa.int32()),
            }
        ),
        min(max(nv, 1), 131072),
    )

    manifest = {"sf": sf, "seed": seed, "counts": n, "generator": "tools/gen_testdata.py"}
    with open(f"{out}/MANIFEST.json", "w") as f:
        json.dump(manifest, f, indent=1)
    print(json.dumps(manifest))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--sf", type=float, required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()
    gen(args.sf, args.out, args.seed)


if __name__ == "__main__":
    main()
