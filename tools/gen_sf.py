"""Deterministic scale-factor generator for the bench tables.

Synthesizes the ten testdata tables at an arbitrary scale factor with the
same schemas, key relationships, and value shapes as the driver-generated
/root/testdata/sf* parquet (measured at sf0.1: row counts, category sets,
date/value ranges, vocabulary). Used to extend the measured scaling curve
past the shipped sf0.1 (BASELINE.md "Scaling curve") — sf1 is ~170 MB and
generates in seconds.

This is BENCH data: distributionally faithful, not byte-identical to the
driver generator (seed differs). Correctness oracles always run DuckDB on
the same files, so any deterministic data is valid there too.

Usage: python3 tools/gen_sf.py OUT_DIR [SF]   (default SF=1.0)
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

# rows per table at sf=1 (10x the shipped sf0.1)
BASE = {
    "customer": 150_000,
    "supplier": 10_000,
    "part": 200_000,
    "orders": 1_500_000,
    "lineitem": 6_000_000,
    "events": 1_000_000,
    "documents": 50_000,
    "embeddings": 20_000,
}
REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
PTYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
PWORDS1 = ["large", "small", "shiny", "dim", "round", "flat", "red", "green"]
PWORDS2 = ["ring", "box", "case", "bolt", "gear", "cap", "rod", "plate"]
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]
LANGS = ["en", "de", "fr", "es", "it"]
VOCAB = (
    "key agg row scan slow fast table value part hash merge batch spark a "
    "the line sort window column vector stream data small join shuffle "
    "filter group index plan query"
).split()  # 31 tokens, flat — matches the shipped corpus shape

DAY_US = 86_400_000_000


def _ts_us(date_str: str) -> int:
    return int(np.datetime64(date_str, "us").astype(np.int64))


def _write(out_dir: str, name: str, table: pa.Table) -> None:
    pq.write_table(table, os.path.join(out_dir, f"{name}.parquet"))
    print(f"  {name}: {table.num_rows} rows")


def _write_big(out_dir: str, name: str, columns: dict, total: int,
               chunk: int = 8_000_000) -> None:
    """Stream a large table to parquet in ``chunk``-row slices so Arrow
    conversion (string/timestamp columns especially) never doubles the
    full numpy working set — sf100's 600 M-row lineitem stays writable in
    RAM. ``columns`` values are either full numpy arrays (sliced here) or
    ``callable(start, end) -> pa.array`` for columns that must materialize
    per-chunk (formatted strings, dictionary lookups, timestamps). All RNG
    draws happen OUTSIDE, full-array, so generated values are identical to
    the single-shot writer at every sf."""
    path = os.path.join(out_dir, f"{name}.parquet")
    writer = None
    for s in range(0, total, chunk):
        e = min(s + chunk, total)
        tbl = pa.table({
            k: (v(s, e) if callable(v) else pa.array(v[s:e]))
            for k, v in columns.items()
        })
        if writer is None:
            writer = pq.ParquetWriter(path, tbl.schema)
        writer.write_table(tbl)
    if writer is not None:
        writer.close()
    print(f"  {name}: {total} rows")


def generate(out_dir: str, sf: float = 1.0, seed: int = 42) -> None:
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng([seed, int(sf * 1000)])
    n = {t: max(1, int(b * sf)) for t, b in BASE.items()}

    _write(out_dir, "region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": REGIONS,
    }))
    _write(out_dir, "nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": [f"NATION_{i:02d}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
    }))

    nc = n["customer"]
    _write(out_dir, "customer", pa.table({
        "c_custkey": pa.array(np.arange(nc), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(nc)],
        "c_nationkey": pa.array(rng.integers(0, 25, nc), pa.int32()),
        "c_acctbal": np.round(rng.uniform(-999.99, 9999.99, nc), 2),
        "c_mktsegment": pa.array(np.array(SEGMENTS)[rng.integers(0, 5, nc)]),
    }))

    ns = n["supplier"]
    _write(out_dir, "supplier", pa.table({
        "s_suppkey": pa.array(np.arange(ns), pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(ns)],
        "s_nationkey": pa.array(rng.integers(0, 25, ns), pa.int32()),
        "s_acctbal": np.round(rng.uniform(-999.99, 9999.99, ns), 2),
    }))

    np_ = n["part"]
    w1 = rng.integers(0, len(PWORDS1), np_)
    w2 = rng.integers(0, len(PWORDS2), np_)
    _write(out_dir, "part", pa.table({
        "p_partkey": pa.array(np.arange(np_), pa.int64()),
        "p_name": [f"{PWORDS1[a]} {PWORDS2[b]}" for a, b in zip(w1, w2)],
        "p_brand": pa.array([f"Brand#{i}" for i in rng.integers(1, 46, np_)]),
        "p_type": pa.array(np.array(PTYPES)[rng.integers(0, 6, np_)]),
        "p_size": pa.array(rng.integers(1, 51, np_), pa.int32()),
        "p_retailprice": np.round(rng.uniform(900.0, 2000.0, np_), 2),
    }))

    no = n["orders"]
    odate = _ts_us("1995-01-01") + rng.integers(0, 2404, no) * DAY_US
    # rng draws in the exact order of the original single-shot table
    # literal, so values stay bit-identical at every sf
    ocust = rng.integers(0, nc, no).astype(np.int64)
    ostatus = rng.integers(0, 3, no)
    ototal = np.round(rng.uniform(1000.0, 500000.0, no), 2)
    oprio = rng.integers(0, 5, no)
    _write_big(out_dir, "orders", {
        "o_orderkey": lambda s, e: pa.array(np.arange(s, e), pa.int64()),
        "o_custkey": ocust,
        "o_orderstatus": lambda s, e: pa.array(
            np.array(["O", "P", "F"])[ostatus[s:e]]),
        "o_totalprice": ototal,
        "o_orderdate": lambda s, e: pa.array(odate[s:e], pa.timestamp("us")),
        "o_orderpriority": lambda s, e: pa.array(
            np.array(PRIORITIES)[oprio[s:e]]),
    }, no)
    del ostatus, ocust, ototal, oprio

    nl = n["lineitem"]
    lok = np.sort(rng.integers(0, no, nl))
    # linenumber = 1-based position within the order (run-length cumcount)
    first = np.r_[True, lok[1:] != lok[:-1]]
    idx = np.arange(nl)
    lnum = (idx - np.maximum.accumulate(np.where(first, idx, 0)) + 1).astype(
        np.int32
    )
    del first, idx
    ldate = odate[lok] + rng.integers(1, 121, nl) * DAY_US
    lpart = rng.integers(0, np_, nl).astype(np.int64)
    lsupp = rng.integers(0, ns, nl).astype(np.int64)
    lqty = rng.integers(1, 51, nl).astype(np.float64)
    lprice = np.round(rng.uniform(900.0, 105000.0, nl), 2)
    ldisc = np.round(rng.integers(0, 11, nl) / 100.0, 2)
    ltax = np.round(rng.integers(0, 9, nl) / 100.0, 2)
    lrf = rng.integers(0, 3, nl)
    lls = rng.integers(0, 2, nl)
    _write_big(out_dir, "lineitem", {
        "l_orderkey": lok.astype(np.int64),
        "l_partkey": lpart,
        "l_suppkey": lsupp,
        "l_linenumber": lnum,
        "l_quantity": lqty,
        "l_extendedprice": lprice,
        "l_discount": ldisc,
        "l_tax": ltax,
        "l_returnflag": lambda s, e: pa.array(np.array(["A", "N", "R"])[lrf[s:e]]),
        "l_linestatus": lambda s, e: pa.array(np.array(["F", "O"])[lls[s:e]]),
        "l_shipdate": lambda s, e: pa.array(ldate[s:e], pa.timestamp("us")),
    }, nl)
    del lok, lnum, ldate, lpart, lsupp, lqty, lprice, ldisc, ltax, lrf, lls

    ne = n["events"]
    nusers = max(1, int(15_000 * sf))
    ets = np.sort(_ts_us("2024-01-01") + rng.integers(0, 30 * DAY_US, ne))
    euser = rng.integers(0, nusers, ne).astype(np.int64)
    etype = rng.integers(0, 5, ne)
    evalue = np.round(rng.gamma(2.0, 35.0, ne), 2)
    eprops = rng.integers(0, 100, ne)
    _write_big(out_dir, "events", {
        "event_id": lambda s, e: pa.array(np.arange(s, e), pa.int64()),
        "ts": lambda s, e: pa.array(ets[s:e], pa.timestamp("us")),
        "user_id": euser,
        "event_type": lambda s, e: pa.array(np.array(EVENT_TYPES)[etype[s:e]]),
        "value": evalue,
        "props": lambda s, e: pa.array([f'{{"k": {k}}}' for k in eprops[s:e]]),
    }, ne)
    del ets, euser, etype, evalue, eprops

    nd = n["documents"]
    lens = rng.integers(8, 112, nd)
    vocab = np.array(VOCAB)
    texts = [" ".join(vocab[rng.integers(0, len(vocab), ln)]) for ln in lens]
    # ~1% exact duplicates + near-identical tails, mirroring the shipped
    # corpus's dup structure (keeps the dedup benches non-degenerate)
    for i in range(0, nd, 97):
        if i + 1 < nd:
            texts[i + 1] = texts[i]
    _write(out_dir, "documents", pa.table({
        "doc_id": pa.array(np.arange(nd), pa.int64()),
        "text": texts,
        "lang": pa.array(np.array(LANGS)[
            np.minimum(rng.geometric(0.75, nd) - 1, 4)
        ]),
        "source": pa.array([f"src{s}" for s in rng.integers(0, 20, nd)]),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }))

    nv = n["embeddings"]
    labels = rng.integers(0, 10, nv)
    centers = rng.normal(0.0, 1.0, (10, 64))
    vecs = centers[labels] * 0.6 + rng.normal(0.0, 0.6, (nv, 64))
    vecs = (vecs / np.linalg.norm(vecs, axis=1, keepdims=True)).astype(np.float32)
    _write(out_dir, "embeddings", pa.table({
        "vec_id": pa.array(np.arange(nv), pa.int64()),
        "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int32()),
    }))


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/phs-sf1"
    sf = float(sys.argv[2]) if len(sys.argv) > 2 else 1.0
    print(f"generating sf={sf} into {out_dir}")
    generate(out_dir, sf)


if __name__ == "__main__":
    main()
