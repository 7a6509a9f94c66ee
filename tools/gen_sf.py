"""Deterministic testdata generator for scale factors the driver doesn't
ship (the driver provides sf0.001/0.01/0.1 read-only; the r8 verdict's #1
ask is a committed sf1 scale-trend artifact, which needs sf1 input).

Faithfully mirrors the driver tables' schemas and distributions, measured
from /root/testdata (TESTDATA.md: TPC-H-ish star schema + events stream +
documents/embeddings, seed=42):

- cardinalities scale linearly with sf (customer 150k·sf, orders 1.5M·sf,
  lineitem 6M·sf, events 1M·sf with 15k·sf users, documents 500k·sf·0.1)
  EXCEPT embeddings, which the driver grows ~4× per decade (500 → 500 →
  2000), i.e. ~n^0.6 — deliberately, so the documented-quadratic vector
  baselines (cosine_pairs) stay ~linear in sf; we continue that curve
  (sf1 → 8000).
- value ranges/choice sets match the measured driver data: order dates
  1995-01-01..2001-08-01, ship dates through 2001-11-04, quantity 1..50
  integers, discount 0..0.10 step .01, tax 0..0.08, 30-day Jan-2024 event
  window with sorted timestamps, unit-norm 64-dim embeddings with weak
  label-cluster structure (within-label mean cosine ≈ 0.02), ~0.16%
  exact-duplicate documents.

DELIBERATE divergence from the driver fixture (r9 verdict #3): document
text defaults to a Zipf(s=1.07) unigram model over a 50 000-word
vocabulary whose 31 head ranks are the driver's original words (so every
vocabulary-parameterized query — BM25 terms, classifier/LM tokens —
stays meaningful). The driver's uniform 31-word vocabulary admits only
~31³ distinct 3-gram shingles, so above ~sf2 the TRUE near-dup pair
count is itself quadratic (mean shingle df ≈ 870 at sf10) and the
pair-enumeration dedup family had to be EXCLUDED from the scale study
(SCALING.json `excluded_at_high_sf`) — a fixture-realism problem, not a
plan one. The Zipf model restores the power-law document frequencies
the prefix/banded joins exploit (df-ordered prefixes are sparse, the
stop-shingle cap bites only the true head), plus planted structure a
real corpus has and the uniform model lacks:

- ~2% of documents open with a fixed 13-token boilerplate sentence
  (license-header analogue → non-degenerate span census / winnowing),
- ~0.3% are NEAR duplicates of an earlier document (~10% of tokens
  resampled → non-trivial Jaccard/MinHash/SimHash pair output that
  grows LINEARLY with corpus size),
- ~0.16% exact duplicates (the driver's measured rate), copied last.

``--vocab tiny`` reproduces the driver's uniform 31-word text for
regression against older artifacts. Every output dir gets a
``_fixture.json`` recording the mode so tools (scale_study) can adapt.
- arrow schemas byte-match the driver files (int32/int64/double/string/
  timestamp[us]/list<float>); row groups are capped at 512k rows so an
  sf1 scan parallelizes (the driver's single-row-group layout is the
  measured scan bottleneck at sf0.1 — see catalog.load_table_hot).

Usage: python tools/gen_sf.py SF OUT_DIR  (e.g. 1 /root/repo/testdata_sf1)
"""

from __future__ import annotations

import datetime as dt
import json
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
P_ADJ = ["blue", "cold", "hot", "large", "new", "old", "red", "small"]
P_NOUN = ["anvil", "bolt", "gear", "gizmo", "plate", "ring", "rod", "widget"]
P_TYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]
VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup", "fast",
    "filter", "group", "hash", "join", "key", "line", "merge", "order",
    "part", "query", "row", "scan", "slow", "small", "sort", "spark",
    "stream", "table", "the", "value", "vector", "window",
]
LANGS = ["en", "de", "fr", "es", "zh"]
LANG_W = [0.41, 0.1425, 0.1475, 0.1475, 0.1525]  # measured sf0.1 mix

#: Zipf text model (default) — see module docstring. Head ranks 1..31 are
#: the driver's VOCAB so parameterized queries stay meaningful.
ZIPF_VOCAB_SIZE = 50_000
ZIPF_S = 1.07
BOILERPLATE = (
    "the query scan must filter and sort the big table "
    "before the merge"
)
BOILER_RATE = 0.02
NEARDUP_RATE = 0.003
NEARDUP_MUTATE = 0.10

EPOCH = dt.datetime(1970, 1, 1)


def _ts_us(datetimes_us: np.ndarray) -> pa.Array:
    return pa.array(datetimes_us.astype("int64"), type=pa.timestamp("us"))


#: per-table parquet row-group rows. A Spark scan task only produces rows
#: for row groups whose START offset falls inside its byte split, so a
#: table's parallelism is capped by its row-group COUNT no matter the
#: split size — the old single-group documents file made every text
#: operator single-threaded at sf1 (measured: language_id 2.5 s on one
#: core vs ~0.4 s split 32 ways). Text/vector tables are narrow-row and
#: compute-heavy per byte, so they get small groups; the fact tables keep
#: big groups for scan efficiency.
_ROW_GROUP_ROWS = {"documents": 1024, "embeddings": 256}
_DEFAULT_ROW_GROUP_ROWS = 128 * 1024


def _write(out_dir: str, name: str, table: pa.Table) -> None:
    pq.write_table(
        table,
        os.path.join(out_dir, f"{name}.parquet"),
        row_group_size=_ROW_GROUP_ROWS.get(name, _DEFAULT_ROW_GROUP_ROWS),
    )
    print(f"  {name}: {table.num_rows} rows")


def generate(
    sf: float, out_dir: str, seed: int = 42, vocab_mode: str = "zipf"
) -> None:
    if vocab_mode not in ("zipf", "tiny"):
        raise ValueError(f"vocab_mode must be 'zipf' or 'tiny', got {vocab_mode}")
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "_fixture.json"), "w") as fh:
        json.dump(
            {
                "sf": sf,
                "seed": seed,
                "vocab": vocab_mode,
                "vocab_size": len(VOCAB) if vocab_mode == "tiny" else ZIPF_VOCAB_SIZE,
                "zipf_s": None if vocab_mode == "tiny" else ZIPF_S,
            },
            fh,
        )
    rng = np.random.RandomState(seed)
    n_cust = int(150_000 * sf)
    n_supp = int(10_000 * sf)
    n_part = int(200_000 * sf)
    n_ord = int(1_500_000 * sf)
    n_li = int(6_000_000 * sf)
    n_ev = int(1_000_000 * sf)
    n_users = int(15_000 * sf)
    n_docs = int(50_000 * sf)
    # driver curve: 500 at sf≤0.01, ×4 per decade after (2000 at sf0.1)
    n_emb = max(500, int(round(2000 * (4 ** np.log10(sf / 0.1)))))

    _write(
        out_dir,
        "region",
        pa.table(
            {
                "r_regionkey": pa.array(range(5), type=pa.int32()),
                "r_name": REGIONS,
            }
        ),
    )
    _write(
        out_dir,
        "nation",
        pa.table(
            {
                "n_nationkey": pa.array(range(25), type=pa.int32()),
                "n_name": [f"NATION_{i}" for i in range(25)],
                "n_regionkey": pa.array([i % 5 for i in range(25)], type=pa.int32()),
            }
        ),
    )
    _write(
        out_dir,
        "customer",
        pa.table(
            {
                "c_custkey": pa.array(range(n_cust), type=pa.int64()),
                "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
                "c_nationkey": pa.array(
                    rng.randint(0, 25, n_cust).astype("int32")
                ),
                "c_acctbal": np.round(rng.uniform(-999.99, 9999.99, n_cust), 2),
                "c_mktsegment": [
                    SEGMENTS[i] for i in rng.randint(0, 5, n_cust)
                ],
            }
        ),
    )
    _write(
        out_dir,
        "supplier",
        pa.table(
            {
                "s_suppkey": pa.array(range(n_supp), type=pa.int64()),
                "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
                "s_nationkey": pa.array(
                    rng.randint(0, 25, n_supp).astype("int32")
                ),
                "s_acctbal": np.round(rng.uniform(-999.99, 9999.99, n_supp), 2),
            }
        ),
    )
    _write(
        out_dir,
        "part",
        pa.table(
            {
                "p_partkey": pa.array(range(n_part), type=pa.int64()),
                "p_name": [
                    f"{P_ADJ[a]} {P_NOUN[b]}"
                    for a, b in zip(
                        rng.randint(0, 8, n_part), rng.randint(0, 8, n_part)
                    )
                ],
                "p_brand": [
                    f"Brand#{i}" for i in rng.randint(1, 26, n_part)
                ],
                "p_type": [P_TYPES[i] for i in rng.randint(0, 6, n_part)],
                "p_size": pa.array(rng.randint(1, 51, n_part).astype("int32")),
                "p_retailprice": np.round(
                    900.0 + (np.arange(n_part) % 1000) / 10.0, 2
                ),
            }
        ),
    )

    day_us = 86_400_000_000
    o_start = int((dt.datetime(1995, 1, 1) - EPOCH).total_seconds() * 1e6)
    o_days = 2404  # 1995-01-01 .. 2001-08-01 inclusive, measured
    _write(
        out_dir,
        "orders",
        pa.table(
            {
                "o_orderkey": pa.array(range(n_ord), type=pa.int64()),
                "o_custkey": pa.array(
                    rng.randint(0, n_cust, n_ord).astype("int64")
                ),
                "o_orderstatus": [
                    "OFP"[i] for i in rng.randint(0, 3, n_ord)
                ],
                "o_totalprice": np.round(
                    rng.uniform(1000.0, 500_000.0, n_ord), 2
                ),
                "o_orderdate": _ts_us(
                    o_start + rng.randint(0, o_days + 1, n_ord) * day_us
                ),
                "o_orderpriority": [
                    PRIORITIES[i] for i in rng.randint(0, 5, n_ord)
                ],
            }
        ),
    )

    s_days = 2499  # ship dates run ~95 days past the order window
    _write(
        out_dir,
        "lineitem",
        pa.table(
            {
                "l_orderkey": pa.array(
                    rng.randint(0, n_ord, n_li).astype("int64")
                ),
                "l_partkey": pa.array(
                    rng.randint(0, n_part, n_li).astype("int64")
                ),
                "l_suppkey": pa.array(
                    rng.randint(0, n_supp, n_li).astype("int64")
                ),
                "l_linenumber": pa.array(
                    rng.randint(1, 8, n_li).astype("int32")
                ),
                "l_quantity": rng.randint(1, 51, n_li).astype("float64"),
                "l_extendedprice": np.round(
                    rng.uniform(900.0, 105_000.0, n_li), 2
                ),
                "l_discount": rng.randint(0, 11, n_li) / 100.0,
                "l_tax": rng.randint(0, 9, n_li) / 100.0,
                "l_returnflag": ["NAR"[i] for i in rng.randint(0, 3, n_li)],
                "l_linestatus": ["OF"[i] for i in rng.randint(0, 2, n_li)],
                "l_shipdate": _ts_us(
                    o_start + rng.randint(1, s_days + 1, n_li) * day_us
                ),
            }
        ),
    )

    ev_start = int((dt.datetime(2024, 1, 1) - EPOCH).total_seconds() * 1e6)
    ev_span = 30 * day_us  # 30-day window, measured at every SF
    ts = np.sort(rng.randint(0, ev_span, n_ev)) + ev_start
    _write(
        out_dir,
        "events",
        pa.table(
            {
                "event_id": pa.array(range(n_ev), type=pa.int64()),
                "ts": _ts_us(ts),
                "user_id": pa.array(
                    rng.randint(0, n_users, n_ev).astype("int64")
                ),
                "event_type": [
                    EVENT_TYPES[i] for i in rng.randint(0, 5, n_ev)
                ],
                "value": np.round(
                    np.minimum(rng.exponential(50.0, n_ev), 599.0), 2
                ),
                "props": [
                    json.dumps({"k": int(k)})
                    for k in rng.randint(0, 100, n_ev)
                ],
            }
        ),
    )

    n_words = rng.randint(10, 101, n_docs)
    if vocab_mode == "tiny":
        texts = [
            " ".join(VOCAB[i] for i in rng.randint(0, len(VOCAB), n))
            for n in n_words
        ]
    else:
        ranks = np.arange(1, ZIPF_VOCAB_SIZE + 1, dtype="float64")
        zp = ranks ** -ZIPF_S
        zp /= zp.sum()
        zipf_vocab = np.array(
            VOCAB + [f"w{i:05d}" for i in range(len(VOCAB), ZIPF_VOCAB_SIZE)]
        )
        draws = rng.choice(ZIPF_VOCAB_SIZE, size=int(n_words.sum()), p=zp)
        words = zipf_vocab[draws]
        offs = np.concatenate(([0], np.cumsum(n_words)))
        texts = [
            " ".join(words[offs[i] : offs[i + 1]]) for i in range(n_docs)
        ]
        # planted boilerplate prefix (~2%): the license-header analogue
        # the span census / winnowing operators exist for
        boiler = rng.rand(n_docs) < BOILER_RATE
        for i in np.flatnonzero(boiler):
            texts[i] = BOILERPLATE + " " + texts[i]
        # planted near duplicates (~0.3%): copy an earlier doc, resample
        # ~10% of its tokens — Jaccard/MinHash/SimHash pair output then
        # grows linearly with corpus size instead of vanishing (random
        # Zipf text almost never collides) or exploding (uniform 31-word
        # text always does)
        n_near = max(0, int(round(n_docs * NEARDUP_RATE)))
        half = max(1, n_docs // 2)
        for j in range(n_near):
            src = int(rng.randint(0, half))
            toks = texts[src].split(" ")
            flip = rng.rand(len(toks)) < NEARDUP_MUTATE
            repl = rng.choice(ZIPF_VOCAB_SIZE, size=int(flip.sum()), p=zp)
            for t_i, r_i in zip(np.flatnonzero(flip), repl):
                toks[t_i] = zipf_vocab[r_i]
            texts[half + j] = " ".join(toks)
    # ~0.16% exact duplicates (sf0.1 has 8/5000): copy earlier texts
    n_dup = max(0, int(round(n_docs * 0.0016)))
    for j in range(n_dup):
        src = int(rng.randint(0, n_docs // 2))
        texts[n_docs - 1 - j] = texts[src]
    langs = rng.choice(len(LANGS), size=n_docs, p=LANG_W)
    _write(
        out_dir,
        "documents",
        pa.table(
            {
                "doc_id": pa.array(range(n_docs), type=pa.int64()),
                "text": texts,
                "lang": [LANGS[i] for i in langs],
                "source": [f"src{i}" for i in rng.randint(0, 20, n_docs)],
                "n_chars": pa.array(
                    [len(t) for t in texts], type=pa.int64()
                ),
            }
        ),
    )

    labels = rng.randint(0, 10, n_emb).astype("int32")
    centers = rng.randn(10, 64)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    vecs = rng.randn(n_emb, 64)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    vecs = vecs + 0.14 * centers[labels]  # within-label mean cos ≈ 0.02
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    _write(
        out_dir,
        "embeddings",
        pa.table(
            {
                "vec_id": pa.array(range(n_emb), type=pa.int64()),
                "embedding": pa.array(
                    [row for row in vecs.astype("float32")],
                    type=pa.list_(pa.float32()),
                ),
                "label": pa.array(labels),
            }
        ),
    )


if __name__ == "__main__":
    mode = "zipf"
    argv = []
    for a in sys.argv[1:]:
        if a.startswith("--vocab="):
            mode = a.split("=", 1)[1]
        elif a == "--vocab":
            pass  # value follows as the next positional-looking arg
        else:
            argv.append(a)
    if "tiny" in argv or "zipf" in argv:  # `--vocab tiny` space form
        mode = "tiny" if "tiny" in argv else "zipf"
        argv = [a for a in argv if a not in ("tiny", "zipf")]
    sf = float(argv[0]) if argv else 1.0
    out = argv[1] if len(argv) > 1 else f"/root/repo/testdata_sf{argv[0] if argv else '1'}"
    print(f"generating sf={sf} into {out} (vocab={mode})")
    generate(sf, out, vocab_mode=mode)
