"""Generate LOCAL trend-run data at larger scale factors (r15, verdict
ask #5): deterministic synthetic tables with the same schemas and
(approximately) the same distributions as the driver fixtures in
/root/testdata (TESTDATA.md — those are read-only and this script
never touches them), so per-entry work scales ~linearly with sf and a
bench run at sf1.0 measures the SCALING TREND of each plan, not a
distribution shift.

Distributions mirrored from sf0.1 (sampled, not copied): TPC-H-ish
key ranges and categorical values, 1-7 lines per order, order dates
1995-2001 with shipdate = orderdate + U(1, 95) days, exponential(50)
event values one month of nanosecond timestamps (events must be
TIMESTAMP(NANOS) to exercise load_tables' nanosAsLong path), zipf
word-salad documents of 10-100 words with the fixture's language skew
and ~1.9% planted near-duplicates (see VOCAB — the r16 enrichment that
removed the 31-word pair-density cliff), and unit-normalized 64-dim
embeddings in 10 gaussian clusters.

Usage: python tools/gen_sf.py 1.0 [outdir]   (default outdir
.localdata/sf<sf> under the repo root; ~40 s and ~350 MB at sf1.0)
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

# r16 (verdict ask #3): ~10k-word zipf vocabulary.  The former 31-word
# salad parked every trigram's doc-frequency just under dedup's
# max_doc_freq=100 cap at sf1.0 (~1.5e8 candidate pairs under the cap —
# the r15 sweep's pair-density cliff), which is a property of
# vocabulary poverty no real corpus has.  Zipf s=0.5 keeps the head
# realistic while bounding the hottest word at p ~ 1/198 — the hottest
# trigram's expected doc-frequency at sf1.0 (50k docs) is < 1, so the
# exact-Jaccard truth sides run far below the cap.  The head of the
# vocabulary is the lang-ID stopword lists (text.py) so language
# scoring stays non-vacuous on the synthetic corpus.
_STOPWORDS = list(dict.fromkeys(
    "the a and of to in is that it for".split()
    + "el la de que y en un es no por".split()
    + "le et est pour dans ce".split()
))
N_VOCAB = 10_000
VOCAB = _STOPWORDS + [f"w{i:05d}" for i in range(N_VOCAB - len(_STOPWORDS))]
ADJS = "blue cold hot large new old red small".split()
NOUNS = "anvil bolt gear gizmo plate ring rod widget".split()
REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PTYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
ETYPES = ["click", "error", "purchase", "signup", "view"]
LANGS = ["en", "de", "es", "fr", "zh"]
LANG_P = [0.41, 0.1475, 0.1475, 0.1475, 0.1475]

DAY_US = 86_400_000_000


def _write(tbl: pa.Table, path: str, **kw) -> None:
    pq.write_table(tbl, path, row_group_size=512 * 1024, **kw)
    print(f"  {os.path.basename(path)}: {tbl.num_rows} rows")


def generate(sf: float, out: str) -> None:
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(42)
    scale = sf / 0.1  # counts are defined relative to the sf0.1 fixture
    n_cust = int(15_000 * scale)
    n_ord = int(150_000 * scale)
    n_part = int(20_000 * scale)
    n_supp = int(1_000 * scale)
    n_ev = int(100_000 * scale)
    n_doc = int(5_000 * scale)
    n_emb = int(2_000 * scale)

    _write(
        pa.table(
            {
                "r_regionkey": pa.array(range(5), pa.int64()),
                "r_name": REGIONS,
            }
        ),
        f"{out}/region.parquet",
    )
    _write(
        pa.table(
            {
                "n_nationkey": pa.array(range(25), pa.int64()),
                "n_name": [f"NATION_{i}" for i in range(25)],
                "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
            }
        ),
        f"{out}/nation.parquet",
    )
    _write(
        pa.table(
            {
                "c_custkey": pa.array(np.arange(n_cust), pa.int64()),
                "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
                "c_nationkey": pa.array(
                    rng.integers(0, 25, n_cust), pa.int32()
                ),
                "c_acctbal": np.round(rng.uniform(-1000, 10000, n_cust), 2),
                "c_mktsegment": pa.array(
                    np.array(SEGMENTS)[rng.integers(0, 5, n_cust)]
                ),
            }
        ),
        f"{out}/customer.parquet",
    )
    _write(
        pa.table(
            {
                "s_suppkey": pa.array(np.arange(n_supp), pa.int64()),
                "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
                "s_nationkey": pa.array(
                    rng.integers(0, 25, n_supp), pa.int32()
                ),
                "s_acctbal": np.round(rng.uniform(-1000, 10000, n_supp), 2),
            }
        ),
        f"{out}/supplier.parquet",
    )
    _write(
        pa.table(
            {
                "p_partkey": pa.array(np.arange(n_part), pa.int64()),
                "p_name": [
                    f"{ADJS[a]} {NOUNS[b]}"
                    for a, b in zip(
                        rng.integers(0, 8, n_part), rng.integers(0, 8, n_part)
                    )
                ],
                "p_brand": pa.array(
                    [f"Brand#{i}" for i in rng.integers(1, 26, n_part)]
                ),
                "p_type": pa.array(
                    np.array(PTYPES)[rng.integers(0, 6, n_part)]
                ),
                "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
                "p_retailprice": np.round(rng.uniform(900, 1000, n_part), 2),
            }
        ),
        f"{out}/part.parquet",
    )

    # orders: dates 1995-01-01 .. 2001-08-01 (us timestamps)
    base = np.datetime64("1995-01-01", "us").astype(np.int64)
    span_days = (
        np.datetime64("2001-08-01", "us").astype(np.int64) - base
    ) // DAY_US
    odate = base + rng.integers(0, span_days + 1, n_ord) * DAY_US
    _write(
        pa.table(
            {
                "o_orderkey": pa.array(np.arange(n_ord), pa.int64()),
                "o_custkey": pa.array(
                    rng.integers(0, n_cust, n_ord), pa.int64()
                ),
                "o_orderstatus": pa.array(
                    np.array(["F", "O", "P"])[rng.integers(0, 3, n_ord)]
                ),
                "o_totalprice": np.round(rng.uniform(1000, 500000, n_ord), 2),
                "o_orderdate": pa.array(odate, pa.timestamp("us")),
                "o_orderpriority": pa.array(
                    np.array(PRIORITIES)[rng.integers(0, 5, n_ord)]
                ),
            }
        ),
        f"{out}/orders.parquet",
    )

    # lineitem: 1-7 lines per order
    nlines = rng.integers(1, 8, n_ord)
    okey = np.repeat(np.arange(n_ord), nlines)
    n_li = len(okey)
    lnum = np.concatenate([np.arange(1, k + 1) for k in nlines])
    sdate = np.repeat(odate, nlines) + rng.integers(1, 96, n_li) * DAY_US
    _write(
        pa.table(
            {
                "l_orderkey": pa.array(okey, pa.int64()),
                "l_partkey": pa.array(
                    rng.integers(0, n_part, n_li), pa.int64()
                ),
                "l_suppkey": pa.array(
                    rng.integers(0, n_supp, n_li), pa.int64()
                ),
                "l_linenumber": pa.array(lnum, pa.int32()),
                "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
                "l_extendedprice": np.round(
                    rng.uniform(900, 105000, n_li), 2
                ),
                "l_discount": np.round(rng.integers(0, 11, n_li) / 100.0, 2),
                "l_tax": np.round(rng.integers(0, 9, n_li) / 100.0, 2),
                "l_returnflag": pa.array(
                    np.array(["A", "N", "R"])[rng.integers(0, 3, n_li)]
                ),
                "l_linestatus": pa.array(
                    np.array(["F", "O"])[rng.integers(0, 2, n_li)]
                ),
                "l_shipdate": pa.array(sdate, pa.timestamp("us")),
            }
        ),
        f"{out}/lineitem.parquet",
    )

    # events: one month of NANOSECOND timestamps (load_tables reads the
    # fixture's TIMESTAMP(NANOS) via nanosAsLong — same path here)
    ebase = np.datetime64("2024-01-01", "ns").astype(np.int64)
    espan = np.datetime64("2024-01-31", "ns").astype(np.int64) - ebase
    _write(
        pa.table(
            {
                "event_id": pa.array(np.arange(n_ev), pa.int64()),
                "ts": pa.array(
                    ebase + rng.integers(0, espan, n_ev), pa.timestamp("ns")
                ),
                "user_id": pa.array(
                    rng.integers(0, int(1500 * scale), n_ev), pa.int64()
                ),
                "event_type": pa.array(
                    np.array(ETYPES)[rng.integers(0, 5, n_ev)]
                ),
                "value": np.round(rng.exponential(50.0, n_ev), 2),
                "props": pa.array(
                    [f'{{"k": {k}}}' for k in rng.integers(0, 100, n_ev)]
                ),
            }
        ),
        f"{out}/events.parquet",
        version="2.6",
    )

    # documents: zipf word salad (see VOCAB), 10-100 words, fixture
    # language skew, ~1.9% planted near-duplicates
    vocab = np.array(VOCAB)
    zp = np.arange(1, len(vocab) + 1, dtype=np.float64) ** -0.5
    zp /= zp.sum()
    nw = rng.integers(10, 101, n_doc)
    words = vocab[rng.choice(len(vocab), int(nw.sum()), p=zp)]
    texts, pos = [], 0
    for k in nw:
        texts.append(" ".join(words[pos : pos + k]))
        pos += k
    # plant near-duplicates: every 53rd doc becomes an earlier doc plus
    # one appended word — trigram Jaccard s/(s+3) >= 0.9 for >= 30-word
    # bases (LSH banding miss probability ~1e-8 at 16x4), lengths
    # differ so keep-best survivor selection stays non-trivial.  The
    # zipf salad alone would produce no near-dup pairs at all, making
    # every dedup entry vacuously green at trend scale.
    extra = vocab[rng.choice(len(vocab), n_doc, p=zp)]
    for i in range(7, n_doc, 53):
        texts[i] = texts[i - 7] + " " + extra[i]
    _write(
        pa.table(
            {
                "doc_id": pa.array(np.arange(n_doc), pa.int64()),
                "text": texts,
                "lang": pa.array(
                    np.array(LANGS)[
                        rng.choice(len(LANGS), n_doc, p=LANG_P)
                    ]
                ),
                "source": pa.array(
                    [f"src{i}" for i in rng.integers(0, 20, n_doc)]
                ),
                "n_chars": pa.array(
                    [len(t) for t in texts], pa.int64()
                ),
            }
        ),
        f"{out}/documents.parquet",
    )

    # embeddings: 10 gaussian clusters, unit-normalized, dim 64
    label = rng.integers(0, 10, n_emb)
    centers = rng.normal(0, 1, (10, 64))
    vecs = centers[label] + rng.normal(0, 0.35, (n_emb, 64))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    _write(
        pa.table(
            {
                "vec_id": pa.array(np.arange(n_emb), pa.int64()),
                "embedding": pa.array(
                    [v.astype(np.float32) for v in vecs],
                    pa.list_(pa.float32()),
                ),
                "label": pa.array(label, pa.int32()),
            }
        ),
        f"{out}/embeddings.parquet",
    )


if __name__ == "__main__":
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    out = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".localdata",
            f"sf{sf:g}",
        )
    )
    print(f"generating sf={sf} -> {out}")
    generate(sf, out)
