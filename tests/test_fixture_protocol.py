"""Fixture-calibration protocol checks (r15 advice item 3).

``doc_temperature_mixture``'s oracle equivalence rests on two
fixture-scoped facts that are true by MEASUREMENT, not by
construction:

1. DuckDB ``pow(n, -0.5)`` returns the same double as Python
   ``n ** -0.5`` for the actual per-lang masses, so both engines
   derive bit-identical keep rates.
2. No md5 draw ties its lang threshold's 52-bit prefix — the only
   region where the oracle's 52-bit numeric compare can disagree with
   the Spark side's full-width 128-bit string compare
   (P ~ n_docs * 2^-52 per fixture).

These tests re-verify both facts against every shipped SF fixture so
a regenerated fixture or a new SF that violates them fails HERE, in
the fixture-generation/round-close protocol, and a driver oracle
mismatch can be diagnosed as calibration scope rather than hunted as
an operator regression.  Pure DuckDB + hashlib — no Spark session.
"""

from __future__ import annotations

import hashlib
import math
import os

import duckdb
import pytest

from matcha_spark.operators.text import rate_threshold_hex

TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")
SF_DIRS = [
    os.path.join(TESTDATA, d)
    for d in ("sf0.001", "sf0.01", "sf0.1")
    if os.path.exists(os.path.join(TESTDATA, d, "documents.parquet"))
]

ALPHA = 0.5  # the doc_temperature_mixture entry's knob
POW52 = float(1 << 52)


def _lang_masses(sf_dir):
    """(lang, mass-as-double) exactly as the oracle's counts CTE."""
    con = duckdb.connect()
    rows = con.execute(
        "SELECT lang, CAST(sum(n_chars) AS DOUBLE) AS n FROM "
        f"read_parquet('{sf_dir}/documents.parquet') GROUP BY lang"
    ).fetchall()
    con.close()
    return dict(rows)


def _rates(masses):
    """Python mirror of temperature_mixture_rates (alpha=0.5, n_chars)."""
    raw = {g: float(n) ** (ALPHA - 1.0) for g, n in masses.items() if n > 0}
    mx = max(raw.values())
    return {g: v / mx for g, v in raw.items()}


@pytest.mark.parametrize("sf_dir", SF_DIRS, ids=os.path.basename)
def test_duckdb_pow_matches_python(sf_dir):
    """DuckDB pow(n, alpha-1) must be bit-identical to Python ``**``
    for the fixture's actual masses (and the derived rate division),
    or the two engines' thresholds silently diverge."""
    masses = _lang_masses(sf_dir)
    con = duckdb.connect()
    for g, n in masses.items():
        (dd,) = con.execute("SELECT pow(?, ?)", [float(n), ALPHA - 1.0]).fetchone()
        py = float(n) ** (ALPHA - 1.0)
        assert dd == py, (sf_dir, g, n, dd, py)
    # the rate is a single IEEE division of two matched doubles —
    # replay it in DuckDB too so the full rates CTE is covered
    rates = _rates(masses)
    mx = max(float(n) ** (ALPHA - 1.0) for n in masses.values() if n > 0)
    for g, r in rates.items():
        (dd,) = con.execute(
            "SELECT pow(?, ?) / ?", [float(masses[g]), ALPHA - 1.0, mx]
        ).fetchone()
        assert dd == r, (sf_dir, g, dd, r)
    con.close()


@pytest.mark.parametrize("sf_dir", SF_DIRS, ids=os.path.basename)
def test_md5_prefix52_tie_absence(sf_dir):
    """No document's md5 draw may tie its lang threshold's 52-bit
    prefix (prefix == floor(rate * 2^52)) — the only inputs where the
    oracle's numeric compare and the operator's string compare can
    disagree.  Also assert the two compares agree doc-by-doc, the
    fact the tie-absence exists to protect."""
    masses = _lang_masses(sf_dir)
    rates = _rates(masses)
    con = duckdb.connect()
    docs = con.execute(
        "SELECT doc_id, lang FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    ).fetchall()
    con.close()
    ties = []
    for doc_id, lang in docs:
        r = rates[lang]
        digest = hashlib.md5(str(doc_id).encode()).hexdigest()
        prefix = int(digest[:13], 16)
        if r < 1.0 and prefix == math.floor(r * POW52):
            ties.append((doc_id, lang, r))
        full_keep = digest < rate_threshold_hex(r)
        prefix_keep = float(prefix) < r * POW52
        assert full_keep == prefix_keep, (sf_dir, doc_id, lang, r, digest)
    assert not ties, f"52-bit threshold ties in {sf_dir}: {ties[:5]}"
