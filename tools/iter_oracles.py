"""Iterative DuckDB oracles for entries whose single-statement SQL
truth side is scale-bound (r16 verdict ask #2).

The driver's correctness gate executes each ``oracle_sql()`` entry as
ONE DuckDB statement, so a closure can only be written as a recursive
CTE there — and ``dedup_near_emb``'s ``reach`` recursion enumerates
ALL transitive pairs, which is O(component^2 x degree) on dense
near-dup clusters (TUNING r16: ~8e10 intermediate rows at sf1.0; SQL
forbids aggregates in the recursive term, so min-label propagation
cannot be expressed in-statement).  This module provides the same
truths as a PYTHON-DRIVEN LOOP of non-recursive ``CREATE TABLE AS …
GROUP BY`` rounds — still pure, Spark-independent DuckDB SQL, but
converging in O(log n) rounds with per-round cost O(|edges|) instead
of materializing the transitive closure.

Algorithm (``dedup_near_emb``): min-label propagation with pointer
jumping.  ``lbl(v)`` starts at ``v``; each round takes
``min(lbl(v), min over neighbors u of lbl(u))`` (one join + GROUP BY)
then pointer-jumps ``lbl(v) <- lbl(lbl(v))`` (one self-join), halving
the distance every label travels — O(log diameter) rounds on chains,
1-2 rounds on the near-clique components real near-dup data produces.
The fixpoint is exactly ``min vec_id of the connected component``, the
same value the driver-facing recursive oracle computes
(equivalence pinned at sf0.01 by
``tests/test_joins.py::test_iterative_oracle_equivalence``).

Usage: ``tools/check_oracle.py`` swaps these in for the single-
statement ORACLES rows when ``SPARK_GRAFT_ITER_ORACLES=1`` (the sf1.0
sweep protocol); the driver-facing ``oracle_sql()`` is untouched.
"""

from __future__ import annotations

__all__ = ["ITERATIVE"]

# the SAME pair predicate as ORACLES["dedup_near_emb"]'s `pairs` CTE —
# byte-identical arithmetic (precomputed norms, round(.., 6), >= 0.4)
# so the two truth sides agree bit-for-bit on the edge set
_EDGES_SETUP = [
    """
    CREATE OR REPLACE TEMP TABLE __io_e AS
    SELECT vec_id, embedding :: DOUBLE[] AS v,
           sqrt(list_dot_product(embedding :: DOUBLE[], embedding :: DOUBLE[])) AS nrm
    FROM embeddings
    """,
    """
    CREATE OR REPLACE TEMP TABLE __io_edges AS
    WITH s AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b
        FROM __io_e a JOIN __io_e b ON a.vec_id < b.vec_id
        WHERE round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6) >= 0.4
    )
    SELECT id_a AS a, id_b AS b FROM s
    UNION
    SELECT id_b, id_a FROM s
    """,
    """
    CREATE OR REPLACE TEMP TABLE __io_lbl AS
    SELECT vec_id, vec_id AS lbl FROM __io_e
    """,
]

_PROPAGATE = """
    CREATE OR REPLACE TEMP TABLE __io_lbl2 AS
    SELECT l.vec_id,
           least(l.lbl, coalesce(min(nl.lbl), l.lbl)) AS lbl
    FROM __io_lbl l
    LEFT JOIN __io_edges e ON e.a = l.vec_id
    LEFT JOIN __io_lbl nl ON nl.vec_id = e.b
    GROUP BY l.vec_id, l.lbl
"""

_POINTER_JUMP = """
    CREATE OR REPLACE TEMP TABLE __io_lbl AS
    SELECT l.vec_id, least(l.lbl, coalesce(p.lbl, l.lbl)) AS lbl
    FROM __io_lbl2 l
    LEFT JOIN __io_lbl2 p ON p.vec_id = l.lbl
"""

_FINAL = """
    SELECT e.vec_id, coalesce(l.lbl, e.vec_id) AS keep_vec_id
    FROM embeddings e LEFT JOIN __io_lbl l ON e.vec_id = l.vec_id
"""


def dedup_near_emb(con, max_rounds: int = 64):
    """Run the iterative min-label closure; returns the executed final
    cursor (same (vec_id, keep_vec_id) contract as the driver-facing
    oracle).  Labels only ever decrease, so a full propagate+jump round
    with zero decreases means the neighbor-min update is at fixpoint —
    labels are then constant per connected component, and since the
    component's min-id node can never go below itself, that constant IS
    the component min.  ``max_rounds`` is a runaway guard far above
    log2 of any corpus this repo will see (2^64 nodes)."""
    for stmt in _EDGES_SETUP:
        con.execute(stmt)
    for _ in range(max_rounds):
        con.execute(
            "CREATE OR REPLACE TEMP TABLE __io_prev AS SELECT * FROM __io_lbl"
        )
        con.execute(_PROPAGATE)
        con.execute(_POINTER_JUMP)
        changed = con.execute(
            "SELECT count(*) FROM __io_lbl l JOIN __io_prev p "
            "USING (vec_id) WHERE l.lbl < p.lbl"
        ).fetchone()[0]
        if changed == 0:
            break
    else:
        raise RuntimeError("dedup_near_emb iterative oracle: no fixpoint "
                           f"after {max_rounds} rounds")
    return con.execute(_FINAL)


ITERATIVE = {"dedup_near_emb": dedup_near_emb}
