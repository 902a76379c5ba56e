"""Graph algorithms over edge lists: transitive closure / property
paths, all-pairs shortest path lengths (hop counts or weighted), and
PageRank (uniform / weighted / personalized).

The reference has no property paths (SURVEY §2.5); SPARQL engines offer
``pred+`` — here that is :func:`transitive_closure` over an edge list,
with :func:`predicate_closure` binding it to a :class:`TriplesDB`
predicate; :func:`shortest_path_lengths` and :func:`pagerank` extend
the same iterative machinery to distances and centrality.

Scale shape: path-doubling iteration — each round composes the
accumulated reachability with itself, anti-joins out the already-known
pairs, and stops when no new pairs appear.  Rounds = ⌈log₂ diameter⌉;
every round is one equi-join + one anti-join, both shuffle-partitioned
on the join key.  Nothing collects to the driver.

Cluster safety: each round is materialized to parquet under a *shared*
work directory — the explicit ``checkpoint_dir`` argument, else the
session's Spark checkpoint dir (``sc.setCheckpointDir``), else (local
master only) a driver tempdir.  On a multi-node cluster executors write
task output through the Hadoop FileSystem for that path, so the
directory must be on shared storage (HDFS/S3/NFS); a driver-local
tempdir would silently scatter files across machines, which is why the
non-local fallback raises instead.  Superseded round files are deleted
eagerly; only the final result's files remain (the returned DataFrame
reads them lazily).
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "transitive_closure",
    "seeded_reachability",
    "seeded_shortest_paths",
    "shortest_path_lengths",
    "pagerank",
    "predicate_closure",
    "cleanup_closure",
    "path_edges",
    "graph_nodes",
    "triangle_counts",
    "coreness",
]


def _fs_delete(spark: SparkSession, path: str) -> None:
    """Recursively delete ``path`` via the Hadoop FileSystem API, so it
    works for file:/, hdfs:/, s3a:/ ... alike.  Best-effort."""
    try:
        jvm = spark._jvm
        jpath = jvm.org.apache.hadoop.fs.Path(path)
        fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
        fs.delete(jpath, True)
    except Exception:
        pass  # cleanup is best-effort; leaking one dir beats failing the job


def _resolve_work_dir(spark: SparkSession, checkpoint_dir: str | None) -> str:
    """Pick the base directory for round materialization.

    Priority: explicit argument > session checkpoint dir > (local master
    only) a fresh tempdir.  Raises on a non-local cluster with neither
    configured — a driver-local tempdir is NOT visible to executors on
    other machines and would corrupt the iteration silently.
    """
    base = checkpoint_dir
    if base is None:
        try:
            sc = spark.sparkContext
        except Exception:
            # Spark Connect: no sparkContext on the client — the session
            # checkpoint dir and master are unknowable here, so a shared
            # directory must be named explicitly
            raise ValueError(
                "transitive_closure under Spark Connect needs an explicit "
                "checkpoint_dir= (a shared HDFS/S3/NFS path)"
            ) from None
        base = sc.getCheckpointDir()
        if base is None:
            master = sc.master or ""
            if not master.startswith("local"):
                raise ValueError(
                    "transitive_closure needs a shared work directory on a cluster: "
                    "pass checkpoint_dir= or call spark.sparkContext.setCheckpointDir() "
                    "with an HDFS/S3/shared-FS path"
                )
            base = tempfile.mkdtemp(prefix="matcha_closure_")
    return f"{base.rstrip('/')}/closure_{uuid.uuid4().hex}"


# ---------------------------------------------------------------------------
# driver tails (r18): once an iteration's input is KNOWN to be small —
# the same "convergence-scalar class" of driver transfer that
# connected_components' small_cutoff union-find already rides — running
# diameter/log-diameter rounds of parquet-materialized Spark jobs over
# a few thousand rows is pure scheduling overhead.  Each loop below
# collects its (counted, bounded) edge set, computes the SAME answer in
# driver memory, and writes ONE materialization through the loop's
# normal round directory, so the returned frame scans the same
# ``closure_*``/``seeded_*`` parquet path as the distributed shape
# (plan audits and the cleanup contract are unchanged).  An explicit
# work budget aborts the driver attempt (→ distributed loop runs as
# before) when the OUTPUT would be large even though the input is small
# (dense closures), so the tail can never blow driver memory.
# ---------------------------------------------------------------------------

# edge-count ceilings for attempting a driver tail (CC's small_cutoff
# class); scale levers: the distributed loops are untouched above them.
# Seeded loops may attempt at a larger size because their OUTPUT is
# bounded by the reachable node set (≤ 2·edges rows); the all-pairs
# closures can emit O(V²) pairs from a small edge set — and a failed
# attempt still pays the edge collect — so they only try on edge sets
# small enough that the collect itself is negligible.  r18 initially
# measured the all-pairs attempt at 45 k struct-term edges as a net
# LOSS — but that was BEFORE both driver transfers went through Arrow
# (`_collect_rows` in, `_arrow_write_rows` out); re-measured r19 with
# the Arrow paths in place, the driver arm wins ~2× at 46 k
# struct-term edges / 122 k-pair outputs (closure 1.6 s vs 3.2 s,
# all-pairs distances 1.8 s vs 3.5 s, interleaved same-session A/B),
# so the all-pairs cutoff now matches the seeded one; the
# DRIVER_PATH_BUDGET work/pair ceiling still bounces dense outputs
# back to the distributed loop, which remains the 100-TB arm.
DRIVER_PATH_EDGES = 100_000
DRIVER_ALLPAIRS_EDGES = 100_000
# coreness peel: output is ≤ one int row per node (≤ 2·edges), so the
# transfer is bounded like connected_components' union-find — same
# 200k ceiling
DRIVER_CORENESS_EDGES = 200_000
# output/work ceiling for the driver computation itself
DRIVER_PATH_BUDGET = 4_000_000


def _arrow_write_rows(spark, rows, schema, path):
    """Write collected driver-tail rows as ONE parquet file via pyarrow
    and read them back — bypassing ``createDataFrame``'s per-row Py4J
    conversion (r18 guide §4: six-figure struct-term row lists cost
    seconds through createDataFrame and tens of milliseconds through a
    columnar Arrow build).  Returns the read-back DataFrame, or None
    when the target isn't driver-local or the schema needs a type this
    converter doesn't cover (caller falls back to createDataFrame +
    the loop's normal materialize)."""
    if "://" in path and not path.startswith("file:"):
        return None  # shared-FS round dir: executors write it, not us
    try:
        import pyarrow as pa
        import pyarrow.parquet as pq
    except Exception:
        return None
    from pyspark.sql.types import (
        BooleanType,
        DoubleType,
        FloatType,
        IntegerType,
        LongType,
        StringType,
        StructType,
    )

    prim = {
        LongType: pa.int64(),
        IntegerType: pa.int32(),
        DoubleType: pa.float64(),
        FloatType: pa.float32(),
        StringType: pa.string(),
        BooleanType: pa.bool_(),
    }

    def conv(values, dt):
        if isinstance(dt, StructType):
            children = [
                conv([None if v is None else v[i] for v in values], f.dataType)
                for i, f in enumerate(dt.fields)
            ]
            mask = (
                pa.array([v is None for v in values], type=pa.bool_())
                if any(v is None for v in values)
                else None
            )
            return pa.StructArray.from_arrays(
                children,
                fields=[
                    pa.field(f.name, c.type)
                    for f, c in zip(dt.fields, children)
                ],
                mask=mask,
            )
        t = prim.get(type(dt))
        if t is None:
            raise TypeError(f"unsupported driver write-back type: {dt}")
        return pa.array(values, type=t)

    local = path
    if local.startswith("file:"):
        local = local[len("file:"):]
        while local.startswith("//"):
            local = local[1:]
    try:
        cols = (
            [list(c) for c in zip(*rows)]
            if rows
            else [[] for _ in schema.fields]
        )
        arrays = [
            conv(c, f.dataType) for c, f in zip(cols, schema.fields)
        ]
        table = pa.Table.from_arrays(
            arrays, names=[f.name for f in schema.fields]
        )
        os.makedirs(local, exist_ok=True)
        pq.write_table(table, os.path.join(local, "part-00000.parquet"))
    except Exception:
        return None
    return spark.read.parquet(path)


def _arrow_collect_rows(df):
    """Collect ``df`` to a list of plain tuples through ONE Arrow table
    (``toArrow``) instead of the row-at-a-time pickle path (guide §6
    "Arrow for driver transfers"): the driver tails collect 10⁵-row
    edge slices, and Row-path ``collect()`` measured ~10× the columnar
    transfer on them.  Struct columns land as tuples — PySpark ``Row``
    is a ``tuple`` subclass, so hashing/equality/positional indexing in
    every downstream driver kernel (adjacency dicts, ``_write_rows_back``'s
    positional converter) are unchanged.  Returns ``None`` when the
    Arrow path is unavailable or a type doesn't convert (caller falls
    back to ``.collect()``)."""
    try:
        import pyarrow as pa

        tbl = df.toArrow()
    except Exception:
        return None

    def col(arr):
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        if pa.types.is_struct(arr.type):
            children = [
                col(arr.field(i)) for i in range(arr.type.num_fields)
            ]
            if not children:
                return [()] * len(arr)
            if arr.null_count:
                nulls = arr.is_null().to_pylist()
                return [
                    None if isnull else tuple(c[i] for c in children)
                    for i, isnull in enumerate(nulls)
                ]
            return [tuple(vals) for vals in zip(*children)]
        return arr.to_pylist()

    try:
        cols = [col(tbl.column(i)) for i in range(tbl.num_columns)]
    except Exception:
        return None
    if not cols:
        return [() for _ in range(tbl.num_rows)]
    return list(zip(*cols))


def _collect_rows(df):
    """Arrow-path collect with row-path fallback (driver tails only)."""
    rows = _arrow_collect_rows(df)
    return df.collect() if rows is None else rows


def _write_rows_back(spark, rows, schema, base, materialize):
    """Materialize driver-computed rows through the loop's round dir:
    Arrow fast path when possible, else ``createDataFrame`` through the
    loop's own ``_materialize``.  Returns ``(df, path, n_rows)`` with
    the same contract as ``_materialize``."""
    path = f"{base}/{uuid.uuid4().hex}"
    df = _arrow_write_rows(spark, rows, schema, path)
    if df is not None:
        return df, path, len(rows)
    return materialize(
        spark.createDataFrame(rows, schema)
        if rows
        else spark.createDataFrame([], schema)
    )


def _driver_reach_pairs(edge_rows, budget: int = DRIVER_PATH_BUDGET):
    """All-pairs ≥1-hop reachability of a collected edge list: SCC
    condensation (iterative Tarjan) + reverse-topological bitset DP —
    O(V·E/64), no per-source BFS.  Returns a list of (u, v) pairs, or
    None when the pair count would exceed ``budget`` (caller falls back
    to the distributed loop).  Reflexive pairs appear exactly for nodes
    on cycles (incl. self-loops), matching the distributed semantics."""
    idx: dict = {}
    vals: list = []

    def ix(v):
        i = idx.get(v)
        if i is None:
            i = idx[v] = len(vals)
            vals.append(v)
        return i

    adj: list[list[int]] = []
    for r in edge_rows:
        u, v = ix(r[0]), ix(r[1])
        while len(adj) < len(vals):
            adj.append([])
        adj[u].append(v)
    n = len(vals)
    while len(adj) < n:
        adj.append([])

    # iterative Tarjan: SCCs complete in reverse topological order
    index = [-1] * n
    low = [0] * n
    on_stack = [False] * n
    scc_of = [-1] * n
    stack: list[int] = []
    sccs: list[list[int]] = []
    counter = 0
    for root in range(n):
        if index[root] != -1:
            continue
        work = [(root, 0)]
        while work:
            node, ei = work[-1]
            if ei == 0:
                index[node] = low[node] = counter
                counter += 1
                stack.append(node)
                on_stack[node] = True
            advanced = False
            while ei < len(adj[node]):
                nxt = adj[node][ei]
                ei += 1
                if index[nxt] == -1:
                    work[-1] = (node, ei)
                    work.append((nxt, 0))
                    advanced = True
                    break
                if on_stack[nxt]:
                    low[node] = min(low[node], index[nxt])
            if advanced:
                continue
            work.pop()
            if low[node] == index[node]:
                comp = []
                while True:
                    w = stack.pop()
                    on_stack[w] = False
                    scc_of[w] = len(sccs)
                    comp.append(w)
                    if w == node:
                        break
                sccs.append(comp)
            if work:
                parent = work[-1][0]
                low[parent] = min(low[parent], low[node])

    # reverse-topo DP: sccs[i]'s successors all have smaller scc ids
    member_mask = [0] * len(sccs)
    for ci, comp in enumerate(sccs):
        m = 0
        for u in comp:
            m |= 1 << u
        member_mask[ci] = m
    reach = [0] * len(sccs)
    cyclic = [len(c) > 1 for c in sccs]
    for ci, comp in enumerate(sccs):
        r = 0
        for u in comp:
            for v in adj[u]:
                cv = scc_of[v]
                if cv == ci:
                    cyclic[ci] = True  # self-loop or intra-SCC edge
                else:
                    r |= (1 << v) | reach[cv]
        if cyclic[ci]:
            r |= member_mask[ci]
        reach[ci] = r

    total = sum(reach[scc_of[u]].bit_count() for u in range(n))
    if total > budget:
        return None
    pairs = []
    for u in range(n):
        m = reach[scc_of[u]]
        uv = vals[u]
        while m:
            b = m & -m
            pairs.append((uv, vals[b.bit_length() - 1]))
            m ^= b
    return pairs


def _driver_sssp(edge_rows, sources, weighted: bool,
                 budget: int = DRIVER_PATH_BUDGET, per_source: bool = False):
    """Min ≥1-hop distances of a collected edge list on the driver:
    one Dijkstra per source set (``per_source=False`` treats ``sources``
    as ONE multi-source set — min over sources, the seeded contract;
    ``per_source=True`` runs each source separately and returns
    (src, dst, dist) — the all-pairs contract).  Distance arithmetic
    accumulates along each path exactly as the distributed relaxation
    does (dist + w, left to right), so float sums are bit-identical.
    Returns a row list, or None when the settled-node work exceeds
    ``budget``."""
    import heapq

    idx: dict = {}
    vals: list = []

    def ix(v):
        i = idx.get(v)
        if i is None:
            i = idx[v] = len(vals)
            vals.append(v)
        return i

    adj: list[list[tuple]] = []
    for r in edge_rows:
        u, v = ix(r[0]), ix(r[1])
        w = (float(r[2]) if weighted else 1) if len(r) > 2 else 1
        while len(adj) < len(vals):
            adj.append([])
        adj[u].append((v, w))
    n = len(vals)
    while len(adj) < n:
        adj.append([])

    src_groups = (
        [[ix(s)] for s in sources] if per_source else [[ix(s) for s in sources]]
    )
    while len(adj) < len(vals):  # sources absent from the edge list
        adj.append([])
    out = []
    work = 0
    for group in src_groups:
        dist: dict[int, float] = {}
        heap: list = []
        for s in group:
            for v, w in adj[s]:
                if v not in dist or w < dist[v]:
                    dist[v] = w
                    heapq.heappush(heap, (w, v))
        settled: set[int] = set()
        while heap:
            d, u = heapq.heappop(heap)
            if u in settled or dist.get(u) != d:
                continue
            settled.add(u)
            work += 1
            if work > budget:
                return None
            for v, w in adj[u]:
                nd = d + w
                if v not in dist or nd < dist[v]:
                    dist[v] = nd
                    heapq.heappush(heap, (nd, v))
        if per_source:
            sv = vals[group[0]]
            out.extend((sv, vals[v], d) for v, d in dist.items())
        else:
            out.extend((vals[v], d) for v, d in dist.items())
    return out


def _driver_coreness(edge_rows):
    """Exact k-core decomposition of a collected canonical edge list on
    the driver: min-degree peel with a lazy-deletion heap, O(E log V).
    The peel is the DEFINITION of coreness, and any min-degree removal
    order yields the same core numbers, so this equals the h-index
    fixpoint exactly (Lü et al. 2016).  Input rows are the
    deduplicated canonical (a < b) undirected edges the distributed
    loop uses; returns (node, core) rows.

    Implementation: the Batagelj–Zaveršnik bucket peel
    (arXiv:cs/0310049) over int-indexed CSR adjacency — O(V + E) with
    no heap, ~3× the r18 lazy-deletion-heap version's speed at the
    suite's 121 k-edge graphs (the heap paid one push per edge
    relaxation).  Nodes are opaque hashables (string/long/struct-tuple
    keys all flow through the index dict)."""
    idx: dict = {}
    ea, eb = [], []
    for r in edge_rows:
        a, b = r[0], r[1]
        ia = idx.get(a)
        if ia is None:
            ia = idx[a] = len(idx)
        ib = idx.get(b)
        if ib is None:
            ib = idx[b] = len(idx)
        ea.append(ia)
        eb.append(ib)
    n = len(idx)
    if n == 0:
        return []
    deg = [0] * n
    for i in ea:
        deg[i] += 1
    for j in eb:
        deg[j] += 1
    start = [0] * (n + 1)
    for v in range(n):
        start[v + 1] = start[v] + deg[v]
    cursor = start[:-1].copy()
    adj = [0] * (2 * len(ea))
    for i, j in zip(ea, eb):
        adj[cursor[i]] = j
        cursor[i] += 1
        adj[cursor[j]] = i
        cursor[j] += 1
    # bucket sort nodes by degree: bin_[d] = first slot of degree-d run
    md = max(deg)
    bin_ = [0] * (md + 2)
    for d in deg:
        bin_[d] += 1
    s = 0
    for d in range(md + 1):
        c = bin_[d]
        bin_[d] = s
        s += c
    vert = [0] * n
    posv = [0] * n
    db = deg.copy()
    for v in range(n):
        posv[v] = bin_[db[v]]
        vert[posv[v]] = v
        bin_[db[v]] += 1
    for d in range(md, 0, -1):
        bin_[d] = bin_[d - 1]
    bin_[0] = 0
    # peel in degree order; db[v] at peel time IS the coreness
    for i in range(n):
        v = vert[i]
        dv = db[v]
        for k in range(start[v], start[v + 1]):
            u = adj[k]
            du = db[u]
            if du > dv:
                pu = posv[u]
                pw = bin_[du]
                w = vert[pw]
                if u != w:
                    posv[u] = pw
                    vert[pu] = w
                    posv[w] = pu
                    vert[pw] = u
                bin_[du] += 1
                db[u] = du - 1
    nodes = list(idx)
    return [(nodes[v], db[v]) for v in range(n)]


def _driver_seeded_reach(edge_rows, seed_vals, keep_root: bool,
                         budget: int = DRIVER_PATH_BUDGET):
    """≥1-hop BFS reachability from a seed set on the driver: one
    multi-source pass (``keep_root=False`` → node list) or one BFS per
    root (``keep_root=True`` → (root, node) pairs).  Returns a row
    list, or None when visited-node work exceeds ``budget``."""
    from collections import deque

    adj: dict = {}
    for r in edge_rows:
        adj.setdefault(r[0], []).append(r[1])

    def bfs(starts):
        reached = set()
        q = deque()
        for s in starts:
            for v in adj.get(s, ()):
                if v not in reached:
                    reached.add(v)
                    q.append(v)
        while q:
            u = q.popleft()
            for v in adj.get(u, ()):
                if v not in reached:
                    reached.add(v)
                    q.append(v)
        return reached

    if not keep_root:
        reached = bfs(seed_vals)
        if len(reached) > budget:
            return None
        return [(v,) for v in reached]
    out = []
    work = 0
    for s in seed_vals:
        reached = bfs([s])
        work += len(reached) + 1
        if work > budget:
            return None
        out.extend((s, v) for v in reached)
    return out


def seeded_reachability(
    edges: DataFrame,
    seeds: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 100,
    checkpoint_dir: str | None = None,
    keep_root: bool = False,
    materialize_edges: bool = True,
    broadcast_seeds: bool = True,
    small_cutoff: int = DRIVER_PATH_EDGES,
) -> DataFrame:
    """Every node reachable in ≥ 1 hop FROM any seed node — the
    ground-endpoint complement of :func:`transitive_closure`: when a
    query grounds one end of a closure (``order:1 pred+ ?x``),
    materializing the FULL all-pairs closure and then filtering is
    O(V²) pairs of wasted work; frontier expansion from the seed is
    O(reachable ∪ incident edges) per round.  The trade is rounds:
    semi-naive BFS runs *diameter* rounds where path doubling runs
    ⌈log₂ d⌉ — but each seeded round touches only frontier-incident
    edges, which at 100 TB wins whenever the reachable set is any
    meaningful fraction smaller than the graph (and real graphs have
    small diameters).

    ``seeds``: one-column DataFrame ``n`` (same type as ``src``/``dst``).
    ``broadcast_seeds`` hints the first-hop join: True (default) for
    the ground-constant case — a literal handful of rows — but callers
    seeding from a COMPUTED frontier (a Seq chain's midpoints, a prior
    pattern's solution set) must pass False and let AQE pick the join
    strategy: force-broadcasting an unbounded frontier risks
    driver/executor OOM at exactly the scale this operator exists to
    win (ADVICE r10).  Returns a
    one-column DataFrame ``n`` of reached nodes (union over seeds, the
    seeds themselves only if they sit on a cycle).  With
    ``keep_root=True`` each row carries its originating seed instead —
    ``(root, n)`` pairs, one per (seed, reached-node) — the provenance
    form the path compiler needs to thread a seed set through composite
    path expressions (per-root work is Σ per-root reachable sets, still
    bounded by the all-pairs closure from above).  Same shared-storage
    ``checkpoint_dir`` contract and :func:`cleanup_closure` handle as
    ``transitive_closure``; the round directory is named
    ``seeded_reach_*`` so plan audits (``explain_query``) can tell a
    seeded evaluation from an all-pairs one by its scan path."""
    spark = edges.sparkSession
    base = _resolve_work_dir(spark, checkpoint_dir)
    head, _, tail = base.rpartition("/closure_")
    base = f"{head}/seeded_reach_{tail}"

    def _materialize(df: DataFrame) -> tuple[DataFrame, str, int]:
        # same write-observed parquet round-trip as transitive_closure:
        # genuine lineage cut + convergence count on one job
        obs = Observation()
        path = f"{base}/{uuid.uuid4().hex}"
        df.observe(obs, F.count(F.lit(1)).alias("n")).write.mode(
            "overwrite"
        ).parquet(path)
        return spark.read.parquet(path), path, int(obs.get["n"])

    keycols = ["root", "n"] if keep_root else ["n"]
    try:
        # edge-set handling (``materialize_edges``): a composite edge
        # relation (Seq/Alt join trees) is written ONCE so every round
        # re-reads parquet instead of re-running its joins; but when the
        # relation is a plain filtered scan of an already-cached triple
        # store, the write is a full-corpus materialization that buys
        # nothing — the caller passes False and each round re-runs the
        # cheap scan instead (rounds × cache-read beats 1 × corpus-write
        # + rounds × read)
        e_lazy = edges.select(
            F.col(src).alias("src"), F.col(dst).alias("dst")
        )
        if materialize_edges:
            # dedup only what gets WRITTEN — parallel edges inflate the
            # one-off parquet round-trip but never the answer (every
            # consumer dedups or min-aggregates its own output)
            e, _, n_edges = _materialize(e_lazy.dropDuplicates())
        else:
            # plain-scan path: memoize the filtered (src, dst)
            # projection in executor storage (r18, guide §2.4/§5): the
            # per-round joins previously re-ran the relation against
            # the full cached triple store — once per Alt branch per
            # round — where the filtered slice is a small fraction of
            # the store.  One eager persist beats rounds × full-store
            # scans, and unlike the parquet materialization (measured
            # wash — docs/TUNING.md) it pays no write/read round-trip
            # or dedup Exchange.  No dedup here either: duplicate
            # edges only produce duplicate frontier-expansion rows,
            # which the per-round frontier dropDuplicates absorbs.
            from ..cache import memo_persist

            e, n_edges = memo_persist(e_lazy), -1  # counted below if the
            # driver tail is attempted; empty sets just produce an empty
            # first frontier and skip the loop
        # driver tail (r18): a counted-small edge set runs the whole BFS
        # in driver memory and writes ONE materialization through the
        # same seeded_reach_* dir (plan/cleanup contract unchanged) —
        # the per-round scheduling floor was the dominant cost of these
        # loops at suite scale (see connected_components' small_cutoff)
        if small_cutoff > 0:
            n_e = n_edges if n_edges >= 0 else e.count()
            if n_edges < 0:
                n_edges = n_e
            if n_e <= small_cutoff:
                seed_rows = seeds.limit(small_cutoff + 1).collect()
                if len(seed_rows) <= small_cutoff:
                    out_rows = _driver_seeded_reach(
                        _collect_rows(e), [r[0] for r in seed_rows], keep_root
                    )
                    if out_rows is not None:
                        from pyspark.sql.types import StructField, StructType

                        fields = [StructField("n", e.schema["dst"].dataType)]
                        if keep_root:
                            fields.insert(
                                0,
                                StructField("root", seeds.schema["n"].dataType),
                            )
                        schema = StructType(fields)
                        out, _, _ = _write_rows_back(
                            spark, out_rows, schema, base, _materialize
                        )
                        out._matcha_closure_path = base  # type: ignore[attr-defined]
                        return out
        seed_side = F.broadcast(seeds) if broadcast_seeds else seeds
        first = e.join(seed_side, e["src"] == seeds["n"], "inner")
        if keep_root:
            first = first.select(
                seeds["n"].alias("root"), F.col("dst").alias("n")
            )
        else:
            first = first.select(F.col("dst").alias("n"))
        frontier, _, n_front = _materialize(first.dropDuplicates())
        known_frames = [frontier]
        if n_front and n_edges:
            for _ in range(max_iter):
                known = known_frames[0]
                for kf in known_frames[1:]:
                    known = known.unionByName(kf)
                step = e.join(frontier, e["src"] == frontier["n"], "inner")
                if keep_root:
                    step = step.select("root", F.col("dst").alias("n"))
                else:
                    step = step.select(F.col("dst").alias("n"))
                nxt = step.dropDuplicates().join(known, keycols, "left_anti")
                frontier, _, n_new = _materialize(nxt)
                if n_new == 0:
                    break
                known_frames.append(frontier)
        out = known_frames[0]
        for kf in known_frames[1:]:
            out = out.unionByName(kf)
        out._matcha_closure_path = base  # type: ignore[attr-defined]
        return out
    except BaseException:
        _fs_delete(spark, base)
        raise


def transitive_closure(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 30,
    checkpoint_dir: str | None = None,
    small_cutoff: int = DRIVER_ALLPAIRS_EDGES,
) -> DataFrame:
    """All reachability pairs ``(src, dst)`` of the directed edge list
    (the ``+`` closure: at least one hop; reflexive pairs only appear on
    actual cycles).

    ``checkpoint_dir``: shared base directory for the per-round parquet
    materialization (see module docstring for the resolution rule).

    ``small_cutoff`` (r18): when the deduplicated edge count (known from
    the first materialization's observed row count — no extra job) is at
    most this, the closure is computed on the driver (SCC + bitset DP,
    :func:`_driver_reach_pairs`) and written back as ONE round — the
    same driver-transfer class as :func:`connected_components`'
    union-find tail; a pair budget falls back to the distributed loop if
    the output would be dense.  Set 0 to force the distributed loop."""
    spark = edges.sparkSession
    base = _resolve_work_dir(spark, checkpoint_dir)

    def _materialize(df: DataFrame) -> tuple[DataFrame, str, int]:
        # parquet round-trip: a genuine lineage cut with *fresh attribute
        # ids* per round.  localCheckpoint trips Spark's LogicalRDD
        # constraint rewriting when the same piece appears on both sides
        # of a later join (dedup'd attrs), and cache() keeps the logical
        # plan — which doubles per round and OOMs the driver stringifying
        # it.  Persisting frontiers is also the production shape: at real
        # graph sizes the frontier belongs in storage, not driver memory.
        # The row count rides along as an observed metric on the SAME
        # write job — convergence costs zero extra jobs per round (each
        # saved job is a full scheduling round-trip; they were ~half the
        # wall time of shallow-graph closures).
        obs = Observation()
        path = f"{base}/{uuid.uuid4().hex}"
        df.observe(obs, F.count(F.lit(1)).alias("n")).write.mode(
            "overwrite"
        ).parquet(path)
        return spark.read.parquet(path), path, int(obs.get["n"])

    try:
        acc, acc_path, n_acc = _materialize(
            edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).dropDuplicates()
        )
        if 0 < n_acc <= small_cutoff:
            pairs = _driver_reach_pairs(_collect_rows(acc))
            if pairs is not None:
                merged, _, _ = _write_rows_back(
                    spark, pairs, acc.schema, base, _materialize
                )
                _fs_delete(spark, acc_path)
                out = merged.select(F.col("src").alias(src), F.col("dst").alias(dst))
                out._matcha_closure_path = base  # type: ignore[attr-defined]
                return out
        # path doubling: each round composes the accumulated reachability
        # with itself, so a diameter-d graph converges in ⌈log₂ d⌉ rounds
        # instead of d — rounds (each a shuffle + materialization barrier)
        # are the dominant cost of iterative algorithms on Spark.  One
        # materialization per round: merged = dedup(acc ∪ acc∘acc), with
        # convergence read off the write-observed row count.
        for _ in range(max_iter):
            nxt = (
                acc.alias("f")
                .join(acc.alias("n"), F.col("f.dst") == F.col("n.src"))
                .select(F.col("f.src").alias("src"), F.col("n.dst").alias("dst"))
            )
            merged, merged_path, n_merged = _materialize(
                acc.union(nxt).dropDuplicates()
            )
            if n_merged == n_acc:
                _fs_delete(spark, merged_path)
                break
            # merged's files are written; the input round is dead — drop it
            _fs_delete(spark, acc_path)
            acc, acc_path, n_acc = merged, merged_path, n_merged
        out = acc.select(F.col("src").alias(src), F.col("dst").alias(dst))
        # the returned DataFrame reads the final round's parquet lazily, so
        # its directory must outlive this call; hand callers the cleanup
        # handle (see cleanup_closure) instead of leaking it silently —
        # repeated closures under one session checkpoint dir would
        # otherwise accumulate orphaned closure_* dirs on shared storage
        out._matcha_closure_path = base  # type: ignore[attr-defined]
        return out
    except BaseException:
        _fs_delete(spark, base)
        raise


def seeded_shortest_paths(
    edges: DataFrame,
    seeds: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
    max_iter: int = 100,
    checkpoint_dir: str | None = None,
    materialize_edges: bool = True,
    broadcast_seeds: bool = True,
    small_cutoff: int = DRIVER_PATH_EDGES,
) -> DataFrame:
    """Shortest distances FROM any seed node — the ground-endpoint
    complement of :func:`shortest_path_lengths`, exactly as
    :func:`seeded_reachability` complements :func:`transitive_closure`
    (same ``broadcast_seeds`` contract too: default True for the
    literal ground-constant case; pass False when seeding from an
    unbounded computed frontier and let AQE pick the join strategy):
    when a query needs distances from ONE node, the all-pairs min-plus
    closure computes O(V²) pairs to keep |seeds| rows of them.

    Semi-naive label-correcting relaxation: the frontier holds only the
    nodes whose distance IMPROVED last round, each round relaxes just
    frontier-incident edges, and the loop converges when no distance
    improves (guaranteed for the required non-negative weights).
    Unweighted (``weight=None``) this is plain BFS — rounds = depth of
    the shortest-path tree.

    ``seeds``: one-column ``n`` DataFrame (tiny by contract, broadcast
    into the first hop).  Returns ``(n, dist)`` — min over seeds, ≥ 1
    hop (a seed appears with its cycle length only if it sits on a
    cycle), hop counts as longs / summed weights as doubles.  Same
    shared-storage ``checkpoint_dir`` and :func:`cleanup_closure`
    contract as the all-pairs form; round dirs are ``seeded_dist_*``
    for plan audits."""
    spark = edges.sparkSession
    base = _resolve_work_dir(spark, checkpoint_dir)
    head, _, tail = base.rpartition("/closure_")
    base = f"{head}/seeded_dist_{tail}"

    def _materialize(df: DataFrame) -> tuple[DataFrame, str, int]:
        obs = Observation()
        path = f"{base}/{uuid.uuid4().hex}"
        df.observe(obs, F.count(F.lit(1)).alias("n")).write.mode(
            "overwrite"
        ).parquet(path)
        return spark.read.parquet(path), path, int(obs.get["n"])

    if weight is not None:
        neg = edges.where(F.col(weight) < 0).limit(1).count()
        if neg:
            _fs_delete(spark, base)
            raise ValueError("seeded_shortest_paths requires non-negative weights")
    try:
        if weight is None:
            e = edges.select(
                F.col(src).alias("src"), F.col(dst).alias("dst")
            ).withColumn("w", F.lit(1).cast("long"))
        else:
            e = edges.select(
                F.col(src).alias("src"),
                F.col(dst).alias("dst"),
                F.col(weight).cast("double").alias("w"),
            )
        if materialize_edges:
            # collapse parallel edges only for the one-off write (see
            # seeded_reachability: duplicates never change a min)
            e, _, n_edges = _materialize(
                e.groupBy("src", "dst").agg(F.min("w").alias("w"))
            )
        else:
            # plain-scan edge relations: memoize the filtered
            # projection once (r18 — see seeded_reachability: rounds ×
            # full-store scans lose to one eager persist of the small
            # filtered slice).  No per-round dedup/pre-min either
            # (r18): every consumer is a min-aggregate, so parallel or
            # duplicate edges cost duplicate candidate rows at most —
            # a dropDuplicates here was one edge-scale Exchange PER
            # ROUND.
            from ..cache import memo_persist

            e, n_edges = memo_persist(e), -1  # counted below if the
            # driver tail is attempted
        # driver tail (r18): counted-small edge set → one multi-source
        # Dijkstra in driver memory (min over seeds, ≥ 1 hop — path
        # sums accumulate in relaxation order exactly as the
        # distributed rounds do), written back as ONE round through the
        # seeded_dist_* dir (plan/cleanup contract unchanged)
        if small_cutoff > 0:
            n_e = n_edges if n_edges >= 0 else e.count()
            if n_edges < 0:
                n_edges = n_e
            if n_e <= small_cutoff:
                seed_rows = seeds.limit(small_cutoff + 1).collect()
                if len(seed_rows) <= small_cutoff:
                    out_rows = _driver_sssp(
                        _collect_rows(e),
                        sources=[r[0] for r in seed_rows],
                        weighted=weight is not None,
                        per_source=False,
                    )
                    if out_rows is not None:
                        from pyspark.sql.types import (
                            DoubleType,
                            LongType,
                            StructField,
                            StructType,
                        )

                        schema = StructType([
                            StructField("n", e.schema["dst"].dataType),
                            StructField(
                                "dist",
                                DoubleType() if weight is not None else LongType(),
                            ),
                        ])
                        out, _, _ = _write_rows_back(
                            spark, out_rows, schema, base, _materialize
                        )
                        out._matcha_closure_path = base  # type: ignore[attr-defined]
                        return out
        seed_side = F.broadcast(seeds) if broadcast_seeds else seeds
        frontier, _, n_front = _materialize(
            e.join(seed_side, e["src"] == seeds["n"], "inner")
            .groupBy(F.col("dst").alias("n"))
            .agg(F.min("w").alias("dist"))
        )
        # r18: the known set is the UNION of every frontier ever written
        # (same design as seeded_reachability's known_frames) — a node's
        # final distance is the min over all its improvement rows, since
        # every improvement lands in a later frontier.  This removes two
        # write jobs per loop (the initial known copy and the per-round
        # merged rewrite, which re-wrote the whole node set every round);
        # per-round work drops to one materialization.  The improvement
        # test rides the raw union as an anti-join: cand improves iff NO
        # known row for the node is already ≤ it — identical to
        # cand.dist < min(known.dist) without aggregating known first.
        known_frames = [frontier]
        if n_front and n_edges:
            for _ in range(max_iter):
                known = known_frames[0]
                for kf in known_frames[1:]:
                    known = known.unionByName(kf)
                cand = (
                    frontier.join(e, frontier["n"] == e["src"], "inner")
                    .groupBy(F.col("dst").alias("n"))
                    .agg(F.min(frontier["dist"] + e["w"]).alias("dist"))
                )
                improved = cand.alias("c").join(
                    known.alias("k"),
                    (F.col("c.n") == F.col("k.n"))
                    & (F.col("k.dist") <= F.col("c.dist")),
                    "left_anti",
                )
                frontier, _, n_new = _materialize(improved)
                if n_new == 0:
                    break
                known_frames.append(frontier)
        out = known_frames[0]
        for kf in known_frames[1:]:
            out = out.unionByName(kf)
        out = out.groupBy("n").agg(F.min("dist").alias("dist"))
        out._matcha_closure_path = base  # type: ignore[attr-defined]
        return out
    except BaseException:
        _fs_delete(spark, base)
        raise


def shortest_path_lengths(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
    max_iter: int = 30,
    checkpoint_dir: str | None = None,
    small_cutoff: int = DRIVER_ALLPAIRS_EDGES,
) -> DataFrame:
    """All-pairs shortest path lengths ``(src, dst, dist)`` over the
    directed edge list — hop counts by default, or summed edge weights
    when ``weight`` names a (non-negative) numeric column; pairs with no
    path are absent; reflexive pairs appear only on actual cycles, with
    the cycle's length.  Negative weights are rejected: min-plus
    squaring over a negative cycle diverges.

    Min-plus path doubling (repeated squaring over the tropical
    semiring): each round keeps, per pair, the minimum of the known
    distance and every two-segment composition — a diameter-d graph
    converges in ⌈log₂ d⌉ rounds, each one equi-join + one min-agg,
    materialized like :func:`transitive_closure` (same shared-storage
    contract; call :func:`cleanup_closure` on the result when done).
    Convergence needs BOTH the pair count and the distance total stable:
    a round can shrink distances without discovering pairs.

    ``small_cutoff`` (r18): with at most this many deduplicated edges
    (the first materialization's observed count — no extra job), the
    distances are computed on the driver — one Dijkstra per source
    over the collected edge list (:func:`_driver_sssp`), written back
    as ONE round; a settled-node work budget falls back to the
    distributed loop on dense reachability.  Driver path sums
    accumulate per-path left-to-right (the relaxation order), which
    the suite's dyadic-weight contract makes exactly equal to the
    doubling composition; hop counts are exact longs either way.  Set
    0 to force the distributed loop."""
    spark = edges.sparkSession
    base = _resolve_work_dir(spark, checkpoint_dir)

    def _materialize(df: DataFrame) -> tuple[DataFrame, str, tuple]:
        # convergence stats (row count + distance total) ride the write
        # job as observed metrics — no separate aggregation job per round
        obs = Observation()
        path = f"{base}/{uuid.uuid4().hex}"
        df.observe(
            obs, F.count(F.lit(1)).alias("n"), F.sum("dist").alias("total")
        ).write.mode("overwrite").parquet(path)
        got = obs.get
        return spark.read.parquet(path), path, (int(got["n"]), got["total"])

    if weight is not None:
        neg = edges.where(F.col(weight) < 0).limit(1).count()
        if neg:
            _fs_delete(spark, base)
            raise ValueError("shortest_path_lengths requires non-negative weights")
    try:
        if weight is None:
            seed = edges.select(
                F.col(src).alias("src"), F.col(dst).alias("dst")
            ).dropDuplicates().withColumn("dist", F.lit(1).cast("long"))
        else:
            # parallel edges collapse to their cheapest weight up front
            seed = (
                edges.select(
                    F.col(src).alias("src"),
                    F.col(dst).alias("dst"),
                    F.col(weight).cast("double").alias("dist"),
                )
                .groupBy("src", "dst")
                .agg(F.min("dist").alias("dist"))
            )
        acc, acc_path, stats = _materialize(seed)
        if 0 < stats[0] <= small_cutoff:
            rows = _collect_rows(acc)
            out_rows = _driver_sssp(
                rows,
                sources=list({r[0] for r in rows}),
                weighted=weight is not None,
                per_source=True,
            )
            if out_rows is not None:
                merged, _, _ = _write_rows_back(
                    spark, out_rows, acc.schema, base, _materialize
                )
                _fs_delete(spark, acc_path)
                out = merged.select(
                    F.col("src").alias(src), F.col("dst").alias(dst), "dist"
                )
                out._matcha_closure_path = base  # type: ignore[attr-defined]
                return out
        for _ in range(max_iter):
            composed = (
                acc.alias("f")
                .join(acc.alias("n"), F.col("f.dst") == F.col("n.src"))
                .select(
                    F.col("f.src").alias("src"),
                    F.col("n.dst").alias("dst"),
                    (F.col("f.dist") + F.col("n.dist")).alias("dist"),
                )
            )
            merged, merged_path, new_stats = _materialize(
                acc.unionByName(composed)
                .groupBy("src", "dst")
                .agg(F.min("dist").alias("dist"))
            )
            if new_stats[0] == stats[0]:
                # same pair count; decide convergence STRUCTURALLY —
                # for weighted graphs the float distance total is not a
                # fixed-point witness (nondeterministic partial-sum
                # ordering can perturb the sum bitwise across rounds,
                # which would burn every remaining round on redundant
                # join+materialize work).  Unweighted distances are
                # exact longs, where the total comparison is free and
                # sound.
                if weight is None:
                    converged = new_stats == stats
                else:
                    converged = (
                        merged.alias("m")
                        .join(acc.alias("a"), ["src", "dst"])
                        .where(F.col("m.dist") < F.col("a.dist"))
                        .limit(1)
                        .count()
                        == 0
                    )
                if converged:
                    _fs_delete(spark, merged_path)
                    break
            _fs_delete(spark, acc_path)
            acc, acc_path, stats = merged, merged_path, new_stats
        out = acc.select(
            F.col("src").alias(src), F.col("dst").alias(dst), "dist"
        )
        out._matcha_closure_path = base  # type: ignore[attr-defined]
        return out
    except BaseException:
        _fs_delete(spark, base)
        raise


def cleanup_closure(result: DataFrame) -> None:
    """Delete the work directory backing a :func:`transitive_closure` /
    :func:`predicate_closure` result, once the caller is done with it
    (has collected it, written it out, or no longer needs it).  The
    DataFrame must not be used afterwards.  Safe to call on any
    DataFrame: a no-op when there is nothing to clean."""
    path = getattr(result, "_matcha_closure_path", None)
    if path:
        _fs_delete(result.sparkSession, path)


def predicate_closure(db, predicate, checkpoint_dir: str | None = None) -> DataFrame:
    """``pred+`` over a triples database: reachability pairs (TERM
    structs ``s``, ``o``) through edges labeled ``predicate``."""
    from ..terms import term_lit

    edges = db.df.where(F.col("p") == term_lit(predicate)).select("s", "o")
    return transitive_closure(edges, src="s", dst="o", checkpoint_dir=checkpoint_dir)


def graph_nodes(db) -> DataFrame:
    """Every *mentioned node* of the graph (each distinct term appearing
    in subject or object position) as a one-column DataFrame ``n`` —
    SPARQL's node set for zero-length path matches."""
    return (
        db.df.select(F.col("s").alias("n"))
        .unionByName(db.df.select(F.col("o").alias("n")))
        .dropDuplicates()
    )


def path_edges(db, path, checkpoint_dir: str | None = None) -> DataFrame:
    """Compile a property-path expression (:mod:`matcha_spark.patterns`
    ``Seq``/``Alt``/``Inv``/``OneOrMore``/``ZeroOrMore``/``ZeroOrOne``,
    or a plain predicate constant) to the DISTINCT ``(s, o)`` TERM-pair
    DataFrame it connects — the S2RDF-style composition: every path
    operator is an equi-join / union / closure over edge sets, so
    Catalyst plans each step and nothing collects to the driver.

    Scale shape per operator:

    - predicate: one pushdown-filtered scan of the triple store;
    - ``Inv``: column swap (free);
    - ``Seq``: one equi-join per step, shuffle-partitioned on the
      midpoint — the same shape as a BGP conjunction;
    - ``Alt``: union of branch scans + one dedup shuffle;
    - ``OneOrMore``: :func:`transitive_closure` (log-round path
      doubling; materializes rounds under ``checkpoint_dir`` — on a
      cluster that must be shared storage, see module docstring).
      **Evaluated eagerly** when the plan is compiled, not lazily;
    - ``ZeroOrMore`` / ``ZeroOrOne``: the above ∪ identity pairs over
      :func:`graph_nodes`;
    - ``NegSet`` (``!(p1|...)``): one scan with a conjunction of
      predicate *inequalities* (+ dedup — distinct excluded predicates
      may connect the same pair).

    SPARQL parity notes: path results are node-pair *sets* (duplicate
    derivations through different midpoints/branches collapse), and
    zero-length paths match every mentioned node with itself.
    """
    from ..patterns import (
        Alt,
        Inv,
        NegSet,
        OneOrMore,
        PathExpr,
        Seq,
        ZeroOrMore,
        ZeroOrOne,
    )
    from ..terms import term_lit

    def compile_(p) -> DataFrame:
        if isinstance(p, Inv):
            inner = compile_(p.path)
            return inner.select(F.col("o").alias("s"), F.col("s").alias("o"))
        if isinstance(p, Seq):
            acc = compile_(p.steps[0])
            for step in p.steps[1:]:
                nxt = compile_(step)
                acc = (
                    acc.select(F.col("s"), F.col("o").alias("__mid"))
                    .join(
                        nxt.select(F.col("s").alias("__mid"), F.col("o")),
                        on="__mid",
                        how="inner",
                    )
                    .select("s", "o")
                    .dropDuplicates()
                )
            return acc
        if isinstance(p, Alt):
            branches = [compile_(b) for b in p.alts]
            acc = branches[0]
            for b in branches[1:]:
                acc = acc.unionByName(b)
            return acc.dropDuplicates() if len(branches) > 1 else acc
        if isinstance(p, OneOrMore):
            return transitive_closure(
                compile_(p.path), src="s", dst="o", checkpoint_dir=checkpoint_dir
            )
        if isinstance(p, (ZeroOrMore, ZeroOrOne)):
            base = (
                transitive_closure(
                    compile_(p.path), src="s", dst="o", checkpoint_dir=checkpoint_dir
                )
                if isinstance(p, ZeroOrMore)
                else compile_(p.path)
            )
            ident = graph_nodes(db).select(
                F.col("n").alias("s"), F.col("n").alias("o")
            )
            return base.unionByName(ident).dropDuplicates()
        if isinstance(p, NegSet):
            cond = F.lit(True)
            for pred in p.preds:
                cond = cond & (F.col("p") != term_lit(pred))
            return db.df.where(cond).select("s", "o").dropDuplicates()
        if isinstance(p, PathExpr):
            raise TypeError(f"unknown path form: {type(p).__name__}")
        # base case: a predicate constant → one filtered scan
        return db.df.where(F.col("p") == term_lit(p)).select("s", "o")

    return compile_(path)


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    iters: int = 10,
    weight: str | None = None,
    sources: DataFrame | None = None,
    broadcast_ranks: bool | None = None,
) -> DataFrame:
    """PageRank over a directed edge list: ``(node, rank)`` after
    ``iters`` synchronous power-iteration rounds with teleportation and
    dangling-mass redistribution (ranks sum to 1).

    ``weight`` names a positive edge-weight column: contributions split
    proportionally to weight (out-strength-normalized) instead of
    uniformly over out-edges.  ``sources`` (personalized PageRank) is a
    one-column DataFrame of node ids: teleportation and dangling mass
    flow back to the source set uniformly instead of to all nodes —
    ranks become proximity-to-sources scores (graph-based relevance).

    Scale shape: each round is one equi-join (edges ⋈ ranks on src,
    out-degree pre-joined once) + one hash aggregate on dst — all
    shuffle-partitioned on the node key; the rank frontier is
    re-persisted per round with its lineage cut (`cut_lineage`) so
    plans stay O(1) deep.  Driver-side traffic is one scalar per round
    (the dangling sum), and since r12 it rides the ranks
    materialization as an ``Observation`` (the dangling flag is a
    static per-node column, so the conditional sum costs nothing) —
    ONE job per round, like ``connected_components`` and
    ``coreness``, instead of a separate anti-join collect.

    Per-round shuffle shape (r18, guide §2.4/§3.1): the contribution
    edge list is memo-persisted PRE-PARTITIONED, so with
    ``broadcast_ranks`` (auto at ``BROADCAST_VALUE_ROWS`` nodes) every
    iteration runs with **zero shuffles**: ranks broadcast into the
    contribution join, the dst-aggregate reuses the edges' cached dst
    partitioning, and the node-scale contribs frame broadcasts into
    the rank update, which becomes a pure scan of the cached flags.
    Without broadcasting (cluster-scale |V|), edges partition on
    ``src`` instead: ranks shuffle node-scale into the join and the
    contribution aggregate exchanges edge-scale — still one edge-scale
    exchange per round instead of the old shape's re-shuffle of the
    edge list AND the flags every iteration."""
    from ..cache import cut_lineage, memo_persist

    wcol = (
        F.col(weight).cast("double") if weight is not None else F.lit(1.0)
    )
    e = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst"), wcol.alias("ew")
    )
    nodes = memo_persist(
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    n = nodes.count()
    if n == 0:
        return nodes.select("node", F.lit(0.0).alias("rank"))
    if broadcast_ranks is None:
        broadcast_ranks = n <= BROADCAST_VALUE_ROWS
    out_deg = e.groupBy("src").agg(F.sum("ew").alias("deg"))
    # contribution edges with the weight/out-strength factor folded in
    # once — partitioned on the aggregate key when ranks broadcast
    # (zero-exchange rounds), on the join key when they don't
    weighted = memo_persist(
        e.join(out_deg, "src")
        .select("src", "dst", (F.col("ew") / F.col("deg")).alias("w"))
        .repartition("dst" if broadcast_ranks else "src")
    )
    if sources is None:
        teleport = nodes.select("node", F.lit(1.0 / n).alias("t"))
    else:
        s = sources.toDF("node").dropDuplicates()
        n_src = s.count()
        if n_src == 0:
            raise ValueError("personalized pagerank needs a non-empty source set")
        teleport = nodes.join(s, "node", "left_semi").select(
            "node", F.lit(1.0 / n_src).alias("t")
        ).unionByName(
            nodes.join(s, "node", "left_anti").select("node", F.lit(0.0).alias("t"))
        )
    # the dangling flag (no out-edges) is static per node — fold it in
    # once so every round's dangling sum is a conditional aggregate the
    # Observation computes for free on the materialization job
    flags = memo_persist(
        teleport.join(
            out_deg.select(F.col("src").alias("node"), F.lit(True).alias("__o")),
            "node",
            "left",
        )
        .select("node", "t", F.col("__o").isNull().alias("dang"))
    )
    dang_sum = F.sum(
        F.when(F.col("dang"), F.col("rank")).otherwise(F.lit(0.0))
    ).alias("dangling")
    obs = Observation()
    ranks = cut_lineage(
        flags.select("node", "dang", F.col("t").alias("rank")).observe(
            obs, dang_sum
        )
    )
    dangling = float(obs.get["dangling"] or 0.0)
    for _ in range(iters):
        rank_side = ranks.select("node", "rank")
        if broadcast_ranks:
            rank_side = F.broadcast(rank_side)
        contribs = (
            weighted.join(rank_side, weighted.src == rank_side["node"])
            .select("dst", (F.col("rank") * F.col("w")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("contrib"))
        )
        if broadcast_ranks:
            # node-scale by construction (one row per in-degree-positive
            # node) — broadcasting it makes the rank update a pure scan
            # of the cached flags: no exchange, no sort
            contribs = F.broadcast(contribs)
        obs = Observation()
        ranks = cut_lineage(
            flags.join(contribs, flags.node == contribs.dst, "left")
            .select(
                "node",
                "dang",
                (
                    (F.lit(1.0 - damping) + F.lit(damping) * F.lit(dangling))
                    * F.col("t")
                    + F.lit(damping) * F.coalesce(F.col("contrib"), F.lit(0.0))
                ).alias("rank"),
            )
            .observe(obs, dang_sum)
        )
        dangling = float(obs.get["dangling"] or 0.0)
    return ranks.select("node", "rank")


def triangle_counts(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    canonical: bool = False,
) -> DataFrame:
    """Per-node triangle counts and local clustering coefficient over
    an UNDIRECTED graph given as a (possibly directed / duplicated /
    self-looped) edge list: ``(node, degree, triangles, lcc)`` with
    ``lcc = 2·triangles / (degree·(degree−1))`` (0 where degree < 2).

    The classic distributed recipe (node-iterator with the
    degree-ordering trick, e.g. Suri & Vassilvitskii 2011, "Counting
    triangles and the curse of the last reducer"): canonicalize each
    undirected edge once (``a < b``), orient every edge from the
    LOWER-(degree, id) endpoint to the higher, build wedges by joining
    oriented out-edges on their pivot, and close each wedge with one
    hash join against the canonical edge set.  The orientation bounds
    every node's out-degree by O(√m) on any graph, so the wedge join —
    the only super-linear step — generates O(m^{3/2}) rows worst-case
    instead of Σ deg² (the "last reducer" hub blowup); all three steps
    are shuffle-partitioned equi-joins, nothing collects.

    Exactly SQL-expressible (same joins in DuckDB), so a suite entry
    can hash-check it end-to-end.

    ``canonical=True`` (r13) promises the input is ALREADY canonical —
    ``src < dst``, deduplicated, self-loop-free, and materialized
    (e.g. the suite's memoized co-order slice): the internal
    canonicalize + dedup shuffle and its second persisted copy of the
    same edge set are skipped, and the wedge/closing joins read the
    caller's frame directly.  The ordering/self-loop half of that
    promise is VERIFIED in-plan (r13 advice): a per-row ``src < dst``
    check compiled into the projection (one JVM comparison inside
    whole-stage codegen — no extra job, no shuffle) raises loudly on
    violation instead of silently inflating degrees and wedges.
    Dedup-ness is NOT checked — detecting duplicates needs exactly the
    groupBy shuffle ``canonical=True`` exists to skip — so duplicated
    input remains the caller's responsibility (pinned for the suite's
    memoized slice by its construction test)."""
    from ..cache import memo_persist

    if canonical:
        ordered = F.col(src) < F.col(dst)
        e = edges.select(
            F.when(ordered, F.col(src))
            .otherwise(
                F.raise_error(
                    F.concat(
                        F.lit(
                            "triangle_counts(canonical=True): edge violates "
                            "src < dst (directed, duplicate-canonical, or "
                            "self-loop input?): "
                        ),
                        F.col(src).cast("string"),
                        F.lit(" -> "),
                        F.col(dst).cast("string"),
                    )
                )
            )
            .alias("a"),
            F.col(dst).alias("b"),
        )
    else:
        e = memo_persist(
            edges.select(
                F.least(F.col(src), F.col(dst)).alias("a"),
                F.greatest(F.col(src), F.col(dst)).alias("b"),
            )
            .where(F.col("a") != F.col("b"))
            .dropDuplicates()
        )
    # degrees via ONE explode pass (a union of two projections would
    # scan e twice), and memo-persisted: the frame feeds the two
    # orientation joins AND the final left join — left lazy, the plan
    # re-ran the degree aggregate once per consumer (observed: ~8
    # copies of this subtree in the r18-before plan, one per union
    # branch per orientation side)
    deg = memo_persist(
        e.select(
            F.explode(F.array(F.col("a"), F.col("b"))).alias("n")
        )
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    # orient edges low→high by (degree, id); broadcast-join degrees if
    # small is Catalyst's call — both sides shuffle on the node key
    da = deg.select(F.col("n").alias("a"), F.col("deg").alias("da"))
    db_ = deg.select(F.col("n").alias("b"), F.col("deg").alias("db"))
    lo_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    oriented = (
        e.join(da, "a")
        .join(db_, "b")
        .select(
            F.when(lo_first, F.col("a")).otherwise(F.col("b")).alias("lo"),
            F.when(lo_first, F.col("b")).otherwise(F.col("a")).alias("hi"),
        )
    )
    w1 = oriented.select(F.col("lo").alias("p"), F.col("hi").alias("x"))
    w2 = oriented.select(F.col("lo").alias("p"), F.col("hi").alias("y"))
    wedges = w1.join(w2, "p").where(F.col("x") < F.col("y"))
    closed = wedges.join(
        e,
        (F.col("x") == F.col("a")) & (F.col("y") == F.col("b")),
        "inner",
    ).select("p", "x", "y")
    # ONE pass over the closed triangles: the old 3-way unionAll
    # re-executed the entire wedge + closing join pipeline once per
    # branch (r18, guide §2.4 — the before plan carried three full
    # copies of the O(m^1.5) join tree); explode emits the same
    # (corner → count 1) multiset from a single execution
    per_node = (
        closed.select(
            F.explode(F.array(F.col("p"), F.col("x"), F.col("y"))).alias("n")
        )
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("triangles"))
    )
    tri = F.coalesce("triangles", F.lit(0))
    lcc = F.when(
        F.col("deg") >= 2,
        F.round(2.0 * tri / (F.col("deg") * (F.col("deg") - 1)), 4),
    ).otherwise(F.lit(0.0))
    return (
        deg.join(per_node, "n", "left")
        .select(
            F.col("n").alias("node"),
            F.col("deg").alias("degree"),
            tri.alias("triangles"),
            lcc.alias("lcc"),
        )
    )


def triangle_count_global(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    p: float = 1.0,
    seed: int = 42,
) -> DataFrame:
    """Global triangle count with an optional DOULION sparsification —
    the 100 TB scale path for :func:`triangle_counts`.  Returns one row
    ``(triangles_est, triangles_sampled, edges_kept, edges_total, p)``.

    With ``p=1`` this is the exact count (identical wedge recipe to
    :func:`triangle_counts`; equals ``sum(triangles)/3`` of that
    output — pinned by pytest).  With ``p<1`` each canonical edge is
    kept independently with probability p BEFORE the wedge join
    (Tsourakakis, Kang, Miller & Faloutsos, KDD 2009, "DOULION:
    counting triangles in massive graphs with a coin"): a triangle
    survives iff all three edges survive (probability p³), so
    ``sampled/p³`` is an unbiased estimator of the true count, while
    the wedge join — the only super-linear step — shrinks by ~p² and
    the closing join probe by ~p.  At 100 TB, p=0.1 buys ~100× off the
    dominant stage for a few percent relative error on non-degenerate
    graphs (variance bounds in the paper).

    Sampling is a pure hash of (edge, seed) — ``xxhash64`` threshold,
    no RNG state — so the estimate is deterministic per seed and
    partition-invariant, the same admission-style determinism as
    ``sample_by_hash`` (operators/text.py); averaging a handful of
    seeds tightens the estimate without re-reading the input (the
    canonical edge set is memo-persisted)."""
    from ..cache import memo_persist

    if not (0.0 < p <= 1.0):
        raise ValueError(f"p must be in (0, 1], got {p}")
    e_all = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .dropDuplicates()
    )
    e_all = memo_persist(e_all)
    if p < 1.0:
        # keep edge iff hash(a,b,seed) lands under p — the unsigned
        # 64-bit hash mapped into [0,1) via its low 53 bits (exact in
        # a double; no modulo bias at these thresholds)
        u = F.pmod(F.xxhash64("a", "b", F.lit(int(seed))), F.lit(2**53)) / F.lit(
            float(2**53)
        )
        e = memo_persist(e_all.where(u < F.lit(float(p))))
    else:
        e = e_all
    # one explode pass for degrees (the union form scanned e per
    # branch, r18 — same change as triangle_counts)
    deg = (
        e.select(F.explode(F.array(F.col("a"), F.col("b"))).alias("n"))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    da = deg.select(F.col("n").alias("a"), F.col("deg").alias("da"))
    db_ = deg.select(F.col("n").alias("b"), F.col("deg").alias("db"))
    lo_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    oriented = (
        e.join(da, "a")
        .join(db_, "b")
        .select(
            F.when(lo_first, F.col("a")).otherwise(F.col("b")).alias("lo"),
            F.when(lo_first, F.col("b")).otherwise(F.col("a")).alias("hi"),
        )
    )
    w1 = oriented.select(F.col("lo").alias("p_"), F.col("hi").alias("x"))
    w2 = oriented.select(F.col("lo").alias("p_"), F.col("hi").alias("y"))
    wedges = w1.join(w2, "p_").where(F.col("x") < F.col("y"))
    closed = wedges.join(
        e, (F.col("x") == F.col("a")) & (F.col("y") == F.col("b")), "inner"
    )
    n_total = e_all.count()
    n_kept = n_total if p == 1.0 else e.count()
    return closed.agg(
        F.round(F.count(F.lit(1)) / F.lit(float(p) ** 3), 2).alias(
            "triangles_est"
        ),
        F.count(F.lit(1)).alias("triangles_sampled"),
        F.lit(int(n_kept)).alias("edges_kept"),
        F.lit(int(n_total)).alias("edges_total"),
        F.lit(float(p)).alias("p"),
    )


# auto-broadcast ceiling for the per-round node-value frame in
# ``coreness`` (r18): one (node, int) row is ~20 B framed, so the
# default caps the per-round broadcast relation around 20 MB — well
# inside executor memory, far under the 8 GB broadcast hard cap.  At
# cluster scale pass ``broadcast_values=False`` (or raise this) when
# |V| exceeds it; the shuffle path stays one edge-scale exchange per
# round instead of two.
BROADCAST_VALUE_ROWS = 1_000_000


def coreness(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 50,
    unroll: int = 2,
    broadcast_values: bool | None = None,
    small_cutoff: int = DRIVER_CORENESS_EDGES,
) -> DataFrame:
    """K-core decomposition over an undirected edge list: ``(node,
    core)`` where ``core`` is the largest k such that the node belongs
    to the k-core (the maximal subgraph of minimum degree k) — the
    classic graph-curation signal (peel low-core noise, keep the dense
    backbone).

    Algorithm: the h-index fixpoint (Lü et al. 2016, "The H-index of a
    network node and its relation to degree and coreness", Nature
    Communications 7:10168 — public result): start from degrees and
    repeatedly set ``c(v) ← H-index of its neighbors' current values``
    (the largest h with ≥ h neighbors valued ≥ h); the sequence is
    monotone non-increasing, bounded by coreness from below, and
    converges to EXACTLY the coreness of every node.  Unlike the
    sequential peel (inherently serial in k), every round is one
    edge⋈values join + one per-node aggregate — shuffle-partitioned on
    the node key, driver traffic one convergence scalar per round (an
    ``Observation`` riding the materialization, like
    :func:`connected_components`).

    The per-node H-index computes from a sorted neighbor-value array
    (``sort_array`` descending + one ``aggregate`` scan) — per-node
    memory is its degree; hub rows carry O(deg) values, the same bound
    as any neighborhood aggregate.  ``max_iter`` is a safety rail: the
    fixpoint provably converges (typically in O(log n)-ish rounds on
    real graphs); exhausting it raises instead of returning a
    not-yet-converged labeling.

    ``unroll`` (r12) folds that many fixpoint STEPS into each
    materialization barrier: wall time on long-tailed convergence is
    dominated by per-round scheduler/checkpoint overhead (~0.15-0.2 s
    each; see docs/TUNING.md on the sf0.1 co-order graph's ~46-round
    tail), and steps inside one linear plan cost only their shuffles.
    Monotonicity makes the batched convergence test exact: values only
    decrease, so "no change across ``unroll`` steps" ⟺ "no change at
    the first of them" — the fixpoint and the result are unchanged.

    Per-round shuffle shape (r18, guide §2.4): the symmetric edge set
    is persisted PRE-PARTITIONED on the per-round join/aggregate key,
    so each h-index step runs with **zero edge-scale exchanges** when
    the node-value frame broadcasts (``broadcast_values``, auto at
    ``BROADCAST_VALUE_ROWS``: join is a broadcast-hash probe of the
    partitioned edges, and the per-node aggregate reuses that same
    partitioning), and exactly one when it doesn't (values shuffle
    node-scale onto the b-partitioned edges; only the aggregate
    re-shuffles edge-scale).  The old shape re-shuffled the edge set
    every single round.  The symmetric set is also built with one
    ``explode`` pass instead of a union of two projections — a union
    would execute the canonicalizing ``dropDuplicates`` once per
    branch."""
    from ..cache import cut_lineage, memo_persist

    # canonical edges materialized ONCE (memo): the degree pass, the
    # broadcast decision, and the partitioned symmetric set below each
    # read the cache instead of re-running the canonicalizing dedup
    e = memo_persist(
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .where(F.col("a") != F.col("b"))
        .select(F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b"))
        .dropDuplicates()
    )
    # driver tail (r18): a counted-small graph peels on the driver —
    # the small_cutoff driver-transfer class of connected_components'
    # union-find (collect ≤ small_cutoff canonical edges; result ≤ one
    # int row per node).  The h-index fixpoint's wall time at suite
    # scale is ~46 rounds of barrier overhead; the min-degree peel
    # computes the identical assignment (it IS the definition of
    # coreness, and the fixpoint provably converges to it) in
    # O(E log V) driver time.  Set 0 to force the distributed fixpoint
    # (the iterative plan-audit budget checks do).
    if small_cutoff > 0 and e.count() <= small_cutoff:
        from pyspark.sql.types import IntegerType, StructField, StructType

        rows = _driver_coreness(_collect_rows(e))
        schema = StructType([
            StructField("node", e.schema["a"].dataType),
            StructField("core", IntegerType()),
        ])
        spark = edges.sparkSession
        return (
            spark.createDataFrame(rows, schema)
            if rows
            else spark.createDataFrame([], schema)
        )
    sym_plan = e.select(
        F.explode(
            F.array(
                F.struct(F.col("a"), F.col("b")),
                F.struct(F.col("b").alias("a"), F.col("a").alias("b")),
            )
        ).alias("e")
    ).select("e.a", "e.b")
    # degrees first (one materialization — the barrier join consumed
    # this subtree a second time when it was left lazy), which also
    # yields |V| for the broadcast decision
    cur = cut_lineage(
        sym_plan.groupBy("a")
        .agg(F.count(F.lit(1)).alias("c"))
        .select(F.col("a").alias("n"), F.col("c"))
    )
    if broadcast_values is None:
        broadcast_values = cur.count() <= BROADCAST_VALUE_ROWS
    # broadcast mode: partition by the AGGREGATE key so the whole step
    # is exchange-free; shuffle mode: partition by the JOIN key so only
    # the aggregate exchanges
    sym = memo_persist(sym_plan.repartition("a" if broadcast_values else "b"))
    h_expr = F.expr(
        "aggregate(sort_array(collect_vals, false), 0, "
        "(h, v) -> CASE WHEN v >= h + 1 THEN h + 1 ELSE h END)"
    )

    def _vals_side(frame):
        side = frame.select(F.col("n").alias("b"), F.col("c").alias("cb"))
        return F.broadcast(side) if broadcast_values else side

    def step(frame):
        vals = sym.join(_vals_side(frame), "b").select(
            F.col("a"), F.col("cb")
        )
        return (
            vals.groupBy("a")
            .agg(F.collect_list("cb").alias("collect_vals"))
            .select(F.col("a").alias("n"), h_expr.alias("c"))
        )

    def advance(frame, k):
        """k fixpoint steps in one linear plan, then one barrier that
        observes the batch-end-vs-batch-start change count."""
        nxt_plan = frame
        for _ in range(k):
            nxt_plan = step(nxt_plan)
        prev_side = frame.select(F.col("n"), F.col("c").alias("prev"))
        if broadcast_values:
            prev_side = F.broadcast(prev_side)
        obs = Observation()
        nxt = cut_lineage(
            nxt_plan.join(prev_side, "n")
            .observe(
                obs,
                F.sum(
                    F.when(F.col("c") != F.col("prev"), 1).otherwise(0)
                ).alias("changed"),
            )
            .select("n", "c")
        )
        return nxt, int(obs.get["changed"] or 0)

    unroll = max(int(unroll), 1)
    steps = 0
    changed = None
    while steps < int(max_iter):
        k = min(unroll, int(max_iter) - steps)
        cur, changed = advance(cur, k)
        steps += k
        if changed == 0:
            return cur.select(F.col("n").alias("node"), F.col("c").alias("core"))
    # One extra single-step confirmation batch (r12 advice): the batch
    # observation compares batch-END against batch-START, so a fixpoint
    # reached INSIDE the final unrolled batch (e.g. converged at step
    # max_iter-1 of max_iter with unroll=2) still reads changed > 0
    # even though the labeling is already exact.  Monotonicity makes
    # the confirmation free of false positives: one more step is a
    # no-op iff the fixpoint was reached, so the safety rail below now
    # fires only on genuinely unconverged runs.
    if steps > 0:
        cur, changed = advance(cur, 1)
        if changed == 0:
            return cur.select(F.col("n").alias("node"), F.col("c").alias("core"))
    raise RuntimeError(
        f"coreness did not converge in max_iter={max_iter} h-index "
        "rounds; raise max_iter"
    )
