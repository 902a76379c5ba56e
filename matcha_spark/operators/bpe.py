"""Byte-pair-encoding tokenizer training and encoding (r10, extended r11).

The missing tokenizer leg of the training-data pipeline: learn a BPE
merge table FROM the corpus and encode the corpus WITH it.  The scale
recipe is the classic one (Sennrich, Haddow & Birch 2016,
arXiv:1508.07909): training never touches the corpus row-by-row — the
only corpus-scale pass is a distributed WORD-FREQUENCY aggregation
(:func:`bpe_word_counts`, one groupBy), and merge learning runs
driver-side over that bounded vocabulary (top ``max_words`` by count —
the standard cap; Zipf makes the tail irrelevant to merge statistics).
Encoding (:func:`bpe_encode`) is an Arrow-batched ``mapInPandas`` with
a per-batch word→tokens memo — Zipf again: a batch of documents
re-encodes mostly repeated words, so the greedy merge loop runs once
per DISTINCT word per batch, not once per occurrence.

Merge learning uses the incremental pair-statistics algorithm (the one
reference BPE trainers use): a pair→count table plus a pair→words
index, updated only for the words a merge actually touches — never a
full recount per merge.

r11 adds the **byte-level** variant production GPT-2-family tokenizers
use (``byte_level=True`` throughout): each word decomposes into its
UTF-8 bytes mapped through a printable-codepoint table (the public
GPT-2 bytes→unicode scheme), so the base alphabet is exactly 256
symbols, EVERY input encodes (no unk possible), and the end-of-word
marker is a private-use codepoint (:data:`BYTE_END`) that cannot occur
in any byte symbol — eliminating the word-level mode's documented
marker-collision caveat.  Special tokens (``<|endoftext|>`` etc.) get
reserved ids after the merges, and :func:`bpe_encode_ids` can inject
one at every document boundary; :func:`bpe_pack` then cuts the
concatenated id stream into fixed context-length training chunks with
the same two-phase distributed prefix sum ``chunk_packing`` uses
(never a single-task global window).
"""

from __future__ import annotations

from collections import Counter, defaultdict

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "bpe_word_counts",
    "bpe_train",
    "bpe_encode",
    "bpe_vocab",
    "bpe_encode_ids",
    "bpe_pack",
    "byte_alphabet",
    "bpe_decode_tokens",
    "bpe_save",
    "bpe_load",
]

# Word-level end-of-word marker.  CAVEAT (documented, r11): a document
# whose normalized text literally contains the substring "</w>" will
# desynchronize any consumer that rebuilds text by replacing the marker
# with a space (the suite oracle's corpus cannot contain it; callers
# with adversarial input should use byte_level=True, whose marker is a
# private-use codepoint no byte symbol can produce).
END = "</w>"

# Byte-level end-of-word marker: a private-use-area codepoint, outside
# the 256-symbol byte alphabet below by construction — marker collision
# is impossible in byte-level mode.
BYTE_END = "\ue000"


def _bytes_to_unicode() -> dict[int, str]:
    """The public GPT-2 byte→printable-codepoint table: bytes that are
    already printable map to themselves; the rest shift to 256+n.  A
    reversible bijection onto 256 distinct codepoints, so merged tokens
    remain plain strings and decode is a per-character map."""
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("\xa1"), ord("\xac") + 1))
        + list(range(ord("\xae"), ord("\xff") + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return {b: chr(c) for b, c in zip(bs, cs)}

_B2U = _bytes_to_unicode()
_U2B = {c: b for b, c in _B2U.items()}


def byte_alphabet() -> list[str]:
    """The sorted 256-symbol byte-level base alphabet (fixed — no data
    dependence, hence no corpus scan to derive it)."""
    return sorted(_B2U.values())


def _word_symbols(word: str, byte_level: bool) -> list[str]:
    """A word's base-symbol sequence including its end-of-word marker."""
    if byte_level:
        return [_B2U[b] for b in word.encode("utf-8")] + [BYTE_END]
    return list(word) + [END]


def bpe_word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Distributed ``(word, count)`` table — the single corpus-scale
    pass of BPE training (lowercased whitespace words, the same
    normalization the shingle/dedup family uses).  One explode + one
    hash aggregate; partial (map-side) aggregation does the heavy
    lifting before the shuffle."""
    toks = F.explode(
        F.filter(
            F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
            lambda x: x != "",
        )
    )
    return (
        docs.select(toks.alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("count"))
    )


def _top_words(word_counts: DataFrame, max_words: int):
    """The bounded driver-side view of the vocabulary every BPE stage
    shares: top ``max_words`` by count, ties broken on the word for
    determinism.  The ONLY collect in the module whose size is
    corpus-dependent, and it is capped by ``limit``."""
    return (
        word_counts.orderBy(F.col("count").desc(), "word")
        .limit(int(max_words))
        .collect()
    )


def bpe_train(
    word_counts: DataFrame,
    num_merges: int = 1000,
    min_freq: int = 2,
    max_words: int = 1_000_000,
    byte_level: bool = False,
) -> list[tuple[str, str]]:
    """Learn an ordered BPE merge list from a ``(word, count)`` table.

    Driver-side by design: the input is the AGGREGATED vocabulary, not
    the corpus — bounded to the top ``max_words`` by count (ties break
    on the word for determinism), which is how production tokenizers
    train at any corpus size.  Words split into base symbols (characters
    or, with ``byte_level=True``, mapped UTF-8 bytes) plus the
    end-of-word marker; each step merges the most frequent adjacent
    symbol pair (ties break on the lexicographically LARGEST pair — an
    arbitrary but fixed rule, deterministic across runs and
    partitionings) and stops early when the best pair falls under
    ``min_freq``.

    Incremental statistics: a merge updates pair counts only for the
    words that CONTAIN the merged pair (pair→words index), so the cost
    is Σ touched-word lengths, not merges × vocabulary."""
    rows = _top_words(word_counts, max_words)
    words: list[list[str]] = [_word_symbols(r["word"], byte_level) for r in rows]
    counts: list[int] = [int(r["count"]) for r in rows]

    pair_counts: Counter = Counter()
    pair_words: defaultdict[tuple, set] = defaultdict(set)
    for i, syms in enumerate(words):
        for pair in zip(syms, syms[1:]):
            pair_counts[pair] += counts[i]
            pair_words[pair].add(i)

    merges: list[tuple[str, str]] = []
    for _ in range(int(num_merges)):
        if not pair_counts:
            break
        best = max(pair_counts.items(), key=lambda kv: (kv[1], kv[0]))[0]
        if pair_counts[best] < min_freq:
            break
        merges.append(best)
        merged = best[0] + best[1]
        for i in list(pair_words[best]):
            syms, n = words[i], counts[i]
            # retract this word's old pair contributions
            for pair in zip(syms, syms[1:]):
                pair_counts[pair] -= n
                if pair_counts[pair] <= 0:
                    del pair_counts[pair]
                pair_words[pair].discard(i)
            # apply the merge left-to-right
            out, j = [], 0
            while j < len(syms):
                if (
                    j + 1 < len(syms)
                    and syms[j] == best[0]
                    and syms[j + 1] == best[1]
                ):
                    out.append(merged)
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            words[i] = out
            # add the new contributions
            for pair in zip(out, out[1:]):
                pair_counts[pair] += n
                pair_words[pair].add(i)
    return merges


def _encode_word(word: str, ranks: dict, byte_level: bool = False) -> list[str]:
    """Greedy BPE encode of one word: repeatedly merge the present pair
    with the lowest merge rank (the standard GPT-2-style apply loop)."""
    syms = _word_symbols(word, byte_level)
    while len(syms) > 1:
        best_rank, best_idx = None, None
        for j in range(len(syms) - 1):
            r = ranks.get((syms[j], syms[j + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_idx = r, j
        if best_idx is None:
            break
        syms[best_idx : best_idx + 2] = [syms[best_idx] + syms[best_idx + 1]]
    return syms


def bpe_decode_tokens(tokens: list[str], byte_level: bool = False) -> str:
    """Rebuild the normalized text from a document's token pieces — the
    lossless-segmentation inverse of :func:`bpe_encode`.  Word-level:
    concatenate and turn each ``</w>`` into a space (subject to the
    documented marker caveat).  Byte-level: per-CHARACTER map back —
    every character of every token is either the marker or one of the
    256 byte symbols, so decode is unambiguous regardless of merges."""
    s = "".join(tokens)
    if not byte_level:
        return s.replace(END, " ").strip()
    out = bytearray()
    for ch in s:
        if ch == BYTE_END:
            out.append(0x20)
        else:
            out.append(_U2B[ch])
    return out.decode("utf-8", errors="strict").strip()


def _words_col(text_col: str):
    return F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"), lambda x: x != ""
    )


def _words_src(docs: DataFrame, text_col: str) -> DataFrame:
    """The ``(doc_id, __words)`` frame both encode kernels consume,
    fanned out first when the input arrives in too few splits (one
    parquet file at bench scale would serialize the whole Python-side
    greedy-merge encode onto one core — guide §2.5/§4; same
    size-derived guard as ``text.cdc_chunks``: a corpus that already
    has enough splits never pays the shuffle, and per-doc output is
    placement-independent so results are multiset-identical)."""
    from .text import _kernel_fanout

    src = docs.select("doc_id", text_col)
    want = _kernel_fanout(src)
    if src.rdd.getNumPartitions() < want:
        src = src.repartition(want)
    return src.select("doc_id", _words_col(text_col).alias("__words"))


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    byte_level: bool = False,
) -> DataFrame:
    """Encode every document with a learned merge list: ``(doc_id,
    tokens array<string>, n_tokens)`` — tokens are the concatenation of
    each (lowercased, whitespace-split) word's BPE pieces, the last
    piece of every word carrying the end-of-word marker, so the token
    stream reconstructs the normalized text exactly
    (:func:`bpe_decode_tokens`; the invariant the suite oracle checks).

    Arrow ``mapInPandas`` with a per-batch word→pieces memo: the greedy
    merge loop runs once per distinct word per batch (Zipf does the
    rest); the merge-rank dict broadcasts inside the closure.

    Word splitting happens IN SPARK with the exact expression
    :func:`bpe_word_counts` trains on — a Python-side ``str.split()``
    would disagree on Unicode whitespace/case edges (Java ``\\s`` is
    ASCII-only, Python's is not; r10 review finding), silently
    desynchronizing the encoder's vocabulary view from the trained
    merges."""
    import pandas as pd

    ranks = {tuple(m): i for i, m in enumerate(merges)}

    def run(batches):
        for pdf in batches:
            memo: dict[str, list[str]] = {}
            ids, toks, ns = [], [], []
            for doc_id, words in zip(pdf["doc_id"], pdf["__words"]):
                pieces: list[str] = []
                for w in words if words is not None else []:
                    enc = memo.get(w)
                    if enc is None:
                        enc = _encode_word(w, ranks, byte_level)
                        memo[w] = enc
                    pieces.extend(enc)
                ids.append(doc_id)
                toks.append(pieces)
                ns.append(len(pieces))
            yield pd.DataFrame(
                {"doc_id": ids, "tokens": toks, "n_tokens": ns}
            )

    id_t = docs.schema["doc_id"].dataType.simpleString()
    return _words_src(docs, text_col).mapInPandas(
        run, schema=f"doc_id {id_t}, tokens array<string>, n_tokens long"
    )


def bpe_vocab(
    merges: list[tuple[str, str]],
    word_counts: DataFrame,
    max_words: int = 1_000_000,
    byte_level: bool = False,
    specials: tuple[str, ...] = (),
) -> DataFrame:
    """Deterministic ``(token, id)`` vocabulary for a merge list: ids
    0.. over the sorted base alphabet, then one id per merge in LEARNED
    ORDER, then one per special token — the convention GPT-2-family
    vocabularies use, and stable across runs because the alphabet
    (sorted), the merges (deterministic training), and the specials
    (caller-ordered) all are.

    Byte-level: the alphabet is the FIXED 256-symbol byte table plus
    the marker — no corpus scan at all.  Word-level: the alphabet
    derives from the same top-``max_words`` slice training sees (the
    merges were learned on those words, so their characters are the
    right base set), and the per-character distinct runs DISTRIBUTED —
    the driver receives only the distinct characters, never the word
    table (r10 verdict: the previous unbounded ``collect()`` of every
    distinct corpus word was a silent driver OOM at web scale)."""
    if byte_level:
        alpha = byte_alphabet() + [BYTE_END]
    else:
        top = (
            word_counts.orderBy(F.col("count").desc(), "word")
            .limit(int(max_words))
        )
        chars = (
            top.select(
                F.explode(
                    F.filter(F.split("word", ""), lambda x: x != "")
                ).alias("ch")
            )
            .distinct()
            .collect()  # bounded by the alphabet size by construction
        )
        alpha = sorted({r["ch"] for r in chars} | {END})
    tokens = alpha + [a + b for a, b in merges] + list(specials)
    if len(set(tokens)) != len(tokens):
        raise ValueError("special tokens collide with learned vocabulary")
    spark = word_counts.sparkSession
    return spark.createDataFrame(
        [(t, i) for i, t in enumerate(tokens)], "token string, id long"
    )


def bpe_encode_ids(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    vocab: DataFrame,
    text_col: str = "text",
    byte_level: bool = False,
    append_special: str | None = None,
    unk_id: int | None = None,
) -> DataFrame:
    """ID-form encoding — what a training loop actually consumes:
    :func:`bpe_encode`'s pieces mapped through the vocabulary,
    ``(doc_id, ids array<long>, n_tokens, n_unk)``.

    Unknown handling: with ``byte_level=True`` unks are IMPOSSIBLE
    (every piece is a concatenation of base-alphabet symbols, all in
    the vocabulary) and ``n_unk`` is always 0.  Word-level, a character
    absent from the vocabulary counts in ``n_unk`` and is either mapped
    to ``unk_id`` (when given — the reserved-unk policy) or dropped
    (the historical default; the caller can filter on ``n_unk > 0``).

    ``append_special`` names a special token (present in ``vocab``,
    e.g. ``<|endoftext|>``) whose id is appended at the END of every
    document — the document-boundary injection a packed pretraining
    stream needs; it counts in ``n_tokens``.

    The vocab ships as a plain dict inside the Arrow kernel
    (vocabularies are ≤ a few hundred thousand entries by construction
    — alphabet + one token per merge + specials)."""
    import pandas as pd

    vmap = {r["token"]: int(r["id"]) for r in vocab.collect()}
    sp_id = None
    if append_special is not None:
        if append_special not in vmap:
            raise ValueError(f"special token {append_special!r} not in vocab")
        sp_id = vmap[append_special]
    ranks = {tuple(m): i for i, m in enumerate(merges)}

    def run(batches):
        for pdf in batches:
            memo: dict[str, list] = {}
            out_ids, out_tok, out_n, out_unk = [], [], [], []
            for doc_id, words in zip(pdf["doc_id"], pdf["__words"]):
                ids: list[int] = []
                unk = 0
                for w in words if words is not None else []:
                    enc = memo.get(w)
                    if enc is None:
                        enc = [
                            vmap.get(p) for p in _encode_word(w, ranks, byte_level)
                        ]
                        memo[w] = enc
                    for v in enc:
                        if v is None:
                            unk += 1
                            if unk_id is not None:
                                ids.append(unk_id)
                        else:
                            ids.append(v)
                if sp_id is not None:
                    ids.append(sp_id)
                out_ids.append(doc_id)
                out_tok.append(ids)
                out_n.append(len(ids))
                out_unk.append(unk)
            yield pd.DataFrame(
                {
                    "doc_id": out_ids,
                    "ids": out_tok,
                    "n_tokens": out_n,
                    "n_unk": out_unk,
                }
            )

    id_t = docs.schema["doc_id"].dataType.simpleString()
    return _words_src(docs, text_col).mapInPandas(
        run, schema=f"doc_id {id_t}, ids array<long>, n_tokens long, n_unk long"
    )


def bpe_pack(
    ids_df: DataFrame,
    ctx_len: int = 2048,
    num_parts: int | None = None,
) -> DataFrame:
    """Cut the corpus's concatenated token-id stream (documents laid
    end-to-end in ``doc_id`` order) into fixed ``ctx_len`` training
    chunks — the "tokenize → pack to context length" step of a
    pretraining pipeline; documents straddle chunk boundaries (that is
    the point of injecting ``<|endoftext|>`` boundaries upstream).

    Input: :func:`bpe_encode_ids` output (``doc_id, ids, n_tokens``).
    Output: ``(chunk_id, ids array<long>, n_tokens)``, every chunk
    exactly ``ctx_len`` tokens except possibly the last.  Deterministic:
    a pure function of the corpus, independent of partitioning.

    Scale shape — same two-phase distributed prefix sum as
    ``chunk_packing`` (matcha_spark/operators/text.py): range-partition
    by ``doc_id``, per-partition token totals (one tiny row per
    partition) collect and return as broadcast base offsets, running
    sum as a partition-LOCAL window, then a narrow per-doc slice
    explosion and one groupBy(chunk) to assemble chunks — never a
    single-task global window, and chunk assembly shuffles each token
    id exactly once."""
    from pyspark.sql import Window

    from ..cache import cut_lineage

    if ctx_len < 1:
        raise ValueError("ctx_len must be >= 1")
    spark = ids_df.sparkSession
    d = ids_df.select("doc_id", "ids", F.size("ids").alias("n")).where(
        F.col("n") > 0
    )
    parts = num_parts or int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    # lineage cut pins one repartitionByRange boundary draw for both
    # the totals pass and the main pass (same rationale as
    # chunk_packing)
    d = cut_lineage(
        d.repartitionByRange(parts, "doc_id").withColumn(
            "__pid", F.spark_partition_id()
        )
    )
    totals = d.groupBy("__pid").agg(F.sum("n").alias("t")).collect()
    acc, base = 0, []
    for row in sorted(totals, key=lambda r: r["__pid"]):
        base.append((row["__pid"], acc))
        acc += row["t"]
    base_df = spark.createDataFrame(base or [(0, 0)], "__pid int, __base long")
    w = (
        Window.partitionBy("__pid")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    off = F.col("__base") + F.coalesce(F.sum("n").over(w), F.lit(0))
    c = int(ctx_len)
    spans = d.join(F.broadcast(base_df), "__pid").select(
        "doc_id", "ids", "n", off.alias("__off")
    )
    # one row per (chunk, doc) incidence, carrying the in-doc id slice
    # that lands in the chunk
    inc = spans.select(
        "doc_id",
        "ids",
        "n",
        "__off",
        F.explode(
            F.sequence(
                (F.col("__off") / c).cast("long"),
                ((F.col("__off") + F.col("n") - 1) / c).cast("long"),
            )
        ).alias("chunk_id"),
    ).select(
        "chunk_id",
        "doc_id",
        F.slice(
            "ids",
            (
                F.greatest(F.col("chunk_id") * c, F.col("__off"))
                - F.col("__off")
                + 1
            ).cast("int"),
            (
                F.least((F.col("chunk_id") + 1) * c, F.col("__off") + F.col("n"))
                - F.greatest(F.col("chunk_id") * c, F.col("__off"))
            ).cast("int"),
        ).alias("piece"),
    )
    return (
        inc.groupBy("chunk_id")
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("doc_id", "piece"))
                    ),
                    lambda s: s["piece"],
                )
            ).alias("ids")
        )
        .select("chunk_id", "ids", F.size("ids").cast("long").alias("n_tokens"))
    )


def _fs_write_text(path: str, text: str, spark=None) -> None:
    """Write a small text artifact to ``path`` — through the session's
    Hadoop FS when a session is around (so the path may live on
    whatever shared storage the cluster mounts, next to the corpus),
    plain ``open()`` otherwise."""
    if spark is None:
        from pyspark.sql import SparkSession

        spark = SparkSession.getActiveSession()
    if spark is None:
        with open(path, "w", encoding="utf-8") as f:
            f.write(text)
        return
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    out = fs.create(hpath, True)
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()


def _fs_read_text(path: str, spark=None) -> str:
    if spark is None:
        from pyspark.sql import SparkSession

        spark = SparkSession.getActiveSession()
    if spark is None:
        with open(path, encoding="utf-8") as f:
            return f.read()
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    stream = fs.open(hpath)
    try:
        ioutils = jvm.org.apache.hadoop.io.IOUtils
        baos = jvm.java.io.ByteArrayOutputStream()
        ioutils.copyBytes(stream, baos, 65536, False)
        return bytes(baos.toByteArray()).decode("utf-8")
    finally:
        stream.close()


def bpe_save(
    path: str,
    merges: list[tuple[str, str]],
    vocab: DataFrame | None = None,
    byte_level: bool = False,
    specials: tuple[str, ...] = (),
) -> None:
    """Persist the tokenizer as ONE JSON artifact — merges in learned
    order, the optional ``(token, id)`` vocabulary, the byte-level
    flag, and the special tokens.  The artifact is small by
    construction (alphabet + one entry per merge + specials — a few MB
    for production-sized vocabularies), so a single driver-side file
    is the right shape; it writes through the session's Hadoop FS so
    the path may live on shared storage next to the corpus (the same
    reasoning as the streaming dedup signature store).

    The encode stage of a later job — or another cluster — rebuilds
    the exact tokenizer with :func:`bpe_load`: ids only come from the
    saved table, never re-derived, so two jobs can never disagree on
    the id of a token."""
    import json as _json

    doc = {
        "format": "matcha_spark.bpe.v1",
        "byte_level": bool(byte_level),
        "specials": list(specials),
        "merges": [list(m) for m in merges],
        "vocab": (
            None
            if vocab is None
            else [[r["token"], r["id"]] for r in vocab.orderBy("id").collect()]
        ),
    }
    spark = vocab.sparkSession if vocab is not None else None
    _fs_write_text(path, _json.dumps(doc, ensure_ascii=False), spark)


def bpe_load(path: str, spark: SparkSession | None = None) -> dict:
    """Load a :func:`bpe_save` artifact.  Returns ``{"merges",
    "byte_level", "specials", "vocab"}`` — ``merges`` as the list of
    tuples every encode entry point takes, ``vocab`` as the ``(token,
    id)`` DataFrame :func:`bpe_encode_ids` consumes (``None`` when the
    artifact was saved without one, or when no session is available
    to build the frame)."""
    import json as _json

    doc = _json.loads(_fs_read_text(path, spark))
    if doc.get("format") != "matcha_spark.bpe.v1":
        raise ValueError(f"not a bpe artifact: {path}")
    if spark is None:
        from pyspark.sql import SparkSession as _S

        spark = _S.getActiveSession()
    vocab = None
    if doc["vocab"] is not None and spark is not None:
        vocab = spark.createDataFrame(
            [(t, int(i)) for t, i in doc["vocab"]], "token string, id long"
        )
    return {
        "merges": [tuple(m) for m in doc["merges"]],
        "byte_level": bool(doc["byte_level"]),
        "specials": tuple(doc["specials"]),
        "vocab": vocab,
    }
