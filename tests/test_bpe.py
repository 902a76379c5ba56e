"""BPE tokenizer training/encoding (r10): hand-computed merge
sequences, determinism, greedy-encode behavior, and the lossless
reconstruction invariant the suite oracle checks."""

import pytest

from matcha_spark.operators.bpe import (
    END,
    _encode_word,
    bpe_encode,
    bpe_train,
    bpe_word_counts,
)


def test_train_hand_computed(spark):
    wc = spark.createDataFrame(
        [("abab", 10), ("ab", 3)], "word string, count long"
    )
    merges = bpe_train(wc, num_merges=10, min_freq=1)
    # (a,b) 23 > (b,a) 10, (b,</w>) 13; then (ab,</w>) 13 > (ab,ab) 10;
    # then (ab, ab</w>) 10; nothing else reaches min_freq meaningfully
    assert merges[:3] == [("a", "b"), ("ab", END), ("ab", "ab" + END)]


def test_train_min_freq_and_determinism(spark):
    rows = [(w, n) for w, n in [("lowest", 5), ("newest", 7), ("low", 4)]]
    wc = spark.createDataFrame(rows, "word string, count long")
    m1 = bpe_train(wc, num_merges=50, min_freq=2)
    m2 = bpe_train(wc.repartition(5), num_merges=50, min_freq=2)
    assert m1 == m2 and len(m1) > 0
    # a high floor stops early
    assert len(bpe_train(wc, num_merges=50, min_freq=100)) == 0


def test_encode_word_greedy():
    merges = [("a", "b"), ("ab", END), ("ab", "ab" + END)]
    ranks = {m: i for i, m in enumerate(merges)}
    assert _encode_word("abab", ranks) == ["abab" + END]
    assert _encode_word("ab", ranks) == ["ab" + END]
    # unseen characters stay as single symbols
    assert _encode_word("abc", ranks) == ["ab", "c", END]


def test_encode_reconstruction_invariant(spark):
    docs = spark.createDataFrame(
        [
            (1, "The cat sat  ON the mat"),
            (2, "a cat and a dog and a cat"),
            (3, "completely unseen wordforms zzz"),
        ],
        "doc_id long, text string",
    )
    merges = bpe_train(bpe_word_counts(docs), num_merges=30, min_freq=1)
    out = {r.doc_id: list(r.tokens) for r in bpe_encode(docs, merges).collect()}
    for did, text in [(1, "the cat sat on the mat"),
                      (2, "a cat and a dog and a cat"),
                      (3, "completely unseen wordforms zzz")]:
        rebuilt = "".join(out[did]).replace(END, " ").strip()
        assert rebuilt == text, (did, out[did])
        # every word ends with exactly one end-of-word marker
        assert "".join(out[did]).count(END) == len(text.split())


def test_encode_split_matches_training_split(spark):
    """r10 review finding: encoding must tokenize with the SAME
    (Spark-side, ASCII-\\s) split the trainer counts with — a
    non-breaking space is NOT a separator for either side."""
    docs = spark.createDataFrame(
        [(1, "foo bar foo bar baz")], "doc_id long, text string"
    )
    wc = {r.word: r["count"] for r in bpe_word_counts(docs).collect()}
    assert wc == {"foo bar": 2, "baz": 1}
    merges = bpe_train(bpe_word_counts(docs), num_merges=40, min_freq=1)
    out = bpe_encode(docs, merges).collect()[0]
    rebuilt = "".join(out.tokens).replace(END, " ").strip()
    assert rebuilt == "foo bar foo bar baz"


def test_vocab_and_id_encoding_roundtrip(spark):
    """ids decode back to the exact token pieces through the vocab, and
    unseen characters count as unks instead of crashing."""
    docs = spark.createDataFrame(
        [(1, "ab abab ab"), (2, "abq")], "doc_id long, text string"
    )
    from matcha_spark.operators.bpe import bpe_encode_ids, bpe_vocab

    wc = bpe_word_counts(docs.where("doc_id = 1"))  # train WITHOUT 'q'
    merges = bpe_train(wc, num_merges=10, min_freq=1)
    vocab = bpe_vocab(merges, wc)
    inv = {r.id: r.token for r in vocab.collect()}
    assert len(inv) == len(set(inv.values()))  # ids are a bijection
    out = {r.doc_id: r for r in bpe_encode_ids(docs, merges, vocab).collect()}
    # doc 1: fully in-vocab; decoding ids rebuilds the text
    toks = [inv[i] for i in out[1].ids]
    assert "".join(toks).replace(END, " ").strip() == "ab abab ab"
    assert out[1].n_unk == 0 and out[1].n_tokens == len(out[1].ids)
    # doc 2: 'q' was never seen at training time -> one unk, rest kept
    assert out[2].n_unk == 1
    assert "".join(inv[i] for i in out[2].ids).replace(END, " ").strip() == "ab"


@pytest.mark.parametrize("seed", range(6))
def test_bpe_random_property(spark, seed):
    """Property battery over random tiny corpora: training is
    partitioning-deterministic, every emitted piece is either in the
    learned vocabulary or a base symbol, and encoding always
    reconstructs the normalized text."""
    import random as _r

    rng = _r.Random(9100 + seed)
    alphabet = "abcde"
    words = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 6)))
        for _ in range(rng.randint(3, 10))
    ]
    texts = [
        " ".join(rng.choice(words) for _ in range(rng.randint(1, 8)))
        for _ in range(6)
    ]
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    wc = bpe_word_counts(docs)
    merges = bpe_train(wc, num_merges=rng.randint(0, 25), min_freq=1)
    assert merges == bpe_train(wc.repartition(3), num_merges=len(merges) or 0,
                               min_freq=1)[: len(merges)]
    vocab_tokens = {a + b for a, b in merges} | set(alphabet) | {END}
    out = {r.doc_id: list(r.tokens) for r in bpe_encode(docs, merges).collect()}
    for i, text in enumerate(texts):
        assert all(t in vocab_tokens for t in out[i]), (merges, out[i])
        rebuilt = "".join(out[i]).replace(END, " ").strip()
        assert rebuilt == " ".join(text.split())


# --------------------------------------------------------------------------
# r11: byte-level mode, bounded vocab, special tokens, packing
# --------------------------------------------------------------------------

from matcha_spark.operators.bpe import (  # noqa: E402
    BYTE_END,
    bpe_decode_tokens,
    bpe_encode_ids,
    bpe_pack,
    bpe_vocab,
    byte_alphabet,
)


def test_byte_alphabet_shape():
    a = byte_alphabet()
    assert len(a) == 256 and len(set(a)) == 256
    assert all(len(c) == 1 for c in a)
    assert BYTE_END not in a  # marker is outside the byte alphabet


def test_byte_level_roundtrip_never_unks(spark):
    """Byte-level mode encodes EVERY input — including characters never
    seen in training — with zero unks, and decodes losslessly."""
    docs = spark.createDataFrame(
        [
            (1, "the cat sat"),
            (2, "café naïve €100"),  # multi-byte UTF-8
            (3, "text with a literal </w> marker inside"),
        ],
        "doc_id long, text string",
    )
    train = docs.where("doc_id = 1")  # vocab trained WITHOUT docs 2-3
    wc = bpe_word_counts(train)
    merges = bpe_train(wc, num_merges=20, min_freq=1, byte_level=True)
    vocab = bpe_vocab(merges, wc, byte_level=True)
    out = {
        r.doc_id: r
        for r in bpe_encode_ids(
            docs, merges, vocab, byte_level=True
        ).collect()
    }
    inv = {r.id: r.token for r in vocab.collect()}
    for did, norm in [
        (1, "the cat sat"),
        (2, "café naïve €100"),
        (3, "text with a literal </w> marker inside"),
    ]:
        assert out[did].n_unk == 0
        toks = [inv[i] for i in out[did].ids]
        assert bpe_decode_tokens(toks, byte_level=True) == norm, did


def test_word_level_marker_caveat_vs_byte_level(spark):
    """The documented word-level caveat: literal '</w>' in text breaks
    the replace-with-space rebuild; byte-level does not."""
    docs = spark.createDataFrame(
        [(1, "a</w>b c")], "doc_id long, text string"
    )
    out = bpe_encode(docs, [], text_col="text").collect()[0]
    assert bpe_decode_tokens(list(out.tokens)) != "a</w>b c"  # word-level: lossy
    wc = bpe_word_counts(docs)
    merges = bpe_train(wc, num_merges=5, min_freq=1, byte_level=True)
    vocab = bpe_vocab(merges, wc, byte_level=True)
    r = bpe_encode_ids(docs, merges, vocab, byte_level=True).collect()[0]
    inv = {x.id: x.token for x in vocab.collect()}
    assert bpe_decode_tokens([inv[i] for i in r.ids], byte_level=True) == "a</w>b c"


def test_vocab_bounded_collect_matches_old_path(spark):
    """r10 verdict ask: the distributed-alphabet vocab must equal the
    old unbounded-collect derivation on the same corpus."""
    docs = spark.createDataFrame(
        [(1, "the quick brown fox"), (2, "jumps over the lazy dog")],
        "doc_id long, text string",
    )
    wc = bpe_word_counts(docs)
    merges = bpe_train(wc, num_merges=15, min_freq=1)
    vocab = {(r.token, r.id) for r in bpe_vocab(merges, wc).collect()}
    # old path, replayed literally
    alpha = {END}
    for r in wc.select("word").collect():
        alpha.update(r["word"])
    tokens = sorted(alpha) + [a + b for a, b in merges]
    assert vocab == {(t, i) for i, t in enumerate(tokens)}


def test_vocab_alphabet_respects_max_words(spark):
    """The alphabet derives from the top-max_words slice training sees,
    not from the full word table."""
    wc = spark.createDataFrame(
        [("aa", 100), ("zz", 1)], "word string, count long"
    )
    toks = {r.token for r in bpe_vocab([], wc, max_words=1).collect()}
    assert toks == {"a", END}  # 'z' never reaches the driver


def test_specials_and_unk_id(spark):
    docs = spark.createDataFrame(
        [(1, "ab ab"), (2, "aq")], "doc_id long, text string"
    )
    wc = bpe_word_counts(docs.where("doc_id = 1"))
    merges = bpe_train(wc, num_merges=5, min_freq=1)
    vocab = bpe_vocab(merges, wc, specials=("<|endoftext|>", "<|unk|>"))
    vmap = {r.token: r.id for r in vocab.collect()}
    # specials take the last ids, in caller order
    n = vocab.count()
    assert vmap["<|endoftext|>"] == n - 2 and vmap["<|unk|>"] == n - 1
    out = {
        r.doc_id: r
        for r in bpe_encode_ids(
            docs,
            merges,
            vocab,
            append_special="<|endoftext|>",
            unk_id=vmap["<|unk|>"],
        ).collect()
    }
    assert out[1].ids[-1] == vmap["<|endoftext|>"]
    assert out[1].n_unk == 0 and out[1].n_tokens == len(out[1].ids)
    # 'q' unseen -> mapped to the reserved unk id, not dropped
    assert out[2].n_unk == 1 and vmap["<|unk|>"] in out[2].ids
    import pytest as _pt

    with _pt.raises(ValueError):
        bpe_encode_ids(docs, merges, vocab, append_special="<|nope|>")


def test_bpe_pack_tiling_and_content(spark):
    """Packed chunks tile the concatenated id stream exactly: all
    chunks ctx_len long except possibly the last, order preserved,
    content equal to the doc_id-ordered concatenation — and the result
    is partitioning-independent."""
    import random

    rng = random.Random(1107)
    docs = spark.createDataFrame(
        [
            (i, " ".join(rng.choice("ab abc q xyz".split())
                         for _ in range(rng.randint(0, 9))))
            for i in range(20)
        ],
        "doc_id long, text string",
    )
    wc = bpe_word_counts(docs)
    merges = bpe_train(wc, num_merges=8, min_freq=1, byte_level=True)
    vocab = bpe_vocab(merges, wc, byte_level=True, specials=("<|endoftext|>",))
    enc = bpe_encode_ids(
        docs, merges, vocab, byte_level=True, append_special="<|endoftext|>"
    )
    stream = []
    for r in sorted(enc.collect(), key=lambda r: r.doc_id):
        stream.extend(r.ids)
    for ctx in (1, 7, 64, 10_000):
        chunks = sorted(
            bpe_pack(enc, ctx_len=ctx, num_parts=5).collect(),
            key=lambda r: r.chunk_id,
        )
        assert [c.chunk_id for c in chunks] == list(range(len(chunks)))
        got = [i for c in chunks for i in c.ids]
        assert got == stream, ctx
        assert all(c.n_tokens == ctx for c in chunks[:-1])
        assert 0 < chunks[-1].n_tokens <= ctx
    # partitioning-independence
    alt = sorted(
        bpe_pack(enc.repartition(13), ctx_len=7, num_parts=3).collect(),
        key=lambda r: r.chunk_id,
    )
    assert [i for c in alt for i in c.ids] == stream


@pytest.mark.parametrize("seed", range(4))
def test_bpe_byte_level_random_property(spark, seed):
    """Byte-level property battery: training deterministic under
    repartitioning, zero unks always, decode reconstructs the
    normalized text for arbitrary (including non-ASCII) corpora."""
    import random as _r

    rng = _r.Random(1100 + seed)
    alphabet = "abé中!"
    words = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 5)))
        for _ in range(rng.randint(3, 8))
    ]
    texts = [
        " ".join(rng.choice(words) for _ in range(rng.randint(1, 7)))
        for _ in range(5)
    ]
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    wc = bpe_word_counts(docs)
    merges = bpe_train(wc, num_merges=rng.randint(0, 20), min_freq=1,
                       byte_level=True)
    assert merges == bpe_train(
        wc.repartition(3), num_merges=len(merges) or 0, min_freq=1,
        byte_level=True,
    )[: len(merges)]
    vocab = bpe_vocab(merges, wc, byte_level=True)
    inv = {r.id: r.token for r in vocab.collect()}
    out = {
        r.doc_id: r
        for r in bpe_encode_ids(docs, merges, vocab, byte_level=True).collect()
    }
    for i, text in enumerate(texts):
        assert out[i].n_unk == 0
        norm = " ".join(text.lower().split())
        assert bpe_decode_tokens(
            [inv[j] for j in out[i].ids], byte_level=True
        ) == norm


def test_bpe_encode_string_doc_ids(spark):
    """The encode kernels adopt the input's doc_id type (string-keyed
    corpora from the JSONL/WARC sources flow straight in)."""
    from matcha_spark.operators.bpe import bpe_encode_ids, bpe_vocab

    docs = spark.createDataFrame(
        [("w-1", "abab ab"), ("w-2", "ab")], "doc_id string, text string"
    )
    merges = bpe_train(bpe_word_counts(docs), num_merges=5, min_freq=1)
    enc = bpe_encode(docs, merges)
    assert enc.schema["doc_id"].dataType.simpleString() == "string"
    got = {r.doc_id: r.n_tokens for r in enc.collect()}
    assert set(got) == {"w-1", "w-2"} and all(n > 0 for n in got.values())
    vocab = bpe_vocab(merges, bpe_word_counts(docs))
    ids = bpe_encode_ids(docs, merges, vocab)
    assert ids.schema["doc_id"].dataType.simpleString() == "string"
    assert {r.doc_id for r in ids.collect()} == {"w-1", "w-2"}


def test_bpe_save_load_roundtrip(spark, tmp_path):
    """The tokenizer artifact reproduces the exact tokenizer: merges in
    learned order, vocabulary ids byte-identical, flags preserved —
    encode-with-loaded equals encode-with-trained."""
    from matcha_spark.operators.bpe import (
        bpe_encode_ids,
        bpe_load,
        bpe_save,
        bpe_vocab,
    )

    docs = spark.createDataFrame(
        [(1, "abab ab abba"), (2, "ab café ab")],
        "doc_id long, text string",
    )
    wc = bpe_word_counts(docs)
    merges = bpe_train(wc, num_merges=8, min_freq=1, byte_level=True)
    vocab = bpe_vocab(merges, wc, byte_level=True, specials=("<|eot|>",))
    path = str(tmp_path / "tok.json")
    bpe_save(path, merges, vocab, byte_level=True, specials=("<|eot|>",))

    tok = bpe_load(path, spark)
    assert tok["merges"] == merges
    assert tok["byte_level"] is True and tok["specials"] == ("<|eot|>",)
    want = {(r.token, r.id) for r in vocab.collect()}
    got = {(r.token, r.id) for r in tok["vocab"].collect()}
    assert got == want

    a = {r.doc_id: list(r.ids) for r in bpe_encode_ids(
        docs, merges, vocab, byte_level=True).collect()}
    b = {r.doc_id: list(r.ids) for r in bpe_encode_ids(
        docs, tok["merges"], tok["vocab"], byte_level=True).collect()}
    assert a == b


def test_bpe_save_load_no_vocab_and_bad_format(spark, tmp_path):
    from matcha_spark.operators.bpe import bpe_load, bpe_save

    path = str(tmp_path / "m.json")
    bpe_save(path, [("a", "b")])
    tok = bpe_load(path, spark)
    assert tok["merges"] == [("a", "b")] and tok["vocab"] is None
    assert tok["byte_level"] is False and tok["specials"] == ()

    bad = tmp_path / "bad.json"
    bad.write_text('{"format": "something-else"}')
    with pytest.raises(ValueError):
        bpe_load(str(bad), spark)
