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
