"""BPE tokenizer training: vectorized kernel vs a sequential
dict-based reference (Sennrich-style: string-keyed stats, greedy
left-to-right replacement, tie-break (count desc, left-id, right-id)
with creation-ordered symbol ids), plus the distributed fold and the
corpus-wide application stage."""

import random

import numpy as np
import pyarrow as pa

from merge_machine_ray.stages.bpe import (
    END_WORD,
    apply_merges,
    bpe_token_counts,
    learn_bpe,
    learn_merges,
    pair_count_partial,
    partial_word_counts,
)


def _ref_learn(word_counts, num_merges, min_pair_count=2):
    """Sequential reference. Returns (merges, final_vocab) where
    final_vocab maps word -> list of symbol strings."""
    vocab = {w: list(w) + [END_WORD] for w in word_counts}
    chars = sorted({c for w in word_counts for c in w})
    sym_id = {s: i for i, s in enumerate(chars + [END_WORD])}
    merges = []
    for rank in range(1, num_merges + 1):
        stats = {}
        for w, c in word_counts.items():
            seq = vocab[w]
            for i in range(len(seq) - 1):
                p = (seq[i], seq[i + 1])
                stats[p] = stats.get(p, 0) + c
        if not stats:
            break
        best = max(stats.values())
        if best < min_pair_count:
            break
        left, right = min(
            (p for p, c in stats.items() if c == best),
            key=lambda p: (sym_id[p[0]], sym_id[p[1]]))
        merged = left + right
        merges.append((rank, left, right, merged, best))
        if merged not in sym_id:
            sym_id[merged] = len(sym_id)
        for w, seq in vocab.items():
            out, i = [], 0
            while i < len(seq):
                if (i + 1 < len(seq) and seq[i] == left
                        and seq[i + 1] == right):
                    out.append(merged)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            vocab[w] = out
    return merges, vocab


def _random_word_counts(seed, n_words=60):
    rng = random.Random(seed)
    alpha = "abcde01"
    wc = {}
    for _ in range(n_words):
        w = "".join(rng.choice(alpha)
                    for _ in range(rng.randint(1, 10)))
        wc[w] = wc.get(w, 0) + rng.randint(1, 20)
    # force self-overlap runs into every corpus
    wc["aaaa"] = wc.get("aaaa", 0) + rng.randint(2, 9)
    wc["aaaaaaa"] = wc.get("aaaaaaa", 0) + rng.randint(2, 9)
    return wc


def test_learn_merges_matches_sequential_reference():
    for seed in range(6):
        wc = _random_word_counts(seed)
        words = sorted(wc)
        counts = [wc[w] for w in words]
        got = learn_merges(words, counts, num_merges=30)
        want, _ = _ref_learn(wc, num_merges=30)
        assert got == want, f"seed {seed}"


def test_greedy_overlap_replacement():
    # 'aaaa' counts (a,a) three times but greedy replacement gives 'zz'
    wc = {"aaaa": 5}
    merges = learn_merges(["aaaa"], [5], num_merges=2)
    assert merges[0][1:] == ("a", "a", "aa", 15)
    # round 2: 'aa aa </w>' ties (aa,aa) with (aa,</w>) at 5; the
    # symbol-id tie-break picks (aa,</w>) (id of </w> < id of 'aa')
    assert merges[1][1:] == ("aa", END_WORD, "aa" + END_WORD, 5)
    want, _ = _ref_learn(wc, num_merges=2)
    assert merges == want


def test_merged_string_collision_reuses_symbol():
    # force 'ab'+'c' and 'a'+'bc' style collisions via crafted counts:
    # the learner must keep ONE 'abc' symbol (string semantics) so a
    # later merge referencing 'abc' sees every occurrence.
    for seed in range(20, 26):
        wc = _random_word_counts(seed, n_words=40)
        wc.update({"abc": 30, "abcd": 25, "dabc": 25, "ab": 40,
                   "bc": 40, "abcabc": 20})
        words = sorted(wc)
        got = learn_merges(words, [wc[w] for w in words], 40)
        want, _ = _ref_learn(wc, 40)
        assert got == want, f"seed {seed}"


def test_apply_merges_matches_training_state():
    wc = _random_word_counts(7, n_words=80)
    words = sorted(wc)
    counts = [wc[w] for w in words]
    merges = learn_merges(words, counts, num_merges=25)
    _, final_vocab = _ref_learn(wc, num_merges=25)
    ntok = apply_merges(words, merges)
    want = np.array([len(final_vocab[w]) for w in words], np.int64)
    assert np.array_equal(ntok, want)
    # applying to an unseen-word subset (missing chars) must not crash
    ntok2 = apply_merges(["zzz", "aaaa"], merges)
    assert ntok2[0] == 4  # z z z </w> untouched (z unseen at train)


def test_pair_count_partial_is_round0_stats():
    t = pa.table({"text": pa.array(
        ["The cat, the cat!", "a cat", ""])})
    out = pair_count_partial(t)
    d = {(l, r): n for l, r, n in zip(
        out["left_sym"].to_pylist(), out["right_sym"].to_pylist(),
        out["pn"].to_pylist())}
    # words: the x2, cat x3, a x1
    assert d[("c", "a")] == 3
    assert d[("a", "t")] == 3
    assert d[("t", END_WORD)] == 3  # cat x3 ('the' ends in 'e')
    assert d[("e", END_WORD)] == 2
    assert d[("a", END_WORD)] == 1
    assert d[("t", "h")] == 2


def test_learn_bpe_distributed_matches_kernel(ray_session):
    import ray.data

    rng = random.Random(99)
    docs = []
    vocab_words = [w for w in _random_word_counts(3, 40)]
    for i in range(400):
        docs.append(" ".join(rng.choice(vocab_words)
                             for _ in range(rng.randint(1, 30))))
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(400), pa.int64()),
        "text": pa.array(docs)})).repartition(7)

    got = learn_bpe(ds, num_merges=20, min_count=2)

    # sequential word counts with the same split + prune
    wc = {}
    for doc in docs:
        for w in doc.lower().split(" "):
            if w:
                wc[w] = wc.get(w, 0) + 1
    wc = {w: c for w, c in wc.items() if c >= 2}
    want, _ = _ref_learn(wc, num_merges=20)
    got_rows = list(zip(got["rank"].to_pylist(),
                        got["left_sym"].to_pylist(),
                        got["right_sym"].to_pylist(),
                        got["merged"].to_pylist(),
                        got["pair_n"].to_pylist()))
    assert got_rows == want

    # corpus-wide application matches the per-doc sequential count
    _, final_vocab = _ref_learn(wc, num_merges=20)
    counted = {r["doc_id"]: r["n_tok_bpe"]
               for r in bpe_token_counts(ds, got, concurrency=2)
               .take_all()}
    for i in (0, 57, 211, 399):
        want_n = sum(len(final_vocab[w]) if w in final_vocab
                     else len(w) + 1
                     for w in docs[i].lower().split(" ") if w)
        # words pruned by min_count still tokenize (as raw chars+end,
        # since no merge applies to symbols built from them... unless a
        # merge does apply — compute via apply_merges for exactness)
        words_i = [w for w in docs[i].lower().split(" ") if w]
        per_word = apply_merges(words_i,
                                [tuple(m) for m in got_rows])
        assert counted[i] == int(per_word.sum())
        del want_n


def test_partial_word_counts_empty_and_null():
    t = pa.table({"text": pa.array([None, "", "  ,, "])})
    out = partial_word_counts(t)
    assert out.num_rows == 0


def test_learn_bpe_driver_vocab_limit_raises(ray_session):
    """The driver word-dictionary collect is gated (r4 VERDICT #2, the
    stages/idf.DRIVER_FOLD_LIMIT contract): an over-limit distinct
    vocabulary fails LOUDLY naming the min_count escalation knob
    instead of collecting a corpus-sized fold onto the driver."""
    import ray.data as rd
    import pytest

    docs = [" ".join(f"w{i}x{j}" for j in range(50))
            for i in range(20)]  # 1000 distinct words
    ds = rd.from_arrow(pa.table({"text": pa.array(docs)}))
    with pytest.raises(ValueError, match="min_count"):
        learn_bpe(ds, num_merges=2, driver_vocab_limit=100)
    # at/under the limit the same corpus learns fine
    out = learn_bpe(ds, num_merges=2, driver_vocab_limit=10_000)
    assert out.num_rows >= 1
