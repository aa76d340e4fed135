"""The bpe_merges DuckDB twin (unrolled 40-iteration training replay,
``queries._bpe_merges_sql``) must equal the ``learn_merges`` kernel on
ANY vocabulary — not just the sf corpus the conformance test covers.

The twin's correctness rests on two encoding claims, both exercised
hardest by tiny alphabets (maximal shared prefixes/suffixes, self-
overlap runs, merged-text collisions):

* a pair pattern ``|l||r|`` over the ``|sym|``-wrapped string matches
  exactly the symbol pair (l, r) — a maximal pipe-free run IS a
  complete symbol, so a symbol merely ENDING in l's text can never
  false-match (the flaw of a trailing-terminator encoding);
* left-to-right ``replace()`` equals the kernel's greedy even-offset
  run rule (``|a||a||a||a|`` → ``|aa||aa|``).

No Ray needed: the kernel side is the driver-loop ``learn_merges``
(itself pinned to a sequential dict reference in test_bpe.py), the SQL
side runs over a synthesized documents table where each word's corpus
count is its repetition count inside one doc.
"""

import duckdb
import pandas as pd
import pytest


def _run_twin(vocab, num_merges):
    from merge_machine_ray.pipelines.queries import _bpe_merges_sql

    rows = [{"doc_id": i, "text": " ".join([w] * c)}
            for i, (w, c) in enumerate(vocab)]
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(rows))
    return con.execute(
        _bpe_merges_sql(num_merges=num_merges)).fetchdf()


def _run_kernel(vocab, num_merges):
    from merge_machine_ray.stages.bpe import learn_merges

    words = sorted(w for w, _ in vocab)
    cnt = dict(vocab)
    merges = learn_merges(words, [cnt[w] for w in words], num_merges,
                          min_pair_count=2)
    return pd.DataFrame(
        merges, columns=["rank", "left_sym", "right_sym", "merged",
                         "pair_n"])


def _assert_twin_equal(vocab, num_merges=15):
    got = _run_twin(vocab, num_merges).sort_values("rank") \
        .reset_index(drop=True)
    want = _run_kernel(vocab, num_merges)
    assert len(got) == len(want), (vocab, got, want)
    for c in want.columns:
        assert got[c].tolist() == want[c].tolist(), (c, vocab, got, want)


def test_twin_self_overlap_runs():
    # 'aaaa' forces the (a,a) merge to keep even offsets on both sides
    _assert_twin_equal([("aaaa", 9), ("aaa", 5), ("aa", 4)])


def test_twin_suffix_trap():
    # after (x,a)→'xa', the word 'xat' holds symbols (xa, t); a later
    # (a,t) merge must NOT fire inside it — a trailing-terminator
    # encoding would false-match 'a|t|' against '…xa|t|'
    _assert_twin_equal(
        [("xa", 100), ("xat", 30), ("at", 60), ("a", 40)],
        num_merges=10)


def test_twin_merged_collision():
    # a+bc and ab+c both produce 'abc': the second must reuse the
    # existing symbol code (affects later tie-breaks)
    _assert_twin_equal(
        [("abc", 50), ("ab", 40), ("bc", 45), ("zabcz", 10)],
        num_merges=12)


def test_twin_early_stop():
    # every pair unique once min_count prunes → stops well before 15
    _assert_twin_equal([("ab", 2), ("cd", 2)], num_merges=15)


@pytest.mark.parametrize("seed", range(8))
def test_twin_random_vocab_battery(seed):
    import random

    rng = random.Random(seed)
    n = rng.randint(6, 14)
    vocab = {}
    for _ in range(n):
        w = "".join(rng.choice("ab") for _ in range(rng.randint(1, 6)))
        vocab[w] = rng.randint(2, 50)
    _assert_twin_equal(sorted(vocab.items()), num_merges=15)
