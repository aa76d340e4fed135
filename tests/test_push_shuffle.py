"""Push-based-shuffle parity: bench.py flips
``DataContext.use_push_based_shuffle = True`` (a ~10-13% win on the
pair-exchange-bound flagship, measured at 1.05M docs / 32 CPUs), while
the grading driver runs queries under the default sort-based strategy.
Both strategies therefore reach graded paths, so the shuffle-heaviest
query shapes must be oracle-identical under BOTH.  This runs each
representative once with push-based shuffle against its DuckDB twin —
any strategy-dependent ordering/partitioning assumption in an exchange
stage would surface here as a value or row diff.
"""

import pytest

from tests.test_queries_oracle import SF_DIR, _compare, _duck, _to_pandas

# One query per distinct exchange machinery: the banded minhash pair
# join (sort x2), the exact n-gram postings join + transitive
# clustering (memoized — cleared below so it really re-runs), the
# weighted-Jaccard prefix-filter join, sorted-neighborhood (global
# sort), exact dedup (hash-bucket exchange), the bucketed mirror-pair
# exchange, the flagship ER pipeline, and a plain groupby+sort.
PUSH_QUERIES = [
    "er_documents",
    "cluster_exact_jaccard",
    "minhash_near_dups",
    "weighted_jaccard_dups",
    "snm_candidate_pairs",
    "exact_dedup_docs",
    "mirror_hosts",
    "q3_shipping_priority",
]


@pytest.fixture()
def push_shuffle(ray_session):
    from ray.data import DataContext

    from merge_machine_ray.pipelines import queries as Q

    ctx = DataContext.get_current()
    prev = ctx.use_push_based_shuffle
    saved = dict(Q._PIPE_MEMO)
    Q._PIPE_MEMO.clear()  # force the memoized joins to re-run pushed
    ctx.use_push_based_shuffle = True
    yield
    ctx.use_push_based_shuffle = prev
    Q._PIPE_MEMO.clear()
    Q._PIPE_MEMO.update(saved)


@pytest.mark.parametrize("name", PUSH_QUERIES)
def test_query_matches_oracle_under_push_shuffle(push_shuffle, name):
    import __ray_entry__ as e

    got = _to_pandas(e.queries()[name](SF_DIR))
    want = _duck(e.oracle_sql()[name])
    _compare(name, got, want)
