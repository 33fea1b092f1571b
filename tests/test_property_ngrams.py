"""Property tests: n-gram Jaccard / containment pair scoring vs a
brute-force pure-Python reference on random tiny corpora.

The engine path is a shingle-explode self-join (sub-quadratic machinery
with a doc-frequency cap knob); the reference is the textbook set
formula. With the cap disabled they must agree exactly on every pair —
including the no-shared-shingle pairs the join never materializes
(reference scores of 0 must correspond to absent rows)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from arches_rascoll_etl_spark.operators import dedup

_spark = None


def _get_spark():
    global _spark
    if _spark is None:
        from arches_rascoll_etl_spark.session import get_spark

        _spark = get_spark(app_name="prop-ngrams", cores=4, shuffle_partitions=4)
        _spark.sparkContext.setLogLevel("ERROR")
    return _spark


_WORDS = ["a", "b", "c", "d", "e"]

doc_st = st.lists(st.sampled_from(_WORDS), min_size=1, max_size=12).map(" ".join)


def _grams(text: str, k: int) -> set[str]:
    w = text.split()
    if len(w) <= k:
        return {" ".join(w[:k])}  # matches word_shingles' GREATEST(n-k+1, 1)
    return {" ".join(w[i : i + k]) for i in range(len(w) - k + 1)}


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(doc_st, min_size=2, max_size=8), st.integers(min_value=1, max_value=3))
def test_pair_scores_match_set_formulas(docs, k):
    df = _get_spark().createDataFrame(list(enumerate(docs)), "id long, text string")
    jac = {
        (r.id_a, r.id_b): r.jaccard
        for r in dedup.ngram_jaccard_pairs(
            df, "id", "text", k_words=k, threshold=0.0, max_doc_freq=None
        ).collect()
    }
    con = {
        (r.id_a, r.id_b): r.containment
        for r in dedup.ngram_containment_pairs(
            df, "id", "text", k_words=k, threshold=0.0, max_doc_freq=None
        ).collect()
    }
    grams = [_grams(d, k) for d in docs]
    for a in range(len(docs)):
        for b in range(a + 1, len(docs)):
            inter = len(grams[a] & grams[b])
            if inter == 0:
                assert (a, b) not in jac and (a, b) not in con
                continue
            assert abs(jac[(a, b)] - inter / len(grams[a] | grams[b])) < 1e-12
            assert abs(con[(a, b)] - inter / min(len(grams[a]), len(grams[b]))) < 1e-12
