"""Round-4 regression pins.

1. The Arrow BPE kernel (operators/bpe.py) is bit-equal to the
   expression-form encoder on the same merge table — the "oracle twin"
   contract that lets the kernel carry production rank counts while the
   expression form stays independently checkable.
2. apply_merges implements the exact left-to-right fold semantics of
   the SQL twins (property-tested against an independent reimplementation
   over random words and random merge tables, including cascading and
   repeated-pair cases).
3. The 1000-rank merge table is deterministic, deduplicated, and really
   has >= 1000 ranks of which a meaningful number fire on the corpus.
"""

from hypothesis import given, settings
from hypothesis import strategies as st

from copperhead_spark.operators.bpe import apply_merges, token_hash


def _fold_reference(word, merges):
    """Independent per-rank fold (mirrors tests/test_properties.py
    _bpe_apply_py, kept separate so a shared bug can't hide)."""
    syms = list(word)
    for left, right in merges:
        out = []
        for s in syms:
            if out and out[-1] == left and s == right:
                out[-1] = left + right
            else:
                out.append(s)
        syms = out
    return syms


@settings(max_examples=200, deadline=None)
@given(
    st.text(alphabet="abct", min_size=0, max_size=24),
    st.lists(
        st.tuples(
            st.text(alphabet="abct", min_size=1, max_size=2),
            st.text(alphabet="abct", min_size=1, max_size=2),
        ),
        max_size=8,
    ),
)
def test_apply_merges_matches_reference_fold(word, merges):
    assert apply_merges(word, merges) == _fold_reference(word, merges)


def test_apply_merges_cascade_semantics():
    # ('a','a') over 'aaaa' pairs greedily left-to-right: [aa, aa];
    # over 'aaa': [aa, a] — the fold never re-merges the merged token
    assert apply_merges("aaaa", [("a", "a")]) == ["aa", "aa"]
    assert apply_merges("aaa", [("a", "a")]) == ["aa", "a"]
    # rank order matters: (t,h) then (th,e) composes; reversed starves
    assert apply_merges("the", [("t", "h"), ("th", "e")]) == ["the"]
    assert apply_merges("the", [("th", "e"), ("t", "h")]) == ["th", "e"]


def test_merge_table_1k_shape():
    from copperhead_spark.plans.tokenize import _MERGES, _MERGES_1K, _make_merges_1k

    assert len(_MERGES_1K) >= 1000
    assert len(set(_MERGES_1K)) == len(_MERGES_1K)
    assert _MERGES_1K[: len(_MERGES)] == _MERGES
    assert _make_merges_1k() == _MERGES_1K  # deterministic
    # compositional ranks exist: some rank's left side is itself a
    # merged token produced by an earlier rank
    products = {left + right for left, right in _MERGES_1K}
    assert any(left in products for left, _ in _MERGES_1K[len(_MERGES) :])


def test_token_hash_matches_sql_arithmetic():
    # seed 7, base 31, mod 2^31-1 — the _tok_hash_spark/_tok_hash_duck fold
    assert token_hash("") == 7
    assert token_hash("a") == (7 * 31 + ord("a")) % 2_147_483_647
    assert token_hash("th") == ((7 * 31 + ord("t")) * 31 + ord("h")) % 2_147_483_647


def test_bpe_kernel_equals_expression_twin(spark, sf_dir):
    """Kernel and expression form on the SAME 8-rank table produce
    identical (doc_id, n_tokens, n_merged, seq_hash) rows — the swap is
    an implementation change, not a semantics change."""
    from copperhead_spark.operators.bpe import encode_vocab_arrow
    from copperhead_spark.plans.registry import all_queries
    from copperhead_spark.plans.tokenize import (
        _MERGES,
        _assemble_per_doc,
        _token_stream,
    )

    docs, tok = _token_stream(spark, sf_dir)
    kern = _assemble_per_doc(
        docs, tok, encode_vocab_arrow(tok.select("w").distinct(), _MERGES)
    ).collect()
    expr = all_queries()["text_bpe_encode_expr8"].builder(spark, sf_dir).collect()
    assert sorted(map(tuple, kern)) == sorted(map(tuple, expr))


def test_bpe_1k_actually_merges_more_than_8(spark, sf_dir):
    """The 1000-rank table is non-vacuous on the corpus: it merges
    strictly more than the 8-rank toy table does."""
    from copperhead_spark.plans.registry import all_queries

    qs = all_queries()
    m1k = sum(
        r["n_merged"] for r in qs["text_bpe_encode"].builder(spark, sf_dir).collect()
    )
    m8 = sum(
        r["n_merged"]
        for r in qs["text_bpe_encode_expr8"].builder(spark, sf_dir).collect()
    )
    assert m1k > m8 > 0


def test_ann_e2e_recall_floor(spark, sf_dir):
    """The end-to-end index-probe path must keep recall@k >= 0.5 vs the
    brute-force exact top-k (observed 0.64 at sf0.001 / 0.68 at sf0.01
    with nprobe=4, shortlist=50) — a probe/metric mismatch or code
    corruption tanks this long before it breaks determinism."""
    from copperhead_spark.plans.registry import all_queries

    rows = all_queries()["pipeline_ann_query_e2e"].builder(spark, sf_dir).collect()
    assert rows, "no query rows"
    mean_recall = sum(r.recall for r in rows) / len(rows)
    assert mean_recall >= 0.5, mean_recall


def test_pq_kernel_equals_expression_twin(spark, sf_dir):
    """The Arrow IVF+PQ index kernel (operators/pq.py) produces the
    exact (cid, codes) the SQL-expression encoders produce — same int64
    distances, same lowest-id tie-break — so swapping the build kernel
    can never drift the index."""
    from pyspark.sql import functions as F

    from copperhead_spark.catalog import table
    from copperhead_spark.operators.barrier import project_once
    from copperhead_spark.operators.kmeans import assign_expr, deterministic_centroids
    from copperhead_spark.operators.pq import ivf_pq_index_arrow
    from copperhead_spark.plans.similarity import (
        _E6_SPARK,
        _KM_DIM,
        _KM_K,
        _pq_codebooks,
        _pq_codes_spark,
    )

    books = _pq_codebooks()
    cents = deterministic_centroids(_KM_K, _KM_DIM)
    emb = table(spark, sf_dir, "embeddings")
    v = project_once(emb, "vec_id", f"{_E6_SPARK} AS e6")
    kern = {
        r.vec_id: (r.cid, tuple(r.codes))
        for r in ivf_pq_index_arrow(v, cents, books).collect()
    }
    expr = {
        r.vec_id: (r.cid, tuple(r.codes))
        for r in project_once(
            v,
            "vec_id",
            f"{assign_expr(cents)} AS cid",
            f"{_pq_codes_spark(books)} AS codes",
        ).collect()
    }
    assert kern == expr


def test_bucketed_interval_join_dedups_multibucket_pairs(spark):
    """Two long intervals overlapping across MANY shared buckets must
    yield exactly ONE pair row (the first-shared-bucket dedup), and
    non-overlapping / touching (half-open) intervals none."""
    from copperhead_spark.operators.rangejoin import bucketed_interval_join

    a = spark.createDataFrame(
        [(1, 0, 1000), (2, 5000, 5010)], "a_id long, a_lo long, a_hi long"
    )
    b = spark.createDataFrame(
        [(10, 500, 2000), (11, 1000, 1500), (12, 4000, 5000)],
        "b_id long, b_lo long, b_hi long",
    )
    out = sorted(
        (r.a_id, r.b_id)
        for r in bucketed_interval_join(
            a, b, "a_lo", "a_hi", "b_lo", "b_hi", bucket_width=16
        ).collect()
    )
    # (1,10): overlap [500,1000) across ~30 shared 16-wide buckets -> once;
    # (1,11): touching at 1000 (half-open) -> no pair;
    # (2,12): touching at 5000 -> no pair
    assert out == [(1, 10)]
