"""Pure-arithmetic property tests for the int64 overflow envelopes the
integer-grid operators document (BM25 x49, DSIR x50, PageRank x57,
quantile histogram x51). The q66 incident showed these envelopes are
where integer-grid designs break first at scale — pin them at the
documented 100x-scale bounds so a constant change that silently
shrinks the envelope fails a test, not a production run."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

I64 = 2**63 - 1

# documented sf100-ish bounds
N_DOCS = 6 * 10**7
T_TOKENS = 2 * 10**9
TF_MAX = 10**4
DL_MAX = 10**5


@settings(max_examples=300, deadline=None)
@given(
    tf=st.integers(1, TF_MAX),
    dl=st.integers(1, DL_MAX),
    df=st.integers(1, N_DOCS),
    n=st.integers(1, N_DOCS),
    t=st.integers(1, T_TOKENS),
)
def test_bm25_intermediates_fit_int64(tf, dl, df, n, t):
    # operators/retrieval.py grid: every named intermediate must fit
    num = tf * 22000 * t
    den = 10 * t * tf + 3 * t + 9 * dl * n
    assert 0 < num <= I64 and 0 < den <= I64
    idf = (n * 1000) // df
    tfc = num // den
    assert tfc <= 2200  # bounded by (k1+1)*grid
    contrib = idf * tfc
    assert contrib <= I64
    # a 500-term query over max contribs still sums inside int64
    assert 500 * 1000 * N_DOCS * 2200 <= I64


@settings(max_examples=300, deadline=None)
@given(
    p_c=st.integers(0, T_TOKENS),
    q_c=st.integers(0, T_TOKENS),
    p_tot=st.integers(1, T_TOKENS),
    q_tot=st.integers(1, T_TOKENS),
    tf=st.integers(1, TF_MAX),
)
def test_dsir_intermediates_fit_int64(p_c, q_c, p_tot, q_tot, tf):
    # operators/sampling.dsir_importance_scores grid
    if p_c > p_tot or q_c > q_tot:
        return  # counts can't exceed totals
    assert p_c * 1_000_000 <= I64  # needs totals <= ~9e12 (documented)
    p_ppm = (p_c * 1_000_000) // p_tot
    q_ppm = (q_c * 1_000_000) // q_tot
    r = ((p_ppm + 1) * 1000) // (q_ppm + 1)
    assert r <= (10**6 + 1) * 1000
    assert tf * r <= I64
    # per-token average bounded by max r -> global sum safe to ~9e9 docs
    assert N_DOCS * (10**6 + 1) * 1000 <= I64


@settings(max_examples=200, deadline=None)
@given(
    r=st.integers(0, 25 * 1_000_000),  # mass-bounded rank, 25-node graph
    w=st.integers(1, 4 * 10**8),       # per-edge weight at sf100
    total_w=st.integers(1, 10**10),
)
def test_pagerank_intermediates_fit_int64(r, w, total_w):
    if w > total_w:
        return
    assert r * w <= I64  # operators/graph.pagerank_integer contrib
    assert 85 * 25 * 1_000_000 <= I64


@settings(max_examples=200, deadline=None)
@given(
    cents=st.integers(-(10**12), 10**12),
    lo=st.integers(-(10**12), 10**12),
    width=st.integers(1, 2 * 10**12),
)
def test_histogram_bin_math_fits_int64(cents, lo, width):
    if not (lo <= cents < lo + width):
        return
    assert (cents - lo) * 256 <= I64  # x51 bin formula headroom


@settings(max_examples=300, deadline=None)
@given(
    n=st.integers(1, 3 * 10**6),
    dims=st.integers(1, 32),
)
def test_dispersion_intermediates_fit_int64(n, dims):
    # x62 grid (queries/extensions.x62_embedding_dispersion): per-dim
    # partials with |q| <= 127. Worst case per dim: ss = n*127^2,
    # |s| = n*127; the documented envelope is n <= ~3e6 vectors/label at
    # 32 dims — every intermediate AND the dim-summed numerator must fit
    # int64 at the extreme.
    ss_dim = n * 127 * 127
    s_dim = n * 127
    assert n * ss_dim <= I64          # per-dim n*SUM(v^2)
    assert s_dim * s_dim <= I64       # per-dim SUM(v)^2
    assert dims * (n * ss_dim) <= I64  # the label-level SUM over dims
    assert n * n <= I64               # the msd divisor


@settings(max_examples=300, deadline=None)
@given(
    n_tokens_per_doc=st.integers(0, 10**6),
    docs_per_shard=st.integers(1, 10**9),
)
def test_shard_manifest_token_offsets_fit_int64(n_tokens_per_doc, docs_per_shard):
    # x61: tok_offset is a running SUM of per-doc token counts within one
    # shard. 1e9 docs/shard x 1e6 tokens/doc = 1e15 << 2^63; the ppm-free
    # manifest has no tighter grid. Shard count itself caps docs/shard.
    assert n_tokens_per_doc * docs_per_shard <= I64


@settings(max_examples=300, deadline=None)
@given(
    shared=st.integers(0, 10**12),
    smaller=st.integers(1, 10**12),
)
def test_overlap_ppm_fits_int64(shared, smaller):
    # x64: shared <= smaller by construction (a shared text is distinct in
    # both sources); ppm numerator must fit for trillion-text sources
    if shared > smaller:
        return
    assert shared * 1_000_000 <= I64
    assert (shared * 1_000_000) // smaller <= 1_000_000


@settings(max_examples=300, deadline=None)
@given(
    cum=st.integers(0, 9_200_000_000_000),
    tot=st.integers(1, 9_200_000_000_000),
)
def test_char_coverage_ppm_fits_int64(cum, tot):
    # x63: cum * 1_000_000 must fit int64 up to the documented ~9.2e12
    # total-char bound (~9 TB of text); past it the docstring mandates
    # decimal widening in both engines
    if cum > tot:
        return
    assert cum * 1_000_000 <= I64
    assert (cum * 1_000_000) // tot <= 1_000_000
