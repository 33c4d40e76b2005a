"""Pure-python soundness properties of the driver-side WAND planner's
ladder estimators (query._est_kept_blocks / query._deep_kth_wand).

The ladders are built here exactly as build._impact_ladders builds them
(per salt: [n_blocks, max@0, min@0, max@1, min@1, ... at power-of-two
block_ids] over a wand-DESC posting sequence), then the two claims are
checked against ground truth computed directly from the postings:

- _est_kept_blocks(theta) is an UPPER bound on the blocks the theta
  filter keeps (never underestimates -> the cost-based plan choice can
  only err toward the exhaustive-but-exact plan);
- _deep_kth_wand(k) returns v such that at least k DISTINCT docs truly
  score >= v from this term alone (the tau it feeds is a valid lower
  bound on the k-th best score at any depth).
"""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from lsearch_spark.query import _deep_kth_wand, _est_kept_blocks

BLOCK = 8  # small block size so tiny cases exercise partial tail blocks


def _mk_salts(wands: np.ndarray, n_salts: int, seed: int):
    """Split a term's per-posting wand values across salts (hash-like),
    sort each salt DESC (impact order), chunk into BLOCK-sized blocks."""
    rng = np.random.RandomState(seed)
    which = rng.randint(0, n_salts, len(wands))
    salts = []
    for s in range(n_salts):
        w = np.sort(wands[which == s])[::-1]
        if len(w):
            blocks = [w[i : i + BLOCK] for i in range(0, len(w), BLOCK)]
            salts.append(blocks)
    return salts


def _mk_ladder(salts):
    lads = []
    for blocks in salts:
        lad = [float(len(blocks))]
        for j, b in enumerate(blocks):
            if j == 0 or (j & (j - 1)) == 0:  # power-of-two block ids
                lad += [float(b.max()), float(b.min())]
        lads.append(lad)
    return lads


wand_lists = st.lists(
    st.floats(min_value=0.01, max_value=10.0, allow_nan=False), min_size=1, max_size=400
)


@given(wand_lists, st.integers(1, 4), st.floats(0.0, 11.0), st.integers(0, 10**6))
@settings(max_examples=200, deadline=None)
def test_est_kept_blocks_never_underestimates(ws, n_salts, theta, seed):
    wands = np.array(ws)
    salts = _mk_salts(wands, n_salts, seed)
    n_blocks = sum(len(b) for b in salts)
    bs = {"n_blocks": n_blocks, "top_wands": [], "impact_ladder": _mk_ladder(salts)}
    truly_kept = sum(1 for blocks in salts for b in blocks if b.max() >= theta)
    est = _est_kept_blocks(bs, theta, impact=True)
    assert est >= truly_kept, (est, truly_kept, theta)


@given(wand_lists, st.integers(1, 4), st.integers(1, 500), st.integers(0, 10**6))
@settings(max_examples=200, deadline=None)
def test_deep_kth_wand_is_sound(ws, n_salts, k, seed):
    wands = np.array(ws)
    salts = _mk_salts(wands, n_salts, seed)
    bs = {"n_blocks": sum(len(b) for b in salts), "impact_ladder": _mk_ladder(salts)}
    v = _deep_kth_wand(bs, k, BLOCK)
    if v is None:
        return  # "can't prove k docs" is always a sound answer
    # every posting is one distinct doc: at least k must truly reach v
    assert int((wands >= v).sum()) >= k, (v, k, int((wands >= v).sum()))


def test_deep_kth_wand_reaches_depth_beyond_any_topk_list():
    """A 10k-posting stopword-like term: the ladder proves a bound at
    depth 5000 — far past any stored top-K list — and the bound is the
    tightest sampled value (within one po2 step of the true 5000th)."""
    wands = np.linspace(10.0, 0.1, 10_000)
    salts = _mk_salts(wands, 4, seed=1)
    bs = {"n_blocks": sum(len(b) for b in salts), "impact_ladder": _mk_ladder(salts)}
    v = _deep_kth_wand(bs, 5000, BLOCK)
    assert v is not None
    true_kth = np.sort(wands)[::-1][4999]
    n_at_v = int((wands >= v).sum())
    assert 5000 <= n_at_v <= 4 * 5000  # sound and within the po2 slack
    assert v <= true_kth


# --------------------------------------------------- docset exclusion kernel
from hypothesis import given, settings
from hypothesis import strategies as hst


@settings(max_examples=200, deadline=None)
@given(
    hst.lists(hst.integers(min_value=-(2**62), max_value=2**62), max_size=60),
    hst.lists(hst.integers(min_value=-(2**62), max_value=2**62), max_size=60),
)
def test_exclusion_mask_matches_isin(ids_l, ex_l):
    """The decode kernel's searchsorted exclusion (query.py
    _decode_score_partials) must equal np.isin set semantics for any ids
    vs any sorted-unique exclusion array."""
    import numpy as np

    ids = np.array(ids_l, dtype=np.int64)
    ex = np.unique(np.array(ex_l, dtype=np.int64))
    if ex.size:
        pos = np.searchsorted(ex, ids)
        pos[pos == ex.size] = 0
        keep = ex[pos] != ids
    else:
        keep = np.ones(ids.size, dtype=bool)
    want = ~np.isin(ids, ex)
    assert np.array_equal(keep, want)
