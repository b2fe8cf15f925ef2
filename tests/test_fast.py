"""Fast backend (ops/fast.py + ops/pallas_filter.py) vs ground truth."""

import numpy as np
import pytest

from tpu_smatcher.core.alphabet import Alphabet
from tpu_smatcher.core import datagen
from tpu_smatcher.core.patterns import PatternSet
from tpu_smatcher.engines import make_fast
from tpu_smatcher.ops.fast import build_fast, exact_wid_supported


def make_case(sigma, m, p_size, n, seed):
    ab = Alphabet.of_size(sigma)
    text = datagen.generate_text(n, ab, seed=seed)
    pats = datagen.generate_patterns(text, p_size, m, ab, frac_present=0.6, seed=seed + 1)
    return text, pats


CASES = [
    (2, 8, 16, 120_000),     # exact tier (2^8 ids)
    (2, 16, 16, 120_000),    # exact tier (2^16 ids)
    (4, 8, 200, 120_000),    # exact tier (4^8 ids)
    (4, 16, 64, 120_000),    # fp tier
    (4, 32, 32, 120_000),    # fp tier
    (20, 8, 64, 120_000),    # fp tier
    (128, 8, 32, 120_000),   # fp tier
]


@pytest.mark.parametrize("sigma,m,p_size,n", CASES)
def test_fast_xla_counts(sigma, m, p_size, n):
    text, pats = make_case(sigma, m, p_size, n, seed=3 * sigma + m)
    expected = datagen.count_matches(text, pats)
    eng = make_fast(pats, tile=1 << 14, cap=1 << 12, backend="xla")
    assert eng.ft.exact == exact_wid_supported(sigma, m)
    assert eng.count(text) == expected


@pytest.mark.parametrize("sigma,m,p_size,n", [(4, 8, 64, 40_000), (4, 16, 32, 40_000)])
def test_fast_pallas_interpret(sigma, m, p_size, n):
    """Pallas kernels in interpreter mode (CPU) — tiny sizes."""
    text, pats = make_case(sigma, m, p_size, n, seed=99)
    expected = datagen.count_matches(text, pats)
    eng = make_fast(pats, cap=1 << 12, backend="pallas", interpret=True)
    assert eng.count(text) == expected


def test_overflow_flag():
    """A degenerate corpus (all matches) must flag overflow on the raw
    (count, overflow) API — never a silent undercount — while the public
    count() falls back to budget-sized pieces and still counts exactly."""
    ab = Alphabet.dna()
    pats = PatternSet(np.zeros((1, 16), np.uint8), ab)   # 'A'*16
    text = np.zeros(40_000, np.uint8)                    # everything matches
    eng = make_fast(pats, tile=1 << 14, cap=1 << 8, backend="xla")
    c, o = eng.count_with_overflow(text)
    assert o, "overflow must be reported"
    assert eng.count(text) == 40_000 - 15


def test_exact_tier_degenerate_ok():
    """Exact tier has no cap: degenerate corpora still count exactly."""
    ab = Alphabet.dna()
    pats = PatternSet(np.zeros((1, 8), np.uint8), ab)
    text = np.zeros(40_000, np.uint8)
    expected = datagen.count_matches(text, pats.codes)
    eng = make_fast(pats, backend="xla")
    assert eng.ft.exact
    assert eng.count(text) == expected


def test_fast_distributed_core():
    """Fast core composes with the distribution layer."""
    import jax
    from tpu_smatcher.parallel import make_mesh
    from tpu_smatcher.parallel.dist import DistributedCounter
    text, pats = make_case(4, 8, 64, 150_000, seed=31)
    expected = datagen.count_matches(text, pats)
    eng = make_fast(pats, tile=1 << 14, backend="xla")
    mesh = make_mesh(8)
    dc = DistributedCounter(eng.core, mesh, m=pats.m, sigma=pats.sigma)
    assert dc.count(text) == expected


def test_stage_budget_reachable():
    """Enough derived stages are built that filtering always reaches the
    candidate budget, even on the largest supported scan (the stage count
    is chosen by a cost model, so per-stage fill may exceed the old 0.30
    bound — what must hold is that the stage PRODUCT gets there)."""
    import numpy as np
    from tpu_smatcher.ops.fast import build_fast, stages_for, DEFAULT_CAP
    rng = np.random.default_rng(5)
    for p in (100, 2048, 10_000):
        pats = rng.integers(0, 20, (p, 16)).astype(np.uint8)
        ft = build_fast(pats, 20)
        assert 0 < ft.density < 0.9
        # all-stage filtering reaches the budget even for a 1 GiB corpus
        k = stages_for(ft, 1 << 30, DEFAULT_CAP)
        assert (1 << 30) * ft.density ** k <= DEFAULT_CAP / 4
        # the per-row occupancy criterion holds too
        assert ft.density ** k <= 1 / 256


def test_count_file_streaming(tmp_path):
    """Chunked file scan equals the in-memory count (halo'd chunk split)."""
    import numpy as np
    from tpu_smatcher.core.alphabet import Alphabet
    from tpu_smatcher.core import datagen
    from tpu_smatcher.engines import make_fast
    ab = Alphabet.dna()
    text = datagen.generate_text(100_003, ab, seed=41)
    pats = datagen.generate_patterns(text, 60, 8, ab, frac_present=0.6, seed=42)
    path = tmp_path / "c.bin"
    text.tofile(path)
    eng = make_fast(pats, backend="xla", tile=1 << 12)
    want = datagen.count_matches(text, pats)
    assert eng.count_file(str(path), chunk=1 << 14) == want
    assert eng.count_file(str(path), chunk=1 << 20) == want   # single chunk


def test_long_patterns_fall_back_to_xla(tmp_path):
    """m > 129 exceeds the Pallas overlapped-row layout; the scanner must
    fall back to the tiled XLA path instead of raising."""
    import numpy as np
    from tpu_smatcher.core.alphabet import Alphabet
    from tpu_smatcher.core import datagen
    from tpu_smatcher.engines import make_fast
    ab = Alphabet.protein()
    text = datagen.generate_text(30_000, ab, seed=43)
    pats = datagen.generate_patterns(text, 20, 200, ab, frac_present=0.6, seed=44)
    eng = make_fast(pats, backend="pallas", interpret=True, tile=1 << 12)
    assert eng.count(text) == datagen.count_matches(text, pats)


def test_slot_kernel_matches_mask_path():
    """The fused in-kernel slot compaction (filter_slots_pallas +
    compact_slots) must yield exactly the mask+compact candidates when no
    block overflows its slots, and flag overflow (with the slots it does
    emit being a prefix of the true set) when one does."""
    import jax.numpy as jnp
    from tpu_smatcher.ops import pallas_filter as pf
    from tpu_smatcher.ops.fast import (compact_mask, compact_slots,
                                       stages_for_block)
    text, pats = make_case(4, 16, 64, 120_000, seed=7)
    eng = make_fast(pats, backend="pallas", interpret=True)
    ft = eng.ft
    n = text.shape[0]
    t = jnp.asarray(text)
    for k in (stages_for_block(ft, pf.SLOT_RB * 128), 1):
        k = min(k, len(ft.bitmaps))
        slotmat, _ = pf.filter_slots_pallas(t, ft.bitmaps[:k], m=ft.m, n=n,
                                            n_stages=k, interpret=True)
        idxs_s, o_s, n_cand = compact_slots(slotmat, slots=pf.BLOCK_SLOTS,
                                            cap=eng.cap)
        mask2d = pf.filter_mask_pallas(t, ft.bitmaps[:k], m=ft.m, n=n,
                                       n_stages=k, interpret=True)
        idxs_m, o_m, _ = compact_mask(mask2d, caprows=eng.cap,
                                      cap=eng.cap, row_slots=128)
        a = np.sort(np.asarray(idxs_s)[np.asarray(idxs_s) >= 0])
        b = np.sort(np.asarray(idxs_m)[np.asarray(idxs_m) >= 0])
        if not int(np.asarray(o_s)):
            assert np.array_equal(a, b)
            assert int(np.asarray(n_cand)) == len(a)   # true total, packed
        else:
            assert set(a.tolist()) <= set(b.tolist())
    # per-block counts are the TRUE counts (lane BLOCK_SLOTS)
    counts = np.asarray(slotmat)[:, pf.BLOCK_SLOTS]
    assert counts.sum() == np.asarray(mask2d).astype(np.int64).sum()


def test_slot_overflow_falls_back_exact():
    """Dense-match corpora overflow the per-block slots; the async path
    must transparently retry to an exact count (never undercount)."""
    ab = Alphabet.protein()   # sigma=20: fp tier even at m=8
    pats = PatternSet(np.zeros((1, 8), np.uint8), ab)
    text = np.zeros(50_000, np.uint8)                 # every window matches
    eng = make_fast(pats, backend="pallas", interpret=True, cap=1 << 12)
    assert eng.count_async(text).result() == 50_000 - 7


def test_fused_word_view_matches_words_view():
    """The slot kernel's fused word view must equal words_view_pallas over
    the verify range, including the grid-extension case (words margin
    beyond the last start row)."""
    import jax.numpy as jnp
    from tpu_smatcher.ops import pallas_filter as pf
    from tpu_smatcher.ops.fast import stages_for_block, words_len
    text, pats = make_case(4, 16, 64, 100_003, seed=11)
    eng = make_fast(pats, backend="pallas", interpret=True)
    ft = eng.ft
    n = text.shape[0]
    t = jnp.asarray(text)
    k = min(stages_for_block(ft, pf.SLOT_RB * 128), len(ft.bitmaps))
    nw = words_len(n, ft.words)
    _, tw_fused = pf.filter_slots_pallas(t, ft.bitmaps[:k], m=ft.m, n=n,
                                         n_stages=k, nw_min=nw,
                                         interpret=True)
    assert tw_fused.shape[0] >= nw
    tw = pf.words_view_pallas(t, nw=nw, interpret=True)
    assert np.array_equal(np.asarray(tw_fused)[:nw], np.asarray(tw))


def test_flat_layout_block_aligned_zero_copy():
    """Block-aligned texts take the flat kernels' zero-copy path (exact
    tier: n % (EXACT_RB*128) == 0; fp tier: n % (FILTER_RB*128) == 0,
    where the fused word view covers exactly n/4 words — no nw_min
    margin).  Counts must match ground truth on both sides of the
    alignment boundary."""
    from tpu_smatcher.ops import pallas_filter as pf
    # exact tier: rb=1024 -> aligned at 1024*128
    n_al = pf.EXACT_RB * 128
    for n in (n_al, n_al + 1, n_al - 1):
        text, pats = make_case(4, 8, 100, n, seed=21)
        eng = make_fast(pats, backend="pallas", interpret=True)
        assert eng.count(text) == datagen.count_matches(text, pats)
    # fp tier: aligned at FILTER_RB*128
    n_al = pf.FILTER_RB * 128 * 3
    for n in (n_al, n_al + 7, n_al - 7):
        text, pats = make_case(4, 16, 64, n, seed=22)
        eng = make_fast(pats, backend="pallas", interpret=True)
        assert eng.count(text) == datagen.count_matches(text, pats)


def test_flat_word_view_aligned_exact_length():
    """In the zero-copy aligned case the fused word view is exactly n/4
    words (no margin) — verify gathers clamp and _verify_matched masks
    out-of-window tail bytes, so counts stay exact even for candidates in
    the final window."""
    import jax.numpy as jnp
    from tpu_smatcher.ops import pallas_filter as pf
    from tpu_smatcher.ops.fast import stages_for_block, words_len
    n = pf.FILTER_RB * 128 * 2
    text, pats = make_case(4, 16, 64, n, seed=23)
    # plant a pattern in the FINAL window so the tail-clamp path is hit
    text = text.copy()
    text[n - 16:] = pats.codes[0]
    eng = make_fast(pats, backend="pallas", interpret=True)
    ft = eng.ft
    k = min(stages_for_block(ft, pf.SLOT_RB * 128), len(ft.bitmaps))
    _, tw = pf.filter_slots_pallas(jnp.asarray(text), ft.bitmaps[:k],
                                   m=ft.m, n=n, n_stages=k,
                                   nw_min=words_len(n, ft.words),
                                   interpret=True)
    assert tw.shape[0] == n // 4            # aligned: no margin words
    assert eng.count(text) == datagen.count_matches(text, pats)


def test_flat_layout_multi_view_long_m():
    """m > 129 (multiple in-kernel context views) on the flat layout."""
    for m in (130, 256):
        text, pats = make_case(4, m, 16, 70_000, seed=24)
        eng = make_fast(pats, backend="pallas", interpret=True)
        assert eng.count(text) == datagen.count_matches(text, pats)


# ---------------------------------------------------------------------------
# two-phase compaction cascade (pallas_filter.cascade_pallas)
# ---------------------------------------------------------------------------

def _wide_case(frac_present, n=1 << 16, p=3000, m=32, seed=5):
    """A pattern set dense enough (vs a forced 32768-bit stage space) that
    the router picks the cascade — the CPU-scale stand-in for the
    reference's saturating p >= 30k sets (main.c:372-373)."""
    from tpu_smatcher.ops.fast import build_fast
    ab = Alphabet.of_size(4)
    text = datagen.generate_text(n, ab, seed=seed)
    pats = datagen.generate_patterns(text, p, m, ab,
                                     frac_present=frac_present, seed=seed + 1)
    ft = build_fast(pats.codes, pats.sigma, stage_bits=32768)
    return text, pats, ft


def test_cascade_kernel_parity():
    """cascade_pallas + compact_valrows + verify == ground truth on a
    match-sparse corpus (the clean, no-overflow path)."""
    import jax.numpy as jnp
    from tpu_smatcher.ops import pallas_filter as pf
    from tpu_smatcher.ops.fast import (compact_valrows, k1_for, stages_for,
                                       verify_chunked, words_len)
    text, pats, ft = _wide_case(frac_present=0.02)
    n, m = len(text), pats.m
    truth = datagen.count_matches(text, pats)
    k1 = k1_for(ft)
    assert k1 is not None and k1 >= 1
    cap = 1 << 14
    kt = min(max(stages_for(ft, n, cap), k1 + 1), len(ft.bitmaps))
    packed, tw, ovf = pf.cascade_pallas(
        jnp.asarray(text), ft.bitmaps[:kt], m=m, n=n, k1=k1, n_stages=kt,
        cd=ft.cd(kt), nw_min=words_len(n, ft.words), interpret=True)
    assert int(np.asarray(ovf)[0, 0]) == 0
    idxs, o, n_cand = compact_valrows(
        packed, caprows=min(cap, packed.shape[0]), cap=cap)
    assert int(o) == 0
    c = verify_chunked(tw, idxs, n_cand, ft, n_starts=n - m + 1)
    assert int(c) == truth


def test_cascade_scanner_routing_and_fallback():
    """The router picks the cascade for a saturating stage space; a
    match-dense corpus overflows the per-row slots and the async retry
    ladder still returns the exact count (totality)."""
    import jax.numpy as jnp
    from tpu_smatcher.ops.fast import FastScanner, stages_for
    # sparse: clean cascade path end-to-end
    text, pats, ft = _wide_case(frac_present=0.02)
    eng = FastScanner(ft, cap=1 << 14, backend="pallas", interpret=True)
    path, _, _ = eng._pick_path(len(text), stages_for(ft, len(text), eng.cap))
    assert path == "cascade"
    assert eng.count(text) == datagen.count_matches(text, pats)
    assert eng._retries == 0
    # dense: per-packed-row budget overflows -> exact via the ladder
    text2, pats2, ft2 = _wide_case(frac_present=0.5)
    eng2 = FastScanner(ft2, cap=1 << 14, backend="pallas", interpret=True)
    assert eng2.count(text2) == datagen.count_matches(text2, pats2)


def test_compact_valrows():
    """compact_valrows == numpy reference on random sparse position rows,
    including the row-slot overflow flag."""
    import jax.numpy as jnp
    from tpu_smatcher.ops.fast import compact_valrows
    rng = np.random.default_rng(11)
    R = 64
    vals = np.full((R, 128), -1, np.int32)
    for r in range(R):
        k = rng.integers(0, 6)
        lanes = rng.choice(128, size=k, replace=False)
        vals[r, lanes] = rng.integers(0, 1 << 20, size=k)
    idxs, o, n_cand = compact_valrows(jnp.asarray(vals), caprows=R,
                                      cap=256, row_slots=8)
    want = vals[vals >= 0]
    got = np.asarray(idxs)
    got = got[got >= 0]
    assert int(o) == 0
    assert int(n_cand) == want.size
    assert sorted(got.tolist()) == sorted(want.tolist())
    # a row with more than row_slots live lanes must flag overflow
    vals[3, :20] = np.arange(20)
    _, o2, _ = compact_valrows(jnp.asarray(vals), caprows=R, cap=256,
                               row_slots=8)
    assert int(o2) == 1


def test_count_stack_parity():
    """count_stack == sum of per-text counts across tiers, including
    unaligned shard lengths and a planted boundary straddler (which must
    NOT count — the junction correction's job)."""
    ab = Alphabet.of_size(4)
    nsh, k = 30_000, 3
    texts = [datagen.generate_text(nsh, ab, seed=s) for s in (1, 2, 3)]
    batch = np.stack(texts)
    for m, p in ((8, 100), (16, 64)):
        pats = datagen.generate_patterns(np.concatenate(texts), p, m, ab,
                                         frac_present=0.3, seed=9 + m)
        truth = sum(datagen.count_matches(t, pats) for t in texts)
        eng = make_fast(pats, backend="pallas", interpret=True)
        assert eng.count_stack(batch) == truth
    # planted straddler across the shard boundary
    pats = datagen.generate_patterns(np.concatenate(texts), 64, 16, ab,
                                     frac_present=0.3, seed=77)
    t2 = batch.copy()
    t2[0, -8:] = pats.codes[0][:8]
    t2[1, :8] = pats.codes[0][8:]
    truth = sum(datagen.count_matches(t2[i], pats) for i in range(k))
    eng = make_fast(pats, backend="pallas", interpret=True)
    assert eng.count_stack(t2) == truth
    # xla-backend fallback path (scan_many)
    eng2 = make_fast(pats, backend="xla")
    assert eng2.count_stack(t2) == truth


def test_count_repeat_async():
    """reps back-to-back scans in one dispatch return reps * count and are
    not collapsed by loop-invariant hoisting (the count must scale)."""
    ab = Alphabet.dna()
    text, pats = make_case(4, 8, 64, 50_000, seed=31)
    truth = datagen.count_matches(text, pats)
    eng = make_fast(pats, backend="pallas", interpret=True)
    import jax.numpy as jnp
    t = jnp.asarray(text)
    assert eng.count_repeat_async(t, 1).result() == truth
    assert eng.count_repeat_async(t, 3).result() == 3 * truth
