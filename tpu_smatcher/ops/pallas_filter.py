"""Fused Pallas scan kernels — the production fast path on TPU.

Measured basis (scripts/probe_gather3.py + probe_truth2.py): Mosaic's
``tpu.dynamic_gather`` (via 2-D ``jnp.take_along_axis`` on matching shapes,
axis=1) sustains 68-112 G lookups/s on 128-lane tables inside Pallas, while
the same op outside Pallas lowers to XLA's generic gather at ~0.09 G/s.
These kernels therefore fuse the whole dense scan — window-key computation,
banked 65536-bit bitmap membership, validity masking, count/candidate
emission — into one VMEM-tiled pass.

Text layout: the wrapper reshapes the corpus into overlapped rows
(`overlap_rows`): row r holds bytes [r*128, r*128 + 256), so every window
starting in row r's 128 positions lies within the row (m <= 129).  Shifted
*static* column slices then yield all per-position window bytes with zero
gathers — the TPU translation of the reference's shared-memory tile + (m-1)
halo (cuda/cuda_wm.cu:93-130).

Two kernels:
  - exact_count_kernel: sigma^m <= 2^16 — the 16-bit packed window id IS the
    window automaton state; bitmap bit = terminal flag.  Count emitted
    directly; zero false positives, no verification.
  - filter_mask_kernel: k-stage 16-bit polynomial fingerprints, candidate
    mask emitted for sparse exact verification outside.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_smatcher.ops.fast import FP_MULTS, STAGE_CD, _bits_per_char
from tpu_smatcher.ops import keys as keys_mod

LANES = 128
ROW_BYTES = 256          # default row context (m <= 129); see row_bytes_for
DEFAULT_RB = 512         # rows per grid block: (512, 256) uint8 tile = 128 KiB
FILTER_RB = 512          # filter grid block.  128 won on the materialized
                         # overlap tile (61.6 vs 64.7 ms at m=32); on the
                         # FLAT layout bigger blocks win (m=32: 128 -> 256
                         # -> 512 = 81.3 -> 78.0 -> 76.8 ms; rb=1024 OOMs
                         # the 16 MB scoped VMEM) — fewer grid steps, and
                         # the slot budget is unaffected because extraction
                         # stays per SLOT_RB sub-block (slot_row); verified
                         # to fit VMEM through m=513 (5 context views)
#: scoped-VMEM ceiling for the big flat kernels.  Mosaic's default 16 MB
#: stack limit is 214 KB too small for rb=512 at 15 filter stages (the
#: world192 sigma=128 p=8000 sweep cell); v5e has 128 MB of VMEM, so 64 MB
#: leaves ample headroom for any (stage count, context views) the builders
#: produce while still bounding runaway allocation.
VMEM_LIMIT = pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)

SLOT_RB = 128            # slot-extraction sub-block: the 16-slot budget is
                         # calibrated per 16K positions (BLOCK_SLOTS) — at
                         # 32K blocks the measured m=16 BASELINE corpus has
                         # 9 blocks exceeding 16 candidates (max 21), so a
                         # bigger filter block must NOT dilate the slot
                         # granularity
MAX_FAST_M = 4097        # longest pattern on the Pallas fast path (the
                         # reference kernels take any m —
                         # cuda/cuda_wm.cu:67-70 — so long patterns must not
                         # fall off a cliff).  Round 3 capped at 513 (8-row
                         # edge ref = 9 context views), round 4 at 1025;
                         # round 5 generalizes the edge reference to
                         # E = pow2ceil(h) rows (edge_rows_for), so h = 32
                         # views reach m = 4097.  Each view is one
                         # (rb, 128) int32+bf16 temporary inside the 64 MB
                         # scoped VMEM, and cross-view key accumulation is
                         # int32-exact for any view count (_fp_keys_views).
                         # Beyond this the tiled XLA scan takes over
                         # transparently (~0.01 GB/s — documented envelope,
                         # results/probe_longm_r04b.log).


def max_fast_m() -> int:
    """Longest pattern the overlapped-row Pallas layout supports; callers
    (FastScanner, ops.common.active_fastpath) fall back to the jnp/XLA scan
    beyond this."""
    return MAX_FAST_M


def row_bytes_for(m: int) -> int:
    """Per-row context bytes: 128 owned positions plus enough 128-byte halo
    views that every m-window starting in the row lies inside it."""
    return LANES * (1 + cdiv(max(m - 1, 1), LANES))


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def overlap_rows(text: jnp.ndarray, n: int, m: int, rb: int = DEFAULT_RB,
                 min_rows: int = 0) -> tuple[jnp.ndarray, int]:
    """(R, row_bytes_for(m)) uint8 overlapped layout; R padded to a multiple
    of rb.

    Row r covers positions [r*128, (r+1)*128); its row_bytes give every
    window starting there without crossing rows — the halo is h = ceil(
    (m-1)/128) extra 128-byte views, each a 128-shifted reshape of the same
    text (the smem tile + (m-1) halo of cuda/cuda_wm.cu:93-130, at VMEM
    scale).  min_rows extends the grid with zero rows (no valid starts in
    them — n_starts masks them) for callers whose fused outputs must cover
    more than the starts, e.g. the verify word view's gather margin.
    Returns (rows, n_starts)."""
    if m > MAX_FAST_M:
        raise ValueError(f"overlap_rows supports m <= {MAX_FAST_M}")
    h = cdiv(max(m - 1, 1), LANES)
    n_starts = max(0, n - m + 1)
    R = max(1, -(-n_starts // LANES), min_rows)
    R = -(-R // rb) * rb
    flat_len = R * LANES + h * LANES        # main + h halo row-views
    padded = jnp.zeros((flat_len,), jnp.uint8).at[:n].set(text[:n])
    views = [padded[j * LANES: R * LANES + j * LANES].reshape(R, LANES)
             for j in range(1 + h)]
    return jnp.concatenate(views, axis=1), n_starts


def _window_positions(rb: int):
    """Global position of each (row, lane) element in the current block."""
    r0 = pl.program_id(0) * rb
    rows = jax.lax.broadcasted_iota(jnp.int32, (rb, LANES), 0) + r0
    lanes = jax.lax.broadcasted_iota(jnp.int32, (rb, LANES), 1)
    return rows * LANES + lanes


def _valid_starts(rb: int, n_starts: int):
    """(rb, 128) int32 0/1 valid-window-start mask for the current block.

    KEEP THIS AFFINE in program_id: position < n_starts lowers to cheap
    per-block predication.  A measured dead end (r5): per-shard masks for
    stacked batches — any non-affine form (scalar division, local = gpos
    mod shard_bytes via &, even a constant-true elementwise compare
    replacing the affine one) sent Mosaic's compile time from 2.5 s to
    70-400 s, scaling with grid size.  Stacked batch scans therefore use
    UNMASKED global validity plus an exact junction-string correction
    outside the kernel (FastScanner._device_count_stack)."""
    gpos = _window_positions(rb)
    return (gpos < n_starts).astype(jnp.int32)


def _bitmap_lookup(bitmap_ref, keys: jnp.ndarray, rb: int) -> jnp.ndarray:
    """keys: (rb, 128) int32 in [0, B*4096) for a (B, 128) int32 bitmap.
    Returns bit values (rb, 128).  Cost scales with B (one lane-gather +
    select per 4096-bit bank), so bitmaps are sized to their key space."""
    B = bitmap_ref.shape[0]
    lane = (keys >> 5) & 127
    if B == 1:
        tab = jnp.broadcast_to(bitmap_ref[0][None, :], (rb, LANES))
        acc = jnp.take_along_axis(tab, lane, axis=1)
    else:
        bank = keys >> 12
        acc = jnp.zeros_like(lane)
        for b in range(B):
            tab = jnp.broadcast_to(bitmap_ref[b][None, :], (rb, LANES))
            v = jnp.take_along_axis(tab, lane, axis=1)
            acc = jnp.where(bank == b, v, acc)
    return (acc >> (keys & 31)) & 1


def _wid_keys_2d(t32: jnp.ndarray, m: int, bits: int) -> jnp.ndarray:
    return keys_mod.wid_keys(t32, m, bits)[:, :LANES]


def _fp_keys_2d(t32: jnp.ndarray, m: int, mult: int) -> jnp.ndarray:
    return keys_mod.fp_keys(t32, m, mult)[:, :LANES]


def _pad_guard_2d(t32: jnp.ndarray, m: int, sigma: int) -> jnp.ndarray:
    """(rb, 128) int32 1 iff the window holds only real chars (< sigma).

    Required on exact-tier paths: the distribution layer pads shards/halos
    with the out-of-alphabet symbol sigma, and for power-of-two sigma the
    packed id of a pad-contaminated window ALIASES a real window id (the
    pad's extra bit bleeds into the neighboring char field) — with no
    verification stage to reject it (ops/keys.py:max_keys)."""
    mx = keys_mod.max_keys(t32, m)[:, :LANES]
    return (mx < sigma).astype(jnp.int32)


@functools.lru_cache(maxsize=None)
def wid_weights(d: int, bits: int, off: int = 0, rows: int = 256):
    """Banded-matmul weights computing a PACKED WINDOW ID on the MXU:
    wid[r,l] = sum_i t[r,l+off+i] << (bits*(d-1-i)) over d chars starting
    `off` into the window — a polynomial with power-of-two coefficients, so
    the same lo/hi byte-split trick as fp_weights applies (bits*d <= 16
    keeps every value exact in bf16/f32).  Measured: keys 2.3 -> ~1 ms per
    256 MiB and the VPU freed for the bank combine (probe_exact_opts.py:
    10.7 -> 12.5 GB/s with rb=1024).  `rows` must cover 127 + off + d."""
    W = np.zeros((rows, 128), np.int64)
    for l in range(LANES):
        for i in range(d):
            W[l + off + i, l] = 1 << (bits * (d - 1 - i))
    lo = (W & 0xFF).astype(np.float32)
    hi = (W >> 8).astype(np.float32)
    return np.concatenate([lo, hi], axis=0).astype(jnp.bfloat16)


def _exact_kernel(tile_ref, bitmap_ref, w_ref, out_ref, *, m, bits, sigma,
                  n_starts, rb, guard):
    keys = _fp_keys_mxu(tile_ref[:].astype(jnp.int32).astype(jnp.bfloat16),
                        (w_ref,), 0xFFFF)
    hit = _bitmap_lookup(bitmap_ref, keys, rb)
    if guard:                       # shard/halo pad can alias real ids
        t32 = tile_ref[:, :LANES + m - 1].astype(jnp.int32)
        hit = hit & _pad_guard_2d(t32, m, sigma)
    hit = jnp.where(_window_positions(rb) < n_starts, hit, 0)
    s = jnp.sum(hit, dtype=jnp.int32)

    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[0, 0] = 0

    out_ref[0, 0] += s


def _exact_mask_kernel(tile_ref, bitmap_ref, w_ref, mask_ref, *, m, bits,
                       sigma, n_starts, rb):
    t32 = tile_ref[:, :LANES + m - 1].astype(jnp.int32)
    keys = _fp_keys_mxu(tile_ref[:].astype(jnp.int32).astype(jnp.bfloat16),
                        (w_ref,), 0xFFFF)
    hit = _bitmap_lookup(bitmap_ref, keys, rb) & _pad_guard_2d(t32, m, sigma)
    hit = jnp.where(_window_positions(rb) < n_starts, hit, 0)
    mask_ref[:] = hit.astype(jnp.int8)


@functools.partial(jax.jit, static_argnames=("m", "sigma", "n", "rb", "interpret"))
def exact_mask_pallas(text: jnp.ndarray, bitmap: jnp.ndarray, *, m: int,
                      sigma: int, n: int, rb: int = DEFAULT_RB,
                      interpret: bool = False) -> jnp.ndarray:
    """(R, 128) int8 per-position match mask for the exact tier — the mask
    variant of exact_count_pallas, used for position reporting."""
    tile, n_starts = overlap_rows(text, n, m, rb)
    R = tile.shape[0]
    bits = _bits_per_char(sigma)
    kern = functools.partial(_exact_mask_kernel, m=m, bits=bits,
                             sigma=sigma, n_starts=n_starts, rb=rb)
    w = wid_weights(m, bits)
    return pl.pallas_call(
        kern,
        grid=(R // rb,),
        in_specs=[
            pl.BlockSpec((rb, row_bytes_for(m)), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(bitmap.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rb, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, LANES), jnp.int8),
        interpret=interpret,
    )(tile, bitmap, w)


#: max band terms per weight part: 256*255*255 < 2^24 keeps the bf16/f32
#: MXU accumulation exact; longer patterns split into parts summed in int32
PART_TERMS = 256


@functools.lru_cache(maxsize=None)
def fp_weights(mult: int, m: int):
    """Banded-matmul weights computing the base fingerprint on the MXU, as
    a tuple of ceil(m/256) parts of shape (2*row_bytes, 128) bf16: part p's
    rows [0, S) hold the low bytes of mult^(c-l) on bands c-l in
    [256p, min(m, 256(p+1))), rows [S, 2S) the high bytes.

    fp[r,l] = sum_i t[r,l+i]*mult^i = sum_p (t @ Wlo_p) + 256*(t @ Whi_p)
    mod 2^16.  All weight/char values are integers <= 255 (exact in bf16)
    and each part's f32 accumulation stays below 2^24 (<= 256 terms), so
    the MXU result is EXACT for any m — measured 2.7x faster than the VPU
    segment-doubling tree (scripts/probe_mxu_keys.py)."""
    S = row_bytes_for(m)
    parts = []
    for p0 in range(0, m, PART_TERMS):
        W = np.zeros((S, 128), np.int64)
        for l in range(LANES):
            for i in range(p0, min(m, p0 + PART_TERMS)):
                W[l + i, l] = pow(mult, i, 1 << 16)
        lo = (W & 0xFF).astype(np.float32)
        hi = (W >> 8).astype(np.float32)
        # numpy, not a device array: this is lru_cached and may first be
        # called under a jit trace (a cached tracer would leak)
        parts.append(np.concatenate([lo, hi], axis=0).astype(jnp.bfloat16))
    return tuple(parts)


def _fp_keys_mxu(t_bf, w_refs, mask: int) -> jnp.ndarray:
    """Base fingerprint from its weight parts (w_refs: sequence of refs)."""
    acc = None
    for w in w_refs:
        S = w.shape[0] // 2
        lo = jnp.dot(t_bf, w[:S], preferred_element_type=jnp.float32)
        hi = jnp.dot(t_bf, w[S:], preferred_element_type=jnp.float32)
        v = lo.astype(jnp.int32) + (hi.astype(jnp.int32) << 8)
        acc = v if acc is None else acc + v
    return acc & mask


def n_base_fps(n_stages: int, cd: tuple | None = None) -> int:
    """Base fingerprints the derived-stage filter needs (1..3): fp0 always,
    fp1 when any stage has C != 0, fp2 when any has D != 0.  With the
    default STAGE_CD head that is 1/2/3 for 1/2/3+ stages; WIDE tables
    (stage_bits > 2^16) mix all three from stage 0."""
    if cd is None:
        cd = STAGE_CD[:n_stages]
    n = 1
    if any(c for c, _ in cd[:n_stages]):
        n = 2
    if any(d for _, d in cd[:n_stages]):
        n = 3
    return n


def derived_keys(bases: list, cd_s: tuple, smask: int):
    """Stage filter key from the base fingerprints and the stage's (C, D):
    fp0 + C*fp1 + D*fp2 mod (smask+1).  int32 wraparound is exact mod-2^k
    arithmetic (the mask keeps only low bits, k <= 18 < 31)."""
    C, D = cd_s
    keys = bases[0]
    if C:
        keys = keys + C * bases[1]
    if D:
        keys = keys + D * bases[2]
    return keys & smask


#: candidate slots extracted per grid block by the fused slot kernel.
#: The stages_for_block budget keeps expected FALSE candidates per
#: 16K-position block modest, but the derived stages are correlated (all
#: affine in the same 3 base fps — measured joint FPR ~5x the
#: independence product at p=10k: 3.25 false cands/block at k=13 vs 0.6
#: estimated) AND candidates CLUSTER (repetitive text regions): the
#: measured per-block histogram at the BASELINE m=16 DNA p=10k corpus has
#: max 14 candidates in one block while the mean is 3.6 — so Poisson tail
#: math undershoots and 8 or 12 slots overflow DETERMINISTICALLY on real
#: corpora (the candidate set is a function of the input), sending every
#: scan through the full mask-path retry.  16 slots cleared every
#: measured corpus with margin; marginal cost is ~0.6 ms per slot per
#: 256 MiB scan (8 -> 16: +4.4 ms at m=32), and 16 slots at the base
#: stage count beat 12-slots-plus-an-adaptive-extra-stage (3.23 vs 2.95
#: GB/s at m=16).  Overflow still falls back to the exact mask+compact
#: path, so adversarial and dense-MATCH corpora stay total and exact.
BLOCK_SLOTS = 16


def slot_row(cand, tril_ref, triu_ref, *, gpos, slots) -> jnp.ndarray:
    """IN-KERNEL candidate compaction: the (1, 128) slot row of a candidate
    sub-block — lanes [0, slots) hold global candidate positions in
    sub-block order (-1 = empty), lane `slots` the TRUE candidate count.

    Per-candidate in-block rank (row-major) comes from two triangular-ones
    MXU matmuls: rows_before[r] = sum_lanes (TRIL_strict @ cand)[r, :] and
    lane-exclusive prefix E = cand @ TRIU_strict; slot k then extracts its
    candidate with one masked reduction (rank == k).  0/1 operands and
    counts <= 2^24 keep the bf16xbf16->f32 matmuls exact.

    cand: (SLOT_RB, 128) int32 0/1; gpos: (SLOT_RB, 128) global positions.
    Non-candidates may share rank values with candidates, so the masked
    value g1 is pre-zeroed ONCE instead of AND-ing is_cand into every
    slot's predicate (probe_slots2.py variant b: ~1 ms / 256 MiB)."""
    total = jnp.sum(cand, dtype=jnp.int32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
    # unconditional extraction: gating the rank+extract work behind a
    # pl.when(total > 0) was MEASURED SLOWER (84.3 vs 82.1 ms at m=32 —
    # the per-block branch disturbs grid-step pipelining more than the
    # skipped work saves, even with ~half the blocks empty)
    cf = cand.astype(jnp.bfloat16)
    rows_before = jnp.sum(
        jnp.dot(tril_ref[:], cf, preferred_element_type=jnp.float32),
        axis=1, keepdims=True)                                  # (rb, 1)
    lane_ex = jnp.dot(cf, triu_ref[:], preferred_element_type=jnp.float32)
    rank = (rows_before + lane_ex).astype(jnp.int32)            # (rb, 128)
    g1 = jnp.where(cand > 0, gpos + 1, 0)
    out = jnp.full((1, LANES), -1, jnp.int32)
    for k in range(slots):
        pk = jnp.sum(jnp.where(rank == k, g1, 0), dtype=jnp.int32) - 1
        out = jnp.where(lane == k, pk, out)
    return jnp.where(lane == slots, total, out)


def emit_slots(cand, out_ref, tril_ref, triu_ref, *, rb, slots):
    """slot_row over a whole (rb, 128) block, written to out_ref — the
    form the per-engine kernels use (pallas_engines, rb = SLOT_RB)."""
    out_ref[:] = slot_row(cand, tril_ref, triu_ref,
                          gpos=_window_positions(rb), slots=slots)


def emit_words(tile_ref, words_ref, *, rb):
    """Write this block's (rb//4, 128) int32 LE word view of its 128 owned
    bytes per row — fused replacement for words_view_pallas (saves that
    kernel's re-read of the text; the tile is already in VMEM).

    The sublane-split reshape (rb, 128) -> (rb//4, 4, 128) is supported by
    Mosaic (probe_sublane_stride.py; a strided t[q::4] slice is NOT); the
    byte extraction is then the same 16 lane-permutation gathers as
    _words_kernel, on quarter-height arrays."""
    owned = tile_ref[:, :LANES].astype(jnp.int32).reshape(rb // 4, 4, LANES)
    lane = jax.lax.broadcasted_iota(jnp.int32, (rb // 4, LANES), 1)
    j4 = (lane & 31) << 2
    out = jnp.zeros((rb // 4, LANES), jnp.int32)
    for q in range(4):
        rq = owned[:, q, :]
        acc = jnp.zeros((rb // 4, LANES), jnp.int32)
        for k in range(4):
            g = jnp.take_along_axis(rq, j4 + k, axis=1)
            acc = acc | (g << (8 * k))
        out = jnp.where((lane >> 5) == q, acc, out)
    words_ref[:] = out


@functools.lru_cache(maxsize=None)
def fp_weights_views(mult: int, m: int):
    """fp_weights restructured for the FLAT (rows, 128) text layout: one
    (256, 128) bf16 [lo; hi] weight block per 128-byte context view j
    (j in [0, 1 + ceil((m-1)/128))), where W_j[i, l] = mult^(j*128+i-l)
    mod 2^16 on the band 0 <= j*128+i-l < m.

    Each per-view matmul contracts over only 128 rows, so its f32
    accumulation holds <= 128 terms of <= 255*255 — always exact, with no
    PART_TERMS splitting even at m = 513.  Total MXU work never exceeds
    the (rb, row_bytes) form's."""
    h = cdiv(max(m - 1, 1), LANES)
    out = []
    for j in range(1 + h):
        W = np.zeros((LANES, 128), np.int64)
        for l in range(LANES):
            for i in range(LANES):
                e = j * LANES + i - l
                if 0 <= e < m:
                    W[i, l] = pow(mult, e, 1 << 16)
        lo = (W & 0xFF).astype(np.float32)
        hi = (W >> 8).astype(np.float32)
        out.append(np.concatenate([lo, hi], axis=0).astype(jnp.bfloat16))
    return tuple(out)


@functools.lru_cache(maxsize=None)
def wid_weights_views(d: int, bits: int, off: int, m: int):
    """wid_weights restructured for the FLAT (rows, 128) layout: one
    (256, 128) bf16 [lo; hi] block per 128-byte context view j, with
    W_j[i, l] = 1 << (bits*(d-1-e)) on the band e = j*128 + i - l - off,
    0 <= e < d — the packed id of the d chars starting `off` into each
    window, computed on the MXU from the in-kernel context views
    (the engine stage-0 d-gram keys: AC prefixes at off=0, SH/SBOM
    suffixes at off=m-d).  bits*d <= 16 keeps every value exact in
    bf16/f32 (same argument as wid_weights)."""
    h = cdiv(max(m - 1, 1), LANES)
    out = []
    for j in range(1 + h):
        W = np.zeros((LANES, 128), np.int64)
        for l in range(LANES):
            for i in range(LANES):
                e = j * LANES + i - l - off
                if 0 <= e < d:
                    W[i, l] = 1 << (bits * (d - 1 - e))
        lo = (W & 0xFF).astype(np.float32)
        hi = (W >> 8).astype(np.float32)
        out.append(np.concatenate([lo, hi], axis=0).astype(jnp.bfloat16))
    return tuple(out)


def edge_rows_for(m: int) -> int:
    """Rows of following-text edge reference the flat kernels stage per
    block: the power-of-two >= h = ceil((m-1)/128) context views (8
    covers m <= 1025 — the round-4 cap; 16/32 extend the fast path to
    m <= 4097 instead of the 1000x XLA-fallback cliff past 1025)."""
    h = cdiv(max(m - 1, 1), LANES)
    e = 8
    while e < h:
        e *= 2
    return e


def _ctx_views(a_ref, edge_ref, rb: int, h: int) -> list:
    """The h+1 128-byte context views of a flat (rb, 128) block, derived
    in-kernel: view j rows are the block's rows shifted up by j, with the
    final j rows patched from the following E = edge_ref rows of text —
    the (m-1)-byte halo of the overlap tile without materializing the
    (R, row_bytes) concat in HBM (see _exact_flat_kernel's
    measurements)."""
    a = a_ref[:].astype(jnp.int32)
    views = [a]
    if h:
        E = edge_ref.shape[0]
        row = jax.lax.broadcasted_iota(jnp.int32, (rb, LANES), 0)
        epad = jnp.concatenate(
            [jnp.zeros((rb - E, LANES), jnp.int32),
             edge_ref[:].astype(jnp.int32)], axis=0)
        for j in range(1, h + 1):
            rolled = jnp.roll(a, -j, axis=0)
            # shift 0 (j == E) lowers to a zero-size slice Mosaic rejects
            patch = epad if j == E else jnp.roll(epad, E - j, axis=0)
            views.append(jnp.where(row >= rb - j, patch, rolled))
    return views


def _fp_keys_views(views_bf: list, w_refs, mask: int) -> jnp.ndarray:
    """Base fingerprint over the context views (w_refs: one (256, 128)
    fp_weights_views block per view).

    Each per-view dot is exact in f32 (<= 128 terms of <= 255*255 <
    2^24), but the CROSS-VIEW accumulation must be integer: summed in
    f32, three or more views of near-max bytes exceed 2^24 (m=513
    sigma=256 all-0xFF windows reach 17.3M) and round at ulp=2, breaking
    the key mod 2^16 and silently rejecting true matches.  int32
    accumulation with wraparound is exact mod-2^16 arithmetic, the same
    argument as _fp_keys_mxu's per-part accumulation."""
    acc = None
    for v, w in zip(views_bf, w_refs):
        lo = jnp.dot(v, w[:LANES], preferred_element_type=jnp.float32)
        hi = jnp.dot(v, w[LANES:], preferred_element_type=jnp.float32)
        t = lo.astype(jnp.int32) + (hi.astype(jnp.int32) << 8)
        acc = t if acc is None else acc + t
    return acc & mask


def _bases_flat(a_ref, edge_ref, w_refs, *, m, rb, n_bases):
    """The n_bases base fingerprints of a flat (rb, 128) block: context
    views from _ctx_views, per-view weight blocks from fp_weights_views."""
    h = cdiv(max(m - 1, 1), LANES)
    nv = 1 + h
    views = _ctx_views(a_ref, edge_ref, rb, h)
    views_bf = [v.astype(jnp.bfloat16) for v in views]
    return [_fp_keys_views(views_bf, w_refs[i * nv:(i + 1) * nv], 0xFFFF)
            for i in range(n_bases)]


def _candidates_flat(a_ref, edge_ref, bitmap_refs, w_refs, *, m, n_stages,
                     n_starts, rb, cd=None):
    """_candidates over the flat layout: context views from _ctx_views,
    base fingerprints from per-view weight blocks."""
    if cd is None:
        cd = STAGE_CD[:n_stages]
    bases = _bases_flat(a_ref, edge_ref, w_refs, m=m, rb=rb,
                        n_bases=n_base_fps(n_stages, cd))
    smask = bitmap_refs[0].shape[0] * 4096 - 1
    cand = None
    for s in range(n_stages):
        hit = _bitmap_lookup(bitmap_refs[s],
                             derived_keys(bases, cd[s], smask), rb)
        cand = hit if cand is None else (cand & hit)
    return cand & _valid_starts(rb, n_starts)


def filter_rb(n_stages: int, banks: int, rb: int = FILTER_RB) -> int:
    """Rows per filter-kernel grid block, shrunk when stage count x bank
    count would overflow Mosaic's scoped-VMEM stack: the kernel keeps
    ~one (rb, 128) int32 temporary live per (stage, bank) — measured
    94.8 MB at k=25/B=16/rb=512, matching this model — so saturating
    pattern sets (p ~ 100k needs 16 wide or 25+ narrow stages) must trade
    grid-step economy for stack headroom under the 64 MB limit."""
    while rb > SLOT_RB and n_stages * banks * rb * LANES * 4 > 40 * 2**20:
        rb //= 2
    return rb


def _filter_slots_flat_kernel(a_ref, edge_ref, *refs, m, n_stages, n_starts,
                              rb, nv, slots, cd=None):
    """Filter + fused in-kernel compaction (slot_row) + fused word view.

    Instead of writing the full (R, 128) mask to HBM (268 MB at 256 MiB
    text) for an XLA scatter-based compaction (~13.5 ms, R-element scatter
    — see docs/DESIGN.md dead ends), each grid block emits `slots` compact
    candidate positions + its candidate count PER SLOT_RB SUB-BLOCK: a
    2^15x smaller output whose host-side compaction is over
    nblocks*halves*slots elements.  Extraction per 16K-position sub-block
    keeps the BLOCK_SLOTS budget calibration while the filter block (rb)
    grows for grid-step economy."""
    bitmap_refs = refs[:n_stages]
    nw = n_base_fps(n_stages, cd)
    w_refs = refs[n_stages:n_stages + nw * nv]
    tril_ref, triu_ref = refs[n_stages + nw * nv:n_stages + nw * nv + 2]
    out_ref = refs[n_stages + nw * nv + 2]
    words_ref = refs[n_stages + nw * nv + 3]
    cand = _candidates_flat(a_ref, edge_ref, bitmap_refs, w_refs, m=m,
                            n_stages=n_stages, n_starts=n_starts, rb=rb,
                            cd=cd)
    gpos = _window_positions(rb)
    for hh in range(rb // SLOT_RB):
        sub = slice(hh * SLOT_RB, (hh + 1) * SLOT_RB)
        row = slot_row(cand[sub], tril_ref, triu_ref, gpos=gpos[sub],
                       slots=slots)
        out_ref[0:1, hh * LANES:(hh + 1) * LANES] = row
    emit_words_flat(a_ref, words_ref, rb=rb)


def emit_words_flat(a_ref, words_ref, *, rb):
    """emit_words for the flat layout: the block's 128 owned bytes per row
    ARE the block (no [:, :LANES] slice of a wider tile)."""
    owned = a_ref[:].astype(jnp.int32).reshape(rb // 4, 4, LANES)
    lane = jax.lax.broadcasted_iota(jnp.int32, (rb // 4, LANES), 1)
    j4 = (lane & 31) << 2
    out = jnp.zeros((rb // 4, LANES), jnp.int32)
    for q in range(4):
        rq = owned[:, q, :]
        acc = jnp.zeros((rb // 4, LANES), jnp.int32)
        for k in range(4):
            g = jnp.take_along_axis(rq, j4 + k, axis=1)
            acc = acc | (g << (8 * k))
        out = jnp.where((lane >> 5) == q, acc, out)
    words_ref[:] = out


@functools.lru_cache(maxsize=None)
def _rank_weights(rb: int):
    """(TRIL_strict (rb, rb), TRIU_strict (128, 128)) bf16 ones matrices
    for the in-kernel rank matmuls (0/1 entries: exact in bf16)."""
    tril = np.tril(np.ones((rb, rb), np.float32), k=-1)
    triu = np.triu(np.ones((LANES, LANES), np.float32), k=1)
    return tril.astype(jnp.bfloat16), triu.astype(jnp.bfloat16)


@functools.partial(jax.jit, static_argnames=("m", "n", "n_stages", "slots",
                                             "nw_min", "rb", "cd",
                                             "interpret"))
def filter_slots_pallas(text: jnp.ndarray, bitmaps: tuple, *, m: int, n: int,
                        n_stages: int, slots: int = BLOCK_SLOTS,
                        nw_min: int = 0, rb: int = FILTER_RB,
                        cd: tuple | None = None,
                        interpret: bool = False):
    """((nblocks, 128) int32 slot rows, (>= nw_min,) int32 word view).

    Slot rows: lanes [0, slots) hold global candidate positions in block
    order (-1 = empty slot); lane `slots` holds the block's TRUE candidate
    count (count > slots means candidates were dropped — the caller must
    fall back to filter_mask_pallas + compact_mask).  See
    fast.compact_slots.

    The word view is the fused replacement for words_view_pallas: LE int32
    words of the text's owned bytes (zero-padded), covering at least
    nw_min words (pass fast.words_len(n, words)); the grid is extended
    with zero blocks when the verify margin demands it.

    Runs over the FLAT (rows, 128) text layout — context views derived
    in-kernel (_ctx_views) instead of materializing overlap_rows' (R,
    row_bytes) concat in HBM.  A block-aligned text (n == R*128, R a
    multiple of rb) is read with ZERO host-side copies; the nw_min margin
    is skipped there (word view = exactly the text's n/4 words — verify
    gathers clamp and _verify_matched masks out-of-window tail bytes, so
    margin words are never observed)."""
    rb = filter_rb(n_stages, int(bitmaps[0].shape[0]), rb)
    n_starts = max(0, n - m + 1)
    h = cdiv(max(m - 1, 1), LANES)
    nv = 1 + h
    eE = edge_rows_for(m)
    nbE = rb // eE
    R0 = max(1, cdiv(n_starts, LANES))
    R0 = cdiv(R0, rb) * rb
    if n == R0 * LANES and int(text.shape[0]) == n:
        R = R0
        rows = text.reshape(R, LANES)
        last = R // eE - 1
        edge_map = lambda i: (jnp.minimum(i * nbE + nbE, last), 0)
    else:
        # min_rows extends the grid with zero rows so the fused word view
        # covers the verify gather margin
        R = max(R0, cdiv(cdiv(nw_min, LANES // 4), rb) * rb)
        padded = jnp.zeros(((R + eE) * LANES,), jnp.uint8).at[:n].set(text[:n])
        rows = padded.reshape(R + eE, LANES)
        edge_map = lambda i: (i * nbE + nbE, 0)
    weights = tuple(w for i in range(n_base_fps(n_stages, cd))
                    for w in fp_weights_views(FP_MULTS[i], m))
    tril, triu = _rank_weights(SLOT_RB)
    halves = rb // SLOT_RB
    kern = functools.partial(_filter_slots_flat_kernel, m=m,
                             n_stages=n_stages, n_starts=n_starts, rb=rb,
                             nv=nv, slots=slots, cd=cd)
    slotmat, words = pl.pallas_call(
        kern,
        grid=(R // rb,),
        in_specs=[pl.BlockSpec((rb, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((eE, LANES), edge_map,
                               memory_space=pltpu.VMEM)]
        + [pl.BlockSpec(b.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
           for b in bitmaps]
        + [pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
           for w in weights]
        + [pl.BlockSpec(tril.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
           pl.BlockSpec(triu.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((1, halves * LANES), lambda i: (0, i),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((rb // 4, LANES), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((1, (R // rb) * halves * LANES),
                                        jnp.int32),
                   jax.ShapeDtypeStruct((R // 4, LANES), jnp.int32)],
        interpret=interpret,
        compiler_params=VMEM_LIMIT,
    )(rows, rows, *bitmaps, *weights, tril, triu)
    return slotmat.reshape((R // rb) * halves, LANES), words.reshape(-1)


@functools.lru_cache(maxsize=None)
def _triu_weights():
    """(128, 128) strict-upper-triangular ones, bf16 (numpy: lru_cached and
    possibly first built under a jit trace) — the per-row rank matmul of
    the cascade kernel."""
    return np.triu(np.ones((LANES, LANES), np.float32), k=1).astype(
        jnp.bfloat16)


def _rowpack(cand, vals, triu_ref, *, rb, slots):
    """IN-KERNEL per-row slot extraction + 8:1 lane repack — the cascade's
    compaction primitive (measured ~8 ms / 2^27 positions,
    scripts/probe_rowpack.py).

    cand: (rb, 128) int32 0/1.  For every 128-lane row, the first `slots`
    candidates' values from each array in `vals` are packed so that row
    r's slot k lands at packed[r // 8, 16*(r % 8) + k] — 8 consecutive
    rows fold into one 128-lane row (slots = 16).

    Per-row candidate rank is ONE strict-TRIU MXU matmul (lane-exclusive
    prefix; 0/1 operands exact in bf16).  The slot's source lane comes
    from `slots` masked reductions; values move with 8 grouped
    take_along_axis gathers per array on the (rb/8, 8, 128) sublane-split
    reshape — the gather index is built directly at its REPACKED lane
    (lane 16*(row%8)+k), so no lane rolls are needed.

    Returns (packed values list, valid (rb/8, 128) bool slot-occupied
    mask, overflow scalar: any row had > slots candidates — dropped
    survivors, the caller must treat the scan as overflowed)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (rb, LANES), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (rb, LANES), 0)
    cf = cand.astype(jnp.bfloat16)
    rank = jnp.dot(cf, triu_ref[:],
                   preferred_element_type=jnp.float32).astype(jnp.int32)
    cnt = jnp.sum(cand, axis=1, dtype=jnp.int32).reshape(rb, 1)
    rankv = jnp.where(cand > 0, rank, LANES + 1)
    lrel = lane - ((row & 7) << 4)          # slot lane in the packed row
    idx = jnp.zeros((rb, LANES), jnp.int32)
    for k in range(slots):
        lane_k = jnp.sum(jnp.where(rankv == k, lane, 0), axis=1,
                         dtype=jnp.int32).reshape(rb, 1)
        idx = jnp.where(lrel == k, lane_k, idx)
    rb8 = rb // 8
    lane8 = jax.lax.broadcasted_iota(jnp.int32, (rb8, LANES), 1)
    grp = lane8 >> 4
    idx3 = idx.reshape(rb8, 8, LANES)
    cnt3 = jnp.broadcast_to(cnt, (rb, LANES)).reshape(rb8, 8, LANES)
    cntp = jnp.zeros((rb8, LANES), jnp.int32)
    for j in range(8):
        cntp = jnp.where(grp == j, cnt3[:, j, :], cntp)
    valid = (lane8 & 15) < jnp.minimum(cntp, slots)
    packed = []
    for v in vals:
        v3 = v.reshape(rb8, 8, LANES)
        acc = jnp.zeros((rb8, LANES), jnp.int32)
        for j in range(8):
            g = jnp.take_along_axis(v3[:, j, :], idx3[:, j, :], axis=1)
            acc = jnp.where(grp == j, g, acc)
        packed.append(acc)
    return packed, valid, jnp.any(cnt > slots)


def _cascade_kernel(a_ref, edge_ref, *refs, m, k1, n_stages, n_starts, rb,
                    nv, slots, cd):
    """Two-phase filter + in-kernel compaction cascade (DESIGN.md's
    quantified large-p headroom): phase 1 runs k1 stages DENSE over every
    position, survivors are per-row compacted and 8:1 lane-repacked
    carrying their base fingerprints (fp0|fp1 packed in one int32, fp2 in
    another — phase-2 keys need no recomputation from text), and the
    remaining stages run on the packed EIGHTH, costing B/8 bank-gather
    units each instead of B.

    Output: (rb/8, 128) int32 global candidate positions (-1 empty) per
    block — compacted by fast.compact_valrows outside — plus the fused
    word view and a per-scan overflow flag (any phase-1 row with > slots
    survivors: dropped candidates, the caller must fall back)."""
    bitmap_refs = refs[:n_stages]
    w_refs = refs[n_stages:n_stages + 3 * nv]
    triu_ref = refs[n_stages + 3 * nv]
    packed_ref = refs[n_stages + 3 * nv + 1]
    words_ref = refs[n_stages + 3 * nv + 2]
    ovf_ref = refs[n_stages + 3 * nv + 3]
    bases = _bases_flat(a_ref, edge_ref, w_refs, m=m, rb=rb, n_bases=3)
    smask = bitmap_refs[0].shape[0] * 4096 - 1
    cand = None
    for s in range(k1):
        hit = _bitmap_lookup(bitmap_refs[s],
                             derived_keys(bases, cd[s], smask), rb)
        cand = hit if cand is None else (cand & hit)
    gpos = _window_positions(rb)
    cand = cand & _valid_starts(rb, n_starts)
    packed, valid, ovf = _rowpack(
        cand, [gpos, bases[0] | (bases[1] << 16), bases[2]], triu_ref,
        rb=rb, slots=slots)
    # (x >> 16) & 0xFFFF recovers fp1 regardless of the int32 sign bit
    fps = [packed[1] & 0xFFFF, (packed[1] >> 16) & 0xFFFF, packed[2]]
    cand2 = valid
    for s in range(k1, n_stages):
        hit = _bitmap_lookup(bitmap_refs[s],
                             derived_keys(fps, cd[s], smask), rb // 8)
        cand2 = cand2 & (hit > 0)
    packed_ref[:] = jnp.where(cand2, packed[0], -1)
    emit_words_flat(a_ref, words_ref, rb=rb)

    @pl.when(pl.program_id(0) == 0)
    def _():
        ovf_ref[0, 0] = 0

    ovf_ref[0, 0] = jnp.maximum(ovf_ref[0, 0], ovf.astype(jnp.int32))


@functools.partial(jax.jit, static_argnames=("m", "n", "k1", "n_stages",
                                             "slots", "nw_min", "rb", "cd",
                                             "interpret"))
def cascade_pallas(text: jnp.ndarray, bitmaps: tuple, *, m: int, n: int,
                   k1: int, n_stages: int, slots: int = BLOCK_SLOTS,
                   nw_min: int = 0, rb: int = FILTER_RB,
                   cd: tuple | None = None, interpret: bool = False):
    """((R/8, 128) int32 packed candidate positions (-1 empty), word view,
    (1, 1) int32 phase-1 overflow flag).

    The two-phase cascade form of filter_slots_pallas for saturating
    pattern sets (B >= 8 bank stages): k1 dense stages, per-row
    compaction + 8:1 repack, stages [k1, n_stages) on the packed eighth.
    Flat (rows, 128) layout, zero-copy when block-aligned — layout logic
    identical to filter_slots_pallas.  Compact the packed output with
    fast.compact_valrows; a set overflow flag means phase-1 rows dropped
    candidates and the caller MUST fall back (counts stay total)."""
    assert cd is not None and len(cd) >= n_stages and 0 < k1 < n_stages
    B = int(bitmaps[0].shape[0])
    # VMEM stack: k1 dense stages dominate; phase-2 temps are 1/8-height
    rb = filter_rb(k1 + max(1, (n_stages - k1 + 7) // 8), B, rb)
    n_starts = max(0, n - m + 1)
    h = cdiv(max(m - 1, 1), LANES)
    nv = 1 + h
    eE = edge_rows_for(m)
    nbE = rb // eE
    R0 = max(1, cdiv(n_starts, LANES))
    R0 = cdiv(R0, rb) * rb
    if n == R0 * LANES and int(text.shape[0]) == n:
        R = R0
        rows = text.reshape(R, LANES)
        last = R // eE - 1
        edge_map = lambda i: (jnp.minimum(i * nbE + nbE, last), 0)
    else:
        R = max(R0, cdiv(cdiv(nw_min, LANES // 4), rb) * rb)
        padded = jnp.zeros(((R + eE) * LANES,), jnp.uint8).at[:n].set(text[:n])
        rows = padded.reshape(R + eE, LANES)
        edge_map = lambda i: (i * nbE + nbE, 0)
    weights = tuple(w for i in range(3)
                    for w in fp_weights_views(FP_MULTS[i], m))
    triu = _triu_weights()
    kern = functools.partial(_cascade_kernel, m=m, k1=k1, n_stages=n_stages,
                             n_starts=n_starts, rb=rb, nv=nv, slots=slots,
                             cd=cd)
    packed, words, ovf = pl.pallas_call(
        kern,
        grid=(R // rb,),
        in_specs=[pl.BlockSpec((rb, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((eE, LANES), edge_map,
                               memory_space=pltpu.VMEM)]
        + [pl.BlockSpec(b.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
           for b in bitmaps]
        + [pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
           for w in weights]
        + [pl.BlockSpec(triu.shape, lambda i: (0, 0),
                        memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((rb // 8, LANES), lambda i: (i, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((rb // 4, LANES), lambda i: (i, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, 1), lambda i: (0, 0),
                                memory_space=pltpu.SMEM)],
        out_shape=[jax.ShapeDtypeStruct((R // 8, LANES), jnp.int32),
                   jax.ShapeDtypeStruct((R // 4, LANES), jnp.int32),
                   jax.ShapeDtypeStruct((1, 1), jnp.int32)],
        interpret=interpret,
        compiler_params=VMEM_LIMIT,
    )(rows, rows, *bitmaps, *weights, triu)
    return packed, words.reshape(-1), ovf


#: rows per block for the exact COUNT kernel: larger blocks amortize the
#: per-step overhead around the wid matmul (probe_exact_opts.py: 10.7 ->
#: 12.5 GB/s going 512 -> 1024 with MXU keys; 256 KiB tile + 512 KiB bf16
#: copy stay comfortably in VMEM)
EXACT_RB = 1024


def _exact_flat_kernel(a_ref, edge_ref, bitmap_ref, w_ref, out_ref, *,
                       n_starts, rb):
    """Exact count over the FLAT (rows, 128) text layout — no materialized
    overlap tile.  The second 128-byte context view is derived in-kernel:
    b[r] = a[r+1], i.e. a one-sublane roll with the block's following row
    (edge_ref) patched into the last slot.  The wid matmul splits across
    the two views (wid_weights rows [0,128)+[256,384) act on a, rows
    [128,256)+[384,512) on b — same FLOPs as the (rb, 256) form).

    Measured (scripts/probe_layout.py, 256 MiB DNA m=8 p=10k): the shipped
    overlap_rows pipeline pays ~3.2 ms for the pad copy + (R, 256) HBM
    concat (2n write + 2n kernel read); this layout reads the text once
    (21.6 -> 19.6 ms padded, ~18.9 ms zero-copy aligned)."""
    a = a_ref[:].astype(jnp.int32)
    nxt = edge_ref[0:1, :].astype(jnp.int32)
    row = jax.lax.broadcasted_iota(jnp.int32, (rb, LANES), 0)
    b = jnp.where(row == rb - 1, nxt, jnp.roll(a, -1, axis=0))
    af = a.astype(jnp.bfloat16)
    bf = b.astype(jnp.bfloat16)
    lo = (jnp.dot(af, w_ref[0:128], preferred_element_type=jnp.float32)
          + jnp.dot(bf, w_ref[128:256], preferred_element_type=jnp.float32))
    hi = (jnp.dot(af, w_ref[256:384], preferred_element_type=jnp.float32)
          + jnp.dot(bf, w_ref[384:512], preferred_element_type=jnp.float32))
    keys = (lo.astype(jnp.int32) + (hi.astype(jnp.int32) << 8)) & 0xFFFF
    hit = _bitmap_lookup(bitmap_ref, keys, rb)
    hit = hit & _valid_starts(rb, n_starts)
    s = jnp.sum(hit, dtype=jnp.int32)

    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[0, 0] = 0

    out_ref[0, 0] += s


@functools.partial(jax.jit, static_argnames=("m", "sigma", "n", "rb",
                                             "interpret"))
def _exact_count_flat(text: jnp.ndarray, bitmap: jnp.ndarray, *, m: int,
                      sigma: int, n: int, rb: int = EXACT_RB,
                      interpret: bool = False) -> jnp.ndarray:
    """exact_count_pallas over the flat layout (guard=False paths).

    When the text is already block-aligned (n == R*128 with R a multiple
    of rb) the kernel reads it with ZERO host-side copies: the reshape is
    free and the last block's edge row is clamped in-bounds (its garbage
    bytes only reach keys of positions >= n_starts, which are masked —
    a window starting at a valid position ends within the text)."""
    n_starts = max(0, n - m + 1)
    R = max(1, -(-n_starts // LANES))
    R = -(-R // rb) * rb
    nb8 = rb // 8
    if n == R * LANES and int(text.shape[0]) == n:
        rows = text.reshape(R, LANES)
        last = R // 8 - 1
        edge_map = lambda i: (jnp.minimum(i * nb8 + nb8, last), 0)
        Rr = R
    else:
        flat_len = (R + 8) * LANES           # 8 zero rows feed the edge ref
        padded = jnp.zeros((flat_len,), jnp.uint8).at[:n].set(text[:n])
        rows = padded.reshape(R + 8, LANES)
        edge_map = lambda i: (i * nb8 + nb8, 0)
        Rr = R + 8
    bits = _bits_per_char(sigma)
    w = wid_weights(m, bits)
    kern = functools.partial(_exact_flat_kernel, n_starts=n_starts, rb=rb)
    out = pl.pallas_call(
        kern,
        grid=(R // rb,),
        in_specs=[
            pl.BlockSpec((rb, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, LANES), edge_map, memory_space=pltpu.VMEM),
            pl.BlockSpec(bitmap.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
        interpret=interpret,
        compiler_params=VMEM_LIMIT,
    )(rows, rows, bitmap, w)
    return out[0, 0]


@functools.partial(jax.jit, static_argnames=("m", "sigma", "n", "rb",
                                             "guard", "interpret"))
def exact_count_pallas(text: jnp.ndarray, bitmap: jnp.ndarray, *, m: int,
                       sigma: int, n: int, rb: int = EXACT_RB,
                       guard: bool = False,
                       interpret: bool = False) -> jnp.ndarray:
    """Exact window-id count (sigma^m <= 2^16). bitmap: (B, 128) int32
    sized to the key space (B*4096 = max(4096, sigma^m) bits).  Window ids
    are computed on the MXU (wid_weights).

    guard=True masks pad-contaminated windows (required when the text may
    contain the out-of-alphabet symbol sigma, i.e. distribution shards
    with sigma-filled halos/tails — see _pad_guard_2d)."""
    if n < m:
        return jnp.int32(0)
    if not guard:
        # no pad guard needed -> the flat zero/one-copy layout (the guard
        # path keeps the (rb, 256) overlap tile its window-max scan needs)
        return _exact_count_flat(text, bitmap, m=m, sigma=sigma, n=n, rb=rb,
                                 interpret=interpret)
    tile, n_starts = overlap_rows(text, n, m, rb)
    R = tile.shape[0]
    bits = _bits_per_char(sigma)
    kern = functools.partial(_exact_kernel, m=m, bits=bits,
                             sigma=sigma, n_starts=n_starts, rb=rb,
                             guard=guard)
    w = wid_weights(m, bits)
    out = pl.pallas_call(
        kern,
        grid=(R // rb,),
        in_specs=[
            pl.BlockSpec((rb, row_bytes_for(m)), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(bitmap.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
        interpret=interpret,
    )(tile, bitmap, w)
    return out[0, 0]


def _words_kernel(tile_ref, out_ref, *, rb):
    """(rb, 512) uint8 -> (rb, 128) int32 little-endian 4-byte words.

    Stride-4 byte extraction as four lane-permutation gathers per 128-byte
    quarter (an XLA strided slice relayouts at ~0.05 GB/s on TPU; a
    (n/4, 4)-u8 bitcast pads the 4-wide minor dim to a full lane tile)."""
    t32 = tile_ref[:].astype(jnp.int32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (rb, LANES), 1)
    j4 = (lane & 31) << 2
    out = jnp.zeros((rb, LANES), jnp.int32)
    for q in range(4):
        tq = t32[:, LANES * q:LANES * (q + 1)]
        acc = jnp.zeros((rb, LANES), jnp.int32)
        for k in range(4):
            g = jnp.take_along_axis(tq, j4 + k, axis=1)
            acc = acc | (g << (8 * k))
        out = jnp.where((lane >> 5) == q, acc, out)
    out_ref[:] = out


@functools.partial(jax.jit, static_argnames=("nw", "rb", "interpret"))
def words_view_pallas(text: jnp.ndarray, *, nw: int, rb: int = DEFAULT_RB,
                      interpret: bool = False) -> jnp.ndarray:
    """(n,) uint8 -> (nw,) int32 LE word view (zero padded), via Pallas."""
    R = -(-nw // LANES)
    R = -(-R // rb) * rb
    padded = jnp.zeros((R * LANES * 4,), jnp.uint8).at[:text.shape[0]].set(text)
    tile = padded.reshape(R, LANES * 4)
    out = pl.pallas_call(
        functools.partial(_words_kernel, rb=rb),
        grid=(R // rb,),
        in_specs=[pl.BlockSpec((rb, LANES * 4), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((rb, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, LANES), jnp.int32),
        interpret=interpret,
    )(tile)
    return out.reshape(-1)[:nw]


def _filter_mask_flat_kernel(a_ref, edge_ref, *refs, m, n_stages, n_starts,
                             rb, nv, cd=None):
    bitmap_refs = refs[:n_stages]
    nw = n_base_fps(n_stages, cd)
    w_refs = refs[n_stages:n_stages + nw * nv]
    mask_ref = refs[n_stages + nw * nv]
    cand = _candidates_flat(a_ref, edge_ref, bitmap_refs, w_refs, m=m,
                            n_stages=n_stages, n_starts=n_starts, rb=rb,
                            cd=cd)
    mask_ref[:] = cand.astype(jnp.int8)


@functools.partial(jax.jit, static_argnames=("m", "n", "n_stages", "rb",
                                             "cd", "interpret"))
def filter_mask_pallas(text: jnp.ndarray, bitmaps: tuple, *, m: int, n: int,
                       n_stages: int, rb: int = FILTER_RB,
                       cd: tuple | None = None,
                       interpret: bool = False) -> jnp.ndarray:
    """(n_starts,) int8 candidate mask from k fingerprint stages
    (keys on the MXU, bitmap membership on the VPU), over the flat
    (rows, 128) layout (zero-copy when block-aligned — see
    filter_slots_pallas)."""
    rb = filter_rb(n_stages, int(bitmaps[0].shape[0]), rb)
    n_starts = max(0, n - m + 1)
    R = max(1, cdiv(n_starts, LANES))
    R = cdiv(R, rb) * rb
    h = cdiv(max(m - 1, 1), LANES)
    nv = 1 + h
    eE = edge_rows_for(m)
    nbE = rb // eE
    if n == R * LANES and int(text.shape[0]) == n:
        rows = text.reshape(R, LANES)
        last = R // eE - 1
        edge_map = lambda i: (jnp.minimum(i * nbE + nbE, last), 0)
    else:
        padded = jnp.zeros(((R + eE) * LANES,), jnp.uint8).at[:n].set(text[:n])
        rows = padded.reshape(R + eE, LANES)
        edge_map = lambda i: (i * nbE + nbE, 0)
    weights = tuple(w for i in range(n_base_fps(n_stages, cd))
                    for w in fp_weights_views(FP_MULTS[i], m))
    kern = functools.partial(_filter_mask_flat_kernel, m=m,
                             n_stages=n_stages, n_starts=n_starts, rb=rb,
                             nv=nv, cd=cd)
    mask = pl.pallas_call(
        kern,
        grid=(R // rb,),
        in_specs=[pl.BlockSpec((rb, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((eE, LANES), edge_map,
                               memory_space=pltpu.VMEM)]
        + [pl.BlockSpec(b.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
           for b in bitmaps]
        + [pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
           for w in weights],
        out_specs=pl.BlockSpec((rb, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, LANES), jnp.int8),
        interpret=interpret,
        compiler_params=VMEM_LIMIT,
    )(rows, rows, *bitmaps, *weights)
    return mask      # (R, 128); invalid positions already zeroed in-kernel
