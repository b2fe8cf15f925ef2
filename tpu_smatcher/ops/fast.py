"""The shared TPU fast path: dense bitmap filters + sparse exact verification.

Rationale (measured, scripts/probe_dyngather*.py + probe_lookup_scale.py):
on TPU the five reference algorithms' branchy skip loops and big-table
gathers are all slower than one shared kernel skeleton built from the two
primitives the hardware is actually fast at —

  1. DENSE stage: per-window 16-bit keys (exact packed window ids when
     sigma^m <= 2^16, else polynomial fingerprints) tested against 65536-bit
     bitmaps via 128-lane dynamic_gather banks.  Pure elementwise + lane
     gathers: XLA fuses the whole chain into a streaming pass (~hundreds of
     GB/s on v5e).
  2. SPARSE stage: candidates compacted with jnp.nonzero(size=CAP) and
     verified exactly (window-word compares against fingerprint-bucketed
     patterns).  Generic gathers are slow (~0.13 G/s) but run on only the
     CAP-bounded candidate set.

When the window id is exact (e.g. DNA m<=8, binary m<=16), stage 1 alone is
the complete engine — the bitmap is literally the final-state table of the
complete window automaton (an AC DFA over all sigma^m window states whose
transition is a shift — no gathers needed for transitions at all).

Counts are the shared semantics of all five reference engines (SURVEY.md §7):
number of window positions with >= 1 exact pattern occurrence.
"""

from __future__ import annotations

import dataclasses
import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from tpu_smatcher.ops.lookup import bitmap_test, pack_bitmap
from tpu_smatcher.automata.verify import pack_rows

BITMAP_BITS = 1 << 16
#: fingerprint multipliers per stage (odd => invertible mod 2^16)
FP_MULTS = (0x9E37, 0x6A09, 0xB2D1, 0x85EB, 0xC2B3,
            0x2545, 0x9B61, 0x6C89, 0x5BD1, 0xA511)
#: per-stage derivation constants: stage s tests key_s = (fp0 + C_s*fp1 +
#: D_s*fp2) mod stage_bits (Kirsch-Mitzenmacher double/triple hashing).
#: Only THREE base fingerprints are ever computed — the same fp0/fp1/fp2
#: the verification buckets already need — so adding a stage costs only a
#: few ALU ops + its bank gathers, not another fingerprint pass.  Triple
#: (not double) derivation keeps the full-collision probability at
#: stage_bits^-3: with two bases, fp0/fp1 colliding mod stage_bits makes a
#: window pass EVERY stage, and at p=10k that alone would eat the candidate
#: budget.  Odd constants avoid mod-2^k degeneracies.
#: For WIDE stages (stage_bits > 2^16, large pattern sets) the (0,0)/(1,0)
#: head is skipped: key 0 = fp0 alone only reaches the low 2^16 bits of a
#: wider bitmap (fp0 < 2^16), and (1,0) only 2^17 — every wide stage needs
#: a multiplier C >= 2^(b-16) so fp0 + C*fp1 covers all 2^b values.  All
#: constants below the head satisfy that through b = 26.
STAGE_CD = ((0, 0), (1, 0),
            (0x2FE9, 0x33C9), (0xA909, 0xBA4D), (0xF4D9, 0xE2A9),
            (0x073F, 0x26A7), (0xA38D, 0x1817), (0xA017, 0xBB4B),
            (0x63D9, 0x9A23), (0x0C7B, 0x234D), (0xB145, 0xF907),
            (0xB2B9, 0x6B23), (0x41C9, 0xDB41), (0xB39F, 0xFB23),
            (0x891D, 0x7965), (0xA797, 0x8E7D), (0xA5D5, 0x0F9F),
            (0xD951, 0xC47B), (0x3F3B, 0xA4E3), (0x934B, 0x6D3D),
            (0xBACD, 0x1523), (0x09E9, 0x7D65), (0x3AC3, 0x0C85),
            (0xDB3D, 0xE503), (0x3941, 0x29FD), (0x45AD, 0x89F3),
            (0x6E65, 0x071F), (0xDDEB, 0x9D6B), (0xE22B, 0x9FFB),
            (0xA845, 0x325F), (0xCA45, 0x1C1B), (0x4219, 0xB033))
DEFAULT_TILE = 1 << 24
DEFAULT_CAP = 1 << 16
#: measured joint-FPR correlation of the derived filter stages (all affine
#: in the same 3 base fingerprints): actual candidate rates run ~5x the
#: independence product of the stage fills (p=10k, 16384-bit stages, k=13:
#: 3.25 false candidates per 16K block vs 0.6 estimated)
STAGE_CF = 5.0


def _bits_per_char(sigma: int) -> int:
    return max(1, (sigma - 1).bit_length())


def exact_wid_supported(sigma: int, m: int) -> bool:
    return m * _bits_per_char(sigma) <= 16


def _wid_keys_np(patterns: np.ndarray, sigma: int) -> np.ndarray:
    bits = _bits_per_char(sigma)
    w = np.zeros(len(patterns), np.int64)
    for i in range(patterns.shape[1]):
        w = (w << bits) | patterns[:, i]
    return w


def _fp_keys_np(patterns: np.ndarray, mult: int) -> np.ndarray:
    fp = np.zeros(len(patterns), np.int64)
    rp = 1
    for i in range(patterns.shape[1]):
        fp = (fp + patterns[:, i].astype(np.int64) * rp) & 0xFFFF
        rp = (rp * mult) & 0xFFFF
    return fp


@dataclasses.dataclass
class FastTables:
    exact: bool
    m: int
    sigma: int
    n_stages: int           # default stage count for fixed-tile (XLA) scans
    bitmaps: tuple          # derived-stage bitmaps (B, 128) int32, B*4096 =
                            # stage_bits; stage s holds keys fp0 + C_s*fp1 +
                            # D_s*fp2 mod stage_bits (STAGE_CD); enough
                            # stages for n = 2^31 are built at construction
    # verification tables (None when exact):
    bucket_ids: object      # (2^(16+eb) * L,) int32 device, -1 padded
    lmax: int
    packed: object          # (p, W) int32 device
    words: int
    eb: int = 0             # bucket-key extension bits taken from fp1
    density: float = 0.0    # stage-0 bitmap fill fraction (per-stage FPR)
    bucket_fp2: object = None   # (2^(16+eb) * L,) int32: fp2 per slot, -1 pad
    slot_ok: bool = False   # fp2 unique within every bucket -> slot-select
                            # verify (one full compare instead of lmax)
    stage_bits: int = BITMAP_BITS   # bits per fingerprint-stage bitmap
    stage_fills: tuple = ()  # TRUE fill fraction of each built stage bitmap
                             # (density is stage 0 only; derived stages run
                             # slightly denser — measured 0.48 vs 0.46 at
                             # p=10k/16384 bits — and the per-block slot
                             # budget must use the real prefix product)
    stage_cd: tuple = ()     # the (C, D) derivation constants actually used
                             # per built stage: STAGE_CD for 16-bit stages,
                             # STAGE_CD[2:] for wide ones (see STAGE_CD)
    # device-side pattern-id attribution (count_per_pattern/matches — the
    # reference's verify loops identify the pattern but only count it,
    # wu/wu.c:184-201):
    orig_ids: object = None  # (p_dedup,) int32 device: internal (deduped)
                             # id -> smallest ORIGINAL pattern id
    wid_pids: object = None  # exact tier: (nbits,) int32 device: window id
                             # -> smallest original pattern id (-1 = none)
    n_orig: int = 0          # original pattern count (histogram length)

    def cd(self, k: int) -> tuple:
        """(C, D) constants of the first k stages (prefix of stage_cd; the
        STAGE_CD head for tables built before the field existed).  Deep
        tuples: the result is a static jit argument, and checkpoint
        round-trips restore stage_cd as JSON lists."""
        base = self.stage_cd or STAGE_CD
        return tuple((int(c), int(d)) for c, d in base[:k])


def fp_rate(ft: FastTables, k: int, cf: float = STAGE_CF) -> float:
    """Expected per-position false-candidate rate after the first k filter
    stages: the TRUE prefix product of the built stages' bitmap fills
    (derived stages run denser than stage 0) times the measured correlation
    factor cf.  The derived stages are all affine in the same 3 base
    fingerprints, so their joint pass rate is NOT the product of the
    marginals — measured ~5x the independence estimate at p=10k/16384-bit
    stages (3.25 false candidates per 16K block at k=13 vs 0.6 estimated).
    Used by the PER-BLOCK slot budget (stages_for_block) and build-time
    sizing; the total-cap budget (stages_for) deliberately keeps its
    jointly-calibrated independence estimate — see its docstring."""
    if ft.exact:
        return 0.0
    fills = ft.stage_fills or tuple(ft.density for _ in ft.bitmaps)
    prod = 1.0
    for s in range(min(k, len(fills))):
        prod *= fills[s]
    return min(prod * cf, 1.0)


def cap_for(ft: FastTables) -> int:
    """Default candidate cap, scaled to the pattern count: reference-corpus
    pattern sets are extracted FROM the text (execute.sh), so ~every
    pattern is present and matches alone approach p — at p = 100k
    (main.c:372-373) a fixed 2^16 cap overflows on every scan of a big
    corpus and the retry ladder dominates (measured 1.6 s/scan vs 0.4 s
    filter-bound at n = 2^27).  4x headroom over p, bounded to 2^20
    (verify cost follows the TRUE candidate count via verify_chunked, so a
    larger static cap costs only compaction-scatter size)."""
    if ft.exact or ft.packed is None:
        return DEFAULT_CAP
    p = int(ft.packed.shape[0])
    return max(DEFAULT_CAP, min(1 << 20, 1 << (4 * p - 1).bit_length()))


def stages_for(ft: FastTables, n: int, cap: int) -> int:
    """Stage count so (a) expected false candidates over n positions fit
    well inside the candidate cap (n * density^k <= cap/4) and (b) the
    per-row candidate rate stays far below compact_mask's row_slots budget
    (128 * density^k <= 0.5).

    DELIBERATELY uses the independence estimate, not fp_rate: this
    threshold pair is jointly calibrated — the 4x cap margin absorbs the
    measured TOTAL-level stage correlation (~2.4x at the baseline m=32
    corpus: 27k true candidates vs the 11k estimate at k=13), and the
    empirically optimal k=13 baseline configuration (3.3-3.5 GB/s) sits
    exactly at this budget.  Swapping in fp_rate's per-block-measured 5x
    factor here would force k=15-16 and regress the measured optimum; the
    corrected rate belongs to the PER-BLOCK slot budget
    (stages_for_block), whose 16-slot sizing was calibrated against
    measured per-block histograms."""
    if ft.exact:
        return 1
    k = 1
    while ((n * ft.density ** k > cap / 4 or ft.density ** k > 1 / 256)
           and k < len(ft.bitmaps)):
        k += 1
    return k


def stages_for_block(ft: FastTables, block_positions: int,
                     lam: float = 3.5, cf: float = STAGE_CF) -> int:
    """Stage count so expected false candidates per slot-kernel grid block
    stay <= lam (the fused in-kernel compaction extracts BLOCK_SLOTS=16
    per block; measured per-block histograms cluster up to ~4.3x the mean,
    so lam=3.5 keeps the observed max ~15 <= 16, and slot overflow — and
    so the mask-path retry — stays off the measured corpora).

    Expected candidates use fp_rate (true stage fills x the measured
    stage-correlation factor).  Overflow remains possible for adversarial
    pattern sets (FastScanner adapts by adding stages after a retry) and
    for dense-MATCH corpora (which fall back to the exact mask path).
    Returns len(ft.bitmaps) + 1 when even every built stage cannot meet
    the budget (callers then use the mask+compact path)."""
    if ft.exact:
        return 1
    k = 1
    while block_positions * fp_rate(ft, k, cf) > lam:
        if k >= len(ft.bitmaps):
            return len(ft.bitmaps) + 1
        k += 1
    return k


def k1_for(ft: FastTables, lam_row: float = 4.0) -> int | None:
    """Phase-1 depth of the two-phase cascade (pallas_filter.cascade_pallas):
    the smallest dense stage count whose expected survivors per 128-lane
    row fit the per-row slot budget with margin — 128 * prod(fills) * cf1
    <= lam_row, where cf1 is the measured stage-correlation of the head
    (scripts/probe_cascade.py, 256 MiB DNA m=32): 16-bit-space tables use
    the (0,0)/(1,0) STAGE_CD head whose joint pass rate runs ~2.07x the
    independence product; WIDE tables are all triple-mixed and measure
    1.0-1.06x.  lam_row=4.0 reproduces the measured zero-overflow depths
    (k1=6 at p=100k, k1=8 at p=30k, 16-slot budget, max row 14).  Returns
    None when no built prefix meets the budget (callers then use the
    mask/slot paths); per-row overflow at runtime falls back exactly and
    bumps the depth (_async_retry)."""
    if ft.exact:
        return None
    cf1 = 2.5 if ft.stage_bits <= BITMAP_BITS else 1.3
    fills = ft.stage_fills or (ft.density,) * len(ft.bitmaps)
    prod = 1.0
    # never deeper than the BUILT stages (tests truncate ft.bitmaps)
    for k in range(1, min(len(fills), len(ft.bitmaps)) + 1):
        prod *= fills[k - 1]
        if 128 * prod * cf1 <= lam_row:
            return k
    return None


def build_fast(patterns: np.ndarray, sigma: int, *,
               n_stages: int | None = None,
               stage_bits: int | None = None) -> FastTables:
    """stage_bits= overrides the measured cost model (tests force WIDE
    stages — > 2^16 bits — on pattern sets too small to trigger them)."""
    patterns = np.asarray(patterns, np.uint8)
    n_orig = patterns.shape[0]
    if exact_wid_supported(sigma, patterns.shape[1]):
        m0 = patterns.shape[1]
        nbits = max(4096, 1 << (m0 * _bits_per_char(sigma)))
        keys = _wid_keys_np(patterns, sigma)
        bm = pack_bitmap(keys, nbits)
        # window id -> smallest original pattern id (descending-id writes:
        # the last write per key wins)
        wid_pids = np.full((nbits,), -1, np.int32)
        order = np.argsort(-np.arange(n_orig))
        wid_pids[keys[order]] = order.astype(np.int32)
        return FastTables(True, m0, sigma, 1,
                          (jnp.asarray(bm),), None, 0, None, 0,
                          wid_pids=jnp.asarray(wid_pids), n_orig=n_orig)
    # duplicate patterns cannot change the count (>=1 occurrence per window)
    # and would defeat the per-bucket fp2 uniqueness below — drop them,
    # but keep each deduped row's smallest original id for attribution
    patterns, inv = np.unique(patterns, axis=0, return_inverse=True)
    orig_ids = np.full((patterns.shape[0],), n_orig, np.int64)
    np.minimum.at(orig_ids, inv.reshape(-1), np.arange(n_orig))
    p, m = patterns.shape

    # All filter stages are DERIVED from the three base fingerprints via
    # STAGE_CD (key_s = fp0 + C_s*fp1 + D_s*fp2 mod stage_bits), so a stage
    # costs a few ALU ops plus one gather per 4096-bit bank; scans pick how
    # many stages to apply (stages_for).  stage_bits minimizes measured
    # filter cost per bit of filtering: per-stage cost ~ C_ALU + B*C_GATHER
    # (bank-gather units, measured on v5e: ALU overhead ~0.3 of a bank
    # gather), information = -log2(fill).  At p=10k this picks 16384 bits
    # (B=4, fill 0.46, 13 stages) over the old 32768x8-stage layout — same
    # filtering, ~20% fewer gathers and 5 fewer MXU fingerprint passes.
    fps = [_fp_keys_np(patterns, FP_MULTS[s]) for s in range(3)]

    def key0_for(sb):
        # the fill of stage 0 at sb bits: 16-bit tables test fp0 directly;
        # WIDE tables (> 2^16 bits — large pattern sets saturate the 16-bit
        # space, the reference takes p up to 100,000: main.c:372-373) use
        # the triple-mixed head of STAGE_CD[2:] (fp0 alone cannot reach
        # bits >= 2^16)
        if sb <= BITMAP_BITS:
            return fps[0] & (sb - 1)
        C, D = STAGE_CD[2]
        return (fps[0] + C * fps[1] + D * fps[2]) & (sb - 1)

    C_ALU, C_GATHER = 0.3, 1.0
    if stage_bits is None:
        stage_bits, density, best_cost = 0, 1.0, None
        for sb in (4096, 8192, 16384, 32768, 65536, 131072, 262144):
            bm0 = pack_bitmap(key0_for(sb), sb)
            d = float(np.count_nonzero(
                np.unpackbits(bm0.view(np.uint8)))) / sb
            if d >= 0.98:
                continue
            cost = (C_ALU + (sb // 4096) * C_GATHER) / -math.log2(d)
            if best_cost is None or cost < best_cost:
                stage_bits, density, best_cost = sb, d, cost
        if stage_bits == 0:             # p ~ 2^18 patterns: take the widest
            stage_bits = 262144
    bm0 = pack_bitmap(key0_for(stage_bits), stage_bits)
    density = float(np.count_nonzero(
        np.unpackbits(bm0.view(np.uint8)))) / stage_bits
    cd_table = STAGE_CD if stage_bits <= BITMAP_BITS else STAGE_CD[2:]

    # build enough stages for the worst supported scan (n = 2^31 starts,
    # candidate budget DEFAULT_CAP/4, measured stage correlation STAGE_CF);
    # stages_for picks the prefix to apply
    need = (math.log(max(DEFAULT_CAP / 4 / (1 << 31) / STAGE_CF, 1e-12))
            / math.log(density)) if 0 < density < 1 else 1
    k_build = int(min(len(cd_table), max(3, math.ceil(need) + 1)))
    smask = stage_bits - 1
    bitmaps = []
    stage_fills = []
    for s in range(k_build):
        C, D = cd_table[s]
        key = (fps[0] + C * fps[1] + D * fps[2]) & smask
        bm_s = pack_bitmap(key, stage_bits)
        stage_fills.append(float(np.count_nonzero(
            np.unpackbits(bm_s.view(np.uint8)))) / stage_bits)
        bitmaps.append(jnp.asarray(bm_s))

    if n_stages is None:
        k, prod = 1, stage_fills[0]
        while prod * STAGE_CF * DEFAULT_TILE > DEFAULT_CAP / 4 and k < k_build:
            prod *= stage_fills[min(k, len(stage_fills) - 1)]
            k += 1
        n_stages = k
    n_stages = min(n_stages, k_build)

    # verification buckets keyed by fp0 plus eb low bits of fp1, sized so
    # buckets outnumber patterns ~8x (keeps lmax, and so verify gathers, low)
    eb = max(0, (8 * p - 1).bit_length() - 16) if p > 0 else 0
    eb = min(eb, 8)
    nbuckets = BITMAP_BITS << eb
    key = fps[0] | ((fps[1] & ((1 << eb) - 1)) << 16) if eb else fps[0]
    size = np.bincount(key, minlength=nbuckets)
    lmax = max(1, int(size.max(initial=0)))
    bucket = np.full((nbuckets, lmax), -1, np.int32)
    bucket_fp2 = np.full((nbuckets, lmax), -1, np.int32)
    fp2 = fps[2]
    slot = np.zeros(nbuckets, np.int64)
    for j in range(p):
        h = int(key[j])
        bucket[h, slot[h]] = j
        bucket_fp2[h, slot[h]] = fp2[j]
        slot[h] += 1
    # slot-select verify is exact iff fp2 is unique within every bucket
    # (patterns are deduped above, so only true fp collisions can conflict)
    slot_ok = len(np.unique(key.astype(np.int64) * 65536 + fp2)) == p
    packed = pack_rows(patterns)
    return FastTables(False, m, sigma, n_stages,
                      tuple(bitmaps), jnp.asarray(bucket.reshape(-1)), lmax,
                      jnp.asarray(packed), packed.shape[1], eb, density,
                      jnp.asarray(bucket_fp2.reshape(-1)), slot_ok, stage_bits,
                      tuple(stage_fills), tuple(cd_table[:k_build]),
                      orig_ids=jnp.asarray(orig_ids.astype(np.int32)),
                      n_orig=n_orig)


# ---------------------------------------------------------------------------
# dense key computation (traceable)
# ---------------------------------------------------------------------------

def _wid_keys(chunk: jnp.ndarray, n_starts: int, m: int, sigma: int) -> jnp.ndarray:
    """Packed window ids, O(log m) segment doubling (ops/keys.py)."""
    from tpu_smatcher.ops import keys as keys_mod
    return keys_mod.wid_keys(chunk.astype(jnp.int32), m,
                             _bits_per_char(sigma))[:n_starts]


def _fp_keys(chunk: jnp.ndarray, n_starts: int, m: int, mult: int) -> jnp.ndarray:
    """16-bit polynomial fingerprints, segment doubling (ops/keys.py)."""
    from tpu_smatcher.ops import keys as keys_mod
    return keys_mod.fp_keys(chunk.astype(jnp.int32), m, mult)[:n_starts]


def _pad_guard(chunk: jnp.ndarray, n_starts: int, m: int, sigma: int) -> jnp.ndarray:
    """(n_starts,) bool: window holds only real chars (< sigma) — see
    ops/keys.py:max_keys for why exact-tier scans must mask by this."""
    from tpu_smatcher.ops import keys as keys_mod
    return keys_mod.max_keys(chunk.astype(jnp.int32), m)[:n_starts] < sigma


# ---------------------------------------------------------------------------
# the scan
# ---------------------------------------------------------------------------

def fast_count_core(text: jnp.ndarray, ft: FastTables, *, tile: int = DEFAULT_TILE,
                    cap: int = DEFAULT_CAP, guard: bool = False):
    """Traceable: returns (count, overflowed) — overflowed=1 means some tile
    had more than `cap` candidates and the count may undercount; callers
    fall back to a dense engine in that case (never silently wrong)."""
    n = text.shape[0]
    m = ft.m
    if n < m:
        return jnp.int32(0), jnp.int32(0)
    num_tiles = max(1, -(-(n - m + 1) // tile))
    padded_len = num_tiles * tile + m - 1
    padded = jnp.zeros((padded_len,), jnp.uint8).at[:n].set(text[:n])
    n_valid_total = n - m + 1     # number of real window starts

    def per_tile(i, carry):
        count, overflow = carry
        chunk = jax.lax.dynamic_slice(padded, (i * tile,), (tile + m - 1,))
        # valid starts in this tile
        limit = jnp.clip(n_valid_total - i * tile, 0, tile)
        valid = jax.lax.broadcasted_iota(jnp.int32, (tile, 1), 0).reshape(-1) < limit

        if ft.exact:
            keys = _wid_keys(chunk, tile, m, ft.sigma)
            hit = bitmap_test(ft.bitmaps[0], keys)
            valid_e = (valid & _pad_guard(chunk, tile, m, ft.sigma)
                       if guard else valid)
            return (count + jnp.sum(jnp.where(valid_e, hit, 0), dtype=jnp.int32),
                    overflow)

        smask = ft.stage_bits - 1
        n_st = ft.n_stages
        cd = ft.cd(n_st)
        fp0 = _fp_keys(chunk, tile, m, FP_MULTS[0])
        fp1 = (_fp_keys(chunk, tile, m, FP_MULTS[1])
               if ft.eb or any(c for c, _ in cd) else None)
        fp2 = (_fp_keys(chunk, tile, m, FP_MULTS[2])
               if any(d for _, d in cd) else None)
        cand = None
        for s in range(n_st):
            C, D = cd[s]
            key = fp0
            if C:
                key = key + C * fp1
            if D:
                key = key + D * fp2
            hit = bitmap_test(ft.bitmaps[s], key & smask) == 1
            cand = hit if cand is None else cand & hit
        cand &= valid
        n_cand = jnp.sum(cand, dtype=jnp.int32)
        idxs = nonzero_scatter(cand, cap, tile + m - 1)
        live = idxs < tile
        idxs = jnp.minimum(idxs, tile - 1)
        # sparse exact verification
        t32 = chunk.astype(jnp.int32)
        words = []
        for w in range(ft.words):
            nb = min(4, m - 4 * w)
            acc = jnp.zeros((cap,), jnp.int32)
            for k in range(nb):
                acc = acc | (t32[idxs + 4 * w + k] << (8 * k))
            words.append(acc)
        key0 = fp0[idxs]
        if ft.eb:
            key0 = key0 | ((fp1[idxs] & ((1 << ft.eb) - 1)) << 16)
        matched = jnp.zeros((cap,), bool)
        for l in range(ft.lmax):
            pid = ft.bucket_ids[key0 * ft.lmax + l]
            ok = live & (pid >= 0) & ~matched
            pid_c = jnp.maximum(pid, 0)
            eq = jnp.ones((cap,), bool)
            for w in range(ft.words):
                eq &= ft.packed[pid_c, w] == words[w]
            matched |= ok & eq
        return (count + jnp.sum(matched, dtype=jnp.int32),
                overflow | jnp.int32(n_cand > cap))

    return jax.lax.fori_loop(0, num_tiles, per_tile,
                             (jnp.int32(0), jnp.int32(0)))


def nonzero_scatter(mask, size: int, fill: int):
    """Indices of set elements, like jnp.nonzero(mask, size=, fill_value=),
    via cumsum + unique-index scatter — ~2x faster than XLA's sort-based
    nonzero lowering on TPU (measured 1M elems: 9.8ms -> 5.1ms)."""
    n = mask.shape[0]
    m32 = mask.astype(jnp.int32)
    cum = jnp.cumsum(m32)
    iota = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).reshape(-1)
    # dropped indices are made DISTINCT (size + n + iota) so
    # unique_indices=True is honest even when MORE than `size` elements are
    # set (overflowing set elements land in [size, size + n), disjoint from
    # the dropped band [size + n, size + 2n)) — with duplicate indices the
    # mode="drop" result would be implementation-defined
    pos = jnp.where(m32 > 0, cum - 1, size + n + iota)
    out = jnp.full((size,), fill, jnp.int32)
    return out.at[pos].set(iota, mode="drop", unique_indices=True)


def compact_verify_retry(mask2d, tw, ft, *, cap, caprows, row_slots,
                         n_starts):
    """Optimistic half-cap compact+verify with full-cap retry.

    compact+verify cost scales with the static cap; stages are sized so
    expected candidates <= cap/4, so the half-cap pass succeeds unless
    matches alone exceed cap/4 — the mask and word view are reused on the
    (rare) retry.  Returns (count, overflowed) as python values."""
    caps = [cap // 2, cap] if cap >= 8192 else [cap]
    # final attempt at full per-row budget: dense-match corpora (planted
    # hits, repetitive text) can exceed row_slots per 128-lane row while
    # still fitting the cap — only a true cap excess should surface
    trials = [(tc, row_slots) for tc in caps] + [(cap, 128)]
    for trial_cap, row_slots in trials:
        idxs, o, _ = compact_mask(mask2d, caprows=min(caprows, trial_cap),
                                  cap=trial_cap, row_slots=row_slots)
        c = verify_at(tw, idxs, ft.bucket_ids, ft.packed, ft.bucket_fp2,
                      m=ft.m, words=ft.words, lmax=ft.lmax, eb=ft.eb,
                      n_starts=n_starts, slot_ok=ft.slot_ok)
        co = np.asarray(jnp.stack([jnp.int32(c), jnp.int32(o)]))
        if not co[1]:
            break
    return int(co[0]), bool(co[1])


#: default per-candidate-row slots extracted by hierarchical compaction
ROW_SLOTS = 8


@functools.partial(jax.jit, static_argnames=("caprows", "cap", "row_slots"))
def compact_mask(mask2d, *, caprows: int = 1 << 16, cap: int = DEFAULT_CAP,
                 row_slots: int = ROW_SLOTS):
    """Hierarchical candidate compaction (measured: ~10ms at 64M positions
    vs ~600ms for flat jnp.nonzero).

    mask2d: (R, 128) int8 from the Pallas filter (invalid positions zero).
    Returns (idxs (cap,) candidate positions, densely packed then -1
    padded, overflowed, n_cand — the TRUE candidate total, possibly >
    cap, which gates verify_chunked's cond chunks).  Overflow if more than
    `caprows` rows contain candidates, any row holds more than `row_slots`
    candidates (raise row_slots= for dense-match workloads), or total
    candidates exceed cap."""
    R = mask2d.shape[0]
    row_counts = jnp.sum(mask2d.astype(jnp.int32), axis=1)
    n_rows = jnp.sum(row_counts > 0, dtype=jnp.int32)
    rows = nonzero_scatter(row_counts > 0, caprows, R)
    row_live = rows < R
    rows_c = jnp.minimum(rows, R - 1)
    bits = jnp.take(mask2d, rows_c, axis=0).astype(jnp.int32)    # (caprows, 128)
    cum = jnp.cumsum(bits, axis=1)
    count = cum[:, -1]
    row_ovf = jnp.any(row_live & (count > row_slots))
    slots = []
    slot_valid = []
    for k in range(row_slots):
        lane_k = jnp.sum(cum < (k + 1), axis=1)                  # (caprows,)
        slots.append(rows_c * 128 + jnp.minimum(lane_k, 127))
        slot_valid.append(row_live & (k < count))
    pos = jnp.stack(slots, 1).reshape(-1)
    pv = jnp.stack(slot_valid, 1).reshape(-1)
    n_cand = jnp.sum(pv, dtype=jnp.int32)
    sel = nonzero_scatter(pv, cap, pos.shape[0])
    sel_live = sel < pos.shape[0]
    idxs = jnp.where(sel_live, pos[jnp.minimum(sel, pos.shape[0] - 1)], -1)
    overflow = (jnp.int32(n_rows > caprows) | jnp.int32(row_ovf)
                | jnp.int32(n_cand > cap))
    return idxs, overflow, n_cand


@functools.partial(jax.jit, static_argnames=("slots", "cap"))
def compact_slots(slotmat, *, slots: int, cap: int):
    """Candidate idxs from the fused slot kernel's (nblocks, 128) output
    (pallas_filter.filter_slots_pallas): lanes [0, slots) are positions in
    block order (-1 empty), lane `slots` the true per-block count.

    Returns (idxs (cap,) densely packed then -1 padded, overflow, n_cand).
    Overflow if any block held more candidates than its slots or the total
    exceeds cap — callers fall back to the mask+compact path (never an
    undercount).  n_cand (the TRUE candidate total, possibly > cap) gates
    verify_chunked's cond chunks."""
    pos = slotmat[:, :slots].reshape(-1)
    counts = slotmat[:, slots]
    n_cand = jnp.sum(counts, dtype=jnp.int32)
    overflow = (jnp.any(counts > slots).astype(jnp.int32)
                | jnp.int32(n_cand > cap))
    sel = nonzero_scatter(pos >= 0, cap, pos.shape[0])
    live = sel < pos.shape[0]
    idxs = jnp.where(live, pos[jnp.minimum(sel, pos.shape[0] - 1)], -1)
    return idxs, overflow, n_cand


@functools.partial(jax.jit, static_argnames=("caprows", "cap", "row_slots"))
def compact_valrows(vals2d, *, caprows: int = 1 << 16, cap: int = DEFAULT_CAP,
                    row_slots: int = 16):
    """Hierarchical compaction of a POSITION-VALUED sparse matrix: vals2d
    (R', 128) int32 holds candidate positions directly (-1 = empty) — the
    cascade kernel's packed output, where a row covers 1024 original text
    positions.  Same structure as compact_mask, but the k-th live lane's
    VALUE is extracted with a masked-rank sum (the slot_row g1 trick; no
    gather, positions < 2^31-1 so v+1 cannot wrap).

    Returns (idxs (cap,) positions densely packed then -1 padded,
    overflow, n_cand — the TRUE candidate total gating verify_chunked)."""
    R = vals2d.shape[0]
    bits2d = (vals2d >= 0).astype(jnp.int32)
    row_counts = jnp.sum(bits2d, axis=1)
    n_rows = jnp.sum(row_counts > 0, dtype=jnp.int32)
    n_cand = jnp.sum(row_counts, dtype=jnp.int32)
    rows = nonzero_scatter(row_counts > 0, caprows, R)
    row_live = rows < R
    rows_c = jnp.minimum(rows, R - 1)
    vals = jnp.take(vals2d, rows_c, axis=0)          # (caprows, 128)
    bits = (vals >= 0).astype(jnp.int32)
    cum = jnp.cumsum(bits, axis=1)
    count = cum[:, -1]
    row_ovf = jnp.any(row_live & (count > row_slots))
    rank = cum - 1                                   # live lanes' in-row rank
    v1 = jnp.where(bits > 0, vals + 1, 0)
    slot_vals, slot_valid = [], []
    for k in range(row_slots):
        vk = jnp.sum(jnp.where((rank == k) & (bits > 0), v1, 0), axis=1) - 1
        slot_vals.append(vk)
        slot_valid.append(row_live & (k < count))
    pos = jnp.stack(slot_vals, 1).reshape(-1)
    pv = jnp.stack(slot_valid, 1).reshape(-1)
    sel = nonzero_scatter(pv, cap, pos.shape[0])
    sel_live = sel < pos.shape[0]
    idxs = jnp.where(sel_live, pos[jnp.minimum(sel, pos.shape[0] - 1)], -1)
    overflow = (jnp.int32(n_rows > caprows) | jnp.int32(row_ovf)
                | jnp.int32(n_cand > cap))
    return idxs, overflow, n_cand


def words_len(n: int, words: int) -> int:
    """Length of the int32 word view covering an n-byte text plus the
    gather margin (verify_at reads words+1 consecutive words per start)."""
    return -(-n // 4) + words + 1


@functools.partial(jax.jit, static_argnames=("m", "words", "lmax", "eb",
                                              "n_starts", "slot_ok"))
def verify_at(text_words, idxs, bucket_ids, packed, bucket_fp2, *, m, words,
              lmax, eb, n_starts, slot_ok=False):
    return _verify_matched(text_words, idxs, bucket_ids, packed, bucket_fp2,
                           m=m, words=words, lmax=lmax, eb=eb,
                           n_starts=n_starts, slot_ok=slot_ok
                           ).sum(dtype=jnp.int32)


#: cond chunks of verify_chunked: 4 x 16K-candidate chunks at the default
#: 64K cap.  More chunks track the true candidate count finer but each
#: chunk compiles its own verify branch; 4 recovers most of the win (the
#: BASELINE m=32 corpus has ~27k candidates -> 2 chunks run).
VERIFY_CHUNKS = 4


def verify_chunked(tw, idxs, n_cand, ft: FastTables, *, n_starts: int,
                   chunks: int = VERIFY_CHUNKS):
    """Cond-gated chunked verification: verify the densely packed idxs in
    `chunks` static slices, each behind lax.cond(n_cand > chunk_start), so
    verify cost scales with the TRUE candidate count at runtime instead of
    the static cap — no retrace, no optimistic-cap bookkeeping.  XLA
    compiles every branch once but executes only the populated chunks
    (candidates are packed at the front; chunk 0 always runs).  With a
    full-cap pass this replaces the old half-cap/retry economy: few
    candidates cost little, many candidates just run more chunks, and
    overflow means strictly > cap candidates (rarer than > cap/2)."""
    cap = int(idxs.shape[0])
    verify = functools.partial(
        verify_at, bucket_ids=ft.bucket_ids, packed=ft.packed,
        bucket_fp2=ft.bucket_fp2, m=ft.m, words=ft.words, lmax=ft.lmax,
        eb=ft.eb, n_starts=n_starts, slot_ok=ft.slot_ok)
    if chunks <= 1 or cap < 2 * (cap // chunks):
        return verify(tw, idxs)
    # chunk sizes grow GEOMETRICALLY past the base granularity: p-scaled
    # caps (cap_for, up to 2^20) would need 64 equal 16K chunks — each a
    # compiled cond branch (minutes of XLA compile) — while doubling keeps
    # the fine granularity where candidate counts usually land and covers
    # any cap in ~log2 branches
    cs0 = cap // chunks
    sizes, s, nxt = [cs0], cs0, cs0
    while s < cap:
        sz = min(nxt, cap - s)
        sizes.append(sz)
        s += sz
        nxt *= 2
    c = verify(tw, idxs[:cs0])
    s = cs0
    for sz in sizes[1:]:
        c = c + jax.lax.cond(n_cand > s,
                             lambda s=s, sz=sz: verify(tw, idxs[s:s + sz]),
                             lambda: jnp.int32(0))
        s += sz
    return c


@functools.partial(jax.jit, static_argnames=("m", "words", "lmax", "eb",
                                              "n_starts", "slot_ok"))
def verify_matched_at(text_words, idxs, bucket_ids, packed, bucket_fp2, *, m,
                      words, lmax, eb, n_starts, slot_ok=False):
    """(cap,) bool: which candidate idxs are exact matches (for positions)."""
    return _verify_matched(text_words, idxs, bucket_ids, packed, bucket_fp2,
                           m=m, words=words, lmax=lmax, eb=eb,
                           n_starts=n_starts, slot_ok=slot_ok)


@functools.partial(jax.jit, static_argnames=("m", "words", "lmax", "eb",
                                              "n_starts", "slot_ok"))
def verify_attr_at(text_words, idxs, bucket_ids, packed, bucket_fp2, *, m,
                   words, lmax, eb, n_starts, slot_ok=False):
    """((cap,) match mask, (cap,) internal pattern id or -1): verification
    with pattern attribution — the pid the verify loop already selects,
    exposed instead of thrown away (the reference identifies the pattern in
    its verify loops but only counts it, wu/wu.c:184-201)."""
    return _verify_matched(text_words, idxs, bucket_ids, packed, bucket_fp2,
                           m=m, words=words, lmax=lmax, eb=eb,
                           n_starts=n_starts, slot_ok=slot_ok,
                           return_pid=True)


@functools.partial(jax.jit, static_argnames=("m", "sigma"))
def _exact_attr(piece, idxs, wid_pids, *, m, sigma):
    """(cap,) smallest-original-pattern id per matched idx (-1 padding) for
    the exact tier: recompute the packed window id at each match position
    (m <= 16 byte gathers over the candidate set only) and look it up in
    the wid -> pid value table."""
    live = idxs >= 0
    idc = jnp.clip(idxs, 0, jnp.maximum(piece.shape[0] - m, 0))
    bits = _bits_per_char(sigma)
    key = jnp.zeros(idxs.shape, jnp.int32)
    t32 = piece.astype(jnp.int32)
    for i in range(m):
        key = (key << bits) | t32[idc + i]
    pid = wid_pids[jnp.clip(key, 0, wid_pids.shape[0] - 1)]
    return jnp.where(live, pid, -1)


@functools.partial(jax.jit, static_argnames=("n_orig",))
def _hist_delta(pids, *, n_orig):
    """(n_orig,) int32 histogram of non-negative pids (a per-piece delta;
    negatives — unmatched slots — are dropped by the guarded scatter)."""
    idx = jnp.where(pids >= 0, pids, n_orig)
    return jnp.zeros((n_orig,), jnp.int32).at[idx].add(1, mode="drop")


@functools.partial(jax.jit, static_argnames=("m", "sigma", "n_orig"))
def _exact_hist(text, wid_pids, *, m, sigma, n_orig):
    """Exact-tier per-pattern histogram WITHOUT match enumeration: every
    window's 16-bit id determines its pattern (or none), so histogram the
    ids themselves — one device sort + 65536 searchsorted edges — and push
    the wid counts through the wid->pid value table.  The sort is the
    measured optimum for a 10^8-element histogram on this hardware
    (0.42 s at 116M keys vs 13 s for the XLA scatter-add; enumerating a
    match-dense corpus through cap-sized attribution pieces took 61 s on
    the reference's A_thaliana.fna p=8000 cell — results/
    probe_attr_r04.log)."""
    n = text.shape[0]
    wids = _wid_keys(text, n - m + 1, m, sigma)
    s = jnp.sort(wids)
    nb = wid_pids.shape[0]
    edges = jnp.arange(nb + 1, dtype=jnp.int32)
    # int32 throughout: any bin count <= n_starts < 2^31 (check_count32)
    wc = jnp.diff(jnp.searchsorted(s, edges)).astype(jnp.int32)
    bins = jnp.where(wid_pids < 0, n_orig, wid_pids)
    return jnp.zeros((n_orig + 1,), jnp.int32).at[bins].add(
        wc, mode="drop")[:n_orig]


def _verify_matched(text_words, idxs, bucket_ids, packed, bucket_fp2, *, m,
                    words, lmax, eb, n_starts, slot_ok=False,
                    return_pid=False):
    """Exact verification at candidate positions (idxs padded with -1).
    return_pid=True also returns the matching pattern's INTERNAL (deduped)
    id per candidate (-1 where unmatched) — each window matches at most
    one deduped equal-length pattern, so the id is unique.

    Gathers words+1 aligned int32 words per candidate from the text's word
    view (vs m byte gathers), shift-combines them into the window's packed
    words, recomputes fp0/fp1/fp2 from those (no gathers), and compares
    against the fingerprint-bucketed patterns.  With slot_ok (fp2 unique
    within every bucket) the bucket slot is selected by fp2 and only ONE
    full word compare runs: lmax + 1 + words gathers per candidate instead
    of lmax * (1 + words)."""
    live = (idxs >= 0) & (idxs < n_starts)
    idxs = jnp.clip(idxs, 0, jnp.maximum(n_starts - 1, 0))
    cap = idxs.shape[0]
    q = idxs >> 2
    r8 = ((idxs & 3) << 3).astype(jnp.uint32)
    W = [text_words[q + j].astype(jnp.uint32) for j in range(words + 1)]
    vals = []
    for j in range(words):
        lo = W[j] >> r8
        # (x << 1) << (31 - r8): equals x << (32 - r8), and is 0 at r8 == 0
        hi = (W[j + 1] << jnp.uint32(1)) << (jnp.uint32(31) - r8)
        v = (lo | hi).astype(jnp.int32)
        nb = min(4, m - 4 * j)
        if nb < 4:
            v = v & ((1 << (8 * nb)) - 1)
        vals.append(v)
    # bucket-key fingerprints recomputed from the combined words — no
    # gathers.  Vectorized over the m window bytes (an unrolled per-byte
    # loop is fine at m=32 but blows up compilation at m=512): each word is
    # expanded to its 4 bytes via broadcast, then fp = sum(byte * mult^i)
    # with int32 wraparound (exact mod-2^16 after masking).
    vals2d = jnp.stack(vals, axis=1)                       # (cap, W)
    shifts = jnp.tile(jnp.array([0, 8, 16, 24], jnp.int32), words)[:m]
    bytes2d = (jnp.repeat(vals2d, 4, axis=1)[:, :m]
               >> shifts[None, :]) & 0xFF                  # (cap, m)

    def fpvec(mult):
        rp = np.ones((m,), np.int64)
        for i in range(1, m):
            rp[i] = (rp[i - 1] * mult) & 0xFFFF
        rpj = jnp.asarray(rp.astype(np.int32))
        return jnp.sum(bytes2d * rpj[None, :], axis=1, dtype=jnp.int32)

    key = fpvec(FP_MULTS[0]) & 0xFFFF
    if eb:
        key = key | ((fpvec(FP_MULTS[1]) & ((1 << eb) - 1)) << 16)

    def full_eq(pid_c):
        rows = packed[pid_c, :]                            # (cap, W) gather
        return jnp.all(rows == vals2d, axis=1)

    if slot_ok:
        fp2 = fpvec(FP_MULTS[2]) & 0xFFFF
        slot = jnp.zeros((cap,), jnp.int32)
        found = jnp.zeros((cap,), bool)
        for l in range(lmax):
            hit = bucket_fp2[key * lmax + l] == fp2    # unique per bucket
            slot = jnp.where(hit, l, slot)
            found |= hit
        pid = bucket_ids[key * lmax + slot]
        ok = live & found & (pid >= 0)
        matched = ok & full_eq(jnp.maximum(pid, 0))
        if return_pid:
            return matched, jnp.where(matched, pid, -1)
        return matched

    matched = jnp.zeros((cap,), bool)
    sel_pid = jnp.full((cap,), -1, jnp.int32)
    for l in range(lmax):
        pid = bucket_ids[key * lmax + l]
        ok = live & (pid >= 0) & ~matched
        hit = ok & full_eq(jnp.maximum(pid, 0))
        matched |= hit
        if return_pid:
            sel_pid = jnp.where(hit, pid, sel_pid)
    if return_pid:
        return matched, sel_pid
    return matched


@functools.partial(jax.jit, static_argnames=("m", "sigma", "exact", "cap",
                                             "n_stages", "words", "lmax",
                                             "eb", "slot_ok", "stage_bits",
                                             "cd", "attr"))
def _positions_piece_xla(piece, bitmaps, bucket_ids, packed, bucket_fp2, *,
                         m, sigma, exact, cap, n_stages, words, lmax, eb,
                         slot_ok, stage_bits, cd=None, attr=False):
    """Portable (no-Pallas) per-piece positions: (idxs (cap,) int32 with -1
    padding, overflow); attr=True (fp tier only) additionally returns the
    INTERNAL matching-pattern id per idx: (idxs, pids, overflow).  All
    window starts of `piece` are owned (n_starts = len - m + 1); the
    caller offsets by the piece base."""
    n = piece.shape[0]
    n_starts = n - m + 1
    if exact:
        keys = _wid_keys(piece, n_starts, m, sigma)
        cand = bitmap_test(bitmaps[0], keys) == 1
    else:
        smask = stage_bits - 1
        cd = cd or STAGE_CD[:n_stages]
        fp0 = _fp_keys(piece, n_starts, m, FP_MULTS[0])
        fp1 = (_fp_keys(piece, n_starts, m, FP_MULTS[1])
               if eb or any(c for c, _ in cd) else None)
        fp2 = (_fp_keys(piece, n_starts, m, FP_MULTS[2])
               if any(d for _, d in cd) else None)
        cand = None
        for s in range(n_stages):
            C, D = cd[s]
            key = fp0
            if C:
                key = key + C * fp1
            if D:
                key = key + D * fp2
            hit = bitmap_test(bitmaps[s], key & smask) == 1
            cand = hit if cand is None else cand & hit
    n_cand = jnp.sum(cand, dtype=jnp.int32)
    idxs = nonzero_scatter(cand, cap, n_starts)
    live = idxs < n_starts
    idxs = jnp.where(live, idxs, -1)
    if not exact:
        # little-endian word view of the piece, built with a plain reshape
        # (fine on CPU, where the xla backend runs)
        nw = words_len(n, words)
        t = jnp.zeros((nw * 4,), jnp.uint8).at[:n].set(piece)
        t4 = t.astype(jnp.int32).reshape(nw, 4)
        tw = t4[:, 0] | (t4[:, 1] << 8) | (t4[:, 2] << 16) | (t4[:, 3] << 24)
        if attr:
            matched, pid = _verify_matched(
                tw, idxs, bucket_ids, packed, bucket_fp2, m=m, words=words,
                lmax=lmax, eb=eb, n_starts=n_starts, slot_ok=slot_ok,
                return_pid=True)
            return (jnp.where(matched, idxs, -1),
                    jnp.where(matched, pid, -1), jnp.int32(n_cand > cap))
        matched = _verify_matched(tw, idxs, bucket_ids, packed, bucket_fp2,
                                  m=m, words=words, lmax=lmax, eb=eb,
                                  n_starts=n_starts, slot_ok=slot_ok)
        idxs = jnp.where(matched, idxs, -1)
    return idxs, jnp.int32(n_cand > cap)


def make_repeat(fn, reps: int):
    """jit a loop running the traceable (count, overflow) scan `fn` reps
    times back-to-back on one input, returning (summed count, OR'd
    overflow).  The optimization barrier makes the input depend on the
    loop carry so XLA cannot hoist the loop-invariant scan (without it all
    reps collapse to one scan — measured).  The jitter-proof timing
    primitive behind count_repeat_async (FastScanner + EngineFastPath) and
    the bench/sweep device rates."""

    @jax.jit
    def repeat(t):
        def body(i, carry):
            t2, cprev = jax.lax.optimization_barrier((t, carry[0]))
            c, o = fn(t2)
            return cprev + c, carry[1] | jnp.int32(o)
        return jax.lax.fori_loop(0, reps, body,
                                 (jnp.int32(0), jnp.int32(0)))

    return repeat


class ScanFuture:
    """Handle for an in-flight device scan (count_async/scan_many).

    The count and overflow flag stay on the device until result() is
    called, so many scans can be queued back-to-back and pay the host
    round-trip once — the reference amortizes per-kernel timing the same
    way across reps (cuda/cuda_wm.cu:269-302).  On candidate-cap overflow
    result() transparently re-runs the synchronous retry path (exact
    counts, never an undercount)."""

    __slots__ = ("_co", "_retry")

    def __init__(self, count_dev, overflow_dev, retry=None):
        self._co = jnp.stack([jnp.int32(count_dev), jnp.int32(overflow_dev)])
        self._retry = retry

    def result(self) -> int:
        co = np.asarray(self._co)
        if co[1]:
            if self._retry is None:
                raise OverflowError(
                    "candidate cap exceeded; raise cap=/row_slots=")
            return self._retry()
        return int(co[0])


class FastScanner:
    """Shared fast backend; counts equal every engine's count.

    backend: "pallas" (fused TPU kernels, ops/pallas_filter.py), "xla"
    (portable jnp path, used on CPU), or "auto"."""

    def __init__(self, ft: FastTables, *, tile: int = DEFAULT_TILE,
                 cap: int | None = None, caprows: int = 1 << 16,
                 row_slots: int = ROW_SLOTS, backend: str = "auto",
                 interpret: bool = False):
        self.ft = ft
        self.tile = tile
        self.cap = cap_for(ft) if cap is None else cap
        cap = self.cap
        self.caprows = caprows
        self.row_slots = row_slots
        self.m = ft.m
        self.sigma = ft.sigma
        self.interpret = interpret
        if backend == "auto":
            backend = ("pallas" if jax.default_backend() == "tpu" or interpret
                       else "xla")
        self.backend = backend
        self._jit = jax.jit(functools.partial(
            fast_count_core, ft=ft, tile=tile, cap=cap))
        self._jdevice = None           # lazy: count_async's jitted scan
        self._jdevice_pallas = None
        self._jdevice_key = None
        #: async path switched to the dense mask-pipeline pass after a
        #: MATCH-driven slot overflow (see _async_retry)
        self._match_dense = False
        self._jdense = None            # lazy: _count_chunked's dense pass
        #: async-overflow retraces taken (diagnostics; the adaptation
        #: machinery must converge — smoke asserts this stops growing)
        self._retries = 0
        #: extra filter stages beyond the static budgets; bumped on async
        #: overflow (_async_retry), so a pattern set whose correlated-stage
        #: FPR beats the estimates converges to a non-overflowing
        #: configuration instead of retrying every scan
        self._k_extra = 0

    def _count_pallas(self, text) -> tuple[int, bool]:
        from tpu_smatcher.ops import pallas_filter as pf
        n = int(text.shape[0])
        ft = self.ft
        if n < ft.m:
            return 0, False
        if ft.exact:
            c = pf.exact_count_pallas(text, ft.bitmaps[0], m=ft.m,
                                      sigma=ft.sigma, n=n, interpret=self.interpret)
            return int(c), False
        k = stages_for(ft, n, self.cap)
        if n * ft.density ** k > self.cap / 4 and k >= len(ft.bitmaps):
            # even all built stages cannot meet the candidate budget at this
            # text length (very large pattern sets saturate the 16-bit
            # fingerprint space, e.g. p=100k: the reference caps p at
            # texture-memory scale, main.c:372-373) — scan in (m-1)-halo
            # pieces sized to the budget, pipelined like count_file.
            # Sized with stages_for's own (uncorrected) estimator: the 4x
            # cap margin absorbs the measured ~2.4x total-level correlation.
            # Pieces run the DENSE device pass (full cap, 128 row slots):
            # a cap//2-start piece then cannot overflow at all, and a rare
            # budget-piece overflow is finished exactly by _count_chunked
            # — never by re-entering this path, whose piece size is a pure
            # function of (cap, density) and would recurse forever when the
            # filter saturates (density**k > 0.5 pins piece at cap//2)
            piece = int(max((self.cap / 4) / max(ft.density ** k, 1e-12),
                            self.cap // 2))
            piece = min(piece, n)
            if self._jdense is None:
                self._jdense = jax.jit(self._device_count_dense)
            total = 0
            inflight = []

            def drain(item):
                pt, co_d = item
                co = np.asarray(co_d)
                if co[1]:
                    return self._count_chunked(pt)   # terminating splitter
                return int(co[0])

            for s in range(0, n - ft.m + 1, piece):
                pt = jax.lax.slice(text, (s,), (min(s + piece + ft.m - 1, n),))
                c_d, o_d = self._jdense(pt)
                inflight.append((pt, jnp.stack([jnp.int32(c_d),
                                                jnp.int32(o_d)])))
                if len(inflight) >= 3:
                    total += drain(inflight.pop(0))
            for item in inflight:
                total += drain(item)
            return total, False
        return self._count_pallas_whole(text, k)

    def _count_pallas_whole(self, text, k) -> tuple[int, bool]:
        from tpu_smatcher.ops import pallas_filter as pf
        n = int(text.shape[0])
        ft = self.ft
        mask2d = pf.filter_mask_pallas(text, ft.bitmaps[:k], m=ft.m, n=n,
                                       n_stages=k, cd=ft.cd(k),
                                       interpret=self.interpret)
        tw = pf.words_view_pallas(text, nw=words_len(n, ft.words),
                                  interpret=self.interpret)
        return compact_verify_retry(mask2d, tw, ft, cap=self.cap,
                                    caprows=self.caprows,
                                    row_slots=self.row_slots,
                                    n_starts=n - ft.m + 1)

    def _mask_verify(self, piece, k, *, caprows, row_slots, matched=False):
        """The shared mask-path pipeline (traceable): Pallas filter mask ->
        hierarchical compaction -> word view -> exact verification.  One
        implementation behind the saturating-set device pass, the dense
        pass, the distribution core and the positions pieces.

        matched=False -> (count, overflow); matched=True -> (idxs,
        per-candidate match mask, per-candidate internal pattern id,
        overflow)."""
        from tpu_smatcher.ops import pallas_filter as pf
        ft = self.ft
        n = piece.shape[0]
        mask2d = pf.filter_mask_pallas(piece, ft.bitmaps[:k], m=ft.m, n=n,
                                       n_stages=k, cd=ft.cd(k),
                                       interpret=self.interpret)
        idxs, o, n_cand = compact_mask(mask2d,
                                       caprows=min(caprows, mask2d.shape[0]),
                                       cap=self.cap, row_slots=row_slots)
        tw = pf.words_view_pallas(piece, nw=words_len(n, ft.words),
                                  interpret=self.interpret)
        if matched:
            r, pid = verify_attr_at(tw, idxs, ft.bucket_ids, ft.packed,
                                    ft.bucket_fp2, m=ft.m, words=ft.words,
                                    lmax=ft.lmax, eb=ft.eb,
                                    n_starts=n - ft.m + 1, slot_ok=ft.slot_ok)
            return idxs, r, pid, o
        # cond-gated chunks: verify cost follows the TRUE candidate count
        # (a full-cap verify_at costs the static cap even for a handful of
        # candidates — measured 30 ms/scan on the match-dense world192
        # p=8000 cell vs ~10 ms chunked)
        c = verify_chunked(tw, idxs, n_cand, ft, n_starts=n - ft.m + 1)
        return c, o

    def count_with_overflow(self, text) -> tuple[int, bool]:
        from tpu_smatcher.ops.common import check_count32
        text = jnp.asarray(text, jnp.uint8)
        check_count32(int(text.shape[0]))
        # patterns longer than the Pallas overlapped-row layout supports
        # fall back to the tiled XLA path transparently
        from tpu_smatcher.ops.pallas_filter import max_fast_m
        if self.backend == "pallas" and self.m <= max_fast_m():
            return self._count_pallas(text)
        c, o = self._jit(text)
        return int(c), bool(o)

    def count(self, text) -> int:
        from tpu_smatcher.ops.pallas_filter import max_fast_m
        if self.backend == "pallas" and self.m <= max_fast_m():
            # one dispatch + one host fetch (the fused-slot device pass
            # with chunked verify); overflow falls back to the retry ladder
            return self.count_async(text).result()
        return self._count_retry(text)

    def _count_retry(self, text) -> int:
        """The synchronous path: full retry ladder; if candidates exceed
        every trial (dense-match corpora), falls back to budget-sized piece
        scanning — counts are total functions of the input, never an error
        about its density."""
        c, o = self.count_with_overflow(text)
        if o:
            return self._count_chunked(text)
        return c

    def _device_count(self, text):
        """Traceable (count, overflow) over the whole text — the device-only
        scan behind count_async (single compact pass, no host round trips).

        Compacts at the FULL cap but verifies via cond-gated chunks
        (verify_chunked), so verify cost follows the true candidate count
        at runtime — no optimistic-cap bookkeeping, no retrace on
        overflow.  On the rare overflow (> cap candidates) the future's
        retry runs the full synchronous ladder, and the scanner adds a
        filter stage for subsequent scans (_async_retry)."""
        n = text.shape[0]
        ft = self.ft
        if self.backend != "pallas":
            return fast_count_core(text, ft, tile=self.tile, cap=self.cap)
        from tpu_smatcher.ops import pallas_filter as pf
        if n < ft.m:
            return jnp.int32(0), jnp.int32(0)
        if ft.exact:
            return (pf.exact_count_pallas(text, ft.bitmaps[0], m=ft.m,
                                          sigma=ft.sigma, n=n,
                                          interpret=self.interpret),
                    jnp.int32(0))
        return self._fp_device_count(text)

    def _pick_path(self, n, k):
        """Route an fp-tier device scan among the fused slot path, the
        two-phase cascade and the mask pipeline by estimated cost in
        BANK-GATHER UNITS (docs/DESIGN.md measured ~0.70 ms per unit per
        2^27 positions, invariant across p and bank count):

          slot:    k_s stages x B banks dense + ~8 (in-kernel slots/words)
          mask:    k stages x B dense + ~55 (mask round-trip, R-scatter
                   compaction, words re-read)
          cascade: k1 dense stages + ~11 (per-row compaction + repack,
                   probe_rowpack.py) + remaining stages at B/8 on the
                   packed eighth + ~8

        The slot path keeps its feasibility conditions (per-block budget
        reachable, extra stages bounded); the cascade needs a phase-1
        depth (k1_for) and at least one phase-2 stage.  Measured A/B on
        256 MiB DNA m=32 (r5): cascade 1.87 GB/s at p=30k (slot 1.27),
        0.78 at p=100k (mask 0.50), 3.69 at p=10k/B=4 (slot 3.47) — the
        model's ranking matched the measurement at every p; at B <= 2 the
        ~19-unit cascade overhead exceeds any possible stage saving and
        the model keeps the slot path.  Returns (path, k1, k_total)."""
        from tpu_smatcher.ops import pallas_filter as pf
        ft = self.ft
        nb = len(ft.bitmaps)
        B = ft.stage_bits // 4096
        kb = stages_for_block(ft, pf.SLOT_RB * 128)
        costs = {"mask": (k * B + 55, None, k)}
        if kb <= nb and (kb - k) * B <= 48:
            ks = min(max(k, kb) + self._k_extra, nb)
            costs["slot"] = (ks * B + 8, None, ks)
        k1 = k1_for(ft)
        if k1 is not None and nb >= 2:
            k1 = max(1, min(k1 + self._k_extra, nb - 1))
            kt = min(max(k, k1 + 1), nb)
            if kt > k1:
                costs["cascade"] = (k1 * B + 11 + (kt - k1) * B / 8 + 8,
                                    k1, kt)
        path = min(costs, key=lambda p: costs[p][0])
        return path, costs[path][1], costs[path][2]

    def _fp_device_count(self, text):
        """Traceable (count, overflow) fp-tier device scan over the routed
        path (_pick_path).  Any overflow — candidate cap, per-block slots,
        cascade phase-1 rows — surfaces in the flag; callers fall back to
        the exact ladder, never undercount."""
        from tpu_smatcher.ops import pallas_filter as pf
        ft = self.ft
        n = text.shape[0]
        k = stages_for(ft, n, self.cap)
        path, k1, kt = self._pick_path(n, k)
        if path == "cascade":
            packed, tw, ovf = pf.cascade_pallas(
                text, ft.bitmaps[:kt], m=ft.m, n=n, k1=k1, n_stages=kt,
                cd=ft.cd(kt), nw_min=words_len(n, ft.words),
                interpret=self.interpret)
            idxs, o, n_cand = compact_valrows(
                packed, caprows=min(self.cap, int(packed.shape[0])),
                cap=self.cap)
            o = o | ovf[0, 0]
            c = verify_chunked(tw, idxs, n_cand, ft, n_starts=n - ft.m + 1)
        elif path == "slot":
            # fused in-kernel compaction + word view: the filter kernel
            # itself emits BLOCK_SLOTS candidate positions per block and
            # the verify word view — no (R, 128) mask round-trip through
            # HBM, no R-element scatter, no words_view re-read of the text
            slotmat, tw = pf.filter_slots_pallas(
                text, ft.bitmaps[:kt], m=ft.m, n=n, n_stages=kt,
                cd=ft.cd(kt), nw_min=words_len(n, ft.words),
                interpret=self.interpret)
            idxs, o, n_cand = compact_slots(slotmat, slots=pf.BLOCK_SLOTS,
                                            cap=self.cap)
            c = verify_chunked(tw, idxs, n_cand, ft, n_starts=n - ft.m + 1)
        else:
            # mask+compact path when nothing cheaper is feasible: all
            # built stages miss the per-block slot budget, or meeting it
            # costs more extra stages than the mask pipeline's whole
            # overhead, and the cascade has no viable phase split
            c, o = self._mask_verify(
                text, k,
                caprows=min(self.cap, max(self.caprows, 1 << 17)),
                row_slots=self.row_slots)
        return c, jnp.int32(o)

    def _ensure_jdevice(self):
        from tpu_smatcher.ops.pallas_filter import max_fast_m
        key = (self._k_extra, self._match_dense,
               self.backend == "pallas" and self.m <= max_fast_m())
        if self._jdevice is None or self._jdevice_key != key:
            self._jdevice_key = key
            self._jdevice_pallas = key[2]
            if not self._jdevice_pallas:
                self._jdevice = self._jit      # tiled XLA path
            elif self._match_dense:
                # match-dense corpora: the mask-path device pass (128 row
                # slots, full cap) in ONE dispatch — the slot kernel's 16
                # per-16K-block budget would overflow on every scan
                self._jdevice = jax.jit(self._device_count_dense)
            else:
                self._jdevice = jax.jit(self._device_count)
        return self._jdevice

    def _async_retry(self, text) -> int:
        """ScanFuture overflow fallback: count exactly via the synchronous
        ladder, then adapt the scanner so later scans stop overflowing:

        - FP-driven overflow (false candidates beat the stage budget): add
          a filter stage (`_k_extra`, bounded; one retrace per bump).
        - MATCH-driven overflow (true matches alone crowd the per-block
          slots — mean matches per 16K-position block near/over
          BLOCK_SLOTS): extra stages cannot help, matches pass every
          stage.  Bumping anyway would retrace up to 4 times for nothing
          (measured: 10-60 s of recompiles on the world192 p=8000 sweep
          cell whose 4k matches over 1.9 MB put ~34 matches in every
          block).  Instead switch this scanner's async path to the dense
          mask-pipeline device pass (one retrace, then every scan is a
          single dispatch again)."""
        self._retries += 1
        c = self._count_retry(text)
        if self.ft.exact:
            return c
        n_starts = max(1, int(text.shape[0]) - self.m + 1)
        from tpu_smatcher.ops.pallas_filter import BLOCK_SLOTS, SLOT_RB
        mean_per_block = c * (SLOT_RB * 128) / n_starts
        if mean_per_block > BLOCK_SLOTS // 4:
            # BLOCK_SLOTS//4, not //2: at a match mean of 6-8 per 16K block
            # the Poisson tail alone puts > BLOCK_SLOTS candidates in a few
            # blocks of every large scan (P[Poisson(6.6) > 16] ~ 5e-4 x 8k
            # blocks), so the slot path would retry forever without ever
            # tripping a //2 threshold — measured on the p=100k planted
            # corpus (53k matches over 2^27: mean 6.6, every scan retried)
            self._match_dense = True
        elif c <= self.cap // 4 and self._k_extra < 4:
            self._k_extra += 1
        else:
            # TERMINAL adaptation: extra stages are exhausted (or matches
            # are too many for the cap margin yet not block-dense) and the
            # scan still overflowed — e.g. an adversarial fp-collision set
            # (windows sharing all three base fps with a pattern pass
            # EVERY derived stage; constructible by a birthday search on
            # the 48-bit fp space).  Without this branch such a workload
            # would re-run the sync ladder on every scan forever; the
            # dense mask pass is a single dispatch and its 128-deep row
            # budget absorbs any per-block clustering.
            self._match_dense = True
        return c

    def _dense_core(self):
        """Traceable dense (count, overflow) core carrying the small-piece
        NO-OVERFLOW guarantee (pieces of <= cap/4 starts cannot overflow):
        the Pallas dense mask pass on TPU, the tiled XLA core elsewhere.
        The distributed retry ladder (parallel/dist.py) builds its piece
        programs from this."""
        from tpu_smatcher.ops.pallas_filter import max_fast_m
        if self.backend == "pallas" and self.m <= max_fast_m():
            return self._device_count_dense
        return functools.partial(fast_count_core, ft=self.ft,
                                 tile=self.tile, cap=self.cap)

    def _device_count_traceable(self):
        """The traceable (count, overflow) scan the async path would jit —
        the same selection as _ensure_jdevice, unjitted (for callers that
        embed the scan in a larger traced program, e.g. count_repeat_async
        and the stacked batch scans)."""
        from tpu_smatcher.ops.pallas_filter import max_fast_m
        if not (self.backend == "pallas" and self.m <= max_fast_m()):
            return functools.partial(fast_count_core, ft=self.ft,
                                     tile=self.tile, cap=self.cap)
        if self._match_dense:
            return self._device_count_dense
        return self._device_count

    def count_repeat_async(self, text, reps: int) -> ScanFuture:
        """Scan the SAME text `reps` times back-to-back inside ONE device
        dispatch (lax.fori_loop over the traceable scan) and return the
        summed count as a future.

        This is the jitter-proof timing primitive (bench.py): a queued
        count_async train pays one host dispatch per scan, so its
        subtraction-based rate can be corrupted by host-side jitter over
        a tunneled link (BENCH_r04's implausible exact-tier 21.2 GB/s —
        docs/BENCHMARKS.md); here the device runs reps scans with no host
        involvement in between, so (t(reps) - t(1)) / (reps - 1) bounds
        the error by the RTT jitter over a multi-hundred-ms window."""
        from tpu_smatcher.ops.common import check_count32
        text = jnp.asarray(text, jnp.uint8)
        check_count32(int(text.shape[0]))
        key = (reps, self._k_extra, self._match_dense, self.backend)
        if not hasattr(self, "_jrepeat"):
            self._jrepeat = {}
        if key not in self._jrepeat:
            self._jrepeat[key] = make_repeat(self._device_count_traceable(),
                                             reps)
        c, o = self._jrepeat[key](text)
        return ScanFuture(c, o)

    def _stack_supported(self, nsh: int) -> bool:
        """Whether a (k, nsh) stack can ride the single-dispatch stacked
        scan: Pallas fast path active and shards long enough to hold a
        window (junction strings then partition the straddlers exactly)."""
        from tpu_smatcher.ops.pallas_filter import max_fast_m
        return (self.backend == "pallas" and self.m <= max_fast_m()
                and nsh >= self.m)

    def _device_count_stack(self, batch):
        """Traceable (total count, overflow) over a (k, nsh) stack of
        equal-length texts in ONE dispatch.

        The flattened stack is scanned by the PLAIN kernels (one grid, one
        compaction + verify epilogue for the whole batch — the fixed
        per-scan costs that dominate small-shard scans amortize across k),
        which also counts the k-1 groups of windows STRADDLING shard
        boundaries; those are subtracted exactly by scanning the junction
        strings J_i = batch[i, -(m-1):] ++ batch[i+1, :m-1] with a vmapped
        tiled-XLA core (each J_i's m-1 windows are precisely shard i's
        straddlers).  Takes (flat, batch) — the SAME buffer in 1-D and 2-D
        form, flattened OUTSIDE the jit: both in-kernel per-shard masking
        and an in-jit reshape feeding the pallas call are measured compile
        dead ends (30-150x blowups — see pallas_filter._valid_starts and
        docs/DESIGN.md)."""
        from tpu_smatcher.ops import pallas_filter as pf
        ft = self.ft
        text, batch = batch               # (k*nsh,) flat + (k, nsh) views
        k, nsh = batch.shape
        m = ft.m
        if ft.exact:
            c = pf._exact_count_flat(text, ft.bitmaps[0], m=ft.m,
                                     sigma=ft.sigma, n=k * nsh,
                                     interpret=self.interpret)
            o = jnp.int32(0)
        else:
            c, o = self._fp_device_count(text)
        if k > 1 and m > 1:
            junctions = jnp.concatenate(
                [batch[:-1, nsh - m + 1:], batch[1:, :m - 1]], axis=1)
            # a junction has m-1 starts, so candidates can never exceed a
            # tile-sized cap (no overflow, and the per-row compaction
            # scatter stays tiny under the vmap)
            tile = max(64, 1 << (m - 1).bit_length())
            core = functools.partial(fast_count_core, ft=ft, tile=tile,
                                     cap=tile)
            jc, jo = jax.vmap(core)(junctions)
            c = c - jnp.sum(jc, dtype=jnp.int32)
            o = o | jnp.int32(jnp.any(jo > 0))
        return c, o

    def count_stack_async(self, batch) -> ScanFuture:
        """Total match count over a (k, nsh) batch of equal-length texts.

        On the Pallas fast path with block-aligned nsh this is ONE device
        dispatch (_device_count_stack); otherwise it degrades to the
        pipelined per-text scans of scan_many.  Overflow retries via
        per-text ladders (total, never an undercount)."""
        from tpu_smatcher.ops.common import check_count32
        batch = jnp.asarray(batch, jnp.uint8)
        k, nsh = batch.shape
        check_count32(int(k * nsh))

        def retry():
            return sum(self.scan_many(list(batch)))

        if not self._stack_supported(int(nsh)):
            return ScanFuture(jnp.int32(retry()), jnp.int32(0))
        key = ("stack", self._k_extra, self._match_dense)
        if not hasattr(self, "_jstack"):
            self._jstack = {}
        if key not in self._jstack:
            self._jstack[key] = jax.jit(self._device_count_stack)
        # flatten OUTSIDE the jit (in-jit reshapes feeding pallas are a
        # measured 30x compile blowup); both args view the same buffer
        c, o = self._jstack[key]((batch.reshape(-1), batch))
        return ScanFuture(c, o, retry=retry)

    def count_stack(self, batch) -> int:
        """Synchronous count_stack_async — the sum of count() over the
        batch rows, measured in one dispatch where shapes allow."""
        return self.count_stack_async(batch).result()

    def count_async(self, text) -> ScanFuture:
        """Dispatch a scan and return immediately; the count stays on the
        device until ScanFuture.result().  Queue many scans back-to-back to
        amortize the host round-trip (the public count() syncs per call —
        over a tunneled link that sync dominates small-corpus scans)."""
        from tpu_smatcher.ops.common import check_count32
        text = jnp.asarray(text, jnp.uint8)
        check_count32(int(text.shape[0]))
        c, o = self._ensure_jdevice()(text)
        return ScanFuture(c, o, retry=functools.partial(self._async_retry,
                                                        text))

    def _device_count_dense(self, text):
        """Like _device_count but row-dense-capable: full cap and deep row
        slots, so a piece of <= cap/4 starts can NEVER overflow (used by
        _count_chunked — the dense-corpus fallback — and as the steady
        match-dense pass).

        compact_mask's extraction costs caprows x row_slots lane-ops, so
        the full (cap, 128) budget is reserved for SMALL pieces (where the
        row clamp keeps it cheap and the no-overflow guarantee must hold);
        big scans bound both — a p-scaled 2^19 cap at 128 slots costs
        ~8.6G lane-ops, measured ~2x the whole 12-stage filter at n=2^27 —
        and fall back to pieces on the (pathological) overflow."""
        from tpu_smatcher.ops import pallas_filter as pf
        n = text.shape[0]
        ft = self.ft
        if n < ft.m:
            return jnp.int32(0), jnp.int32(0)
        if ft.exact:
            return (pf.exact_count_pallas(text, ft.bitmaps[0], m=ft.m,
                                          sigma=ft.sigma, n=n,
                                          interpret=self.interpret),
                    jnp.int32(0))
        k = stages_for(ft, n, self.cap)
        small = n - ft.m + 1 <= max(self.cap // 2, 1 << 17)
        c, o = self._mask_verify(
            text, k,
            caprows=self.cap if small else min(self.cap, 1 << 17),
            row_slots=128 if small else 16)
        return c, jnp.int32(o)

    def _count_chunked(self, text, *, depth: int = 4) -> int:
        """Exact count when candidates exceed every cap trial: scan in
        (m-1)-halo pieces sized to the budget, splitting any piece that
        still overflows (pieces of <= cap/4 starts cannot — the dense pass
        uses the full cap and all 128 row slots).  Dense-match corpora (the
        reference counts millions per corpus, main.c:656) therefore always
        count exactly — OverflowError is never a function of the corpus."""
        text = jnp.asarray(text, jnp.uint8)
        n = int(text.shape[0])
        m = self.m
        total_starts = n - m + 1
        min_chunk = max(self.cap // 4, 1)
        from tpu_smatcher.ops.pallas_filter import max_fast_m
        if self.backend == "pallas" and self.m <= max_fast_m():
            if self._jdense is None:
                self._jdense = jax.jit(self._device_count_dense)
            fn = self._jdense
        else:
            fn = self._ensure_jdevice()    # tiled XLA path (cap-only)
        work = [(0, total_starts)]
        inflight, total = [], 0
        while work or inflight:
            while work and len(inflight) < depth:
                start, owned = work.pop()
                piece = jax.lax.slice(text, (start,),
                                      (min(start + owned + m - 1, n),))
                c_d, o_d = fn(piece)
                inflight.append((start, owned, c_d, o_d))
            start, owned, c_d, o_d = inflight.pop(0)
            co = np.asarray(jnp.stack([jnp.int32(c_d), jnp.int32(o_d)]))
            if co[1]:
                if owned <= min_chunk:
                    raise AssertionError(
                        "count piece overflowed below the guaranteed size "
                        "— this is a bug")
                half = max(min_chunk, owned // 2)
                for s in range(start, start + owned, half):
                    work.append((s, min(half, start + owned - s)))
            else:
                total += int(co[0])
        return total

    def scan_many(self, texts) -> list[int]:
        """Counts for a batch of texts, pipelined: all scans are dispatched
        before any result is fetched, so N scans cost N device-times plus
        ONE host round-trip instead of N.  Equal-length texts reuse one
        compiled program (jit caches per shape)."""
        return [f.result() for f in [self.count_async(t) for t in texts]]

    def count_file(self, path: str, *, chunk: int = 1 << 28,
                   depth: int = 3) -> int:
        """Stream a pre-encoded corpus file through the scanner in `chunk`
        byte pieces without loading it fully ((m-1)-halo pieces, up to
        `depth` in flight so disk reads, host->device copies and device
        scans overlap; every interior piece has identical shape and reuses
        one compiled program) — see common.stream_count_file."""
        from tpu_smatcher.ops.common import stream_count_file
        return stream_count_file(self.count_async, self.m, path,
                                 chunk=chunk, depth=depth)

    def positions_file(self, path: str, *, chunk: int = 1 << 28) -> np.ndarray:
        """All match start positions of a corpus file, sorted, streamed in
        `chunk`-byte (m-1)-halo pieces (each unbounded via positions()'s
        split-on-overflow pipeline); int64 offsets, so files >= 2^31 bytes
        stream fine — see common.stream_positions_file."""
        from tpu_smatcher.ops.common import stream_positions_file
        return stream_positions_file(self.positions, self.m, path,
                                     chunk=chunk)

    def _has_attr_tables(self) -> bool:
        ft = self.ft
        return bool(ft.n_orig) and (
            ft.wid_pids is not None if ft.exact else ft.orig_ids is not None)

    def _attr_drive(self, text, on_piece, *, depth: int = 4):
        """The positions() split-on-overflow piece pipeline, with DEVICE
        pattern-id attribution: on_piece(start, idxs_dev, pids_dev) is
        called for every non-overflowing piece (idxs -1-padded matched
        starts, pids the aligned ORIGINAL pattern ids)."""
        from tpu_smatcher.ops.common import check_count32
        text = jnp.asarray(text, jnp.uint8)
        n = int(text.shape[0])
        check_count32(n)
        ft = self.ft
        m = ft.m
        if n < m:
            return
        total_starts = n - m + 1
        min_chunk = max(self.cap // 2, 1)

        def piece_of(start, owned):
            return jax.lax.slice(text, (start,),
                                 (min(start + owned + m - 1, n),))

        work = [(0, total_starts)]
        inflight = []
        guess = None

        def drain_one():
            nonlocal guess
            start, owned, idxs_d, pids_d, o_d = inflight.pop(0)
            if bool(np.asarray(o_d)):
                if owned <= min_chunk:
                    raise AssertionError(
                        "attribution piece overflowed below the guaranteed "
                        "size — this is a bug")
                if guess is None and owned == total_starts:
                    total = max(self.count(text), 1)
                    guess = int(max(min_chunk,
                                    min(owned // 2,
                                        (self.cap // 2) * owned // total)))
                split = max(min_chunk, min(guess or owned // 2, owned // 2))
                for s in range(start, start + owned, split):
                    work.append((s, min(split, start + owned - s)))
                return
            on_piece(start, idxs_d, pids_d)

        while work or inflight:
            while work and len(inflight) < depth:
                start, owned = work.pop()
                idxs_d, pids_d, o_d = self._attr_piece(piece_of(start, owned))
                inflight.append((start, owned, idxs_d, pids_d, o_d))
            if inflight:
                drain_one()

    def matches(self, text):
        """(positions (n,) int64 sorted, pattern_ids (n,) int64): every
        match start plus the ORIGINAL id of the matching pattern (smallest
        id for byte-identical duplicates).  Attribution is DEVICE-side —
        the pid the verify stage already selects (verify_attr_at), not a
        host re-derivation; the reference's verify loops identify the
        pattern but only count it (wu/wu.c:184-201).  Tables without
        attribution info (pre-r4 checkpoints) fall back to host
        datagen.match_ids."""
        if not self._has_attr_tables():
            from tpu_smatcher.ops.common import scanner_matches
            return scanner_matches(self, text)
        pos_out, id_out = [], []

        def on_piece(start, idxs_d, pids_d):
            idxs = np.asarray(idxs_d)
            live = idxs >= 0
            if live.any():
                pos_out.append(idxs[live].astype(np.int64) + start)
                id_out.append(np.asarray(pids_d)[live].astype(np.int64))

        self._attr_drive(text, on_piece)
        if not pos_out:
            return np.empty((0,), np.int64), np.empty((0,), np.int64)
        pos = np.concatenate(pos_out)
        ids = np.concatenate(id_out)
        order = np.argsort(pos, kind="stable")
        return pos[order], ids[order]

    def count_per_pattern(self, text):
        """(p,) int64 per-pattern match-start counts, aggregated ON DEVICE.
        Totals sum to count(text); duplicates credit the smallest id.

        Exact tier on a match-dense corpus: enumeration-free wid-histogram
        path (_exact_hist — window ids sorted once, counts pushed through
        the wid->pid table; ~0.5 s on the reference's 13.4M-match
        A_thaliana.fna cell vs 61 s of cap-sized attribution pieces).
        Otherwise (sparse matches, or the fp tier whose pid needs the
        verify stage): the positions piece pipeline with per-piece device
        histograms — O(matches) device work either way, never the
        O(matches x m) host numpy of datagen.match_ids."""
        if not self._has_attr_tables():
            from tpu_smatcher.ops.common import scanner_count_per_pattern
            return scanner_count_per_pattern(self, text)
        ft = self.ft
        n_orig = ft.n_orig
        if ft.exact:
            n = int(jnp.asarray(text).shape[0])
            if n >= ft.m and self.count(text) > self.cap // 2:
                # match-dense: one sort beats splitting into ~2*matches/cap
                # dispatch-bound pieces
                return np.asarray(_exact_hist(
                    jnp.asarray(text, jnp.uint8), ft.wid_pids, m=ft.m,
                    sigma=ft.sigma, n_orig=n_orig)).astype(np.int64)
        acc = [jnp.zeros((n_orig,), jnp.int32)]

        def on_piece(start, idxs_d, pids_d):
            acc[0] = acc[0] + _hist_delta(pids_d, n_orig=n_orig)

        self._attr_drive(text, on_piece)
        return np.asarray(acc[0]).astype(np.int64)

    def _positions_piece(self, piece):
        """Traceable (idxs (cap,) int32 with -1 padding, overflow) for ALL
        matching window starts of `piece` (every start is owned)."""
        ft = self.ft
        from tpu_smatcher.ops.pallas_filter import max_fast_m
        if self.backend != "pallas" or ft.m > max_fast_m():
            return _positions_piece_xla(
                piece, ft.bitmaps, ft.bucket_ids, ft.packed, ft.bucket_fp2,
                m=ft.m, sigma=ft.sigma, exact=ft.exact, cap=self.cap,
                n_stages=stages_for(ft, piece.shape[0], self.cap),
                words=ft.words, lmax=ft.lmax, eb=ft.eb, slot_ok=ft.slot_ok,
                stage_bits=ft.stage_bits,
                cd=ft.cd(stages_for(ft, piece.shape[0], self.cap)))
        from tpu_smatcher.ops import pallas_filter as pf
        n = piece.shape[0]
        cap = self.cap
        if ft.exact:
            mask2d = pf.exact_mask_pallas(piece, ft.bitmaps[0], m=ft.m,
                                          sigma=ft.sigma, n=n,
                                          interpret=self.interpret)
            # matches (not candidates) can be row-dense: full row_slots;
            # caprows bounded by the piece's real row count keeps the
            # 128-slot compaction proportional to the piece, not the cap
            idxs, o, _ = compact_mask(mask2d,
                                      caprows=min(cap, mask2d.shape[0]),
                                      cap=cap, row_slots=128)
            return idxs, o
        k = stages_for(ft, n, cap)
        idxs, matched, _, o = self._mask_verify(piece, k, caprows=cap,
                                                row_slots=128, matched=True)
        return jnp.where(matched, idxs, -1), o

    def _attr_piece(self, piece):
        """Traceable (idxs (cap,) matched starts -1-padded, pids (cap,)
        ORIGINAL pattern ids aligned with idxs, overflow) — the attribution
        variant of _positions_piece (device-side pattern ids, no host
        re-derivation)."""
        ft = self.ft
        cap = self.cap
        from tpu_smatcher.ops.pallas_filter import max_fast_m
        if ft.exact:
            idxs, o = self._positions_piece(piece)
            pids = _exact_attr(piece, idxs, ft.wid_pids, m=ft.m,
                               sigma=ft.sigma)
            return idxs, pids, o
        if self.backend != "pallas" or ft.m > max_fast_m():
            k = stages_for(ft, piece.shape[0], cap)
            idxs, pid, o = _positions_piece_xla(
                piece, ft.bitmaps, ft.bucket_ids, ft.packed, ft.bucket_fp2,
                m=ft.m, sigma=ft.sigma, exact=False, cap=cap, n_stages=k,
                words=ft.words, lmax=ft.lmax, eb=ft.eb, slot_ok=ft.slot_ok,
                stage_bits=ft.stage_bits, cd=ft.cd(k), attr=True)
        else:
            k = stages_for(ft, piece.shape[0], cap)
            idxs, matched, pid, o = self._mask_verify(
                piece, k, caprows=cap, row_slots=128, matched=True)
            idxs = jnp.where(matched, idxs, -1)
            pid = jnp.where(matched, pid, -1)
        pid_orig = jnp.where(
            pid >= 0, ft.orig_ids[jnp.maximum(pid, 0)], -1)
        return idxs, pid_orig, o

    def positions(self, text, *, chunk: int | None = None,
                  depth: int = 4) -> np.ndarray:
        """Sorted start positions of ALL matching windows — unbounded.

        The reference computes positions internally but only counts them
        (SURVEY.md: the column loops in cuda_*/search_*); here they are a
        first-class output.  The text is scanned in pieces with an (m-1)
        overlap, up to `depth` pieces pipelined on-device; any piece whose
        matches exceed the per-piece device cap is split and rescanned
        (pieces of <= cap/2 starts cannot overflow, so enumeration always
        terminates) — dense corpora with millions of matches stream to the
        host with no global cap.  chunk= presizes the pieces (in window
        starts) when the density is known; otherwise the first overflow
        picks a chunk from the measured global match count."""
        from tpu_smatcher.ops.common import check_count32
        text = jnp.asarray(text, jnp.uint8)
        n = int(text.shape[0])
        check_count32(n)      # positions ride int32 until the host append
        ft = self.ft
        m = ft.m
        if n < m:
            return np.empty((0,), np.int64)
        total_starts = n - m + 1
        min_chunk = max(self.cap // 2, 1)

        def piece_of(start, owned):
            return jax.lax.slice(text, (start,),
                                 (min(start + owned + m - 1, n),))

        work = []                        # (start, owned) pieces to scan
        if chunk is None:
            work.append((0, total_starts))
        else:
            chunk = max(int(chunk), min_chunk)
            work.extend((s, min(chunk, total_starts - s))
                        for s in range(0, total_starts, chunk))
        work.reverse()                   # pop() scans in text order
        inflight = []                    # (start, owned, idxs_dev, o_dev)
        out = []
        guess = None                     # density-derived chunk after 1st ovf

        def drain_one():
            nonlocal guess
            start, owned, idxs_d, o_d = inflight.pop(0)
            if bool(np.asarray(o_d)):
                if owned <= min_chunk:
                    raise AssertionError(
                        "positions piece overflowed below the guaranteed "
                        "size — this is a bug")
                if guess is None and owned == total_starts:
                    # size pieces from the global density (few shapes to
                    # compile) instead of blind halving
                    total = max(self.count(text), 1)
                    guess = int(max(min_chunk,
                                    min(owned // 2,
                                        (self.cap // 2) * owned // total)))
                split = max(min_chunk, min(guess or owned // 2, owned // 2))
                for s in range(start, start + owned, split):
                    work.append((s, min(split, start + owned - s)))
                return
            idxs = np.asarray(idxs_d)
            idxs = idxs[idxs >= 0]
            if idxs.size:
                out.append(idxs.astype(np.int64) + start)

        while work or inflight:
            while work and len(inflight) < depth:
                start, owned = work.pop()
                idxs_d, o_d = self._positions_piece(piece_of(start, owned))
                inflight.append((start, owned, idxs_d, o_d))
            if inflight:
                drain_one()
        if not out:
            return np.empty((0,), np.int64)
        return np.sort(np.concatenate(out))

    def core(self, ext):
        """Traceable per-shard (count, overflow) for distribution: the
        overflow flag rides the psum so distributed scans raise instead of
        silently undercounting (parallel/dist.py).  Patterns beyond the
        overlapped-row layout (m > 513) fall back to the tiled XLA core,
        mirroring count_with_overflow."""
        from tpu_smatcher.ops.pallas_filter import max_fast_m
        if self.backend == "pallas" and self.m <= max_fast_m():
            return self._core_pallas(ext)
        return fast_count_core(ext, self.ft, tile=self.tile, cap=self.cap,
                               guard=True)

    def _core_pallas(self, ext):
        from tpu_smatcher.ops import pallas_filter as pf
        ft = self.ft
        n = ext.shape[0]        # static under trace
        if n < ft.m:
            return jnp.int32(0), jnp.int32(0)
        if ft.exact:
            return (pf.exact_count_pallas(ext, ft.bitmaps[0], m=ft.m,
                                          sigma=ft.sigma, n=n, guard=True,
                                          interpret=self.interpret),
                    jnp.int32(0))
        # same routed fp paths as _device_count (slot / cascade / mask);
        # the overflow flag rides the psum so distributed callers detect
        # shard overflow and re-dispatch (parallel/dist.py's ladder)
        return self._fp_device_count(ext)
