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
FP_MULTS = (0x9E37, 0x6A09, 0xB2D1, 0x85EB, 0xC2B3)
DEFAULT_TILE = 1 << 24
DEFAULT_CAP = 1 << 16


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
    n_stages: int
    bitmaps: tuple          # n_stages device arrays (16, 128) int32
    # verification tables (None when exact):
    bucket_ids: object      # (65536 * L,) int32 device, -1 padded
    lmax: int
    packed: object          # (p, W) int32 device
    words: int


def build_fast(patterns: np.ndarray, sigma: int, *, n_stages: int | None = None) -> FastTables:
    patterns = np.asarray(patterns, np.uint8)
    p, m = patterns.shape
    if exact_wid_supported(sigma, m):
        bm = pack_bitmap(_wid_keys_np(patterns, sigma), BITMAP_BITS)
        return FastTables(True, m, sigma, 1, (jnp.asarray(bm),), None, 0, None, 0)

    if n_stages is None:
        # enough stages that FPR^k * tile stays within the sparse budget
        fpr = min(0.999, p / BITMAP_BITS + 1e-6)
        k = 1
        while fpr ** k * DEFAULT_TILE > DEFAULT_CAP / 4 and k < len(FP_MULTS):
            k += 1
        n_stages = k
    n_stages = min(n_stages, len(FP_MULTS))

    bitmaps = []
    fp0 = None
    for s in range(n_stages):
        keys = _fp_keys_np(patterns, FP_MULTS[s])
        if s == 0:
            fp0 = keys
        bitmaps.append(jnp.asarray(pack_bitmap(keys, BITMAP_BITS)))

    # verification buckets keyed by stage-0 fingerprint
    size = np.bincount(fp0, minlength=BITMAP_BITS)
    lmax = max(1, int(size.max(initial=0)))
    bucket = np.full((BITMAP_BITS, lmax), -1, np.int32)
    slot = np.zeros(BITMAP_BITS, np.int64)
    for j in range(p):
        h = int(fp0[j])
        bucket[h, slot[h]] = j
        slot[h] += 1
    packed = pack_rows(patterns)
    return FastTables(False, m, sigma, n_stages,
                      tuple(bitmaps), jnp.asarray(bucket.reshape(-1)), lmax,
                      jnp.asarray(packed), packed.shape[1])


# ---------------------------------------------------------------------------
# dense key computation (traceable)
# ---------------------------------------------------------------------------

def _slice(x, off, size):
    return jax.lax.dynamic_slice(x, (off,), (size,))


def _wid_keys(chunk: jnp.ndarray, n_starts: int, m: int, sigma: int) -> jnp.ndarray:
    """Packed window ids by binary segment doubling (O(log m) vector ops):
    V_{a+b}[j] = (V_a[j] << b*bits) | V_b[j+a]."""
    bits = _bits_per_char(sigma)
    t = chunk.astype(jnp.int32)
    W0 = t.shape[0]
    cache = {1: t}

    def seg(L):                      # width of seg(L) is W0 - (L - 1)
        if L not in cache:
            a = L // 2
            b = L - a
            va, vb = seg(a), seg(b)
            w = W0 - (L - 1)
            cache[L] = (va[:w] << (b * bits)) | jax.lax.dynamic_slice(vb, (a,), (w,))
        return cache[L]

    return seg(m)[:n_starts]


def _fp_keys(chunk: jnp.ndarray, n_starts: int, m: int, mult: int) -> jnp.ndarray:
    """Polynomial fingerprints mod 2^16 by segment doubling:
    F_{a+b}[j] = F_a[j] + mult^a * F_b[j+a]."""
    t = chunk.astype(jnp.int32)
    W0 = t.shape[0]
    cache = {1: t}

    def seg(L):                      # width of seg(L) is W0 - (L - 1)
        if L not in cache:
            a = L // 2
            b = L - a
            fa, fb = seg(a), seg(b)
            w = W0 - (L - 1)
            ma = pow(mult, a, 1 << 16)
            cache[L] = (fa[:w] + ma * jax.lax.dynamic_slice(fb, (a,), (w,))) & 0xFFFF
        return cache[L]

    return seg(m)[:n_starts]


# ---------------------------------------------------------------------------
# the scan
# ---------------------------------------------------------------------------

def fast_count_core(text: jnp.ndarray, ft: FastTables, *, tile: int = DEFAULT_TILE,
                    cap: int = DEFAULT_CAP):
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
            return (count + jnp.sum(jnp.where(valid, hit, 0), dtype=jnp.int32),
                    overflow)

        fp0 = _fp_keys(chunk, tile, m, FP_MULTS[0])
        cand = bitmap_test(ft.bitmaps[0], fp0) == 1
        for s in range(1, ft.n_stages):
            fps = _fp_keys(chunk, tile, m, FP_MULTS[s])
            cand &= bitmap_test(ft.bitmaps[s], fps) == 1
        cand &= valid
        n_cand = jnp.sum(cand, dtype=jnp.int32)
        idxs = jnp.nonzero(cand, size=cap, fill_value=tile + m - 1)[0]
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


#: per-candidate-row slots extracted by hierarchical compaction
ROW_SLOTS = 8


@functools.partial(jax.jit, static_argnames=("caprows", "cap"))
def compact_mask(mask2d, *, caprows: int = 1 << 16, cap: int = DEFAULT_CAP):
    """Hierarchical candidate compaction (measured: ~10ms at 64M positions
    vs ~600ms for flat jnp.nonzero).

    mask2d: (R, 128) int8 from the Pallas filter (invalid positions zero).
    Returns (idxs (cap,) candidate positions padded with -1, overflowed).
    Overflow if more than `caprows` rows contain candidates, any row holds
    more than ROW_SLOTS candidates, or total candidates exceed cap."""
    R = mask2d.shape[0]
    row_counts = jnp.sum(mask2d.astype(jnp.int32), axis=1)
    n_rows = jnp.sum(row_counts > 0, dtype=jnp.int32)
    rows = jnp.nonzero(row_counts > 0, size=caprows, fill_value=R)[0]
    row_live = rows < R
    rows_c = jnp.minimum(rows, R - 1)
    bits = jnp.take(mask2d, rows_c, axis=0).astype(jnp.int32)    # (caprows, 128)
    cum = jnp.cumsum(bits, axis=1)
    count = cum[:, -1]
    row_ovf = jnp.any(row_live & (count > ROW_SLOTS))
    slots = []
    slot_valid = []
    for k in range(ROW_SLOTS):
        lane_k = jnp.sum(cum < (k + 1), axis=1)                  # (caprows,)
        slots.append(rows_c * 128 + jnp.minimum(lane_k, 127))
        slot_valid.append(row_live & (k < count))
    pos = jnp.stack(slots, 1).reshape(-1)
    pv = jnp.stack(slot_valid, 1).reshape(-1)
    n_cand = jnp.sum(pv, dtype=jnp.int32)
    sel = jnp.nonzero(pv, size=cap, fill_value=pos.shape[0])[0]
    sel_live = sel < pos.shape[0]
    idxs = jnp.where(sel_live, pos[jnp.minimum(sel, pos.shape[0] - 1)], -1)
    overflow = (jnp.int32(n_rows > caprows) | jnp.int32(row_ovf)
                | jnp.int32(n_cand > cap))
    return idxs, overflow


@functools.partial(jax.jit, static_argnames=("m", "words", "lmax", "n_starts"))
def verify_at(text, idxs, bucket_ids, packed, *, m, words, lmax, n_starts):
    """Exact verification at candidate positions (idxs padded with -1):
    window words compared against the stage-0-fingerprint bucket patterns."""
    live = (idxs >= 0) & (idxs < n_starts)
    idxs = jnp.clip(idxs, 0, jnp.maximum(n_starts - 1, 0))
    t32 = text.astype(jnp.int32)
    cap = idxs.shape[0]
    # packed window words at candidate starts (m byte-gathers total)
    wlist = []
    for w in range(words):
        nb = min(4, m - 4 * w)
        acc = jnp.zeros((cap,), jnp.int32)
        for k in range(nb):
            acc = acc | (t32[idxs + 4 * w + k] << (8 * k))
        wlist.append(acc)
    # stage-0 fingerprint (bucket key) recomputed from the gathered words —
    # no additional gathers
    fp = jnp.zeros((cap,), jnp.int32)
    rp = 1
    for i in range(m):
        c = (wlist[i // 4] >> (8 * (i % 4))) & 0xFF
        fp = (fp + c * rp) & 0xFFFF
        rp = (rp * FP_MULTS[0]) & 0xFFFF
    matched = jnp.zeros((cap,), bool)
    for l in range(lmax):
        pid = bucket_ids[fp * lmax + l]
        ok = live & (pid >= 0) & ~matched
        pid_c = jnp.maximum(pid, 0)
        eq = jnp.ones((cap,), bool)
        for w in range(words):
            eq &= packed[pid_c, w] == wlist[w]
        matched |= ok & eq
    return jnp.sum(matched, dtype=jnp.int32)


class FastScanner:
    """Shared fast backend; counts equal every engine's count.

    backend: "pallas" (fused TPU kernels, ops/pallas_filter.py), "xla"
    (portable jnp path, used on CPU), or "auto"."""

    def __init__(self, ft: FastTables, *, tile: int = DEFAULT_TILE,
                 cap: int = DEFAULT_CAP, caprows: int = 1 << 16,
                 backend: str = "auto", interpret: bool = False):
        self.ft = ft
        self.tile = tile
        self.cap = cap
        self.caprows = caprows
        self.m = ft.m
        self.sigma = ft.sigma
        self.interpret = interpret
        if backend == "auto":
            backend = "xla" if jax.default_backend() == "cpu" and not interpret else "pallas"
        self.backend = backend
        self._jit = jax.jit(functools.partial(
            fast_count_core, ft=ft, tile=tile, cap=cap))

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
        mask2d = pf.filter_mask_pallas(text, ft.bitmaps, m=ft.m, n=n,
                                       n_stages=ft.n_stages, interpret=self.interpret)
        idxs, o = compact_mask(mask2d, caprows=self.caprows, cap=self.cap)
        c = verify_at(text, idxs, ft.bucket_ids, ft.packed, m=ft.m,
                      words=ft.words, lmax=ft.lmax, n_starts=n - ft.m + 1)
        return int(c), bool(o)

    def count_with_overflow(self, text) -> tuple[int, bool]:
        text = jnp.asarray(text, jnp.uint8)
        if self.backend == "pallas":
            return self._count_pallas(text)
        c, o = self._jit(text)
        return int(c), bool(o)

    def count(self, text) -> int:
        c, o = self.count_with_overflow(text)
        if o:
            raise OverflowError(
                "candidate cap exceeded; raise cap= or use a dense engine")
        return c

    def core(self, ext):
        """Traceable per-shard count for distribution (overflow folded in:
        psum of counts; overflow raises only via count())."""
        if self.backend == "pallas":
            return self._core_pallas(ext)
        c, _ = fast_count_core(ext, self.ft, tile=self.tile, cap=self.cap)
        return c

    def _core_pallas(self, ext):
        from tpu_smatcher.ops import pallas_filter as pf
        ft = self.ft
        n = ext.shape[0]        # static under trace
        if n < ft.m:
            return jnp.int32(0)
        if ft.exact:
            return pf.exact_count_pallas(ext, ft.bitmaps[0], m=ft.m,
                                         sigma=ft.sigma, n=n,
                                         interpret=self.interpret)
        mask2d = pf.filter_mask_pallas(ext, ft.bitmaps, m=ft.m, n=n,
                                       n_stages=ft.n_stages,
                                       interpret=self.interpret)
        idxs, _ = compact_mask(mask2d, caprows=self.caprows, cap=self.cap)
        return verify_at(ext, idxs, ft.bucket_ids, ft.packed, m=ft.m,
                         words=ft.words, lmax=ft.lmax, n_starts=n - ft.m + 1)
