"""Per-engine production TPU paths: algorithm-specific Pallas filter stages.

Each reference engine's distinguishing data structure becomes a dense Pallas
filter stage over all window starts (counts preserved — a stage never
rejects a true match; SURVEY.md §7):

  AC    prefix-d window-id bitmap — the d-deep trie walk as one lookup
        (the complete-DFA traversal collapses: all patterns have length m,
        so "reach a terminal" == "the m-window is a pattern")
  SH    suffix-d window-id bitmap — the backward reversed-trie walk
        (cuda/cuda_sh.cu:93-101) as one lookup over the window's LAST d chars
  SBOM  suffix-d bitmap — the backward factor-oracle walk
        (cuda/cuda_sbom.cu:93-117); oracle acceptance is a superset of
        suffix membership, so the suffix bitmap is the stronger exact filter
  WM    its own SHIFT table: hit iff SHIFT[hash(last 3 chars)] == 0
        (cuda/cuda_wm.cu:136-176), as a banked value lookup
  SOG   its own T bitmask table: the sequential shift-or E register unrolled
        to an AND of m-B+1 shifted T-bit streams (cuda/cuda_sog.cu:204-213)

Stages compose inside ONE kernel with the shared machinery from
ops/pallas_filter.py: when the exact window-id tier applies (sigma^m <= 2^16)
the engine stage is AND-ed with the exact bitmap and the kernel emits the
count directly; otherwise the engine stage is AND-ed with k fingerprint
stages and candidates flow through hierarchical compaction + word-compare
verification (ops/fast.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_smatcher.automata.sog import SOG_B
from tpu_smatcher.ops.fast import (
    FP_MULTS, DEFAULT_CAP, _bits_per_char, _wid_keys_np, build_fast,
    compact_mask, compact_slots, compact_verify_retry, stages_for,
    verify_chunked,
    stages_for_block, verify_at, words_len)
from tpu_smatcher.ops.lookup import pack_bitmap
from tpu_smatcher.ops.pallas_filter import (
    BLOCK_SLOTS, LANES, SLOT_RB, _bitmap_lookup, _fp_keys_mxu,
    _rank_weights, _window_positions, derived_keys, emit_slots, fp_weights,
    n_base_fps, overlap_rows, row_bytes_for, wid_weights, words_view_pallas)


def _value_lookup(table_ref, idx: jnp.ndarray, rb: int) -> jnp.ndarray:
    """Banked (B*128)-entry int32 table lookup; out-of-range banks give 0.

    Mosaic's dynamic_gather needs idx and table shapes to match, so wide idx
    (> 128 columns) is processed in 128-column chunks."""
    B = table_ref.shape[0]
    W = idx.shape[1]
    if W > LANES:
        pad = -(-W // LANES) * LANES - W
        idxp = jnp.pad(idx, ((0, 0), (0, pad)))
        chunks = [_value_lookup(table_ref, idxp[:, c:c + LANES], rb)
                  for c in range(0, W + pad, LANES)]
        return jnp.concatenate(chunks, axis=1)[:, :W]
    lane = idx & 127
    bank = idx >> 7
    acc = jnp.zeros_like(lane)
    for b in range(B):
        tab = jnp.broadcast_to(table_ref[b][None, :], lane.shape)
        v = jnp.take_along_axis(tab, lane, axis=1)
        acc = jnp.where(bank == b, v, acc)
    return acc


def _stage_hit(kind, params, ref, t32, rb):
    """One filter stage -> (rb, 128) int32 hits in {0, 1}."""
    if kind == "wid":                      # window-id bitmap over d chars,
        bitmap_ref, w_ref, t_bf = ref      # id computed on the MXU
        keys = _fp_keys_mxu(t_bf, (w_ref,), 0xFFFF)
        return _bitmap_lookup(bitmap_ref, keys, rb)
    if kind == "fpset":                    # k derived fingerprint stages
        (k, cd) = params                   # (pallas_filter._filter_kernel)
        bitmap_refs, w_refs, t_bf = ref
        parts = len(w_refs) // n_base_fps(k, cd)
        bases = [_fp_keys_mxu(t_bf, w_refs[i * parts:(i + 1) * parts],
                              0xFFFF) for i in range(n_base_fps(k, cd))]
        smask = bitmap_refs[0].shape[0] * 4096 - 1
        acc = None
        for s in range(k):
            h = _bitmap_lookup(bitmap_refs[s],
                               derived_keys(bases, cd[s], smask), rb)
            acc = h if acc is None else (acc & h)
        return acc
    if kind == "wm":                       # SHIFT[hash(last 3 chars)] == 0
        (m,) = params
        # 2-bit block hash, multiply-add form (matches automata/wu.py and
        # ops/filters.py: h = (c0*4 + c1)*4 + c2; for sigma > 4 this differs
        # from shift-or packing and must match the SHIFT table's builder)
        h = (t32[:, m - 3:m - 3 + LANES] * 4 + t32[:, m - 2:m - 2 + LANES])
        h = h * 4 + t32[:, m - 1:m - 1 + LANES]
        v = _value_lookup(ref, h, rb)
        return jnp.where(v == 0, 1, 0)
    if kind == "sog":                      # shift-or T-bit streams, unrolled
        m, sigma = params
        W = LANES + m - SOG_B
        g = (t32[:, 0:W] + t32[:, 1:W + 1] * sigma
             + t32[:, 2:W + 2] * (sigma * sigma))
        v = _value_lookup(ref, g, rb)
        acc = jnp.zeros((rb, LANES), jnp.int32)
        for i in range(m - SOG_B + 1):
            acc = acc | ((v[:, i:i + LANES] >> i) & 1)
        return acc ^ 1
    raise ValueError(kind)


def _stages_kernel(tile_ref, *refs, stages, m, sigma, n_starts, rb,
                   mode, guard):
    t32 = tile_ref[:].astype(jnp.int32)
    t_bf = (t32.astype(jnp.bfloat16)   # hoisted: shared by all MXU stages
            if any(k in ("fpset", "wid") for k, _ in stages) else None)
    hit = None
    ri = 0
    for kind, params in stages:
        if kind == "fpset":    # consumes k bitmaps + nw*parts weight parts
            (k, cd) = params
            from tpu_smatcher.ops.pallas_filter import PART_TERMS
            nww = n_base_fps(k, cd) * -(-m // PART_TERMS)
            ref = (refs[ri:ri + k], refs[ri + k:ri + k + nww], t_bf)
            ri += k + nww
        elif kind == "wid":    # consumes (bitmap, wid weights)
            ref = (refs[ri], refs[ri + 1], t_bf)
            ri += 2
        else:
            ref = refs[ri]
            ri += 1
        h = _stage_hit(kind, params, ref, t32, rb)
        hit = h if hit is None else (hit & h)
    if guard:
        # used without verification (exact-tier counts/masks): mask
        # pad-contaminated windows, whose packed ids can alias real ones
        # (pallas_filter._pad_guard_2d)
        from tpu_smatcher.ops.pallas_filter import _pad_guard_2d
        hit = hit & _pad_guard_2d(t32[:, :LANES + m - 1], m, sigma)
    hit = jnp.where(_window_positions(rb) < n_starts, hit, 0)
    if mode == "count":
        out_ref = refs[ri]
        s = jnp.sum(hit, dtype=jnp.int32)

        @pl.when(pl.program_id(0) == 0)
        def _():
            out_ref[0, 0] = 0

        out_ref[0, 0] += s
    elif mode == "slots":      # fused in-kernel compaction + word view
        from tpu_smatcher.ops.pallas_filter import emit_words
        tril_ref, triu_ref, out_ref = refs[ri], refs[ri + 1], refs[ri + 2]
        emit_slots(hit, out_ref, tril_ref, triu_ref, rb=rb, slots=BLOCK_SLOTS)
        emit_words(tile_ref, refs[ri + 3], rb=rb)
    else:
        out_ref = refs[ri]
        out_ref[:] = hit.astype(jnp.int8)


def _run_stages(text, stages, tables, *, m, sigma, n, mode,
                guard=False, nw_min=0, rb=SLOT_RB, interpret=False):
    """mode: 'count' (scalar total), 'mask' ((R, 128) int8 candidate mask),
    or 'slots' (((nblocks, 128) compact per-block candidate positions,
    fused (>= nw_min,) int32 verify word view) — see
    pallas_filter.emit_slots / emit_words / fast.compact_slots)."""
    from tpu_smatcher.ops.common import cdiv
    # slots mode extends the grid with zero rows so the fused word view
    # covers the verify gather margin (same layout as filter_slots_pallas)
    tile, n_starts = overlap_rows(
        text, n, m, rb,
        min_rows=cdiv(nw_min, LANES // 4) if mode == "slots" else 0)
    R = tile.shape[0]
    kern = functools.partial(_stages_kernel, stages=tuple(stages), m=m,
                             sigma=sigma, n_starts=n_starts, rb=rb,
                             mode=mode, guard=guard)
    if mode == "slots":
        tables = list(tables) + list(_rank_weights(rb))
    table_specs = [pl.BlockSpec(t.shape, lambda i: (0, 0),
                                memory_space=pltpu.VMEM) for t in tables]
    if mode == "count":
        out_spec = pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)
        out_shape = jax.ShapeDtypeStruct((1, 1), jnp.int32)
    elif mode == "slots":
        out_spec = [pl.BlockSpec((1, LANES), lambda i: (0, i),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((rb // 4, LANES), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM)]
        out_shape = [jax.ShapeDtypeStruct((1, (R // rb) * LANES), jnp.int32),
                     jax.ShapeDtypeStruct((R // 4, LANES), jnp.int32)]
    else:
        out_spec = pl.BlockSpec((rb, LANES), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((R, LANES), jnp.int8)
    out = pl.pallas_call(
        kern,
        grid=(R // rb,),
        in_specs=[pl.BlockSpec((rb, row_bytes_for(m)), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)] + table_specs,
        out_specs=out_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(tile, *tables)
    if mode == "count":
        return out[0, 0]
    if mode == "slots":
        return out[0].reshape(R // rb, LANES), out[1].reshape(-1)
    return out


def _stages_kernel_flat(a_ref, edge_ref, *refs, stages, m, n_starts, rb,
                        mode, nv):
    """_stages_kernel over the FLAT (rows, 128) layout — MXU-keyed stages
    only ('wid' d-gram bitmaps and the shared 'fpset' derived stages),
    whose banded-matmul keys come straight from the in-kernel context
    views (pallas_filter._ctx_views).  The wm/sog stages need misaligned
    column slices of a materialized tile (pathological on the flat layout,
    docs/DESIGN.md dead-end list) and keep the overlap-tile kernel."""
    from tpu_smatcher.ops.pallas_filter import (
        _ctx_views, _fp_keys_views, emit_words_flat)
    h = nv - 1
    views = _ctx_views(a_ref, edge_ref, rb, h)
    views_bf = [v.astype(jnp.bfloat16) for v in views]
    hit = None
    ri = 0
    for kind, params in stages:
        if kind == "wid":
            bitmap_ref = refs[ri]
            w_refs = refs[ri + 1:ri + 1 + nv]
            ri += 1 + nv
            keys = _fp_keys_views(views_bf, w_refs, 0xFFFF)
            s_hit = _bitmap_lookup(bitmap_ref, keys, rb)
        elif kind == "fpset":
            (k, cd) = params
            nw = n_base_fps(k, cd)
            bitmap_refs = refs[ri:ri + k]
            w_refs = refs[ri + k:ri + k + nw * nv]
            ri += k + nw * nv
            bases = [_fp_keys_views(views_bf, w_refs[i * nv:(i + 1) * nv],
                                    0xFFFF) for i in range(nw)]
            smask = bitmap_refs[0].shape[0] * 4096 - 1
            s_hit = None
            for s in range(k):
                t = _bitmap_lookup(bitmap_refs[s],
                                   derived_keys(bases, cd[s], smask), rb)
                s_hit = t if s_hit is None else (s_hit & t)
        else:
            raise ValueError(f"flat kernel cannot run stage kind {kind!r}")
        hit = s_hit if hit is None else (hit & s_hit)
    hit = jnp.where(_window_positions(rb) < n_starts, hit, 0)
    if mode == "count":
        out_ref = refs[ri]
        s = jnp.sum(hit, dtype=jnp.int32)

        @pl.when(pl.program_id(0) == 0)
        def _():
            out_ref[0, 0] = 0

        out_ref[0, 0] += s
    elif mode == "slots":
        tril_ref, triu_ref, out_ref = refs[ri], refs[ri + 1], refs[ri + 2]
        emit_slots(hit, out_ref, tril_ref, triu_ref, rb=rb, slots=BLOCK_SLOTS)
        emit_words_flat(a_ref, refs[ri + 3], rb=rb)
    else:
        refs[ri][:] = hit.astype(jnp.int8)


def _run_stages_flat(text, stages, tables, *, m, n, mode, nw_min=0,
                     rb=SLOT_RB, interpret=False):
    """_run_stages over the flat (rows, 128) layout: zero host-side copies
    when the text is block-aligned, otherwise one pad copy — never the
    (R, row_bytes) overlap concat (~2n extra HBM write+read).  Same output
    contracts as _run_stages."""
    from tpu_smatcher.ops.common import cdiv
    from tpu_smatcher.ops.pallas_filter import edge_rows_for
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
        R = (max(R0, cdiv(cdiv(nw_min, LANES // 4), rb) * rb)
             if mode == "slots" else R0)
        padded = jnp.zeros(((R + eE) * LANES,), jnp.uint8).at[:n].set(text[:n])
        rows = padded.reshape(R + eE, LANES)
        edge_map = lambda i: (i * nbE + nbE, 0)
    kern = functools.partial(_stages_kernel_flat, stages=tuple(stages), m=m,
                             n_starts=n_starts, rb=rb, mode=mode, nv=nv)
    if mode == "slots":
        tables = list(tables) + list(_rank_weights(rb))
    table_specs = [pl.BlockSpec(t.shape, lambda i: (0, 0),
                                memory_space=pltpu.VMEM) for t in tables]
    if mode == "count":
        out_spec = pl.BlockSpec((1, 1), lambda i: (0, 0),
                                memory_space=pltpu.SMEM)
        out_shape = jax.ShapeDtypeStruct((1, 1), jnp.int32)
    elif mode == "slots":
        out_spec = [pl.BlockSpec((1, LANES), lambda i: (0, i),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((rb // 4, LANES), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM)]
        out_shape = [jax.ShapeDtypeStruct((1, (R // rb) * LANES), jnp.int32),
                     jax.ShapeDtypeStruct((R // 4, LANES), jnp.int32)]
    else:
        out_spec = pl.BlockSpec((rb, LANES), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((R, LANES), jnp.int8)
    from tpu_smatcher.ops.pallas_filter import VMEM_LIMIT
    out = pl.pallas_call(
        kern,
        grid=(R // rb,),
        in_specs=[pl.BlockSpec((rb, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((eE, LANES), edge_map,
                               memory_space=pltpu.VMEM)] + table_specs,
        out_specs=out_spec,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=VMEM_LIMIT,
    )(rows, rows, *tables)
    if mode == "count":
        return out[0, 0]
    if mode == "slots":
        return out[0].reshape(R // rb, LANES), out[1].reshape(-1)
    return out


def _to_banks(values: np.ndarray) -> jnp.ndarray:
    """(N,) int table -> (ceil(N/128), 128) int32 banks (zero padded)."""
    v = np.asarray(values)
    B = -(-len(v) // LANES)
    out = np.zeros((B, LANES), np.int32)
    out.reshape(-1)[:len(v)] = v.astype(np.int64).astype(np.int32)
    return jnp.asarray(out)


class EngineFastPath:
    """Shared driver: engine stage + exact/fingerprint stages + verify.

    kind: 'ac' | 'sh' | 'sbom' | 'wm' | 'sog'.  Counts equal the engine's
    jnp path and the numpy oracle (windows with >= 1 exact occurrence).
    """

    def __init__(self, kind: str, patterns: np.ndarray, sigma: int, *,
                 shift_ext=None, t_table=None, cap: int | None = None,
                 caprows: int | None = None, row_slots: int | None = None,
                 interpret: bool = False):
        patterns = np.asarray(patterns, np.uint8)
        p, m = patterns.shape
        self.kind, self.m, self.sigma = kind, m, sigma
        self.interpret = interpret
        self.ft = build_fast(patterns, sigma)
        from tpu_smatcher.ops.fast import cap_for
        self.cap = cap_for(self.ft) if cap is None else cap
        self.caprows = caprows if caprows is not None else self.cap
        self.row_slots = row_slots if row_slots is not None else 8
        bits = _bits_per_char(sigma)

        # a banked value lookup unrolls one gather per 128 entries; beyond
        # this the engine stage costs more than the fp stages it saves —
        # drop it and lead with a prefix/suffix bitmap stage instead
        MAX_BANKS = 32

        if kind == "wm" and len(np.asarray(shift_ext)) <= MAX_BANKS * LANES:
            self.stage0 = ("wm", (m,))
            self.tables0 = [_to_banks(np.asarray(shift_ext))]
        elif kind == "sog" and len(np.asarray(t_table)) <= MAX_BANKS * LANES:
            self.stage0 = ("sog", (m, sigma))
            self.tables0 = [_to_banks(np.asarray(t_table))]
        else:
            d = min(m, 16 // bits)
            off = 0 if kind == "ac" else m - d
            if self.ft.exact and d == m:
                self.stage0 = None          # identical to the exact stage
                self.tables0 = []
            else:
                sub = patterns[:, off:off + d]
                # size the bitmap to the d-gram key space (2^(d*bits)) —
                # a fixed 1<<16 would cost up to 16x the bank gathers for
                # mid-size alphabets (bits*d < 16)
                bm = pack_bitmap(_wid_keys_np(sub, sigma),
                                 max(4096, 1 << (d * bits)))
                self.stage0 = ("wid", (off, d, bits))
                # weight layout (tiled vs flat) is chosen per scan
                # (_stages); only the bitmap is fixed here
                self.tables0 = [jnp.asarray(bm)]

        self._jcount = jax.jit(self._count_impl)
        self._jcount_fused = jax.jit(functools.partial(self._count_impl,
                                                       fused=True))
        self._jmask = jax.jit(self._mask_impl)

    def _stages(self, n, k_min: int = 1, flat: bool = False):
        from tpu_smatcher.ops.pallas_filter import (
            fp_weights_views, wid_weights_views)

        def wid_w(d, bits, off):
            return (wid_weights_views(d, bits, off, self.m) if flat
                    else (wid_weights(d, bits, off,
                                      row_bytes_for(self.m)),))

        stages, tables = [], []
        if self.stage0 is not None:
            stages.append(self.stage0)
            tables.extend(self.tables0)
            if self.stage0[0] == "wid":
                off, d, bits0 = self.stage0[1]
                tables.extend(wid_w(d, bits0, off))
        ft = self.ft
        bits = _bits_per_char(self.sigma)
        if ft.exact:
            stages.append(("wid", (0, self.m, bits)))
            tables.append(ft.bitmaps[0])
            tables.extend(wid_w(self.m, bits, 0))
            return stages, tables, True
        k = min(max(stages_for(ft, n, self.cap), k_min), len(ft.bitmaps))
        stages.append(("fpset", (k, ft.cd(k))))
        tables.extend(ft.bitmaps[:k])
        # base-fp mults and m live entirely in the prebuilt weights tables
        nfp = n_base_fps(k, ft.cd(k))
        if flat:
            tables.extend(w for i in range(nfp)
                          for w in fp_weights_views(FP_MULTS[i], self.m))
        else:
            tables.extend(part for i in range(nfp)
                          for part in fp_weights(FP_MULTS[i], self.m))
        return stages, tables, False

    def _flat_ok(self) -> bool:
        """Flat-layout eligibility: every stage's keys are MXU banded
        matmuls ('wid'/'fpset').  wm/sog stage-0 value lookups slice the
        tile at misaligned columns — pathological on the flat layout
        (docs/DESIGN.md) — and keep the overlap tile."""
        return self.stage0 is None or self.stage0[0] == "wid"


    def _count_impl(self, ext, guard=False, fused=False):
        """Traceable (count, overflow) over starts of its argument.
        guard masks pad-contaminated windows (distribution shards);
        fused selects the async fused-slot path (full cap + cond-gated
        chunked verify — verify cost follows the true candidate count, see
        fast.verify_chunked — with the retry ladder behind it)."""
        ft = self.ft
        n = ext.shape[0]        # static under trace
        if n < self.m:
            return jnp.int32(0), jnp.int32(0)
        kb = stages_for_block(ft, SLOT_RB * 128) if not ft.exact else 1
        use_slots = (not ft.exact) and fused and kb <= len(ft.bitmaps) and (
            # big-p routing: meeting the per-block slot budget must not
            # cost more extra wide stages than the mask pipeline's whole
            # overhead (see FastScanner._device_count)
            (kb - stages_for(ft, n, self.cap)) * (ft.stage_bits // 4096)
            <= 48)
        flat = self._flat_ok() and not guard
        stages, tables, exact = self._stages(n, k_min=kb if use_slots else 1,
                                             flat=flat)
        if exact:
            if flat:
                c = _run_stages_flat(ext, stages, tables, m=self.m, n=n,
                                     mode="count", interpret=self.interpret)
            else:
                c = _run_stages(ext, stages, tables, m=self.m,
                                sigma=self.sigma, n=n, mode="count",
                                guard=guard, interpret=self.interpret)
            return c, jnp.int32(0)
        if use_slots:
            # fused in-kernel compaction + word view on the async path (the
            # engine stage only lowers the per-block candidate rate further)
            if flat:
                slotmat, tw = _run_stages_flat(
                    ext, stages, tables, m=self.m, n=n, mode="slots",
                    nw_min=words_len(n, ft.words), interpret=self.interpret)
            else:
                slotmat, tw = _run_stages(ext, stages, tables, m=self.m,
                                          sigma=self.sigma, n=n, mode="slots",
                                          nw_min=words_len(n, ft.words),
                                          interpret=self.interpret)
            idxs, o, n_cand = compact_slots(slotmat, slots=BLOCK_SLOTS,
                                            cap=self.cap)
            c = verify_chunked(tw, idxs, n_cand, ft, n_starts=n - ft.m + 1)
            return c, jnp.int32(o)
        if flat:
            mask2d = _run_stages_flat(ext, stages, tables, m=self.m, n=n,
                                      mode="mask", interpret=self.interpret)
        else:
            mask2d = _run_stages(ext, stages, tables, m=self.m,
                                 sigma=self.sigma, n=n, mode="mask",
                                 interpret=self.interpret)
        idxs, o, _ = compact_mask(mask2d,
                                  caprows=min(self.caprows, self.cap),
                                  cap=self.cap, row_slots=self.row_slots)
        tw = words_view_pallas(ext, nw=words_len(n, ft.words),
                               interpret=self.interpret)
        c = verify_at(tw, idxs, ft.bucket_ids, ft.packed, ft.bucket_fp2,
                      m=ft.m, words=ft.words, lmax=ft.lmax, eb=ft.eb,
                      n_starts=n - ft.m + 1, slot_ok=ft.slot_ok)
        return c, jnp.int32(o)

    def _mask_impl(self, ext):
        flat = self._flat_ok()
        stages, tables, exact = self._stages(ext.shape[0], flat=flat)
        if flat and not exact:
            return _run_stages_flat(ext, stages, tables, m=self.m,
                                    n=ext.shape[0], mode="mask",
                                    interpret=self.interpret)
        if flat:       # exact tier: rebuild tiled (no pad guard on flat)
            stages, tables, _ = self._stages(ext.shape[0], flat=False)
        return _run_stages(ext, stages, tables, m=self.m, sigma=self.sigma,
                           n=ext.shape[0], mode="mask", guard=exact,
                           interpret=self.interpret)

    def count(self, text) -> int:
        from tpu_smatcher.ops.common import check_count32
        text = jnp.asarray(text, jnp.uint8)
        n = int(text.shape[0])
        check_count32(n)
        ft = self.ft
        if n < self.m:
            return 0
        if ft.exact:
            co = np.asarray(jnp.stack(self._jcount(text)))
            return int(co[0])
        mask2d = self._jmask(text)
        tw = words_view_pallas(text, nw=words_len(n, ft.words),
                               interpret=self.interpret)
        c, o = compact_verify_retry(mask2d, tw, ft, cap=self.cap,
                                    caprows=self.caprows,
                                    row_slots=self.row_slots,
                                    n_starts=n - ft.m + 1)
        if o:
            # matches alone exceed the cap at every retry trial — finish
            # exactly in budget-sized pieces (counts are TOTAL for every
            # input; the shared tables make the piece counts identical)
            return self._fallback_scanner()._count_chunked(text)
        return c

    def _fallback_scanner(self):
        """A FastScanner over the same tables, for the dense-corpus piece
        ladder (its counts are identical by construction — same ft)."""
        if getattr(self, "_fallback", None) is None:
            from tpu_smatcher.ops.fast import FastScanner
            self._fallback = FastScanner(
                self.ft, cap=self.cap,
                backend="pallas" if (self.interpret
                                     or jax.default_backend() == "tpu")
                else "xla",
                interpret=self.interpret)
        return self._fallback

    def core(self, ext):
        """Traceable per-shard (count, overflow) for shard_map distribution
        (parallel/dist.py psums both and raises on overflow)."""
        return self._count_impl(ext, guard=True)

    def count_async(self, text, retry=None):
        """Dispatch a device-only scan; result stays on device until
        ScanFuture.result() (see ops/fast.py — same pipelining contract).
        retry overrides the overflow fallback (engines pass their scanner's
        count, which falls back to the capless jnp scan).

        The engine's fused path has no adaptation state (its stage-0 is a
        fixed table), so a match-dense corpus would overflow EVERY async
        scan and re-run the sync ladder each time; after the first
        overflow, async scans route through the fallback FastScanner over
        the same tables, whose ladder adapts (dense-pass switch) — one
        retry, then steady single dispatches (counts identical by
        construction: same ft)."""
        from tpu_smatcher.ops.common import check_count32
        from tpu_smatcher.ops.fast import ScanFuture
        text = jnp.asarray(text, jnp.uint8)
        check_count32(int(text.shape[0]))
        if getattr(self, "_use_fallback_async", False):
            fb = self._fallback_scanner()
            return fb.count_async(text)

        def adapt_retry():
            c = (retry or functools.partial(self.count, text))()
            self._use_fallback_async = True
            self._fallback_scanner().count(text)    # prime its adaptation
            return c

        c, o = self._jcount_fused(text)
        return ScanFuture(c, o, retry=adapt_retry)

    def scan_many(self, texts) -> list[int]:
        """Pipelined batch counts: dispatch all, fetch once (ops/fast.py)."""
        return [f.result() for f in [self.count_async(t) for t in texts]]

    def count_repeat_async(self, text, reps: int):
        """reps back-to-back scans of the same text in ONE device dispatch
        — the jitter-proof timing primitive (fast.make_repeat; see
        FastScanner.count_repeat_async).  Overflow adapts like
        count_async: re-run (and pin future scans) through the fallback
        FastScanner's adaptive path."""
        from tpu_smatcher.ops.common import check_count32
        from tpu_smatcher.ops.fast import ScanFuture, make_repeat
        text = jnp.asarray(text, jnp.uint8)
        check_count32(int(text.shape[0]))
        if getattr(self, "_use_fallback_async", False):
            return self._fallback_scanner().count_repeat_async(text, reps)

        def adapt_retry():
            self._use_fallback_async = True
            fb = self._fallback_scanner()
            fb.count(text)                          # prime its adaptation
            return fb.count_repeat_async(text, reps).result()

        if not hasattr(self, "_jrepeat"):
            self._jrepeat = {}
        if reps not in self._jrepeat:
            self._jrepeat[reps] = make_repeat(
                functools.partial(self._count_impl, fused=True), reps)
        c, o = self._jrepeat[reps](text)
        return ScanFuture(c, o, retry=adapt_retry)

    def positions(self, text) -> np.ndarray:
        """Sorted start positions of ALL matching windows — unbounded.

        The single-dispatch path handles texts whose candidates fit the
        device cap; past it (dense-match corpora — the reference's column
        loops enumerate without bound, cuda/cuda_wm.cu:136-176) the scan
        falls through to the shared split-on-overflow piece pipeline
        (FastScanner.positions over the same tables — the match set is
        identical by construction: same ft, exact verification)."""
        from tpu_smatcher.ops.common import check_count32
        from tpu_smatcher.ops.fast import verify_matched_at
        text = jnp.asarray(text, jnp.uint8)
        n = int(text.shape[0])
        check_count32(n)      # positions ride int32 on device
        ft = self.ft
        if n < self.m:
            return np.empty((0,), np.int64)
        flat = self._flat_ok()
        stages, tables, exact = self._stages(n, flat=flat and True)
        # the exact tier has no verification stage to reject pad-aliased
        # window ids (out-of-alphabet bytes bleed into neighboring char
        # fields) — guard like pallas_filter._exact_mask_kernel does, so the
        # match set stays identical to FastScanner.positions; the guard
        # needs the materialized tile, so the exact tier stays tiled
        if flat and not exact:
            mask2d = _run_stages_flat(text, stages, tables, m=self.m, n=n,
                                      mode="mask", interpret=self.interpret)
        else:
            if flat:
                stages, tables, _ = self._stages(n, flat=False)
            mask2d = _run_stages(text, stages, tables, m=self.m,
                                 sigma=self.sigma, n=n, mode="mask",
                                 guard=exact, interpret=self.interpret)
        idxs, o, _ = compact_mask(mask2d, caprows=self.caprows,
                                  cap=self.cap, row_slots=self.row_slots)
        if exact:
            if bool(np.asarray(o)):
                return self._fallback_scanner().positions(text)
            pos = np.asarray(idxs)
            return np.sort(pos[pos >= 0]).astype(np.int64)
        tw = words_view_pallas(text, nw=words_len(n, ft.words),
                               interpret=self.interpret)
        matched = verify_matched_at(
            tw, idxs, ft.bucket_ids, ft.packed, ft.bucket_fp2, m=ft.m,
            words=ft.words, lmax=ft.lmax, eb=ft.eb, n_starts=n - ft.m + 1,
            slot_ok=ft.slot_ok)
        if bool(np.asarray(o)):
            return self._fallback_scanner().positions(text)
        pos = np.asarray(idxs)[np.asarray(matched)]
        return np.sort(pos[pos >= 0]).astype(np.int64)
