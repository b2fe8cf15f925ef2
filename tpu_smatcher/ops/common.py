"""Shared kernel-side utilities (jnp).

Padding convention: kernels right-pad text with the out-of-alphabet symbol
``sigma``.  Tables consumed by kernels are extended so the pad symbol is
always safe (resets AC to root, kills SH/SBOM walks, lands WM hashes in
non-candidate slots); filter-engine false candidates on pad windows are
killed by exact verification (a pad byte can never equal a pattern byte).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def active_fastpath(scanner):
    """The engine's Pallas fast path, when attached (engines.make_engine)
    and applicable: always in interpret mode (tests), else on TPU backends.
    The jnp paths remain the portable/CPU reference implementation.

    Patterns longer than the overlapped-row layout supports fall back to
    the jnp scan transparently (mirrors FastScanner.count_with_overflow)."""
    from tpu_smatcher.ops.pallas_filter import max_fast_m
    fp = getattr(scanner, "fast_path", None)
    if (fp is not None and fp.m <= max_fast_m()
            and (fp.interpret or jax.default_backend() == "tpu")):
        return fp
    return None


def fastpath_positions(scanner, text):
    """Match start positions via the engine's Pallas fast path."""
    fp = active_fastpath(scanner)
    if fp is None:
        raise NotImplementedError(
            "positions() requires the TPU fast path (or interpret mode)")
    return fp.positions(text)


def _attr_fastpath(scanner):
    """The engine's device-attribution scanner when available: the active
    fast path's fallback FastScanner over the SAME tables (identical match
    set and original-id space — ft is built from the engine's own codes)."""
    fp = active_fastpath(scanner)
    if fp is None:
        return None
    fs = fp._fallback_scanner()
    return fs if fs._has_attr_tables() else None


def scanner_matches(scanner, text):
    """(positions, pattern_ids): every match start plus the id of the
    matching pattern (smallest id on duplicate patterns).  With an active
    TPU fast path the ids come from the DEVICE verify stage
    (fast.verify_attr_at — the pid the reference's verify loops compute
    but only count, wu/wu.c:184-201).  Off-TPU, the native C enumerator
    (native.match_enum_native, threaded bucket+memcmp) replaces the
    O(matches x m) numpy fallback — ~45 s extrapolated on a 13.4M-match
    116 MB corpus for the numpy path vs seconds natively; datagen.match_ids
    remains the last-resort portable path."""
    fs = _attr_fastpath(scanner)
    if fs is not None:
        return fs.matches(text)
    codes = getattr(scanner, "pattern_codes", None)
    if codes is None:
        raise ValueError(
            "matches() needs the original pattern codes; construct the "
            "scanner via make_fast/make_engine, or set "
            "scanner.pattern_codes = patterns.codes")
    from tpu_smatcher import native
    res = native.match_enum_native(np.asarray(text, np.uint8), codes)
    if res is not None:
        return res
    pos = scanner.positions(text)
    from tpu_smatcher.core.datagen import match_ids
    return pos, match_ids(np.asarray(text, np.uint8), pos, codes)


def scanner_count_per_pattern(scanner, text) -> np.ndarray:
    """(p,) int64 — how many window starts each pattern matches.

    Histogram of matches(): per position the matching pattern is unique
    for equal-length patterns (the window determines the string), except
    byte-identical duplicates, which are credited to the smallest id —
    the same attribution matches() reports.  Totals sum to count(text).
    The reference identifies the pattern in its verify loops but only
    counts the total (wu/wu.c:184-201); this makes the per-pattern
    breakdown a first-class output.  With an active TPU fast path the
    histogram is aggregated ON DEVICE (FastScanner.count_per_pattern)."""
    fs = _attr_fastpath(scanner)
    if fs is not None:
        return fs.count_per_pattern(text)
    codes = getattr(scanner, "pattern_codes", None)
    if codes is None:
        raise ValueError(
            "count_per_pattern() needs the original pattern codes; "
            "construct the scanner via make_fast/make_engine, or set "
            "scanner.pattern_codes = patterns.codes")
    _, ids = scanner.matches(text)
    return np.bincount(np.asarray(ids, np.int64), minlength=len(codes)
                       ).astype(np.int64)


def fastpath_count_async(scanner, text):
    """count_async via the engine's fast path when active; otherwise a
    pre-resolved future around the synchronous count (uniform API)."""
    fp = active_fastpath(scanner)
    if fp is not None:
        return fp.count_async(
            text, retry=functools.partial(scanner.count, text))
    from tpu_smatcher.ops.fast import ScanFuture
    return ScanFuture(jnp.int32(scanner.count(text)), jnp.int32(0))


def fastpath_scan_many(scanner, texts):
    """Pipelined batch counts through the engine's fast path (or the
    synchronous fallback when no fast path is active)."""
    return [f.result()
            for f in [fastpath_count_async(scanner, t) for t in texts]]


def stream_count_file(count_async, m: int, path: str, *,
                      chunk: int = 1 << 28, depth: int = 3) -> int:
    """Stream a pre-encoded corpus file through `count_async` without
    loading it fully: piece i is scanned over [i*chunk, (i+1)*chunk + m - 1)
    so every window start belongs to exactly one piece — the reference's
    (m-1)-halo rank partition (main.c:463-477) applied to disk IO.  Up to
    `depth` pieces stay in flight so disk reads, host->device copies and
    device scans overlap.  The single implementation behind
    FastScanner.count_file and every engine's count_file."""
    import os
    size = os.path.getsize(path)
    mm = np.memmap(path, dtype=np.uint8, mode="r")
    total = 0
    inflight = []
    for start in range(0, max(size - m + 1, 1), chunk):
        stop = min(size, start + chunk + m - 1)
        inflight.append(count_async(np.asarray(mm[start:stop])))
        if len(inflight) >= depth:
            total += inflight.pop(0).result()
    for f in inflight:
        total += f.result()
    return total


def fastpath_count_file(scanner, path: str, *, chunk: int = 1 << 28,
                        depth: int = 3) -> int:
    """stream_count_file through the engine's fast path (or the synchronous
    fallback when no fast path is active)."""
    return stream_count_file(
        functools.partial(fastpath_count_async, scanner), scanner.m, path,
        chunk=chunk, depth=depth)


def stream_positions_file(positions_fn, m: int, path: str, *,
                          chunk: int = 1 << 28) -> np.ndarray:
    """All match start positions of a pre-encoded corpus file, sorted,
    without loading it fully: the same (m-1)-halo piece partition as
    stream_count_file (each piece owns starts [i*chunk, (i+1)*chunk)), with
    `positions_fn` enumerating each piece (itself pipelined and unbounded —
    ops/fast.py FastScanner.positions).  Because pieces are int32-sized
    internally but offsets accumulate in int64, files >= 2^31 bytes stream
    fine — the reference only ever counts its positions (SURVEY.md: the
    column loops in cuda_*); here they are a first-class streaming output."""
    import os
    size = os.path.getsize(path)
    mm = np.memmap(path, dtype=np.uint8, mode="r")
    out = []
    for start in range(0, max(size - m + 1, 1), chunk):
        stop = min(size, start + chunk + m - 1)
        pos = positions_fn(np.asarray(mm[start:stop]))
        if pos.size:
            out.append(pos.astype(np.int64) + start)
    if not out:
        return np.empty((0,), np.int64)
    return np.concatenate(out)


def fastpath_positions_file(scanner, path: str, *,
                            chunk: int = 1 << 28) -> np.ndarray:
    """stream_positions_file through the engine's fast path (raises
    NotImplementedError without one, mirroring positions())."""
    return stream_positions_file(
        functools.partial(fastpath_positions, scanner), scanner.m, path,
        chunk=chunk)


def check_count32(n: int) -> None:
    """Counts are int32 end-to-end (per-lane accumulators, SMEM scalars,
    psum); a single scan over >= 2^31 window starts could wrap.  Callers
    split such corpora (FastScanner.count_file) or shard across devices."""
    if n >= (1 << 31):
        raise ValueError(
            f"text length {n} >= 2^31: counts are int32 — scan in pieces "
            "(count_file) or shard across devices")


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def pad_col(table: np.ndarray, value: int) -> np.ndarray:
    """Append one column (the pad symbol's) with a constant value."""
    S = table.shape[0]
    return np.concatenate([table, np.full((S, 1), value, table.dtype)], axis=1)


def word_streams(chunk: jnp.ndarray, m: int, n_starts: int) -> jnp.ndarray:
    """(n_starts, W) int32 little-endian packed windows of chunk.

    Word w of window s packs chunk[s+4w .. s+4w+nb) (nb = min(4, m-4w)),
    zero-padded — bit-identical to automata.verify.pack_rows.  Built from
    shifted slices only (no gathers)."""
    t = chunk.astype(jnp.int32)
    W = cdiv(m, 4)
    streams = []
    for w in range(W):
        nb = min(4, m - 4 * w)
        acc = jnp.zeros((n_starts,), jnp.int32)
        for k in range(nb):
            off = 4 * w + k
            acc = acc | (jax.lax.dynamic_slice(t, (off,), (n_starts,)) << (8 * k))
        streams.append(acc)
    return jnp.stack(streams, axis=1)


def verify_starts(chunk: jnp.ndarray, cand: jnp.ndarray, *, packed: jnp.ndarray,
                  bucket_ids_flat: jnp.ndarray, lmax: int, sigma: int, m: int) -> jnp.ndarray:
    """Exact verification of candidate window starts.

    chunk: (L,) uint8; cand: (n_starts,) bool over starts [0, n_starts).
    Returns bool (n_starts,): window equals >= 1 pattern.  TPU-native
    replacement for the reference's three verification paths (WM PREFIX
    lists wu/wu.c:184-201, SOG RK binary search sog/sog8.c:51-95, SBOM
    state lists sbom/sbom.c:176-190): last-gram buckets padded to lmax,
    word-packed full-window compares, <=1 count per position."""
    n_starts = cand.shape[0]
    win = word_streams(chunk, m, n_starts)                      # (n_starts, W)
    c0 = jax.lax.dynamic_slice(chunk, (m - 3,), (n_starts,)).astype(jnp.int32)
    c1 = jax.lax.dynamic_slice(chunk, (m - 2,), (n_starts,)).astype(jnp.int32)
    c2 = jax.lax.dynamic_slice(chunk, (m - 1,), (n_starts,)).astype(jnp.int32)
    key = c0 + c1 * sigma + c2 * (sigma * sigma)                # clipped gathers OK
    key = jnp.minimum(key, bucket_ids_flat.shape[0] // lmax - 1)

    def body(l, matched):
        pid = bucket_ids_flat[key * lmax + l]                   # (n_starts,)
        live = cand & (pid >= 0) & ~matched
        rows = jnp.take(packed, jnp.maximum(pid, 0), axis=0)    # (n_starts, W)
        eq = jnp.all(rows == win, axis=1)
        return matched | (live & eq)

    matched = jnp.zeros((n_starts,), bool)
    return jax.lax.fori_loop(0, lmax, body, matched)


def tiled_count(per_tile, text: jnp.ndarray, n: int, *, tile: int, m: int,
                sigma: int) -> jnp.ndarray:
    """Sum per_tile(chunk, limit) over tiles of `tile` owned starts each.

    per_tile receives a (tile + m - 1,) chunk plus the number of VALID starts
    in it (windows beyond `limit` overlap this function's own tail padding
    and must not count — positional masking, not a pad sentinel, so it also
    holds for sigma=256 where no out-of-alphabet uint8 value exists)."""
    num_tiles = max(1, cdiv(max(n - m + 1, 1), tile))
    padded_len = num_tiles * tile + m - 1
    pad_sym = min(sigma, 255)
    padded = jnp.full((padded_len,), pad_sym, jnp.uint8).at[:n].set(text[:n])
    n_valid_total = max(n - m + 1, 0)

    def body(i, acc):
        chunk = jax.lax.dynamic_slice(padded, (i * tile,), (tile + m - 1,))
        limit = jnp.clip(n_valid_total - i * tile, 0, tile)
        return acc + per_tile(chunk, limit)

    return jax.lax.fori_loop(0, num_tiles, body, jnp.int32(0))
