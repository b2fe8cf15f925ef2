"""Window-key computation by binary segment doubling — the one shared
implementation for the XLA (1-D) and Pallas (2-D) scan paths.

All functions operate on the LAST axis with static slices: the input holds
int32 character codes over W0 columns; a length-L segment result is valid
over columns [0, W0 - (L - 1)).  O(log m) vector ops instead of O(m):

  window id      V_{a+b}[j] = (V_a[j] << b*bits) | V_b[j+a]
  fingerprint    F_{a+b}[j] = F_a[j] + mult^a * F_b[j+a]   (mod 2^16)
  window max     M_{a+b}[j] = max(M_a[j], M_b[j+a])
"""

from __future__ import annotations

import jax.numpy as jnp


def _doubling(t32, m: int, combine):
    W0 = t32.shape[-1]
    cache = {1: t32}

    def seg(L):                      # width of seg(L) is W0 - (L - 1)
        if L not in cache:
            a = L // 2
            b = L - a
            va, vb = seg(a), seg(b)
            w = W0 - (L - 1)
            cache[L] = combine(va[..., :w], vb[..., a:a + w], a, b)
        return cache[L]

    return seg(m)


def wid_keys(t32, m: int, bits: int):
    """Packed window ids of the m chars starting at each column."""
    return _doubling(t32, m, lambda va, vb, a, b: (va << (b * bits)) | vb)


def fp_keys(t32, m: int, mult: int):
    """16-bit polynomial fingerprints: sum c[j+i] * mult^i mod 2^16."""
    def comb(fa, fb, a, b):
        return (fa + pow(mult, a, 1 << 16) * fb) & 0xFFFF
    return _doubling(t32, m, comb)


def max_keys(t32, m: int):
    """Max char code over each m-window — the pad-contamination guard:
    a window is real text iff its max is < sigma (distribution pads shards
    and halos with the out-of-alphabet symbol sigma; for power-of-two sigma
    the packed window id of a pad window can alias a real pattern id, so
    exact-tier kernels must mask by this instead of relying on the pad)."""
    return _doubling(t32, m, lambda va, vb, a, b: jnp.maximum(va, vb))
