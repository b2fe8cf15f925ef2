"""Banked 128-lane table lookups — the TPU gather primitive.

Measured on TPU v5e (scripts/probe_dyngather*.py): XLA lowers 2D
``jnp.take_along_axis(table, idx, axis=1)`` with matching shapes to Mosaic's
``tpu.dynamic_gather`` — ~67 G lookups/s on 128-entry tables, vs ~0.13 G
lookups/s for generic 1-D ``table[idx]`` gathers.  Fused into elementwise
pipelines, full scans run at hundreds of GB/s.  This module packages that
fast path:

  - lookup_banked: idx < 128*B via B lane-gathers + selects (cost ~ B)
  - bitmap_test: membership of 16-bit keys in a 65536-bit bitmap
    (16 int32 banks), the workhorse of the exact/fingerprint kernels
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _to_rows(idx: jnp.ndarray) -> tuple[jnp.ndarray, int]:
    """Reshape flat (N,) indices into (rows, 128), padding with 0."""
    n = idx.shape[0]
    rows = -(-n // 128)
    pad = rows * 128 - n
    if pad:
        idx = jnp.concatenate([idx, jnp.zeros((pad,), idx.dtype)])
    return idx.reshape(rows, 128), n


def lookup_banked(table: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """table: (B, 128) int32 = a (B*128,)-entry table; idx: (N,) in [0, B*128).

    B lane-gathers + B selects; prefer B <= ~16."""
    B = table.shape[0]
    lane2, n = _to_rows(idx & 127)
    bank2, _ = _to_rows(idx >> 7)
    acc = jnp.zeros_like(lane2)
    for b in range(B):
        tab2 = jnp.broadcast_to(table[b][None, :], lane2.shape)
        v = jnp.take_along_axis(tab2, lane2, axis=1)
        acc = jnp.where(bank2 == b, v, acc)
    return acc.reshape(-1)[:n]


def bitmap_test(bitmap: jnp.ndarray, keys: jnp.ndarray) -> jnp.ndarray:
    """bitmap: (B, 128) int32 = B*4096 bits; keys: (N,) int32 in [0, B*4096).

    Returns (N,) int32 in {0,1}: bit `keys` of the bitmap."""
    word = lookup_banked(bitmap, keys >> 5)
    return (word >> (keys & 31)) & 1


def pack_bitmap(keys: np.ndarray, nbits: int) -> np.ndarray:
    """Host-side: set bits `keys` in an nbits bitmap -> (nbits/4096, 128) int32."""
    assert nbits % 4096 == 0
    words = np.zeros(nbits // 32, np.uint32)
    keys = np.asarray(keys, np.int64)
    np.bitwise_or.at(words, keys >> 5, np.uint32(1) << (keys & 31).astype(np.uint32))
    return words.view(np.int32).reshape(-1, 128)
