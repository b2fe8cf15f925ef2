"""Device mesh setup and text sharding.

Replaces the reference's MPI machinery (MPI_Init/Comm_size, main.c:327-333;
Scatterv with per-rank (m-1)-halo displacements, main.c:463-489) with a 1-D
`jax.sharding.Mesh` over all chips: the text is sharded on the 'data' axis,
preprocessing tables are replicated, halos ride ICI via `lax.ppermute`
(parallel/dist.py), and count reduction is a `lax.psum`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices: int | None = None, axis: str = DATA_AXIS) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        if n_devices > len(devs):
            raise ValueError(f"requested {n_devices} devices, have {len(devs)}")
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def shard_text(text: np.ndarray, mesh: Mesh, *, sigma: int,
               axis: str = DATA_AXIS):
    """Place text sharded along the mesh axis, right-padded to divisibility
    with the out-of-alphabet symbol (pad windows can never match).

    Returns (sharded array, original length)."""
    if sigma >= 256:
        raise ValueError(
            "distributed scans need an out-of-alphabet uint8 pad symbol; "
            "sigma must be <= 255 (got 256: the byte alphabet's pad would "
            "wrap to the real symbol 0)")
    k = mesh.shape[axis]
    n = len(text)
    per = -(-max(n, 1) // k)
    padded = np.full(per * k, sigma, dtype=np.uint8)
    padded[:n] = text
    sharding = NamedSharding(mesh, P(axis))
    return jax.device_put(padded, sharding), n


def replicated(arr, mesh: Mesh):
    return jax.device_put(jnp.asarray(arr), NamedSharding(mesh, P()))
