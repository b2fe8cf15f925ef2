"""Probe: can a Mosaic kernel take a STRIDED SUBLANE slice (t[q::4, :])?

If yes, the filter kernel can emit the int32 word view directly (fusing
words_view_pallas away); if not, this documents the dead end.
Also tries the (rb, 128) -> (rb//4, 4, 128) sublane-split reshape variant.
"""
import sys

sys.path.insert(0, "/root/repo")

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _stride_kernel(x_ref, o_ref, *, rb, variant):
    t = x_ref[:].astype(jnp.int32)
    if variant == "stride":
        q0 = t[0::4, :]
        q1 = t[1::4, :]
        q2 = t[2::4, :]
        q3 = t[3::4, :]
    else:
        r = t.reshape(rb // 4, 4, 128)
        q0, q1, q2, q3 = r[:, 0, :], r[:, 1, :], r[:, 2, :], r[:, 3, :]
    o_ref[:] = q0 + 2 * q1 + 3 * q2 + 4 * q3


def run(variant):
    rb = 128
    x = np.arange(rb * 128, dtype=np.uint8).reshape(rb, 128)
    out = pl.pallas_call(
        functools.partial(_stride_kernel, rb=rb, variant=variant),
        grid=(1,),
        in_specs=[pl.BlockSpec((rb, 128), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((rb // 4, 128), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rb // 4, 128), jnp.int32),
    )(jnp.asarray(x))
    got = np.asarray(out)
    t = x.astype(np.int64)
    want = t[0::4] + 2 * t[1::4] + 3 * t[2::4] + 4 * t[3::4]
    assert np.array_equal(got, want), (got[:2, :6], want[:2, :6])
    print(f"{variant}: OK", flush=True)


if __name__ == "__main__":
    for v in ("stride", "reshape"):
        try:
            run(v)
        except Exception as e:
            print(f"{v}: FAIL {type(e).__name__}: {str(e)[:300]}", flush=True)
