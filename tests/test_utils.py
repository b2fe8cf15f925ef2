"""Profiling/tracing/debug utilities (SURVEY.md §5 aux subsystems)."""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from tpu_smatcher.utils import PhaseTimer, time_jit, emit_jsonl, dprint


def test_phase_timer_accumulates():
    pt = PhaseTimer()
    with pt.phase("read"):
        time.sleep(0.01)
    with pt.phase("read"):
        time.sleep(0.01)
    with pt.phase("scan"):
        pass
    r = pt.report()
    assert set(r) == {"read_s", "scan_s"}
    assert r["read_s"] >= 0.02
    assert r["scan_s"] >= 0.0


def test_time_jit_reports_rate():
    f = jax.jit(lambda x: jnp.sum(x * 2))
    x = jnp.arange(1 << 16, dtype=jnp.int32)
    r = time_jit(f, x, reps=3, bytes_scanned=x.size * 4)
    assert r["reps"] == 3
    assert r["best_s"] > 0 and r["bytes_per_s"] > 0
    assert r["mean_s"] >= r["best_s"]


def test_emit_jsonl(tmp_path):
    p = tmp_path / "metrics.jsonl"
    emit_jsonl(str(p), {"matches": 1})
    emit_jsonl(str(p), {"matches": 2})
    recs = [json.loads(l) for l in p.read_text().splitlines()]
    assert recs == [{"matches": 1}, {"matches": 2}]


def test_dprint_in_jit(capfd):
    def f(x):
        dprint("v={}", x[0])
        return x + 1
    np.testing.assert_array_equal(jax.jit(f)(jnp.arange(3)), [1, 2, 3])
    jax.effects_barrier()
    assert "v=0" in capfd.readouterr().out


def test_dprint_in_pallas_interpret(capfd):
    from jax.experimental import pallas as pl

    dispatched = []
    orig = pl.debug_print

    def spy(fmt, *args):
        dispatched.append(fmt)
        return orig(fmt, *args)

    def kern(x_ref, o_ref):
        dprint("cell={}", x_ref[0, 0])
        o_ref[:] = x_ref[:] * 3

    pl.debug_print = spy
    try:
        out = pl.pallas_call(
            kern, grid=(1,),
            in_specs=[pl.BlockSpec((8, 128), lambda i: (0, 0))],
            out_specs=pl.BlockSpec((8, 128), lambda i: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
            interpret=True)(jnp.ones((8, 128), jnp.int32))
    finally:
        pl.debug_print = orig
    assert int(out.sum()) == 3 * 8 * 128
    assert dispatched, "dprint must route to pl.debug_print inside kernels"
    jax.effects_barrier()
    assert "cell=" in capfd.readouterr().out


def test_top_level_scan():
    import tpu_smatcher as ts
    from tpu_smatcher.core import datagen
    ab = ts.Alphabet.dna()
    text = datagen.generate_text(30_000, ab, seed=71)
    pats = datagen.generate_patterns(text, 30, 8, ab, seed=72)
    r = ts.scan(text, pats, engine="fast", backend="xla", tile=1 << 12)
    assert r["matches"] == datagen.count_matches(text, pats)
    assert r["bytes"] == 30_000 and r["bytes_per_s"] > 0
    r2 = ts.scan(text, pats, engine="wm", fastpath=False, tile=1 << 12)
    assert r2["matches"] == r["matches"]
