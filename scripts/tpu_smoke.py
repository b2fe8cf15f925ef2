"""One-command validation on the real TPU (tests/ run on the CPU mesh).

Exercises every production surface against host ground truth: both fast-path
tiers, all five engines, positions, streaming file scans, checkpoint
round-trip, and the distributed counter on a mesh of the available chips.
Prints PASS/FAIL per check and exits non-zero on any failure.
"""
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from tpu_smatcher.core.alphabet import Alphabet
    from tpu_smatcher.core import datagen
    from tpu_smatcher.core.checkpoint import save_tables, load_tables
    from tpu_smatcher.engines import (
        build_tables, make_distributed, make_engine, make_engine_from_tables,
        make_fast)
    from tpu_smatcher.parallel import make_mesh
    from tpu_smatcher.parallel.dist import DistributedCounter

    print(f"devices: {jax.devices()}", file=sys.stderr)
    failures = []

    def check(name, got, want):
        ok = got == want
        print(f"{'PASS' if ok else 'FAIL'} {name}: {got}"
              + ("" if ok else f" != {want}"), flush=True)
        if not ok:
            failures.append(name)

    cases = [("dna m=8 (exact tier)", Alphabet.dna(), 8, 400),
             ("protein m=32 (fp tier)", Alphabet.protein(), 32, 400)]
    for tag, ab, m, p in cases:
        text = datagen.generate_text(1 << 22, ab, seed=11)
        pats = datagen.generate_patterns(text, p, m, ab, frac_present=0.6, seed=12)
        truth = datagen.count_matches(text, pats)
        tdev = jax.device_put(jnp.asarray(text))

        fast = make_fast(pats)
        check(f"fast count [{tag}]", fast.count(tdev), truth)
        want_pos = np.nonzero(np.asarray(datagen.match_starts(text, pats)))[0]
        check(f"fast positions [{tag}]", int(fast.positions(tdev).sum()),
              int(want_pos.sum()))

        engines = ["ac", "sh", "sbom", "wm"] + ([f"sog{m}"] if m in (8, 16, 32) else [])
        for name in engines:
            eng = make_engine(name, pats)
            check(f"{name} count [{tag}]", eng.count(tdev), truth)

        mesh = make_mesh()                   # all available chips
        dc = DistributedCounter(fast.core, mesh, m=m, sigma=pats.sigma)
        check(f"distributed fast [{tag}] x{len(jax.devices())}",
              dc.count(text), truth)

        with tempfile.TemporaryDirectory() as td:
            tp = os.path.join(td, "t.npz")
            save_tables(tp, build_tables("fast", pats))
            eng2 = make_engine_from_tables("fast", load_tables(tp))
            check(f"checkpoint round-trip [{tag}]", eng2.count(tdev), truth)

            cp = os.path.join(td, "c.bin")
            text.tofile(cp)
            check(f"count_file [{tag}]",
                  fast.count_file(cp, chunk=1 << 20), truth)
            check(f"positions_file [{tag}]",
                  int(fast.positions_file(cp, chunk=1 << 20).sum()),
                  int(want_pos.sum()))

        # match->pattern attribution over the enumerated positions
        mpos, mids = fast.matches(tdev)
        win = np.asarray(text)[np.asarray(mpos)[:, None] + np.arange(m)]
        check(f"matches attribution [{tag}]",
              int((win == pats.codes[mids]).all() and mpos.size), truth)

        # pipelined batch API: one host fetch for three scans
        check(f"scan_many [{tag}]",
              fast.scan_many([tdev, tdev[: 1 << 21], tdev]),
              [truth, datagen.count_matches(text[: 1 << 21], pats), truth])

    # round-2 surfaces: long patterns on the fused path, dense unbounded
    # positions, fp-saturating pattern sets
    ab = Alphabet.protein()
    text = datagen.generate_text(1 << 22, ab, seed=13)
    pats = datagen.generate_patterns(text, 50, 256, ab, frac_present=0.6,
                                     seed=14)
    truth = datagen.count_matches(text, pats)
    tdev = jax.device_put(jnp.asarray(text))
    check("fast count [m=256 long-pattern path]",
          make_fast(pats).count(tdev), truth)
    pats = datagen.generate_patterns(text, 20, 1024, ab, frac_present=0.6,
                                     seed=15)
    check("fast count [m=1024, 9 context views]",
          make_fast(pats).count(tdev),
          datagen.count_matches(text, pats))

    abd = Alphabet.dna()
    dense = np.zeros(1 << 20, np.uint8)
    from tpu_smatcher.core.patterns import PatternSet
    dpats = PatternSet(np.zeros((1, 8), np.uint8), abd)
    dfast = make_fast(dpats, cap=4096)
    pos = dfast.positions(jax.device_put(jnp.asarray(dense)))
    check("positions unbounded [1M dense matches]", int(pos.size),
          (1 << 20) - 7)

    # byte-alphabet distribution (cyclic-wrap halo + overcount subtraction)
    # and the mesh pipelined API
    ab256 = Alphabet.of_size(256)
    btext = datagen.generate_text((1 << 21) + 3, ab256, seed=15)
    bpats = datagen.generate_patterns(btext, 100, 8, ab256, frac_present=0.6,
                                      seed=16)
    btruth = datagen.count_matches(btext, bpats)
    bdc = make_distributed("fast", bpats, make_mesh())
    check("distributed sigma=256 wrap", bdc.count(btext), btruth)
    check("distributed scan_many", bdc.scan_many([btext, btext]),
          [btruth, btruth])

    # mixed-length pattern sets: one sub-scanner per length on the chip
    from tpu_smatcher.core.patterns import MixedPatternSet
    from tpu_smatcher.engines import make_mixed
    mab = Alphabet.dna()
    mtext = datagen.generate_text(1 << 22, mab, seed=17)
    rng = np.random.default_rng(18)
    rows = [np.asarray(mtext[s:s + m])
            for m in (5, 8, 16) for s in rng.integers(0, (1 << 22) - 16, 40)]
    mx = MixedPatternSet.from_rows(rows, mab)
    mtruth = sum(int(datagen.count_matches(mtext, g)) for g in mx.groups)
    meng = make_mixed(mx)
    mdev = jax.device_put(jnp.asarray(mtext))
    check("mixed-length count [m in 5/8/16]", meng.count(mdev), mtruth)
    mstarts, mlens = meng.positions(mdev)
    check("mixed-length positions", int(mstarts.size), mtruth)

    # per-pattern attribution histogram (sums to the total count)
    ptext = datagen.generate_text(1 << 21, abd, seed=19)
    ppats = datagen.generate_patterns(ptext, 50, 8, abd, frac_present=0.7,
                                      seed=20)
    pfast = make_fast(ppats)
    per = pfast.count_per_pattern(jax.device_put(jnp.asarray(ptext)))
    check("count_per_pattern sums to count", int(per.sum()),
          datagen.count_matches(ptext, ppats))

    # ADVERSARIAL fp-collision set: d below satisfies sum(d_j * mult^j) == 0
    # mod 2^16 for ALL THREE base fingerprint multipliers (found by the
    # meet-in-the-middle search in scripts/find_fp_collision.py, verified
    # against ops.fast._fp_keys_np) — a window x passes EVERY derived filter
    # stage of pattern x+d, so extra stages can never filter it.  Planting
    # x windows densely makes every scan overflow the per-block slots until
    # the scanner's terminal adaptation (the dense mask pass) engages; the
    # battery asserts counts stay exact on every scan AND the retrace
    # counter STOPS growing (convergence, not per-scan retries).
    FP_COLLISION_D = np.array([0, 1, 0, -3, 1, 2, -3, 2, 2, -3, 2, 1,
                               -3, 0, 1, 0], np.int64)
    arng = np.random.default_rng(23)
    lo, hi = np.maximum(0, -FP_COLLISION_D), np.minimum(3, 3 - FP_COLLISION_D)
    xs = np.stack([arng.integers(lo, hi + 1) for _ in range(300)]
                  ).astype(np.uint8)                       # planted windows
    ys = (xs + FP_COLLISION_D[None, :]).astype(np.uint8)   # the PATTERNS
    atext = np.asarray(datagen.generate_text(1 << 21, abd, seed=24)).copy()
    # plant x windows every 96 bytes: ~170 false candidates per 16K block
    # (>> BLOCK_SLOTS), none of them matches
    for i, s in enumerate(range(0, (1 << 21) - 16, 96)):
        atext[s:s + 16] = xs[i % len(xs)]
    apats = PatternSet(ys, abd)
    atruth = int(datagen.count_matches(atext, apats))
    afast = make_fast(apats)
    adev = jax.device_put(jnp.asarray(atext))
    counts = [afast.count(adev) for _ in range(8)]
    check("adversarial fp-collision counts (8 scans, exact)",
          counts, [atruth] * 8)
    retr_mid = afast._retries
    for _ in range(3):
        afast.count(adev)
    check("adversarial fp-collision converged (no retraces in steady "
          f"state; total={afast._retries})", afast._retries, retr_mid)

    # match-dense small corpus: true matches overflow the per-block slots;
    # the scanner must switch to the dense pass (exact counts, no stage
    # bumps) and keep counting exactly afterwards
    datext = datagen.generate_text(1 << 21, Alphabet.of_size(20), seed=21)
    dapats = datagen.generate_patterns(datext, 4000, 8,
                                       Alphabet.of_size(20),
                                       frac_present=0.9, seed=22)
    datruth = datagen.count_matches(datext, dapats)
    dafast = make_fast(dapats)
    dadev = jax.device_put(jnp.asarray(datext))
    c1 = dafast.count(dadev)
    c2 = dafast.count(dadev)
    check("match-dense count (x2, exact)", (c1, c2), (datruth, datruth))
    if dafast._match_dense:
        check("match-dense switch engaged (no stage bumps)",
              dafast._k_extra, 0)

    print("ALL PASS" if not failures else f"FAILURES: {failures}", flush=True)
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
