"""Engine facade: build tables + device-resident scanner per algorithm.

The user-facing equivalent of the reference's per-algorithm
preproc_*/search_* pairs (smatcher.h:89-133) — one constructor per engine,
sharing the PatternSet/alphabet contract.
"""

from __future__ import annotations

import numpy as np

from tpu_smatcher.core.patterns import PatternSet
from tpu_smatcher.automata import (
    build_ac, build_sh, build_sbom, build_wm, build_sog, build_verify,
)
from tpu_smatcher.ops.ac import ACScanner
from tpu_smatcher.ops.filters import WMScanner, SOGScanner, SHScanner, SBOMScanner, DEFAULT_TILE

ENGINE_NAMES = ("ac", "sh", "sbom", "wm", "sog8", "sog16", "sog32")


def _codes(patterns) -> tuple[np.ndarray, int]:
    if isinstance(patterns, PatternSet):
        return patterns.codes, patterns.sigma
    raise TypeError("make_engine expects a PatternSet")


def build_tables(name: str, patterns: PatternSet) -> dict:
    """Preprocessing only: the named engine's table dataclasses, as a dict
    suitable for core.checkpoint.save_tables (keys: 'main' and, for the
    verifying engines, 'verify').  name may also be 'fast'."""
    codes, sigma = _codes(patterns)
    if name == "ac":
        return {"main": build_ac(codes, sigma)}
    if name == "sh":
        return {"main": build_sh(codes, sigma)}
    if name == "sbom":
        return {"main": build_sbom(codes, sigma),
                "verify": build_verify(codes, sigma)}
    if name == "wm":
        return {"main": build_wm(codes, sigma),
                "verify": build_verify(codes, sigma)}
    if name in ("sog8", "sog16", "sog32"):
        return {"main": build_sog(codes, sigma, int(name[3:])),
                "verify": build_verify(codes, sigma)}
    if name == "fast":
        from tpu_smatcher.ops.fast import build_fast
        return {"main": build_fast(codes, sigma)}
    raise ValueError(f"unknown engine {name!r}; expected one of {ENGINE_NAMES}")


def make_engine_from_tables(name: str, tables: dict, *, lanes: int = 8192,
                            q: int = 1, tile: int = DEFAULT_TILE, **opts):
    """Construct the named engine from prebuilt tables (see build_tables /
    core.checkpoint.load_tables) — production scans skip preprocessing."""
    main = tables["main"]
    if name == "ac":
        return ACScanner(main, lanes=lanes, q=q)
    if name == "sh":
        return SHScanner(main, tile=tile)
    if name == "sbom":
        return SBOMScanner(main, tables["verify"], tile=tile)
    if name == "wm":
        return WMScanner(main, tables["verify"], tile=tile)
    if name in ("sog8", "sog16", "sog32"):
        return SOGScanner(main, tables["verify"], tile=tile)
    if name == "fast":
        from tpu_smatcher.ops.fast import FastScanner
        return FastScanner(main, tile=tile, **opts)
    raise ValueError(f"unknown engine {name!r}; expected one of {ENGINE_NAMES}")


def attach_fastpath(scanner, name: str, patterns: np.ndarray, sigma: int,
                    *, interpret: bool = False, **opts):
    """Attach the engine's production Pallas path (ops/pallas_engines.py).

    Scanners dispatch to it on TPU backends (or always, in interpret mode);
    the jnp scan remains the portable reference path."""
    from tpu_smatcher.ops.pallas_engines import EngineFastPath
    kw = dict(opts, interpret=interpret)
    if name == "wm":
        kw["shift_ext"] = np.asarray(scanner.shift_ext)
    elif name.startswith("sog"):
        kw["t_table"] = np.asarray(scanner.t_table)
    kind = "sog" if name.startswith("sog") else name
    scanner.fast_path = EngineFastPath(kind, patterns, sigma, **kw)
    scanner.pattern_codes = np.asarray(patterns, np.uint8)  # for matches()
    return scanner


def make_engine(name: str, patterns: PatternSet, *, lanes: int = 8192,
                q: int = 1, tile: int = DEFAULT_TILE, fastpath: bool = True,
                interpret: bool = False):
    """Build the named engine over the pattern set.

    name: one of ac, sh, sbom, wm, sog8, sog16, sog32.
    lanes/q apply to ac; tile to the filter engines.  fastpath attaches the
    per-engine Pallas production path (used automatically on TPU)."""
    eng = make_engine_from_tables(name, build_tables(name, patterns),
                                  lanes=lanes, q=q, tile=tile)
    codes, sigma = _codes(patterns)
    if fastpath and name != "fast":
        attach_fastpath(eng, name, codes, sigma, interpret=interpret)
    eng.pattern_codes = np.asarray(codes, np.uint8)         # for matches()
    return eng


def make_fast(patterns: PatternSet, **opts):
    """The shared TPU fast backend (ops/fast.py): same counts as every
    engine, at production speed (fused Pallas filters + sparse verify)."""
    from tpu_smatcher.ops.fast import FastScanner, build_fast
    codes, sigma = _codes(patterns)
    n_stages = opts.pop("n_stages", None)
    s = FastScanner(build_fast(codes, sigma, n_stages=n_stages), **opts)
    s.pattern_codes = np.asarray(codes, np.uint8)           # for matches()
    return s


def make_distributed(name: str, patterns: PatternSet, mesh, **opts):
    """Distributed engine over a 1-D device mesh: tables replicated, text
    sharded with ICI halo exchange, count psum-reduced (parallel/dist.py).
    On TPU the per-shard scan is the engine's Pallas fast path."""
    from tpu_smatcher.parallel.dist import DistributedCounter
    from tpu_smatcher.ops.common import active_fastpath
    eng = make_engine(name, patterns, **opts)
    fp = active_fastpath(eng)
    core = fp.core if fp is not None else eng.core
    return DistributedCounter(core, mesh, m=patterns.m, sigma=patterns.sigma)
