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


def make_engine(name: str, patterns: PatternSet, *, lanes: int = 8192,
                q: int = 1, tile: int = DEFAULT_TILE):
    """Build the named engine over the pattern set.

    name: one of ac, sh, sbom, wm, sog8, sog16, sog32.
    lanes/q apply to ac; tile to the filter engines."""
    codes, sigma = _codes(patterns)
    if name == "ac":
        return ACScanner(build_ac(codes, sigma), lanes=lanes, q=q)
    if name == "sh":
        return SHScanner(build_sh(codes, sigma), tile=tile)
    if name == "sbom":
        return SBOMScanner(build_sbom(codes, sigma), build_verify(codes, sigma), tile=tile)
    if name == "wm":
        return WMScanner(build_wm(codes, sigma), build_verify(codes, sigma), tile=tile)
    if name in ("sog8", "sog16", "sog32"):
        width = int(name[3:])
        return SOGScanner(build_sog(codes, sigma, width), build_verify(codes, sigma), tile=tile)
    raise ValueError(f"unknown engine {name!r}; expected one of {ENGINE_NAMES}")


def make_fast(patterns: PatternSet, **opts):
    """The shared TPU fast backend (ops/fast.py): same counts as every
    engine, at production speed (fused Pallas filters + sparse verify)."""
    from tpu_smatcher.ops.fast import FastScanner, build_fast
    codes, sigma = _codes(patterns)
    n_stages = opts.pop("n_stages", None)
    return FastScanner(build_fast(codes, sigma, n_stages=n_stages), **opts)


def make_distributed(name: str, patterns: PatternSet, mesh, **opts):
    """Distributed engine over a 1-D device mesh: tables replicated, text
    sharded with ICI halo exchange, count psum-reduced (parallel/dist.py)."""
    from tpu_smatcher.parallel.dist import DistributedCounter
    eng = make_engine(name, patterns, **opts)
    return DistributedCounter(eng.core, mesh, m=patterns.m, sigma=patterns.sigma)
