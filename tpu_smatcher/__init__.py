"""tpu-smatcher: TPU-native multi-pattern string matching.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the CUDA+MPI
reference `iassael/cuda-aho-corasick-wu-manber` (arXiv:1407.2889): exact
multi-pattern matching of `p_size` fixed-length-`m` patterns over large
corpora, via five engines — Aho-Corasick, Set Horspool, SBOM factor oracle,
Wu-Manber, and SOG bit-parallel shift-or — each re-designed as a dense,
branchless, lane-parallel TPU kernel instead of the reference's branchy
skip loops (see SURVEY.md §7 for the count-preservation argument).

Layers (bottom-up):
  core/      alphabets, pattern sets, corpora, planted-hit generation
  oracles/   exact reference-semantics numpy implementations (conformance)
  automata/  flat table builders (AC DFA, SH trie, SBOM oracle, WM, SOG)
  ops/       TPU scan kernels (jnp + Pallas) per engine
  parallel/  mesh setup, halo-sharded distributed scans, psum reduction
  cli.py     smatcher-style command line driver
"""

__version__ = "0.1.0"

from tpu_smatcher.core.alphabet import Alphabet
from tpu_smatcher.core.patterns import PatternSet

__all__ = ["Alphabet", "PatternSet", "__version__"]
