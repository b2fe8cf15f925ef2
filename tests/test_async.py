"""Pipelined scanning API: count_async / scan_many / pipelined count_file.

The reference amortizes per-kernel timing across reps on the device
(cuda/cuda_wm.cu:269-302); here the analogous production need is hiding the
host round-trip: results stay on device until ScanFuture.result()."""

import os
import tempfile

import numpy as np
import pytest

from tpu_smatcher.core.alphabet import Alphabet
from tpu_smatcher.core import datagen
from tpu_smatcher.engines import make_engine, make_fast


@pytest.fixture(scope="module")
def fp_case():
    ab = Alphabet.of_size(20)
    text = datagen.generate_text(60_000, ab, seed=5)
    pats = datagen.generate_patterns(text, 80, 12, ab, frac_present=0.5,
                                     seed=6)
    return text, pats, datagen.count_matches(text, pats)


@pytest.fixture(scope="module")
def exact_case():
    ab = Alphabet.dna()
    text = datagen.generate_text(50_000, ab, seed=7)
    pats = datagen.generate_patterns(text, 64, 8, ab, frac_present=0.5,
                                     seed=8)
    return text, pats, datagen.count_matches(text, pats)


def test_scan_many_xla_fp(fp_case):
    text, pats, truth = fp_case
    eng = make_fast(pats, backend="xla")
    got = eng.scan_many([text, text[:30_000]])
    assert got == [truth, datagen.count_matches(text[:30_000], pats)]


def test_count_async_pallas_interpret_fp(fp_case):
    text, pats, truth = fp_case
    eng = make_fast(pats, backend="pallas", interpret=True)
    assert eng.count_async(text).result() == truth


def test_scan_many_exact_both_backends(exact_case):
    text, pats, truth = exact_case
    assert make_fast(pats, backend="pallas",
                     interpret=True).scan_many([text]) == [truth]
    assert make_fast(pats, backend="xla").scan_many([text]) == [truth]


def test_engine_async_fastpath_and_fallback(exact_case):
    text, pats, truth = exact_case
    assert make_engine("wm", pats, interpret=True).scan_many([text]) == [truth]
    assert make_engine("ac", pats,
                       fastpath=False).scan_many([text]) == [truth]


def test_count_async_overflow_retries_to_exact(fp_case):
    """A tiny cap overflows the single device pass; result() must fall back
    to the synchronous retry path — which chunks past persistent overflow —
    and still return the exact count."""
    text, pats, truth = fp_case
    eng = make_fast(pats, backend="xla", cap=32)
    f = eng.count_async(text)
    assert f.result() == truth


def test_count_file_pipelined(exact_case):
    text, pats, truth = exact_case
    eng = make_fast(pats, backend="xla")
    with tempfile.NamedTemporaryFile(delete=False) as fh:
        fh.write(np.asarray(text).tobytes())
        path = fh.name
    try:
        assert eng.count_file(path, chunk=13_000) == truth
        assert eng.count_file(path, chunk=13_000, depth=1) == truth
    finally:
        os.unlink(path)
