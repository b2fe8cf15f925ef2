"""Alphabets and byte encodings.

The reference operates on corpora whose bytes are *pre-encoded* in
``[0, sigma)`` (its Wu-Manber hash supports only fixed alphabet sizes,
``/root/reference/wu/wu.c:18-47``, and its corpora — E.coli2, text2, etc. —
store code points, not ASCII).  We make that invariant explicit: every engine
in this framework consumes ``uint8`` arrays with values ``< sigma``, and this
module owns the mapping between raw byte streams and encoded arrays.

Supported sizes mirror the reference's Wu-Manber table
(``wu_determine_shiftsize``): 2, 4, 8, 20, 128, 256 (512/1024 are accepted for
WM table sizing but can't be held in uint8 text, so they are not constructible
as text alphabets here).
"""

from __future__ import annotations

import dataclasses

import numpy as np

# Alphabet sizes the reference's Wu-Manber supports (wu/wu.c:18-47).
WM_SUPPORTED_SIZES = (2, 4, 8, 20, 128, 256, 512, 1024)

_DNA = b"ACGT"
# Canonical 20-letter amino-acid order.
_PROTEIN = b"ARNDCQEGHILKMFPSTWYV"


@dataclasses.dataclass(frozen=True)
class Alphabet:
    """An alphabet of ``size`` symbols, optionally with a character map.

    ``chars``, when present, maps code point ``i`` -> raw byte ``chars[i]``
    (used to encode ASCII corpora such as FASTA files into code points).
    When ``chars`` is None the corpus is assumed pre-encoded (bytes already
    ``< size``), matching the reference's data files.
    """

    size: int
    chars: bytes | None = None
    name: str = ""

    def __post_init__(self):
        if not (2 <= self.size <= 256):
            raise ValueError(f"alphabet size {self.size} not in [2, 256]")
        if self.chars is not None and len(self.chars) != self.size:
            raise ValueError("chars length must equal alphabet size")

    # -- constructors ------------------------------------------------------

    @staticmethod
    def binary() -> "Alphabet":
        return Alphabet(2, None, "binary")

    @staticmethod
    def dna() -> "Alphabet":
        return Alphabet(4, _DNA, "dna")

    @staticmethod
    def protein() -> "Alphabet":
        return Alphabet(20, _PROTEIN, "protein")

    @staticmethod
    def ascii128() -> "Alphabet":
        return Alphabet(128, None, "ascii128")

    @staticmethod
    def byte() -> "Alphabet":
        return Alphabet(256, None, "byte")

    @staticmethod
    def of_size(size: int) -> "Alphabet":
        named = {2: Alphabet.binary, 4: Alphabet.dna, 20: Alphabet.protein,
                 128: Alphabet.ascii128, 256: Alphabet.byte}
        if size in named:
            return named[size]()
        return Alphabet(size)

    # -- encode / decode ---------------------------------------------------

    def encode(self, raw: bytes | np.ndarray) -> np.ndarray:
        """Raw bytes -> uint8 code points in [0, size).

        With a char map, unknown bytes are mapped to code 0 (biological
        corpora contain rare wildcards like 'N'); without one, bytes are
        validated to already be < size.
        """
        if isinstance(raw, (bytes, bytearray)):
            arr = np.frombuffer(raw, dtype=np.uint8)
        else:
            # validate BEFORE the uint8 cast: np.asarray(..., uint8) wraps
            # out-of-range values mod 256, which would alias a bad symbol to
            # a valid code instead of raising
            wide = np.asarray(raw)
            if wide.size and (int(wide.max()) > 255 or int(wide.min()) < 0):
                raise ValueError(
                    f"corpus value {int(wide.max() if wide.max() > 255 else wide.min())} "
                    "outside uint8 range")
            arr = wide.astype(np.uint8)
        if self.chars is None:
            if arr.size and int(arr.max()) >= self.size:
                raise ValueError(
                    f"corpus byte {int(arr.max())} >= alphabet size {self.size}; "
                    "corpus is not pre-encoded — supply an Alphabet with chars")
            return arr.copy()
        lut = np.zeros(256, dtype=np.uint8)
        for code, ch in enumerate(self.chars):
            lut[ch] = code
            # accept lowercase letters too
            if 65 <= ch <= 90:
                lut[ch + 32] = code
        return lut[arr]

    def decode(self, codes: np.ndarray) -> bytes:
        codes = np.asarray(codes, dtype=np.uint8)
        if self.chars is None:
            return codes.tobytes()
        lut = np.frombuffer(self.chars, dtype=np.uint8)
        return lut[codes].tobytes()

    def validate(self, codes: np.ndarray) -> None:
        codes = np.asarray(codes)
        if codes.size and int(codes.max()) >= self.size:
            raise ValueError(f"code {int(codes.max())} out of range for sigma={self.size}")
