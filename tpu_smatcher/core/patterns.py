"""Pattern sets: ``p_size`` fixed-length-``m`` patterns.

The reference stores patterns as a flattened ``pattern2[p_size * m]`` byte
array (``/root/reference/main.c:456-459``) and every engine assumes all
patterns share one length ``m``.  We keep that contract: a PatternSet is a
dense ``(p_size, m)`` uint8 array of code points plus its alphabet.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from tpu_smatcher.core.alphabet import Alphabet


@dataclasses.dataclass(frozen=True)
class PatternSet:
    codes: np.ndarray          # (p_size, m) uint8, values < alphabet.size
    alphabet: Alphabet

    def __post_init__(self):
        codes = np.ascontiguousarray(np.asarray(self.codes, dtype=np.uint8))
        if codes.ndim != 2:
            raise ValueError("patterns must be a (p_size, m) array")
        object.__setattr__(self, "codes", codes)
        self.alphabet.validate(codes)

    @property
    def p_size(self) -> int:
        return int(self.codes.shape[0])

    @property
    def m(self) -> int:
        return int(self.codes.shape[1])

    @property
    def sigma(self) -> int:
        return self.alphabet.size

    @staticmethod
    def from_strings(strings, alphabet: Alphabet) -> "PatternSet":
        rows = [alphabet.encode(s.encode() if isinstance(s, str) else s) for s in strings]
        lens = {len(r) for r in rows}
        if len(lens) != 1:
            raise ValueError(f"all patterns must share one length, got {sorted(lens)}")
        return PatternSet(np.stack(rows), alphabet)

    @staticmethod
    def from_fasta(path: str, alphabet: Alphabet) -> "PatternSet":
        """One pattern per FASTA record; all records must share one length."""
        from tpu_smatcher.core import corpus as corpus_mod
        seqs = []
        cur = []
        with open(path, "rb") as f:
            for line in f:
                if line.startswith(b">"):
                    if cur:
                        seqs.append(b"".join(cur))
                        cur = []
                else:
                    cur.append(b"".join(line.split()))
        if cur:
            seqs.append(b"".join(cur))
        if not seqs:
            raise ValueError(f"no FASTA records in {path}")
        return PatternSet.from_strings(seqs, alphabet)

    def flat(self) -> np.ndarray:
        """Flattened ``pattern2``-style view (p_size * m,)."""
        return self.codes.reshape(-1)

    def save(self, path: str) -> str:
        """Save as .npz; returns the path actually written (np.savez appends
        '.npz' itself, which would silently diverge from the argument)."""
        if not path.endswith(".npz"):
            path += ".npz"
        np.savez_compressed(path, codes=self.codes, sigma=self.alphabet.size,
                            chars=np.frombuffer(self.alphabet.chars, np.uint8) if self.alphabet.chars else np.zeros(0, np.uint8))
        return path

    @staticmethod
    def load(path: str) -> "PatternSet":
        z = np.load(path)
        chars = bytes(z["chars"].tobytes()) if z["chars"].size else None
        return PatternSet(z["codes"], Alphabet(int(z["sigma"]), chars))
