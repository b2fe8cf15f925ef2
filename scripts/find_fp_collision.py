"""One-time birthday search for a full fingerprint collision (m=16, DNA).

Finds a difference vector d (entries in [-3, 3], DNA char deltas) with
sum(d_j * mult^j) == 0 mod 2^16 SIMULTANEOUSLY for all three base
fingerprint multipliers (ops/fast.py FP_MULTS[:3]) — i.e. two windows
x and x + d share fp0, fp1 AND fp2, so one passes every derived filter
stage of the other (STAGE_CD keys are affine in the three fps) no matter
how many stages are applied.  Used to construct the adversarial smoke
cell (scripts/tpu_smoke.py): the found d is embedded there as a constant.

Method: meet-in-the-middle over the 48-bit packed (fp0, fp1, fp2) triple —
left half enumerates d[0:9] (7^9 ~ 40M), right half d[9:16] negated
(7^7 ~ 824k), sorted-join on the packed key.
"""
import itertools
import sys

import numpy as np

sys.path.insert(0, "/root/repo")
from tpu_smatcher.ops.fast import FP_MULTS

M16 = (1 << 16) - 1


def powers(mult, m):
    out = np.zeros(m, np.int64)
    out[0] = 1
    for i in range(1, m):
        out[i] = (out[i - 1] * mult) & M16
    return out


def half_sums(pw0, pw1, pw2, idxs):
    """Packed 48-bit triples of all [-3,3]^len(idxs) combinations."""
    vals = np.array([-3, -2, -1, 0, 1, 2, 3], np.int64)
    f0 = np.zeros(1, np.int64)
    f1 = np.zeros(1, np.int64)
    f2 = np.zeros(1, np.int64)
    combo = np.zeros((1, 0), np.int8)
    for j in idxs:
        f0 = ((f0[:, None] + vals[None, :] * pw0[j]) & M16).reshape(-1)
        f1 = ((f1[:, None] + vals[None, :] * pw1[j]) & M16).reshape(-1)
        f2 = ((f2[:, None] + vals[None, :] * pw2[j]) & M16).reshape(-1)
        combo = np.concatenate(
            [np.repeat(combo, 7, axis=0),
             np.tile(vals.astype(np.int8), combo.shape[0])[:, None]], axis=1)
    key = (f0 << 32) | (f1 << 16) | f2
    return key.astype(np.uint64), combo


def main():
    m = 16
    pws = [powers(mu, m) for mu in FP_MULTS[:3]]
    left_idx = list(range(9))
    right_idx = list(range(9, 16))
    kl, cl = half_sums(*pws, left_idx)
    kr, cr = half_sums(*pws, right_idx)
    # want kl + kr_combo == 0 per 16-bit field: enumerate right NEGATED
    kr_neg, _ = half_sums(*pws, right_idx)
    # negate by recomputing with negated combos: since vals symmetric,
    # kr of combo -c equals the field-wise negation; join kl with
    # negate(kr) keyed identically:
    f0 = (-(kr_neg >> 32).astype(np.int64)) & M16
    f1 = (-((kr_neg >> 16) & np.uint64(M16)).astype(np.int64)) & M16
    f2 = (-(kr_neg & np.uint64(M16)).astype(np.int64)) & M16
    kr2 = ((f0 << 32) | (f1 << 16) | f2).astype(np.uint64)

    order_l = np.argsort(kl)
    order_r = np.argsort(kr2)
    kl_s, kr_s = kl[order_l], kr2[order_r]
    i = np.searchsorted(kl_s, kr_s)
    i = np.clip(i, 0, len(kl_s) - 1)
    hit = kl_s[i] == kr_s
    nz = np.nonzero(hit)[0]
    print(f"left {len(kl)} right {len(kr2)} hits {len(nz)}")
    for h in nz[:10]:
        dl = cl[order_l[i[h]]]
        dr = cr[order_r[h]]
        d = np.concatenate([dl, dr]).astype(int)
        if not d.any():
            continue
        # verify
        for pw in pws:
            assert int((d * pw).sum()) & M16 == 0
        print("d =", list(d))
        return
    print("no nonzero collision found — widen the search")


if __name__ == "__main__":
    main()
