"""Compare two sweep JSONL artifacts cell-by-cell (repeatability check).

Reports per-cell relative disagreement of the sync and device rates and
the median/p90/max across matching cells.

  python scripts/compare_sweeps.py results/a.jsonl results/b.jsonl
"""
import json
import sys


def load(path):
    cells = {}
    for line in open(path):
        r = json.loads(line)
        if "engine" not in r or "error" in r or "bytes_per_s" not in r:
            continue
        cells[(r["corpus"], r["p_size"], r["engine"])] = r
    return cells


def main():
    a, b = load(sys.argv[1]), load(sys.argv[2])
    keys = sorted(set(a) & set(b))
    print(f"{len(keys)} matching cells "
          f"({len(a)} in A, {len(b)} in B)")
    stats = {"sync": [], "device": []}
    for k in keys:
        ra, rb = a[k], b[k]
        row = []
        for label, field in (("sync", "bytes_per_s"),
                             ("device", "device_bytes_per_s")):
            va, vb = ra.get(field), rb.get(field)
            if not va or not vb:
                continue
            rel = abs(va - vb) / min(va, vb)
            stats[label].append((rel, k))
            row.append(f"{label} {rel * 100:5.1f}%")
        print(f"  {k[0]:15s} p={k[1]:<5d} {k[2]:5s} " + "  ".join(row))
    for label, vals in stats.items():
        if not vals:
            continue
        rels = sorted(v[0] for v in vals)
        med = rels[len(rels) // 2]
        p90 = rels[min(len(rels) - 1, int(0.9 * len(rels)))]
        worst = max(vals)
        print(f"{label}: median {med * 100:.1f}%  p90 {p90 * 100:.1f}%  "
              f"max {worst[0] * 100:.1f}% at {worst[1]}  n={len(rels)}")


if __name__ == "__main__":
    main()
