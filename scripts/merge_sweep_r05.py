"""Assemble the round-5 full-sweep artifact.

The 2026-08-21 02:05 full-sweep session (results/sweep_full_r05_b_partial)
measured 58/72 cells — including both >100 MB corpora — before the axon
TPU backend went unavailable mid-run (results/sweep_full_r05_outage.log).
The small-corpus cells (the ones the TPU outage cut off, and the ones the
round-4 verdict flagged as session-noisy) were re-measured post-outage in
two further sessions.  This script merges:

  big corpora (athaliana_fna, swissprot)  <- sweep_full_r05_b_partial.jsonl
  small corpora (random2, ecoli, athaliana_faa, world192)
                                          <- sweep_small_r05_s1.jsonl

into results/sweep_full_r05.jsonl (72 cells) and prints the BENCHMARKS.md
table rows.
"""
import json

BIG = {"athaliana_fna", "swissprot"}
SRC_BIG = "results/sweep_full_r05_b_partial.jsonl"
SRC_SMALL = "results/sweep_small_r05_s1.jsonl"
OUT = "results/sweep_full_r05.jsonl"


def rows(path):
    return [json.loads(l) for l in open(path)]


out = []
for r in rows(SRC_BIG):
    if r.get("corpus") in BIG and "engine" in r and "error" not in r:
        r = dict(r, session="2026-08-21T02:05")
        out.append(r)
for r in rows(SRC_SMALL):
    if "engine" in r and "error" not in r:
        r = dict(r, session="2026-08-21T06:07")
        out.append(r)

order = ["random2", "ecoli", "athaliana_fna", "swissprot",
         "athaliana_faa", "world192"]
out.sort(key=lambda r: (order.index(r["corpus"]), r["p_size"]))
with open(OUT, "w") as f:
    for r in out:
        f.write(json.dumps(r) + "\n")
print(f"{len(out)} cells -> {OUT}")

cells = {(r["corpus"], r["p_size"], r["engine"]): r for r in out}
for name in order:
    for p in (1000, 8000):
        def g(eng):
            r = cells.get((name, p, eng))
            if r is None:
                return "—"
            return (f"{r['bytes_per_s'] / 1e9:.2f} "
                    f"({r['device_bytes_per_s'] / 1e9:.1f})")
        r0 = cells[(name, p, "fast")]
        print(f"| {name} | {r0['n']:,} | {r0['sigma']} | {p} | "
              f"{r0['matches']:,} | {g('fast')} | {g('ac')} | "
              f"{g('wm')} | {g('sog8')} |")
