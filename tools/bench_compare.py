"""Min-ensemble + per-query compare of bench JSON records.

Usage: python tools/bench_compare.py BASE.json[,BASE2...] NEW.json[,NEW2...]

Prints per-query base-min vs new-min with ratios for queries, extended,
and the phase dicts — the round-over-round table OPTIMIZATION_r14.md
leads with.
"""
from __future__ import annotations

import json
import sys


def ens(paths):
    runs = [json.load(open(p)) for p in paths.split(",")]
    out = {}
    for sect in ("queries", "extended", "ann_phases", "bpe_phases", "store_phases"):
        keys = set()
        for r in runs:
            keys |= set(r.get(sect) or {})
        out[sect] = {
            k: min(r[sect][k] for r in runs if k in (r.get(sect) or {}))
            for k in keys
        }
    return out


def main() -> None:
    base, new = ens(sys.argv[1]), ens(sys.argv[2])
    for sect in ("queries", "extended", "ann_phases", "bpe_phases", "store_phases"):
        b, n = base[sect], new[sect]
        if not b and not n:
            continue
        print(f"-- {sect}")
        tot_b = tot_n = 0.0
        for k in sorted(set(b) | set(n)):
            vb, vn = b.get(k), n.get(k)
            if vb is None or vn is None or vb == 0:
                print(f"{k:30s} {vb!s:>8} {vn!s:>8}")
                continue
            tot_b += vb
            tot_n += vn
            print(f"{k:30s} {vb:8.3f} {vn:8.3f}  x{vn / vb:4.2f}")
        if tot_b:
            print(f"{'TOTAL':30s} {tot_b:8.3f} {tot_n:8.3f}  x{tot_n / tot_b:4.2f}")


if __name__ == "__main__":
    main()
