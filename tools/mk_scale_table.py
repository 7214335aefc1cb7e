#!/usr/bin/env python3
"""Render the SURVEY scale-results markdown table from two Bench
records (sf0.1 + 100x). Usage:
  python3 tools/mk_scale_table.py BENCH_DETAIL_r18.json BENCH_DETAIL_100x_r18.json
"""
import json
import sys


def main() -> None:
    small = json.load(open(sys.argv[1]))
    big = json.load(open(sys.argv[2]))
    qs, qb = small["queries"], big["queries"]
    names = sorted(set(qs) & set(qb))
    missing = sorted(set(qs) ^ set(qb))
    if missing:
        print(f"<!-- only in one record: {missing} -->")
    tot_s = sum(qs[n] for n in names)
    tot_b = sum(qb[n] for n in names)
    ex_s = sum(qs[n] for n in names if not n.startswith("q180"))
    ex_b = sum(qb[n] for n in names if not n.startswith("q180"))
    print("| query | sf0.1 | 100× | ratio |")
    print("|---|---|---|---|")
    print(f"| **bench total ({len(names)} queries)** | **{tot_s:.1f} s** "
          f"| **{tot_b:.1f} s** | **{tot_b / tot_s:.1f}×** |")
    print(f"| **total excluding q180** | **{ex_s:.1f} s** "
          f"| **{ex_b:.1f} s** | **{ex_b / ex_s:.1f}×** |")
    for n in names:
        s, b = qs[n], qb[n]
        ratio = "—" if s <= 0 or b < 0 else f"{b / s:.1f}×"
        print(f"| {n} | {s:.2f} s | {b:.2f} s | {ratio} |")


if __name__ == "__main__":
    main()
