"""Merge the PRAPPEND run's rows into the main sweep CSVs.

The PR stage writes to result_tpu_r3_pr/ (own dir so its checkpoint can't
make the resumed main sweep skip those matrices — see r3_chain2.sh). Once
BOTH runs are complete, the pallas_pr/pallas_pr_dd rows belong in
result_tpu_r3/spmv_results.csv alongside the other stages (VERDICT r2
item 1's "result_tpu_r3 shows powerlaw_web pallas >= 3 GF" evidence).

Idempotent: skips rows already present (matrix, stage, dtype key).
"""
from __future__ import annotations

import csv
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRCS = [
    os.path.join(REPO, "result_tpu_r3_pr", "spmv_results.csv"),    # dd rows
    os.path.join(REPO, "result_tpu_r3_pr2", "spmv_results.csv"),   # f32 retry
    os.path.join(REPO, "result_tpu_r3_split", "spmv_results.csv"),  # chain7
]
DST = os.path.join(REPO, "result_tpu_r3", "spmv_results.csv")


def main() -> None:
    if not os.path.exists(DST):
        sys.exit(f"no destination CSV at {DST} (main sweep not done?)")
    with open(DST) as f:
        dst_rows = list(csv.reader(f))
    have = {(r[0], r[4], r[5]) for r in dst_rows[1:] if len(r) > 5}
    merged = 0
    for src in SRCS:
        if not os.path.exists(src):
            print(f"no source CSV at {src}, skipping")
            continue
        with open(src) as f:
            src_rows = list(csv.reader(f))
        if not src_rows or src_rows[0] != dst_rows[0]:
            sys.exit(f"schema mismatch between {src} and main CSV")
        with open(DST, "a", newline="") as f:
            w = csv.writer(f)
            for r in src_rows[1:]:
                if len(r) > 5 and r[4].startswith(("pallas_pr", "pallas_split")) \
                        and (r[0], r[4], r[5]) not in have:
                    w.writerow(r)
                    have.add((r[0], r[4], r[5]))
                    merged += 1
    print(f"merged {merged} pallas_pr rows into {DST}")


if __name__ == "__main__":
    main()
