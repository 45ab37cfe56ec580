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
SRC = os.path.join(REPO, "result_tpu_r3_pr", "spmv_results.csv")
DST = os.path.join(REPO, "result_tpu_r3", "spmv_results.csv")


def main() -> None:
    if not os.path.exists(SRC):
        sys.exit(f"no source CSV at {SRC}")
    if not os.path.exists(DST):
        sys.exit(f"no destination CSV at {DST} (main sweep not done?)")
    with open(SRC) as f:
        src_rows = list(csv.reader(f))
    with open(DST) as f:
        dst_rows = list(csv.reader(f))
    if not src_rows or src_rows[0] != dst_rows[0]:
        sys.exit("schema mismatch between PR and main CSVs")
    have = {(r[0], r[4], r[5]) for r in dst_rows[1:] if len(r) > 5}
    merged = 0
    with open(DST, "a", newline="") as f:
        w = csv.writer(f)
        for r in src_rows[1:]:
            if len(r) > 5 and r[4].startswith("pallas_pr") \
                    and (r[0], r[4], r[5]) not in have:
                w.writerow(r)
                merged += 1
    print(f"merged {merged} pallas_pr rows into {DST}")


if __name__ == "__main__":
    main()
