"""Render sweep CSVs into a RESULTS-style markdown table.

Usage:
    python -m sparsematrixvectormultiplication_tpu.bench.report result_tpu_r2
"""

from __future__ import annotations

import csv
import os
import sys
from collections import defaultdict


def load_native(path: str):
    rows = defaultdict(dict)  # matrix -> stage -> row
    meta = {}
    with open(path) as f:
        for r in csv.DictReader(f):
            rows[r["matrix_name"]][r["stage"]] = r
            meta[r["matrix_name"]] = (int(r["rows"]), int(r["cols"]),
                                      int(r["nonzeros"]))
    return rows, meta


def fmt_gf(row):
    if not row:
        return "—"
    gf = float(row["gflops"])
    sig = int(row["significant_diffs"]) if row["significant_diffs"] else 0
    mark = "" if sig == 0 else f" ✗{sig}"
    return f"{gf:.2f}{mark}"


def main(argv=None):
    out_dir = (argv or sys.argv[1:])[0] if (argv or sys.argv[1:]) else "result"
    native = os.path.join(out_dir, "spmv_results.csv")
    rows, meta = load_native(native)
    stages = ["serial_csr", "serial_hll", "xla_csr", "xla_ell", "pallas_hll",
              "pallas_sell", "pallas_sell_sigma", "pallas_sell_dd"]
    present = [s for s in stages
               if any(s in st for st in rows.values())]
    hdr = "| Matrix | nnz | " + " | ".join(present) + " |"
    sep = "|" + "---|" * (len(present) + 2)
    print(hdr)
    print(sep)
    for m in sorted(rows, key=lambda m: -meta[m][2]):
        nnz = meta[m][2]
        cells = " | ".join(fmt_gf(rows[m].get(s)) for s in present)
        print(f"| {m} | {nnz/1e6:.1f}M | {cells} |")
    print("\nGFLOPS = 2·nnz/t; ✗N marks N significant validation diffs "
          "(tolerances abs 1e-5 / rel 1e-4, ≙ reference main.c:145).")


if __name__ == "__main__":
    main()
