"""Fold recovered ml_laplace device rows into the main sweep CSV.

Extracted from watch_then_mlfix.sh so chain v10 can reuse it. Unlike the
PR merge this REPLACES an existing (matrix, stage, dtype) row when the
re-measured config is faster (the tuned wl-shed/hack-8 rows it supersedes
were the regression being fixed); idempotent on rerun.
"""
import csv
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
dst = os.path.join(REPO, "result_tpu_r3", "spmv_results.csv")
src = os.path.join(REPO, "result_tpu_r3_mlfix", "spmv_results.csv")

if os.path.exists(src) and os.path.exists(dst):
    dst_rows = list(csv.reader(open(dst)))
    hdr = dst_rows[0]
    gf_i = hdr.index("gflops")
    idx = {(r[0], r[4], r[5]): k for k, r in enumerate(dst_rows) if k and len(r) > 5}
    src_rows = list(csv.reader(open(src)))
    assert src_rows[0] == hdr, "schema mismatch"
    added = replaced = 0
    for r in src_rows[1:]:
        if len(r) <= 5 or not r[4].startswith("pallas_"):
            continue
        key = (r[0], r[4], r[5])
        if key in idx:
            old = dst_rows[idx[key]]
            if float(r[gf_i] or 0) > float(old[gf_i] or 0):
                dst_rows[idx[key]] = r
                replaced += 1
        else:
            dst_rows.append(r)
            idx[key] = len(dst_rows) - 1
            added += 1
    with open(dst, "w", newline="") as f:
        csv.writer(f).writerows(dst_rows)
    print(f"mlfix merge: {added} added, {replaced} replaced")

    # Keep the artifact dir self-describing (ADVICE r3 low-2): a replaced
    # results row must be accompanied by the tile-config row of the run
    # that PRODUCED it, not the superseded tuned config.
    tc_dst = os.path.join(os.path.dirname(dst), "spmv_tile_config.csv")
    tc_src = os.path.join(os.path.dirname(src), "spmv_tile_config.csv")
    if replaced and os.path.exists(tc_src) and os.path.exists(tc_dst):
        tc_rows = list(csv.reader(open(tc_dst)))
        tc_hdr = tc_rows[0]
        tc_idx = {(r[0], r[2]): k for k, r in enumerate(tc_rows) if k and len(r) > 2}
        tc_replaced = 0
        for r in list(csv.reader(open(tc_src)))[1:]:
            if len(r) <= 2:
                continue
            key = (r[0], r[2])
            if key in tc_idx and tc_rows[tc_idx[key]] != r:
                tc_rows[tc_idx[key]] = r
                tc_replaced += 1
            elif key not in tc_idx:
                tc_rows.append(r)
                tc_idx[key] = len(tc_rows) - 1
        if tc_replaced:
            with open(tc_dst, "w", newline="") as f:
                csv.writer(f).writerows(tc_rows)
        print(f"mlfix merge: {tc_replaced} tile-config rows updated")
else:
    print("mlfix merge: source or dest missing, skipped")
