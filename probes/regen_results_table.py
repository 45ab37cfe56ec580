"""Regenerate the consolidated best-per-matrix table inside RESULTS.md
between the AUTO-TABLE markers (VERDICT r4 item 10: generated, never
hand-edited)."""
import glob
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from sparsematrixvectormultiplication_tpu.bench.report import best_table

dirs = sorted(glob.glob(os.path.join(REPO, "result_tpu_r*")))
table = best_table(dirs)
path = os.path.join(REPO, "RESULTS.md")
text = open(path).read()
block = ("<!-- AUTO-TABLE:BEST (probes/regen_results_table.py) -->\n"
         + table + "\n<!-- /AUTO-TABLE:BEST -->")
pat = re.compile(r"<!-- AUTO-TABLE:BEST.*?/AUTO-TABLE:BEST -->", re.S)
if pat.search(text):
    text = pat.sub(block, text)
else:
    text += "\n\n## Consolidated best-per-matrix (auto-generated)\n\n" \
            "Best validated (sig_diffs=0) stage per matrix and arithmetic\n" \
            "class across every result_tpu_r* dir; %STREAM against the\n" \
            "800 GB/s STREAM-class ceiling (BASELINE.json north star).\n" \
            "Regenerate: `python probes/regen_results_table.py`.\n\n" + block + "\n"
open(path, "w").write(text)
print(table)
