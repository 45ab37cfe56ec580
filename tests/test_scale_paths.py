"""Multi-path device-scale sweep (bench/scale.py run_path_scale_sweep).

VERDICT r3 item 7: measured scaling must cover SELL + HLL + PR + split
shard paths, with the HLL curve filling the reference CSV's hll column
family (those columns were all zero in the r3 artifacts). These tests run
each path at 1-2 virtual CPU devices on tiny matrices and check (a) the
result validates against the fp64 oracle and (b) the rows land in the
documented openmp-schema columns (src/utility.c:114-120 layout).
"""

import csv

import numpy as np
import pytest

from sparsematrixvectormultiplication_tpu.bench.scale import (
    run_path_scale_sweep,
)
from sparsematrixvectormultiplication_tpu.formats.csr import CSRMatrix
from sparsematrixvectormultiplication_tpu.models.synthetic import (
    banded,
    road_network,
)


def _csr(kind):
    if kind == "banded":
        return CSRMatrix.from_coo(banded(4096, 6, 64, seed=1))
    coo = road_network(8192, seed=2)
    csr = CSRMatrix.from_coo(coo)
    csr_k, _ = csr.split_heavy_rows(1024)
    return csr_k


def _rows(path):
    with open(path) as f:
        return list(csv.reader(f))


HDR = None


def _col(rows, name):
    return rows[0].index(name)


@pytest.mark.parametrize("path_name,kind", [
    ("sell", "banded"),
    ("hll", "banded"),
    ("pr", "road"),
    ("split", "road"),
])
def test_path_scale_sweep_validates(path_name, kind, tmp_path):
    csr = _csr(kind)
    out = str(tmp_path / "scale.csv")
    results = run_path_scale_sweep(
        "tiny", csr, out, path_name, device_counts=[1, 2],
        iterations=2, rounds=1, log=lambda m: None)
    assert len(results) == 2
    for n, sec, gf, dm in results:
        assert dm.significant_diffs == 0
        assert sec > 0 and gf > 0

    rows = _rows(out)
    assert len(rows) == 3  # header + 2 device counts
    # the curve lands in the documented column family
    tcol = _col(rows, "time_parallel_hll" if path_name == "hll"
                else "time_parallel")
    ecol = _col(rows, "efficiency_hll" if path_name == "hll"
                else "efficiency_parallel")
    for r in rows[1:]:
        assert r[0] == f"tiny[{path_name}]"
        assert float(r[tcol]) > 0
        assert float(r[ecol]) > 0
    # num_threads column records the device count
    ncol = _col(rows, "num_threads")
    assert [r[ncol] for r in rows[1:]] == ["1", "2"]


def test_hll_role_fills_hll_columns_only(tmp_path):
    csr = _csr("banded")
    out = str(tmp_path / "scale.csv")
    run_path_scale_sweep("tiny", csr, out, "hll", device_counts=[1],
                         iterations=2, rounds=1, log=lambda m: None)
    rows = _rows(out)
    r = rows[1]
    assert float(r[_col(rows, "time_parallel_hll")]) > 0
    # the parallel (CSR-kernel) family stays zero for the hll curve
    assert float(r[_col(rows, "time_parallel")]) == 0.0
    assert float(r[_col(rows, "flops_parallel")]) == 0.0


def test_ladder_sweep_splits_heavy_rows(tmp_path):
    """Regression for the r4 powerlaw worker crash (VERDICT r4 item 4):
    the ladder sweep must apply the harness's heavy-row split so no
    K>=1024 bin (the faulting kernel geometry) ever reaches conversion,
    and validation must reduce segments back to natural rows."""
    import csv as csvmod

    import numpy as np

    from sparsematrixvectormultiplication_tpu.bench.scale import (
        run_ladder_sweep,
    )
    from sparsematrixvectormultiplication_tpu.formats.csr import CSRMatrix
    from sparsematrixvectormultiplication_tpu.models.synthetic import (
        power_law,
    )

    coo = power_law(2048, avg_nnz_per_row=6, seed=5)
    csr = CSRMatrix.from_coo(coo)
    assert int(csr.row_nnz().max()) > 256  # a real power-law head
    out = str(tmp_path / "ladders.csv")
    rows = run_ladder_sweep("pl_probe", csr, out, iterations=2, rounds=1,
                            log=lambda *_: None)
    assert rows, "no ladder produced a row"
    with open(out) as f:
        table = list(csvmod.reader(f))
    sig_col = table[0].index("significant_diffs")
    nrows_col = table[0].index("rows")
    for r in table[1:]:
        assert int(r[sig_col]) == 0          # exact after segment reduce
        assert int(r[nrows_col]) == csr.nrows  # natural rows reported
