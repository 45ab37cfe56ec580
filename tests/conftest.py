"""Test configuration: force the CPU backend with 8 virtual devices + x64.

Notes specific to this environment:
  - the 'axon' TPU plugin ignores the JAX_PLATFORMS env var; only
    jax.config.update("jax_platforms", ...) reliably selects CPU
  - multi-device CPU meshes come from jax_num_cpu_devices (SURVEY §4:
    multi-device tests on virtual CPU meshes)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", True)
# persistent compile cache: interpret-mode Pallas tests are XLA-CPU-compile
# dominated (~20-40 s per distinct kernel shape); cached reruns skip it all
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache_cpu"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


def random_coo(rng, nrows, ncols, density=0.05):
    """Random COO with duplicate-free coordinates."""
    import scipy.sparse as sp

    from sparsematrixvectormultiplication_tpu import COOMatrix

    s = sp.random(
        nrows,
        ncols,
        density=density,
        random_state=np.random.RandomState(int(rng.integers(0, 2**31))),
        format="coo",
    )
    return COOMatrix(nrows, ncols, s.row, s.col, s.data), s


@pytest.fixture
def make_random_coo(rng):
    def _make(nrows, ncols, density=0.05):
        return random_coo(rng, nrows, ncols, density)

    return _make
