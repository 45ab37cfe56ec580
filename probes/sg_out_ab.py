"""A/B the spmv OUTPUT form cost at road scale: scalar vs 2-D vs 1-D
(reshape+slice) vs 1-D + segment_sum."""
import sys
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
print("device:", jax.devices()[0], flush=True)
_ = np.asarray(jax.device_put(jnp.ones((1024,), jnp.float32)) + 1)
from sparsematrixvectormultiplication_tpu.utils.timing import time_device_fn_batched

ng = 2331  # road post-split groups
nrows = 2381538
y2d = jax.device_put(jnp.ones((ng * 8, 128), jnp.float32))
ids = jax.device_put(jnp.asarray(
    np.minimum(np.arange(ng * 8 * 128) // 2, 999999), jnp.int32))

def scalar_fn(y):
    return (y + 1.0)[0, 0:1]

def y2d_fn(y):
    return y + 1.0

def y1d_fn(y):
    return (y + 1.0).reshape(-1)[:nrows]

def seg_fn(y):
    z = (y + 1.0).reshape(-1)
    return jax.ops.segment_sum(z, ids, num_segments=1000000)

for name, fn in [("scalar", scalar_fn), ("y2d", y2d_fn),
                 ("y1d_reshape_slice", y1d_fn), ("y1d_segsum", seg_fn)]:
    sec, _ = time_device_fn_batched(fn, y2d, reps=64, rounds=3)
    print(f"{name:20s} {sec*1e6:9.1f} us", flush=True)
print("done", flush=True)
