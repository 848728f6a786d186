"""f64-on-CPU parity mode (SURVEY.md §4): the conformance cascades run in
float64 must reproduce the reference's pinned residuals to ~1e-7 — at that
precision any larger deviation is a semantic bug, not float noise.

Runs in a subprocess because jax_enable_x64 is process-global.
"""

import os
import subprocess
import sys

SCRIPT = r"""
import numpy as np
from superviseddescent_tpu.utils.parity import enable_f64
enable_f64()

import jax.numpy as jnp
from superviseddescent_tpu import LinearRegressor, SupervisedDescentOptimiser

def strided_iota(start, step, n):
    out = np.empty(n, np.float32)
    v = np.float32(start)
    for i in range(n):
        out[i] = v
        v = np.float32(v + np.float32(step))
    return out.astype(np.float64)

def h(x, level):
    return jnp.sin(x)

y_tr = strided_iota(-1.0, 0.2, 11).reshape(-1, 1)
x_tr = np.arcsin(np.minimum(y_tr, 1.0))
x0 = np.full_like(x_tr, 0.5)
sdo = SupervisedDescentOptimiser([LinearRegressor() for _ in range(10)])
sdo.train(x_tr, x0, y_tr, h)
train_pred = sdo.test(x0, y_tr, h)
assert train_pred.dtype == jnp.float64, train_pred.dtype

y_ts = strided_iota(-1.0, 0.05, 41).reshape(-1, 1)
x_ts = np.arcsin(np.minimum(y_ts, 1.0))
test_pred = sdo.test(np.full_like(x_ts, 0.5), y_ts, h)

tr = float(np.linalg.norm(np.asarray(train_pred) - x_tr) / np.linalg.norm(x_tr))
te = float(np.linalg.norm(np.asarray(test_pred) - x_ts) / np.linalg.norm(x_ts))
# reference pins (f32 Eigen): 0.040279395 / 0.026156775
assert abs(tr - 0.040279395) < 1e-7, tr
assert abs(te - 0.026156775) < 1e-7, te
print("OK", tr, te)
"""


def test_f64_parity_sin_cascade():
    env = dict(os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu")
    out = subprocess.run([sys.executable, "-c", SCRIPT], env=env,
                         capture_output=True, text=True, timeout=300)
    assert out.returncode == 0, out.stdout + out.stderr
    assert out.stdout.startswith("OK")
