"""Probe: can Mosaic reshape an (S,S) VMEM tile to (1, S*S) lanes inside a
kernel, and what does the sampler cost with flat output vs tile output +
XLA reshape?"""
import functools
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from superviseddescent_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from superviseddescent_tpu.utils.timing import measure

    s = 55

    def kernel(x_ref, o_ref):
        t = x_ref[0]                       # (S, S)
        o_ref[0:1, :] = (t * 2.0).reshape(1, s * s)

    @jax.jit
    def run(x):
        n = x.shape[0]
        return pl.pallas_call(
            kernel,
            grid=(n,),
            in_specs=[pl.BlockSpec((1, s, s), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, s * s), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n, s * s), jnp.float32),
        )(x)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(512, s, s)), jnp.float32)
    try:
        out = run(x)
        ref = (np.asarray(x) * 2.0).reshape(512, s * s)
        np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-6)
        print("in-kernel reshape: OK", flush=True)
        dt, _ = measure(run, x, reps=20)
        print(f"reshape kernel: {dt*1e3:.3f} ms for 512 tiles", flush=True)
    except Exception as e:
        print(f"in-kernel reshape FAILED: {type(e).__name__}: {e}"[:500],
              flush=True)


if __name__ == "__main__":
    main()
