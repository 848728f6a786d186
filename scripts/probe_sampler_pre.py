"""Probe: precomputed origins (SMEM ints) vs in-kernel scalar chains."""
import functools, os, sys
import numpy as np
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def make_kernel(pre, l, s, w, wx, ry, rx):
    def kernel(oxy_ref, sp_ref, oo_ref, win_ref, o_ref):
        j = jax.lax.broadcasted_iota(jnp.int32, (s, 1), 0).astype(jnp.float32)
        uy = jax.lax.broadcasted_iota(jnp.int32, (s, w), 1).astype(jnp.float32)
        ux = jax.lax.broadcasted_iota(jnp.int32, (s, wx), 1).astype(jnp.float32)
        st = sp_ref[0, 0, 0]
        ph = sp_ref[0, 0, 1]
        src = jnp.clip((j + 0.5) * st - 0.5, 0.0, 2.0 * ph - 1.0)
        src0 = src[0, 0]
        for lm in range(l):
            by = oxy_ref[0, 0, lm]
            bx = oxy_ref[0, 0, l + lm]
            if pre:
                oy = pl.multiple_of(oo_ref[0, 0, lm], 8)
                oxi = pl.multiple_of(oo_ref[0, 0, l + lm], 128)
            else:
                oy = jnp.clip(jnp.floor(by + src0), 0.0, float(ry - w)).astype(jnp.int32)
                oy = pl.multiple_of((oy // 8) * 8, 8)
                oxi = jnp.clip(jnp.floor(bx + src0), 0.0, float(rx - wx)).astype(jnp.int32)
                oxi = pl.multiple_of((oxi // 128) * 128, 128)
            sub = win_ref[0, pl.ds(oy, w), pl.ds(oxi, wx)].astype(jnp.bfloat16)
            cy = by + src - oy.astype(jnp.float32)
            cx = bx + src - oxi.astype(jnp.float32)
            ty = jnp.maximum(0.0, 1.0 - jnp.abs(cy - uy)).astype(jnp.bfloat16)
            tx = jnp.maximum(0.0, 1.0 - jnp.abs(cx - ux)).astype(jnp.bfloat16)
            q = jax.lax.dot_general(tx, sub, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            patch = jax.lax.dot_general(q.astype(jnp.bfloat16), ty,
                                        (((1,), (1,)), ((), ())),
                                        preferred_element_type=jnp.float32)
            patch = jnp.clip(jnp.floor(patch + 0.5), 0.0, 255.0)
            o_ref[0, lm] = patch.astype(o_ref.dtype)
    return kernel

@functools.partial(jax.jit, static_argnames=("pre", "s", "w", "wx"))
def run(windows, oxy, sp, g_oo, pre, s, w, wx):
    n, ry, rx = windows.shape
    l = oxy.shape[-1] // 2
    kernel = make_kernel(pre, l, s, w, wx, ry, rx)
    return pl.pallas_call(
        kernel, grid=(n,),
        in_specs=[
            pl.BlockSpec((1, 1, 2 * l), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 2), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 2 * l), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, ry, rx), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, l, s, s), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, l, s, s), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(oxy, sp, g_oo, windows)

def main():
    from superviseddescent_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from superviseddescent_tpu.utils.timing import measure
    batch, roi, l = 1024, 512, 22
    rng = np.random.default_rng(0)
    windows = jnp.asarray(rng.integers(0, 256, (batch, roi, roi)), jnp.bfloat16)
    cx = rng.uniform(200, 312, (batch, l)).astype(np.float32)
    cy = rng.uniform(200, 312, (batch, l)).astype(np.float32)
    for (s, w, wx, ph) in [(55, 160, 384, 72.0), (40, 72, 256, 29.0)]:
        by = np.round(cy) - ph
        bx = np.round(cx) - ph
        st = 2.0 * ph / s
        src0 = max(0.5 * st - 0.5, 0.0)
        oyp = (np.clip(np.floor(by + src0), 0, roi - w).astype(np.int32) // 8) * 8
        oxp = (np.clip(np.floor(bx + src0), 0, roi - wx).astype(np.int32) // 128) * 128
        oo = jnp.asarray(np.concatenate([oyp, oxp], 1), jnp.int32)[:, None, :]
        oxy = jnp.asarray(np.concatenate([by, bx], 1), jnp.float32)[:, None, :]
        sp = jnp.asarray(np.tile(np.float32([st, ph]), (batch, 1)), jnp.float32)[:, None, :]
        for pre in (False, True):
            dt, _ = measure(run, windows, oxy, sp, oo, pre, s, w, wx, reps=20)
            print(f"S={s} W={w} WX={wx} pre={int(pre)}: {dt*1e3:6.2f} ms", flush=True)

if __name__ == "__main__":
    main()
