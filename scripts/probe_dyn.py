"""Probe the Mosaic ops the restructured fused kernel needs (VERDICT r4
item 2: fori_loop-based sampler). Each probe is a tiny kernel compiled on
the real TPU; pass/fail + timing printed per probe.

  A  dynamic-leading-index VMEM load with dynamic aligned sub-slices:
       win_ref[g, pl.ds(oy, w), pl.ds(ox, wx)]   (g, oy, ox all traced)
  B  dynamic-leading-index VMEM store: pwide[lm, 0:s, :] = patch
  C  dynamic sublane-aligned 2D store: bscr[pl.ds(k*gb+g*br, c), :] = v
  D  one-hot lane extraction of a scalar from a VMEM vector, used as a
     pl.ds offset (after alignment flooring)
  E  fori_loop wrapping dots + the above (the actual loop shape)

Run: python scripts/probe_dyn.py
"""
import functools
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax                                                    # noqa: E402
import jax.numpy as jnp                                       # noqa: E402
from jax.experimental import pallas as pl                     # noqa: E402
from jax.experimental.pallas import tpu as pltpu              # noqa: E402

from superviseddescent_tpu.utils.cache import (               # noqa: E402
    enable_compilation_cache)

enable_compilation_cache()

G, RY, RX = 4, 64, 256
S, W, WX = 16, 32, 128
L = 6
SEG = 128


def run(tag, fn, *args):
    t0 = time.time()
    try:
        out = np.asarray(fn(*args))
        print(f"{tag}: OK  compile+run {time.time()-t0:.1f}s "
              f"sum={out.sum():.3f}", flush=True)
        return out
    except Exception as e:  # noqa: BLE001
        print(f"{tag}: FAIL ({type(e).__name__}) "
              f"{str(e)[:300]}", flush=True)
        return None


# ---------------- A+B+D+E combined: the sampler loop shape ----------- #
def kernel_abde(x_ref, win_ref, o_ref, pwide, pscr):
    l2 = x_ref.shape[2]

    def face(g, _):
        row = x_ref[g]                             # dyn leading load (1, l2)

        def lm_body(lm, _):
            iota = jax.lax.broadcasted_iota(jnp.int32, (1, l2), 1)
            xv = jnp.sum(jnp.where(iota == lm, row, 0.0))
            yv = jnp.sum(jnp.where(iota == lm + L, row, 0.0))
            oy = jnp.clip(yv.astype(jnp.int32), 0, RY - W)
            oy = pl.multiple_of((oy // 8) * 8, 8)
            ox = jnp.clip(xv.astype(jnp.int32), 0, RX - WX)
            ox = pl.multiple_of((ox // 128) * 128, 128)
            sub = win_ref[g, pl.ds(oy, W), pl.ds(ox, WX)]    # (W, WX)
            tx = jnp.full((S, WX), 0.01, jnp.bfloat16)
            ty = jnp.full((SEG, W), 0.01, jnp.bfloat16)
            q = jax.lax.dot_general(tx, sub.astype(jnp.bfloat16),
                                    (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            patch = jax.lax.dot_general(q.astype(jnp.bfloat16), ty,
                                        (((1,), (1,)), ((), ())),
                                        preferred_element_type=jnp.float32)
            pwide[lm, 0:S, :] = patch.astype(jnp.bfloat16)   # dyn lead store
            return 0

        jax.lax.fori_loop(0, L, lm_body, 0)
        # static compaction copies
        for lm in range(L):
            pscr[0:S, lm * S:(lm + 1) * S] = pwide[lm, 0:S, 0:S]
        acc = pscr[0:S, 0:L * S].astype(jnp.float32)
        o_ref[g] = jnp.sum(acc, axis=0, keepdims=True)[:, 0:l2]
        return 0

    jax.lax.fori_loop(0, G, face, 0)


@jax.jit
def probe_abde(x, win):
    return pl.pallas_call(
        kernel_abde,
        grid=(1,),
        in_specs=[pl.BlockSpec((G, 1, 2 * L), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((G, RY, RX), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((G, 1, 2 * L), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G, 1, 2 * L), jnp.float32),
        scratch_shapes=[pltpu.VMEM((L, S, SEG), jnp.bfloat16),
                        pltpu.VMEM((S, L * S), jnp.bfloat16)],
    )(x, win)


# ---------------- C: dynamic sublane-aligned 2D store ----------------- #
BR = 8
GB = G * BR


def kernel_c(v_ref, o_ref, bscr):
    def face(g, _):
        for k in range(2):
            off = pl.multiple_of(k * GB + g * BR, BR)
            bscr[pl.ds(off, 4), :] = v_ref[0:4, :] + g + 10.0 * k
        return 0
    jax.lax.fori_loop(0, G, face, 0)
    o_ref[:, :] = bscr[:, :]


@jax.jit
def probe_c(v):
    return pl.pallas_call(
        kernel_c,
        grid=(1,),
        in_specs=[pl.BlockSpec((8, SEG), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((2 * GB, SEG), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2 * GB, SEG), jnp.float32),
        scratch_shapes=[pltpu.VMEM((2 * GB, SEG), jnp.float32)],
    )(v)


# ---------------- C4: 4D store, dynamic dim-1 index ------------------- #
def kernel_c4(v_ref, o_ref, bscr4):
    def face(g, _):
        for k in range(2):
            bscr4[k, g, 0:4, :] = v_ref[0:4, :] + g + 10.0 * k
        return 0
    jax.lax.fori_loop(0, G, face, 0)
    # read back as 2D via reshape of the leading dims
    for k in range(2):
        blk = bscr4[k]                           # (G, BR, SEG)
        o_ref[pl.ds(k * GB, GB), :] = blk.reshape(GB, SEG)


@jax.jit
def probe_c4(v):
    return pl.pallas_call(
        kernel_c4,
        grid=(1,),
        in_specs=[pl.BlockSpec((8, SEG), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((2 * GB, SEG), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2 * GB, SEG), jnp.float32),
        scratch_shapes=[pltpu.VMEM((2, G, BR, SEG), jnp.float32)],
    )(v)


def main():
    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.default_rng(0)
    x = rng.uniform(0, 200, (G, 1, 2 * L)).astype(np.float32)
    win = jnp.asarray(rng.uniform(0, 255, (G, RY, RX)),
                  jnp.bfloat16)
    out = run("ABDE sampler-loop", probe_abde, jnp.asarray(x), win)
    if out is not None:
        # cross-check vs a pure-numpy emulation
        exp = np.zeros((G, 1, 2 * L), np.float32)
        xw = x.astype(np.float32)
        for g in range(G):
            pscr = np.zeros((S, L * S), np.float32)
            for lm in range(L):
                oy = min(max(int(xw[g, 0, lm + L]), 0), RY - W) // 8 * 8
                ox = min(max(int(xw[g, 0, lm]), 0), RX - WX) // 128 * 128
                sub = np.asarray(win[g, oy:oy + W, ox:ox + WX], np.float32)
                tx = np.full((S, WX), np.float32(np.asarray(
                    jnp.bfloat16(0.01))))
                q = (tx.astype(np.float32) @ sub.T)
                qb = np.asarray(jnp.asarray(q).astype(jnp.bfloat16),
                                np.float32)
                ty = np.full((SEG, W), np.float32(np.asarray(
                    jnp.bfloat16(0.01))))
                patch = qb @ ty.T
                pb = np.asarray(jnp.asarray(patch).astype(jnp.bfloat16),
                                np.float32)
                pscr[:, lm * S:(lm + 1) * S] = pb[:, 0:S]
            exp[g, 0, :] = pscr.sum(axis=0)[0:2 * L]
        d = np.abs(out - exp).max()
        print(f"  ABDE numeric delta vs numpy: {d:.5f}", flush=True)
    v = rng.uniform(0, 1, (8, SEG)).astype(np.float32)
    out_c = run("C dyn-sublane-store", probe_c, jnp.asarray(v))
    out_c4 = run("C4 4D-store+reshape", probe_c4, jnp.asarray(v))
    if out_c is not None:
        exp = np.zeros((2 * GB, SEG), np.float32)
        for g in range(G):
            for k in range(2):
                exp[k * GB + g * BR:k * GB + g * BR + 4] = v[0:4] + g + 10 * k
        print(f"  C delta: {np.abs(out_c - exp).max():.5f}", flush=True)
        if out_c4 is not None:
            print(f"  C4 delta: {np.abs(out_c4 - exp).max():.5f}",
                  flush=True)


if __name__ == "__main__":
    main()
