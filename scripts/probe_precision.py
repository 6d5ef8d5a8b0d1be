"""On-chip numerics probe: Mosaic f32 dot_general precision semantics.

Round-3 on-chip kernel-tier failures (runs/tpu_kernel_tests_r3b.log) appeared
after the softmax sum+divide fold (5cca7ad): value-level drift 8e-5..1.4e-3
vs the pre-fold exact-tree formulation. This probe pins the mechanism by
measuring, ON HARDWARE, the error vs float64 host references of:

  1. a raw f32 dot_general at precision DEFAULT / HIGHEST inside a kernel
  2. the folded (ones-row matmul) softmax sum vs the VPU tree sum
  3. elementwise f32 divide

Usage: python scripts/probe_precision.py   (runs on the axon TPU)
"""

import functools
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ecg_denoise_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()

rng = np.random.default_rng(0)


def report(name, got, exact):
    got = np.asarray(got, np.float64)
    rel = np.abs(got - exact) / np.maximum(np.abs(exact), 1e-30)
    print(f"{name:40s} max_rel={rel.max():.3e} med_rel={np.median(rel):.3e}")


# --- 1. raw dot_general precision --------------------------------------
L = 256
a = rng.standard_normal((L, L), np.float32)
b = rng.standard_normal((L, L), np.float32)
exact = a.astype(np.float64) @ b.astype(np.float64)
# what single-pass bf16 rounding of inputs would give:
abf = a.astype(jnp.bfloat16).astype(np.float64)
bbf = b.astype(jnp.bfloat16).astype(np.float64)
report("host bf16-rounded-inputs prediction", abf @ bbf, exact)


def dot_kernel(prec, a_ref, b_ref, o_ref):
    o_ref[:] = jax.lax.dot_general(
        a_ref[:], b_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)


for prec in (None, jax.lax.Precision.HIGHEST):
    f = pl.pallas_call(
        functools.partial(dot_kernel, prec),
        out_shape=jax.ShapeDtypeStruct((L, L), jnp.float32))
    got = jax.jit(f)(a, b)
    report(f"pallas dot f32 precision={prec}", got, exact)

# --- 2. folded softmax sum vs tree sum ---------------------------------
# e: positive exp-like values, v: N(0,1); compare out = (e @ v-aug) fold
# against the tree-normalized oracle, both vs f64.
D = 4
logits = 2.0 * rng.standard_normal((L, L), np.float32)
v = rng.standard_normal((D, L), np.float32)

l64 = logits.astype(np.float64)
e64 = np.exp(l64 - l64.max(axis=-1, keepdims=True))
p64 = e64 / e64.sum(axis=-1, keepdims=True)
out64 = p64 @ v.astype(np.float64).T  # (L, D)


def fold_kernel(prec, l_ref, v_ref, o_ref):
    lg = l_ref[:]
    m = jnp.max(lg, axis=-1, keepdims=True)
    en = jnp.exp(lg - m)  # (L, L) f32
    ones = jnp.ones((1, L), jnp.float32)
    vx = jnp.concatenate([v_ref[:], ones], axis=0)  # (D+1, L)
    of = jax.lax.dot_general(vx, en, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32,
                             precision=prec)  # (D+1, L)
    o_ref[:] = (of[:D, :] / of[D:, :])


def tree_kernel(l_ref, v_ref, o_ref):
    lg = l_ref[:]
    m = jnp.max(lg, axis=-1, keepdims=True)
    e = jnp.exp(lg - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    of = jax.lax.dot_general(v_ref[:], p, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    o_ref[:] = of


for prec in (None, jax.lax.Precision.HIGHEST):
    f = pl.pallas_call(
        functools.partial(fold_kernel, prec),
        out_shape=jax.ShapeDtypeStruct((D, L), jnp.float32))
    got = jax.jit(f)(logits, v)
    report(f"fold sum+div precision={prec}", got, out64.T)

f = pl.pallas_call(tree_kernel, out_shape=jax.ShapeDtypeStruct((D, L), jnp.float32))
got = jax.jit(f)(logits, v)
report("tree-sum oracle formulation", got, out64.T)

# --- 3. elementwise divide ----------------------------------------------
num = rng.standard_normal((8, L)).astype(np.float32)
den = (0.5 + rng.random((8, L))).astype(np.float32)


def div_kernel(n_ref, d_ref, o_ref):
    o_ref[:] = n_ref[:] / d_ref[:]


f = pl.pallas_call(div_kernel, out_shape=jax.ShapeDtypeStruct((8, L), jnp.float32))
got = jax.jit(f)(num, den)
report("pallas f32 elementwise divide", got,
       num.astype(np.float64) / den.astype(np.float64))
