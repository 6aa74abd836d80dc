"""Isolate fp8(e4m3)->bf16 conversion cost inside a Pallas TPU kernel.

Hypothesis for the fused-decode fp8 gap (66ms vs 16ms bf16 at 13B
shapes): Mosaic lowers the fp8 upcast poorly. Variants:
  ident   : bf16 in, bf16 out (baseline — pure copy)
  astype  : e4m3 in, .astype(bf16)
  bits    : e4m3 in, manual integer decode to bf16 bit pattern
  e5m2    : e5m2 in, .astype(bf16)
"""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
import time
import functools
import jax, jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R, C = 1024, 512
N_TILES = 256


def _decode_e4m3_bits(u8):
    """e4m3fn -> bf16 via integer ops: bf16 = sign<<15 | (exp+120)<<7
    | man<<4 for normals; subnormal inputs handled by renormalizing
    through an f32 multiply."""
    u16 = u8.astype(jnp.uint16)
    sign = (u16 & 0x80) << 8
    exp = (u16 >> 3) & 0xF
    man = u16 & 0x7
    normal = (sign | ((exp + 120) << 7) | (man << 4)).astype(jnp.uint16)
    out = jax.lax.bitcast_convert_type(normal, jnp.bfloat16)
    # subnormals: value = man * 2^-9 ; exp==0 selects
    sub = (man.astype(jnp.float32) * (2.0 ** -9)).astype(jnp.bfloat16)
    sub = jnp.where((u16 & 0x80) != 0, -sub, sub)
    return jnp.where(exp == 0, sub, out)


def make(mode):
    def kernel(x_ref, o_ref):
        x = x_ref[...]
        if mode == "bits":
            u8 = jax.lax.bitcast_convert_type(x, jnp.uint8)
            o_ref[...] = _decode_e4m3_bits(u8)
        elif mode == "ident":
            o_ref[...] = x
        else:
            o_ref[...] = x.astype(jnp.bfloat16)

    in_dt = {"ident": jnp.bfloat16, "astype": jnp.float8_e4m3fn,
             "bits": jnp.float8_e4m3fn, "e5m2": jnp.float8_e5m2}[mode]
    x = (jax.random.normal(jax.random.PRNGKey(0), (N_TILES * R, C),
                           jnp.bfloat16) * 0.3).astype(in_dt)
    f = pl.pallas_call(
        kernel,
        grid=(N_TILES,),
        in_specs=[pl.BlockSpec((R, C), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((R, C), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((N_TILES * R, C), jnp.bfloat16),
    )
    f = jax.jit(f)
    y = f(x); y.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(20):
        y = f(x)
    y.block_until_ready()
    dt = (time.perf_counter() - t0) / 20
    gb = N_TILES * R * C * (jnp.dtype(in_dt).itemsize + 2) / 1e9
    print(f"{mode:7s} {dt*1e3:7.3f} ms  {gb/dt:6.0f} GB/s moved")


for m in ["ident", "astype", "bits", "e5m2"]:
    make(m)
