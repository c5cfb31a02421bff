"""Micro-benchmark: dense 2D conv paths at BEV-backbone shapes on TPU.

Compares (device-loop timing, dispatch-free):
  * bf16 native lax.conv_general_dilated        (current bf16 path)
  * int8 im2col -> int8 dot_general             (current int8 deploy path)
  * int8 native lax.conv_general_dilated s8xs8->s32 (candidate replacement)

Usage: JAX_PLATFORMS=... python tools/profile_int8_conv.py
"""
import os
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(ROOT / ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "10")

import jax
import jax.numpy as jnp
import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def device_loop_time(make_body, iters=50):
    """Time one body execution via fori_loop delta timing."""
    def fn(x, k):
        def body(i, c):
            return make_body(x, c)
        return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))

    jfn = jax.jit(fn)
    _ = float(np.asarray(jfn(X, 1)))
    t_short = min(
        (lambda: (lambda t0: (float(np.asarray(jfn(X, 1))), time.perf_counter() - t0)[1])(time.perf_counter()))()
        for _ in range(2))
    t0 = time.perf_counter()
    _ = float(np.asarray(jfn(X, 1 + iters)))
    t_long = time.perf_counter() - t0
    return max(t_long - t_short, 1e-9) / iters


SHAPES = [
    # (B, H, W, Cin, Cout, stride) — bench BEV backbone stages
    (1, 128, 128, 128, 128, 1),
    (1, 64, 64, 256, 256, 1),
    (1, 128, 128, 256, 128, 1),   # input conv after HeightCompression
]

for (B, H, W, CI, CO, S) in SHAPES:
    key = jax.random.PRNGKey(0)
    x8 = jax.random.randint(key, (B, H, W, CI), -127, 127, jnp.int8)
    w8 = jax.random.randint(key, (3, 3, CI, CO), -127, 127, jnp.int8)
    x16 = x8.astype(jnp.bfloat16)
    w16 = w8.astype(jnp.bfloat16)
    dn = ("NHWC", "HWIO", "NHWC")

    X = x8  # loop carry perturbs via c

    def _dep8(x, c):
        # runtime-dependent int8 perturbation XLA cannot prove to be zero
        return (x + (c * 1e-30).astype(jnp.int8)).astype(jnp.int8)

    def bf16_body(x, c):
        xx = x16 + (c * 1e-30).astype(jnp.bfloat16)
        y = jax.lax.conv_general_dilated(
            xx, w16, (S, S), [(1, 1), (1, 1)], dimension_numbers=dn,
            preferred_element_type=jnp.float32)
        return y.sum().astype(jnp.float32)

    def int8_native_body(x, c):
        xx = _dep8(x, c)
        y = jax.lax.conv_general_dilated(
            xx, w8, (S, S), [(1, 1), (1, 1)], dimension_numbers=dn,
            preferred_element_type=jnp.int32)
        return y.sum().astype(jnp.float32)

    def int8_native_requant_body(x, c):
        # realistic layer: int8 conv -> int32 -> scale/shift/relu -> int8
        xx = _dep8(x, c)
        y = jax.lax.conv_general_dilated(
            xx, w8, (S, S), [(1, 1), (1, 1)], dimension_numbers=dn,
            preferred_element_type=jnp.int32)
        yf = y.astype(jnp.float32) * 0.01 + 0.5
        y8 = jnp.clip(jnp.round(jax.nn.relu(yf) * 3.7), -127, 127
                      ).astype(jnp.int8)
        return y8.astype(jnp.float32).sum()

    def int8_im2col_body(x, c):
        xx = _dep8(x, c)
        xp = jnp.pad(xx, ((0, 0), (1, 1), (1, 1), (0, 0)))
        Ho = (H + 2 - 3) // S + 1
        Wo = (W + 2 - 3) // S + 1
        cols = [xp[:, i:i + (Ho - 1) * S + 1:S, j:j + (Wo - 1) * S + 1:S, :]
                for i in range(3) for j in range(3)]
        pq = jnp.concatenate(cols, axis=-1)
        w2d = w8.reshape(9 * CI, CO)
        out = jax.lax.dot_general(
            pq.reshape(B * Ho * Wo, 9 * CI), w2d,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        return out.sum().astype(jnp.float32)

    macs = B * (H // S) * (W // S) * CI * CO * 9
    log(f"shape B{B} {H}x{W} {CI}->{CO} s{S}  ({macs/1e9:.2f} GMAC)")
    for name, body in [("bf16 native", bf16_body),
                       ("int8 native conv", int8_native_body),
                       ("int8 native+requant", int8_native_requant_body),
                       ("int8 im2col", int8_im2col_body)]:
        try:
            dt = device_loop_time(body)
            log(f"  {name:20s}: {dt*1e6:9.1f} us  "
                f"({macs/dt/1e12:.2f} TMAC/s)")
        except Exception as e:  # noqa: BLE001
            log(f"  {name:20s}: FAILED {type(e).__name__}: {str(e)[:200]}")
