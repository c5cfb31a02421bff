"""Pallas TPU kernel for greedy NMS suppression.

The XLA formulation (`iou3d_nms_utils._greedy_suppress`) runs a
``lax.fori_loop`` of K sequential steps, each a tiny masked-update program —
K launches' worth of loop overhead on the hot decode path.  This kernel runs
the whole greedy sweep INSIDE one Pallas program: the (K, K) IoU matrix sits
in VMEM (K <= 1024 -> <= 4 MB), the keep mask lives in VMEM, and the
sequential dependency is a fori_loop over VMEM rows with predicated
vector updates — one kernel launch, no per-iteration dispatch.

Falls back to interpret mode off-TPU (tests run it on CPU bit-exactly).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _nms_kernel(iou_ref, valid_ref, thresh_ref, keep_ref):
    K = iou_ref.shape[0]
    keep_ref[0, :] = valid_ref[0, :]
    thresh = thresh_ref[0, 0]
    col = jax.lax.broadcasted_iota(jnp.int32, (1, K), 1)

    def body(i, _):
        keep_vec = keep_ref[0, :]
        # lane-dim scalar reads must be 128-aligned on TPU; a masked reduce
        # extracts keep[i] as a vector op instead
        keep_i = jnp.sum(jnp.where(col[0] == i, keep_vec, 0))
        row = iou_ref[pl.ds(i, 1), :]                          # (1, K)
        suppress = (row[0] > thresh) & (col[0] > i) & (keep_i > 0)
        keep_ref[0, :] = jnp.where(suppress, 0, keep_vec)
        return 0

    jax.lax.fori_loop(0, K, body, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def greedy_suppress_pallas(iou, valid, thresh, interpret=False):
    """iou: (K, K) f32 (rows score-ordered); valid: (K,) bool -> keep (K,) bool."""
    K = iou.shape[0]
    keep = pl.pallas_call(
        _nms_kernel,
        out_shape=jax.ShapeDtypeStruct((1, K), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(iou.astype(jnp.float32),
      valid.astype(jnp.int32).reshape(1, K),
      jnp.asarray(thresh, jnp.float32).reshape(1, 1))
    return keep[0] > 0


def greedy_suppress(iou, valid, thresh):
    """Dispatch: Pallas on TPU, interpret-mode elsewhere; XLA fori_loop if
    Pallas raises.  K is padded up to a lane-aligned multiple of 128 first —
    Mosaic rejects unaligned lane dims, and the silent XLA fallback costs
    K sequential loop dispatches (~250 ms at K=500 on v5e)."""
    K = iou.shape[0]
    Kp = -(-K // 128) * 128
    if Kp != K:
        pad = Kp - K
        iou = jnp.pad(iou, ((0, pad), (0, pad)))
        valid = jnp.pad(valid, (0, pad))
    try:
        on_tpu = jax.default_backend() == "tpu"
        keep = greedy_suppress_pallas(iou, valid, float(thresh),
                                      interpret=not on_tpu)
    except Exception:
        from .iou3d_nms_utils import _greedy_suppress_xla
        keep = _greedy_suppress_xla(iou, valid, float(thresh))
    return keep[:K]
