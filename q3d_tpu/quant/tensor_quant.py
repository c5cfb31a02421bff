"""Fake/true quantization primitives + calibrators.

TPU-native re-implementation of the capability surface of NVIDIA's
``pytorch_quantization`` toolkit as used by the reference fork
(``quant/quantize.py:120-207``, ``quant/quant.py:6-58``): ``TensorQuantizer``
with per-tensor / per-axis amax, Max and Histogram calibrators, and
``load_calib_amax(method=...)`` with 'max' / 'entropy' (TensorRT KL) /
'percentile' / 'mse' amax selection.

Design: a ``TensorQuantizer`` is a flax module whose state lives in two extra
variable collections —
  * ``quant``: the committed ``amax`` used for (de)quantization;
  * ``calib``: streaming calibration state (running absmax + dynamic-range
    2048-bin histogram, grown by integer rebinning like pytorch_quantization's
    HistogramCalibrator).
Calibration mode is engaged simply by running ``model.apply(...,
mutable=['calib'])``; amax resolution (KL/percentile/mse) is a host-side pass
over the small histograms (``compute_amax_from_hist``).  Fake-quant uses a
straight-through estimator so the same code path serves QAT.
"""

import dataclasses
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

NUM_HIST_BINS = 2048


@dataclasses.dataclass(frozen=True)
class QuantSpec:
    """Static description of one quantizer (hashable -> jit-cache friendly).

    axis: None = per-tensor; int = per-channel along that input axis.
    dynamic: compute amax from each batch on the fly (reference QConvNd's
        non-calibrated mode / SmoothQuant dynamic path).
    calibrator: 'max' or 'histogram' (drives what `calib` state is kept).
    """
    num_bits: int = 8
    axis: Optional[int] = None
    unsigned: bool = False
    narrow_range: bool = False
    dynamic: bool = True
    calibrator: str = "max"
    enabled: bool = True
    # group quantization (reference quant/quant_conv3d.py GQConv3d:70-138):
    # rows are split into groups of `group_size` and each group gets its own
    # dynamic amax.  Only meaningful for dynamic per-row-group activation
    # quantization of (N, C) sparse features.
    group_size: Optional[int] = None

    @property
    def bound(self):
        if self.unsigned:
            return 2.0 ** self.num_bits - 1.0
        return 2.0 ** (self.num_bits - 1) - 1.0


def _reduce_amax(x, axis):
    """abs-max over all dims except ``axis`` (None -> scalar amax)."""
    if axis is None:
        return jnp.max(jnp.abs(x))
    red = tuple(d for d in range(x.ndim) if d != axis % x.ndim)
    return jnp.max(jnp.abs(x), axis=red)


def _broadcast_amax(amax, x, axis):
    if axis is None:
        return amax
    shape = [1] * x.ndim
    shape[axis % x.ndim] = -1
    return amax.reshape(shape)


def fake_quant(x, amax, num_bits=8, unsigned=False, narrow_range=False, axis=None):
    """Quantize-dequantize with straight-through gradient.

    Matches pytorch_quantization's ``fake_tensor_quant``: symmetric range,
    scale = bound / amax, round-to-nearest-even, clamp to [-bound, bound].
    """
    bound = (2.0 ** num_bits - 1.0) if unsigned else (2.0 ** (num_bits - 1) - 1.0)
    min_bound = (1.0 - bound) if (not unsigned and narrow_range) else (-bound if not unsigned else 0.0)
    amax_b = _broadcast_amax(amax, x, axis)
    amax_b = jnp.maximum(amax_b, 1e-12)
    scale = bound / amax_b
    q = jnp.clip(jnp.round(x * scale), min_bound, bound)
    deq = q / scale
    # straight-through estimator
    return x + jax.lax.stop_gradient(deq - x)


def quantize_to_int(x, amax, num_bits=8, axis=None):
    """True integer quantization: returns (int8 values, float scale)."""
    bound = 2.0 ** (num_bits - 1) - 1.0
    amax_b = _broadcast_amax(amax, x, axis)
    scale = jnp.maximum(amax_b, 1e-12) / bound
    q = jnp.clip(jnp.round(x / scale), -bound, bound).astype(jnp.int8)
    return q, scale


class TensorQuantizer(nn.Module):
    """Flax quantizer module; see module docstring for the state layout.

    mode='fake': returns the quantize-dequantized tensor (STE gradient).
    mode='int':  returns (int8 values, float scale broadcastable over x) —
                 the deployment path feeding true int8 MXU GEMMs.
    """

    spec: QuantSpec
    mode: str = "fake"

    @nn.compact
    def __call__(self, x):
        spec = self.spec
        if not spec.enabled:
            return x

        collecting = self.is_mutable_collection("calib")
        if spec.group_size and spec.dynamic and not collecting:
            g = spec.group_size
            n = x.shape[0]
            pad = (-n) % g
            xp = jnp.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1))
            grouped = xp.reshape((n + pad) // g, -1)
            amax = jax.lax.stop_gradient(
                jnp.max(jnp.abs(grouped), axis=1, keepdims=True))
            q = fake_quant(grouped, jnp.maximum(amax, 1e-12), spec.num_bits,
                           spec.unsigned, spec.narrow_range, axis=0)
            return q.reshape(xp.shape)[:n]
        if spec.dynamic and not collecting:
            amax = jax.lax.stop_gradient(_reduce_amax(x, spec.axis))
            return self._emit(x, amax)

        amax_shape = () if spec.axis is None else (x.shape[spec.axis % x.ndim],)
        amax_var = self.variable("quant", "amax",
                                 lambda: jnp.zeros(amax_shape, jnp.float32))

        if collecting:
            batch_amax = jax.lax.stop_gradient(_reduce_amax(x, spec.axis))
            absmax_var = self.variable("calib", "absmax",
                                       lambda: jnp.zeros(amax_shape, jnp.float32))
            absmax_var.value = jnp.maximum(absmax_var.value, batch_amax)
            if spec.calibrator == "histogram":
                assert spec.axis is None, "histogram calibration is per-tensor"
                hist_var = self.variable(
                    "calib", "hist", lambda: jnp.zeros(NUM_HIST_BINS, jnp.float32))
                width_var = self.variable(
                    "calib", "bin_width", lambda: jnp.zeros((), jnp.float32))
                new_hist, new_width = _update_histogram(
                    jnp.abs(x).reshape(-1), hist_var.value, width_var.value)
                hist_var.value = new_hist
                width_var.value = new_width
            if self.mode == "int":
                return self._emit(x, jnp.maximum(batch_amax, 1e-12))
            return x  # pass-through while calibrating (quant disabled)

        amax = jnp.maximum(amax_var.value, 1e-12)
        if self.mode == "int":
            return self._emit(x, amax)
        # amax == 0 (never calibrated) -> pass-through, mirroring
        # pytorch_quantization's warning-and-skip behavior
        safe = jnp.all(amax_var.value > 0)
        return jnp.where(safe, self._emit(x, amax), x)

    def _emit(self, x, amax):
        spec = self.spec
        if self.mode == "int":
            return quantize_to_int(x, amax, spec.num_bits, spec.axis)
        return fake_quant(x, amax, spec.num_bits, spec.unsigned,
                          spec.narrow_range, spec.axis)


def _update_histogram(abs_vals, hist, bin_width):
    """Streaming absmax histogram with integer range growth.

    Mirrors pytorch_quantization HistogramCalibrator.collect: if a new batch
    exceeds the current range, the bin width is multiplied by the smallest
    integer factor that fits, and old counts are re-binned (index //= factor).
    """
    batch_max = jnp.max(abs_vals)
    cur_range = bin_width * NUM_HIST_BINS
    need_width = jnp.maximum(batch_max / NUM_HIST_BINS, 1e-12)
    first = bin_width == 0
    factor = jnp.where(
        (batch_max > cur_range) & ~first,
        jnp.ceil(batch_max / jnp.maximum(cur_range, 1e-30)), 1.0)
    new_width = jnp.where(first, need_width, bin_width * factor)

    # re-bin old histogram: new_idx = floor(old_idx / factor)
    old_idx = jnp.arange(NUM_HIST_BINS)
    new_idx = jnp.clip((old_idx / factor).astype(jnp.int32), 0, NUM_HIST_BINS - 1)
    rebinned = jnp.zeros_like(hist).at[new_idx].add(hist)

    idx = jnp.clip((abs_vals / new_width).astype(jnp.int32), 0, NUM_HIST_BINS - 1)
    return rebinned.at[idx].add(1.0), new_width


# --------------------------------------------------------------------------
# host-side amax resolution from calibration state
# (equivalent of pytorch_quantization load_calib_amax(method=...))
# --------------------------------------------------------------------------

def compute_amax_from_hist(hist, bin_width, method="entropy", *, num_bits=8,
                           percentile=99.99, start_bin=128, stride=1):
    """Resolve amax from a 2048-bin absmax histogram. Host-side numpy.

    method='entropy' runs the TensorRT KL-divergence calibration sweep;
    'percentile' returns the given percentile of |x|; 'mse' minimizes the
    quantization MSE approximated on bin centers; 'max' returns the range top.
    """
    hist = np.asarray(hist, np.float64)
    bin_width = float(bin_width)
    nbins = len(hist)
    centers = (np.arange(nbins) + 0.5) * bin_width
    if method == "max":
        nz = np.nonzero(hist)[0]
        return float((nz[-1] + 1) * bin_width) if len(nz) else 0.0
    if method == "percentile":
        total = hist.sum()
        if total == 0:
            return 0.0
        cdf = np.cumsum(hist) / total
        idx = np.searchsorted(cdf, percentile / 100.0)
        return float((min(idx, nbins - 1) + 1) * bin_width)
    if method == "mse":
        bound = 2.0 ** (num_bits - 1) - 1.0
        best_amax, best_mse = centers[-1], np.inf
        for i in range(start_bin, nbins, max(stride, 8)):
            amax = (i + 0.5) * bin_width
            scale = bound / amax
            q = np.clip(np.round(centers * scale), -bound, bound) / scale
            mse = float((hist * (centers - q) ** 2).sum())
            if mse < best_mse:
                best_mse, best_amax = mse, amax
        return float(best_amax)
    if method == "entropy":
        return _entropy_amax(hist, bin_width, num_bits=num_bits,
                             start_bin=start_bin, stride=stride)
    raise ValueError(f"unknown amax method {method}")


def _entropy_amax(hist, bin_width, num_bits=8, start_bin=128, stride=1):
    """TensorRT-style KL calibration (as in pytorch_quantization's
    HistogramCalibrator._compute_amax_entropy)."""
    from scipy.stats import entropy

    nbins = len(hist)
    levels = 1 << (num_bits - 1)  # 128 target levels for signed int8
    starting = max(start_bin, levels)
    best_div, best_i = np.inf, nbins
    bins = hist.astype(np.float64).copy()
    bins[0] = bins[1] if nbins > 1 else bins[0]  # zero-bin smoothing

    for i in range(starting, nbins + 1, stride):
        ref = bins[:i].copy()
        ref[i - 1] += bins[i:].sum()          # clamp outliers into last bin
        if ref.sum() == 0:
            continue
        # quantize the i-bin distribution down to `levels` bins and expand
        space = np.linspace(0, i, num=levels + 1, dtype=np.int64)
        q = np.zeros(levels)
        for j in range(levels):
            q[j] = bins[space[j]:space[j + 1]].sum()
        expanded = np.zeros(i)
        for j in range(levels):
            lo, hi = space[j], space[j + 1]
            nnz = np.count_nonzero(bins[lo:hi])
            if nnz:
                expanded[lo:hi] = np.where(bins[lo:hi] != 0, q[j] / nnz, 0)
        p = ref / ref.sum()
        total = expanded.sum()
        if total == 0:
            continue
        qn = expanded / total
        div = entropy(p, np.where(qn == 0, 1e-12, qn))
        if div <= best_div:
            best_div, best_i = div, i
    return float(best_i * bin_width)


def resolve_amax(calib_tree, quant_tree, method="entropy", **kwargs):
    """Fold calibration state into committed amax values.

    Walks matched 'calib'/'quant' variable trees: histogram quantizers get
    ``compute_amax_from_hist(method)``; max-only quantizers (incl. SmoothQuant
    per-column ``sq_act_absmax``) take the running absmax.  Returns a new
    'quant' tree (host computation, one-shot).
    """
    flat_calib = _flatten(calib_tree)
    new_quant = jax.tree_util.tree_map(lambda x: x, quant_tree)  # copy

    for path, leaves in flat_calib.items():
        for name, value in leaves.items():
            if name in ("hist", "bin_width"):
                continue
            target = name.replace("absmax", "amax")
            if name == "absmax" and "hist" in leaves:
                amax = compute_amax_from_hist(
                    leaves["hist"], leaves["bin_width"], method=method, **kwargs)
                amax_arr = np.asarray(amax, np.float32)
            else:
                amax_arr = np.asarray(value, np.float32)
            old = _get_leaf(new_quant, path, target)
            _set_leaf(new_quant, path, target,
                      jnp.asarray(amax_arr, jnp.float32).reshape(np.shape(old)))
    return new_quant


def _flatten(tree, prefix=()):
    """dict-of-dicts -> {module_path: {leaf_name: array}} leaf grouping."""
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out.setdefault(prefix, {})[k] = v
    return out


def _get_leaf(tree, path, name):
    node = tree
    for k in path:
        node = node[k]
    return node[name]


def _set_leaf(tree, path, name, value):
    node = tree
    for k in path:
        node = node[k]
    node[name] = value
