"""Path-matched quantization rules — the module-swap API, re-architected.

The reference quantizes by *mutating* the torch module tree
(``quant/quantize.py:13-43``: recursive ``_modules[name] =`` surgery swapping
spconv/Conv2d layers for QConvNd/SQConv2d wrappers, honoring a ``no_list`` of
dotted paths like ``dense_head.heads_list.0.hm.2``).  Functional JAX modules
can't be mutated, so the same capability is expressed as a static *rule set*:
every quantizable layer in ``q3d_tpu.models.layers`` asks the active rule set
"am I quantized, and how?" using its own dotted module path.  Rebuilding a
model under a rule set yields the quantized model; the FP parameters are
reused unchanged (quantizer state lives in separate variable collections).

Rules are hashable/static, so jit treats each quantization configuration as
its own compiled program — the TPU equivalent of swapping modules.
"""

import dataclasses
import fnmatch
import threading
from typing import Optional, Tuple

from .tensor_quant import QuantSpec


@dataclasses.dataclass(frozen=True)
class SmoothQuantCfg:
    """SmoothQuant activation->weight scale migration (reference
    ``quant/smoothquant.py:75``: s = act_amax^alpha / w_amax^(1-alpha),
    computed per im2col column)."""
    alpha: float = 0.5
    # dynamic: recompute act_amax per batch inside the conv (reference's
    # SQConv2d behavior); static: use calibrated act amax folded offline.
    dynamic: bool = True


@dataclasses.dataclass(frozen=True)
class LayerRule:
    """What to do to one layer class / path pattern."""
    layer_kinds: Tuple[str, ...]          # e.g. ('conv2d',), ('subm_conv3d','sparse_conv3d')
    weight: Optional[QuantSpec] = QuantSpec(num_bits=8, axis=0, dynamic=True)
    act: Optional[QuantSpec] = QuantSpec(num_bits=8, axis=None, dynamic=True)
    smoothquant: Optional[SmoothQuantCfg] = None
    pattern: str = "*"                     # fnmatch over the dotted path
    # True -> execute as REAL int8 MXU GEMMs (x_q @ w_q -> int32 -> rescale)
    # instead of fake-quant; requires per-tensor act scales.  This is the
    # deployment path that realizes the reference's claimed 35% speedup.
    deploy_int8: bool = False
    # True -> features STAY int8 between consecutive quantized sparse convs
    # (``SparseConvTensor.feat_scale`` carries the per-tensor scale): each
    # conv-BN-ReLU block folds BN (eval running stats) + ReLU + requantization
    # into the GEMM epilogue and emits int8 directly, so window construction
    # and rulebook gathers move 1-byte rows and no fp32 intermediate is ever
    # materialized.  Requires deploy_int8 + STATIC (calibrated) act scales.
    int8_residency: bool = False


@dataclasses.dataclass(frozen=True)
class QuantRules:
    """A full quantization configuration: ordered rules + exclusion list."""
    rules: Tuple[LayerRule, ...] = ()
    no_list: Tuple[str, ...] = ()

    def lookup(self, path: str, kind: str) -> Optional[LayerRule]:
        """First matching rule for (dotted path, layer kind); None = keep FP."""
        for pattern in self.no_list:
            if path == pattern or fnmatch.fnmatch(path, pattern):
                return None
        for rule in self.rules:
            if kind in rule.layer_kinds and fnmatch.fnmatch(path, rule.pattern):
                return rule
        return None


_ctx = threading.local()


def set_active_rules(rules: Optional[QuantRules]):
    _ctx.rules = rules


def get_active_rules() -> Optional[QuantRules]:
    return getattr(_ctx, "rules", None)


class quant_rules_scope:
    """``with quant_rules_scope(rules): model.apply(...)`` — layers see them."""

    def __init__(self, rules: Optional[QuantRules]):
        self.rules = rules

    def __enter__(self):
        self.prev = get_active_rules()
        set_active_rules(self.rules)
        return self.rules

    def __exit__(self, *exc):
        set_active_rules(self.prev)
        return False
