"""Quantization sensitivity analysis: per-layer activation diffing, bit-width
sweeps, alpha sweeps.

Parity with the reference's research tooling:
  * per-layer L1 loss between FP and quantized activations
    (``quant/collect_act_conv3d.py:307-357``,
    ``quant/count_time_n_memory.py:1224-1289``) — re-expressed via flax
    ``capture_intermediates`` instead of forward hooks;
  * accuracy-vs-bits sweeps over {16, 8, 4, 3, 2} for weights/activations
    (``count_time_n_memory.py:1319-1346``), incl. the fork's progressive
    strategy of keeping activations at 16 bit;
  * SmoothQuant alpha sweep 0.1..0.95 (``count_time_n_memory.py:1291``);
  * top-k activation/weight magnitude dumps (``collect_act_conv3d.py:190``).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from .rules import QuantRules, LayerRule, quant_rules_scope
from .tensor_quant import QuantSpec


def _flatten_intermediates(tree, prefix=()):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten_intermediates(v, prefix + (k,)))
        return out
    # leaf: tuple of captured outputs
    val = tree[0] if isinstance(tree, (tuple, list)) and tree else tree
    arrs = [x for x in jax.tree_util.tree_leaves(val)
            if hasattr(x, "ndim") and x.ndim >= 1]
    if arrs:
        out[".".join(prefix[:-1] if prefix and prefix[-1] == "__call__"
                     else prefix)] = arrs[0]
    return out


def capture_layer_outputs(model, variables, batch, rules=None,
                          filter_fn=None):
    """Run a forward pass capturing every module's output activations."""
    with quant_rules_scope(rules):
        _, state = model.apply(
            variables, batch, train=False,
            capture_intermediates=filter_fn or True, mutable=["intermediates"])
    return _flatten_intermediates(state["intermediates"])


def layer_l1_diff(model, variables, batch, rules, top=30):
    """Per-layer mean-L1 between FP and quantized activations, sorted worst
    first (the reference's get_l1_loss report)."""
    fp = capture_layer_outputs(model, variables, batch, rules=None)
    q = capture_layer_outputs(model, variables, batch, rules=rules)
    rows = []
    for name, a in fp.items():
        b = q.get(name)
        if b is None or a.shape != b.shape or not jnp.issubdtype(
                a.dtype, jnp.floating):
            continue
        l1 = float(jnp.abs(a.astype(jnp.float32)
                           - b.astype(jnp.float32)).mean())
        ref = float(jnp.abs(a.astype(jnp.float32)).mean()) + 1e-12
        rows.append((name, l1, l1 / ref))
    rows.sort(key=lambda r: -r[2])
    return rows[:top]


def with_bits(rules: QuantRules, w_bits=None, act_bits=None) -> QuantRules:
    """Clone a rule set at different bit widths (sweep helper)."""
    new_rules = []
    for r in rules.rules:
        w = dataclasses.replace(r.weight, num_bits=w_bits) \
            if (r.weight and w_bits) else r.weight
        a = dataclasses.replace(r.act, num_bits=act_bits) \
            if (r.act and act_bits) else r.act
        new_rules.append(dataclasses.replace(r, weight=w, act=a))
    return dataclasses.replace(rules, rules=tuple(new_rules))


def with_alpha(rules: QuantRules, alpha) -> QuantRules:
    new_rules = []
    for r in rules.rules:
        sq = dataclasses.replace(r.smoothquant, alpha=alpha) \
            if r.smoothquant else None
        new_rules.append(dataclasses.replace(r, smoothquant=sq))
    return dataclasses.replace(rules, rules=tuple(new_rules))


def bit_sweep(eval_fn, base_rules, weight_bits=(16, 8, 4, 3, 2),
              act_bits=(16, 8), logger=None):
    """Accuracy grid over (w_bits, act_bits).  ``eval_fn(rules) -> metric
    dict``.  Mirrors evaluate_with_bits / the progressive 16-bit-activation
    exploration."""
    results = {}
    for ab in act_bits:
        for wb in weight_bits:
            rules = with_bits(base_rules, w_bits=wb, act_bits=ab)
            metrics = eval_fn(rules)
            results[(wb, ab)] = metrics
            if logger:
                logger.info(f"W{wb}A{ab}: {metrics}")
    return results


def alpha_sweep(eval_fn, base_rules, alphas=tuple(np.arange(0.1, 1.0, 0.05)),
                logger=None):
    results = {}
    for a in alphas:
        metrics = eval_fn(with_alpha(base_rules, float(a)))
        results[round(float(a), 3)] = metrics
        if logger:
            logger.info(f"alpha={a:.2f}: {metrics}")
    return results


def top_magnitudes(variables, k=5):
    """Largest |weight| entries per parameter (collect_act_conv3d.py:190)."""
    flat = {}

    def walk(tree, prefix=()):
        for name, v in tree.items():
            if isinstance(v, dict):
                walk(v, prefix + (name,))
            elif hasattr(v, "ndim"):
                vals = np.sort(np.abs(np.asarray(v)).ravel())[::-1][:k]
                flat[".".join(prefix + (name,))] = vals
    walk(variables.get("params", {}))
    return flat
