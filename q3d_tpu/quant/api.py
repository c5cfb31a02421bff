"""High-level PTQ workflow — the TPU equivalent of the reference's quant
drivers (``quant/quant_centerpoint.py:74-131``, ``quant/quantize.py``).

Workflow (functional re-design of the module-swap + calibrate + eval flow):

    rules = centerpoint_recipe(w_bits=8, act_bits=8, sq=True, alpha=0.5)
    qmodel, qvars = quantize_model(model, variables, rules, example_batch)
    # dynamic PTQ: done — evaluate qmodel/qvars under quant_rules_scope(rules)
    # static PTQ:
    qvars = collect_stats(qmodel, qvars, rules, data_iter, num_batches=200)
    qvars = compute_amax(qvars, method='entropy')

``quantize_model`` rebuilds the variable tree with quantizer slots while
reusing every FP parameter unchanged — the functional analogue of swapping
``QConvNd``/``SQConv2d`` modules into a trained torch model.
"""

import jax
import numpy as np

from .rules import QuantRules, LayerRule, SmoothQuantCfg, quant_rules_scope
from .tensor_quant import QuantSpec, resolve_amax


# --------------------------------------------------------------------------
# recipes (parity with the reference drivers' quant() configurations)
# --------------------------------------------------------------------------

def centerpoint_recipe(w_bits=8, act_bits=8, sq=True, alpha=0.5, static=False,
                       extra_no_list=()):
    """quant_centerpoint.py:74-131 semantics:
    - sparse 3D convs -> per-out-channel weights + per-IN-channel acts when
      sq ('cw' flag), skipping the first conv (backbone_3d.conv_input);
    - Conv2d -> SmoothQuant(alpha) (or plain fake-quant when sq=False),
      skipping every detection-head output conv and the hm branches."""
    dynamic = not static
    calib = "histogram" if static else "max"
    sparse_rule = LayerRule(
        layer_kinds=("subm_conv3d", "sparse_conv3d"),
        weight=QuantSpec(w_bits, axis=0, dynamic=True),
        act=QuantSpec(act_bits, axis=1 if sq else None, dynamic=dynamic,
                      calibrator="max" if sq else calib),
    )
    conv2d_rule = LayerRule(
        layer_kinds=("conv2d",),
        weight=QuantSpec(w_bits, axis=0, dynamic=True),
        act=QuantSpec(act_bits, axis=None, dynamic=dynamic, calibrator=calib),
        smoothquant=SmoothQuantCfg(alpha=alpha, dynamic=dynamic) if sq else None,
    )
    no_list = (
        "backbone_3d.conv_input*",
        "dense_head.heads_list_*.*_out",   # every branch's output conv
        "dense_head.heads_list_*.hm_*",    # full-precision heatmap branch
    ) + tuple(extra_no_list)
    return QuantRules(rules=(sparse_rule, conv2d_rule), no_list=no_list)


def second_recipe(w_bits=8, act_bits=8, sq=True, alpha=0.5, static=False):
    """quant_second.py semantics: same backbone treatment; no_list = the
    RPN head's output convs (here AnchorHeadSingle's conv_cls/conv_box/
    conv_dir_cls)."""
    base = centerpoint_recipe(w_bits, act_bits, sq, alpha, static)
    no_list = (
        "backbone_3d.conv_input*",
        "dense_head.conv_cls", "dense_head.conv_box", "dense_head.conv_dir_cls",
    )
    return QuantRules(rules=base.rules, no_list=no_list)


def int8_deploy_recipe(sq=False, alpha=0.5, static=False, extra_no_list=(),
                       residency=False, quantize_first_conv=False):
    """True-int8 execution for every backbone conv (sparse 3D + dense 2D):
    per-tensor dynamic act scales, per-out-channel weight scales, int8 MXU
    GEMMs with int32 accumulation.  Heads + first sparse conv stay FP,
    matching the reference's accuracy-preserving exclusions.

    residency=True (implies static): features stay int8 across the sparse
    backbone, with BN/ReLU/requant folded into conv epilogues — the fastest
    deployment configuration.  REQUIRES calibration first (quantize_model ->
    collect_stats -> compute_amax); uncalibrated static amax slots are zero
    and produce garbage."""
    static = static or residency
    dynamic = not static
    calib = "histogram" if static else "max"
    sparse_rule = LayerRule(
        layer_kinds=("subm_conv3d", "sparse_conv3d", "subm_conv2d",
                     "sparse_conv2d"),
        weight=QuantSpec(8, axis=0, dynamic=True),
        act=QuantSpec(8, axis=None, dynamic=dynamic, calibrator=calib),
        deploy_int8=True,
        int8_residency=residency,
    )
    conv2d_rule = LayerRule(
        layer_kinds=("conv2d",),
        weight=QuantSpec(8, axis=0, dynamic=True),
        act=QuantSpec(8, axis=None, dynamic=dynamic, calibrator=calib),
        smoothquant=SmoothQuantCfg(alpha=alpha, dynamic=True) if sq else None,
        deploy_int8=True,
        int8_residency=residency and not sq,
    )
    no_list = (
        "dense_head.heads_list_*.*_out",
        "dense_head.heads_list_*.hm_*",
        "dense_head.conv_cls", "dense_head.conv_box", "dense_head.conv_dir_cls",
    ) + tuple(extra_no_list)
    if not quantize_first_conv:
        # the reference's accuracy-preserving exclusion
        # (quant_centerpoint.py:24-26).  quantize_first_conv=True is our
        # measured extension: ~0.4 ms faster end-to-end on the bench model
        # and test_accuracy_regression pins the <=1% NDS bound with it on
        no_list = ("backbone_3d.conv_input*",) + no_list
    return QuantRules(rules=(sparse_rule, conv2d_rule), no_list=no_list)


def pointpillar_recipe(w_bits=8, act_bits=8, sq=True, alpha=0.5, static=False):
    base = centerpoint_recipe(w_bits, act_bits, sq, alpha, static)
    no_list = (
        "vfe*",
        "dense_head.conv_cls", "dense_head.conv_box", "dense_head.conv_dir_cls",
    )
    return QuantRules(rules=base.rules, no_list=no_list)


def voxelnext_recipe(w_bits=8, act_bits=8, sq=True, alpha=0.5, static=False):
    """quant_voxelnext.py semantics: 3D backbone QConv3d + sparse-2D convs
    through the SQSubM2d SmoothQuant path; per head the branch OUTPUT convs
    + hm convs stay FP while hidden branch convs quantize (reference
    no_list :29-72 — same shape as the CenterPoint list)."""
    dynamic = not static
    calib = "histogram" if static else "max"
    sparse3d = LayerRule(
        layer_kinds=("subm_conv3d", "sparse_conv3d"),
        weight=QuantSpec(w_bits, axis=0, dynamic=True),
        act=QuantSpec(act_bits, axis=1 if sq else None, dynamic=dynamic,
                      calibrator="max" if sq else calib),
    )
    sparse2d = LayerRule(
        layer_kinds=("subm_conv2d", "sparse_conv2d"),
        weight=QuantSpec(w_bits, axis=0, dynamic=True),
        act=QuantSpec(act_bits, axis=None, dynamic=dynamic, calibrator=calib),
        smoothquant=SmoothQuantCfg(alpha=alpha, dynamic=dynamic) if sq else None,
    )
    no_list = (
        "backbone_3d.conv_input*",
        # reference quant_voxelnext.py:29-72: per head, each branch's FINAL
        # conv (.1) + BOTH hm convs stay FP; hidden branch convs quantize
        "dense_head.heads_list_*.*_out",
        "dense_head.heads_list_*.hm_*",
    )
    return QuantRules(rules=(sparse3d, sparse2d), no_list=no_list)


def transfusion_recipe(w_bits=8, act_bits=8, sq=True, alpha=0.5, static=False):
    """quant_transfusion.py semantics: backbone QConv3d + SmoothQuant over
    Conv2d / Conv1d / Linear (the transformer decoder), excluding attention
    out-projections and prediction-head output convs (no_list :29-38)."""
    base = centerpoint_recipe(w_bits, act_bits, sq, alpha, static)
    dynamic = not static
    calib = "histogram" if static else "max"
    linear_rule = LayerRule(
        layer_kinds=("linear", "conv1d"),
        weight=QuantSpec(w_bits, axis=0, dynamic=True),
        act=QuantSpec(act_bits, axis=None, dynamic=dynamic, calibrator=calib),
        smoothquant=SmoothQuantCfg(alpha=alpha, dynamic=dynamic) if sq else None,
        pattern="dense_head.decoder*",
    )
    no_list = (
        "backbone_3d.conv_input*",
        "dense_head.decoder.self_attn.out_proj",
        "dense_head.decoder.multihead_attn.out_proj",
        "dense_head.prediction_head.*_out",
        "dense_head.heatmap_head_out",
    )
    return QuantRules(rules=base.rules + (linear_rule,), no_list=no_list)


# --------------------------------------------------------------------------
# workflow steps
# --------------------------------------------------------------------------

def quantize_model(model, fp_variables, rules, example_batch):
    """Attach quantizer variable slots, reusing the FP params/batch_stats.

    Returns a new variables dict containing 'params', 'batch_stats' (copied
    from fp_variables) plus fresh 'quant' (amax) slots.
    """
    with quant_rules_scope(rules):
        new_vars = model.init(jax.random.PRNGKey(0), example_batch, train=False)
    out = dict(new_vars)
    for coll in ("params", "batch_stats"):
        if coll in fp_variables:
            out[coll] = fp_variables[coll]
    return out


def collect_stats(model, variables, rules, data_iter, num_batches=200,
                  loader_to_device=None, verbose=False, num_shards=None,
                  dist_merge=False):
    """Stream calibration batches with the 'calib' collection mutable
    (reference quantize.py:175-195 enable-calib/disable-quant pass).

    The reference calibrates on ONE rank; the TPU-native extension (SURVEY
    §2.6 last row) shards the calibration stream across data-parallel
    workers and max-reduces the statistics:

    - ``num_shards=k``: round-robin the stream over k independent
      accumulator states (the single-host model of k data-parallel ranks
      each seeing every k-th batch) and merge them host-side via
      ``merge_calib_trees`` — elementwise max for absmax leaves (exact:
      max is associative), integer-rebin + sum for histograms.
    - ``dist_merge=True``: multi-process mode — this process streams its
      LOCAL ``data_iter`` shard, then the per-process calib states are
      allgathered and merged so every process ends with identical
      statistics (the analogue of DDP's implicit every-rank-sees-all).
    """
    from ..models import load_data_to_device
    loader_to_device = loader_to_device or load_data_to_device
    variables = dict(variables)
    calib0 = variables.pop("calib", {})
    k = max(int(num_shards or 1), 1)
    # shard 0 inherits any pre-existing stats (e.g. the init pass's counts);
    # the rest start ZEROED so merged histogram mass equals the single-stream
    # total instead of duplicating the seed k times
    shards = [calib0] + [jax.tree_util.tree_map(np.zeros_like, calib0)
                         for _ in range(k - 1)]
    with quant_rules_scope(rules):
        @jax.jit
        def step(vars_nocalib, calib_state, batch):
            _, mut = model.apply({**vars_nocalib, "calib": calib_state},
                                 batch, train=False, mutable=["calib"])
            return mut["calib"]

        for i, batch in enumerate(data_iter):
            if i >= num_batches:
                break
            shards[i % k] = step(variables, shards[i % k],
                                 loader_to_device(batch))
            if verbose and i % 20 == 0:
                print(f"calib batch {i}")
    calib = merge_calib_trees(shards) if k > 1 \
        else jax.device_get(shards[0])
    if dist_merge:
        calib = merge_calib_dist(calib)
    variables["calib"] = calib
    return variables


def _rebin_hist(hist, width, target):
    """Rebin a histogram of bin width ``width`` onto ``target`` >= width,
    with the same integer index mapping ``_update_histogram`` uses in-stream
    (new_idx = floor(old_idx * width / target); exact match when target is
    an integer multiple of width, the only case the in-stream rule
    produces)."""
    hist = np.asarray(hist, np.float64)
    if width == 0 or width == target:
        return hist
    n = hist.shape[0]
    idx = np.clip((np.arange(n) * (width / target)).astype(np.int64), 0, n - 1)
    out = np.zeros_like(hist)
    np.add.at(out, idx, hist)
    return out


def merge_calib_trees(trees):
    """Host-side merge of per-shard 'calib' collections (SURVEY §2.6:
    pmax of per-channel amax across data-parallel shards).

    Every calib leaf is a running MAX (``absmax``, ``sq_act_absmax``)
    except the histogram pair (``hist`` counts + scalar ``bin_width``),
    which merges by rebinning every shard to the widest shard's bin width
    and summing counts — total mass is preserved and the result is what a
    single stream would have produced up to the (already approximate)
    integer-rebin rule."""
    from collections.abc import Mapping
    trees = [jax.device_get(t) for t in trees]

    def merge(nodes):
        if isinstance(nodes[0], Mapping):
            out = {}
            keys = nodes[0].keys()
            if "hist" in keys and "bin_width" in keys:
                widths = [float(np.asarray(n["bin_width"])) for n in nodes]
                target = max(widths)
                merged = np.zeros_like(np.asarray(nodes[0]["hist"],
                                                  np.float64))
                for node, w in zip(nodes, widths):
                    merged = merged + _rebin_hist(node["hist"], w, target)
                out["hist"] = merged.astype(
                    np.asarray(nodes[0]["hist"]).dtype)
                out["bin_width"] = np.asarray(target,
                                              np.asarray(nodes[0]["bin_width"]).dtype)
            for kk in keys:
                if kk in ("hist", "bin_width") and kk in out:
                    continue
                out[kk] = merge([n[kk] for n in nodes])
            return out
        acc = np.asarray(nodes[0])
        for n in nodes[1:]:
            acc = np.maximum(acc, np.asarray(n))
        return acc

    return merge(trees)


def merge_calib_dist(calib):
    """Multi-process calib merge: allgather every process's calib tree
    (padded-uint8 pickle ride, same transport as
    ``parallel.commu_utils.merge_results_dist``) and ``merge_calib_trees``
    them, so all ranks commit identical amax.  No-op single-process."""
    if jax.process_count() == 1:
        return calib
    import pickle

    import jax.numpy as jnp
    from jax.experimental import multihost_utils

    blob = np.frombuffer(pickle.dumps(jax.device_get(calib)), np.uint8)
    assert blob.size < 2 ** 31
    sizes = np.asarray(multihost_utils.process_allgather(
        jnp.asarray([blob.size], jnp.int32))).ravel()
    pad = np.zeros(int(sizes.max()), np.uint8)
    pad[:blob.size] = blob
    gathered = np.asarray(multihost_utils.process_allgather(jnp.asarray(pad)))
    trees = [pickle.loads(gathered[i, :int(sizes[i])].tobytes())
             for i in range(gathered.shape[0])]
    return merge_calib_trees(trees)


def prepare_int8_deploy(model, variables, example_batches, residency=True,
                        method="max", recipe_kwargs=None):
    """One-call int8 deployment prep: rules + calibrated variables.

    example_batches: list of already-device-ready batch dicts (a single
    representative batch repeated twice is enough for max calibration).
    Returns (rules, deploy_variables) ready for
    ``quant_rules_scope(rules): model.apply(deploy_variables, ...)``.
    """
    rules = int8_deploy_recipe(residency=residency,
                               **(recipe_kwargs or {}))
    qvars = quantize_model(model, variables, rules, example_batches[0])
    qvars = collect_stats(model, qvars, rules, iter(example_batches),
                          num_batches=len(example_batches),
                          loader_to_device=lambda b: b)
    qvars = compute_amax(qvars, method=method)
    return rules, {k: v for k, v in qvars.items() if k != "calib"}


def compute_amax(variables, method="entropy", **kwargs):
    """Fold calibration state into committed amax (reference
    quantize.py:198-207 load_calib_amax)."""
    variables = dict(variables)
    if "calib" not in variables or "quant" not in variables:
        return variables
    variables["quant"] = resolve_amax(variables["calib"], variables["quant"],
                                      method=method, **kwargs)
    return variables
