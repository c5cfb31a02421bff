"""Quantization-layer unit tests: quantizer math, calibrators, rules, the
SmoothQuant migration, and fake-vs-true-int8 equivalence."""

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from q3d_tpu.quant.tensor_quant import (
    QuantSpec, TensorQuantizer, fake_quant, quantize_to_int,
    compute_amax_from_hist, _update_histogram, NUM_HIST_BINS)
from q3d_tpu.quant.rules import QuantRules, LayerRule, SmoothQuantCfg, \
    quant_rules_scope
from q3d_tpu.models.layers import Conv2d


def test_fake_quant_levels():
    # int8 symmetric: 255 levels at scale amax/127
    x = jnp.asarray(np.linspace(-2, 2, 1001), jnp.float32)
    y = np.asarray(fake_quant(x, jnp.float32(1.0), 8))
    assert y.max() <= 1.0 + 1e-6
    assert y.min() >= -1.0 - 1e-6  # clamped to [-127, 127]/127 = [-1, 1]
    levels = np.unique(np.round(y * 127))
    assert len(levels) <= 255
    # values inside range quantize to nearest step
    np.testing.assert_allclose(y[500], 0.0, atol=1e-7)


def test_fake_quant_per_channel():
    x = jnp.asarray(np.stack([np.ones(8), 10 * np.ones(8)]), jnp.float32)  # (2,8)
    amax = jnp.asarray([1.0, 10.0])
    y = np.asarray(fake_quant(x, amax, 8, axis=0))
    np.testing.assert_allclose(y, np.asarray(x), rtol=1e-2)


def test_quantize_to_int_roundtrip():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(64, 32).astype(np.float32))
    amax = jnp.max(jnp.abs(x))
    q, scale = quantize_to_int(x, amax, 8)
    assert q.dtype == jnp.int8
    deq = np.asarray(q, np.float32) * np.asarray(scale)
    np.testing.assert_allclose(deq, np.asarray(x), atol=float(amax) / 127 + 1e-6)


def test_fake_equals_int_dequant():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(100).astype(np.float32))
    amax = jnp.max(jnp.abs(x))
    fq = np.asarray(fake_quant(x, amax, 8))
    q, s = quantize_to_int(x, amax, 8)
    np.testing.assert_allclose(fq, np.asarray(q, np.float32) * np.asarray(s),
                               atol=1e-6)


def test_histogram_grows_range():
    hist = jnp.zeros(NUM_HIST_BINS)
    width = jnp.zeros(())
    h1, w1 = _update_histogram(jnp.abs(jnp.asarray(np.random.RandomState(0)
                                                   .randn(1000))), hist, width)
    assert float(w1) > 0
    # second batch with 10x larger values forces integer rebinning
    h2, w2 = _update_histogram(jnp.abs(10 * jnp.asarray(
        np.random.RandomState(1).randn(1000))), h1, w1)
    assert float(w2) > float(w1)
    assert float(h2.sum()) == 2000


def test_entropy_amax_reasonable():
    # gaussian data: entropy amax should clip tails, i.e. < max, > std
    rng = np.random.RandomState(2)
    data = np.abs(rng.randn(200000)).astype(np.float32)
    hist = jnp.zeros(NUM_HIST_BINS)
    width = jnp.zeros(())
    hist, width = _update_histogram(jnp.asarray(data), hist, width)
    amax = compute_amax_from_hist(np.asarray(hist), float(width), "entropy",
                                  stride=16)
    assert 1.0 < amax <= data.max() + 2 * float(width)
    p99 = compute_amax_from_hist(np.asarray(hist), float(width), "percentile",
                                 percentile=99.0)
    assert abs(p99 - np.percentile(data, 99)) < 0.1
    mx = compute_amax_from_hist(np.asarray(hist), float(width), "max")
    assert abs(mx - data.max()) < float(width) * 2


def test_rules_no_list_and_kind_matching():
    rules = QuantRules(
        rules=(LayerRule(layer_kinds=("conv2d",)),),
        no_list=("dense_head.heads_list_*.hm_*", "backbone_3d.conv_input*"))
    assert rules.lookup("backbone_2d.blocks_0.conv0", "conv2d") is not None
    assert rules.lookup("backbone_2d.blocks_0.conv0", "linear") is None
    assert rules.lookup("dense_head.heads_list_3.hm_0", "conv2d") is None
    assert rules.lookup("backbone_3d.conv_input.conv", "conv2d") is None


def test_dynamic_quant_conv2d_close_to_fp():
    """W8A8 dynamic fake quant should stay within ~2% on smooth inputs."""
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.rand(1, 8, 8, 16).astype(np.float32))
    conv = Conv2d(32, 3, 1, 1, name="c")
    variables = conv.init(jax.random.PRNGKey(0), x)
    fp = conv.apply(variables, x)
    rules = QuantRules(rules=(LayerRule(layer_kinds=("conv2d",)),))
    with quant_rules_scope(rules):
        q = conv.apply(variables, x)
    rel = np.abs(np.asarray(q - fp)).mean() / np.abs(np.asarray(fp)).mean()
    assert rel < 0.02, rel


def test_smoothquant_conv2d_close_to_fp():
    rng = np.random.RandomState(4)
    # outlier channels: the SmoothQuant sweet spot
    x = rng.rand(1, 8, 8, 16).astype(np.float32)
    x[..., 0] *= 50
    x = jnp.asarray(x)
    conv = Conv2d(32, 3, 1, 1, name="c")
    variables = conv.init(jax.random.PRNGKey(0), x)
    fp = conv.apply(variables, x)

    plain = QuantRules(rules=(LayerRule(layer_kinds=("conv2d",)),))
    sq = QuantRules(rules=(LayerRule(layer_kinds=("conv2d",),
                                     smoothquant=SmoothQuantCfg(alpha=0.5)),))
    with quant_rules_scope(plain):
        q_plain = conv.apply(variables, x)
    with quant_rules_scope(sq):
        q_sq = conv.apply(variables, x)
    err_plain = np.abs(np.asarray(q_plain - fp)).mean()
    err_sq = np.abs(np.asarray(q_sq - fp)).mean()
    # with per-tensor act scales an outlier channel hurts; SQ must help
    assert err_sq <= err_plain * 1.05


def test_int8_deploy_matches_fake_quant():
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(1, 8, 8, 16).astype(np.float32))
    conv = Conv2d(24, 3, 1, 1, name="c")
    variables = conv.init(jax.random.PRNGKey(0), x)
    fake = QuantRules(rules=(LayerRule(layer_kinds=("conv2d",)),))
    deploy = QuantRules(rules=(LayerRule(layer_kinds=("conv2d",),
                                         deploy_int8=True),))
    y_fp = conv.apply(variables, x)
    with quant_rules_scope(fake):
        y_fake = conv.apply(variables, x)
    with quant_rules_scope(deploy):
        y_int = conv.apply(variables, x)
    # int8 deploy and fake-quant may differ by single-quantum rounding
    # tie-breaks; they must agree closely and carry the same error vs FP
    np.testing.assert_allclose(np.asarray(y_fake), np.asarray(y_int),
                               atol=0.05, rtol=0.05)
    err_fake = np.abs(np.asarray(y_fake - y_fp)).mean()
    err_int = np.abs(np.asarray(y_int - y_fp)).mean()
    assert err_int < max(err_fake * 1.5, 1e-3)


def test_static_calibration_flow():
    """collect_stats -> compute_amax -> quantized eval end-to-end on a conv."""
    from q3d_tpu.quant.api import collect_stats, compute_amax

    rng = np.random.RandomState(6)
    x = jnp.asarray(rng.rand(2, 8, 8, 4).astype(np.float32))
    rules = QuantRules(rules=(LayerRule(
        layer_kinds=("conv2d",),
        act=QuantSpec(8, axis=None, dynamic=False, calibrator="histogram")),))

    class M(nn.Module):
        @nn.compact
        def __call__(self, batch, train=False):
            return {"y": Conv2d(8, 3, 1, 1, name="c")(batch["x"])}

    m = M()
    with quant_rules_scope(rules):
        variables = m.init(jax.random.PRNGKey(0), {"x": x})
        assert "quant" in variables
        variables = collect_stats(m, variables, rules,
                                  [{"x": np.asarray(x)} for _ in range(5)],
                                  num_batches=5,
                                  loader_to_device=lambda b: {
                                      "x": jnp.asarray(b["x"])})
        variables = compute_amax(variables, method="percentile",
                                 percentile=99.9)
        amax_leaves = jax.tree_util.tree_leaves(variables["quant"])
        assert all(float(a.max()) > 0 for a in amax_leaves)
        y = m.apply({k: variables[k] for k in ("params", "quant")}, {"x": x})
        assert np.isfinite(np.asarray(y["y"])).all()


def test_group_quantization():
    """GQConv3d-style per-row-group dynamic quantization (reference
    quant/quant_conv3d.py:70-138)."""
    import flax.linen as nn
    from q3d_tpu.quant.tensor_quant import TensorQuantizer

    rng = np.random.RandomState(8)
    x = rng.randn(130, 16).astype(np.float32)
    x[64:128] *= 100.0  # second group has huge scale

    class M(nn.Module):
        @nn.compact
        def __call__(self, x):
            return TensorQuantizer(QuantSpec(8, group_size=64), name="q")(x)

    m = M()
    v = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    q = np.asarray(m.apply(v, jnp.asarray(x)))
    assert q.shape == x.shape
    # per-group scaling keeps the small-magnitude group precise even though
    # the other group is 100x larger (per-tensor would destroy it)
    rel0 = np.abs(q[:64] - x[:64]).mean() / np.abs(x[:64]).mean()
    assert rel0 < 0.01, rel0
    rel1 = np.abs(q[64:128] - x[64:128]).mean() / np.abs(x[64:128]).mean()
    assert rel1 < 0.01, rel1


def test_static_smoothquant_sparse_matches_dynamic_on_calib_data():
    """Static SQ on the sparse path: column amax collected during
    calibration equals dynamic per-batch amax on that same batch, so the
    calibrated static forward must reproduce the dynamic-SQ forward."""
    import dataclasses
    import jax
    import jax.numpy as jnp
    from q3d_tpu.ops.spconv import SparseConvTensor, SubMConv3d
    from q3d_tpu.quant.rules import (QuantRules, LayerRule, SmoothQuantCfg,
                                     quant_rules_scope)
    from q3d_tpu.quant.tensor_quant import QuantSpec, resolve_amax

    rng = np.random.RandomState(0)
    cap, cin, cout = 64, 8, 16
    idx = np.full((cap, 4), -1, np.int32)
    n = 40
    coords = rng.randint(0, 6, (n, 3))
    idx[:n] = np.concatenate([np.zeros((n, 1), int), coords], 1)
    feats = rng.randn(cap, cin).astype(np.float32) * np.linspace(
        0.1, 4.0, cin)  # per-channel spread makes SQ scales matter
    feats[n:] = 0
    st = SparseConvTensor(features=jnp.asarray(feats),
                          indices=jnp.asarray(idx),
                          spatial_shape=(6, 6, 6), batch_size=1)

    def rules_for(dynamic):
        rule = LayerRule(
            layer_kinds=("subm_conv3d",),
            weight=QuantSpec(8, axis=0, dynamic=True),
            act=QuantSpec(8, axis=1, dynamic=True),
            smoothquant=SmoothQuantCfg(alpha=0.5, dynamic=dynamic))
        return QuantRules(rules=(rule,))

    conv = SubMConv3d(cout, 3, 1, 1, name="conv")

    with quant_rules_scope(rules_for(True)):
        v_dyn = conv.init(jax.random.PRNGKey(0), st)
        out_dyn = conv.apply(v_dyn, st).features

    with quant_rules_scope(rules_for(False)):
        v_st = conv.init(jax.random.PRNGKey(0), st)
        # one calibration pass on the same batch
        _, upd = conv.apply(v_st, st, mutable=["calib"])
        v_st = {**v_st, "calib": upd["calib"]}
        new_quant = resolve_amax(v_st["calib"], v_st["quant"])
        v_st = {"params": v_st["params"], "quant": new_quant}
        out_st = conv.apply(v_st, st).features

    np.testing.assert_allclose(np.asarray(out_dyn), np.asarray(out_st),
                               rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------------------
# no_list parity (VERDICT r2 #10): enumerate every layer path each recipe
# resolves on the matching tiny model and assert the excluded set matches
# the reference drivers' no_list semantics.
# ---------------------------------------------------------------------------


class _RecordingRules:
    """Wraps QuantRules, recording every (path, kind) -> rule resolution the
    model's layers perform during a forward."""

    def __init__(self, inner):
        self.inner = inner
        self.calls = {}

    def lookup(self, path, kind):
        rule = self.inner.lookup(path, kind)
        self.calls[path] = (kind, rule)
        return rule

    def __getattr__(self, name):
        return getattr(self.inner, name)


def _enumerate_paths(cfg_name, recipe):
    import jax
    from pathlib import Path as _P
    from q3d_tpu.config import cfg_from_yaml_file, EDict
    from q3d_tpu.datasets import build_dataloader
    from q3d_tpu.models import build_network, load_data_to_device
    from q3d_tpu.quant.rules import quant_rules_scope

    root = _P(__file__).resolve().parent.parent
    cfg = cfg_from_yaml_file(
        str(root / "tools/cfgs/synthetic_models" / cfg_name), EDict())
    dataset, loader, _ = build_dataloader(cfg.DATA_CONFIG, cfg.CLASS_NAMES,
                                          batch_size=1, training=False)
    model = build_network(cfg.MODEL, num_class=len(cfg.CLASS_NAMES),
                          dataset=dataset)
    batch = load_data_to_device(next(iter(loader)))
    rec = _RecordingRules(recipe)
    with quant_rules_scope(rec):
        variables = jax.jit(
            lambda k, b: model.init(k, b, train=False))(jax.random.PRNGKey(0),
                                                        batch)
        model.apply(variables, batch, train=False)
    return rec.calls


def _split(calls):
    quantized = {p for p, (k, r) in calls.items() if r is not None}
    excluded = {p for p, (k, r) in calls.items() if r is None}
    return quantized, excluded


def test_no_list_parity_centerpoint():
    """Reference quant_centerpoint.py:24-71: first sparse conv + per-head
    branch OUTPUT convs + both hm convs excluded; hidden branch convs and
    all other backbone/BEV convs quantized."""
    from q3d_tpu.quant.api import centerpoint_recipe
    calls = _enumerate_paths("centerpoint_tiny.yaml", centerpoint_recipe())
    quantized, excluded = _split(calls)

    assert any(p.startswith("backbone_3d.conv_input") for p in excluded)
    assert not any(p.startswith("backbone_3d.conv_input")
                   for p in quantized)
    # per head: *_out excluded, hm_* excluded, hidden convs quantized
    outs = {p for p in calls if ".heads_list_" in p and p.endswith("_out")}
    assert outs and outs <= excluded
    hms = {p for p in calls if ".hm_" in p or p.endswith(".hm_0")}
    assert hms and hms <= excluded
    hidden = {p for p in calls if ".heads_list_" in p
              and not p.endswith("_out") and ".hm" not in p}
    assert hidden and hidden <= quantized
    # backbone + BEV pyramid quantized
    assert any(p.startswith("backbone_3d.conv2") for p in quantized)
    assert any(p.startswith("backbone_2d.") for p in quantized)


def test_no_list_parity_second():
    """Reference quant_second.py:30-67 excludes exactly the RPN output
    convs (here AnchorHeadSingle conv_cls/conv_box/conv_dir_cls)."""
    from q3d_tpu.quant.api import second_recipe
    calls = _enumerate_paths("second_iou_tiny.yaml", second_recipe())
    quantized, excluded = _split(calls)
    for out_conv in ("dense_head.conv_cls", "dense_head.conv_box"):
        assert out_conv in calls, sorted(calls)[:10]
        assert out_conv in excluded
    assert any(p.startswith("backbone_3d.conv_input") for p in excluded)
    assert any(p.startswith("backbone_2d.") for p in quantized)


def test_no_list_parity_voxelnext():
    """Reference quant_voxelnext.py:29-72 — SAME shape as the CenterPoint
    list: branch finals + hm excluded, hidden branch convs QUANTIZED."""
    from q3d_tpu.quant.api import voxelnext_recipe
    calls = _enumerate_paths("voxelnext_tiny.yaml", voxelnext_recipe())
    quantized, excluded = _split(calls)
    outs = {p for p in calls if ".heads_list_" in p and p.endswith("_out")}
    assert outs and outs <= excluded
    hms = {p for p in calls if ".hm_" in p}
    assert hms and hms <= excluded
    hidden = {p for p in calls if ".heads_list_" in p
              and not p.endswith("_out") and ".hm" not in p}
    assert hidden and hidden <= quantized, (hidden & excluded)
    assert any(p.startswith("backbone_3d.conv_input") for p in excluded)


def test_no_list_parity_pointpillar():
    """quant drivers keep the pillar VFE + RPN output convs FP."""
    from q3d_tpu.quant.api import pointpillar_recipe
    calls = _enumerate_paths("pointpillar_tiny.yaml", pointpillar_recipe())
    quantized, excluded = _split(calls)
    assert not any(p.startswith("vfe") for p in quantized)
    for out_conv in ("dense_head.conv_cls", "dense_head.conv_box"):
        if out_conv in calls:
            assert out_conv in excluded
    assert any(p.startswith("backbone_2d.") for p in quantized)


def test_no_list_parity_transfusion():
    """Reference quant_transfusion.py:29-38: attention out-projections +
    prediction-head output convs + heatmap final conv excluded; the decoder
    q/k/v linears and FFN quantized."""
    from q3d_tpu.quant.api import transfusion_recipe
    calls = _enumerate_paths("transfusion_tiny.yaml", transfusion_recipe())
    quantized, excluded = _split(calls)
    outp = {p for p in calls if "out_proj" in p}
    assert outp and outp <= excluded, outp & quantized
    finals = {p for p in calls
              if "prediction_head" in p and p.endswith("_out")}
    assert finals and finals <= excluded
    dec_lin = {p for p, (k, r) in calls.items()
               if p.startswith("dense_head.decoder") and "out_proj" not in p
               and k in ("linear", "conv1d")}
    assert dec_lin and dec_lin <= quantized, dec_lin & excluded
    assert any(p.startswith("backbone_3d.conv2") for p in quantized)


def test_sqconvt2d_matches_plain_transposed_conv():
    """SQConvT2d (reference smoothquant.py:179-270, dead code at reference
    call sites — implemented for parity): with quantizers disabled the
    per-input-channel alpha migration must cancel exactly (x/s @ w*s ==
    x @ w), proving the GEMM+fold form equals the transposed conv; with
    8-bit fake-quant on, outputs stay close to FP."""
    import jax
    import jax.numpy as jnp
    from q3d_tpu.models.layers import ConvTranspose2d
    from q3d_tpu.quant.rules import (LayerRule, QuantRules, SmoothQuantCfg,
                                     quant_rules_scope)
    from q3d_tpu.quant.tensor_quant import QuantSpec

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 6, 5, 8).astype(np.float32))
    m = ConvTranspose2d(4, 3, 2, 1)
    v = m.init(jax.random.PRNGKey(0), x)
    y_fp = m.apply(v, x)

    rules_nq = QuantRules(rules=(LayerRule(
        layer_kinds=("conv_transpose2d",), weight=None, act=None,
        smoothquant=SmoothQuantCfg(alpha=0.5, dynamic=True)),))
    with quant_rules_scope(rules_nq):
        y_sq = m.apply(v, x)
    np.testing.assert_allclose(np.asarray(y_sq), np.asarray(y_fp),
                               rtol=1e-4, atol=1e-5)

    rules_q = QuantRules(rules=(LayerRule(
        layer_kinds=("conv_transpose2d",),
        weight=QuantSpec(num_bits=8, axis=0, dynamic=True),
        act=QuantSpec(num_bits=8, axis=None, dynamic=True),
        smoothquant=SmoothQuantCfg(alpha=0.5, dynamic=True)),))
    with quant_rules_scope(rules_q):
        y_q, _ = m.apply(v, x, mutable=["quant"])
    err = np.abs(np.asarray(y_q) - np.asarray(y_fp)).max()
    ref = np.abs(np.asarray(y_fp)).max()
    assert err < 0.05 * ref, (err, ref)


def test_sharded_calibration_matches_single_device():
    """VERDICT r4 #3 / SURVEY §2.6 last row: calibration statistics sharded
    over data-parallel workers must merge to the single-stream result —
    exactly for max-reduced absmax (per-tensor AND per-channel), and to the
    same resolved amax for the histogram calibrator."""
    from q3d_tpu.quant.api import (collect_stats, compute_amax,
                                   merge_calib_trees)

    rng = np.random.RandomState(7)
    batches = [{"x": (rng.rand(2, 8, 8, 4) * (1 + i)).astype(np.float32)}
               for i in range(8)]
    rules = QuantRules(rules=(LayerRule(
        layer_kinds=("conv2d",),
        weight=QuantSpec(8, axis=0, dynamic=False, calibrator="max"),
        act=QuantSpec(8, axis=None, dynamic=False, calibrator="histogram")),))

    class M(nn.Module):
        @nn.compact
        def __call__(self, batch, train=False):
            return {"y": Conv2d(8, 3, 1, 1, name="c")(batch["x"])}

    m = M()
    with quant_rules_scope(rules):
        variables = m.init(jax.random.PRNGKey(0), batches[0])
        to_dev = lambda b: {"x": jnp.asarray(b["x"])}  # noqa: E731
        single = collect_stats(m, dict(variables), rules, batches,
                               num_batches=8, loader_to_device=to_dev)
        sharded = collect_stats(m, dict(variables), rules, batches,
                                num_batches=8, loader_to_device=to_dev,
                                num_shards=4)

    s_flat = jax.tree_util.tree_leaves_with_path(single["calib"])
    d_flat = dict(jax.tree_util.tree_leaves_with_path(sharded["calib"]))
    assert len(s_flat) == len(d_flat) >= 3      # absmax x2, hist, bin_width
    for path, leaf in s_flat:
        name = str(path[-1])
        other = d_flat[path]
        if "hist" in name:
            # same total mass; per-bin layout may differ by the (already
            # approximate) streaming rebin order
            np.testing.assert_allclose(np.asarray(other).sum(),
                                       np.asarray(leaf).sum())
        elif "bin_width" in name:
            assert float(np.asarray(other)) > 0
        else:   # absmax / sq_act_absmax: max is associative -> exact
            np.testing.assert_array_equal(np.asarray(leaf),
                                          np.asarray(other))

    # resolved amax: exact for max-reduce, within a couple of bins for the
    # histogram percentile (bin width ~ amax/2048)
    a1 = compute_amax(dict(single), method="percentile", percentile=99.9)
    a2 = compute_amax(dict(sharded), method="percentile", percentile=99.9)
    l1 = jax.tree_util.tree_leaves_with_path(a1["quant"])
    l2 = dict(jax.tree_util.tree_leaves_with_path(a2["quant"]))
    for path, leaf in l1:
        np.testing.assert_allclose(np.asarray(leaf), np.asarray(l2[path]),
                                   rtol=5e-3)

    # merge is order/shard-count independent on max leaves: merging the
    # 4-way result with the single stream changes nothing on absmax
    again = merge_calib_trees([sharded["calib"], single["calib"]])
    for path, leaf in jax.tree_util.tree_leaves_with_path(again):
        name = str(path[-1])
        if "hist" in name or "bin_width" in name:
            continue        # histogram pair merges by rebin+sum, not max
        np.testing.assert_allclose(np.asarray(leaf),
                                   np.asarray(d_flat[path]))
