"""Full-model checkpoint import proof (VERDICT r2 #3).

The environment has no reference model zoo, so the zoo-readiness proof is a
round trip at full CenterPoint shape: export the trained fixture's weights
as a pcdet-format ``.pth`` state dict (pcdet names + torch layouts —
reference ``train_utils.py:221-237`` checkpoint schema, spconv2 weight
layout), re-import it with ``import_torch_state_dict`` onto freshly
initialized variables, and assert the final detection boxes match the
fixture model bit-for-bit-close.  Also covers the spconv1 layout variant
and reference-shaped (unpadded input-lane) first convs — the two layout
adaptations the reference's own loader performs
(``detector3d_template.py:330-359``).
"""

from pathlib import Path

import jax
import numpy as np
import pytest

from q3d_tpu.config import cfg_from_yaml_file, EDict
from q3d_tpu.datasets import build_dataloader
from q3d_tpu.models import build_network, load_data_to_device
from q3d_tpu.utils.checkpoint import (load_checkpoint, load_pth_file,
                                      import_torch_state_dict)
from q3d_tpu.utils.pcdet_names import export_torch_state_dict

ROOT = Path(__file__).resolve().parent.parent
CKPT = Path(__file__).resolve().parent / "fixtures" / \
    "centerpoint_tiny_trained.pkl"

pytestmark = pytest.mark.skipif(
    not CKPT.exists(), reason="trained fixture checkpoint not present")


@pytest.fixture(scope="module")
def setup():
    cfg = cfg_from_yaml_file(
        str(ROOT / "tools/cfgs/synthetic_models/centerpoint_tiny.yaml"),
        EDict())
    dataset, loader, _ = build_dataloader(
        cfg.DATA_CONFIG, cfg.CLASS_NAMES, batch_size=2, training=False)
    model = build_network(cfg.MODEL, num_class=len(cfg.CLASS_NAMES),
                          dataset=dataset)
    batch = load_data_to_device(next(iter(loader)))
    template = jax.jit(lambda k, b: model.init(k, b, train=False))(
        jax.random.PRNGKey(0), batch)
    trained, _, _, _ = load_checkpoint(str(CKPT), template)
    fwd = jax.jit(lambda v, b: {
        k: out[k] for out in [model.apply(v, b, train=False)]
        for k in ("final_boxes", "final_scores", "final_labels",
                  "final_valid")})
    ref = {k: np.asarray(v) for k, v in fwd(trained, batch).items()}
    return model, batch, template, trained, fwd, ref


def _boxes_match(fwd, variables, batch, ref):
    out = fwd(variables, batch)
    np.testing.assert_allclose(np.asarray(out["final_boxes"]),
                               ref["final_boxes"], rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out["final_scores"]),
                               ref["final_scores"], rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(out["final_valid"]),
                                  ref["final_valid"])


def test_export_covers_every_leaf(setup):
    model, batch, template, trained, fwd, ref = setup
    state, skipped = export_torch_state_dict(trained)
    assert not skipped, f"naming rules missed leaves: {skipped[:10]}"
    # pcdet names present with torch layouts
    assert "backbone_3d.conv_input.0.weight" in state
    assert state["backbone_3d.conv_input.0.weight"].shape == (16, 3, 3, 3, 16)
    assert "backbone_2d.blocks.0.1.weight" in state
    assert state["backbone_2d.blocks.0.1.weight"].shape == (64, 256, 3, 3)
    assert "dense_head.heads_list.0.center.1.weight" in state
    assert "dense_head.shared_conv.1.running_mean" in state


def test_pth_roundtrip_boxes_match(setup, tmp_path):
    """export -> torch.save(.pth) -> load_pth_file -> import (strict) ->
    identical boxes."""
    torch = pytest.importorskip("torch")
    model, batch, template, trained, fwd, ref = setup
    state, _ = export_torch_state_dict(trained)
    pth = {"model_state": {k: torch.from_numpy(np.asarray(v))
                           for k, v in state.items()},
           "version": "pcdet+0.6.0", "epoch": 50, "it": 0}
    path = tmp_path / "centerpoint_tiny.pth"
    torch.save(pth, str(path))

    sd = load_pth_file(str(path))
    imported = import_torch_state_dict(sd, template, strict=True)
    _boxes_match(fwd, imported, batch, ref)


def test_import_reference_shaped_first_conv(setup):
    """A real reference checkpoint stores conv_input with the LOGICAL input
    channel count (4 for MeanVFE xyzi) — the importer zero-pads to our
    MIN_INPUT_LANES; pad lanes see only zero inputs so boxes are
    unchanged."""
    model, batch, template, trained, fwd, ref = setup
    state, _ = export_torch_state_dict(trained)
    state = dict(state)
    w = state["backbone_3d.conv_input.0.weight"]      # (O, 3,3,3, I=16)
    state["backbone_3d.conv_input.0.weight"] = np.ascontiguousarray(
        w[..., :4])
    imported = import_torch_state_dict(state, template, strict=True)
    _boxes_match(fwd, imported, batch, ref)


def test_import_spconv1_layout(setup):
    """spconv 1.x checkpoints store (kd, kh, kw, I, O) — the reference's
    version-adaptive loader transposes them (detector3d_template.py:336-348)
    and so must ours."""
    model, batch, template, trained, fwd, ref = setup
    state, _ = export_torch_state_dict(trained)
    state = dict(state)
    for k, v in list(state.items()):
        if v.ndim == 5:                              # (O, kd,kh,kw, I)
            state[k] = np.ascontiguousarray(np.transpose(v, (1, 2, 3, 4, 0)))
    imported = import_torch_state_dict(state, template, strict=True)
    _boxes_match(fwd, imported, batch, ref)
