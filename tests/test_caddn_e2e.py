"""End-to-end integration test: tiny CaDDN (monocular camera detector)."""

from pathlib import Path

import jax
import numpy as np

from q3d_tpu.config import cfg_from_yaml_file, EDict
from q3d_tpu.datasets import build_dataloader
from q3d_tpu.models import build_network, load_data_to_device

CFG_PATH = Path(__file__).resolve().parent.parent / \
    "tools/cfgs/synthetic_models/caddn_tiny.yaml"


def test_caddn_inference():
    cfg = cfg_from_yaml_file(str(CFG_PATH), EDict())
    dataset, loader, _ = build_dataloader(
        cfg.DATA_CONFIG, cfg.CLASS_NAMES, batch_size=2, training=False)
    model = build_network(cfg.MODEL, num_class=len(cfg.CLASS_NAMES),
                          dataset=dataset)
    raw = next(iter(loader))
    rng = np.random.RandomState(0)
    H = W = 64
    raw["camera_imgs"] = rng.rand(2, H, W, 3).astype(np.float32)
    intr = np.zeros((2, 3, 3), np.float32)
    intr[:, 0, 0] = intr[:, 1, 1] = 40.0
    intr[:, 0, 2] = W / 2
    intr[:, 1, 2] = H / 2
    intr[:, 2, 2] = 1.0
    raw["camera_intrinsics"] = intr
    batch = load_data_to_device(raw)
    variables = jax.jit(
        lambda k, b: model.init(k, b, train=False))(jax.random.PRNGKey(0), batch)
    out = model.apply(variables, batch, train=False)
    assert out["final_boxes"].shape[0] == 2
    assert np.isfinite(np.asarray(out["final_boxes"])).all()


def test_depth_bin_index_modes():
    """UD/LID/SID bin formulas (reference transform_utils.py:56 bin_depths).

    LID closed form: depth at bin-i lower edge d_min + bin_size/2*i*(i+1)
    maps exactly back to index i."""
    import jax.numpy as jnp
    from q3d_tpu.models.backbones_3d.vfe.image_vfe import depth_bin_index

    d_min, d_max, nb = 2.0, 46.8, 80
    # UD: uniform spacing
    ud = depth_bin_index(jnp.asarray([d_min, (d_min + d_max) / 2, d_max]),
                         "UD", d_min, d_max, nb)
    np.testing.assert_allclose(np.asarray(ud), [0.0, nb / 2, nb], atol=1e-4)
    # LID: quadratic edge positions round-trip to integer indices
    bin_size = 2.0 * (d_max - d_min) / (nb * (1 + nb))
    idx = np.asarray([0, 1, 5, 40, 79], np.float64)
    edges = d_min + bin_size / 2.0 * idx * (idx + 1.0)
    lid = depth_bin_index(jnp.asarray(edges), "LID", d_min, d_max, nb)
    np.testing.assert_allclose(np.asarray(lid), idx, atol=1e-3)
    # LID bins widen with depth => indices grow sub-linearly vs UD
    mid = depth_bin_index(jnp.asarray([(d_min + d_max) / 2]),
                          "LID", d_min, d_max, nb)
    assert float(mid[0]) > nb / 2          # early bins are narrower
    # SID endpoints
    sid = depth_bin_index(jnp.asarray([d_min, d_max]), "SID", d_min, d_max, nb)
    np.testing.assert_allclose(np.asarray(sid), [0.0, nb], atol=1e-3)


def test_ddn_loss_reference_formula():
    """DDNLoss == the reference computation (ddn_loss/ddn_loss.py:47-75 +
    balancer.py:22-50 + transform_utils.bin_depths target mode +
    loss_utils.compute_fg_mask:237), re-implemented step-for-step in torch
    on a fixed input."""
    import jax.numpy as jnp
    import torch
    import torch.nn.functional as F
    from q3d_tpu.utils.loss_utils import ddn_loss

    rng = np.random.RandomState(7)
    B, H, W, D = 2, 8, 12, 6
    logits = rng.randn(B, H, W, D + 1).astype(np.float32)
    depth = rng.uniform(0.0, 50.0, (B, H, W)).astype(np.float32)
    depth[0, 0, 0] = np.inf                      # overflow-bin cases
    depth[1, 2, 3] = -1.0
    down = 4
    boxes = np.zeros((B, 3, 4), np.float32)
    boxes[0, 0] = [4.0, 6.0, 20.0, 18.0]         # full-res pixels
    boxes[1, 0] = [0.0, 0.0, 8.0, 8.0]
    boxes[1, 1] = [30.0, 20.0, 46.0, 30.0]
    disc = {"mode": "LID", "depth_min": 2.0, "depth_max": 46.8,
            "num_bins": D}
    w_l, al, ga, fgw, bgw = 3.0, 0.25, 2.0, 13.0, 1.0

    got, tb = ddn_loss(jnp.asarray(logits), jnp.asarray(depth),
                       jnp.asarray(boxes), disc, w_l, al, ga, fgw, bgw,
                       downsample_factor=down)

    # ---- torch twin of the reference chain ----
    t_logits = torch.from_numpy(logits).permute(0, 3, 1, 2)   # NCHW
    t_depth = torch.from_numpy(depth)
    # bin_depths(..., target=True), LID
    bin_size = 2 * (disc["depth_max"] - disc["depth_min"]) / (D * (1 + D))
    idx = -0.5 + 0.5 * torch.sqrt(
        1 + 8 * (t_depth - disc["depth_min"]) / bin_size)
    mask = (idx < 0) | (idx > D) | (~torch.isfinite(idx))
    idx[mask] = D
    target = idx.long()
    # kornia FocalLoss(alpha, gamma, reduction='none')
    logp = F.log_softmax(t_logits, dim=1)
    logpt = logp.gather(1, target.unsqueeze(1)).squeeze(1)
    pt = logpt.exp()
    loss = -al * (1 - pt) ** ga * logpt                       # (B, H, W)
    # compute_fg_mask (reference loop)
    fg = torch.zeros((B, H, W), dtype=torch.bool)
    b2 = torch.from_numpy(boxes.copy()) / down
    b2[:, :, :2] = torch.floor(b2[:, :, :2])
    b2[:, :, 2:] = torch.ceil(b2[:, :, 2:])
    b2 = b2.long()
    for b in range(B):
        for n in range(boxes.shape[1]):
            u1, v1, u2, v2 = b2[b, n]
            fg[b, v1:v2, u1:u2] = True
    bg = ~fg
    weights = fgw * fg.float() + bgw * bg.float()
    num_pixels = fg.sum() + bg.sum()
    loss = loss * weights
    want = (loss[fg].sum() / num_pixels + loss[bg].sum() / num_pixels) * w_l

    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)
    assert float(tb["fg_loss"]) > 0 and float(tb["bg_loss"]) > 0


def test_caddn_train_depth_term_decreases():
    """VERDICT r4 #4 'done' criterion: CaDDN training includes a DDN depth
    term that decreases when overfitting a fixed scene."""
    import optax
    from q3d_tpu.parallel import make_train_step

    cfg = cfg_from_yaml_file(str(CFG_PATH), EDict())
    dataset, loader, _ = build_dataloader(
        cfg.DATA_CONFIG, cfg.CLASS_NAMES, batch_size=2, training=True)
    model = build_network(cfg.MODEL, num_class=len(cfg.CLASS_NAMES),
                          dataset=dataset)
    raw = next(iter(loader))
    rng = np.random.RandomState(0)
    H = W = 64
    raw["camera_imgs"] = rng.rand(2, H, W, 3).astype(np.float32)
    intr = np.zeros((2, 3, 3), np.float32)
    intr[:, 0, 0] = intr[:, 1, 1] = 40.0
    intr[:, 0, 2] = W / 2
    intr[:, 1, 2] = H / 2
    intr[:, 2, 2] = 1.0
    raw["camera_intrinsics"] = intr
    # lidar-derived depth map at the logits resolution (H/4, W/4) + 2D boxes
    raw["depth_maps"] = rng.uniform(1.0, 45.0, (2, H // 4, W // 4)) \
        .astype(np.float32)
    gt2d = np.zeros((2, 2, 4), np.float32)
    gt2d[0, 0] = [8, 8, 40, 40]
    gt2d[1, 0] = [16, 4, 60, 30]
    raw["gt_boxes2d"] = gt2d
    batch = load_data_to_device(raw)
    keep = ("camera_imgs", "camera_intrinsics", "depth_maps", "gt_boxes2d",
            "gt_boxes", "batch_size")
    batch = {k: v for k, v in batch.items() if k in keep}

    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    tx = optax.adam(1e-2)
    opt_state = tx.init(variables["params"])
    step = make_train_step(model, tx)

    ddn = []
    for _ in range(10):
        variables, opt_state, loss, tb = step(variables, opt_state, batch)
        assert "ddn_loss" in tb, list(tb)
        ddn.append(float(tb["ddn_loss"]))
    assert np.isfinite(ddn).all()
    assert ddn[-1] < ddn[0] * 0.9, ddn


def test_out_of_depth_range_voxels_get_zero_weight():
    """ADVICE r3: voxels whose camera depth falls outside D_RANGE must get
    ZERO frustum weight (reference reserves an overflow bin that
    frustum_to_voxel drops), not the nearest valid bin's probability.  The
    in_img mask enforces this: with a constant-feature image, voxels in
    front of the camera but beyond depth_max (or closer than depth_min)
    produce exactly zero dense features."""
    import jax.numpy as jnp

    cfg = cfg_from_yaml_file(str(CFG_PATH), EDict())
    dataset, loader, _ = build_dataloader(
        cfg.DATA_CONFIG, cfg.CLASS_NAMES, batch_size=1, training=False)
    # shrink the depth range so most of the grid is out of range
    cfg.MODEL.VFE.D_RANGE = [1.0, 4.0]
    model = build_network(cfg.MODEL, num_class=len(cfg.CLASS_NAMES),
                          dataset=dataset)
    raw = next(iter(loader))
    H = W = 64
    raw["camera_imgs"] = np.ones((1, H, W, 3), np.float32)
    intr = np.zeros((1, 3, 3), np.float32)
    intr[:, 0, 0] = intr[:, 1, 1] = 40.0
    intr[:, 0, 2] = W / 2
    intr[:, 1, 2] = H / 2
    intr[:, 2, 2] = 1.0
    raw["camera_intrinsics"] = intr
    batch = load_data_to_device(raw)
    variables = jax.jit(lambda k, b: model.init(k, b, train=False))(
        jax.random.PRNGKey(0), batch)

    def vfe_only(m, b):
        return m.vfe(dict(b), False)["dense_voxel_features"]

    vol = np.asarray(model.apply(variables, batch, method=vfe_only))
    # voxel centers along +x (camera forward, KITTI-ish default frame):
    # depth = x.  grid covers the point cloud range; find columns beyond
    # depth_max = 4.0 -> all-zero features there.
    nx, ny, nz = (int(g) for g in dataset.grid_size)
    pr = dataset.point_cloud_range
    vx = (pr[3] - pr[0]) / nx
    xs = pr[0] + (np.arange(nx) + 0.5) * vx
    far = xs > 4.5          # comfortably beyond depth_max
    # vol layout: (B, D=nz, H=ny, W=nx, C)
    far_feats = vol[0, :, :, far, :]
    assert np.abs(far_feats).max() == 0.0
    # and some in-range voxel carries nonzero signal
    near = (xs > 1.2) & (xs < 3.8)
    assert np.abs(vol[0, :, :, near, :]).max() > 0.0
