"""ImageVFE — monocular camera features lifted into the LiDAR voxel grid
(CaDDN).

Parity with reference ``vfe/image_vfe.py`` (+ ``image_vfe_modules/ffn``,
``f2v``): an image conv net predicts per-pixel categorical depth
(the FFN's depth-distribution head) and channel features; FrustumToVoxel
samples, for every voxel center, the image feature at its projected pixel
weighted by the depth bin its camera depth falls into.  Output is a dense
(B, D, H, W, C) volume consumed by ``Conv2DCollapse``.

Two depth nets: with an ``FFN.DDN`` config (the reference's schema) the
full DeepLabV3/ResNet DDN runs (``backbones_image/ddn_deeplabv3.py``,
torchvision-pretrained weights importable); otherwise a compact conv stack
(CI-friendly).  The lifting math is shared.
"""

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...layers import Conv2d, BatchNorm, relu


def depth_bin_index(depth, mode, d_min, d_max, num_bins):
    """Continuous depth -> discretization bin index (float, unclipped).

    Reference ``pcdet/utils/transform_utils.py:56`` bin_depths modes:
    UD uniform, LID linearly-increasing (CaDDN default), SID log-spaced.
    """
    if mode == "UD":
        bin_size = (d_max - d_min) / num_bins
        return (depth - d_min) / bin_size
    if mode == "LID":
        bin_size = 2.0 * (d_max - d_min) / (num_bins * (1 + num_bins))
        return -0.5 + 0.5 * jnp.sqrt(
            jnp.clip(1.0 + 8.0 * (depth - d_min) / bin_size, 0.0, None))
    if mode == "SID":
        return num_bins * (jnp.log(1.0 + jnp.clip(depth, 1e-6, None))
                           - np.log(1.0 + d_min)) \
            / (np.log(1.0 + d_max) - np.log(1.0 + d_min))
    raise NotImplementedError(f"DISCRETIZE mode {mode}")


class ImageVFE(nn.Module):
    model_cfg: Any
    num_point_features: int
    voxel_size: Tuple[float, float, float]
    point_cloud_range: Tuple[float, ...]
    grid_size: Tuple[int, int, int]

    def get_output_feature_dim(self):
        return int(self.model_cfg.get("NUM_CHANNELS", 32))

    @nn.compact
    def __call__(self, batch_dict, train: bool = False):
        cfg = self.model_cfg
        imgs = batch_dict["camera_imgs"]              # (B, 1, H, W, 3) or (B,H,W,3)
        if imgs.ndim == 5:
            imgs = imgs[:, 0]
        ch = int(cfg.get("NUM_CHANNELS", 32))
        d_bins = int(cfg.get("D_BINS", 48))
        d_min, d_max = cfg.get("D_RANGE", [2.0, 46.8])[:2]
        disc_mode = "UD"
        down = int(cfg.get("DOWNSAMPLE", 4))

        ffn_cfg = cfg.get("FFN", None)
        if ffn_cfg is not None and ffn_cfg.get("DDN", None) is not None:
            # reference DDN path: DeepLabV3 depth-distribution net + 1x1
            # channel reduce (ffn/depth_ffn.py); DISCRETIZE carries the
            # binning spec (mode/num_bins/depth_min/depth_max —
            # CaDDN.yaml:45-50, default LID)
            from ...backbones_image.ddn_deeplabv3 import DDNDeepLabV3
            ddn_cfg = ffn_cfg.DDN
            disc = ffn_cfg.get("DISCRETIZE", {})
            d_bins = int(disc.get("num_bins", d_bins))
            d_min = float(disc.get("depth_min", d_min))
            d_max = float(disc.get("depth_max", d_max))
            disc_mode = str(disc.get("mode", "LID"))
            out = DDNDeepLabV3(
                num_classes=d_bins + 1,
                backbone_name=ddn_cfg.get("BACKBONE_NAME", "ResNet101"),
                pretrained=ddn_cfg.get("ARGS", {}).get(
                    "pretrained_path", None) is not None,
                name="ddn")(imgs, train)
            depth_logits = out["logits"]                    # (B, h, w, D+1)
            # last bin = "beyond range" (reference frustum_to_voxel drops it)
            depth = jax.nn.softmax(depth_logits, axis=-1)[..., :d_bins]
            cr = cfg.FFN.get("CHANNEL_REDUCE", {})
            ch = int(cr.get("out_channels", ch))
            feats = Conv2d(ch, int(cr.get("kernel_size", 1)),
                           use_bias=False, name="channel_reduce")(
                out["features"])
            feats = relu(BatchNorm(name="channel_reduce_norm")(feats, train))
        else:
            x = imgs
            for i, (c, s) in enumerate([(ch, 2), (ch, 2), (ch, 1)]):
                x = Conv2d(c, 3, s, 1, use_bias=False, name=f"ffn_conv{i}")(x)
                x = BatchNorm(name=f"ffn_norm{i}")(x, train)
                x = relu(x)
            # D+1 classes: the extra "beyond range" bin carries out-of-range
            # supervision in DDNLoss (reference depth_ffn.py num_bins + 1)
            depth_logits = Conv2d(d_bins + 1, 1, name="depth_head")(x)
            depth = jax.nn.softmax(depth_logits, axis=-1)[..., :d_bins]
            feats = Conv2d(ch, 1, name="feat_head")(x)      # (B, h, w, C)

        # voxel centers -> camera frame -> image plane
        nx, ny, nz = (int(g) for g in self.grid_size)
        pr = self.point_cloud_range
        vx, vy, vz = self.voxel_size
        xs = pr[0] + (jnp.arange(nx) + 0.5) * vx
        ys = pr[1] + (jnp.arange(ny) + 0.5) * vy
        zs = pr[2] + (jnp.arange(nz) + 0.5) * vz
        gx, gy, gz = jnp.meshgrid(xs, ys, zs, indexing="ij")   # (nx,ny,nz)
        pts = jnp.stack([gx, gy, gz, jnp.ones_like(gx)], -1)   # (nx,ny,nz,4)

        lidar2cam = batch_dict.get("lidar2camera", None)
        intrins = batch_dict["camera_intrinsics"]
        if intrins.ndim == 4:
            intrins = intrins[:, 0]
        if lidar2cam is None:
            # default KITTI-ish frame: cam x=-y_l, y=-z_l, z=x_l
            T = jnp.asarray([[0., -1., 0., 0.],
                             [0., 0., -1., 0.],
                             [1., 0., 0., 0.],
                             [0., 0., 0., 1.]])
            B = imgs.shape[0]
            lidar2cam = jnp.broadcast_to(T, (B, 4, 4))
        elif lidar2cam.ndim == 4:
            lidar2cam = lidar2cam[:, 0]

        cam = jnp.einsum("bij,xyzj->bxyzi", lidar2cam, pts)[..., :3]
        depth_cam = cam[..., 2]
        uv = jnp.einsum("bij,bxyzj->bxyzi", intrins, cam)
        u = uv[..., 0] / jnp.clip(uv[..., 2], 1e-3, None) / down
        v = uv[..., 1] / jnp.clip(uv[..., 2], 1e-3, None) / down

        h, w = feats.shape[1:3]
        in_img = (u >= 0) & (u < w - 1) & (v >= 0) & (v < h - 1) \
            & (depth_cam > d_min) & (depth_cam < d_max)
        u_c = jnp.clip(u, 0, w - 1.001)
        v_c = jnp.clip(v, 0, h - 1.001)

        def sample(maps, uu, vv):
            # bilinear sample maps (B,h,w,C) at float (B,...) coords
            u0 = jnp.floor(uu).astype(jnp.int32)
            v0 = jnp.floor(vv).astype(jnp.int32)
            du = (uu - u0)[..., None]
            dv = (vv - v0)[..., None]

            def g(vv_, uu_):
                return jax.vmap(lambda m, a, b: m[a, b])(maps, vv_, uu_)

            return (g(v0, u0) * (1 - dv) * (1 - du)
                    + g(v0, u0 + 1) * (1 - dv) * du
                    + g(v0 + 1, u0) * dv * (1 - du)
                    + g(v0 + 1, u0 + 1) * dv * du)

        f_sampled = sample(feats, u_c, v_c)                 # (B,nx,ny,nz,C)
        d_sampled = sample(depth, u_c, v_c)                 # (B,nx,ny,nz,D)
        # depth-bin weight at the voxel's camera depth (DISCRETIZE mode:
        # UD for the compact net, LID default on the reference DDN path)
        bin_idx = jnp.clip(
            depth_bin_index(depth_cam, disc_mode, d_min, d_max,
                            d_bins).astype(jnp.int32), 0, d_bins - 1)
        w_depth = jnp.take_along_axis(d_sampled, bin_idx[..., None],
                                      axis=-1)[..., 0]
        vol = f_sampled * w_depth[..., None] * in_img[..., None]

        # (B, nx, ny, nz, C) -> (B, D=nz, H=ny, W=nx, C)
        batch_dict["dense_voxel_features"] = vol.transpose(0, 3, 2, 1, 4)

        if train and "depth_maps" in batch_dict:
            # DDNLoss: depth-bin focal CE + fg/bg balancing (reference
            # ffn/ddn_loss/ddn_loss.py:1-75, balancer.py:1-50) — the depth
            # head's own gradient signal during CaDDN training
            from ....utils import loss_utils
            largs = cfg.get("FFN", {}).get("LOSS", {}).get("ARGS", {})
            dm = batch_dict["depth_maps"]
            lh, lw = depth_logits.shape[1:3]
            if dm.shape[1:3] != (lh, lw):
                # nearest-neighbor resample to the logits grid (the
                # reference data processor pre-downsamples; synthetic
                # pipelines may hand full-res maps)
                ri = jnp.clip((jnp.arange(lh) * dm.shape[1]) // lh, 0,
                              dm.shape[1] - 1)
                ci = jnp.clip((jnp.arange(lw) * dm.shape[2]) // lw, 0,
                              dm.shape[2] - 1)
                dm = dm[:, ri][:, :, ci]
            gt2d = batch_dict.get("gt_boxes2d",
                                  jnp.zeros((dm.shape[0], 1, 4), dm.dtype))
            loss, tb = loss_utils.ddn_loss(
                depth_logits, dm, gt2d,
                disc_cfg={"mode": disc_mode, "depth_min": d_min,
                          "depth_max": d_max, "num_bins": d_bins},
                weight=float(largs.get("weight", 3.0)),
                alpha=float(largs.get("alpha", 0.25)),
                gamma=float(largs.get("gamma", 2.0)),
                fg_weight=float(largs.get("fg_weight", 13.0)),
                bg_weight=float(largs.get("bg_weight", 1.0)),
                downsample_factor=down)
            batch_dict["loss"] = batch_dict.get("loss", 0.0) + loss
            batch_dict.setdefault("tb_dict", {}).update(tb)
        return batch_dict
