"""DepthLSSTransform — lift-splat-shoot camera->BEV view transform.

Parity with reference ``view_transforms/depth_lss.py`` (257 LoC): per-pixel
categorical depth distribution + feature lifting into a camera frustum,
projection into the lidar frame with calibration matrices, then pooling into
the BEV grid — the reference's CUDA ``bev_pool`` interval reduction is our
single scatter-add (``q3d_tpu/ops/bev_pool.py``).
"""

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...ops.bev_pool import bev_pool
from ..layers import Conv2d, BatchNorm, relu


class DepthLSSTransform(nn.Module):
    model_cfg: Any
    point_cloud_range: Tuple[float, ...] = ()

    @property
    def num_bev_features(self):
        return int(self.model_cfg.OUT_CHANNELS)

    @nn.compact
    def __call__(self, batch_dict, train: bool = False):
        cfg = self.model_cfg
        feats = batch_dict["image_fpn_features"]      # (B*Ncam, h, w, C)
        cam2lidar = batch_dict["camera2lidar"]        # (B, Ncam, 4, 4)
        intrins = batch_dict["camera_intrinsics"]     # (B, Ncam, 3, 3)
        B, N = cam2lidar.shape[:2]
        _, h, w, C = feats.shape

        d_bins = int(cfg.get("D_BINS", 64))
        d_min, d_max = cfg.get("D_RANGE", [1.0, 60.0])[:2]
        out_ch = int(cfg.OUT_CHANNELS)
        downsample = int(cfg.get("DOWNSAMPLE", 8))

        x = relu(BatchNorm(name="dtr_norm")(
            Conv2d(out_ch, 3, 1, 1, name="dtransform")(feats), train))
        depth_logits = Conv2d(d_bins, 1, name="depth_head")(x)
        depth = jax.nn.softmax(depth_logits, axis=-1)   # (B*N, h, w, D)
        ctx = Conv2d(out_ch, 1, name="context_head")(x)  # (B*N, h, w, C')

        # frustum: pixel grid x depth bins -> camera-frame points
        ds = jnp.linspace(d_min, d_max, d_bins)
        us = (jnp.arange(w) + 0.5) * downsample
        vs = (jnp.arange(h) + 0.5) * downsample
        gu, gv, gd = jnp.meshgrid(us, vs, ds, indexing="xy")  # (h, w, D)

        lifted = ctx[:, :, :, None, :] * depth[..., None]     # (B*N,h,w,D,C')
        lifted = lifted.reshape(B, N, h, w, d_bins, out_ch)

        # unproject: cam (u*d, v*d, d) -> lidar frame
        pix = jnp.stack([gu * gd, gv * gd, gd], -1)           # (h, w, D, 3)
        inv_k = jnp.linalg.inv(intrins)                       # (B, N, 3, 3)
        cam_pts = jnp.einsum("bnij,hwdj->bnhwdi", inv_k, pix)
        cam_h = jnp.concatenate(
            [cam_pts, jnp.ones((*cam_pts.shape[:-1], 1))], -1)
        lidar_pts = jnp.einsum("bnij,bnhwdj->bnhwdi", cam2lidar, cam_h)[..., :3]

        # rasterize into BEV (grid geometry is static python math)
        pr = self.point_cloud_range
        vx = float(cfg.get("BEV_VOXEL_SIZE", 0.3))
        nx = int(round((pr[3] - pr[0]) / vx))
        ny = int(round((pr[4] - pr[1]) / vx))
        cx = jnp.floor((lidar_pts[..., 0] - pr[0]) / vx).astype(jnp.int32)
        cy = jnp.floor((lidar_pts[..., 1] - pr[1]) / vx).astype(jnp.int32)
        bb = jnp.broadcast_to(
            jnp.arange(B)[:, None, None, None, None], cx.shape)
        coords = jnp.stack(
            [cx.reshape(-1), cy.reshape(-1),
             jnp.zeros(cx.size, jnp.int32), bb.reshape(-1)], axis=1)
        flat_feats = lifted.reshape(-1, out_ch)
        bev = bev_pool(flat_feats, coords, B, 1, ny, nx)[:, 0]  # (B,ny,nx,C')
        batch_dict["spatial_features_img"] = bev
        return batch_dict
