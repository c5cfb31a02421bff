"""DepthLSSTransform — lift-splat-shoot camera->BEV view transform.

Parity with reference ``view_transforms/depth_lss.py`` (257 LoC) at
PARAMETER level: the sparse lidar-depth assist map -> ``dtransform`` conv
stack (1->8 k1, 8->32 k5 s4, 32->64 k5 s2), concat with the FPN features ->
``depthnet`` (two 3x3 convs + a 1x1 emitting D depth logits + C context),
softmax-depth x context outer product lifted through the pixel frustum
(``create_frustum``/``get_geometry`` with img/lidar aug undo), pooled into
the BEV grid by scatter-add (our ``ops.bev_pool`` replaces the CUDA
QuickCumsum), z-collapse + optional ``downsample`` conv stack.

Module names mirror the torch ``nn.Sequential`` indices
(``dtransform_0``.. etc.) so reference BEVFusion checkpoints import
through ``utils.checkpoint.import_torch_state_dict``.
"""

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...ops.bev_pool import bev_pool
from ..layers import Conv2d, BatchNorm, relu


def gen_dx_bx(xbound, ybound, zbound):
    """(step, min-center, cells) per axis (reference depth_lss.py:6-12)."""
    dx = np.array([row[2] for row in (xbound, ybound, zbound)], np.float32)
    bx = np.array([row[0] + row[2] / 2.0 for row in (xbound, ybound, zbound)],
                  np.float32)
    nx = np.array([int(round((row[1] - row[0]) / row[2]))
                   for row in (xbound, ybound, zbound)], np.int64)
    return dx, bx, nx


class DepthLSSTransform(nn.Module):
    model_cfg: Any
    point_cloud_range: Tuple[float, ...] = ()

    @property
    def num_bev_features(self):
        cfg = self.model_cfg
        out_ch = int(cfg.get("OUT_CHANNEL", cfg.get("OUT_CHANNELS")))
        # the downsample conv stack re-emits OUT_CHANNEL channels, so the
        # z-concat width only survives when there is no downsampling
        if "ZBOUND" in cfg and int(cfg.get("DOWNSAMPLE", 1)) == 1:
            _, _, nx = gen_dx_bx(cfg.XBOUND, cfg.YBOUND, cfg.ZBOUND)
            return out_ch * int(nx[2])
        return out_ch

    def _frustum(self, d0, d1, dstep, iH, iW, fH, fW):
        """(D, fH, fW, 3) [u_pix, v_pix, depth] (reference create_frustum)."""
        ds = np.arange(d0, d1, dstep, dtype=np.float32)
        D = len(ds)
        xs = np.linspace(0, iW - 1, fW, dtype=np.float32)
        ys = np.linspace(0, iH - 1, fH, dtype=np.float32)
        gx = np.broadcast_to(xs[None, None, :], (D, fH, fW))
        gy = np.broadcast_to(ys[None, :, None], (D, fH, fW))
        gd = np.broadcast_to(ds[:, None, None], (D, fH, fW))
        return jnp.asarray(np.stack([gx, gy, gd], -1))

    @nn.compact
    def __call__(self, batch_dict, train: bool = False):
        cfg = self.model_cfg
        feats = batch_dict["image_fpn_features"]      # (B*N, fH, fW, C)
        cam2lidar = jnp.asarray(batch_dict["camera2lidar"], jnp.float32)
        intr = jnp.asarray(batch_dict["camera_intrinsics"], jnp.float32)
        B, N = cam2lidar.shape[:2]
        BN, fH, fW, C = feats.shape
        in_ch = int(cfg.get("IN_CHANNEL", C))
        out_ch = int(cfg.get("OUT_CHANNEL", cfg.get("OUT_CHANNELS")))
        iH, iW = (int(v) for v in cfg.get("IMAGE_SIZE",
                                          [fH * 8, fW * 8]))
        d0, d1, dstep = (float(v) for v in cfg.get("DBOUND",
                                                   [1.0, 60.0, 0.5]))
        pr = self.point_cloud_range
        xb = cfg.get("XBOUND", [pr[0], pr[3], 0.3] if pr else [-54, 54, 0.3])
        yb = cfg.get("YBOUND", [pr[1], pr[4], 0.3] if pr else [-54, 54, 0.3])
        zb = cfg.get("ZBOUND", [-10.0, 10.0, 20.0])
        dx, bx, nx = gen_dx_bx(xb, yb, zb)
        downsample = int(cfg.get("DOWNSAMPLE", 1))

        frustum = self._frustum(d0, d1, dstep, iH, iW, fH, fW)
        D = frustum.shape[0]

        intr3 = intr[..., :3, :3]
        aug = batch_dict.get("img_aug_matrix")
        post_rots = jnp.asarray(aug, jnp.float32)[..., :3, :3] \
            if aug is not None else jnp.broadcast_to(jnp.eye(3), (B, N, 3, 3))
        post_trans = jnp.asarray(aug, jnp.float32)[..., :3, 3] \
            if aug is not None else jnp.zeros((B, N, 3))
        laug = batch_dict.get("lidar_aug_matrix")
        extra_rots = jnp.asarray(laug, jnp.float32)[..., :3, :3] \
            if laug is not None else jnp.broadcast_to(jnp.eye(3), (B, 3, 3))
        extra_trans = jnp.asarray(laug, jnp.float32)[..., :3, 3] \
            if laug is not None else jnp.zeros((B, 3))

        # ---- lidar-depth assist map (reference forward:178-238) ----------
        depth_map = self._point_depth_map(
            batch_dict, B, N, iH, iW, cam2lidar, intr, post_rots, post_trans,
            extra_rots, extra_trans)

        # ---- dtransform on the sparse depth (Sequential indices) ---------
        d = depth_map.reshape(B * N, iH, iW, 1)
        d = relu(BatchNorm(name="dtransform_1")(
            Conv2d(8, 1, name="dtransform_0")(d), train))
        d = relu(BatchNorm(name="dtransform_4")(
            Conv2d(32, 5, 4, 2, name="dtransform_3")(d), train))
        d = relu(BatchNorm(name="dtransform_7")(
            Conv2d(64, 5, 2, 2, name="dtransform_6")(d), train))
        # dtransform output is iH/8 x iW/8 == FEATURE_SIZE
        if d.shape[1:3] != (fH, fW):
            d = jax.image.resize(d, (B * N, fH, fW, d.shape[-1]), "bilinear")

        # ---- depthnet ----------------------------------------------------
        x = jnp.concatenate([d, feats], axis=-1)
        x = relu(BatchNorm(name="depthnet_1")(
            Conv2d(in_ch, 3, 1, 1, name="depthnet_0")(x), train))
        x = relu(BatchNorm(name="depthnet_4")(
            Conv2d(in_ch, 3, 1, 1, name="depthnet_3")(x), train))
        x = Conv2d(D + out_ch, 1, name="depthnet_6")(x)
        depth = jax.nn.softmax(x[..., :D], axis=-1)   # (B*N, fH, fW, D)
        ctx = x[..., D:D + out_ch]
        lifted = depth[..., None] * ctx[..., None, :]  # (B*N, fH, fW, D, C')
        lifted = lifted.reshape(B, N, fH, fW, D, out_ch)

        # ---- geometry (reference get_geometry) ---------------------------
        pts = frustum[None, None] - post_trans[:, :, None, None, None, :]
        pts = jnp.einsum("bnij,bndhwj->bndhwi", jnp.linalg.inv(post_rots),
                         pts, precision="highest")                          # (B,N,D,fH,fW,3)
        pts = jnp.concatenate([pts[..., :2] * pts[..., 2:3], pts[..., 2:3]],
                              axis=-1)
        combine = jnp.einsum("bnij,bnjk->bnik", cam2lidar[..., :3, :3],
                             jnp.linalg.inv(intr3), precision="highest")
        pts = jnp.einsum("bnij,bndhwj->bndhwi", combine, pts,
                         precision="highest")
        pts = pts + cam2lidar[..., None, None, None, :3, 3]
        pts = jnp.einsum("bij,bndhwj->bndhwi", extra_rots, pts,
                         precision="highest") \
            + extra_trans[:, None, None, None, None, :]

        # ---- bev pool + z collapse (+ downsample) ------------------------
        # .astype(int) TRUNCATES toward zero like the reference's .long()
        # (depth_lss.py:133) — NOT floor; they differ for negative offsets
        coords = ((pts - jnp.asarray(bx - dx / 2.0)) / jnp.asarray(dx)) \
            .astype(jnp.int32)                         # (B,N,D,fH,fW,3) xyz
        bb = jnp.broadcast_to(
            jnp.arange(B, dtype=jnp.int32)[:, None, None, None, None],
            coords.shape[:-1])
        cf = coords.reshape(-1, 3)
        flat_feats = lifted.transpose(0, 1, 4, 2, 3, 5).reshape(-1, out_ch)
        # reference pools into (B, Z, X, Y): our bev_pool's H slot (coords
        # col 1) gets geom-x and its W slot (col 0) gets geom-y
        pooled = bev_pool(
            flat_feats,
            jnp.stack([cf[:, 1], cf[:, 0], cf[:, 2], bb.reshape(-1)], axis=1),
            B, int(nx[2]), int(nx[0]), int(nx[1]))     # (B, Z, X, Y, C)
        Z = pooled.shape[1]
        # z-collapse: channel = z*C + c (reference cat(unbind(z), dim=1))
        bev = pooled.transpose(0, 2, 3, 1, 4).reshape(
            B, int(nx[0]), int(nx[1]), Z * out_ch)     # (B, X, Y, Z*C)

        if downsample > 1:
            assert downsample == 2, downsample
            bev = relu(BatchNorm(name="downsample_1")(
                Conv2d(out_ch, 3, 1, 1, use_bias=False,
                       name="downsample_0")(bev), train))
            bev = relu(BatchNorm(name="downsample_4")(
                Conv2d(out_ch, 3, 2, 1, use_bias=False,
                       name="downsample_3")(bev), train))
            bev = relu(BatchNorm(name="downsample_7")(
                Conv2d(out_ch, 3, 1, 1, use_bias=False,
                       name="downsample_6")(bev), train))

        # final orientation (B, ny, nx, ch) — rows = y, like the lidar BEV
        # (reference's trailing permute(0, 1, 3, 2))
        batch_dict["spatial_features_img"] = bev.transpose(0, 2, 1, 3)
        return batch_dict

    def _point_depth_map(self, batch_dict, B, N, iH, iW, cam2lidar, intr,
                         post_rots, post_trans, extra_rots, extra_trans):
        """Scatter lidar point distances into per-camera image-size depth
        maps (reference forward:196-238), static-shape with point masks."""
        points = batch_dict.get("points")
        if points is None:
            return jnp.zeros((B, N, iH, iW), jnp.float32)
        pmask = batch_dict.get("points_mask",
                               jnp.ones(points.shape[:2], bool))
        xyz = jnp.asarray(points[..., :3], jnp.float32)      # (B, P, 3)
        # undo lidar aug
        xyz = xyz - extra_trans[:, None, :]
        xyz = jnp.einsum("bij,bpj->bpi", jnp.linalg.inv(extra_rots), xyz,
                         precision="highest")
        # lidar -> camera -> image
        l2c = jnp.linalg.inv(cam2lidar)                      # (B, N, 4, 4)
        cam = jnp.einsum("bnij,bpj->bnpi", l2c[..., :3, :3], xyz,
                        precision="highest") \
            + l2c[..., None, :3, 3]
        dist = cam[..., 2]
        camz = jnp.clip(dist, 1e-5, 1e5)
        img = jnp.einsum("bnij,bnpj->bnpi", intr[..., :3, :3], cam,
                        precision="highest")
        u = img[..., 0] / camz
        v = img[..., 1] / camz
        uv1 = jnp.stack([u, v, jnp.ones_like(u)], axis=-1)
        uv1 = jnp.einsum("bnij,bnpj->bnpi", post_rots, uv1,
                        precision="highest") \
            + post_trans[:, :, None, :]
        ui = uv1[..., 0].astype(jnp.int32)
        vi = uv1[..., 1].astype(jnp.int32)
        ok = ((ui >= 0) & (ui < iW) & (vi >= 0) & (vi < iH)
              & (dist > 0) & pmask[:, None, :])
        flat = jnp.where(ok, vi * iW + ui, iH * iW)
        dmap = jnp.zeros((B, N, iH * iW + 1), jnp.float32)
        dmap = jax.vmap(jax.vmap(
            lambda m, f, d: m.at[f].set(d)))(dmap, flat,
                                             jnp.where(ok, dist, 0.0))
        return dmap[..., :-1].reshape(B, N, iH, iW)
