"""MPPNetHead — multi-frame proxy-point trajectory refinement.

Parity with reference ``roi_heads/mppnet_head.py`` (992 LoC): per-proposal
trajectories built by IoU-matching velocity-propagated boxes against each
past frame's proposals; 128 points cropped per (roi, frame); proposal-aware
geometry features (spherical offsets to the 8 corners + center) and motion
features (offsets to the CURRENT box, time-stamped); ball-query MSG pooling
onto a 4^3 proxy grid per frame; group transformer with MLP-mixer blocks;
IoU-supervised classification + canonical box regression with per-group and
trajectory auxiliary branches.

TPU re-design: every step is batched static-shape array code — the
reference's per-sample/per-roi python loops (crop_previous_frame_points et
al.) become (B, T, R, ...) tensor ops; point sampling is first-K-in-radius
(top_k over the membership mask, the reference's current-frame strategy)
for ALL frames instead of np.random.choice, removing the host round trip.
"""

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...ops.iou3d_nms.iou3d_nms_utils import boxes_iou3d
from ...ops.pointnet2_utils import ball_query, group_points
from ...utils import common_utils, box_utils
from ..layers import Linear, BatchNorm
from ..model_utils import model_nms_utils
from ..model_utils.mppnet_utils import (MLP, SeqBoxPointNet,
                                        MPPNetTransformer)
from .roi_head_template import RoIHeadTemplate
from ..backbones_3d.pfe.voxel_set_abstraction import _SAMLPBlock


def spherical_coordinate(src, diag_dist):
    """(..., 27) xyz-triplet offsets -> (dist/diag, azimuth, polar) x 9
    (reference mppnet_head.py:454)."""
    x = src[..., 0::3]
    y = src[..., 1::3]
    z = src[..., 2::3]
    dis = jnp.sqrt(x * x + y * y + z * z)
    phi = jnp.arctan(y / (x + 1e-5))
    the = jnp.arccos(jnp.clip(z / (dis + 1e-5), -1.0, 1.0))
    return jnp.concatenate([dis / (diag_dist + 1e-5), phi, the], axis=-1)


def corners_and_center(boxes):
    """(..., 7) -> (..., 27): 8 corners + center, flattened xyz."""
    shape = boxes.shape[:-1]
    corners = box_utils.boxes_to_corners_3d(
        boxes.reshape(-1, boxes.shape[-1])[:, :7])             # (N, 8, 3)
    pts = jnp.concatenate(
        [corners, boxes.reshape(-1, boxes.shape[-1])[:, None, :3]], axis=1)
    return pts.reshape(*shape, 27)


def proxy_points_of(boxes, grid_size):
    """(B, R, T, C) frame boxes -> (B*R*T, P, 3) proxy grid points (the
    reference's get_proxy_points_of_roi, mppnet_memory_bank_e2e.py:123)."""
    g = grid_size
    lin = (jnp.arange(g, dtype=jnp.float32) + 0.5) / g - 0.5
    gz, gy, gx = jnp.meshgrid(lin, lin, lin, indexing="ij")
    local = jnp.stack([gx.reshape(-1), gy.reshape(-1), gz.reshape(-1)], 1)
    local = local[None] * boxes[..., None, 3:6].reshape(-1, 1, 3)
    rot = common_utils.rotate_points_along_z(
        local, boxes[..., 6].reshape(-1))
    return rot + boxes[..., :3].reshape(-1, 1, 3)


class MPPNetHead(RoIHeadTemplate):

    def _tcfg(self):
        return self.model_cfg.Transformer

    # ------------------------- trajectory building ------------------------

    def generate_trajectory(self, cur_boxes, proposals, prop_valid):
        """cur_boxes: (B, R, C>=9); proposals: (B, T, R, C) per-frame
        proposal sets (frame 0 == current) -> (traj (B, T, R, C),
        valid_length (B, T, R)) — reference mppnet_head.py:635."""
        traj, vl, _ = MPPNetHead.generate_trajectory_with_idx(
            self, cur_boxes, proposals, prop_valid)
        return traj, vl

    def generate_trajectory_with_idx(self, cur_boxes, proposals, prop_valid):
        """As ``generate_trajectory`` but also returns the per-frame matched
        proposal index (B, T, R) — the matching table the E2E feature bank
        gathers cached features with (reference mppnet_memory_bank_e2e.py
        matching_table, :457)."""
        T = proposals.shape[1]
        R = cur_boxes.shape[1]
        traj = [cur_boxes]
        valid_len = [jnp.ones(cur_boxes.shape[:2], bool)]
        ar = jnp.broadcast_to(jnp.arange(R, dtype=jnp.int32)[None],
                              cur_boxes.shape[:2])
        midx = [ar]

        def match(prev_b, props_b, pv_b):
            prop = prev_b.at[:, 0:2].add(prev_b[:, 7:9])       # propagate xy
            iou = boxes_iou3d(prop[:, :7], props_b[:, :7])
            iou = jnp.where(pv_b[None, :], iou, 0.0)
            best = iou.max(axis=1)
            idx = iou.argmax(axis=1)
            hit = best >= 0.5
            return jnp.where(hit[:, None], props_b[idx], prev_b), hit, idx

        for i in range(1, T):
            nxt, hit, idx = jax.vmap(match)(traj[i - 1], proposals[:, i],
                                            prop_valid[:, i])
            # unmatched rows keep the current box (reference init semantics)
            traj.append(jnp.where(hit[..., None], nxt, cur_boxes))
            valid_len.append(hit)
            midx.append(idx.astype(jnp.int32))
        return jnp.stack(traj, 1), jnp.stack(valid_len, 1), jnp.stack(midx, 1)

    # ---------------------------- point cropping --------------------------

    def crop_trajectory_points(self, points, pmask, traj):
        """points: (B, N, 5) [x y z i t]; traj: (B, T, R, C)
        -> (B, R, T, S, 5) per-roi per-frame sampled points (S =
        num_lidar_points); zero rows when nothing in radius."""
        S = int(self._tcfg().num_lidar_points)
        T = traj.shape[1]
        radii = jnp.sqrt((traj[..., 3] / 2) ** 2
                         + (traj[..., 4] / 2) ** 2) * 1.1      # (B, T, R)

        # 'first_k' (default) replaces the reference's per-frame random
        # subsampling (mppnet_head.py crop_previous_frame_points) with a
        # deterministic first-S-in-radius pick; POINT_SAMPLING: random
        # reproduces the reference's random draw (seeded) — the A/B test
        # (test_mppnet_e2e::test_sampling_mode_ab) shows the first-K-vs-
        # random output delta is within the random scheme's own
        # seed-to-seed variance.
        sampling = str(self.model_cfg.get("POINT_SAMPLING", "first_k"))
        sample_seed = int(self.model_cfg.get("POINT_SAMPLING_SEED", 17))

        def one_frame2(pts, pm, boxes, rad, fidx):
            # pts (N,5), boxes (R,C), rad (R,): first-S-in-radius sampling,
            # empty slots repeat the first hit, fully-empty rois -> zeros
            tmask = pm if fidx == 0 else \
                pm & (jnp.abs(pts[:, -1] - fidx * 0.1) < 1e-3)
            d = jnp.linalg.norm(
                pts[None, :, :2] - boxes[:, None, :2], axis=-1)
            inside = (d <= rad[:, None]) & tmask[None, :]
            if sampling == "random":
                key = jax.random.PRNGKey(sample_seed + fidx)
                tie = jax.random.uniform(key, (pts.shape[0],)) * 1e-6
            else:
                tie = jnp.arange(pts.shape[0], dtype=jnp.float32) * 1e-9
            score = inside.astype(jnp.float32) - tie[None]
            _, idx = jax.lax.top_k(score, S)
            got = jnp.take_along_axis(inside, idx, axis=1)
            idx = jnp.where(got, idx, idx[:, :1])              # fill w/ first
            sampled = pts[idx]
            any_hit = got.any(axis=1)
            return sampled * any_hit[:, None, None]

        frames = [jax.vmap(lambda p, m, b, r, f=f: one_frame2(p, m, b, r, f))(
            points, pmask, traj[:, f], radii[:, f]) for f in range(T)]
        return jnp.stack(frames, 2)                            # (B,R,T,S,5)

    # ------------------------------- features -----------------------------

    def geometry_features(self, src, traj, train):
        """src: (B, R, T, S, 5); traj: (B, T, R, C) -> proxy features
        (B*R, T*P, C_hidden) + proxy points (B*R, T*P, 3)."""
        cfg = self.model_cfg
        tc = self._tcfg()
        B, R, T, S, _ = src.shape
        P = int(tc.num_proxy_points)
        g = int(cfg.ROI_GRID_POOL.GRID_SIZE)
        hidden = int(cfg.TRANS_INPUT)
        n_radius = len(cfg.ROI_GRID_POOL.POOL_RADIUS)

        boxes = traj.transpose(0, 2, 1, 3)                     # (B, R, T, C)
        cac = corners_and_center(boxes[..., :7])               # (B,R,T,27)
        rel = jnp.repeat(src[..., :3], 9, axis=-1) \
            - cac[:, :, :, None, :]                            # (B,R,T,S,27)
        diag = jnp.linalg.norm(boxes[..., 3:6], axis=-1)       # (B,R,T)
        sph = spherical_coordinate(rel, diag[..., None, None])
        feat = jnp.concatenate([sph, src[..., 3:]], -1)        # (B,R,T,S,29)
        feat = MLP(64, hidden // n_radius, 3,
                   name="up_dimension_geometry")(feat)

        # proxy grid points of each frame's box
        proxy = proxy_points_of(boxes, g)                      # (BRT, P, 3)

        # MSG ball-query pooling points -> proxies, batched over (B*R*T)
        xyz = src[..., :3].reshape(B * R * T, S, 3)
        pvalid = jnp.any(src.reshape(B * R * T, S, 5) != 0, axis=-1)
        fts = feat.reshape(B * R * T, S, -1)
        pooled = []
        for radius, nsample, mlps in zip(cfg.ROI_GRID_POOL.POOL_RADIUS,
                                         cfg.ROI_GRID_POOL.NSAMPLE,
                                         cfg.ROI_GRID_POOL.MLPS):
            idx, in_mask = ball_query(float(radius), int(nsample), xyz,
                                      proxy, pvalid)
            g_xyz = group_points(xyz, idx) - proxy[:, :, None, :]
            gf = jnp.concatenate([g_xyz, group_points(fts, idx)], -1)
            pooled.append(_SAMLPBlock(
                tuple(mlps), name=f"pool_r{str(radius).replace('.','_')}")(
                gf, in_mask, train))
        geo = jnp.concatenate(pooled, -1)                      # (BRT, P, C)
        geo = geo.reshape(B * R, T * P, -1)
        proxy = proxy.reshape(B, R, T, P, 3).reshape(B * R, T * P, 3)
        return geo, proxy

    def motion_features(self, proxy, traj):
        """Offsets of all proxies to the CURRENT box + timestamp
        (reference get_proposal_aware_motion_feature)."""
        tc = self._tcfg()
        B, T, R = traj.shape[:3]
        P = int(tc.num_proxy_points)
        cur = traj[:, 0].reshape(B * R, -1)                    # (BR, C)
        cac = corners_and_center(cur[:, :7])                   # (BR, 27)
        rel = jnp.repeat(proxy, 9, axis=-1) - cac[:, None, :]
        diag = jnp.linalg.norm(cur[:, 3:6], axis=-1)
        sph = spherical_coordinate(rel, diag[:, None, None])
        t = jnp.arange(T, dtype=proxy.dtype) * 0.1
        tstamp = jnp.repeat(t, P)[None, :, None]
        tstamp = jnp.broadcast_to(tstamp, (sph.shape[0], T * P, 1))
        pad = jnp.zeros((sph.shape[0], T * P, 2), proxy.dtype)
        feat = jnp.concatenate([sph, pad, tstamp], -1)         # (BR,TP,30)
        return MLP(64, int(self.model_cfg.TRANS_INPUT), 3,
                   name="up_dimension_motion")(feat)

    def trajectory_branch(self, traj):
        """Canonicalized box-sequence encoder (reference
        trajectories_auxiliary_branch)."""
        B, T, R, C = traj.shape
        t = jnp.broadcast_to(
            (jnp.arange(T, dtype=traj.dtype) * 0.1)[None, :, None, None],
            (B, T, R, 1))
        seq = jnp.concatenate([traj[..., :7], t], -1)          # (B,T,R,8)
        seq = seq.at[..., 0:3].add(-seq[:, 0:1, :, 0:3])
        ry0 = seq[:, 0, :, 6]
        rot = common_utils.rotate_points_along_z(
            seq[..., 0:3].transpose(0, 2, 1, 3).reshape(B * R, T, 3),
            -ry0.reshape(-1))
        rest = seq[..., 3:].transpose(0, 2, 1, 3).reshape(B * R, T, 5)
        seq = jnp.concatenate([rot, rest], -1)
        seq = seq.at[..., 6].set(0.0)
        return SeqBoxPointNet(code_size=self._coder().code_size,
                              name="seqboxembed")(seq)

    # ------------------------------ forward -------------------------------

    @nn.compact
    def __call__(self, batch_dict, train: bool = False):
        cfg = self.model_cfg
        tc = self._tcfg()
        proposals = batch_dict["roi_boxes"]                    # (B,T,R,C)
        prop_valid = batch_dict.get(
            "roi_valid_frames",
            jnp.any(proposals[..., 3:6] != 0, axis=-1))        # (B,T,R)
        roi_scores = batch_dict["roi_scores"]                  # (B,T,R)
        roi_labels = batch_dict["roi_labels"][:, 0].astype(jnp.int32)
        B, T, R = proposals.shape[:3]

        cur = proposals[:, 0]
        traj, valid_len, match_idx = self.generate_trajectory_with_idx(
            cur, proposals, prop_valid)

        stage1_score = roi_scores[:, 0]
        if train:
            sampled = self._assign_targets_mppnet(
                cur, roi_labels, batch_dict["gt_boxes"], traj, valid_len,
                stage1_score)
            (rois, s_gt, cls_t, reg_valid, roi_labels, traj, valid_len,
             stage1_score) = sampled
            R = rois.shape[1]
        else:
            rois = cur

        points = batch_dict["points"]                          # (B,N,5)
        pmask = batch_dict["points_mask"]
        empty = ~jnp.any(jnp.abs(rois[..., 3:6]) > 1e-3, axis=-1)

        bank = None if train else batch_dict.get("bank_feats")
        if bank is not None:
            # E2E streaming (reference mppnet_memory_bank_e2e.py:360-466):
            # crop + pool ONLY the current frame; past frames reuse the
            # features cached when they were current, gathered through the
            # trajectory matching table; motion features recompute fresh.
            P = int(tc.num_proxy_points)
            src0 = self.crop_trajectory_points(points, pmask, traj[:, :1])
            geo0, _ = self.geometry_features(src0, traj[:, :1], train)
            geo0 = geo0.reshape(B, R, P, -1)                   # (B,R,P,C)

            def gather_frame(bank_bi, idx_bi, vl_bi):
                f = jnp.take(bank_bi, idx_bi, axis=0)          # (R, P, C)
                return f * vl_bi[:, None, None]

            past = jax.vmap(jax.vmap(gather_frame))(
                bank, match_idx[:, 1:], valid_len[:, 1:].astype(geo0.dtype))
            geo = jnp.concatenate([geo0[:, :, None], past.transpose(
                0, 2, 1, 3, 4)], axis=2)                       # (B,R,T,P,C)
            geo = geo.reshape(B * R, T * P, -1)
            tb = traj.transpose(0, 2, 1, 3)                    # (B,R,T,C)
            g = int(cfg.ROI_GRID_POOL.GRID_SIZE)
            proxy = proxy_points_of(tb, g).reshape(B * R, T * P, 3)
            batch_dict["bank_feats_out"] = jnp.concatenate(
                [geo0[:, None], bank[:, :-1]], axis=1)         # (B,T-1,R,P,C)
        else:
            src_pts = self.crop_trajectory_points(points, pmask, traj)
            geo, proxy = self.geometry_features(src_pts, traj, train)
        mot = self.motion_features(proxy, traj)
        src = geo + mot                                        # (BR, TP, C)
        if cfg.get("USE_TRAJ_EMPTY_MASK", True):
            src = src * (~empty).reshape(-1)[:, None, None]

        box_reg_aux, box_feat = self.trajectory_branch(traj)

        # grid positional embedding (use_grid_pos.init_type == 'index')
        g = int(cfg.ROI_GRID_POOL.GRID_SIZE)
        gz, gy, gx = jnp.meshgrid(*([jnp.arange(g, dtype=jnp.float32)] * 3),
                                  indexing="ij")
        gidx = jnp.stack([gz.reshape(-1), gy.reshape(-1), gx.reshape(-1)], 1)
        pos = MLP(256, int(cfg.TRANS_INPUT), 2,
                  name="grid_pos_embeded")(gidx)               # (P, C)

        tokens, tokens_per_layer, _ = MPPNetTransformer(
            tc, name="transformer")(src, pos)                  # (BR, G, C)

        G = int(tc.num_groups)
        hs = tokens.reshape(B * R, G * int(cfg.TRANS_INPUT))
        joint_reg = MLP(int(tc.hidden_dim),
                        self._coder().code_size, 4, name="jointembed")(
            jnp.concatenate([hs, box_feat], -1))               # (BR, code)

        class_embed = Linear(1, name="class_embed")            # shared
        cls_layers = [class_embed(t[:, 0]) for t in tokens_per_layer]
        bbox_embeds = [MLP(int(tc.hidden_dim), self._coder().code_size, 4,
                           name=f"bbox_embed_{gi}") for gi in range(G)]
        point_reg_layers = [bbox_embeds[gi](t[:, gi])
                            for gi in range(G) for t in tokens_per_layer]

        rcnn_cls = cls_layers[-1].reshape(B, R)
        box_preds = joint_reg.reshape(B, R, -1)

        if train:
            lw = cfg.LOSS_CONFIG.LOSS_WEIGHTS
            cls_stack = jnp.stack([c.reshape(B, R) for c in cls_layers])
            bce = jnp.clip(cls_stack, 0, None) - cls_stack * cls_t[None] \
                + jnp.log1p(jnp.exp(-jnp.abs(cls_stack)))
            cls_loss = bce.mean() * lw["rcnn_cls_weight"]
            reg_t = self.encode_targets(rois[..., :7], s_gt)
            from ...utils import loss_utils
            smooth = loss_utils.WeightedSmoothL1Loss(
                code_weights=lw.get("code_weights", None))
            w = reg_valid.astype(jnp.float32)

            def reg_of(p):
                return (smooth(p.reshape(B, R, -1), reg_t, w).sum()
                        / jnp.maximum(w.sum(), 1.0))

            reg_loss = reg_of(joint_reg) * lw["rcnn_reg_weight"]
            aux = sum(reg_of(p) for p in point_reg_layers) \
                / len(point_reg_layers) + reg_of(box_reg_aux)
            total = cls_loss + reg_loss + 0.5 * aux
            batch_dict["loss"] = batch_dict.get("loss", 0.0) + total
            batch_dict.setdefault("tb_dict", {}).update(
                {"rcnn_cls_loss": cls_loss, "rcnn_reg_loss": reg_loss,
                 "rcnn_aux_loss": aux})
            batch_dict["rois"] = rois
            batch_dict["roi_labels"] = roi_labels
        else:
            refined = self.decode_boxes(rois[..., :7], box_preds)
            scores = jax.nn.sigmoid(rcnn_cls)
            if cfg.get("AVG_STAGE1_SCORE", False):
                scores = jnp.sqrt(scores * jnp.clip(stage1_score, 1e-6, 1.0))
            scores = scores * (~empty)
            batch_dict["rois"] = rois
            batch_dict["final_boxes"] = refined
            batch_dict["final_scores"] = scores
            batch_dict["final_labels"] = roi_labels
            batch_dict["final_valid"] = (~empty) & (scores > 0.1)
        return batch_dict

    def _assign_targets_mppnet(self, rois, roi_labels, gt_boxes, traj,
                               valid_len, stage1_score):
        """Deterministic top-k fg/bg sampling that ALSO gathers trajectory
        slices (reference ProposalTargetLayerMPPNet, CLS_SCORE_TYPE
        'roi_iou')."""
        cfg = self.model_cfg.TARGET_CONFIG
        S = int(cfg.ROI_PER_IMAGE)
        fg_num = int(S * float(cfg.FG_RATIO))

        def one(rois_b, labels_b, gt_b, traj_b, vl_b, sc_b):
            gt = gt_b[:, :7]
            gt_cls = gt_b[:, -1].astype(jnp.int32)
            valid_gt = gt_cls > 0
            iou = boxes_iou3d(rois_b[:, :7], gt)
            same = labels_b[:, None] == gt_cls[None, :]
            iou = jnp.where(same & valid_gt[None, :], iou, 0.0)
            max_iou = iou.max(axis=1)
            gt_idx = iou.argmax(axis=1)
            fg_score = jnp.where(max_iou >= float(cfg.REG_FG_THRESH),
                                 max_iou, -1.0)
            _, fg_sel = jax.lax.top_k(fg_score, fg_num)
            bg_score = jnp.where(max_iou < float(cfg.REG_FG_THRESH),
                                 max_iou, -1.0)
            _, bg_sel = jax.lax.top_k(bg_score, S - fg_num)
            sel = jnp.concatenate([fg_sel, bg_sel])
            s_iou = max_iou[sel]
            fg_t = float(cfg.CLS_FG_THRESH)
            bg_t = float(cfg.CLS_BG_THRESH)
            cls_t = jnp.clip((s_iou - bg_t) / (fg_t - bg_t), 0, 1)
            reg_valid = s_iou >= float(cfg.REG_FG_THRESH)
            return (rois_b[sel], gt_b[gt_idx[sel]], cls_t, reg_valid,
                    labels_b[sel], traj_b[:, sel], vl_b[:, sel], sc_b[sel])

        return jax.vmap(one)(rois, roi_labels, gt_boxes, traj, valid_len,
                             stage1_score)
