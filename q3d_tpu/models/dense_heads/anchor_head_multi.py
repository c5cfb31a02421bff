"""AnchorHeadMulti — grouped multi-head anchor prediction.

Parity with reference ``dense_heads/anchor_head_multi.py`` (373 LoC):
RPN_HEAD_CFGS group classes into separate conv towers (shared 3x3 stack +
1x1 cls/box/dir convs per group) over the same BEV features; per-group
predictions are re-assembled into the global anchor order so the template's
target assignment, losses, and decode apply unchanged.
"""

from typing import Any

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ..layers import Conv2d, BatchNorm, relu
from .anchor_head_template import AnchorHeadTemplate


class _HeadTower(nn.Module):
    num_convs: int
    channels: int
    out_cls: int
    out_box: int
    out_dir: int

    @nn.compact
    def __call__(self, x, train=False):
        for i in range(self.num_convs):
            x = Conv2d(self.channels, 3, 1, 1, use_bias=False,
                       name=f"conv{i}")(x)
            x = BatchNorm(name=f"norm{i}")(x, train)
            x = relu(x)
        cls = Conv2d(self.out_cls, 1, bias_init=float(-np.log(99.0)),
                     name="conv_cls")(x)
        box = Conv2d(self.out_box, 1, name="conv_box")(x)
        dir_ = Conv2d(self.out_dir, 1, name="conv_dir")(x) if self.out_dir \
            else None
        return cls, box, dir_


class AnchorHeadMulti(AnchorHeadTemplate):
    input_channels: int = 0

    def setup(self):
        self._setup_common()
        cfg = self.model_cfg
        shared_ch = int(cfg.get("SHARED_CONV_NUM_FILTER", self.input_channels))
        self.shared_conv = Conv2d(shared_ch, 3, 1, 1, use_bias=False,
                                  name="shared_conv") \
            if cfg.get("SHARED_CONV_NUM_FILTER", None) else None
        self.shared_norm = BatchNorm(name="shared_norm") \
            if self.shared_conv is not None else None

        self.head_cfgs = list(cfg.RPN_HEAD_CFGS) if cfg.get(
            "RPN_HEAD_CFGS", None) else [
            {"HEAD_CLS_NAME": list(self.class_names)}]
        towers = []
        group_info = []          # flax freezes attr lists; build locally
        for gi, head_cfg in enumerate(self.head_cfgs):
            names = [n for n in head_cfg["HEAD_CLS_NAME"]
                     if n in self.class_names]
            cls_ids = [self.class_names.index(n) for n in names]
            n_anchors = sum(self.num_anchors_per_location[i] for i in cls_ids)
            group_info.append((names, cls_ids, n_anchors))
            towers.append(_HeadTower(
                num_convs=int(cfg.get("NUM_CONVS_PER_HEAD", 1)),
                channels=shared_ch,
                out_cls=n_anchors * len(names),
                out_box=n_anchors * self.box_coder.code_size,
                out_dir=n_anchors * cfg.NUM_DIR_BINS
                if cfg.get("USE_DIRECTION_CLASSIFIER", None) else 0,
                name=f"heads_{gi}"))
        self._group_info = group_info
        self.towers = towers

    def __call__(self, batch_dict, train: bool = False):
        x = batch_dict["spatial_features_2d"]
        if self.shared_conv is not None:
            x = relu(self.shared_norm(self.shared_conv(x), train))
        B, H, W, _ = x.shape

        # assemble per-class predictions back into global anchor order
        n_class = len(self.class_names)
        cls_by_class = [None] * n_class
        box_by_class = [None] * n_class
        dir_by_class = [None] * n_class
        for (names, cls_ids, n_anchors), tower in zip(self._group_info,
                                                      self.towers):
            cls, box, dir_ = tower(x, train)
            n_names = len(names)
            cls = cls.reshape(B, H, W, n_anchors, n_names)
            box = box.reshape(B, H, W, n_anchors, self.box_coder.code_size)
            if dir_ is not None:
                dir_ = dir_.reshape(B, H, W, n_anchors,
                                    self.model_cfg.NUM_DIR_BINS)
            a0 = 0
            for li, ci in enumerate(cls_ids):
                na = self.num_anchors_per_location[ci]
                # group-local class scores become one-hot-by-class channels
                full_cls = jnp.zeros((B, H, W, na, n_class), cls.dtype)
                full_cls = full_cls.at[..., ci].set(
                    cls[:, :, :, a0:a0 + na, li])
                cls_by_class[ci] = full_cls
                box_by_class[ci] = box[:, :, :, a0:a0 + na, :]
                if dir_ is not None:
                    dir_by_class[ci] = dir_[:, :, :, a0:a0 + na, :]
                a0 += na

        cls_preds = jnp.concatenate(cls_by_class, axis=3).reshape(B, H, W, -1)
        box_preds = jnp.concatenate(box_by_class, axis=3).reshape(B, H, W, -1)
        dir_preds = jnp.concatenate(dir_by_class, axis=3).reshape(B, H, W, -1) \
            if dir_by_class[0] is not None else None

        ret = {"cls_preds": cls_preds, "box_preds": box_preds,
               "dir_cls_preds": dir_preds}
        if train and self.target_assigner is not None:
            targets = self.target_assigner.assign_targets(
                self.anchors_list, batch_dict["gt_boxes"])
            ret.update(targets)
            loss, tb = self.get_loss(ret)
            batch_dict["loss"] = batch_dict.get("loss", 0.0) + loss
            batch_dict["tb_dict"] = {**batch_dict.get("tb_dict", {}), **tb}
        if not train or self.predict_boxes_when_training:
            batch_cls, batch_box = self.generate_predicted_boxes(
                B, cls_preds, box_preds, dir_preds)
            batch_dict["batch_cls_preds"] = batch_cls
            batch_dict["batch_box_preds"] = batch_box
            batch_dict["cls_preds_normalized"] = False
        return batch_dict
