"""AnchorHeadSingle — 1x1 conv cls/box/dir head (reference
``dense_heads/anchor_head_single.py:7``)."""

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ..layers import Conv2d
from .anchor_head_template import AnchorHeadTemplate


class AnchorHeadSingle(AnchorHeadTemplate):
    input_channels: int = 0

    def setup(self):
        self._setup_common()
        n_anchors = sum(self.num_anchors_per_location)
        self.conv_cls = Conv2d(n_anchors * self.num_class, 1,
                               bias_init=float(-np.log((1 - 0.01) / 0.01)),
                               name="conv_cls")
        self.conv_box = Conv2d(n_anchors * self.box_coder.code_size, 1,
                               name="conv_box")
        if self.model_cfg.get("USE_DIRECTION_CLASSIFIER", None) is not None:
            self.conv_dir_cls = Conv2d(
                n_anchors * self.model_cfg.NUM_DIR_BINS, 1, name="conv_dir_cls")
        else:
            self.conv_dir_cls = None

    def __call__(self, batch_dict, train: bool = False):
        x = batch_dict["spatial_features_2d"]               # (B, H, W, C)
        cls_preds = self.conv_cls(x)                         # NHWC already
        box_preds = self.conv_box(x)
        dir_preds = self.conv_dir_cls(x) if self.conv_dir_cls is not None else None

        ret = {"cls_preds": cls_preds, "box_preds": box_preds,
               "dir_cls_preds": dir_preds}
        if train and self.target_assigner is not None:
            targets = self.target_assigner.assign_targets(
                self.anchors_list, batch_dict["gt_boxes"])
            ret.update(targets)
            batch_dict["head_ret"] = ret
            loss, tb = self.get_loss(ret)
            batch_dict["loss"] = batch_dict.get("loss", 0.0) + loss
            batch_dict["tb_dict"] = {**batch_dict.get("tb_dict", {}), **tb}

        if not train or self.predict_boxes_when_training:
            batch_cls, batch_box = self.generate_predicted_boxes(
                x.shape[0], cls_preds, box_preds, dir_preds)
            batch_dict["batch_cls_preds"] = batch_cls
            batch_dict["batch_box_preds"] = batch_box
            batch_dict["cls_preds_normalized"] = False
        return batch_dict
