"""BevFusion detector (reference ``detectors/bevfusion.py``, 101 LoC):
camera branch (SwinTransformer -> GeneralizedLSSFPN -> DepthLSSTransform)
fused with the LiDAR BEV (ConvFuser) before the 2D backbone + CenterHead.
"""

import flax.linen as nn
import jax.numpy as jnp

from .detector3d_template import Detector3DTemplate
from ..backbones_image.swin import SwinTransformer
from ..backbones_image.img_neck import GeneralizedLSSFPN
from ..backbones_image.depth_lss import DepthLSSTransform
from ..layers import Conv2d, BatchNorm, relu


class ConvFuser(nn.Module):
    """Concat-conv fusion of camera+lidar BEV maps (reference
    backbones_2d/fuser/convfuser.py, 32 LoC)."""
    out_channels: int

    @nn.compact
    def __call__(self, lidar_bev, img_bev, train=False):
        # align spatial sizes (camera BEV grid may differ from lidar stride-8)
        if img_bev.shape[1:3] != lidar_bev.shape[1:3]:
            import jax
            img_bev = jax.image.resize(
                img_bev, (*lidar_bev.shape[:3], img_bev.shape[-1]), "bilinear")
        x = jnp.concatenate([lidar_bev, img_bev], axis=-1)
        x = Conv2d(self.out_channels, 3, 1, 1, use_bias=False, name="conv")(x)
        return relu(BatchNorm(name="norm")(x, train))


class BevFusion(Detector3DTemplate):

    def setup(self):
        modules, info = self.build_networks()
        self.vfe = modules["vfe"]
        self.backbone_3d = modules["backbone_3d"]
        self.map_to_bev_module = modules["map_to_bev_module"]
        self.backbone_2d = modules["backbone_2d"]
        self.dense_head = modules["dense_head"]
        cfg = self.model_cfg
        self.image_backbone = SwinTransformer(cfg.IMAGE_BACKBONE,
                                              name="image_backbone")
        self.neck = GeneralizedLSSFPN(cfg.NECK, name="neck")
        self.vtransform = DepthLSSTransform(
            cfg.VTRANSFORM,
            point_cloud_range=tuple(self.dataset.point_cloud_range),
            name="vtransform")
        self.fuser = ConvFuser(int(cfg.FUSER.OUT_CHANNEL), name="fuser")

    def __call__(self, batch_dict, train: bool = False):
        # camera branch
        imgs = batch_dict["camera_imgs"]           # (B, Ncam, H, W, 3)
        B, N = imgs.shape[:2]
        flat = imgs.reshape(B * N, *imgs.shape[2:])
        stage_feats = self.image_backbone(flat, train)
        fpn = self.neck(stage_feats, train)
        batch_dict["image_fpn_features"] = fpn[0]
        batch_dict = self.vtransform(batch_dict, train)

        # lidar branch
        batch_dict = self.vfe(batch_dict, train)
        batch_dict = self.backbone_3d(batch_dict, train)
        batch_dict = self.map_to_bev_module(batch_dict, train)

        fused = self.fuser(batch_dict["spatial_features"],
                           batch_dict["spatial_features_img"], train)
        batch_dict["spatial_features"] = fused
        batch_dict = self.backbone_2d(batch_dict, train)
        batch_dict = self.dense_head(batch_dict, train)
        return batch_dict
