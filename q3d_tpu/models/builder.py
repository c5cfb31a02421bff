"""Registry-of-registries model builder.

Parity with reference ``pcdet/models/__init__.py:16`` (``build_network``) and
the per-family ``__init__`` registries.  ``load_data_to_device`` replaces
``load_data_to_gpu:23`` — it device_puts the numeric batch entries (or shards
them over a mesh when one is active, see ``q3d_tpu.parallel``).
"""

import jax
import jax.numpy as jnp
import numpy as np


def _vfe_registry():
    from .backbones_3d import vfe
    return {
        "MeanVFE": vfe.MeanVFE,
        "PillarVFE": vfe.PillarVFE,
        "DynamicMeanVFE": vfe.DynamicMeanVFE,
        "DynamicPillarVFE": vfe.DynamicPillarVFE,
        "DynamicVoxelVFE": vfe.DynamicVoxelVFE,
        "ImageVFE": vfe.ImageVFE,
    }


def _backbone_3d_registry():
    from . import backbones_3d
    return {
        "VoxelBackBone8x": backbones_3d.VoxelBackBone8x,
        "VoxelResBackBone8x": backbones_3d.VoxelResBackBone8x,
        "VoxelResBackBone8xVoxelNeXt": backbones_3d.VoxelResBackBone8xVoxelNeXt,
        "UNetV2": backbones_3d.UNetV2,
        "PillarBackBone8x": backbones_3d.PillarBackBone8x,
        "PillarRes18BackBone8x": backbones_3d.PillarRes18BackBone8x,
        "DSVT": backbones_3d.DSVT,
        "PointNet2MSG": backbones_3d.PointNet2MSG,
        "VoxelBackBone8xFocal": backbones_3d.VoxelBackBone8xFocal,
    }


def _map_to_bev_registry():
    from .backbones_2d import map_to_bev
    return {
        "HeightCompression": map_to_bev.HeightCompression,
        "PointPillarScatter": map_to_bev.PointPillarScatter,
        "PointPillarScatter3d": map_to_bev.PointPillarScatter3d,
        "Conv2DCollapse": map_to_bev.Conv2DCollapse,
    }


def _backbone_2d_registry():
    from . import backbones_2d
    return {
        "BaseBEVBackbone": backbones_2d.BaseBEVBackbone,
        "BaseBEVBackboneV1": backbones_2d.BaseBEVBackboneV1,
        "BaseBEVResBackbone": backbones_2d.BaseBEVResBackbone,
    }


def _dense_head_registry():
    from . import dense_heads
    return dense_heads.__all__


def build_vfe(cfg, info, dataset):
    cls = _vfe_registry()[cfg.NAME]
    kwargs = dict(model_cfg=cfg,
                  num_point_features=info["num_rawpoint_features"])
    if cfg.NAME in ("PillarVFE", "DynamicMeanVFE", "DynamicPillarVFE",
                    "DynamicVoxelVFE", "ImageVFE"):
        kwargs.update(voxel_size=tuple(dataset.voxel_size),
                      point_cloud_range=tuple(dataset.point_cloud_range))
    if cfg.NAME in ("DynamicMeanVFE", "DynamicPillarVFE",
                    "DynamicVoxelVFE", "ImageVFE"):
        kwargs.update(grid_size=tuple(int(g) for g in dataset.grid_size))
    if cfg.NAME == "DynamicPillarVFE" and cfg.get("MAX_PILLARS", None):
        kwargs.update(max_pillars=int(cfg.MAX_PILLARS))
    if cfg.NAME in ("DynamicMeanVFE", "DynamicVoxelVFE"):
        # voxel capacity: explicit MAX_VOXELS wins, else the data
        # processor's MAX_NUMBER_OF_VOXELS, else the class default
        mv = getattr(getattr(dataset, "data_processor", None),
                     "max_voxels", None)
        mv = int(cfg.get("MAX_VOXELS", mv or 60000))
        kwargs.update(max_voxels=mv)
    return cls(name="vfe", **kwargs)


def build_backbone_3d(cfg, info, dataset):
    cls = _backbone_3d_registry()[cfg.NAME]
    return cls(model_cfg=cfg, input_channels=info["num_point_features"],
               grid_size=tuple(int(g) for g in dataset.grid_size),
               voxel_size=tuple(dataset.voxel_size),
               point_cloud_range=tuple(dataset.point_cloud_range),
               name="backbone_3d")


def build_map_to_bev(cfg, info, dataset):
    cls = _map_to_bev_registry()[cfg.NAME]
    if cfg.NAME in ("PointPillarScatter", "PointPillarScatter3d"):
        return cls(model_cfg=cfg, grid_size=tuple(int(g) for g in dataset.grid_size),
                   name="map_to_bev_module")
    return cls(model_cfg=cfg, name="map_to_bev_module")


def build_backbone_2d(cfg, num_bev_features):
    cls = _backbone_2d_registry()[cfg.NAME]
    return cls(model_cfg=cfg, input_channels=num_bev_features, name="backbone_2d")


def build_dense_head(cfg, info, dataset, num_class, predict_boxes_when_training):
    cls = _dense_head_registry()[cfg.NAME]
    kwargs = dict(
        model_cfg=cfg,
        num_class=num_class if not cfg.CLASS_AGNOSTIC else 1,
        class_names=tuple(dataset.class_names),
        grid_size=tuple(int(g) for g in dataset.grid_size),
        point_cloud_range=tuple(dataset.point_cloud_range),
        predict_boxes_when_training=predict_boxes_when_training,
        # fully-sparse detectors (VoxelNeXt) feed the head straight from the
        # 3D backbone — no BEV features exist
        input_channels=info.get("num_bev_features",
                                info.get("num_point_features", 0))
        if cfg.NAME != "VoxelNeXtHead" else info["num_point_features"],
        name="dense_head",
    )
    if cfg.NAME in ("CenterHead", "VoxelNeXtHead", "TransFusionHead"):
        kwargs["voxel_size"] = tuple(dataset.voxel_size)
    return cls(**kwargs)


def build_pfe(cfg, info, dataset):
    from .backbones_3d.pfe.voxel_set_abstraction import VoxelSetAbstraction
    return VoxelSetAbstraction(
        model_cfg=cfg, voxel_size=tuple(dataset.voxel_size),
        point_cloud_range=tuple(dataset.point_cloud_range),
        num_bev_features=info.get("num_bev_features", 256),
        num_rawpoint_features=info["num_rawpoint_features"],
        name="pfe")


def build_point_head(cfg, info, dataset, num_class, predict_boxes_when_training):
    from . import dense_heads
    cls = dense_heads.__all__[cfg.NAME]
    return cls(model_cfg=cfg,
               num_class=num_class if not cfg.get("CLASS_AGNOSTIC", False) else 1,
               input_channels=info.get("num_point_features", 0),
               voxel_size=tuple(dataset.voxel_size),
               point_cloud_range=tuple(dataset.point_cloud_range),
               predict_boxes_when_training=predict_boxes_when_training,
               name="point_head")


def build_roi_head(cfg, info, dataset, num_class):
    from . import roi_heads
    cls = roi_heads.__all__[cfg.NAME]
    kwargs = dict(model_cfg=cfg, input_channels=info.get("num_point_features", 0),
                  num_class=1 if cfg.get("CLASS_AGNOSTIC", True) else num_class,
                  name="roi_head")
    if cfg.NAME in ("PartA2FCHead", "VoxelRCNNHead", "SECONDHead"):
        kwargs.update(voxel_size=tuple(dataset.voxel_size),
                      point_cloud_range=tuple(dataset.point_cloud_range))
    return cls(**kwargs)


def build_network(model_cfg, num_class, dataset):
    """dataset: DatasetInfo (or an object exposing the same attributes)."""
    from .detectors import __all__ as detector_registry
    from .detectors.detector3d_template import DatasetInfo
    if not isinstance(dataset, DatasetInfo):
        # grid/voxel geometry is absent for point-only pipelines (MPPNet)
        dataset = DatasetInfo(
            class_names=tuple(dataset.class_names),
            num_point_features=int(dataset.point_feature_encoder.num_point_features),
            grid_size=tuple(int(g) for g in dataset.grid_size)
            if dataset.grid_size is not None else (1, 1, 1),
            point_cloud_range=tuple(float(v) for v in dataset.point_cloud_range),
            voxel_size=tuple(float(v) for v in dataset.voxel_size)
            if getattr(dataset, "voxel_size", None) is not None
            else (1.0, 1.0, 1.0),
        )
    cls = detector_registry[model_cfg.NAME]
    return cls(model_cfg=model_cfg, num_class=num_class, dataset=dataset)


_DEVICE_KEYS = ("voxels", "voxel_coords", "voxel_num_points", "points",
                "points_mask", "gt_boxes", "camera_imgs", "camera2lidar",
                "camera_intrinsics")


def load_data_to_device(batch_dict, sharding=None, compute_dtype=None):
    """numpy batch -> device arrays (reference load_data_to_gpu:23).

    compute_dtype (e.g. jnp.bfloat16) casts floating-point inputs so the
    whole network runs in that precision (the TPU 'FP16 baseline' mode).
    """
    out = {}
    for k, v in batch_dict.items():
        if k == "rulebooks" and isinstance(v, dict):
            # host-planned sparse-conv rulebooks: nested pytree of int32
            out[k] = jax.tree_util.tree_map(
                lambda a: jax.device_put(jnp.asarray(a), sharding)
                if sharding is not None else jnp.asarray(a), v)
            continue
        take = k in _DEVICE_KEYS or any(
            k.startswith(p + "_") and k != "points_mask"
            for p in ("voxels", "voxel_coords", "voxel_num_points"))
        if take and isinstance(v, np.ndarray):
            arr = jnp.asarray(v)
            if compute_dtype is not None and jnp.issubdtype(arr.dtype, jnp.floating):
                arr = arr.astype(compute_dtype)
            if sharding is not None:
                arr = jax.device_put(arr, sharding)
            out[k] = arr
        else:
            out[k] = v
    return out
