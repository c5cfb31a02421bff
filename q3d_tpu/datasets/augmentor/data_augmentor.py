"""Config-queued data augmentor.

Parity with reference ``datasets/augmentor/data_augmentor.py`` (319 LoC):
``gt_sampling``, ``random_world_flip/rotation/scaling/translation``,
``DISABLE_AUG_LIST``, and the late-epoch ``disable_augmentation`` hook.
"""

from functools import partial

import numpy as np

from . import augmentor_utils


class DataAugmentor:
    def __init__(self, root_path, augmentor_configs, class_names, logger=None):
        self.root_path = root_path
        self.class_names = class_names
        self.logger = logger
        self.augmentor_configs = augmentor_configs
        self.data_augmentor_queue = []
        aug_list = augmentor_configs if isinstance(augmentor_configs, list) \
            else augmentor_configs.AUG_CONFIG_LIST
        disable = [] if isinstance(augmentor_configs, list) \
            else list(augmentor_configs.get("DISABLE_AUG_LIST", []))
        for cfg in aug_list:
            if cfg.NAME in disable:
                continue
            self.data_augmentor_queue.append(
                getattr(self, cfg.NAME)(config=cfg))

    def disable_augmentation(self, augmentor_configs):
        """Rebuild the queue with extra disables (reference :27; used by the
        late-epoch hook in train_utils)."""
        self.__init__(self.root_path, augmentor_configs, self.class_names,
                      self.logger)

    # ------------------------------ steps ---------------------------------

    def gt_sampling(self, config=None):
        from .database_sampler import DataBaseSampler
        return DataBaseSampler(root_path=self.root_path, sampler_cfg=config,
                               class_names=self.class_names, logger=self.logger)

    def random_world_flip(self, data_dict=None, config=None):
        if data_dict is None:
            return partial(self.random_world_flip, config=config)
        for axis in config.ALONG_AXIS_LIST:
            fn = getattr(augmentor_utils, f"random_flip_along_{axis}")
            data_dict["gt_boxes"], data_dict["points"], enable = fn(
                data_dict["gt_boxes"], data_dict["points"])
            data_dict[f"flip_{axis}"] = enable
        return data_dict

    def random_world_rotation(self, data_dict=None, config=None):
        if data_dict is None:
            return partial(self.random_world_rotation, config=config)
        rot_range = config.WORLD_ROT_ANGLE
        if not isinstance(rot_range, (list, tuple)):
            rot_range = [-rot_range, rot_range]
        data_dict["gt_boxes"], data_dict["points"], angle = \
            augmentor_utils.global_rotation(
                data_dict["gt_boxes"], data_dict["points"], rot_range)
        data_dict["noise_rot"] = angle
        return data_dict

    def random_world_scaling(self, data_dict=None, config=None):
        if data_dict is None:
            return partial(self.random_world_scaling, config=config)
        data_dict["gt_boxes"], data_dict["points"], scale = \
            augmentor_utils.global_scaling(
                data_dict["gt_boxes"], data_dict["points"],
                config.WORLD_SCALE_RANGE)
        data_dict["noise_scale"] = scale
        return data_dict

    def random_world_translation(self, data_dict=None, config=None):
        if data_dict is None:
            return partial(self.random_world_translation, config=config)
        data_dict["gt_boxes"], data_dict["points"], t = \
            augmentor_utils.global_translation(
                data_dict["gt_boxes"], data_dict["points"],
                config.NOISE_TRANSLATE_STD)
        return data_dict

    def random_local_translation(self, data_dict=None, config=None):
        """Per-object translation along configured axes (reference :158)."""
        if data_dict is None:
            return partial(self.random_local_translation, config=config)
        offset_range = config["LOCAL_TRANSLATION_RANGE"]
        gt_boxes, points = data_dict["gt_boxes"], data_dict["points"]
        for axis in config["ALONG_AXIS_LIST"]:
            assert axis in ("x", "y", "z")
            gt_boxes, points = getattr(
                augmentor_utils,
                f"random_local_translation_along_{axis}")(
                gt_boxes, points, offset_range)
        data_dict["gt_boxes"], data_dict["points"] = gt_boxes, points
        return data_dict

    def random_local_rotation(self, data_dict=None, config=None):
        """Per-object rotation about its own center (reference :176)."""
        if data_dict is None:
            return partial(self.random_local_rotation, config=config)
        rot_range = config["LOCAL_ROT_ANGLE"]
        if not isinstance(rot_range, (list, tuple)):
            rot_range = [-rot_range, rot_range]
        data_dict["gt_boxes"], data_dict["points"] = \
            augmentor_utils.local_rotation(
                data_dict["gt_boxes"], data_dict["points"], rot_range)
        return data_dict

    def random_local_scaling(self, data_dict=None, config=None):
        """Per-object scaling about its center (reference :193)."""
        if data_dict is None:
            return partial(self.random_local_scaling, config=config)
        data_dict["gt_boxes"], data_dict["points"] = \
            augmentor_utils.local_scaling(
                data_dict["gt_boxes"], data_dict["points"],
                config["LOCAL_SCALE_RANGE"])
        return data_dict

    def random_world_frustum_dropout(self, data_dict=None, config=None):
        """Scene-level slab dropout per direction (reference :207)."""
        if data_dict is None:
            return partial(self.random_world_frustum_dropout, config=config)
        intensity_range = config["INTENSITY_RANGE"]
        gt_boxes, points = data_dict["gt_boxes"], data_dict["points"]
        for direction in config["DIRECTION"]:
            assert direction in ("top", "bottom", "left", "right")
            gt_boxes, points = getattr(
                augmentor_utils, f"global_frustum_dropout_{direction}")(
                gt_boxes, points, intensity_range)
        data_dict["gt_boxes"], data_dict["points"] = gt_boxes, points
        return data_dict

    def random_local_frustum_dropout(self, data_dict=None, config=None):
        """Per-object slab dropout per direction (reference :226)."""
        if data_dict is None:
            return partial(self.random_local_frustum_dropout, config=config)
        intensity_range = config["INTENSITY_RANGE"]
        gt_boxes, points = data_dict["gt_boxes"], data_dict["points"]
        for direction in config["DIRECTION"]:
            assert direction in ("top", "bottom", "left", "right")
            gt_boxes, points = getattr(
                augmentor_utils, f"local_frustum_dropout_{direction}")(
                gt_boxes, points, intensity_range)
        data_dict["gt_boxes"], data_dict["points"] = gt_boxes, points
        return data_dict

    def random_local_pyramid_aug(self, data_dict=None, config=None):
        """SE-SSD pyramid dropout -> sparsify -> swap (reference :245)."""
        if data_dict is None:
            return partial(self.random_local_pyramid_aug, config=config)
        gt_boxes, points = data_dict["gt_boxes"], data_dict["points"]
        gt_boxes, points, pyramids = augmentor_utils.local_pyramid_dropout(
            gt_boxes, points, config["DROP_PROB"])
        gt_boxes, points, pyramids = augmentor_utils.local_pyramid_sparsify(
            gt_boxes, points, config["SPARSIFY_PROB"],
            config["SPARSIFY_MAX_NUM"], pyramids)
        gt_boxes, points = augmentor_utils.local_pyramid_swap(
            gt_boxes, points, config["SWAP_PROB"], config["SWAP_MAX_NUM"],
            pyramids)
        data_dict["gt_boxes"], data_dict["points"] = gt_boxes, points
        return data_dict

    def random_image_flip(self, data_dict=None, config=None):
        """Horizontal image + depth-map flip for camera models (reference
        :116; CaDDN).  Flips gt boxes in image space via the calib."""
        if data_dict is None:
            return partial(self.random_image_flip, config=config)
        for axis in config["ALONG_AXIS_LIST"]:
            assert axis == "horizontal"
            enable = np.random.rand() < 0.5
            data_dict["image_flip"] = int(enable)
            if not enable:
                continue
            if "images" in data_dict:
                data_dict["images"] = np.ascontiguousarray(
                    data_dict["images"][:, ::-1])
            if "depth_maps" in data_dict:
                data_dict["depth_maps"] = np.ascontiguousarray(
                    data_dict["depth_maps"][:, ::-1])
        return data_dict

    # ------------------------------ driver --------------------------------

    def forward(self, data_dict):
        for step in self.data_augmentor_queue:
            data_dict = step(data_dict=data_dict)
        gt = data_dict.get("gt_boxes", None)
        if gt is not None and len(gt):
            from ...utils import common_utils
            data_dict["gt_boxes"][:, 6] = common_utils.limit_period(
                data_dict["gt_boxes"][:, 6], offset=0.5, period=2 * np.pi)
        if "gt_boxes_mask" in data_dict:
            mask = data_dict.pop("gt_boxes_mask")
            data_dict["gt_boxes"] = data_dict["gt_boxes"][mask]
            data_dict["gt_names"] = data_dict["gt_names"][mask]
        return data_dict
