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
