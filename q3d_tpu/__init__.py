"""q3d_tpu — TPU-native quantized 3D object detection framework.

A from-scratch JAX/XLA/Pallas rebuild of the capability surface of
BiboyQG/Quantization-on-3D-Object-Detection (an OpenPCDet 0.6 fork with a
hybrid dynamic/static PTQ layer, "Q-LiDAR").  See /root/repo/SURVEY.md for the
component inventory this package implements.

Layer map (mirrors SURVEY.md §1, re-architected TPU-first):

  q3d_tpu.config     — YAML config system with _BASE_CONFIG_ inheritance
  q3d_tpu.utils      — box geometry / coders / losses / logging (pure JAX + numpy)
  q3d_tpu.ops        — TPU kernels: rotated IoU/NMS, sparse-conv engine,
                       voxelizer, pillar scatter, bev_pool, pointnet2
  q3d_tpu.datasets   — dataset templates, processors, augmentors, KITTI/nuScenes
  q3d_tpu.models     — detectors (flax.linen) + registry-of-registries
  q3d_tpu.quant      — PTQ layer: TensorQuantizer, calibrators, SmoothQuant,
                       module-path quantization rules
  q3d_tpu.parallel   — device mesh / sharding / distributed eval-merge
  q3d_tpu.runtime    — native (C++) host runtime: voxelizer, point IO
"""

__version__ = "0.1.0"

# Under the axon TPU tunnel, the JAX_PLATFORMS env var alone is ignored;
# honor it (and the explicit Q3D_PLATFORM pin) via jax.config, which must
# run before backend init.  Makes `JAX_PLATFORMS=cpu python tools/test.py`
# actually run on CPU.
import os as _os  # noqa: E402

_platform = _os.environ.get("Q3D_PLATFORM") or _os.environ.get(
    "JAX_PLATFORMS")
if _platform:
    import jax as _jax

    # pin only when nothing pinned it yet: an explicit in-process
    # jax.config.update wins, and re-updating after backend init would tear
    # down live backends (and any jax.distributed context)
    if _jax.config.jax_platforms is None:
        _jax.config.update("jax_platforms", _platform)

# flax converts dict-valued module fields (our EDict configs) to FrozenDict;
# give FrozenDict the same attribute-style access so cfg.MODEL.VFE works
# inside modules.  UPPERCASE config keys cannot collide with its methods.
from flax.core import FrozenDict as _FrozenDict  # noqa: E402

if not hasattr(_FrozenDict, "__getattr_patched__"):
    def _fd_getattr(self, name):
        if name.startswith("__"):
            raise AttributeError(name)
        try:
            return self[name]
        except KeyError:
            raise AttributeError(name) from None

    _FrozenDict.__getattr__ = _fd_getattr
    _FrozenDict.__getattr_patched__ = True
