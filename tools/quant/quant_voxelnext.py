"""VoxelNeXt PTQ entry (reference ``quant/quant_voxelnext.py``): fully-sparse
model — 3D backbone QConv3d + sparse-2D SmoothQuant (SQSubM2d path), sparse
detection-head convs excluded."""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent.parent))
from quant_driver import run  # noqa: E402

if __name__ == "__main__":
    run("voxelnext")
