"""TransFusion PTQ entry (reference ``quant/quant_transfusion.py``): backbone
QConv3d + SmoothQuant over Conv2d/Conv1d/Linear (the cross-attention decoder),
attention out-projections and prediction-head output convs excluded."""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent.parent))
from quant_driver import run  # noqa: E402

if __name__ == "__main__":
    run("transfusion")
