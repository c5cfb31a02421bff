"""SECOND PTQ entry (reference ``quant/quant_second.py``): W8A8 + SmoothQuant
with the RPN-head output convs excluded; supports 200-batch entropy-amax
static calibration."""
from quant_driver import run

if __name__ == "__main__":
    run("second")
