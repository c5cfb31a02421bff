"""CenterPoint PTQ entry (reference ``quant/quant_centerpoint.py``):
hybrid dynamic/static W8A8 with SmoothQuant alpha=0.5, heads + first sparse
conv excluded.  All flags shared with the generic driver."""
from quant_driver import run

if __name__ == "__main__":
    run("centerpoint")
