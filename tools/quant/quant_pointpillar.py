"""PointPillars PTQ entry: dense-pillar variant of the shared PTQ driver."""
from quant_driver import run

if __name__ == "__main__":
    run("pointpillar")
