"""CLI training entry point — interface-parity with reference train.py:94-102.

Usage: python train.py --config_path configs/lego.yaml
"""

import argparse

from nerf_simple_tpu.config import load_yaml
from nerf_simple_tpu.train.loop import train

if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="NeRF scene")
    parser.add_argument(
        "--config_path",
        type=str,
        default="configs/lego.yaml",
        help="path to YAML config (reference schema)",
    )
    args = parser.parse_args()
    train(load_yaml(args.config_path))
