"""CLI eval entry point — interface-parity with reference test.py:47-55.

Usage: python test.py --config_path configs/lego.yaml
(consumes the nested ``test_params`` section, like the reference)
"""

import argparse

from nerf_simple_tpu.config import load_yaml
from nerf_simple_tpu.evaluate import test

if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="NeRF scene")
    parser.add_argument(
        "--config_path",
        type=str,
        default="configs/lego.yaml",
        help="path to YAML config (reference schema)",
    )
    args = parser.parse_args()
    test(load_yaml(args.config_path)["test_params"])
