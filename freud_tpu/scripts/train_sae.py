"""SAE training CLI — reference config surface (train(**config)).

Usage parity with the reference entry point (src/scripts/train_sae.py:605-615):
``python -m freud_tpu.scripts.train_sae --config configs/train/tiny_l1.json``.
The config JSON keys splat directly into freud_tpu.train.trainer.train.
"""

from __future__ import annotations

import argparse
import json

from ..train.trainer import train


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config", type=str, required=True,
                        help="Path to train configuration file")
    args = parser.parse_args(argv)
    with open(args.config) as f:
        config = json.load(f)
    stats = train(**config)
    print(json.dumps(stats))


if __name__ == "__main__":
    main()
