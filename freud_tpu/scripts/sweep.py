"""Per-layer SAE sweep CLI.

Trains one SAE per layer simultaneously from a multi-layer activation
collection (freud_tpu.train.sweep.train_sweep — the batched counterpart of
running the reference's train_sae once per layer). Config JSON keys splat
into ``train_sweep``; minimally::

    {
      "data_path": "activations/multilayer",
      "layer_names": ["encoder.blocks.0", "encoder.blocks.1"],
      "variant": "l1",
      "autoencoder_config": {"n_dict_components": 64, "recon_alpha": 1e4},
      "steps": 1000, "batch_size": 8, "out_dir": "runs/sweep"
    }

Usage: python -m freud_tpu.scripts.sweep --config sweep.json
"""

from __future__ import annotations

import argparse
import json

from ..train.sweep import train_sweep


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config", type=str, required=True,
                        help="Path to sweep configuration file")
    args = parser.parse_args(argv)
    with open(args.config) as f:
        config = json.load(f)
    stats = train_sweep(**config)
    print(json.dumps(stats))


if __name__ == "__main__":
    main()
