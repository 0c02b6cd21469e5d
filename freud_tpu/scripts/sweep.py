"""SAE sweep CLI: per-layer or hyperparameter grid.

Per-layer (config has ``layer_names``): one SAE per layer store trained
simultaneously (freud_tpu.train.sweep.train_sweep — the batched counterpart
of running the reference's train_sae once per layer)::

    {
      "data_path": "activations/multilayer",
      "layer_names": ["encoder.blocks.0", "encoder.blocks.1"],
      "variant": "l1",
      "autoencoder_config": {"n_dict_components": 64, "recon_alpha": 1e4},
      "steps": 1000, "batch_size": 8, "out_dir": "runs/sweep"
    }

Hyperparameter grid (config has ``grid`` + a single ``layer_name``): every
combination trains as a model in one vmapped step over ONE store
(train_hparam_sweep; ``k`` values compile one program per group)::

    {
      "data_path": "activations/tiny",
      "layer_name": "encoder.blocks.2",
      "variant": "topk",
      "autoencoder_config": {"expansion_factor": 16},
      "grid": {"lr": [1e-4, 4e-4], "k": [16, 32], "auxk_alpha": [0.03125]},
      "steps": 1000, "batch_size": 8, "out_dir": "runs/grid"
    }

Usage: python -m freud_tpu.scripts.sweep --config sweep.json
"""

from __future__ import annotations

import argparse
import json

from ..train.sweep import train_hparam_sweep, train_sweep


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config", type=str, required=True,
                        help="Path to sweep configuration file")
    args = parser.parse_args(argv)
    with open(args.config) as f:
        config = json.load(f)
    if "grid" in config:
        if "layer_names" in config:
            raise SystemExit(
                "a grid sweep runs over ONE store: use layer_name (string), "
                "not layer_names")
        stats = train_hparam_sweep(**config)
    else:
        stats = train_sweep(**config)
    print(json.dumps(stats))


if __name__ == "__main__":
    main()
