"""CLI: `python -m flash_attn_tpu.training.run [--config cfg.yaml] [a.b=c ...]`
(counterpart of the reference's `python run.py experiment=...` Hydra CLI)."""

from __future__ import annotations

import argparse
import ast


def parse_overrides(kvs):
    out = {}
    for kv in kvs:
        key, _, val = kv.partition("=")
        try:
            val = ast.literal_eval(val)
        except (ValueError, SyntaxError):
            pass
        d = out
        parts = key.split(".")
        for p in parts[:-1]:
            d = d.setdefault(p, {})
        d[parts[-1]] = val
    return out


def main(argv=None):
    # multi-host bring-up must happen before any other JAX use (no-op
    # when no coordinator is configured; see parallel/mesh.py)
    from flash_attn_tpu.parallel.mesh import initialize_distributed

    initialize_distributed()

    from flash_attn_tpu.training.config import load_config
    from flash_attn_tpu.training.trainer import train

    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default=None)
    ap.add_argument("overrides", nargs="*")
    args = ap.parse_args(argv)
    cfg = load_config(args.config, parse_overrides(args.overrides))
    return train(cfg)


if __name__ == "__main__":
    main()
