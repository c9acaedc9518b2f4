"""Evaluation CLI (counterpart of `training/src/eval.py`).

Loads a checkpoint (latest under trainer.checkpoint_dir, or an explicit
--checkpoint path), runs the eval loop over the configured data and
reports loss / perplexity.  Supports --ema to evaluate the EMA weights.

Usage:
    python -m flash_attn_tpu.training.eval --config cfg.yaml \
        [--checkpoint path] [--ema] [--steps N] [a.b=c ...]
"""

from __future__ import annotations

import argparse
import json

import numpy as np


def main(argv=None):
    from flash_attn_tpu.training.config import load_config
    from flash_attn_tpu.training.run import parse_overrides
    from flash_attn_tpu.training.trainer import Trainer

    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default=None)
    ap.add_argument("--checkpoint", default=None,
                    help="explicit checkpoint step dir (default: latest)")
    ap.add_argument("--ema", action="store_true",
                    help="evaluate the EMA parameters")
    ap.add_argument("--steps", type=int, default=0,
                    help="override trainer.eval_steps")
    ap.add_argument("overrides", nargs="*")
    args = ap.parse_args(argv)

    cfg = load_config(args.config, parse_overrides(args.overrides))
    cfg.trainer.resume = False
    if args.steps:
        cfg.trainer.eval_steps = args.steps
    trainer = Trainer(cfg)
    if args.checkpoint:
        import orbax.checkpoint as ocp
        from pathlib import Path

        path = Path(args.checkpoint).absolute()
        if (path / "state").exists():
            path = path / "state"
        target = {
            "params": trainer.params,
            "opt_state": trainer.opt_state,
            "step": 0,
            "loader": trainer.loader.state.to_dict(),
            **({"ema_params": trainer.ema_params}
               if trainer.ema_params is not None else {}),
        }
        restored = ocp.StandardCheckpointer().restore(path, target)
        trainer.params = restored["params"]
        trainer.step = int(restored["step"])
        if trainer.ema_params is not None and "ema_params" in restored:
            trainer.ema_params = restored["ema_params"]
    else:
        trainer.maybe_resume()

    with trainer.mesh:
        loss = trainer.evaluate(use_ema=args.ema)
    result = {
        "step": trainer.step,
        "eval_loss": round(loss, 6),
        "perplexity": round(float(np.exp(loss)), 4),
        "ema": bool(args.ema),
    }
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
