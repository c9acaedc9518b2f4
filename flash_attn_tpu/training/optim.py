"""Optimizer + schedule construction.

Counterpart of `training/src/optim/param_grouping.py` (weight-decay
exemption for norms/biases/embeddings) and the Hydra optimizer/scheduler
groups; ZeRO-1 optimizer-state sharding (`training/src/utils/ddp_zero1.py`)
is a PartitionSpec on the optimizer pytree here — XLA shards the states
over the data axis with no wrapper class.
"""

from __future__ import annotations

import jax
import optax


def decay_mask(params):
    """True where weight decay applies: 2D+ kernels only
    (`param_grouping.py` semantics: no decay on bias/norm/embeddings)."""

    def f(path, x):
        names = "/".join(getattr(k, "key", str(k)) for k in path)
        if x.ndim < 2:
            return False
        if "embedding" in names or "wte" in names or "wpe" in names:
            return False
        return True

    return jax.tree_util.tree_map_with_path(f, params)


def make_schedule(cfg):
    if cfg.name == "constant":
        return lambda step: 1.0
    if cfg.name == "linear":
        return optax.linear_schedule(0.0, 1.0, cfg.warmup_steps)
    warmup = optax.linear_schedule(0.0, 1.0, cfg.warmup_steps)
    decay = optax.cosine_decay_schedule(
        1.0, max(cfg.decay_steps - cfg.warmup_steps, 1), alpha=cfg.min_lr_ratio
    )
    return optax.join_schedules([warmup, decay], [cfg.warmup_steps])


def make_optimizer(opt_cfg, sched_cfg, params):
    sched = make_schedule(sched_cfg)
    tx = optax.chain(
        optax.clip_by_global_norm(opt_cfg.grad_clip)
        if opt_cfg.grad_clip > 0
        else optax.identity(),
        optax.scale_by_adam(
            b1=opt_cfg.beta1, b2=opt_cfg.beta2, eps=opt_cfg.eps
        ),
        optax.add_decayed_weights(
            opt_cfg.weight_decay, mask=decay_mask(params)
        )
        if opt_cfg.weight_decay > 0
        else optax.identity(),
        optax.scale_by_schedule(lambda s: -opt_cfg.lr * sched(s)),
    )
    return tx
