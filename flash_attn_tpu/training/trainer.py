"""Config-driven trainer.

Counterpart of `training/src/train.py:32` (Hydra + Lightning `train()`):
mesh setup, sharded jitted train step, checkpoint/resume with orbax
(including the data-loader state, reproducing the reference's
fault-tolerant mid-epoch resume), speed/FLOPs/norm monitoring, eval loop
with perplexity.

Run: `python -m flash_attn_tpu.training.run --config cfg.yaml [k=v ...]`.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from flash_attn_tpu.losses.cross_entropy import cross_entropy_loss
from flash_attn_tpu.models.gpt import GPTLMHeadModel, gpt_partition_specs
from flash_attn_tpu.training.callbacks import (
    FlopCount,
    NormMonitor,
    Perplexity,
    SpeedMonitor,
)
from flash_attn_tpu.training.config import TrainConfig
from flash_attn_tpu.training.data import LoaderState, make_loader
from flash_attn_tpu.training.optim import make_optimizer


class Trainer:
    def __init__(self, config: TrainConfig):
        self.config = config
        mc = config.mesh
        n = mc.data * mc.model * mc.seq
        devices = jax.devices()
        assert n <= len(devices), f"mesh needs {n} devices, have {len(devices)}"
        self.mesh = Mesh(
            np.array(devices[:n]).reshape(mc.data, mc.model, mc.seq),
            ("data", "model", "seq"),
        )
        self.multi = n > 1

        self.gpt2_config = config.model.to_gpt2_config()
        if self.multi:
            self.gpt2_config.tensor_parallel = mc.model > 1
            self.gpt2_config.attn_mesh = self.mesh
            self.gpt2_config.attn_seq_axis = "seq" if mc.seq > 1 else None
        dtype = getattr(jnp, config.model.dtype)
        self.model = GPTLMHeadModel(self.gpt2_config, dtype=dtype)

        self.loader = make_loader(config.data, config.model.vocab_size)
        ids0 = jnp.zeros((config.data.batch_size, config.data.seq_len),
                         jnp.int32)
        self.params = jax.jit(self.model.init)(
            jax.random.PRNGKey(config.trainer.seed), ids0
        )
        self.tx = make_optimizer(config.optimizer, config.scheduler,
                                 self.params)
        self.opt_state = self.tx.init(self.params)
        self.step = 0

        if self.multi:
            pspecs = gpt_partition_specs(self.params)
            put = lambda x, s: jax.device_put(x, NamedSharding(self.mesh, s))
            self.params = jax.tree_util.tree_map(put, self.params, pspecs)
            if config.optimizer.shard_optimizer_state:
                # ZeRO-1: shard adam moments over the data axis on the
                # largest dim (`ddp_zero1.py` counterpart)
                def zspec(x):
                    if x.ndim >= 2 and x.shape[0] % self.mesh.shape["data"] == 0:
                        return P("data")
                    return P()
                self.opt_state = jax.tree_util.tree_map(
                    lambda x: put(x, zspec(x)) if hasattr(x, "ndim") else x,
                    self.opt_state,
                )
        self._build_steps()

        tokens_per_step = config.data.batch_size * config.data.seq_len
        self.speed = SpeedMonitor(tokens_per_step)
        self.flops = FlopCount(self.gpt2_config, tokens_per_step)
        self.norms = NormMonitor()
        self.perplexity = Perplexity()
        self.ckpt_dir = Path(config.trainer.checkpoint_dir).absolute()

    # ------------------------------------------------------------------
    def _build_steps(self):
        model, vocab = self.model, self.config.model.vocab_size

        def loss_fn(params, batch):
            inputs, targets = batch[:, :-1], batch[:, 1:]
            logits = model.apply(params, inputs).logits
            losses, _ = cross_entropy_loss(
                logits.reshape(-1, vocab).astype(jnp.float32),
                targets.reshape(-1),
            )
            return jnp.mean(losses)

        tx = self.tx

        @jax.jit
        def train_step(params, opt_state, batch):
            loss, grads = jax.value_and_grad(loss_fn)(params, batch)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            gnorm = optax.global_norm(grads)
            return params, opt_state, loss, gnorm

        self._train_step = train_step
        self._eval_step = jax.jit(loss_fn)

    # ------------------------------------------------------------------
    # checkpoint / resume (orbax; `model_checkpoint.py` + fault-tolerant
    # sampler state + deterministic resume of train.py:70-80)
    def save_checkpoint(self):
        import orbax.checkpoint as ocp

        path = self.ckpt_dir / f"step_{self.step}"
        ckpter = ocp.StandardCheckpointer()
        ckpter.save(
            path / "state",
            {
                "params": self.params,
                "opt_state": self.opt_state,
                "step": self.step,
                "loader": self.loader.state.to_dict(),
            },
            force=True,
        )
        ckpter.wait_until_finished()

    def maybe_resume(self) -> bool:
        import orbax.checkpoint as ocp

        if not self.ckpt_dir.exists():
            return False
        steps = sorted(
            int(p.name.split("_")[1])
            for p in self.ckpt_dir.glob("step_*")
            if (p / "state").exists()
        )
        if not steps:
            return False
        path = self.ckpt_dir / f"step_{steps[-1]}" / "state"
        ckpter = ocp.StandardCheckpointer()
        target = {
            "params": self.params,
            "opt_state": self.opt_state,
            "step": 0,
            "loader": self.loader.state.to_dict(),
        }
        restored = ckpter.restore(path, target)
        self.params = restored["params"]
        self.opt_state = restored["opt_state"]
        self.step = int(restored["step"])
        self.loader.state = LoaderState.from_dict(restored["loader"])
        return True

    # ------------------------------------------------------------------
    def train(self, log_fn=print):
        tc = self.config.trainer
        if tc.resume:
            if self.maybe_resume():
                log_fn(f"resumed from step {self.step}")
        with self.mesh:
            while self.step < tc.max_steps:
                batch = jnp.asarray(next(self.loader))
                self.params, self.opt_state, loss, gnorm = self._train_step(
                    self.params, self.opt_state, batch
                )
                self.step += 1
                stats = self.speed.step()
                if self.step % tc.log_every == 0 or self.step == tc.max_steps:
                    loss = float(loss)
                    self.perplexity.update(
                        loss * batch.size, batch.size
                    )
                    msg = {
                        "step": self.step,
                        "loss": round(loss, 4),
                        "grad_norm": round(float(gnorm), 3),
                        "ppl": round(self.perplexity.compute(), 2),
                    }
                    if stats:
                        msg["tokens_per_s"] = int(stats["tokens_per_s"])
                        msg["TFLOPs"] = round(
                            self.flops.tflops(stats["steps_per_s"]), 1
                        )
                    log_fn(msg)
                if tc.eval_every and self.step % tc.eval_every == 0:
                    log_fn({"step": self.step, "eval_loss": self.evaluate()})
                if tc.checkpoint_every and self.step % tc.checkpoint_every == 0:
                    self.save_checkpoint()
        return float(loss)

    def evaluate(self) -> float:
        tc = self.config.trainer
        losses = []
        for _ in range(tc.eval_steps):
            batch = jnp.asarray(next(self.loader))
            losses.append(float(self._eval_step(self.params, batch)))
        return float(np.mean(losses))


def train(config: TrainConfig, log_fn=print) -> float:
    """`training/src/train.py:32` entry point."""
    return Trainer(config).train(log_fn=log_fn)
