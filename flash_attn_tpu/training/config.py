"""Typed training configuration.

TPU-native replacement for the reference's Hydra YAML composition
(`training/configs/config.yaml` + ~100 experiment YAMLs): one dataclass
tree, composable from YAML files or dicts with override-merge semantics
(`experiment=...` in the reference maps to `load_config(path, overrides)`).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Optional


@dataclass
class ModelConfig:
    name: str = "gpt2-small"
    # task: "lm" (GPT + token stream) or "image" (ViT classification —
    # reference `training/src/datamodules/imagenet.py` +
    # `configs/experiment/imagenet/*` role)
    task: str = "lm"
    n_embd: int = 768
    n_layer: int = 12
    n_head: int = 12
    n_head_kv: Optional[int] = None
    vocab_size: int = 50257
    max_position_embeddings: int = 1024
    rms_norm: bool = False
    rotary_emb_fraction: float = 0.0
    activation_function: str = "gelu_new"
    residual_in_fp32: bool = True
    tie_word_embeddings: bool = True
    parallel_block: bool = False
    dtype: str = "bfloat16"
    # param storage dtype: "float32" = mixed precision (fp32 master
    # weights, Lightning precision=bf16-mixed role); "bfloat16" =
    # bf16-true (params stored bf16 end-to-end — no fp32 master copy; on
    # a 16G/819GB/s v5e chip the master-weight cast+update traffic costs
    # ~11% MFU, see docs/DESIGN.md training table)
    param_dtype: str = "float32"
    # Per-block activation checkpointing (Lightning gradient_checkpointing
    # role).  remat_policy: "none" recomputes the whole block; "dots"
    # keeps matmul outputs (cheap recompute, still frees the elementwise/
    # attention footprint).
    remat_blocks: bool = False
    remat_policy: str = "none"
    # image-task (ViT) fields
    patch_size: int = 16
    image_size: int = 224
    num_classes: int = 1000
    global_pool: str = "token"
    mlp_ratio: float = 4.0

    def to_gpt2_config(self):
        from transformers import GPT2Config

        cfg = GPT2Config(
            n_embd=self.n_embd, n_layer=self.n_layer, n_head=self.n_head,
            vocab_size=self.vocab_size,
            n_positions=self.max_position_embeddings,
            activation_function=self.activation_function,
            resid_pdrop=0.0, embd_pdrop=0.0, attn_pdrop=0.0,
        )
        cfg.rms_norm = self.rms_norm
        cfg.rotary_emb_fraction = self.rotary_emb_fraction
        cfg.residual_in_fp32 = self.residual_in_fp32
        cfg.tie_word_embeddings = self.tie_word_embeddings
        cfg.parallel_block = self.parallel_block
        if self.n_head_kv:
            cfg.n_head_kv = self.n_head_kv
        cfg.remat_blocks = self.remat_blocks
        cfg.remat_policy = self.remat_policy
        return cfg


@dataclass
class OptimizerConfig:
    name: str = "adamw"
    lr: float = 6e-4
    weight_decay: float = 0.1
    beta1: float = 0.9
    beta2: float = 0.95
    eps: float = 1e-8
    grad_clip: float = 1.0
    # ZeRO-style optimizer-state sharding over the data axis
    shard_optimizer_state: bool = False
    # ZeRO stage: 0 = auto (1 if shard_optimizer_state else 0),
    # 1 = shard adam moments over the data axis (`ddp_zero1.py`),
    # 2 = additionally shard the fp32 gradient accumulator + optimizer
    # math over the data axis via reduce-scatter, all-gathering params
    # after the update (`training/src/utils/ddp_zero2.py` counterpart)
    zero_stage: int = 0


@dataclass
class SchedulerConfig:
    # cosine | linear | constant | step | multistep | invsqrt | poly | plateau
    name: str = "cosine"
    warmup_steps: int = 100
    decay_steps: int = 10000
    min_lr_ratio: float = 0.1
    gamma: float = 0.1               # step / multistep / plateau factor
    step_size: int = 0               # step (0 = decay_steps // 3)
    milestones: Optional[list] = None  # multistep
    power: float = 1.0               # poly
    plateau_patience: int = 3        # plateau: evals without improvement
    plateau_min_delta: float = 0.0


@dataclass
class DataConfig:
    dataset: str = "synthetic"  # synthetic | <path to token .npy/.bin>
    seq_len: int = 1024
    batch_size: int = 8
    seed: int = 0
    # HF-datasets / local-text datamodule (language_modeling_hf.py role);
    # set hf_dataset or text_files to activate
    hf_dataset: Optional[str] = None
    hf_config: Optional[str] = None
    text_files: Optional[list] = None
    tokenizer: str = "gpt2"            # HF tokenizer name or "bytes"
    detokenizer: Optional[str] = None  # e.g. "wikitext"
    max_examples: int = 0
    cache_dir: str = ".hf_token_cache"
    # image task: side length fed to the model (defaults to the model's
    # image_size); dataset = "synthetic" | .npz / array-shard path |
    # ImageFolder directory (see training/vision_data.py)
    image_size: Optional[int] = None
    augment: bool = True


@dataclass
class MeshConfig:
    data: int = 1
    model: int = 1
    seq: int = 1
    # multi-host: number of DCN (cross-host) slices of the data axis; the
    # effective data-parallel degree is dcn_data * data.  model/seq stay
    # inside each host's ICI domain (see parallel/mesh.make_hybrid_mesh).
    dcn_data: int = 1


@dataclass
class TrainerConfig:
    max_steps: int = 100
    log_every: int = 10
    eval_every: int = 0
    eval_steps: int = 10
    checkpoint_every: int = 0
    checkpoint_dir: str = "checkpoints"
    resume: bool = True
    seed: int = 0
    # EMA of params (0 = off; `callbacks/ema.py` counterpart)
    ema_decay: float = 0.0
    # loggers: stdout | jsonl | csv | tensorboard (logger-zoo counterpart)
    loggers: Optional[list] = None
    out_dir: str = "runs"
    # chunked LM-head cross-entropy: tokens per chunk (0 = unchunked)
    ce_chunk_tokens: int = 16384
    # gradient accumulation: micro-batches per optimizer update (Lightning
    # `accumulate_grad_batches` role in the reference recipes' global-batch
    # math, e.g. `configs/experiment/owt/gpt2s-flash.yaml`)
    accumulate_grad_batches: int = 1


@dataclass
class TrainConfig:
    model: ModelConfig = field(default_factory=ModelConfig)
    optimizer: OptimizerConfig = field(default_factory=OptimizerConfig)
    scheduler: SchedulerConfig = field(default_factory=SchedulerConfig)
    data: DataConfig = field(default_factory=DataConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)
    trainer: TrainerConfig = field(default_factory=TrainerConfig)


def _merge(dc, overrides: dict):
    for k, v in overrides.items():
        if not hasattr(dc, k):
            raise KeyError(f"unknown config key {k!r} for {type(dc).__name__}")
        cur = getattr(dc, k)
        if dataclasses.is_dataclass(cur) and isinstance(v, dict):
            _merge(cur, v)
        else:
            setattr(dc, k, v)
    return dc


def load_config(path: Optional[str] = None, overrides: Optional[dict] = None,
                base: Optional[TrainConfig] = None) -> TrainConfig:
    """Compose a TrainConfig from an optional YAML file + dict overrides
    (the Hydra-compose analogue)."""
    cfg = base or TrainConfig()
    if path is not None:
        import yaml

        with open(path) as f:
            _merge(cfg, yaml.safe_load(f) or {})
    if overrides:
        _merge(cfg, overrides)
    return cfg
