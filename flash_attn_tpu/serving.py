"""Continuous-batching serving engine.

The reference ships a single-sequence/static-batch decode loop
(`flash_attn/utils/generation.py:99`) with CUDA-graph replay; production
serving (the BASELINE north star) needs *continuous batching*: requests of
different lengths admitted into and retired from a running decode batch
without stopping it.  There is no reference blueprint for this — the design
below is TPU-native:

* **Fixed-slot decode batch** — XLA wants static shapes, so the decode
  batch is `max_batch` slots; a slot is a row of every layer's KV cache.
  Inactive slots still step (masked), trading a little wasted compute for
  zero recompilation — the TPU analogue of CUDA-graph-friendly persistent
  batches.
* **Chunked scheduling** — the decode loop runs `chunk_steps` tokens per
  jit call (`lax.scan` inside), then syncs to the host once to retire
  finished requests and admit new ones.  One host round-trip per chunk, not
  per token (the remote-tunnel latency would otherwise dominate).
* **Bucketed prefill** — prompts are right-padded to power-of-two buckets
  so the prefill jit cache stays small; the padded tail is overwritten by
  the first decode tokens.
* Per-request greedy/temperature sampling, EOS and max-token stopping.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from flash_attn_tpu.modules.mha import InferenceParams
from flash_attn_tpu.utils.generation import sample


@dataclasses.dataclass
class Request:
    prompt: Any  # list[int] / np.ndarray
    max_new_tokens: int = 64
    eos_token_id: Optional[int] = None
    top_k: int = 1
    temperature: float = 1.0
    # filled by the engine
    uid: int = -1
    output: list = dataclasses.field(default_factory=list)
    done: bool = False


@dataclasses.dataclass
class EngineStats:
    admitted: int = 0
    finished: int = 0
    decode_steps: int = 0
    prefill_tokens: int = 0
    generated_tokens: int = 0


class ServingEngine:
    """Continuous batcher over a cached-decode model.

    apply_fn(params, input_ids, inference_params) -> object with `.logits`
    and `.inference_params` (the `GenerationMixin` contract).
    """

    def __init__(
        self,
        apply_fn: Callable,
        params,
        *,
        max_batch: int = 8,
        max_seqlen: int = 2048,
        chunk_steps: int = 8,
        prefill_buckets=(64, 128, 256, 512, 1024),
        rng: Optional[jax.Array] = None,
        mesh=None,
        data_axis: str = "data",
        apply_fn_draft: Optional[Callable] = None,
        params_draft=None,
        speculative_lookahead: int = 3,
    ):
        # Multi-host serving (the north-star "continuous batching of decode
        # requests across hosts"): pass a Mesh and the decode batch — every
        # per-slot array and every layer's KV cache rows — is sharded over
        # `data_axis` while params stay replicated (or TP-sharded by the
        # caller).  The jitted chunk then runs SPMD: each host advances its
        # own slots, with no cross-host traffic in the decode hot loop.
        self.mesh = mesh
        self.data_axis = data_axis
        if mesh is not None:
            n = mesh.shape[data_axis]
            if max_batch % n:
                raise ValueError(
                    f"max_batch {max_batch} must divide the '{data_axis}' "
                    f"axis size {n}")
        self.apply_fn = apply_fn
        self.params = params
        self.max_batch = max_batch
        self.max_seqlen = max_seqlen
        self.chunk_steps = chunk_steps
        self.prefill_buckets = tuple(sorted(prefill_buckets))
        self.rng = rng if rng is not None else jax.random.PRNGKey(0)

        self.pending: list[Request] = []
        self.slots: list[Optional[Request]] = [None] * max_batch
        self.stats = EngineStats()
        self._uid = 0

        # big cache state (allocated lazily after the first prefill reveals
        # the per-layer kv shapes)
        self.cache: Optional[InferenceParams] = None
        self.lengths = jnp.zeros((max_batch,), jnp.int32)
        self.last_tokens = jnp.zeros((max_batch,), jnp.int32)
        self.active = np.zeros((max_batch,), bool)
        # per-slot sampling params (host mirrors; static per chunk jit)
        self._top_k = np.ones((max_batch,), np.int32)
        self._temp = np.ones((max_batch,), np.float32)

        self._prefill_jit = {}
        self._decode_chunk_jit = None
        self._insert_jit = None

        # --- speculative decoding (draft + verify inside the engine;
        # extends the reference's b=1 `decode_speculative`,
        # `utils/generation.py:269`, to the continuous batch).  Greedy
        # verification is exact, so spec chunks run only when every
        # active request is greedy (top_k == 1); otherwise the normal
        # chunk path takes over.
        self.draft = None
        if apply_fn_draft is not None:
            assert params_draft is not None
            assert chunk_steps >= speculative_lookahead + 1, (
                "chunk_steps must cover one speculative round")
            self.draft = (apply_fn_draft, params_draft)
            self.spec_lookahead = int(speculative_lookahead)
        self.cache_draft: Optional[InferenceParams] = None
        self._prefill_draft_jit = {}
        self._spec_chunk_jit = None

    # ------------------------------------------------------------------ API

    def submit(self, prompt, max_new_tokens=64, eos_token_id=None,
               top_k=1, temperature=1.0) -> int:
        req = Request(np.asarray(prompt, np.int32), max_new_tokens,
                      eos_token_id, top_k, temperature, uid=self._uid)
        self._uid += 1
        self.pending.append(req)
        return req.uid

    def run(self):
        """Drive until every submitted request finishes; returns
        {uid: generated token list}."""
        results = {}
        while self.pending or any(s is not None for s in self.slots):
            self._admit()
            self._decode_chunk()
            for req in self._retire():
                results[req.uid] = req.output
        return results

    # ------------------------------------------------------------ internals

    def _bucket(self, n):
        for b in self.prefill_buckets:
            if n <= b:
                return b
        raise ValueError(
            f"prompt length {n} exceeds largest prefill bucket "
            f"{self.prefill_buckets[-1]}"
        )

    def _admit(self):
        # collect this wave: one request per free slot
        wave = []
        for i in range(self.max_batch):
            if self.slots[i] is not None or not self.pending:
                continue
            req = self.pending.pop(0)
            L = len(req.prompt)
            margin = self.chunk_steps + (
                self.spec_lookahead + 1 if self.draft is not None else 0)
            if L + req.max_new_tokens + margin >= self.max_seqlen:
                raise ValueError("request cannot fit max_seqlen")
            self.slots[i] = req
            wave.append((i, req))
        if not wave:
            return
        # batched prefill: all admitted prompts in ONE model call (padded
        # to a shared bucket; the per-sample real length drives the first-
        # token logits and the committed cache length)
        self._prefill_wave(wave)
        for i, req in wave:
            self.active[i] = True
            self._top_k[i] = req.top_k
            self._temp[i] = req.temperature
            self.stats.admitted += 1
            self.stats.prefill_tokens += len(req.prompt)

    def _prefill_wave(self, wave):
        lens = [len(req.prompt) for _, req in wave]
        bucket = self._bucket(max(lens))
        # pad the wave size to a power of two to bound jit variants
        n = 1
        while n < len(wave):
            n *= 2
        tokens = np.zeros((n, bucket), np.int32)
        for r, (_, req) in enumerate(wave):
            tokens[r, :lens[r]] = req.prompt
        lengths = np.asarray(lens + [1] * (n - len(wave)), np.int32)

        key = (bucket, n)
        if key not in self._prefill_jit:
            def prefill(params, toks, length):
                ip = InferenceParams(
                    max_seqlen=self.max_seqlen, max_batch_size=toks.shape[0],
                    lengths_per_sample=jnp.zeros((toks.shape[0],), jnp.int32),
                )
                out = self.apply_fn(params, toks, ip)
                logits = jnp.take_along_axis(
                    out.logits,
                    (length - 1)[:, None, None].astype(jnp.int32), axis=1,
                )[:, 0]
                return out.inference_params.key_value_memory_dict, logits

            self._prefill_jit[key] = jax.jit(prefill)
        kv_rows, logits_all = self._prefill_jit[key](
            self.params, jnp.asarray(tokens), jnp.asarray(lengths)
        )
        for r, (slot, req) in enumerate(wave):
            kv_small = jax.tree_util.tree_map(
                lambda x, r=r: x[r:r + 1], kv_rows
            )
            self._finish_prefill(slot, req, kv_small, logits_all[r:r + 1])

        if self.draft is not None:
            # the draft model prefills the same wave so its cache mirrors
            # the committed prefix (minus the trailing last-token)
            if key not in self._prefill_draft_jit:
                afd, _ = self.draft

                def prefill_d(params_d, toks):
                    ip = InferenceParams(
                        max_seqlen=self.max_seqlen,
                        max_batch_size=toks.shape[0],
                        lengths_per_sample=jnp.zeros(
                            (toks.shape[0],), jnp.int32),
                    )
                    out = afd(params_d, toks, ip)
                    return out.inference_params.key_value_memory_dict

                self._prefill_draft_jit[key] = jax.jit(prefill_d)
            kv_rows_d = self._prefill_draft_jit[key](
                self.draft[1], jnp.asarray(tokens))
            for r, (slot, _req) in enumerate(wave):
                kv_small_d = jax.tree_util.tree_map(
                    lambda x, r=r: x[r:r + 1], kv_rows_d)
                self._insert_draft_row(slot, kv_small_d)

    def _finish_prefill(self, slot, req, kv_small, logits):
        L = len(req.prompt)

        if self.cache is None:
            def alloc(x):
                z = jnp.zeros((self.max_batch,) + x.shape[1:], x.dtype)
                return self._shard_batch(z)

            kv_big = {
                li: tuple(alloc(x) for x in kv)
                for li, kv in kv_small.items()
            }
            self.cache = InferenceParams(
                max_seqlen=self.max_seqlen, max_batch_size=self.max_batch,
                lengths_per_sample=self.lengths,
                key_value_memory_dict=kv_big,
            )

        if self._insert_jit is None:
            def insert(big, small, slot_):
                return jax.tree_util.tree_map(
                    lambda bg, sm: jax.lax.dynamic_update_slice(
                        bg, sm.astype(bg.dtype),
                        (slot_,) + (0,) * (bg.ndim - 1)),
                    big, small,
                )

            self._insert_jit = jax.jit(insert)
        kv = self._insert_jit(
            self.cache.key_value_memory_dict, kv_small, slot
        )
        self.cache = self.cache.replace(key_value_memory_dict=kv)
        self.lengths = self.lengths.at[slot].set(L)
        tok0 = int(jnp.argmax(logits[0]).astype(jnp.int32)) \
            if req.top_k == 1 else int(sample(
                logits, self._next_rng(), req.top_k,
                temperature=req.temperature)[0])
        self.last_tokens = self.last_tokens.at[slot].set(tok0)
        req.output.append(tok0)
        self.stats.generated_tokens += 1

    def _insert_draft_row(self, slot, kv_small_d):
        if self.cache_draft is None:
            def alloc(x):
                z = jnp.zeros((self.max_batch,) + x.shape[1:], x.dtype)
                return self._shard_batch(z)

            kv_big = {
                li: tuple(alloc(x) for x in kv)
                for li, kv in kv_small_d.items()
            }
            self.cache_draft = InferenceParams(
                max_seqlen=self.max_seqlen, max_batch_size=self.max_batch,
                lengths_per_sample=self.lengths,
                key_value_memory_dict=kv_big,
            )
        kv = self._insert_jit(
            self.cache_draft.key_value_memory_dict, kv_small_d, slot)
        self.cache_draft = self.cache_draft.replace(
            key_value_memory_dict=kv)

    def _shard_batch(self, x):
        """Place a leading-batch array sharded over the data axis."""
        if self.mesh is None:
            return x
        from jax.sharding import NamedSharding, PartitionSpec as P

        spec = P(self.data_axis, *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(self.mesh, spec))

    def _next_rng(self):
        self.rng, sub = jax.random.split(self.rng)
        return sub

    def _decode_chunk(self):
        if not any(self.active):
            return
        if self.draft is not None and all(
                self._top_k[i] == 1
                for i in range(self.max_batch) if self.active[i]):
            return self._decode_chunk_spec()
        if self._decode_chunk_jit is None:
            K = self.chunk_steps

            def chunk(params, kv, last, lengths, active, rng, top_k, temp):
                def step(carry, _):
                    kv, last, lengths, rng = carry
                    ip = InferenceParams(
                        max_seqlen=self.max_seqlen,
                        max_batch_size=self.max_batch,
                        lengths_per_sample=lengths,
                        key_value_memory_dict=kv,
                    )
                    out = self.apply_fn(params, last[:, None], ip)
                    logits = out.logits[:, -1].astype(jnp.float32)
                    rng, sub = jax.random.split(rng)
                    greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                    sampled = jax.random.categorical(
                        sub,
                        _filter_topk_rows(logits / temp[:, None], top_k),
                        axis=-1,
                    ).astype(jnp.int32)
                    nxt = jnp.where(top_k == 1, greedy, sampled)
                    nxt = jnp.where(active, nxt, last)
                    lengths = lengths + active.astype(jnp.int32)
                    return (out.inference_params.key_value_memory_dict,
                            nxt, lengths, rng), nxt

                (kv, last, lengths, rng), toks = jax.lax.scan(
                    step, (kv, last, lengths, rng), None, length=K
                )
                return kv, last, lengths, rng, toks

            self._decode_chunk_jit = jax.jit(chunk, donate_argnums=(1,))

        kv, last, lengths, self.rng, toks = self._decode_chunk_jit(
            self.params, self.cache.key_value_memory_dict,
            self._shard_batch(self.last_tokens),
            self._shard_batch(self.lengths),
            self._shard_batch(jnp.asarray(self.active)), self.rng,
            self._shard_batch(jnp.asarray(self._top_k)),
            self._shard_batch(jnp.asarray(self._temp)),
        )
        self.cache = self.cache.replace(key_value_memory_dict=kv)
        self.last_tokens = last
        self.lengths = lengths
        self.stats.decode_steps += self.chunk_steps

        toks_host = np.asarray(toks)  # (K, B) — the one host sync per chunk
        for i in range(self.max_batch):
            req = self.slots[i]
            if req is None or not self.active[i]:
                continue
            for t in toks_host[:, i]:
                req.output.append(int(t))
                self.stats.generated_tokens += 1
                if ((req.eos_token_id is not None
                     and int(t) == req.eos_token_id)
                        or len(req.output) >= req.max_new_tokens):
                    req.done = True
                    break

    def _decode_chunk_spec(self):
        """Speculative chunk: R rounds of draft-propose (L tokens) +
        one-shot target verify, batched over the slots.  Greedy
        acceptance is exact, so outputs are identical to the normal
        greedy chunk.  Caches rewind by LENGTH only — rejected rows are
        overwritten by the next round's writes (functional caches; the
        same rewind scheme as `utils/generation.py:decode_speculative`).

        Cache invariant at every round start: both caches hold every
        committed token except the trailing `last` (count == lengths).
        The draft loop runs L+1 steps — the extra step absorbs its own
        last proposal so the invariant survives full acceptance."""
        L = self.spec_lookahead
        if self._spec_chunk_jit is None:
            R = max(1, self.chunk_steps // (L + 1))
            afd, _ = self.draft

            def chunk(params, params_d, kv, kv_d, last, lengths, active):
                def greedy(logits):
                    return jnp.argmax(
                        logits.astype(jnp.float32), -1).astype(jnp.int32)

                def round_fn(carry, _):
                    kv, kv_d, last, lengths = carry
                    # --- draft proposes L tokens (plus one absorb step)
                    dl = lengths
                    cur = last
                    drafts = []
                    for i in range(L + 1):
                        ip_d = InferenceParams(
                            max_seqlen=self.max_seqlen,
                            max_batch_size=self.max_batch,
                            lengths_per_sample=dl,
                            key_value_memory_dict=kv_d,
                        )
                        out_d = afd(params_d, cur[:, None], ip_d)
                        kv_d = out_d.inference_params.key_value_memory_dict
                        dl = dl + 1
                        cur = greedy(out_d.logits[:, -1])
                        if i < L:
                            drafts.append(cur)
                    drafts = jnp.stack(drafts, 1)            # (b, L)
                    # --- target verifies [last | drafts] in ONE forward
                    toks = jnp.concatenate([last[:, None], drafts], 1)
                    ip = InferenceParams(
                        max_seqlen=self.max_seqlen,
                        max_batch_size=self.max_batch,
                        lengths_per_sample=lengths,
                        key_value_memory_dict=kv,
                    )
                    out = self.apply_fn(params, toks, ip)
                    kv = out.inference_params.key_value_memory_dict
                    g = greedy(out.logits)                   # (b, L+1)
                    ok = (drafts == g[:, :-1]).astype(jnp.int32)
                    na = jnp.sum(jnp.cumprod(ok, axis=1), axis=1)  # (b,)
                    commit = jnp.where(active, na + 1, 0)
                    new_last = jnp.where(
                        active, jnp.take_along_axis(
                            g, na[:, None], axis=1)[:, 0], last)
                    lengths = lengths + commit
                    emitted = jnp.where(
                        (jnp.arange(L + 1)[None, :] <= na[:, None])
                        & active[:, None], g, -1)
                    return (kv, kv_d, new_last, lengths), (emitted, commit)

                (kv, kv_d, last, lengths), (toks, counts) = jax.lax.scan(
                    round_fn, (kv, kv_d, last, lengths), None, length=R)
                return kv, kv_d, last, lengths, toks, counts

            self._spec_chunk_jit = jax.jit(chunk, donate_argnums=(2, 3))
            self._spec_rounds = R

        kv, kv_d, last, lengths, toks, counts = self._spec_chunk_jit(
            self.params, self.draft[1],
            self.cache.key_value_memory_dict,
            self.cache_draft.key_value_memory_dict,
            self._shard_batch(self.last_tokens),
            self._shard_batch(self.lengths),
            self._shard_batch(jnp.asarray(self.active)),
        )
        self.cache = self.cache.replace(key_value_memory_dict=kv)
        self.cache_draft = self.cache_draft.replace(
            key_value_memory_dict=kv_d)
        self.last_tokens = last
        self.lengths = lengths
        self.stats.decode_steps += self._spec_rounds

        toks_host = np.asarray(toks)      # (R, B, L+1)
        counts_host = np.asarray(counts)  # (R, B)
        for i in range(self.max_batch):
            req = self.slots[i]
            if req is None or not self.active[i]:
                continue
            for r in range(toks_host.shape[0]):
                if req.done:
                    break
                for t in toks_host[r, i, : counts_host[r, i]]:
                    req.output.append(int(t))
                    self.stats.generated_tokens += 1
                    if ((req.eos_token_id is not None
                         and int(t) == req.eos_token_id)
                            or len(req.output) >= req.max_new_tokens):
                        req.done = True
                        break

    def _retire(self):
        retired = []
        for i in range(self.max_batch):
            req = self.slots[i]
            if req is None:
                continue
            if req.done or len(req.output) >= req.max_new_tokens:
                # truncate anything generated past eos/max inside the chunk
                if req.eos_token_id is not None \
                        and req.eos_token_id in req.output:
                    req.output = req.output[
                        :req.output.index(req.eos_token_id) + 1]
                req.output = req.output[:req.max_new_tokens]
                req.done = True
                retired.append(req)
                self.slots[i] = None
                self.active[i] = False
                self.stats.finished += 1
        return retired


def _filter_topk_rows(logits, top_k):
    """Per-row top-k filtering with row-specific k (vector form of
    `modify_logits_for_top_k_filtering`)."""
    vocab = logits.shape[-1]
    sorted_desc = -jnp.sort(-logits, axis=-1)
    k = jnp.clip(top_k, 1, vocab)
    kth = jnp.take_along_axis(sorted_desc, (k - 1)[:, None], axis=-1)
    return jnp.where(logits < kth, -jnp.inf, logits)
