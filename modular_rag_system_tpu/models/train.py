"""Contrastive encoder fine-tuning — the framework's training path.

The reference had no training at all (its encoders were frozen external
models); a production retrieval stack needs to fine-tune its embedder on
domain pairs.  This implements the standard recipe: symmetric InfoNCE
with in-batch negatives over (query, positive) text pairs.

TPU-native structure (the scaling-book recipe: pick a mesh, annotate
shardings, let XLA insert the collectives):

* 2-D ``(data, model)`` mesh.  The batch is sharded over ``data`` (DP);
  encoder weights are sharded over ``model`` (TP): attention heads and
  FFN hidden dim split across devices.  XLA/GSPMD inserts the
  all-gathers/reduce-scatters — including the cross-device all-gather of
  positives that in-batch negatives require (``q_emb @ p_emb.T`` over the
  globally sharded batch).
* PP is deliberately absent: a 6-layer / 384-hidden encoder fits on one
  chip many times over (SURVEY §2.7 — "PP not needed for MiniLM-class
  encoders").  SP/ring-attention is likewise unnecessary at <=512 tokens
  (chunking is the long-context strategy); EP is N/A (no MoE).
* The train step is one jitted program with donated params/opt-state.
"""

from __future__ import annotations

import functools
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


# ---------------------------------------------------------------------------
def param_spec(path: Tuple, leaf, model_axis: str = "model") -> P:
    """TP partition rule for SentenceEncoderModule parameters.

    Attention q/k/v project into (hidden, heads, head_dim): shard heads.
    FFN Dense_0 (hidden, mlp): shard mlp; Dense_1 (mlp, hidden): shard mlp
    on the input side.  Embeddings and LayerNorms are replicated.
    """
    names = [getattr(k, "key", str(k)) for k in path]
    joined = "/".join(str(n) for n in names)
    ndim = leaf.ndim if hasattr(leaf, "ndim") else 0
    if "MultiHeadDotProductAttention" in joined:
        if names[-2] in ("query", "key", "value"):
            if names[-1] == "kernel" and ndim == 3:
                return P(None, model_axis, None)
            if names[-1] == "bias" and ndim == 2:
                return P(model_axis, None)
        if names[-2] == "out":
            if names[-1] == "kernel" and ndim == 3:
                return P(model_axis, None, None)
            return P()  # out bias: replicated
    if "Dense_0" in joined:  # (hidden, mlp)
        if names[-1] == "kernel":
            return P(None, model_axis)
        return P(model_axis)
    if "Dense_1" in joined:  # (mlp, hidden)
        if names[-1] == "kernel":
            return P(model_axis, None)
        return P()
    return P()  # embeddings, layernorms, everything else: replicated


def shard_params(params, mesh: Mesh, model_axis: str = "model"):
    specs = jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, param_spec(path, leaf, model_axis)),
        params,
    )
    # COPY before sharding: the trainer's jitted step donates these
    # buffers, and device_put on already-placed arrays is a no-copy
    # alias — donation would delete the serving encoder's params out
    # from under concurrent queries (and break a second trainer built
    # over the same encoder).
    fresh = jax.tree.map(jnp.copy, params)  # device-side copy, no host trip
    return jax.device_put(fresh, specs), specs


# ---------------------------------------------------------------------------
class ContrastiveTrainer:
    """Symmetric-InfoNCE trainer over a (data, model) mesh.

    Ownership note: the trainer takes ownership of ``encoder.params`` —
    the jitted step donates its parameter buffers, so do not construct a
    second trainer over the same encoder instance; call ``sync_encoder``
    to publish trained weights back for serving.
    """

    def __init__(
        self,
        encoder,
        mesh: Mesh,
        learning_rate: float = 2e-5,
        temperature: float = 0.05,
        weight_decay: float = 0.01,
        clip_norm: float = 1.0,
        warmup_steps: int = 0,
        data_axis: str = "data",
        model_axis: str = "model",
    ) -> None:
        """``clip_norm`` global-norm gradient clipping (low-temperature
        InfoNCE scales logits by 1/temp = 20x, and unclipped early steps
        can collapse the encoder to uniform embeddings — observed at
        ~100k-fact corpora); ``warmup_steps`` linear LR warmup."""
        self.encoder = encoder
        self.mesh = mesh
        self.temperature = temperature
        self.data_axis = data_axis
        self.model_axis = model_axis
        self.learning_rate = learning_rate
        if warmup_steps > 0:
            lr_sched = optax.linear_schedule(0.0, learning_rate, warmup_steps)
        else:
            lr_sched = learning_rate
        self.tx = optax.chain(
            optax.clip_by_global_norm(clip_norm),
            optax.adamw(lr_sched, weight_decay=weight_decay),
        )
        self.params, self._param_shardings = shard_params(
            encoder.params, mesh, model_axis
        )
        self.opt_state = jax.jit(
            self.tx.init
        )(self.params)
        self.step_count = 0
        module = encoder.module
        temp = temperature
        batch_sharding = NamedSharding(mesh, P(data_axis, None))

        def loss_fn(params, q_ids, q_mask, p_ids, p_mask, valid):
            q_emb = module.apply({"params": params}, q_ids, q_mask)  # (B, d)
            p_emb = module.apply({"params": params}, p_ids, p_mask)
            logits = jnp.dot(q_emb, p_emb.T, preferred_element_type=jnp.float32) / temp
            B = logits.shape[0]
            labels = jnp.arange(B)
            # Rows padded by cycling duplicate a real (q, p) pair, so their
            # off-diagonal logit vs the original is exactly the positive's
            # logit — unmaskable noise for InfoNCE.  Mask clone columns out
            # of every other row's softmax and weight clone rows to zero.
            eye = jnp.eye(B, dtype=bool)
            clone_col = (valid[None, :] == 0) & ~eye
            n_valid = jnp.maximum(jnp.sum(valid), 1.0)

            def masked_ce(L):
                Lm = jnp.where(clone_col, -1e9, L)
                ls = optax.softmax_cross_entropy_with_integer_labels(Lm, labels)
                return jnp.sum(ls * valid) / n_valid

            loss = 0.5 * (masked_ce(logits) + masked_ce(logits.T))
            hits = (jnp.argmax(jnp.where(clone_col, -1e9, logits), axis=1) == labels)
            acc = jnp.sum(hits * valid) / n_valid
            return loss, acc

        def train_step(params, opt_state, q_ids, q_mask, p_ids, p_mask, valid):
            (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, q_ids, q_mask, p_ids, p_mask, valid
            )
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss, acc

        self._train_step = jax.jit(
            train_step,
            donate_argnums=(0, 1),
            in_shardings=(
                self._param_shardings,
                None,  # opt state: let XLA mirror the param shardings
                batch_sharding,
                batch_sharding,
                batch_sharding,
                batch_sharding,
                NamedSharding(mesh, P(data_axis)),
            ),
        )
        self._batch_sharding = batch_sharding
        self._valid_sharding = NamedSharding(mesh, P(data_axis))

    # ------------------------------------------------------------------
    def make_train_step(self):
        """The raw jitted step fn (used by __graft_entry__.dryrun_multichip)."""
        return self._train_step

    def _tokenize(self, texts: Sequence[str]):
        ids, mask = self.encoder.tokenizer.encode_batch(list(texts))
        return jnp.asarray(ids), jnp.asarray(mask)

    def step(self, queries: Sequence[str], positives: Sequence[str]):
        """One optimization step on a batch of (query, positive) pairs."""
        if len(queries) != len(positives):
            raise ValueError("queries and positives must align")
        n_data = self.mesh.shape[self.data_axis]
        n_real = len(queries)
        if n_real % n_data:
            # pad to a multiple of the data axis by cycling the batch
            # (a single slice can fall short when the batch is smaller
            # than the pad); padded clone rows are masked out of the loss
            target = -(-n_real // n_data) * n_data
            src_q, src_p = list(queries), list(positives)
            queries = [src_q[i % n_real] for i in range(target)]
            positives = [src_p[i % n_real] for i in range(target)]
        valid = (np.arange(len(queries)) < n_real).astype(np.float32)
        q_ids, q_mask = self._tokenize(queries)
        p_ids, p_mask = self._tokenize(positives)
        q_ids = jax.device_put(q_ids, self._batch_sharding)
        q_mask = jax.device_put(q_mask, self._batch_sharding)
        p_ids = jax.device_put(p_ids, self._batch_sharding)
        p_mask = jax.device_put(p_mask, self._batch_sharding)
        valid = jax.device_put(jnp.asarray(valid), self._valid_sharding)
        self.params, self.opt_state, loss, acc = self._train_step(
            self.params, self.opt_state, q_ids, q_mask, p_ids, p_mask, valid
        )
        self.step_count += 1
        return float(loss), float(acc)

    def sync_encoder(self) -> None:
        """Publish trained params back into the serving encoder.

        Publishes a COPY: the next ``step`` donates ``self.params``, which
        would otherwise delete the serving encoder's buffers mid-query."""
        self.encoder.params = jax.tree.map(jnp.copy, self.params)

    # ------------------------------------------------------------------
    # checkpoint / resume (orbax; SURVEY §5)
    def save_checkpoint(self, path: str) -> None:
        import orbax.checkpoint as ocp

        # checkpoint host copies: restore then needs no sharding metadata
        # and works on any mesh shape
        host = jax.tree.map(
            lambda x: np.asarray(x) if hasattr(x, "shape") else x,
            {
                "params": self.params,
                "opt_state": self.opt_state,
                "step": self.step_count,
            },
        )
        with ocp.PyTreeCheckpointer() as ckpt:
            ckpt.save(path, host, force=True)

    def restore_checkpoint(self, path: str) -> None:
        import orbax.checkpoint as ocp

        with ocp.PyTreeCheckpointer() as ckpt:
            restored = ckpt.restore(path)
        self.params = jax.device_put(restored["params"], self._param_shardings)
        # orbax returns plain dicts; rebuild optax's NamedTuple structure
        # from the live opt_state template
        treedef = jax.tree.structure(self.opt_state)
        leaves = jax.tree.leaves(restored["opt_state"])
        self.opt_state = jax.tree.unflatten(
            treedef, [jnp.asarray(l) for l in leaves]
        )
        self.step_count = int(restored["step"])
