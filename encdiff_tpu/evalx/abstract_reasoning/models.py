"""WildRelNet abstract-reasoning models in flax.

Rebuild of ``evaluation/abstract_reasoning/models.py`` (TwoStageModel:27-123,
BaselineCNNEmbedder:127-176, OptimizedWildRelNet:211-289) and
``relational_layers.py`` (RelationalLayer:25-60, PairwiseEdgeEmbeddings:
63-72, AddPositionalEncoding:124-146, StackAnswers:149-165) — the reasoning
stage of arXiv 1905.12506 — as pure functions + one flax module, jitted
end-to-end.

TPU-first notes: the keras original loops StackAnswers in Python and wraps
per-node applications in MultiDimBatchApply reshapes; here answers and grid
nodes are folded into the batch axis once and everything is a dense
broadcast/einsum the XLA fusion pipeline handles — no per-answer dispatch.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn

Dtype = Any


def pairwise_edges(x: jnp.ndarray) -> jnp.ndarray:
    """(..., N, D) -> (..., N, N, 2D): concat of every ordered node pair
    (relational_layers.py:63-72)."""
    n = x.shape[-2]
    a = jnp.broadcast_to(x[..., :, None, :], x.shape[:-2] + (n, n, x.shape[-1]))
    b = jnp.broadcast_to(x[..., None, :, :], x.shape[:-2] + (n, n, x.shape[-1]))
    return jnp.concatenate([a, b], axis=-1)


def add_positional_encoding(x: jnp.ndarray) -> jnp.ndarray:
    """(..., N, D) -> (..., N, D+N): appends a one-hot of the node index
    (relational_layers.py:124-146)."""
    n = x.shape[-2]
    eye = jnp.broadcast_to(jnp.eye(n, dtype=x.dtype),
                           x.shape[:-1] + (n,))
    return jnp.concatenate([x, eye], axis=-1)


def stack_answers(context: jnp.ndarray, answers: jnp.ndarray) -> jnp.ndarray:
    """context (B, Nc, D) + answers (B, A, D) -> (B, A, Nc+1, D): each
    answer appended to the shared context (relational_layers.py:149-165)."""
    b, a, d = answers.shape
    ctx = jnp.broadcast_to(context[:, None], (b, a) + context.shape[1:])
    return jnp.concatenate([ctx, answers[:, :, None, :]], axis=2)


class MLP(nn.Module):
    features: Sequence[int]
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i, f in enumerate(self.features):
            x = nn.Dense(f, dtype=self.dtype,
                         kernel_init=nn.initializers.lecun_normal(),
                         name=f"dense_{i}")(x)
            x = nn.relu(x)
        return x


class WildRelNet(nn.Module):
    """Relational reasoning head (models.py:211-289): per answer, append the
    candidate to the context grid, positional-encode, run one relational
    layer (pairwise edge MLP summed back to nodes), sum nodes, score with
    the graph MLP. Returns (B, A) logits."""

    edge_mlp: Sequence[int] = (512, 512, 512, 512)
    graph_mlp: Sequence[int] = (256, 256)
    dropout_in_last_graph_layer: float = 0.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, context, answers, *, deterministic: bool = True):
        x = stack_answers(context, answers)          # (B, A, N, D)
        x = add_positional_encoding(x)
        edges = pairwise_edges(x)                    # (B, A, N, N, 2D')
        edges = MLP(self.edge_mlp, dtype=self.dtype, name="edge_mlp")(edges)
        nodes = jnp.sum(edges, axis=-2)              # (B, A, N, E)
        graph = jnp.sum(nodes, axis=-2)              # (B, A, E)
        h = MLP(self.graph_mlp, dtype=self.dtype, name="graph_mlp")(graph)
        if self.dropout_in_last_graph_layer:
            # keras noise_shape [1,1,D]: one mask shared across batch and
            # answers (models.py:254-258)
            h = nn.Dropout(self.dropout_in_last_graph_layer,
                           broadcast_dims=(0, 1))(
                               h, deterministic=deterministic)
        logits = nn.Dense(1, dtype=self.dtype,
                          kernel_init=nn.initializers.lecun_normal(),
                          name="out")(h)
        return jnp.squeeze(logits, -1)               # (B, A)


class BaselineCNNEmbedder(nn.Module):
    """4x stride-2 conv tower applied per panel (models.py:127-176);
    panels are folded into the batch axis instead of MultiDimBatchApply."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, panels):
        """(B, N, H, W, C) -> (B, N, D)."""
        b, n = panels.shape[:2]
        x = panels.reshape((b * n,) + panels.shape[2:])
        for i, ch in enumerate((32, 32, 64, 64)):
            x = nn.Conv(ch, (4, 4), strides=2, padding="SAME",
                        dtype=self.dtype,
                        kernel_init=nn.initializers.lecun_normal(),
                        name=f"conv_{i}")(x)
            x = nn.relu(x)
        return x.reshape(b, n, -1)


class TwoStageModel(nn.Module):
    """Embedding + reasoning (models.py:27-123). ``embedding`` selects the
    panel representation:
      - 'values'  : features['*_factor_values'] (range-embedded factors)
      - 'onehot'  : features['*_factors_onehot']
      - 'cnn'     : BaselineCNNEmbedder over raw panels
    A pretrained representation (the HubEmbedding case) is handled by
    precomputing embeddings into the feature dict under '*_factor_values'.
    """

    embedding: str = "onehot"
    edge_mlp: Sequence[int] = (512, 512, 512, 512)
    graph_mlp: Sequence[int] = (256, 256)
    dropout_in_last_graph_layer: float = 0.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, features, *, deterministic: bool = True):
        if self.embedding == "values":
            ctx = features["context_factor_values"]
            ans = features["answers_factor_values"]
        elif self.embedding == "onehot":
            ctx = features["context_factors_onehot"]
            ans = features["answers_factors_onehot"]
        elif self.embedding == "cnn":
            emb = BaselineCNNEmbedder(dtype=self.dtype, name="embedder")
            ctx = emb(features["context"])
            ans = emb(features["answers"])
        else:
            raise ValueError(f"unknown embedding {self.embedding!r}")
        net = WildRelNet(self.edge_mlp, self.graph_mlp,
                         self.dropout_in_last_graph_layer,
                         dtype=self.dtype, name="wildrelnet")
        return net(ctx.astype(self.dtype), ans.astype(self.dtype),
                   deterministic=deterministic)


def build_train_state(model: TwoStageModel, sample_features, rng,
                      learning_rate: float = 1e-3):
    params = model.init(rng, sample_features, deterministic=True)["params"]
    tx = optax.adam(learning_rate)
    return {"params": params, "opt": tx.init(params)}, tx


def build_train_step(model: TwoStageModel, tx):
    """One jitted CE step (models.py:98-122 model_fn TRAIN branch)."""

    @jax.jit
    def step(state, features, labels, rng):
        def loss_fn(p):
            logits = model.apply({"params": p}, features,
                                 deterministic=False,
                                 rngs={"dropout": rng})
            ce = optax.softmax_cross_entropy_with_integer_labels(
                logits, labels)
            acc = jnp.mean(jnp.argmax(logits, -1) == labels)
            return ce.mean(), acc

        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state["params"])
        updates, opt = tx.update(grads, state["opt"], state["params"])
        params = optax.apply_updates(state["params"], updates)
        return {"params": params, "opt": opt}, {"loss": loss,
                                                "accuracy": acc}

    return step


def build_eval_step(model: TwoStageModel):
    @jax.jit
    def step(state, features, labels):
        logits = model.apply({"params": state["params"]}, features,
                             deterministic=True)
        return jnp.mean(jnp.argmax(logits, -1) == labels)

    return step
