"""Graph neural networks for circuit graphs (flax, dense-adjacency).

Rebuilds the reference's PyG models (``docs/tutorials/gnn.py:70-276``) —
TransformerConv → ASAPooling → TransformerConv → ASAPooling →
global_mean_pool → concat(graph, noisy expvals, depth) → head — as masked
dense ops: attention and pooling are [B, N, N] matmuls, which map onto the
MXU instead of PyG's sparse scatter kernels. Node padding is handled with
masks throughout.

Model variants and their capacities match the reference:
``ExpValCircuitGraphModel`` (heads 3/2, linear head),
``_2`` (MLP2 head), ``_3`` (heads 5/3, MLP3 head — **the paper's GNN**),
``_4`` (inferior variant kept for parity).
"""
from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .mlp import MLP2, MLP3

_NEG = -1e9


def edge_index_to_adj(edge_index: jnp.ndarray, edge_mask: jnp.ndarray,
                      num_nodes: int) -> jnp.ndarray:
    """[B, 2, E] (+mask) → dense adjacency [B, N, N] with adj[b, dst, src]."""
    src = edge_index[:, 0, :]
    dst = edge_index[:, 1, :]
    B, E = src.shape
    adj = jnp.zeros((B, num_nodes, num_nodes), jnp.float32)
    b_idx = jnp.repeat(jnp.arange(B)[:, None], E, axis=1)
    vals = edge_mask.astype(jnp.float32)
    return adj.at[b_idx, dst, src].max(vals)


class TransformerConvDense(nn.Module):
    """Dense-masked equivalent of PyG ``TransformerConv`` (concat heads).

    out_i = W_root x_i + Σ_j α_ij W_v x_j over incoming edges j→i,
    α = softmax_j(⟨W_q x_i, W_k x_j⟩/√d); output dim = heads·channels.
    """

    channels: int
    heads: int = 1
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, adj, node_mask, train: bool = False):
        B, N, _ = x.shape
        H, C = self.heads, self.channels
        q = nn.Dense(H * C, name="q")(x).reshape(B, N, H, C)
        k = nn.Dense(H * C, name="k")(x).reshape(B, N, H, C)
        v = nn.Dense(H * C, name="v")(x).reshape(B, N, H, C)
        logits = jnp.einsum("bihc,bjhc->bhij", q, k) / np.sqrt(C)
        mask = adj[:, None, :, :] > 0           # [B, 1, N(dst), N(src)]
        mask = mask & node_mask[:, None, None, :]
        logits = jnp.where(mask, logits, _NEG)
        attn = jax.nn.softmax(logits, axis=-1)
        attn = jnp.where(mask.any(-1, keepdims=True), attn, 0.0)
        attn = nn.Dropout(self.dropout, deterministic=not train)(attn)
        agg = jnp.einsum("bhij,bjhc->bihc", attn, v).reshape(B, N, H * C)
        root = nn.Dense(H * C, name="root")(x)
        out = root + agg
        return out * node_mask[..., None]


class GCNConvDense(nn.Module):
    """Dense GCN layer: out = D^{-1/2}(A+I)D^{-1/2} X W (Kipf–Welling)."""

    channels: int

    @nn.compact
    def __call__(self, x, adj, node_mask):
        N = x.shape[1]
        a = jnp.clip(adj + jnp.eye(N, dtype=adj.dtype)[None], 0.0, 1.0)
        a = a * node_mask[:, None, :] * node_mask[:, :, None]
        deg = jnp.clip(a.sum(-1), 1e-6, None)
        dinv = jax.lax.rsqrt(deg)
        a_norm = a * dinv[:, :, None] * dinv[:, None, :]
        h = nn.Dense(self.channels)(x)
        out = jnp.einsum("bij,bjc->bic", a_norm, h)
        return out * node_mask[..., None]


class ChebConvDense(nn.Module):
    """Dense Chebyshev spectral conv of order K over the scaled Laplacian."""

    channels: int
    K: int = 3

    @nn.compact
    def __call__(self, x, adj, node_mask):
        N = x.shape[1]
        a = adj * node_mask[:, None, :] * node_mask[:, :, None]
        a = jnp.maximum(a, jnp.swapaxes(a, 1, 2))   # symmetrize
        deg = jnp.clip(a.sum(-1), 1e-6, None)
        dinv = jax.lax.rsqrt(deg)
        lap = (jnp.eye(N, dtype=a.dtype)[None]
               - a * dinv[:, :, None] * dinv[:, None, :])
        # scaled: L̃ = L − I  (λ_max ≈ 2 normalization)
        lt = lap - jnp.eye(N, dtype=a.dtype)[None]
        tx_prev = x
        tx = jnp.einsum("bij,bjc->bic", lt, x)
        out = nn.Dense(self.channels)(tx_prev)
        if self.K > 1:
            out = out + nn.Dense(self.channels)(tx)
        for _ in range(2, self.K):
            tx_next = 2 * jnp.einsum("bij,bjc->bic", lt, tx) - tx_prev
            tx_prev, tx = tx, tx_next
            out = out + nn.Dense(self.channels)(tx)
        return out * node_mask[..., None]


class SAGEConvDense(nn.Module):
    """Dense GraphSAGE (mean aggregator): W1 x + W2 · mean_{j∈N(i)} x_j."""

    channels: int

    @nn.compact
    def __call__(self, x, adj, node_mask):
        a = adj * node_mask[:, None, :]
        deg = jnp.clip(a.sum(-1, keepdims=True), 1.0, None)
        neigh = jnp.einsum("bij,bjc->bic", a, x) / deg
        out = nn.Dense(self.channels)(x) + nn.Dense(self.channels)(neigh)
        return out * node_mask[..., None]


class NgemEnsembleModel(nn.Module):
    """The ``01_ngem`` ensemble: parallel GCN / Cheb / SAGE stacks pooled
    and merged with the noisy expval, observable encoding, and depth."""

    hidden_channels: int = 16
    exp_value_size: int = 1
    dropout: float = 0.2

    @nn.compact
    def __call__(self, exp_value, observable, circuit_depth, x, adj,
                 node_mask, train: bool = False):
        B = x.shape[0]
        mask_f = node_mask.astype(jnp.float32)
        branches = []
        for conv_cls, name in ((GCNConvDense, "gcn"),
                               (ChebConvDense, "cheb"),
                               (SAGEConvDense, "sage")):
            h = conv_cls(self.hidden_channels, name=f"{name}1")(
                x, adj, node_mask)
            h = nn.relu(h)
            h = conv_cls(self.hidden_channels, name=f"{name}2")(
                h, adj, node_mask)
            h = nn.relu(h)
            branches.append(global_mean_pool(h, mask_f))
        obs_flat = observable.reshape(B, -1)
        merge = jnp.concatenate(
            branches + [exp_value.reshape(B, -1), obs_flat,
                        circuit_depth.reshape(B, 1)], axis=1)
        h = nn.Dense(self.hidden_channels * 2)(merge)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        return nn.Dense(self.exp_value_size)(h)


class LEConvDense(nn.Module):
    """Dense LEConv (ASAP's fitness scorer):
    out_i = W1 x_i + Σ_j A_ij (W2 x_i − W3 x_j)."""

    channels: int

    @nn.compact
    def __call__(self, x, adj, node_mask):
        w1 = nn.Dense(self.channels, name="w1")(x)
        w2 = nn.Dense(self.channels, name="w2")(x)
        w3 = nn.Dense(self.channels, name="w3")(x)
        deg = adj.sum(-1, keepdims=True)
        out = w1 + deg * w2 - jnp.einsum("bij,bjc->bic", adj, w3)
        return out * node_mask[..., None]


class ASAPoolingDense(nn.Module):
    """Dense ASAPooling: LEConv fitness → top-⌈ratio·N⌉ cluster selection →
    attention-weighted cluster features → coarsened adjacency S^T A S.

    Static shapes, but pooling REALLY pools: kept clusters sort to the
    front (scores descending, padding at _NEG sorts last), so the per-sample
    keep mask is a contiguous prefix of length ≤ ⌈ratio·N⌉ and the outputs
    are statically sliced to that bound. The downstream conv + pooling then
    run at N/2 — the coarsened ``SᵀAS``-style [B,N,N]@[B,N,N] matmul was
    the whole model's FLOP peak, and shrinking makes it 4× (rows/cols
    sliced) then 8× (next level) cheaper with bit-identical kept values.
    """

    channels: int
    ratio: float = 0.5

    @nn.compact
    def __call__(self, x, adj, node_mask, train: bool = False):
        B, N, C = x.shape
        # ego-network attention: cluster i's representation attends over its
        # neighbors ∪ self
        adj_self = jnp.clip(
            adj + jnp.eye(N, dtype=adj.dtype)[None], 0.0, 1.0)
        m_q = nn.Dense(self.channels, name="att_q")(x)
        m_k = nn.Dense(self.channels, name="att_k")(x)
        logits = jnp.einsum("bic,bjc->bij", m_q, m_k) / np.sqrt(self.channels)
        mask = (adj_self > 0) & node_mask[:, None, :]
        logits = jnp.where(mask, logits, _NEG)
        S = jax.nn.softmax(logits, axis=-1)
        S = jnp.where(mask.any(-1, keepdims=True), S, 0.0)   # [B, i, j]
        cluster_x = jnp.einsum("bij,bjc->bic", S, x)

        # fitness scores via LEConv, masked top-k selection
        fitness = LEConvDense(1, name="fitness")(
            cluster_x, adj, node_mask)[..., 0]
        fitness = jnp.tanh(fitness)
        scores = jnp.where(node_mask, fitness, _NEG)
        n_valid = node_mask.sum(-1)                           # [B]
        keep_counts = jnp.ceil(self.ratio * n_valid).astype(jnp.int32)
        order = jnp.argsort(-scores, axis=-1)                 # best first
        rank = jnp.argsort(order, axis=-1)
        keep = (rank < keep_counts[:, None]) & node_mask

        # gather kept clusters to the front; keep_counts ≤ n_keep always,
        # so slicing to n_keep drops only non-kept rows
        n_keep = int(np.ceil(self.ratio * N))
        perm = order                                           # [B, N]
        x_perm = jnp.take_along_axis(cluster_x * fitness[..., None],
                                     perm[:, :n_keep, None], axis=1)
        keep_perm = jnp.take_along_axis(keep, perm[:, :n_keep], axis=1)
        adj_perm = jnp.take_along_axis(
            jnp.take_along_axis(adj_self, perm[:, :, None], axis=1),
            perm[:, None, :], axis=2)
        # coarsened connectivity: clusters are adjacent if any member pair
        # is — only the kept block is needed, so slice the matmul operands
        adj2 = jnp.clip(adj_perm[:, :n_keep, :] @ adj_perm[:, :, :n_keep],
                        0.0, 1.0)
        adj2 = adj2 * keep_perm[:, :, None] * keep_perm[:, None, :]
        x_out = x_perm * keep_perm[..., None]
        return x_out, adj2, keep_perm


def global_mean_pool(x, node_mask):
    s = (x * node_mask[..., None]).sum(axis=1)
    d = jnp.maximum(node_mask.sum(axis=1, keepdims=True), 1.0)
    return s / d


class _GraphBackbone(nn.Module):
    hidden_channels: int
    heads1: int
    heads2: int

    @nn.compact
    def __call__(self, x, adj, node_mask, train: bool = False):
        h = TransformerConvDense(self.hidden_channels, self.heads1,
                                 dropout=0.1, name="transformer1")(
            x, adj, node_mask, train)
        h, adj, node_mask = ASAPoolingDense(
            self.hidden_channels * self.heads1, 0.5, name="pooling1")(
            h, adj, node_mask, train)
        h = TransformerConvDense(self.hidden_channels, self.heads2,
                                 dropout=0.1, name="transformer2")(
            h, adj, node_mask, train)
        h, adj, node_mask = ASAPoolingDense(
            self.hidden_channels * self.heads2, 0.5, name="pooling2")(
            h, adj, node_mask, train)
        return global_mean_pool(h, node_mask.astype(jnp.float32))


class ExpValCircuitGraphModel(nn.Module):
    """v1: heads 3/2, Linear+Dropout+Linear head (``gnn.py:70-122``)."""

    hidden_channels: int
    exp_value_size: int = 4
    dropout: float = 0.2

    @nn.compact
    def __call__(self, exp_value, observable, circuit_depth, x, adj,
                 node_mask, train: bool = False):
        graph = _GraphBackbone(self.hidden_channels, 3, 2,
                               name="backbone")(x, adj, node_mask, train)
        merge = jnp.concatenate(
            [graph, exp_value.reshape(x.shape[0], -1),
             circuit_depth.reshape(x.shape[0], 1)], axis=1)
        h = nn.Dense(self.hidden_channels)(merge)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        return nn.Dense(self.exp_value_size)(h)


class ExpValCircuitGraphModel2(nn.Module):
    """v2: MLP2 head (``gnn.py:126-173``)."""

    hidden_channels: int
    exp_value_size: int = 4
    dropout: float = 0.5

    @nn.compact
    def __call__(self, exp_value, observable, circuit_depth, x, adj,
                 node_mask, train: bool = False):
        graph = _GraphBackbone(self.hidden_channels, 3, 2,
                               name="backbone")(x, adj, node_mask, train)
        merge = jnp.concatenate(
            [graph, exp_value.reshape(x.shape[0], -1),
             circuit_depth.reshape(x.shape[0], 1)], axis=1)
        return MLP2(self.hidden_channels, self.exp_value_size,
                    self.dropout)(merge, train)


class ExpValCircuitGraphModel3(nn.Module):
    """v3 — the paper's GNN: heads 5/3, MLP3 head with 5× hidden
    (``gnn.py:178-224``)."""

    hidden_channels: int
    exp_value_size: int = 4
    dropout: float = 0.3

    @nn.compact
    def __call__(self, exp_value, observable, circuit_depth, x, adj,
                 node_mask, train: bool = False):
        graph = _GraphBackbone(self.hidden_channels, 5, 3,
                               name="backbone")(x, adj, node_mask, train)
        merge = jnp.concatenate(
            [graph, exp_value.reshape(x.shape[0], -1),
             circuit_depth.reshape(x.shape[0], 1)], axis=1)
        return MLP3(self.hidden_channels * 5, self.exp_value_size,
                    self.dropout)(merge, train)


class ExpValCircuitGraphModel4(nn.Module):
    """v4: like v3 but MLP3 hidden = hidden_channels (``gnn.py:229-276``)."""

    hidden_channels: int
    exp_value_size: int = 4
    dropout: float = 0.3

    @nn.compact
    def __call__(self, exp_value, observable, circuit_depth, x, adj,
                 node_mask, train: bool = False):
        graph = _GraphBackbone(self.hidden_channels, 5, 3,
                               name="backbone")(x, adj, node_mask, train)
        merge = jnp.concatenate(
            [graph, exp_value.reshape(x.shape[0], -1),
             circuit_depth.reshape(x.shape[0], 1)], axis=1)
        return MLP3(self.hidden_channels, self.exp_value_size,
                    self.dropout)(merge, train)
