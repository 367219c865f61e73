"""Training loops: Adam + ReduceLROnPlateau + checkpointing.

The reference's training harness (``docs/tutorials/__ml_models.py:100-263``
``train_gnn``; ``h10_mlp.ipynb`` MLP loop): Adam, MSE loss,
ReduceLROnPlateau on validation loss, ``state_dict`` checkpoints, loss-curve
history. Here: jitted train steps, optax with host-side plateau scheduling
(hyperparam injection), flax serialization checkpoints (load_state_dict
parity for the finetuning workflow, ``h08_finetuning``).
"""
from __future__ import annotations

import os
import pickle
import random
from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import flax
import jax
import jax.numpy as jnp
import numpy as np
import optax
from ..utils.rng import prng_key


def fix_random_seed(seed: int = 0):
    """Full determinism (``mlp.py:112-121`` parity, minus torch/cudnn)."""
    random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)
    np.random.seed(seed)
    print(f"random seed fixed to {seed}")
    return prng_key(seed)


def save_checkpoint(path: str, variables, extra: Optional[dict] = None):
    payload = {"variables": flax.serialization.to_bytes(variables),
               "extra": extra or {}}
    with open(path, "wb") as f:
        pickle.dump(payload, f)


def load_checkpoint(path: str, template_variables):
    with open(path, "rb") as f:
        payload = pickle.load(f)
    variables = flax.serialization.from_bytes(
        template_variables, payload["variables"])
    return variables, payload.get("extra", {})


class PlateauScheduler:
    """Host-side ReduceLROnPlateau (torch semantics: factor, patience)."""

    def __init__(self, factor: float = 0.5, patience: int = 15,
                 min_lr: float = 1e-5):
        self.factor = factor
        self.patience = patience
        self.min_lr = min_lr
        self.best = np.inf
        self.bad_epochs = 0

    def step(self, val_loss: float, lr: float) -> float:
        if val_loss < self.best - 1e-12:
            self.best = val_loss
            self.bad_epochs = 0
            return lr
        self.bad_epochs += 1
        if self.bad_epochs > self.patience:
            self.bad_epochs = 0
            return max(lr * self.factor, self.min_lr)
        return lr


def _split_train_val(n: int, val_fraction: float, rng: np.random.Generator):
    idx = rng.permutation(n)
    n_val = max(1, int(n * val_fraction)) if val_fraction > 0 else 0
    return idx[n_val:], idx[:n_val]


def train_model(model, inputs_fn: Callable[[Dict[str, np.ndarray], Any], tuple],
                data: Dict[str, np.ndarray], y: np.ndarray,
                num_epochs: int = 100, batch_size: int = 32,
                learning_rate: float = 1e-3, val_fraction: float = 0.1,
                seed: int = 0, plateau: Optional[PlateauScheduler] = None,
                checkpoint_path: Optional[str] = None,
                verbose: bool = False):
    """Generic supervised trainer.

    Args:
        model: flax module whose __call__ accepts ``*inputs_fn(batch)`` plus
            ``train=`` kwarg.
        inputs_fn: maps a data-dict batch to the model's positional args.
        data: dict of equal-leading-dim arrays.
        y: targets [B] or [B, K].

    Returns:
        (variables, history) — history has train/val loss curves.
    """
    rng = np.random.default_rng(seed)
    key = prng_key(seed)
    y = np.asarray(y, np.float32)
    if y.ndim == 1:
        y = y[:, None]
    n = y.shape[0]
    tr_idx, va_idx = _split_train_val(n, val_fraction, rng)
    plateau = plateau or PlateauScheduler()

    example = {k: v[:1] for k, v in data.items()}
    key, init_key, drop_key = jax.random.split(key, 3)
    variables = model.init({"params": init_key, "dropout": drop_key},
                           *inputs_fn(example, np), train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})

    tx = optax.inject_hyperparams(optax.adam)(learning_rate=learning_rate)
    opt_state = tx.init(params)

    has_bn = bool(batch_stats)

    @jax.jit
    def train_step(params, batch_stats, opt_state, batch, yb, dropout_key):
        def loss_fn(p):
            vars_in = {"params": p}
            if has_bn:
                vars_in["batch_stats"] = batch_stats
            out = model.apply(vars_in, *inputs_fn(batch, jnp), train=True,
                              rngs={"dropout": dropout_key},
                              mutable=["batch_stats"] if has_bn else [])
            preds, mutated = out if has_bn else (out[0], {})
            loss = jnp.mean((preds - yb) ** 2)
            return loss, mutated.get("batch_stats", batch_stats)

        (loss, new_bs), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_bs, opt_state, loss

    @jax.jit
    def eval_step(params, batch_stats, batch, yb):
        vars_in = {"params": params}
        if has_bn:
            vars_in["batch_stats"] = batch_stats
        preds = model.apply(vars_in, *inputs_fn(batch, jnp), train=False)
        return jnp.mean((preds - yb) ** 2)

    history = {"train_loss": [], "val_loss": [], "lr": []}
    lr = learning_rate
    best_val = np.inf
    best_variables = None

    # Keep the dataset device-resident for the whole run: per-step host
    # slicing re-ships every batch (the dense-adjacency GNN batches are
    # 10-100MB) and per-step float(loss) forces a round-trip sync — over
    # the axon tunnel those two dominate training wall time by far. With
    # device arrays the [sel] gathers run on-chip, and deferring the loss
    # fetches to epoch end lets dispatch pipeline (one sync per epoch).
    data_dev = {k: jnp.asarray(v) for k, v in data.items()}
    y_dev = jnp.asarray(y)

    for epoch in range(num_epochs):
        opt_state.hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)
        order = rng.permutation(tr_idx)
        losses = []
        for s in range(0, len(order), batch_size):
            sel = order[s:s + batch_size]
            batch = {k: v[sel] for k, v in data_dev.items()}
            key, dk = jax.random.split(key)
            params, batch_stats, opt_state, loss = train_step(
                params, batch_stats, opt_state, batch, y_dev[sel], dk)
            losses.append(loss)
        losses = list(np.asarray(jnp.stack(losses)))  # ONE fetch/epoch
        if len(va_idx):
            val_losses = []
            for s in range(0, len(va_idx), batch_size):
                sel = va_idx[s:s + batch_size]
                batch = {k: v[sel] for k, v in data_dev.items()}
                val_losses.append(eval_step(params, batch_stats,
                                            batch, y_dev[sel]))
            val_loss = float(np.mean(np.asarray(jnp.stack(val_losses))))
        else:
            val_loss = float(np.mean(losses))
        history["train_loss"].append(float(np.mean(losses)))
        history["val_loss"].append(val_loss)
        history["lr"].append(lr)
        lr = plateau.step(val_loss, lr)
        if val_loss < best_val:
            best_val = val_loss
            out_vars = {"params": params}
            if has_bn:
                out_vars["batch_stats"] = batch_stats
            best_variables = jax.tree.map(np.asarray, out_vars)
        if verbose and epoch % 10 == 0:
            print(f"epoch {epoch}: train {history['train_loss'][-1]:.5f} "
                  f"val {val_loss:.5f} lr {lr:.2e}")

    final = best_variables if best_variables is not None else (
        {"params": params, **({"batch_stats": batch_stats} if has_bn else {})})
    if checkpoint_path:
        save_checkpoint(checkpoint_path, final,
                        {"history": history})
    return final, history


# ---------------------------------------------------------------------------
# Task-specific wrappers
# ---------------------------------------------------------------------------
def mlp_inputs(batch, _np):
    return (batch["X"],)


def train_mlp(model, X, y, **kwargs):
    """MLP/flat-feature training (``h10_mlp`` loop shape)."""
    return train_model(model, mlp_inputs, {"X": np.asarray(X, np.float32)},
                       y, **kwargs)


def gnn_inputs(batch, _np):
    from .gnn import edge_index_to_adj

    x = batch["x"]
    adj = edge_index_to_adj(jnp.asarray(batch["edge_index"]),
                            jnp.asarray(batch["edge_mask"]), x.shape[1])
    return (batch["noisy"], batch["observable"],
            batch["circuit_depth"], jnp.asarray(x), adj,
            jnp.asarray(batch["node_mask"]))


def train_gnn(model, dataset_arrays: Dict[str, np.ndarray], y=None, **kwargs):
    """GNN training on an :class:`ExpValDataset`-style array dict
    (``__ml_models.py:100-205`` ``train_gnn`` equivalent)."""
    data = dict(dataset_arrays)
    if y is None:
        y = data.pop("y")
    else:
        data.pop("y", None)
    return train_model(model, gnn_inputs, data, y, **kwargs)


def predict(model, variables, inputs_fn, data: Dict[str, np.ndarray],
            batch_size: int = 256) -> np.ndarray:
    n = next(iter(data.values())).shape[0]
    outs = []
    for s in range(0, n, batch_size):
        batch = {k: v[s:s + batch_size] for k, v in data.items()}
        outs.append(np.asarray(model.apply(variables,
                                           *inputs_fn(batch, jnp),
                                           train=False)))
    return np.concatenate(outs, axis=0)
