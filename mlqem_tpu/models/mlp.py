"""MLP regressors (flax).

Architecture parity with the reference's torch models
(``blackwater/library/learning/mlp.py:18-108``):

* :class:`MLP1` — Linear → ReLU → Linear (the ``h10_mlp`` 58→64→4 model)
* :class:`MLP2` — 2×(Linear+BatchNorm+ReLU+Dropout) with skip connection
* :class:`MLP3` — MLP2 plus a hidden//3 bottleneck head (the paper GNN's
  readout, ``gnn.py:199-204``)
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp


class MLP1(nn.Module):
    hidden_size: int
    output_size: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Dense(self.hidden_size)(x)
        x = nn.relu(x)
        return nn.Dense(self.output_size)(x)


class MLP2(nn.Module):
    hidden_size: int
    output_size: int
    dropout_rate: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False):
        x1 = nn.Dense(self.hidden_size)(x)
        x1 = nn.BatchNorm(use_running_average=not train)(x1)
        x1 = nn.relu(x1)
        x1 = nn.Dropout(self.dropout_rate, deterministic=not train)(x1)

        x2 = nn.Dense(self.hidden_size)(x1)
        x2 = nn.BatchNorm(use_running_average=not train)(x2)
        x2 = nn.relu(x2)
        x2 = nn.Dropout(self.dropout_rate, deterministic=not train)(x2)

        x3 = x1 + x2  # skip connection (mlp.py:61)
        return nn.Dense(self.output_size)(x3)


class MLP3(nn.Module):
    hidden_size: int
    output_size: int
    dropout_rate: float = 0.3

    @nn.compact
    def __call__(self, x, train: bool = False):
        x1 = nn.Dense(self.hidden_size)(x)
        x1 = nn.BatchNorm(use_running_average=not train)(x1)
        x1 = nn.relu(x1)
        x1 = nn.Dropout(self.dropout_rate, deterministic=not train)(x1)

        x2 = nn.Dense(self.hidden_size)(x1)
        x2 = nn.BatchNorm(use_running_average=not train)(x2)
        x2 = nn.relu(x2)
        x2 = nn.Dropout(self.dropout_rate, deterministic=not train)(x2)

        x3 = x1 + x2
        x4 = nn.Dense(self.hidden_size // 3)(x3)
        x4 = nn.relu(x4)
        x4 = nn.Dropout(self.dropout_rate, deterministic=not train)(x4)
        return nn.Dense(self.output_size)(x4)
