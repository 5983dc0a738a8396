"""Positional encodings (sinusoidal absolute + WeNet-style relative).

Parity: asr/wenet/transformer/embedding.py:25-146.  The PE table is
precomputed on host as float32 and closed over as a constant; under jit XLA
hoists it to device memory once.
"""

from __future__ import annotations

import functools
import math

import jax.numpy as jnp
import numpy as np

from reverb_tpu.models.modules import dropout


@functools.lru_cache(maxsize=16)
def pe_table(d_model: int, max_len: int = 5000) -> np.ndarray:
    """(max_len, d_model) sinusoidal table: even dims sin, odd dims cos."""
    pe = np.zeros((max_len, d_model), dtype=np.float32)
    position = np.arange(max_len, dtype=np.float32)[:, None]
    div_term = np.exp(np.arange(0, d_model, 2, dtype=np.float32)
                      * -(math.log(10000.0) / d_model))
    pe[:, 0::2] = np.sin(position * div_term)
    pe[:, 1::2] = np.cos(position * div_term)
    return pe


def abs_position_encoding(x, offset: int = 0, rate: float = 0.0, rng=None):
    """PositionalEncoding.forward: x*sqrt(d) + pe; returns (x, pos_emb).

    x: (B, T, D). pos_emb: (1, T, D).
    """
    d_model = x.shape[-1]
    T = x.shape[1]
    pe = jnp.asarray(pe_table(d_model))[None, offset:offset + T]
    pe = pe.astype(x.dtype)
    x = x * math.sqrt(d_model) + pe
    return dropout(x, rate, rng), dropout(pe, rate, rng)


def rel_position_encoding(x, offset: int = 0, rate: float = 0.0, rng=None,
                          size: int | None = None):
    """RelPositionalEncoding.forward: x*sqrt(d); pos_emb returned separately.

    `size` lets streaming callers ask for a pos_emb longer than x (cache+new).
    """
    d_model = x.shape[-1]
    T = size if size is not None else x.shape[1]
    pe = jnp.asarray(pe_table(d_model))[None, offset:offset + T]
    pe = pe.astype(x.dtype)
    x = x * math.sqrt(d_model)
    return dropout(x, rate, rng), dropout(pe, rate, rng)


def no_position_encoding(x, offset: int = 0, rate: float = 0.0, rng=None):
    pe = jnp.zeros((1, x.shape[1], x.shape[-1]), dtype=x.dtype)
    return dropout(x, rate, rng), pe
