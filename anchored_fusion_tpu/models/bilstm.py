"""Bi-LSTM false-positive filter variant (scFusion-style).

Parity with ``utils/scFusion_bi_LSTM.py`` (C20): Embedding(5->5) over 61-char
integer-encoded junctions, 3x bidirectional LSTM (32/64/128, sequence
outputs, dropout 0.5) + final bidirectional LSTM(256) -> Dense(256) ->
Dense(2) -> softmax; Adam 1e-4, binary cross-entropy.  (The reference script
is an offline experiment with hard-coded paths and an undefined ``model`` /
``itere`` at :177/:182 — not runnable as published; this is the working
equivalent.)

Implemented with `flax.linen.RNN` over `nn.OptimizedLSTMCell`; the sequence
axis is scanned, everything else is batched — fine for the tiny 61-step
inputs this model sees.
"""

from __future__ import annotations

from typing import List, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

CHAR_INDEX = {"A": 0, "T": 1, "G": 2, "C": 3, "H": 4}


def encode_61(lines: Sequence[str], width: int = 61) -> np.ndarray:
    """Center-crop/N-pad junction strings to 61 ints (read_lines parity)."""
    out = np.zeros((len(lines), width), np.int32)
    for i, s in enumerate(lines):
        s = s.upper().strip()
        if len(s) > width:
            mid = len(s) // 2
            s = s[mid - width // 2: mid + width // 2 + 1]
        lack = width - len(s)
        s = "N" * (lack // 2) + s + "N" * (lack - lack // 2)
        for j, ch in enumerate(s):
            out[i, j] = CHAR_INDEX.get(ch, 0)
    return out


class BiLSTM(nn.Module):
    hidden: int
    return_sequences: bool = True

    @nn.compact
    def __call__(self, x):
        fwd = nn.RNN(nn.OptimizedLSTMCell(self.hidden))(x)
        bwd = nn.RNN(nn.OptimizedLSTMCell(self.hidden), reverse=True,
                     keep_order=True)(x)
        y = jnp.concatenate([fwd, bwd], axis=-1)
        if not self.return_sequences:
            return jnp.concatenate([fwd[:, -1], bwd[:, 0]], axis=-1)
        return y


class BiLSTMFilter(nn.Module):
    @nn.compact
    def __call__(self, tokens, train: bool = False):
        x = nn.Embed(5, 5)(tokens)
        for h in (32, 64, 128):
            x = BiLSTM(h)(x)
            x = nn.Dropout(0.5, deterministic=not train)(x)
        x = BiLSTM(256, return_sequences=False)(x)
        x = nn.Dense(256)(x)
        x = nn.Dense(2)(x)
        return jax.nn.softmax(x, axis=-1)


def train_bilstm(positives: Sequence[str], negatives: Sequence[str],
                 epochs: int = 5, batch_size: int = 500, lr: float = 1e-4,
                 seed: int = 1122, verbose: bool = False):
    """Train the bi-LSTM variant; returns (variables, final probs fn)."""
    rng = np.random.default_rng(seed)
    X = np.concatenate([encode_61(list(positives)), encode_61(list(negatives))])
    y = np.concatenate([np.ones(len(positives), np.int32),
                        np.zeros(len(negatives), np.int32)])
    order = rng.permutation(len(y))
    X, y = X[order], y[order]
    model = BiLSTMFilter()
    key = jax.random.PRNGKey(seed)
    variables = model.init(key, jnp.asarray(X[:1]))
    tx = optax.adam(lr)
    opt_state = tx.init(variables["params"])

    @jax.jit
    def step(params, opt_state, xb, yb, drop):
        def loss_fn(p):
            probs = model.apply({"params": p}, xb, train=True,
                                rngs={"dropout": drop})
            onehot = jax.nn.one_hot(yb, 2)
            return -(onehot * jnp.log(jnp.clip(probs, 1e-7))).sum(-1).mean()
        loss, grads = jax.value_and_grad(loss_fn)(params)
        upd, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, upd), opt_state, loss

    params = variables["params"]
    for ep in range(epochs):
        for lo in range(0, len(y), batch_size):
            key, sub = jax.random.split(key)
            params, opt_state, loss = step(
                params, opt_state, jnp.asarray(X[lo:lo + batch_size]),
                jnp.asarray(y[lo:lo + batch_size]), sub)
        if verbose:
            print(f"bilstm epoch {ep}: loss={float(loss):.4f}")

    @jax.jit
    def predict(tokens):
        return model.apply({"params": params}, tokens)[:, 1]

    def score(lines: Sequence[str]) -> List[float]:
        return np.asarray(predict(jnp.asarray(encode_61(list(lines))))).tolist()

    return {"params": params}, score
