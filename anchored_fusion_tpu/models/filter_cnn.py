"""The CNN+Transformer false-positive filter in Flax.

Architecture parity with the reference's PyTorch ``Model`` (Model.py:110-131):

  embed Linear(6->256) + ReLU
  -> Block(conv3x256 + BatchNorm + ReLU, conv3x256 + ReLU, AvgPool/3)   x2
  -> 1-layer TransformerEncoder (hidden 128, 2 heads, learned positional
     embedding, FF 2048/ReLU — torch TransformerEncoderLayer defaults)
  -> three softmax Classify heads with temperatures 0.25 / 0.25 / 1
     (Model.py:126-130)

and the deep-supervision loss (Model.py:30-44): the heads emit *probabilities*
(softmax applied inside the head), the reference then feeds those
probabilities straight into CrossEntropyLoss — a double-softmax we reproduce
exactly — plus KL(final || aux) distillation of each aux head toward the
final head.

TPU note: runs in float32 (the reference trains in float64, Model.py:302;
SURVEY §7.3 item 6 sets verdict-level parity at the 0.1/0.9 thresholds, not
bit-exactness).
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from anchored_fusion_tpu.config import FilterModelConfig


class MLP2(nn.Module):
    mid_dim: int
    out_dim: int
    dropout: float = 0.2

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Dense(self.mid_dim)(x)
        x = nn.relu(x)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = nn.Dense(self.out_dim)(x)
        return x


class ConvBlock(nn.Module):
    """Conv -> BatchNorm -> ReLU -> Conv -> ReLU -> AvgPool/stride."""

    block_dim: int
    out_dim: int
    window: int
    pool: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.block_dim, (self.window,), padding=self.window // 2)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5)(x)
        x = nn.relu(x)
        x = nn.Conv(self.out_dim, (self.window,), padding=self.window // 2)(x)
        x = nn.relu(x)
        x = nn.avg_pool(x, (self.pool,), strides=(self.pool,))
        return x


class Classify(nn.Module):
    shrink: int
    class_dim: int
    num_class: int
    temperature: float = 1.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = x.shape[-1]
        x = nn.Dense(d // self.shrink)(x)
        x = x.reshape(x.shape[0], -1)
        x = MLP2(self.class_dim, self.num_class, dropout=0.2)(x, train)
        return jax.nn.softmax(x / self.temperature, axis=-1)


class EncoderLayer(nn.Module):
    """torch nn.TransformerEncoderLayer parity (post-norm, ReLU FF 2048)."""

    hidden: int
    heads: int
    ff_dim: int = 2048

    @nn.compact
    def __call__(self, x):
        a = nn.MultiHeadDotProductAttention(
            num_heads=self.heads, qkv_features=self.hidden)(x, x)
        x = nn.LayerNorm()(x + a)
        f = nn.Dense(self.ff_dim)(x)
        f = nn.relu(f)
        f = nn.Dense(self.hidden)(f)
        x = nn.LayerNorm()(x + f)
        return x


class FilterModel(nn.Module):
    cfg: FilterModelConfig

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.cfg
        len_seq = x.shape[1]
        x = nn.relu(nn.Dense(c.embed_dim)(x))
        x = ConvBlock(c.block_dim, c.embed_dim, c.window, c.maxpool_dim)(x, train)
        out1 = Classify(c.class_shrink_dim, c.class_dim, c.num_class,
                        c.aux_temperature)(x, train)
        x = ConvBlock(c.block_dim, c.embed_dim, c.window, c.maxpool_dim)(x, train)
        out2 = Classify(c.class_shrink_dim, c.class_dim, c.num_class,
                        c.aux_temperature)(x, train)
        # transformer with learned positional embedding (Model.py:89-108)
        t = nn.Dense(c.transformer_dim)(x)
        pos = self.param(
            "position_encoding",
            nn.initializers.normal(stddev=0.02),
            (len_seq // (c.maxpool_dim ** 2), c.transformer_dim))
        t = t + pos[None, : t.shape[1]]
        for _ in range(c.transformer_layers):
            t = EncoderLayer(c.transformer_dim, c.transformer_heads,
                             c.transformer_ff)(t)
        t = nn.relu(t)
        out3 = Classify(c.class_shrink_dim, c.class_dim, c.num_class, 1.0)(t, train)
        return (out1, out2), out3


def deep_supervision_loss(outputs: Tuple[Any, Any], final: jnp.ndarray,
                          y: jnp.ndarray, a1: float = 0.5, a2: float = 0.5):
    """Loss parity (Model.py:30-44).

    The heads output probabilities; the reference applies CrossEntropyLoss to
    them directly (an implicit second softmax) and distills aux heads toward
    the final head with KL(final || aux).
    """
    def ce(probs):
        logp = jax.nn.log_softmax(probs, axis=-1)
        return -jnp.take_along_axis(logp, y[:, None], axis=1).mean()

    def kd(aux):
        # F.kl_div(log(aux), final, 'batchmean') = mean_b sum_c final*(log final - log aux)
        la = jnp.log(jnp.clip(aux, 1e-12))
        lf = jnp.log(jnp.clip(final, 1e-12))
        return (final * (lf - la)).sum(axis=-1).mean()

    o1, o2 = outputs
    return (a1 * ce(o1) + (1 - a1) * kd(o1)
            + a2 * ce(o2) + (1 - a2) * kd(o2) + ce(final))
