"""PyTorch ``state_dict`` -> Flax importer for the false-positive filter.

``--not_train_filter_model`` parity: the reference loads a pre-trained torch
checkpoint (Model.py:314-333, shipped as ``data/model.pt``).  This module
maps that checkpoint's tensors onto the Flax ``FilterModel`` parameter tree
so users can bring their existing reference-trained model.

Layout mapping (torch ``Model`` of Model.py:110-131 -> flax FilterModel):

  input_embedding            -> Dense_0
  block1.{conv1,normal_layer1,conv2}   -> ConvBlock_0.{Conv_0,BatchNorm_0,Conv_1}
  classify1.{prj,classify.fc1,fc2}     -> Classify_0.{Dense_0,MLP2_0.Dense_0,Dense_1}
  block2 / classify2                   -> ConvBlock_1 / Classify_1
  transformer.input_embedding          -> Dense_1
  transformer.position_encoding.weight -> position_encoding
  transformer.transformer_encoder.layers.0.{self_attn,norm1,linear1,linear2,norm2}
      -> EncoderLayer_0.{MultiHeadDotProductAttention_0,LayerNorm_0,Dense_0,Dense_1,LayerNorm_1}
  classify3                            -> Classify_2

Conventions: torch ``Linear.weight`` is (out, in) applied as ``x @ W.T`` ->
flax kernel is its transpose; torch ``Conv1d.weight`` is (out, in, k) ->
flax (k, in, out); torch MHA packs q/k/v as ``in_proj_weight`` (3h, h) with
head-major output ordering -> flax per-head kernels (in, heads, head_dim).
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from anchored_fusion_tpu.config import FilterModelConfig
from anchored_fusion_tpu.models.train import TrainedFilter


def _t(w) -> np.ndarray:
    return np.asarray(w, np.float32).T


def _conv(w) -> np.ndarray:
    return np.asarray(w, np.float32).transpose(2, 1, 0)


def _linear(sd, name: str) -> Dict[str, np.ndarray]:
    return {"kernel": _t(sd[f"{name}.weight"]),
            "bias": np.asarray(sd[f"{name}.bias"], np.float32)}


def _classify(sd, name: str) -> Dict:
    return {
        "Dense_0": _linear(sd, f"{name}.prj"),
        "MLP2_0": {
            "Dense_0": _linear(sd, f"{name}.classify.fc1"),
            "Dense_1": _linear(sd, f"{name}.classify.fc2"),
        },
    }


def _conv_block(sd, name: str):
    params = {
        "Conv_0": {"kernel": _conv(sd[f"{name}.conv1.weight"]),
                   "bias": np.asarray(sd[f"{name}.conv1.bias"], np.float32)},
        "BatchNorm_0": {
            "scale": np.asarray(sd[f"{name}.normal_layer1.weight"], np.float32),
            "bias": np.asarray(sd[f"{name}.normal_layer1.bias"], np.float32)},
        "Conv_1": {"kernel": _conv(sd[f"{name}.conv2.weight"]),
                   "bias": np.asarray(sd[f"{name}.conv2.bias"], np.float32)},
    }
    stats = {"BatchNorm_0": {
        "mean": np.asarray(sd[f"{name}.normal_layer1.running_mean"], np.float32),
        "var": np.asarray(sd[f"{name}.normal_layer1.running_var"], np.float32)}}
    return params, stats


def _attention(sd, name: str, heads: int) -> Dict:
    w = np.asarray(sd[f"{name}.in_proj_weight"], np.float32)   # (3h, h)
    b = np.asarray(sd[f"{name}.in_proj_bias"], np.float32)     # (3h,)
    h = w.shape[1]
    hd = h // heads
    out = {}
    for i, part in enumerate(("query", "key", "value")):
        wi = w[i * h:(i + 1) * h]                               # (h, h)
        out[part] = {"kernel": wi.T.reshape(h, heads, hd),
                     "bias": b[i * h:(i + 1) * h].reshape(heads, hd)}
    wo = np.asarray(sd[f"{name}.out_proj.weight"], np.float32)  # (h, h)
    out["out"] = {"kernel": wo.T.reshape(heads, hd, h),
                  "bias": np.asarray(sd[f"{name}.out_proj.bias"], np.float32)}
    return out


def _layer_norm(sd, name: str) -> Dict[str, np.ndarray]:
    return {"scale": np.asarray(sd[f"{name}.weight"], np.float32),
            "bias": np.asarray(sd[f"{name}.bias"], np.float32)}


def variables_from_state_dict(sd, cfg: FilterModelConfig) -> dict:
    """Flax ``{"params", "batch_stats"}`` tree from a torch state_dict."""
    sd = {k: (v.detach().cpu().numpy() if hasattr(v, "detach") else v)
          for k, v in sd.items()}
    cb0, bs0 = _conv_block(sd, "block1")
    cb1, bs1 = _conv_block(sd, "block2")
    enc = "transformer.transformer_encoder.layers.0"
    params = {
        "Dense_0": _linear(sd, "input_embedding"),
        "ConvBlock_0": cb0,
        "Classify_0": _classify(sd, "classify1"),
        "ConvBlock_1": cb1,
        "Classify_1": _classify(sd, "classify2"),
        "Dense_1": _linear(sd, "transformer.input_embedding"),
        "position_encoding": np.asarray(
            sd["transformer.position_encoding.weight"], np.float32),
        "EncoderLayer_0": {
            "MultiHeadDotProductAttention_0": _attention(
                sd, f"{enc}.self_attn", cfg.transformer_heads),
            "LayerNorm_0": _layer_norm(sd, f"{enc}.norm1"),
            "Dense_0": _linear(sd, f"{enc}.linear1"),
            "Dense_1": _linear(sd, f"{enc}.linear2"),
            "LayerNorm_1": _layer_norm(sd, f"{enc}.norm2"),
        },
        "Classify_2": _classify(sd, "classify3"),
    }
    return {"params": params,
            "batch_stats": {"ConvBlock_0": bs0, "ConvBlock_1": bs1}}


def load_torch_checkpoint(path: str, cfg: FilterModelConfig,
                          len_seq: int) -> TrainedFilter:
    """Load a reference-format ``model.pt`` checkpoint as a TrainedFilter.

    Accepts a bare state_dict or a dict containing one (both appear in the
    wild for Model.py checkpoints).
    """
    import torch
    obj = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    if "state_dict" in obj and "input_embedding.weight" not in obj:
        obj = obj["state_dict"]
    return TrainedFilter(cfg, variables_from_state_dict(obj, cfg), len_seq)
