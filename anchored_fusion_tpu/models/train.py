"""Filter-model training loop (Train_model parity, Model.py:257-312).

Adam lr=1e-4, batch 256, 30 epochs, class-balanced 70/30 split, checkpoint on
best held-out AUC.  Pass ``mesh`` to train data-parallel over its first axis:
parameters/optimizer state are replicated, each batch is device_put with the
batch axis sharded over dp, and the jitted train step lets XLA insert the
gradient psum from the input shardings (SURVEY §2.3 item 5).  Ragged tail
batches (not divisible by dp) run replicated — same numerics, no padding
rows polluting the BatchNorm statistics.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import serialization
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from anchored_fusion_tpu.config import FilterModelConfig
from anchored_fusion_tpu.models.filter_cnn import FilterModel, deep_supervision_loss
from anchored_fusion_tpu.models import data as fdata


@dataclasses.dataclass
class TrainedFilter:
    cfg: FilterModelConfig
    variables: dict
    len_seq: int
    best_auc: float = 0.0

    def save(self, path: str):
        with open(path, "wb") as fh:
            fh.write(serialization.to_bytes(self.variables))

    @classmethod
    def load(cls, path: str, cfg: FilterModelConfig, len_seq: int) -> "TrainedFilter":
        model = FilterModel(cfg)
        x0 = jnp.zeros((1, len_seq, cfg.input_dim), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), x0)
        with open(path, "rb") as fh:
            variables = serialization.from_bytes(variables, fh.read())
        return cls(cfg, variables, len_seq)


def _make_steps(cfg: FilterModelConfig):
    model = FilterModel(cfg)
    tx = optax.adam(cfg.learning_rate)

    @jax.jit
    def train_step(params, batch_stats, opt_state, x, y, rng):
        def loss_fn(p):
            (outs, final), updates = model.apply(
                {"params": p, "batch_stats": batch_stats}, x, train=True,
                mutable=["batch_stats"], rngs={"dropout": rng})
            loss = deep_supervision_loss(outs, final, y, cfg.a1, cfg.a2)
            return loss, (updates["batch_stats"], final)
        (loss, (new_bs, final)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        upd, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, upd)
        return params, new_bs, opt_state, loss, final

    @jax.jit
    def eval_step(params, batch_stats, x):
        _, final = model.apply({"params": params, "batch_stats": batch_stats}, x)
        return final

    return model, tx, train_step, eval_step


def param_shardings(mesh: Mesh, params, tp_min_width: int = 1024):
    """Tensor-parallel parameter shardings over the mesh's SECOND axis.

    Kernels whose widest dimension reaches ``tp_min_width`` (the transformer
    feed-forward pair at the default 2048 width) shard that dimension over
    mp; everything else replicates.  Same rule as the multichip dryrun
    (__graft_entry__.dryrun_multichip), promoted to the production trainer
    (SURVEY §2.3 item 5: keep the model-parallel axis available).
    """
    mp_ax = mesh.axis_names[1] if len(mesh.axis_names) > 1 else None
    mp_size = mesh.shape[mp_ax] if mp_ax else 1

    def spec(_path, leaf):
        if (mp_size > 1 and hasattr(leaf, "ndim") and leaf.ndim >= 2
                and max(leaf.shape) >= tp_min_width):
            ax = int(np.argmax(leaf.shape))
            if leaf.shape[ax] % mp_size == 0:
                s = [None] * leaf.ndim
                s[ax] = mp_ax
                return NamedSharding(mesh, P(*s))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(spec, params)


def train_filter_model(
    positives: Sequence[str],
    negatives: Sequence[str],
    cfg: Optional[FilterModelConfig] = None,
    model_file: Optional[str] = None,
    warm_start: Optional[TrainedFilter] = None,
    verbose: bool = True,
    mesh: Optional[Mesh] = None,
    tp_min_width: int = 1024,
) -> TrainedFilter:
    """Train on junction strings; returns the best-AUC checkpoint.

    With ``mesh``, batches are dp-sharded over the mesh's first axis (data
    parallelism; XLA inserts the gradient all-reduce) and parameters whose
    widest kernel dimension reaches ``tp_min_width`` are tensor-parallel
    over the mesh's second axis (:func:`param_shardings`); optimizer moments
    inherit the parameter shardings through ``tx.init``.
    """
    cfg = cfg or FilterModelConfig()
    dp = mesh.shape[mesh.axis_names[0]] if mesh is not None else 1
    if mesh is not None:
        rep = NamedSharding(mesh, P())
        dp_shard = NamedSharding(mesh, P(mesh.axis_names[0]))

        def put_batch(x, y):
            sh = dp_shard if x.shape[0] % dp == 0 else rep
            return jax.device_put(x, sh), jax.device_put(y, sh)

        def put_eval(x):
            return jax.device_put(
                x, dp_shard if x.shape[0] % dp == 0 else rep)
    else:
        put_batch = lambda x, y: (jnp.asarray(x), jnp.asarray(y))
        put_eval = jnp.asarray
    rng = np.random.default_rng(cfg.seed)
    p_tr, p_te, n_tr, n_te = fdata.balanced_split(
        list(positives), list(negatives), rng, cfg.train_frac)
    X_tr = fdata.one_hot_junctions(p_tr + n_tr)
    y_tr = np.concatenate([np.ones(len(p_tr), np.int32),
                           np.zeros(len(n_tr), np.int32)])
    X_te = fdata.one_hot_junctions(p_te + n_te)
    y_te = np.concatenate([np.ones(len(p_te), np.int32),
                           np.zeros(len(n_te), np.int32)])
    if X_tr.shape[0] == 0:
        raise ValueError("no training data")
    len_seq = X_tr.shape[1]

    model, tx, train_step, eval_step = _make_steps(cfg)
    key = jax.random.PRNGKey(cfg.seed)
    if warm_start is not None:
        variables = warm_start.variables
    else:
        variables = model.init(key, jnp.zeros((1, len_seq, cfg.input_dim)))
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    if mesh is not None:
        # place params per the dp/TP shardings FIRST, then init the
        # optimizer: optax's zeros_like moments inherit them automatically
        p_shard = param_shardings(mesh, params, tp_min_width)
        params = jax.tree.map(
            lambda a, s: jax.device_put(np.asarray(a), s), params, p_shard)
        batch_stats = jax.tree.map(
            lambda a: jax.device_put(np.asarray(a), rep)
            if hasattr(a, "shape") else a, batch_stats)
    # jitted init under a mesh: XLA propagates the param shardings into the
    # zeros_like Adam moments (an eager zeros_like would re-place them)
    opt_state = jax.jit(tx.init)(params) if mesh is not None else tx.init(params)

    bs = cfg.batch_size
    best_auc = 0.0
    best = None
    for epoch in range(cfg.num_epochs):
        order = rng.permutation(X_tr.shape[0])
        preds, truth = [], []
        for lo in range(0, len(order), bs):
            sel = order[lo:lo + bs]
            key, sub = jax.random.split(key)
            xb, yb = put_batch(X_tr[sel], y_tr[sel])
            params, batch_stats, opt_state, loss, final = train_step(
                params, batch_stats, opt_state, xb, yb, sub)
            preds.append(np.asarray(final[:, 1]))
            truth.append(y_tr[sel])
        tr_auc = fdata.roc_auc(np.concatenate(truth), np.concatenate(preds))
        te_scores = []
        for lo in range(0, X_te.shape[0], bs):
            te_scores.append(np.asarray(
                eval_step(params, batch_stats, put_eval(X_te[lo:lo + bs]))[:, 1]))
        te_auc = fdata.roc_auc(y_te, np.concatenate(te_scores)) if te_scores else 0.0
        if verbose:
            print(f"epoch {epoch}: train_auc={tr_auc:.3f} test_auc={te_auc:.3f}")
        if te_auc > best_auc:
            best_auc = te_auc
            best = TrainedFilter(cfg, {"params": jax.tree.map(np.asarray, params),
                                       "batch_stats": jax.tree.map(np.asarray, batch_stats)},
                                 len_seq, best_auc)
            if model_file:
                best.save(model_file)
    if best is None:
        best = TrainedFilter(cfg, {"params": jax.tree.map(np.asarray, params),
                                   "batch_stats": jax.tree.map(np.asarray, batch_stats)},
                             len_seq, best_auc)
        if model_file:
            best.save(model_file)
    return best


def score_junctions(filt: TrainedFilter, lines: Sequence[str],
                    batch_size: int = 256) -> List[float]:
    """Inference parity with Test_model (Model.py:314-333): P(class=1)."""
    X = fdata.one_hot_junctions(list(lines))
    if X.shape[0] == 0:
        return []
    model = FilterModel(filt.cfg)
    @jax.jit
    def fwd(x):
        _, final = model.apply(filt.variables, x)
        return final[:, 1]
    out: List[float] = []
    for lo in range(0, X.shape[0], batch_size):
        out.extend(np.asarray(fwd(jnp.asarray(X[lo:lo + batch_size]))).tolist())
    return out
