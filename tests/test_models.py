import numpy as np
import pytest

from anchored_fusion_tpu.config import FilterModelConfig
from anchored_fusion_tpu.models import data as fdata
from anchored_fusion_tpu.models.filter_cnn import FilterModel, deep_supervision_loss
from anchored_fusion_tpu.models.train import (
    TrainedFilter, train_filter_model, score_junctions)

import jax
import jax.numpy as jnp


def _mk_lines(rng, n, motif):
    out = []
    for _ in range(n):
        s = "".join("ACGT"[i] for i in rng.integers(0, 4, 201))
        s = s[:100] + "H" + s[101:]
        if motif:
            s = s[:95] + "GGGGG" + s[100:]
        out.append(s)
    return out


def test_one_hot_junctions_channels():
    X = fdata.one_hot_junctions(["ACGTHDN"])
    assert X.shape == (1, 7, 6)
    # A T G C H D channel order (Model.py:171 turn_dic)
    np.testing.assert_array_equal(X[0, 0], [1, 0, 0, 0, 0, 0])  # A
    np.testing.assert_array_equal(X[0, 1], [0, 0, 0, 1, 0, 0])  # C
    np.testing.assert_array_equal(X[0, 2], [0, 0, 1, 0, 0, 0])  # G
    np.testing.assert_array_equal(X[0, 3], [0, 1, 0, 0, 0, 0])  # T
    np.testing.assert_array_equal(X[0, 4], [0, 0, 0, 0, 1, 0])  # H
    np.testing.assert_array_equal(X[0, 5], [0, 0, 0, 0, 0, 1])  # D
    np.testing.assert_array_equal(X[0, 6], [0, 0, 0, 0, 0, 0])  # N -> zero


def test_roc_auc_matches_simple_cases():
    assert fdata.roc_auc([0, 0, 1, 1], [0.1, 0.2, 0.8, 0.9]) == 1.0
    assert fdata.roc_auc([1, 1, 0, 0], [0.1, 0.2, 0.8, 0.9]) == 0.0
    assert fdata.roc_auc([0, 1, 0, 1], [0.5, 0.5, 0.5, 0.5]) == 0.5


def test_balanced_split_sizes():
    rng = np.random.default_rng(0)
    p = [f"p{i}" for i in range(100)]
    n = [f"n{i}" for i in range(40)]
    ptr, pte, ntr, nte = fdata.balanced_split(p, n, rng)
    assert len(ptr) == 28 and len(ntr) == 28       # 0.7 * min(100,40)
    assert len(pte) == 12 and len(nte) == 12


# Small config: full-size compile (256-dim convs + FF-2048 transformer,
# forward+backward) takes minutes per platform; architecture and loss
# semantics are identical at reduced widths.
SMALL_CFG = FilterModelConfig(
    block_dim=64, embed_dim=64, class_dim=64, transformer_dim=32,
    transformer_ff=64, batch_size=64, num_epochs=8, learning_rate=1e-3)


def test_filter_model_shapes_and_loss():
    cfg = SMALL_CFG
    model = FilterModel(cfg)
    x = jnp.zeros((2, 201, 6))
    variables = model.init(jax.random.PRNGKey(0), x)
    (o1, o2), o3 = model.apply(variables, x)
    assert o1.shape == (2, 2) and o2.shape == (2, 2) and o3.shape == (2, 2)
    # probabilities
    np.testing.assert_allclose(np.asarray(o3).sum(-1), 1.0, rtol=1e-5)
    y = jnp.asarray([0, 1])
    loss = deep_supervision_loss((o1, o2), o3, y)
    assert np.isfinite(float(loss))


def test_filter_train_learns_and_roundtrips(tmp_path):
    rng = np.random.default_rng(0)
    pos, neg = _mk_lines(rng, 150, True), _mk_lines(rng, 150, False)
    cfg = SMALL_CFG
    path = str(tmp_path / "model.msgpack")
    filt = train_filter_model(pos, neg, cfg, model_file=path, verbose=False)
    assert filt.best_auc > 0.85
    # serialization round trip produces identical scores
    loaded = TrainedFilter.load(path, cfg, filt.len_seq)
    lines = _mk_lines(rng, 20, True)
    np.testing.assert_allclose(score_junctions(filt, lines),
                               score_junctions(loaded, lines), atol=1e-5)
    sp = np.mean(score_junctions(filt, _mk_lines(rng, 40, True)))
    sn = np.mean(score_junctions(filt, _mk_lines(rng, 40, False)))
    assert sp > sn


def test_filter_train_data_parallel_matches_single_device():
    """DP-sharded training (batch over the mesh's dp axis) follows the same
    AUC trajectory as single-device training: same seeds, same data order,
    gradient psum inserted by XLA (SURVEY §2.3 item 5)."""
    from anchored_fusion_tpu.parallel.mesh import make_mesh
    rng = np.random.default_rng(0)
    pos, neg = _mk_lines(rng, 120, True), _mk_lines(rng, 120, False)
    cfg = dataclasses_replace_epochs(SMALL_CFG, 3)
    single = train_filter_model(pos, neg, cfg, verbose=False)
    mesh = make_mesh((8, 1), devices=jax.devices("cpu")[:8])
    sharded = train_filter_model(pos, neg, cfg, verbose=False, mesh=mesh)
    probe = _mk_lines(rng, 32, True) + _mk_lines(rng, 32, False)
    s1 = np.asarray(score_junctions(single, probe))
    s2 = np.asarray(score_junctions(sharded, probe))
    np.testing.assert_allclose(s1, s2, atol=2e-2)
    assert abs(single.best_auc - sharded.best_auc) < 0.05


def dataclasses_replace_epochs(cfg, n):
    import dataclasses
    return dataclasses.replace(cfg, num_epochs=n)


def test_filter_train_tensor_parallel_matches_single_device():
    """dp x mp training — FF kernels tensor-parallel over the mesh's second
    axis (models/train.param_shardings, the dryrun rule promoted to the
    production trainer, VERDICT r3 #7) — follows the single-device AUC
    trajectory.  tp_min_width=64 makes the rule bite at test widths (the
    production default 1024 shards the 2048-wide transformer FF pair)."""
    from anchored_fusion_tpu.models.train import param_shardings
    from anchored_fusion_tpu.parallel.mesh import make_mesh
    rng = np.random.default_rng(3)
    pos, neg = _mk_lines(rng, 120, True), _mk_lines(rng, 120, False)
    cfg = dataclasses_replace_epochs(SMALL_CFG, 3)
    single = train_filter_model(pos, neg, cfg, verbose=False)
    mesh = make_mesh((2, 2), devices=jax.devices("cpu")[:4])
    sharded = train_filter_model(pos, neg, cfg, verbose=False, mesh=mesh,
                                 tp_min_width=64)
    # the sharding rule actually shards something at this width
    model = FilterModel(cfg)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 201, cfg.input_dim)))["params"]
    specs = param_shardings(mesh, params, tp_min_width=64)
    assert any(s.spec != jax.sharding.PartitionSpec()
               for s in jax.tree.leaves(specs)), "no kernel was TP-sharded"
    probe = _mk_lines(rng, 32, True) + _mk_lines(rng, 32, False)
    s1 = np.asarray(score_junctions(single, probe))
    s2 = np.asarray(score_junctions(sharded, probe))
    # TP reduces the FF matmuls in mp partial products (different float
    # accumulation order than one device), so the drift after 3 epochs is
    # slightly wider than the pure-DP case
    np.testing.assert_allclose(s1, s2, atol=5e-2)
    assert abs(single.best_auc - sharded.best_auc) < 0.05


def test_bilstm_variant_trains():
    from anchored_fusion_tpu.models.bilstm import train_bilstm, encode_61
    rng = np.random.default_rng(1)
    pos = ["A" * 28 + "GGGGG" + "H" + "C" * 27 for _ in range(40)]
    neg = ["".join("ACGT"[i] for i in rng.integers(0, 4, 61)) for _ in range(40)]
    assert encode_61(pos).shape == (40, 61)
    _, score = train_bilstm(pos, neg, epochs=3, batch_size=32)
    assert np.mean(score(pos[:10])) > np.mean(score(neg[:10]))


def test_svm_variant():
    from anchored_fusion_tpu.models.svm import train_svm
    rng = np.random.default_rng(2)
    pos = ["A" * 28 + "GGGGG" + "H" + "C" * 27 for _ in range(30)]
    neg = ["".join("ACGT"[i] for i in rng.integers(0, 4, 61)) for _ in range(30)]
    _, score = train_svm(pos, neg)
    assert np.mean(score(pos[:10])) > np.mean(score(neg[:10]))


def test_torch_state_dict_import_matches_reference_forward(tmp_path):
    """Golden parity for the torch checkpoint importer: build the REFERENCE
    torch Model (Model.py, imported in-process) with random weights, import
    its state_dict into the Flax FilterModel, and compare full forward-pass
    probabilities on random junction one-hots (verdict-level parity is the
    SURVEY §7.3 item-6 target; here fresh random weights agree to ~1e-4)."""
    torch = pytest.importorskip("torch")
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "ref_model", "/root/reference/Model.py")
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)

    cfg = FilterModelConfig()
    torch.manual_seed(3)
    tm = ref.Model(cfg.input_dim, cfg.block_dim, cfg.embed_dim, cfg.class_dim,
                   cfg.window, cfg.maxpool_dim, cfg.class_shrink_dim,
                   cfg.transformer_dim, cfg.num_class, cfg.len_seq,
                   cfg.dropout)
    tm.eval()
    pt = str(tmp_path / "model.pt")
    torch.save(tm.state_dict(), pt)

    from anchored_fusion_tpu.models.torch_import import load_torch_checkpoint
    filt = load_torch_checkpoint(pt, cfg, cfg.len_seq)

    rng = np.random.default_rng(5)
    codes = rng.integers(0, 6, size=(4, cfg.len_seq))
    X = np.eye(6, dtype=np.float32)[codes]
    with torch.no_grad():
        (t1, t2), t3 = tm(torch.tensor(X, dtype=torch.float32))
    model = FilterModel(cfg)
    (f1, f2), f3 = model.apply(filt.variables, jnp.asarray(X))
    np.testing.assert_allclose(np.asarray(f1), t1.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(f2), t2.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(f3), t3.numpy(), atol=2e-4)

    # the importer plugs into the inference path used by the CLI
    lines = ["".join("ACGT"[i] for i in rng.integers(0, 4, 100)) + "H"
             + "".join("ACGT"[i] for i in rng.integers(0, 4, 100))
             for _ in range(3)]
    scores = score_junctions(filt, lines)
    assert len(scores) == 3 and all(0.0 <= s <= 1.0 for s in scores)
