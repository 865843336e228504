import numpy as np

from anchored_fusion_tpu.utils.checkpoint import StageCache, digest
from anchored_fusion_tpu.utils.log import StageLogger


def test_digest_stability_and_sensitivity():
    a = np.arange(10, dtype=np.int32)
    assert digest(a, "x") == digest(a.copy(), "x")
    assert digest(a, "x") != digest(a + 1, "x")
    assert digest(a, "x") != digest(a.astype(np.int64), "x")


def test_stage_cache_roundtrip(tmp_path):
    c = StageCache(str(tmp_path))
    calls = []
    def compute():
        calls.append(1)
        return {"v": np.arange(5)}
    k = digest("k1")
    v1 = c.cached("s", k, compute)
    v2 = c.cached("s", k, compute)
    assert len(calls) == 1
    np.testing.assert_array_equal(v1["v"], v2["v"])
    # None directory -> passthrough
    c2 = StageCache(None)
    assert c2.cached("s", k, lambda: 42) == 42


def test_stage_logger(tmp_path):
    log = StageLogger("t")
    with log.stage("a"):
        pass
    log.set(x=3)
    p = tmp_path / "s.json"
    log.dump(str(p))
    import json
    d = json.loads(p.read_text())
    assert d["stats"]["x"] == 3 and "time.a_s" in d["stats"]


def test_gene_guard_isolates_and_retries():
    from anchored_fusion_tpu.utils.debug import gene_guard

    failures = []
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] < 2:
            raise RuntimeError("transient")
        return 42

    with gene_guard("GENEA", failures, retries=1, retry_delay_s=0) as g:
        out = g.run(flaky)
    assert out == 42 and not failures and calls["n"] == 2

    with gene_guard("GENEB", failures, retries=1, retry_delay_s=0) as g:
        g.run(lambda: (_ for _ in ()).throw(ValueError("hard")))
    assert g.failed and g.result is None
    assert failures[0]["gene"] == "GENEB" and failures[0]["attempts"] == 2


def test_stage_logger_throughput(tmp_path, capsys):
    from anchored_fusion_tpu.utils.log import StageLogger

    log = StageLogger("t")
    with log.stage("align", items=1000):
        pass
    assert "rate.align_reads_per_s" in log.stats
    log.dump(str(tmp_path / "s.json"))
    import json
    d = json.load(open(tmp_path / "s.json"))
    assert d["run"] == "t" and "time.total_s" in d["stats"]


def test_grouped_puller_contract():
    """GroupedPuller: flush order, shape-change sealing, n_real slicing."""
    import numpy as np
    from anchored_fusion_tpu.align.aligner import GroupedPuller

    import jax.numpy as jnp
    outs = []
    p = GroupedPuller(lambda a, n: a[:, :n], flush_chunks=3)
    # 4 same-shape chunks (one full group + one partial), then a shape change
    for i in range(4):
        p.push(3 - (i == 3), jnp.full((2, 4), i))
    p.push(7, jnp.full((2, 8), 9))
    res = p.finish()
    assert [a.shape for a in res] == [(2, 3)] * 3 + [(2, 2), (2, 7)]
    assert [int(a[0, 0]) for a in res] == [0, 1, 2, 3, 9]
    assert p.finish() == res  # idempotent: nothing pending


def test_xl_trim_width_guard():
    """_trim_width only drops PAD-only tails and only at the 128 default."""
    import numpy as np
    from anchored_fusion_tpu.align.genome_xl import GenomeAlignerXL
    from anchored_fusion_tpu.ops.encode import PAD

    t = GenomeAlignerXL._trim_width
    a = np.full((4, 128), PAD, np.int8)
    a[:, :101] = 0
    assert t(a).shape == (4, 112)
    b = np.full((4, 128), PAD, np.int8)
    b[0, 120] = 2                       # occupied past 112: keep width
    assert t(b).shape == (4, 128)
    c = np.full((4, 256), PAD, np.int8)  # non-default width: untouched
    assert t(c).shape == (4, 256)
