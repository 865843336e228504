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
