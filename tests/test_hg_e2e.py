"""Ten-stage e2e harness (bench/hg_e2e.py) at reduced scale — the same
gene-implant + fusion-simulate + call_gene drive that runs at 3.1 Gbp
(docs/HG38_BENCH.json round5_e2e), checked in CI at 20 Mbp so the harness
logic itself stays green.  The full-scale run is gated behind AFT_HG38_E2E=1
(one real chip, ~10 min warm)."""

import json
import os

import pytest

from anchored_fusion_tpu.bench import hg_e2e


def test_hg_e2e_small(capsys):
    rc = hg_e2e.main(["--gbp", "0.02", "--fusion-pairs", "800",
                      "--wild-pairs", "1500", "--index-stride", "1",
                      "--two-pass", "0", "--json-only"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0
    assert out["correct_call"] and out["partner_chrom_ok"]
    assert any(r["fusion"] == "ANCA--PRTB" for r in out["emitted"])


@pytest.mark.skipif(os.environ.get("AFT_HG38_E2E") != "1",
                    reason="3.1 Gbp e2e needs the real chip + ~15 min; "
                           "set AFT_HG38_E2E=1")
def test_hg_e2e_full_scale(capsys):
    rc = hg_e2e.main(["--gbp", "3.1", "--json-only"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0
    assert out["correct_call"] and out["partner_chrom_ok"]


def test_depth_sweep_harness(capsys):
    """The sensitivity-vs-coverage titration (the reference's paper
    benchmark, utils/simulate_reads.py ladder) at CI scale: one fusion,
    two coverage points — detection must hold at 32x.  The full 6x7 run is
    recorded in docs/DEPTH_SWEEP.json (all fusions detected from 4x)."""
    import json
    from anchored_fusion_tpu.bench import depth_sweep
    rc = depth_sweep.main(["--fusions", "1", "--coverages", "8,32",
                           "--json-only"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0
    (fusion,) = out["fusions"].values()
    assert fusion["curve"]["32"] is True


def test_real_depth_ladder_harness(capsys):
    """Real-data 2x downsampling titration (utils/downsample_reads.py
    parity experiment) at CI scale: full depth + one halving — the bundled
    BCR-ABL1 call must survive 1/2x.  The full 8-step run is recorded in
    docs/DEPTH_SWEEP.json real_data_ladder (detected down to 1/32x)."""
    import json
    from anchored_fusion_tpu.bench import real_depth
    rc = real_depth.main(["--steps", "1", "--json-only"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0
    assert all(e["detected"] for e in out["ladder"])
