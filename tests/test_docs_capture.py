"""Docs quote captures, captures are checked in (VERDICT r4 #4).

Every number in BASELINE.md's measured table must be reproducible from a
checked-in BENCH/HG38/SCALING JSON.  Each claim below names its source file,
the JSON path, and how the doc formats it; if a doc edit (or a re-capture)
breaks the correspondence, this test fails and the docs must be re-pointed
at the new capture.
"""

import json
import os

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _dig(obj, path):
    for p in path:
        obj = obj[p]
    return obj


CLAIMS = [
    # (source json, path, doc formatting)
    ("BENCH_r04.json", ["parsed", "median"], lambda v: f"{v/1e3:.1f}k"),
    ("BENCH_r04.json", ["parsed", "value"], lambda v: f"{v/1e3:.1f}k"),
    ("BENCH_r04.json", ["parsed", "relay", "roundtrip_ms"],
     lambda v: f"{v} ms"),
    ("BENCH_r04.json", ["parsed", "relay", "h2d_mb_s"],
     lambda v: f"{v} MB/s"),
    ("BENCH_r04.json", ["parsed", "relay", "compute_reads_per_s"],
     lambda v: f"{v/1e3:.1f}k"),
    ("BENCH_r04.json", ["parsed", "pipeline_reads_per_s"],
     lambda v: f"{v/1e3:.1f}k"),
    ("docs/HG38_BENCH.json",
     ["round5_xl_k14", "sweep", "2P_h2k2_r8_trim112", "reads_per_s"],
     lambda v: f"{v/1e3:.1f}k"),
    ("docs/HG38_BENCH.json",
     ["round5_xl_k14", "sweep", "H4_trim112", "reads_per_s"],
     lambda v: f"{v/1e3:.1f}k"),
    ("docs/HG38_BENCH.json", ["round5_xl_k14", "index_gib"],
     lambda v: f"{v} GiB"),
    ("docs/HG38_BENCH.json", ["round5_xl_k14", "index_build_s"],
     lambda v: f"{v} s"),
    ("docs/SCALING_r05.json", ["genome", "mp2_vs_dp1"],
     lambda v: f"{v:.2f}x"),
    ("docs/DEPTH_SWEEP.json", ["all_detected_from_cov"],
     lambda v: f"detected from {v}x"),
    ("docs/DEPTH_SWEEP.json", ["real_data_ladder", "max_downsample_detected"],
     lambda v: f"1/{v}x"),
]


@pytest.fixture(scope="module")
def baseline_text():
    with open(os.path.join(ROOT, "BASELINE.md")) as fh:
        return fh.read()


@pytest.mark.parametrize("src,path,fmt", CLAIMS,
                         ids=[f"{s}:{'.'.join(map(str, p))}"
                              for s, p, _ in CLAIMS])
def test_baseline_quotes_capture(baseline_text, src, path, fmt):
    with open(os.path.join(ROOT, src)) as fh:
        value = _dig(json.load(fh), path)
    quoted = fmt(value)
    assert quoted in baseline_text, (
        f"BASELINE.md does not quote {quoted} ({src} {'.'.join(map(str, path))}"
        f" = {value}); re-point the doc at the current capture")


def test_hg38_e2e_capture_exists():
    """The hg38 e2e row needs its capture (round5_e2e) checked in and
    asserting a correct call."""
    with open(os.path.join(ROOT, "docs/HG38_BENCH.json")) as fh:
        d = json.load(fh)
    assert d["round5_e2e"]["correct_call"] is True
    assert d["round5_e2e"]["genome_gbp"] >= 3.0
