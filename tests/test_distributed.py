"""Multi-process multi-controller smoke test (SURVEY §2.3 item 4).

Two real OS processes form a ``jax.distributed`` cluster over the CPU
backend (the axon TPU plugin is suppressed via a clean PYTHONPATH so the
subprocesses never contend for the single TPU chip), then:

  1. ``parallel.distributed.initialize`` brings up the multi-controller
     runtime from AFT_* env vars;
  2. ``host_shard`` gives each process its slice of a global work list
     (the per-host FASTQ sharding entry point);
  3. a global array is assembled from per-process shards and all-reduced —
     the cross-host ``psum`` path every evidence merge rides on.

This is the executable backing for the multi-host row in PARITY.md.
"""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import os
import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from anchored_fusion_tpu.parallel.distributed import initialize, host_shard

assert initialize() is True, "expected a multi-process cluster"
assert jax.process_count() == 2
pid = jax.process_index()

# host_shard: each process takes its half of a 10-item global work list
sl = host_shard(10)
assert (sl.start, sl.stop) == ((0, 5) if pid == 0 else (5, 10)), sl

# global array from per-process shards + cross-process all-reduce
devs = jax.devices()
mesh = Mesh(np.array(devs).reshape(len(devs)), ("dp",))
sh = NamedSharding(mesh, P("dp"))
local = np.arange(sl.start, sl.stop, dtype=np.int32) + 1  # 1..10 split in two
garr = jax.make_array_from_process_local_data(sh, local, global_shape=(10,))
total = jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))(garr)
# the result is fully replicated: every process reads its local shard
val = int(np.asarray(total.addressable_shards[0].data))
assert val == 55, val
print(f"proc{pid} OK {val}", flush=True)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_distributed_psum(tmp_path):
    port = _free_port()
    env_base = {k: v for k, v in os.environ.items()
                if not k.startswith(("JAX_", "AFT_", "XLA_"))}
    # drop the axon site-dir so the TPU plugin never loads in the workers
    env_base["PYTHONPATH"] = os.path.dirname(os.path.dirname(__file__))
    env_base["JAX_PLATFORMS"] = "cpu"
    procs = []
    for pid in range(2):
        env = dict(env_base,
                   AFT_COORDINATOR=f"127.0.0.1:{port}",
                   AFT_NUM_PROCS="2", AFT_PROC_ID=str(pid))
        procs.append(subprocess.Popen(
            [sys.executable, "-c", _WORKER], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc{pid} failed:\n{out}"
        assert f"proc{pid} OK 55" in out, out


def _write_bulk_inputs(tmp_path):
    """Synthetic genome + engineered fusion as on-disk CLI inputs."""
    import numpy as np
    from anchored_fusion_tpu.bench.simulate import (
        make_synthetic_genome, fuse_transcripts, simulate_pairs, write_gtf,
        write_fasta, write_fastq_pair)

    rng = np.random.default_rng(11)
    sg = make_synthetic_genome(rng, n_genes=6, exons_per_gene=(3, 5),
                               exon_len=(250, 400))
    plus = [g for g in sg.genes.values() if g.strand == "+"]
    anchor, partner = plus[0], plus[1]
    tx_a = anchor.transcript(sg.genome)
    break5 = sum(e - s + 1 for s, e in anchor.exons[:2]) - 100
    fusion = fuse_transcripts(tx_a, partner.transcript(sg.genome), break5, 60)
    names, r1, r2 = [], [], []
    for tx, n, pre in ((fusion, 120, "FUS"), (tx_a, 60, "WTA")):
        nm, a, b = simulate_pairs(rng, tx, n, name_prefix=pre)
        names, r1, r2 = names + nm, r1 + a, r2 + b
    gtf = str(tmp_path / "ann.gtf")
    gfa = str(tmp_path / "genome.fa")
    afa = str(tmp_path / "anchor.fa")
    fq1 = str(tmp_path / "reads_1.fastq")
    fq2 = str(tmp_path / "reads_2.fastq")
    gnames = str(tmp_path / "gene_names.txt")
    # synthetic names contain 'GENE', which the header heuristic drops
    # (Anchored_Fusion.py:58-73 parity) — name the target explicitly
    with open(gnames, "w") as fh:
        fh.write(anchor.name + "\n")
    write_gtf(sg, gtf)
    write_fasta({"chr1": sg.genome.fetch_str("chr1", 1, sg.genome.total_length)},
                gfa)
    write_fasta({anchor.name: tx_a}, afa)
    write_fastq_pair(fq1, fq2, names, r1, r2)
    exp = f"{anchor.name}--{partner.name}"
    return (gfa, gtf, afa, fq1, fq2, gnames), anchor.name, exp


def _bulk_cli_args(inputs, out):
    gfa, gtf, afa, fq1, fq2, gnames = inputs
    return ["-m", "anchored_fusion_tpu.cli.bulk",
            "--file_anchored_cds", afa, "--fastq1", fq1, "--fastq2", fq2,
            "--file_ref_seq", gfa, "--file_ref_ann", gtf,
            "--gene_names", gnames,
            "--out_folder", out, "--not_filter_false_positive"]


@pytest.mark.slow
def test_two_process_bulk_cli_matches_single(tmp_path):
    """A cluster-launched bulk run (2 jax.distributed processes, stage-1
    anchored alignment host-sharded + allgathered) writes byte-identical
    prediction files to the single-process run on the same input
    (SURVEY §2.3 items 1/4; VERDICT r2 missing #2)."""
    inputs, gene, expected = _write_bulk_inputs(tmp_path)
    env_base = {k: v for k, v in os.environ.items()
                if not k.startswith(("JAX_", "AFT_", "XLA_"))}
    env_base["PYTHONPATH"] = os.path.dirname(os.path.dirname(__file__))
    env_base["JAX_PLATFORMS"] = "cpu"

    out_s = str(tmp_path / "single")
    p = subprocess.run([sys.executable] + _bulk_cli_args(
        inputs, out_s), env=env_base,
        capture_output=True, text=True, timeout=600)
    assert p.returncode == 0, p.stdout + p.stderr

    out_m = str(tmp_path / "multi")
    port = _free_port()
    procs = []
    for pid in range(2):
        env = dict(env_base)
        procs.append(subprocess.Popen(
            [sys.executable] + _bulk_cli_args(inputs, out_m)
            + ["--coordinator", f"127.0.0.1:{port}",
               "--num_procs", "2", "--proc_id", str(pid)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True))
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc{pid} failed:\n{out}"

    rel = f"{gene}_fusion/{gene}_fusion_predictions.txt"
    single = open(os.path.join(out_s, rel)).read()
    multi = open(os.path.join(out_m, rel)).read()
    assert expected in single
    assert multi == single
    rel_a = rel.replace(".txt", "_abridged.txt")
    assert (open(os.path.join(out_m, rel_a)).read()
            == open(os.path.join(out_s, rel_a)).read())
    # process 0 (the writer) prints the called rows
    assert expected in outs[0], outs[0]
