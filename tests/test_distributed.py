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
