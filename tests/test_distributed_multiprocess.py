"""Real 2-process jax.distributed test over the CPU backend.

SURVEY §4(4): multi-process CPU `jax.distributed` is the standard JAX answer
to "multi-node without a real cluster". The reference's analogue is
nerfstudio spawning one torch-DDP process per GPU with NCCL
(freegaussian_pipeline.py:31-40); here two OS processes form a global mesh
through `parallel.distributed.ensure_distributed` and a psum crosses the
process boundary (DCN path in production, TCP here).
"""

import socket
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

WORKER = """
import sys
import jax

jax.config.update("jax_platforms", "cpu")

coordinator, pid = sys.argv[1], int(sys.argv[2])

from freegaussian_tpu.parallel.distributed import (
    ensure_distributed,
    host_shard_info,
    local_device_count,
)

idx, count = ensure_distributed(coordinator, num_processes=2, process_id=pid)
assert (idx, count) == (pid, 2), (idx, count)
assert host_shard_info() == (pid, 2)
assert local_device_count() == 2

import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

devs = np.asarray(jax.devices()).reshape(4)  # 2 procs x 2 local devices
mesh = Mesh(devs, ("data",))

# each process contributes its local shard of a length-4 global array;
# the psum must see all four values across the process boundary
local = jnp.arange(2, dtype=jnp.float32) + 2 * pid  # proc0: [0,1]  proc1: [2,3]
from jax.experimental.multihost_utils import host_local_array_to_global_array

garr = host_local_array_to_global_array(np.asarray(local), mesh, P("data"))

from jax.experimental.shard_map import shard_map

@jax.jit
def total(x):
    f = shard_map(
        lambda v: jax.lax.psum(jnp.sum(v), "data"),
        mesh=mesh, in_specs=P("data"), out_specs=P(),
    )
    return f(x)

out = total(garr)
# fully-replicated output: addressable on every process
val = float(np.asarray(out.addressable_data(0)))
assert val == 6.0, val
print(f"proc{pid} ok", flush=True)
"""


def test_two_process_psum(tmp_path):
    port = socket.socket()
    port.bind(("127.0.0.1", 0))
    coordinator = f"127.0.0.1:{port.getsockname()[1]}"
    port.close()

    script = tmp_path / "worker.py"
    script.write_text(WORKER)

    env = {
        "PYTHONPATH": str(REPO),
        "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
        "PATH": "/usr/bin:/bin:/usr/local/bin",
        "HOME": "/root",
    }
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), coordinator, str(pid)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            env=env,
            text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for pid, proc in enumerate(procs):
        try:
            out, _ = proc.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for p in procs:
                p.kill()
            raise
        outs.append(out)
        assert proc.returncode == 0, f"proc{pid} failed:\n{out}"
    assert "proc0 ok" in outs[0]
    assert "proc1 ok" in outs[1]
