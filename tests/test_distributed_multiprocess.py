"""Real 2-process jax.distributed test over the CPU backend.

SURVEY §4(4): multi-process CPU `jax.distributed` is the standard JAX answer
to "multi-node without a real cluster". The reference's analogue is
nerfstudio spawning one torch-DDP process per GPU with NCCL
(freegaussian_pipeline.py:31-40); here two OS processes form a global mesh
through `parallel.distributed.ensure_distributed` and a psum crosses the
process boundary (DCN path in production, TCP here).
"""

import pytest
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


FULL_STEP_WORKER = """
import sys
import jax

jax.config.update("jax_platforms", "cpu")

repo, coordinator, pid = sys.argv[1], sys.argv[2], int(sys.argv[3])
sys.path.insert(0, repo)

from freegaussian_tpu.parallel.distributed import ensure_distributed

ensure_distributed(coordinator, num_processes=2, process_id=pid)
assert jax.device_count() == 2 and jax.local_device_count() == 1

import numpy as np
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax.experimental import multihost_utils

import __graft_entry__ as g
from freegaussian_tpu.models.densify import DensifyConfig
from freegaussian_tpu.parallel import (
    make_mesh, make_parallel_train_step, stack_cameras,
)

W = H = 32
cfg, deform, state, camera, optimizers = g._tiny_setup(
    capacity=128, n_gauss=32, width=W, height=H
)
mesh = make_mesh(data=2, tile=1)
step_fn = make_parallel_train_step(
    cfg,
    DensifyConfig(refine_start=10**9),
    optimizers,
    deform.apply,
    num_train_data=2,
    mesh=mesh,
    image_hw=(H, W),
)

def replicate(x):
    return multihost_utils.host_local_array_to_global_array(
        np.asarray(x), mesh, P()
    )

state_g = jax.tree.map(replicate, state)

cams = stack_cameras(
    [camera.replace(time=jnp.asarray(float(i))) for i in range(2)]
)
# each host feeds ITS data-row shard (leading-axis slice pid)
def shard_data(x):
    return multihost_utils.host_local_array_to_global_array(
        np.asarray(x)[pid : pid + 1], mesh, P("data")
    )

cams_g = jax.tree.map(shard_data, cams)
rng = np.random.default_rng(0)
images = rng.uniform(size=(2, H, W, 3)).astype(np.float32)
imgs_g = multihost_utils.host_local_array_to_global_array(
    images[pid : pid + 1], mesh, P("data", "tile")
)

new_state, metrics = step_fn(state_g, cams_g, imgs_g, sh_degree_now=3)
loss = float(np.asarray(metrics["loss"].addressable_data(0)))
step = int(np.asarray(new_state.step.addressable_data(0)))
assert np.isfinite(loss) and step == 1, (loss, step)
print(f"proc{pid} full-step ok loss={loss:.6f}", flush=True)
"""


@pytest.mark.slow
def test_two_process_full_train_step(tmp_path):
    """The REAL sharded train step (make_parallel_train_step) over a global
    (data=2) mesh spanning TWO OS processes: gradient psum crosses the
    process boundary, parameters stay replicated, both hosts apply the
    identical update (the reference's DDP pattern, freegaussian_pipeline.py:31-40,
    over jax.distributed instead of torch DDP/NCCL)."""
    port = socket.socket()
    port.bind(("127.0.0.1", 0))
    coordinator = f"127.0.0.1:{port.getsockname()[1]}"
    port.close()

    script = tmp_path / "worker_full.py"
    script.write_text(FULL_STEP_WORKER)

    env = {
        "PYTHONPATH": str(REPO),
        "XLA_FLAGS": "--xla_force_host_platform_device_count=1",
        "PATH": "/usr/bin:/bin:/usr/local/bin",
        "HOME": "/root",
    }
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(REPO), coordinator, str(pid)],
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
            out, _ = proc.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for p in procs:
                p.kill()
            raise
        outs.append(out)
        assert proc.returncode == 0, f"proc{pid} failed:\n{out[-4000:]}"
    # both hosts computed the same replicated loss
    l0 = [l for l in outs[0].splitlines() if "full-step ok" in l]
    l1 = [l for l in outs[1].splitlines() if "full-step ok" in l]
    assert l0 and l1
    assert l0[0].split("loss=")[1] == l1[0].split("loss=")[1]
