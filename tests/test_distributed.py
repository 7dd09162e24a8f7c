"""Real 2-process jax.distributed run (CPU backend): exercises
parallel/distributed.ensure_distributed + a cross-process psum — the
multi-host init path the single-process tests can't reach."""

import subprocess
import sys
import textwrap

import pytest

WORKER = textwrap.dedent(
    """
    import sys
    import jax
    jax.config.update("jax_platforms", "cpu")
    from freegaussian_tpu.parallel.distributed import ensure_distributed, host_shard_info

    pid = int(sys.argv[1])
    idx, count = ensure_distributed(
        coordinator_address="localhost:56533", num_processes=2, process_id=pid
    )
    assert (idx, count) == (pid, 2), (idx, count)
    assert host_shard_info() == (pid, 2)

    import jax.numpy as jnp
    from jax.sharding import Mesh, PartitionSpec as P, NamedSharding

    # one device per process -> 2-device global mesh; all-reduce across hosts
    mesh = Mesh(jax.devices(), ("data",))
    x = jnp.asarray([float(pid + 1)])
    arr = jax.make_array_from_single_device_arrays(
        (2,), NamedSharding(mesh, P("data")), [jax.device_put(x, jax.local_devices()[0])]
    )
    total = jax.jit(
        lambda a: jnp.sum(a), out_shardings=NamedSharding(mesh, P())
    )(arr)
    assert float(total) == 3.0, float(total)
    print(f"proc {pid} ok", flush=True)
    """
)


@pytest.mark.timeout(180)
def test_two_process_psum(tmp_path):
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            cwd=str(tmp_path.parent),
            env={
                **{
                    k: v
                    for k, v in __import__("os").environ.items()
                    if k != "XLA_FLAGS"  # 1 device per process
                },
                "JAX_PLATFORMS": "cpu",
                "PYTHONPATH": str(__import__("pathlib").Path(__file__).resolve().parent.parent),
            },
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=150)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out}"
        assert f"proc {i} ok" in out
