"""Multi-host (DCN) path exercised in a 2-process CPU emulation:
jax.distributed.initialize + a global mesh spanning both processes with a
cross-process psum (SURVEY.md section 2.8 — the reference has no
distributed code at all; this is a new-framework capability check)."""

import os
import socket
import subprocess
import sys

import pytest


_WORKER = r"""
import sys
import jax

proc_id = int(sys.argv[1])
port = sys.argv[2]
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=f"127.0.0.1:{port}",
    num_processes=2,
    process_id=proc_id,
    local_device_ids=[0],
)
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

assert jax.process_count() == 2, jax.process_count()
devs = np.array(jax.devices()).reshape(2)
mesh = Mesh(devs, ("dp",))

# element-style reduction across processes: each process contributes its
# local shard; psum rides the (emulated) DCN
from jax.experimental import multihost_utils

local = jnp.full((4,), float(proc_id + 1))
arr = multihost_utils.host_local_array_to_global_array(local, mesh, P("dp"))

def f(x):
    return jax.lax.psum(jnp.sum(x), "dp")

total = jax.jit(
    jax.shard_map(f, mesh=mesh, in_specs=(P("dp"),), out_specs=P())
)(arr)
expect = 4.0 * 1 + 4.0 * 2
val = float(np.asarray(jax.device_get(total)))
assert abs(val - expect) < 1e-6, (val, expect)
print(f"proc {proc_id} OK total={val}")
"""


@pytest.mark.timeout(300)
def test_two_process_cpu_distributed(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = str(s.getsockname()[1])
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER, str(i), port],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            env=env,
            cwd="/root/repo",
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out.decode())
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-2000:]}"
        assert f"proc {i} OK" in out
