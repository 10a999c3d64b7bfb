"""Multi-host communication-backend smoke test (SURVEY.md §2.3 DCN row).

Spawns two real OS processes, each with 2 virtual CPU devices, joined via
jax.distributed.initialize into one 4-device runtime; each contributes its
process-local batch shard (mesh.shard_batch multi-process path) and a jitted
global reduction checks the cross-process collective result. This is the
CPU stand-in for a 2-host TPU slice over DCN.
"""

import os
import re
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = """
import jax
jax.config.update("jax_platforms", "cpu")
import sys
jax.distributed.initialize(coordinator_address=sys.argv[1],
                           num_processes=2, process_id=int(sys.argv[2]))
import numpy as np
import jax.numpy as jnp
from zerovox_tpu.parallel.mesh import MeshConfig, make_mesh, shard_batch

assert jax.process_count() == 2
assert len(jax.devices()) == 4  # 2 local cpu devices per process

mesh = make_mesh(MeshConfig(data=4))
local = np.full((2, 3), jax.process_index() + 1, np.float32)
g = shard_batch({"x": local}, mesh)["x"]
assert g.shape == (4, 3), g.shape  # global batch = both process shards

total = jax.jit(lambda x: jnp.sum(x))(g)  # cross-process collective
print("DIST_OK", float(total), flush=True)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.timeout(300)
def test_two_process_data_parallel_reduction():
    addr = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")

    procs = [subprocess.Popen([sys.executable, "-c", CHILD, addr, str(i)],
                              env=env, cwd=REPO, stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, text=True)
             for i in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)

    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {i} failed:\n{out[-3000:]}"
        m = re.search(r"DIST_OK ([\d.]+)", out)
        assert m, out[-2000:]
        # shard 0 contributes 2*3*1, shard 1 contributes 2*3*2
        assert float(m.group(1)) == 18.0
