"""Multi-process collective backend: two OS processes join one
``jax.distributed`` CPU cluster, form a global ('dp',) mesh spanning both, and
a jitted psum reduces across the process boundary (SURVEY.md 2b: the
multi-host backbone — same code path that rides DCN on TPU pods)."""
import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
import numpy as np

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")

coord, pid = sys.argv[1], int(sys.argv[2])
from hope_tpu.parallel.mesh import initialize_multihost
initialize_multihost(coord, 2, pid)

import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from hope_tpu.parallel.mesh import make_mesh

devs = jax.devices()
assert len(devs) == 4, f"global devices {len(devs)}"
assert jax.process_count() == 2
mesh = make_mesh(devs)

# every process contributes its local block of the global batch
local = np.full((2, 8), float(pid + 1), np.float32)
garr = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P("dp")), local, global_shape=(4, 8))

out = jax.jit(lambda x: x.sum())(garr)
# process 0 rows sum to 8 each, process 1 rows to 16: total 2*8 + 2*16 = 48
np.testing.assert_allclose(float(out), 48.0)
print(f"proc{pid} OK", flush=True)
"""


def test_two_process_cpu_cluster(tmp_path):
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    coord = f"localhost:{port}"

    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen([sys.executable, "-c", _WORKER, coord, str(i)],
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         env=env, cwd=os.path.dirname(os.path.dirname(__file__)))
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=240)
        outs.append(out.decode())
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc{i} failed:\n{out}"
        assert f"proc{i} OK" in out, out
