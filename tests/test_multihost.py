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


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _spawn_two(code_or_argv, timeout=480, force_cpu=False):
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    if force_cpu:
        # CLI workers don't set the platform in-code the way the -c workers
        # do; pin them to a 2-virtual-device CPU before jax import
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    repo = os.path.dirname(os.path.dirname(__file__))
    procs = [
        subprocess.Popen([sys.executable] + code_or_argv(i),
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         env=env, cwd=repo)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=timeout)
        outs.append(out.decode())
    return procs, outs


def test_two_process_cpu_cluster(tmp_path):
    coord = f"localhost:{_free_port()}"
    procs, outs = _spawn_two(
        lambda i: ["-c", _WORKER, coord, str(i)], timeout=240)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc{i} failed:\n{out}"
        assert f"proc{i} OK" in out, out


_CHUNK_WORKER = r"""
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
from hope_tpu.parallel.mesh import make_mesh, replicate, shard_batch
sys.path.insert(0, os.getcwd())
from tests.chunk_fixture import (build_inputs, fingerprint, make_chunk,
                                 make_env_agent)

assert jax.process_count() == 2 and len(jax.devices()) == 4
mesh = make_mesh()

env_cfg, env, agent = make_env_agent()
(sac_state, env_state, hybrid, obs, pool_idx, replay, pool,
 reset_queue) = build_inputs(env_cfg, env, agent)
args = (
    replicate(sac_state, mesh), shard_batch(env_state, mesh),
    shard_batch(hybrid, mesh), shard_batch(obs, mesh),
    shard_batch(pool_idx, mesh),
    replay.replace(data=shard_batch(replay.data, mesh)),
    replicate(pool, mesh), replicate(reset_queue, mesh),
)
chunk = make_chunk(env, agent, env_cfg)
out = chunk(*args, replicate(jax.random.PRNGKey(1), mesh), warmup=False)
a, r = fingerprint(out)
print(f"proc{pid} FP {a!r} {r!r}", flush=True)
"""


def test_two_process_training_chunk_matches_single_process():
    """A FULL SAC training chunk (collect + resets + SGD with its gradient
    reduction) across a 2-process jax.distributed cluster produces the same
    numbers as the single-process run of the identical fixture (VERDICT r3:
    the collective backend must carry a training chunk, not just a psum)."""
    import re

    import numpy as np

    from tests.chunk_fixture import (build_inputs, fingerprint, make_chunk,
                                     make_env_agent)

    env_cfg, env, agent = make_env_agent()
    args = build_inputs(env_cfg, env, agent)
    chunk = make_chunk(env, agent, env_cfg)
    import jax

    ref = fingerprint(chunk(*args, jax.random.PRNGKey(1), warmup=False))

    coord = f"localhost:{_free_port()}"
    procs, outs = _spawn_two(lambda i: ["-c", _CHUNK_WORKER, coord, str(i)])
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc{i} failed:\n{out}"
        m = re.search(rf"proc{i} FP ([-\d.e+]+) ([-\d.e+]+)", out)
        assert m, out
        a, r = float(m.group(1)), float(m.group(2))
        np.testing.assert_allclose(a, ref[0], rtol=2e-4,
                                   err_msg=f"actor fingerprint proc{i}")
        np.testing.assert_allclose(r, ref[1], rtol=1e-5, atol=1e-5,
                                   err_msg=f"reward fingerprint proc{i}")


def test_two_process_trainer_cli_smoke(tmp_path):
    """The real train_sac CLI joins a 2-process cluster via
    --coordinator/--num-processes/--process-id and trains a smoke run over the
    global 4-device dp mesh; both processes finish and agree on the stream."""
    import json

    coord = f"localhost:{_free_port()}"

    def argv(i):
        return ["-m", "hope_tpu.train.train_sac", "--smoke",
                "--devices", "4", "--no-tensorboard",
                "--coordinator", coord, "--num-processes", "2",
                "--process-id", str(i),
                "--max-chunks", "4", "--save-every", "0",
                "--log-dir", str(tmp_path / f"proc{i}")]

    procs, outs = _spawn_two(argv, force_cpu=True)
    finals = []
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc{i} failed:\n{out}"
        line = [ln for ln in out.splitlines() if "final_episodes" in ln]
        assert line, out
        finals.append(json.loads(line[-1])["final_episodes"])
    assert finals[0] == finals[1]


def test_two_process_ppo_trainer_cli_smoke(tmp_path):
    """train_ppo across a 2-process cluster: the full-buffer GAE + 10-epoch
    update is the one distributed-gradient path the SAC tests don't cover
    (VERDICT r4 weak #4).  Both processes must finish (final checkpoint save
    gathers on every process), agree on the episode stream, and process 0
    must have written the checkpoint."""
    import json

    coord = f"localhost:{_free_port()}"

    def argv(i):
        return ["-m", "hope_tpu.train.train_ppo", "--smoke",
                "--devices", "4", "--no-tensorboard",
                "--coordinator", coord, "--num-processes", "2",
                "--process-id", str(i),
                "--max-chunks", "3", "--save-every", "0",
                "--log-dir", str(tmp_path / f"proc{i}")]

    procs, outs = _spawn_two(argv, force_cpu=True)
    finals = []
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc{i} failed:\n{out}"
        line = [ln for ln in out.splitlines() if "final_episodes" in ln]
        assert line, out
        finals.append(json.loads(line[-1])["final_episodes"])
    assert finals[0] == finals[1]
    assert (tmp_path / "proc0" / "ckpt").exists()
    assert not (tmp_path / "proc1" / "ckpt").exists()
