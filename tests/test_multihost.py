"""Multi-process (DCN-path) test: 2 local ``jax.distributed`` processes.

The reference has no distributed computing at all (SURVEY.md §2.4); the
framework's DCN layer (``parallel/multihost.py``) is exercised here with a
REAL 2-process ``jax.distributed`` runtime over the Gloo CPU collectives
backend — coordinator handshake, cross-process device visibility, a
(host, chip) pod mesh, and a hierarchical_fold whose level-2 gather
crosses the process (DCN) boundary. No TPU needed: each process hosts 2
virtual CPU devices, so the mesh is 2 hosts x 2 chips.

Each worker asserts the fold result against the analytic value and prints
a sentinel; the parent asserts both workers succeeded.
"""

import os
import socket
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = r"""
import os, sys
os.environ['XLA_FLAGS'] = '--xla_force_host_platform_device_count=2'
sys.path.insert(0, %(repo)r)
import jax
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_cpu_collectives_implementation', 'gloo')
pid, port = int(sys.argv[1]), sys.argv[2]

from tpu_zkpool.parallel import multihost
ok = multihost.initialize(f'127.0.0.1:{port}', num_processes=2, process_id=pid)
assert ok, 'multihost.initialize did not start a distributed runtime'
assert jax.process_count() == 2
assert len(jax.devices()) == 4          # 2 hosts x 2 virtual chips

import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

mesh = multihost.pod_mesh()
assert mesh.devices.shape == (2, 2)

def body(xs):
    # per-device partial, then the two-level (ICI, then DCN) combine
    return multihost.hierarchical_fold(lambda a, b: a + b, jnp.sum(xs), mesh)

f = jax.jit(jax.shard_map(body, mesh=mesh, in_specs=P(('host', 'chip')),
                          out_specs=P(), check_vma=False))
data = np.arange(16.0)
xg = jax.make_array_from_callback(
    (16,), NamedSharding(mesh, P(('host', 'chip'))), lambda idx: data[idx])
got = float(np.asarray(jax.device_get(f(xg))))
assert got == float(data.sum()), (got, data.sum())
print(f'WORKER{pid}_OK', flush=True)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_hierarchical_fold(tmp_path):
    script = tmp_path / "worker.py"
    script.write_text(_WORKER % {"repo": _REPO})
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)          # worker sets its own device count
    procs = [
        subprocess.Popen([sys.executable, str(script), str(pid), str(port)],
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         text=True, env=env)
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-3000:]}"
        assert f"WORKER{pid}_OK" in out
