"""Multi-process DCN wiring test: two real processes join one JAX runtime
over a local coordinator and run a sharded computation on the resulting
global mesh (the pod-slice code path of ``runtime.distributed``, exercised
end-to-end on CPU)."""
import os
import socket
import subprocess
import sys
from pathlib import Path

REPO = str(Path(__file__).resolve().parent.parent)

WORKER = '''
import sys
import jax
jax.config.update('jax_platforms', 'cpu')

from fosvos_tpu.runtime import distributed

pid, port = int(sys.argv[1]), sys.argv[2]
idx = distributed.initialize(f'localhost:{port}', 2, pid)
assert idx == pid and jax.process_count() == 2

mesh = distributed.global_mesh(('data',))
assert mesh.size == jax.device_count() >= 2

import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

# each process contributes its own shard of a host-major global batch
global_batch = np.arange(mesh.size * 4, dtype=np.float32).reshape(-1, 4)
local = distributed.process_local_batch(global_batch)
x = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P('data')), local, global_batch.shape)
total = jax.jit(lambda a: a.sum())(x)
assert float(total) == float(global_batch.sum()), float(total)
assert distributed.is_primary() == (pid == 0)
print('WORKER-OK', pid)
'''


def test_two_process_dcn_join():
    with socket.socket() as s:
        s.bind(('localhost', 0))
        port = s.getsockname()[1]

    env = dict(os.environ)
    env['PYTHONPATH'] = (env.get('PYTHONPATH', '') + os.pathsep + REPO)
    procs = [subprocess.Popen(
        [sys.executable, '-c', WORKER, str(pid), str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env, cwd=REPO)
        for pid in range(2)]
    outs = [p.communicate(timeout=180)[0].decode() for p in procs]
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f'process {pid} failed:\n{out}'
        assert f'WORKER-OK {pid}' in out
