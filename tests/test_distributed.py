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

pid, port, n_procs = int(sys.argv[1]), sys.argv[2], int(sys.argv[3])
idx = distributed.initialize(f'localhost:{port}', n_procs, pid)
assert idx == pid and jax.process_count() == n_procs

mesh = distributed.global_mesh(('data',))
assert mesh.size == jax.device_count() >= n_procs

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

# device-resident data-parallel epoch over the cross-process mesh: every
# host decodes the (identical, seeded) synthetic split, upload() builds the
# global resident arrays via make_array_from_process_local_data
import tempfile
from fosvos_tpu.data import davis, synthetic
from fosvos_tpu.models import OSVOSResNet, resnet_arch
from fosvos_tpu.train import optimizers, resident

data_axis = mesh.shape['data']
n_seqs = max(1, -(-data_axis // 4))   # >= data_axis frames (4 per seq)
root = synthetic.generate(tempfile.mkdtemp(), size=(32, 48),
                          sequences=[f's{k}' for k in range(n_seqs)],
                          val_sequences=['v0'])
ds = davis.DAVIS2016(mode='train', db_root_dir=root)
model = OSVOSResNet(arch=resnet_arch(18, scale_down_exponent=5))
import jax.numpy as jnp
variables = model.init(jax.random.PRNGKey(0),
                       jnp.zeros((1, 32, 48, 3), jnp.float32), train=False)
state = resident.train_offline_resident(
    model, variables, ds,
    preset=optimizers.Preset(family='sgd', lr=1e-4, grouped=False),
    n_epochs=1, batch_size=data_axis, avg_grad_every_n=1,
    augment=False, seed=0, mesh=mesh)
assert int(state.step) == len(ds) // data_axis >= 1
print('WORKER-OK', pid)
'''


import pytest


@pytest.mark.parametrize('n_procs', [2, 4])
def test_multi_process_dcn_join(n_procs):
    """2-process smoke and a 4-process topology (VERDICT r4 #7): a
    host-major global mesh across real process boundaries running the
    device-resident data-parallel epoch — each process's devices hold
    their own shard of the resident split and the per-step batch."""
    with socket.socket() as s:
        s.bind(('localhost', 0))
        port = s.getsockname()[1]

    env = dict(os.environ)
    env['PYTHONPATH'] = (env.get('PYTHONPATH', '') + os.pathsep + REPO)
    procs = [subprocess.Popen(
        [sys.executable, '-c', WORKER, str(pid), str(port), str(n_procs)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env, cwd=REPO)
        for pid in range(n_procs)]
    # generous budget: the fresh jax processes all share this machine's
    # single CPU core with whatever else the suite is running
    outs = [p.communicate(timeout=240 * n_procs)[0].decode() for p in procs]
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f'process {pid} failed:\n{out}'
        assert f'WORKER-OK {pid}' in out
