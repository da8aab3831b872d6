"""Multi-process (multi-host-style) mesh test: 2 processes x 4 virtual CPU
devices = one 8-device global mesh with REAL cross-process collectives
(gloo) — the closest single-box approximation of a 2-slice DCN run
(SURVEY.md §2.4 DCN row; the reference has no multi-node story at all).

Each worker initializes ``jax.distributed`` via
``encdiff_tpu.parallel.multihost``, builds the global (data, model) mesh,
and runs two jitted data-parallel train steps of a toy regression model
with the batch sharded over the global ``data`` axis. Both processes must
see the same (replicated) loss, and it must equal the single-process
8-device reference value computed in-process by the parent.
"""

from __future__ import annotations

import os
import socket
import subprocess
import sys

import numpy as np

WORKER = r"""
import os, sys
import numpy as np

from encdiff_tpu.parallel import multihost

assert multihost.maybe_initialize_distributed(), "distributed init failed"

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from encdiff_tpu.parallel.mesh import make_mesh

assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 8, len(jax.devices())  # global view
mesh = make_mesh()  # all 8 global devices on the data axis

B, D = 16, 8
rs = np.random.RandomState(0)
x_global = rs.randn(B, D).astype(np.float32)
y_global = rs.randn(B, 1).astype(np.float32)
w0 = np.zeros((D, 1), np.float32)

bsh = NamedSharding(mesh, P("data"))
repl = NamedSharding(mesh, P())
# each process owns its half of the global batch: build the global sharded
# array from per-process local shards (the DCN data-loading pattern)
pid = jax.process_index()
lo, hi = pid * (B // 2), (pid + 1) * (B // 2)
x = jax.make_array_from_process_local_data(bsh, x_global[lo:hi], (B, D))
y = jax.make_array_from_process_local_data(bsh, y_global[lo:hi], (B, 1))
w = jax.device_put(w0, repl)

@jax.jit
def step(w, x, y):
    def loss_fn(w):
        return jnp.mean((x @ w - y) ** 2)
    loss, g = jax.value_and_grad(loss_fn)(w)
    return w - 0.1 * g, loss

for _ in range(2):
    w, loss = step(w, x, y)
print("MULTIHOST_LOSS", jax.process_index(), float(loss))
"""


def test_two_process_mesh_train_step(tmp_path):
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()

    script = tmp_path / "worker.py"
    script.write_text(WORKER)

    procs = []
    for pid in range(2):
        env = dict(os.environ)
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        env.update({
            "PYTHONPATH": repo,
            "JAX_PLATFORMS": "cpu",
            "PALLAS_AXON_POOL_IPS": "",
            "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
            "ENCDIFF_COORDINATOR": f"127.0.0.1:{port}",
            "ENCDIFF_NUM_PROCESSES": "2",
            "ENCDIFF_PROCESS_ID": str(pid),
        })
        procs.append(subprocess.Popen(
            [sys.executable, str(script)], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
        assert p.returncode == 0, out[-3000:]

    losses = []
    for out in outs:
        lines = [ln for ln in out.splitlines()
                 if ln.startswith("MULTIHOST_LOSS")]
        assert lines, out[-3000:]
        losses.append(float(lines[-1].split()[-1]))

    # both processes see the same replicated loss
    assert abs(losses[0] - losses[1]) < 1e-6, losses

    # single-process 8-device reference value
    rs = np.random.RandomState(0)
    x = rs.randn(16, 8).astype(np.float32)
    y = rs.randn(16, 1).astype(np.float32)
    w = np.zeros((8, 1), np.float32)
    for _ in range(2):
        g = 2.0 * x.T @ (x @ w - y) / x.shape[0]
        loss = float(np.mean((x @ w - y) ** 2))
        w = w - 0.1 * g
    np.testing.assert_allclose(losses[0], loss, rtol=1e-5)
