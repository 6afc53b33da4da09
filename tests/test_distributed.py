"""Multi-host cluster path: a real 2-process JAX cluster over localhost.

`parallel.init_distributed` wraps jax.distributed.initialize — the NCCL/MPI
rendezvous analog. The test spawns two fresh processes (4 virtual CPU devices
each), forms one 8-device (scene, chan) mesh spanning both, and reduces a
globally-sharded array through a jitted cross-host collective.
"""

import socket
import subprocess
import sys
import textwrap
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]

_WORKER = textwrap.dedent(
    """
    import os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    sys.path.insert(0, {repo!r})
    import jax, numpy as np
    import jax.numpy as jnp
    import jax.experimental.multihost_utils as mhu
    from jax.sharding import PartitionSpec as P
    from audiblelight_tpu.parallel import init_distributed, make_mesh

    pid = int(sys.argv[1]); coord = sys.argv[2]
    n = init_distributed(coordinator_address=coord, num_processes=2, process_id=pid)
    assert n == 8, n
    assert jax.process_count() == 2
    mesh = make_mesh(n_scene=4, n_chan=2)
    local = np.arange(8.0)[pid * 4 : (pid + 1) * 4] + 1.0
    arr = mhu.host_local_array_to_global_array(local, mesh, P("scene"))
    total = float(jax.jit(jnp.sum)(arr))
    assert total == 36.0, total
    print(f"proc {{pid}} ok total={{total}}")
    """
)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


import pytest


@pytest.mark.e2e
def test_two_process_cpu_cluster(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER.format(repo=str(REPO)))
    coord = f"127.0.0.1:{_free_port()}"

    import os

    env = {
        k: v
        for k, v in os.environ.items()
        if "axon" not in v or k not in ("PYTHONPATH",)
    }
    env.pop("PYTHONPATH", None)

    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(pid), coord],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out)
        assert p.returncode == 0, out[-2000:]
    assert "proc 0 ok total=36.0" in outs[0]
    assert "proc 1 ok total=36.0" in outs[1]
