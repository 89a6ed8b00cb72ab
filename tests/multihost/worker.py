"""Multi-host worker for tests/test_multihost.py (SURVEY.md 5.4: 'multi-host
DCN logic tested by spawning multiple jax.distributed processes on
localhost')."""
import os
import sys

port, pid, nproc = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
except Exception:
    pass
from spectrobot_tpu.parallel.mesh import initialize_multihost

initialize_multihost(coordinator_address=f"localhost:{port}",
                     num_processes=nproc, process_id=pid)
assert jax.device_count() == 2 * nproc, jax.device_count()
assert jax.process_count() == nproc

import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

mesh = jax.make_mesh((2 * nproc,), ("nu",))
x_local = jnp.arange(8.0) + 100.0 * pid


@jax.jit
def global_sum(x):
    return jnp.sum(x)


# Build a process-spanning global array and reduce it across hosts (DCN).
from jax.experimental import multihost_utils
global_x = multihost_utils.host_local_array_to_global_array(
    x_local, mesh, P("nu"))
total = float(global_sum(global_x))
expect = float(sum(np.sum(np.arange(8.0) + 100.0 * k) for k in range(nproc)))
assert abs(total - expect) < 1e-6, (total, expect)
if pid == 0:
    print(f"MULTIHOST_OK total={total} devices={jax.device_count()}")
