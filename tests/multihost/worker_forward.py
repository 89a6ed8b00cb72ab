"""Multi-host PRODUCTION-forward worker (round 4): two jax.distributed
processes x 2 emulated CPU devices build the real (ray, line, nu) mesh
spanning both processes and run parallel.sharded.sharded_radiance_fn with
the nu-halo tier — ring ppermutes crossing the process boundary (Gloo
standing in for DCN) — then every process checks the globally-gathered
result against its own single-device reference.
"""
import os
import sys

port, pid, nproc = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
try:
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
except Exception:
    pass

from spectrobot_tpu.parallel.mesh import initialize_multihost

initialize_multihost(coordinator_address=f"localhost:{port}",
                     num_processes=nproc, process_id=pid)
n_dev = 2 * nproc
assert jax.device_count() == n_dev

import jax.numpy as jnp
import numpy as np
from jax.experimental import multihost_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from spectrobot_tpu.data.atmosphere import MARS, mars_standard_atmosphere
from spectrobot_tpu.data.synth import random_lines
from spectrobot_tpu.forward.geometry import limb_path_cg
from spectrobot_tpu.forward.limb import limb_radiance
from spectrobot_tpu.ops.strengths import device_lines_from_linelist
from spectrobot_tpu.parallel.sharded import (
    HALO_LINES_SPECS, partition_lines_by_nu, sharded_radiance_fn)

# Identical scene on every process (same seeds).
ll = random_lines(120, 600.0, 640.0, seed=9)
dl = device_lines_from_linelist(ll, [(2, 1)], dtype=jnp.float64, nu_ref=0.0)
atm = mars_standard_atmosphere(n_lev=6, z_top=60e3)
nu_host = np.linspace(602.0, 638.0, 128)
nu = jnp.asarray(nu_host)
h_t = jnp.asarray([8e3, 24e3])
cg = limb_path_cg(atm, ["CO2"], h_t, MARS, n_sub=2)
cutoff = 6.0                      # < shard width 36/4 = 9 cm^-1

mesh = Mesh(np.array(jax.devices()).reshape(1, 1, n_dev),
            ("ray", "line", "nu"))
dlp = partition_lines_by_nu(dl, nu_host, n_dev, cutoff_cm1=cutoff)

f = sharded_radiance_fn(mesh, has_nlte=False, has_background=False,
                        cutoff_cm1=cutoff, chunk=64, nu_halo=True)


def put(x, spec):
    """Global array from an identical-on-every-process host value."""
    x = np.asarray(x)
    sh = NamedSharding(mesh, spec)
    return jax.make_array_from_callback(x.shape, sh, lambda idx: x[idx])


nu_s = put(nu, P("nu"))
lines_s = type(dlp)(*[put(getattr(dlp, fld), getattr(HALO_LINES_SPECS, fld))
                      for fld in type(dlp)._fields])
cg_s = cg._replace(
    u=put(cg.u, P("ray")), T_sp=put(cg.T_sp, P("ray")),
    p_sp=put(cg.p_sp, P("ray")), p_self_sp=put(cg.p_self_sp, P("ray")),
    T_air=put(cg.T_air, P("ray")), seg_layer=put(cg.seg_layer, P()),
    u_air=put(cg.u_air, P("ray")), uu_air=put(cg.uu_air, P("ray")))

I_mesh = f(nu_s, lines_s, cg_s)
I_full = multihost_utils.process_allgather(I_mesh, tiled=True)

# Single-device reference, computed locally by every process.
I_ref = np.asarray(jax.jit(lambda: limb_radiance(
    nu, dl, cg, cutoff_cm1=cutoff, chunk=64))())
np.testing.assert_allclose(np.asarray(I_full), I_ref, rtol=1e-10,
                           atol=abs(I_ref).max() * 1e-12)
if pid == 0:
    print(f"MULTIHOST_FORWARD_OK shape={np.asarray(I_full).shape} "
          f"devices={n_dev} procs={nproc}")
