"""Multi-host distributed-OE worker (round 4): two processes run the REAL
LM retrieval loop (retrieval.oe.retrieve + parallel.oe.make_sharded_oe)
over a process-spanning mesh — normal equations psum-assembled across the
process boundary each iteration, host-side LM bookkeeping running
identically (SPMD) on both processes.
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

import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from spectrobot_tpu.data.atmosphere import MARS, mars_standard_atmosphere
from spectrobot_tpu.data.synth import co2_15um_band
from spectrobot_tpu.ops.ils import ils_matrix
from spectrobot_tpu.ops.strengths import device_lines_from_linelist
from spectrobot_tpu.parallel.oe import make_sharded_oe
from spectrobot_tpu.retrieval.oe import OEConfig, retrieve
from spectrobot_tpu.retrieval.state import flatten_state, make_state

ll = co2_15um_band(j_max=8)
dl = device_lines_from_linelist(ll, [(2, 1)], dtype=jnp.float64)
atm = mars_standard_atmosphere(n_lev=5, z_top=60e3)
nu_host = np.linspace(660.0, 674.0, 128)
nu = jnp.asarray(nu_host)
h_t = jnp.asarray([8e3, 25e3])
chans = np.linspace(661.0, 673.0, 16)
W = jnp.asarray(ils_matrix(nu_host, chans, 0.5))

mesh = Mesh(np.array(jax.devices()).reshape(1, 1, n_dev),
            ("ray", "line", "nu"))
state0 = make_state(atm, [])
x_true, _ = flatten_state(state0)
oe = make_sharded_oe(mesh, atm, dl, nu, ["CO2"], MARS, h_t,
                     state_template=state0, ils_W=W, n_sub=2,
                     cutoff_cm1=3.0, chunk=64, nu_halo=True)

y_clean = np.asarray(oe.forward_flat(x_true), np.float64)
sigma = np.full(y_clean.shape, max(0.005 * y_clean.max(), 1e-12))
rng = np.random.default_rng(0)                    # same noise on all procs
y_obs = y_clean + sigma * rng.standard_normal(y_clean.shape)
n_lev = atm.n_lev
x0 = np.asarray(x_true, np.float64).copy()
x0[:n_lev] += 4.0
S_a = np.diag(np.full(n_lev, 10.0 ** 2))

oe.bind_observation(y_obs, sigma)
res = retrieve(oe.forward_flat, oe.jacobian, jnp.asarray(y_obs),
               jnp.asarray(x0), jnp.asarray(x0), S_a, jnp.asarray(sigma),
               OEConfig(max_iter=6), normal_eqs=oe.normal_eqs)

assert res.converged, res.history
err0 = np.abs(x0[:n_lev] - np.asarray(x_true)[:n_lev]).mean()
err = np.abs(res.x[:n_lev] - np.asarray(x_true)[:n_lev]).mean()
assert err < 0.5 * err0, (err0, err)
if pid == 0:
    print(f"MULTIHOST_OE_OK iters={res.n_iter} chi2={res.chi2:.3f} "
          f"Terr {err0:.2f}->{err:.2f}")
