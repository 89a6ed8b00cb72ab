"""Wing halo exchange over the nu mesh axis (C22/C25, SURVEY.md 5.4):
bit-level parity of the neighbour-exchange decomposition with the
single-device sum, on the 8-device emulated mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spectrobot_tpu.data.synth import random_lines
from spectrobot_tpu.ops.opacity import accumulate_jnp, line_kernel_inputs
from spectrobot_tpu.ops.strengths import device_lines_from_linelist
from spectrobot_tpu.parallel.halo import (
    halo_accumulate_fn, nu_shard_edges, partition_kernel_lines,
)
from spectrobot_tpu.parallel.mesh import make_mesh


def _scene(n_lines=600, P=1024, lo=600.0, hi=700.0):
    # Lines extend BEYOND the grid so out-of-range wings exercise clamping.
    ll = random_lines(n_lines, lo - 20.0, hi + 20.0, seed=3)
    dl = device_lines_from_linelist(ll, [(2, 1)], dtype=jnp.float64, nu_ref=0.0)
    kl = line_kernel_inputs(dl, 210.0, 120.0, 40.0,
                            amp_weights=jnp.ones((2, dl.n_lines)))
    nu = jnp.asarray(np.linspace(lo, hi, P))
    return dl, kl, nu


@pytest.mark.parametrize("n_shards", [2, 4, 8])
def test_halo_matches_single_device(n_shards):
    dl, kl, nu = _scene()
    cutoff = 10.0  # < shard width (100/8 = 12.5 cm-1)
    ref = np.asarray(accumulate_jnp(nu, kl, chunk=128, cutoff_cm1=cutoff))

    mesh = make_mesh((1, 1, n_shards), jax.devices()[:n_shards])
    edges = nu_shard_edges(np.asarray(nu), n_shards, cutoff)
    skl = partition_kernel_lines(kl, np.asarray(dl.nu0), edges)
    f = halo_accumulate_fn(mesh, chunk=128, cutoff_cm1=cutoff)
    got = np.asarray(f(nu, skl))
    np.testing.assert_allclose(got, ref, rtol=1e-11,
                               atol=np.abs(ref).max() * 1e-13)


def test_partition_covers_all_lines():
    dl, kl, nu = _scene(n_lines=321)
    edges = nu_shard_edges(np.asarray(nu), 4, 10.0)
    skl = partition_kernel_lines(kl, np.asarray(dl.nu0), edges)
    # Total (finite-amp) lines across shards == original count.
    n_real = int((np.asarray(skl.amps)[:, 0, :] != 0).sum())
    n_nonzero_src = int((np.asarray(kl.amps)[0] != 0).sum())
    assert n_real == n_nonzero_src


def test_cutoff_wider_than_shard_rejected():
    _, _, nu = _scene(P=512)
    with pytest.raises(AssertionError):
        nu_shard_edges(np.asarray(nu), 8, 50.0)


@pytest.mark.parametrize("n_shards", [2, 4, 8])
def test_halo_pallas_matches_single_device(n_shards):
    from spectrobot_tpu.ops.opacity import KernelLines
    from spectrobot_tpu.parallel.halo import halo_accumulate_pallas_fn
    dl, kl, nu = _scene(P=1024)
    cutoff = 10.0
    # The kernel computes in f32; its parity target is the f32 jnp path
    # (absolute-coordinate f32 dnu precision is a separate, known effect —
    # see the DeviceLines nu_ref docstring and test_f32_rebasing.py).
    kl32 = KernelLines(*[a.astype(jnp.float32) for a in kl])
    nu32 = nu.astype(jnp.float32)
    ref = np.asarray(accumulate_jnp(nu32, kl32, chunk=128, cutoff_cm1=cutoff))

    mesh = make_mesh((1, 1, n_shards), jax.devices()[:n_shards])
    edges = nu_shard_edges(np.asarray(nu), n_shards, cutoff)
    skl = partition_kernel_lines(kl32, np.asarray(dl.nu0), edges,
                                 round_to=128)
    f = halo_accumulate_pallas_fn(
        mesh, np.asarray(nu32), np.asarray(skl.nu_c), tile_p=128,
        block_l=128, cutoff_cm1=cutoff, interpret=True)
    got = np.asarray(f(nu32, skl))
    np.testing.assert_allclose(got, ref, rtol=5e-5,
                               atol=np.abs(ref).max() * 1e-6)
