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
    with pytest.raises(ValueError, match="compute.cutoff_cm1"):
        nu_shard_edges(np.asarray(nu), 8, 50.0)


@pytest.mark.parametrize("n_shards", [2, 4, 8])
def test_halo_per_shard_origins_exact_f64(n_shards):
    # Per-shard grid origins are a pure coordinate change: in f64 the result
    # must match the global-coordinate halo sum to rounding.
    from spectrobot_tpu.parallel.halo import (
        nu_shard_origins, rebase_grid_per_shard,
    )
    dl, kl, nu = _scene()
    cutoff = 10.0
    ref = np.asarray(accumulate_jnp(nu, kl, chunk=128, cutoff_cm1=cutoff))

    mesh = make_mesh((1, 1, n_shards), jax.devices()[:n_shards])
    edges = nu_shard_edges(np.asarray(nu), n_shards, cutoff)
    origins = nu_shard_origins(edges)
    skl = partition_kernel_lines(kl, np.asarray(dl.nu0), edges,
                                 origins=origins)
    nu_reb = rebase_grid_per_shard(np.asarray(nu), origins, dtype=np.float64)
    f = halo_accumulate_fn(mesh, chunk=128, cutoff_cm1=cutoff,
                           origins=origins)
    got = np.asarray(f(nu_reb, skl))
    np.testing.assert_allclose(got, ref, rtol=1e-10,
                               atol=np.abs(ref).max() * 1e-12)


def test_halo_per_shard_origins_f32_wide_band():
    # THE precision payoff (SURVEY.md round-1 deferred item): on a WIDE band
    # a global f32 origin quantises dnu at ~1e-4 cm^-1 (comparable to narrow
    # Doppler widths) while per-shard origins keep offsets within the chunk.
    from spectrobot_tpu.ops.opacity import KernelLines
    from spectrobot_tpu.parallel.halo import (
        nu_shard_origins, rebase_grid_per_shard,
    )
    n_shards = 8
    lo, hi, P = 400.0, 2400.0, 2048
    ll = random_lines(500, lo + 5.0, hi - 5.0, seed=7)
    dl = device_lines_from_linelist(ll, [(2, 1)], dtype=jnp.float64,
                                    nu_ref=0.0)
    # Low pressure -> Doppler-dominated, narrow lines (the hard case).
    kl = line_kernel_inputs(dl, 180.0, 2.0, 0.5,
                            amp_weights=jnp.ones((2, dl.n_lines)))
    nu = jnp.asarray(np.linspace(lo, hi, P))
    cutoff = 25.0
    ref = np.asarray(accumulate_jnp(nu, kl, chunk=128, cutoff_cm1=cutoff))
    peak = np.abs(ref).max()

    mesh = make_mesh((1, 1, n_shards), jax.devices()[:n_shards])
    edges = nu_shard_edges(np.asarray(nu), n_shards, cutoff)
    origins = nu_shard_origins(edges)
    skl32 = partition_kernel_lines(kl, np.asarray(dl.nu0), edges,
                                   origins=origins, out_dtype=np.float32)
    nu_reb32 = rebase_grid_per_shard(np.asarray(nu), origins)
    f = halo_accumulate_fn(mesh, chunk=128, cutoff_cm1=cutoff,
                           origins=origins)
    got32 = np.asarray(f(nu_reb32, skl32), np.float64)

    # Global-origin f32 for comparison: absolute coordinates, same pipeline.
    kl32 = KernelLines(*[None if a is None else a.astype(jnp.float32)
                         for a in kl])
    skl_g = partition_kernel_lines(kl32, np.asarray(dl.nu0), edges)
    f_g = halo_accumulate_fn(mesh, chunk=128, cutoff_cm1=cutoff)
    got_g = np.asarray(f_g(nu.astype(jnp.float32), skl_g), np.float64)

    err_per_shard = np.abs(got32 - ref).max() / peak
    err_global = np.abs(got_g - ref).max() / peak
    # Observed: 1.2e-3 vs 4.9e-3 — the residual per-shard error is the f32
    # evaluator itself (~5e-4 rel near cores), no longer coordinates.
    assert err_per_shard < 2e-3, err_per_shard
    assert err_per_shard < err_global / 3.0, (err_per_shard, err_global)


@pytest.mark.parametrize("n_shards", [2, 4, 8])
def test_halo_pallas_matches_single_device(n_shards):
    from spectrobot_tpu.ops.opacity import KernelLines
    from spectrobot_tpu.parallel.halo import halo_accumulate_pallas_fn
    dl, kl, nu = _scene(P=1024)
    cutoff = 10.0
    # The kernel computes in f32; its parity target is the f32 jnp path
    # (absolute-coordinate f32 dnu precision is a separate, known effect —
    # see the DeviceLines nu_ref docstring and test_f32_rebasing.py).
    kl32 = KernelLines(*[None if a is None else a.astype(jnp.float32)
                         for a in kl])
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
