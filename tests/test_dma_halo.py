"""Pallas remote-DMA ring exchange — semaphore protocol and data movement
under interpret mode on the emulated mesh (SURVEY.md 5.4, section 6 'race
detection').

The module under test is the RETIRED experimental tier living in
``benchmarks/dma_halo.py`` (see its docstring for the retirement
rationale); these tests keep the send/recv semaphore protocol — the one
place in the repo where races are possible — under regression coverage."""

import importlib.util
import pathlib
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

_DMA_PATH = (pathlib.Path(__file__).resolve().parent.parent / "benchmarks"
             / "dma_halo.py")
_spec = importlib.util.spec_from_file_location("dma_halo", _DMA_PATH)
dma_halo = importlib.util.module_from_spec(_spec)
sys.modules.setdefault("dma_halo", dma_halo)
_spec.loader.exec_module(dma_halo)

nu_ring_mesh = dma_halo.nu_ring_mesh
ring_exchange = dma_halo.ring_exchange
ring_halo_lines = dma_halo.ring_halo_lines


@pytest.mark.parametrize("n_shards", [2, 4, 8])
@pytest.mark.parametrize("direction", [1, -1])
def test_ring_exchange_moves_blocks(n_shards, direction):
    mesh = nu_ring_mesh(jax.devices()[:n_shards])
    x = jnp.arange(n_shards * 8 * 128, dtype=jnp.float32).reshape(
        n_shards * 8, 128)
    f = ring_exchange(mesh, "nu", direction, interpret=True)
    out = np.asarray(f(x))
    ref = np.roll(np.asarray(x).reshape(n_shards, 8, 128), direction,
                  axis=0).reshape(n_shards * 8, 128)
    np.testing.assert_array_equal(out, ref)


def test_ring_halo_lines_matches_ppermute_semantics():
    from spectrobot_tpu.data.synth import random_lines
    from spectrobot_tpu.ops.opacity import line_kernel_inputs
    from spectrobot_tpu.ops.strengths import device_lines_from_linelist
    from spectrobot_tpu.parallel.halo import (
        nu_shard_edges, partition_kernel_lines,
    )

    n_shards = 4
    ll = random_lines(300, 600.0, 700.0, seed=5)
    dl = device_lines_from_linelist(ll, [(2, 1)], dtype=jnp.float32,
                                    nu_ref=0.0)
    kl = line_kernel_inputs(dl, 210.0, 100.0, 30.0,
                            amp_weights=jnp.ones((2, dl.n_lines),
                                                 jnp.float32))
    nu = np.linspace(600.0, 700.0, 512)
    edges = nu_shard_edges(nu, n_shards, 10.0)
    skl = partition_kernel_lines(kl, np.asarray(dl.nu0), edges)

    mesh = nu_ring_mesh(jax.devices()[:n_shards])
    from_left, from_right = ring_halo_lines(mesh, skl, interpret=True)
    # Shard k's "from_left" must equal shard k-1's own block, etc.
    np.testing.assert_array_equal(np.asarray(from_left.nu_c),
                                  np.roll(np.asarray(skl.nu_c), 1, axis=0))
    np.testing.assert_array_equal(np.asarray(from_right.amps),
                                  np.roll(np.asarray(skl.amps), -1, axis=0))


@pytest.mark.parametrize("n_shards", [2, 4, 8])
def test_fused_halo_accumulate_matches_single_device(n_shards):
    from spectrobot_tpu.data.synth import random_lines
    from spectrobot_tpu.ops.opacity import (
        KernelLines, accumulate_jnp, line_kernel_inputs,
    )
    from spectrobot_tpu.ops.strengths import device_lines_from_linelist
    fused_halo_accumulate_fn = dma_halo.fused_halo_accumulate_fn
    from spectrobot_tpu.parallel.halo import (
        nu_shard_edges, partition_kernel_lines,
    )

    ll = random_lines(500, 580.0, 720.0, seed=3)
    dl = device_lines_from_linelist(ll, [(2, 1)], dtype=jnp.float32,
                                    nu_ref=0.0)
    kl = line_kernel_inputs(dl, 210.0, 120.0, 40.0,
                            amp_weights=jnp.ones((2, dl.n_lines)))
    kl32 = KernelLines(*[None if a is None else a.astype(jnp.float32)
                         for a in kl])
    nu = np.linspace(600.0, 700.0, 1024)
    nu32 = jnp.asarray(nu, jnp.float32)
    cutoff = 10.0
    ref = np.asarray(accumulate_jnp(nu32, kl32, chunk=128, cutoff_cm1=cutoff))
    edges = nu_shard_edges(nu, n_shards, cutoff)
    skl = partition_kernel_lines(kl32, np.asarray(dl.nu0), edges,
                                 round_to=128)
    mesh = nu_ring_mesh(jax.devices()[:n_shards])
    f = fused_halo_accumulate_fn(mesh, block_l=128, cutoff_cm1=cutoff,
                                 interpret=True)
    got = np.asarray(f(nu32, skl))
    np.testing.assert_allclose(got, ref, rtol=5e-5,
                               atol=np.abs(ref).max() * 1e-6)
