"""Device-initiated ring exchange with Pallas remote DMA (C25 native tier).

``ring_exchange`` moves each nu-shard's line-parameter block to its ring
neighbour with ``pltpu.make_async_remote_copy`` — the device-initiated RDMA
primitive of SURVEY.md 8.3/SNIPPETS.md — instead of an XLA collective.  It
is the building block for fusing communication INTO the opacity kernel
(start the neighbour DMA, accumulate own lines while it flies, wait, then
accumulate the received block): the fused variant needs only this exchange
plus the existing tiled accumulation in one kernel body.

The XLA-collective halo (parallel/halo.py, lax.ppermute) remains the default
production path — identical math, compiler-scheduled overlap; this module
provides the hand-scheduled tier and its semaphore protocol under test
(SURVEY.md section 6 "race detection": the DMA send/recv semaphore pairing
is the one place races are possible, so it gets explicit interpret-mode
coverage).

LIMITATION (current JAX): pallas dma_start supports only SINGLE-named-axis
meshes, so this tier runs on a dedicated 1-D ``nu`` mesh
(:func:`nu_ring_mesh`) — which is also its natural deployment (pure
spectral-domain decomposition across a ring of chips).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import Mesh, PartitionSpec as P


def nu_ring_mesh(devices=None) -> Mesh:
    """1-D ring mesh over the ``nu`` axis (the DMA tier's deployment)."""
    devices = list(devices if devices is not None else jax.devices())
    return jax.make_mesh((len(devices),), ("nu",), devices=devices)


def _ring_kernel(in_ref, out_ref, send_sem, recv_sem, *, axis: str,
                 direction: int, n_shards: int):
    """Send my block to the (direction=+1 right / -1 left) neighbour; the
    output buffer receives the corresponding neighbour's block."""
    my_id = lax.axis_index(axis)
    dst = lax.rem(my_id + jnp.int32(direction + n_shards),
                  jnp.int32(n_shards))
    op = pltpu.make_async_remote_copy(
        src_ref=in_ref, dst_ref=out_ref, send_sem=send_sem,
        recv_sem=recv_sem, device_id=dst,
        device_id_type=pltpu.DeviceIdType.LOGICAL)
    op.start()
    op.wait()


def ring_exchange(mesh: Mesh, axis: str = "nu", direction: int = 1,
                  *, interpret: bool = False, collective_id: int = 0):
    """Build f(x_sharded) -> neighbour's block of x, for 2-D arrays sharded
    on their leading axis over ``axis``.  direction=+1: each shard receives
    its LEFT neighbour's block (data moved rightward)."""
    n_shards = mesh.shape[axis]

    def per_shard(x):
        kern = functools.partial(_ring_kernel, axis=axis,
                                 direction=direction, n_shards=n_shards)
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[pltpu.SemaphoreType.DMA,
                            pltpu.SemaphoreType.DMA],
            compiler_params=pltpu.CompilerParams(
                has_side_effects=True, collective_id=collective_id),
            interpret=interpret,
        )(x)

    fn = jax.shard_map(per_shard, mesh=mesh, in_specs=P(axis),
                       out_specs=P(axis), check_vma=False)
    return jax.jit(fn)


def ring_halo_lines(mesh: Mesh, skl, *, interpret: bool = False):
    """DMA variant of the line halo: returns (from_left, from_right)
    ShardedKernelLines-shaped tuples, each holding the neighbour's block on
    every shard (left == block of shard k-1).  Flattens the amps axis so the
    DMA payload is one 2-D array per field."""
    from spectrobot_tpu.parallel.halo import ShardedKernelLines

    n_shards, n_out, Lmax = skl.amps.shape
    flat_amps = skl.amps.reshape(n_shards, n_out * Lmax)
    outs = []
    for d_i, direction in enumerate((1, -1)):
        ex = ring_exchange(mesh, "nu", direction, interpret=interpret,
                           collective_id=d_i)
        got = ShardedKernelLines(
            nu_c=ex(skl.nu_c), scale_x=ex(skl.scale_x), y=ex(skl.y),
            amps=ex(flat_amps).reshape(n_shards, n_out, Lmax))
        outs.append(got)
    return outs[0], outs[1]
