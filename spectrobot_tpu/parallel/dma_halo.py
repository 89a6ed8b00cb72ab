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
from typing import Optional

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


def _fused_kernel(nu_ref, own_ref, out_ref, recv_l_ref, recv_r_ref,
                  scr_l, scr_r, send_sem, recv_sem, copy_sem, *,
                  n_shards: int, block_l: int, cutoff: Optional[float],
                  n_out: int, use_barrier: bool = True):
    """Fused halo + accumulation, one program per shard (SURVEY.md 8.3:
    'distributed variant adds right/left remote copies of boundary
    line-blocks, started before local accumulation, waited before
    boundary-tile accumulation').

    own_ref/recv buffers pack the line arrays as rows:
    [nu_c, scale_x, y, amps_0..amps_{n_out-1}] x Lmax.
    Flow: neighbour barrier -> START both RDMAs -> accumulate OWN lines
    (compute overlaps the transfers) -> WAIT -> accumulate received halos.
    """
    from spectrobot_tpu.ops.pallas_opacity import _wr_tile

    my_id = lax.axis_index("nu")
    right = lax.rem(my_id + jnp.int32(1), jnp.int32(n_shards))
    left = lax.rem(my_id + jnp.int32(n_shards - 1), jnp.int32(n_shards))
    Lmax = own_ref.shape[1]
    n_blocks = Lmax // block_l

    if use_barrier:
        # All neighbours must have entered the kernel before anyone writes
        # into a neighbour's receive buffer (real-hardware requirement; the
        # interpret backend serialises devices and lacks barrier lowering).
        barrier = pltpu.get_barrier_semaphore()
        pltpu.semaphore_signal(barrier, inc=1, device_id=left,
                               device_id_type=pltpu.DeviceIdType.LOGICAL)
        pltpu.semaphore_signal(barrier, inc=1, device_id=right,
                               device_id_type=pltpu.DeviceIdType.LOGICAL)
        pltpu.semaphore_wait(barrier, 2)

    # Start the RDMAs: my block becomes the right neighbour's "from-left"
    # buffer and the left neighbour's "from-right" buffer.  Ring
    # degeneracies are STATIC: n=1 has no neighbours at all; n=2 has
    # left == right, so only ONE exchange happens (and only one halo
    # accumulation below) or the neighbour would be double-counted.
    send_right = n_shards > 1
    send_left = n_shards > 2
    if send_right:
        rdma_r = pltpu.make_async_remote_copy(
            src_ref=own_ref, dst_ref=recv_l_ref, send_sem=send_sem.at[0],
            recv_sem=recv_sem.at[0], device_id=right,
            device_id_type=pltpu.DeviceIdType.LOGICAL)
        rdma_r.start()
    if send_left:
        rdma_l = pltpu.make_async_remote_copy(
            src_ref=own_ref, dst_ref=recv_r_ref, send_sem=send_sem.at[1],
            recv_sem=recv_sem.at[1], device_id=left,
            device_id_type=pltpu.DeviceIdType.LOGICAL)
        rdma_l.start()

    def accumulate(src_ref):
        for b in range(n_blocks):
            sl = pl.ds(b * block_l, block_l)
            nuc = src_ref[0, sl][None, :]
            sx = src_ref[1, sl][None, :]
            yy = src_ref[2, sl][None, :]
            dnu = nu_ref[:, :] - nuc
            x = dnu * sx
            y = jnp.broadcast_to(yy, x.shape)
            gap = jnp.maximum(jnp.maximum(
                nuc[0, 0] - nu_ref[nu_ref.shape[0] - 1, 0],
                nu_ref[0, 0] - nuc[0, block_l - 1]), 0.0)
            s_min = gap * jnp.min(sx) + jnp.min(yy)
            wr = _wr_tile(x, y, s_min)
            if cutoff is not None:
                wr = jnp.where(jnp.abs(dnu) <= cutoff, wr, 0.0)
            amps = src_ref[pl.ds(3, n_out), sl]
            out_ref[:, :] += jax.lax.dot_general(
                amps, wr, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)

    out_ref[:, :] = jnp.zeros_like(out_ref)
    accumulate(own_ref)                       # overlaps the RDMAs

    halo_srcs = []
    if send_right:
        rdma_r.wait()                          # recv from LEFT neighbour
        halo_srcs.append((scr_l, recv_l_ref, 0))
    if send_left:
        rdma_l.wait()                          # recv from RIGHT neighbour
        halo_srcs.append((scr_r, recv_r_ref, 1))
    # Stage received buffers ANY -> VMEM, then accumulate.
    for scr, recv, sem_i in halo_srcs:
        cp = pltpu.make_async_copy(recv, scr, copy_sem.at[sem_i])
        cp.start()
        cp.wait()
        accumulate(scr)


def fused_halo_accumulate_fn(mesh: Mesh, *, block_l: int = 256,
                             cutoff_cm1: Optional[float] = 25.0,
                             interpret: bool = False):
    """Build f(nu_grid, skl) -> [n_out, P]: the FUSED device-initiated halo —
    remote DMA of neighbour line blocks overlapped with on-chip accumulation
    of the shard's own lines, in ONE Pallas kernel per shard (1-D nu mesh).

    Dense within the local chunk (no per-tile windows): intended for
    multi-chip deployments where each shard's chunk and line block are
    already window-sized.  n_out = skl.amps.shape[1]."""
    n_shards = mesh.shape["nu"]

    def per_shard(nu_loc, own_pack):
        q, Lmax = own_pack.shape
        n_out = q - 3
        P_loc = nu_loc.shape[0]
        kern = functools.partial(
            _fused_kernel, n_shards=n_shards, block_l=block_l,
            cutoff=cutoff_cm1, n_out=n_out, use_barrier=not interpret)
        out, _, _ = pl.pallas_call(
            kern,
            out_shape=(jax.ShapeDtypeStruct((n_out, P_loc), jnp.float32),
                       jax.ShapeDtypeStruct((q, Lmax), jnp.float32),
                       jax.ShapeDtypeStruct((q, Lmax), jnp.float32)),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                       pl.BlockSpec(memory_space=pl.ANY),
                       pl.BlockSpec(memory_space=pl.ANY)),
            scratch_shapes=[pltpu.VMEM((q, Lmax), jnp.float32),
                            pltpu.VMEM((q, Lmax), jnp.float32),
                            pltpu.SemaphoreType.DMA((2,)),
                            pltpu.SemaphoreType.DMA((2,)),
                            pltpu.SemaphoreType.DMA((2,))],
            compiler_params=pltpu.CompilerParams(
                has_side_effects=True, collective_id=7),
            interpret=interpret,
        )(nu_loc, own_pack)
        return out

    def body(nu_loc, nuc, sx, y, amps):
        n_sh_loc, n_out, Lmax = amps.shape   # leading shard axis is 1
        own_pack = jnp.concatenate(
            [nuc.reshape(1, Lmax), sx.reshape(1, Lmax), y.reshape(1, Lmax),
             amps.reshape(n_out, Lmax)], axis=0).astype(jnp.float32)
        return per_shard(nu_loc.reshape(-1, 1).astype(jnp.float32), own_pack)

    fn = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P("nu"), P("nu"), P("nu"), P("nu"), P("nu")),
        out_specs=P(None, "nu"), check_vma=False)
    jitted = jax.jit(fn)

    def apply(nu_grid, skl):
        return jitted(nu_grid, skl.nu_c, skl.scale_x, skl.y, skl.amps)

    return apply


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
