"""Pallas TPU kernel: fused segment-sum via on-chip one-hot matmul.

TPU scatters serialize; the MXU-native way to reduce E edge messages into
N node buckets is `one_hot(dst)^T @ data` — but materializing the (E, N)
one-hot in HBM costs E*N*4 bytes of traffic. This kernel builds each
one-hot tile in VMEM from an iota comparison and accumulates partial
matmuls across edge chunks, so HBM sees only the edge list, the messages,
and one (N, D) output (the BASELINE.json "Pallas segment-sum" kernel for
sparse message passing).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _seg_kernel(dst_ref, data_ref, out_ref, *, num_segments: int):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    dst = dst_ref[:]  # (E_blk, 1) int32; out-of-range = dropped
    e_blk = dst.shape[0]
    seg_ids = jax.lax.broadcasted_iota(jnp.int32, (num_segments, e_blk), 0)
    onehot = (seg_ids == dst[:, 0][None, :]).astype(jnp.float32)  # (N, E_blk)
    # HIGHEST precision: the v5e MXU's default f32 path quantizes inputs to
    # bf16 (~1e-2 abs error on unit-scale sums); a reduction kernel must be
    # exact, so take the 3-pass f32-equivalent matmul.
    out_ref[:] += jnp.dot(
        onehot,
        data_ref[:],
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def segment_sum_pallas(
    data: jnp.ndarray,  # (E, D) float32 edge messages
    segment_ids: jnp.ndarray,  # (E,) int32 destination per edge
    num_segments: int,
    valid: jnp.ndarray = None,  # (E,) bool
    block_e: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """(num_segments, D) float32 bucket sums. Invalid/padded edges dropped."""
    E, D = data.shape
    ids = segment_ids.astype(jnp.int32)
    if valid is not None:
        ids = jnp.where(valid, ids, num_segments)  # out of range -> dropped
    Ep = _round_up(max(E, 1), block_e)
    Np = _round_up(num_segments, 8)
    Dp = _round_up(D, 128)
    data_p = jnp.zeros((Ep, Dp), jnp.float32).at[:E, :D].set(data)
    ids_p = jnp.full((Ep, 1), num_segments, jnp.int32).at[:E, 0].set(ids)

    out = pl.pallas_call(
        functools.partial(_seg_kernel, num_segments=Np),
        grid=(Ep // block_e,),
        in_specs=[
            pl.BlockSpec((block_e, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_e, Dp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Np, Dp), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Np, Dp), jnp.float32),
        interpret=interpret,
    )(ids_p, data_p)
    return out[:num_segments, :D]
