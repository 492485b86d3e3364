"""Pallas TPU kernel for the per-limb greedy candidate assignment.

postproc/paf.py :: greedy_assign expresses the reference's
scan-sorted-candidates greedy (src/paf.cpp connection selection [MED; empty
mount — SURVEY.md §2]) as max_peaks rounds of masked argmax. Lowered through
XLA that is ~16 sequential dispatches of tiny ops (~0.5 ms at bench shapes);
here the whole assignment runs as ONE kernel: all 19 limbs advance together
as rows of a (19, K*K) score matrix in VMEM, and the K rounds are unrolled.

First-max selection uses max + masked min-iota (NOT argmax: Mosaic's argmax
tie-break is unspecified, while the greedy order requires the lowest
row-major candidate index on ties — same pitfall as ops/pallas/merge.py).
Bit-identical to paf.greedy_assign; pinned by tests/test_pallas_greedy.py
in interpret mode and used on TPU backends by postproc/decode.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from openpose_plus_tpu.postproc.paf import Connections


def _greedy_kernel(scores_ref, sa_ref, sb_ref, sc_ref, ok_ref, *, k: int):
    n_limbs, kk = scores_ref.shape
    rem = scores_ref[:]                                   # (L, K*K) f32
    col = jax.lax.broadcasted_iota(jnp.int32, (n_limbs, kk), 1)
    col_a = col // k                                      # candidate's A slot
    col_b = col % k                                       # candidate's B slot
    big = jnp.int32(kk)

    for t in range(k):                                    # static unroll
        best = jnp.max(rem, axis=1, keepdims=True)        # (L, 1)
        valid = best > -jnp.inf
        # first (lowest-index) argmax per row: min over masked column iota
        j = jnp.min(jnp.where(rem == best, col, big), axis=1,
                    keepdims=True)                        # (L, 1)
        ja = j // k
        jb = j % k
        hit = valid & ((col_a == ja) | (col_b == jb))
        rem = jnp.where(hit, -jnp.inf, rem)
        sa_ref[:, t] = jnp.where(valid, ja, 0)[:, 0]
        sb_ref[:, t] = jnp.where(valid, jb, 0)[:, 0]
        sc_ref[:, t] = jnp.where(valid, best, 0.0)[:, 0]
        ok_ref[:, t] = valid[:, 0].astype(jnp.int32)


def greedy_assign_pallas(scores: jax.Array, max_peaks: int,
                         interpret: bool = False) -> Connections:
    """Single-image greedy assignment: scores (n_limbs, K, K) -> Connections.

    vmap over the batch; semantics identical to paf.greedy_assign.
    """
    n_limbs, k, _ = scores.shape
    if k != max_peaks:
        raise ValueError(f"scores K dim {k} != max_peaks {max_peaks}")
    kernel = functools.partial(_greedy_kernel, k=k)
    sa, sb, sc, ok = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),) * 4,
        out_shape=(
            jax.ShapeDtypeStruct((n_limbs, k), jnp.int32),
            jax.ShapeDtypeStruct((n_limbs, k), jnp.int32),
            jax.ShapeDtypeStruct((n_limbs, k), jnp.float32),
            jax.ShapeDtypeStruct((n_limbs, k), jnp.int32),
        ),
        interpret=interpret,
    )(scores.reshape(n_limbs, k * k))
    return Connections(slot_a=sa, slot_b=sb, score=sc, valid=ok > 0)
