"""Pallas TPU kernel for the PAF line-integral sampling.

postproc/paf.py samples both PAF channels of every limb at n = S*K*K
nearest-neighbor points. The XLA TPU lowering (_sample_paf_onehot) runs two
one-hot einsum contractions whose (L, n, W, 2) intermediate round-trips
through HBM (~1.1 ms at bench shapes); this kernel keeps everything in VMEM,
one program per limb.

STATUS (v5e, 2026-08-18): measured SLOWER than the XLA one-hot einsum
(postproc/paf.py :: _sample_paf_onehot): ~4.9 ms vs ~1.1 ms at bench shapes.
The per-limb grid serializes MXU tile-ops — each of 152 programs pays
20 M-tiles x 2 N-tiles per pass with a K=92 contraction that fills one pass
regardless, while XLA batches all limbs+samples into one (48640, 92) x
(92, 328) matmul at the same tile floor with better packing. Both sit at
the inherent cost of one-hot sampling (M x N tiles for what is logically a
gather); the XLA path wins and decode uses it. Kept as reference for
hardware with cheaper small-matmul dispatch; re-profile before enabling.

Exactness: a one-hot row selects exactly one operand value, so the matmul
result is bit-identical to a gather for ANY faithful pass decomposition.
The f32 PAF plane is hand-split into three bf16 parts (hi/mid/lo reconstruct
the 24-bit mantissa exactly), each contracted with the exactly-representable
bf16 one-hot on the MXU and accumulated in f32 — the same mechanism XLA's
Precision.HIGHEST uses, pinned bit-equal to the gather by
tests/test_lowering_equiv.py (interpret) and the on-chip bench/verify check.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from openpose_plus_tpu import skeleton


def _split3(x: jax.Array) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Exact f32 = hi + mid + lo with bf16 parts (8+8+8 mantissa bits)."""
    hi = x.astype(jnp.bfloat16)
    r = x - hi.astype(jnp.float32)
    mid = r.astype(jnp.bfloat16)
    lo = (r - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, mid, lo


def _sample_kernel(paf_ref, sy_ref, sx_ref, px_ref, py_ref):
    """One limb per program: paf (1, 2, H, W), sy/sx (1, n, 1) ->
    px/py (1, n, 1)."""
    _, _, h, w = paf_ref.shape
    n = sy_ref.shape[1]
    iota_h = jax.lax.broadcasted_iota(jnp.int32, (1, h), 1)
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (1, w), 1)
    oy = (sy_ref[0] == iota_h).astype(jnp.bfloat16)       # (n, H)
    ox = (sx_ref[0] == iota_w).astype(jnp.float32)        # (n, W)

    def sample_plane(plane):
        hi, mid, lo = _split3(plane)
        t = jnp.zeros((n, w), jnp.float32)
        for part in (hi, mid, lo):
            t = t + jax.lax.dot_general(
                oy, part, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        return jnp.sum(ox * t, axis=1, keepdims=True)     # (n, 1)

    px_ref[0] = sample_plane(paf_ref[0, 0])
    py_ref[0] = sample_plane(paf_ref[0, 1])


def sample_paf_pallas(paf: jax.Array, sy: jax.Array, sx: jax.Array
                      ) -> tuple[jax.Array, jax.Array]:
    """NN-sample both PAF channels of every limb (single image).

    paf: (H, W, 38) f32; sy/sx: (L, S, K, K) int32 in-bounds coords.
    Returns (px, py) each (L, S, K, K) f32, bit-identical to the gather
    path. vmap over the batch.
    """
    h, w = paf.shape[0], paf.shape[1]
    l, s, k, _ = sy.shape
    n = s * k * k
    chans = skeleton.paf_channels_array()                 # (L, 2) static
    # (L, 2, H, W) channel-pair planes; XLA materializes this copy once.
    paf_pairs = jnp.transpose(paf[:, :, jnp.asarray(chans)], (2, 3, 0, 1))
    syc = sy.reshape(l, n, 1)
    sxc = sx.reshape(l, n, 1)
    px, py = pl.pallas_call(
        _sample_kernel,
        grid=(l,),
        in_specs=[
            pl.BlockSpec((1, 2, h, w), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, n, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((l, n, 1), jnp.float32),
            jax.ShapeDtypeStruct((l, n, 1), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * l * (3 * 2 * n * h * w),
            bytes_accessed=l * (2 * h * w * 4 + 2 * n * 4 + 2 * n * 4),
            transcendentals=0,
        ),
    )(paf_pairs, syc, sxc)
    return px.reshape(l, s, k, k), py.reshape(l, s, k, k)
