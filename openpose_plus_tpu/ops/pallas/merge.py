"""Pallas TPU kernel for the sequential subset merge.

The human-assembly merge (postproc/group.py) is inherently serial: each
connection sees the subsets produced by all earlier ones, so it runs as one
kernel whose state — a (max_humans, 18) table of global peak ids plus
running score/count vectors — lives in vector registers, with per-connection
scalars read from SMEM. This is the TPU-native replacement for the
reference's pointer-chasing C++ assembly loop (src/human.cpp [MED; empty
mount — SURVEY.md §2]).

Invalid connection slots are exact no-ops in the merge semantics, so the
wrapper compacts the (n_limbs * K) slot grid down to the valid prefix
(stable, preserving the limb-major processing order) and the kernel runs a
dynamic-trip-count loop over only those — real scenes accept ~30-60 of 304
slots, cutting the serial chain ~6x vs looping over every slot.

Semantics are bit-identical to group.assemble (the CMU merge, including its
overwrite-and-count quirk); parity is enforced by tests/test_pallas_merge.py
in interpret mode and the TPU parity check in bench/verify runs. The kernel
is written per-image; vmap lifts it over the batch.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from openpose_plus_tpu import skeleton
from openpose_plus_tpu.postproc.group import Subsets
from openpose_plus_tpu.postproc.paf import Connections

_N_PARTS = skeleton.N_PARTS


def _merge_kernel(n_valid_ref, ia_ref, ib_ref, a_gid_ref, b_gid_ref,
                  cscore_ref, a_ps_ref, b_ps_ref, can_create_ref,
                  parts_out, score_out, count_out, *, max_humans: int):
    m = max_humans
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (m, _N_PARTS), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (m, _N_PARTS), 1)
    cols1 = col_ids[:1]                     # (1, 18) column index row
    rvec = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0)
    neg = jnp.int32(-(2 ** 30))

    def conn_step(i, state):
        parts, score, count = state          # (m,18) i32, (m,1) f32, (m,1) i32
        ia = ia_ref[0, i]                    # SMEM arrays are (1, nc): vmap
        ib = ib_ref[0, i]                    # batching requires 2-D blocks
        a_gid = a_gid_ref[0, i]
        b_gid = b_gid_ref[0, i]
        cscore = cscore_ref[0, i]
        a_ps = a_ps_ref[0, i]
        b_ps = b_ps_ref[0, i]
        can_create = can_create_ref[0, i] > 0

        col_is_a = col_ids == ia             # (m,18) one-hot column masks
        col_is_b = col_ids == ib
        col_a = jnp.max(jnp.where(col_is_a, parts, neg), axis=1,
                        keepdims=True)       # (m,1) value at column ia
        col_b = jnp.max(jnp.where(col_is_b, parts, neg), axis=1,
                        keepdims=True)
        matchA = col_a == a_gid
        matchB = col_b == b_gid
        found = matchA | matchB              # (m,1)
        nfound = jnp.sum(found.astype(jnp.int32))

        # "first row where mask" = min over masked iota. NOT argmax: Mosaic's
        # argmax tie-break is unspecified (observed picking a non-lowest
        # index among equal values), while the merge semantics require the
        # FIRST matching/empty row.
        def first_row(mask):
            return jnp.min(jnp.where(mask, rvec, jnp.int32(m)))

        j1 = first_row(found)
        j2 = first_row(found & (rvec != j1))

        is_j1 = row_ids == j1                # (m,18)
        is_j2 = row_ids == j2
        row1 = jnp.max(jnp.where(is_j1, parts, neg), axis=0, keepdims=True)
        row2 = jnp.max(jnp.where(is_j2, parts, neg), axis=0, keepdims=True)
        overlap = jnp.any((row1 >= 0) & (row2 >= 0))

        empty = count == 0                   # (m,1)
        jnew = first_row(empty)
        has_empty = jnp.any(empty)
        is_new = row_ids == jnew

        r1_ib = jnp.max(jnp.where(cols1 == ib, row1, neg))
        attach1 = (nfound == 1) & (r1_ib != b_gid)
        merge = (nfound == 2) & jnp.logical_not(overlap)
        attach2 = (nfound == 2) & overlap
        create = (nfound == 0) & has_empty & can_create
        attach = attach1 | attach2

        rvec1 = rvec == j1                   # (m,1)
        rvec2 = rvec == j2
        rvecn = rvec == jnew

        # ---- attach: parts[j1, ib] = b_gid ------------------------------
        tgt_att = is_j1 & col_is_b
        parts_att = jnp.where(tgt_att, b_gid, parts)
        # scalar sub-sum first: matches group.assemble's
        # score.at[j1].add(b_pscore + cscore) association bit-for-bit
        score_att = jnp.where(rvec1, score + (b_ps + cscore), score)
        count_att = jnp.where(rvec1, count + 1, count)

        # ---- merge j1 <- j2, clear j2 -----------------------------------
        merged_row = jnp.where(row2 >= 0, row2, row1)     # (1,18)
        parts_mrg = jnp.where(is_j1, merged_row, parts)
        parts_mrg = jnp.where(is_j2, jnp.int32(-1), parts_mrg)
        s2 = jnp.sum(jnp.where(rvec2, score, 0.0))
        c2 = jnp.sum(jnp.where(rvec2, count, 0))
        score_mrg = jnp.where(rvec1, score + (s2 + cscore), score)
        score_mrg = jnp.where(rvec2, 0.0, score_mrg)
        count_mrg = jnp.where(rvec1, count + c2, count)
        count_mrg = jnp.where(rvec2, 0, count_mrg)

        # ---- create at jnew ---------------------------------------------
        new_row = jnp.where(cols1 == ia, a_gid,
                            jnp.where(cols1 == ib, b_gid, jnp.int32(-1)))
        parts_new = jnp.where(is_new, new_row, parts)
        score_new = jnp.where(rvecn, a_ps + b_ps + cscore, score)
        count_new = jnp.where(rvecn, 2, count)

        parts = jnp.where(attach, parts_att,
                          jnp.where(merge, parts_mrg,
                                    jnp.where(create, parts_new, parts)))
        score = jnp.where(attach, score_att,
                          jnp.where(merge, score_mrg,
                                    jnp.where(create, score_new, score)))
        count = jnp.where(attach, count_att,
                          jnp.where(merge, count_mrg,
                                    jnp.where(create, count_new, count)))
        return parts, score, count

    state = (jnp.full((m, _N_PARTS), -1, jnp.int32),
             jnp.zeros((m, 1), jnp.float32),
             jnp.zeros((m, 1), jnp.int32))
    # Dynamic trip count: only the compacted valid prefix is processed.
    parts, score, count = jax.lax.fori_loop(0, n_valid_ref[0, 0], conn_step,
                                            state)
    parts_out[:, :] = parts
    score_out[:, :] = score
    count_out[:, :] = count


def assemble_pallas(conns: Connections, peak_score: jax.Array,
                    max_peaks: int, max_humans: int,
                    interpret: bool = False) -> Subsets:
    """Single-image merge: conns fields (L, K) + peak_score (18, K).

    vmap over the batch; semantics identical to group.assemble.
    """
    n_limbs, k = conns.slot_a.shape
    m = max_humans
    nc = n_limbs * k

    # Per-connection endpoint data, gathered cheaply in XLA.
    pairs = jnp.asarray(skeleton.pairs_array())
    a_ps = jnp.take_along_axis(peak_score[pairs[:, 0]], conns.slot_a, axis=1)
    b_ps = jnp.take_along_axis(peak_score[pairs[:, 1]], conns.slot_b, axis=1)
    ia_full = jnp.repeat(pairs[:, 0], k)                      # (nc,)
    ib_full = jnp.repeat(pairs[:, 1], k)
    limb_full = jnp.repeat(jnp.arange(n_limbs, dtype=jnp.int32), k)
    a_gid_full = ia_full * max_peaks + conns.slot_a.reshape(-1)
    b_gid_full = ib_full * max_peaks + conns.slot_b.reshape(-1)

    # Stable compaction of valid slots to the prefix (limb-major processing
    # order preserved); invalid slots scatter out of bounds and are dropped.
    v = conns.valid.reshape(-1)
    tgt = jnp.where(v, jnp.cumsum(v.astype(jnp.int32)) - 1, nc)
    n_valid = jnp.sum(v.astype(jnp.int32)).reshape(1, 1)

    def compact(x):
        # (1, nc): SMEM blocks must keep 2 trailing dims under vmap batching.
        return jnp.zeros((nc,), x.dtype).at[tgt].set(x, mode="drop")[None]

    kernel = functools.partial(_merge_kernel, max_humans=max_humans)
    smem = functools.partial(pl.BlockSpec, memory_space=pltpu.SMEM)
    parts, score, count = pl.pallas_call(
        kernel,
        in_specs=[smem()] * 9,
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((m, _N_PARTS), jnp.int32),
            jax.ShapeDtypeStruct((m, 1), jnp.float32),
            jax.ShapeDtypeStruct((m, 1), jnp.int32),
        ),
        interpret=interpret,
    )(n_valid, compact(ia_full), compact(ib_full), compact(a_gid_full),
      compact(b_gid_full), compact(conns.score.reshape(-1)),
      compact(a_ps.reshape(-1)), compact(b_ps.reshape(-1)),
      compact((limb_full < 17).astype(jnp.int32)))
    return Subsets(parts=parts, score=score[:, 0], count=count[:, 0])
