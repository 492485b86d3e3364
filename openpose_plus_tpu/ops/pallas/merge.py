"""Pallas TPU kernel for the sequential subset merge.

The human-assembly merge (postproc/group.py) is inherently serial:
n_limbs * K tiny steps, each a handful of ops on a (max_humans, 18) table.
Lowered through XLA that costs ~20 us/step in sequential small-op latency;
as ONE Pallas kernel the whole table lives in vector registers, the limb
loop is unrolled (static part indices), and per-connection scalars are read
from SMEM — the TPU-native replacement for the reference's pointer-chasing
C++ assembly loop (src/human.cpp [MED; empty mount — SURVEY.md §2]).

Semantics are bit-identical to group.assemble (enforced by
tests/test_pallas_merge.py in interpret mode and the TPU parity check in
bench/verify runs). The kernel is written per-image; vmap lifts it over
the batch via the Pallas batching rule.
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


def _merge_kernel(slot_a_ref, slot_b_ref, cscore_ref, valid_ref,
                  a_ps_ref, b_ps_ref,
                  parts_out, score_out, count_out,
                  *, max_peaks: int, max_humans: int):
    m = max_humans
    k = max_peaks
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (m, _N_PARTS), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (m, _N_PARTS), 1)
    rvec = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0)
    neg = jnp.int32(-(2 ** 30))

    def conn_step(limb, ia, ib, t, state):
        parts, score, count = state          # (m,18) i32, (m,1) f32, (m,1) i32
        a_slot = slot_a_ref[limb, t]
        b_slot = slot_b_ref[limb, t]
        cscore = cscore_ref[limb, t]
        cvalid = valid_ref[limb, t] > 0
        a_ps = a_ps_ref[limb, t]
        b_ps = b_ps_ref[limb, t]
        a_gid = ia * k + a_slot
        b_gid = ib * k + b_slot

        col_a = parts[:, ia].reshape(m, 1)
        col_b = parts[:, ib].reshape(m, 1)
        matchA = col_a == a_gid
        matchB = col_b == b_gid
        found = matchA | matchB              # (m,1)
        nfound = jnp.sum(found.astype(jnp.int32))

        j1 = jnp.argmax(found.astype(jnp.float32), axis=0)[0]  # f32: Mosaic argmax limit
        found2 = found & (rvec != j1)
        j2 = jnp.argmax(found2.astype(jnp.float32), axis=0)[0]

        is_j1 = row_ids == j1                # (m,18)
        is_j2 = row_ids == j2
        row1 = jnp.max(jnp.where(is_j1, parts, neg), axis=0, keepdims=True)
        row2 = jnp.max(jnp.where(is_j2, parts, neg), axis=0, keepdims=True)
        overlap = jnp.any((row1 >= 0) & (row2 >= 0))

        empty = count == 0                   # (m,1)
        jnew = jnp.argmax(empty.astype(jnp.float32), axis=0)[0]
        has_empty = jnp.any(empty)
        is_new = row_ids == jnew

        r1_ib = row1[0, ib]
        attach1 = cvalid & (nfound == 1) & (r1_ib != b_gid)
        merge = cvalid & (nfound == 2) & jnp.logical_not(overlap)
        attach2 = cvalid & (nfound == 2) & overlap
        create = cvalid & (nfound == 0) & has_empty & (limb < 17)
        attach = attach1 | attach2

        rvec1 = rvec == j1                   # (m,1)
        rvec2 = rvec == j2
        rvecn = rvec == jnew

        # ---- attach: parts[j1, ib] = b_gid ------------------------------
        tgt_att = is_j1 & (col_ids == ib)
        parts_att = jnp.where(tgt_att, b_gid, parts)
        score_att = jnp.where(rvec1, score + b_ps + cscore, score)
        count_att = jnp.where(rvec1, count + 1, count)

        # ---- merge j1 <- j2, clear j2 -----------------------------------
        merged_row = jnp.where(row2 >= 0, row2, row1)     # (1,18)
        parts_mrg = jnp.where(is_j1, merged_row, parts)
        parts_mrg = jnp.where(is_j2, jnp.int32(-1), parts_mrg)
        s2 = jnp.sum(jnp.where(rvec2, score, 0.0))
        c2 = jnp.sum(jnp.where(rvec2, count, 0))
        score_mrg = jnp.where(rvec1, score + s2 + cscore, score)
        score_mrg = jnp.where(rvec2, 0.0, score_mrg)
        count_mrg = jnp.where(rvec1, count + c2, count)
        count_mrg = jnp.where(rvec2, 0, count_mrg)

        # ---- create at jnew ---------------------------------------------
        new_row = jnp.where(col_ids == ia, a_gid,
                            jnp.where(col_ids == ib, b_gid, jnp.int32(-1)))
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
    for limb, (ia, ib) in enumerate(skeleton.COCO_PAIRS):  # unrolled: static
        state = jax.lax.fori_loop(
            0, k, functools.partial(conn_step, limb, int(ia), int(ib)), state)
    parts, score, count = state
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

    # Per-connection endpoint peak scores, gathered cheaply in XLA.
    pairs = jnp.asarray(skeleton.pairs_array())
    a_ps = jnp.take_along_axis(peak_score[pairs[:, 0]], conns.slot_a, axis=1)
    b_ps = jnp.take_along_axis(peak_score[pairs[:, 1]], conns.slot_b, axis=1)

    kernel = functools.partial(_merge_kernel, max_peaks=max_peaks,
                               max_humans=max_humans)
    smem = functools.partial(pl.BlockSpec, memory_space=pltpu.SMEM)
    parts, score, count = pl.pallas_call(
        kernel,
        in_specs=[smem(), smem(), smem(), smem(), smem(), smem()],
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
    )(conns.slot_a, conns.slot_b, conns.score,
      conns.valid.astype(jnp.int32), a_ps, b_ps)
    return Subsets(parts=parts, score=score[:, 0], count=count[:, 0])
