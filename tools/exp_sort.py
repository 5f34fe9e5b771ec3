#!/usr/bin/env python
"""Microbenchmarks for replacing the MSM's dominant phase: the XLA sort.

The Pippenger bucket layout only needs a PARTITION by (window, bucket) —
order within a bucket is irrelevant (point addition commutes) — so a
counting partition can replace the comparison sort:

  1. block histograms  h[blk, b] = #rows in block with digit b
     (ones @ one-hot matmul; the one-hot fuses into the MXU operand)
  2. bucket bases      base[b] = exclusive-cumsum_b(sum_blk h)
     block offsets     offs[blk, b] = exclusive-cumsum_blk(h)
  3. in-block ranks    rank[i] = #{j < i in block : d_j == d_i}
     ((d_i == d_j) & strict-tril row sums — pure VPU, no bucket axis)
  4. position[i] = base[d_i] + offs[blk_i, d_i] + rank[i]  (gathers)
  5. order = scatter(i -> position[i])  (unique-index scatter)

This tool times each piece honestly (fresh values per call, np.asarray
barrier) against lax.sort on the same data.

Usage: PROF_N=262144 PROF_C=13 python tools/exp_sort.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import random

import jax.numpy as jnp
import numpy as np

from battlezips_halo2_tpu.ops import msm as M
from battlezips_halo2_tpu.curves import VESTA

N = int(os.environ.get("PROF_N", str(1 << 18)))
C = int(os.environ.get("PROF_C", "13"))
BLOCK = int(os.environ.get("PROF_BLOCK", "512"))
print(f"backend={jax.default_backend()} n={N} c={C} block={BLOCK}", flush=True)

NBUCK = (1 << (C - 1)) + 1
IDX_BITS = max(1, (N - 1).bit_length())


def fresh_digits(seed):
    r = random.Random(seed)
    sc = [r.randrange(VESTA.scalar.modulus) for _ in range(N)]
    return jnp.asarray(M.scalars_to_signed_digits(sc, C))


def _device_digits(seed):
    """Pseudo-random signed digits generated ON DEVICE from a 4-byte seed:
    the host->relay upload of a (W, N) digit array (~21 MB at 2^18) costs
    ~0.4 s and would swamp every phase timing. Distribution matches the
    real digits (uniform in [-2^(c-1), 2^(c-1))); values are only for
    TIMING, never correctness."""
    w_ids = jnp.arange(W, dtype=jnp.uint32)[:, None]
    i_ids = jnp.arange(N, dtype=jnp.uint32)[None, :]
    h = (i_ids * jnp.uint32(2654435761) + w_ids * jnp.uint32(40503) + seed) ^ (i_ids >> 13)
    h = h * jnp.uint32(2246822519)
    half = jnp.uint32(1 << (C - 1))
    return (h % (2 * half)).astype(jnp.int32) - (1 << (C - 1))


_gen = jax.jit(_device_digits)


def timed(name, f, seeds=(11, 12, 13)):
    g = jax.jit(lambda s: f(_device_digits(s)))
    out = g(jnp.uint32(1))
    jax.tree_util.tree_map(np.asarray, out)
    best = None
    for s in seeds:
        t0 = time.time()
        out = g(jnp.uint32(s))
        jax.tree_util.tree_map(np.asarray, out)
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    print(f"{name:24s}: {best * 1000:9.1f} ms (in-graph inputs)", flush=True)
    return out


W = M.signed_window_count(C)
print(f"windows={W} nbuck={NBUCK} rows={W * N}", flush=True)


@jax.jit
def xla_sort_packed(digits):
    mag = jnp.abs(digits.astype(jnp.int32))
    sgn = (digits < 0).astype(jnp.uint32)
    key = (mag.astype(jnp.uint32) << (IDX_BITS + 1)) | (sgn << IDX_BITS) | jnp.arange(
        N, dtype=jnp.uint32
    )
    key_s = jax.lax.sort(key, dimension=1)
    return key_s[:, :: N // 16]  # tiny slice back


@jax.jit
def partition_positions(digits):
    """Counting partition: digits (W, N) -> position (W, N) int32 in the
    bucket-grouped layout, plus per-bucket counts (W, NBUCK)."""
    mag = jnp.abs(digits.astype(jnp.int32))  # (W, N) in [0, NBUCK)
    nblk = N // BLOCK
    d_blk = mag.reshape(W, nblk, BLOCK)
    # 1. block histograms via scatter-add into (W, nblk*NBUCK)
    blk_ids = jnp.arange(nblk, dtype=jnp.int32)[None, :, None]
    flat_idx = (blk_ids * NBUCK + d_blk).reshape(W, N)
    h = jnp.zeros((W, nblk * NBUCK), jnp.int32)
    h = jax.vmap(lambda hw, ix: hw.at[ix].add(1))(h, flat_idx)
    h = h.reshape(W, nblk, NBUCK)
    # 2. bases + block offsets
    total = h.sum(axis=1)  # (W, NBUCK)
    base = jnp.cumsum(total, axis=1) - total  # exclusive over buckets
    offs = jnp.cumsum(h, axis=1) - h  # exclusive over blocks (W, nblk, NBUCK)
    # 3. in-block ranks via equality matrix + strict tril
    eq = d_blk[..., :, None] == d_blk[..., None, :]  # (W, nblk, BLOCK, BLOCK)
    tril = jnp.tril(jnp.ones((BLOCK, BLOCK), jnp.bool_), k=-1)
    rank = (eq & tril).sum(axis=-1).astype(jnp.int32)  # (W, nblk, BLOCK)
    # 4. final positions
    flat_off = offs.reshape(W, nblk * NBUCK)
    o = jnp.take_along_axis(flat_off, flat_idx, axis=1)
    b = jnp.take_along_axis(base, mag, axis=1)
    pos = b + o + rank.reshape(W, N)
    return pos, total


@jax.jit
def partition_with_scatter(digits):
    pos, total = partition_positions(digits)
    ids = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32)[None, :], (W, N))
    order = jnp.zeros((W, N), jnp.int32)
    order = jax.vmap(lambda o, p, i: o.at[p].set(i, unique_indices=True, mode="drop"))(
        order, pos, ids
    )
    return order[:, :: N // 16], total[:, :8]


@jax.jit
def hist_only(digits):
    mag = jnp.abs(digits.astype(jnp.int32))
    nblk = N // BLOCK
    d_blk = mag.reshape(W, nblk, BLOCK)
    blk_ids = jnp.arange(nblk, dtype=jnp.int32)[None, :, None]
    flat_idx = (blk_ids * NBUCK + d_blk).reshape(W, N)
    h = jnp.zeros((W, nblk * NBUCK), jnp.int32)
    h = jax.vmap(lambda hw, ix: hw.at[ix].add(1))(h, flat_idx)
    return h[:, :: NBUCK]


@jax.jit
def rank_only(digits):
    mag = jnp.abs(digits.astype(jnp.int32))
    nblk = N // BLOCK
    d_blk = mag.reshape(W, nblk, BLOCK)
    eq = d_blk[..., :, None] == d_blk[..., None, :]
    tril = jnp.tril(jnp.ones((BLOCK, BLOCK), jnp.bool_), k=-1)
    rank = (eq & tril).sum(axis=-1).astype(jnp.int32)
    return rank[:, :: max(1, nblk // 8), ::64]


@jax.jit
def gather_only(digits):
    mag = jnp.abs(digits.astype(jnp.int32))
    base = jnp.cumsum(jnp.ones((W, NBUCK), jnp.int32), axis=1)
    b = jnp.take_along_axis(base, mag, axis=1)
    return b[:, :: N // 16]


if __name__ == "__main__":
    which = sys.argv[1:] or ["sort", "pos", "scatter", "check"]
    if "hist" in which:
        timed("hist scatter-add", hist_only)
    if "rank" in which:
        timed("rank eq-tril", rank_only)
    if "gatherpos" in which:
        timed("bucket-base gather", gather_only)
    if "check" in which:
        d = fresh_digits(0)
        pos, total = jax.jit(partition_positions)(d)
        pos_np = np.asarray(pos)
        mag = np.abs(np.asarray(d).astype(np.int64))
        for w in (0, W - 1):
            # positions are a permutation and grouped by bucket
            assert sorted(pos_np[w].tolist()) == list(range(N)), "not a permutation"
            by_pos = np.empty(N, dtype=np.int64)
            by_pos[pos_np[w]] = mag[w]
            assert (np.diff(by_pos) >= 0).all(), "not bucket-grouped"
        print("check: partition positions are a bucket-grouped permutation", flush=True)
    if "sort" in which:
        timed("lax.sort packed", xla_sort_packed)
    if "pos" in which:
        timed("partition positions", jax.jit(partition_positions))
    if "scatter" in which:
        timed("partition + scatter", jax.jit(partition_with_scatter))
