"""One-off TPU experiment: fused_topk_batch selection-depth variants.

Measures, net of this rig's ~28ms RPC floor:
  * kernel-only time (pallas pass reduced on device to one scalar)
  * end-to-end fused_topk_batch (packed small fetch)
for levels in {1 (matmul+max floor probe), 3, 4} at 10M bf16 and 1M f32,
plus certification rates. Prints one line per measurement; run to
completion (never kill a TPU-attached process on this rig).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def p50(fn, iters=8):
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        np.asarray(fn())
        ts.append((time.perf_counter() - t0) * 1e3)
    return float(np.percentile(ts, 50))


def main():
    import jax
    import jax.numpy as jnp
    import functools

    from evossearch_tpu.ops.topk_pallas import (
        _block_candidates, _tree_candidates, _tree_tile_rows,
        fused_topk_batch, fused_topk_batch_tree, LANES,
    )

    log(f"devices: {jax.devices()}")
    trivial = jax.jit(lambda x: x + 1.0)
    z = jnp.zeros((8,))
    np.asarray(trivial(z))
    floor = p50(lambda: trivial(z), iters=10)
    log(f"RPC floor: {floor:.1f}ms")

    @functools.partial(jax.jit, static_argnames=("levels",))
    def kernel_only(emb, q, levels):
        ss, ii, cert = _block_candidates(emb, q, False, levels)
        return jnp.sum(cert)  # 8-byte fetch; forces the whole pass

    @functools.partial(jax.jit, static_argnames=("k", "levels"))
    def e2e_packed(emb, q, k, levels):
        ok, s, i = fused_topk_batch(emb, q, k, levels=levels)
        return jnp.concatenate(
            [s, i.astype(jnp.float32), ok[:, None].astype(jnp.float32)],
            axis=1,
        )

    @jax.jit
    def tree_kernel_only(emb, q):
        outs = _tree_candidates(emb, q, _tree_tile_rows(emb.dtype), False)
        return jnp.sum(outs[2])

    @functools.partial(jax.jit, static_argnames=("k",))
    def tree_e2e_packed(emb, q, k):
        ok, s, i = fused_topk_batch_tree(emb, q, k)
        return jnp.concatenate(
            [s, i.astype(jnp.float32), ok[:, None].astype(jnp.float32)],
            axis=1,
        )

    for n, dtype, tag in ((10_000_000, jnp.bfloat16, "10M bf16"),
                          (1_000_000, jnp.float32, "1M f32")):
        emb = jax.random.normal(jax.random.key(0), (n, 512), dtype)
        if dtype == jnp.float32:
            emb = emb / jnp.linalg.norm(emb, axis=1, keepdims=True)
        q = jax.random.normal(jax.random.key(1), (LANES, 512), jnp.float32)
        q = q / jnp.linalg.norm(q, axis=1, keepdims=True)
        gb = n * 512 * emb.dtype.itemsize / 1e9
        for levels in (3,):
            np.asarray(kernel_only(emb, q, levels))  # compile
            ms = p50(lambda: kernel_only(emb, q, levels))
            net = max(ms - floor, 1e-9)
            log(f"[{tag}] kernel-only levels={levels}: p50={ms:.1f}ms "
                f"net={net:.1f}ms -> {gb / net * 1e3:.0f} GB/s")
        np.asarray(tree_kernel_only(emb, q))  # compile
        ms = p50(lambda: tree_kernel_only(emb, q))
        net = max(ms - floor, 1e-9)
        log(f"[{tag}] kernel-only TREE (tile {_tree_tile_rows(emb.dtype)}): "
            f"p50={ms:.1f}ms net={net:.1f}ms -> {gb / net * 1e3:.0f} GB/s")
        for levels in (3,):
            out = np.asarray(e2e_packed(emb, q, 48, levels))  # compile
            ok_rate = float(out[:, -1].mean())
            ms = p50(lambda: e2e_packed(emb, q, 48, levels))
            net = max(ms - floor, 1e-9)
            log(f"[{tag}] e2e levels={levels}: p50={ms:.1f}ms net={net:.1f}ms "
                f"-> {net / LANES:.3f} ms/q net (cert rate {ok_rate:.3f})")
        out = np.asarray(tree_e2e_packed(emb, q, 48))  # compile
        ok_rate = float(out[:, -1].mean())
        ms = p50(lambda: tree_e2e_packed(emb, q, 48))
        net = max(ms - floor, 1e-9)
        log(f"[{tag}] e2e TREE: p50={ms:.1f}ms net={net:.1f}ms "
            f"-> {net / LANES:.3f} ms/q net (cert rate {ok_rate:.3f})")
        del emb, q

    log("done")


if __name__ == "__main__":
    main()
