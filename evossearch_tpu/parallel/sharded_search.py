"""Corpus-sharded exact top-k search with ICI merge.

The single-FAISS-index search of the reference (oldapp.py:87, 2005) scales
here by row-sharding the embedding matrix across a device mesh:

    per shard:  local scores = E_shard @ q          (MXU matvec)
                local top-k (+ global row offset)
    merge:      all_gather(k candidates per shard)  (ICI collective)
                final lax.top_k over n_shards * k candidates

Determinism: sharded results are BIT-IDENTICAL to the single-device path.
Within a shard, lax.top_k breaks ties by lower local index; shards are
gathered in axis order, so equal scores surface in ascending global-index
order and the final top_k (stable in position) picks the lowest global
indices — the same contract exact_search guarantees (index/search.py).

Padding: the corpus is padded to n_devices * rows_per_shard; padded rows
get score -inf via an iota mask, so they can never enter the top-k.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import CORPUS_AXIS, corpus_mesh


def _sharded_topk(emb, counts, queries, k: int, mesh: Mesh):
    """shard_map body factory; emb: (n_pad, d) row-sharded, queries (Q, d)
    replicated. Returns replicated (Q, k) scores/global indices."""

    def local(emb_ref, counts_ref, qs):
        # emb_ref: (rows_per_shard, d) this shard; counts_ref: (1,) valid rows
        from ..index.search import _score_precision, blocked_top_k

        scores = jnp.dot(
            qs.astype(emb_ref.dtype), emb_ref.T,
            preferred_element_type=jnp.float32,
            precision=_score_precision(emb_ref),
        )  # (Q, rows)
        rows = emb_ref.shape[0]
        valid = counts_ref[0]
        col_ids = jax.lax.broadcasted_iota(jnp.int32, (1, rows), 1)
        scores = jnp.where(col_ids < valid, scores, -jnp.inf)
        # Blocked selection per shard: a flat lax.top_k over a multi-
        # million-row shard is one huge selection; block-then-merge is
        # exact with the same lowest-index tie contract and far faster on
        # TPU (index/search.blocked_top_k — the same routine the single-
        # device XLA path uses).
        k_local = min(k, rows)
        s, i = jax.vmap(lambda sc: blocked_top_k(sc, k_local))(scores)
        shard_id = jax.lax.axis_index(CORPUS_AXIS)
        gidx = i + shard_id * rows
        # Merge over ICI: gather each shard's k candidates per query and
        # reduce on every device (replicated output). Gather order keeps
        # equal scores in ascending global-index order.
        all_s = jax.lax.all_gather(s, CORPUS_AXIS)  # (n_shards, Q, k_local)
        all_i = jax.lax.all_gather(gidx, CORPUS_AXIS)
        cand_s = all_s.transpose(1, 0, 2).reshape(qs.shape[0], -1)
        cand_i = all_i.transpose(1, 0, 2).reshape(qs.shape[0], -1)
        fs, fpos = jax.lax.top_k(cand_s, k)
        return fs, jnp.take_along_axis(cand_i, fpos, axis=1)

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(CORPUS_AXIS, None), P(CORPUS_AXIS), P()),
        out_specs=(P(), P()),
        # outputs are replicated by construction (identical all_gather +
        # top_k on every device); the static varying-axes checker can't
        # infer that, so disable it
        check_vma=False,
    )(emb, counts, queries)


@functools.partial(jax.jit, static_argnames=("k", "mesh"))
def _sharded_topk_jit(emb, counts, queries, k: int, mesh: Mesh):
    return _sharded_topk(emb, counts, queries, k, mesh)


@dataclass
class ShardedIndex:
    """An embedding corpus row-sharded across a device mesh."""

    emb: jax.Array  # (n_pad, d), NamedSharding P('shard', None)
    counts: jax.Array  # (n_devices,) valid rows per shard
    n: int
    mesh: Mesh

    @classmethod
    def from_matrix(
        cls, matrix: np.ndarray, mesh: Mesh | None = None, n_devices: int = 0
    ) -> "ShardedIndex":
        """Place a host (N, d) matrix onto the mesh, padding the tail shard."""
        mesh = mesh or corpus_mesh(n_devices)
        n_dev = mesh.devices.size
        n, d = matrix.shape
        rows = -(-max(n, 1) // n_dev)  # rows per shard (>=1 so shapes are valid)
        n_pad = rows * n_dev
        if n_pad != n:
            pad = np.zeros((n_pad - n, d), dtype=matrix.dtype)
            matrix = np.concatenate([np.asarray(matrix), pad], axis=0)
        counts = np.minimum(
            np.maximum(n - rows * np.arange(n_dev), 0), rows
        ).astype(np.int32)
        sharding = NamedSharding(mesh, P(CORPUS_AXIS, None))
        emb = jax.device_put(matrix, sharding)
        counts_dev = jax.device_put(
            counts, NamedSharding(mesh, P(CORPUS_AXIS))
        )
        return cls(emb=emb, counts=counts_dev, n=n, mesh=mesh)

    def search(self, query: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
        """Exact top-k over the sharded corpus; FAISS-shaped result."""
        scores, idx = self.search_batch(np.asarray(query)[None, :], k)
        return scores[0], idx[0]

    def search_batch(
        self, queries: np.ndarray, k: int
    ) -> tuple[np.ndarray, np.ndarray]:
        """Batched exact top-k: (Q, d) queries -> (Q, k) results."""
        q = queries.shape[0]
        k = min(k, self.n)
        if k == 0:
            return np.zeros((q, 0), np.float32), np.zeros((q, 0), np.int64)
        scores, idx = _sharded_topk_jit(
            self.emb, self.counts, jnp.asarray(queries, jnp.float32), k, self.mesh
        )
        return np.asarray(scores), np.asarray(idx)
