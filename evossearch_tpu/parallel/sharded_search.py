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


# Shard size where the certified per-shard selection takes over from the
# blocked exact selection — the same scale where the single-device
# certified path wins (index/search._FAST_PATH_MIN_ROWS). Module-level so
# tests can lower it to exercise the path on the tiny CPU mesh.
CERT_MIN_SHARD_ROWS = 1 << 18


def _sharded_topk_certified(emb, counts, queries, k: int, mesh: Mesh):
    """Certified fast sharded search: per-shard ApproxTopK + ICI merge.

    Per shard: TPU-native ApproxTopK retrieves c >= k candidates and two
    certificates are computed against the shard's own score row (the same
    pair index/search._certified_topk uses):
      (a) exactly c scores >= m_j (m_j = the shard's weakest candidate)
          -> the candidates ARE the >=m_j set;
      (b) tie-robust: candidates contain every score STRICTLY above m_j.
    The merge gathers every shard's candidates + certification terms over
    ICI and lexsorts per query. Exactness argument: each shard ships
    c >= k candidates, so the global k-th selected score s_k >= m_j for
    every shard j; a row missing from shard j's candidates scores
    < m_j <= s_k under (a), or <= m_j < s_k under (b) when s_k > m_j —
    either way it cannot reach the top-k, and no boundary tie can exist
    outside the candidates. Queries where some shard satisfies neither
    certificate get ok=False and the caller re-runs them on the exact
    blocked path. Replaces a per-shard blocked selection that costs ~70x
    the ApproxTopK at multi-million-row shards (BASELINE config 3: 10M
    exact, mesh-sharded).
    """
    from ..index.search import (
        _overfetch, _score_precision, sort_by_score_then_index,
    )

    def local(emb_ref, counts_ref, qs):
        rows = emb_ref.shape[0]
        nq = qs.shape[0]
        scores = jnp.dot(
            qs.astype(emb_ref.dtype), emb_ref.T,
            preferred_element_type=jnp.float32,
            precision=_score_precision(emb_ref),
        )  # (Q, rows)
        valid = counts_ref[0]
        col_ids = jax.lax.broadcasted_iota(jnp.int32, (1, rows), 1)
        scores = jnp.where(col_ids < valid, scores, -jnp.inf)
        c = min(_overfetch(k), rows)
        cand_s, cand_i = jax.lax.approx_max_k(
            scores, c, recall_target=0.999, aggregate_to_topk=True
        )
        m = cand_s[:, -1]  # (Q,)
        ge = jnp.sum(scores >= m[:, None], axis=1)
        gt = jnp.sum(scores > m[:, None], axis=1)
        cand_gt = jnp.sum(cand_s > m[:, None], axis=1)
        shard_id = jax.lax.axis_index(CORPUS_AXIS)
        gidx = cand_i + shard_id * rows

        # ICI gather of candidates + certification terms; every device
        # computes the identical merge (replicated outputs).
        all_s = jax.lax.all_gather(cand_s, CORPUS_AXIS)  # (S, Q, c)
        all_i = jax.lax.all_gather(gidx, CORPUS_AXIS)
        cert_a = jax.lax.all_gather(ge == c, CORPUS_AXIS)  # (S, Q)
        cert_b = jax.lax.all_gather(gt == cand_gt, CORPUS_AXIS)
        all_m = jax.lax.all_gather(m, CORPUS_AXIS)  # (S, Q)
        flat_s = all_s.transpose(1, 0, 2).reshape(nq, -1)
        flat_i = all_i.transpose(1, 0, 2).reshape(nq, -1)
        top_s, top_i = sort_by_score_then_index(flat_s, flat_i, k)
        s_k = top_s[:, -1]
        shard_ok = cert_a | (cert_b & (s_k[None, :] > all_m))
        ok = jnp.all(shard_ok, axis=0)
        return ok, top_s, top_i

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(CORPUS_AXIS, None), P(CORPUS_AXIS), P()),
        out_specs=(P(), P(), P()),
        check_vma=False,  # replicated by construction, like _sharded_topk
    )(emb, counts, queries)


@functools.partial(jax.jit, static_argnames=("k", "mesh"))
def _sharded_topk_certified_jit(emb, counts, queries, k: int, mesh: Mesh):
    return _sharded_topk_certified(emb, counts, queries, k, mesh)


@functools.partial(jax.jit, static_argnames=("k", "mesh"))
def _sharded_topk_certified_packed(emb, counts, queries, k: int, mesh: Mesh):
    """Certified sharded search packed into ONE (Q, 2k+1) f32 fetch
    [scores | float(indices) | ok] — same single-transfer trick as
    index.search._fast_topk_batch_packed (each device->host fetch pays
    this rig's ~29ms relay floor; even PCIe charges latency). Callers
    must guard n_pad < 2**24 so global indices are exact as f32 values."""
    ok, s, i = _sharded_topk_certified(emb, counts, queries, k, mesh)
    return jnp.concatenate(
        [s, i.astype(jnp.float32), ok[:, None].astype(jnp.float32)], axis=1
    )


@dataclass
class ShardedIndex:
    """An embedding corpus row-sharded across a device mesh."""

    emb: jax.Array  # (n_pad, d), NamedSharding P('shard', None)
    counts: jax.Array  # (n_devices,) valid rows per shard
    n: int
    mesh: Mesh

    @classmethod
    def from_reader(
        cls, reader, mesh: Mesh | None = None, n_devices: int = 0
    ) -> "ShardedIndex":
        """Place a shard-store corpus onto the mesh straight off the
        mmap: each addressable device's row range is read (and its tail
        zero-padded) in its own callback, so no host materializes the
        whole corpus — from_matrix needs corpus + pad in host RAM, which
        at mesh scale (N x one chip's HBM of rows) is exactly the RAM a
        host doesn't have, and on a multi-host pod each host should only
        touch its own shards anyway."""
        mesh = mesh or corpus_mesh(n_devices)
        n_dev = mesh.devices.size
        n, d = reader.count, reader.dim
        rows = -(-max(n, 1) // n_dev)
        n_pad = rows * n_dev
        dtype = reader.shard_arrays()[0].dtype if n else np.float32
        shards = reader.shard_arrays()

        def emb_shard(idx):
            start, stop, _ = idx[0].indices(n_pad)
            out = np.zeros((stop - start, d), dtype)
            off = 0
            for sh in shards:
                hi = off + sh.shape[0]
                lo_, hi_ = max(start, off), min(stop, hi)
                if lo_ < hi_:
                    out[lo_ - start : hi_ - start] = sh[lo_ - off : hi_ - off]
                off = hi
            return out

        counts = np.minimum(
            np.maximum(n - rows * np.arange(n_dev), 0), rows
        ).astype(np.int32)
        emb = jax.make_array_from_callback(
            (n_pad, d), NamedSharding(mesh, P(CORPUS_AXIS, None)), emb_shard
        )
        counts_dev = jax.device_put(
            counts, NamedSharding(mesh, P(CORPUS_AXIS))
        )
        return cls(emb=emb, counts=counts_dev, n=n, mesh=mesh)

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
        """Batched exact top-k: (Q, d) queries -> (Q, k) results.

        Large shards take the certified per-shard ApproxTopK path with a
        per-query exact fallback; small shards run the blocked exact
        selection directly (certification is unreliable there and the
        blocked selection is already cheap)."""
        q = queries.shape[0]
        k = min(k, self.n)
        if k == 0:
            return np.zeros((q, 0), np.float32), np.zeros((q, 0), np.int64)
        queries_d = jnp.asarray(queries, jnp.float32)
        rows_per_shard = self.emb.shape[0] // self.mesh.devices.size
        if rows_per_shard >= CERT_MIN_SHARD_ROWS and k <= 128:
            if self.emb.shape[0] < (1 << 24):
                # one packed fetch; f32-exact indices below 2**24
                packed = np.asarray(_sharded_topk_certified_packed(
                    self.emb, self.counts, queries_d, k, self.mesh
                ))
                s = packed[:, :k].copy()
                i = packed[:, k : 2 * k].astype(np.int64)
                ok = packed[:, -1] > 0
            else:
                ok, s, i = (
                    np.asarray(x) for x in _sharded_topk_certified_jit(
                        self.emb, self.counts, queries_d, k, self.mesh
                    )
                )
                s, i = s.copy(), i.astype(np.int64)
                ok = ok.astype(bool)
            if not ok.all():
                # Bucket-padded fallback (index.search.gather_query_rows):
                # a fresh jit per distinct failed-row count would be a
                # compile storm under an adversarial tie-heavy corpus.
                from ..index.search import gather_query_rows

                fail = np.flatnonzero(~ok)
                sub, n_real = gather_query_rows(queries_d, fail)
                slow_s, slow_i = _sharded_topk_jit(
                    self.emb, self.counts, sub, k, self.mesh,
                )
                s[fail] = np.asarray(slow_s)[:n_real]
                i[fail] = np.asarray(slow_i)[:n_real]
            return s, i
        scores, idx = _sharded_topk_jit(
            self.emb, self.counts, queries_d, k, self.mesh
        )
        return np.asarray(scores), np.asarray(idx)
