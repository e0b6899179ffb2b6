"""Mesh-sharded SQ8: the certified int8 capacity tier across a mesh.

One v5e holds ~20M rows in the SQ8 tier (index/sq8.py); row-sharding the
int8 sidecar over an N-device mesh holds N x that EXACTLY — e.g. 160M
rows on a v5e-8 — with the same never-wrong guarantee. Replaces, at that
scale, the single in-RAM FAISS index of the reference (oldapp.py:87).

Per shard (shard_map over the corpus axis, same layout as
``ShardedIndex``): the Pallas bound sweep (ops.topk_pallas.sq8_candidates)
computes rigorous per-row score UPPER BOUNDS, hardware ApproxTopK fetches
the shard's top-``fetch`` bounds with the m-free counting certificate,
and the merge all_gathers every shard's candidates + certificate scalars
over ICI, then takes an EXACT global top-``fetch`` of the bounds (no
extra certificate needed for an exact top_k). The host reranks only the
global candidates (~fetch rows/query regardless of mesh size) straight
off the mmap store and certifies:

    m  = k-th reranked score
    m >= mf_s   for every shard s   (counting cert per shard: every row
                                     NOT fetched by s has bound < mf_s)
    m >= mf_g                        (candidates dropped by the global
                                     merge have bound <= mf_g)
    max_s m3max_s < m                (rows dropped inside the kernel's
                                     tree reduction)

A row absent from the reranked set therefore has score <= bound < m and
cannot reach the top-k; certified queries return the exact global top-k
under the (score desc, index asc) contract, uncertified ones rerun on
the host scan — identical fallback semantics to the one-chip tier.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import CORPUS_AXIS

NEG_INF = np.float32(-np.inf)


def _sharded_sq8_local(fetch: int, tile_rows: int, interpret: bool):
    """shard_map body: per-shard bound sweep + fetch + ICI merge."""
    from ..index.sq8 import _ID_SPLIT
    from ..ops.topk_pallas import sq8_candidates

    def local(e8_ref, scal2_ref, qs, qn):
        nq = qs.shape[0]  # LANES-padded
        rows = e8_ref.shape[0]
        cs, ci, m3 = sq8_candidates(
            e8_ref, scal2_ref, qs, qn, tile_rows, interpret
        )
        m3max = jnp.max(m3, axis=1)  # (nq,)
        fb, fpos = jax.lax.approx_max_k(
            cs, fetch, recall_target=0.999, aggregate_to_topk=True
        )
        fid_local = jnp.take_along_axis(ci, fpos, axis=1)
        shard_id = jax.lax.axis_index(CORPUS_AXIS)
        fid = fid_local + shard_id * rows
        mf = fb[:, -1]
        ge_all = jnp.sum(cs >= mf[:, None], axis=1)
        ge_got = jnp.sum(fb >= mf[:, None], axis=1)
        cnt_ok = ge_all == ge_got

        all_b = jax.lax.all_gather(fb, CORPUS_AXIS)      # (S, nq, fetch)
        all_i = jax.lax.all_gather(fid, CORPUS_AXIS)
        all_ok = jax.lax.all_gather(cnt_ok, CORPUS_AXIS)  # (S, nq)
        all_mf = jax.lax.all_gather(mf, CORPUS_AXIS)
        all_m3 = jax.lax.all_gather(m3max, CORPUS_AXIS)
        flat_b = all_b.transpose(1, 0, 2).reshape(nq, -1)
        flat_i = all_i.transpose(1, 0, 2).reshape(nq, -1)
        # EXACT top-`fetch` of the gathered bounds: the host rerank cost
        # stays ~fetch rows/query however many shards exist
        gb, gpos = jax.lax.top_k(flat_b, fetch)
        gi = jnp.take_along_axis(flat_i, gpos, axis=1)
        cnt_all = jnp.all(all_ok, axis=0).astype(jnp.float32)
        # a shard with -inf mf (fetch covered its whole candidate set)
        # contributes a trivially-satisfied bound to the max
        mf_max = jnp.max(all_mf, axis=0)
        m3_g = jnp.max(all_m3, axis=0)
        hi = jnp.floor_divide(gi, _ID_SPLIT).astype(jnp.float32)
        lo = jnp.mod(gi, _ID_SPLIT).astype(jnp.float32)
        return jnp.concatenate(
            [gb, hi, lo, cnt_all[:, None], mf_max[:, None], m3_g[:, None]],
            axis=1,
        )

    return local


@functools.partial(
    jax.jit, static_argnames=("fetch", "tile_rows", "interpret", "mesh")
)
def _sharded_sq8_select(e8, scal2, queries, qn, fetch: int, tile_rows: int,
                        interpret: bool, mesh: Mesh):
    """(Q_pad, 3*fetch + 3) f32 packed fetch:
    [global bounds | id_hi | id_lo | cnt_all | mf_max | m3max]."""
    return jax.shard_map(
        _sharded_sq8_local(fetch, tile_rows, interpret),
        mesh=mesh,
        in_specs=(P(CORPUS_AXIS, None), P(None, CORPUS_AXIS), P(), P()),
        out_specs=P(),
        check_vma=False,  # replicated by construction (identical merge
    )(e8, scal2, queries, qn)  # on every device, like _sharded_topk)


class SQ8ShardedIndex:
    """A one-chip SQ8Index row-sharded over a device mesh.

    Wraps the base index (sidecar persistence, host rerank, and the
    score/tie contract all reuse index/sq8.py); only device placement
    and the select differ. Pad rows get scale 0 / radd -inf, so their
    bounds are -inf and they can never be fetched."""

    def __init__(self, base, mesh: Mesh):
        from ..ops.topk_pallas import TREE_CLASSES

        self.base = base
        self.mesh = mesh
        self.n, self.dim = base.n, base.dim
        self.fetch = base.fetch
        self.tile_rows = base.tile_rows
        n_dev = int(mesh.devices.size)
        self.rows_per_shard = -(-max(self.n, 1) // n_dev)
        self.n_pad = self.rows_per_shard * n_dev
        grid = -(-self.rows_per_shard // self.tile_rows)
        self._shard_c_total = grid * 2 * TREE_CLASSES
        self._e8_d = None
        self._scal2_d = None

    def ensure_device(self) -> None:
        """Materialize the sidecar shard-by-shard: each addressable
        device's slice is read straight off the sidecar mmap (tail
        padding synthesized in place), so no host ever holds the whole
        padded corpus in RAM — at the 8-chip flagship scale (160M rows,
        ~83 GB int8) a device_put of one concatenated array would
        need 2x that transiently."""
        if self._e8_d is not None:
            return
        n, d, n_pad = self.n, self.dim, self.n_pad
        e8_src, scal2_src = self.base.e8, self.base.scal2

        def e8_shard(idx):
            sl = idx[0]
            start, stop, _ = sl.indices(n_pad)
            out = np.zeros((stop - start, d), np.int8)
            valid = max(0, min(n, stop) - start)
            if valid:
                out[:valid] = e8_src[start : start + valid]
            return out

        def scal2_shard(idx):
            sl = idx[1]
            start, stop, _ = sl.indices(n_pad)
            out = np.stack([
                np.zeros(stop - start, np.float32),
                np.full(stop - start, NEG_INF, np.float32),
            ])  # pad rows: scale 0, bound -inf — never fetched
            valid = max(0, min(n, stop) - start)
            if valid:
                out[:, :valid] = scal2_src[:, start : start + valid]
            return out

        self._e8_d = jax.make_array_from_callback(
            (n_pad, d),
            NamedSharding(self.mesh, P(CORPUS_AXIS, None)),
            e8_shard,
        )
        self._scal2_d = jax.make_array_from_callback(
            (2, n_pad),
            NamedSharding(self.mesh, P(None, CORPUS_AXIS)),
            scal2_shard,
        )

    def search_batch(self, queries: np.ndarray, k: int):
        """(Q, d) -> exact (scores (Q, k) f32, ids (Q, k) i64) under the
        global (score desc, index asc) tie contract — bit-equal ranking
        to the one-chip SQ8 tier and the host scan's score function."""
        from ..index.search import query_row_bucket
        from ..ops.topk_pallas import LANES

        queries = np.asarray(queries, np.float32)
        nq = queries.shape[0]
        k = min(k, self.n)
        if k == 0 or nq == 0:
            return (np.zeros((nq, k), np.float32),
                    np.zeros((nq, k), np.int64))
        if nq > LANES:
            # the kernel reads only the first LANES query rows (fixed
            # BlockSpec); chunk like pallas_search_batch does
            parts = [
                self.search_batch(queries[i : i + LANES], k)
                for i in range(0, nq, LANES)
            ]
            return (np.concatenate([p[0] for p in parts]),
                    np.concatenate([p[1] for p in parts]))
        self.ensure_device()
        fetch = min(max(self.fetch, k + 32), self._shard_c_total)
        full_fetch = fetch == self._shard_c_total

        pad = max(query_row_bucket(nq), LANES)
        qpad = queries
        if pad > nq:
            qpad = np.concatenate([
                queries,
                np.broadcast_to(queries[:1], (pad - nq, queries.shape[1])),
            ])
        qn = np.linalg.norm(qpad, axis=1, keepdims=True).astype(np.float32)
        interpret = jax.default_backend() == "cpu"
        packed = np.asarray(_sharded_sq8_select(
            self._e8_d, self._scal2_d, jnp.asarray(qpad), jnp.asarray(qn),
            fetch, self.tile_rows, interpret, self.mesh,
        ))[:nq]

        from ..index.sq8 import _ID_SPLIT

        gb = packed[:, :fetch]
        ids = (
            packed[:, fetch:2 * fetch].astype(np.int64) * _ID_SPLIT
            + packed[:, 2 * fetch:3 * fetch].astype(np.int64)
        )
        cnt_all = packed[:, -3] > 0
        mf_max = packed[:, -2]
        m3_g = packed[:, -1]
        mf_g = gb[:, -1]
        # The kernel's tail-masked cells carry the FINITE sentinel
        # np.finfo(f32).min with aliased iota ids — the same /2
        # threshold the one-chip tier uses (index/sq8.py) must filter
        # them here, or full-fetch merges over small corpora admit
        # sentinel candidates whose duplicate ids certify as results
        finite = np.isfinite(gb) & (
            gb > np.float32(np.finfo(np.float32).min) / 2
        )
        ids = np.where(finite & (ids < self.n), ids, 0)

        n_shards = int(self.mesh.devices.size)

        def cert(qi: int, m: float) -> bool:
            # Three drop sites, three terms: rows a shard never fetched
            # (cnt_ok + m >= mf_s, both vacuous when the fetch covered
            # the shard's whole candidate set), candidates the global
            # merge dropped (m >= mf_g; only exists with >1 shard), and
            # rows the kernel's tree reduction dropped (m3 < m).
            return bool(
                m3_g[qi] < m
                and (n_shards == 1 or m >= mf_g[qi])
                and (full_fetch or (cnt_all[qi] and m >= mf_max[qi]))
            )

        from ..index.sq8 import rerank_and_certify

        return rerank_and_certify(self.base, queries, ids, finite, k, cert)
