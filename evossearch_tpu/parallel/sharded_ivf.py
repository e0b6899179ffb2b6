"""Mesh-sharded IVF: the approximate index at corpus scales one chip's
HBM cannot hold (BASELINE config 5 at config 3's scale — e.g. 10M rows,
where the dense-bucket IVF needs ~(1 + bucket_factor) x corpus bytes and
a single v5e's 16 GB is already gone; measured in bench_ivf_10m).

Reference counterpart: none — the reference holds ONE in-RAM FAISS index
(oldapp.py:87). This scales the same capability the TPU way:

  build   global spherical-k-means centroids from a corpus SAMPLE
          (replicated, small), then per mesh shard: assign that shard's
          rows to the global centroids and lay them out as dense
          (nlist, cap, d) buckets + an exact-scanned spill — the same
          static-shape layout as index.ivf.IVFIndex, one per shard,
          stacked and row-sharded over the mesh.
  query   the probe list depends only on the query and the REPLICATED
          centroids, so every shard probes the same nprobe buckets of
          its own slice: gather + batched GEMM + local top-k per shard,
          then an all_gather of k candidates per shard over ICI and a
          deterministic (score desc, global id asc) merge — the exact
          sharded-search pattern (parallel/sharded_search.py) applied to
          probed buckets instead of the full corpus.

Recall semantics match the single-device IVF: the union of per-shard
buckets for a centroid IS the global bucket for that centroid (same
assignment rule, same centroids), so probing nprobe centroids covers the
same rows as a global IVF would — per-shard layout changes WHERE a row
lives, never whether a probe finds it. Spill rows are always scanned.

Build is host-orchestrated (assignment on device, layout in numpy): the
bucket split is data-dependent, which SPMD static shapes cannot express;
shapes are made uniform across shards (shared cap, spill padded to the
max shard's spill) before the one sharded device_put.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import CORPUS_AXIS, corpus_mesh
from ..index.ivf import (
    NEG_INF, _assign, _kmeans, nprobe_from_ranks, sample_tuning_queries,
)
from ..index.search import blocked_top_k, sort_by_score_then_index

# Queries per vmapped sub-batch inside the shard_map body — bounds the
# per-device probed-bucket gather at (chunk, nprobe, cap, d) like
# index.ivf._IVF_BATCH_CHUNK does for the single-device path.
_CHUNK = 8


def _sharded_ivf_body(k: int, nprobe: int):
    def local(cent, buckets, bucket_ids, spill, spill_ids, queries):
        nlist, cap, d = buckets.shape
        spill_cap = spill.shape[0]
        nq = queries.shape[0]
        kk = min(k, nprobe * cap + spill_cap)

        def one(q):
            cs = jnp.dot(cent, q, preferred_element_type=jnp.float32)
            _, probe = jax.lax.top_k(cs, nprobe)
            sub = buckets[probe]  # (nprobe, cap, d)
            ids = bucket_ids[probe].reshape(-1)
            # quantize the query to the store dtype before the bucket dot
            # — the contract every exact kernel and the host IVF follow
            # (index/search.py), so full-probe results EQUAL exact ones
            qd = q.astype(buckets.dtype)
            sc = jnp.einsum(
                "pcd,d->pc", sub, qd, preferred_element_type=jnp.float32
            ).reshape(-1)
            sp_sc = jnp.dot(spill, qd, preferred_element_type=jnp.float32)
            sc = jnp.concatenate([sc, sp_sc])
            ids = jnp.concatenate([ids, spill_ids])
            sc = jnp.where(ids >= 0, sc, NEG_INF)  # bucket/spill padding
            s_l, pos = blocked_top_k(sc, kk)
            return s_l, ids[pos]

        # lax.map over vmapped chunks: one program, bounded gather memory
        chunk = min(_CHUNK, nq)
        g = -(-nq // chunk)
        pad = g * chunk - nq
        qs = queries
        if pad:
            qs = jnp.concatenate([qs, jnp.zeros((pad, d), qs.dtype)])
        s, i = jax.lax.map(jax.vmap(one), qs.reshape(g, chunk, d))
        s = s.reshape(g * chunk, kk)[:nq]
        i = i.reshape(g * chunk, kk)[:nq]

        # ICI merge: gather every shard's kk candidates (global ids) and
        # reduce identically on every device (replicated output). Lexsort
        # enforces (score desc, global id asc) regardless of gather order.
        all_s = jax.lax.all_gather(s, CORPUS_AXIS)  # (S, Q, kk)
        all_i = jax.lax.all_gather(i, CORPUS_AXIS)
        cand_s = all_s.transpose(1, 0, 2).reshape(nq, -1)
        cand_i = all_i.transpose(1, 0, 2).reshape(nq, -1)
        kout = min(k, cand_s.shape[1])
        return sort_by_score_then_index(cand_s, cand_i, kout)

    return local


@functools.partial(jax.jit, static_argnames=("k", "nprobe", "mesh"))
def _sharded_ivf_search(
    cent, buckets, bucket_ids, spill, spill_ids, queries,
    k: int, nprobe: int, mesh: Mesh,
):
    return jax.shard_map(
        _sharded_ivf_body(k, nprobe),
        mesh=mesh,
        in_specs=(
            P(), P(CORPUS_AXIS, None, None), P(CORPUS_AXIS, None),
            P(CORPUS_AXIS, None), P(CORPUS_AXIS), P(),
        ),
        out_specs=(P(), P()),
        check_vma=False,  # replicated by construction (identical merge)
    )(cent, buckets, bucket_ids, spill, spill_ids, queries)


@functools.partial(jax.jit, static_argnames=("k", "nprobe", "mesh"))
def _sharded_ivf_search_packed(
    cent, buckets, bucket_ids, spill, spill_ids, queries,
    k: int, nprobe: int, mesh: Mesh,
):
    """[scores | float(ids)] in one (Q, 2*kout) fetch — ids exact as f32
    values below 2**24 rows (index.search._PACK_MAX_ROWS note)."""
    s, i = _sharded_ivf_search(
        cent, buckets, bucket_ids, spill, spill_ids, queries,
        k, nprobe, mesh,
    )
    return jnp.concatenate([s, i.astype(jnp.float32)], axis=1)


@dataclass
class ShardedIVFIndex:
    centroids: jax.Array  # (nlist, d) f32, replicated
    buckets: jax.Array  # (S*nlist, cap, d) store dtype, row-sharded
    bucket_ids: jax.Array  # (S*nlist, cap) int32 GLOBAL row ids, -1 pad
    spill: jax.Array  # (S*spill_cap, d) row-sharded, exact-scanned
    spill_ids: jax.Array  # (S*spill_cap,) int32 global ids, -1 pad
    n: int
    nlist: int
    mesh: Mesh
    tuned_nprobe: int = 0

    @classmethod
    def build(
        cls, matrix: np.ndarray, mesh: Mesh | None = None,
        n_devices: int = 0, nlist: int = 0, iters: int = 10,
        bucket_factor: float = 2.0, seed: int = 0,
        tune_target: float | None = 0.995, train_rows: int = 1 << 17,
        pre_normalized: bool = True,
    ) -> "ShardedIVFIndex":
        """Build from a HOST (N, d) matrix (f32 or ml_dtypes bf16 — the
        store dtype is kept for buckets/spill, like IVFIndex.build).

        Centroids train on a ``train_rows`` corpus sample on the default
        device (k-means over the full matrix is what a single chip cannot
        afford at this scale — sampling is also what FAISS does); per-
        shard assignment runs on device in chunks; the data-dependent
        bucket/spill split happens in numpy; ONE sharded device_put
        places the stacked result. ``pre_normalized=True`` (store
        embeddings are unit-norm at encode time) skips a host normalize
        pass.

        nprobe calibration reuses the mesh itself: exact reference
        results come from this index probed at nprobe=nlist (all buckets
        + spill = every row, and the merge's lexsort IS the exact tie
        contract), so no corpus-sized exact scan is needed anywhere.
        """
        mesh = mesh or corpus_mesh(n_devices)
        n_dev = int(mesh.devices.size)
        matrix = np.asarray(matrix)
        n, d = matrix.shape
        if n == 0:
            raise ValueError("cannot build an IVF over an empty corpus")
        if not pre_normalized:
            matrix = matrix.copy()
            for lo in range(0, n, 1 << 15):
                blk = matrix[lo : lo + (1 << 15)].astype(np.float32)
                nrm = np.linalg.norm(blk, axis=1, keepdims=True)
                matrix[lo : lo + (1 << 15)] = (
                    blk / np.maximum(nrm, 1e-12)
                ).astype(matrix.dtype)
        rng = np.random.default_rng(seed)
        nlist = nlist or max(1, int(np.sqrt(n)))
        nlist = min(nlist, n)

        # global centroids from a sample
        ts = min(n, max(train_rows, nlist))
        sample = matrix[rng.choice(n, size=ts, replace=False)]
        sample_dev = jnp.asarray(sample)
        init = jnp.asarray(
            np.asarray(
                sample[rng.choice(ts, size=nlist, replace=False)],
                dtype=np.float32,
            )
        )
        cent = _kmeans(sample_dev, init, iters)
        cent_host = np.asarray(cent)
        del sample_dev

        rps = -(-n // n_dev)  # rows per shard (global id = lo + local)
        cap = max(1, int(np.ceil(rps / nlist * bucket_factor)))
        dt = matrix.dtype
        buckets_h = np.zeros((n_dev, nlist, cap, d), dt)
        ids_h = np.full((n_dev, nlist, cap), -1, np.int32)
        assigns: list[np.ndarray] = []
        spills: list[tuple[np.ndarray, np.ndarray]] = []
        for s in range(n_dev):
            lo = s * rps
            local = matrix[lo : lo + rps]
            ln = local.shape[0]
            if ln == 0:
                assigns.append(np.zeros((0,), np.int32))
                spills.append((np.zeros((0, d), dt), np.zeros((0,), np.int32)))
                continue
            a = np.asarray(_assign(jnp.asarray(local), cent))
            assigns.append(a)
            order = np.argsort(a, kind="stable")
            sa = a[order]
            starts = np.searchsorted(sa, np.arange(nlist))
            pos = np.arange(ln) - starts[sa]
            in_b = pos < cap
            rows = order[in_b]
            buckets_h[s, sa[in_b], pos[in_b]] = local[rows]
            ids_h[s, sa[in_b], pos[in_b]] = rows.astype(np.int32) + lo
            sp_rows = order[~in_b]
            spills.append(
                (local[sp_rows], sp_rows.astype(np.int32) + lo)
            )
        spill_cap = max(1, max(sp[0].shape[0] for sp in spills))
        spill_h = np.zeros((n_dev, spill_cap, d), dt)
        spill_ids_h = np.full((n_dev, spill_cap), -1, np.int32)
        for s, (vecs, ids) in enumerate(spills):
            spill_h[s, : len(ids)] = vecs
            spill_ids_h[s, : len(ids)] = ids

        row_shard = NamedSharding(mesh, P(CORPUS_AXIS, None, None))
        idx = cls(
            centroids=jax.device_put(cent_host, NamedSharding(mesh, P())),
            buckets=jax.device_put(
                buckets_h.reshape(n_dev * nlist, cap, d), row_shard
            ),
            bucket_ids=jax.device_put(
                ids_h.reshape(n_dev * nlist, cap),
                NamedSharding(mesh, P(CORPUS_AXIS, None)),
            ),
            spill=jax.device_put(
                spill_h.reshape(n_dev * spill_cap, d),
                NamedSharding(mesh, P(CORPUS_AXIS, None)),
            ),
            spill_ids=jax.device_put(
                spill_ids_h.reshape(n_dev * spill_cap),
                NamedSharding(mesh, P(CORPUS_AXIS)),
            ),
            n=n, nlist=nlist, mesh=mesh,
        )
        if tune_target is not None and nlist > 1:
            queries = sample_tuning_queries(matrix, rng)
            _, exact_i = idx.search_batch(queries, k=min(48, n), nprobe=nlist)
            assign_g = jnp.asarray(np.concatenate(assigns))
            spilled = np.zeros((n,), bool)
            for _, ids in spills:
                spilled[ids] = True
            idx.tuned_nprobe = nprobe_from_ranks(
                cent, assign_g, jnp.asarray(spilled), queries,
                exact_i, tune_target,
            )
        return idx

    def resolve_nprobe(self, k: int, nprobe: int = 0) -> int:
        """Same auto rule as IVFIndex: tuned value (or nlist/4 untuned),
        raised to cover >= 2k candidate rows across the probed lists."""
        cap = self.buckets.shape[1]
        if not nprobe:
            base = self.tuned_nprobe or max(1, self.nlist // 4)
            nprobe = max(base, -(-2 * k // max(cap, 1)))
        return min(nprobe, self.nlist)

    def search_batch(
        self, queries, k: int, nprobe: int = 0
    ) -> tuple[np.ndarray, np.ndarray]:
        """Batched approximate top-k: (Q, d) -> (Q, kout) scores + global
        ids in one dispatch + one fetch. Rows the probes cover short of
        kout pad with score -inf / id -1 — callers drop ids < 0 (the
        single-device IVF contract)."""
        nprobe = self.resolve_nprobe(k, nprobe)
        k = min(k, self.n)
        q = queries.shape[0]
        if k == 0 or q == 0:
            return np.zeros((q, 0), np.float32), np.zeros((q, 0), np.int64)
        args = (
            self.centroids, self.buckets, self.bucket_ids,
            self.spill, self.spill_ids,
            jnp.asarray(queries, jnp.float32), k, nprobe, self.mesh,
        )
        if self.n < (1 << 24):
            packed = np.asarray(_sharded_ivf_search_packed(*args))
            kout = packed.shape[1] // 2
            return packed[:, :kout], packed[:, kout:].astype(np.int64)
        s, i = _sharded_ivf_search(*args)
        return np.asarray(s), np.asarray(i).astype(np.int64)

    def search(
        self, query: np.ndarray, k: int, nprobe: int = 0
    ) -> tuple[np.ndarray, np.ndarray]:
        """Single-query approximate top-k; FAISS-shaped, padding dropped."""
        s, i = self.search_batch(
            jnp.asarray(query, jnp.float32)[None, :], k, nprobe
        )
        s, i = s[0], i[0]
        valid = i >= 0
        return s[valid], i[valid]

    def save(self, path) -> None:
        """Persist centroids + the stacked shard layout (bf16 rides as
        uint16 bit patterns, like IVFIndex.save). The layout depends on
        the mesh SIZE, which is recorded and checked at load."""
        buckets = np.asarray(self.buckets)
        spill = np.asarray(self.spill)
        is_bf16 = buckets.dtype != np.float32
        if is_bf16:
            buckets = buckets.view(np.uint16)
            spill = spill.view(np.uint16)
        np.savez(
            path,
            centroids=np.asarray(self.centroids),
            buckets=buckets,
            bucket_ids=np.asarray(self.bucket_ids),
            spill=spill,
            spill_ids=np.asarray(self.spill_ids),
            meta=np.asarray(
                [
                    self.n, self.nlist, int(self.mesh.devices.size),
                    self.tuned_nprobe, int(is_bf16),
                ],
                np.int64,
            ),
        )

    @classmethod
    def load(cls, path, mesh: Mesh | None = None) -> "ShardedIVFIndex | None":
        """Load onto ``mesh`` (must match the saved mesh SIZE — the
        per-shard layout is size-specific). Returns None on any anomaly,
        including a size mismatch (callers rebuild), mirroring
        IVFIndex.load's fault tolerance."""
        mesh = mesh or corpus_mesh()
        try:
            with np.load(path, allow_pickle=False) as data:
                n, nlist, n_dev, tuned, is_bf16 = (
                    int(v) for v in data["meta"]
                )
                if n_dev != int(mesh.devices.size):
                    return None
                buckets, spill = data["buckets"], data["spill"]
                if is_bf16:
                    import ml_dtypes

                    buckets = buckets.view(ml_dtypes.bfloat16)
                    spill = spill.view(ml_dtypes.bfloat16)
                row3 = NamedSharding(mesh, P(CORPUS_AXIS, None, None))
                row2 = NamedSharding(mesh, P(CORPUS_AXIS, None))
                row1 = NamedSharding(mesh, P(CORPUS_AXIS))
                return cls(
                    centroids=jax.device_put(
                        data["centroids"], NamedSharding(mesh, P())
                    ),
                    buckets=jax.device_put(buckets, row3),
                    bucket_ids=jax.device_put(data["bucket_ids"], row2),
                    spill=jax.device_put(spill, row2),
                    spill_ids=jax.device_put(data["spill_ids"], row1),
                    n=n, nlist=nlist, mesh=mesh, tuned_nprobe=tuned,
                )
        except Exception:
            return None
