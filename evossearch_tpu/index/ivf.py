"""IVF approximate index: spherical k-means coarse centroids + padded
bucket scan (BASELINE.json config 5: >=99% recall@48 vs exact).

TPU-first layout: instead of FAISS-style ragged inverted lists, vectors are
stored in a dense (nlist, bucket_cap, d) tensor — every probe is then a
static-shape gather + one batched GEMM, no dynamic list walking. Vectors
that overflow a bucket spill into a dense "tail" matrix that is ALWAYS
scanned exactly, so pathological cluster imbalance degrades to extra exact
work, never to lost recall.

Query: top-nprobe centroids by IP -> gather those buckets -> fused scores +
mask + blocked top-k -> merge with the spill scan. All static shapes, one
jit per (k, nprobe).

Training: Lloyd iterations for spherical k-means (assignment by max IP,
centroid update by mean + renormalize), fully on device with one-hot
matmul segment sums — batched and MXU-friendly.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from .search import sort_by_score_then_index

NEG_INF = float(np.finfo(np.float32).min)


# Rows per k-means chunk: bounds peak memory at chunk x nlist scores +
# chunk x nlist one-hot (64 MB each at nlist=4096) instead of the
# N x nlist matrix a whole-corpus formulation would materialize (126 GB at
# 10M x 3162 — VERDICT round 1 item 10).
KMEANS_CHUNK = 1 << 15


@functools.partial(jax.jit, static_argnames=("iters",))
def _kmeans(emb: jax.Array, init: jax.Array, iters: int) -> jax.Array:
    """Spherical k-means; emb (N, d) L2-normalized, init (nlist, d).

    Assignment + accumulation run chunk-by-chunk under lax.scan, so HBM
    holds the corpus plus one chunk's score/one-hot matrices — never an
    (N, nlist) intermediate. Padding rows carry weight 0 and cannot
    perturb the centroids.
    """
    n, d = emb.shape
    nlist = init.shape[0]
    chunks = -(-n // KMEANS_CHUNK)
    pad = chunks * KMEANS_CHUNK - n
    weights = jnp.concatenate(
        [jnp.ones((n,), jnp.float32), jnp.zeros((pad,), jnp.float32)]
    ).reshape(chunks, KMEANS_CHUNK)
    emb_c = jnp.concatenate(
        [emb, jnp.zeros((pad, d), emb.dtype)]
    ).reshape(chunks, KMEANS_CHUNK, d)

    def step(cent, _):
        def body(carry, xw):
            sums, counts = carry
            x, w = xw
            scores = jnp.dot(x, cent.T, preferred_element_type=jnp.float32)
            assign = jnp.argmax(scores, axis=1)
            oh = jax.nn.one_hot(assign, nlist, dtype=jnp.float32) * w[:, None]
            sums = sums + jnp.dot(
                oh.T, x.astype(jnp.float32), preferred_element_type=jnp.float32
            )
            counts = counts + oh.sum(axis=0)
            return (sums, counts), None

        (sums, counts), _ = jax.lax.scan(
            body,
            (jnp.zeros((nlist, d), jnp.float32), jnp.zeros((nlist,), jnp.float32)),
            (emb_c, weights),
        )
        counts = counts[:, None]
        new = jnp.where(counts > 0, sums / jnp.maximum(counts, 1.0), cent)
        norm = jnp.linalg.norm(new, axis=1, keepdims=True)
        return (new / jnp.maximum(norm, 1e-12)).astype(cent.dtype), None

    cent, _ = jax.lax.scan(step, init, None, length=iters)
    return cent


@jax.jit
def _assign(emb: jax.Array, cent: jax.Array) -> jax.Array:
    """Chunked nearest-centroid assignment; (N,) int32."""
    n, d = emb.shape
    chunks = -(-n // KMEANS_CHUNK)
    pad = chunks * KMEANS_CHUNK - n
    emb_c = jnp.concatenate(
        [emb, jnp.zeros((pad, d), emb.dtype)]
    ).reshape(chunks, KMEANS_CHUNK, d)

    def body(_, x):
        scores = jnp.dot(x, cent.T, preferred_element_type=jnp.float32)
        return None, jnp.argmax(scores, axis=1).astype(jnp.int32)

    _, a = jax.lax.scan(body, None, emb_c)
    return a.reshape(-1)[:n]


@jax.jit
def _normalize_keep_dtype(emb: jax.Array) -> jax.Array:
    """Chunked L2 normalize with f32 math, result in the input dtype.

    A whole-array f32 upcast of a bf16 corpus would double its HBM
    footprint (20 GB transient at 10M x 512); scanning chunks keeps the
    peak at corpus + output + one chunk."""
    n, d = emb.shape
    chunks = -(-n // KMEANS_CHUNK)
    pad = chunks * KMEANS_CHUNK - n
    emb_c = jnp.concatenate(
        [emb, jnp.zeros((pad, d), emb.dtype)]
    ).reshape(chunks, KMEANS_CHUNK, d)

    def body(_, x):
        xf = x.astype(jnp.float32)
        nrm = jnp.sqrt(jnp.sum(xf * xf, axis=1, keepdims=True))
        return None, (xf / jnp.maximum(nrm, 1e-12)).astype(x.dtype)

    _, out = jax.lax.scan(body, None, emb_c)
    return out.reshape(-1, d)[:n]


@functools.partial(jax.jit, static_argnames=("nlist", "cap"))
def _scatter_buckets(emb, sa_in, pos_in, rows_in, nlist: int, cap: int):
    """Dense bucket layout as ONE program, chunked so the scan carry
    updates in place: peak HBM = corpus + buckets + one chunk. The first
    eager formulation (`zeros.at[sa, pos].set(emb[rows])`) materialized a
    full gather copy AND a second bucket tensor (out-of-place eager
    scatter) — +2x corpus at 3M rows, the difference between fitting and
    OOMing a 16 GB chip. Pad entries carry sa=nlist, dropped by the
    scatter's out-of-bounds mode."""
    d = emb.shape[1]
    m = rows_in.shape[0]
    chunks = max(1, -(-m // KMEANS_CHUNK))
    pad = chunks * KMEANS_CHUNK - m

    def padded(a, fill):
        return jnp.concatenate(
            [a, jnp.full((pad,), fill, a.dtype)]
        ).reshape(chunks, KMEANS_CHUNK)

    xs = (
        padded(sa_in, nlist),  # out of range -> dropped
        padded(pos_in, 0),
        padded(rows_in, 0),
    )
    buckets0 = jnp.zeros((nlist, cap, d), emb.dtype)
    ids0 = jnp.full((nlist, cap), -1, jnp.int32)

    def body(carry, x):
        b, ids = carry
        sa, po, ro = x
        b = b.at[sa, po].set(emb[ro], mode="drop")
        ids = ids.at[sa, po].set(ro.astype(jnp.int32), mode="drop")
        return (b, ids), None

    (buckets, bucket_ids), _ = jax.lax.scan(body, (buckets0, ids0), xs)
    return buckets, bucket_ids


@dataclass
class IVFIndex:
    centroids: jax.Array  # (nlist, d)
    buckets: jax.Array  # (nlist, cap, d)
    bucket_ids: jax.Array  # (nlist, cap) global row ids, -1 = pad
    spill: jax.Array  # (S, d) overflow rows, scanned exactly
    spill_ids: jax.Array  # (S,)
    n: int
    nlist: int
    tuned_nprobe: int = 0  # recall-calibrated at build; 0 = untuned

    @classmethod
    def build(
        cls, emb, nlist: int = 0, iters: int = 10,
        bucket_factor: float = 2.0, seed: int = 0,
        tune_target: float | None = 0.995,
        pre_normalized: bool = False,
    ) -> "IVFIndex":
        """Train centroids and lay out buckets from an (N, d) matrix.

        ``emb`` may be a numpy array (uploaded once) or a device array
        (zero host round trips). Everything corpus-sized — k-means,
        assignment, the sort-based bucket layout, and the bucket scatter —
        runs ON DEVICE; only O(N) int32 index vectors touch the host.
        (The first version scattered buckets in numpy, which re-shipped a
        2x-corpus-sized tensor to the device after a full download.)

        Buckets/spill keep the CORPUS dtype (bf16 stores build bf16
        buckets — half the IVF HBM; centroids and all score accumulation
        stay f32), so HBM cost ~= (1 + bucket_factor) x corpus bytes.

        ``tune_target``: recall target for build-time nprobe calibration
        (None disables). See ``_tune_nprobe``.
        ``pre_normalized``: skip the L2 normalize (store embeddings are
        already unit-norm at encode time) — saves a corpus-sized copy
        during training.
        """
        emb_dev = jnp.asarray(emb)
        if emb_dev.dtype not in (jnp.float32, jnp.bfloat16):
            emb_dev = emb_dev.astype(jnp.float32)
        n, d = emb_dev.shape
        nlist = nlist or max(1, int(np.sqrt(n)))
        nlist = min(nlist, n)
        rng = np.random.default_rng(seed)
        if pre_normalized:
            emb_n = emb_dev
        elif emb_dev.dtype == jnp.float32:
            norms = jnp.linalg.norm(emb_dev, axis=1, keepdims=True)
            emb_n = emb_dev / jnp.maximum(norms, 1e-12)
        else:  # bf16: chunked normalize, no f32 corpus copy
            emb_n = _normalize_keep_dtype(emb_dev)
        init = emb_n[
            jnp.asarray(rng.choice(n, size=nlist, replace=False))
        ].astype(jnp.float32)
        cent = _kmeans(emb_n, init, iters)
        assign = _assign(emb_n, cent)
        del emb_n

        # Vectorized bucket layout (a per-row Python loop dies at 1M+):
        # stable-sort rows by cluster, compute each row's position within
        # its cluster, and scatter rows below the cap into the dense
        # buckets; the rest spill to the exact-scanned tail.
        cap = max(1, int(np.ceil(n / nlist * bucket_factor)))
        order = jnp.argsort(assign, stable=True)
        sorted_assign = assign[order]
        starts = jnp.searchsorted(sorted_assign, jnp.arange(nlist))
        pos_within = jnp.arange(n) - starts[sorted_assign]
        # spill membership is data-dependent -> sizes must come to host
        in_bucket = np.asarray(pos_within < cap)
        order_h = np.asarray(order)
        rows_in = jnp.asarray(order_h[in_bucket])
        rows_spill = jnp.asarray(order_h[~in_bucket])
        sa_in = sorted_assign[jnp.asarray(np.flatnonzero(in_bucket))]
        pos_in = pos_within[jnp.asarray(np.flatnonzero(in_bucket))]
        buckets, bucket_ids = _scatter_buckets(
            emb_dev, sa_in, pos_in, rows_in, nlist=nlist, cap=cap
        )
        spill = emb_dev[rows_spill]
        spill_ids = rows_spill.astype(jnp.int32)
        tuned = 0
        if tune_target is not None and nlist > 1:
            is_spilled = (
                jnp.zeros((n,), bool).at[rows_spill].set(True)
                if rows_spill.shape[0]
                else jnp.zeros((n,), bool)
            )
            tuned = _tune_nprobe(
                emb_dev, cent, assign, is_spilled, rng,
                target=tune_target,
            )
        return cls(
            centroids=cent,
            buckets=buckets,
            bucket_ids=bucket_ids,
            spill=spill,
            spill_ids=spill_ids,
            n=n, nlist=nlist,
            tuned_nprobe=tuned,
        )

    def save(self, path) -> None:
        """Persist the trained index (centroids + bucket layout) so server
        restarts skip k-means retraining. bf16 buckets ride as uint16 bit
        patterns + a meta flag (numpy's npz would silently degrade the
        bf16 dtype to an opaque 2-byte void)."""
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
                [self.n, self.nlist, self.tuned_nprobe, int(is_bf16)],
                np.int64,
            ),
        )

    @classmethod
    def load(cls, path, host: bool = False) -> "IVFIndex | None":
        """Load a persisted index. ``host=True`` keeps every tensor in
        host numpy — NO device puts — for serving via ``search_host``:
        the device IVF costs ~(1 + bucket_factor) x corpus HBM, which is
        exactly what an over-HBM-budget corpus cannot afford."""
        put = np.asarray if host else jnp.asarray
        try:
            with np.load(path, allow_pickle=False) as data:
                meta = [int(v) for v in data["meta"]]
                n, nlist = meta[0], meta[1]
                tuned = meta[2] if len(meta) > 2 else 0
                is_bf16 = bool(meta[3]) if len(meta) > 3 else False
                buckets, spill = data["buckets"], data["spill"]
                if is_bf16:
                    import ml_dtypes

                    buckets = buckets.view(ml_dtypes.bfloat16)
                    spill = spill.view(ml_dtypes.bfloat16)
                return cls(
                    centroids=put(data["centroids"]),
                    buckets=put(buckets),
                    bucket_ids=put(data["bucket_ids"]),
                    spill=put(spill),
                    spill_ids=put(data["spill_ids"]),
                    n=n, nlist=nlist,
                    tuned_nprobe=tuned,
                )
        except Exception:
            return None

    def search(
        self, query: np.ndarray, k: int, nprobe: int = 0
    ) -> tuple[np.ndarray, np.ndarray]:
        """Approximate top-k; FAISS-shaped (scores, indices) result.

        Auto nprobe prefers the build-time recall-calibrated value
        (``tuned_nprobe``, see ``_tune_nprobe``) and falls back to
        nlist/4 on untuned indexes; either way it probes enough lists to
        cover >=2k candidate rows, so small corpora degrade toward exact
        search instead of returning short results.
        """
        q = jnp.asarray(query, jnp.float32)
        s, i = self.search_batch(q if q.ndim == 2 else q[None, :], k, nprobe)
        s, i = s[0], i[0]
        valid = i >= 0  # drop bucket padding when probes cover < k rows
        return s[valid], i[valid]

    def search_host(
        self, query: np.ndarray, k: int, nprobe: int = 0
    ) -> tuple[np.ndarray, np.ndarray]:
        """Approximate top-k entirely on the HOST (numpy BLAS) — the IVF
        path for CPU-only deployments, where it beats the exact host scan
        by ~corpus/probed-rows (the opposite of the accelerator verdict:
        an exact device sweep outruns IVF's gathers at every size that
        fits HBM, see docs/ARCHITECTURE.md "IVF positioning").

        Probes only nprobe buckets: per query it touches
        nprobe*cap + spill rows instead of all n, and only upcasts that
        slice to f32 when the buckets are bf16. Ranking is deterministic
        (score desc, id asc). Host copies of the bucket tensors are
        cached on first use."""
        cent, buckets, bucket_ids, spill, spill_ids = self._host_arrays()
        nprobe = self.resolve_nprobe(k, nprobe)
        q = np.asarray(query, np.float32)
        cs = cent.astype(np.float32) @ q
        if nprobe < len(cs):
            probe = np.argpartition(-cs, nprobe - 1)[:nprobe]
        else:
            probe = np.arange(len(cs))
        sub = buckets[probe].reshape(-1, buckets.shape[2])
        ids = bucket_ids[probe].reshape(-1)
        # bf16 buckets: quantize the query to the bucket dtype first,
        # exactly like the exact host scan (index/search.py) and the
        # device/sharded IVF routes, so every route scores identically
        qb = q.astype(buckets.dtype).astype(np.float32)
        scores = sub.astype(np.float32) @ qb
        if len(spill):
            scores = np.concatenate([scores, spill.astype(np.float32) @ qb])
            ids = np.concatenate([ids, spill_ids])
        valid = ids >= 0
        scores, ids = scores[valid], ids[valid]
        order = np.lexsort((ids, -scores))[:k]
        return scores[order], ids[order].astype(np.int64)

    def _host_arrays(self):
        if not hasattr(self, "_host_cache"):
            self._host_cache = tuple(
                np.asarray(a) for a in (
                    self.centroids, self.buckets, self.bucket_ids,
                    self.spill, self.spill_ids,
                )
            )
        return self._host_cache

    def resolve_nprobe(self, k: int, nprobe: int = 0) -> int:
        """The auto-nprobe rule (see ``search``), exposed for callers."""
        cap = self.buckets.shape[1]
        if not nprobe:
            base = self.tuned_nprobe or max(1, self.nlist // 4)
            nprobe = max(base, -(-2 * k // max(cap, 1)))
        return min(nprobe, self.nlist)

    def search_batch(
        self, queries, k: int, nprobe: int = 0
    ) -> tuple[np.ndarray, np.ndarray]:
        """Batched approximate top-k: (Q, d) queries -> (Q, kk) scores +
        ids in ONE device dispatch (kk = min(k, rows the probes cover)).
        Rows where the probed lists cover fewer than kk vectors are
        padded with id -1 / score -inf — callers drop ids < 0. Queries
        against the same corpus amortize the dispatch cost exactly like
        the exact batched kernels (serving's MicroBatcher routes IVF
        searches here)."""
        nprobe = self.resolve_nprobe(k, nprobe)
        k = min(k, self.n)
        q = queries.shape[0]  # shape only — no host fetch of device queries
        if k == 0 or q == 0:
            return (
                np.zeros((q, 0), np.float32), np.zeros((q, 0), np.int64)
            )
        args = (
            self.centroids, self.buckets, self.bucket_ids,
            self.spill, self.spill_ids,
            jnp.asarray(queries, jnp.float32), k, nprobe,
        )
        if self.n < (1 << 24):  # ids exact as f32 values below 2^24
            packed = np.asarray(_ivf_search_batch_packed(*args))
            # _ivf_search returns kk = min(k, candidate rows) entries,
            # which is < k when nprobe*cap + spill < k — split at the
            # actual half, not at k (a fixed-k split mixed scores with
            # float ids and crashed the valid-filter).
            kk = packed.shape[1] // 2
            s = packed[:, :kk]
            i = packed[:, kk:].astype(np.int64)
        else:
            s, i = (np.asarray(x) for x in _ivf_search_batch(*args))
        return s, i


# -- build-time nprobe calibration ---------------------------------------
#
# nlist/4 probes (the untuned default) gathers a quarter of the corpus per
# query — measured 90 ms/query at 1M on v5e where the EXACT batched sweep
# costs 0.73 ms/query. The right nprobe is data-dependent, so the build
# measures it: recall@k for ANY nprobe is determined by the rank each true
# top-k row's bucket takes in the query's centroid ordering, so two
# batched dispatches (exact top-k for a query sample + centroid-rank
# lookup) yield the whole recall(nprobe) curve at once; the calibrated
# value is the target-recall quantile of those ranks (+25% safety margin,
# and queries are noise-perturbed corpus rows so they do not sit exactly
# on their own bucket centroids).


def sample_tuning_queries(emb, rng, q_sample: int = 64, noise: float = 0.05):
    """Noise-perturbed corpus rows as calibration queries (perturbed so
    they do not sit exactly on their own bucket centroids); (Q, d) f32
    unit-norm device array. Shared by the single-device and mesh-sharded
    nprobe calibrations."""
    n = emb.shape[0]
    q_sample = min(q_sample, n)
    qidx = rng.choice(n, size=q_sample, replace=False)
    key = jax.random.key(int(rng.integers(2**31)))
    if isinstance(emb, np.ndarray):
        # host matrix: gather rows host-side — jnp.asarray(emb) would
        # device-put the WHOLE corpus just to sample 64 rows
        queries = jnp.asarray(np.asarray(emb[qidx], dtype=np.float32))
    else:
        queries = emb[jnp.asarray(qidx)].astype(jnp.float32)
    queries = queries + noise * jax.random.normal(
        key, queries.shape, jnp.float32
    )
    return queries / jnp.maximum(
        jnp.linalg.norm(queries, axis=1, keepdims=True), 1e-12
    )


def nprobe_from_ranks(
    cent, assign, is_spilled, queries, exact_i, target: float,
) -> int:
    """The shared tail of nprobe calibration: bucket ranks of the true
    top-k rows -> the target-recall quantile rank (+25% safety margin)."""
    nlist = cent.shape[0]
    ranks = np.sort(  # spill rows ride as -1: always found, sorted first
        np.asarray(  # np.asarray of a device array is read-only: copy-sort
            _bucket_ranks(
                cent, assign, is_spilled, queries, jnp.asarray(exact_i)
            )
        ).ravel()
    )
    need = max(1, int(np.ceil(target * ranks.size)))
    nprobe = int(ranks[min(need, ranks.size) - 1]) + 1
    return min(nlist, max(1, -(-nprobe * 5 // 4)))


def _tune_nprobe(
    emb: jax.Array, cent: jax.Array, assign: jax.Array,
    is_spilled: jax.Array, rng, k: int = 48, q_sample: int = 64,
    target: float = 0.995, noise: float = 0.05,
) -> int:
    from .search import exact_search_batch

    n = emb.shape[0]
    k = min(k, n)
    queries = sample_tuning_queries(emb, rng, q_sample, noise)
    _, exact_i = exact_search_batch(emb, queries, k)
    return nprobe_from_ranks(cent, assign, is_spilled, queries, exact_i, target)


@jax.jit
def _bucket_ranks(cent, assign, is_spilled, queries, exact_i):
    """For each (query, true top-k row): the rank of the row's bucket in
    the query's centroid ordering; -1 for spill rows (always scanned)."""
    q, nlist = queries.shape[0], cent.shape[0]
    cscores = jnp.dot(queries, cent.T, preferred_element_type=jnp.float32)
    order = jnp.argsort(-cscores, axis=1)
    rank = jnp.zeros((q, nlist), jnp.int32)
    rank = rank.at[jnp.arange(q)[:, None], order].set(
        jnp.broadcast_to(jnp.arange(nlist, dtype=jnp.int32), (q, nlist))
    )
    hit_rank = jnp.take_along_axis(rank, assign[exact_i], axis=1)
    return jnp.where(is_spilled[exact_i], -1, hit_rank)


# Queries per vmapped sub-batch inside _ivf_search_batch. The probed-
# bucket gather materializes (chunk, nprobe, cap, d) f32 — linear in the
# chunk — so an unchunked vmap over a 64-query burst at the 1M/nlist=1000
# configuration would gather ~5 GB on top of the ~4 GB bucket tensor.
# lax.map over chunks bounds it (~0.7 GB at chunk 8) in ONE dispatch.
_IVF_BATCH_CHUNK = 8


@functools.partial(jax.jit, static_argnames=("k", "nprobe"))
def _ivf_search_batch(centroids, buckets, bucket_ids, spill, spill_ids,
                      queries, k: int, nprobe: int):
    """Batched _ivf_search: (Q, d) queries -> (Q, kk) scores/ids in one
    dispatch (lax.map over vmapped chunks; see _IVF_BATCH_CHUNK)."""
    q, d = queries.shape
    chunk = min(_IVF_BATCH_CHUNK, q)
    g = -(-q // chunk)
    pad = g * chunk - q
    if pad:
        queries = jnp.concatenate(
            [queries, jnp.zeros((pad, d), queries.dtype)]
        )

    def run_chunk(qc):
        return jax.vmap(
            lambda qq: _ivf_search(
                centroids, buckets, bucket_ids, spill, spill_ids,
                qq, k, nprobe,
            )
        )(qc)

    s, i = jax.lax.map(run_chunk, queries.reshape(g, chunk, d))
    kk = s.shape[-1]
    return s.reshape(g * chunk, kk)[:q], i.reshape(g * chunk, kk)[:q]


@functools.partial(jax.jit, static_argnames=("k", "nprobe"))
def _ivf_search_batch_packed(centroids, buckets, bucket_ids, spill,
                             spill_ids, queries, k: int, nprobe: int):
    """_ivf_search_batch packed into one (Q, 2*kk) f32 array
    [scores | float(ids)]: a single device->host fetch instead of two
    (each fetch pays this rig's ~29ms relay floor). Ids ride as f32
    VALUES — exact below 2**24 rows, and -1 padding survives the float
    round trip."""
    s, i = _ivf_search_batch(
        centroids, buckets, bucket_ids, spill, spill_ids, queries, k, nprobe
    )
    return jnp.concatenate([s, i.astype(jnp.float32)], axis=1)


@functools.partial(jax.jit, static_argnames=("k", "nprobe"))
def _ivf_search(centroids, buckets, bucket_ids, spill, spill_ids,
                query, k: int, nprobe: int):
    cscores = centroids @ query  # (nlist,)
    _, probe = jax.lax.top_k(cscores, nprobe)
    sub = buckets[probe]  # (nprobe, cap, d)
    sub_ids = bucket_ids[probe]  # (nprobe, cap)
    # Quantize the query to the bucket dtype before scoring — the
    # contract every exact kernel (index/search.py), the host probe, and
    # the mesh-sharded IVF (parallel/sharded_ivf.py) follow, so the same
    # query scores the same rows identically across every route.
    qd = query.astype(buckets.dtype)
    scores = jnp.einsum(
        "pcd,d->pc", sub, qd, preferred_element_type=jnp.float32
    ).reshape(-1)
    flat_ids = sub_ids.reshape(-1)
    if spill.shape[0]:
        sp_scores = jnp.dot(spill, qd, preferred_element_type=jnp.float32)
        scores = jnp.concatenate([scores, sp_scores])
        flat_ids = jnp.concatenate([flat_ids, spill_ids])
    scores = jnp.where(flat_ids >= 0, scores, NEG_INF)
    kk = min(k, scores.shape[0])
    # (score desc, id asc) over the candidate pool — the engine-wide tie
    # contract. blocked_top_k's position tie-break follows PROBE order
    # here (positions are bucket-ordered, not id-ordered), which made
    # tied duplicates rank differently on the device route vs the host
    # probe / sharded merge.
    top_s, top_i = sort_by_score_then_index(
        scores[None, :], flat_ids[None, :], kk
    )
    return top_s[0], top_i[0]
