"""Multi-process chunk loading + mesh-sharded streaming compute.

Reference parity: the reference's only multi-process story ships pickled
``FamilyChunk`` descriptors to dask workers, which reload the snapshot by
filename and slice out their chunk
(``/root/reference/pynbodyext/chunk/chunk.py:124-151``); simultaneous chunk
residency is bounded by a global semaphore (``chunk.py:63-66``).

TPU-native redesign (SURVEY §2.7 row "Data parallel over chunks"): the
accelerator has a single owner process, so worker processes do what they
are actually good for here — the host-side IO + decode of ``load_chunk``
(the reference's reload-by-filename, verbatim in spirit: the store is
pickled once per worker and each task is just ``(field, chunk index)``) —
while the owner process streams device compute.  Prefetch ``depth`` bounds
resident chunks exactly like the reference's semaphore.

The second half of the story is **>HBM combined with multi-device**:
:meth:`ChunkedSnapshot.sharded` (in :mod:`.stream`) routes every chunk
upload through :func:`shard_put`, splitting the particle axis over a
``jax.sharding.Mesh`` so each streamed chunk's reduction runs on all chips
(GSPMD inserts the cross-device ``psum``) while only one chunk is resident.
"""

from __future__ import annotations

import os
import pickle
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..log import logger
from .stream import ChunkStore

__all__ = ["PrefetchStore", "shard_put"]


# --------------------------------------------------------------------------
# Worker side: one store instance per worker process, rebuilt by unpickling
# (HDF5-backed stores hold only a filename + metadata, so this IS the
# reference's reload-by-filename — chunk.py:124-151).
# --------------------------------------------------------------------------

_WORKER_STORE: Optional[ChunkStore] = None


def _init_worker(store_bytes: bytes) -> None:
    global _WORKER_STORE
    # keep any accelerator plugin out of the worker: it only runs
    # numpy/h5py IO, and a second process must never grab the TPU
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ.setdefault("XLA_FLAGS", "")
    _WORKER_STORE = pickle.loads(store_bytes)


def _worker_load(name: str, i: int) -> np.ndarray:
    return np.ascontiguousarray(_WORKER_STORE.load_chunk(name, i))


class PrefetchStore(ChunkStore):
    """Chunk store decorator: loads run ahead in worker processes.

    Wraps any picklable :class:`ChunkStore`.  ``load_chunk(name, i)``
    returns the prefetched array when available and schedules the next
    ``depth`` chunks of the same field, so sequential streaming reductions
    overlap worker IO/decode with the owner process's device compute.

    ``workers=0`` degrades to a synchronous passthrough (no pool), which
    keeps a single code path for callers.

    Spawn-context caveat (standard Python multiprocessing): user *scripts*
    must guard their entry point with ``if __name__ == "__main__":`` or
    worker startup fails — in which case loading falls back to in-process
    with a warning rather than erroring.
    """

    def __init__(self, base: ChunkStore, workers: int = 2, depth: int = 2,
                 mp_context: str = "spawn"):
        self.base = base
        self.workers = int(workers)
        self.depth = max(1, int(depth))
        self._mp_context = mp_context
        self._pool = None
        self._inflight: Dict[Tuple[str, int], object] = {}
        # metadata mirrors (ChunkStore protocol)
        self.n_total = base.n_total
        self.chunk_size = base.chunk_size
        self.family_slices = dict(base.family_slices)
        self.properties = dict(base.properties)
        self._fields = base._fields

    # -- pool lifecycle ----------------------------------------------------
    def _ensure_pool(self):
        if self._pool is None and self.workers > 0:
            import multiprocessing as mp
            from concurrent.futures import ProcessPoolExecutor
            try:
                self._pool = ProcessPoolExecutor(
                    max_workers=self.workers,
                    mp_context=mp.get_context(self._mp_context),
                    initializer=_init_worker,
                    initargs=(pickle.dumps(self.base),))
            except Exception as e:  # unpicklable store, sandboxed env, …
                logger.warning("chunk prefetch pool unavailable (%s); "
                               "loading synchronously", e)
                self.workers = 0
        return self._pool

    def close(self) -> None:
        if self._pool is not None:
            self._pool.shutdown(wait=False, cancel_futures=True)
            self._pool = None
        self._inflight.clear()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):  # best-effort; explicit close() preferred
        try:
            self.close()
        except Exception:
            pass

    # -- ChunkStore protocol -------------------------------------------------
    def field_info(self, name: str):
        return self.base.field_info(name)

    def _schedule(self, name: str, i: int) -> None:
        key = (name, i)
        if key in self._inflight or not (0 <= i < self.n_chunks):
            return
        if len(self._inflight) >= self.workers * self.depth:
            return  # bounded residency (the reference's semaphore)
        self._inflight[key] = self._pool.submit(_worker_load, name, i)

    def load_chunk(self, name: str, i: int) -> np.ndarray:
        pool = self._ensure_pool()
        if pool is None:
            return self.base.load_chunk(name, i)
        fut = self._inflight.pop((name, i), None)
        # look ahead before blocking so workers fill the pipe while the
        # caller consumes this chunk
        for j in range(i + 1, i + 1 + self.depth):
            self._schedule(name, j)
        if fut is None:
            fut = self._pool.submit(_worker_load, name, i)
        try:
            return fut.result()
        except Exception as e:
            logger.warning("chunk prefetch failed for (%s, %d): %s — "
                           "falling back to in-process load", name, i, e)
            self.close()
            self.workers = 0
            return self.base.load_chunk(name, i)


# --------------------------------------------------------------------------
# Mesh-sharded chunk uploads (>HBM data × multi-device compute)
# --------------------------------------------------------------------------

def shard_put(x, mesh, axis_name: Optional[str] = None):
    """Upload ``x`` with its leading (particle) axis split over ``mesh``.

    Chunks whose row count does not divide the device count (the tail
    chunk) upload unsharded — a correctness-preserving fallback; every
    full chunk runs data-parallel.  Reductions on the sharded operand are
    partitioned by GSPMD with an automatic cross-device combine, which is
    this framework's redesign of the reference's dask-worker data path
    (SURVEY §2.7: "sharded across mesh; host→device streaming for >HBM").
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec

    x = np.asarray(x)
    if mesh is None or x.ndim == 0 or x.shape[0] % mesh.size != 0:
        return jnp.asarray(x)
    name = axis_name or mesh.axis_names[0]
    spec = PartitionSpec(name, *([None] * (x.ndim - 1)))
    return jax.device_put(x, NamedSharding(mesh, spec))
