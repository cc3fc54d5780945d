"""Out-of-core chunked execution: host→device streaming for >HBM snapshots.

Reference counterpart: ``pynbodyext/chunk`` (SURVEY.md §2.4) — there, dask
task graphs with a residency semaphore stream snapshot chunks through host
memory.  The TPU-native equivalent streams chunks host→HBM and reduces
on-device:

* :class:`~.stream.ChunkStore` — chunk source protocol (+ HDF5 and
  in-memory implementations; the HDF5 store reads dataset *slices*, true
  out-of-core like ``FamilyChunk.load_copy`` at ``chunk/chunk.py:86``);
* :class:`~.stream.StreamingArray` — lazy, unit-tracking array over chunks
  (the ``SimDaskArray`` analogue, ``chunk/simdaskarray.py:195``):
  elementwise ops compose per-chunk closures, reductions stream;
* :class:`~.stream.ChunkedSnapshot` — lazy snapshot facade
  (``ChunkSimSnap`` analogue, ``chunk/chunksnap.py:76``) with metadata
  probing that never loads data (``MiniSimSnap``, ``chunk/snapview.py:118``).
"""

from .stream import (ChunkedSnapshot, ChunkStore, ChunkView, ChunkedMask,
                     HDF5ChunkStore, SnapshotChunkStore, StreamingArray,
                     is_streaming_array)
from .executor import PrefetchStore, shard_put
from .profile import StreamingProfile

__all__ = ["ChunkedSnapshot", "ChunkStore", "ChunkView", "ChunkedMask",
           "HDF5ChunkStore", "PrefetchStore", "SnapshotChunkStore",
           "StreamingArray", "StreamingProfile", "is_streaming_array",
           "shard_put"]
