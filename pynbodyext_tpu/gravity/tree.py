"""Barnes–Hut octree solver: Python API over the native library.

Reference counterpart: the ``#[pyclass] Octree``
(``crates/pynbodyext-rust/src/gravity.rs:121-447``):
``Octree(positions, masses=None, leaf_capacity=32, multipole_order=0,
softenings=None, kernel=None)`` with ``compute_potentials`` /
``compute_accelerations`` / ``*_at_points(theta, threads=0)``.

The tree path targets the O(N log N) regime and CPU deployments; on TPU the
dense Pallas pipe (:mod:`.pallas_direct`) is the intended fast path for
N ≲ 10⁷ (SURVEY.md §2.5 note).
"""

from __future__ import annotations

import os
import time
from typing import Optional

import numpy as np

from ..util.thp import thp_empty, thp_zeros

from .kernels import KERNEL_NONE, KERNEL_PLUMMER, KERNEL_SPLINE

__all__ = ["Octree"]

#: env-var stage timing (reference parity: ``GRAVITY_TIMING``,
#: ``pynbodyext-rust/src/gravity.rs:13-31``)
_TIMING = bool(os.environ.get("PNX_GRAVITY_TIMING")
               or os.environ.get("GRAVITY_TIMING"))


#: rolling in-memory stage log (label, seconds) — read via
#: :func:`stage_records`; lets bench/driver report per-leg wall times
#: without parsing stderr (VERDICT r3 §next-1/3: per-leg breakdown)
_STAGES: list = []
_STAGES_MAX = 512


def _stage(label: str, t0: float) -> None:
    dt = time.perf_counter() - t0
    _STAGES.append((label, dt))
    if len(_STAGES) > _STAGES_MAX:
        del _STAGES[:-_STAGES_MAX]
    if _TIMING:
        import sys
        print(f"[pnx-gravity] {label}: {dt * 1e3:.2f} ms", file=sys.stderr)


def stage_records(clear: bool = True):
    """Return (and by default clear) the recorded ``(label, seconds)``
    stage list accumulated since the last call."""
    out = list(_STAGES)
    if clear:
        _STAGES.clear()
    return out

_KERNEL_CODE = {KERNEL_NONE: 0, KERNEL_PLUMMER: 1, KERNEL_SPLINE: 2,
                None: 0}


def _require_native():
    from . import _native
    if _native.lib is None:
        raise RuntimeError(
            "native octree library unavailable (g++ build failed); "
            "use the direct-sum solvers instead")
    return _native


class Octree:
    """Native Barnes–Hut octree with multipoles to order 5."""

    def __init__(self, positions, masses=None, leaf_capacity: int = 32,
                 multipole_order: int = 0, softenings=None,
                 kernel: Optional[str] = None, curve: str = "hilbert"):
        nat = _require_native()
        self._nat = nat
        pos = nat.as_f64(np.asarray(positions))
        if pos.ndim != 2 or pos.shape[1] != 3:
            raise ValueError(f"positions must be (N, 3), got {pos.shape}")
        n = pos.shape[0]
        if not 0 <= multipole_order <= 5:
            raise ValueError("multipole_order must be in [0, 5]")
        m = None if masses is None else nat.as_f64(
            np.broadcast_to(np.asarray(masses), (n,)))
        h = None if softenings is None else nat.as_f64(
            np.broadcast_to(np.asarray(softenings), (n,)))
        self._pos = pos
        self._mass = m
        self._soft = h
        self.n = n
        self.leaf_capacity = int(leaf_capacity)
        self.multipole_order = int(multipole_order)
        self.kernel = kernel
        # DFS child order: "hilbert" keeps spatially adjacent leaves
        # adjacent in sequence id (shorter device near-window lists,
        # more compact far groups); "morton" is the legacy Z-order.
        # Traversal results are order-independent (summation order only).
        if curve not in ("hilbert", "morton"):
            raise ValueError(f"curve must be 'hilbert' or 'morton', "
                             f"got {curve!r}")
        self.curve = curve
        code = _KERNEL_CODE[kernel]
        t0 = time.perf_counter()
        self._handle = nat.lib.pnx_tree_build(
            nat.dptr(pos), n, nat.dptr(m), self.leaf_capacity,
            self.multipole_order, nat.dptr(h), code,
            1 if curve == "hilbert" else 0)
        _stage(f"tree.build (N={n}, order={multipole_order})", t0)
        if not self._handle:
            raise RuntimeError("octree build failed")

    def __del__(self):
        handle = getattr(self, "_handle", None)
        if handle:
            try:
                self._nat.lib.pnx_tree_free(handle)
            except Exception:
                pass
            self._handle = None

    @property
    def n_nodes(self) -> int:
        return int(self._nat.lib.pnx_tree_n_nodes(self._handle))

    # -- solves ------------------------------------------------------------
    def _run(self, fn, targets, theta: float, threads: int, ncols: int):
        nat = self._nat
        if targets is None:
            tgt = self._pos
            self_mode = 1
            tsoft = self._soft
        else:
            tgt = nat.as_f64(np.asarray(targets))
            if tgt.ndim != 2 or tgt.shape[1] != 3:
                raise ValueError("targets must be (M, 3)")
            self_mode = 0
            tsoft = None
        m = tgt.shape[0]
        out = thp_zeros(m * ncols, np.float64)
        t0 = time.perf_counter()
        fn(self._handle, nat.dptr(tgt), m, self_mode, nat.dptr(tsoft),
           float(theta), int(threads), nat.dptr(out))
        _stage(f"tree.compute (M={m}, theta={theta})", t0)
        return out if ncols == 1 else out.reshape(m, 3)

    def compute_potentials(self, theta: float = 0.7, threads: int = 0,
                           targets=None) -> np.ndarray:
        return self._run(self._nat.lib.pnx_tree_potentials, targets,
                         theta, threads, 1)

    def compute_accelerations(self, theta: float = 0.7, threads: int = 0,
                              targets=None) -> np.ndarray:
        return self._run(self._nat.lib.pnx_tree_accelerations, targets,
                         theta, threads, 3)

    # -- accelerator handoff -------------------------------------------------
    def block_lists(self, theta: float = 0.7, block_size: int = 0):
        """Per-block interaction lists for device evaluation.

        ``block_size=0`` (default) groups targets per LEAF — always
        spatially compact; a positive value groups fixed runs of
        consecutive tree-order particles instead.  A conservative per-block
        traversal (opening criterion against the block bounding sphere)
        yields, for each block, the accepted far-field node ids and the
        near-field particle ids.  See
        :mod:`~pynbodyext_tpu.gravity.tree_tpu` for the evaluator.
        """
        import ctypes
        nat = self._nat
        nb = nat.lib.pnx_tree_build_block_lists(self._handle,
                                                int(block_size),
                                                float(theta))
        node_counts = np.zeros(nb, dtype=np.int64)
        leaf_counts = np.zeros(nb, dtype=np.int64)
        lp = ctypes.POINTER(ctypes.c_long)
        nat.lib.pnx_tree_block_list_sizes(
            self._handle, node_counts.ctypes.data_as(lp),
            leaf_counts.ctypes.data_as(lp))
        node_ids = thp_zeros(int(node_counts.sum()), np.int32)
        leaf_idx = thp_zeros(int(leaf_counts.sum()), np.int32)
        ip = ctypes.POINTER(ctypes.c_int32)
        nat.lib.pnx_tree_block_list_data(
            self._handle, node_ids.ctypes.data_as(ip),
            leaf_idx.ctypes.data_as(ip))
        starts = np.zeros(nb, dtype=np.int32)
        counts = np.zeros(nb, dtype=np.int32)
        nat.lib.pnx_tree_block_targets(
            self._handle, starts.ctypes.data_as(ip),
            counts.ctypes.data_as(ip))
        return {"n_blocks": int(nb), "block_size": int(block_size),
                "node_counts": node_counts, "leaf_counts": leaf_counts,
                "node_ids": node_ids, "leaf_idx": leaf_idx,
                "starts": starts, "counts": counts}

    def group_lists(self, theta: float = 0.7, group_leaves: int = 8):
        """Two-level interaction lists: group-shared far node lists +
        residual per-leaf node lists + per-leaf near lists.

        Exact partition of the per-leaf BH interaction set: nodes accepted
        against a GROUP of ``group_leaves`` consecutive leaves are listed
        once for the whole group (dividing the device far-field gather
        volume by ~``group_leaves``); nodes between the leaf and group
        admissibility scales land in short per-leaf residual lists.
        """
        import ctypes
        nat = self._nat
        ng = nat.lib.pnx_tree_build_group_lists(self._handle,
                                                int(group_leaves),
                                                float(theta))
        nl = int(nat.lib.pnx_tree_n_leaves(self._handle))
        gnode_counts = np.zeros(ng, dtype=np.int64)
        lnode_counts = np.zeros(nl, dtype=np.int64)
        lleaf_counts = np.zeros(nl, dtype=np.int64)
        lp = ctypes.POINTER(ctypes.c_long)
        nat.lib.pnx_tree_group_list_sizes(
            self._handle, gnode_counts.ctypes.data_as(lp),
            lnode_counts.ctypes.data_as(lp),
            lleaf_counts.ctypes.data_as(lp))
        gnode_ids = thp_zeros(int(gnode_counts.sum()), np.int32)
        lnode_ids = thp_zeros(int(lnode_counts.sum()), np.int32)
        lleaf_idx = thp_zeros(int(lleaf_counts.sum()), np.int32)
        ip = ctypes.POINTER(ctypes.c_int32)
        nat.lib.pnx_tree_group_list_data(
            self._handle, gnode_ids.ctypes.data_as(ip),
            lnode_ids.ctypes.data_as(ip), lleaf_idx.ctypes.data_as(ip))
        gstarts = np.zeros(ng, dtype=np.int32)
        gcounts = np.zeros(ng, dtype=np.int32)
        nat.lib.pnx_tree_group_targets(
            self._handle, gstarts.ctypes.data_as(ip),
            gcounts.ctypes.data_as(ip))
        gnear_counts = np.zeros(ng, dtype=np.int64)
        nat.lib.pnx_tree_group_near_sizes(
            self._handle, gnear_counts.ctypes.data_as(lp))
        gnear_seqs = thp_zeros(int(gnear_counts.sum()), np.int32)
        gnear_bits = thp_zeros(int(gnear_counts.sum()), np.int32)
        nat.lib.pnx_tree_group_near_data(
            self._handle, gnear_seqs.ctypes.data_as(ip),
            gnear_bits.ctypes.data_as(ip))
        return {"n_groups": int(ng), "n_leaves": nl,
                "group_leaves": int(group_leaves),
                "gnode_counts": gnode_counts, "gnode_ids": gnode_ids,
                "lnode_counts": lnode_counts, "lnode_ids": lnode_ids,
                "lleaf_counts": lleaf_counts, "lleaf_idx": lleaf_idx,
                "gnear_counts": gnear_counts, "gnear_seqs": gnear_seqs,
                "gnear_bits": gnear_bits,
                "gstarts": gstarts, "gcounts": gcounts}

    def leaves(self):
        """(starts, counts) particle ranges of every leaf (tree order)."""
        import ctypes
        nat = self._nat
        nl = int(nat.lib.pnx_tree_n_leaves(self._handle))
        starts = np.zeros(nl, dtype=np.int32)
        counts = np.zeros(nl, dtype=np.int32)
        ip = ctypes.POINTER(ctypes.c_int32)
        nat.lib.pnx_tree_leaves(self._handle,
                                starts.ctypes.data_as(ip),
                                counts.ctypes.data_as(ip))
        return starts, counts

    def assign_leaves(self, points) -> np.ndarray:
        """Leaf sequence id of the containing (or nearest non-empty) leaf
        for each query point — anchors the device-evaluated at-points path
        (reference: per-point traversal, ``tree.rs:1284``)."""
        import ctypes
        nat = self._nat
        pts = nat.as_f64(np.asarray(points))
        if pts.ndim != 2 or pts.shape[1] != 3:
            raise ValueError("points must be (M, 3)")
        out = np.zeros(pts.shape[0], dtype=np.int32)
        nat.lib.pnx_tree_point_leaves(
            self._handle, nat.dptr(pts), pts.shape[0],
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        return out

    def node_data(self):
        """(com (Nn,3), mass (Nn,), hmax (Nn,)) for all tree nodes."""
        import ctypes
        nat = self._nat
        nn = self.n_nodes
        com = np.zeros((nn, 3))
        mass = np.zeros(nn)
        hmax = np.zeros(nn)
        nat.lib.pnx_tree_node_data(self._handle, nat.dptr(com),
                                   nat.dptr(mass), nat.dptr(hmax))
        return com, mass, hmax

    def node_moments(self) -> np.ndarray:
        """Multipole moments, shape (Nn, nmom)."""
        nat = self._nat
        nmom = int(nat.lib.pnx_tree_nmom(self._handle))
        out = np.zeros((self.n_nodes, max(nmom, 1)))
        if nmom:
            nat.lib.pnx_tree_moments(self._handle, nat.dptr(out))
        return out

    def particles_tree_order(self):
        """(pos, mass, soft, orig_index) in tree order."""
        import ctypes
        nat = self._nat
        pos = thp_zeros((self.n, 3), np.float64)
        mass = thp_zeros(self.n, np.float64)
        soft = thp_zeros(self.n, np.float64)
        orig = thp_zeros(self.n, np.int64)
        nat.lib.pnx_tree_particles(
            self._handle, nat.dptr(pos), nat.dptr(mass), nat.dptr(soft),
            orig.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
        return pos, mass, soft, orig

    def pack_leaf_tiles(self, lstarts, lcounts, sentinel,
                        cap: int, pad_rows: int = 0) -> np.ndarray:
        """(n_leaves+1+pad_rows, 8, cap) f32 leaf tiles packed natively
        from the tree-order SoA (row layout matches
        :func:`tree_pallas.pack_leaf_tiles`; the numpy packer's
        fancy-index pass was 31 s at 10M on this single-core host).
        ``pad_rows`` extra copies of the all-dummy row are appended in
        place (a post-hoc concatenate re-faulted the whole 1 GB table —
        ~15 s/GB on this host, util/thp.py)."""
        import ctypes
        nat = self._nat
        ls = np.ascontiguousarray(lstarts, np.int64)
        lc = np.ascontiguousarray(lcounts, np.int64)
        sent = np.ascontiguousarray(sentinel, np.float64)
        n_leaves = len(ls)
        out = thp_empty((n_leaves + 1 + pad_rows, 8, cap), np.float32)
        i64p = ctypes.POINTER(ctypes.c_int64)
        nat.lib.pnx_tree_pack_leaf_tiles(
            self._handle, ls.ctypes.data_as(i64p), lc.ctypes.data_as(i64p),
            n_leaves, nat.dptr(sent), cap,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        if pad_rows:
            out[n_leaves + 1:] = out[n_leaves]  # replicate the dummy row
        return out

    # reference API aliases (gravity.rs:321,381)
    def potentials_at_points(self, points, theta: float = 0.7,
                             threads: int = 0) -> np.ndarray:
        return self.compute_potentials(theta=theta, threads=threads,
                                       targets=points)

    def accelerations_at_points(self, points, theta: float = 0.7,
                                threads: int = 0) -> np.ndarray:
        return self.compute_accelerations(theta=theta, threads=threads,
                                          targets=points)


def native_direct_potentials(pos, masses=None, softenings=None, targets=None,
                             target_softenings=None,
                             kernel: Optional[str] = None,
                             threads: int = 0) -> np.ndarray:
    """Native O(N²) direct sum (CPU fallback parity with ``direct.rs``)."""
    nat = _require_native()
    pos = nat.as_f64(np.asarray(pos))
    n = pos.shape[0]
    m = None if masses is None else nat.as_f64(
        np.broadcast_to(np.asarray(masses), (n,)))
    h = None if softenings is None else nat.as_f64(
        np.broadcast_to(np.asarray(softenings), (n,)))
    if targets is None:
        tgt, self_mode, tsoft = pos, 1, h
    else:
        tgt = nat.as_f64(np.asarray(targets))
        self_mode = 0
        tsoft = None if target_softenings is None else nat.as_f64(
            np.broadcast_to(np.asarray(target_softenings), (tgt.shape[0],)))
    out = thp_zeros(tgt.shape[0], np.float64)
    nat.lib.pnx_direct_potentials(
        nat.dptr(pos), n, nat.dptr(m), nat.dptr(h),
        _KERNEL_CODE[kernel], nat.dptr(tgt), tgt.shape[0], self_mode,
        nat.dptr(tsoft), int(threads), nat.dptr(out))
    return out


def native_direct_accelerations(pos, masses=None, softenings=None,
                                targets=None, target_softenings=None,
                                kernel: Optional[str] = None,
                                threads: int = 0) -> np.ndarray:
    nat = _require_native()
    pos = nat.as_f64(np.asarray(pos))
    n = pos.shape[0]
    m = None if masses is None else nat.as_f64(
        np.broadcast_to(np.asarray(masses), (n,)))
    h = None if softenings is None else nat.as_f64(
        np.broadcast_to(np.asarray(softenings), (n,)))
    if targets is None:
        tgt, self_mode, tsoft = pos, 1, h
    else:
        tgt = nat.as_f64(np.asarray(targets))
        self_mode = 0
        tsoft = None if target_softenings is None else nat.as_f64(
            np.broadcast_to(np.asarray(target_softenings), (tgt.shape[0],)))
    out = thp_zeros((tgt.shape[0], 3), np.float64)
    nat.lib.pnx_direct_accelerations(
        nat.dptr(pos), n, nat.dptr(m), nat.dptr(h),
        _KERNEL_CODE[kernel], nat.dptr(tgt), tgt.shape[0], self_mode,
        nat.dptr(tsoft), int(threads), nat.dptr(out))
    return out
