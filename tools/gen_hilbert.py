"""Generate 3-D Hilbert-curve octant state tables for the native octree.

The device tree engines pay a fixed ~3.5 µs issue cost per near-field
window (CLAUDE.md round-2 kernel economics), and window count is set by
how contiguously each leaf group's spatial near-ball maps onto leaf
sequence ids.  The builder's DFS octant order is the leaf order; a
Hilbert-ordered DFS keeps spatially adjacent leaves adjacent in sequence
(unlike Morton/Z-order, which takes long jumps), shortening near lists
into fewer, longer runs and making G-consecutive-leaf groups more
compact (tighter bounding spheres → more group-level far admissibility).

Tables are derived from Skilling's transpose algorithm ("Programming the
Hilbert curve", AIP Conf. Proc. 707, 2004) — the index→coords transform
is generated for a deep curve and the per-subcube visit patterns are
extracted and canonicalized into a closed state machine:

  HILBERT_ORDER[s][j] — the geometric octant (x|y<<1|z<<2 bits) visited
                        at step j of a state-s node's child sequence;
  HILBERT_RANK[s][o]  — inverse permutation (octant → visit step);
  HILBERT_STATE[s][j] — the child's state at step j.

The generator self-verifies: curve adjacency (consecutive cells differ
by exactly one unit step — the Hilbert continuity property Morton order
fails), state closure, and transition consistency.  Output is committed
as ``csrc/hilbert_tables.h`` (regenerate with ``make tables``).

Reference parity note: the reference's Rust octree enumerates octants in
fixed Z-order (tree.rs:658 recursive split); the Hilbert DFS is a
TPU-side redesign serving the list-based device engines.
"""

import pathlib
import sys

import numpy as np


def index_to_coords(h: int, bits: int, dim: int = 3):
    """Skilling TransposetoAxes: Hilbert index → integer coords."""
    # distribute bits of h across dims, MSB-first interleave
    X = [0] * dim
    for b in range(bits * dim):
        bit = (h >> (bits * dim - 1 - b)) & 1
        X[b % dim] = (X[b % dim] << 1) | bit
    # Gray decode
    t = X[dim - 1] >> 1
    for i in range(dim - 1, 0, -1):
        X[i] ^= X[i - 1]
    X[0] ^= t
    # undo excess work
    N = 2 << (bits - 1)
    Q = 2
    while Q != N:
        P = Q - 1
        for i in range(dim - 1, -1, -1):
            if X[i] & Q:
                X[0] ^= P
            else:
                t = (X[0] ^ X[i]) & P
                X[0] ^= t
                X[i] ^= t
        Q <<= 1
    return tuple(X)


def build_curve(depth: int) -> np.ndarray:
    """(2^(3*depth), 3) int array: coords of cell visited at each index."""
    n = 1 << (3 * depth)
    out = np.empty((n, 3), np.int64)
    for h in range(n):
        out[h] = index_to_coords(h, depth)
    return out


def verify_adjacency(curve: np.ndarray) -> None:
    d = np.abs(np.diff(curve, axis=0))
    if not (d.sum(axis=1) == 1).all():
        raise AssertionError("curve is not unit-step continuous")
    lo, hi = curve.min(0), curve.max(0)
    side = round(len(curve) ** (1 / 3))
    if not ((lo == 0).all() and (hi == side - 1).all()):
        raise AssertionError("curve does not fill the cube")


def extract_tables(depth: int = 6):
    """State machine from per-subcube visit patterns of a deep curve."""
    curve = build_curve(depth)
    verify_adjacency(curve)

    def child_bits(level):
        # octant bits of each cell at `level` subdivisions below root:
        # bit k = axis-k coordinate bit (x | y<<1 | z<<2), matching the
        # native builder's o = (x>=cx) | (y>=cy)<<1 | (z>=cz)<<2
        shift = depth - level
        b = (curve >> shift) & 1
        return b[:, 0] | (b[:, 1] << 1) | (b[:, 2] << 2)

    # node runs at each level are contiguous index ranges of 8^(depth-l)
    # signature of a node = the order its 8 children octants are visited
    def node_signature(level, start):
        span = 1 << (3 * (depth - level))       # cells per node at `level`
        cspan = span >> 3                        # cells per child
        bits = child_bits(level + 1)
        sig = tuple(int(bits[start + j * cspan]) for j in range(8))
        if sorted(sig) != list(range(8)):
            raise AssertionError("child visit pattern is not a permutation")
        return sig

    sig_to_id = {}
    order = []       # id -> visit octant sequence
    trans = {}       # id -> tuple of 8 child ids (filled on expansion)

    def intern(sig):
        if sig not in sig_to_id:
            sig_to_id[sig] = len(order)
            order.append(sig)
        return sig_to_id[sig]

    root = intern(node_signature(0, 0))
    assert root == 0
    # expand every node with observable grandchildren (levels 0..depth-2)
    for level in range(0, depth - 1):
        span = 1 << (3 * (depth - level))
        cspan = span >> 3
        for start in range(0, 1 << (3 * depth), span):
            sid = intern(node_signature(level, start))
            if level + 2 <= depth:
                kids = tuple(
                    intern(node_signature(level + 1, start + j * cspan))
                    for j in range(8))
                if sid in trans and trans[sid] != kids:
                    raise AssertionError(
                        "signature does not determine transitions — "
                        "deepen the signature")
                trans[sid] = kids
    # closure: every referenced state must itself have transitions
    for sid, kids in list(trans.items()):
        for k in kids:
            if k not in trans:
                raise AssertionError(f"state {k} reachable but unexpanded")
    ns = len(order)
    if ns != len(trans):
        raise AssertionError("unexpanded states remain")
    horder = np.array(order, np.uint8)                      # (ns, 8)
    hstate = np.array([trans[i] for i in range(ns)], np.uint8)
    hrank = np.zeros_like(horder)
    for s in range(ns):
        for j in range(8):
            hrank[s, horder[s, j]] = j
    return horder, hrank, hstate


def emit_header(path: pathlib.Path, horder, hrank, hstate) -> None:
    ns = len(horder)

    def rows(tab):
        return ",\n".join(
            "    {" + ", ".join(str(int(v)) for v in row) + "}"
            for row in tab)

    path.write_text(f"""\
// Generated by tools/gen_hilbert.py — do not edit.  Regenerate with
// `make tables`.  3-D Hilbert curve octant state machine (Skilling
// construction, verified unit-step continuous): ORDER[s][j] = geometric
// octant (x|y<<1|z<<2) visited at step j in state s; RANK = inverse;
// STATE[s][j] = child state at step j.
#pragma once
#include <cstdint>

constexpr int HILBERT_STATES = {ns};

static const uint8_t HILBERT_ORDER[{ns}][8] = {{
{rows(horder)}
}};

static const uint8_t HILBERT_RANK[{ns}][8] = {{
{rows(hrank)}
}};

static const uint8_t HILBERT_STATE[{ns}][8] = {{
{rows(hstate)}
}};
""")


def main():
    horder, hrank, hstate = extract_tables(depth=6)
    out = pathlib.Path(__file__).resolve().parent.parent / "csrc" / \
        "hilbert_tables.h"
    emit_header(out, horder, hrank, hstate)
    print(f"wrote {out}: {len(horder)} states")


if __name__ == "__main__":
    sys.exit(main())
