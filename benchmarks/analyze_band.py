"""Analyze near-list contiguity in tree order: how banded are the
interaction lists?  Decides the window size R for the banded near engine.

Run on host CPU only (no device work).
"""
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def runs_and_windows(ids_sorted, Rs):
    """#maximal consecutive runs and #aligned R-windows for one list."""
    if len(ids_sorted) == 0:
        return 0, {R: 0 for R in Rs}, 0
    d = np.diff(ids_sorted)
    nruns = 1 + int((d > 1).sum())
    wins = {R: len(np.unique(ids_sorted // R)) for R in Rs}
    span = int(ids_sorted[-1] - ids_sorted[0] + 1)
    return nruns, wins, span


def analyze(counts, flat, Rs, label):
    counts = np.asarray(counts, np.int64)
    offs = np.concatenate([[0], np.cumsum(counts)])
    nruns = np.zeros(len(counts), np.int64)
    spans = np.zeros(len(counts), np.int64)
    wins = {R: np.zeros(len(counts), np.int64) for R in Rs}
    for i in range(len(counts)):
        ids = np.sort(flat[offs[i]:offs[i + 1]])
        r, w, s = runs_and_windows(ids, Rs)
        nruns[i] = r
        spans[i] = s
        for R in Rs:
            wins[R][i] = w[R]
    tot = counts.sum()
    print(f"--- {label}: n_lists={len(counts)} total_ids={tot} "
          f"mean_count={counts.mean():.1f}")
    print(f"    runs: mean={nruns.mean():.2f} p50={np.percentile(nruns,50):.0f} "
          f"p95={np.percentile(nruns,95):.0f} max={nruns.max()}")
    print(f"    span: mean={spans.mean():.1f} p95={np.percentile(spans,95):.0f} "
          f"max={spans.max()}  span_sum/ids={spans.sum()/max(tot,1):.2f}")
    for R in Rs:
        w = wins[R]
        # fetched leaves = windows*R; expansion vs true ids
        print(f"    R={R:>2}: windows_sum={w.sum()} "
              f"fetch_reduction={tot/max(w.sum(),1):.1f}x "
              f"compute_expansion={(w.sum()*R)/max(tot,1):.2f}x "
              f"mean_win/list={w.mean():.1f}")
    return wins


def main(n=1_000_000):
    from pynbodyext_tpu.gravity.tree import Octree
    rng = np.random.default_rng(0)
    rt = rng.exponential(3.0, n)
    vt = rng.normal(size=(n, 3))
    vt /= np.linalg.norm(vt, axis=1, keepdims=True)
    pos = vt * rt[:, None]
    m = rng.uniform(0.5, 2.0, n)
    t0 = time.perf_counter()
    tree = Octree(pos, m, leaf_capacity=128, multipole_order=0)
    print(f"build: {time.perf_counter()-t0:.1f}s n_leaves={tree.n_leaves}")
    t0 = time.perf_counter()
    gl = tree.group_lists(theta=0.7, group_leaves=8)
    print(f"group_lists: {time.perf_counter()-t0:.1f}s")
    Rs = (4, 8, 16, 32)
    analyze(gl["gnear_counts"], gl["gnear_seqs"], Rs, "group union near")
    analyze(gl["lleaf_counts"], gl["lleaf_idx"], Rs, "per-leaf near")
    print(f"far: leaf-residual nodes={gl['lnode_counts'].sum()} "
          f"group nodes={gl['gnode_counts'].sum()}")
    # node-id contiguity for the far field too
    analyze(gl["gnode_counts"], gl["gnode_ids"], Rs, "group far nodes")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000)
