"""Measure near-list partner-offset locality over Hilbert-ordered packed
tiles: what fraction of (target ptile, source ptile) near pairs fall within
+-nb2 source blocks (SB ptiles each) of the target's block?

Sizes the diagonal-band near engine (near_engine='diag'): in-band pairs are
evaluated by a fully grid-indexed band kernel (no per-window scalar-prefetch
stall); the remainder keeps the packed-window path.

Run on CPU: JAX_PLATFORMS=cpu python benchmarks/diag_band_analysis.py [N]
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    from pynbodyext_tpu.gravity.tree import Octree
    from pynbodyext_tpu.gravity.tree_tpu import (_pack_dense_tiles,
                                                 prepare_tree_pallas)

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    rng = np.random.default_rng(0)
    rt = rng.exponential(3.0, n)
    vt = rng.normal(size=(n, 3))
    vt /= np.linalg.norm(vt, axis=1, keepdims=True)
    pos = vt * rt[:, None]
    m = rng.uniform(0.5, 2.0, n)
    t0 = time.perf_counter()
    tree = Octree(pos, m, leaf_capacity=128, multipole_order=0)
    prep = prepare_tree_pallas(tree, theta=0.7, group_leaves=8)
    print(f"prep: {time.perf_counter() - t0:.1f}s  n_blocks={prep['n_blocks']}")

    K, SB = 5, 8
    pk = _pack_dense_tiles(prep, K)
    npt = pk["n_ptiles"]
    nb = prep["n_blocks"]
    counts = prep["near_counts"].astype(np.int64)
    seqs = prep["near_flat"].astype(np.int64)
    t_leaf = np.repeat(np.arange(nb, dtype=np.int64), counts)
    T = pk["tile_of"][t_leaf].astype(np.int64)
    St = pk["tile_of"][seqs].astype(np.int64)
    # particle-pair weight: |target leaf| x |source leaf| actual pairs
    lc = np.asarray(prep["lcounts"], np.int64)
    w = lc[t_leaf] * lc[seqs]
    dblk = St // SB - T // SB
    print(f"n_ptiles={npt}  leaf pairs={len(T)}  "
          f"particle pairs={w.sum() / 1e9:.1f} G")
    # unique (T, St-ptile) pairs are what the engines fetch
    kkey = T * npt + St
    _, first = np.unique(kkey, return_index=True)
    dblk_u = dblk[first]
    for nb2 in (2, 4, 6, 8, 12, 16, 24, 32):
        inb = np.abs(dblk) <= nb2
        inb_u = np.abs(dblk_u) <= nb2
        # band compute cost ~ npt*(2nb2+1) steps; remainder windows ~
        # unique out-of-band (T, St//R) keys
        R = 4
        rem = ~inb[first]
        rem_wins = len(np.unique((T[first][rem]) * (npt // R + 1)
                                 + St[first][rem] // R))
        print(f"nb2={nb2:3d} (+-{nb2 * SB} ptiles): leaf-pair cov "
              f"{inb.mean():.3f}  pair-weighted "
              f"{(w * inb).sum() / w.sum():.3f}  ptile-pair cov "
              f"{inb_u.mean():.3f}  remainder windows {rem_wins}")


if __name__ == "__main__":
    main()
