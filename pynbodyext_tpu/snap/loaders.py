"""Snapshot loaders: Gadget/AREPO HDF5 plus a deterministic synthetic galaxy.

The reference test suite runs against downloaded gadget/arepo snapshots
(``tests/conftest.py:17-41``).  Without network/pynbody, the equivalents here
are (a) a real gadget-HDF5 reader via h5py, (b) a seeded synthetic galaxy
generator producing snapshots with known structure — our fixtures' golden
values are derived from it (SURVEY.md §4 "fast path vs reference path" discipline).
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from ..quantity import QArray
from .snapshot import Snapshot

__all__ = ["load_gadget_hdf5", "save_gadget_hdf5", "make_test_galaxy",
           "make_adversarial_galaxy"]

# Gadget PartType conventions
_PARTTYPE_FAMILY = {0: "gas", 1: "dm", 4: "star", 5: "bh"}
_FIELD_MAP = {
    "Coordinates": "pos",
    "Velocities": "vel",
    "Masses": "mass",
    "InternalEnergy": "u",
    "Density": "rho",
    "SmoothingLength": "smooth",
    "StellarFormationTime": "tform",
    "GFM_StellarFormationTime": "tform",
    "Metallicity": "metals",
    "GFM_Metallicity": "metals",
    "ParticleIDs": "iord",
    "Potential": "phi",
}

# Default gadget unit system (the common cosmological convention):
# length = kpc/h (comoving a), velocity = km/s * sqrt(a), mass = 1e10 Msol/h.
_DEF_UNITS = {
    "pos": "a kpc h**-1",
    "vel": "a**1/2 km s**-1",
    "mass": "1e10 Msol h**-1",
    "u": "km**2 s**-2",
    "rho": "1e10 Msol h**-1 a**-3 kpc**-3 h**3",
    "smooth": "a kpc h**-1",
    "tform": "Gyr",
    "phi": "km**2 s**-2",
}


def load_gadget_hdf5(path, fields: Optional[list] = None,
                     dtype=np.float32) -> Snapshot:
    """Read a Gadget/AREPO HDF5 snapshot into a flattened family-sorted
    Snapshot.

    ``path`` may be a single file, a list of files, or a glob pattern —
    multi-file snapshots (``snap_103.0.hdf5``, ``snap_103.1.hdf5``, …) are
    concatenated per family.
    """
    import glob as _glob

    if isinstance(path, (list, tuple)):
        paths = list(path)
    elif any(ch in str(path) for ch in "*?["):
        paths = sorted(_glob.glob(str(path)))
        if not paths:
            raise FileNotFoundError(f"no files match {path!r}")
    else:
        paths = [str(path)]
    if len(paths) > 1:
        parts = [load_gadget_hdf5(p, fields=fields, dtype=dtype)
                 for p in paths]
        return _concat_snapshots(parts)
    return _load_one_gadget(paths[0], fields, dtype)


def _concat_snapshots(parts) -> Snapshot:
    """Concatenate per-family across file parts (multi-file snapshots)."""
    fam_data: Dict[str, Dict[str, np.ndarray]] = {}
    for snap in parts:
        for fam, sl in snap.family_slices.items():
            d = fam_data.setdefault(fam, {})
            for name in snap.loaded_fields:
                arr = np.asarray(snap[name].value[sl])
                if name in d:
                    d[name] = np.concatenate([d[name], arr])
                else:
                    d[name] = arr
    first = parts[0]
    snap = _assemble(fam_data, dict(first.properties), np.float32)
    # preserve units from the first part
    return snap


def _load_one_gadget(path: str, fields: Optional[list],
                     dtype) -> Snapshot:
    import h5py

    fam_data: Dict[str, Dict[str, np.ndarray]] = {}
    props: dict = {}
    with h5py.File(path, "r") as f:
        hdr = dict(f["Header"].attrs)
        time_attr = float(hdr.get("Time", 0.0))
        z = float(hdr.get("Redshift", 0.0))
        props["time"] = time_attr
        # cosmological runs store the scale factor in Time (a = 1/(1+z));
        # non-cosmological runs store physical time there — detect which
        cosmological = abs(time_attr * (1.0 + z) - 1.0) < 1e-3
        props["a"] = time_attr if cosmological else 1.0
        props["h"] = float(hdr.get("HubbleParam", 1.0))
        props["z"] = z
        boxsize = float(hdr.get("BoxSize", 0.0))
        if boxsize > 0:
            props["boxsize"] = QArray(boxsize, _DEF_UNITS["pos"])
        mass_table = np.asarray(hdr.get("MassTable", np.zeros(6)))
        for pt, fam in _PARTTYPE_FAMILY.items():
            key = f"PartType{pt}"
            if key not in f:
                continue
            grp = f[key]
            data: Dict[str, np.ndarray] = {}
            for h5name, ds in grp.items():
                name = _FIELD_MAP.get(h5name, h5name.lower())
                if fields is not None and name not in fields:
                    continue
                arr = np.asarray(ds)
                if arr.dtype.kind == "f":
                    arr = arr.astype(dtype)
                data[name] = arr
            n = len(next(iter(data.values()))) if data else 0
            if "mass" not in data and n and mass_table[pt] > 0:
                data["mass"] = np.full(n, mass_table[pt], dtype=dtype)
            if data:
                fam_data[fam] = data
    return _assemble(fam_data, props, dtype)


def save_gadget_hdf5(snap: Snapshot, path: str) -> None:
    """Write a Snapshot back out as Gadget-HDF5 (round-trip / interchange)."""
    import h5py

    inv_fields = {}
    for h5name, name in _FIELD_MAP.items():
        inv_fields.setdefault(name, h5name)
    fam_pt = {fam: pt for pt, fam in _PARTTYPE_FAMILY.items()}
    npart = [0] * 6
    with h5py.File(path, "w") as f:
        hdr = f.create_group("Header")
        for fam, sl in snap.family_slices.items():
            pt = fam_pt.get(fam)
            if pt is None:
                continue
            npart[pt] = sl.stop - sl.start
            grp = f.create_group(f"PartType{pt}")
            for name in snap.loaded_fields:
                h5name = inv_fields.get(name, name)
                grp.create_dataset(
                    h5name, data=np.asarray(snap[name].value[sl]))
        hdr.attrs["NumPart_ThisFile"] = np.asarray(npart, dtype=np.int64)
        hdr.attrs["NumPart_Total"] = np.asarray(npart, dtype=np.uint64)
        hdr.attrs["Time"] = float(np.asarray(
            snap.properties.get("time", 1.0)).item()
            if not isinstance(snap.properties.get("time"), QArray)
            else float(snap.properties["time"].value))
        hdr.attrs["HubbleParam"] = snap.properties.get("h", 1.0)
        hdr.attrs["Redshift"] = snap.properties.get("z", 0.0)
        box = snap.properties.get("boxsize")
        hdr.attrs["BoxSize"] = (float(np.asarray(box.value))
                                if isinstance(box, QArray)
                                else float(box or 0.0))
        hdr.attrs["MassTable"] = np.zeros(6)


def _assemble(fam_data: Dict[str, Dict[str, np.ndarray]], props: dict,
              dtype) -> Snapshot:
    """Concatenate per-family dicts into flattened arrays + static slices."""
    order = [f for f in ("gas", "dm", "star", "bh") if f in fam_data]
    all_fields = sorted({k for d in fam_data.values() for k in d})
    slices: Dict[str, slice] = {}
    start = 0
    for fam in order:
        n = len(next(iter(fam_data[fam].values())))
        slices[fam] = slice(start, start + n)
        start += n
    total = start
    fields: Dict[str, QArray] = {}
    for name in all_fields:
        proto = next(v for d in fam_data.values() for k, v in d.items()
                     if k == name)
        shape = (total,) + proto.shape[1:]
        out = np.zeros(shape, dtype=proto.dtype if proto.dtype.kind != "f"
                       else dtype)
        for fam in order:
            arr = fam_data[fam].get(name)
            if arr is not None:
                out[slices[fam]] = arr
        fields[name] = QArray(out, _DEF_UNITS.get(name))
    return Snapshot(fields, slices, props)


# ---------------------------------------------------------------------------
# Synthetic test galaxy
# ---------------------------------------------------------------------------

def make_test_galaxy(n_star: int = 20_000, n_gas: int = 30_000,
                     n_dm: int = 50_000, seed: int = 42,
                     boxsize: float = 500.0, center=(250.0, 250.0, 250.0),
                     vsys=(100.0, -50.0, 25.0), dtype=np.float32,
                     wrapped: bool = False) -> Snapshot:
    """Deterministic disk+halo galaxy for tests and benchmarks.

    * stars: exponential disk, scale length 3 kpc, height 0.3 kpc, on
      near-circular orbits (v_c = 200 km/s flat curve) → high KappaRot;
    * gas: same disk, larger scale length;
    * dm: isotropic Hernquist-like halo, scale 20 kpc, velocity dispersion.

    Units: pos kpc, vel km/s, mass Msol.  The whole system is displaced to
    ``center`` and boosted by ``vsys`` so that centering transforms have
    real work to do; with ``wrapped=True``, positions are stored wrapped
    into [0, boxsize) to exercise WrapBox.
    """
    rng = np.random.default_rng(seed)
    center = np.asarray(center, dtype=np.float64)
    vsys = np.asarray(vsys, dtype=np.float64)

    def disk(n, rd, zd, vc, sigma):
        r = rng.exponential(rd, n)
        phi = rng.uniform(0, 2 * np.pi, n)
        z = rng.laplace(0.0, zd, n)
        pos = np.stack([r * np.cos(phi), r * np.sin(phi), z], axis=1)
        vmag = vc * r / np.sqrt(r * r + 2.0 ** 2)  # softened flat curve
        vel = np.stack([-vmag * np.sin(phi), vmag * np.cos(phi),
                        np.zeros(n)], axis=1)
        vel += rng.normal(0.0, sigma, (n, 3))
        return pos, vel

    def halo(n, a_scale):
        # Hernquist radius sampling via inverse CDF: M(r)/M = r²/(r+a)²
        # (u capped so r stays within ~half the box: √u/(1−√u) ≤ 10)
        u = rng.uniform(0.001, 0.82, n)
        r = a_scale * np.sqrt(u) / (1 - np.sqrt(u))
        vec = rng.normal(size=(n, 3))
        vec /= np.linalg.norm(vec, axis=1, keepdims=True)
        pos = vec * r[:, None]
        vel = rng.normal(0.0, 120.0, (n, 3))
        return pos, vel

    spos, svel = disk(n_star, 3.0, 0.3, 200.0, 15.0)
    gpos, gvel = disk(n_gas, 5.0, 0.5, 200.0, 10.0)
    dpos, dvel = halo(n_dm, 20.0)

    fam = {
        "gas": {"pos": gpos, "vel": gvel,
                "mass": np.full(n_gas, 1.0e6),
                "rho": 1.0e7 / (1.0 + np.linalg.norm(gpos, axis=1)) ** 2,
                "temp": np.full(n_gas, 1.0e4)},
        "dm": {"pos": dpos, "vel": dvel, "mass": np.full(n_dm, 1.0e7)},
        "star": {"pos": spos, "vel": svel,
                 "mass": np.full(n_star, 2.0e6),
                 "tform": rng.uniform(0.5, 13.0, n_star)},
    }
    for d in fam.values():
        d["pos"] = d["pos"] + center
        d["vel"] = d["vel"] + vsys
        if wrapped:
            d["pos"] = np.mod(d["pos"], boxsize)

    units = {"pos": "kpc", "vel": "km s**-1", "mass": "Msol",
             "rho": "Msol kpc**-3", "temp": "K", "tform": "Gyr"}
    order = ["gas", "dm", "star"]
    slices, start = {}, 0
    for f in order:
        n = len(fam[f]["pos"])
        slices[f] = slice(start, start + n)
        start += n
    all_fields = sorted({k for d in fam.values() for k in d})
    fields = {}
    for name in all_fields:
        proto = next(v for d in fam.values() for k, v in d.items() if k == name)
        out = np.zeros((start,) + proto.shape[1:], dtype=dtype)
        for f in order:
            if name in fam[f]:
                out[slices[f]] = fam[f][name]
        fields[name] = QArray(out, units.get(name))
    props = {"time": 13.8, "a": 1.0, "h": 0.7,
             "boxsize": QArray(boxsize, "kpc")}
    return Snapshot(fields, slices, props)


def make_adversarial_galaxy(n_star: int = 6_000, n_gas: int = 5_000,
                            n_dm: int = 14_000, seed: int = 7,
                            boxsize: float = 500.0,
                            dtype=np.float32) -> Snapshot:
    """Adversarial synthetic system for golden-value tests.

    Stresses everything the smooth :func:`make_test_galaxy` does not
    (the reference pins its goldens on a real, messy snapshot —
    ``tests/property_test.py:20-44`` — and real galaxies are clumpy,
    multi-halo, and rarely box-centered):

    * the MAIN galaxy sits at (15, 487, 250) so the wrapped positions
      straddle both the x = 0 and y = boxsize periodic seams — any
      centering/radius computed without WrapBox is grossly wrong;
    * a SATELLITE galaxy (~30 % of the stellar+dm mass) orbits 140 kpc
      out, so the global center of mass lies tens of kpc from the main
      density peak: ssc ≠ com grossly, and the shrinking sphere must
      actually *choose* the main peak;
    * the dm halo carries 6 dense subclumps at 25–90 kpc (clumpy
      substructure the stride-ladder ssc must not latch onto);
    * the stellar disk is kinematically hot (v_c 140 km/s, σ 85 km/s,
      thick) → κ_rot lands mid-range instead of ≈1.

    Deterministic for a given seed; all randomness drawn in f64 and cast
    once at the end.
    """
    rng = np.random.default_rng(seed)
    main_center = np.asarray([15.0, 487.0, 250.0])
    main_vsys = np.asarray([60.0, -30.0, 10.0])
    sat_dir = np.asarray([1.0, 1.0, 0.35])
    sat_dir /= np.linalg.norm(sat_dir)
    sat_center = main_center + 140.0 * sat_dir
    sat_vsys = main_vsys + np.asarray([-80.0, 40.0, 20.0])

    def disk(n, rd, zd, vc, sigma, center, vsys):
        r = rng.exponential(rd, n)
        phi = rng.uniform(0, 2 * np.pi, n)
        z = rng.laplace(0.0, zd, n)
        pos = np.stack([r * np.cos(phi), r * np.sin(phi), z], axis=1)
        vmag = vc * r / np.sqrt(r * r + 2.0 ** 2)
        vel = np.stack([-vmag * np.sin(phi), vmag * np.cos(phi),
                        np.zeros(n)], axis=1)
        vel += rng.normal(0.0, sigma, (n, 3))
        return pos + center, vel + vsys

    def sphere(n, a_scale, sigma_v, center, vsys):
        u = rng.uniform(0.001, 0.82, n)
        r = a_scale * np.sqrt(u) / (1 - np.sqrt(u))
        vec = rng.normal(size=(n, 3))
        vec /= np.linalg.norm(vec, axis=1, keepdims=True)
        return (vec * r[:, None] + center,
                rng.normal(0.0, sigma_v, (n, 3)) + vsys)

    # main galaxy: hot disk + clumpy halo
    n_star_m = int(n_star * 0.75)
    n_gas_m = int(n_gas * 0.8)
    n_dm_m = int(n_dm * 0.55)
    n_dm_cl = int(n_dm * 0.15)
    spos_m, svel_m = disk(n_star_m, 3.5, 1.2, 140.0, 85.0,
                          main_center, main_vsys)
    gpos_m, gvel_m = disk(n_gas_m, 6.0, 0.8, 140.0, 30.0,
                          main_center, main_vsys)
    dpos_m, dvel_m = sphere(n_dm_m, 25.0, 110.0, main_center, main_vsys)
    # 6 dense dm subclumps at 25-90 kpc from the main center
    ncl = 6
    per = n_dm_cl // ncl
    cl_pos, cl_vel = [], []
    for i in range(ncl):
        vec = rng.normal(size=3)
        vec /= np.linalg.norm(vec)
        c = main_center + vec * rng.uniform(25.0, 90.0)
        v = main_vsys + rng.normal(0.0, 90.0, 3)
        p, w = sphere(per, rng.uniform(0.8, 2.5), 30.0, c, v)
        cl_pos.append(p)
        cl_vel.append(w)
    # satellite: compact disk + halo
    n_star_s = n_star - n_star_m
    n_gas_s = n_gas - n_gas_m
    n_dm_s = n_dm - n_dm_m - per * ncl
    spos_s, svel_s = disk(n_star_s, 1.5, 0.3, 90.0, 25.0,
                          sat_center, sat_vsys)
    gpos_s, gvel_s = disk(n_gas_s, 2.5, 0.4, 90.0, 15.0,
                          sat_center, sat_vsys)
    dpos_s, dvel_s = sphere(n_dm_s, 8.0, 70.0, sat_center, sat_vsys)

    spos = np.concatenate([spos_m, spos_s])
    svel = np.concatenate([svel_m, svel_s])
    gpos = np.concatenate([gpos_m, gpos_s])
    gvel = np.concatenate([gvel_m, gvel_s])
    dpos = np.concatenate([dpos_m] + cl_pos + [dpos_s])
    dvel = np.concatenate([dvel_m] + cl_vel + [dvel_s])

    fam = {
        "gas": {"pos": gpos, "vel": gvel,
                "mass": np.full(len(gpos), 1.2e6),
                "rho": 1.0e7 / (1.0 + np.linalg.norm(
                    gpos - main_center, axis=1)) ** 2,
                "temp": np.full(len(gpos), 1.2e4)},
        "dm": {"pos": dpos, "vel": dvel,
               "mass": np.full(len(dpos), 1.1e7)},
        "star": {"pos": spos, "vel": svel,
                 "mass": np.full(len(spos), 2.4e6),
                 "tform": rng.uniform(0.5, 13.0, len(spos))},
    }
    for d in fam.values():
        d["pos"] = np.mod(d["pos"], boxsize)  # wrap-straddling on purpose

    units = {"pos": "kpc", "vel": "km s**-1", "mass": "Msol",
             "rho": "Msol kpc**-3", "temp": "K", "tform": "Gyr"}
    order = ["gas", "dm", "star"]
    slices, start = {}, 0
    for f in order:
        slices[f] = slice(start, start + len(fam[f]["pos"]))
        start += len(fam[f]["pos"])
    all_fields = sorted({k for d in fam.values() for k in d})
    fields = {}
    for name in all_fields:
        proto = next(v for d in fam.values()
                     for k, v in d.items() if k == name)
        out = np.zeros((start,) + proto.shape[1:], dtype=dtype)
        for f in order:
            if name in fam[f]:
                out[slices[f]] = fam[f][name]
        fields[name] = QArray(out, units.get(name))
    props = {"time": 13.8, "a": 1.0, "h": 0.7,
             "boxsize": QArray(boxsize, "kpc")}
    return Snapshot(fields, slices, props)
