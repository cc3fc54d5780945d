"""Subfind/FoF catalog reader (Gadget-3 / Arepo ``fof_subhalo_tab`` HDF5).

The reference's halo workloads load subfind catalogs through pynbody
(``/root/reference/tests/conftest.py:45-56``: 4,226 halos, ``halos[0]`` as a
sub-snapshot).  Standalone equivalent: read the group/subhalo tables, derive
per-particle group ids for group-ordered snapshots (the subfind output
convention: particles of each type are sorted by group, fuzz at the end),
attach them as ``grp``/``subgrp`` fields, and hand off to
:class:`~.halos.HaloCatalog` — after which every halo is a mask view and
per-halo statistics are one segment reduction.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from ..quantity import QArray
from .loaders import _PARTTYPE_FAMILY
from .snapshot import Snapshot

__all__ = ["SubfindCatalog", "load_subfind_hdf5"]


class SubfindCatalog:
    """Group + subhalo tables of one ``fof_subhalo_tab`` file (or several
    concatenated parts)."""

    def __init__(self, group_len_type: np.ndarray,
                 subhalo_len_type: Optional[np.ndarray] = None,
                 subhalo_grnr: Optional[np.ndarray] = None,
                 properties: Optional[dict] = None):
        self.group_len_type = np.asarray(group_len_type, np.int64)
        self.subhalo_len_type = (None if subhalo_len_type is None
                                 else np.asarray(subhalo_len_type, np.int64))
        self.subhalo_grnr = (None if subhalo_grnr is None
                             else np.asarray(subhalo_grnr, np.int64))
        self.properties = dict(properties or {})

    @property
    def n_groups(self) -> int:
        return len(self.group_len_type)

    @property
    def n_subhalos(self) -> int:
        return 0 if self.subhalo_len_type is None \
            else len(self.subhalo_len_type)

    def __len__(self) -> int:
        return self.n_groups

    def _ids_for_type(self, lens_pt: np.ndarray, n_pt: int) -> np.ndarray:
        """Per-particle ids for one particle type: repeat(arange, lens),
        fuzz (particles beyond the grouped total) → -1."""
        ids = np.full(n_pt, -1, np.int32)
        tot = int(lens_pt.sum())
        if tot > n_pt:
            raise ValueError(
                f"catalog claims {tot} grouped particles but snapshot has "
                f"{n_pt} of this type — snapshot/catalog mismatch")
        ids[:tot] = np.repeat(
            np.arange(len(lens_pt), dtype=np.int32), lens_pt)
        return ids

    def attach(self, snap: Snapshot, subhalos: bool = True,
               grp_field: str = "grp",
               subgrp_field: str = "subgrp") -> Snapshot:
        """Snapshot with per-particle ``grp`` (and ``subgrp``) id fields.

        Assumes the subfind output convention: within each particle type the
        snapshot is group-ordered (then subhalo-ordered), ungrouped fuzz
        last.  Families map to particle types via the gadget convention.
        """
        fam_pt = {fam: pt for pt, fam in _PARTTYPE_FAMILY.items()}
        fam_pt.setdefault("disk", 2)
        fam_pt.setdefault("bulge", 3)
        grp = np.full(snap.n_total, -1, np.int32)
        sub = np.full(snap.n_total, -1, np.int32)
        for fam, sl in snap.family_slices.items():
            pt = fam_pt.get(fam)
            if pt is None:
                continue
            n_pt = sl.stop - sl.start
            grp[sl] = self._ids_for_type(self.group_len_type[:, pt], n_pt)
            if subhalos and self.subhalo_len_type is not None:
                sub[sl] = self._ids_for_type(
                    self.subhalo_len_type[:, pt], n_pt)
        fields = {grp_field: QArray(grp, None)}
        if subhalos and self.subhalo_len_type is not None:
            fields[subgrp_field] = QArray(sub, None)
        return snap.with_fields(**fields)

    def halos(self, snap: Snapshot, subhalos: bool = False):
        """Attach ids and return a :class:`~.halos.HaloCatalog` — the
        reference's ``snap.halos()`` one-liner."""
        from .halos import HaloCatalog
        field = "subgrp" if subhalos else "grp"
        return HaloCatalog(self.attach(snap), grp_field=field)

    def __repr__(self):
        return (f"<SubfindCatalog groups={self.n_groups} "
                f"subhalos={self.n_subhalos}>")


def load_subfind_hdf5(path) -> SubfindCatalog:
    """Read ``fof_subhalo_tab_*.hdf5`` (single file, list, or glob)."""
    import glob as _glob

    import h5py

    if isinstance(path, (list, tuple)):
        paths = list(path)
    elif any(ch in str(path) for ch in "*?["):
        paths = sorted(_glob.glob(str(path)))
        if not paths:
            raise FileNotFoundError(f"no files match {path!r}")
    else:
        paths = [str(path)]

    glens, slens, sgrnr = [], [], []
    props: Dict[str, float] = {}
    for p in paths:
        with h5py.File(p, "r") as f:
            if "Header" in f:
                hdr = dict(f["Header"].attrs)
                for k in ("Time", "Redshift", "HubbleParam", "BoxSize"):
                    if k in hdr:
                        props[k.lower()] = float(np.asarray(hdr[k]).item())
            grp = f.get("Group")
            if grp is not None and "GroupLenType" in grp:
                glens.append(np.asarray(grp["GroupLenType"]))
            sub = f.get("Subhalo")
            if sub is not None and "SubhaloLenType" in sub:
                slens.append(np.asarray(sub["SubhaloLenType"]))
                if "SubhaloGrNr" in sub:
                    sgrnr.append(np.asarray(sub["SubhaloGrNr"]))
    if not glens:
        raise IOError(f"{paths[0]}: no Group/GroupLenType — not a subfind "
                      f"catalog")
    return SubfindCatalog(
        np.concatenate(glens, axis=0),
        np.concatenate(slens, axis=0) if slens else None,
        np.concatenate(sgrnr, axis=0) if sgrnr else None,
        properties=props)
