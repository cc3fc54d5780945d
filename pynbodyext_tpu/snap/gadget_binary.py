"""Classic Gadget binary snapshot reader/writer (format 1 and format 2).

The reference inherits binary-gadget reading from pynbody
(``/root/reference/tests/conftest.py:30-41`` loads ``gadget3/snapshot_103``);
this is the standalone equivalent: Fortran unformatted records, both the
tagless format-1 block order and format-2 4-char tag blocks, with
endianness auto-detection from the first record marker.

Layout (Gadget-2 user guide §6.2): 256-byte header (npart[6] i32,
massarr[6] f64, time f64, redshift f64, flags, npartTotal[6] u32,
num_files i32, BoxSize f64, Omega0, OmegaLambda, HubbleParam f64, …),
then POS/VEL (N,3) f32 in particle-type order, ID u32/u64, MASS (only for
types with massarr==0), then gas-only blocks U, RHO, (NE, NH,) HSML.
"""

from __future__ import annotations

import struct
from typing import Dict, Optional

import numpy as np

from ..quantity import QArray
from .loaders import _DEF_UNITS, _assemble
from .snapshot import Snapshot

__all__ = ["load_gadget_binary", "save_gadget_binary"]

# particle-type → family (pynbody's gadget convention: 0 gas, 1 halo dm,
# 2 disk, 3 bulge, 4 star, 5 boundary/bh)
_PT_FAMILY = {0: "gas", 1: "dm", 2: "disk", 3: "bulge", 4: "star", 5: "bh"}

_TAG_FIELD = {"POS ": "pos", "VEL ": "vel", "ID  ": "iord", "MASS": "mass",
              "U   ": "u", "RHO ": "rho", "HSML": "smooth",
              "AGE ": "tform", "Z   ": "metals", "POT ": "phi",
              "NE  ": "ne", "NH  ": "nh", "SFR ": "sfr"}
_FIELD_TAG = {v: k for k, v in _TAG_FIELD.items()}

# fields stored for every particle type vs gas-only vs star(+gas)-only
_ALL_TYPE_FIELDS = {"pos", "vel", "iord", "mass", "phi"}
_GAS_FIELDS = {"u", "rho", "smooth", "ne", "nh", "sfr"}


class _RecordReader:
    def __init__(self, fh, endian: str):
        self.fh = fh
        self.endian = endian

    def marker(self) -> Optional[int]:
        raw = self.fh.read(4)
        if len(raw) < 4:
            return None
        return struct.unpack(self.endian + "I", raw)[0]

    def record(self) -> Optional[bytes]:
        n = self.marker()
        if n is None:
            return None
        payload = self.fh.read(n)
        tail = self.marker()
        if tail != n:
            raise IOError(f"corrupt gadget record: head {n} != tail {tail}")
        return payload

    def skip(self) -> bool:
        n = self.marker()
        if n is None:
            return False
        self.fh.seek(n, 1)
        if self.marker() != n:
            raise IOError("corrupt gadget record while skipping")
        return True


def _detect(fh):
    """(endian, format) from the first record marker: 256 → fmt1 header,
    8 → fmt2 tag block."""
    raw = fh.read(4)
    fh.seek(0)
    for endian in ("<", ">"):
        n = struct.unpack(endian + "I", raw)[0]
        if n == 256:
            return endian, 1
        if n == 8:
            return endian, 2
    raise IOError("not a classic gadget binary snapshot "
                  f"(first marker bytes: {raw!r})")


def _parse_header(payload: bytes, endian: str) -> dict:
    npart = np.frombuffer(payload[0:24], dtype=endian + "i4")
    massarr = np.frombuffer(payload[24:72], dtype=endian + "f8")
    time, redshift = struct.unpack(endian + "dd", payload[72:88])
    # flags sfr/feedback at 88..96, npartTotal at 96..120
    num_files = struct.unpack(endian + "i", payload[124:128])[0]
    boxsize, omega0, omegal, hubble = struct.unpack(endian + "dddd",
                                                    payload[128:160])
    return {"npart": npart.astype(np.int64), "massarr": np.asarray(massarr),
            "time": time, "redshift": redshift, "num_files": num_files,
            "boxsize": boxsize, "omega0": omega0, "omegal": omegal,
            "h": hubble}


def load_gadget_binary(path: str, fields: Optional[list] = None,
                       dtype=np.float32) -> Snapshot:
    """Read a classic Gadget binary snapshot (format 1 or 2) into a
    flattened family-sorted Snapshot."""
    with open(path, "rb") as fh:
        endian, fmt = _detect(fh)
        rr = _RecordReader(fh, endian)

        def next_block():
            """(name or None, payload) — fmt2 reads the tag, fmt1 callers
            assign names positionally."""
            if fmt == 2:
                tag_rec = rr.record()
                if tag_rec is None:
                    return None, None
                tag = tag_rec[0:4].decode("latin1")
                return _TAG_FIELD.get(tag, tag.strip().lower()), rr.record()
            payload = rr.record()
            return (None, payload) if payload is not None else (None, None)

        name, payload = next_block()
        if fmt == 2 and name != "head":
            raise IOError(f"expected HEAD block, got {name!r}")
        hdr = _parse_header(payload, endian)
        npart = hdr["npart"]
        ntot = int(npart.sum())
        ngas = int(npart[0])
        n_mass_from_block = int(sum(int(npart[t]) for t in range(6)
                                    if npart[t] > 0
                                    and hdr["massarr"][t] == 0.0))

        # format-1 canonical block order
        fmt1_order = ["pos", "vel", "iord"]
        if n_mass_from_block:
            fmt1_order.append("mass")
        fmt1_order += ["u", "rho", "smooth"]
        fmt1_i = 0

        raw: Dict[str, np.ndarray] = {}
        while True:
            name, payload = next_block()
            if payload is None:
                break
            if fmt == 1:
                if fmt1_i >= len(fmt1_order):
                    break  # unknown trailing blocks — stop
                name = fmt1_order[fmt1_i]
                fmt1_i += 1
            nbytes = len(payload)
            if name in ("pos", "vel"):
                arr = np.frombuffer(payload, dtype=endian + "f4")
                raw[name] = arr.reshape(ntot, 3)
            elif name == "iord":
                width = nbytes // max(ntot, 1)
                arr = np.frombuffer(
                    payload, dtype=endian + ("i8" if width == 8 else "u4"))
                raw[name] = arr
            elif name == "mass":
                raw[name] = np.frombuffer(payload, dtype=endian + "f4")
            else:
                raw[name] = np.frombuffer(payload, dtype=endian + "f4")

        # split type-ordered blocks into families
        offsets = np.concatenate([[0], np.cumsum(npart)])
        fam_data: Dict[str, Dict[str, np.ndarray]] = {}
        for pt in range(6):
            n = int(npart[pt])
            if n == 0:
                continue
            fam = _PT_FAMILY[pt]
            d = fam_data.setdefault(fam, {})
            lo, hi = int(offsets[pt]), int(offsets[pt + 1])
            for name in ("pos", "vel", "iord", "phi"):
                if name in raw:
                    a = raw[name][lo:hi]
                    if fields is None or name in fields:
                        d[name] = (a.astype(dtype)
                                   if a.dtype.kind == "f" else a)
            # masses: block only covers types with massarr == 0
            if hdr["massarr"][pt] > 0:
                d["mass"] = np.full(n, hdr["massarr"][pt], dtype=dtype)
            elif "mass" in raw:
                prior = int(sum(int(npart[t]) for t in range(pt)
                                if npart[t] > 0
                                and hdr["massarr"][t] == 0.0))
                d["mass"] = raw["mass"][prior:prior + n].astype(dtype)
            if pt == 0:
                for name in _GAS_FIELDS:
                    if name in raw and (fields is None or name in fields):
                        d[name] = raw[name][:ngas].astype(dtype)

        z = hdr["redshift"]
        cosmological = abs(hdr["time"] * (1.0 + z) - 1.0) < 1e-3
        props = {"time": hdr["time"],
                 "a": hdr["time"] if cosmological else 1.0,
                 "z": z, "h": hdr["h"],
                 "omega0": hdr["omega0"], "omegal": hdr["omegal"]}
        if hdr["boxsize"] > 0:
            props["boxsize"] = QArray(hdr["boxsize"], _DEF_UNITS["pos"])
        return _assemble(fam_data, props, dtype)


def save_gadget_binary(snap: Snapshot, path: str, fmt: int = 2) -> None:
    """Write a Snapshot as a classic Gadget binary (format 2 by default)."""
    fam_pt = {v: k for k, v in _PT_FAMILY.items()}
    npart = np.zeros(6, np.int32)
    order = []  # (pt, slice) sorted by particle type
    for fam, sl in snap.family_slices.items():
        pt = fam_pt.get(fam)
        if pt is None:
            continue
        npart[pt] = sl.stop - sl.start
        order.append((pt, sl))
    order.sort()

    def rec(fh, payload: bytes):
        fh.write(struct.pack("<I", len(payload)))
        fh.write(payload)
        fh.write(struct.pack("<I", len(payload)))

    def tag(fh, name4: str, payload_len: int):
        if fmt == 2:
            rec(fh, name4.encode("latin1")
                + struct.pack("<I", payload_len + 8))

    hdr = bytearray(256)
    hdr[0:24] = npart.astype("<i4").tobytes()
    hdr[24:72] = np.zeros(6, "<f8").tobytes()  # massarr 0 → MASS block
    t = snap.properties.get("time", 1.0)
    t = float(t.value) if isinstance(t, QArray) else float(np.asarray(t))
    struct.pack_into("<dd", hdr, 72, t, float(snap.properties.get("z", 0.0)))
    hdr[96:120] = npart.astype("<u4").tobytes()
    struct.pack_into("<i", hdr, 124, 1)
    box = snap.properties.get("boxsize")
    boxv = float(np.asarray(box.value)) if isinstance(box, QArray) \
        else float(box or 0.0)
    struct.pack_into("<dddd", hdr, 128, boxv,
                     float(snap.properties.get("omega0", 0.0)),
                     float(snap.properties.get("omegal", 0.0)),
                     float(snap.properties.get("h", 1.0)))

    def gather(name, dt):
        parts = []
        for pt, sl in order:
            parts.append(np.asarray(snap[name].value[sl], dtype=dt))
        return np.concatenate(parts, axis=0)

    with open(path, "wb") as fh:
        tag(fh, "HEAD", 256)
        rec(fh, bytes(hdr))
        for name, t4 in (("pos", "POS "), ("vel", "VEL ")):
            data = gather(name, "<f4").tobytes()
            tag(fh, t4, len(data))
            rec(fh, data)
        if snap.has_field("iord"):
            data = gather("iord", "<u4").tobytes()
        else:
            data = np.arange(int(npart.sum()), dtype="<u4").tobytes()
        tag(fh, "ID  ", len(data))
        rec(fh, data)
        data = gather("mass", "<f4").tobytes()
        tag(fh, "MASS", len(data))
        rec(fh, data)
        gas_sl = snap.family_slices.get("gas")
        if gas_sl is not None:
            for name in ("u", "rho", "smooth"):
                if snap.has_field(name):
                    data = np.asarray(snap[name].value[gas_sl],
                                      "<f4").tobytes()
                    tag(fh, _FIELD_TAG[name], len(data))
                    rec(fh, data)
