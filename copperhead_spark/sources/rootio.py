"""Minimal pure-python ROOT file reader/writer (SURVEY.md §2.1 S1/S8).

The reference's primary input is ROOT NanoAOD read through uproot
(/root/reference/run_stage1.py:153-166) and its template output is ROOT
TH1s (/root/reference/python/io.py:230-235).  uproot is absent from this
image, so — following the WAV/netpbm precedent (operators/multimodal.py)
— this module implements the subset of the PUBLIC ROOT on-disk format
(https://root.cern/doc/master/classTFile.html header docs; the same
layout uproot's source documents) needed to round-trip flat-branch
TTrees and TH1F histograms without any library:

REAL per the public spec (byte-for-byte):
  - the 100-byte TFile header: "root" magic, fVersion, fBEGIN=100, fEND,
    fSeekFree/fNbytesFree, fNbytesName, fUnits=4, fCompress=0, fUUID;
  - the TKey record layout (v4, 32-bit seeks): fNbytes, fVersion,
    fObjlen, fDatime, fKeylen, fCycle, fSeekKey, fSeekPdir, then
    ClassName/Name/Title as TStrings (1-byte length, 255 -> 4-byte ext);
  - TString encoding, big-endian everything;
  - the TBasket record: a TKey (class "TBasket", name = branch, title =
    tree) followed by fVersion/fBufferSize/fNevBufSize/fNevBuf/fLast/
    fHeaderOnly and the raw BIG-ENDIAN leaf array — exactly how a real
    uncompressed flat-branch basket lays out its payload;
  - leaf type letters as in TTree draw specs: D=float64, F=float32,
    L=int64, I=int32.

SIMPLIFIED (documented, honest): real ROOT describes TTree/TH1 object
structure through self-describing TStreamerInfo records; implementing
that machinery is what uproot is for.  Instead (a) tree metadata is one
"CSTreeIndex"-class key (version, entries, branch names + leaf letters)
and (b) the reader recovers the key directory by the SEQUENTIAL KEY WALK
from fBEGIN to fEND — the same scan TFile::Recover performs on files
whose directory is missing — so no TDirectory/KeysList deserialization
is needed.  TH1F records (class "TH1F") carry name/title TStrings, the
axis triple, a TArrayF of bin contents (under/overflow included) and a
TArrayD of Sumw2, i.e. the payload a real TH1F streamer carries minus
the TAttLine/TAttFill/TAttMarker cosmetics.  A file from this writer is
therefore NOT readable by stock ROOT (no streamers); every structure it
shares with the real format follows the public spec so swapping in
uproot touches only the decoder function (sources/root_ingest.py).
"""

from __future__ import annotations

import os
import struct

import numpy as np

MAGIC = b"root"
FBEGIN = 100
_FVERSION = 62406  # layout version the header advertises (6.24/06)
_KEY_VERSION = 4
_TREE_INDEX_CLASS = "CSTreeIndex"

# ROOT leaf type letters -> big-endian numpy dtypes
LEAF_DTYPES = {"D": ">f8", "F": ">f4", "L": ">i8", "I": ">i4"}
_NUMPY_LEAF = {np.dtype("float64"): "D", np.dtype("float32"): "F",
               np.dtype("int64"): "L", np.dtype("int32"): "I"}


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------


def _tstring(s: str) -> bytes:
    b = s.encode()
    if len(b) < 255:
        return struct.pack(">B", len(b)) + b
    return struct.pack(">BI", 255, len(b)) + b


def _read_tstring(buf: bytes, pos: int) -> tuple[str, int]:
    if pos >= len(buf):
        raise ValueError("truncated TString")
    n = buf[pos]
    pos += 1
    if n == 255:
        if pos + 4 > len(buf):
            raise ValueError("truncated long TString")
        (n,) = struct.unpack_from(">I", buf, pos)
        pos += 4
    if pos + n > len(buf):
        raise ValueError("truncated TString body")
    return buf[pos : pos + n].decode(), pos + n


def _key_bytes(
    classname: str, name: str, title: str, seek_key: int, objlen: int
) -> bytes:
    """Serialize a v4 TKey header; fNbytes spans header + data
    (uncompressed: fNbytes == fKeylen + fObjlen)."""
    names = _tstring(classname) + _tstring(name) + _tstring(title)
    keylen = 26 + len(names)
    nbytes = keylen + objlen
    return (
        struct.pack(
            ">ihiIhhii",
            nbytes,
            _KEY_VERSION,
            objlen,
            0,  # fDatime: zero keeps the writer deterministic
            keylen,
            1,  # fCycle
            seek_key,
            FBEGIN,  # fSeekPdir: all keys hang off the root directory
        )
        + names
    )


class _Key:
    __slots__ = ("nbytes", "objlen", "keylen", "seek", "classname", "name",
                 "title", "data_pos")


def _read_key(buf: bytes, pos: int) -> _Key:
    if pos + 26 > len(buf):
        raise ValueError("truncated TKey header")
    nbytes, version, objlen, _dt, keylen, _cyc, seek, _pdir = struct.unpack_from(
        ">ihiIhhii", buf, pos
    )
    if version > 1000:
        raise ValueError("64-bit (large-file) TKeys not supported")
    k = _Key()
    k.nbytes, k.objlen, k.keylen, k.seek = nbytes, objlen, keylen, seek
    p = pos + 26
    k.classname, p = _read_tstring(buf, p)
    k.name, p = _read_tstring(buf, p)
    k.title, p = _read_tstring(buf, p)
    k.data_pos = pos + keylen
    if k.data_pos + k.objlen > len(buf):
        raise ValueError(f"truncated key data for {k.name!r}")
    return k


def _walk_keys(buf: bytes):
    """Sequential key scan from fBEGIN to fEND (the TFile::Recover walk).
    Bounded: every iteration advances by at least one header, and a
    non-positive record length (a freed gap marker) is skipped by its
    declared size or aborts — garbage can never loop forever."""
    if len(buf) < FBEGIN or buf[:4] != MAGIC:
        raise ValueError("not a ROOT file (bad magic)")
    (fend,) = struct.unpack_from(">i", buf, 12)
    fend = min(fend, len(buf))
    pos = FBEGIN
    while pos + 4 <= fend:
        (nbytes,) = struct.unpack_from(">i", buf, pos)
        if nbytes == 0:
            break
        if nbytes < 0:  # deleted-record gap: length is -nbytes
            pos += -nbytes
            continue
        yield _read_key(buf, pos)
        pos += nbytes


# ---------------------------------------------------------------------------
# writer
# ---------------------------------------------------------------------------


def _header(fend: int, nbytes_name: int) -> bytes:
    h = MAGIC + struct.pack(
        ">iiiiiii", _FVERSION, FBEGIN, fend, fend, 0, 0, nbytes_name
    )
    h += struct.pack(">B", 4)  # fUnits
    h += struct.pack(">i", 0)  # fCompress: uncompressed
    h += struct.pack(">ii", 0, 0)  # fSeekInfo/fNbytesInfo: no streamers
    h += struct.pack(">H", 1) + b"\x00" * 16  # fUUID (version + null uuid)
    return h.ljust(FBEGIN, b"\x00")


class _Writer:
    def __init__(self, path: str):
        self.path = path
        self.records: list[bytes] = []
        name = os.path.basename(path)
        # the TFile directory record: fName/fTitle then the TDirectory
        # quintet (version, datimes, nbyteskeys, nbytesname, seeks)
        dirdata = (
            _tstring(name)
            + _tstring("")
            + struct.pack(">hIIii", 5, 0, 0, 0, 0)
            + struct.pack(">iii", FBEGIN, 0, 0)
        )
        self._nbytes_name = len(_key_bytes("TFile", name, "", FBEGIN, 0)) + len(
            _tstring(name) + _tstring("")
        )
        self.add("TFile", name, "", dirdata)

    def add(self, classname: str, name: str, title: str, data: bytes) -> None:
        seek = FBEGIN + sum(len(r) for r in self.records)
        self.records.append(_key_bytes(classname, name, title, seek, len(data)) + data)

    def close(self) -> None:
        body = b"".join(self.records)
        fend = FBEGIN + len(body)
        with open(self.path, "wb") as fh:
            fh.write(_header(fend, self._nbytes_name))
            fh.write(body)


def write_flat_tree(
    path: str,
    tree: str,
    columns: dict[str, np.ndarray],
    basket_entries: int = 8192,
    title: str = "",
) -> None:
    """Write a flat (one value per entry) TTree: one CSTreeIndex record
    (entries + branch names/leaf letters) and per-branch TBasket records
    of at most ``basket_entries`` entries each, big-endian payloads.
    Baskets are interleaved branch-major in entry order, matching how a
    real writer flushes per-branch baskets as entries accumulate."""
    if not columns:
        raise ValueError("write_flat_tree: no branches")
    n = None
    arrays: dict[str, np.ndarray] = {}
    letters: dict[str, str] = {}
    for bname, arr in columns.items():
        a = np.asarray(arr)
        if a.ndim != 1:
            raise ValueError(f"branch {bname!r}: flat trees need 1-D arrays")
        if a.dtype not in _NUMPY_LEAF:
            raise ValueError(f"branch {bname!r}: unsupported dtype {a.dtype}")
        if n is None:
            n = len(a)
        elif len(a) != n:
            raise ValueError("branches differ in length")
        arrays[bname] = a
        letters[bname] = _NUMPY_LEAF[a.dtype]

    w = _Writer(path)
    idx = struct.pack(">hqi", 1, n, len(arrays))
    for bname in arrays:
        idx += _tstring(bname) + letters[bname].encode()
    w.add(_TREE_INDEX_CLASS, tree, title, idx)

    for start in range(0, max(n, 1), basket_entries):
        stop = min(start + basket_entries, n)
        if stop <= start:
            break
        for bname, a in arrays.items():
            payload = a[start:stop].astype(LEAF_DTYPES[letters[bname]]).tobytes()
            evsize = a.dtype.itemsize
            basket = (
                struct.pack(
                    ">hiiii",
                    3,  # fVersion
                    len(payload),  # fBufferSize
                    evsize,  # fNevBufSize (bytes/entry: fixed leaves)
                    stop - start,  # fNevBuf
                    len(payload),  # fLast
                )
                + b"\x00"  # fHeaderOnly
                + payload
            )
            w.add("TBasket", bname, tree, basket)
    w.close()


def write_th1f(path: str, hists: list[dict]) -> None:
    """Write TH1F records: each dict needs name, title, nbins, xlo, xhi,
    contents (len nbins+2, under/overflow at [0]/[-1]) and optionally
    sumw2 (same length).  Contents are stored as a TArrayF (int32 count +
    big-endian float32s), Sumw2 as a TArrayD — the arrays a real TH1F
    streamer carries."""
    w = _Writer(path)
    for h in hists:
        nbins = int(h["nbins"])
        contents = np.asarray(h["contents"], dtype=np.float64)
        if len(contents) != nbins + 2:
            raise ValueError("contents must have nbins+2 entries")
        sumw2 = np.asarray(h.get("sumw2", np.zeros(nbins + 2)), dtype=np.float64)
        if len(sumw2) != nbins + 2:
            raise ValueError("sumw2 must have nbins+2 entries")
        data = struct.pack(">hidd", 2, nbins, float(h["xlo"]), float(h["xhi"]))
        data += struct.pack(">i", nbins + 2)
        data += contents.astype(">f4").tobytes()
        data += struct.pack(">i", nbins + 2)
        data += sumw2.astype(">f8").tobytes()
        w.add("TH1F", str(h["name"]), str(h.get("title", "")), data)
    w.close()


# ---------------------------------------------------------------------------
# reader
# ---------------------------------------------------------------------------


def list_trees(path: str) -> list[tuple[str, int]]:
    """(tree name, n_entries) for every tree in the file — feeds
    read_nanoaod's (file, entries) chunk planning."""
    with open(path, "rb") as fh:
        buf = fh.read()
    out = []
    for k in _walk_keys(buf):
        if k.classname == _TREE_INDEX_CLASS:
            _v, n, _nb = struct.unpack_from(">hqi", buf, k.data_pos)
            out.append((k.name, n))
    return out


def _tree_index(buf: bytes, tree: str | None):
    for k in _walk_keys(buf):
        if k.classname == _TREE_INDEX_CLASS and (tree is None or k.name == tree):
            pos = k.data_pos
            _v, n, nb = struct.unpack_from(">hqi", buf, pos)
            pos += 14
            branches: dict[str, str] = {}
            for _ in range(nb):
                bname, pos = _read_tstring(buf, pos)
                letter = chr(buf[pos])
                pos += 1
                if letter not in LEAF_DTYPES:
                    raise ValueError(f"unknown leaf type {letter!r}")
                branches[bname] = letter
            return k.name, n, branches
    raise KeyError(f"tree {tree!r} not found")


def read_flat_tree(
    path: str,
    tree: str | None = None,
    branches: list[str] | None = None,
    entry_start: int = 0,
    entry_stop: int | None = None,
) -> dict[str, np.ndarray]:
    """Columnar chunked read: ONLY the requested branches are decoded
    (source pruning — other branches' baskets are skipped by their key
    length without touching the payload), and within a branch only the
    baskets overlapping [entry_start, entry_stop) are materialized —
    the basket-level pruning a chunked uproot read performs, which is
    what makes the mapInArrow fan-out in read_nanoaod scale: each task
    decodes ~chunk_size entries regardless of file size."""
    with open(path, "rb") as fh:
        buf = fh.read()
    tname, n, all_branches = _tree_index(buf, tree)
    want = list(branches) if branches is not None else list(all_branches)
    missing = [b for b in want if b not in all_branches]
    if missing:
        raise KeyError(f"unknown branches {missing} in tree {tname!r}")
    stop = n if entry_stop is None else min(entry_stop, n)
    start = max(0, min(entry_start, stop))

    parts: dict[str, list[np.ndarray]] = {b: [] for b in want}
    offsets: dict[str, int] = {b: 0 for b in want}
    for k in _walk_keys(buf):
        if k.classname != "TBasket" or k.title != tname or k.name not in parts:
            continue
        b = k.name
        _v, _bufsz, _evsz, nev, last = struct.unpack_from(">hiiii", buf, k.data_pos)
        lo = offsets[b]
        hi = lo + nev
        offsets[b] = hi
        if hi <= start or lo >= stop:
            continue  # basket-level pruning: payload never touched
        dt = np.dtype(LEAF_DTYPES[all_branches[b]])
        payload_pos = k.data_pos + 19
        a = np.frombuffer(buf, dtype=dt, count=nev, offset=payload_pos)
        parts[b].append(a[max(start - lo, 0) : min(stop, hi) - lo])
    out = {}
    for b in want:
        native = np.dtype(LEAF_DTYPES[all_branches[b]]).newbyteorder("=")
        out[b] = (
            np.concatenate(parts[b]).astype(native)
            if parts[b]
            else np.empty(0, dtype=native)
        )
        if len(out[b]) != stop - start:
            raise ValueError(
                f"branch {b!r}: baskets cover {len(out[b])} of "
                f"{stop - start} requested entries"
            )
    return out


def read_th1f(path: str) -> dict[str, dict]:
    """Read back every TH1F record: name -> dict(title, nbins, xlo, xhi,
    contents float64[nbins+2], sumw2 float64[nbins+2])."""
    with open(path, "rb") as fh:
        buf = fh.read()
    out: dict[str, dict] = {}
    for k in _walk_keys(buf):
        if k.classname != "TH1F":
            continue
        pos = k.data_pos
        _v, nbins, xlo, xhi = struct.unpack_from(">hidd", buf, pos)
        pos += 22
        (nc,) = struct.unpack_from(">i", buf, pos)
        pos += 4
        contents = np.frombuffer(buf, dtype=">f4", count=nc, offset=pos).astype(
            np.float64
        )
        pos += 4 * nc
        (ns,) = struct.unpack_from(">i", buf, pos)
        pos += 4
        sumw2 = np.frombuffer(buf, dtype=">f8", count=ns, offset=pos).astype(
            np.float64
        )
        out[k.name] = {
            "title": k.title,
            "nbins": nbins,
            "xlo": xlo,
            "xhi": xhi,
            "contents": contents,
            "sumw2": sumw2,
        }
    return out
