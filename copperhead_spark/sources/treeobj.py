"""Real TTree/TBranch/TLeaf object records (r11: retires CSTreeIndex).

The reference's stage-1 input files describe their trees with streamed
TTree objects — a TKey of class "TTree" whose payload is the object in
ROOT's TBufferFile layout (version headers, class tags, TNamed bases,
and the TBranch fBasketEntry/fBasketSeek tables real readers use to
find baskets without scanning the file).  rootio historically stored a
private CSTreeIndex record instead (its documented honest gap,
rootio.py:26-60 in r10); this module writes and reads the REAL record
shape so rootio files carry genuine TTree metadata:

- ``tree_record(...)`` serializes a TTree v20 object: TNamed +
  TAttLine/TAttFill/TAttMarker bases, fEntries/fTotBytes/fZipBytes/
  fMaxEntries, fBranches (TObjArray of TBranch v13), fLeaves;
- each TBranch v13 carries TNamed (title = the "name[count]/T" leaf
  spec, the NanoAOD convention), TAttFill, fCompress/fBasketSize/
  fEntryOffsetLen/fWriteBasket, fEntries, fMaxBaskets, the counted
  fBasketEntry and fBasketSeek Long64 tables (TStreamerBasicPointer
  shape: 1-byte presence flag + values), and fLeaves with one typed
  TLeaf record;
- each TLeafX v1 (X in D/F/I/L/O) wraps the TLeaf v2 base: TNamed,
  fLen/fLenType/fOffset/fIsRange/fIsUnsigned, fLeafCount (a class-
  tagged TLeafI for jagged value leaves — the counts linkage real
  readers follow — or a 4-byte null pointer), then typed
  fMinimum/fMaximum.

The byte primitives (version header = byte-count|kByteCountMask +
uint16, class tag = kNewClassTag + NUL-terminated name, TNamed, TString)
are shared with sources/streamerinfo.py, which also emits the matching
TStreamerInfo descriptions.  HONEST SCOPE: the record follows the public
TBufferFile layout with a documented member SUBSET (the load-bearing
members; real ROOT's TTree streams ~40 more bookkeeping fields), so
full stock-ROOT loadability remains unverifiable in this image (needs a
real NanoAOD file); what is proven here is that tree metadata now lives
in real TTree/TBranch/TLeaf object records — parsed back by a reader
that never touches CSTreeIndex — with the basket tables real readers
navigate by.

Parity anchor: /root/reference/run_stage1.py:153-166 consumes exactly
these records through coffea/uproot.
"""

from __future__ import annotations

import struct

from copperhead_spark.sources.rootio import LEAF_DTYPES, _read_tstring, _tstring
from copperhead_spark.sources.streamerinfo import (
    _class_tagged,
    _read_class_tagged,
    _read_versioned,
    _tnamed,
    _tobjarray,
    _tobject,
    _versioned,
)

TREE_VERSION = 20
BRANCH_VERSION = 13
LEAF_BASE_VERSION = 2

_LEAF_CLASS = {"D": "TLeafD", "F": "TLeafF", "I": "TLeafI",
               "L": "TLeafL", "O": "TLeafO"}
_LETTER_OF = {v: k for k, v in _LEAF_CLASS.items()}
_LEAF_MINMAX = {"D": ">dd", "F": ">ff", "I": ">ii", "L": ">qq", "O": ">BB"}
_ITEMSIZE = {"D": 8, "F": 4, "I": 4, "L": 8, "O": 1}

_ATTLINE = _versioned(2, struct.pack(">hhh", 602, 1, 1))
_ATTFILL = _versioned(2, struct.pack(">hh", 0, 1001))
_ATTMARKER = _versioned(2, struct.pack(">hhf", 1, 1, 1.0))


def _leaf_record(
    name: str, letter: str, counts_name: str | None, n_entries: int
) -> bytes:
    """One class-tagged TLeafX record.  ``counts_name`` non-None marks a
    jagged value leaf: the title carries the NanoAOD "name[count]/T"
    spec and fLeafCount embeds a TLeafI for the counts leaf."""
    if letter not in _LEAF_CLASS:
        raise ValueError(f"unknown leaf letter {letter!r}")
    spec = f"{name}[{counts_name}]" if counts_name else name
    title = f"{spec}/{letter}"
    if counts_name:
        leaf_count = _leaf_record(counts_name, "I", None, n_entries)
    else:
        leaf_count = struct.pack(">I", 0)  # null TLeaf* pointer
    base = _versioned(
        LEAF_BASE_VERSION,
        _tnamed(name, title)
        + struct.pack(">iii", 1, _ITEMSIZE[letter], 0)  # fLen/fLenType/fOffset
        + struct.pack(">BB", 0, 0)  # fIsRange, fIsUnsigned
        + leaf_count,
    )
    body = _versioned(
        1, base + struct.pack(_LEAF_MINMAX[letter], 0, 0)  # fMinimum/fMaximum
    )
    return _class_tagged(_LEAF_CLASS[letter], body)


def _counted_i64(values: list[int]) -> bytes:
    """TStreamerBasicPointer on-disk form: 1-byte presence flag, then
    the Long64 array (the //[fMaxBaskets] shape)."""
    return b"\x01" + struct.pack(f">{len(values)}q", *values)


def branch_record(
    name: str,
    letter: str,
    entries: int,
    basket_entry: list[int],
    basket_seek: list[int],
    counts_name: str | None = None,
    compress: int = 0,
    basket_size: int = 32000,
) -> bytes:
    """One class-tagged TBranch v13 record.  ``basket_entry`` has one
    more slot than ``basket_seek``'s basket count — its last value is
    fEntries, exactly how real ROOT terminates the table (fBasketEntry
    [fWriteBasket] == fEntries)."""
    nb = len(basket_seek)
    if len(basket_entry) != nb + 1:
        raise ValueError("basket_entry must carry the fEntries terminator")
    spec = f"{name}[{counts_name}]" if counts_name else name
    body = _versioned(
        BRANCH_VERSION,
        _tnamed(name, f"{spec}/{letter}")
        + _ATTFILL
        + struct.pack(">iiii", compress, basket_size, 0, nb)
        + struct.pack(">q", entries)
        + struct.pack(">i", nb + 1)  # fMaxBaskets
        + _counted_i64(basket_entry)
        + _counted_i64(list(basket_seek) + [0])  # fMaxBaskets slots
        + _class_tagged(
            "TObjArray",
            _tobjarray("", [_leaf_record(name, letter, counts_name, entries)]),
        ),
    )
    return _class_tagged("TBranch", body)


def tree_record(
    name: str,
    title: str,
    entries: int,
    branches: list[bytes],
    tot_bytes: int = 0,
    zip_bytes: int = 0,
) -> bytes:
    """The TTree v20 key payload (NOT class-tagged: the TKey's class
    name declares it, as for any top-level key object)."""
    return _versioned(
        TREE_VERSION,
        _tnamed(name, title)
        + _ATTLINE
        + _ATTFILL
        + _ATTMARKER
        + struct.pack(">qqqq", entries, tot_bytes, zip_bytes, entries)
        + _class_tagged("TObjArray", _tobjarray("", branches))
        + _class_tagged("TObjArray", _tobjarray("", [])),  # fLeaves (top)
    )


# ---------------------------------------------------------------------------
# reader
# ---------------------------------------------------------------------------


def _read_tnamed_at(buf: bytes, pos: int) -> tuple[str, str, int]:
    """TNamed v1 -> (name, title, end)."""
    _v, end, pos = _read_versioned(buf, pos)
    pos += 10  # TObject v1
    name, pos = _read_tstring(buf, pos)
    title, pos = _read_tstring(buf, pos)
    return name, title, end


def _read_objarray(buf: bytes, pos: int) -> tuple[list[tuple[str, int, int]], int]:
    """Class-tagged TObjArray -> ([(member class, payload pos, end)],
    array end)."""
    acls, apos, aend = _read_class_tagged(buf, pos)
    if acls != "TObjArray":
        raise ValueError(f"expected TObjArray, got {acls!r}")
    _v, _oend, opos = _read_versioned(buf, apos)
    opos += 10  # TObject
    _aname, opos = _read_tstring(buf, opos)
    nobj, _lb = struct.unpack_from(">ii", buf, opos)
    opos += 8
    members = []
    for _ in range(nobj):
        mcls, mpos, mend = _read_class_tagged(buf, opos)
        members.append((mcls, mpos, mend))
        opos = mend
    return members, aend


def _parse_leaf(buf: bytes, cls: str, pos: int) -> dict:
    letter = _LETTER_OF.get(cls)
    if letter is None:
        raise ValueError(f"unsupported leaf class {cls!r}")
    _v1, _end1, pos = _read_versioned(buf, pos)  # TLeafX v1
    _v2, base_end, pos = _read_versioned(buf, pos)  # TLeaf v2 base
    name, title, tend = _read_tnamed_at(buf, pos)
    pos = tend
    _flen, _flentype, _foff = struct.unpack_from(">iii", buf, pos)
    pos += 12
    pos += 2  # fIsRange, fIsUnsigned
    (head,) = struct.unpack_from(">I", buf, pos)
    counts_name = ""
    if head == 0:
        pos += 4  # null fLeafCount pointer
    else:
        # inline fLeafCount object: only its NAME matters (the counts
        # branch linkage); it is a full TLeafI record
        ccls, cpos, _cend = _read_class_tagged(buf, pos)
        if ccls not in _LETTER_OF:
            raise ValueError(f"fLeafCount is {ccls!r}, not a TLeaf")
        _v, _e, p2 = _read_versioned(buf, cpos)  # TLeafX v1
        _v, _e2, p2 = _read_versioned(buf, p2)  # TLeaf v2 base
        counts_name, _t, _ = _read_tnamed_at(buf, p2)
        pos = base_end  # fLeafCount was the base's last member
    return dict(name=name, title=title, letter=letter, counts=counts_name)


def _parse_branch(buf: bytes, pos: int) -> dict:
    _v, end, pos = _read_versioned(buf, pos)  # TBranch v13
    name, _title, tend = _read_tnamed_at(buf, pos)
    pos = tend
    _v2, fill_end, _p = _read_versioned(buf, pos)  # TAttFill
    pos = fill_end
    compress, _bsize, _eol, write_basket = struct.unpack_from(">iiii", buf, pos)
    pos += 16
    (entries,) = struct.unpack_from(">q", buf, pos)
    pos += 8
    (max_baskets,) = struct.unpack_from(">i", buf, pos)
    pos += 4
    if write_basket < 0 or max_baskets < write_basket + 1:
        raise ValueError(f"branch {name!r}: bad basket table sizes")
    if buf[pos] != 1:
        raise ValueError(f"branch {name!r}: missing fBasketEntry array")
    pos += 1
    basket_entry = list(struct.unpack_from(f">{max_baskets}q", buf, pos))
    pos += 8 * max_baskets
    if buf[pos] != 1:
        raise ValueError(f"branch {name!r}: missing fBasketSeek array")
    pos += 1
    basket_seek = list(struct.unpack_from(f">{max_baskets}q", buf, pos))
    pos += 8 * max_baskets
    leaves, _ = _read_objarray(buf, pos)
    if len(leaves) != 1:
        raise ValueError(f"branch {name!r}: expected exactly one leaf")
    leaf = _parse_leaf(buf, leaves[0][0], leaves[0][1])
    return dict(
        name=name,
        letter=leaf["letter"],
        counts=leaf["counts"],
        entries=entries,
        compress=compress,
        basket_entry=basket_entry[: write_basket + 1],
        basket_seek=basket_seek[:write_basket],
        end=end,
    )


def parse_tree_record(payload: bytes) -> dict:
    """Parse a TTree key payload -> {name, title, entries, branches:
    [{name, letter, counts, entries, basket_entry, basket_seek}]}.
    Malformed input raises ValueError (rootio's reader contract)."""
    try:
        version, _end, pos = _read_versioned(payload, 0)
        if version != TREE_VERSION:
            raise ValueError(f"unsupported TTree version {version}")
        name, title, tend = _read_tnamed_at(payload, pos)
        pos = tend
        for _ in range(3):  # TAttLine, TAttFill, TAttMarker
            _v, aend, _p = _read_versioned(payload, pos)
            pos = aend
        entries, _tot, _zip, _maxe = struct.unpack_from(">qqqq", payload, pos)
        pos += 32
        members, _aend = _read_objarray(payload, pos)
        branches = []
        for mcls, mpos, _mend in members:
            if mcls != "TBranch":
                raise ValueError(f"fBranches member is {mcls!r}")
            branches.append(_parse_branch(payload, mpos))
        return dict(name=name, title=title, entries=entries, branches=branches)
    except (struct.error, IndexError, UnicodeDecodeError) as e:
        raise ValueError(f"malformed TTree record: {e}") from e


def tree_streamers() -> list[bytes]:
    """TStreamerInfo records matching the object records above: the
    TTree/TBranch/TLeaf trio WITH their base-class elements (kBase) and
    the fLeafCount pointer, plus the attribute bases and the typed leaf
    specializations — the self-description a streamer-driven reader
    needs for exactly these records."""
    from copperhead_spark.sources.streamerinfo import (
        T_BOOL, T_DOUBLE, T_FLOAT, T_INT, T_LONG64, T_OBJECT, T_OFFSET_P,
        base_element, element, tstreamerinfo,
    )

    leaf_minmax_t = {"TLeafF": (T_FLOAT, "Float_t"),
                     "TLeafD": (T_DOUBLE, "Double_t"),
                     "TLeafI": (T_INT, "Int_t"),
                     "TLeafL": (T_LONG64, "Long64_t"),
                     "TLeafO": (T_BOOL, "Bool_t")}
    out = [
        tstreamerinfo("TAttLine", 2, [
            element("fLineColor", 2, "Short_t", "Line color", size=2),
            element("fLineStyle", 2, "Short_t", "Line style", size=2),
            element("fLineWidth", 2, "Short_t", "Line width", size=2),
        ]),
        tstreamerinfo("TAttFill", 2, [
            element("fFillColor", 2, "Short_t", "Fill area color", size=2),
            element("fFillStyle", 2, "Short_t", "Fill area style", size=2),
        ]),
        tstreamerinfo("TAttMarker", 2, [
            element("fMarkerColor", 2, "Short_t", "Marker color", size=2),
            element("fMarkerStyle", 2, "Short_t", "Marker style", size=2),
            element("fMarkerSize", T_FLOAT, "Float_t", "Marker size"),
        ]),
        tstreamerinfo("TTree", TREE_VERSION, [
            base_element("TNamed", 1),
            base_element("TAttLine", 2),
            base_element("TAttFill", 2),
            base_element("TAttMarker", 2),
            element("fEntries", T_LONG64, "Long64_t", "Number of entries"),
            element("fTotBytes", T_LONG64, "Long64_t", "Total number of bytes"),
            element("fZipBytes", T_LONG64, "Long64_t", "Total compressed bytes"),
            element("fMaxEntries", T_LONG64, "Long64_t", "Max entries"),
            element("fBranches", T_OBJECT, "TObjArray", "List of branches"),
            element("fLeaves", T_OBJECT, "TObjArray", "Direct leaves"),
        ]),
        tstreamerinfo("TBranch", BRANCH_VERSION, [
            base_element("TNamed", 1),
            base_element("TAttFill", 2),
            element("fCompress", T_INT, "Int_t", "Compression level and algorithm"),
            element("fBasketSize", T_INT, "Int_t", "Initial size of basket buffer"),
            element("fEntryOffsetLen", T_INT, "Int_t", "Initial length of fEntryOffset"),
            element("fWriteBasket", T_INT, "Int_t", "Last basket number written"),
            element("fEntries", T_LONG64, "Long64_t", "Number of entries"),
            element("fMaxBaskets", T_INT, "Int_t", "Maximum number of baskets"),
            element(
                "fBasketEntry", T_OFFSET_P + T_LONG64, "Long64_t*",
                "[fMaxBaskets] Table of first entry in each basket",
                count_name="fMaxBaskets", count_class="TBranch",
            ),
            element(
                "fBasketSeek", T_OFFSET_P + T_LONG64, "Long64_t*",
                "[fMaxBaskets] Addresses of baskets on file",
                count_name="fMaxBaskets", count_class="TBranch",
            ),
            element("fLeaves", T_OBJECT, "TObjArray", "Direct leaves"),
        ]),
        tstreamerinfo("TLeaf", LEAF_BASE_VERSION, [
            base_element("TNamed", 1),
            element("fLen", T_INT, "Int_t", "Number of fixed length elements"),
            element("fLenType", T_INT, "Int_t", "Number of bytes for this data type"),
            element("fOffset", T_INT, "Int_t", "Offset in ClonesArray object"),
            element("fIsRange", T_BOOL, "Bool_t", "(=kTRUE if leaf has a range)"),
            element("fIsUnsigned", T_BOOL, "Bool_t", "(=kTRUE if unsigned)"),
            element("fLeafCount", 64, "TLeaf*",
                    "Pointer to Leaf count if variable length (we do not own the counter)",
                    size=8),
        ]),
    ]
    for cls, (ftype, tname) in leaf_minmax_t.items():
        out.append(
            tstreamerinfo(cls, 1, [
                base_element("TLeaf", LEAF_BASE_VERSION),
                element("fMinimum", ftype, tname,
                        "Minimum value if leaf range is specified"),
                element("fMaximum", ftype, tname,
                        "Maximum value if leaf range is specified"),
            ])
        )
    return out


# sanity: the reader must reject non-tree payloads cleanly
__all__ = [
    "tree_record", "branch_record", "parse_tree_record", "tree_streamers",
    "TREE_VERSION", "BRANCH_VERSION",
]
