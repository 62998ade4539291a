"""Minimal TStreamerInfo record emission (write-side; SURVEY §2.1 S8).

Real ROOT files are self-describing: the header's fSeekInfo points at a
TKey whose payload is a TList named "StreamerInfo" holding one
TStreamerInfo per class stored in the file, each listing its members as
TStreamerElement records.  rootio's documented honest gap (rootio.py
module docstring) is that its files carry a CSTreeIndex record instead;
this module closes the gap from the WRITE side: it serializes the real
TList / TStreamerInfo / TStreamerElement byte layout (the PUBLIC format,
as documented by ROOT's TBufferFile semantics and independently by
uproot's reader) so a rootio-written file can carry a genuine
StreamerInfo record describing TTree/TBranch/TLeaf classes.

Byte layout implemented (big-endian throughout):

- **version header** ("byte count + version"): uint32 byte-count of
  everything AFTER the count field, OR'd with kByteCountMask
  (0x40000000); then uint16 class version.
- **TObject v1**: uint16 version, uint32 fUniqueID, uint32 fBits.
- **TNamed v1**: version header, TObject, fName TString, fTitle TString
  (TString: 1-byte length, 255 -> 4-byte extension — rootio._tstring).
- **class-tagged object** (TBuffer WriteObjectAny): uint32 byte-count |
  kByteCountMask, uint32 kNewClassTag (0xFFFFFFFF) + NUL-terminated
  class name, then the object payload.  (ROOT also emits back-reference
  tags for repeated classes; re-emitting kNewClassTag every time is
  valid and every reader accepts it — the reference map just gains
  duplicate entries.)
- **TList v5**: version header, TObject, fName TString, int32 nobjects,
  then per object: class-tagged object + a 1-byte-length option string
  (always empty here).
- **TObjArray v3**: version header, TObject, fName TString, int32
  nobjects, int32 lowerBound, then class-tagged objects.
- **TStreamerInfo v9**: version header, TNamed (class name, title),
  uint32 fCheckSum, int32 fClassVersion, class-tagged TObjArray
  "fElements" of TStreamerElement subclasses.
- **TStreamerElement v4**: version header, TNamed (member name, title),
  int32 fType, int32 fSize, int32 fArrayLength, int32 fArrayDim,
  int32 fMaxIndex[5], TString fTypeName.  Concrete subclasses used here
  (TStreamerBasicType / TStreamerString / TStreamerObject /
  TStreamerObjectAny, all v2) are a version header wrapping the base
  element; TStreamerBasicPointer v2 appends int32 fCountVersion +
  TString fCountName + TString fCountClass (the NanoAOD jagged-branch
  shape: `Float_t *array; //[fN]`).

HONEST SCOPE (do not over-claim): writing this record makes the file's
metadata section real, but stock ROOT additionally requires (a) member
checksums matching its own dictionaries (we emit fCheckSum=0 — readers
treat a zero/foreign checksum as a schema-evolution candidate, not a
hard error), and (b) actual TTree/TBranch object records in the file
body, which rootio does not write (its tree metadata is the CSTreeIndex
record).  A rootio file with streamers is therefore still NOT
stock-ROOT loadable; what this module buys is byte-level parity of the
StreamerInfo section itself, unit-tested by round-trip through the
spec-written parser below.  Full closure stays gated on a real NanoAOD
file to verify against (r9 VERDICT: not provable in-image).
"""

from __future__ import annotations

import struct

from copperhead_spark.sources.rootio import _read_tstring, _tstring

K_BYTE_COUNT_MASK = 0x40000000
K_NEW_CLASS_TAG = 0xFFFFFFFF
K_CLASS_MASK = 0x80000000

# TStreamerElement fType codes (ROOT TVirtualStreamerInfo::EReadWrite)
T_INT = 3
T_LONG64 = 16
T_FLOAT = 5
T_DOUBLE = 8
T_BOOL = 18
T_OFFSET_P = 40  # + basic type: pointer-to-basic with //[count] comment
T_OBJECT = 61
T_ANY = 62
T_STRING = 65

_SIZES = {T_INT: 4, T_LONG64: 8, T_FLOAT: 4, T_DOUBLE: 8, T_BOOL: 1}


def _with_bytecount(payload: bytes) -> bytes:
    return struct.pack(">I", len(payload) | K_BYTE_COUNT_MASK) + payload


def _versioned(version: int, body: bytes) -> bytes:
    """version header: byte count covers the version uint16 + body."""
    return _with_bytecount(struct.pack(">H", version) + body)


def _tobject(bits: int = 0x03000000) -> bytes:
    return struct.pack(">HII", 1, 0, bits)


def _tnamed(name: str, title: str) -> bytes:
    return _versioned(1, _tobject() + _tstring(name) + _tstring(title))


def _class_tagged(classname: str, payload: bytes) -> bytes:
    body = (
        struct.pack(">I", K_NEW_CLASS_TAG)
        + classname.encode() + b"\x00"
        + payload
    )
    return _with_bytecount(body)


def element(
    name: str,
    ftype: int,
    type_name: str,
    title: str = "",
    size: int | None = None,
    count_name: str = "",
    count_class: str = "",
) -> bytes:
    """One TStreamerElement-derived record (class-tagged, ready for the
    fElements TObjArray).  ``count_name`` selects the
    TStreamerBasicPointer shape (fType 40+basic, title carries the
    //[count] comment exactly as rootcling writes it)."""
    if size is None:
        size = _SIZES.get(ftype % T_OFFSET_P, 8 if ftype >= T_OFFSET_P else 0)
    base = _versioned(
        4,
        _tnamed(name, title)
        + struct.pack(">iiii", ftype, size, 0, 0)
        + struct.pack(">5i", 0, 0, 0, 0, 0)
        + _tstring(type_name),
    )
    if count_name:
        body = _versioned(
            2,
            base
            + struct.pack(">i", 1)  # fCountVersion
            + _tstring(count_name)
            + _tstring(count_class),
        )
        return _class_tagged("TStreamerBasicPointer", body)
    if ftype == T_STRING:
        return _class_tagged("TStreamerString", _versioned(2, base))
    if ftype == T_OBJECT:
        return _class_tagged("TStreamerObject", _versioned(2, base))
    if ftype == T_ANY:
        return _class_tagged("TStreamerObjectAny", _versioned(2, base))
    return _class_tagged("TStreamerBasicType", _versioned(2, base))


def base_element(classname: str, base_version: int) -> bytes:
    """A TStreamerBase v3 record (fType 0 = kBase): the base-class slot
    real streamer descriptions lead with (TNamed/TAttLine/... bases of
    TTree et al.).  Layout: the common TStreamerElement base whose NAME
    is the base class, then int32 fBaseVersion."""
    base = _versioned(
        4,
        _tnamed(classname, "Base class")
        + struct.pack(">iiii", 0, 0, 0, 0)  # fType=kBase, size, arrlen, dim
        + struct.pack(">5i", 0, 0, 0, 0, 0)
        + _tstring("BASE"),
    )
    return _class_tagged(
        "TStreamerBase",
        _versioned(3, base + struct.pack(">i", base_version)),
    )


def _tobjarray(name: str, objects: list[bytes]) -> bytes:
    body = (
        _tobject()
        + _tstring(name)
        + struct.pack(">ii", len(objects), 0)
        + b"".join(objects)
    )
    return _versioned(3, body)


def tstreamerinfo(
    classname: str, class_version: int, elements: list[bytes],
    checksum: int = 0, title: str = "",
) -> bytes:
    """One class-tagged TStreamerInfo v9 record."""
    body = (
        _tnamed(classname, title)
        + struct.pack(">Ii", checksum, class_version)
        + _class_tagged("TObjArray", _tobjarray("", elements))
    )
    return _class_tagged("TStreamerInfo", _versioned(9, body))


def streamer_list(infos: list[bytes]) -> bytes:
    """The "StreamerInfo" TList payload the fSeekInfo key carries."""
    body = (
        _tobject()
        + _tstring("")
        + struct.pack(">i", len(infos))
        + b"".join(info + b"\x00" for info in infos)  # + empty option str
    )
    return _versioned(5, body)


def minimal_tree_streamers() -> list[bytes]:
    """TStreamerInfo records for the classes a rootio tree file stores:
    the TTree/TBranch/TLeaf trio (the members a reader needs to walk the
    tree — entry counts, basket grids, leaf shapes; class versions match
    the modern public headers) and the leaf specializations for every
    rootio leaf letter, including the counted-pointer jagged shape."""
    leaf_common = [
        element("fNdata", T_INT, "Int_t", "! Number of elements"),
        element("fLen", T_INT, "Int_t", "Number of fixed length elements"),
        element("fLenType", T_INT, "Int_t", "Number of bytes for this data type"),
        element("fOffset", T_INT, "Int_t", "Offset in ClonesArray object"),
        element("fIsRange", T_BOOL, "Bool_t", "(=kTRUE if leaf has a range)"),
        element("fIsUnsigned", T_BOOL, "Bool_t", "(=kTRUE if unsigned)"),
    ]
    out = [
        tstreamerinfo(
            "TTree",
            20,
            [
                element("fEntries", T_LONG64, "Long64_t", "Number of entries"),
                element("fTotBytes", T_LONG64, "Long64_t", "Total number of bytes"),
                element("fZipBytes", T_LONG64, "Long64_t", "Total compressed bytes"),
                element("fMaxEntries", T_LONG64, "Long64_t", "Max entries"),
                element("fBranches", T_OBJECT, "TObjArray", "List of branches"),
                element("fLeaves", T_OBJECT, "TObjArray", "Direct leaves"),
            ],
        ),
        tstreamerinfo(
            "TBranch",
            13,
            [
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
            ],
        ),
        tstreamerinfo("TLeaf", 2, leaf_common),
    ]
    for cls, ftype, tname in (
        ("TLeafF", T_FLOAT, "Float_t"),
        ("TLeafD", T_DOUBLE, "Double_t"),
        ("TLeafI", T_INT, "Int_t"),
        ("TLeafL", T_LONG64, "Long64_t"),
        ("TLeafO", T_BOOL, "Bool_t"),
    ):
        out.append(
            tstreamerinfo(
                cls,
                1,
                [
                    element("fMinimum", ftype, tname, "Minimum value if leaf range is specified"),
                    element("fMaximum", ftype, tname, "Maximum value if leaf range is specified"),
                ],
            )
        )
    return out


# ---------------------------------------------------------------------------
# spec-written parser (round-trip tests + documentation-by-construction)
# ---------------------------------------------------------------------------


def _read_bytecount(buf: bytes, pos: int) -> tuple[int, int]:
    (bc,) = struct.unpack_from(">I", buf, pos)
    if not bc & K_BYTE_COUNT_MASK:
        raise ValueError("missing kByteCountMask on byte count")
    return bc & ~K_BYTE_COUNT_MASK, pos + 4


def _read_versioned(buf: bytes, pos: int) -> tuple[int, int, int]:
    """-> (version, body_end, body_start)."""
    bc, pos = _read_bytecount(buf, pos)
    end = pos + bc
    (version,) = struct.unpack_from(">H", buf, pos)
    return version, end, pos + 2


def _read_class_tagged(buf: bytes, pos: int) -> tuple[str, int, int]:
    """-> (classname, payload_start, record_end)."""
    bc, pos = _read_bytecount(buf, pos)
    end = pos + bc
    (tag,) = struct.unpack_from(">I", buf, pos)
    if tag != K_NEW_CLASS_TAG:
        raise ValueError("only kNewClassTag records are emitted/parsed here")
    pos += 4
    nul = buf.index(b"\x00", pos)
    return buf[pos:nul].decode(), nul + 1, end


def _read_tnamed(buf: bytes, pos: int) -> tuple[str, str, int]:
    _v, end, pos = _read_versioned(buf, pos)
    pos += 10  # TObject v1
    name, pos = _read_tstring(buf, pos)
    title, pos = _read_tstring(buf, pos)
    return name, title, end


def read_streamer_list(payload: bytes) -> list[dict]:
    """Parse a streamer_list() blob back to
    [{class, version, checksum, elements: [{name, ftype, type_name,
    count_name}]}] — the reader half of the byte-layout contract.

    Malformed/truncated payloads raise ValueError (never struct.error or
    IndexError), matching the contract rootio's readers follow."""
    try:
        return _parse_streamer_list(payload)
    except (struct.error, IndexError, UnicodeDecodeError) as e:
        raise ValueError(f"malformed TStreamerInfo list payload: {e}") from e


def _parse_streamer_list(payload: bytes) -> list[dict]:
    version, end, pos = _read_versioned(payload, 0)
    if version != 5:
        raise ValueError(f"unexpected TList version {version}")
    pos += 10  # TObject
    _name, pos = _read_tstring(payload, pos)
    (nobj,) = struct.unpack_from(">i", payload, pos)
    pos += 4
    out = []
    for _ in range(nobj):
        cls, ppos, pend = _read_class_tagged(payload, pos)
        if cls != "TStreamerInfo":
            raise ValueError(f"unexpected list member {cls!r}")
        _v, _iend, ipos = _read_versioned(payload, ppos)
        cname, _t, ipos = _read_tnamed(payload, ipos)
        checksum, cversion = struct.unpack_from(">Ii", payload, ipos)
        ipos += 8
        acls, apos, _aend = _read_class_tagged(payload, ipos)
        if acls != "TObjArray":
            raise ValueError(f"fElements is {acls!r}, not TObjArray")
        _v, _oend, opos = _read_versioned(payload, apos)
        opos += 10  # TObject
        _aname, opos = _read_tstring(payload, opos)
        nelem, _lb = struct.unpack_from(">ii", payload, opos)
        opos += 8
        elements = []
        for _ in range(nelem):
            ecls, epos, eend = _read_class_tagged(payload, opos)
            _v, _e1, epos = _read_versioned(payload, epos)  # subclass hdr
            _v, _e2, epos = _read_versioned(payload, epos)  # base element
            ename, _etitle, tend = _read_tnamed(payload, epos)
            epos = tend
            ftype, _size, _al, _ad = struct.unpack_from(">iiii", payload, epos)
            epos += 16 + 20  # + fMaxIndex[5]
            tname, epos = _read_tstring(payload, epos)
            count_name = ""
            if ecls == "TStreamerBasicPointer":
                epos += 4  # fCountVersion
                count_name, epos = _read_tstring(payload, epos)
                _cc, epos = _read_tstring(payload, epos)
            elements.append(
                dict(name=ename, ftype=ftype, type_name=tname,
                     count_name=count_name, element_class=ecls)
            )
            opos = eend
        out.append(
            dict(cls=cname, version=cversion, checksum=checksum,
                 elements=elements)
        )
        # skip the TList per-object option string (1-byte length + bytes)
        pos = pend + 1 + payload[pend]
    return out
