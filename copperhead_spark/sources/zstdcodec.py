"""Pure-python Zstandard (RFC 8878) codec for ROOT kZSTD basket frames.

Written from the public spec — RFC 8878 / zstd_compression_format.md —
in the same from-spec style as sources/lz4codec.py (the r10 precedent):
recent CMS NanoAOD campaigns compress baskets with kZSTD ("ZS" frames,
rootio.py), and this image has no zstd wheel or stdlib module, so the
frame seam needs an in-repo decoder.  The decoder covers the full
single-frame surface a real encoder emits:

  * frame header (single-segment + windowed, all FCS widths, dict-ID
    rejection, content checksum via lz4codec.xxh64), skippable frames,
    concatenated frames;
  * raw / RLE / compressed blocks;
  * literals: Raw, RLE, Huffman-compressed (1- and 4-stream) with the
    tree described directly or FSE-compressed, and Treeless (repeat);
  * sequences: Predefined_Mode, RLE_Mode, FSE_Compressed_Mode and
    Repeat_Mode tables for LL/OF/ML, the interleaved backward bitstream,
    and the 3-slot repeat-offset history (including the LL==0 rotations
    and the rep1-1 corner).

The encoder exists so every decoder path is round-trip PROVABLE inside
this image (no zstd binary exists here to generate vectors): it emits
spec-conforming frames through each literals/sequences mode — any
conforming decoder accepts its output.  Like lz4codec's encoder it is
fixture-grade: clarity over speed, bounded memory.

Decode entry: ``zstd_decompress(data) -> bytes``.
Encode entry: ``zstd_compress(data, **mode_knobs) -> bytes``.

Malformed input raises ValueError (rootio's reader contract), never
IndexError/struct.error.
"""

from __future__ import annotations

from copperhead_spark.sources.lz4codec import xxh64

_MAGIC = 0xFD2FB528
_SKIP_MAGIC_LO = 0x184D2A50  # ..50-5F are skippable frames
_BLOCK_MAX = 128 * 1024
_HUF_MAX_BITS = 11

# ---------------------------------------------------------------------------
# bitstreams
# ---------------------------------------------------------------------------


class _BackBits:
    """Backward bitstream (RFC 8878 §3.1.1.3.2.1.1): written LSB-up,
    read from a 1-bit marker in the last byte downward.  ``pos`` is the
    number of unread payload bits; reads past the end zero-pad (Huffman
    decoding intentionally over-reads by the table log) but drive ``pos``
    negative so callers can enforce exact-consumption contracts."""

    __slots__ = ("val", "pos")

    def __init__(self, data: bytes):
        if not data:
            raise ValueError("empty backward bitstream")
        self.val = int.from_bytes(data, "little")
        if self.val == 0:
            raise ValueError("backward bitstream has no marker bit")
        self.pos = self.val.bit_length() - 1  # bits below the marker

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        self.pos -= n
        p = self.pos
        if p >= 0:
            return (self.val >> p) & ((1 << n) - 1)
        # zero-pad below bit 0
        return (self.val & ((1 << max(p + n, 0)) - 1)) << (-p)


class _FwdBits:
    """Forward bitstream (FSE table descriptions, §4.1.1): bits consumed
    LSB-first within each byte, bytes in order; supports the 1-bit
    rewind the normalized-count scheme needs and byte realignment."""

    __slots__ = ("val", "nbits", "pos")

    def __init__(self, data: bytes):
        self.val = int.from_bytes(data, "little")
        self.nbits = 8 * len(data)
        self.pos = 0

    def read(self, n: int) -> int:
        if self.pos + n > self.nbits:
            raise ValueError("FSE description overruns its payload")
        out = (self.val >> self.pos) & ((1 << n) - 1)
        self.pos += n
        return out

    def rewind(self, n: int) -> None:
        self.pos -= n

    def bytes_consumed(self) -> int:
        return (self.pos + 7) // 8


class _BackWriter:
    """Encoder half of _BackBits: accumulate LSB-up, close with the
    marker bit and pad to a byte."""

    __slots__ = ("val", "pos")

    def __init__(self):
        self.val = 0
        self.pos = 0

    def add(self, value: int, n: int) -> None:
        if n:
            self.val |= (value & ((1 << n) - 1)) << self.pos
            self.pos += n

    def close(self) -> bytes:
        self.val |= 1 << self.pos  # marker
        return self.val.to_bytes((self.pos // 8) + 1, "little")


# ---------------------------------------------------------------------------
# FSE core
# ---------------------------------------------------------------------------

# predefined distributions, RFC 8878 §3.1.1.3.2.2.1
_LL_DEFAULT = (
    [4, 3, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 1, 1, 1, 2, 2, 2, 2, 2, 2,
     2, 2, 2, 3, 2, 1, 1, 1, 1, 1, -1, -1, -1, -1],
    6,
)
_ML_DEFAULT = (
    [1, 4, 3, 2, 2, 2, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
     1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
     1, 1, -1, -1, -1, -1, -1, -1, -1],
    6,
)
_OF_DEFAULT = (
    [1, 1, 1, 1, 1, 1, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
     1, 1, -1, -1, -1, -1, -1],
    5,
)


def _spread_symbols(norm: list[int], log: int) -> list[int]:
    """State->symbol assignment (§4.1.1): -1 symbols take one state each
    from the table top; the rest spread with the (5/8+3) step."""
    size = 1 << log
    table = [0] * size
    high = size - 1
    for s, c in enumerate(norm):
        if c == -1:
            table[high] = s
            high -= 1
    step = (size >> 1) + (size >> 3) + 3
    mask = size - 1
    pos = 0
    for s, c in enumerate(norm):
        if c <= 0:
            continue
        for _ in range(c):
            table[pos] = s
            pos = (pos + step) & mask
            while pos > high:
                pos = (pos + step) & mask
    if pos != 0:
        raise ValueError("corrupted FSE normalized counts (spread != 0)")
    return table


class _FseDecTable:
    """Per-state (symbol, nbits, baseline) triples plus the table log."""

    __slots__ = ("log", "symbol", "nbits", "base")

    def __init__(self, norm: list[int], log: int):
        size = 1 << log
        if sum(c if c > 0 else (1 if c == -1 else 0) for c in norm) != size:
            raise ValueError("FSE normalized counts do not sum to table size")
        self.log = log
        self.symbol = _spread_symbols(norm, log)
        self.nbits = [0] * size
        self.base = [0] * size
        nxt = [c if c > 0 else 1 for c in norm]
        for state in range(size):
            s = self.symbol[state]
            x = nxt[s]
            nxt[s] += 1
            nb = log - (x.bit_length() - 1)
            self.nbits[state] = nb
            self.base[state] = (x << nb) - size

    @classmethod
    def rle(cls, symbol: int) -> "_FseDecTable":
        t = cls.__new__(cls)
        t.log = 0
        t.symbol = [symbol]
        t.nbits = [0]
        t.base = [0]
        return t


def _fse_read_header(fwd: _FwdBits, max_log: int, max_symbols: int
                     ) -> tuple[list[int], int]:
    """Parse a normalized-count description (§4.1.1) from the forward
    stream; returns (counts incl. -1 entries, accuracy_log) and leaves
    the stream byte-aligned."""
    log = fwd.read(4) + 5
    if log > max_log:
        raise ValueError(f"FSE accuracy log {log} exceeds max {max_log}")
    remaining = (1 << log) + 1
    norm: list[int] = []
    while remaining > 1:
        if len(norm) >= max_symbols:
            raise ValueError("FSE description has too many symbols")
        # variable-size field: with `remaining` in [2^(b-1), 2^b), values
        # below `small_max` fit in b-1 bits; the rest use b bits, the
        # upper half shifted by small_max so every b-bit pattern is used
        bits = remaining.bit_length()
        val = fwd.read(bits)
        low_mask = (1 << (bits - 1)) - 1
        small_max = (1 << bits) - 1 - remaining
        if (val & low_mask) < small_max:
            # small value: the top bit was not needed — give it back
            fwd.rewind(1)
            val &= low_mask
        elif val > low_mask:
            val -= small_max
        proba = val - 1
        norm.append(proba)
        remaining -= -proba if proba < 0 else proba
        if proba == 0:
            rep = fwd.read(2)
            norm.extend([0] * rep)
            while rep == 3:
                rep = fwd.read(2)
                norm.extend([0] * rep)
    if remaining != 1:
        raise ValueError("FSE normalized counts overshoot the table size")
    # align to byte boundary for whatever follows
    fwd.pos = 8 * fwd.bytes_consumed()
    return norm, log


def _fse_write_header(norm: list[int], log: int) -> bytes:
    """Serialize normalized counts — exact mirror of _fse_read_header.
    (Encoder-side; the variable-bit scheme favors small values.)"""
    bits_out: list[tuple[int, int]] = [(log - 5, 4)]
    remaining = (1 << log) + 1
    i = 0
    while remaining > 1:
        proba = norm[i]
        bits = remaining.bit_length()
        low_mask = (1 << (bits - 1)) - 1
        small_max = (1 << bits) - 1 - remaining
        val = proba + 1
        if val < small_max:
            bits_out.append((val, bits - 1))
        elif val <= low_mask:
            bits_out.append((val, bits))
        else:
            bits_out.append((val + small_max, bits))
        remaining -= -proba if proba < 0 else proba
        i += 1
        if proba == 0:
            # zero-repeat flags cover runs of zero-probability symbols
            run = 0
            while i < len(norm) and norm[i] == 0 and remaining > 1:
                run += 1
                i += 1
            while run >= 3:
                bits_out.append((3, 2))
                run -= 3
            bits_out.append((run, 2))
    val = 0
    pos = 0
    for v, n in bits_out:
        val |= (v & ((1 << n) - 1)) << pos
        pos += n
    return val.to_bytes((pos + 7) // 8 or 1, "little")


class _FseEncTable:
    """Encoder tables (the FSE_buildCTable layout from the public zstd
    sources, re-derived): per-symbol (delta_nbbits, delta_findstate) and
    the nextState table."""

    __slots__ = ("log", "delta_nb", "delta_fs", "next_state")

    def __init__(self, norm: list[int], log: int):
        size = 1 << log
        self.log = log
        spread = _spread_symbols(norm, log)
        cumul = [0] * (len(norm) + 1)
        for s, c in enumerate(norm):
            cumul[s + 1] = cumul[s] + (c if c > 0 else (1 if c == -1 else 0))
        self.next_state = [0] * size
        fill = list(cumul[:-1])
        for state in range(size):
            s = spread[state]
            self.next_state[fill[s]] = size + state
            fill[s] += 1
        self.delta_nb = [0] * len(norm)
        self.delta_fs = [0] * len(norm)
        total = 0
        for s, c in enumerate(norm):
            if c == 0:
                self.delta_nb[s] = ((log + 1) << 16) - size
            elif c in (-1, 1):
                self.delta_nb[s] = (log << 16) - size
                self.delta_fs[s] = total - 1
                total += 1
            else:
                # highbit(c-1) == bit_length-1: c=2 must yield max_bits=log
                max_bits = log - ((c - 1).bit_length() - 1)
                self.delta_nb[s] = (max_bits << 16) - (c << max_bits)
                self.delta_fs[s] = total - c
                total += c

    def init_state(self, symbol: int) -> int:
        nb = (self.delta_nb[symbol] + (1 << 15)) >> 16
        v = (nb << 16) - self.delta_nb[symbol]
        return self.next_state[(v >> nb) + self.delta_fs[symbol]]

    def encode(self, w: _BackWriter, state: int, symbol: int) -> int:
        nb = (state + self.delta_nb[symbol]) >> 16
        w.add(state, nb)
        return self.next_state[(state >> nb) + self.delta_fs[symbol]]

    def flush(self, w: _BackWriter, state: int) -> None:
        w.add(state, self.log)  # low `log` bits == the decoder's init read


def _normalize(freqs: dict[int, int], log: int) -> list[int]:
    """Largest-remainder normalization to sum 2^log with every present
    symbol >= 1 (the encoder never emits -1 probabilities)."""
    total = sum(freqs.values())
    size = 1 << log
    if len(freqs) > size:
        raise ValueError("alphabet larger than FSE table")
    last = max(freqs)
    norm = [0] * (last + 1)
    given = 0
    for s, f in freqs.items():
        norm[s] = max(1, (f * size) // total)
        given += norm[s]
    # distribute the remainder (or claw back excess) by frequency rank
    order = sorted(freqs, key=lambda s: -freqs[s])
    i = 0
    while given < size:
        norm[order[i % len(order)]] += 1
        given += 1
        i += 1
    i = 0
    while given > size:
        s = order[i % len(order)]
        if norm[s] > 1:
            norm[s] -= 1
            given -= 1
        i += 1
    return norm


# ---------------------------------------------------------------------------
# Huffman
# ---------------------------------------------------------------------------


class _HufTable:
    __slots__ = ("max_bits", "symbol", "nbits")

    def __init__(self, weights: list[int]):
        """``weights`` covers symbols 0..len-1 INCLUDING the implicit
        last one (already resolved by the caller)."""
        s = sum(1 << (w - 1) for w in weights if w > 0)
        if s <= 0 or s & (s - 1):
            raise ValueError("Huffman weights do not sum to a power of 2")
        max_bits = s.bit_length() - 1
        if max_bits > _HUF_MAX_BITS:
            raise ValueError("Huffman code length exceeds 11 bits")
        self.max_bits = max_bits
        size = 1 << max_bits
        self.symbol = [0] * size
        self.nbits = [0] * size
        pos = 0
        # canonical order: weight ascending, symbol ascending; longest
        # codes (lowest weight) take the numerically lowest prefixes
        for w in range(1, max_bits + 1):
            for sym, sw in enumerate(weights):
                if sw != w:
                    continue
                nb = max_bits + 1 - w
                span = 1 << (w - 1)
                for _ in range(span):
                    self.symbol[pos] = sym
                    self.nbits[pos] = nb
                    pos += 1
        if pos != size:
            raise ValueError("Huffman weights do not fill the table")

    def codes(self) -> dict[int, tuple[int, int]]:
        """symbol -> (code_value, code_len) for the encoder (prefix read
        MSB-first equals the table index of the entry's first cell)."""
        out: dict[int, tuple[int, int]] = {}
        i = 0
        size = len(self.symbol)
        while i < size:
            sym, nb = self.symbol[i], self.nbits[i]
            out[sym] = (i >> (self.max_bits - nb), nb)
            i += 1 << (self.max_bits - nb)
        return out


def _resolve_weights(explicit: list[int]) -> list[int]:
    """Append the implicit last weight (§4.2.1): the explicit weights'
    2^(w-1) sum is completed to the next power of two."""
    s = sum(1 << (w - 1) for w in explicit if w > 0)
    if s == 0:
        raise ValueError("all-zero Huffman weights")
    full = 1 << s.bit_length()  # strictly greater than s
    rest = full - s
    if rest & (rest - 1):
        raise ValueError("implicit Huffman weight is not a power of 2")
    return explicit + [rest.bit_length()]


def _read_huffman_desc(data: bytes) -> tuple[_HufTable, int]:
    """Parse a Huffman_Tree_Description; returns (table, bytes used)."""
    if not data:
        raise ValueError("missing Huffman tree description")
    head = data[0]
    if head >= 128:
        n = head - 127
        packed = data[1 : 1 + (n + 1) // 2]
        if len(packed) < (n + 1) // 2:
            raise ValueError("truncated direct Huffman weights")
        expl = []
        for i in range(n):
            b = packed[i // 2]
            expl.append((b >> 4) if i % 2 == 0 else (b & 0xF))
        return _HufTable(_resolve_weights(expl)), 1 + (n + 1) // 2
    # FSE-compressed weights: `head` bytes follow, holding the table
    # description then a backward bitstream of two interleaved states
    comp = data[1 : 1 + head]
    if len(comp) < head:
        raise ValueError("truncated FSE-compressed Huffman weights")
    fwd = _FwdBits(comp)
    norm, log = _fse_read_header(fwd, 6, 256)
    table = _FseDecTable(norm, log)
    stream = comp[fwd.bytes_consumed() :]
    bits = _BackBits(stream)
    if bits.pos < 2 * log:
        raise ValueError("FSE weight stream shorter than two init states")
    s1 = bits.read(log)
    s2 = bits.read(log)
    expl: list[int] = []
    while True:
        expl.append(table.symbol[s1])
        if bits.pos < table.nbits[s1]:
            expl.append(table.symbol[s2])
            break
        s1 = table.base[s1] + bits.read(table.nbits[s1])
        expl.append(table.symbol[s2])
        if bits.pos < table.nbits[s2]:
            expl.append(table.symbol[s1])
            break
        s2 = table.base[s2] + bits.read(table.nbits[s2])
        if len(expl) > 255:
            raise ValueError("more than 255 Huffman weights")
    if len(expl) > 255:
        raise ValueError("more than 255 Huffman weights")
    return _HufTable(_resolve_weights(expl)), 1 + head


def _huf_decode_stream(table: _HufTable, data: bytes, count: int) -> bytes:
    bits = _BackBits(data)
    p = table.max_bits
    state = bits.read(p)
    out = bytearray()
    sym = table.symbol
    nbits = table.nbits
    base_read = bits.read
    mask = (1 << p) - 1
    for _ in range(count):
        out.append(sym[state])
        nb = nbits[state]
        state = ((state << nb) | base_read(nb)) & mask
    if bits.pos > 0 or bits.pos < -p:
        raise ValueError("Huffman stream not fully consumed")
    return bytes(out)


def _huf_encode_stream(codes: dict[int, tuple[int, int]], data: bytes) -> bytes:
    w = _BackWriter()
    for b in reversed(data):
        code, nb = codes[b]
        w.add(code, nb)
    return w.close()


def _huffman_weights_for(data: bytes) -> list[int]:
    """Valid (Kraft-complete) weights for the distinct bytes of ``data``:
    the most frequent symbols get the shorter of two adjacent lengths.
    Compression-optimal is irrelevant here; validity and coverage are."""
    freqs: dict[int, int] = {}
    for b in data:
        freqs[b] = freqs.get(b, 0) + 1
    n = len(freqs)
    if n < 2:
        raise ValueError("Huffman needs >= 2 distinct symbols")
    log = max(1, (n - 1).bit_length())
    n_long = 2 * n - (1 << log)  # symbols with length `log`
    by_freq = sorted(freqs, key=lambda s: (freqs[s], s))
    lengths = {s: log for s in by_freq[:n_long]}
    lengths.update({s: log - 1 for s in by_freq[n_long:]})
    max_bits = max(lengths.values())
    weights = [0] * 256
    for s, ln in lengths.items():
        weights[s] = max_bits + 1 - ln
    last = max(lengths)
    return weights[: last + 1]  # last entry implicit at decode time


def _write_huffman_desc(weights_full: list[int], force_fse: bool) -> bytes:
    """Serialize weights directly or FSE-compressed.  ``weights_full``
    covers symbols 0..last-present; its FINAL entry is the implicit one
    (§4.2.1 — the decoder re-derives it from the power-of-two sum), so
    only ``weights_full[:-1]`` is transmitted.  Intermediate zeros must
    stay: symbol indices are positional."""
    expl = weights_full[:-1]
    distinct = len(set(expl))
    if (len(expl) <= 128 and not force_fse) or distinct < 2:
        if len(expl) > 128:
            # direct mode caps at 128 weights and a 1-symbol FSE weight
            # alphabet cannot terminate the interleaved stream
            raise ValueError("weights not describable (use raw literals)")
        packed = bytearray([127 + len(expl)])
        for i in range(0, len(expl), 2):
            hi = expl[i] << 4
            lo = expl[i + 1] if i + 1 < len(expl) else 0
            packed.append(hi | lo)
        return bytes(packed)
    freqs: dict[int, int] = {}
    for w_ in expl:
        freqs[w_] = freqs.get(w_, 0) + 1
    # the header field stores accuracy_log - 5, so 5 is the floor; 6 is
    # the weights-table max — the 13-symbol weight alphabet always fits
    log = 5 if len(freqs) <= 32 else 6
    norm = _normalize(freqs, log)
    enc = _FseEncTable(norm, log)
    header = _fse_write_header(norm, log)
    w = _BackWriter()
    # encoder mirrors the interleaved decode: symbols alternate streams
    # s1,s2,s1,s2,...; encode in reverse with two states, flush s2, s1
    n = len(expl)
    st = [None, None]
    order = list(range(n))
    # state k handles symbols k, k+2, k+4... ; reverse-encode each chain
    # interleaved exactly as the decoder consumes: the LAST update read
    # belongs to the chain of the LAST symbol.  Walk indices in reverse,
    # initializing each state at its chain's last symbol.
    for idx in reversed(order):
        chain = idx & 1
        sym = expl[idx]
        if st[chain] is None:
            st[chain] = enc.init_state(sym)
        else:
            st[chain] = enc.encode(w, st[chain], sym)
    enc.flush(w, st[1] if st[1] is not None else 0)
    enc.flush(w, st[0])
    body = header + w.close()
    if len(body) >= 128:
        raise ValueError("FSE-compressed weights exceed 127 bytes")
    desc = bytes([len(body)]) + body
    # self-check (0-bit chain-end states could make the interleaved
    # decode emit extra weights): the description must parse back to the
    # exact table; fall back to the direct form when it cannot
    try:
        got, _ = _read_huffman_desc(desc)
        want = _HufTable(_resolve_weights(expl))
        if got.symbol != want.symbol or got.nbits != want.nbits:
            raise ValueError("weight FSE round-trip mismatch")
    except ValueError:
        if len(expl) > 128:
            raise
        return _write_huffman_desc(weights_full, force_fse=False)
    return desc


# ---------------------------------------------------------------------------
# sequences: code <-> value tables (RFC 8878 §3.1.1.3.2.1.3)
# ---------------------------------------------------------------------------

_LL_EXTRA = [(i, 0) for i in range(16)] + [
    (16, 1), (18, 1), (20, 1), (22, 1), (24, 2), (28, 2), (32, 3), (40, 3),
    (48, 4), (64, 6), (128, 7), (256, 8), (512, 9), (1024, 10), (2048, 11),
    (4096, 12), (8192, 13), (16384, 14), (32768, 15), (65536, 16),
]

_ML_EXTRA = [(i + 3, 0) for i in range(32)] + [
    (35, 1), (37, 1), (39, 1), (41, 1), (43, 2), (47, 2), (51, 3), (59, 3),
    (67, 4), (83, 4), (99, 5), (131, 7), (259, 8), (515, 9), (1027, 10),
    (2051, 11), (4099, 12), (8195, 13), (16387, 14), (32771, 15),
    (65539, 16),
]


def _code_for(value: int, table: list[tuple[int, int]]) -> int:
    """Largest code whose baseline <= value (tables are ascending)."""
    lo, hi = 0, len(table) - 1
    while lo < hi:
        mid = (lo + hi + 1) // 2
        if table[mid][0] <= value:
            lo = mid
        else:
            hi = mid - 1
    return lo


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


class _FrameCtx:
    """Cross-block state within one frame: Huffman table for Treeless
    literals, LL/OF/ML tables for Repeat_Mode, repeat-offset history."""

    def __init__(self):
        self.huf: _HufTable | None = None
        self.ll: _FseDecTable | None = None
        self.of: _FseDecTable | None = None
        self.ml: _FseDecTable | None = None
        self.reps = [1, 4, 8]


def _decode_literals(block: bytes, ctx: _FrameCtx) -> tuple[bytes, int]:
    """Returns (literals, bytes consumed from the block)."""
    if not block:
        raise ValueError("empty literals section")
    b0 = block[0]
    lit_type = b0 & 3
    sf = (b0 >> 2) & 3
    if lit_type in (0, 1):  # Raw / RLE
        if sf in (0, 2):
            regen, hsz = b0 >> 3, 1
        elif sf == 1:
            if len(block) < 2:
                raise ValueError("truncated literals header")
            regen, hsz = int.from_bytes(block[:2], "little") >> 4, 2
        else:
            if len(block) < 3:
                raise ValueError("truncated literals header")
            regen, hsz = int.from_bytes(block[:3], "little") >> 4, 3
        if lit_type == 0:
            if len(block) < hsz + regen:
                raise ValueError("truncated raw literals")
            return bytes(block[hsz : hsz + regen]), hsz + regen
        if len(block) < hsz + 1:
            raise ValueError("truncated RLE literals")
        return bytes([block[hsz]]) * regen, hsz + 1
    # Compressed / Treeless
    if sf == 0:
        streams, rbits, hsz = 1, 10, 3
    elif sf == 1:
        streams, rbits, hsz = 4, 10, 3
    elif sf == 2:
        streams, rbits, hsz = 4, 14, 4
    else:
        streams, rbits, hsz = 4, 18, 5
    if len(block) < hsz:
        raise ValueError("truncated literals header")
    h = int.from_bytes(block[:hsz], "little")
    regen = (h >> 4) & ((1 << rbits) - 1)
    comp = (h >> (4 + rbits)) & ((1 << rbits) - 1)
    if len(block) < hsz + comp:
        raise ValueError("truncated compressed literals")
    payload = bytes(block[hsz : hsz + comp])
    if lit_type == 2:
        table, used = _read_huffman_desc(payload)
        ctx.huf = table
        payload = payload[used:]
    else:
        table = ctx.huf
        if table is None:
            raise ValueError("Treeless literals with no previous Huffman table")
    if streams == 1:
        return _huf_decode_stream(table, payload, regen), hsz + comp
    if len(payload) < 6:
        raise ValueError("missing 4-stream jump table")
    s1 = int.from_bytes(payload[0:2], "little")
    s2 = int.from_bytes(payload[2:4], "little")
    s3 = int.from_bytes(payload[4:6], "little")
    rest = payload[6:]
    if s1 + s2 + s3 > len(rest):
        raise ValueError("jump table overruns the literals payload")
    part = (regen + 3) // 4
    sizes = [s1, s2, s3, len(rest) - s1 - s2 - s3]
    counts = [part, part, part, regen - 3 * part]
    if counts[3] < 0:
        raise ValueError("4-stream literals smaller than 3 full streams")
    out = bytearray()
    pos = 0
    for sz, cnt in zip(sizes, counts):
        out += _huf_decode_stream(table, rest[pos : pos + sz], cnt)
        pos += sz
    return bytes(out), hsz + comp


def _read_seq_table(
    mode: int,
    fwd_data: bytes,
    offset: int,
    default: tuple[list[int], int],
    max_log: int,
    max_symbols: int,
    prev: _FseDecTable | None,
    what: str,
) -> tuple[_FseDecTable, int]:
    """Build one of the LL/OF/ML tables; returns (table, bytes used)."""
    if mode == 0:
        return _FseDecTable(*default), 0
    if mode == 1:
        if offset >= len(fwd_data):
            raise ValueError(f"truncated RLE byte for {what}")
        return _FseDecTable.rle(fwd_data[offset]), 1
    if mode == 2:
        fwd = _FwdBits(fwd_data[offset:])
        norm, log = _fse_read_header(fwd, max_log, max_symbols)
        return _FseDecTable(norm, log), fwd.bytes_consumed()
    if prev is None:
        raise ValueError(f"Repeat_Mode with no previous {what} table")
    return prev, 0


def _decode_sequences_section(
    block: bytes, pos: int, ctx: _FrameCtx
) -> tuple[list[tuple[int, int, int]], _FseDecTable, _FseDecTable, _FseDecTable]:
    """Parse the sequences section from ``block[pos:]``; returns the
    (ll_value, of_value, ml_value) triples BEFORE offset resolution."""
    if pos >= len(block):
        raise ValueError("missing sequences section")
    b0 = block[pos]
    if b0 < 128:
        nseq, pos = b0, pos + 1
    elif b0 < 255:
        if pos + 2 > len(block):
            raise ValueError("truncated sequence count")
        nseq, pos = ((b0 - 128) << 8) + block[pos + 1], pos + 2
    else:
        if pos + 3 > len(block):
            raise ValueError("truncated sequence count")
        nseq = block[pos + 1] + (block[pos + 2] << 8) + 0x7F00
        pos += 3
    if nseq == 0:
        return [], None, None, None  # type: ignore[return-value]
    if pos >= len(block):
        raise ValueError("missing symbol compression modes")
    modes = block[pos]
    pos += 1
    if modes & 3:
        raise ValueError("reserved sequence mode bits set")
    ll_mode, of_mode, ml_mode = (modes >> 6) & 3, (modes >> 4) & 3, (modes >> 2) & 3
    ll, used = _read_seq_table(ll_mode, block, pos, _LL_DEFAULT, 9, 36, ctx.ll, "LL")
    pos += used
    of, used = _read_seq_table(of_mode, block, pos, _OF_DEFAULT, 8, 32, ctx.of, "OF")
    pos += used
    ml, used = _read_seq_table(ml_mode, block, pos, _ML_DEFAULT, 9, 53, ctx.ml, "ML")
    pos += used
    ctx.ll, ctx.of, ctx.ml = ll, of, ml
    bits = _BackBits(block[pos:])
    if bits.pos < ll.log + of.log + ml.log:
        raise ValueError("sequence bitstream shorter than its init states")
    ll_state = bits.read(ll.log)
    of_state = bits.read(of.log)
    ml_state = bits.read(ml.log)
    seqs: list[tuple[int, int, int]] = []
    for i in range(nseq):
        of_code = of.symbol[of_state]
        if of_code > 31:
            raise ValueError("offset code beyond 31")
        of_value = (1 << of_code) + bits.read(of_code)
        ml_code = ml.symbol[ml_state]
        if ml_code >= len(_ML_EXTRA):
            raise ValueError("match-length code beyond 52")
        base, nb = _ML_EXTRA[ml_code]
        ml_value = base + bits.read(nb)
        ll_code = ll.symbol[ll_state]
        if ll_code >= len(_LL_EXTRA):
            raise ValueError("literal-length code beyond 35")
        base, nb = _LL_EXTRA[ll_code]
        ll_value = base + bits.read(nb)
        seqs.append((ll_value, of_value, ml_value))
        if i != nseq - 1:
            ll_state = ll.base[ll_state] + bits.read(ll.nbits[ll_state])
            ml_state = ml.base[ml_state] + bits.read(ml.nbits[ml_state])
            of_state = of.base[of_state] + bits.read(of.nbits[of_state])
        if bits.pos < 0:
            raise ValueError("sequence bitstream over-read")
    if bits.pos != 0:
        raise ValueError("sequence bitstream not fully consumed")
    return seqs, ll, of, ml


def _execute_sequences(
    seqs: list[tuple[int, int, int]],
    literals: bytes,
    out: bytearray,
    ctx: _FrameCtx,
) -> None:
    lit_pos = 0
    reps = ctx.reps
    for ll_value, of_value, ml_value in seqs:
        if lit_pos + ll_value > len(literals):
            raise ValueError("sequence consumes more literals than decoded")
        out += literals[lit_pos : lit_pos + ll_value]
        lit_pos += ll_value
        if of_value > 3:
            offset = of_value - 3
            reps[2] = reps[1]
            reps[1] = reps[0]
            reps[0] = offset
        else:
            idx = of_value - 1 if ll_value != 0 else of_value
            if idx == 0:
                offset = reps[0]
            elif idx == 1:
                offset = reps[1]
                reps[1] = reps[0]
                reps[0] = offset
            elif idx == 2:
                offset = reps[2]
                reps[2] = reps[1]
                reps[1] = reps[0]
                reps[0] = offset
            else:  # ll_value == 0 and of_value == 3
                offset = reps[0] - 1
                if offset <= 0:
                    raise ValueError("repeat offset underflow (rep1 - 1 == 0)")
                reps[2] = reps[1]
                reps[1] = reps[0]
                reps[0] = offset
        if offset > len(out):
            raise ValueError("match offset reaches before frame start")
        if ml_value:
            if offset >= ml_value:
                start = len(out) - offset
                out += out[start : start + ml_value]
            else:
                pattern = out[len(out) - offset :]
                rep = pattern * (ml_value // offset + 1)
                out += rep[:ml_value]
    out += literals[lit_pos:]


def _decode_frame(data: bytes, pos: int) -> tuple[bytes, int]:
    if pos + 2 > len(data):
        raise ValueError("truncated frame header")
    fhd = data[pos]
    pos += 1
    fcs_code = fhd >> 6
    single = (fhd >> 5) & 1
    if (fhd >> 3) & 1:
        raise ValueError("reserved frame-header bit set")
    checksum = (fhd >> 2) & 1
    did_size = (0, 1, 2, 4)[fhd & 3]
    window = None
    if not single:
        if pos >= len(data):
            raise ValueError("truncated window descriptor")
        wd = data[pos]
        pos += 1
        base = 1 << (10 + (wd >> 3))
        window = base + (base // 8) * (wd & 7)
    if did_size:
        if pos + did_size > len(data):
            raise ValueError("truncated dictionary ID")
        did = int.from_bytes(data[pos : pos + did_size], "little")
        pos += did_size
        if did:
            raise ValueError("dictionary-compressed zstd frames unsupported")
    fcs_bytes = (1 if single else 0, 2, 4, 8)[fcs_code]
    content_size = None
    if fcs_bytes:
        if pos + fcs_bytes > len(data):
            raise ValueError("truncated frame content size")
        content_size = int.from_bytes(data[pos : pos + fcs_bytes], "little")
        if fcs_bytes == 2:
            content_size += 256
        pos += fcs_bytes
    if single:
        window = content_size if content_size is not None else 0
    block_max = min(window or _BLOCK_MAX, _BLOCK_MAX)
    out = bytearray()
    ctx = _FrameCtx()
    while True:
        if pos + 3 > len(data):
            raise ValueError("truncated block header")
        bh = int.from_bytes(data[pos : pos + 3], "little")
        pos += 3
        last = bh & 1
        btype = (bh >> 1) & 3
        bsize = bh >> 3
        if btype == 0:  # raw
            if pos + bsize > len(data):
                raise ValueError("truncated raw block")
            out += data[pos : pos + bsize]
            pos += bsize
        elif btype == 1:  # RLE: bsize is the REGENERATED size
            if pos >= len(data):
                raise ValueError("truncated RLE block")
            out += bytes([data[pos]]) * bsize
            pos += 1
        elif btype == 2:
            if bsize > block_max or pos + bsize > len(data):
                raise ValueError("compressed block overruns frame/window")
            block = data[pos : pos + bsize]
            pos += bsize
            literals, used = _decode_literals(block, ctx)
            seqs, *_ = _decode_sequences_section(block, used, ctx)
            before = len(out)
            _execute_sequences(seqs, literals, out, ctx)
            if len(out) - before > block_max:
                raise ValueError("block regenerates beyond Block_Maximum_Size")
        else:
            raise ValueError("reserved block type")
        if last:
            break
    if content_size is not None and len(out) != content_size:
        raise ValueError(
            f"frame decoded to {len(out)} bytes, header said {content_size}"
        )
    if checksum:
        if pos + 4 > len(data):
            raise ValueError("truncated content checksum")
        want = int.from_bytes(data[pos : pos + 4], "little")
        pos += 4
        if xxh64(bytes(out)) & 0xFFFFFFFF != want:
            raise ValueError("zstd content checksum mismatch")
    return bytes(out), pos


def zstd_decompress(data: bytes) -> bytes:
    """Decode one or more concatenated zstd frames (skippable frames are
    skipped).  Raises ValueError on any malformed input."""
    data = bytes(data)
    out = bytearray()
    pos = 0
    seen = False
    while pos < len(data):
        if pos + 4 > len(data):
            raise ValueError("trailing garbage after last zstd frame")
        magic = int.from_bytes(data[pos : pos + 4], "little")
        pos += 4
        if (magic & 0xFFFFFFF0) == _SKIP_MAGIC_LO:
            if pos + 4 > len(data):
                raise ValueError("truncated skippable frame")
            skip = int.from_bytes(data[pos : pos + 4], "little")
            pos += 4 + skip
            if pos > len(data):
                raise ValueError("skippable frame overruns input")
            continue
        if magic != _MAGIC:
            raise ValueError(f"bad zstd magic 0x{magic:08x}")
        frame, pos = _decode_frame(data, pos)
        out += frame
        seen = True
    if not seen:
        raise ValueError("no zstd frame in input")
    return bytes(out)


# ---------------------------------------------------------------------------
# encoder (fixture-grade: proves every decoder path in-image)
# ---------------------------------------------------------------------------


class _RleEnc:
    """Encoder stand-in for an RLE_Mode table: log 0, no bits ever."""

    log = 0

    def init_state(self, symbol: int) -> int:
        return 0

    def encode(self, w: _BackWriter, state: int, symbol: int) -> int:
        return 0

    def flush(self, w: _BackWriter, state: int) -> None:
        pass  # decoder reads 0 init bits


def _greedy_sequences(
    chunk: bytes, min_len: int = 7
) -> tuple[bytes, list[tuple[int, int, int]]]:
    """LZ77 pass producing zstd sequences (ll, offset, ml), ml >= 3.
    Same bounded hash-table scheme as lz4codec's encoder; matches
    shorter than ``min_len`` are skipped so the FSE streams stay small."""
    n = len(chunk)
    table = [-1] * (1 << _HASH_LOG_Z)
    lits = bytearray()
    seqs: list[tuple[int, int, int]] = []
    anchor = 0
    i = 0
    while i + 4 <= n:
        key = chunk[i : i + 4]
        h = (int.from_bytes(key, "little") * 2654435761 & 0xFFFFFFFF) >> (
            32 - _HASH_LOG_Z
        )
        cand = table[h]
        table[h] = i
        if cand < 0 or chunk[cand : cand + 4] != key:
            i += 1
            continue
        m, c = i + 4, cand + 4
        while m < n and chunk[m] == chunk[c]:
            m += 1
            c += 1
        if m - i < min_len:
            i += 1
            continue
        lits += chunk[anchor:i]
        seqs.append((i - anchor, i - cand, m - i))
        for j in range(i + 1, min(m, n - 4), 7):
            kj = chunk[j : j + 4]
            table[
                (int.from_bytes(kj, "little") * 2654435761 & 0xFFFFFFFF)
                >> (32 - _HASH_LOG_Z)
            ] = j
        i = m
        anchor = m
    lits += chunk[anchor:]
    return bytes(lits), seqs


_HASH_LOG_Z = 16


def _encode_seq_table(
    codes: list[int],
    default: tuple[list[int], int],
    max_log: int,
    force_fse: bool,
):
    """Pick a table mode for one category; returns (mode, desc_bytes,
    enc_table, code->nbits lookup via the enc table itself)."""
    distinct = sorted(set(codes))
    if len(distinct) == 1 and not force_fse:
        return 1, bytes([distinct[0]]), _RleEnc()
    if not force_fse:
        return 0, b"", _FseEncTable(*default)
    freqs: dict[int, int] = {}
    for c in codes:
        freqs[c] = freqs.get(c, 0) + 1
    if len(freqs) < 2:
        return 1, bytes([distinct[0]]), _RleEnc()
    log = min(max_log, max(5, (len(freqs) - 1).bit_length() + 1))
    norm = _normalize(freqs, log)
    return 2, _fse_write_header(norm, log), _FseEncTable(norm, log)


def _encode_sequences(
    seqs: list[tuple[int, int, int]],
    reps: list[int],
    force_fse: bool,
    use_rep1: bool,
    of_values: list[int] | None = None,
) -> bytes:
    """Sequences section (§3.1.1.3.2): count, modes byte, table
    descriptions, interleaved backward bitstream.  Mutates ``reps``
    exactly as the decoder will.  ``of_values`` overrides the offset
    resolution with verbatim Offset_Values (tests use this to drive the
    decoder's repeat-offset rotations, including the <=3 corners)."""
    n = len(seqs)
    if n == 0:
        return b"\x00"
    if n < 128:
        head = bytes([n])
    elif n < 0x7F00:
        head = bytes([(n >> 8) + 128, n & 0xFF])
    else:
        head = bytes([255, n & 0xFF, (n >> 8) - 0x7F])
    # resolve offsets -> offset_values (optionally using rep1) and codes
    rows = []
    for si, (ll, offset, ml) in enumerate(seqs):
        if of_values is not None:
            of_value = of_values[si]
        elif use_rep1 and ll != 0 and offset == reps[0]:
            of_value = 1
        else:
            of_value = offset + 3
            reps[2] = reps[1]
            reps[1] = reps[0]
            reps[0] = offset
        of_code = of_value.bit_length() - 1
        of_extra = of_value - (1 << of_code)
        ll_code = _code_for(ll, _LL_EXTRA)
        ll_extra = ll - _LL_EXTRA[ll_code][0]
        ml_code = _code_for(ml, _ML_EXTRA)
        ml_extra = ml - _ML_EXTRA[ml_code][0]
        rows.append((ll_code, ll_extra, of_code, of_extra, ml_code, ml_extra))
    ll_mode, ll_desc, ll_t = _encode_seq_table(
        [r[0] for r in rows], _LL_DEFAULT, 9, force_fse
    )
    of_mode, of_desc, of_t = _encode_seq_table(
        [r[2] for r in rows], _OF_DEFAULT, 8, force_fse
    )
    ml_mode, ml_desc, ml_t = _encode_seq_table(
        [r[4] for r in rows], _ML_DEFAULT, 9, force_fse
    )
    modes = bytes([(ll_mode << 6) | (of_mode << 4) | (ml_mode << 2)])
    w = _BackWriter()
    last = rows[-1]
    ml_state = ml_t.init_state(last[4])
    of_state = of_t.init_state(last[2])
    ll_state = ll_t.init_state(last[0])
    w.add(last[1], _LL_EXTRA[last[0]][1])
    w.add(last[5], _ML_EXTRA[last[4]][1])
    w.add(last[3], last[2])  # of extra uses of_code bits
    for r in reversed(rows[:-1]):
        of_state = of_t.encode(w, of_state, r[2])
        ml_state = ml_t.encode(w, ml_state, r[4])
        ll_state = ll_t.encode(w, ll_state, r[0])
        w.add(r[1], _LL_EXTRA[r[0]][1])
        w.add(r[5], _ML_EXTRA[r[4]][1])
        w.add(r[3], r[2])
    ml_t.flush(w, ml_state)
    of_t.flush(w, of_state)
    ll_t.flush(w, ll_state)
    return head + modes + ll_desc + of_desc + ml_desc + w.close()


def _lit_header(lit_type: int, regen: int, comp: int | None, streams: int) -> bytes:
    if regen >= 1 << 20 or (comp is not None and comp >= 1 << 18):
        raise ValueError("literals exceed section-header size fields")
    if comp is None:  # Raw/RLE
        if regen < 32:
            return bytes([lit_type | (0 << 2) | (regen << 3)])
        if regen < 4096:
            return (lit_type | (1 << 2) | (regen << 4)).to_bytes(2, "little")
        return (lit_type | (3 << 2) | (regen << 4)).to_bytes(3, "little")
    if streams == 1:
        if regen > 1023 or comp > 1023:
            raise ValueError("1-stream literals exceed 10-bit sizes")
        return (lit_type | (0 << 2) | (regen << 4) | (comp << 14)).to_bytes(
            3, "little"
        )
    if regen <= 1023 and comp <= 1023:
        return (lit_type | (1 << 2) | (regen << 4) | (comp << 14)).to_bytes(
            3, "little"
        )
    if regen <= 0x3FFF and comp <= 0x3FFF:
        return (lit_type | (2 << 2) | (regen << 4) | (comp << 18)).to_bytes(
            4, "little"
        )
    return (lit_type | (3 << 2) | (regen << 4) | (comp << 22)).to_bytes(5, "little")


def _encode_literals(
    lits: bytes,
    enc_state: dict,
    mode: str,
    four_streams: bool | None,
    fse_weights: bool,
    reuse_huffman: bool,
) -> bytes:
    regen = len(lits)
    if mode == "raw" or regen == 0:
        return _lit_header(0, regen, None, 0) + lits
    if len(set(lits)) == 1:
        return _lit_header(1, regen, None, 0) + lits[:1]
    if mode == "rle":
        raise ValueError("rle literals requested but bytes differ")
    if mode not in ("auto", "huffman"):
        raise ValueError(f"unknown literals mode {mode!r}")
    try:
        if reuse_huffman and enc_state.get("codes"):
            lit_type = 3
            desc = b""
            codes = enc_state["codes"]
            if any(b not in codes for b in set(lits)):
                raise ValueError("previous table lacks symbols")
        else:
            lit_type = 2
            weights = _huffman_weights_for(lits)
            desc = _write_huffman_desc(weights, fse_weights)
            table = _HufTable(_resolve_weights(weights[:-1]))
            codes = table.codes()
    except ValueError:
        return _lit_header(0, regen, None, 0) + lits
    four = four_streams if four_streams is not None else regen >= 256
    if four and regen >= 16:
        part = (regen + 3) // 4
        chunks = [lits[0:part], lits[part : 2 * part],
                  lits[2 * part : 3 * part], lits[3 * part :]]
        streams = [_huf_encode_stream(codes, c) for c in chunks]
        if any(len(s) > 0xFFFF for s in streams[:3]):
            return _lit_header(0, regen, None, 0) + lits
        jump = b"".join(len(s).to_bytes(2, "little") for s in streams[:3])
        payload = desc + jump + b"".join(streams)
        body = _lit_header(lit_type, regen, len(payload), 4) + payload
    else:
        stream = _huf_encode_stream(codes, lits)
        payload = desc + stream
        if regen > 1023 or len(payload) > 1023:
            return _lit_header(0, regen, None, 0) + lits
        body = _lit_header(lit_type, regen, len(payload), 1) + payload
    if len(body) >= regen + 3:  # not paying for itself
        return _lit_header(0, regen, None, 0) + lits
    if lit_type == 2:
        # only a TRANSMITTED table may be reused: a raw fallback above
        # must not leave stale codes behind (the decoder's Treeless ctx
        # tracks tables it actually saw)
        enc_state["codes"] = codes
    return body


def zstd_compress(
    data: bytes,
    *,
    block_size: int = _BLOCK_MAX,
    checksum: bool = True,
    use_sequences: bool = True,
    literals: str = "auto",
    four_streams: bool | None = None,
    fse_weights: bool = False,
    fse_sequences: bool = False,
    reuse_huffman: bool = False,
    use_rep1: bool = True,
) -> bytes:
    """Emit one spec-conforming zstd frame.  The mode knobs force
    specific literals/sequences paths so tests can round-trip each
    decoder branch; defaults pick reasonable forms automatically."""
    data = bytes(data)
    n = len(data)
    block_size = min(block_size, _BLOCK_MAX, max(n, 1))
    out = bytearray()
    out += _MAGIC.to_bytes(4, "little")
    # single-segment frame, smallest sufficient FCS field
    if n < 256:
        fcs_code, fcs_bytes = 0, 1
        fcs_val = n
    elif n <= 65535 + 256:
        fcs_code, fcs_bytes = 1, 2
        fcs_val = n - 256
    else:
        fcs_code, fcs_bytes = 2, 4
        fcs_val = n
    out.append((fcs_code << 6) | (1 << 5) | ((1 if checksum else 0) << 2))
    out += fcs_val.to_bytes(fcs_bytes, "little")
    enc_state: dict = {}
    reps = [1, 4, 8]
    offsets = range(0, n, block_size) if n else [0]
    blocks = [data[o : o + block_size] for o in offsets] if n else [b""]
    for bi, chunk in enumerate(blocks):
        last = 1 if bi == len(blocks) - 1 else 0
        if chunk and len(set(chunk)) == 1:
            out += ((len(chunk) << 3) | (1 << 1) | last).to_bytes(3, "little")
            out += chunk[:1]
            continue
        payload = None
        if chunk:
            reps_try = list(reps)
            if use_sequences:
                lits, seqs = _greedy_sequences(chunk)
            else:
                lits, seqs = chunk, []
            try:
                lit_sec = _encode_literals(
                    lits, enc_state, literals, four_streams,
                    fse_weights, reuse_huffman,
                )
                seq_sec = _encode_sequences(
                    seqs, reps_try, fse_sequences, use_rep1
                )
                cand = lit_sec + seq_sec
                if len(cand) < len(chunk) and len(cand) <= _BLOCK_MAX:
                    payload = cand
            except ValueError:
                payload = None
        if payload is None:
            out += ((len(chunk) << 3) | (0 << 1) | last).to_bytes(3, "little")
            out += chunk
        else:
            reps[:] = reps_try
            out += ((len(payload) << 3) | (2 << 1) | last).to_bytes(3, "little")
            out += payload
    if checksum:
        out += (xxh64(data) & 0xFFFFFFFF).to_bytes(4, "little")
    return bytes(out)
