"""Pure-python LZ4 block codec + xxHash64 (ROOT kLZ4 basket frames).

Modern CMS NanoAOD defaults to kLZ4 compression (the reference reads such
files through uproot, /root/reference/run_stage1.py:153-166).  Neither
lz4 nor xxhash ships in this image, so — following the rootio precedent
of implementing PUBLIC on-disk formats from their specs — this module
implements:

- the LZ4 *block* format (https://github.com/lz4/lz4/blob/dev/doc/
  lz4_Block_format.md): token byte (literal-length high nibble,
  match-length-minus-4 low nibble, 15 => 255-terminated extension
  bytes), literals, 2-byte little-endian match offset (1..65535).
  Encoder invariants per spec: minimum match 4; the last 5 bytes are
  always literals; the last match starts at least 12 bytes before the
  block end.
- xxHash64 (https://github.com/Cyan4973/xxHash/blob/dev/doc/
  xxhash_spec.md): ROOT's kLZ4 frame carries the block's XXH64 in
  canonical (big-endian) form between the 9-byte frame header and the
  block (core/zip/src/ZipLZ4.cxx layout; the compressed-size field
  counts those 8 checksum bytes).

The encoder is a greedy single-pass hash-chain-free matcher (one dict of
4-byte prefixes) — deterministic output, valid LZ4, compression ratio a
bit under the reference encoder's.  Both directions are Python loops:
correct and fast enough for test fixtures and templates; a production
deployment reading terabytes of kLZ4 baskets would swap in the `lz4`
wheel at the same seam (rootio dispatches per-frame, so only
`lz4_block_compress`/`lz4_block_decompress` would change).
"""

from __future__ import annotations

_M64 = (1 << 64) - 1
_P1 = 11400714785074694791
_P2 = 14029467366897019727
_P3 = 1609587929392839161
_P4 = 9650029242287828579
_P5 = 2870177450012600261

_MINMATCH = 4
_MFLIMIT = 12  # last match must start >= 12 bytes before block end
_LASTLITERALS = 5  # last 5 bytes are always literals
_MAX_OFFSET = 0xFFFF


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _round(acc: int, lane: int) -> int:
    return (_rotl((acc + lane * _P2) & _M64, 31) * _P1) & _M64


def xxh64(data: bytes, seed: int = 0) -> int:
    """xxHash64 of ``data`` — the checksum ROOT stores in kLZ4 frames.
    Spec-faithful (stripe rounds, merge rounds, tail, avalanche); lanes
    read little-endian, result is a 64-bit unsigned int."""
    data = bytes(data)
    n = len(data)
    pos = 0
    if n >= 32:
        a1 = (seed + _P1 + _P2) & _M64
        a2 = (seed + _P2) & _M64
        a3 = seed & _M64
        a4 = (seed - _P1) & _M64
        while pos + 32 <= n:
            a1 = _round(a1, int.from_bytes(data[pos : pos + 8], "little"))
            a2 = _round(a2, int.from_bytes(data[pos + 8 : pos + 16], "little"))
            a3 = _round(a3, int.from_bytes(data[pos + 16 : pos + 24], "little"))
            a4 = _round(a4, int.from_bytes(data[pos + 24 : pos + 32], "little"))
            pos += 32
        h = (_rotl(a1, 1) + _rotl(a2, 7) + _rotl(a3, 12) + _rotl(a4, 18)) & _M64
        for acc in (a1, a2, a3, a4):
            h = ((h ^ _round(0, acc)) * _P1 + _P4) & _M64
    else:
        h = (seed + _P5) & _M64
    h = (h + n) & _M64
    while pos + 8 <= n:
        lane = int.from_bytes(data[pos : pos + 8], "little")
        h = (_rotl(h ^ _round(0, lane), 27) * _P1 + _P4) & _M64
        pos += 8
    if pos + 4 <= n:
        lane = int.from_bytes(data[pos : pos + 4], "little")
        h = (_rotl(h ^ (lane * _P1) & _M64, 23) * _P2 + _P3) & _M64
        pos += 4
    while pos < n:
        h = (_rotl(h ^ (data[pos] * _P5) & _M64, 11) * _P1) & _M64
        pos += 1
    h ^= h >> 33
    h = (h * _P2) & _M64
    h ^= h >> 29
    h = (h * _P3) & _M64
    h ^= h >> 32
    return h


def _emit_length_ext(out: bytearray, rem: int) -> None:
    while rem >= 255:
        out.append(255)
        rem -= 255
    out.append(rem)


_HASH_LOG = 16  # 64K-slot table — bounded memory at any payload size


def _hash4(v: int) -> int:
    """Fibonacci hash of a 4-byte little-endian prefix into the fixed
    table (the reference encoder's 2654435761 multiplier)."""
    return ((v * 2654435761) & 0xFFFFFFFF) >> (32 - _HASH_LOG)


def lz4_block_compress(src: bytes) -> bytes:
    """Greedy LZ4 block encoder: fixed 64K-slot position table keyed by
    a 32-bit hash of the 4-byte prefix (bounded memory even for a
    near-incompressible chunk at the 0xffffff kMAXZIPBUF ceiling — the
    r10 ADVICE item; candidates are verified against the source so hash
    collisions cost a missed match, never a wrong one), matches extended
    byte-wise, spec end-of-block invariants enforced (the last
    _LASTLITERALS bytes stay literals; no match starts within the last
    _MFLIMIT bytes).  Output always decodes to ``src`` via
    lz4_block_decompress AND any spec-conforming decoder."""
    src = bytes(src)
    n = len(src)
    out = bytearray()
    if n == 0:
        # a single token byte with zero literals decodes to b""
        out.append(0)
        return bytes(out)
    table = [-1] * (1 << _HASH_LOG)
    anchor = 0
    i = 0
    match_limit = n - _MFLIMIT
    end_limit = n - _LASTLITERALS
    while i <= match_limit and i + _MINMATCH <= n:
        key = src[i : i + _MINMATCH]
        h = _hash4(int.from_bytes(key, "little"))
        cand = table[h]
        table[h] = i
        if (
            cand < 0
            or i - cand > _MAX_OFFSET
            or src[cand : cand + _MINMATCH] != key
        ):
            i += 1
            continue
        # extend the 4-byte seed match forward (never into the tail
        # literals region)
        m, c = i + _MINMATCH, cand + _MINMATCH
        while m < end_limit and src[m] == src[c]:
            m += 1
            c += 1
        mlen = m - i
        litlen = i - anchor
        ml = mlen - _MINMATCH
        out.append((min(litlen, 15) << 4) | min(ml, 15))
        if litlen >= 15:
            _emit_length_ext(out, litlen - 15)
        out += src[anchor:i]
        offset = i - cand
        out.append(offset & 0xFF)
        out.append(offset >> 8)
        if ml >= 15:
            _emit_length_ext(out, ml - 15)
        # index the match body sparsely so runs still find themselves
        for j in range(i + 1, m, _MINMATCH):
            if j + _MINMATCH <= n:
                table[_hash4(int.from_bytes(src[j : j + _MINMATCH], "little"))] = j
        i = m
        anchor = m
    # final sequence: literals only (spec: a block ends with literals)
    litlen = n - anchor
    out.append(min(litlen, 15) << 4)
    if litlen >= 15:
        _emit_length_ext(out, litlen - 15)
    out += src[anchor:]
    return bytes(out)


def lz4_block_decompress(src: bytes, usize: int) -> bytes:
    """Decode one LZ4 block to exactly ``usize`` bytes.  Malformed input
    (truncated sequences, zero/out-of-window offsets, wrong decoded
    size) raises ValueError — the rootio parser contract."""
    src = bytes(src)
    n = len(src)
    out = bytearray()
    pos = 0
    while pos < n:
        token = src[pos]
        pos += 1
        lit = token >> 4
        if lit == 15:
            while True:
                if pos >= n:
                    raise ValueError("LZ4 block: truncated literal length")
                b = src[pos]
                pos += 1
                lit += b
                if b != 255:
                    break
        if pos + lit > n:
            raise ValueError("LZ4 block: truncated literals")
        out += src[pos : pos + lit]
        pos += lit
        if pos == n:
            break  # last sequence carries no match
        if pos + 2 > n:
            raise ValueError("LZ4 block: truncated match offset")
        offset = src[pos] | (src[pos + 1] << 8)
        pos += 2
        if offset == 0 or offset > len(out):
            raise ValueError("LZ4 block: match offset outside window")
        mlen = token & 15
        if mlen == 15:
            while True:
                if pos >= n:
                    raise ValueError("LZ4 block: truncated match length")
                b = src[pos]
                pos += 1
                mlen += b
                if b != 255:
                    break
        mlen += _MINMATCH
        start = len(out) - offset
        if offset >= mlen:
            out += out[start : start + mlen]
        else:
            # overlapping match: the copy is periodic with period=offset
            pattern = bytes(out[start:])
            q, r = divmod(mlen, offset)
            out += pattern * q + pattern[:r]
    if len(out) != usize:
        raise ValueError(
            f"LZ4 block decoded to {len(out)} bytes, frame declares {usize}"
        )
    return bytes(out)
