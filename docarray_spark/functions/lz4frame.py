"""Pure-python LZ4 **frame** codec (public specs: LZ4 Frame Format v1.6.0
and the LZ4 block format; xxHash32 from the published xxHash algorithm).

Why it exists: the reference's wire codec accepts ``compress='lz4'``
(``helper.py:compress_bytes`` via the ``lz4.frame`` package), which is not
installed in this environment. This module implements the FRAME format
from the spec so ``docs_to_bytes(compress='lz4')`` emits frames any
standard LZ4 reader decodes, and reads frames the reference wrote:

* **decompress** handles both compressed and uncompressed (stored) data
  blocks, optional content-size field, dict-id, block checksums, and
  verifies the header checksum; a full LZ4 *block* sequence decoder
  (token / extended lengths / offset+match copy with overlap) is included.
  Both block-independence modes are decoded: FLG bit 5 set → standalone
  blocks; clear (``lz4.frame``'s ``block_linked=True`` default) → each
  block is decoded against the previous 64 KB of output as history.
* **compress** emits spec-conformant frames with STORED blocks (the high
  bit of the block-size word marks uncompressed data — legal LZ4, chosen
  over a python match-finder: the per-doc frames this codec carries are
  small and the interop property, not the ratio, is the point; callers
  wanting ratio use gzip/zlib).

No import of any lz4 package anywhere — if one is present it is simply
not needed.
"""

from __future__ import annotations

import struct

_MAGIC = 0x184D2204
_MAX_BLOCK = 4 * 1024 * 1024  # BD block-max-size code 7


# ------------------------------------------------------------- xxHash32

_P1, _P2, _P3, _P4, _P5 = (
    2654435761, 2246822519, 3266489917, 668265263, 374761393,
)
_M32 = 0xFFFFFFFF


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _M32


def xxhash32(data: bytes, seed: int = 0) -> int:
    """xxHash32 (published algorithm) — the frame header checksum hash."""
    n = len(data)
    pos = 0
    if n >= 16:
        v1 = (seed + _P1 + _P2) & _M32
        v2 = (seed + _P2) & _M32
        v3 = seed & _M32
        v4 = (seed - _P1) & _M32
        while pos + 16 <= n:
            a, b, c, d = struct.unpack_from("<4I", data, pos)
            v1 = (_rotl((v1 + a * _P2) & _M32, 13) * _P1) & _M32
            v2 = (_rotl((v2 + b * _P2) & _M32, 13) * _P1) & _M32
            v3 = (_rotl((v3 + c * _P2) & _M32, 13) * _P1) & _M32
            v4 = (_rotl((v4 + d * _P2) & _M32, 13) * _P1) & _M32
            pos += 16
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M32
    else:
        h = (seed + _P5) & _M32
    h = (h + n) & _M32
    while pos + 4 <= n:
        (k,) = struct.unpack_from("<I", data, pos)
        h = (_rotl((h + k * _P3) & _M32, 17) * _P4) & _M32
        pos += 4
    while pos < n:
        h = (_rotl((h + data[pos] * _P5) & _M32, 11) * _P1) & _M32
        pos += 1
    h ^= h >> 15
    h = (h * _P2) & _M32
    h ^= h >> 13
    h = (h * _P3) & _M32
    h ^= h >> 16
    return h


# ------------------------------------------------------- LZ4 block decode


def lz4_block_decompress(src: bytes, history: bytes = b"") -> bytes:
    """LZ4 block-format sequence decoder (token, extended literal/match
    lengths, 2-byte little-endian offset, byte-wise overlap copy).

    ``history`` is the decoded prefix a *linked* block may reference
    (frame FLG bit 5 clear → each block can match into the previous 64 KB
    of decoded output).  Only the newly decoded bytes are returned.
    """
    out = bytearray(history)
    base = len(out)
    pos, n = 0, len(src)
    while pos < n:
        token = src[pos]
        pos += 1
        lit_len = token >> 4
        if lit_len == 15:
            while True:
                b = src[pos]
                pos += 1
                lit_len += b
                if b != 255:
                    break
        out += src[pos : pos + lit_len]
        pos += lit_len
        if pos >= n:
            break  # last sequence has literals only
        offset = src[pos] | (src[pos + 1] << 8)
        pos += 2
        if offset == 0:
            raise ValueError("corrupt LZ4 block: zero offset")
        match_len = (token & 0x0F) + 4
        if (token & 0x0F) == 15:
            while True:
                b = src[pos]
                pos += 1
                match_len += b
                if b != 255:
                    break
        start = len(out) - offset
        if start < 0:
            raise ValueError("corrupt LZ4 block: offset before start")
        for i in range(match_len):  # byte-wise: overlap copies are the norm
            out.append(out[start + i])
    return bytes(out[base:])


# ---------------------------------------------------------- frame codec


def compress(data: bytes) -> bytes:
    """``lz4.frame.compress``-compatible frame with STORED blocks."""
    flg = 0x60  # version 01, block-independent; no checksums/size/dict
    bd = 0x70   # block max size 4 MB
    desc = bytes([flg, bd])
    hc = (xxhash32(desc) >> 8) & 0xFF
    out = bytearray(struct.pack("<I", _MAGIC) + desc + bytes([hc]))
    for i in range(0, len(data), _MAX_BLOCK):
        chunk = data[i : i + _MAX_BLOCK]
        out += struct.pack("<I", len(chunk) | 0x80000000)  # stored block
        out += chunk
    out += struct.pack("<I", 0)  # end mark
    return bytes(out)


def decompress(data: bytes) -> bytes:
    """Decode an LZ4 frame (compressed or stored blocks, optional
    content-size/dict-id/block-checksum fields; header checksum verified)."""
    if len(data) < 7:
        raise ValueError("truncated LZ4 frame")
    (magic,) = struct.unpack_from("<I", data, 0)
    if magic != _MAGIC:
        raise ValueError(f"not an LZ4 frame (magic {magic:#x})")
    flg, bd = data[4], data[5]
    if (flg >> 6) != 0b01:
        raise ValueError("unsupported LZ4 frame version")
    has_content_size = bool(flg & 0x08)
    has_content_checksum = bool(flg & 0x04)
    has_block_checksum = bool(flg & 0x10)
    has_dict_id = bool(flg & 0x01)
    pos = 6
    if has_content_size:
        pos += 8
    if has_dict_id:
        pos += 4
    hc = data[pos]
    if hc != ((xxhash32(data[4:pos]) >> 8) & 0xFF):
        raise ValueError("LZ4 frame header checksum mismatch")
    pos += 1
    # FLG bit 5 clear → *linked* blocks: every block may copy matches from
    # the previous 64 KB of decoded output, not just its own.  lz4.frame
    # writers (the reference's helper.py compress_bytes among them) default
    # to block_linked=True, so multi-block frames require this path.
    block_independent = bool(flg & 0x20)
    out = bytearray()
    while True:
        (word,) = struct.unpack_from("<I", data, pos)
        pos += 4
        if word == 0:
            break  # end mark
        stored = bool(word & 0x80000000)
        size = word & 0x7FFFFFFF
        block = data[pos : pos + size]
        pos += size
        if has_block_checksum:
            pos += 4  # present per-block; integrity is the content's job
        if stored:
            out += block
        else:
            hist = b"" if block_independent else bytes(out[-65536:])
            out += lz4_block_decompress(block, hist)
    if has_content_checksum:
        (want,) = struct.unpack_from("<I", data, pos)
        if xxhash32(bytes(out)) != want:
            raise ValueError("LZ4 content checksum mismatch")
    return bytes(out)
