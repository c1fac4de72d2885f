"""Pure-numpy WebP LOSSLESS (VP8L) decode — no imaging library.

Closes the web image format triangle the same way PNG and baseline +
progressive JPEG were closed (see operators/jpeg.py): from the public
spec, stdlib + numpy only. WebP lossless is the format Common-Crawl-style
pipelines meet for screenshots/diagrams/UI assets. For lossy VP8 the
boolean coder (RFC 6386 §7) and the complete prob-128 keyframe frame
header (§9.2–9.7: segmentation, loop filter, partitions, quantizers) are
implemented — ``parse_vp8_frame_header`` / ``vp8_header_info`` — which is
the exact boundary the spec defines without its large constant tables;
pixel decode past that point stays a typed NotImplementedError, as do
animation and the separate ALPH chunk.

Implemented (VP8L bitstream spec, developers.google.com/speed/webp/docs/
webp_lossless_bitstream_specification — public):

* RIFF/WEBP container walk (VP8L direct or inside VP8X extended files)
* LSB-first bit reading; canonical prefix codes (deflate-style canonical
  assignment, codes read MSB-of-code-first), both the "simple" (1-2
  symbol) and normal (code-length-coded, with 16/17/18 repeats) forms
* color cache (0x1e35a7bd multiplicative hash)
* meta prefix codes (entropy image selecting per-tile code groups)
* LZ77 backward references: length/distance extra-bit prefix values and
  the 120-entry distance-to-neighborhood plane-code map
* all four transforms, inverse-applied in reverse order: PREDICTOR (14
  modes, per-tile), COLOR (per-tile ColorTransformElement), SUBTRACT_GREEN,
  COLOR_INDEXING (delta-coded palette, sub-byte packed indices)

``encode_webp_lossless`` is the test/fixture twin (the decode path's
adversary in property tests): single prefix-code group, optional color
cache, literals + a greedy LZ77 for vertical/horizontal runs, and forward
implementations of SUBTRACT_GREEN, PREDICTOR (single tile), COLOR (single
tile), and COLOR_INDEXING (with sub-byte packing) so every inverse path is
round-trip tested. No real libwebp exists in this container, so conformance
beyond the spec text is untested (stated; the encoder/decoder pair is
self-consistent and follows the spec's published tables and formulas).

Contract: malformed or hostile payloads raise ValueError (or
NotImplementedError for out-of-profile features) — never other exception
types — matching decode_jpeg/decode_png (operators/jpeg.py:178).
"""

from __future__ import annotations

import struct

import numpy as np

# working-set budget class shared with _MAX_JPEG_PIXELS / _MAX_PNG_RAW_BYTES
_MAX_VP8L_PIXELS = 1 << 23

_HASH_MUL = 0x1E35A7BD

# code-length-code symbol order (spec 5.2.2)
_CL_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14,
             15]

# distance codes 1..120 -> (dy<<4 | (8 - dx)) neighborhood plane codes
# (spec 4.2.2 table, transcribed; dist = dy * xsize + dx, min 1)
_PLANE_CODES = [
    0x18, 0x07, 0x17, 0x19, 0x28, 0x06, 0x27, 0x29, 0x16, 0x1A,
    0x26, 0x2A, 0x38, 0x05, 0x37, 0x39, 0x15, 0x1B, 0x36, 0x3A,
    0x25, 0x2B, 0x48, 0x04, 0x47, 0x49, 0x14, 0x1C, 0x35, 0x3B,
    0x46, 0x4A, 0x24, 0x2C, 0x58, 0x45, 0x4B, 0x34, 0x3C, 0x03,
    0x57, 0x59, 0x13, 0x1D, 0x56, 0x5A, 0x23, 0x2D, 0x44, 0x4C,
    0x55, 0x5B, 0x33, 0x3D, 0x68, 0x02, 0x67, 0x69, 0x12, 0x1E,
    0x66, 0x6A, 0x22, 0x2E, 0x54, 0x5C, 0x43, 0x4D, 0x65, 0x6B,
    0x32, 0x3E, 0x78, 0x01, 0x77, 0x79, 0x53, 0x5D, 0x11, 0x1F,
    0x64, 0x6C, 0x42, 0x4E, 0x76, 0x7A, 0x21, 0x2F, 0x75, 0x7B,
    0x52, 0x5E, 0x31, 0x3F, 0x88, 0x00, 0x74, 0x7C, 0x87, 0x89,
    0x63, 0x6D, 0x86, 0x8A, 0x41, 0x4F, 0x85, 0x8B, 0x51, 0x5F,
    0x84, 0x8C, 0x62, 0x6E, 0x40, 0x83, 0x8D, 0x73, 0x7D, 0x30,
]


class _LsbReader:
    """LSB-first bit reader (VP8L bit order)."""

    __slots__ = ("data", "pos", "bit")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bit = 0

    def read(self, n: int) -> int:
        v = 0
        for i in range(n):
            if self.pos >= len(self.data):
                raise ValueError("truncated VP8L bitstream")
            v |= ((self.data[self.pos] >> self.bit) & 1) << i
            self.bit += 1
            if self.bit == 8:
                self.bit = 0
                self.pos += 1
        return v


class _LsbWriter:
    __slots__ = ("out", "acc", "nbits")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int):
        self.acc |= (value & ((1 << n) - 1)) << self.nbits
        self.nbits += n
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def flush(self):
        if self.nbits:
            self.out.append(self.acc & 0xFF)
            self.acc = 0
            self.nbits = 0


# ---------------------------------------------------------------------------
# canonical prefix codes (deflate-style; codes read MSB-of-code first)
# ---------------------------------------------------------------------------


def _canonical_codes(lengths: list[int]) -> dict[int, int]:
    """symbol -> code for nonzero lengths (RFC1951 canonical assignment)."""
    max_len = max(lengths, default=0)
    bl_count = [0] * (max_len + 1)
    for ln in lengths:
        if ln:
            bl_count[ln] += 1
    code = 0
    next_code = [0] * (max_len + 2)
    for bits in range(1, max_len + 1):
        code = (code + bl_count[bits - 1]) << 1
        next_code[bits] = code
    out = {}
    for sym, ln in enumerate(lengths):
        if ln:
            out[sym] = next_code[ln]
            next_code[ln] += 1
    return out


class _PrefixCode:
    """Decode table: bit-serial (length, code) -> symbol, or a 0/1-bit
    "simple" code."""

    __slots__ = ("table", "single")

    def __init__(self, lengths: list[int]):
        nonzero = [(s, ln) for s, ln in enumerate(lengths) if ln]
        if len(nonzero) == 0:
            raise ValueError("empty VP8L prefix code")
        if len(nonzero) == 1:
            self.single = nonzero[0][0]
            self.table = None
            return
        self.single = None
        codes = _canonical_codes(lengths)
        self.table = {
            (lengths[s], codes[s]): s for s, _ in nonzero
        }

    @classmethod
    def simple(cls, symbols: list[int]):
        pc = cls.__new__(cls)
        if len(symbols) == 1:
            pc.single = symbols[0]
            pc.table = None
        else:
            pc.single = None
            pc.table = {(1, 0): symbols[0], (1, 1): symbols[1]}
        return pc

    def decode(self, br: _LsbReader) -> int:
        if self.single is not None:
            return self.single
        code = 0
        for length in range(1, 16):
            code = (code << 1) | br.read(1)
            sym = self.table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid VP8L prefix code")


def _read_prefix_code(br: _LsbReader, alphabet_size: int) -> _PrefixCode:
    if br.read(1):  # simple code
        num_symbols = br.read(1) + 1
        if br.read(1):
            first = br.read(8)
        else:
            first = br.read(1)
        syms = [first]
        if num_symbols == 2:
            syms.append(br.read(8))
        for s in syms:
            if s >= alphabet_size:
                raise ValueError("VP8L simple-code symbol out of range")
        return _PrefixCode.simple(syms)
    # normal: code-length code, then code lengths with repeats
    num_cl = 4 + br.read(4)
    cl_lengths = [0] * 19
    for i in range(num_cl):
        cl_lengths[_CL_ORDER[i]] = br.read(3)
    cl_code = _PrefixCode(cl_lengths)
    if br.read(1):  # limited number of coded symbols
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths = [0] * alphabet_size
    prev_len = 8
    symbol = 0
    while symbol < alphabet_size:
        if max_symbol <= 0:
            break
        max_symbol -= 1
        cl = cl_code.decode(br)
        if cl < 16:
            lengths[symbol] = cl
            symbol += 1
            if cl:
                prev_len = cl
        elif cl == 16:
            rep = 3 + br.read(2)
            for _ in range(rep):
                if symbol >= alphabet_size:
                    raise ValueError("VP8L code-length repeat overflow")
                lengths[symbol] = prev_len
                symbol += 1
        elif cl == 17:
            symbol += 3 + br.read(3)
        elif cl == 18:
            symbol += 11 + br.read(7)
        else:
            raise ValueError("invalid VP8L code-length symbol")
    if symbol > alphabet_size:
        raise ValueError("VP8L code-length overflow")
    return _PrefixCode(lengths)


def _prefix_value(code: int, br: _LsbReader) -> int:
    """Length/distance prefix value decode (spec 4.2.1)."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.read(extra) + 1


def _prefix_encode_value(v: int) -> tuple[int, int, int]:
    """value -> (prefix_code, extra_bits_value, extra_bits_count)."""
    if v <= 4:
        return v - 1, 0, 0
    v -= 1
    hi = v.bit_length() - 1
    extra = hi - 1
    code = 2 * hi + ((v >> extra) & 1)
    return code, v & ((1 << extra) - 1), extra


# ---------------------------------------------------------------------------
# entropy-coded ARGB image
# ---------------------------------------------------------------------------


def _decode_image(br: _LsbReader, xsize: int, ysize: int,
                  top_level: bool = False) -> np.ndarray:
    """One VP8L entropy-coded image -> (ysize*xsize,) uint32 ARGB."""
    cache_bits = 0
    if br.read(1):
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError("invalid VP8L color-cache size")
    cache_size = (1 << cache_bits) if cache_bits else 0
    meta = None
    meta_bits = 0
    num_groups = 1
    if top_level and br.read(1):  # meta prefix codes
        meta_bits = br.read(3) + 2
        mw = -(-xsize // (1 << meta_bits))
        mh = -(-ysize // (1 << meta_bits))
        meta_img = _decode_image(br, mw, mh)
        # group index = (red << 8) | green
        meta = (((meta_img >> 16) & 0xFF) << 8) | ((meta_img >> 8) & 0xFF)
        meta = meta.astype(np.int64).reshape(mh, mw)
        num_groups = int(meta.max()) + 1
    green_size = 256 + 24 + cache_size
    groups = []
    for _ in range(num_groups):
        groups.append((
            _read_prefix_code(br, green_size),   # green+length+cache
            _read_prefix_code(br, 256),          # red
            _read_prefix_code(br, 256),          # blue
            _read_prefix_code(br, 256),          # alpha
            _read_prefix_code(br, 40),           # distance
        ))
    n = xsize * ysize
    out = np.zeros(n, dtype=np.uint32)
    cache = [0] * cache_size
    pos = 0
    while pos < n:
        if meta is not None:
            y, x = divmod(pos, xsize)
            g = groups[int(meta[y >> meta_bits, x >> meta_bits])]
        else:
            g = groups[0]
        s = g[0].decode(br)
        if s < 256:  # literal
            red = g[1].decode(br)
            blue = g[2].decode(br)
            alpha = g[3].decode(br)
            px = (alpha << 24) | (red << 16) | (s << 8) | blue
            out[pos] = px
            if cache_size:
                cache[((_HASH_MUL * px) & 0xFFFFFFFF) >> (32 - cache_bits)] \
                    = px
            pos += 1
        elif s < 256 + 24:  # backward reference
            length = _prefix_value(s - 256, br)
            dist_code = _prefix_value(g[4].decode(br), br)
            if dist_code <= 120:
                b = _PLANE_CODES[dist_code - 1]
                dy = b >> 4
                dx = 8 - (b & 0xF)
                dist = dy * xsize + dx
                if dist < 1:
                    dist = 1
            else:
                dist = dist_code - 120
            if dist > pos or pos + length > n:
                raise ValueError("VP8L backward reference out of range")
            for i in range(length):  # overlap-safe byte-by-byte copy
                px = int(out[pos - dist + i])
                out[pos + i] = px
                if cache_size:
                    cache[((_HASH_MUL * px) & 0xFFFFFFFF)
                          >> (32 - cache_bits)] = px
            pos += length
        else:  # color cache
            idx = s - 256 - 24
            if idx >= cache_size:
                raise ValueError("VP8L cache index out of range")
            out[pos] = cache[idx]
            pos += 1
    return out


# ---------------------------------------------------------------------------
# inverse transforms
# ---------------------------------------------------------------------------


def _argb_planes(img: np.ndarray):
    return ((img >> 24) & 0xFF, (img >> 16) & 0xFF, (img >> 8) & 0xFF,
            img & 0xFF)


def _pack_argb(a, r, g, b):
    return ((a.astype(np.uint32) << 24) | (r.astype(np.uint32) << 16)
            | (g.astype(np.uint32) << 8) | b.astype(np.uint32))


def _inv_subtract_green(img: np.ndarray) -> np.ndarray:
    a, r, g, b = _argb_planes(img)
    return _pack_argb(a, (r + g) & 0xFF, g, (b + g) & 0xFF)


def _ct_delta(t: np.ndarray | int, c: np.ndarray | int):
    """ColorTransformDelta: (int8(t) * int8(c)) >> 5 (arithmetic)."""
    ts = np.asarray(t, dtype=np.uint8).astype(np.int8).astype(np.int64)
    cs = np.asarray(c, dtype=np.uint8).astype(np.int8).astype(np.int64)
    return (ts * cs) >> 5


def _inv_color_transform(img, tiles, bits, w, h):
    px = img.reshape(h, w)
    yy, xx = np.mgrid[0:h, 0:w]
    t = tiles.reshape(-1)[
        (yy >> bits) * tiles.shape[1] + (xx >> bits)
    ]
    # ColorTransformElement is stored as a pixel whose BLUE byte is
    # green_to_red, GREEN byte green_to_blue, RED byte red_to_blue
    # (spec 4.2.3; libwebp reads cte.green_to_red = argb & 0xff)
    g2r = t & 0xFF           # blue byte: green_to_red
    g2b = (t >> 8) & 0xFF    # green byte: green_to_blue
    r2b = (t >> 16) & 0xFF   # red byte: red_to_blue
    a, r, g, b = _argb_planes(px)
    r = (r + _ct_delta(g2r, g)) & 0xFF
    b = (b + _ct_delta(g2b, g) + _ct_delta(r2b, r)) & 0xFF
    return _pack_argb(a, r, g, b).reshape(-1)


def _avg2(a, b):
    return (a + b) // 2


def _clamp(v):
    return max(0, min(255, v))


def _predict(mode, L, T, TL, TR):
    """One predictor (spec 4.2.2 modes 0-13), per-channel on ARGB tuples."""
    if mode == 0:
        return (0xFF, 0, 0, 0)
    if mode == 1:
        return L
    if mode == 2:
        return T
    if mode == 3:
        return TR
    if mode == 4:
        return TL
    if mode == 5:
        return tuple(_avg2(_avg2(lc, trc), tc)
                     for lc, tc, trc in zip(L, T, TR))
    if mode == 6:
        return tuple(_avg2(lc, tlc) for lc, tlc in zip(L, TL))
    if mode == 7:
        return tuple(_avg2(lc, tc) for lc, tc in zip(L, T))
    if mode == 8:
        return tuple(_avg2(tlc, tc) for tlc, tc in zip(TL, T))
    if mode == 9:
        return tuple(_avg2(tc, trc) for tc, trc in zip(T, TR))
    if mode == 10:
        return tuple(_avg2(_avg2(lc, tlc), _avg2(tc, trc))
                     for lc, tlc, tc, trc in zip(L, TL, T, TR))
    if mode == 11:  # Select
        p_l = sum(abs(tc - tlc) for tc, tlc in zip(T, TL))
        p_t = sum(abs(lc - tlc) for lc, tlc in zip(L, TL))
        return L if p_l < p_t else T
    if mode == 12:  # ClampAddSubtractFull
        return tuple(_clamp(lc + tc - tlc)
                     for lc, tc, tlc in zip(L, T, TL))
    if mode == 13:  # ClampAddSubtractHalf
        return tuple(
            _clamp(ave + (ave - tlc) // 2)
            for ave, tlc in ((_avg2(lc, tc), tlc)
                             for lc, tc, tlc in zip(L, T, TL))
        )
    raise ValueError(f"invalid VP8L predictor mode {mode}")


def _px_tuple(v: int):
    return ((v >> 24) & 0xFF, (v >> 16) & 0xFF, (v >> 8) & 0xFF, v & 0xFF)


def _inv_predictor(img, tiles, bits, w, h):
    out = img.astype(np.int64).reshape(h, w)
    tw = tiles.shape[1]
    tile_modes = (tiles >> 8) & 0xFF  # green channel holds the mode
    for y in range(h):
        for x in range(w):
            if x == 0 and y == 0:
                pred = (0xFF, 0, 0, 0)
            elif y == 0:
                pred = _px_tuple(int(out[0, x - 1]))  # top row: Left
            elif x == 0:
                pred = _px_tuple(int(out[y - 1, 0]))  # left column: Top
            else:
                mode = int(tile_modes[y >> bits, (x >> bits) % tw])
                L = _px_tuple(int(out[y, x - 1]))
                T = _px_tuple(int(out[y - 1, x]))
                TL = _px_tuple(int(out[y - 1, x - 1]))
                # top-right of the rightmost pixel: the decoded buffer is
                # contiguous, so top_row[w] is the CURRENT row's leftmost
                # pixel (already reconstructed) — libwebp's edge rule
                TR = _px_tuple(int(out[y - 1, x + 1] if x + 1 < w
                                   else out[y, 0]))
                pred = _predict(mode, L, T, TL, TR)
            res = _px_tuple(int(out[y, x]))
            out[y, x] = ((((res[0] + pred[0]) & 0xFF) << 24)
                         | (((res[1] + pred[1]) & 0xFF) << 16)
                         | (((res[2] + pred[2]) & 0xFF) << 8)
                         | ((res[3] + pred[3]) & 0xFF))
    return out.astype(np.uint32).reshape(-1)


def _inv_color_indexing(img, palette, width_bits, w, h):
    packed_w = -(-w // (1 << width_bits)) if width_bits else w
    green = ((img >> 8) & 0xFF).reshape(h, packed_w)
    if width_bits:
        per = 1 << width_bits          # pixels packed per green byte
        ibits = 8 >> width_bits        # bits per index
        idx = np.zeros((h, packed_w * per), dtype=np.int64)
        for i in range(per):
            idx[:, i::per] = (green >> (i * ibits)) & ((1 << ibits) - 1)
        idx = idx[:, :w]
    else:
        idx = green.astype(np.int64)
    if idx.max(initial=0) >= len(palette):
        raise ValueError("VP8L palette index out of range")
    return palette[idx.reshape(-1)]


# ---------------------------------------------------------------------------
# decoder entry
# ---------------------------------------------------------------------------


def vp8_keyframe_dims(body: bytes) -> tuple[int, int]:
    """Lossy VP8 ('VP8 ' chunk) keyframe dimensions from the UNCOMPRESSED
    part of the frame header (RFC 6386 §9.1): a 3-byte little-endian frame
    tag (bit 0 = interframe flag, bits 1-3 version, bit 4 show_frame, bits
    5-23 first-partition size), the 3-byte start code 9D 01 2A, then two
    16-bit LE fields carrying 14-bit width/height plus 2-bit upscale codes.
    No boolean decoding required.

    Full PIXEL decode is deliberately out of scope: it needs RFC 6386's
    large constant tables (default coefficient probabilities [4][8][3][11],
    keyframe b-mode probabilities [10][10][9], the 128-entry dc/ac
    quantizer lookups) which cannot be faithfully reproduced without the
    RFC text in hand — the same boundary as arithmetic JPEG's Qe table
    (operators/jpeg.py). Wrong tables would decode real files into silent
    garbage (exactly the twin-masked bug class fixed in the r6 VP8L
    transforms), so pixels stay a typed NotImplementedError while type +
    dimensions are now real."""
    if len(body) < 10:
        raise ValueError("truncated VP8 chunk")
    tag = body[0] | (body[1] << 8) | (body[2] << 16)
    if tag & 1:
        raise NotImplementedError(
            "VP8 interframe — only keyframe headers are parsed"
        )
    if body[3:6] != b"\x9d\x01\x2a":
        raise ValueError("bad VP8 keyframe start code")
    wv = body[6] | (body[7] << 8)
    hv = body[8] | (body[9] << 8)
    return wv & 0x3FFF, hv & 0x3FFF


class _BoolDecoder:
    """RFC 6386 §7.3 boolean (binary arithmetic) decoder — the entropy
    layer of every VP8 partition. State: an 8-bit ``range`` in [128, 255]
    and a 16-bit big-endian ``value`` window onto the stream; a split
    point ``1 + (((range-1)*prob) >> 8)`` partitions the interval and the
    chosen half is renormalized by doubling until range >= 128, pulling
    one stream byte per 8 doublings. This is the spec's own pseudo-code;
    nothing here depends on the large constant tables that keep full
    pixel decode out of scope."""

    def __init__(self, data: bytes):
        self._d = data
        self._pos = 2
        self.value = ((data[0] if len(data) > 0 else 0) << 8) | (
            data[1] if len(data) > 1 else 0
        )
        self.range = 255
        self._bits = 0

    def read_bool(self, prob: int = 128) -> int:
        split = 1 + (((self.range - 1) * prob) >> 8)
        big = split << 8
        if self.value >= big:
            ret = 1
            self.range -= split
            self.value -= big
        else:
            ret = 0
            self.range = split
        while self.range < 128:
            self.value <<= 1
            self.range <<= 1
            self._bits += 1
            if self._bits == 8:
                self._bits = 0
                if self._pos < len(self._d):
                    self.value |= self._d[self._pos]
                    self._pos += 1
        return ret

    def read_literal(self, n: int) -> int:
        """L(n): n prob-128 bools, MSB first (RFC 6386 §7.3)."""
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bool(128)
        return v

    def read_signed(self, n: int) -> int:
        """Magnitude L(n) then a sign bool (1 = negative)."""
        v = self.read_literal(n)
        return -v if self.read_bool(128) else v


class _BoolEncoder:
    """Fixture-twin encoder for :class:`_BoolDecoder`, carry-free by
    construction: ``low`` is an arbitrary-precision integer that doubles
    on every renormalization, so the output is simply the final ``low``
    left-padded to the emitted bit count — no windowed carry propagation
    to get wrong. Matching the decoder is provable rather than remembered:
    both sides use the identical split arithmetic, a 1-bit picks
    low += split (so the final stream value is >= the scaled split) and a
    0-bit sets range = split (so it stays strictly below), which is
    exactly the decoder's branch condition. Property-tested against the
    decoder on random (bit, prob) sequences."""

    def __init__(self):
        self.low = 0
        self.range = 255
        self.nbits = 0

    def write_bool(self, bit: int, prob: int = 128) -> None:
        split = 1 + (((self.range - 1) * prob) >> 8)
        if bit:
            self.low += split
            self.range -= split
        else:
            self.range = split
        while self.range < 128:
            self.low <<= 1
            self.range <<= 1
            self.nbits += 1

    def write_literal(self, v: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.write_bool((v >> i) & 1, 128)

    def write_signed(self, v: int, n: int) -> None:
        self.write_literal(abs(v), n)
        self.write_bool(1 if v < 0 else 0, 128)

    def finish(self) -> bytes:
        # decoder relation: stream as a (16 + nbits)-bit integer equals
        # low*2^8 + final_value, with 0 <= final_value < range*2^8 (the
        # 16-bit value window carries 8 more bits of resolution than the
        # 8-bit range; low itself can carry up to nbits+8 bits since
        # low + range <= 255*2^nbits). Choose final_value = 0 and pad
        # with zero bytes for the decoder's lazy byte pulls.
        total_bits = self.nbits + 16
        nbytes = (total_bits + 7) // 8
        out = (self.low << 8) << (nbytes * 8 - total_bits)
        return out.to_bytes(nbytes, "big") + b"\x00" * 4


def parse_vp8_frame_header(body: bytes) -> dict:
    """Parse a lossy-VP8 keyframe's full first-partition header (RFC 6386
    §9.2–9.7): everything boolean-coded at prob 128, which is the exact
    boundary of what the spec defines without its large constant tables —
    segmentation, loop-filter configuration, DCT partition count, all six
    quantizer fields, refresh_entropy_probs. Stops before the coefficient
    probability updates (those need the [4][8][3][11] default/update
    tables; see ``vp8_keyframe_dims`` for why they stay out of scope).

    Real metadata this yields for web WebP/VP8 payloads: the quantizer
    index (quality proxy), loop-filter strength, segmentation use, and
    token-partition count (decode parallelism)."""
    if len(body) < 10:
        raise ValueError("truncated VP8 chunk")
    tag = body[0] | (body[1] << 8) | (body[2] << 16)
    if tag & 1:
        raise NotImplementedError(
            "VP8 interframe — only keyframe headers are parsed"
        )
    version = (tag >> 1) & 7
    show_frame = (tag >> 4) & 1
    first_part_size = tag >> 5
    if body[3:6] != b"\x9d\x01\x2a":
        raise ValueError("bad VP8 keyframe start code")
    wv = body[6] | (body[7] << 8)
    hv = body[8] | (body[9] << 8)
    part = body[10:10 + first_part_size]
    if len(part) < first_part_size:
        raise ValueError("truncated VP8 first partition")
    bd = _BoolDecoder(part)
    hdr: dict = {
        "width": wv & 0x3FFF, "height": hv & 0x3FFF,
        "hscale": wv >> 14, "vscale": hv >> 14,
        "version": version, "show_frame": show_frame,
        "first_part_size": first_part_size,
        "color_space": bd.read_literal(1),
        "clamping_type": bd.read_literal(1),
    }
    hdr["segmentation_enabled"] = bd.read_literal(1)
    hdr["segment_quant_deltas"] = None
    hdr["segment_lf_deltas"] = None
    hdr["segment_abs_values"] = None
    if hdr["segmentation_enabled"]:
        update_map = bd.read_literal(1)
        update_data = bd.read_literal(1)
        if update_data:
            hdr["segment_abs_values"] = bd.read_literal(1)
            hdr["segment_quant_deltas"] = [
                bd.read_signed(7) if bd.read_literal(1) else 0
                for _ in range(4)
            ]
            hdr["segment_lf_deltas"] = [
                bd.read_signed(6) if bd.read_literal(1) else 0
                for _ in range(4)
            ]
        if update_map:
            # tree probs for the per-MB segment map; values only matter
            # for MB data, but they must be CONSUMED to stay in sync
            hdr["segment_tree_probs"] = [
                bd.read_literal(8) if bd.read_literal(1) else 255
                for _ in range(3)
            ]
    hdr["filter_type"] = bd.read_literal(1)
    hdr["filter_level"] = bd.read_literal(6)
    hdr["sharpness_level"] = bd.read_literal(3)
    hdr["lf_delta_enabled"] = bd.read_literal(1)
    hdr["ref_lf_deltas"] = None
    hdr["mode_lf_deltas"] = None
    if hdr["lf_delta_enabled"]:
        if bd.read_literal(1):  # mode_ref_lf_delta_update
            hdr["ref_lf_deltas"] = [
                bd.read_signed(6) if bd.read_literal(1) else 0
                for _ in range(4)
            ]
            hdr["mode_lf_deltas"] = [
                bd.read_signed(6) if bd.read_literal(1) else 0
                for _ in range(4)
            ]
    hdr["n_token_partitions"] = 1 << bd.read_literal(2)
    hdr["y_ac_qi"] = bd.read_literal(7)
    for name in ("y_dc_delta", "y2_dc_delta", "y2_ac_delta",
                 "uv_dc_delta", "uv_ac_delta"):
        hdr[name] = bd.read_signed(4) if bd.read_literal(1) else 0
    hdr["refresh_entropy_probs"] = bd.read_literal(1)
    return hdr


def build_vp8_keyframe(width: int, height: int, *, color_space: int = 0,
                       clamping_type: int = 0,
                       segment_quant_deltas: list[int] | None = None,
                       segment_lf_deltas: list[int] | None = None,
                       segment_abs_values: int = 0,
                       segment_tree_probs: list[int] | None = None,
                       filter_type: int = 0, filter_level: int = 0,
                       sharpness_level: int = 0,
                       ref_lf_deltas: list[int] | None = None,
                       mode_lf_deltas: list[int] | None = None,
                       n_token_partitions: int = 1,
                       y_ac_qi: int = 0, y_dc_delta: int = 0,
                       y2_dc_delta: int = 0, y2_ac_delta: int = 0,
                       uv_dc_delta: int = 0, uv_ac_delta: int = 0,
                       refresh_entropy_probs: int = 1,
                       version: int = 0) -> bytes:
    """Fixture twin of :func:`parse_vp8_frame_header`: a syntactically
    valid VP8 keyframe chunk body whose first partition carries exactly
    the header fields (coefficient data is absent — the parser never
    reads past refresh_entropy_probs). For wrapping into a full WebP
    payload prepend the RIFF/WEBP container with a ``VP8 `` chunk."""
    be = _BoolEncoder()
    be.write_literal(color_space, 1)
    be.write_literal(clamping_type, 1)
    seg_on = (segment_quant_deltas is not None
              or segment_lf_deltas is not None
              or segment_tree_probs is not None)
    be.write_literal(1 if seg_on else 0, 1)
    if seg_on:
        be.write_literal(1 if segment_tree_probs is not None else 0, 1)
        update_data = (segment_quant_deltas is not None
                       or segment_lf_deltas is not None)
        be.write_literal(1 if update_data else 0, 1)
        if update_data:
            be.write_literal(segment_abs_values, 1)
            for d in (segment_quant_deltas or [0] * 4):
                be.write_literal(1 if d else 0, 1)
                if d:
                    be.write_signed(d, 7)
            for d in (segment_lf_deltas or [0] * 4):
                be.write_literal(1 if d else 0, 1)
                if d:
                    be.write_signed(d, 6)
        if segment_tree_probs is not None:
            for p in segment_tree_probs:
                be.write_literal(0 if p == 255 else 1, 1)
                if p != 255:
                    be.write_literal(p, 8)
    be.write_literal(filter_type, 1)
    be.write_literal(filter_level, 6)
    be.write_literal(sharpness_level, 3)
    lf_adj = ref_lf_deltas is not None or mode_lf_deltas is not None
    be.write_literal(1 if lf_adj else 0, 1)
    if lf_adj:
        be.write_literal(1, 1)  # mode_ref_lf_delta_update
        for d in (ref_lf_deltas or [0] * 4):
            be.write_literal(1 if d else 0, 1)
            if d:
                be.write_signed(d, 6)
        for d in (mode_lf_deltas or [0] * 4):
            be.write_literal(1 if d else 0, 1)
            if d:
                be.write_signed(d, 6)
    log2p = {1: 0, 2: 1, 4: 2, 8: 3}[n_token_partitions]
    be.write_literal(log2p, 2)
    be.write_literal(y_ac_qi, 7)
    for d in (y_dc_delta, y2_dc_delta, y2_ac_delta, uv_dc_delta,
              uv_ac_delta):
        be.write_literal(1 if d else 0, 1)
        if d:
            be.write_signed(d, 4)
    be.write_literal(refresh_entropy_probs, 1)
    part = be.finish()
    tag = (0) | (version << 1) | (1 << 4) | (len(part) << 5)
    return (
        bytes((tag & 0xFF, (tag >> 8) & 0xFF, (tag >> 16) & 0xFF))
        + b"\x9d\x01\x2a"
        + struct.pack("<HH", width & 0x3FFF, height & 0x3FFF)
        + part
    )


def vp8_header_info(payload: bytes) -> dict:
    """Lossy-WebP metadata: walk the RIFF container to the ``VP8 `` chunk
    and parse its keyframe header (:func:`parse_vp8_frame_header`)."""
    if len(payload) < 20 or payload[:4] != b"RIFF" \
            or payload[8:12] != b"WEBP":
        raise ValueError("not a WebP payload")
    pos = 12
    while pos + 8 <= len(payload):
        tag = payload[pos:pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8:pos + 8 + size]
        if len(body) != size:
            raise ValueError("truncated WebP chunk")
        if tag == b"VP8 ":
            return parse_vp8_frame_header(body)
        if tag == b"VP8L":
            raise ValueError("lossless WebP has no VP8 frame header")
        pos += 8 + size + (size & 1)
    raise ValueError("no VP8 chunk in WebP payload")


def webp_dims(payload: bytes) -> tuple[int, int]:
    """(width, height) of a WebP payload from headers only — works for
    lossless (VP8L header) AND lossy (VP8 keyframe header) variants, plus
    VP8X extended files (canvas size). Cheap: no entropy decoding."""
    if len(payload) < 20 or payload[:4] != b"RIFF" \
            or payload[8:12] != b"WEBP":
        raise ValueError("not a WebP payload")
    pos = 12
    while pos + 8 <= len(payload):
        tag = payload[pos:pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8:pos + 8 + size]
        if len(body) != size:
            raise ValueError("truncated WebP chunk")
        if tag == b"VP8X":
            if size < 10:
                raise ValueError("truncated VP8X chunk")
            w = 1 + (body[4] | (body[5] << 8) | (body[6] << 16))
            h = 1 + (body[7] | (body[8] << 8) | (body[9] << 16))
            return w, h
        if tag == b"VP8L":
            br = _LsbReader(body)
            if br.read(8) != 0x2F:
                raise ValueError("bad VP8L signature")
            return br.read(14) + 1, br.read(14) + 1
        if tag == b"VP8 ":
            return vp8_keyframe_dims(body)
        pos += 8 + size + (size & 1)
    raise ValueError("no image chunk in WebP payload")


def decode_webp(payload: bytes) -> np.ndarray:
    """WebP bytes -> HxWx3 RGB uint8 (alpha dropped, like decode_png).

    Lossless (VP8L) only; lossy VP8, animation, and ALPH chunks raise
    NotImplementedError. Malformed payloads raise ValueError."""
    try:
        return _decode_webp(payload)
    except (ValueError, NotImplementedError):
        raise
    except (IndexError, KeyError, OverflowError, ZeroDivisionError,
            struct.error) as e:
        raise ValueError(f"malformed WebP: {type(e).__name__}: {e}") from e


def _decode_webp(payload: bytes) -> np.ndarray:
    if len(payload) < 20 or payload[:4] != b"RIFF" \
            or payload[8:12] != b"WEBP":
        raise ValueError("not a WebP payload")
    pos = 12
    vp8l = None
    while pos + 8 <= len(payload):
        tag = payload[pos:pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8:pos + 8 + size]
        if len(body) != size:
            raise ValueError("truncated WebP chunk")
        if tag == b"VP8L":
            vp8l = body
            break
        if tag == b"VP8 ":
            raise NotImplementedError(
                "lossy WebP (VP8) needs the VP8 intra-frame decoder — "
                "only lossless (VP8L) is implemented"
            )
        if tag in (b"ANIM", b"ANMF"):
            raise NotImplementedError("animated WebP is not supported")
        # VP8X and metadata chunks: keep walking to find the VP8L payload
        pos += 8 + size + (size & 1)
    if vp8l is None:
        raise ValueError("no VP8L chunk in WebP payload")
    return _decode_vp8l(vp8l)


def _decode_vp8l(data: bytes) -> np.ndarray:
    br = _LsbReader(data)
    if br.read(8) != 0x2F:
        raise ValueError("bad VP8L signature")
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read(1)  # alpha hint
    if br.read(3) != 0:
        raise ValueError("unsupported VP8L version")
    if w * h > _MAX_VP8L_PIXELS:
        raise ValueError(f"VP8L dimensions {w}x{h} out of range")

    transforms = []
    xsize = w
    seen = set()
    while br.read(1):
        ttype = br.read(2)
        if ttype in seen:
            raise ValueError("duplicate VP8L transform")
        seen.add(ttype)
        if ttype in (0, 1):  # PREDICTOR / COLOR
            bits = br.read(3) + 2
            tw = -(-xsize // (1 << bits))
            th = -(-h // (1 << bits))
            tiles = _decode_image(br, tw, th).reshape(th, tw)
            transforms.append((ttype, bits, tiles))
        elif ttype == 2:  # SUBTRACT_GREEN
            transforms.append((2,))
        else:  # COLOR_INDEXING
            n_colors = br.read(8) + 1
            deltas = _decode_image(br, n_colors, 1)
            # palette entries are delta-coded per channel
            a, r, g, b = _argb_planes(deltas)
            pal = _pack_argb(
                np.cumsum(a, dtype=np.uint64) & 0xFF,
                np.cumsum(r, dtype=np.uint64) & 0xFF,
                np.cumsum(g, dtype=np.uint64) & 0xFF,
                np.cumsum(b, dtype=np.uint64) & 0xFF,
            )
            if n_colors <= 2:
                width_bits = 3
            elif n_colors <= 4:
                width_bits = 2
            elif n_colors <= 16:
                width_bits = 1
            else:
                width_bits = 0
            transforms.append((3, pal.astype(np.uint32), width_bits, xsize))
            if width_bits:
                xsize = -(-xsize // (1 << width_bits))

    img = _decode_image(br, xsize, h, top_level=True)

    for t in reversed(transforms):
        if t[0] == 3:
            _, pal, width_bits, orig_xsize = t
            img = _inv_color_indexing(img, pal, width_bits, orig_xsize, h)
            xsize = orig_xsize
        elif t[0] == 2:
            img = _inv_subtract_green(img)
        elif t[0] == 1:
            img = _inv_color_transform(img, t[2], t[1], xsize, h)
        else:
            img = _inv_predictor(img, t[2], t[1], xsize, h)

    _, r, g, b = _argb_planes(img)
    return np.stack(
        [p.reshape(h, w).astype(np.uint8) for p in (r, g, b)], axis=2
    )


# ---------------------------------------------------------------------------
# Encoder (test/fixture twin)
# ---------------------------------------------------------------------------


def _balanced_lengths(freqs: dict[int, int], alphabet_size: int) -> list[int]:
    """Complete canonical prefix code lengths: k used symbols get lengths
    L-1 / L with exactly (2^L - k) at L-1, highest-frequency symbols
    shortest (Kraft sum == 1, so strict decoders accept it). Compression
    optimality is irrelevant for the fixture twin."""
    used = sorted(freqs, key=lambda s: (-freqs[s], s))
    k = len(used)
    if k == 0:
        raise ValueError("no symbols to code")
    if k == 1:
        # single-symbol normal code: one length-1 entry; the decoder's
        # single-symbol path consumes zero bits per symbol
        lengths = [0] * alphabet_size
        lengths[used[0]] = 1
        return lengths
    L = max(1, (k - 1).bit_length())
    excess = (1 << L) - k
    lengths = [0] * alphabet_size
    for i, s in enumerate(used):
        lengths[s] = L - 1 if i < excess else L
    return lengths


def _write_code_lengths(bw: _LsbWriter, lengths: list[int]) -> None:
    """Normal-form prefix code: code-length code + lengths with 17/18 zero
    runs (spec 5.2.2)."""
    # CL symbol stream
    stream: list[tuple[int, int, int]] = []  # (cl_symbol, extra, extra_bits)
    i = 0
    n = len(lengths)
    # without the max-symbol feature, the decoder expects a code length for
    # EVERY alphabet symbol — trailing zeros are explicit 17/18 runs too
    while i < n:
        if lengths[i] == 0:
            j = i
            while j < n and lengths[j] == 0:
                j += 1
            run = j - i
            while run >= 11:
                r = min(run, 138)
                stream.append((18, r - 11, 7))
                run -= r
            while run >= 3:
                r = min(run, 10)
                stream.append((17, r - 3, 3))
                run -= r
            for _ in range(run):
                stream.append((0, 0, 0))
            i = j
        else:
            stream.append((lengths[i], 0, 0))
            i += 1
    cl_freqs: dict[int, int] = {}
    for s, _, _ in stream:
        cl_freqs[s] = cl_freqs.get(s, 0) + 1
    if len(cl_freqs) == 1:
        only = next(iter(cl_freqs))
        cl_lengths = [0] * 19
        # a 1-entry code-length code: give the symbol (and a dummy) length 1
        cl_lengths[only] = 1
        dummy = 0 if only != 0 else 1
        cl_lengths[dummy] = 1
    else:
        cl_lengths = _balanced_lengths(cl_freqs, 19)
    # minimal prefix of the special order covering every used CL symbol
    num_cl = max(
        max(_CL_ORDER.index(s) for s in range(19) if cl_lengths[s]) + 1, 4
    )
    bw.write(num_cl - 4, 4)
    for i in range(num_cl):
        bw.write(cl_lengths[_CL_ORDER[i]], 3)
    bw.write(0, 1)  # no max_symbol limit: full alphabet coded
    codes = _canonical_codes(cl_lengths)
    for s, extra, ebits in stream:
        _write_code_msb(bw, codes[s], cl_lengths[s])
        if ebits:
            bw.write(extra, ebits)


def _write_code_msb(bw: _LsbWriter, code: int, length: int) -> None:
    """Prefix codes are emitted MSB-of-code first (deflate convention)."""
    for i in range(length - 1, -1, -1):
        bw.write((code >> i) & 1, 1)


class _CodeWriter:
    """Encode side of _PrefixCode: emits header + symbols for one code."""

    def __init__(self, freqs: dict[int, int], alphabet_size: int):
        self.syms = sorted(freqs)
        # the simple form stores symbols in at most 8 bits — length/cache
        # symbols (>= 256 in the green alphabet) MUST use the normal form
        self.simple = len(self.syms) <= 2 and max(self.syms) <= 255
        if self.simple:
            self.lengths = None
            self.codes = None
        else:
            self.lengths = _balanced_lengths(freqs, alphabet_size)
            self.codes = _canonical_codes(self.lengths)
            # one nonzero length -> the decoder's 0-bit single-symbol path
            self.zero_bit = len(self.syms) == 1

    def write_header(self, bw: _LsbWriter) -> None:
        if self.simple:
            bw.write(1, 1)
            syms = self.syms if self.syms else [0]
            bw.write(len(syms) - 1, 1)
            bw.write(1, 1)  # first symbol in 8 bits
            bw.write(syms[0], 8)
            if len(syms) == 2:
                bw.write(syms[1], 8)
        else:
            bw.write(0, 1)
            _write_code_lengths(bw, self.lengths)

    def write_symbol(self, bw: _LsbWriter, s: int) -> None:
        if self.simple:
            if len(self.syms) == 2:
                bw.write(self.syms.index(s), 1)
            # single symbol: zero bits
        elif not self.zero_bit:
            _write_code_msb(bw, self.codes[s], self.lengths[s])


def _encode_image(bw: _LsbWriter, argb: np.ndarray, xsize: int,
                  top_level: bool, cache_bits: int = 0,
                  use_lz77: bool = False) -> None:
    """Entropy-code an ARGB pixel array (single prefix-code group)."""
    n = len(argb)
    cache_size = (1 << cache_bits) if cache_bits else 0
    if cache_bits:
        bw.write(1, 1)
        bw.write(cache_bits, 4)
    else:
        bw.write(0, 1)
    if top_level:
        bw.write(0, 1)  # no meta prefix codes

    # tokenization pass (greedy vertical/horizontal runs + cache hits)
    cache = [None] * cache_size
    tokens = []  # ('lit', px) | ('ref', length, dist) | ('cache', idx)
    pos = 0
    a = argb.astype(np.uint32)
    while pos < n:
        if use_lz77:
            best_len = 0
            best_dist = 0
            for dist in ([1, xsize] if pos >= xsize else [1]):
                if dist > pos:
                    continue
                ln = 0
                while (pos + ln < n and ln < 4096
                       and a[pos + ln] == a[pos + ln - dist]):
                    ln += 1
                if ln > best_len:
                    best_len, best_dist = ln, dist
            if best_len >= 3:
                tokens.append(("ref", best_len, best_dist))
                for i in range(best_len):
                    px = int(a[pos + i])
                    if cache_size:
                        cache[((_HASH_MUL * px) & 0xFFFFFFFF)
                              >> (32 - cache_bits)] = px
                pos += best_len
                continue
        px = int(a[pos])
        if cache_size:
            h = ((_HASH_MUL * px) & 0xFFFFFFFF) >> (32 - cache_bits)
            if cache[h] == px:
                tokens.append(("cache", h))
                pos += 1
                continue
            cache[h] = px
        tokens.append(("lit", px))
        pos += 1

    # histograms
    gf: dict[int, int] = {}
    rf: dict[int, int] = {}
    bf: dict[int, int] = {}
    af: dict[int, int] = {}
    df: dict[int, int] = {}
    for t in tokens:
        if t[0] == "lit":
            px = t[1]
            gf[(px >> 8) & 0xFF] = gf.get((px >> 8) & 0xFF, 0) + 1
            rf[(px >> 16) & 0xFF] = rf.get((px >> 16) & 0xFF, 0) + 1
            bf[px & 0xFF] = bf.get(px & 0xFF, 0) + 1
            af[(px >> 24) & 0xFF] = af.get((px >> 24) & 0xFF, 0) + 1
        elif t[0] == "ref":
            lcode, _, _ = _prefix_encode_value(t[1])
            gf[256 + lcode] = gf.get(256 + lcode, 0) + 1
            dist = t[2]
            dist_code = _dist_to_code(dist, xsize)
            dcode, _, _ = _prefix_encode_value(dist_code)
            df[dcode] = df.get(dcode, 0) + 1
        else:
            gf[256 + 24 + t[1]] = gf.get(256 + 24 + t[1], 0) + 1
    for f in (rf, bf, af, df):
        if not f:
            f[0] = 1  # unused alphabet: 1-symbol simple code
    green_size = 256 + 24 + cache_size
    cw_g = _CodeWriter(gf, green_size)
    cw_r = _CodeWriter(rf, 256)
    cw_b = _CodeWriter(bf, 256)
    cw_a = _CodeWriter(af, 256)
    cw_d = _CodeWriter(df, 40)
    for cw in (cw_g, cw_r, cw_b, cw_a, cw_d):
        cw.write_header(bw)

    for t in tokens:
        if t[0] == "lit":
            px = t[1]
            cw_g.write_symbol(bw, (px >> 8) & 0xFF)
            cw_r.write_symbol(bw, (px >> 16) & 0xFF)
            cw_b.write_symbol(bw, px & 0xFF)
            cw_a.write_symbol(bw, (px >> 24) & 0xFF)
        elif t[0] == "ref":
            lcode, lex, lebits = _prefix_encode_value(t[1])
            cw_g.write_symbol(bw, 256 + lcode)
            if lebits:
                bw.write(lex, lebits)
            dist_code = _dist_to_code(t[2], xsize)
            dcode, dex, debits = _prefix_encode_value(dist_code)
            cw_d.write_symbol(bw, dcode)
            if debits:
                bw.write(dex, debits)
        else:
            cw_g.write_symbol(bw, 256 + 24 + t[1])


def _dist_to_code(dist: int, xsize: int) -> int:
    """Use the neighborhood plane codes for the two distances the greedy
    matcher emits (left: code 2, above: code 1 — exercising the decode
    map); absolute form otherwise."""
    if dist == 1:
        return 2
    if dist == xsize:
        return 1
    return dist + 120


def encode_webp_lossless(
    img: np.ndarray,
    transform: str | None = None,
    cache_bits: int = 0,
    use_lz77: bool = True,
) -> bytes:
    """HxWx3 RGB (or HxW gray) uint8 -> lossless WebP (VP8L) bytes.

    ``transform``: None | 'subtract_green' | 'predictor' | 'color' |
    'palette' — forward implementations matching the decoder's inverse
    paths (single tile for predictor/color). Exists to adversarially test
    decode_webp; byte output is valid VP8L but makes no optimality claims."""
    if img.ndim == 2:
        img = np.repeat(img[:, :, None], 3, axis=2)
    h, w = img.shape[:2]
    if h < 1 or w < 1 or h > 1 << 14 or w > 1 << 14:
        raise ValueError("image dimensions out of VP8L range")
    r = img[:, :, 0].astype(np.uint32)
    g = img[:, :, 1].astype(np.uint32)
    b = img[:, :, 2].astype(np.uint32)
    a = np.full_like(g, 255)
    argb = _pack_argb(a, r, g, b).reshape(-1)

    bw = _LsbWriter()
    bw.write(0x2F, 8)
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)  # alpha hint
    bw.write(0, 3)  # version

    xsize = w
    if transform == "subtract_green":
        bw.write(1, 1)
        bw.write(2, 2)
        aa, rr, gg, bb = _argb_planes(argb)
        argb = _pack_argb(aa, (rr - gg) & 0xFF, gg, (bb - gg) & 0xFF)
    elif transform == "predictor":
        bw.write(1, 1)
        bw.write(0, 2)
        bits = 9  # one 512px tile dimension step; mode constant anyway
        bw.write(bits - 2, 3)
        tw = -(-w // (1 << bits))
        th = -(-h // (1 << bits))
        mode = 2  # Top
        tiles = np.full(tw * th, 0xFF000000 | (mode << 8), np.uint32)
        _encode_image(bw, tiles, tw, top_level=False)
        argb = _forward_predictor(argb, mode, w, h)
    elif transform == "color":
        bw.write(1, 1)
        bw.write(1, 2)
        bits = 9
        bw.write(bits - 2, 3)
        tw = -(-w // (1 << bits))
        th = -(-h // (1 << bits))
        g2r, g2b, r2b = 5, 3, 2
        # element layout per spec 4.2.3: red byte = red_to_blue,
        # green byte = green_to_blue, blue byte = green_to_red
        elem = 0xFF000000 | (r2b << 16) | (g2b << 8) | g2r
        tiles = np.full(tw * th, elem, np.uint32)
        _encode_image(bw, tiles, tw, top_level=False)
        aa, rr, gg, bb = _argb_planes(argb)
        # forward: subtract the deltas the decoder will add back (r2b uses
        # the FINAL red, which is the pre-transform red here)
        new_r = (rr - _ct_delta(np.uint8(g2r), gg)) & 0xFF
        new_b = (bb - _ct_delta(np.uint8(g2b), gg)
                 - _ct_delta(np.uint8(r2b), rr)) & 0xFF
        argb = _pack_argb(aa, new_r, gg, new_b)
    elif transform == "palette":
        colors = np.unique(argb)
        if len(colors) > 256:
            raise ValueError("palette transform needs <= 256 colors")
        bw.write(1, 1)
        bw.write(3, 2)
        bw.write(len(colors) - 1, 8)
        # delta-code the palette per channel
        pal = colors.astype(np.uint32)
        pa_, pr_, pg_, pb_ = _argb_planes(pal)
        deltas = _pack_argb(
            np.diff(pa_, prepend=np.uint32(0)) & 0xFF,
            np.diff(pr_, prepend=np.uint32(0)) & 0xFF,
            np.diff(pg_, prepend=np.uint32(0)) & 0xFF,
            np.diff(pb_, prepend=np.uint32(0)) & 0xFF,
        )
        _encode_image(bw, deltas, len(colors), top_level=False)
        idx = np.searchsorted(colors, argb).astype(np.uint32)
        if len(colors) <= 2:
            width_bits = 3
        elif len(colors) <= 4:
            width_bits = 2
        elif len(colors) <= 16:
            width_bits = 1
        else:
            width_bits = 0
        if width_bits:
            per = 1 << width_bits
            ibits = 8 >> width_bits
            packed_w = -(-w // per)
            grid = np.zeros((h, packed_w * per), dtype=np.uint32)
            grid[:, :w] = idx.reshape(h, w)
            packed = np.zeros((h, packed_w), dtype=np.uint32)
            for i in range(per):
                packed |= grid[:, i::per] << (i * ibits)
            argb = _pack_argb(
                np.full(packed.size, 255, np.uint32),
                np.zeros(packed.size, np.uint32),
                packed.reshape(-1),
                np.zeros(packed.size, np.uint32),
            )
            xsize = packed_w
        else:
            argb = _pack_argb(
                np.full(idx.size, 255, np.uint32),
                np.zeros(idx.size, np.uint32), idx,
                np.zeros(idx.size, np.uint32),
            )
    elif transform is not None:
        raise ValueError(f"unknown transform {transform!r}")
    bw.write(0, 1)  # end of transforms

    _encode_image(bw, argb, xsize, top_level=True, cache_bits=cache_bits,
                  use_lz77=use_lz77)
    bw.flush()
    data = bytes(bw.out)

    chunk = b"VP8L" + struct.pack("<I", len(data)) + data
    if len(data) & 1:
        chunk += b"\x00"
    riff = b"WEBP" + chunk
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


def _forward_predictor(argb: np.ndarray, mode: int, w: int, h: int):
    """Residuals such that _inv_predictor with a constant ``mode`` tile
    reconstructs the original (same edge rules)."""
    src = argb.reshape(h, w)
    out = np.zeros_like(src)
    for y in range(h):
        for x in range(w):
            if x == 0 and y == 0:
                pred = (0xFF, 0, 0, 0)
            elif y == 0:
                pred = _px_tuple(int(src[0, x - 1]))
            elif x == 0:
                pred = _px_tuple(int(src[y - 1, 0]))
            else:
                L = _px_tuple(int(src[y, x - 1]))
                T = _px_tuple(int(src[y - 1, x]))
                TL = _px_tuple(int(src[y - 1, x - 1]))
                # rightmost-column TR mirrors the decoder: current row's
                # leftmost pixel (contiguous-buffer edge rule)
                TR = _px_tuple(int(src[y - 1, x + 1] if x + 1 < w
                                   else src[y, 0]))
                pred = _predict(mode, L, T, TL, TR)
            px = _px_tuple(int(src[y, x]))
            out[y, x] = ((((px[0] - pred[0]) & 0xFF) << 24)
                         | (((px[1] - pred[1]) & 0xFF) << 16)
                         | (((px[2] - pred[2]) & 0xFF) << 8)
                         | ((px[3] - pred[3]) & 0xFF))
    return out.reshape(-1)
