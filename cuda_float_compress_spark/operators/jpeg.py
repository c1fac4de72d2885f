"""Pure-numpy baseline JPEG (JFIF) decode — no imaging library.

Mirrors the reference repo's approach of treating media payloads as opaque
bytes with real decoders where the container allows (see
/root/reference/README.md — the reference ships cat-photo fixtures; this
engine's media operators must sniff and decode the dominant web formats).
JPEG is the top web image format; this module closes the last honest stub
the same way PNG was closed: from the spec, with stdlib + numpy only.

Supported profiles (covering the web-dominant formats): baseline
sequential DCT (SOF0/1) and progressive DCT (SOF2, spectral selection +
successive approximation per T.81 Annex G), 8-bit, 1 or 3 components, any
1-2 h/v sampling factors (4:4:4, 4:2:2, 4:2:0), restart markers
(DRI/RSTn), byte stuffing. Arithmetic coding and lossless/differential
processes raise ValueError — malformed or out-of-profile payloads are
row-skips in the Spark pipelines, never task failures.

``encode_jpeg`` is the test/fixture twin (the decode path's adversary in
property tests): Annex-K quantization tables with the libjpeg quality
scaling, self-built canonical Huffman tables (4-bit DC / 8-bit AC codes —
any valid DHT is legal, and these avoid transcribing the 162-entry Annex-K
code lists), optional 4:2:0 subsampling and restart intervals.

Everything heavy is vectorized: the IDCT/DCT run as one batched einsum over
all blocks of a component; the bit-level Huffman loop is per-coefficient
Python, acceptable for fixture-scale payloads (the Spark-side scale story
is the mapInPandas partitioning around it, as with PNG).
"""

from __future__ import annotations

import struct

import numpy as np

# scan position -> index into the flattened 8x8 block
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# Annex K.1/K.2 quantization tables (row-major 8x8)
QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)
QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)


def _dct_matrix() -> np.ndarray:
    """8x8 DCT-II basis C[u,x]; forward F = C f C^T, inverse f = C^T F C."""
    x = np.arange(8)
    u = np.arange(8)[:, None]
    c = np.cos((2 * x + 1) * u * np.pi / 16)
    c[0] *= np.sqrt(0.5)
    return c * 0.5


_DCT_C = _dct_matrix()


_DCT_C32 = None  # float32 basis, built lazily


def _idct_blocks(coef: np.ndarray) -> np.ndarray:
    """(n, 8, 8) dequantized coefficients -> (n, 8, 8) spatial samples
    (level-shifted back, clipped) — one batched float32 einsum for all
    blocks (float32 keeps the decode working set at ~half of float64;
    IDCT roundoff is ~1e-4, far below the 0.5 rounding threshold for any
    in-range coefficient)."""
    global _DCT_C32
    if _DCT_C32 is None:
        _DCT_C32 = _DCT_C.astype(np.float32)
    f = np.einsum(
        "ux,nuv,vy->nxy", _DCT_C32, coef.astype(np.float32, copy=False),
        _DCT_C32,
    )
    return np.clip(np.round(f) + 128, 0, 255).astype(np.uint8)


def _dct_blocks(samples: np.ndarray) -> np.ndarray:
    """(n, 8, 8) uint8 samples -> (n, 8, 8) float DCT coefficients."""
    f = samples.astype(np.float64) - 128.0
    return np.einsum("ux,nxy,vy->nuv", _DCT_C, f, _DCT_C)


# ---------------------------------------------------------------------------
# Huffman
# ---------------------------------------------------------------------------


def _build_decode_table(bits: list[int], vals: bytes) -> dict:
    """DHT (BITS, HUFFVAL) -> {(length, code): symbol} (canonical order)."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


class _BitReader:
    """MSB-first bit reader over a de-stuffed entropy segment."""

    __slots__ = ("data", "pos", "bit")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bit = 0

    def read_bit(self) -> int:
        if self.pos >= len(self.data):
            raise ValueError("truncated JPEG entropy stream")
        b = (self.data[self.pos] >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
        return b

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode(self, table: dict) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG huffman code")


def _extend(v: int, size: int) -> int:
    """JPEG F.2.2.1 sign extension of a SIZE-bit magnitude."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------

# Pixel cap bounds the decoder WORKING SET, not just the output: peak RSS
# is ~40 bytes/pixel (int32 coefficient grid + dequant copy + float32 IDCT
# planes + float32 RGB stack), so 8.4 MP caps intermediates near ~350 MB —
# the same executor-OOM budget class as _MAX_PNG_RAW_BYTES. A tiny VALID
# payload can declare huge dims (all-EOB entropy stream), so the cap must
# hold before any allocation.
_MAX_JPEG_PIXELS = 1 << 23


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JFIF bytes -> HxWx3 RGB uint8 (grayscale replicated).

    Contract: malformed or hostile payloads raise ValueError (or
    NotImplementedError for out-of-profile coding processes) — NEVER other
    exception types — so the mapInPandas row-skip handlers can catch them
    (one corrupt web image must not kill a Spark task)."""
    try:
        return _decode_jpeg(payload)
    except (ValueError, NotImplementedError):
        raise
    except (ZeroDivisionError, IndexError, OverflowError, KeyError,
            struct.error) as e:
        # belt-and-braces: any structural hole a crafted payload finds in
        # the parser surfaces as the catchable contract type
        raise ValueError(f"malformed JPEG: {type(e).__name__}: {e}") from e


def _decode_jpeg(payload: bytes) -> np.ndarray:
    if payload[:3] != b"\xff\xd8\xff":
        raise ValueError("not a JPEG payload")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class, id) -> decode table
    frame = None
    prog_state = None
    restart_interval = 0
    pos = 2
    n = len(payload)
    while True:
        if pos + 4 > n:
            if prog_state is not None:
                break  # progressive stream truncated after last scan: EOI
                # missing but every decoded scan is usable (be liberal)
            raise ValueError("truncated JPEG (no SOS)")
        if payload[pos] != 0xFF:
            raise ValueError("JPEG marker expected")
        while pos + 1 < n and payload[pos + 1] == 0xFF:
            pos += 1  # 0xFF fill bytes before a marker are legal padding
        if pos + 1 >= n:
            raise ValueError("truncated JPEG (fill bytes to EOF)")
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD8 or 0xD0 <= marker <= 0xD7:  # SOI / bare RST
            continue
        if marker == 0xD9:  # EOI
            if prog_state is not None:
                break  # all progressive scans decoded — assemble below
            raise ValueError("EOI before image data")
        seg_len = struct.unpack_from(">H", payload, pos)[0]
        body = payload[pos + 2 : pos + seg_len]
        if len(body) != seg_len - 2:
            raise ValueError("truncated JPEG segment")
        if marker == 0xDB:  # DQT
            off = 0
            while off < len(body):
                pq, tq = body[off] >> 4, body[off] & 0x0F
                off += 1
                if pq == 0:
                    tbl = np.frombuffer(body[off : off + 64], np.uint8)
                    off += 64
                else:
                    tbl = np.frombuffer(
                        body[off : off + 128], ">u2"
                    )
                    off += 128
                if len(tbl) != 64:
                    raise ValueError("truncated DQT")
                # kept in zigzag order — coefficients are decoded in zigzag
                # order too, so dequantization is elementwise
                qt[tq] = tbl.astype(np.int64)
        elif marker == 0xC4:  # DHT
            off = 0
            while off + 17 <= len(body):
                tc, th = body[off] >> 4, body[off] & 0x0F
                bits = list(body[off + 1 : off + 17])
                nsyms = sum(bits)
                vals = body[off + 17 : off + 17 + nsyms]
                if len(vals) != nsyms:
                    raise ValueError("truncated DHT")
                huff[(tc, th)] = _build_decode_table(bits, vals)
                off += 17 + nsyms
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
            prec, h, w, ncomp = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise ValueError(f"unsupported JPEG precision {prec}")
            if h == 0 or w == 0 or h * w > _MAX_JPEG_PIXELS:
                raise ValueError(f"JPEG dimensions {w}x{h} out of range")
            comps = []
            for i in range(ncomp):
                cid, hv, tq = struct.unpack_from(">BBB", body, 6 + 3 * i)
                ch, cv = hv >> 4, hv & 0x0F
                if not (1 <= ch <= 2 and 1 <= cv <= 2):
                    raise ValueError(
                        f"unsupported sampling factors {ch}x{cv}"
                    )
                comps.append({"id": cid, "h": ch, "v": cv, "tq": tq})
            if ncomp not in (1, 3):
                raise ValueError(f"unsupported component count {ncomp}")
            frame = {"h": h, "w": w, "comps": comps,
                     "progressive": marker == 0xC2}
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError(
                "unsupported JPEG coding process (lossless/arithmetic/"
                "differential) — baseline and progressive huffman only"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack_from(">H", body, 0)[0]
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            if not body:
                raise ValueError("empty SOS segment")
            ns = body[0]
            if len(body) < 1 + 2 * ns:
                raise ValueError("truncated SOS component list")
            sel = {}
            for i in range(ns):
                cs, tda = body[1 + 2 * i], body[2 + 2 * i]
                sel[cs] = (tda >> 4, tda & 0x0F)
            scan_start = pos + seg_len
            if not frame.get("progressive"):
                return _decode_scan(
                    payload, scan_start, frame, sel, qt, huff,
                    restart_interval,
                )
            # progressive: Ss/Se/Ah/Al follow the component list
            if len(body) < 1 + 2 * ns + 3:
                raise ValueError("truncated SOS spectral parameters")
            ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
            ahal = body[3 + 2 * ns]
            if prog_state is None:
                prog_state = _init_progressive_state(frame)
            pos = _decode_progressive_scan(
                payload, scan_start, frame, prog_state, sel, ss, se,
                ahal >> 4, ahal & 0x0F, huff, restart_interval,
            )
            continue
        # APPn / COM / others: skip
        pos += seg_len

    # progressive: all scans accumulated — dequantize and assemble once
    for c in prog_state["comps"]:
        if c["tq"] not in qt:
            raise ValueError(f"missing quantization table {c['tq']}")
    return _assemble_image(
        prog_state["comps"], qt, prog_state["hmax"], prog_state["vmax"],
        frame["h"], frame["w"], len(prog_state["comps"]),
    )


def _split_scan(payload: bytes, start: int) -> list[bytes]:
    """Entropy-coded data -> de-stuffed segments split at RST markers."""
    return _split_scan_pos(payload, start)[0]


def _split_scan_pos(payload: bytes, start: int) -> tuple[list[bytes], int]:
    """(segments, end) — ``end`` is the offset of the 0xFF that terminates
    the scan (the next marker), so a multi-scan (progressive) parser can
    resume marker processing there."""
    segs = []
    cur = bytearray()
    pos = start
    n = len(payload)
    while pos < n:
        b = payload[pos]
        if b != 0xFF:
            cur.append(b)
            pos += 1
            continue
        if pos + 1 >= n:
            break
        m = payload[pos + 1]
        if m == 0x00:  # stuffed FF
            cur.append(0xFF)
            pos += 2
        elif m == 0xFF:  # fill byte before a marker (T.81 B.1.1.2)
            pos += 1
        elif 0xD0 <= m <= 0xD7:  # RSTn
            segs.append(bytes(cur))
            cur = bytearray()
            pos += 2
        else:  # EOI or next marker ends the scan
            break
    segs.append(bytes(cur))
    return segs, pos


def _init_progressive_state(frame) -> dict:
    """Per-component coefficient grids accumulated across progressive scans
    (T.81 Annex G): full interleaved-grid dims for MCU scans, plus the
    non-interleaved block dims each single-component scan iterates over."""
    h, w, comps = frame["h"], frame["w"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    state = {"hmax": hmax, "vmax": vmax, "mcux": mcux, "mcuy": mcuy,
             "comps": []}
    for c in comps:
        bx = mcux * c["h"]
        by = mcuy * c["v"]
        # non-interleaved dims: blocks covering THIS component's samples
        cw = -(-w * c["h"] // hmax)   # ceil(w * h_i / hmax)
        ch = -(-h * c["v"] // vmax)
        state["comps"].append({
            **c,
            "bx": bx, "by": by,
            "nbx": -(-cw // 8),
            "nby": -(-ch // 8),
            "coef": np.zeros((by * bx, 64), np.int32),
        })
    return state


_COEF_CLIP = 1 << 30  # matches the baseline hostile-stream clip


def _prog_dc_scan(reader, comps_in_scan, state, mcu_range, al, refine):
    """DC scan over interleaved MCUs (or a single component's blocks when
    the scan is non-interleaved). First pass stores diff<<al per G.1.2.1;
    refinement appends one raw bit at position al (|= works on the stored
    two's-complement value: the bit is clear in well-formed streams)."""
    interleaved = len(comps_in_scan) > 1
    mcux = state["mcux"]
    for mcu in mcu_range:
        for c in comps_in_scan:
            if interleaved:
                my, mx = divmod(mcu, mcux)
                blocks = [
                    ((my * c["v"] + by) * c["bx"] + (mx * c["h"] + bx))
                    for by in range(c["v"]) for bx in range(c["h"])
                ]
            else:
                my, mx = divmod(mcu, c["nbx"])
                blocks = [my * c["bx"] + mx]
            for bi in blocks:
                if refine:
                    if reader.read_bit():
                        c["coef"][bi, 0] |= np.int32(1 << al)
                else:
                    size = reader.decode(c["dc_tab"])
                    if size > 16:
                        raise ValueError("invalid JPEG DC size category")
                    diff = _extend(reader.receive(size), size)
                    c["pred"] += diff
                    c["coef"][bi, 0] = np.int32(
                        max(-_COEF_CLIP, min(_COEF_CLIP, c["pred"] << al))
                    )


def _prog_ac_first(reader, c, blk_range, ss, se, al, eobrun):
    """AC first scan for one component (G.1.2.2): runs/sizes like baseline
    but banded to [ss, se], values stored <<al, and EOBn codes start a run
    of ``eobrun`` entirely-zero (in this band) blocks."""
    coef = c["coef"]
    for unit in blk_range:
        my, mx = divmod(unit, c["nbx"])
        bi = my * c["bx"] + mx
        if eobrun > 0:
            eobrun -= 1
            continue
        k = ss
        while k <= se:
            rs = reader.decode(c["ac_tab"])
            r, s = rs >> 4, rs & 0x0F
            if s == 0:
                if r == 15:  # ZRL: 16 zeros
                    k += 16
                    continue
                eobrun = (1 << r) - 1
                if r:
                    eobrun += reader.receive(r)
                break
            k += r
            if k > se:
                raise ValueError("AC index overflow")
            v = _extend(reader.receive(s), s) << al
            coef[bi, k] = np.int32(max(-_COEF_CLIP, min(_COEF_CLIP, v)))
            k += 1
    return eobrun

def _prog_ac_refine(reader, c, blk_range, ss, se, al, eobrun):
    """AC refinement scan (G.1.2.3): each already-nonzero coefficient in the
    band consumes one correction bit when visited; run lengths count only
    zero-history positions; newly-significant coefficients arrive as +-1<<al."""
    coef = c["coef"]
    p1 = 1 << al

    def correct(bi, k):
        # append the correction bit to the magnitude (guard: skip if the
        # bit is somehow already set — hostile streams only)
        if reader.read_bit():
            v = int(coef[bi, k])
            mag = v if v > 0 else -v
            if not (mag & p1):
                mag += p1
                coef[bi, k] = np.int32(mag if v > 0 else -mag)

    for unit in blk_range:
        my, mx = divmod(unit, c["nbx"])
        bi = my * c["bx"] + mx
        k = ss
        if eobrun == 0:
            while k <= se:
                rs = reader.decode(c["ac_tab"])
                r, s = rs >> 4, rs & 0x0F
                newval = 0
                if s == 0:
                    if r != 15:
                        eobrun = 1 << r
                        if r:
                            eobrun += reader.receive(r)
                        break  # rest of band handled by the eobrun tail
                    # r == 15: pass over 16 zero-history positions
                else:
                    if s != 1:
                        raise ValueError("invalid AC refinement size")
                    newval = p1 if reader.read_bit() else -p1
                # advance over r zero-history positions, emitting correction
                # bits for every nonzero-history coefficient on the way
                while k <= se:
                    if coef[bi, k]:
                        correct(bi, k)
                    else:
                        if r == 0:
                            break
                        r -= 1
                    k += 1
                if s and k <= se:
                    coef[bi, k] = np.int32(newval)
                k += 1
        if eobrun > 0:
            # EOB run covers this block's remaining band: correction bits
            # only for nonzero-history coefficients
            while k <= se:
                if coef[bi, k]:
                    correct(bi, k)
                k += 1
            eobrun -= 1
    return eobrun


def _decode_progressive_scan(payload, start, frame, state, sel, ss, se,
                             ah, al, huff, restart_interval):
    """One progressive SOS: dispatch to DC/AC first/refinement over the
    scan's restart segments. Returns the payload offset where the scan's
    entropy data ends (the next marker's 0xFF)."""
    comps_in_scan = []
    for c in state["comps"]:
        if c["id"] in sel:
            dc_tc, ac_tc = sel[c["id"]]
            if ss == 0:
                if not ah and (0, dc_tc) not in huff:
                    raise ValueError("missing huffman table")
                c["dc_tab"] = huff.get((0, dc_tc))
            else:
                if (1, ac_tc) not in huff:
                    raise ValueError("missing huffman table")
                c["ac_tab"] = huff[(1, ac_tc)]
            comps_in_scan.append(c)
    if len(comps_in_scan) != len(sel):
        raise ValueError("scan references unknown component")
    if ss > se or se > 63 or al > 13 or ah > 14:
        raise ValueError("invalid spectral selection / approximation")
    if ss == 0 and se != 0:
        # baseline-style full-band scans are illegal in progressive frames
        raise ValueError("progressive DC scan must have Se=0")
    if ss > 0 and len(comps_in_scan) != 1:
        raise ValueError("progressive AC scan must be non-interleaved")
    if ah and ah != al + 1:
        raise ValueError("invalid successive approximation step")

    if len(comps_in_scan) > 1:
        total_units = state["mcux"] * state["mcuy"]
    else:
        c = comps_in_scan[0]
        total_units = c["nbx"] * c["nby"]

    segs, end = _split_scan_pos(payload, start)
    per_seg = restart_interval if restart_interval else total_units
    unit = 0
    seg_idx = 0
    while unit < total_units:
        if seg_idx >= len(segs):
            raise ValueError("JPEG scan ended before all units decoded")
        reader = _BitReader(segs[seg_idx])
        for c in comps_in_scan:
            c["pred"] = 0  # DC predictor resets at restart boundaries
        eobrun = 0  # EOB runs must not cross restart boundaries
        count = min(per_seg, total_units - unit)
        rng = range(unit, unit + count)
        if ss == 0:
            _prog_dc_scan(reader, comps_in_scan, state, rng, al, ah > 0)
        elif ah == 0:
            eobrun = _prog_ac_first(
                reader, comps_in_scan[0], rng, ss, se, al, eobrun
            )
        else:
            eobrun = _prog_ac_refine(
                reader, comps_in_scan[0], rng, ss, se, al, eobrun
            )
        unit += count
        seg_idx += 1
    return end


def _decode_scan(payload, start, frame, sel, qt, huff, restart_interval):
    h, w, comps = frame["h"], frame["w"], frame["comps"]
    ncomp = len(comps)
    if ncomp == 1:
        # non-interleaved single-component scan: MCU is one 8x8 block
        comps = [dict(comps[0], h=1, v=1)]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if hmax < 1 or vmax < 1 or hmax > 2 or vmax > 2:
        raise ValueError(f"unsupported sampling factors ({hmax}x{vmax})")
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    for c in comps:
        if c["tq"] not in qt:
            raise ValueError(f"missing quantization table {c['tq']}")
        if c["id"] not in sel:
            raise ValueError(f"scan does not cover component {c['id']}")
        dc_tc, ac_tc = sel[c["id"]]
        if (0, dc_tc) not in huff or (1, ac_tc) not in huff:
            raise ValueError("missing huffman table")
        c["dc_tab"] = huff[(0, dc_tc)]
        c["ac_tab"] = huff[(1, ac_tc)]
        c["bx"] = mcux * c["h"]
        c["by"] = mcuy * c["v"]
        # int32: legal baseline coefficients are |q| <= 32767; hostile
        # streams are clipped on store (below), never wrapped
        c["coef"] = np.zeros((c["by"] * c["bx"], 64), np.int32)

    segs = _split_scan(payload, start)
    total_mcus = mcux * mcuy
    per_seg = restart_interval if restart_interval else total_mcus
    mcu = 0
    seg_idx = 0
    while mcu < total_mcus:
        if seg_idx >= len(segs):
            raise ValueError("JPEG scan ended before all MCUs decoded")
        reader = _BitReader(segs[seg_idx])
        preds = [0] * ncomp
        for _ in range(min(per_seg, total_mcus - mcu)):
            my, mx = divmod(mcu, mcux)
            for ci, c in enumerate(comps):
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        blk = np.zeros(64, np.int64)
                        # DC (size from a hostile DHT can be any byte;
                        # legal baseline categories are <= 16)
                        size = reader.decode(c["dc_tab"])
                        if size > 16:
                            raise ValueError("invalid JPEG DC size category")
                        diff = _extend(reader.receive(size), size)
                        preds[ci] += diff
                        blk[0] = preds[ci]
                        # AC
                        k = 1
                        while k < 64:
                            rs = reader.decode(c["ac_tab"])
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC index overflow")
                            blk[k] = _extend(reader.receive(s), s)
                            k += 1
                        row = my * c["v"] + by
                        col = mx * c["h"] + bx
                        c["coef"][row * c["bx"] + col] = np.clip(
                            blk, -(1 << 30), 1 << 30
                        )
            mcu += 1
        seg_idx += 1

    return _assemble_image(comps, qt, hmax, vmax, h, w, ncomp)


def _assemble_image(comps, qt, hmax, vmax, h, w, ncomp) -> np.ndarray:
    """Dequantize + de-zigzag + IDCT + upsample + color-convert the decoded
    coefficient grids — shared by the baseline and progressive paths."""
    planes = []
    for c in comps:
        dq = c["coef"].astype(np.int64) * qt[c["tq"]][None, :]  # zigzag order
        c["coef"] = None  # release before the next allocation
        blocks = np.zeros((len(dq), 64), np.float32)
        blocks[:, ZIGZAG] = dq  # de-zigzag to row-major
        del dq
        spatial = _idct_blocks(blocks.reshape(-1, 8, 8))
        del blocks
        plane = (
            spatial.reshape(c["by"], c["bx"], 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(c["by"] * 8, c["bx"] * 8)
        )
        # upsample to full resolution by replication, crop to frame dims
        plane = np.repeat(
            np.repeat(plane, vmax // c["v"], axis=0), hmax // c["h"], axis=1
        )[:h, :w]
        planes.append(plane.astype(np.float32))

    if ncomp == 1:
        return np.repeat(
            planes[0].astype(np.uint8)[:, :, None], 3, axis=2
        )
    y, cb, cr = planes
    r = y + np.float32(1.402) * (cr - np.float32(128))
    g = (y - np.float32(0.344136) * (cb - np.float32(128))
         - np.float32(0.714136) * (cr - np.float32(128)))
    b = y + np.float32(1.772) * (cb - np.float32(128))
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# Encoder (test/fixture twin)
# ---------------------------------------------------------------------------


def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """libjpeg quality scaling of the Annex-K tables."""
    quality = min(max(int(quality), 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    def sc(base):
        return np.clip((base * scale + 50) // 100, 1, 255)
    return sc(QT_LUMA), sc(QT_CHROMA)


def _encode_tables() -> dict:
    """Self-built canonical Huffman tables: 12 DC symbols at 4 bits, 162 AC
    symbols at 8 bits (EOB, ZRL, run 0-15 x size 1-10). Any valid DHT is
    legal JPEG; fixed-length canonical codes skip the Annex-K code lists."""
    dc_syms = list(range(12))
    ac_syms = [0x00, 0xF0] + [
        (r << 4) | s for r in range(16) for s in range(1, 11)
    ]
    def canon(syms, length):
        return {s: (length, i) for i, s in enumerate(sorted(syms))}
    dc_bits = [0] * 16
    dc_bits[3] = len(dc_syms)  # all length 4
    ac_bits = [0] * 16
    ac_bits[7] = len(ac_syms)  # all length 8
    return {
        "dc_enc": canon(dc_syms, 4),
        "ac_enc": canon(ac_syms, 8),
        "dc_dht": (dc_bits, bytes(sorted(dc_syms))),
        "ac_dht": (ac_bits, bytes(sorted(ac_syms))),
    }


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int):
        if n == 0:
            return
        self.acc = (self.acc << n) | (value & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # stuffing
        self.acc &= (1 << self.nbits) - 1

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)


def _csize(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _mag_bits(v: int, size: int) -> int:
    return v if v >= 0 else v + (1 << size) - 1


def _plane_blocks(plane: np.ndarray) -> np.ndarray:
    """HxW (multiple of 8) -> (n_blocks, 8, 8) in raster block order."""
    by, bx = plane.shape[0] // 8, plane.shape[1] // 8
    return (
        plane.reshape(by, 8, bx, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    )


def _quantize_planes(img: np.ndarray, quality: int, subsample: str):
    """Color-convert, subsample, pad, DCT, and quantize — the shared front
    half of the baseline and progressive encoders. Returns
    (comp_blocks, samp, h, w, mcux, mcuy, qt_l, qt_c, gray): comp_blocks
    are (n_blocks, 64) zigzag-ordered int64 grids per component."""
    gray = img.ndim == 2
    if gray:
        img = img[:, :, None]
    h, w = img.shape[:2]
    if subsample not in ("444", "420"):
        raise ValueError("subsample must be '444' or '420'")
    sub = 2 if (subsample == "420" and not gray) else 1
    qt_l, qt_c = _quality_tables(quality)

    if gray:
        y = img[:, :, 0].astype(np.float64)
        planes = [y]
        samp = [(1, 1)]
    else:
        rgb = img.astype(np.float64)
        r, g, b = rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        planes = [y, cb, cr]
        samp = [(sub, sub), (1, 1), (1, 1)]
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    comp_blocks = []
    for ci, (p, (sh, sv)) in enumerate(zip(planes, samp)):
        # downsample chroma by box mean, then pad to the MCU grid by edge
        # replication
        if (sh, sv) != (hmax, vmax):
            fh, fv = hmax // sh, vmax // sv
            ph = -(-p.shape[0] // fv) * fv
            pw = -(-p.shape[1] // fh) * fh
            pp = np.pad(
                p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])), mode="edge"
            )
            p = pp.reshape(ph // fv, fv, pw // fh, fh).mean(axis=(1, 3))
        th = mcuy * sv * 8
        tw = mcux * sh * 8
        p = np.pad(
            p, ((0, th - p.shape[0]), (0, tw - p.shape[1])), mode="edge"
        )
        qtab = qt_l if ci == 0 else qt_c
        blocks8 = _plane_blocks(np.clip(np.round(p), 0, 255).astype(np.uint8))
        coefs = _dct_blocks(blocks8)
        # zigzag-order the coefficients and divisors; clamp magnitudes to the
        # baseline limit (AC size <= 10, DC diff size <= 11)
        quant = np.round(
            coefs.reshape(-1, 64)[:, ZIGZAG] / qtab[ZIGZAG][None, :]
        ).astype(np.int64)
        quant = np.clip(quant, -1023, 1023)
        comp_blocks.append(quant)  # (n_blocks, 64) zigzag order
    return comp_blocks, samp, h, w, mcux, mcuy, qt_l, qt_c, gray


def _write_headers(out, sof_marker, comp_blocks, samp, h, w, qt_l, qt_c,
                   gray, tabs, restart_interval):
    """APP0 + DQT + SOF + DHT (+DRI) — shared by both encoders."""
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" \
        + struct.pack(">HHBB", 1, 1, 0, 0)  # APP0

    def dqt(tq, table):
        body = bytes([tq]) + bytes(int(v) for v in table[ZIGZAG])
        return b"\xff\xdb" + struct.pack(">H", 2 + len(body)) + body

    out += dqt(0, qt_l)
    if not gray:
        out += dqt(1, qt_c)

    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for i in range(ncomp):
        sh, sv = samp[i]
        sof += bytes([i + 1, (sh << 4) | sv, 0 if i == 0 else 1])
    out += sof_marker + struct.pack(">H", 2 + len(sof)) + sof

    for tc, key in ((0, "dc_dht"), (1, "ac_dht")):
        bits, vals = tabs[key]
        body = bytes([tc << 4]) + bytes(bits) + vals
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body

    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    return ncomp


def encode_jpeg(
    img: np.ndarray,
    quality: int = 90,
    subsample: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """HxWx3 RGB (or HxW gray) uint8 -> baseline JFIF bytes.
    ``subsample``: '444' or '420'; ``restart_interval``: MCUs per RSTn
    segment (0 = none)."""
    comp_blocks, samp, h, w, mcux, mcuy, qt_l, qt_c, gray = _quantize_planes(
        img, quality, subsample
    )
    tabs = _encode_tables()

    # --- assemble the stream -------------------------------------------------
    out = bytearray(b"\xff\xd8")  # SOI
    ncomp = _write_headers(
        out, b"\xff\xc0", comp_blocks, samp, h, w, qt_l, qt_c, gray, tabs,
        restart_interval,
    )

    sos = bytes([ncomp])
    for i in range(ncomp):
        sos += bytes([i + 1, 0x00])  # same DC/AC table ids for all comps
    sos += b"\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    dc_enc, ac_enc = tabs["dc_enc"], tabs["ac_enc"]
    writer = _BitWriter()
    preds = [0] * ncomp
    total_mcus = mcux * mcuy
    rst = 0
    blocks_x = [mcux * s[0] for s in samp]
    for mcu in range(total_mcus):
        if restart_interval and mcu and mcu % restart_interval == 0:
            writer.flush()
            out += writer.out
            out += bytes([0xFF, 0xD0 + (rst & 7)])
            rst += 1
            writer = _BitWriter()
            preds = [0] * ncomp
        my, mx = divmod(mcu, mcux)
        for ci in range(ncomp):
            sh, sv = samp[ci]
            for by in range(sv):
                for bx in range(sh):
                    row = my * sv + by
                    col = mx * sh + bx
                    blk = comp_blocks[ci][row * blocks_x[ci] + col]
                    diff = int(blk[0]) - preds[ci]
                    preds[ci] = int(blk[0])
                    size = _csize(diff)
                    ln, code = dc_enc[size]
                    writer.write(code, ln)
                    writer.write(_mag_bits(diff, size), size)
                    run = 0
                    nz = np.nonzero(blk[1:])[0]
                    last = nz[-1] + 1 if len(nz) else 0
                    for k in range(1, last + 1):
                        v = int(blk[k])
                        if v == 0:
                            run += 1
                            continue
                        while run > 15:
                            ln, code = ac_enc[0xF0]
                            writer.write(code, ln)
                            run -= 16
                        s = _csize(v)
                        ln, code = ac_enc[(run << 4) | s]
                        writer.write(code, ln)
                        writer.write(_mag_bits(v, s), s)
                        run = 0
                    if last < 63:
                        ln, code = ac_enc[0x00]  # EOB
                        writer.write(code, ln)
    writer.flush()
    out += writer.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# Progressive encoder (test/fixture twin for the progressive decode path)
# ---------------------------------------------------------------------------


def _prog_write_dc_first(writer, comp_blocks, samp, mcux, mcuy, al,
                         dc_enc):
    """Interleaved DC-first scan: diff-code (DC >> al) per G.1.2.1 (the DC
    point transform is an ARITHMETIC shift of the signed value)."""
    ncomp = len(comp_blocks)
    preds = [0] * ncomp
    blocks_x = [mcux * s[0] for s in samp]
    for mcu in range(mcux * mcuy):
        my, mx = divmod(mcu, mcux)
        for ci in range(ncomp):
            sh, sv = samp[ci]
            for by in range(sv):
                for bx in range(sh):
                    row = my * sv + by
                    col = mx * sh + bx
                    dc = int(comp_blocks[ci][row * blocks_x[ci] + col, 0])
                    v = dc >> al
                    diff = v - preds[ci]
                    preds[ci] = v
                    size = _csize(diff)
                    ln, code = dc_enc[size]
                    writer.write(code, ln)
                    writer.write(_mag_bits(diff, size), size)


def _prog_write_dc_refine(writer, comp_blocks, samp, mcux, mcuy, al):
    """Interleaved DC refinement: one raw bit per block — bit ``al`` of the
    two's-complement DC value."""
    ncomp = len(comp_blocks)
    blocks_x = [mcux * s[0] for s in samp]
    for mcu in range(mcux * mcuy):
        my, mx = divmod(mcu, mcux)
        for ci in range(ncomp):
            sh, sv = samp[ci]
            for by in range(sv):
                for bx in range(sh):
                    row = my * sv + by
                    col = mx * sh + bx
                    dc = int(comp_blocks[ci][row * blocks_x[ci] + col, 0])
                    writer.write((dc >> al) & 1, 1)


def _prog_write_ac_first(writer, blocks, ss, se, al, ac_enc):
    """Non-interleaved AC-first scan: baseline-style runs banded to
    [ss, se] on the point-transformed values sign*(|v|>>al). All-zero bands
    emit EOB (an EOB run of 1 — always legal, no EOBn table entries
    needed)."""
    for blk in blocks:
        vals = []
        for k in range(ss, se + 1):
            v = int(blk[k])
            a = abs(v) >> al
            vals.append(a if v >= 0 else -a)
        nz = [i for i, v in enumerate(vals) if v]
        if not nz:
            ln, code = ac_enc[0x00]  # EOB
            writer.write(code, ln)
            continue
        run = 0
        for i in range(nz[-1] + 1):
            v = vals[i]
            if v == 0:
                run += 1
                continue
            while run > 15:
                ln, code = ac_enc[0xF0]  # ZRL
                writer.write(code, ln)
                run -= 16
            s = _csize(v)
            ln, code = ac_enc[(run << 4) | s]
            writer.write(code, ln)
            writer.write(_mag_bits(v, s), s)
            run = 0
        if nz[-1] < se - ss:
            ln, code = ac_enc[0x00]  # EOB
            writer.write(code, ln)


def _prog_write_ac_refine(writer, blocks, ss, se, al, ac_enc):
    """Non-interleaved AC refinement scan (G.1.2.3 encoder side): newly
    significant coefficients as (run,1)+sign; one correction bit for every
    nonzero-history coefficient the decoder's walk passes over, attached to
    the symbol whose walk covers it (ZRL segments split the run at every
    16th zero-history position)."""
    for blk in blocks:
        # per position: history (|v| at the coarser precision), target bit
        hist = []
        for k in range(ss, se + 1):
            v = int(blk[k])
            a = abs(v)
            hist.append((a >> (al + 1), (a >> al) & 1, v > 0))
        i = 0
        nband = se - ss + 1
        while i < nband:
            # walk to the next newly-significant coefficient, splitting into
            # ZRL segments at every 16th zero-history position
            zrl_segs = []   # list of correction-bit lists, one per ZRL
            corr = []       # corrections since the last emitted symbol
            z = 0
            j = i
            found = None
            while j < nband:
                h, bit, pos = hist[j]
                if h:
                    corr.append(bit)
                elif bit == 0:
                    if z == 15:
                        zrl_segs.append(corr)
                        corr = []
                        z = 0
                    else:
                        z += 1
                else:  # newly significant (h == 0, bit == 1)
                    found = j
                    break
                j += 1
            if found is None:
                # rest of band: EOB covers it (decoder reads a correction
                # bit for every remaining nonzero-history coefficient, ZRL
                # segmentation does not apply)
                if i < nband:
                    ln, code = ac_enc[0x00]
                    writer.write(code, ln)
                    for seg in zrl_segs:
                        for b in seg:
                            writer.write(b, 1)
                    for b in corr:
                        writer.write(b, 1)
                break
            for seg in zrl_segs:
                ln, code = ac_enc[0xF0]
                writer.write(code, ln)
                for b in seg:
                    writer.write(b, 1)
            ln, code = ac_enc[(z << 4) | 1]
            writer.write(code, ln)
            writer.write(1 if hist[found][2] else 0, 1)
            for b in corr:
                writer.write(b, 1)
            i = found + 1


def encode_jpeg_progressive(
    img: np.ndarray, quality: int = 90, subsample: str = "444"
) -> bytes:
    """HxWx3 RGB (or HxW gray) uint8 -> PROGRESSIVE (SOF2) JFIF bytes.

    Scan script exercises every progressive scan type the decoder supports:
    interleaved DC first at Al=1, DC refinement, then per component two
    spectral AC bands (1-5, 6-63) first at Al=1 and refined to Al=0.
    Quantized coefficients are identical to :func:`encode_jpeg` at the same
    (quality, subsample), so progressive decode must reproduce the baseline
    decode EXACTLY — the property the round-trip tests pin."""
    comp_blocks, samp, h, w, mcux, mcuy, qt_l, qt_c, gray = _quantize_planes(
        img, quality, subsample
    )
    tabs = _encode_tables()
    dc_enc, ac_enc = tabs["dc_enc"], tabs["ac_enc"]
    ncomp = len(comp_blocks)

    out = bytearray(b"\xff\xd8")  # SOI
    _write_headers(
        out, b"\xff\xc2", comp_blocks, samp, h, w, qt_l, qt_c, gray, tabs, 0
    )

    def sos(comp_ids, ss, se, ah, al):
        body = bytes([len(comp_ids)])
        for cid in comp_ids:
            body += bytes([cid, 0x00])
        body += bytes([ss, se, (ah << 4) | al])
        return b"\xff\xda" + struct.pack(">H", 2 + len(body)) + body

    def comp_scan_blocks(ci):
        """The blocks a non-interleaved scan iterates: the component's OWN
        sample grid (nbx x nby), row-major, indexed into the full MCU grid."""
        sh, sv = samp[ci]
        hmax = max(s[0] for s in samp)
        vmax = max(s[1] for s in samp)
        bxf = mcux * sh  # full-grid row stride
        nbx = -(-(-(-w * sh // hmax)) // 8)
        nby = -(-(-(-h * sv // vmax)) // 8)
        return [
            comp_blocks[ci][my * bxf + mx]
            for my in range(nby) for mx in range(nbx)
        ]

    # scan 1: DC first, all components interleaved, Al=1
    out += sos(list(range(1, ncomp + 1)), 0, 0, 0, 1)
    writer = _BitWriter()
    _prog_write_dc_first(writer, comp_blocks, samp, mcux, mcuy, 1, dc_enc)
    writer.flush()
    out += writer.out

    # scan 2: DC refinement to full precision
    out += sos(list(range(1, ncomp + 1)), 0, 0, 1, 0)
    writer = _BitWriter()
    _prog_write_dc_refine(writer, comp_blocks, samp, mcux, mcuy, 0)
    writer.flush()
    out += writer.out

    # scans 3..: AC bands, first pass at Al=1 then refinement to Al=0
    bands = [(1, 5), (6, 63)]
    for ci in range(ncomp):
        blocks = comp_scan_blocks(ci)
        for ss, se in bands:
            out += sos([ci + 1], ss, se, 0, 1)
            writer = _BitWriter()
            _prog_write_ac_first(writer, blocks, ss, se, 1, ac_enc)
            writer.flush()
            out += writer.out
    for ci in range(ncomp):
        blocks = comp_scan_blocks(ci)
        for ss, se in bands:
            out += sos([ci + 1], ss, se, 1, 0)
            writer = _BitWriter()
            _prog_write_ac_refine(writer, blocks, ss, se, 0, ac_enc)
            writer.flush()
            out += writer.out

    out += b"\xff\xd9"  # EOI
    return bytes(out)
