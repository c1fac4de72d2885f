"""From-scratch Avro Object Container File reader/writer (stdlib only).

Exists to read (and, for test fixtures, write) Apache Iceberg manifest and
manifest-list files — Iceberg's only non-JSON, non-parquet metadata format —
without the Iceberg jars or an avro library, neither of which is in this
container. Implements the Avro 1.11 spec subset those files use:

* container format: magic ``Obj\\x01``, file-metadata map (embedded writer
  schema JSON + codec), 16-byte sync marker, data blocks
  (count, byte-size, payload, sync), codecs ``null`` and ``deflate``
* binary encoding: zigzag-varint int/long, little-endian float/double,
  length-prefixed bytes/string, records (fields in schema order), unions
  (zigzag branch index + value), arrays/maps (blocked), fixed, enum

The reader is schema-driven from the EMBEDDED writer schema, so any
real-world Iceberg manifest decodes regardless of spec version; logical
types are ignored (values surface raw). Spec: avro.apache.org/docs/1.11.1/
specification/ (public).
"""

from __future__ import annotations

import io
import json
import struct
import zlib

_MAGIC = b"Obj\x01"


# ---------------------------------------------------------------------------
# binary primitives
# ---------------------------------------------------------------------------


def _read_long(buf: io.BytesIO) -> int:
    shift = 0
    acc = 0
    while True:
        b = buf.read(1)
        if not b:
            raise ValueError("truncated avro varint")
        v = b[0]
        acc |= (v & 0x7F) << shift
        if not v & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1)  # zigzag


def _write_long(out: bytearray, v: int) -> None:
    u = (v << 1) ^ (v >> 63)  # zigzag (python ints: arithmetic shift ok)
    u &= (1 << 64) - 1
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            break


def _read_bytes(buf: io.BytesIO) -> bytes:
    n = _read_long(buf)
    if n < 0:
        raise ValueError("negative avro byte length")
    data = buf.read(n)
    if len(data) != n:
        raise ValueError("truncated avro bytes")
    return data


# ---------------------------------------------------------------------------
# schema-driven decode
# ---------------------------------------------------------------------------


def _register_names(schema, names: dict) -> None:
    """Pre-walk a writer schema registering every named type (record /
    fixed / enum), under both its short name and its namespace-qualified
    full name. Lazy registration during decode was a latent hole: a named
    type defined only inside a union branch never taken for the first
    records (e.g. a null-first optional record) made later by-name
    references fail with 'unknown avro type'."""
    if isinstance(schema, list):
        for s in schema:
            _register_names(s, names)
        return
    if not isinstance(schema, dict):
        return
    t = schema.get("type")
    name = schema.get("name")
    if t in ("record", "fixed", "enum") and name:
        names[name] = schema
        ns = schema.get("namespace")
        if ns:
            names[f"{ns}.{name}"] = schema
        if "." in name:  # name may itself be a fullname (spec allows)
            names[name.rsplit(".", 1)[1]] = schema
    if t == "record":
        for f in schema.get("fields", []):
            _register_names(f.get("type"), names)
    elif t == "array":
        _register_names(schema.get("items"), names)
    elif t == "map":
        _register_names(schema.get("values"), names)
    elif isinstance(t, (dict, list)):
        _register_names(t, names)


def _decode(schema, buf: io.BytesIO, names: dict):
    if isinstance(schema, str):
        if schema in names:
            schema = names[schema]
        else:
            t = schema
            if t == "null":
                return None
            if t == "boolean":
                return buf.read(1) == b"\x01"
            if t in ("int", "long"):
                return _read_long(buf)
            if t == "float":
                return struct.unpack("<f", buf.read(4))[0]
            if t == "double":
                return struct.unpack("<d", buf.read(8))[0]
            if t == "bytes":
                return _read_bytes(buf)
            if t == "string":
                return _read_bytes(buf).decode("utf-8")
            raise ValueError(f"unknown avro type {t!r}")
    if isinstance(schema, list):  # union
        idx = _read_long(buf)
        if not 0 <= idx < len(schema):
            raise ValueError("avro union branch out of range")
        return _decode(schema[idx], buf, names)
    t = schema["type"]
    if t == "record":
        if schema.get("name"):
            names[schema["name"]] = schema
        out = {}
        for f in schema["fields"]:
            out[f["name"]] = _decode(f["type"], buf, names)
        return out
    if t == "array":
        items = []
        while True:
            n = _read_long(buf)
            if n == 0:
                break
            if n < 0:  # block with byte size
                n = -n
                _read_long(buf)
            for _ in range(n):
                items.append(_decode(schema["items"], buf, names))
        return items
    if t == "map":
        out = {}
        while True:
            n = _read_long(buf)
            if n == 0:
                break
            if n < 0:
                n = -n
                _read_long(buf)
            for _ in range(n):
                k = _read_bytes(buf).decode("utf-8")
                out[k] = _decode(schema["values"], buf, names)
        return out
    if t == "fixed":
        if schema.get("name"):
            names[schema["name"]] = schema
        return buf.read(int(schema["size"]))
    if t == "enum":
        if schema.get("name"):
            names[schema["name"]] = schema
        return schema["symbols"][_read_long(buf)]
    return _decode(t, buf, names)  # nested named/primitive reference


def read_avro_meta(path: str) -> dict:
    """The container's file-metadata map (bytes values) — Iceberg stores
    spec-required keys (schema, partition-spec, format-version) here."""
    with open(path, "rb") as f:
        raw = f.read(1 << 20)
    buf = io.BytesIO(raw)
    if buf.read(4) != _MAGIC:
        raise ValueError("not an avro object container file")
    return _decode({"type": "map", "values": "bytes"}, buf, {})


def read_avro(path: str) -> list[dict]:
    """Decode every record of an Avro Object Container File."""
    with open(path, "rb") as f:
        raw = f.read()
    buf = io.BytesIO(raw)
    if buf.read(4) != _MAGIC:
        raise ValueError("not an avro object container file")
    meta_schema = {"type": "map", "values": "bytes"}
    meta = _decode(meta_schema, buf, {})
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported avro codec {codec!r}")
    names: dict = {}
    _register_names(schema, names)
    sync = buf.read(16)
    records: list[dict] = []
    while True:
        head = buf.read(1)
        if not head:
            break
        buf.seek(-1, io.SEEK_CUR)
        n = _read_long(buf)
        size = _read_long(buf)
        block = buf.read(size)
        if len(block) != size:
            raise ValueError("truncated avro block")
        if codec == "deflate":
            block = zlib.decompress(block, -15)
        bbuf = io.BytesIO(block)
        for _ in range(n):
            records.append(_decode(schema, bbuf, dict(names)))
        if buf.read(16) != sync:
            raise ValueError("avro sync marker mismatch")
    return records


# ---------------------------------------------------------------------------
# schema-driven encode (test-fixture twin)
# ---------------------------------------------------------------------------


def _encode(schema, value, out: bytearray, names: dict) -> None:
    if isinstance(schema, str):
        if schema in names:
            schema = names[schema]
        else:
            t = schema
            if t == "null":
                return
            if t == "boolean":
                out.append(1 if value else 0)
                return
            if t in ("int", "long"):
                _write_long(out, int(value))
                return
            if t == "float":
                out.extend(struct.pack("<f", value))
                return
            if t == "double":
                out.extend(struct.pack("<d", value))
                return
            if t in ("bytes", "string"):
                b = value.encode("utf-8") if isinstance(value, str) else bytes(value)
                _write_long(out, len(b))
                out.extend(b)
                return
            raise ValueError(f"unknown avro type {t!r}")
    if isinstance(schema, list):  # union: pick the first matching branch
        for idx, branch in enumerate(schema):
            bt = branch if isinstance(branch, str) else branch.get("type")
            if value is None and bt == "null":
                _write_long(out, idx)
                return
            if value is not None and bt != "null":
                _write_long(out, idx)
                _encode(branch, value, out, names)
                return
        raise ValueError("no matching avro union branch")
    t = schema["type"]
    if t == "record":
        if schema.get("name"):
            names[schema["name"]] = schema
        for f in schema["fields"]:
            _encode(f["type"], value.get(f["name"]), out, names)
        return
    if t == "array":
        if value:
            _write_long(out, len(value))
            for item in value:
                _encode(schema["items"], item, out, names)
        _write_long(out, 0)
        return
    if t == "map":
        if value:
            _write_long(out, len(value))
            for k, v in value.items():
                _encode("string", k, out, names)
                _encode(schema["values"], v, out, names)
        _write_long(out, 0)
        return
    if t == "fixed":
        out.extend(bytes(value))
        return
    _encode(t, value, out, names)


def write_avro(path: str, schema: dict, records: list[dict],
               codec: str = "deflate",
               extra_meta: dict | None = None) -> None:
    """Write an Avro Object Container File (test-fixture twin of read_avro).
    ``extra_meta``: additional file-metadata entries (str or bytes values) —
    Iceberg manifests carry spec-required keys like ``schema`` and
    ``format-version`` here."""
    body = bytearray()
    wnames: dict = {}
    _register_names(schema, wnames)
    for r in records:
        _encode(schema, r, body, dict(wnames))
    block = bytes(body)
    if codec == "deflate":
        co = zlib.compressobj(6, zlib.DEFLATED, -15)
        block = co.compress(block) + co.flush()
    elif codec != "null":
        raise ValueError(f"unsupported avro codec {codec!r}")
    import hashlib

    sync = hashlib.md5(json.dumps(schema).encode()).digest()
    out = bytearray(_MAGIC)
    meta = {
        "avro.schema": json.dumps(schema).encode(),
        "avro.codec": codec.encode(),
    }
    for k, v in (extra_meta or {}).items():
        meta[k] = v.encode() if isinstance(v, str) else bytes(v)
    _write_long(out, len(meta))
    for k, v in meta.items():
        _encode("string", k, out, {})
        _encode("bytes", v, out, {})
    _write_long(out, 0)
    out.extend(sync)
    _write_long(out, len(records))
    _write_long(out, len(block))
    out.extend(block)
    out.extend(sync)
    with open(path, "wb") as f:
        f.write(bytes(out))
