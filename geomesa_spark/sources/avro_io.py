"""Avro object-container-file codec, from scratch (Apache Avro 1.12
spec, "Object Container Files" + binary encoding) — no avro package,
no spark-avro jar.

Why it exists: SURVEY.md §2.1 — the reference's converter framework
ingests delimited/JSON/XML/Avro, and its export pipeline writes Avro.
This sandbox's Spark has the avro *core* jars but not the
``spark-avro`` datasource module, and there is no network to deploy it,
so ``converters.convert(format="avro")`` first probes the native
datasource (one jar deploy away on a real cluster — the documented swap
point) and falls back to this decoder over ``binaryFile`` +
``mapInPandas``: one executor task per container file, the natural unit
(real Avro ingest is many files; a 100-TB ingest parallelizes across
files, never within one).

Supported schema surface (the flat-record shapes converter specs
consume): records of null / boolean / int / long / float / double /
string / bytes / enum / fixed, unions with null, arrays and maps of
primitives, nested records (flattened by the caller's field exprs).
Codecs: ``null`` and ``deflate`` (raw zlib, wbits=-15 per spec).

Everything here is pure functions over ``bytes`` — unit-testable
without Spark, reusable driver- or executor-side.
"""

from __future__ import annotations

import io
import json
import struct
import zlib

MAGIC = b"Obj\x01"


# ---------------------------------------------------------------------------
# binary primitives (Avro spec: zigzag varint longs, LE floats, len-prefixed)
# ---------------------------------------------------------------------------


def _read_long(b: io.BytesIO) -> int:
    n, shift = 0, 0
    while True:
        byte = b.read(1)
        if not byte:
            raise EOFError("truncated varint")
        v = byte[0]
        n |= (v & 0x7F) << shift
        if not v & 0x80:
            break
        shift += 7
    return (n >> 1) ^ -(n & 1)  # zigzag


def _write_long(out: bytearray, v: int) -> None:
    # zigzag: python's arithmetic >> keeps this exact for negatives
    # (v >> 63 is -1 for v < 0, XOR with -1 = bitwise NOT → -2v-1)
    n = (v << 1) ^ (v >> 63)
    while True:
        if n & ~0x7F:
            out.append((n & 0x7F) | 0x80)
            n >>= 7
        else:
            out.append(n)
            return


def _read_bytes(b: io.BytesIO) -> bytes:
    ln = _read_long(b)
    data = b.read(ln)
    if len(data) != ln:
        raise EOFError("truncated bytes")
    return data


def _write_bytes(out: bytearray, data: bytes) -> None:
    _write_long(out, len(data))
    out.extend(data)


# ---------------------------------------------------------------------------
# schema-driven value decode/encode
# ---------------------------------------------------------------------------


def _norm(schema):
    """Normalize a schema node to a dict with a 'type' key."""
    if isinstance(schema, str):
        return {"type": schema}
    if isinstance(schema, list):
        return {"type": "union", "branches": schema}
    return schema


def _decode(schema, b: io.BytesIO, names: dict):
    s = _norm(schema)
    t = s["type"]
    if t in names:  # named-type reference (record/enum/fixed by name)
        s = names[t]
        t = s["type"]
    if t == "null":
        return None
    if t == "boolean":
        return b.read(1)[0] != 0
    if t in ("int", "long"):
        return _read_long(b)
    if t == "float":
        return struct.unpack("<f", b.read(4))[0]
    if t == "double":
        return struct.unpack("<d", b.read(8))[0]
    if t == "bytes":
        return _read_bytes(b)
    if t == "string":
        return _read_bytes(b).decode("utf-8")
    if t == "union" or isinstance(schema, list):
        branches = s.get("branches", schema if isinstance(schema, list) else None)
        idx = _read_long(b)
        return _decode(branches[idx], b, names)
    if t == "record":
        names[s["name"]] = s
        return {f["name"]: _decode(f["type"], b, names) for f in s["fields"]}
    if t == "enum":
        names[s["name"]] = s
        return s["symbols"][_read_long(b)]
    if t == "fixed":
        names[s["name"]] = s
        return b.read(int(s["size"]))
    if t == "array":
        out = []
        while True:
            n = _read_long(b)
            if n == 0:
                return out
            if n < 0:  # block with byte-size prefix
                n = -n
                _read_long(b)
            for _ in range(n):
                out.append(_decode(s["items"], b, names))
    if t == "map":
        out = {}
        while True:
            n = _read_long(b)
            if n == 0:
                return out
            if n < 0:
                n = -n
                _read_long(b)
            for _ in range(n):
                k = _read_bytes(b).decode("utf-8")
                out[k] = _decode(s["values"], b, names)
    raise ValueError(f"unsupported avro type: {t!r}")


def _encode(schema, v, out: bytearray, names: dict) -> None:
    s = _norm(schema)
    t = s["type"]
    if t in names:
        s = names[t]
        t = s["type"]
    if t == "null":
        return
    if t == "boolean":
        out.append(1 if v else 0)
    elif t in ("int", "long"):
        _write_long(out, int(v))
    elif t == "float":
        out.extend(struct.pack("<f", float(v)))
    elif t == "double":
        out.extend(struct.pack("<d", float(v)))
    elif t == "bytes":
        _write_bytes(out, bytes(v))
    elif t == "string":
        _write_bytes(out, str(v).encode("utf-8"))
    elif t == "union" or isinstance(schema, list):
        branches = s.get("branches", schema if isinstance(schema, list) else None)
        # writer rule: null goes to the null branch, else first non-null
        for i, br in enumerate(branches):
            bt = _norm(br)["type"]
            if (v is None) == (bt == "null"):
                _write_long(out, i)
                _encode(br, v, out, names)
                return
        raise ValueError("no matching union branch")
    elif t == "record":
        names[s["name"]] = s
        for f in s["fields"]:
            _encode(f["type"], v[f["name"]], out, names)
    elif t == "enum":
        names[s["name"]] = s
        _write_long(out, s["symbols"].index(v))
    elif t == "fixed":
        names[s["name"]] = s
        out.extend(bytes(v))
    elif t == "array":
        if v:
            _write_long(out, len(v))
            for item in v:
                _encode(s["items"], item, out, names)
        _write_long(out, 0)
    elif t == "map":
        if v:
            _write_long(out, len(v))
            for k, val in v.items():
                _write_bytes(out, str(k).encode("utf-8"))
                _encode(s["values"], val, out, names)
        _write_long(out, 0)
    else:
        raise ValueError(f"unsupported avro type: {t!r}")


# ---------------------------------------------------------------------------
# container files
# ---------------------------------------------------------------------------


def parse_container(buf: bytes) -> tuple[dict, list]:
    """One Avro object container file → (writer schema, decoded rows)."""
    b = io.BytesIO(buf)
    if b.read(4) != MAGIC:
        raise ValueError("not an Avro object container file (bad magic)")
    meta = _decode({"type": "map", "values": "bytes"}, b, {})
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported avro codec: {codec!r} (null/deflate only)")
    sync = b.read(16)
    rows = []
    while True:
        head = b.read(1)
        if not head:
            break  # clean EOF at a block boundary
        b.seek(-1, io.SEEK_CUR)
        count = _read_long(b)
        size = _read_long(b)
        block = b.read(size)
        if len(block) != size:
            raise EOFError("truncated block")
        if codec == "deflate":
            block = zlib.decompress(block, wbits=-15)
        bb = io.BytesIO(block)
        names: dict = {}
        for _ in range(count):
            rows.append(_decode(schema, bb, names))
        if b.read(16) != sync:
            raise ValueError("sync marker mismatch (corrupt container)")
    return schema, rows


def write_container(schema: dict, rows: list, codec: str = "deflate") -> bytes:
    """Rows (dicts matching ``schema``) → one Avro container file's bytes.

    Deterministic (fixed sync marker derived from the schema text) so
    export outputs are stable across runs — the property every other
    export path in this repo keeps."""
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported avro codec: {codec!r}")
    schema_json = json.dumps(schema, sort_keys=True).encode("utf-8")
    import hashlib

    sync = hashlib.md5(b"geomesa-spark-avro|" + schema_json).digest()
    out = bytearray()
    out.extend(MAGIC)
    meta = {"avro.schema": schema_json, "avro.codec": codec.encode("utf-8")}
    _encode({"type": "map", "values": "bytes"}, meta, out, {})
    out.extend(sync)
    if rows:
        body = bytearray()
        names: dict = {}
        for r in rows:
            _encode(schema, r, body, names)
        payload = bytes(body)
        if codec == "deflate":
            co = zlib.compressobj(wbits=-15)
            payload = co.compress(payload) + co.flush()
        _write_long(out, len(rows))
        _write_long(out, len(payload))
        out.extend(payload)
        out.extend(sync)
    return bytes(out)


def spark_type_for(schema) -> str:
    """Avro schema node → Spark SQL type string (for mapInPandas output)."""
    s = _norm(schema)
    t = s["type"]
    if t == "union" or isinstance(schema, list):
        branches = s.get("branches", schema if isinstance(schema, list) else None)
        non_null = [x for x in branches if _norm(x)["type"] != "null"]
        if len(non_null) != 1:
            raise ValueError("only unions with null are supported")
        return spark_type_for(non_null[0])
    return {
        "null": "string",
        "boolean": "boolean",
        "int": "int",
        "long": "bigint",
        "float": "float",
        "double": "double",
        "bytes": "binary",
        "string": "string",
        "enum": "string",
        "fixed": "binary",
    }.get(t) or _composite_type(s)


def _composite_type(s: dict) -> str:
    t = s["type"]
    if t == "array":
        return f"array<{spark_type_for(s['items'])}>"
    if t == "map":
        return f"map<string,{spark_type_for(s['values'])}>"
    if t == "record":
        inner = ",".join(f"{f['name']}:{spark_type_for(f['type'])}" for f in s["fields"])
        return f"struct<{inner}>"
    raise ValueError(f"unsupported avro type: {t!r}")


def record_spark_schema(schema: dict) -> str:
    """Top-level record schema → Spark DDL column list."""
    if _norm(schema)["type"] != "record":
        raise ValueError("container schema must be a record")
    return ", ".join(f"{f['name']} {spark_type_for(f['type'])}" for f in schema["fields"])
