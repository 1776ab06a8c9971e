"""Prometheus remote-write wire format: snappy-compressed protobuf.

The reference's write path decodes ``POST /write`` bodies as snappy
block-format compressed ``prompb.WriteRequest`` protobufs
(``internal/write/write.go:83-101``; messages
``vendor/.../prompb/remote.pb.go`` / ``types.pb.go``):

    WriteRequest { repeated TimeSeries timeseries = 1; }
    TimeSeries   { repeated Label labels = 1; repeated Sample samples = 2; }
    Label        { string name = 1; string value = 2; }
    Sample       { double value = 1; int64 timestamp = 2; }

Both layers are simple enough to implement from the public format
specs without native libraries — important here because the decode
runs INSIDE executors (``decode_payloads``: Arrow-batched
``mapInPandas`` over a binary column), so a 1000-executor cluster
decodes bodies in parallel and only narrow sample rows enter the
shuffle. The encoder emits literal-only snappy (valid per the spec,
no backreferences) and is used by tests and demo producers.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator


# -- snappy block format ----------------------------------------------------


def _uvarint(buf: bytes, i: int) -> tuple[int, int]:
    shift = out = 0
    while True:
        b = buf[i]
        i += 1
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out, i
        shift += 7


def snappy_decompress(buf: bytes) -> bytes:
    """Snappy block format: uvarint length then literal/copy tags."""
    n, i = _uvarint(buf, 0)
    out = bytearray()
    while i < len(buf):
        tag = buf[i]
        i += 1
        kind = tag & 3
        if kind == 0:  # literal
            ln = tag >> 2
            if ln >= 60:
                extra = ln - 59
                ln = int.from_bytes(buf[i : i + extra], "little")
                i += extra
            ln += 1
            out += buf[i : i + ln]
            i += ln
        else:
            if kind == 1:  # copy, 1-byte offset
                ln = ((tag >> 2) & 0x7) + 4
                off = ((tag >> 5) << 8) | buf[i]
                i += 1
            elif kind == 2:  # copy, 2-byte offset
                ln = (tag >> 2) + 1
                off = int.from_bytes(buf[i : i + 2], "little")
                i += 2
            else:  # copy, 4-byte offset
                ln = (tag >> 2) + 1
                off = int.from_bytes(buf[i : i + 4], "little")
                i += 4
            if off == 0:
                raise ValueError("corrupt snappy: zero copy offset")
            for _ in range(ln):  # overlapping copies are legal
                out.append(out[-off])
    if len(out) != n:
        raise ValueError(f"corrupt snappy: got {len(out)} bytes, header said {n}")
    return bytes(out)


def snappy_compress_literal(data: bytes) -> bytes:
    """Spec-valid snappy using only literal tags (no matching)."""
    out = bytearray()
    n = len(data)
    # uvarint(len)
    v = n
    while True:
        b = v & 0x7F
        v >>= 7
        out.append(b | (0x80 if v else 0))
        if not v:
            break
    i = 0
    while i < n:
        chunk = data[i : i + 0xFFFF]
        ln = len(chunk) - 1
        if ln < 60:
            out.append(ln << 2)
        else:
            out.append(61 << 2)  # 2-byte length form
            out += ln.to_bytes(2, "little")
        out += chunk
        i += len(chunk)
    return bytes(out)


# -- minimal protobuf (only what prompb needs) ------------------------------


def _fields(buf: bytes) -> Iterator[tuple[int, int, bytes | int]]:
    i = 0
    while i < len(buf):
        key, i = _uvarint(buf, i)
        field, wtype = key >> 3, key & 7
        if wtype == 0:  # varint
            val, i = _uvarint(buf, i)
            yield field, wtype, val
        elif wtype == 1:  # 64-bit
            yield field, wtype, buf[i : i + 8]
            i += 8
        elif wtype == 2:  # length-delimited
            ln, i = _uvarint(buf, i)
            yield field, wtype, buf[i : i + ln]
            i += ln
        elif wtype == 5:  # 32-bit
            yield field, wtype, buf[i : i + 4]
            i += 4
        else:
            raise ValueError(f"unsupported protobuf wire type {wtype}")


def _i64(v: int) -> int:
    """Interpret a varint as two's-complement int64 (proto int64)."""
    return v - (1 << 64) if v >= (1 << 63) else v


def decode_write_request(payload: bytes, compressed: bool = True) -> list[dict]:
    """snappy+proto body → [{"labels": {...}, "samples": [[t, v], ...]}]
    (the shape ``remote_write_batch_to_samples`` accepts)."""
    buf = snappy_decompress(payload) if compressed else payload
    series = []
    for field, _, ts_buf in _fields(buf):
        if field != 1:
            continue
        labels: dict[str, str] = {}
        samples: list[list] = []
        for f2, _, val in _fields(ts_buf):
            if f2 == 1:  # Label
                name = value = ""
                for f3, _, lv in _fields(val):
                    if f3 == 1:
                        name = lv.decode("utf-8")
                    elif f3 == 2:
                        value = lv.decode("utf-8")
                labels[name] = value
            elif f2 == 2:  # Sample
                v = 0.0
                t = 0
                for f3, w3, sv in _fields(val):
                    if f3 == 1 and w3 == 1:
                        (v,) = struct.unpack("<d", sv)
                    elif f3 == 2 and w3 == 0:
                        t = _i64(sv)
                samples.append([t, v])
        series.append({"labels": labels, "samples": samples})
    return series


def _ld(field: int, body: bytes) -> bytes:
    """Length-delimited protobuf field (wire type 2)."""
    out = bytearray()
    v = (field << 3) | 2
    while True:
        b = v & 0x7F
        v >>= 7
        out.append(b | (0x80 if v else 0))
        if not v:
            break
    w = len(body)
    while True:
        b = w & 0x7F
        w >>= 7
        out.append(b | (0x80 if w else 0))
        if not w:
            break
    return bytes(out) + body


def _varint_field(field: int, val: int) -> bytes:
    """Varint protobuf field (wire type 0)."""
    out = bytearray([(field << 3) | 0])
    v = val & ((1 << 64) - 1)  # two's complement for negatives
    while True:
        b = v & 0x7F
        v >>= 7
        out.append(b | (0x80 if v else 0))
        if not v:
            break
    return bytes(out)


def _ts_bytes(labels: dict, samples: list) -> bytes:
    """prompb.TimeSeries: labels sorted by name (the reference sorts
    via labels.Labels), then samples."""
    ts = bytearray()
    for name, value in sorted(labels.items()):
        ts += _ld(1, _ld(1, name.encode()) + _ld(2, value.encode()))
    for t, v in samples:
        ts += _ld(
            2,
            bytes([0x09]) + struct.pack("<d", float(v)) + _varint_field(2, int(t)),
        )
    return bytes(ts)


def encode_write_request(series: list[dict], compress: bool = True) -> bytes:
    """Inverse of ``decode_write_request`` (tests / demo producers)."""
    body = bytearray()
    for s in series:
        body += _ld(1, _ts_bytes(s["labels"], s["samples"]))
    raw = bytes(body)
    return snappy_compress_literal(raw) if compress else raw


#: prompb.LabelMatcher.Type enum order (types.proto): EQ NEQ RE NRE.
READ_MATCH_OPS = ("=", "!=", "=~", "!~")


def decode_read_request(payload: bytes, compressed: bool = True) -> list[dict]:
    """snappy+proto ``prompb.ReadRequest`` →
    ``[{"start_ms", "end_ms", "matchers": [(op, name, value), ...]}]``
    (the shape the /read handler evaluates; reference
    ``internal/read/read.go:60-79``)."""
    buf = snappy_decompress(payload) if compressed else payload
    queries: list[dict] = []
    for field, _, qbuf in _fields(buf):
        if field != 1:
            continue
        q: dict = {"start_ms": 0, "end_ms": 0, "matchers": []}
        for f2, w2, val in _fields(qbuf):
            if f2 == 1 and w2 == 0:
                q["start_ms"] = _i64(val)
            elif f2 == 2 and w2 == 0:
                q["end_ms"] = _i64(val)
            elif f2 == 3 and w2 == 2:
                mtype = 0
                name = value = ""
                for f3, w3, mv in _fields(val):
                    if f3 == 1 and w3 == 0:
                        mtype = mv
                    elif f3 == 2:
                        name = mv.decode("utf-8")
                    elif f3 == 3:
                        value = mv.decode("utf-8")
                q["matchers"].append((READ_MATCH_OPS[mtype], name, value))
        queries.append(q)
    return queries


def encode_read_request(queries: list[dict], compress: bool = True) -> bytes:
    """Inverse of ``decode_read_request`` (tests / remote-read clients)."""
    body = bytearray()
    for q in queries:
        qb = bytearray()
        qb += _varint_field(1, int(q["start_ms"]))
        qb += _varint_field(2, int(q["end_ms"]))
        for op, name, value in q["matchers"]:
            qb += _ld(
                3,
                _varint_field(1, READ_MATCH_OPS.index(op))
                + _ld(2, name.encode())
                + _ld(3, value.encode()),
            )
        body += _ld(1, bytes(qb))
    raw = bytes(body)
    return snappy_compress_literal(raw) if compress else raw


def encode_read_response(results: list[list[dict]], compress: bool = True) -> bytes:
    """Per-query series lists → snappy+proto ``prompb.ReadResponse``
    (reference ``internal/read/read.go:107-125``). ``results[i]`` is
    the i-th query's ``[{"labels": {...}, "samples": [[t, v], ...]}]``."""
    body = bytearray()
    for series_list in results:
        qr = bytearray()
        for s in series_list:
            qr += _ld(1, _ts_bytes(s["labels"], s["samples"]))
        body += _ld(1, bytes(qr))
    raw = bytes(body)
    return snappy_compress_literal(raw) if compress else raw


def decode_read_response(payload: bytes, compressed: bool = True) -> list[list[dict]]:
    """Inverse of ``encode_read_response`` (tests / remote-read clients)."""
    buf = snappy_decompress(payload) if compressed else payload
    results: list[list[dict]] = []
    for field, _, qr_buf in _fields(buf):
        if field != 1:
            continue
        series_list: list[dict] = []
        for f2, _, ts_buf in _fields(qr_buf):
            if f2 != 1:
                continue
            labels: dict[str, str] = {}
            samples: list[list] = []
            for f3, _, val in _fields(ts_buf):
                if f3 == 1:
                    name = value = ""
                    for f4, _, lv in _fields(val):
                        if f4 == 1:
                            name = lv.decode("utf-8")
                        elif f4 == 2:
                            value = lv.decode("utf-8")
                    labels[name] = value
                elif f3 == 2:
                    v = 0.0
                    t = 0
                    for f4, w4, sv in _fields(val):
                        if f4 == 1 and w4 == 1:
                            (v,) = struct.unpack("<d", sv)
                        elif f4 == 2 and w4 == 0:
                            t = _i64(sv)
                    samples.append([t, v])
            series_list.append({"labels": labels, "samples": samples})
        results.append(series_list)
    return results


# -- distributed decode -----------------------------------------------------

WIRE_SAMPLES_SCHEMA = "labels map<string,string>, t long, v double"


def decode_payloads(payloads):
    """Binary-payload DataFrame (column ``payload``) → (labels, t, v)
    rows via Arrow-batched ``mapInPandas`` — the scale path: bodies
    decode on executors, payload bytes never enter a shuffle."""

    def run(batches):
        import pandas as pd

        for pdf in batches:
            labels, ts, vs = [], [], []
            for payload in pdf["payload"]:
                for s in decode_write_request(bytes(payload)):
                    for t, v in s["samples"]:
                        labels.append(s["labels"])
                        ts.append(t)
                        vs.append(v)
            yield pd.DataFrame({"labels": labels, "t": ts, "v": vs})

    return payloads.mapInPandas(run, WIRE_SAMPLES_SCHEMA)
