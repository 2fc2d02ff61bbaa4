"""Pure-python ROS1 bag (format 2.0) reader — no ROS installation needed.

The rpng_plane AR-Table sequences (BASELINE config 4) ship only as ROS1 bags;
the reference indexes them with rosbag::View (ros1_serial_msckf.cpp:132-190).
This module parses the on-disk bag format directly and deserializes exactly
the two message types that replay needs:

* ``sensor_msgs/Imu``             → (t, gyro[3], accel[3])
* ``sensor_msgs/Image``           → (t, [H, W] float32 grayscale in [0, 1])
* ``sensor_msgs/CompressedImage`` → decoded via cv2.imdecode

Bag format (http://wiki.ros.org/Bags/Format/2.0): a `#ROSBAG V2.0` magic
line, then a stream of records ``<hlen u32> <header> <dlen u32> <data>``
where header is a field list ``<flen u32><name>=<value>``. Message payloads
live inside *chunk* records (op=0x05), each optionally compressed with bz2
or lz4; connection records (op=0x07) map conn ids to topics/types.

A minimal single-chunk writer (`write_bag`) is included so tests can
round-trip the reader without shipping binary fixtures.
"""

from __future__ import annotations

import bz2
import os
import struct
from typing import Dict, Iterator, List, Optional, Tuple

import numpy as np

_OP_MSG = 0x02
_OP_BAGHDR = 0x03
_OP_INDEX = 0x04
_OP_CHUNK = 0x05
_OP_CONNECTION = 0x07
_OP_CHUNKINFO = 0x06


def _parse_header(buf: bytes) -> Dict[bytes, bytes]:
    fields = {}
    o = 0
    while o < len(buf):
        (flen,) = struct.unpack_from("<I", buf, o)
        o += 4
        field = buf[o : o + flen]
        o += flen
        k, _, v = field.partition(b"=")
        fields[k] = v
    return fields


def _records(buf: bytes, offset: int = 0) -> Iterator[Tuple[Dict[bytes, bytes], bytes]]:
    """Iterate (header_fields, data) records in a byte buffer."""
    o = offset
    n = len(buf)
    while o + 8 <= n:
        (hlen,) = struct.unpack_from("<I", buf, o)
        o += 4
        hdr = _parse_header(buf[o : o + hlen])
        o += hlen
        (dlen,) = struct.unpack_from("<I", buf, o)
        o += 4
        data = buf[o : o + dlen]
        o += dlen
        yield hdr, data


def _decompress(data: bytes, compression: bytes) -> bytes:
    if compression in (b"none", b""):
        return data
    if compression == b"bz2":
        return bz2.decompress(data)
    if compression == b"lz4":
        try:
            import lz4.frame  # optional; roslz4 writes standard LZ4 frames

            return lz4.frame.decompress(data)
        except ImportError as e:  # pragma: no cover - environment-dependent
            raise RuntimeError(
                "bag chunk is lz4-compressed but the python 'lz4' package is "
                "unavailable; re-record with `rosbag decompress` or bz2"
            ) from e
    raise ValueError(f"unknown bag chunk compression {compression!r}")


class _Cursor:
    __slots__ = ("buf", "o")

    def __init__(self, buf: bytes):
        self.buf = buf
        self.o = 0

    def u8(self):
        v = self.buf[self.o]
        self.o += 1
        return v

    def u32(self):
        (v,) = struct.unpack_from("<I", self.buf, self.o)
        self.o += 4
        return v

    def f64(self, n=1):
        v = struct.unpack_from(f"<{n}d", self.buf, self.o)
        self.o += 8 * n
        return v

    def string(self):
        n = self.u32()
        s = self.buf[self.o : self.o + n]
        self.o += n
        return s

    def skip(self, n):
        self.o += n


def _msg_stamp(c: _Cursor) -> float:
    """std_msgs/Header → stamp seconds (consumes the full header)."""
    c.u32()  # seq
    secs = c.u32()
    nsecs = c.u32()
    c.string()  # frame_id
    return secs + nsecs * 1e-9


def _parse_imu(data: bytes):
    c = _Cursor(data)
    t = _msg_stamp(c)
    c.f64(4)   # orientation quaternion (unused by the replay)
    c.f64(9)   # orientation covariance
    w = np.asarray(c.f64(3))
    c.f64(9)
    a = np.asarray(c.f64(3))
    return t, w, a


def _parse_image(data: bytes):
    c = _Cursor(data)
    t = _msg_stamp(c)
    h = c.u32()
    w = c.u32()
    enc = c.string().decode()
    c.u8()     # is_bigendian
    step = c.u32()
    n = c.u32()
    raw = np.frombuffer(c.buf, np.uint8, count=n, offset=c.o)
    if enc in ("mono8", "8UC1"):
        img = raw.reshape(h, step)[:, :w]
    elif enc in ("bgr8", "rgb8", "bgra8", "rgba8"):
        ch = len(enc.rstrip("8"))
        px = raw.reshape(h, step)[:, : w * ch].reshape(h, w, ch)
        # Rec.601 luma; channel order only permutes the weights.
        wts = {"b": 0.114, "g": 0.587, "r": 0.299, "a": 0.0}
        coef = np.asarray([wts[k] for k in enc.rstrip("8")], np.float32)
        img = (px.astype(np.float32) @ coef).astype(np.uint8)
    elif enc in ("mono16", "16UC1"):
        img = (raw.reshape(h, step)[:, : 2 * w].view(np.uint16) >> 8).astype(np.uint8)
    else:
        raise ValueError(f"unsupported image encoding {enc!r}")
    return t, img.astype(np.float32) / 255.0


def _parse_compressed_image(data: bytes):
    import cv2

    c = _Cursor(data)
    t = _msg_stamp(c)
    c.string()  # format, e.g. "mono8; jpeg compressed"
    n = c.u32()
    raw = np.frombuffer(c.buf, np.uint8, count=n, offset=c.o)
    img = cv2.imdecode(raw, cv2.IMREAD_GRAYSCALE)
    if img is None:
        raise ValueError("cv2 failed to decode compressed image payload")
    return t, img.astype(np.float32) / 255.0


class BagReader:
    """Index + stream a ROS1 v2.0 bag.

    Usage::

        bag = BagReader(path)
        bag.topics                      # {topic: (type, count-if-known)}
        for topic, t, msg in bag.read_messages({"/imu0", "/cam0/image_raw"}):
            ...

    Messages are yielded in chunk order (rosbag writes chunks in time order
    for serially recorded bags; the converter sorts defensively anyway).
    """

    def __init__(self, path: str):
        self.path = path
        with open(path, "rb") as f:
            magic = f.readline()
            if not magic.startswith(b"#ROSBAG V2.0"):
                raise ValueError(f"{path}: not a ROS1 v2.0 bag (magic {magic!r})")
            self._base = f.tell()
            self._buf = f.read()
        self.connections: Dict[int, Dict[str, str]] = {}
        self._chunks: List[Tuple[Dict[bytes, bytes], bytes]] = []  # (header, raw data)
        self._index()

    def _index(self):
        for hdr, data in _records(self._buf):
            op = hdr.get(b"op", b"\x00")[0]
            if op == _OP_CONNECTION:
                conn = struct.unpack("<I", hdr[b"conn"])[0]
                sub = _parse_header(data)
                self.connections[conn] = {
                    "topic": hdr.get(b"topic", b"").decode(),
                    "type": sub.get(b"type", b"").decode(),
                }
            elif op == _OP_CHUNK:
                self._chunks.append((hdr, data))

    @property
    def topics(self) -> Dict[str, str]:
        return {c["topic"]: c["type"] for c in self.connections.values()}

    def read_messages(self, topics: Optional[set] = None):
        """Yield (topic, type, stamp, payload_bytes) for matching topics."""
        # Connections accumulate ACROSS chunks: rosbag's C++ writer puts a
        # connection record inside each chunk before the connection's first
        # message there, and repeats them all in the trailing index section —
        # but a crash-truncated bag (no index section; `rosbag reindex`
        # territory) may only carry the in-chunk copy from an EARLIER chunk,
        # so the running dict must persist for the whole scan.
        local_conns = dict(self.connections)
        for hdr, data in self._chunks:
            comp = hdr.get(b"compression", b"none")
            raw = _decompress(data, comp)
            for rh, rd in _records(raw):
                op = rh.get(b"op", b"\x00")[0]
                if op == _OP_CONNECTION:
                    conn = struct.unpack("<I", rh[b"conn"])[0]
                    sub = _parse_header(rd)
                    local_conns[conn] = {
                        "topic": rh.get(b"topic", b"").decode(),
                        "type": sub.get(b"type", b"").decode(),
                    }
                elif op == _OP_MSG:
                    conn = struct.unpack("<I", rh[b"conn"])[0]
                    info = local_conns.get(conn)
                    if info is None:
                        continue
                    if topics is not None and info["topic"] not in topics:
                        continue
                    secs, nsecs = struct.unpack("<II", rh[b"time"])
                    yield info["topic"], info["type"], secs + nsecs * 1e-9, rd


def read_bag(path: str, imu_topic: str, cam_topic: str):
    """Decode a bag into (imu_t, imu_w, imu_a, cam_t, images).

    Timestamps come from each message's header stamp (sensor time), matching
    the reference's use of msg->header.stamp over bag receive time. Streams
    are sorted by stamp.
    """
    bag = BagReader(path)
    imu_rows: List[Tuple[float, np.ndarray, np.ndarray]] = []
    frames: List[Tuple[float, np.ndarray]] = []
    for topic, typ, _t_recv, payload in bag.read_messages({imu_topic, cam_topic}):
        if topic == imu_topic:
            imu_rows.append(_parse_imu(payload))
        elif typ.endswith("CompressedImage"):
            frames.append(_parse_compressed_image(payload))
        else:
            frames.append(_parse_image(payload))
    imu_rows.sort(key=lambda r: r[0])
    frames.sort(key=lambda r: r[0])
    imu_t = np.asarray([r[0] for r in imu_rows])
    imu_w = np.stack([r[1] for r in imu_rows]) if imu_rows else np.zeros((0, 3))
    imu_a = np.stack([r[2] for r in imu_rows]) if imu_rows else np.zeros((0, 3))
    cam_t = np.asarray([f[0] for f in frames])
    imgs = [f[1] for f in frames]
    return imu_t, imu_w, imu_a, cam_t, imgs


def read_bag_stereo(path: str, imu_topic: str, cam_topics: List[str],
                    pair_tol: float = 0.02):
    """Decode a bag with N time-synced camera streams, pairing frames by
    timestamp (the serial driver's stereo ingestion,
    ros1_serial_msckf.cpp:196-254): for each frame of the anchor camera
    (``cam_topics[0]``), every other camera must have its NEXT frame (the
    first at/after the anchor stamp, each consumed at most once) within
    ``pair_tol`` seconds; anchor frames without a complete set are skipped —
    they aren't a synced pair.

    Returns (imu_t, imu_w, imu_a, cam_t, imgs_by_cam, n_unpaired):
    ``imgs_by_cam[k][i]`` is camera k's image of synced pair i, ``cam_t`` the
    anchor stamps. The estimator itself is monocular (the reference's
    TrackPlane hard-exits on >1 camera, TrackPlane.cpp:85-91), so replay
    drivers feed ``imgs_by_cam[0]`` — the parity point is the pairing/skip
    ingestion semantics of the reference binary.
    """
    bag = BagReader(path)
    imu_rows: List[Tuple[float, np.ndarray, np.ndarray]] = []
    frames: Dict[str, List[Tuple[float, np.ndarray]]] = {t: [] for t in cam_topics}
    for topic, typ, _t_recv, payload in bag.read_messages(set(cam_topics) | {imu_topic}):
        if topic == imu_topic:
            imu_rows.append(_parse_imu(payload))
        elif typ.endswith("CompressedImage"):
            frames[topic].append(_parse_compressed_image(payload))
        else:
            frames[topic].append(_parse_image(payload))
    imu_rows.sort(key=lambda r: r[0])
    for t in cam_topics:
        frames[t].sort(key=lambda r: r[0])

    anchor = frames[cam_topics[0]]
    others = [frames[t] for t in cam_topics[1:]]
    ptrs = [0] * len(others)
    paired_idx: List[List[int]] = []
    n_unpaired = 0
    for ai, (t0, _img) in enumerate(anchor):
        row = [ai]
        ok = True
        for j, fj in enumerate(others):
            # First not-yet-consumed frame at/after the anchor stamp.
            p = ptrs[j]
            while p < len(fj) and fj[p][0] < t0 - 1e-9:
                p += 1
            ptrs[j] = p
            if p < len(fj) and abs(fj[p][0] - t0) < pair_tol:
                row.append(p)
            else:
                ok = False
                break
        if ok:
            paired_idx.append(row)
            for j in range(len(others)):     # consume the partners
                ptrs[j] = row[1 + j] + 1
        else:
            n_unpaired += 1

    imu_t = np.asarray([r[0] for r in imu_rows])
    imu_w = np.stack([r[1] for r in imu_rows]) if imu_rows else np.zeros((0, 3))
    imu_a = np.stack([r[2] for r in imu_rows]) if imu_rows else np.zeros((0, 3))
    cam_t = np.asarray([anchor[row[0]][0] for row in paired_idx])
    imgs_by_cam = [[anchor[row[0]][1] for row in paired_idx]]
    for j, fj in enumerate(others):
        imgs_by_cam.append([fj[row[1 + j]][1] for row in paired_idx])
        n_unpaired += len(fj) - len(paired_idx)  # partners never consumed
    return imu_t, imu_w, imu_a, cam_t, imgs_by_cam, n_unpaired


# ---------------------------------------------------------------------------
# Minimal writer (single uncompressed chunk) — test/round-trip support only.
# ---------------------------------------------------------------------------

def _field(name: bytes, value: bytes) -> bytes:
    f = name + b"=" + value
    return struct.pack("<I", len(f)) + f


def _record(fields: List[Tuple[bytes, bytes]], data: bytes) -> bytes:
    hdr = b"".join(_field(k, v) for k, v in fields)
    return struct.pack("<I", len(hdr)) + hdr + struct.pack("<I", len(data)) + data


def _ser_header(t: float) -> bytes:
    secs = int(t)
    nsecs = int(round((t - secs) * 1e9))
    return struct.pack("<III", 0, secs, nsecs) + struct.pack("<I", 0)  # empty frame_id


def serialize_imu(t: float, w, a) -> bytes:
    out = _ser_header(t)
    out += struct.pack("<4d", 0.0, 0.0, 0.0, 1.0) + struct.pack("<9d", *([0.0] * 9))
    out += struct.pack("<3d", *np.asarray(w, float)) + struct.pack("<9d", *([0.0] * 9))
    out += struct.pack("<3d", *np.asarray(a, float)) + struct.pack("<9d", *([0.0] * 9))
    return out


def serialize_image(t: float, img: np.ndarray) -> bytes:
    """img: [H, W] float in [0,1] → mono8 sensor_msgs/Image."""
    u8 = np.clip(np.asarray(img) * 255.0, 0, 255).astype(np.uint8)
    h, w = u8.shape
    out = _ser_header(t)
    out += struct.pack("<II", h, w)
    out += struct.pack("<I", 5) + b"mono8"
    out += struct.pack("<B", 0)
    out += struct.pack("<I", w)
    out += struct.pack("<I", h * w) + u8.tobytes()
    return out


def write_bag(path: str, messages, compression: str = "none"):
    """messages: iterable of (topic, type_str, t, payload_bytes).

    Writes one chunk holding everything — structurally valid for BagReader
    and for `rosbag` itself (index records are optional for readers that
    scan chunks, which both do).
    """
    topics = {}
    conn_records = []  # repeated at top level after the chunk, as rosbag does
    body = b""
    for topic, typ, t, payload in messages:
        if topic not in topics:
            conn = len(topics)
            topics[topic] = conn
            sub = _field(b"topic", topic.encode()) + _field(b"type", typ.encode()) + \
                _field(b"md5sum", b"*") + _field(b"message_definition", b"")
            rec = _record(
                [(b"op", b"\x07"), (b"conn", struct.pack("<I", conn)),
                 (b"topic", topic.encode())], sub)
            body += rec
            conn_records.append(rec)
        secs = int(t)
        nsecs = int(round((t - secs) * 1e9))
        body += _record(
            [(b"op", b"\x02"), (b"conn", struct.pack("<I", topics[topic])),
             (b"time", struct.pack("<II", secs, nsecs))], payload)
    if compression == "bz2":
        chunk_data = bz2.compress(body)
    elif compression == "none":
        chunk_data = body
    else:
        raise ValueError(compression)
    chunk = _record([(b"op", b"\x05"), (b"compression", compression.encode()),
                     (b"size", struct.pack("<I", len(body)))], chunk_data)
    baghdr = _record(
        [(b"op", b"\x03"), (b"index_pos", struct.pack("<Q", 0)),
         (b"conn_count", struct.pack("<I", len(topics))),
         (b"chunk_count", struct.pack("<I", 1))],
        b" " * 4096)  # rosbag pads its header record; harmless for us
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(b"#ROSBAG V2.0\n")
        f.write(baghdr)
        f.write(chunk)
        for rec in conn_records:
            f.write(rec)
