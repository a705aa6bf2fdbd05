"""TFRecord IO: native C++ codec via ctypes, pure-python fallback.

Replaces cc/data/tfrecord/ (record_writer.h:17-27, record_reader.h:24):
TFRecord framing (8-byte LE length + masked crc32c + payload + crc) with
whole-stream zlib for the reference's `.tfrecord.zz` chunks. The native
library is built on demand from native/tfrecord.cc; the python fallback is
wire-identical (used when no compiler is available).
"""
from __future__ import annotations

import ctypes
import os
import struct
import subprocess
import zlib
from typing import Iterator, List, Optional

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libtfrecord.so")

_lib = None


def _load_native():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True)
        except Exception:
            _lib = False
            return _lib
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.tfrec_write.restype = ctypes.c_int
        lib.tfrec_write.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_char_p),
            ctypes.POINTER(ctypes.c_uint64), ctypes.c_uint64, ctypes.c_int]
        lib.tfrec_open.restype = ctypes.c_void_p
        lib.tfrec_open.argtypes = [ctypes.c_char_p]
        lib.tfrec_next.restype = ctypes.c_int64
        lib.tfrec_next.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                   ctypes.c_uint64]
        lib.tfrec_close.argtypes = [ctypes.c_void_p]
        _lib = lib
    except OSError:
        _lib = False
    return _lib


# ---------------- pure-python wire format (fallback + reference) ----------
_CRC_TABLE = []


def _crc32c(data: bytes) -> int:
    global _CRC_TABLE
    if not _CRC_TABLE:
        for i in range(256):
            c = i
            for _ in range(8):
                c = (0x82F63B78 ^ (c >> 1)) if c & 1 else (c >> 1)
            _CRC_TABLE.append(c)
    c = 0xFFFFFFFF
    for byte in data:
        c = _CRC_TABLE[(c ^ byte) & 0xFF] ^ (c >> 8)
    return c ^ 0xFFFFFFFF


_MASK_DELTA = 0xA282EAD8


def _mask(crc: int) -> int:
    return (((crc >> 15) | (crc << 17)) + _MASK_DELTA) & 0xFFFFFFFF


def _unmask(masked: int) -> int:
    rot = (masked - _MASK_DELTA) & 0xFFFFFFFF
    return ((rot << 15) | (rot >> 17)) & 0xFFFFFFFF


def _frame(record: bytes) -> bytes:
    header = struct.pack("<Q", len(record))
    return (header + struct.pack("<I", _mask(_crc32c(header))) + record
            + struct.pack("<I", _mask(_crc32c(record))))


def _py_write(path: str, records: List[bytes], zlib_level: Optional[int]):
    blob = b"".join(_frame(r) for r in records)
    if zlib_level is not None:
        blob = zlib.compress(blob, zlib_level)
    with open(path, "wb") as f:
        f.write(blob)


def _py_read(path: str) -> Iterator[bytes]:
    with open(path, "rb") as f:
        blob = f.read()
    # Zlib detection needs the full 2-byte header check: an UNCOMPRESSED
    # file whose first record length ends in 0x78 would otherwise be
    # misread (the zlib spec requires (CMF<<8|FLG) % 31 == 0 and FLG one
    # of the standard compression levels). Fall back to raw parsing if
    # inflate fails anyway.
    if (len(blob) >= 2 and blob[0] == 0x78
            and ((blob[0] << 8) | blob[1]) % 31 == 0
            and blob[1] in (0x01, 0x5E, 0x9C, 0xDA)):
        try:
            blob = zlib.decompress(blob)
        except zlib.error:
            pass
    pos = 0
    while pos < len(blob):
        (length,) = struct.unpack_from("<Q", blob, pos)
        (len_crc,) = struct.unpack_from("<I", blob, pos + 8)
        if _unmask(len_crc) != _crc32c(blob[pos:pos + 8]):
            raise ValueError("corrupt length crc")
        payload = blob[pos + 12:pos + 12 + length]
        (data_crc,) = struct.unpack_from("<I", blob, pos + 12 + length)
        if _unmask(data_crc) != _crc32c(payload):
            raise ValueError("corrupt data crc")
        yield payload
        pos += 12 + length + 4


# ---------------- public API ----------------
def write_records(path: str, records: List[bytes],
                  zlib_level: Optional[int] = 6):
    """Write a TFRecord file (.zz semantics when zlib_level is not None)."""
    lib = _load_native()
    if lib:
        n = len(records)
        arr = (ctypes.c_char_p * n)(*records)
        lens = (ctypes.c_uint64 * n)(*[len(r) for r in records])
        rc = lib.tfrec_write(path.encode(), arr, lens, n,
                             -1 if zlib_level is None else zlib_level)
        if rc != 0:
            raise IOError(f"tfrec_write failed rc={rc}")
        return
    _py_write(path, records, zlib_level)


def read_records(path: str) -> Iterator[bytes]:
    """Iterate records of a TFRecord file (zlib auto-detected)."""
    lib = _load_native()
    if lib:
        handle = lib.tfrec_open(path.encode())
        if not handle:
            raise IOError(f"cannot open {path}")
        try:
            cap = 1 << 16
            buf = ctypes.create_string_buffer(cap)
            while True:
                got = lib.tfrec_next(handle, buf, cap)
                if got == -3:
                    return
                if got == -2:
                    cap *= 4
                    buf = ctypes.create_string_buffer(cap)
                    continue
                if got < 0:
                    raise ValueError("corrupt tfrecord")
                yield buf.raw[:got]
        finally:
            lib.tfrec_close(handle)
        return
    yield from _py_read(path)


def using_native() -> bool:
    return bool(_load_native())
