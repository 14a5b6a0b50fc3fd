"""POSIX ustar shard writer — the real-bytes half of img_shard_layout.

[U POSIX.1-1988 ustar format; webdataset tar-shard convention;
img2dataset writer]: training shards are plain tar files; a dataloader
seeks each sample by byte offset. ``img_shard_layout`` PREDICTS those
offsets from arithmetic (512-byte header + payload padded to 512, two
zero end-blocks); this module BUILDS the tar with hand-written ustar
headers so the prediction is checkable against real container bytes —
and the check itself reads the archive back with the stdlib ``tarfile``
module, an independent implementation of the same spec.

Determinism: mtime/uid/gid pinned to 0, mode 0644, no pax/gnu
extensions (names are short), members written in the layout's
(digest, image_id) order — byte-identical output for a given sample set.
"""

from __future__ import annotations

import io
import tarfile


def _octal(n: int, width: int) -> bytes:
    return f"{n:0{width - 1}o}".encode("ascii") + b"\x00"


def ustar_header(name: str, size: int) -> bytes:
    """One 512-byte ustar header (POSIX.1-1988 layout, checksum per spec:
    the chksum field counts as 8 spaces while summing)."""
    if len(name) > 99:
        raise ValueError("ustar name limit (100) exceeded")
    h = bytearray(512)
    h[0:100] = name.encode("ascii").ljust(100, b"\x00")
    h[100:108] = _octal(0o644, 8)      # mode
    h[108:116] = _octal(0, 8)          # uid
    h[116:124] = _octal(0, 8)          # gid
    h[124:136] = _octal(size, 12)      # size
    h[136:148] = _octal(0, 12)         # mtime
    h[148:156] = b" " * 8              # chksum placeholder
    h[156:157] = b"0"                  # typeflag: regular file
    h[257:263] = b"ustar\x00"          # magic
    h[263:265] = b"00"                 # version
    chksum = sum(h)
    h[148:156] = f"{chksum:06o}".encode("ascii") + b"\x00 "
    return bytes(h)


def build_tar(members: list[tuple[str, bytes]]) -> bytes:
    """members = [(name, payload)] in final order → full tar bytes
    (headers + 512-padded payloads + two zero end-blocks)."""
    out = io.BytesIO()
    for name, payload in members:
        out.write(ustar_header(name, len(payload)))
        out.write(payload)
        pad = (-len(payload)) % 512
        out.write(b"\x00" * pad)
    out.write(b"\x00" * 1024)
    return out.getvalue()


def verify_tar(data: bytes, expected: list[tuple[str, int, int]]) -> bool:
    """Independent read-back: stdlib tarfile must report exactly the
    expected (name, size, data_offset) triples, in order."""
    with tarfile.open(fileobj=io.BytesIO(data)) as tf:
        got = [(m.name, m.size, m.offset_data) for m in tf.getmembers()]
    return got == expected
