"""Real RIFF/WAVE PCM codec — stdlib-interoperable audio container.

[U RIFF/WAVE format (Microsoft/IBM 1991 spec); Python stdlib wave+chunk]

Replaces the sandbox's opaque RCA1 container with the actual interchange
format: files this encoder writes are read sample-exact by Python's
stdlib ``wave`` module (and any other WAV reader), and this decoder reads
stdlib-written files — both directions are pinned in
tests/test_batch56.py.

Encoder (canonical 16-bit mono PCM):
    RIFF <size> WAVE
      'fmt '  16 bytes: PCM(1), 1 channel, rate, byte_rate, block=2, bits=16
      'LIST'  INFO sub-list (optional): INAM title, word-aligned sub-chunks
      'data'  n*2 bytes of little-endian int16 samples

Decoder — a spec-forward chunk walker, NOT a mirror of the encoder:
    - validates the RIFF envelope (magic, declared size, WAVE form type),
    - iterates chunks with word alignment (odd-sized chunks carry a pad
      byte), tolerating unknown/extra chunks in ANY position,
    - requires one PCM fmt chunk (16-bit mono here) before use of data,
    - errors on truncation: a chunk whose declared size runs past the
      buffer raises instead of silently mis-spanning (the jpeg.py
      ADVICE-r4 lesson applied from day one).
"""

from __future__ import annotations

import struct

import numpy as np


def encode_wav(
    samples: np.ndarray, rate: int, title: str | None = None
) -> bytes:
    """Canonical RIFF/WAVE bytes for 16-bit mono PCM `samples`."""
    if samples.dtype != np.int16:
        raise ValueError(f"encode_wav needs int16 samples, got {samples.dtype}")
    chunks: list[bytes] = []
    chunks.append(
        b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16)
    )
    if title is not None:
        t = title.encode("utf-8") + b"\x00"  # INFO strings are NUL-terminated
        sub = b"INAM" + struct.pack("<I", len(t)) + t + (b"\x00" * (len(t) % 2))
        body = b"INFO" + sub
        chunks.append(b"LIST" + struct.pack("<I", len(body)) + body)
    data = samples.astype("<i2").tobytes()
    chunks.append(b"data" + struct.pack("<I", len(data)) + data)
    payload = b"WAVE" + b"".join(c + (b"\x00" * (len(c) % 2)) for c in chunks)
    return b"RIFF" + struct.pack("<I", len(payload)) + payload


def decode_wav(data: bytes) -> tuple[np.ndarray, int, str | None]:
    """(samples int16, rate, INFO title or None) from RIFF/WAVE bytes."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    declared = struct.unpack("<I", data[4:8])[0]
    if 8 + declared > len(data):
        raise ValueError("RIFF size field runs past the buffer (truncated)")
    end = 8 + declared
    i = 12
    fmt = None
    pcm = None
    title = None
    while i + 8 <= end:
        cid = data[i : i + 4]
        size = struct.unpack("<I", data[i + 4 : i + 8])[0]
        body_end = i + 8 + size
        if body_end > end:
            raise ValueError(f"chunk {cid!r} size runs past the buffer")
        body = data[i + 8 : body_end]
        if cid == b"fmt ":
            if size < 16:
                raise ValueError("fmt chunk too short")
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            pcm = body
        elif cid == b"LIST" and body[:4] == b"INFO":
            j = 4
            while j + 8 <= len(body):
                sid = body[j : j + 4]
                ssz = struct.unpack("<I", body[j + 4 : j + 8])[0]
                if j + 8 + ssz > len(body):
                    raise ValueError("INFO sub-chunk runs past its LIST")
                if sid == b"INAM":
                    title = (
                        body[j + 8 : j + 8 + ssz].rstrip(b"\x00").decode("utf-8")
                    )
                j += 8 + ssz + (ssz % 2)
        # any other chunk id: skip (fact/cue/bext/JUNK/...)
        i = body_end + (size % 2)  # word alignment
    if fmt is None or pcm is None:
        raise ValueError("missing fmt or data chunk")
    audio_format, channels, rate, _byte_rate, block_align, bits = fmt
    if audio_format != 1 or bits != 16 or channels != 1:
        raise ValueError(
            f"unsupported WAV layout: format={audio_format} "
            f"channels={channels} bits={bits} (this decoder is 16-bit mono PCM)"
        )
    n = len(pcm) // block_align
    samples = np.frombuffer(pcm, dtype="<i2", count=n).astype(np.int16)
    return samples, rate, title
