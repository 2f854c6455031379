"""Content addressing: Blake2b-512 digests with the reference's text form.

Parity with crates/esvc-core/src/hash.rs:
  - calculate_hash ≙ hash.rs:77-85 (blake2b-512 over raw bytes)
  - format_hash    ≙ hash.rs:19-33 ("blake2b512:" + base64url, no padding)
  - parse_hash     ≙ hash.rs:47-74
Known-answer vector pinned in tests (hash.rs:109-127): "Guten Tag!".
"""

from __future__ import annotations

import base64
import hashlib

PREFIX = "blake2b512:"
DIGEST_SIZE = 64


def calculate_hash(data: bytes) -> bytes:
    return hashlib.blake2b(data, digest_size=DIGEST_SIZE).digest()


def format_hash(h: bytes) -> str:
    if len(h) != DIGEST_SIZE:
        raise ValueError(f"hash must be {DIGEST_SIZE} bytes, got {len(h)}")
    return PREFIX + base64.urlsafe_b64encode(h).decode("ascii").rstrip("=")


def parse_hash(s: str) -> bytes:
    if not s.startswith(PREFIX):
        raise ValueError(f"invalid hash prefix in {s!r}")
    b64 = s[len(PREFIX):]
    pad = "=" * (-len(b64) % 4)
    try:
        h = base64.urlsafe_b64decode(b64 + pad)
    except Exception as e:  # binascii.Error
        raise ValueError(f"invalid base64 in {s!r}: {e}") from e
    if len(h) != DIGEST_SIZE:
        raise ValueError(f"decoded hash has {len(h)} bytes, want {DIGEST_SIZE}")
    return h
