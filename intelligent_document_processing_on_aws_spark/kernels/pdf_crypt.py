"""Standard-security-handler RC4 decryption for PDFs (V 1/2, R 2/3).

A large share of crawled PDFs are "owner-protected": encrypted with a
non-empty OWNER password but an EMPTY user password, which every viewer
opens transparently. This module implements the public PDF 1.7 §7.6.3
algorithms with stdlib only (hashlib MD5 + a 20-line RC4):

- Algorithm 2: file encryption key from the (empty) user password, the
  /O value, /P, and the first file identifier; R>=3 re-hashes 50x and
  honors /Length.
- Algorithm 4/5: user-password verification against /U (R2: RC4 of the
  padding string; R3: MD5(pad + id0) RC4'd through 20 XOR-derived keys).
- Per-object keys: MD5(key || objnum LE3 || gen LE2)[:min(n+5, 16)].

Encryption is the OUTERMOST stream layer: decrypt first, then filters
(kernels/real_pdf.content_stream). AES (V>=4 with AESV2/V3) and
non-Standard filters stay out of scope — they raise UnsupportedEncryption
so the row degrades to the error column instead of emitting garbage.

Role-matches the reference's PyMuPDF ingestion
(lib/idp_common_pkg/idp_common/ocr/service.py:1144-1252), which gets
standard-handler decryption from the library. Pure functions; executed
only inside Arrow-batched mapInPandas.
"""

from __future__ import annotations

import hashlib
import re
import struct

# PDF 1.7 Table 3.20 padding string (Algorithm 2 step a)
PAD = bytes([
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
    0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
    0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
    0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A,
])


class UnsupportedEncryption(ValueError):
    """Raised for AES / non-Standard / broken encryption dictionaries."""


try:  # C-speed RC4 via pyca/cryptography when available (~100x PRGA)
    from cryptography.hazmat.primitives.ciphers import Cipher as _Cipher

    try:  # moved in cryptography >= 43
        from cryptography.hazmat.decrepit.ciphers.algorithms import (
            ARC4 as _ARC4,
        )
    except ImportError:  # pragma: no cover - version-dependent
        from cryptography.hazmat.primitives.ciphers.algorithms import (
            ARC4 as _ARC4,
        )
except ImportError:  # pragma: no cover - env-dependent
    _Cipher = None


def rc4(key: bytes, data: bytes) -> bytes:
    # the C backend accepts only its enumerated key sizes (40/56/64/80/
    # 128/... bits) — standard PDF keys (40-bit files, 80/128-bit object
    # keys) all qualify; anything else (odd /Length, short test vectors)
    # falls through to the pure-Python implementation
    if _Cipher is not None:
        try:
            enc = _Cipher(_ARC4(key), mode=None).encryptor()
            return enc.update(data) + enc.finalize()
        except ValueError:
            pass
    S = list(range(256))
    j = 0
    klen = len(key)
    for i in range(256):
        j = (j + S[i] + key[i % klen]) & 0xFF
        S[i], S[j] = S[j], S[i]
    out = bytearray(len(data))
    i = j = 0
    for k, c in enumerate(data):
        i = (i + 1) & 0xFF
        j = (j + S[i]) & 0xFF
        si = S[i]
        sj = S[j]
        S[i] = sj
        S[j] = si
        out[k] = c ^ S[(si + sj) & 0xFF]
    return bytes(out)


def _pad_password(pwd: bytes) -> bytes:
    return (pwd + PAD)[:32]


def file_key(o_value: bytes, p: int, id0: bytes, revision: int,
             key_bits: int = 40, user_pwd: bytes = b"") -> bytes:
    """Algorithm 2: the file encryption key."""
    n = key_bits // 8
    h = hashlib.md5()
    h.update(_pad_password(user_pwd))
    h.update(o_value[:32])
    h.update(struct.pack("<i", p))
    h.update(id0)
    key = h.digest()
    if revision >= 3:
        for _ in range(50):
            key = hashlib.md5(key[:n]).digest()
    return key[:n]


def owner_key(owner_pwd: bytes, revision: int, key_bits: int = 40) -> bytes:
    """Algorithm 3 steps a-d: the RC4 key used to produce /O."""
    n = key_bits // 8 if revision >= 3 else 5
    digest = hashlib.md5(_pad_password(owner_pwd)).digest()
    if revision >= 3:
        for _ in range(50):
            digest = hashlib.md5(digest).digest()
    return digest[:n]


def compute_o_value(owner_pwd: bytes, user_pwd: bytes, revision: int,
                    key_bits: int = 40) -> bytes:
    """Algorithm 3: the /O entry (authoring side, used by fixtures)."""
    key = owner_key(owner_pwd, revision, key_bits)
    data = _pad_password(user_pwd)
    data = rc4(key, data)
    if revision >= 3:
        for i in range(1, 20):
            data = rc4(bytes(b ^ i for b in key), data)
    return data


def compute_u_value(key: bytes, id0: bytes, revision: int) -> bytes:
    """Algorithm 4 (R2) / 5 (R3): the /U entry."""
    if revision == 2:
        return rc4(key, PAD)
    digest = hashlib.md5(PAD + id0).digest()
    data = rc4(key, digest)
    for i in range(1, 20):
        data = rc4(bytes(b ^ i for b in key), data)
    return data + b"\x00" * 16  # padded to 32 bytes (arbitrary per spec)


def verify_user_password(key: bytes, u_value: bytes, id0: bytes,
                         revision: int) -> bool:
    expected = compute_u_value(key, id0, revision)
    if revision == 2:
        return expected == u_value[:32]
    return expected[:16] == u_value[:16]


def object_key(key: bytes, num: int, gen: int) -> bytes:
    h = hashlib.md5()
    h.update(key)
    h.update(struct.pack("<i", num)[:3])
    h.update(struct.pack("<i", gen)[:2])
    return h.digest()[: min(len(key) + 5, 16)]


# -- /Encrypt dictionary parsing ---------------------------------------------

def _dict_string(body: bytes, key: bytes) -> bytes | None:
    """A string-valued entry: ``(...)`` literal (with escapes/octal) or
    ``<...>`` hex. Local minimal parser — /O and /U are always direct."""
    m = re.search(rb"/" + key + rb"\s*", body)
    if not m:
        return None
    rest = body[m.end():]
    if rest.startswith(b"<"):
        end = rest.find(b">")
        hx = re.sub(rb"\s", b"", rest[1:end if end != -1 else len(rest)])
        if len(hx) % 2:
            hx += b"0"
        try:
            return bytes.fromhex(hx.decode("ascii"))
        except ValueError:
            return None
    if not rest.startswith(b"("):
        return None
    out = bytearray()
    i, depth = 1, 1
    while i < len(rest) and depth > 0:
        c = rest[i]
        if c == 0x5C and i + 1 < len(rest):
            e = rest[i + 1]
            esc = {0x6E: 0x0A, 0x72: 0x0D, 0x74: 0x09, 0x62: 0x08,
                   0x66: 0x0C, 0x28: 0x28, 0x29: 0x29, 0x5C: 0x5C}
            if e in esc:
                out.append(esc[e])
                i += 2
            elif 0x30 <= e <= 0x37:
                j = i + 1
                while j < len(rest) and j - i - 1 < 3 and 0x30 <= rest[j] <= 0x37:
                    j += 1
                out.append(int(rest[i + 1:j], 8) & 0xFF)
                i = j
            else:
                out.append(e)
                i += 2
        elif c == 0x28:
            depth += 1
            out.append(c)
            i += 1
        elif c == 0x29:
            depth -= 1
            if depth > 0:
                out.append(c)
            i += 1
        else:
            out.append(c)
            i += 1
    return bytes(out)


def parse_encryption(objects: dict[int, bytes], raw: bytes) -> dict | None:
    """Detect and parse the document's encryption: returns a crypt context
    ``{"key": file_key}`` when the document is RC4-encrypted with an empty
    user password, None when unencrypted.

    Raises UnsupportedEncryption for AES/V>=4, non-Standard filters, a
    missing/garbled /Encrypt target, or a non-empty user password.
    """
    # /Encrypt lives in the trailer dict (classic) or the XRef stream
    # dict (PDF 1.5+) — search only those regions, never stream payloads
    # (a page's text could legitimately contain the token "/Encrypt")
    regions: list[bytes] = []
    for tm in re.finditer(rb"trailer", raw):
        regions.append(raw[tm.end():tm.end() + 2048])
    for body in objects.values():
        if re.search(rb"/Type\s*/XRef\b", body[:1024]):
            regions.append(body[:2048])
    m = None
    enc_body = None
    for region in regions:
        m = re.search(rb"/Encrypt\s+(\d+)\s+\d+\s+R\b", region)
        if m:
            enc_body = objects.get(int(m.group(1)))
            break
        m = re.search(rb"/Encrypt\s*<<", region)
        if m:
            enc_body = region[m.end() - 2:]
            break
    if enc_body is None:
        if m:
            raise UnsupportedEncryption("/Encrypt target object missing")
        return None
    if not re.search(rb"/Filter\s*/Standard\b", enc_body):
        raise UnsupportedEncryption("non-Standard security handler")
    v = _int_entry(enc_body, b"V", 0)
    r = _int_entry(enc_body, b"R", 2)
    if v not in (1, 2) or r not in (2, 3):
        raise UnsupportedEncryption(f"unsupported encryption V={v} R={r}")
    length = _int_entry(enc_body, b"Length", 40)
    o_value = _dict_string(enc_body, b"O")
    u_value = _dict_string(enc_body, b"U")
    p = _int_entry(enc_body, b"P", -1)
    if o_value is None or u_value is None:
        raise UnsupportedEncryption("missing /O or /U")
    id_m = None
    for region in regions:
        id_m = re.search(rb"/ID\s*\[\s*<([0-9A-Fa-f]*)>", region)
        if id_m:
            break
    if id_m is None:
        id_m = re.search(rb"/ID\s*\[\s*<([0-9A-Fa-f]*)>", raw)
    id0 = bytes.fromhex(id_m.group(1).decode("ascii")) if id_m else b""
    key = file_key(o_value, p, id0, r, key_bits=length)
    if not verify_user_password(key, u_value, id0, r):
        raise UnsupportedEncryption("non-empty user password")
    return {"key": key}


def _int_entry(body: bytes, key: bytes, default: int) -> int:
    m = re.search(rb"/" + key + rb"\s+([+-]?\d+)", body)
    return int(m.group(1)) if m else default
