"""Standard-security-handler decryption for PDFs: RC4 (V 1/2/4, R 2-4),
AESV2 (V4/R4), and AES-256 (V5/R6).

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

AES support (gated on pyca/cryptography, import-tried): AESV2 streams
use MD5-derived per-object keys + 'sAlT' suffix (PDF 1.7 §7.6.2); V5/R6
derives the file key from /U + /UE via the ISO 32000-2 Algorithm 2.A/2.B
iterated hash and uses it directly (16-byte IV prefix, CBC, PKCS#5).
Encryption is the OUTERMOST stream layer: decrypt first, then filters
(kernels/real_pdf.content_stream). Non-Standard filters, unknown CFMs,
and non-empty user passwords raise UnsupportedEncryption so the row
degrades to the error column instead of emitting garbage.

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
             key_bits: int = 40, user_pwd: bytes = b"",
             encrypt_metadata: bool = True) -> bytes:
    """Algorithm 2: the file encryption key."""
    n = key_bits // 8
    h = hashlib.md5()
    h.update(_pad_password(user_pwd))
    h.update(o_value[:32])
    h.update(struct.pack("<i", p))
    h.update(id0)
    if revision >= 4 and not encrypt_metadata:
        h.update(b"\xff\xff\xff\xff")
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
    expected = compute_u_value(key, id0, min(revision, 3))
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


def _top_level_dict(body: bytes) -> bytes:
    """The first ``<< ... >>`` dict in ``body`` with nested sub-dicts
    blanked to spaces (offsets preserved).

    /Encrypt parsing must read /V /R /Length /P /O /U at the TOP level
    only: a V4 dict that orders ``/CF << /StdCF << /CFM /AESV2 /Length
    16 >> >>`` before its own /Length would otherwise leak the crypt
    filter's byte count (16) into key_bits (ADVICE r3). Literal ``(...)``
    strings and ``<hex>`` strings are skipped opaquely so their bytes
    can't unbalance the depth count.
    """
    start = body.find(b"<<")
    if start < 0:
        return body
    out = bytearray(body[:start])
    depth = 0
    i, n = start, len(body)
    while i < n:
        two = body[i:i + 2]
        if two == b"<<":
            depth += 1
            out += two if depth <= 1 else b"  "
            i += 2
        elif two == b">>":
            depth -= 1
            out += two if depth <= 0 else b"  "
            i += 2
            if depth == 0:
                break
        elif body[i] == 0x28:  # ( literal string: skip with escapes/nesting
            j, d = i + 1, 1
            while j < n and d > 0:
                c = body[j]
                if c == 0x5C:
                    j += 2
                    continue
                if c == 0x28:
                    d += 1
                elif c == 0x29:
                    d -= 1
                j += 1
            out += body[i:j] if depth == 1 else b" " * (j - i)
            i = j
        elif body[i] == 0x3C:  # lone < : hex string
            j = body.find(b">", i + 1)
            j = n if j < 0 else j + 1
            out += body[i:j] if depth == 1 else b" " * (j - i)
            i = j
        else:
            out += body[i:i + 1] if depth == 1 else b" "
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
    # incrementally-updated PDFs: the GOVERNING trailer is the one nearest
    # the final %%EOF — iterate in reverse document order so an appended
    # update that adds/changes encryption wins over a stale first trailer
    # (ADVICE r3)
    regions.reverse()
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
    # read scalar entries at the dict's TOP level only — a /CF sub-dict
    # ordered before /Length carries its own '/Length 16' (byte count,
    # not bits); V4's spec default for a missing top-level /Length is
    # 128 bits, not 40 (PDF 1.7 Table 20)
    top = _top_level_dict(enc_body)
    v = _int_entry(top, b"V", 0)
    r = _int_entry(top, b"R", 2)
    length = _int_entry(top, b"Length", 128 if v >= 4 else 40)
    o_value = _dict_string(top, b"O")
    u_value = _dict_string(top, b"U")
    p = _int_entry(top, b"P", -1)
    if o_value is None or u_value is None:
        raise UnsupportedEncryption("missing /O or /U")
    if v == 5 and r in (5, 6):
        # AES-256 (PDF 2.0 / Extension Level 3): key comes from /U + /UE
        ue_value = _dict_string(top, b"UE")
        if ue_value is None:
            raise UnsupportedEncryption("missing /UE")
        return {"cipher": "aes256", "key": r6_file_key(u_value, ue_value)}
    if v == 4 and r == 4:
        # crypt-filter indirection: /CF << /StdCF << /CFM /AESV2|/V2 >> >>
        cfm = re.search(rb"/CFM\s*/(\w+)", enc_body)
        cfm_name = cfm.group(1) if cfm else b"V2"
        if cfm_name not in (b"AESV2", b"V2"):
            raise UnsupportedEncryption(
                f"unsupported crypt filter {cfm_name!r}")
        cipher = "aesv2" if cfm_name == b"AESV2" else "rc4"
    elif v in (1, 2) and r in (2, 3):
        cipher = "rc4"
    else:
        raise UnsupportedEncryption(f"unsupported encryption V={v} R={r}")
    encrypt_metadata = not re.search(
        rb"/EncryptMetadata\s+false\b", top)
    id_m = None
    for region in regions:
        id_m = re.search(rb"/ID\s*\[\s*<([0-9A-Fa-f]*)>", region)
        if id_m:
            break
    if id_m is None:
        id_m = re.search(rb"/ID\s*\[\s*<([0-9A-Fa-f]*)>", raw)
    id0 = bytes.fromhex(id_m.group(1).decode("ascii")) if id_m else b""
    key = file_key(o_value, p, id0, r, key_bits=length,
                   encrypt_metadata=encrypt_metadata)
    if not verify_user_password(key, u_value, id0, r):
        raise UnsupportedEncryption("non-empty user password")
    return {"cipher": cipher, "key": key}


def _int_entry(body: bytes, key: bytes, default: int) -> int:
    m = re.search(rb"/" + key + rb"\s+([+-]?\d+)", body)
    return int(m.group(1)) if m else default


# -- AES filters (V4 AESV2 / V5 AES-256) -------------------------------------
# Gated on pyca/cryptography (import-tried above for ARC4): when absent,
# AES documents raise UnsupportedEncryption — the documented boundary.

try:
    from cryptography.hazmat.primitives.ciphers import Cipher as _AesCipher
    from cryptography.hazmat.primitives.ciphers.algorithms import AES as _AES
    from cryptography.hazmat.primitives.ciphers.modes import CBC as _CBC
except ImportError:  # pragma: no cover - env-dependent
    _AesCipher = None


def _require_aes() -> None:
    if _AesCipher is None:  # pragma: no cover - env-dependent
        raise UnsupportedEncryption(
            "AES-encrypted document and no AES backend available"
        )


def aes_cbc_decrypt(key: bytes, data: bytes) -> bytes:
    """PDF AES stream/string payload: 16-byte IV prefix, AES-CBC body,
    PKCS#5 padding (PDF 1.7 §7.6.2)."""
    _require_aes()
    if len(data) < 16:
        return b""
    iv, body = data[:16], data[16:]
    body = body[: len(body) - len(body) % 16]
    if not body:
        return b""
    dec = _AesCipher(_AES(key), _CBC(iv)).decryptor()
    out = dec.update(body) + dec.finalize()
    pad = out[-1] if out else 0
    if 1 <= pad <= 16 and out.endswith(bytes([pad]) * pad):
        out = out[:-pad]
    return out


def aes_cbc_encrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    """Authoring twin (fixtures): PKCS#5-pad, prepend the IV."""
    _require_aes()
    pad = 16 - len(data) % 16
    enc = _AesCipher(_AES(key), _CBC(iv)).encryptor()
    return iv + enc.update(data + bytes([pad]) * pad) + enc.finalize()


def _aes_nopad(key: bytes, iv: bytes, data: bytes, encrypt: bool) -> bytes:
    _require_aes()
    c = _AesCipher(_AES(key), _CBC(iv))
    op = c.encryptor() if encrypt else c.decryptor()
    return op.update(data) + op.finalize()


def hash_2b(password: bytes, salt: bytes, udata: bytes = b"") -> bytes:
    """ISO 32000-2 Algorithm 2.B: the R6 iterated password hash
    (SHA-256 -> 64+ rounds of AES-128-CBC over repeated input, hash
    selected by the first 16 bytes' sum mod 3)."""
    k = hashlib.sha256(password + salt + udata).digest()
    i = 0
    while True:
        k1 = (password + k + udata) * 64
        e = _aes_nopad(k[:16], k[16:32], k1, encrypt=True)
        mod = sum(e[:16]) % 3
        k = (hashlib.sha256, hashlib.sha384, hashlib.sha512)[mod](e).digest()
        i += 1
        if i >= 64 and e[-1] <= i - 32:
            return k[:32]


def r6_file_key(u_value: bytes, ue_value: bytes,
                user_pwd: bytes = b"") -> bytes:
    """ISO 32000-2 Algorithm 2.A (user-password path): /U is
    hash(32) || validation_salt(8) || key_salt(8); the intermediate key
    from the key salt AES-decrypts /UE (no padding, zero IV) into the
    32-byte file key. Raises on a wrong (non-empty) user password."""
    _require_aes()
    if len(u_value) < 48 or len(ue_value) < 32:
        raise UnsupportedEncryption("malformed R6 /U or /UE")
    vsalt, ksalt = u_value[32:40], u_value[40:48]
    if hash_2b(user_pwd, vsalt) != u_value[:32]:
        raise UnsupportedEncryption("non-empty user password")
    ikey = hash_2b(user_pwd, ksalt)
    return _aes_nopad(ikey, b"\x00" * 16, ue_value[:32], encrypt=False)


def r6_author_values(file_key: bytes, user_pwd: bytes = b"",
                     vsalt: bytes = b"\x01" * 8,
                     ksalt: bytes = b"\x02" * 8) -> tuple[bytes, bytes]:
    """Authoring twin (fixtures): (/U, /UE) for a chosen file key."""
    u = hash_2b(user_pwd, vsalt) + vsalt + ksalt
    ikey = hash_2b(user_pwd, ksalt)
    ue = _aes_nopad(ikey, b"\x00" * 16, file_key, encrypt=True)
    return u, ue


def aesv2_object_key(key: bytes, num: int, gen: int) -> bytes:
    """AESV2 per-object key: MD5(key || num LE3 || gen LE2 || 'sAlT')
    truncated like the RC4 variant (PDF 1.7 §7.6.2 step b)."""
    h = hashlib.md5()
    h.update(key)
    h.update(struct.pack("<i", num)[:3])
    h.update(struct.pack("<i", gen)[:2])
    h.update(b"\x73\x41\x6c\x54")
    return h.digest()[: min(len(key) + 5, 16)]


def decrypt_stream(crypt: dict, num: int, gen: int, data: bytes) -> bytes:
    """Dispatch stream decryption by the crypt context's cipher:
    RC4 / AESV2 use per-object derived keys; AES-256 uses the file key
    directly (ISO 32000-2 drops per-object derivation)."""
    cipher = crypt.get("cipher", "rc4")
    if cipher == "rc4":
        return rc4(object_key(crypt["key"], num, gen), data)
    if cipher == "aesv2":
        return aes_cbc_decrypt(aesv2_object_key(crypt["key"], num, gen), data)
    return aes_cbc_decrypt(crypt["key"], data)
