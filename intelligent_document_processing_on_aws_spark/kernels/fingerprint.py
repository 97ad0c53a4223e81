"""Document fingerprinting kernels: shingles, MinHash, SimHash, rolling hash.

Used by the dedup operators (operators/dedup.py). All hashes are
deterministic and dependency-free (md5-based), so driver, executors, and
tests agree bit-for-bit. Public-knowledge constructions: MinHash (Broder
1997), SimHash (Charikar 2002), banded LSH (Mining of Massive Datasets
ch. 3).
"""

from __future__ import annotations

import hashlib
import struct

MERSENNE_PRIME = (1 << 61) - 1
MAX_HASH = (1 << 32) - 1


def tokens_of(text: str) -> list[str]:
    return text.lower().split()


def shingles(text: str, k: int = 3) -> set[str]:
    """k-token shingles (whitespace tokens, lowercased)."""
    toks = tokens_of(text)
    if len(toks) < k:
        return {" ".join(toks)} if toks else set()
    return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}


def stable_hash64(s: str) -> int:
    """First 8 bytes of md5 as unsigned 64-bit int (cross-platform stable)."""
    return struct.unpack("<Q", hashlib.md5(s.encode("utf-8")).digest()[:8])[0]


def _minhash_params(num_perm: int, seed: int = 42) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs for h_i(x) = ((a*x + b) mod p) mod 2^32."""
    params = []
    for i in range(num_perm):
        d = hashlib.md5(f"minhash-{seed}-{i}".encode()).digest()
        a = (struct.unpack("<Q", d[:8])[0] % (MERSENNE_PRIME - 1)) + 1
        b = struct.unpack("<Q", d[8:16])[0] % MERSENNE_PRIME
        params.append((a, b))
    return params


_PARAM_CACHE: dict[tuple[int, int], list[tuple[int, int]]] = {}


def minhash_signature(text: str, num_perm: int = 32, k: int = 3, seed: int = 42) -> list[int]:
    key = (num_perm, seed)
    if key not in _PARAM_CACHE:
        _PARAM_CACHE[key] = _minhash_params(num_perm, seed)
    params = _PARAM_CACHE[key]
    hs = [stable_hash64(s) % MERSENNE_PRIME for s in shingles(text, k)]
    if not hs:
        return [MAX_HASH] * num_perm
    sig = []
    for a, b in params:
        sig.append(min(((a * x + b) % MERSENNE_PRIME) & MAX_HASH for x in hs))
    return sig


def lsh_band_keys(sig: list[int], bands: int = 8) -> list[str]:
    """Banded LSH bucket keys: hash of each contiguous band of the signature."""
    rows = len(sig) // bands
    keys = []
    for b in range(bands):
        band = sig[b * rows : (b + 1) * rows]
        h = hashlib.md5(("|".join(map(str, band)) + f"#band{b}").encode()).hexdigest()[:16]
        keys.append(f"{b}:{h}")
    return keys


def jaccard(text_a: str, text_b: str, k: int = 3) -> float:
    sa, sb = shingles(text_a, k), shingles(text_b, k)
    if not sa and not sb:
        return 1.0
    inter = len(sa & sb)
    union = len(sa | sb)
    return inter / union if union else 0.0


def simhash64(text: str) -> int:
    """64-bit SimHash over whitespace tokens weighted by frequency."""
    weights = [0] * 64
    counts: dict[str, int] = {}
    for t in tokens_of(text):
        counts[t] = counts.get(t, 0) + 1
    for tok, w in counts.items():
        h = stable_hash64(tok)
        for bit in range(64):
            if (h >> bit) & 1:
                weights[bit] += w
            else:
                weights[bit] -= w
    out = 0
    for bit in range(64):
        if weights[bit] > 0:
            out |= 1 << bit
    return out


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def rolling_fingerprint(text: str, window: int = 8, base: int = 257,
                        mod: int = MERSENNE_PRIME) -> int:
    """Polynomial rolling hash of the first `window` normalized tokens —
    a cheap near-prefix document fingerprint."""
    toks = tokens_of(text)[:window]
    h = 0
    for t in toks:
        h = (h * base + stable_hash64(t)) % mod
    return h
