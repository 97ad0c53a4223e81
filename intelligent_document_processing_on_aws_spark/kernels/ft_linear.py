"""fastText-style linear text classifier: shared pure kernel.

Implements the public fastText architecture (Joulin et al. 2016,
"Bag of Tricks for Efficient Text Classification"; language-ID flavor of
Grave et al.'s lid.176) from scratch: hashed character-trigram features
-> one linear layer -> softmax. This is the classifier family the big
web-corpus pipelines (CCNet, GPT-3's quality filter, RedPajama) run over
every crawled document, and language-ID is its flagship task.

No reference-repo analog (the reference routes classification to Bedrock
LLM calls, which are out of scope per the north star); the classifier
here is the standard from-scratch replacement used by public pipelines.

Design constraints that shape this kernel:

* **The feature map must be natively expressible in BOTH engines.** A
  trigram's bucket is a closed-form polynomial over three Unicode
  codepoints,
      bucket(i) = ((c_i*31 + c_{i+1})*31 + c_{i+2}) mod B,
  because `ascii(substring(text, i, 1))` returns the identical codepoint
  in Spark SQL and DuckDB (verified incl. CJK), so inference runs as
  pure Catalyst expressions — zero Python per row — and the DuckDB
  oracle re-derives the same buckets independently.
* **Training is bounded, inference is distributed.** Like the IVF
  centroid build (operators/similarity.py), training reads a
  deterministic bounded sample (first `sample_n` doc_ids), fits on the
  driver with this pure-numpy kernel, and broadcasts the weights as
  literals into the native scoring expression. The 100-TB corpus is
  only ever touched by the map-only scoring pass.
* **Exact integer scoring.** Trained float64 weights are quantized once
  to integer micro-units (floor(w*1e6 + 0.5)); per-document scores are
  exact int64 sums of table lookups — order-independent, so the Spark
  result is bit-identical to the DuckDB oracle (the lm_filter /
  metering exact-integer pattern).

Determinism: zero-init full-batch gradient descent — no RNG anywhere —
so Spark-side training and the oracle-side twin produce bit-identical
weights from the same sample rows.
"""

from __future__ import annotations

import numpy as np

#: bucket count for the hashing trick (fastText's `-hash` / bucket arg).
DEFAULT_BUCKETS = 512

#: inference reads at most this many chars per doc (fastText reads the
#: whole doc; capping keeps the per-row expression cost bounded and flat
#: at 100 TB — lang-ID saturates long before 4096 chars).
MAX_CHARS = 4096


def char_trigram_buckets(text: str, n_buckets: int = DEFAULT_BUCKETS,
                         max_chars: int = MAX_CHARS) -> list[int]:
    """Pure-Python twin of the native bucket expression (codepoint
    polynomial mod B over a char-capped prefix)."""
    t = (text or "")[:max_chars]
    return [
        ((ord(t[i]) * 31 + ord(t[i + 1])) * 31 + ord(t[i + 2])) % n_buckets
        for i in range(len(t) - 2)
    ]


def count_features(texts: list[str], n_buckets: int = DEFAULT_BUCKETS,
                   max_chars: int = MAX_CHARS) -> np.ndarray:
    """(n_docs, n_buckets) float64 raw bucket-count matrix.

    Vectorized bit-identical image of char_trigram_buckets: codepoints
    via a UTF-32 reinterpretation (== ord per char), the bucket
    polynomial in exact int64, counts via bincount — integer throughout,
    so X matches the per-trigram Python loop exactly while running ~50x
    faster (the loop's 2M scalar `X[r, b] += 1` steps dominated
    training time)."""
    X = np.zeros((len(texts), n_buckets), dtype=np.float64)
    for r, text in enumerate(texts):
        t = (text or "")[:max_chars]
        if len(t) < 3:
            continue
        # surrogatepass: UTF-32 code units == ord() per char even for
        # lone surrogates (strict encode would raise where the replaced
        # per-char ord() loop did not)
        codes = np.frombuffer(t.encode("utf-32-le", "surrogatepass"),
                              dtype=np.uint32).astype(np.int64)
        buckets = ((codes[:-2] * 31 + codes[1:-1]) * 31
                   + codes[2:]) % n_buckets
        X[r] = np.bincount(buckets, minlength=n_buckets)
    return X


def train_softmax(
    texts: list[str],
    labels: list[int],
    n_classes: int,
    n_buckets: int = DEFAULT_BUCKETS,
    n_iters: int = 200,
    lr: float = 0.5,
    max_chars: int = MAX_CHARS,
) -> tuple[np.ndarray, np.ndarray]:
    """Full-batch softmax regression on L1-normalized bucket counts
    (fastText averages the input vectors the same way). Deterministic:
    zero init, fixed iteration count, float64 throughout.

    Returns (W, b): W is (n_classes, n_buckets), b is (n_classes,).
    """
    # tiny GEMMs + OpenBLAS thread pool = 20-100x slowdown next to a
    # busy Spark scheduler; pinned result is bit-identical (blasctl.py)
    from .blasctl import limit_blas_threads

    limit_blas_threads(1)
    X = count_features(texts, n_buckets, max_chars)
    norms = X.sum(axis=1, keepdims=True)
    norms[norms == 0.0] = 1.0
    X = X / norms
    n = len(texts)
    Y = np.zeros((n, n_classes), dtype=np.float64)
    for r, k in enumerate(labels):
        Y[r, k] = 1.0
    W = np.zeros((n_classes, n_buckets), dtype=np.float64)
    b = np.zeros(n_classes, dtype=np.float64)
    for _ in range(n_iters):
        Z = X @ W.T + b  # (n, K)
        Z -= Z.max(axis=1, keepdims=True)
        E = np.exp(Z)
        P = E / E.sum(axis=1, keepdims=True)
        G = (P - Y) / n  # (n, K)
        W -= lr * (G.T @ X)
        b -= lr * G.sum(axis=0)
    return W, b


def quantize_micro(W: np.ndarray, b: np.ndarray) -> tuple[list[list[int]],
                                                          list[int]]:
    """float64 -> integer micro-units, floor(x*1e6 + 0.5) (the lm_filter
    quantization), as plain Python ints ready to embed as literals."""
    Wq = np.floor(W * 1e6 + 0.5).astype(np.int64)
    bq = np.floor(b * 1e6 + 0.5).astype(np.int64)
    return [[int(v) for v in row] for row in Wq], [int(v) for v in bq]


def score_micro(text: str, w_micro: list[list[int]], b_micro: list[int],
                n_buckets: int = DEFAULT_BUCKETS,
                max_chars: int = MAX_CHARS) -> list[int]:
    """Pure-Python twin of the native integer scorer: per-class exact
    int64 score
        score_k = b_k + floor( (sum over trigram buckets of w_k) / n ),
    the integer image of the trained decision rule b_k + <w_k, x/n>
    (training L1-normalizes features, so inference divides the weight
    sum by the trigram count). floor division is spelled
    (s - pmod(s, n)) div n in the engines — (s - pmod) is exactly
    divisible, so truncating `div` equals floor there; Python's // is
    floor natively. Docs with no trigrams score bias-only."""
    buckets = char_trigram_buckets(text, n_buckets, max_chars)
    n = len(buckets)
    out = []
    for k in range(len(b_micro)):
        if n == 0:
            out.append(b_micro[k])
        else:
            s = sum(w_micro[k][b] for b in buckets)
            out.append(b_micro[k] + s // n)
    return out


def weak_quality_label(text: str | None) -> str:
    """Pure twin of operators/ft_classifier.weak_quality_label: 'hq' iff
    >= 40 whitespace-split words and total word chars <= 6 * n_words
    (integer mean-word-length test — no float boundary)."""
    import re as _re

    ws = [w for w in _re.split(r"\s+", text or "") if w]
    n = len(ws)
    s = sum(len(w) for w in ws)
    return "hq" if n >= 40 and s <= 6 * n else "lq"
