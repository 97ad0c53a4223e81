"""SEMANTIC-evaluation fixtures: value->embedding lookup + golden rows.

The reference's SEMANTIC comparator (evaluation/comparator.py:406-476)
embeds both values via a remote Bedrock call and scores cosine similarity;
here the embedding call is replaced by a deterministic value->vector
lookup table (the supplied-embeddings contract of
operators/evaluation.evaluate_attributes).

Float-determinism by construction: embedding components are multiples of
1/64 with |x| <= 1, so every dot-product / squared-magnitude addend is a
multiple of 2^-12 and the sums are EXACT in IEEE doubles — summation
order cannot perturb a bit. The golden scores (computed by the pure
kernel compare_semantic) are therefore bit-identical to Spark's native
zip_with/aggregate fold and to any engine reading the parquet.

Coverage knobs (seed-addressed per value):
- ~15% of values absent from the lookup -> FUZZY fallback path;
- ~5% zero vectors -> zero-magnitude score 0.0 (reference rule);
- mixed dims (6 vs 8) -> trim-to-shorter-vector path;
- identical expected/actual share one vector -> cosine ~1.0 (tp);
- None values -> the empty-side tn/fn/fp1 counting branches.
"""

from __future__ import annotations

import random

from ..kernels.compare import _is_empty, compare_semantic
from ..kernels.textnorm import flatten_nested_data
from .packets_gen import gen_packets, perturb_attributes

# (classification, norm_path) pairs evaluated with method=SEMANTIC
SEMANTIC_PATHS = (
    ("invoice", "vendor_name"),
    ("webpage", "title"),
    ("webpage", "body_excerpt"),
)
SEM_THRESHOLD = 0.8


def embedding_for(value: str) -> list[float] | None:
    """Deterministic per-value vector (or None = absent from the lookup)."""
    rng = random.Random(f"emb-{value}")
    r = rng.random()
    if r < 0.15:
        return None
    if r < 0.20:
        return [0.0] * 8
    dim = 6 if r < 0.35 else 8
    return [rng.randrange(-64, 65) / 64 for _ in range(dim)]


def semantic_tables(n: int) -> dict[str, list[dict]]:
    """Build value_embeddings + golden_semantic over the packet corpus."""
    sem_paths = set(SEMANTIC_PATHS)
    emb: dict[str, list[float] | None] = {}
    golden_rows: list[dict] = []
    for pk in gen_packets(n):
        d = pk["doc_id"]
        for s in pk["sections"]:
            cls = s["classification"]
            actual = perturb_attributes(d, s["section_id"], s["attributes"])
            e_flat = flatten_nested_data(s["attributes"])
            a_flat = flatten_nested_data(actual)
            for p in sorted(set(e_flat) | set(a_flat)):
                if (cls, p) not in sem_paths:
                    continue
                e_v = e_flat.get(p)
                a_v = a_flat.get(p)
                e_s = None if e_v is None else str(e_v)
                a_s = None if a_v is None else str(a_v)
                for v in (e_s, a_s):
                    if v is not None and v not in emb:
                        emb[v] = embedding_for(v)
                # counting branches mirror evaluate_attributes' counted
                # select (empty rules preempt the method comparison)
                tn = fp = fn = tp = fp1 = fp2 = 0
                if _is_empty(e_s) and _is_empty(a_s):
                    tn, score = 1, 1.0
                elif _is_empty(e_s):
                    fp, fp1, score = 1, 1, 0.0
                elif _is_empty(a_s):
                    fn, score = 1, 0.0
                else:
                    matched, score = compare_semantic(
                        e_s, a_s, emb.get(e_s), emb.get(a_s), SEM_THRESHOLD
                    )
                    if matched:
                        tp = 1
                    else:
                        fp = fp2 = 1
                golden_rows.append(
                    {"doc_id": d, "section_id": s["section_id"],
                     "attr_path": p, "expected": e_s, "actual": a_s,
                     "score": score, "tn": tn, "fp": fp, "fn": fn,
                     "tp": tp, "fp1": fp1, "fp2": fp2}
                )
    emb_rows = [
        {"text": v, "embedding": vec}
        for v, vec in sorted(emb.items()) if vec is not None
    ]
    return {"value_embeddings": emb_rows, "golden_semantic": golden_rows}
