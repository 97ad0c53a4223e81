"""Driver-contract consistency checks (cheap, no query execution)."""

from __future__ import annotations

import __spark_entry__ as entry_mod


def test_oracle_keys_subset_of_queries():
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert set(oracles) <= set(qs)
    # every query is a callable taking (spark, sf_dir)
    import inspect

    for name, fn in qs.items():
        sig = inspect.signature(fn)
        assert len(sig.parameters) == 2, name


def test_query_count_documents_coverage():
    """The registry must stay broad: >= 20 queries, >= 15 oracle-backed."""
    assert len(entry_mod.queries()) >= 20
    assert len(entry_mod.oracle_sql()) >= 15


def test_every_query_is_oracle_backed():
    """Round 4: zero no-oracle queries — every queries() entry has a
    DuckDB oracle (the ANN pair gained full-fidelity oracles)."""
    assert set(entry_mod.oracle_sql()) == set(entry_mod.queries())


def test_embed_dim_constant_matches_testdata():
    """EMBED_DIM (used instead of a driver-side .first() probe) must match
    the actual embeddings tables at every committed SF."""
    import os

    import pyarrow.parquet as pq

    from intelligent_document_processing_on_aws_spark.entry_queries import EMBED_DIM

    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        p = f"/root/testdata/{sf}/embeddings.parquet"
        if not os.path.exists(p):
            continue
        t = pq.read_table(p, columns=["embedding"])
        assert len(t.column("embedding")[0]) == EMBED_DIM, sf
