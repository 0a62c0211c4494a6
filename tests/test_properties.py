"""Property-based tests (hypothesis) for the operators whose correctness
is easiest to break silently: connected components vs a pure-Python
union-find, sequence packing invariants on random corpora, and
deterministic-split tiling. Few examples, small sizes — each example is
a full Spark job."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from lol_data_collection_system_spark.operators.graph import connected_components
from lol_data_collection_system_spark.operators.packing import pack_sequences
from lol_data_collection_system_spark.operators.sampling import deterministic_split

_SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

edges_strategy = st.lists(
    st.tuples(st.integers(0, 30), st.integers(0, 30)),
    min_size=1,
    max_size=40,
)


def _union_find(edges):
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    # canonical label = min node of the component
    comp: dict[int, int] = {}
    roots: dict[int, int] = {}
    for n in parent:
        r = find(n)
        roots[r] = min(roots.get(r, n), n)
    for n in parent:
        comp[n] = roots[find(n)]
    return comp


@_SETTINGS
@given(edges_strategy)
def test_cc_matches_union_find(spark, edges):
    df = spark.createDataFrame(edges, ["id_a", "id_b"])
    got = {r.node: r.component_id for r in connected_components(df).collect()}
    assert got == _union_find(edges)


docs_strategy = st.lists(
    st.integers(0, 12),  # token count per doc (0 = blank doc)
    min_size=1,
    max_size=25,
)


@_SETTINGS
@given(docs_strategy, st.integers(2, 9))
def test_packing_tiles_any_corpus(spark, tok_counts, seq_len):
    rows = [
        (i, " ".join(f"w{i}_{j}" for j in range(n))) for i, n in enumerate(tok_counts)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = pack_sequences(df, seq_len=seq_len).collect()
    total = sum(tok_counts)
    covered = sum(r.tok_end - r.tok_start for r in out)
    assert covered == total
    per_chunk: dict[int, int] = {}
    for r in out:
        assert 0 <= r.tok_start < r.tok_end <= tok_counts[r.doc_id]
        per_chunk[r.chunk_id] = per_chunk.get(r.chunk_id, 0) + (
            r.tok_end - r.tok_start
        )
    if per_chunk:
        last = max(per_chunk)
        for cid, n in per_chunk.items():
            assert n == seq_len or cid == last


@_SETTINGS
@given(
    st.lists(st.integers(0, 10_000), min_size=1, max_size=50, unique=True),
    st.sampled_from([(0.5, 0.5), (0.8, 0.1), (0.34, 0.33)]),
)
def test_split_assigns_each_key_once(spark, keys, fracs):
    df = spark.createDataFrame([(k,) for k in keys], ["id"])
    out = deterministic_split(
        df, "id", {"a": fracs[0], "b": fracs[1]}, salt="p"
    ).collect()
    assert len(out) == len(keys)
    for r in out:
        assert r.split in ("a", "b", None)
    # re-running yields the identical assignment
    again = deterministic_split(
        df, "id", {"a": fracs[0], "b": fracs[1]}, salt="p"
    ).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))
