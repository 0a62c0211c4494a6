"""Static game-data decode (SURVEY.md §2.1 S5/S14; reference
`datadragon_endpoints.py:3-21`, `periodical_static_data_gathering.py:99-123`,
items consumed at `utils.py:485-491,914-919`).

The reference fetches DataDragon JSON per version and caches parsed
dicts in process memory. Here: the raw documents (one JSON text per
version, fetched via `sources.rest`) decode into versioned dim tables
with `from_json` + map explosion; the dims are tiny and broadcast into
every lookup join — the distributed replacement for the in-memory
`items_dictionaries[semver]` cache.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: item.json shape: {"data": {"<itemId>": {"gold": {"total": N}}}}
ITEMS_DOC = T.StructType(
    [
        T.StructField(
            "data",
            T.MapType(
                T.StringType(),
                T.StructType(
                    [
                        T.StructField(
                            "gold",
                            T.StructType([T.StructField("total", T.LongType())]),
                        )
                    ]
                ),
            ),
        )
    ]
)

#: champion.json shape: {"data": {"<key>": {"name": ..., "key": "<numeric id>"}}}
CHAMPIONS_DOC = T.StructType(
    [
        T.StructField(
            "data",
            T.MapType(
                T.StringType(),
                T.StructType(
                    [
                        T.StructField("name", T.StringType()),
                        T.StructField("key", T.StringType()),
                    ]
                ),
            ),
        )
    ]
)


def items_dim(version_docs: DataFrame, json_col: str = "body") -> DataFrame:
    """(semver, items-json) rows → the (semver, item_id, gold_total) dim
    the effective-gold fold joins against (`operators.gold`). The map is
    string-keyed in the source (item ids as JSON object keys)."""
    doc = F.from_json(F.col(json_col), ITEMS_DOC)
    return version_docs.select(
        "semver", F.explode(doc["data"]).alias("item_key", "item")
    ).select(
        "semver",
        F.col("item_key").cast("long").alias("item_id"),
        F.col("item.gold.total").alias("gold_total"),
    )


def champions_dim(version_docs: DataFrame, json_col: str = "body") -> DataFrame:
    """(semver, champions-json) rows → (semver, champion_id, name) —
    the championId → name lookup of J7 (`proto_data_analysis.py:775-777`)."""
    doc = F.from_json(F.col(json_col), CHAMPIONS_DOC)
    return version_docs.select(
        "semver", F.explode(doc["data"]).alias("champ_key", "champ")
    ).select(
        "semver",
        F.col("champ.key").cast("long").alias("champion_id"),
        F.col("champ.name").alias("name"),
    )


def novel_versions(fresh_versions: DataFrame, known_versions: DataFrame) -> DataFrame:
    """X1/J12: versions present upstream but absent from the store —
    drives which static-data documents to fetch (`utils.py:28-29`,
    `periodical_static_data_gathering.py:77-78`)."""
    return fresh_versions.join(known_versions, "semver", "left_anti")
