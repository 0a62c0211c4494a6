"""Driver-invocation contract for ``__spark_entry__``.

The per-round driver imports ``__spark_entry__`` in its own process (not
this pytest process) and runs ``oracle_sql()`` against DuckDB at sf0.01.
Round 2 showed the gap: the fight_merge fixture oracle passed in-process
pytest but had never been exercised the way the driver calls it. These
tests reproduce that context exactly — a clean subprocess with only
PYTHONPATH pointing at the repo, cwd outside the repo — and assert the
contract the driver depends on:

* ``oracle_sql()`` keeps its ``fight_merge`` entry (the on-demand fixture
  generation must succeed from a cold process), and
* the emitted SQL actually runs in DuckDB at the driver's sf (0.01) and
  returns rows.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]
DRIVER_SF_DIR = "/root/testdata/sf0.01"

_PROBE = r"""
import json, sys
import duckdb
import __spark_entry__ as e

sf_dir = sys.argv[1]
osql = e.oracle_sql()
qs = e.queries()
report = {
    "n_queries": len(qs),
    "n_oracles": len(osql),
    "has_fight_merge": "fight_merge" in osql,
    "missing_oracles": sorted(k for k in qs if k not in osql),
    "fight_merge_rows": None,
}
if report["has_fight_merge"]:
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    report["fight_merge_rows"] = len(con.execute(osql["fight_merge"]).fetchall())
    con.close()
print(json.dumps(report))
"""


def _run_probe(sf_dir: str) -> dict:
    """Invoke the probe the way the driver invokes the entry module: a
    fresh interpreter, cwd away from the repo, minimal env."""
    env = {
        "PATH": os.environ["PATH"],
        "HOME": os.environ.get("HOME", "/root"),
        "PYTHONPATH": str(REPO),
    }
    if "JAVA_HOME" in os.environ:
        env["JAVA_HOME"] = os.environ["JAVA_HOME"]
    proc = subprocess.run(
        [sys.executable, "-c", _PROBE, sf_dir],
        cwd="/tmp",
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, f"probe failed:\n{proc.stderr[-4000:]}"
    return json.loads(proc.stdout.strip().splitlines()[-1])


@pytest.mark.skipif(
    not os.path.exists(DRIVER_SF_DIR), reason="driver sf0.01 testdata absent"
)
def test_oracle_sql_survives_driver_invocation():
    report = _run_probe(DRIVER_SF_DIR)
    assert report["has_fight_merge"], (
        "fight_merge dropped from oracle_sql() in a clean subprocess — "
        "fixture generation failed; driver would fall back to rows-only"
    )
    assert report["missing_oracles"] == []
    assert report["n_queries"] == report["n_oracles"]
    # The fixture SQL must run at the DRIVER's sf and select this sf's
    # slice (n_src_events dispatch), not an empty or stale one.
    assert report["fight_merge_rows"] > 0


def test_fight_merge_fixture_covers_driver_sf():
    """The committed fixture parquet must carry rows keyed to sf0.01's
    event count — regenerating from scratch must include the driver sf."""
    from lol_data_collection_system_spark.plans import fight_oracle

    assert DRIVER_SF_DIR in fight_oracle.DEFAULT_SF_DIRS
