"""Declarative data-quality validation — the constraint-suite and
re-identification-risk profiles a large-scale training-data pipeline
runs before (and after) every ingest.

Beyond-reference surface (SURVEY §2.11): the reference validates its
collected documents ad hoc (guarded per-field extraction,
`utils.py`-style null checks); a 100 TB pipeline needs the checks as
ONE declarative pass that is cheap enough to run on every batch. Two
public designs anchor the semantics:

- `constraint_report` — Deequ-style (Schelter et al., "Automating
  large-scale data quality verification", VLDB 2018): the caller
  declares row predicates, uniqueness keys, and referential targets;
  the report is one row per constraint with checked/violation counts.
- `k_anonymity_profile` — Sweeney's k-anonymity (IJUFKS 2002): for
  each requested k, how many quasi-identifier groups (and rows) sit in
  groups smaller than k — the standard re-identification risk read on
  a column subset before release.

Scale shape (the whole point vs a constraint-per-query loop):

- `constraint_report` evaluates EVERY constraint in a single pass over
  the fact table: referential checks become broadcast LEFT joins that
  add one marker column each (never a row-count change — the dim side
  is distinct-projected first), then ONE wide aggregate computes all
  row-predicate violation sums, all uniqueness gaps
  (count − count(distinct key)), and all orphan counts map-side
  combined. Uniqueness uses exact multi-distinct aggregation (Spark
  plans it as one Expand + partial aggs — a single shuffle for the
  whole report, no per-constraint jobs). The 1-row wide result is
  exploded driver-free into (constraint, n_checked, n_violations,
  passed) rows.
- `k_anonymity_profile` is two keyed aggregates: group sizes (partial
  agg over the quasi-identifier key — the only shuffle that scales
  with data), then one global fold of the size histogram into per-k
  risk rows. Group-space cardinality never reaches the driver; the
  per-k fold is computed as conditional sums inside the same global
  aggregate and exploded into rows.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "constraint_report",
    "k_anonymity_profile",
    "l_diversity_profile",
    "t_closeness_profile",
    "delete_propagation",
    "purge_deleted",
]


def constraint_report(
    df: DataFrame,
    row_checks: Sequence[tuple[str, Column]] = (),
    unique: Sequence[tuple[str, Sequence[str]]] = (),
    fks: Sequence[tuple[str, str, DataFrame, str]] = (),
) -> DataFrame:
    """One row per declared constraint: ``(constraint, n_checked,
    n_violations, passed)`` — evaluated in a single pass over `df`.

    - ``row_checks``: (name, violation_predicate) — the predicate is
      TRUE exactly on violating rows (e.g. ``F.col("price") < 0`` for
      a non-negativity check). NULL predicate results count as
      non-violations (``cast("bigint")`` of NULL sums as 0), matching
      SQL three-valued semantics; declare an explicit ``isNull`` check
      when nulls themselves are the violation.
    - ``unique``: (name, key_columns) — violations = total rows minus
      distinct keys, i.e. the number of EXCESS rows sharing an
      already-seen key (0 ⇔ the key is unique). Rows with a NULL in
      the key collapse into countDistinct's null-dropping semantics —
      pair with a not-null row check for primary-key validation.
    - ``fks``: (name, fk_col, dim_df, dim_key) — violations = rows
      whose NON-NULL ``fk_col`` has no match in ``dim_df[dim_key]``
      (classic FK semantics: NULL references are legal and are not
      counted in ``n_checked`` either). The dim side is
      distinct-projected and broadcast, so each FK adds one marker
      column and never changes `df`'s row count.

    ``n_checked`` is the total row count for row/uniqueness checks and
    the non-null reference count for FK checks. ``passed`` ⇔
    ``n_violations = 0``. Constraint names must be unique across the
    three groups (they key the report rows).
    """
    names = [n for n, _ in row_checks]
    names += [n for n, _ in unique]
    names += [n for n, *_ in fks]
    if len(set(names)) != len(names):
        dupes = sorted({n for n in names if names.count(n) > 1})
        raise ValueError(
            f"constraint names must be unique, got duplicates: {dupes}"
        )
    if not names:
        raise ValueError("constraint_report: no constraints declared")

    # referential marker columns: one broadcast LEFT join per FK, dim
    # side distinct-projected so row multiplicity is provably unchanged
    marked = df
    hit_cols: dict[str, str] = {}
    for i, (name, fk_col, dim_df, dim_key) in enumerate(fks):
        hit = f"_fk_hit_{i}"
        hit_cols[name] = hit
        dim = F.broadcast(
            dim_df.select(F.col(dim_key).alias(fk_col)).distinct()
            .withColumn(hit, F.lit(1))
        )
        marked = marked.join(dim, fk_col, "left")

    aggs = [F.count(F.lit(1)).alias("_n_rows")]
    for i, (name, pred) in enumerate(row_checks):
        aggs.append(
            F.sum(pred.cast("bigint")).alias(f"_rc_{i}")
        )
    for i, (name, key_cols) in enumerate(unique):
        aggs.append(
            (
                F.count(F.lit(1))
                - F.countDistinct(*[F.col(c) for c in key_cols])
            ).alias(f"_uq_{i}")
        )
    for i, (name, fk_col, _dim, _key) in enumerate(fks):
        nn = F.col(fk_col).isNotNull()
        aggs.append(F.sum(nn.cast("bigint")).alias(f"_fkn_{i}"))
        aggs.append(
            F.sum(
                (nn & F.col(hit_cols[name]).isNull()).cast("bigint")
            ).alias(f"_fkv_{i}")
        )
    wide = marked.agg(*aggs)

    def _row(name: str, checked: Column, violations: Column) -> Column:
        v = F.coalesce(violations, F.lit(0)).cast("bigint")
        return F.struct(
            F.lit(name).alias("constraint"),
            checked.cast("bigint").alias("n_checked"),
            v.alias("n_violations"),
            (v == 0).alias("passed"),
        )

    structs = [
        _row(name, F.col("_n_rows"), F.col(f"_rc_{i}"))
        for i, (name, _) in enumerate(row_checks)
    ]
    structs += [
        _row(name, F.col("_n_rows"), F.col(f"_uq_{i}"))
        for i, (name, _) in enumerate(unique)
    ]
    structs += [
        _row(name, F.coalesce(F.col(f"_fkn_{i}"), F.lit(0)),
             F.col(f"_fkv_{i}"))
        for i, (name, *_rest) in enumerate(fks)
    ]
    return wide.select(
        F.explode(F.array(*structs)).alias("_c")
    ).select("_c.*")


def delete_propagation(
    labels: DataFrame,
    delete_df: DataFrame,
    id_col: str = "doc_id",
    component_col: str = "component_id",
) -> DataFrame:
    """Right-to-be-forgotten propagation through near-duplicate
    components: a deletion request for a document must also remove its
    near-copies, or the content survives deletion verbatim under other
    ids — the duplication loophole every trained-on-crawl pipeline has
    to close. Returns one row per labeled document:
    ``(id, component_id, status)`` with status ``deleted_direct`` (id in
    the request), ``deleted_via_dup`` (shares a near-dup component with
    a requested id), or ``kept``.

    ``labels`` is any (id, component_id) near-dup labeling — the
    `graph.dedup_clusters` frame (MinHash/Jaccard), `hamming_components`
    (SimHash/perceptual), or a stored copy of either; propagation policy
    is one hop over components by construction, matching the clustering
    that produced them.

    Scale shape: deletion requests are tiny by nature, so both joins are
    BROADCAST (the request list, then the distinct touched components —
    bounded by the request size); the corpus-sized labels frame never
    shuffles here. Derived-artifact maintenance (round 10): the stored
    index families take the non-kept set DIRECTLY via O(delete-set)
    tombstone versions (`dedup.delete_from_corpus_index`,
    `streaming/serve.delete_from_ivf_store`, queued by
    `streaming/rtbf.deletion_stream`) with the physical purge at
    `compact_version` time; artifacts without a tombstone path
    (cached summaries) still rebuild through their source fingerprints
    (`sources/cache.py` staleness contract)."""
    dels = F.broadcast(
        delete_df.select(F.col(id_col)).distinct().withColumn(
            "_del", F.lit(1)
        )
    )
    marked = labels.select(F.col(id_col), F.col(component_col)).join(
        dels, id_col, "left"
    )
    del_comps = F.broadcast(
        marked.filter(F.col("_del") == 1)
        .select(component_col)
        .distinct()
        .withColumn("_cdel", F.lit(1))
    )
    return marked.join(del_comps, component_col, "left").select(
        F.col(id_col),
        F.col(component_col),
        F.when(F.col("_del") == 1, F.lit("deleted_direct"))
        .when(F.col("_cdel") == 1, F.lit("deleted_via_dup"))
        .otherwise(F.lit("kept"))
        .alias("status"),
    )


def purge_deleted(
    df: DataFrame,
    propagation: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """The purged corpus: `df` minus every row the `delete_propagation`
    report marks non-kept (one broadcast-able semi-join on the flagged
    ids — the flagged set is request-bounded, never corpus-sized)."""
    flagged = propagation.filter(F.col("status") != "kept").select(
        F.col(id_col)
    )
    return df.join(F.broadcast(flagged), id_col, "left_anti")


def k_anonymity_profile(
    df: DataFrame,
    quasi_cols: Sequence[str | Column],
    ks: Sequence[int] = (2, 5, 10),
) -> DataFrame:
    """Re-identification risk of the quasi-identifier column set: one
    row per requested k — ``(k, n_rows, n_groups, groups_below,
    rows_below, risk_share)`` where ``groups_below``/``rows_below``
    count quasi-identifier groups (and the rows in them) of size < k,
    and ``risk_share`` = rows_below / n_rows rounded to 6 dp. A
    dataset is k-anonymous w.r.t. the column set iff ``rows_below`` is
    0 at that k. NULL quasi values form their own group (GROUP BY
    semantics in both engines).

    Plan: one keyed partial-agg shuffle for group sizes, then ONE
    global aggregate folding the size histogram into every k's
    conditional sums at once (no per-k jobs, no driver-side group
    list), exploded into per-k rows.
    """
    ks = sorted({int(k) for k in ks})
    if not ks or ks[0] < 2:
        raise ValueError(f"ks must be ints >= 2, got {ks!r}")
    cols = [F.col(c) if isinstance(c, str) else c for c in quasi_cols]
    if not cols:
        raise ValueError("k_anonymity_profile: no quasi columns")
    sizes = df.groupBy(*cols).agg(F.count(F.lit(1)).alias("_g"))
    aggs = [
        F.count(F.lit(1)).alias("_n_groups"),
        F.sum("_g").alias("_n_rows"),
    ]
    for k in ks:
        below = F.col("_g") < k
        aggs.append(
            F.sum(F.when(below, F.col("_g"))).alias(f"_rb_{k}")
        )
        aggs.append(
            F.sum(F.when(below, F.lit(1))).alias(f"_gb_{k}")
        )
    wide = sizes.agg(*aggs)
    structs = [
        F.struct(
            F.lit(k).alias("k"),
            F.col("_n_rows").cast("bigint").alias("n_rows"),
            F.col("_n_groups").cast("bigint").alias("n_groups"),
            F.coalesce(F.col(f"_gb_{k}"), F.lit(0))
            .cast("bigint")
            .alias("groups_below"),
            F.coalesce(F.col(f"_rb_{k}"), F.lit(0))
            .cast("bigint")
            .alias("rows_below"),
            F.round(
                F.coalesce(F.col(f"_rb_{k}"), F.lit(0))
                / F.col("_n_rows"),
                6,
            ).alias("risk_share"),
        )
        for k in ks
    ]
    return wide.select(
        F.explode(F.array(*structs)).alias("_k")
    ).select("_k.*")


def l_diversity_profile(
    df: DataFrame,
    quasi_cols: Sequence[str | Column],
    sensitive_col: str | Column,
    ls: Sequence[int] = (2, 3, 5),
) -> DataFrame:
    """Distinct l-diversity (Machanavajjhala et al., TKDD 2007) of a
    sensitive column w.r.t. a quasi-identifier column set — the audit
    k-anonymity cannot make: a group can be large (k-anonymous) yet
    leak the sensitive attribute outright when every member shares one
    value (the homogeneity attack). One row per requested l:
    ``(l, n_rows, n_groups, groups_below, rows_below, risk_share)``
    where ``groups_below``/``rows_below`` count quasi groups (and their
    rows) carrying FEWER than l distinct sensitive values; the dataset
    is distinct-l-diverse iff ``rows_below`` is 0 at that l. NULL quasi
    values form their own group; a NULL sensitive value counts as a
    value (count_distinct ignores NULLs, so it is coalesced in via a
    max flag — both engines agree).

    Plan: one keyed aggregate over the quasi set (partial-agg'd count +
    distinct-sensitive count), then ONE global fold of the diversity
    histogram into every l's conditional sums, exploded into per-l rows
    — no per-l jobs, nothing driver-side. The same 100 TB shape as
    `k_anonymity_profile`.
    """
    ls = sorted({int(v) for v in ls})
    if not ls or ls[0] < 2:
        raise ValueError(f"ls must be ints >= 2, got {ls!r}")
    cols = [F.col(c) if isinstance(c, str) else c for c in quasi_cols]
    if not cols:
        raise ValueError("l_diversity_profile: no quasi columns")
    sens = (
        F.col(sensitive_col)
        if isinstance(sensitive_col, str)
        else sensitive_col
    )
    proj = df.select(*cols, sens.alias("_s"))
    quasi_names = [c for c in proj.columns if c != "_s"]
    sizes = proj.groupBy(*quasi_names).agg(
        F.count(F.lit(1)).alias("_g"),
        (
            F.count_distinct(F.col("_s"))
            + F.max(F.col("_s").isNull().cast("int"))
        ).alias("_d"),
    )
    aggs = [
        F.count(F.lit(1)).alias("_n_groups"),
        F.sum("_g").alias("_n_rows"),
    ]
    for l in ls:
        below = F.col("_d") < l
        aggs.append(F.sum(F.when(below, F.col("_g"))).alias(f"_rb_{l}"))
        aggs.append(F.sum(F.when(below, F.lit(1))).alias(f"_gb_{l}"))
    wide = sizes.agg(*aggs)
    structs = [
        F.struct(
            F.lit(l).alias("l"),
            F.col("_n_rows").cast("bigint").alias("n_rows"),
            F.col("_n_groups").cast("bigint").alias("n_groups"),
            F.coalesce(F.col(f"_gb_{l}"), F.lit(0))
            .cast("bigint")
            .alias("groups_below"),
            F.coalesce(F.col(f"_rb_{l}"), F.lit(0))
            .cast("bigint")
            .alias("rows_below"),
            F.round(
                F.coalesce(F.col(f"_rb_{l}"), F.lit(0)) / F.col("_n_rows"),
                6,
            ).alias("risk_share"),
        )
        for l in ls
    ]
    return wide.select(F.explode(F.array(*structs)).alias("_l")).select(
        "_l.*"
    )


def t_closeness_profile(
    df: DataFrame,
    quasi_cols: Sequence[str | Column],
    sensitive_col: str | Column,
    ts: Sequence[float] = (0.2, 0.3, 0.5),
) -> DataFrame:
    """t-closeness (Li, Li & Venkatasubramanian, ICDE 2007) of a
    CATEGORICAL sensitive column w.r.t. a quasi-identifier set — the
    audit l-diversity cannot make: a group can carry many distinct
    sensitive values yet still leak by having a very different
    DISTRIBUTION than the table (the skewness attack). For the
    equal-distance category metric the earth-mover's distance reduces
    to total variation, ``TVD(group) = ½·Σ_s |p_s − q_s|`` against the
    global distribution. One row per requested t: ``(t, n_rows,
    n_groups, groups_above, rows_above, risk_share)`` counting groups
    (and their rows) with TVD > t; the dataset satisfies t-closeness
    iff ``rows_above`` is 0. NULL quasi values form their own group and
    a NULL sensitive value is a real category (null-safe histogram
    join), matching `l_diversity_profile`'s NULL semantics.

    Exactness contract: with g = group size, G = table size, the
    comparison runs on INTEGERS —
    ``Σ_s |g_s·G − G_s·g| > t · 2·g·G`` — where the absent-category
    terms fold in algebraically (Σ over categories present in the
    group of ``|g_s·G − G_s·g| − G_s·g``, plus ``G·g``), so neither
    engine ever sums a float; t enters once as its exact MICROS integer
    (``num·10⁶ > t_micros·den`` — ts are honored to 6 dp).
    ``risk_share`` = rows_above / n_rows rounded to 6 dp.

    Plan: one (quasi, sensitive) keyed aggregate (the only shuffle that
    scales with data), a broadcast join of the |sensitive|-row global
    histogram, one per-group fold, then the same global per-t
    conditional-sum explode as the k-anonymity/l-diversity profiles —
    no per-t jobs, group space never reaches the driver.
    """
    ts = sorted({float(t) for t in ts})
    if not ts or ts[0] <= 0 or ts[-1] >= 1:
        raise ValueError(f"ts must be in (0, 1), got {ts!r}")
    cols = [F.col(c) if isinstance(c, str) else c for c in quasi_cols]
    if not cols:
        raise ValueError("t_closeness_profile: no quasi columns")
    sens = (
        F.col(sensitive_col)
        if isinstance(sensitive_col, str)
        else sensitive_col
    )
    proj = df.select(*cols, sens.alias("_s"))
    quasi_names = [c for c in proj.columns if c != "_s"]
    cell = proj.groupBy(*quasi_names, "_s").agg(
        F.count(F.lit(1)).alias("_gs")
    )
    glob = F.broadcast(
        proj.groupBy("_s").agg(F.count(F.lit(1)).alias("_sglob"))
    )
    # frame-QUALIFIED references throughout: cell and glob share proj's
    # lineage, and Spark 4's analyzer reports bare names ambiguous
    # across such self-join sides even when only one side carries them.
    # NULL-safe on the sensitive key (ADVICE r9): NULL is a real
    # category here — a plain equi-join would drop NULL-sensitive rows
    # from n_rows and every group's histogram, silently understating
    # risk, and inconsistently with l_diversity_profile's
    # NULL-counts-as-a-value semantics.
    joined = cell.join(glob, cell["_s"].eqNullSafe(glob["_s"]))
    grp = joined.groupBy(*[cell[q] for q in quasi_names]).agg(
        F.sum(cell["_gs"]).alias("_g"),
        # Σ over PRESENT categories of (|g_s·G − G_s·g| − G_s·g); the
        # global total G multiplies in afterwards (it is a constant per
        # row, carried via the 1-row broadcast below)
        F.collect_list(
            F.struct(
                cell["_gs"].alias("_gs"), glob["_sglob"].alias("_sglob")
            )
        ).alias("_cells"),
    )
    total = F.broadcast(proj.agg(F.count(F.lit(1)).alias("_G")))
    g, G = grp["_g"], total["_G"]  # qualified: shared-lineage crossJoin
    term = F.aggregate(
        F.col("_cells"),
        F.lit(0).cast("decimal(38,0)"),
        lambda acc, c: acc
        + (
            F.abs(
                c["_gs"].cast("decimal(38,0)") * G
                - c["_sglob"].cast("decimal(38,0)") * g
            )
            - c["_sglob"].cast("decimal(38,0)") * g
        ).cast("decimal(38,0)"),
    )
    folded = grp.crossJoin(total).select(
        g.alias("_g"),
        (term + G.cast("decimal(38,0)") * g).alias("_num"),  # Σ|…| exact
        (F.lit(2).cast("decimal(38,0)") * g * G).alias("_den"),
    )
    aggs = [
        F.count(F.lit(1)).alias("_n_groups"),
        F.sum("_g").alias("_n_rows"),
    ]
    for i, t in enumerate(ts):
        t_micros = round(t * 1_000_000)
        above = F.col("_num") * F.lit(1_000_000).cast(
            "decimal(38,0)"
        ) > F.lit(t_micros).cast("decimal(38,0)") * F.col("_den")
        aggs.append(F.sum(F.when(above, F.col("_g"))).alias(f"_ra_{i}"))
        aggs.append(F.sum(F.when(above, F.lit(1))).alias(f"_ga_{i}"))
    wide = folded.agg(*aggs)
    structs = [
        F.struct(
            F.lit(format(t, ".6f")).cast("double").alias("t"),
            F.col("_n_rows").cast("bigint").alias("n_rows"),
            F.col("_n_groups").cast("bigint").alias("n_groups"),
            F.coalesce(F.col(f"_ga_{i}"), F.lit(0))
            .cast("bigint")
            .alias("groups_above"),
            F.coalesce(F.col(f"_ra_{i}"), F.lit(0))
            .cast("bigint")
            .alias("rows_above"),
            F.round(
                F.coalesce(F.col(f"_ra_{i}"), F.lit(0)) / F.col("_n_rows"),
                6,
            ).alias("risk_share"),
        )
        for i, t in enumerate(ts)
    ]
    return wide.select(F.explode(F.array(*structs)).alias("_t")).select(
        "_t.*"
    )
