"""Driver-style parity: run queries() and oracle_sql() side by side on
the sf0.001 tables, sort columns by name and rows by value, compare.

The two newest queries run always (fast); the FULL sweep of every
SQL-verified query is the driver's job at sf0.01 and takes minutes, so
it only runs with ORACLE_SWEEP=1.
"""

import importlib.util
import os

import duckdb
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()


def _entry():
    spec = importlib.util.spec_from_file_location(
        "__ray_entry__", os.path.join(os.path.dirname(__file__), "..", "__ray_entry__.py")
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def _con():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"create view {t} as select * from read_parquet('{SF}/{t}.parquet')"
        )
    return con


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _check(m, con, name):
    r = m.queries()[name](SF)
    if hasattr(r, "to_pandas"):
        r = r.to_pandas()
    o = con.execute(m.oracle_sql()[name]).df()
    r, o = _norm(pd.DataFrame(r)), _norm(o)
    assert list(r.columns) == list(o.columns), (name, r.columns, o.columns)
    pd.testing.assert_frame_equal(r, o, check_dtype=False, obj=name)


@pytest.mark.parametrize(
    "name",
    [
        "purchase_attribution",
        "topk_per_group",
        "simhash_tokens",
        "components",
        "range_count",
        "distinct_users",
        "running_sum",
        "events_hourly",
        "status_pivot",
        "hash_sample",
        "subword_tokens",
        "word_jaccard",
        "dedup_neardup_cosine",
        "video_frames",
        "media_thumbnail",
        "span_corruption",
        "fim_transform",
        "value_winsorized",
        "stratified_split",
        "source_temperature_weights",
        "zorder_layout",
        "partition_stats",
        "snapshot_diff",
        "html_links",
        "core_vocab_nucleus",
        "kn_bigram_lm",
        "zipf_slope",
        "heaps_law",
        "bloom_semijoin",
        "ewma_value",
        "source_overlap_matrix",
        "rrf_fuse",
        "dup_assortativity",
        "dup_transitivity",
        "datasheet_by_source",
        "nation_trade_matrix",
        "containment_pairs",
        "time_split_leakage",
        "zscore_outliers",
        "dedup_containment",
        "join_size_estimate",
        "kcenter_select",
        "source_epochs",
        "cohort_ltv",
        "shuffle_autocorr",
        "time_to_convert",
        "label_propagation",
        "theilsen_value_hour",
        "position_attribution",
        "benford_audit",
        "column_entropy",
        "changepoint_hourly",
        "wow_change",
        "dup_cluster_purity",
        "ks_test_value",
        "ks_source_length",
        "min_rev_supplier",
        "decision_stump",
        "nb_classify",
        "zonemap_prune_stats",
        "hilbert_layout",
        "mlm_mask",
        "theta_overlap_sources",
        "curriculum_order",
        "fuzzy_match_ed2",
        "isotonic_hourly",
        "kn_doc_logprob",
        "conformal_threshold",
        "rendezvous_shards",
        "dtw_hourly",
        "sliding_distinct_users",
        "bootstrap_ci_value",
        "snm_pairs",
        "voptimal_histogram",
        "bbit_minhash_pairs",
        "wasserstein_length",
        "ams_f2_tokens",
        "max_token_run",
        "ktruss_dupgraph",
        "holtwinters_forecast",
        "circular_peak_hour",
        "dedup_threshold_curve",
        "prf_expand",
        "grouped_split",
        "dupcluster_shape",
        "decayed_type_counts",
        "lsh_recall_audit",
        "custdist",
    ],
)
def test_new_queries_match_oracle(ray_session, name):
    _check(_entry(), _con(), name)


@pytest.mark.skipif(
    os.environ.get("ORACLE_SWEEP", "1") == "0",
    reason="ORACLE_SWEEP=0 skips the full sweep",
)
def test_full_oracle_sweep(ray_session):
    m = _entry()
    con = _con()
    failures = []
    for name in sorted(set(m.queries()) & set(m.oracle_sql())):
        try:
            _check(m, con, name)
        except Exception as e:  # noqa: BLE001 - collect all, report once
            failures.append((name, str(e)[:300]))
    assert not failures, failures


def test_rows_only_queries_document_why():
    """Contract hygiene: every queries() entry WITHOUT a SQL oracle
    must say in its docstring why it is rows-only (and where its
    non-SQL verification lives)."""
    m = _entry()
    qs, osql = m.queries(), m.oracle_sql()
    undocumented = [
        name
        for name in sorted(set(qs) - set(osql))
        if not (qs[name].__doc__ or "").strip()
    ]
    assert not undocumented, undocumented
    # and every oracle has a query (no orphan SQL)
    assert not set(osql) - set(qs)


@pytest.mark.parametrize("name", ["top_tokens", "dedup_exact", "running_sum"])
def test_partitioning_invariance_smoke(ray_session, name):
    """CI pin for the scripts/check_invariance.py surface: the same
    query under the normal read layout and under a hostile forced
    3-block layout (VOR_FORCE_READ_BLOCKS) must produce bit-identical
    canonicalized results. The full 176-query sweep is the script's
    job; this keeps the knob and the invariance contract exercised on
    every test run."""
    m = _entry()
    fn = m.queries()[name]

    def run():
        r = fn(SF)
        if hasattr(r, "to_pandas"):
            r = r.to_pandas()
        return _norm(pd.DataFrame(r))

    os.environ.pop("VOR_FORCE_READ_BLOCKS", None)
    base = run()
    os.environ["VOR_FORCE_READ_BLOCKS"] = "3"
    try:
        alt = run()
    finally:
        os.environ.pop("VOR_FORCE_READ_BLOCKS", None)
    pd.testing.assert_frame_equal(base, alt, obj=name)
