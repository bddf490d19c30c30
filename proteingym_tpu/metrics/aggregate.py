"""Benchmark evaluation: merged scores -> DMS-level -> UniProt -> function -> summary.

Reproduces the reference's aggregation hierarchy and artifact set
(ref: proteingym/performance_DMS_benchmarks.py:116-403):

  per-assay metrics (5 metrics x models [x mutation-depth splits])
    -> (assay x model) DMS-level CSV/HTML, rounded to 3 decimals
    -> groupby UniProt_ID mean                      (protein level)
    -> groupby (UniProt_ID, Selection Type) mean    (function level)
    -> mean of function-category means              (final average)
    -> bootstrap SE centered on the top model
    -> splits by MSA depth / taxon / function / mutation depth
    -> ranked Summary_performance_<...>.csv / .html

Quirk preserved: DMS-level values are rounded to 3 decimals *before* the
UniProt aggregation, exactly as the reference does (ref :275 before :297).

The per-mutant metric math runs through the jitted JAX kernels in
metrics/core.py; this module is host-side pandas orchestration (the
artifact contract is CSV, as in the reference).
"""

from __future__ import annotations

from pathlib import Path
from typing import Callable, Dict, List, Optional

import numpy as np
import pandas as pd

from proteingym_tpu.constants import METRICS, MUTATION_DEPTHS
from proteingym_tpu.data.reference import ReferenceSet
from proteingym_tpu.data.registry import ModelRegistry
from proteingym_tpu.metrics.bootstrap import (
    bootstrap_standard_error_functional_categories,
)
from proteingym_tpu.metrics.core import assay_metrics_host


def _depth_group(mutant: str) -> str:
    d = len(mutant.split(":"))
    return "5+" if d >= 5 else str(d)


def compute_assay_table(
    merged: pd.DataFrame,
    model_names: List[str],
    performance_by_depth: bool = False,
) -> Dict[str, Dict[str, float]]:
    """All metrics for every model column of one merged-scores frame.

    Returns {metric: {row_label: value}} where row labels are model names
    (plus ``model_depth`` rows when splitting by mutation depth).
    Missing model columns yield NaN (ref :204-211).
    """
    y_true = merged["DMS_score"].to_numpy(dtype=np.float64)
    y_bin = (
        merged["DMS_score_bin"].to_numpy(dtype=np.float64)
        if "DMS_score_bin" in merged
        else np.full(len(merged), np.nan)
    )
    out: Dict[str, Dict[str, float]] = {m: {} for m in METRICS}

    def _one(sub_true, sub_bin, sub_score, label_suffix, model):
        finite = np.isfinite(sub_score)
        if not finite.all():
            # models are enforced to score all mutants; guard anyway
            sub_true, sub_bin, sub_score = (
                sub_true[finite],
                sub_bin[finite],
                sub_score[finite],
            )
        if len(sub_score) == 0:
            vals = {m: np.nan for m in METRICS}
        else:
            vals = assay_metrics_host(sub_true, sub_bin, sub_score)
        for m in METRICS:
            out[m][model + label_suffix] = vals[m]

    if performance_by_depth:
        depth_groups = merged["mutant"].map(_depth_group).to_numpy()

    for model in model_names:
        if model not in merged.columns:
            for m in METRICS:
                out[m][model] = np.nan
                if performance_by_depth:
                    for d in MUTATION_DEPTHS:
                        out[m][f"{model}_{d}"] = np.nan
            continue
        y_score = merged[model].to_numpy(dtype=np.float64)
        _one(y_true, y_bin, y_score, "", model)
        if performance_by_depth:
            for d in MUTATION_DEPTHS:
                sel = depth_groups == d
                if sel.sum() > 0:
                    _one(y_true[sel], y_bin[sel], y_score[sel], f"_{d}", model)
                else:
                    for m in METRICS:
                        out[m][f"{model}_{d}"] = np.nan
    return out


def evaluate_benchmark(
    reference: ReferenceSet,
    registry: ModelRegistry,
    merged_scores_loader: Callable[[str], Optional[pd.DataFrame]],
    output_dir: str | Path,
    indel_mode: bool = False,
    performance_by_depth: bool = True,
    model_types: Optional[Dict[str, str]] = None,
    bootstrap_samples: int = 10000,
    seed: int = 0,
    write_html: bool = True,
) -> Dict[str, pd.DataFrame]:
    """Run the full metric + aggregation pipeline, writing all artifacts.

    ``merged_scores_loader(DMS_id)`` returns the merged per-assay frame
    (with DMS_score, DMS_score_bin, and one column per model) or None if
    missing (the assay is then skipped with a warning, ref :193-195).

    Returns {metric: summary_performance DataFrame}.
    """
    output_dir = Path(output_dir)
    if indel_mode:
        performance_by_depth = False
    model_names = registry.names
    mutation_type = "indels" if indel_mode else "substitutions"

    for metric in METRICS:
        (output_dir / metric).mkdir(parents=True, exist_ok=True)

    # ---- per-assay metric pass -------------------------------------------
    per_metric_cols: Dict[str, Dict[str, dict]] = {m: {} for m in METRICS}
    meta_rows: Dict[str, dict] = {}
    for rec in reference:
        merged = merged_scores_loader(rec.DMS_id)
        if merged is None:
            print(f"Scoring file for {rec.DMS_id} missing")
            continue
        if "mutant" not in merged and "mutated_sequence" in merged:
            merged = merged.copy()
            merged["mutant"] = merged["mutated_sequence"]
        table = compute_assay_table(
            merged, model_names, performance_by_depth=performance_by_depth
        )
        for m in METRICS:
            per_metric_cols[m][rec.DMS_id] = table[m]
        meta_rows[rec.DMS_id] = {
            "number_mutants": len(merged),
            "UniProt_ID": rec.UniProt_ID,
            "Selection Type": rec.coarse_selection_type,
            "MSA_Neff_L_category": rec.MSA_Neff_L_category,
            "Taxon": rec.taxon,
        }

    summaries: Dict[str, pd.DataFrame] = {}
    for metric in METRICS:
        filename = f"DMS_{mutation_type}_{metric}"
        # rows = DMS_id, columns = model scores + metadata (post-transpose view)
        frame = pd.DataFrame.from_dict(per_metric_cols[metric], orient="index")
        meta = pd.DataFrame.from_dict(meta_rows, orient="index")
        frame = pd.concat([frame, meta], axis=1)

        numeric_cols = [
            c
            for c in frame.columns
            if c not in ("UniProt_ID", "MSA_Neff_L_category", "Taxon", "Selection Type")
        ]
        # quirk: round to 3 decimals BEFORE all downstream aggregation (ref :275)
        frame[numeric_cols] = frame[numeric_cols].astype(float).round(3)
        frame["number_mutants"] = frame["number_mutants"].astype(int)

        all_columns = frame.columns
        not_depth_cols = [
            c for c in all_columns if c.split("_")[-1] not in MUTATION_DEPTHS
        ]

        dms_level = frame[not_depth_cols] if performance_by_depth else frame
        dms_out = dms_level.copy()
        dms_out.columns = [registry.clean_name(c) for c in dms_out.columns]
        dms_out.to_csv(
            output_dir / metric / f"{filename}_DMS_level.csv", index_label="DMS ID"
        )
        if write_html:
            dms_out.to_html(output_dir / metric / f"{filename}_DMS_level.html")

        summaries[metric] = summarize_dms_level(
            frame,
            metric=metric,
            registry=registry,
            performance_by_depth=performance_by_depth,
            bootstrap_samples=bootstrap_samples,
            seed=seed,
            output_dir=output_dir,
            filename=filename,
            write_html=write_html,
            model_types=model_types,
        )

    return summaries


def summarize_dms_level(
    frame: pd.DataFrame,
    metric: str,
    registry: Optional["ModelRegistry"] = None,
    performance_by_depth: bool = True,
    bootstrap_samples: int = 10000,
    seed: int = 0,
    output_dir: Optional[Path] = None,
    filename: Optional[str] = None,
    write_html: bool = False,
    model_types: Optional[Dict[str, str]] = None,
) -> pd.DataFrame:
    """The full aggregation hierarchy from a per-assay metric table to the
    Summary_performance leaderboard (ref performance_DMS_benchmarks.py
    :296-403).

    ``frame`` is indexed by DMS id with one column per model plus metadata
    columns (number_mutants, UniProt_ID, Selection Type,
    MSA_Neff_L_category, Taxon) — exactly the schema of the published
    ``*_DMS_level.csv`` files, which makes the published leaderboards
    direct golden fixtures for this function (tests/test_golden_artifacts).
    """
    from proteingym_tpu.data.registry import registry_from_dict

    frame = frame.copy()
    if "number_mutants" not in frame:
        frame["number_mutants"] = 0
    all_columns = frame.columns
    not_depth_cols = [
        c for c in all_columns if c.split("_")[-1] not in MUTATION_DEPTHS
    ]
    if registry is None:
        model_cols = [
            c for c in not_depth_cols
            if c not in ("number_mutants", "UniProt_ID", "Selection Type",
                         "MSA_Neff_L_category", "Taxon")
        ]
        registry = registry_from_dict(
            {m: {"input_score_name": m} for m in model_cols}
        )
    filename = filename or f"DMS_substitutions_{metric}"

    # per-UniProt metadata lookups derived from the table itself
    meta_u = frame[["UniProt_ID", "MSA_Neff_L_category", "Taxon",
                    "Selection Type"]].drop_duplicates("UniProt_ID")
    uniprot_neff = meta_u[["UniProt_ID", "MSA_Neff_L_category"]]
    uniprot_taxon = meta_u[["UniProt_ID", "Taxon"]]
    uniprot_function = frame[["UniProt_ID", "Selection Type"]]

    # ---- aggregation hierarchy (ref :296-355) ------------------------
    uniprot_perf = frame.groupby(["UniProt_ID"]).mean(numeric_only=True)
    uniprot_func_perf = frame.groupby(["UniProt_ID", "Selection Type"]).mean(
        numeric_only=True
    )
    uniprot_perf = uniprot_perf.reset_index()
    uniprot_perf = pd.merge(uniprot_perf, uniprot_neff, on="UniProt_ID", how="left")
    uniprot_perf = pd.merge(uniprot_perf, uniprot_taxon, on="UniProt_ID", how="left")
    uniprot_perf = pd.merge(
        uniprot_perf, uniprot_function.drop_duplicates(), on="UniProt_ID", how="left"
    )
    uniprot_perf = uniprot_perf.drop(columns=["number_mutants"])
    uniprot_func_perf = uniprot_func_perf.drop(columns=["number_mutants"])

    uniprot_level_average = uniprot_perf.mean(numeric_only=True)
    func_level_average = (
        uniprot_func_perf.groupby("Selection Type").mean(numeric_only=True)
    ).reset_index()
    final_average = func_level_average.mean(numeric_only=True)

    if performance_by_depth:
        base_cols = [
            c
            for c in not_depth_cols
            if c
            not in (
                "number_mutants",
                "Taxon",
                "MSA_Neff_L_category",
                "Selection Type",
                "UniProt_ID",
            )
        ]
        top_model = final_average.loc[base_cols].idxmax()
    else:
        top_model = final_average.drop(labels=["number_mutants"], errors="ignore").idxmax()

    bootstrap_se = pd.DataFrame(
        bootstrap_standard_error_functional_categories(
            uniprot_func_perf.subtract(uniprot_func_perf[top_model], axis=0),
            number_assay_reshuffle=bootstrap_samples,
            seed=seed,
        ),
        columns=[f"Bootstrap_standard_error_{metric}"],
    )

    uniprot_perf.loc["Average"] = uniprot_level_average
    func_level_average.loc["Average"] = final_average
    uniprot_perf = uniprot_perf.round(3)
    func_level_average = func_level_average.round(3)

    if performance_by_depth:
        if output_dir is not None:
            uniprot_perf[
                [c for c in not_depth_cols if c != "number_mutants"]
            ].to_csv(output_dir / metric / f"{filename}_Uniprot_level.csv",
                     index=False)
        performance_by_depth_tables = {}
        clean_not_depth = [
            c
            for c in not_depth_cols
            if c
            not in ("number_mutants", "UniProt_ID", "MSA_Neff_L_category", "Taxon")
        ]
        for d in MUTATION_DEPTHS:
            depth_cols = [
                c for c in all_columns if c.split("_")[-1] == d
            ]
            series = uniprot_func_perf[depth_cols].mean(numeric_only=True)
            tbl = series.reset_index()
            tbl["model_name"] = tbl["index"].map(
                lambda x: "_".join(x.split("_")[:-1])
            )
            tbl = tbl[["model_name", 0]]
            tbl.columns = ["model_name", f"Depth_{d}"]
            tbl = tbl.set_index("model_name")
            performance_by_depth_tables[d] = tbl
        func_out = func_level_average[clean_not_depth + ["Selection Type"]]
    else:
        if output_dir is not None:
            uniprot_perf.to_csv(
                output_dir / metric / f"{filename}_Uniprot_level.csv",
                index=False,
            )
        func_out = func_level_average
    if output_dir is not None:
        func_out.to_csv(
            output_dir / metric / f"{filename}_Uniprot_Selection_Type_level.csv",
            index=False,
        )

    # ---- split tables (ref :336-348) ---------------------------------
    by_msa = (
        frame.groupby(["UniProt_ID", "MSA_Neff_L_category"])
        .mean(numeric_only=True)
        .groupby(["MSA_Neff_L_category"])
        .mean(numeric_only=True)
    )
    by_taxon = (
        frame.groupby(["UniProt_ID", "Taxon"])
        .mean(numeric_only=True)
        .groupby(["Taxon"])
        .mean(numeric_only=True)
    )
    if performance_by_depth:
        keep = [c for c in not_depth_cols if c not in (
            "Selection Type", "UniProt_ID", "MSA_Neff_L_category", "Taxon")]
        by_msa = by_msa[keep]
        by_taxon = by_taxon[keep]
    by_msa = by_msa.transpose()
    by_taxon = by_taxon.transpose()
    # reindex (not strict-select) so subset evaluations missing a
    # category still work; absent categories become NaN columns
    by_msa = by_msa.reindex(columns=["Low", "Medium", "High"])
    by_msa.columns = ["Low_MSA_depth", "Medium_MSA_depth", "High_MSA_depth"]
    by_taxon = by_taxon.reindex(
        columns=["Human", "Eukaryote", "Prokaryote", "Virus"]
    )
    by_taxon.columns = [
        "Taxa_Human",
        "Taxa_Other_Eukaryote",
        "Taxa_Prokaryote",
        "Taxa_Virus",
    ]
    by_function = (
        func_level_average.drop(labels="Average", axis=0)
        .set_index("Selection Type")
        .transpose()
    )
    by_function.columns = [f"Function_{c}" for c in by_function.columns]

    summary = pd.merge(
        pd.DataFrame(final_average, columns=[f"Average_{metric}"]),
        by_msa,
        left_index=True,
        right_index=True,
        how="inner",
    )
    summary = pd.merge(summary, by_taxon, left_index=True, right_index=True, how="inner")
    summary = pd.merge(
        summary, by_function, left_index=True, right_index=True, how="inner"
    )
    if performance_by_depth:
        for d in MUTATION_DEPTHS:
            summary = pd.merge(
                summary,
                performance_by_depth_tables[d],
                left_index=True,
                right_index=True,
                how="inner",
            )

    summary.sort_values(by=f"Average_{metric}", ascending=False, inplace=True)
    summary.index.name = "Model_name"
    summary.reset_index(inplace=True)
    summary.index = range(1, len(summary) + 1)
    summary.index.name = "Model_rank"
    summary = pd.merge(
        summary, bootstrap_se, left_on="Model_name", right_index=True, how="left"
    )
    type_map = model_types or {m.name: m.model_type for m in registry}
    summary["Model type"] = summary["Model_name"].map(type_map)
    summary["Model details"] = summary["Model_name"].map(registry.model_details)
    summary["References"] = summary["Model_name"].map(registry.model_references)
    summary = summary.round(3)
    summary["Model_name"] = summary["Model_name"].map(registry.clean_name)

    final_column_order = [
        "Model_name",
        "Model type",
        f"Average_{metric}",
        f"Bootstrap_standard_error_{metric}",
        "Function_Activity",
        "Function_Binding",
        "Function_Expression",
        "Function_OrganismalFitness",
        "Function_Stability",
        "Low_MSA_depth",
        "Medium_MSA_depth",
        "High_MSA_depth",
        "Taxa_Human",
        "Taxa_Other_Eukaryote",
        "Taxa_Prokaryote",
        "Taxa_Virus",
    ]
    if performance_by_depth:
        final_column_order += [f"Depth_{d}" for d in MUTATION_DEPTHS]
    final_column_order += ["Model details", "References"]
    summary = summary.reindex(columns=final_column_order)
    if output_dir is not None:
        summary.to_csv(
            output_dir / metric / f"Summary_performance_{filename}.csv"
        )
        if write_html:
            summary.to_html(
                output_dir / metric / f"Summary_performance_{filename}.html"
            )
    return summary


def directory_scores_loader(
    merged_scores_dir: str | Path,
) -> Callable[[str], Optional[pd.DataFrame]]:
    """Default loader: one ``<DMS_id>.csv`` per assay in a directory."""
    merged_scores_dir = Path(merged_scores_dir)

    def load(dms_id: str) -> Optional[pd.DataFrame]:
        path = merged_scores_dir / f"{dms_id}.csv"
        if not path.exists():
            return None
        return pd.read_csv(path)

    return load
