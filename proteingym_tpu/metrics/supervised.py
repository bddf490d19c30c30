"""Supervised benchmark evaluation: Spearman + MSE across CV schemes.

Reproduces ref proteingym/performance_DMS_supervised_benchmarks.py:37-166:

  long scores (DMS_id, model_name, fold_variable_name, Spearman, MSE)
    -> DMS-level tables (average over CV schemes + one per scheme)
    -> per scheme: groupby (model, UniProt, function) mean
        -> bootstrap SE centered on the top model (within-category resample)
        -> function-category means -> final average
        -> MSA-depth / taxon pivots
    -> per-scheme summaries averaged, with per-scheme Average_<metric> columns
    -> ranked Summary_performance_DMS_<mutation_type>_<metric>.csv
       (Spearman descending, MSE ascending)
"""

from __future__ import annotations

import warnings
from pathlib import Path
from typing import Dict, List, Optional, Sequence

import numpy as np
import pandas as pd

from proteingym_tpu.data.reference import ReferenceSet
from proteingym_tpu.merge.supervised import CV_SCHEMES_INDELS, CV_SCHEMES_SUBS

METRICS = ["Spearman", "MSE"]

TAXON_COLUMNS = {
    "Human": "Taxa_Human",
    "Eukaryote": "Taxa_Other_Eukaryote",
    "Prokaryote": "Taxa_Prokaryote",
    "Virus": "Taxa_Virus",
}
DEPTH_COLUMNS = {
    "Low": "Low_MSA_depth",
    "Medium": "Medium_MSA_depth",
    "High": "High_MSA_depth",
}
FUNCTION_CATEGORIES = [
    "Activity", "Binding", "Expression", "OrganismalFitness", "Stability",
]


def _supervised_bootstrap(
    cv_uniprot_function: pd.DataFrame,
    metric: str,
    top_model: str,
    number_assay_reshuffle: int = 10000,
    seed: int = 0,
) -> pd.Series:
    """Bootstrap SE per model of the across-category mean, centered on the
    top model (ref :16-35). Input is indexed by
    (model_name, UniProt_ID, coarse_selection_type)."""
    rng = np.random.default_rng(seed)
    top = cv_uniprot_function.xs(top_model, level="model_name")[metric]
    out = {}
    for model, group in cv_uniprot_function.groupby(level="model_name"):
        g = group.droplevel("model_name")[metric]
        centered = g - top.reindex(g.index)
        replicates = None
        cats = centered.groupby(level="coarse_selection_type")
        for _, cat_vals in cats:
            vals = cat_vals.to_numpy(dtype=np.float64)
            idx = rng.integers(0, len(vals), size=(number_assay_reshuffle, len(vals)))
            with warnings.catch_warnings():
                warnings.simplefilter("ignore", category=RuntimeWarning)
                means = np.nanmean(vals[idx], axis=1)
            replicates = means if replicates is None else replicates + means
        out[model] = float(np.std(replicates / cats.ngroups, ddof=1))
    return pd.Series(out)


def _pivot(df: pd.DataFrame, value_column: str, metric: str) -> pd.DataFrame:
    return df[["model_name", value_column, metric]].pivot(
        index="model_name", columns=value_column, values=metric
    )


def evaluate_supervised(
    long_scores: pd.DataFrame,
    reference: ReferenceSet,
    output_dir: str | Path,
    mutation_type: str = "substitutions",
    top_model: Optional[str] = None,
    bootstrap_samples: int = 10000,
    clean_names: Optional[Dict[str, str]] = None,
    model_types: Optional[Dict[str, str]] = None,
    model_references: Optional[Dict[str, str]] = None,
    model_details: Optional[Dict[str, str]] = None,
    cv_schemes: Optional[Sequence[str]] = None,
    write_html: bool = False,
) -> Dict[str, pd.DataFrame]:
    """Run the full supervised aggregation; returns {metric: summary frame}."""
    output_dir = Path(output_dir)
    if cv_schemes is None:
        cv_schemes = (
            CV_SCHEMES_INDELS if mutation_type == "indels" else CV_SCHEMES_SUBS
        )
    clean_names = clean_names or {}
    lookup = reference.frame[
        ["DMS_id", "MSA_Neff_L_category", "coarse_selection_type", "taxon",
         "UniProt_ID"]
    ]
    score_df = long_scores.merge(lookup, on="DMS_id", how="left")
    if top_model is None:
        top_model = (
            score_df.groupby("model_name")["Spearman"].mean().idxmax()
        )

    summaries: Dict[str, pd.DataFrame] = {}
    for metric in METRICS:
        metric_dir = output_dir / metric
        metric_dir.mkdir(parents=True, exist_ok=True)

        # ---- DMS-level tables (ref :70-106) ------------------------------
        dms_level = (
            score_df.pivot_table(
                index="DMS_id", columns="model_name", values=metric,
                aggfunc="mean",  # mean over CV schemes
            )
            .reset_index()
        )
        dms_level.columns = [
            clean_names.get(c, c) for c in dms_level.columns
        ]
        dms_level.round(3).to_csv(
            metric_dir / f"DMS_{mutation_type}_{metric}_DMS_level.csv",
            index=False,
        )
        for cv_scheme in cv_schemes:
            per_scheme = (
                score_df[score_df["fold_variable_name"] == cv_scheme]
                .pivot_table(index="DMS_id", columns="model_name", values=metric)
                .reset_index()
            )
            per_scheme.columns = [
                clean_names.get(c, c) for c in per_scheme.columns
            ]
            per_scheme.round(3).to_csv(
                metric_dir
                / f"DMS_{mutation_type}_{metric}_DMS_level_{cv_scheme}.csv",
                index=False,
            )

        # ---- per-scheme aggregation + averaging (ref :108-146) -----------
        all_summary = None
        for cv_scheme in cv_schemes:
            cv_subset = score_df[score_df["fold_variable_name"] == cv_scheme]
            if len(cv_subset) == 0:
                raise ValueError(f"No scores for CV scheme {cv_scheme}")
            cv_uniprot_function = cv_subset.groupby(
                ["model_name", "UniProt_ID", "coarse_selection_type"]
            ).mean(numeric_only=True)
            se = _supervised_bootstrap(
                cv_uniprot_function, metric, top_model,
                number_assay_reshuffle=bootstrap_samples,
            ).rename(f"Bootstrap_standard_error_{metric}")
            cv_function_average = cv_uniprot_function.groupby(
                ["model_name", "coarse_selection_type"]
            ).mean()
            cv_final = (
                cv_function_average.groupby("model_name")
                .mean()[[metric]]
                .rename(columns={metric: f"Average_{metric}"})
            )
            by_depth = _pivot(
                cv_subset.groupby(["model_name", "UniProt_ID", "MSA_Neff_L_category"])
                .mean(numeric_only=True)
                .groupby(["model_name", "MSA_Neff_L_category"])
                .mean(numeric_only=True)
                .reset_index(),
                "MSA_Neff_L_category",
                metric,
            )
            # QUIRK (parity with the published artifacts): the reference
            # positionally renames the ALPHABETICALLY-pivoted categories
            # (ref performance_DMS_supervised_benchmarks.py:125-128), so
            # its published "Low_MSA_depth" column holds the High-depth
            # values, "Medium" holds Low, "High" holds Medium — and
            # "Taxa_Human" holds Eukaryote, "Taxa_Other_Eukaryote" holds
            # Human. We reproduce that byte-for-byte when the full category
            # set is present; subset evaluations keep semantic labels.
            if list(by_depth.columns) == ["High", "Low", "Medium"]:
                by_depth.columns = list(DEPTH_COLUMNS.values())
            else:
                by_depth = by_depth.reindex(
                    columns=list(DEPTH_COLUMNS)
                ).rename(columns=DEPTH_COLUMNS)
            by_taxon = _pivot(
                cv_subset.groupby(["model_name", "UniProt_ID", "taxon"])
                .mean(numeric_only=True)
                .groupby(["model_name", "taxon"])
                .mean(numeric_only=True)
                .reset_index(),
                "taxon",
                metric,
            )
            if list(by_taxon.columns) == ["Eukaryote", "Human", "Prokaryote",
                                          "Virus"]:
                by_taxon.columns = list(TAXON_COLUMNS.values())  # same quirk
            else:
                by_taxon = by_taxon.reindex(
                    columns=list(TAXON_COLUMNS)
                ).rename(columns=TAXON_COLUMNS)
            by_function = _pivot(
                cv_function_average.reset_index(), "coarse_selection_type", metric
            )
            by_function.columns = [f"Function_{c}" for c in by_function.columns]

            summary = pd.concat(
                [cv_final, by_depth, by_taxon, by_function, se], axis=1
            )
            if all_summary is None:
                all_summary = summary / len(cv_schemes)
                all_summary[f"Average_{metric}_{cv_scheme}"] = summary[
                    f"Average_{metric}"
                ]
            else:
                scheme_cols = [
                    f"Average_{metric}_{s}" for s in cv_schemes
                ]
                shared = [c for c in all_summary.columns if c not in scheme_cols]
                all_summary[shared] += summary[shared] / len(cv_schemes)
                all_summary[f"Average_{metric}_{cv_scheme}"] = summary[
                    f"Average_{metric}"
                ]

        ascending = metric == "MSE"
        all_summary = all_summary.sort_values(
            by=f"Average_{metric}", ascending=ascending
        )
        all_summary = all_summary.reset_index(names="Model_name")
        all_summary.index = range(1, len(all_summary) + 1)
        all_summary.index.name = "Model_rank"
        all_summary = all_summary.round(3)
        all_summary["Model_name"] = all_summary["Model_name"].map(
            lambda x: clean_names.get(x, x)
        )
        all_summary["References"] = all_summary["Model_name"].map(
            lambda x: (model_references or {}).get(x, "")
        )
        all_summary["Model details"] = all_summary["Model_name"].map(
            lambda x: (model_details or {}).get(x, "")
        )
        all_summary["Model type"] = all_summary["Model_name"].map(
            lambda x: (model_types or {}).get(x, "")
        )
        for cat in FUNCTION_CATEGORIES:
            col = f"Function_{cat}"
            if col not in all_summary:
                all_summary[col] = "N/A"
        column_order = (
            ["Model_name", "Model type", f"Average_{metric}",
             f"Bootstrap_standard_error_{metric}"]
            + [f"Average_{metric}_{s}" for s in cv_schemes]
            + [f"Function_{c}" for c in FUNCTION_CATEGORIES]
            + list(DEPTH_COLUMNS.values())
            + list(TAXON_COLUMNS.values())
            + ["References", "Model details"]
        )
        all_summary = all_summary[column_order]
        out_path = (
            metric_dir / f"Summary_performance_DMS_{mutation_type}_{metric}.csv"
        )
        all_summary.to_csv(out_path)
        if write_html:
            all_summary.to_html(out_path.with_suffix(".html"))
        summaries[metric] = all_summary
    return summaries
