from proteingym_tpu.metrics.core import (
    auc,
    average_rank,
    mcc,
    ndcg,
    spearman,
    top_k_recall,
    assay_metrics,
    batched_assay_metrics,
)
from proteingym_tpu.metrics.bootstrap import (
    bootstrap_standard_error,
    bootstrap_standard_error_functional_categories,
)

__all__ = [
    "assay_metrics",
    "auc",
    "average_rank",
    "batched_assay_metrics",
    "bootstrap_standard_error",
    "bootstrap_standard_error_functional_categories",
    "mcc",
    "ndcg",
    "spearman",
    "top_k_recall",
]
