from proteingym_tpu.merge.merge import merge_assay_scores, merge_all

__all__ = ["merge_assay_scores", "merge_all"]
