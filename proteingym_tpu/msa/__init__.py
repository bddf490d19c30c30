from proteingym_tpu.msa.parser import MSA, parse_a2m, preprocess_msa
from proteingym_tpu.msa.weights import sequence_weights, num_cluster_members

__all__ = [
    "MSA",
    "num_cluster_members",
    "parse_a2m",
    "preprocess_msa",
    "sequence_weights",
]
