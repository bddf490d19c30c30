"""proteingym_tpu — a TPU-native protein fitness benchmarking framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of ProteinGym
(OATML-Markslab/ProteinGym): curated DMS / clinical variant benchmarks,
a zoo of zero-shot fitness scorers, and a merge → metrics → leaderboard
pipeline — re-designed for TPU hardware (SPMD meshes, jit/vmap/pjit,
Pallas kernels) rather than SLURM-array + CUDA.

Layer map (mirrors the reference's five-layer pipeline, see SURVEY.md §1):
  data/     — reference CSVs, assay records, mutant parsing      (L0)
  msa/      — A2M parsing, focus columns, sequence weights       (L1)
  models/   — the scorer zoo (site-independent → ESM2 → EVE ...) (L2)
  merge/    — per-assay score merging                            (L3)
  metrics/  — Spearman/NDCG/AUC/MCC/top-recall + leaderboards    (L4)
  pipeline/ — orchestration CLI replacing the bash/SLURM layer   (L5)
  ops/      — Pallas TPU kernels (flash attention, weights, ...)
  parallel/ — mesh construction + sharding rules
"""

__version__ = "0.1.0"
