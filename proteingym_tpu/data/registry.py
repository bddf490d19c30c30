"""Model registry: which score columns exist, how to merge and orient them.

Compatible with the ProteinGym ``config.json`` schema
(ref: config.json:3-197) — per model:
  input_score_name : column name in the model's per-assay score file
  location         : subdirectory under the model-scores root
  directionality   : +1 / -1 so that higher merged score = fitter
  key              : merge key ("mutant" | "mutated_sequence")
  model_type       : "MSA" | "Single sequence" | "Structure" | ...

and with the ``constants.json`` display metadata (clean_names,
model_details, model_references).
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import Dict, Iterable, Optional

BENCHMARK_FIELDS = {
    ("DMS", "substitutions"): "model_list_zero_shot_substitutions_DMS",
    ("DMS", "indels"): "model_list_zero_shot_indels_DMS",
    ("clinical", "substitutions"): "model_list_zero_shot_substitutions_clinical",
    ("clinical", "indels"): "model_list_zero_shot_indels_clinical",
    ("DMS_supervised", "substitutions"): "model_list_supervised_substitutions_DMS",
    ("DMS_supervised", "indels"): "model_list_supervised_indels_DMS",
}


@dataclasses.dataclass(frozen=True)
class ModelEntry:
    name: str
    input_score_name: str
    location: str
    directionality: int
    key: str
    model_type: str
    label_name: str = ""  # supervised models: target column in score files


class ModelRegistry:
    def __init__(
        self,
        models: Dict[str, ModelEntry],
        clean_names: Optional[Dict[str, str]] = None,
        model_details: Optional[Dict[str, str]] = None,
        model_references: Optional[Dict[str, str]] = None,
    ):
        self.models = models
        self.clean_names = clean_names or {}
        self.model_details = model_details or {}
        self.model_references = model_references or {}

    def __iter__(self) -> Iterable[ModelEntry]:
        return iter(self.models.values())

    def __len__(self) -> int:
        return len(self.models)

    def __getitem__(self, name: str) -> ModelEntry:
        return self.models[name]

    def __contains__(self, name: str) -> bool:
        return name in self.models

    @property
    def names(self):
        return list(self.models.keys())

    def clean_name(self, name: str) -> str:
        return self.clean_names.get(name, name)


def load_registry(
    config_path: str | Path,
    dataset: str = "DMS",
    mutation_type: str = "substitutions",
    constants_path: Optional[str | Path] = None,
) -> ModelRegistry:
    """Load a registry from a ProteinGym-format config.json."""
    with open(config_path) as f:
        config = json.load(f)
    field = BENCHMARK_FIELDS[(dataset, mutation_type)]
    models = {}
    for name, spec in config[field].items():
        models[name] = ModelEntry(
            name=name,
            input_score_name=spec["input_score_name"],
            location=spec["location"],
            directionality=int(spec.get("directionality", 1)),
            key=spec["key"],
            model_type=spec.get("model_type", ""),
            label_name=spec.get("label_name", ""),
        )
    clean_names = model_details = model_references = None
    if constants_path is not None:
        with open(constants_path) as f:
            constants = json.load(f)
        clean_names = constants.get("clean_names")
        model_details = constants.get("model_details")
        model_references = constants.get("model_references")
    return ModelRegistry(models, clean_names, model_details, model_references)


def load_packaged_registry(
    dataset: str = "DMS",
    mutation_type: str = "substitutions",
    with_display: bool = True,
) -> ModelRegistry:
    """Load the registry shipped inside the package
    (proteingym_tpu/configs/registry.json, the published ProteinGym model
    manifest in native schema: 97 zero-shot sub models, 24 indel, 31/18
    clinical, 11+3 supervised; ref config.json:3-197)."""
    base = Path(__file__).parent.parent / "configs"
    with open(base / "registry.json") as f:
        table = json.load(f)
    models = {}
    for name, spec in table["benchmarks"][f"{dataset}/{mutation_type}"].items():
        models[name] = ModelEntry(
            name=name,
            input_score_name=spec["score_column"],
            location=spec["score_dir"],
            directionality=spec["directionality"],
            key=spec["merge_key"],
            model_type=spec.get("model_type", ""),
            label_name=spec.get("label_column", ""),
        )
    clean_names = model_details = model_references = None
    if with_display:
        with open(base / "display.json") as f:
            display = json.load(f)
        prefix = "supervised_" if dataset == "DMS_supervised" else ""
        clean_names = display.get(f"{prefix}clean_names")
        model_details = display.get(f"{prefix}model_details")
        model_references = display.get(f"{prefix}model_references")
    return ModelRegistry(models, clean_names, model_details, model_references)


def registry_from_dict(models: Dict[str, dict]) -> ModelRegistry:
    return ModelRegistry(
        {
            name: ModelEntry(
                name=name,
                input_score_name=spec.get("input_score_name", name),
                location=spec.get("location", name),
                directionality=int(spec.get("directionality", 1)),
                key=spec.get("key", "mutant"),
                model_type=spec.get("model_type", ""),
                label_name=spec.get("label_name", ""),
            )
            for name, spec in models.items()
        }
    )
